package graft

import org.apache.spark.sql.functions._
import graft.sim.{Pq, Vectors}

/** sim.Pq: product-quantization codebooks, encoding, ADC ranking. */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  private val m = 2
  private val k = 4
  private val dim = 8

  private def corpus(n: Int) = (0 until n).map { i =>
    (i.toLong, (0 until dim).map(d =>
      math.sin(i * 31 + d * 7).toFloat).toArray)
  }.toDF("vec_id", "embedding")

  test("codebooks: k dense codes per block, means partition-invariant") {
    val e = corpus(40)
    val cb = Pq.trainCodebooks(e, m, k, dim, iters = 2)
    val rows = cb.select("block", "code").as[(Int, Int)].collect().sorted
    assert(rows.toSeq == (for (b <- 0 until m; c <- 0 until k) yield (b, c)))
    val cb2 = Pq.trainCodebooks(e.repartition(7), m, k, dim, iters = 2)
    val a = cb.select("block", "code", "cv").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val b = cb2.select("block", "code", "cv").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    assert(a == b) // fixed-point means: bit-equal under any layout
  }

  test("encode: m codes per vector, each the argmin centroid") {
    val e = corpus(40)
    val cb = Pq.trainCodebooks(e, m, k, dim, iters = 1)
    val codes = Pq.encode(e, cb, m, dim)
    val all = codes.select("vec_id", "codes").as[(Long, Seq[Int])].collect()
    assert(all.length == 40)
    assert(all.forall(_._2.length == m))
    assert(all.forall(_._2.forall(c => c >= 0 && c < k)))
    // replay one vector's argmin by hand against the collected codebook
    val cbRows = cb.collect().map(r => (r.getAs[Int]("block"),
      r.getAs[Int]("code")) -> r.getSeq[Double](r.fieldIndex("cv"))).toMap
    val raw = corpus(40).filter(col("vec_id") === 5L)
      .select(Vectors.asDouble(col("embedding"))).as[Seq[Double]].head()
    val nrm = math.sqrt(raw.foldLeft(0.0)((s, x) => s + x * x))
    val v0 = if (nrm == 0.0) raw else raw.map(_ / nrm)
    val got = all.find(_._1 == 5L).get._2
    for (b <- 0 until m) {
      val sv = v0.slice(b * dim / m, (b + 1) * dim / m)
      def d2(cv: Seq[Double]) = {
        def dot(x: Seq[Double], y: Seq[Double]) =
          x.zip(y).foldLeft(0.0)((s, p) => s + p._1 * p._2)
        dot(sv, sv) - 2.0 * dot(sv, cv) + dot(cv, cv)
      }
      val want = (0 until k).minBy(c => (d2(cbRows((b, c))), c))
      assert(got(b) == want, s"block $b")
    }
  }

  test("ADC kernel ranking equals the join-sum formulation") {
    val e = corpus(60)
    val q = e.filter(col("vec_id") < 3)
    val cb = Pq.trainCodebooks(e, m, k, dim, iters = 2)
    val codes = Pq.encode(e, cb, m, dim)
    val fast = Pq.adcTopK(codes, q, cb, m, dim, topK = 4)
      .select("qid", "vec_id", "adc_fix", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    // naive twin: explode codes, join centroid LUT rows, integer-sum
    val lutRows = q.select(col("vec_id").as("qid"),
        Vectors.asDouble(col("embedding")).as("qv0"))
      .withColumn("qv", // the operator's L2 normalization, replayed
        when(Vectors.norm(col("qv0")) === 0.0, col("qv0"))
          .otherwise(transform(col("qv0"), x => x / Vectors.norm(col("qv0")))))
      .crossJoin(broadcast(cb))
      .withColumn("sv",
        slice(col("qv"), col("block") * (dim / m) + 1, lit(dim / m)))
      .withColumn("fix", floor(
        (graft.sim.Vectors.dot(col("sv"), col("sv"))
          - lit(2.0) * graft.sim.Vectors.dot(col("sv"), col("cv"))
          + graft.sim.Vectors.dot(col("cv"), col("cv"))) * lit(1e9))
        .cast("long"))
      .select("qid", "block", "code", "fix")
    val naive = codes.select(col("vec_id"),
        posexplode(col("codes")).as(Seq("block", "code")))
      .join(lutRows, Seq("block", "code"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("fix")).as("adc_fix"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("adc_fix").asc, col("vec_id").asc)
    val naiveTop = naive.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 4)
      .select("qid", "vec_id", "adc_fix", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(fast == naiveTop)
  }

  test("rerank with shortlist = corpus reproduces exact brute-force top-k") {
    val e = corpus(30)
    val q = e.filter(col("vec_id") < 2)
    val cb = Pq.trainCodebooks(e, m, k, dim, iters = 1)
    val codes = Pq.encode(e, cb, m, dim)
    // shortlist covers everything → the rerank IS bruteForceTopK
    val rer = Pq.adcRerankTopK(e, codes, q, cb, m, dim,
        shortlist = 30, topK = 3)
      .select("qid", "vec_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val exact = graft.sim.Ann.bruteForceTopK(e, q, k = 3)
      .select("qid", "vec_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(rer == exact)
  }

  test("codebook smaller than k (tiny corpus): stride-derived ADC still exact") {
    val e = corpus(6) // 6 vectors < k=4 centroids? k=4 < 6; use k=8
    val cb = Pq.trainCodebooks(e, m, k = 8, dim = dim, iters = 1)
    // only 6 init vectors exist → 6 codes per block, codes in 0..5
    val codes = Pq.encode(e, cb, m, dim)
    val all = codes.select("codes").as[Seq[Int]].collect()
    assert(all.forall(_.forall(c => c >= 0 && c < 6)))
    val out = Pq.adcTopK(codes, e.filter(col("vec_id") < 2), cb, m, dim,
      topK = 2).collect()
    assert(out.length == 4) // 2 queries × top-2, no index error
  }

  test("append encodes against frozen codebooks: build+append ≡ encode-all") {
    val root = java.nio.file.Files.createTempDirectory("graft_pq_spec_")
    try {
      val cat = new graft.catalog.ParquetCatalog(root.toString)
      val e = corpus(50)
      val seed = e.filter(col("vec_id") % 5 =!= 0)
      val delta = e.filter(col("vec_id") % 5 === 0)
      Pq.buildPqIndex(seed, cat, "pq", m, k, dim, iters = 2)
      Pq.appendToPqIndex(delta, cat, "pq", m, dim)
      val cb = cat.read(spark, "pq_codebooks")
      val got = cat.read(spark, "pq_codes")
        .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
      val want = Pq.encode(e, cb, m, dim)
        .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
      assert(got == want) // frozen codebooks: append path is bit-neutral
      assert(got.size == 50)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).sorted(
          java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("IVFPQ probing ALL lists ≡ the unpruned shortlist rerank") {
    val e = corpus(40)
    val q = e.filter(col("vec_id") < 2)
    val cb = Pq.trainCodebooks(e, m, k, dim, iters = 1)
    val codes = Pq.encode(e, cb, m, dim)
    val cents = e.limit(4).select(col("vec_id").as("cid"),
      graft.sim.Vectors.asDouble(col("embedding")).as("cv"))
    // probe EVERY list → candidates = whole corpus → must equal the
    // plain shortlist+rerank path
    val probes = graft.sim.Ann.probeLists(q, cents, nProbe = 4)
    val lists = graft.sim.Ann.probeLists(e, cents, nProbe = 1)
      .select(col("qid").as("vec_id"), col("list_id"))
    val cand = lists.join(probes, Seq("list_id"))
    val ivfpq = Pq.ivfAdcRerankTopK(e, cand, codes, q, cb, m, dim,
        shortlist = 10, topK = 3)
      .select("qid", "vec_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val plain = Pq.adcRerankTopK(e, codes, q, cb, m, dim,
        shortlist = 10, topK = 3)
      .select("qid", "vec_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(ivfpq == plain)
  }

  test("refuses a dim not divisible into blocks") {
    val e = corpus(10)
    val ex = intercept[IllegalArgumentException](
      Pq.trainCodebooks(e, m = 3, k = 2, dim = dim))
    assert(ex.getMessage.contains("divisible"), ex.getMessage)
  }

  test("ADC kernel fails loudly on an empty codes row") {
    // a corrupt persisted index (empty code array) must surface as a
    // named error, never a bare divide-by-zero out of codegen
    val df = Seq((Array(1L, 2L, 3L, 4L), Array.empty[Int]))
      .toDF("lut", "codes")
    val ex = intercept[Exception](
      df.select(graft.functions.exprs.adc_sum_l(col("lut"), col("codes")))
        .collect())
    assert(ex.getMessage.contains("empty codes"), ex.getMessage)
  }

  test("ADC kernel fails loudly on a LUT that is not a multiple of m") {
    // lut length 5 against m=2 codes: every lookup after block 0 would
    // silently mis-stride — the guard names the mismatch instead
    val df = Seq((Array(1L, 2L, 3L, 4L, 5L), Array(0, 1)))
      .toDF("lut", "codes")
    val ex = intercept[Exception](
      df.select(graft.functions.exprs.adc_sum_l(col("lut"), col("codes")))
        .collect())
    assert(ex.getMessage.contains("not a multiple"), ex.getMessage)
  }
}
