package graft

import org.apache.spark.sql.functions._
import graft.sim.{Ann, Vectors}

/** sim.Ann + sim.Vectors: exact and LSH-bucketed cosine top-k. */
class AnnSpec extends SparkTestBase {
  import spark.implicits._

  test("cosine of identical vectors is 1.0, orthogonal is 0.0") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0), Array(-2.0, 1.0, 0.0)))
      .toDF("a", "b", "c")
    val r = df.select(
      Vectors.cosine(col("a"), col("b")),
      Vectors.dot(col("a"), col("c"))).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 0.0)
  }

  test("bruteForceTopK ranks the known nearest neighbor first") {
    val e = Tables.embeddings(spark, sf)
    val top = Ann.bruteForceTopK(e, e.filter(col("vec_id") === 0), k = 3)
    val rows = top.orderBy("rank").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Double]("sim")).sliding(2).forall(p => p(0) >= p(1)))
    assert(rows.forall(_.getAs[Long]("vec_id") != 0L)) // self excluded
  }

  test("filteredBruteForceTopK = brute force over the allowed corpus only") {
    val e = Tables.embeddings(spark, sf)
    val allowed = e.filter(col("vec_id") % 3 === 0).select("vec_id")
    val q = e.filter(col("vec_id") === 1) // probe outside the filter
    val got = Ann.filteredBruteForceTopK(e, allowed, q, k = 4)
    // exactly the unfiltered operator run on the pre-filtered corpus
    val want = Ann.bruteForceTopK(
      e.filter(col("vec_id") % 3 === 0), q, k = 4)
    assert(got.orderBy("qid", "rank").collect().toSeq ==
      want.orderBy("qid", "rank").collect().toSeq)
    // no filtered-out candidate ever surfaces; probe still answered
    val ids = got.select("vec_id").as[Long].collect()
    assert(ids.nonEmpty && ids.forall(_ % 3 == 0))
    // duplicate ids in the allowed frame must not multiply candidates
    val dup = Ann.filteredBruteForceTopK(e, allowed.union(allowed), q, k = 4)
    assert(dup.count() == got.count())
  }

  test("kmeansCentroids is deterministic, keeps k centroids of full dim") {
    val e = Tables.embeddings(spark, sf)
    val c1 = Ann.kmeansCentroids(e, k = 8, iters = 3)
      .orderBy("cid").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toVector))
    val c2 = Ann.kmeansCentroids(e, k = 8, iters = 3)
      .orderBy("cid").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toVector))
    assert(c1.length == 8)
    assert(c1.forall(_._2.length == 64))
    assert(c1.sameElements(c2)) // bit-identical across runs
  }

  test("lshTopK sims agree with brute force on shared pairs") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 4)
    val bf = Ann.bruteForceTopK(e, q, k = 5)
      .select("qid", "vec_id", "sim").as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => ((a, b), s) }.toMap
    val lsh = Ann.lshTopK(e, q, k = 5, nPlanes = 4)
      .select("qid", "vec_id", "sim").as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case ((a, b, s)) =>
      bf.get((a, b)).foreach(bfSim => assert(bfSim == s)) // identical math
    }
  }

  test("persisted IVF index reproduces the inline form exactly") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 8)
    val root = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val cat = new graft.catalog.ParquetCatalog(root)
    Ann.buildIvfIndex(e, cat, "ivf", nCentroids = 16)
    val persisted = Ann.ivfTopKFromCatalog(q, cat, k = 5, nProbe = 4)
      .orderBy("qid", "rank").collect().toSeq
    val inline = Ann.ivfTopK(e, q, k = 5, nCentroids = 16, nProbe = 4)
      .orderBy("qid", "rank").collect().toSeq
    assert(persisted == inline)
    assert(persisted.nonEmpty)
    // the inverted lists are list_id-partitioned on disk: a probed
    // query reads only its lists' directories (file-level pruning)
    val listDirs = new java.io.File(s"$root/ivf_lists").list()
      .filter(_.startsWith("list_id="))
    assert(listDirs.length > 1, listDirs.mkString(","))
  }

  test("build-then-append IVF index answers identically to one-shot") {
    // assignment depends only on the centroids, so maintaining the
    // index incrementally must not move a single result bit
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 8)
    val root = java.nio.file.Files.createTempDirectory("graft-ivfa").toString
    val cat = new graft.catalog.ParquetCatalog(root)
    // base slice keeps vec_ids 0..15 -> same default centroids as full
    Ann.buildIvfIndex(e.filter(col("vec_id") < 32), cat, "ivfa", nCentroids = 16)
    Ann.appendToIvfIndex(e.filter(col("vec_id") >= 32), cat, "ivfa")
    val appended = Ann.ivfTopKFromCatalog(q, cat, k = 5, nProbe = 4, prefix = "ivfa")
      .orderBy("qid", "rank").collect().toSeq
    val inline = Ann.ivfTopK(e, q, k = 5, nCentroids = 16, nProbe = 4)
      .orderBy("qid", "rank").collect().toSeq
    assert(appended == inline)
    assert(appended.nonEmpty)
  }

  test("tie-breaking operators refuse a string id column up front") {
    val e = Tables.embeddings(spark, sf)
      .withColumn("vec_id", concat(lit("doc-"), col("vec_id")))
    val err = intercept[IllegalArgumentException](Ann.knnJoin(e, k = 3))
    assert(err.getMessage.contains("numeric id column"), err.getMessage)
    assert(err.getMessage.contains("knnJoin"), err.getMessage)
  }
}
