package graft

import org.apache.spark.sql.functions._
import graft.text.UnigramLm

/** text.UnigramLm: whole-bit quantized unigram surprisal — the CCNet
  * perplexity band (q101) and DSIR importance selection (q103). */
class UnigramLmSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-computed surprisal on a three-doc corpus") {
    // counts: a=3 b=1 c=1, N=5
    // s(a) = floor(log2(5 div 3)) = floor(log2 1) = 0
    // s(b) = s(c) = floor(log2 5) = 2
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, ""))
      .toDF("doc_id", "text")
    val got = UnigramLm.surprisal(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(got(0) == ((1L, 3L, 2L, Some(2.0 / 3.0))))
    assert(got(1) == ((2L, 2L, 2L, Some(1.0))))
    assert(got(2) == ((3L, 0L, 0L, None))) // empty doc: explicit row
  }

  test("band filter keeps the middle, never zero-token docs") {
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, ""))
      .toDF("doc_id", "text")
    val kept = UnigramLm.perplexityBand(docs, "doc_id", "text",
      lo = 0.5, hi = 0.9)
      .select("doc_id", "kept").as[(Long, Int)].collect().toMap
    assert(kept == Map(1L -> 1, 2L -> 0, 3L -> 0))
  }

  test("hand-computed DSIR ranking with smoothing and OOV fallback") {
    // raw counts: a=2 b=3 z=1 (N_r=6, V_r=3)
    //   s_r: a -> 9 div 3 = 3 -> 1; b -> 9 div 4 = 2 -> 1; z -> 9 div 2 = 4 -> 2
    // target "a a b": a=2 b=1 (N_t=3, V_t=2)
    //   s_t: a -> 5 div 3 = 1 -> 0; b -> 5 div 2 = 2 -> 1; OOV -> log2(5) -> 2
    // llr: d1(a,b) = 1+0 = 1; d2(a,z) = 1+0 = 1; d3(b,b) = 0
    val raw = Seq((1L, "a b"), (2L, "a z"), (3L, "b b"))
      .toDF("doc_id", "text")
    val target = Seq((10L, "a a b")).toDF("doc_id", "text")
    val got = UnigramLm.importanceRank(raw, target, "doc_id", "text",
      topN = 2)
      .select("doc_id", "n_tokens", "llr_q", "rank")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L, 1), (2L, 2L, 1L, 2))) // tie -> id asc
  }

  test("surprisal is partition-independent and total on real docs") {
    val docs = Tables.documents(spark, sf)
    val a = UnigramLm.surprisal(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a.length == docs.count())
    val b = UnigramLm.surprisal(docs.repartition(13), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    // every mean is the one division of its exact sums
    a.filter(_.getLong(1) > 0).foreach { r =>
      assert(r.getDouble(3) == r.getLong(2).toDouble / r.getLong(1).toDouble)
    }
  }

  test("importanceRank returns exactly topN ranked rows on real docs") {
    val docs = Tables.documents(spark, sf)
    val top = UnigramLm.importanceRank(docs,
      docs.filter(col("lang") === "en"), "doc_id", "text", topN = 50)
      .collect()
    assert(top.length == 50)
    assert(top.map(_.getInt(3)).toSeq == (1 to 50))
    // ranks follow (llr desc, id asc)
    val ordered = top.sortBy(_.getInt(3))
      .map(r => (r.getLong(2), r.getLong(0))).toSeq
    assert(ordered == ordered.sortBy { case (llr, id) => (-llr, id) })
  }
}
