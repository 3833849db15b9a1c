package graft

import org.apache.spark.sql.functions._
import graft.sim.Bitext

/** sim.Bitext: margin-based bitext mining (ratio margin, fixed-point
  * cosine codes, hub suppression). */
class BitextSpec extends SparkTestBase {
  import spark.implicits._

  test("true pair clears the margin; hub-induced best match does not") {
    // s0 has a genuine counterpart (t10, cos ~0.998); s1's best match
    // is a hub-ish target whose cosine is barely above its
    // neighborhood, so the ratio margin stays under 1.10
    val src = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val tgt = Seq(
      (10L, Array(0.9, 0.05, 0.0, 0.0)),   // s0's translation
      (11L, Array(0.6, 0.6, 0.0, 0.0)),    // hub: close to both
      (12L, Array(0.55, 0.65, 0.0, 0.0))   // hub: s1's best
    ).toDF("vec_id", "embedding")
    val rows = Bitext.mine(src, tgt, k = 2, marginMin = 1.10)
      .orderBy("src_id").collect()
    assert(rows.length == 2) // one row per source vector
    assert(rows(0).getAs[Long]("tgt_id") == 10L)
    assert(rows(0).getAs[Boolean]("mined"))
    assert(rows(1).getAs[Long]("tgt_id") == 12L)
    assert(!rows(1).getAs[Boolean]("mined"))
    assert(rows(0).getAs[Long]("margin_code")
      > rows(1).getAs[Long]("margin_code"))
  }

  test("equal-cosine ties break by ascending target id") {
    val src = Seq((0L, Array(1.0, 0.0))).toDF("vec_id", "embedding")
    val tgt = Seq(
      (7L, Array(1.0, 0.0)), (5L, Array(1.0, 0.0)),
      (9L, Array(0.0, 1.0))).toDF("vec_id", "embedding")
    val r = Bitext.mine(src, tgt, k = 2, marginMin = 1.0).head()
    assert(r.getAs[Long]("tgt_id") == 5L)
  }

  test("a zero neighborhood denominator emits code 0, never an inf cast") {
    // every source-target cosine is exactly 0 → fsum = bsum = 0
    val src = Seq((0L, Array(1.0, 0.0))).toDF("vec_id", "embedding")
    val tgt = Seq((5L, Array(0.0, 1.0)), (7L, Array(0.0, -1.0)))
      .toDF("vec_id", "embedding")
    val r = Bitext.mine(src, tgt, k = 2, marginMin = 1.10).head()
    assert(r.getAs[Long]("margin_code") == 0L)
    assert(!r.getAs[Boolean]("mined"))
  }

  test("one row per source on real data; margin codes are stable") {
    val e = Tables.embeddings(spark, sf)
    val lang = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
    val byLang = e.join(lang, col("vec_id") === col("doc_id"))
    def side(l: String) = byLang.filter(col("lang") === l)
      .select(col("vec_id"), col("embedding"))
    val once = Bitext.mine(side("en"), side("de"), k = 4, marginMin = 1.10)
    val nSrc = side("en").count()
    assert(once.count() == nSrc)
    // deterministic: a second run hashes identically
    val a = once.orderBy("src_id").collect().toSeq
    val b = Bitext.mine(side("en"), side("de"), k = 4, marginMin = 1.10)
      .orderBy("src_id").collect().toSeq
    assert(a == b)
  }
}
