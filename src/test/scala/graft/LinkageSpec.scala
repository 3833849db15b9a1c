package graft

import org.apache.spark.sql.functions._
import graft.ops.Linkage

/** ops.Linkage: Fellegi-Sunter scoring over a declared field table. */
class LinkageSpec extends SparkTestBase {
  import spark.implicits._

  private val fields = Seq(
    Linkage.Field("name", col("a_name") === col("b_name"), 20L, -5L),
    Linkage.Field("city", col("a_city") === col("b_city"), 8L, -2L))

  test("score is the exact sum of agree/disagree weights; threshold decides") {
    val pairs = Seq(
      (1L, 2L, "ann", "ann", "nyc", "nyc"),   // both agree: 28
      (1L, 3L, "ann", "ann", "nyc", "sfo"),   // name only: 18
      (1L, 4L, "ann", "bob", "nyc", "nyc"),   // city only: 3
      (1L, 5L, "ann", "bob", "nyc", "sfo"))   // none: -7
      .toDF("a_id", "b_id", "a_name", "b_name", "a_city", "b_city")
    val out = Linkage.scorePairs(pairs, fields, matchThreshold = 18L)
      .collect().map(r => r.getAs[Long]("b_id") ->
        (r.getAs[Long]("score"), r.getAs[Boolean]("is_match"))).toMap
    assert(out(2L) == (28L, true))
    assert(out(3L) == (18L, true))
    assert(out(4L) == (3L, false))
    assert(out(5L) == (-7L, false))
  }

  test("null attributes take the disagree weight (absent evidence is not agreement)") {
    val pairs = Seq((1L, 2L, null.asInstanceOf[String], "ann", "nyc", "nyc"))
      .toDF("a_id", "b_id", "a_name", "b_name", "a_city", "b_city")
    val r = Linkage.scorePairs(pairs, fields, matchThreshold = 18L).head()
    assert(r.getAs[Long]("score") == -5L + 8L)
    // the flag itself stays null — the score took the conservative
    // branch without inventing a false disagreement fact
    assert(r.isNullAt(r.fieldIndex("name_agree")))
  }

  test("banded-distance fields compose: scoring the real sorted-neighborhood candidates") {
    val docs = Tables.documents(spark, sf)
    val cands = graft.dedup.SortedNeighborhood.candidatePairs(
      docs, "doc_id", "text", window = 3, levPrefix = 48, threshold = 2)
    val a = docs.select(col("doc_id").as("a_id"), col("lang").as("a_lang"))
    val b = docs.select(col("doc_id").as("b_id"), col("lang").as("b_lang"))
    val scored = Linkage.scorePairs(cands.join(a, "a_id").join(b, "b_id"),
      Seq(Linkage.Field("title", col("lev") <= 2, 22L, -6L),
        Linkage.Field("lang", col("a_lang") === col("b_lang"), 14L, -3L)),
      matchThreshold = 30L)
    // every match's fields must actually both agree (30 forces both)
    val m = scored.filter(col("is_match")).collect()
    m.foreach { r =>
      assert(r.getAs[Boolean]("title_agree") && r.getAs[Boolean]("lang_agree"))
      assert(r.getAs[Long]("score") == 36L)
    }
    // and the score column never disagrees with a recomputation
    scored.collect().foreach { r =>
      val want = (if (r.getAs[Boolean]("title_agree")) 22L else -6L) +
        (if (!r.isNullAt(r.fieldIndex("lang_agree")) &&
          r.getAs[Boolean]("lang_agree")) 14L else -3L)
      assert(r.getAs[Long]("score") == want)
    }
  }
}
