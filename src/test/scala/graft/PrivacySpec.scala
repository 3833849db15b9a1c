package graft

import org.apache.spark.sql.functions._
import graft.ops.Privacy

/** ops.Privacy: k-anonymity suppression over quasi-identifiers. */
class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  test("rare combos suppress every quasi column; common combos ship") {
    val df = Seq(
      (1L, "en", "a"), (2L, "en", "a"), (3L, "en", "a"),
      (4L, "de", "b"), (5L, "de", "c")).toDF("id", "lang", "src")
    val out = Privacy.kAnonymize(df, "id", Seq("lang", "src"), k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3),
          r.getBoolean(4)))).toMap
    assert(out(1L) == (("en", "a", 3L, false)))
    assert(out(4L) == (("*", "*", 1L, true)))
    assert(out(5L) == (("*", "*", 1L, true)))
    assert(out.size == 5)
  }

  test("null quasi values form a combination and are k-checked, not exempted") {
    val df = Seq(
      (1L, null, "a"), (2L, null, "a"),
      (3L, "en", null)).toDF("id", "lang", "src")
    val out = Privacy.kAnonymize(df, "id", Seq("lang", "src"), k = 2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out == Map(1L -> false, 2L -> false, 3L -> true))
  }

  test("total and deterministic on real data") {
    val d = Tables.documents(spark, sf)
    val out = Privacy.kAnonymize(d, "doc_id", Seq("lang", "source"), 5)
    assert(out.count() == d.count())
    val masked = out.filter(col("suppressed"))
    assert(masked.filter(col("lang") =!= "*" || col("source") =!= "*").isEmpty)
    assert(masked.count() > 0)
  }
}
