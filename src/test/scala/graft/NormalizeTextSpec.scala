package graft

import org.apache.spark.sql.functions._
import graft.functions.exprs

/** functions.NormalizeText: the one-pass NFC + lower + whitespace
  * canonicalizer (q131). */
class NormalizeTextSpec extends SparkTestBase {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(exprs.normalize_text(col("t"))).head().getString(0)

  test("lowercase, collapse runs, trim edges") {
    assert(norm("  Hello\t\tWORLD  \n x ") == "hello world x")
    assert(norm("a  b") == "a b")
    assert(norm("") == "")
    assert(norm(" \t\n ") == "")
    assert(norm("already clean") == "already clean")
  }

  test("NFC: decomposed and precomposed forms canonicalize identically") {
    val composed = "caf\u00e9"          // e-acute precomposed
    val decomposed = "cafe\u0301"       // e + combining acute
    assert(composed != decomposed)     // distinct sequences going in
    assert(norm(composed) == norm(decomposed))
    assert(norm(decomposed) == "caf\u00e9")
  }

  test("equal content differing only in case/space/form hashes equal after") {
    val df = Seq(
      (1L, "The  Quick\tBrown Fox"),
      (2L, " the quick brown fox"),
      (3L, "a different document")).toDF("id", "t")
    val h = df.select(col("id"),
        md5(exprs.normalize_text(col("t"))).as("h"))
      .as[(Long, String)].collect().toMap
    assert(h(1L) == h(2L) && h(1L) != h(3L))
  }

  test("null in, null out; registered for SQL") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT normalize_text('  A  b '), normalize_text(CAST(NULL AS STRING))"
    ).head()
    assert(r.getString(0) == "a b" && r.isNullAt(1))
  }

  test("interpreted eval agrees with the codegen path") {
    // force the interpreted path through a direct Expression eval
    val e = graft.functions.NormalizeText(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(" X́  y\tZ ")))
    val interp = e.eval(null).toString
    assert(interp == norm(" X́  y\tZ "))
  }
}
