package graft

import org.apache.spark.sql.functions._
import graft.functions.exprs.{char_entropy_proxy, char_distinct_cp}

/** functions.CharEntropyProxy / CharDistinctCp: the whole-bit
  * character-diversity kernels, against hand arithmetic, an explode-
  * based recomputation, and the codegen path. */
class EntropySpec extends SparkTestBase {
  import spark.implicits._

  private def run(texts: String*): Seq[(Long, Int)] =
    texts.toDF("t")
      .select(char_entropy_proxy(col("t")).as("p"),
        char_distinct_cp(col("t")).as("d"))
      .collect().toSeq.map(r => (r.getLong(0), r.getInt(1)))

  test("hand cases: the proxy is sum of count*floor(log2 count)") {
    // "aaaa": one char, count 4 -> 4*2 = 8
    // "abab": two chars, count 2 each -> 2*1 + 2*1 = 4
    // "abcd": four singletons -> 0
    // "": empty -> (0, 0)
    assert(run("aaaa", "abab", "abcd", "") ==
      Seq((8L, 1), (4L, 2), (0L, 4), (0L, 0)))
  }

  test("non-ASCII code points count as single characters") {
    // U+00E9 twice + 'x': counts {é: 2, x: 1} -> 2*1 + 1*0 = 2, d = 2
    assert(run("ééx") == Seq((2L, 2)))
    // astral plane (surrogate pair in UTF-16): one CODE POINT, twice
    val g = new String(Character.toChars(0x1F600))
    assert(run(g + g) == Seq((2L, 1)))
  }

  test("expression ≡ explode-based recomputation on the real corpus sample") {
    val docs = Tables.documents(spark, sf).limit(100).cache()
    val viaExpr = docs.select(col("doc_id"),
        char_entropy_proxy(col("text")).as("p"),
        char_distinct_cp(col("text")).as("d"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val viaExplode = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .groupBy("doc_id", "c").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum(col("n") * (length(bin(col("n"))) - 1)).as("p"),
        count(lit(1)).cast("int").as("d"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(viaExpr.size == 100 && viaExpr == viaExplode)
  }

  test("null text yields null, not a crash") {
    val r = Seq((1L, Option.empty[String]), (2L, Some("xy")))
      .toDF("id", "t")
      .select(col("id"), char_entropy_proxy(col("t")).as("p"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(r(1L).isEmpty && r(2L).contains(0L))
  }
}
