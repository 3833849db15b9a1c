package graft

import org.apache.spark.sql.functions._
import graft.text.CrossDoc

/** text.CrossDoc: cross-document duplicated-shingle statistics. */
class CrossDocSpec extends SparkTestBase {
  import spark.implicits._

  test("shared fraction counts shingles occurring in other documents") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // 9 toks → 5 shingles
      (2L, "the quick brown fox jumps far away from here"), // shares shingle 1
      (3L, "completely different words in this one here now")
    ).toDF("doc_id", "text")
    val out = CrossDoc.duplicateShingleStats(docs, "doc_id", "text", shingleK = 5)
      .select("doc_id", "n_shingles", "n_shared")
      .as[(Long, Long, Long)].collect().map { case (k, a, b) => k -> ((a, b)) }.toMap
    // only "the quick brown fox jumps" is cross-doc
    assert(out(1L) == ((5L, 1L)))
    assert(out(2L) == ((5L, 1L)))
    assert(out(3L) == ((4L, 0L)))
  }

  test("identical docs share everything; short docs score as one shingle") {
    val docs = Seq(
      (1L, "tiny doc"), (2L, "tiny doc"), (3L, "tiny"), (4L, "a b c d e f")
    ).toDF("doc_id", "text")
    val out = CrossDoc.duplicateShingleStats(docs, "doc_id", "text", 5)
      .select("doc_id", "n_shingles", "n_shared", "shared_fraction")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((1L, 1L, 1.0)))
    assert(out(2L) == ((1L, 1L, 1.0)))
    assert(out(3L) == ((1L, 0L, 0.0)))
    assert(out(4L) == ((2L, 0L, 0.0)))
  }

  test("no pair frame: equi-join back (broadcast here), no nested loop") {
    val docs = (1L to 50L).map(i => (i, s"w${i % 5} x y z q r s")).toDF("doc_id", "text")
    val plan = CrossDoc.duplicateShingleStats(docs, "doc_id", "text", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"), plan)
  }
}
