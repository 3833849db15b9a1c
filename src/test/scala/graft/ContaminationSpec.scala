package graft

import org.apache.spark.sql.functions._
import graft.text.Contamination

/** text.Contamination: n-gram-overlap decontamination flagging. */
class ContaminationSpec extends SparkTestBase {
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "completely unrelated text with no shared phrases at all"),
    // shares the probe's 5-gram window "quick brown fox jumps over"
    // (and its successors) via a copied clause
    (3L, "she said the quick brown fox jumps over everything"),
    (4L, "")).toDF("doc_id", "text")

  val probes = Seq(
    (100L, "the quick brown fox jumps over the fence")).toDF("doc_id", "text")

  test("flag counts distinct shared 5-word shingles and thresholds") {
    val out = Contamination.flag(docs, probes, "doc_id", "text",
        shingleK = 5, minHits = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // doc 1 shares "the quick brown fox jumps", "quick brown fox jumps
    // over", "brown fox jumps over the"
    assert(out(1L)._1 == 3 && out(1L)._2 == 1)
    assert(out(2L) == (0L, 0))
    // doc 3 shares the same two shingles
    assert(out(3L)._1 == 2 && out(3L)._2 == 1)
    // empty doc: its single '' shingle matches nothing
    assert(out(4L) == (0L, 0))
    assert(out.size == 4) // every document gets an explicit decision
  }

  test("a probe document scores as fully contaminated against itself") {
    val out = Contamination.flag(probes, probes, "doc_id", "text")
      .head()
    assert(out.getLong(1) == 4) // 8 tokens -> 4 distinct 5-shingles
    assert(out.getInt(2) == 1)
  }
}
