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

  test("removeSpans scrubs exactly the covered positions") {
    val out = Contamination.removeSpans(docs, probes, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3)))
      .toMap
    // doc 1: matching shingles start at positions 1, 2, 3 -> cover
    // positions 1..7 ("the quick brown fox jumps over the"); tokens
    // 8..10 survive
    assert(out(1L) == ((10, 7, "lazy dog tonight")))
    // doc 2: untouched, reassembled verbatim
    assert(out(2L) == ((9,
      0, "completely unrelated text with no shared phrases at all")))
    // doc 3: shingles at 3, 4 -> cover 3..8; "she said" + "everything"
    assert(out(3L) == ((9, 6, "she said everything")))
    // empty doc: zero tokens, nothing to remove, empty reassembly
    assert(out(4L) == ((0, 0, "")))
    assert(out.size == 4)
  }

  test("removeSpans drops a short doc entirely on a whole-text match") {
    // m < k docs are ONE whole-text shingle (the flag convention): a
    // probe containing that exact window scrubs the full document
    val shorts = Seq((7L, "quick brown fox"), (8L, "slow green turtle"))
      .toDF("doc_id", "text")
    val probe = Seq((100L, "quick brown fox")).toDF("doc_id", "text")
    val out = Contamination.removeSpans(shorts, probe, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3)))
      .toMap
    assert(out(7L) == ((3, 3, "")))
    assert(out(8L) == ((3, 0, "slow green turtle")))
  }

  test("an empty doc matching an empty probe doc removes zero positions") {
    // the '' shingles match, but there is no position to cover — and
    // the cover must not fall into Spark's descending sequence(1, 0)
    val out = Contamination.removeSpans(
        Seq((9L, "")).toDF("doc_id", "text"),
        Seq((100L, "")).toDF("doc_id", "text"), "doc_id", "text")
      .head()
    assert((out.getInt(1), out.getInt(2), out.getString(3)) == ((0, 0, "")))
  }
}
