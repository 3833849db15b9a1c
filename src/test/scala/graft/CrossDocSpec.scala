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

  test("snapshotNovelty scores fresh docs against the reference shingles") {
    val ref = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "shared boilerplate footer text lives right here")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // all seen
      (11L, "shared boilerplate footer text lives right here today"), // 4 shingles, 3 seen
      (12L, "entirely new words that no reference doc carries")       // all novel
    ).toDF("doc_id", "text")
    val out = CrossDoc.snapshotNovelty(ref, fresh, "doc_id", "text", 5)
      .select("doc_id", "n_shingles", "n_novel", "novelty_fraction")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(10L) == ((5L, 0L, 0.0)))
    assert(out(11L) == ((4L, 1L, 0.25)))
    assert(out(12L) == ((4L, 4L, 1.0)))
  }

  test("firstCarrierStats: originals own their shingles, copies own none") {
    val docs = Seq(
      (1L, "a b c d e f"),  // 2 shingles, both introduced
      (2L, "a b c d e f"),  // exact copy: introduces nothing
      (3L, "x y z")         // short doc: its whole text, introduced
    ).toDF("doc_id", "text")
    val out = CrossDoc.firstCarrierStats(docs, "doc_id", "text", 5)
      .select("doc_id", "n_shingles", "n_introduced", "novelty_fraction")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((2L, 2L, 1.0)))
    assert(out(2L) == ((2L, 0L, 0.0)))
    assert(out(3L) == ((1L, 1L, 1.0)))
  }

  test("snapshotNovelty is total over fresh docs; fractions in [0,1]") {
    val d = Tables.documents(spark, sf)
    val fresh = d.filter(col("doc_id") % 7 === 0)
    val out = CrossDoc.snapshotNovelty(
      d.filter(col("doc_id") % 7 =!= 0), fresh, "doc_id", "text", 5)
    assert(out.count() == fresh.count())
    val bad = out.filter(col("novelty_fraction") < 0.0
      || col("novelty_fraction") > 1.0 || col("n_novel") > col("n_shingles"))
    assert(bad.isEmpty)
  }

  test("no pair frame: equi-join back (broadcast here), no nested loop") {
    val docs = (1L to 50L).map(i => (i, s"w${i % 5} x y z q r s")).toDF("doc_id", "text")
    val plan = CrossDoc.duplicateShingleStats(docs, "doc_id", "text", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"), plan)
  }

  test("removeSharedSpans keeps one copy: the lowest-id carrier") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon tail one"),   // keeper of the shared 5-gram
      (2L, "alpha beta gamma delta epsilon tail two"),   // scrubbed: positions 1..6
      (3L, "totally unrelated words live in here today") // untouched
    ).toDF("doc_id", "text")
    val out = CrossDoc.removeSharedSpans(docs, "doc_id", "text", shingleK = 5)
      .select("doc_id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Int, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((7, 0, "alpha beta gamma delta epsilon tail one")))
    // doc 2 shares shingles at i=1 ("alpha..epsilon") and i=2
    // ("beta..tail") -> covered positions 1..6, "two" survives
    assert(out(2L) == ((7, 6, "two")))
    assert(out(3L) == ((7, 0, "totally unrelated words live in here today")))
  }

  test("removeSharedSpans: a doc can keep one span and lose another") {
    val docs = Seq(
      (1L, "shared one two three four ending alpha"),
      (2L, "shared one two three four ending beta prefix five six seven eight nine"),
      (3L, "other prefix five six seven eight nine")
    ).toDF("doc_id", "text")
    val out = CrossDoc.removeSharedSpans(docs, "doc_id", "text", shingleK = 5)
      .select("doc_id", "n_removed").as[(Long, Int)].collect().toMap
    assert(out(1L) == 0)           // keeper of "shared one two three four"+
    assert(out(2L) > 0)            // loses the first span (doc 1 keeps it)
    assert(out(3L) > 0)            // loses "prefix five six seven.." to doc 2
  }

  test("removeSharedSpans: identical short docs survive only once") {
    val docs = Seq(
      (7L, "tiny doc"), (8L, "tiny doc"), (9L, "tiny doc")
    ).toDF("doc_id", "text")
    val out = CrossDoc.removeSharedSpans(docs, "doc_id", "text", shingleK = 5)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(out(7L) == "tiny doc")       // min-id keeper
    assert(out(8L) == "" && out(9L) == "")
  }

  test("removeSharedSpans refuses minDocs < 2") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      CrossDoc.removeSharedSpans(docs, "doc_id", "text", 5, minDocs = 1).count())
    assert(e.getMessage.contains("unshared"), e.getMessage)
  }

  test("removeSharedLines: lowest-id carrier keeps, others scrubbed") {
    val docs = Seq(
      (1L, "header menu\nunique one\nfooter text"),
      (2L, "header menu\nunique two\nfooter text"),
      (3L, "nothing shared here")
    ).toDF("doc_id", "text")
    val out = CrossDoc.removeSharedLines(docs, "doc_id", "text")
      .select("doc_id", "n_lines", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((3L, 0L, "header menu\nunique one\nfooter text")))
    assert(out(2L) == ((3L, 2L, "unique two")))
    assert(out(3L) == ((1L, 0L, "nothing shared here")))
  }

  test("removeSharedLines: empty lines are structure, never deduped") {
    val docs = Seq(
      (1L, "para one\n\npara two"),
      (2L, "other one\n\nother two") // shares only the blank line
    ).toDF("doc_id", "text")
    val out = CrossDoc.removeSharedLines(docs, "doc_id", "text")
      .select("doc_id", "n_removed", "clean_text")
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((0L, "para one\n\npara two")))
    assert(out(2L) == ((0L, "other one\n\nother two")))
  }

  test("removeSharedLines: keeper keeps ALL its occurrences, loser loses all") {
    val docs = Seq(
      (1L, "dup\nmid\ndup"),
      (2L, "dup\nown\ndup")
    ).toDF("doc_id", "text")
    val out = CrossDoc.removeSharedLines(docs, "doc_id", "text")
      .select("doc_id", "n_removed", "clean_text")
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((0L, "dup\nmid\ndup")))
    assert(out(2L) == ((2L, "own")))
  }

  test("removeSharedLines: total frame — a doc losing everything stays") {
    val docs = Seq(
      (1L, "only line"),
      (2L, "only line")
    ).toDF("doc_id", "text")
    val out = CrossDoc.removeSharedLines(docs, "doc_id", "text")
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(out(1L) == "only line" && out(2L) == "")
  }
}
