package graft

import org.apache.spark.sql.functions._
import graft.text.Winnow

/** text.Winnow: MOSS-style winnowed document fingerprints. */
class WinnowSpec extends SparkTestBase {
  import spark.implicits._

  test("window=1 selects every k-gram position exactly once") {
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text") // 4 3-grams
    val out = Winnow.fingerprints(docs, "doc_id", "text",
      shingleK = 3, window = 1).orderBy("pos").collect()
    assert(out.map(_.getAs[Int]("pos")).toSeq == Seq(1, 2, 3, 4))
  }

  test("short documents emit exactly one whole-text fingerprint at pos 1") {
    val docs = Seq((1L, "tiny doc"), (2L, "one")).toDF("doc_id", "text")
    val out = Winnow.fingerprints(docs, "doc_id", "text", 3, 4)
    assert(out.count() == 2)
    assert(out.filter(col("pos") =!= 1).isEmpty)
  }

  test("winnowing guarantee: docs sharing a run of >= w+k-1 tokens share a fingerprint hash") {
    // an 8-token shared run (6 consecutive shared 3-gram hashes, w=4)
    // embedded in different surroundings
    val run = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    val docs = Seq(
      (1L, s"zz qq $run pp"),
      (2L, s"mm $run nn oo rr")).toDF("doc_id", "text")
    val out = Winnow.fingerprints(docs, "doc_id", "text", 3, 4)
    val a = out.filter(col("doc_id") === 1L)
      .select("fp").as[Long].collect().toSet
    val b = out.filter(col("doc_id") === 2L)
      .select("fp").as[Long].collect().toSet
    assert(a.intersect(b).nonEmpty)
  }

  test("candidatePairs: shared-run docs pair up, unrelated docs never do") {
    val run = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    val docs = Seq(
      (1L, s"aa bb $run cc"),
      (2L, s"dd $run ee ff"),
      (3L, "entirely different words that share nothing with the others at all"))
      .toDF("doc_id", "text")
    val pairs = Winnow.candidatePairs(docs, "doc_id", "text",
        shingleK = 3, window = 4, minShared = 2)
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 >= 2L)
  }

  test("candidatePairs flood cap: a ubiquitous fingerprint emits no pairs") {
    // 30 docs all equal to one short text: every fingerprint's carrier
    // set is 30 > maxCarrier=10 → capped out, zero candidate pairs
    val docs = (1L to 30L).map(i => (i, "the same boilerplate line"))
      .toDF("doc_id", "text")
    val pairs = Winnow.candidatePairs(docs, "doc_id", "text",
      3, 4, minShared = 1, maxCarrier = 10)
    assert(pairs.isEmpty)
  }

  test("density: every complete window of w hashes contains a selected position") {
    val d = Tables.documents(spark, sf).limit(50)
    val w = 4
    val out = Winnow.fingerprints(d, "doc_id", "text", 3, w)
    // recompute per doc: selected positions must stab every window
    val sel = out.collect().groupBy(_.getAs[Long]("doc_id"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Int]("pos")).sorted }
    val lens = d.select(col("doc_id"),
        greatest(size(graft.functions.exprs.ws_tokens(col("text"))) - 2,
          lit(1)).as("n"))
      .as[(Long, Int)].collect().toMap
    sel.foreach { case (doc, positions) =>
      val n = lens(doc)
      (w to n).foreach { end =>
        assert(positions.exists(p => p > end - w && p <= end),
          s"doc $doc window ending at $end unstabbed")
      }
    }
  }
}
