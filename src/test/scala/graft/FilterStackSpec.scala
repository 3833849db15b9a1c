package graft

import org.apache.spark.sql.functions._
import graft.text.{FilterStack, Repetition, TextFunctions, UnigramLm}

/** text.FilterStack: the composed modern filter stack (q109) — each
  * flag must equal its constituent operator run alone. */
class FilterStackSpec extends SparkTestBase {
  import spark.implicits._

  private val lo = 3.95
  private val hi = 4.15

  test("flags ≡ the constituent operators run alone; kept = conjunction") {
    val docs = Tables.documents(spark, sf)
    val got = FilterStack.modernGates(docs, "doc_id", "text", lo, hi)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
      .toMap
    assert(got.size == docs.count())
    val rep = Repetition.gopherFilter(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val ppl = UnigramLm.perplexityBand(docs, "doc_id", "text", lo, hi)
      .select("doc_id", "kept").as[(Long, Int)].collect().toMap
    val clf = docs.where(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.exprs.classifier_score(
          TextFunctions.tokens(col("text"))).as("s"))
      .as[(Long, Long)].collect().toMap
    val fps = docs
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("f"))
      .as[(Long, String)].collect()
    val keeper = fps.groupBy(_._2).map { case (_, g) => g.map(_._1).min }.toSet
    got.foreach { case (id, (r, p, c, u, k)) =>
      assert(r == (if (rep(id)) 1 else 0), s"rep flag for $id")
      assert(p == ppl(id), s"ppl flag for $id")
      assert(c == (if (clf.get(id).exists(_ > 0L)) 1 else 0), s"clf flag for $id")
      assert(u == (if (keeper(id)) 1 else 0), s"uniq flag for $id")
      assert(k == (if (r == 1 && p == 1 && c == 1 && u == 1) 1 else 0))
    }
  }

  test("an exact duplicate fails only the uniq gate on the copy") {
    val docs = Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"), col("text"))
    val dup = docs.filter(col("doc_id") === 1)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val out = FilterStack.modernGates(docs.unionByName(dup), "doc_id",
        "text", lo, hi)
      .filter(col("doc_id") === 1 || col("doc_id") === 100001L)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    val (orig, copy) = (out(1L), out(100001L))
    assert(orig._4 == 1 && copy._4 == 0) // min-id keeps, copy fails
    assert((orig._1, orig._2, orig._3) == ((copy._1, copy._2, copy._3)))
  }

  test("modernGates is partition-independent") {
    val docs = Tables.documents(spark, sf)
    def run(d: org.apache.spark.sql.DataFrame) =
      FilterStack.modernGates(d, "doc_id", "text", lo, hi)
        .as[(Long, Int, Int, Int, Int, Int)].collect().toSeq.sorted
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("calibratedScores: per-source percentiles match the window form") {
    val docs = Tables.documents(spark, sf)
    val mine = FilterStack.calibratedScores(docs, "doc_id", "text", "source")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(org.apache.spark.sql.functions.col("source"))
      .orderBy(org.apache.spark.sql.functions.col("score"),
        org.apache.spark.sql.functions.col("doc_id"))
    val want = docs.select(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source"),
        graft.functions.exprs.classifier_score(graft.text.TextFunctions
          .tokens(org.apache.spark.sql.functions.col("text"))).as("score"))
      .withColumn("pct", org.apache.spark.sql.functions.percent_rank().over(w))
    assert(mine.collect().toSet == want.collect().toSet)
    assert(mine.count() == docs.count())
    // percentiles make sources comparable: every source spans [0, 1]
    val spans = mine.groupBy("source")
      .agg(org.apache.spark.sql.functions.min("pct"),
        org.apache.spark.sql.functions.max("pct"))
      .as[(String, Double, Double)].collect()
    assert(spans.nonEmpty && spans.forall { case (_, lo, hi) =>
      lo == 0.0 && hi == 1.0 })
  }
}
