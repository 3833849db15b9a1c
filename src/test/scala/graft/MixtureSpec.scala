package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Mixture
import graft.text.{TextFunctions => TF}

/** ops.Mixture: token-budget mixture build (q71) — two-phase prefix
  * sum vs the naive per-domain window, budget edge semantics. */
class MixtureSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)
    .withColumn("n_tokens", TF.tokenCount(col("text")))

  private val budgets = Map("src0" -> 200L, "src1" -> 120L, "src3" -> 55L)

  /** The naive window form — the shape the DuckDB oracle replays. */
  private def naive = {
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
    val budget = budgets.foldLeft(lit(-1L)) { case (acc, (k, b)) =>
      when(col("source") === k, lit(b)).otherwise(acc)
    }
    docs.withColumn("cum_tokens", sum(col("n_tokens")).over(w).cast("long"))
      .filter(col("cum_tokens") - col("n_tokens") < budget)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))
  }

  test("two-phase mixture is bit-identical to the window form") {
    val got = Mixture.tokenBudget(docs, "doc_id", "source", "n_tokens",
      budgets, nBuckets = 4).orderBy("doc_id").collect().toSeq
    val want = naive.orderBy("doc_id").collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("every budget is met, not undershot: the crossing doc is kept") {
    val got = Mixture.tokenBudget(docs, "doc_id", "source", "n_tokens",
      budgets, nBuckets = 4)
      .groupBy("source").agg(sum("n_tokens").as("toks"),
        max("cum_tokens").as("cum"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    for ((src, b) <- budgets) {
      val (toks, cum) = got(src)
      assert(toks == cum, s"$src: per-domain sum must equal final cum")
      assert(toks >= b, s"$src: budget $b undershot at $toks")
    }
    // and nothing beyond the crossing doc: dropping the LAST selected
    // doc (max cum) must land strictly under the budget
    val lastDropped = Mixture.tokenBudget(docs, "doc_id", "source",
      "n_tokens", budgets, nBuckets = 4)
      .withColumn("rk", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("cum_tokens").desc)))
      .filter(col("rk") > 1)
      .groupBy("source").agg(sum("n_tokens").as("toks"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, b) <- budgets)
      assert(lastDropped.getOrElse(src, 0L) < b,
        s"$src kept a doc past the budget-crossing one")
  }

  test("domains without a budget contribute nothing; selection is " +
      "partition-independent") {
    val sel = Mixture.tokenBudget(docs, "doc_id", "source", "n_tokens",
      budgets, nBuckets = 4)
    assert(sel.select("source").distinct().as[String].collect().toSet ==
      budgets.keySet)
    val re = Mixture.tokenBudget(docs.repartition(13), "doc_id", "source",
      "n_tokens", budgets, nBuckets = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(re == sel.select("doc_id").as[Long].collect().toSet)
  }

  test("the only window over the data partitions by (domain, bucket)") {
    // scale pin: like QuantilesSpec — the data-frame window must
    // include __bkt in its partition spec so no domain funnels through
    // one reducer; per-domain windows run only on the bucket frame.
    val plan = Mixture.tokenBudget(docs, "doc_id", "source", "n_tokens",
      budgets, nBuckets = 4).queryExecution.optimizedPlan.toString
    assert(plan.contains("__bkt"), plan.take(2000))
  }
}
