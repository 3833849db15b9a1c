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

  test("epoch mixture: budgets above supply repeat docs, budgets below " +
      "take a prefix, and every budget is met") {
    // src0 supply is ~1533 tokens at sf0.001 — budget 4000 forces
    // 2 full epochs + a partial; src1 budget 500 is subset-only
    val budgets = Map("src0" -> 4000L, "src1" -> 500L)
    val got = Mixture.tokenBudgetEpochs(docs, "doc_id", "source",
      "n_tokens", budgets, nBuckets = 4)
    val bySrc = got.groupBy("source")
      .agg(sum(col("n_tokens") * col("n_epochs")).as("eff"),
        max("n_epochs").as("maxe"), min("n_epochs").as("mine"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val supply = docs.filter(col("source") === "src0")
      .agg(sum("n_tokens")).head().getLong(0)
    val full = 4000L / supply
    assert(full >= 1, s"test premise: src0 supply $supply must be < 4000")
    // src0: every doc appears (full epochs for all), some get +1
    assert(bySrc("src0")._4 == docs.filter(col("source") === "src0").count())
    assert(bySrc("src0")._3 == full && bySrc("src0")._2 == full + 1)
    // effective token mass covers the budget but stops at the
    // crossing doc
    assert(bySrc("src0")._1 >= 4000L)
    // src1: subset, single epoch each
    assert(bySrc("src1")._2 == 1L && bySrc("src1")._1 >= 500L)
    assert(bySrc.keySet == Set("src0", "src1")) // unbudgeted drop
    // the partial-epoch prefix is the SAME md5 order tokenBudget uses:
    // src1's epoch selection == tokenBudget's selection at that budget
    val viaBudget = Mixture.tokenBudget(docs.filter(col("source") === "src1"),
        "doc_id", "source", "n_tokens", Map("src1" -> 500L), nBuckets = 4)
      .select("doc_id").as[Long].collect().toSet
    val viaEpochs = got.filter(col("source") === "src1")
      .select("doc_id").as[Long].collect().toSet
    assert(viaBudget == viaEpochs)
  }

  test("epoch mixture: null-id rows do not inflate the epoch denominator") {
    // an unselectable (null-id) row must not count as supply — with it
    // in the denominator, budget == selectable supply would compute 0
    // full epochs + a partial instead of exactly 1 full epoch
    val rows = Seq((Some(1L), "d", 100), (Some(2L), "d", 100),
      (Option.empty[Long], "d", 100))
      .toDF("doc_id", "source", "n_tokens")
    val got = Mixture.tokenBudgetEpochs(rows, "doc_id", "source",
      "n_tokens", Map("d" -> 200L), nBuckets = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L),
      s"budget == selectable supply must be exactly one epoch, got $got")
  }

  test("epoch mixture: an exact-multiple budget yields no partial epoch") {
    val supply = docs.filter(col("source") === "src2")
      .agg(sum("n_tokens")).head().getLong(0)
    val got = Mixture.tokenBudgetEpochs(docs, "doc_id", "source",
      "n_tokens", Map("src2" -> 2 * supply), nBuckets = 4)
    val epochs = got.select("n_epochs").as[Long].collect().toSet
    assert(epochs == Set(2L), s"expected uniform 2 epochs, got $epochs")
  }

  test("temperature budgets: integer-exact √supply flattening, both " +
      "consumption branches") {
    val b = Mixture.temperatureBudgets(docs, "source", "n_tokens", 26000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val supply = docs.groupBy("source").agg(sum("n_tokens").cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // replay the math in plain Scala: w = floor(sqrt(supply)),
    // budget = total * w / Σw in long arithmetic
    val w = supply.view.mapValues(s => math.sqrt(s.toDouble).toLong).toMap
    val wsum = w.values.sum
    assert(b == w.view.mapValues(v => 26000L * v / wsum).toMap)
    // flattening must upweight SMALL domains: budget share > raw share
    val (smallest, minSupply) = supply.minBy(_._2)
    val total = supply.values.sum
    assert(b(smallest).toDouble / b.values.sum >
      minSupply.toDouble / total)
    // and the composed selection honors ordinary budget semantics
    val sel = Mixture.tokenBudgetFrom(docs, "doc_id", "source", "n_tokens",
      Mixture.temperatureBudgets(docs, "source", "n_tokens", 26000L),
      nBuckets = 4)
    val perDomain = sel.groupBy("source")
      .agg(max("cum_tokens").cast("long").as("consumed"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perDomain.foreach { case (k, consumed) =>
      assert(consumed >= math.min(b(k), supply(k)), s"$k undershot")
      assert(consumed <= supply(k))
    }
  }

  test("temperature budgets: a small domain crosses its supply and is " +
      "kept whole; a large one subsets") {
    // controlled supplies: big 100×1-token docs, small 4×1-token docs.
    // w = (10, 2), Σw = 12; total 60 → budgets (50, 10): the small
    // domain's 10 > its supply 4 (flattening upweighted it past its
    // own mass — kept whole), the big domain subsets 50 of 100.
    val rows = ((1L to 100L).map(i => (i, "big", "x")) ++
      (201L to 204L).map(i => (i, "small", "x")))
      .toDF("doc_id", "source", "text")
      .withColumn("n_tokens", lit(1L))
    val b = Mixture.temperatureBudgets(rows, "source", "n_tokens", 60L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(b == Map("big" -> 50L, "small" -> 10L), b.toString)
    val sel = Mixture.tokenBudgetFrom(rows, "doc_id", "source", "n_tokens",
      Mixture.temperatureBudgets(rows, "source", "n_tokens", 60L),
      nBuckets = 2)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sel == Map("big" -> 50L, "small" -> 4L), sel.toString)
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
