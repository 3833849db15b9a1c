package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Physical-plan regressions: the scale posture (pushdown, pruning,
  * broadcast choice, shuffle count) must not silently erode. */
class PlanSpec extends SparkTestBase {

  private def planString(df: DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }
  private def finalPlan(df: DataFrame) = {
    // force execution so AQE settles
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // pre-AQE plan: AdaptiveSparkPlanExec hides children from collect
  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }

  test("q01: shipdate filter pushed to the parquet scan, columns pruned") {
    val df = q("q01_pricing_summary")
    val s = planString(df)
    assert(s.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), s)
    val scan = scans(df).head
    assert(!scan.requiredSchema.fieldNames.contains("l_orderkey"),
      "scan should not read unused key columns")
  }

  test("q03: dimension joins are broadcast, not shuffle") {
    val p = finalPlan(q("q03_region_revenue"))
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("q09: single aggregation exchange, partial aggregation map-side") {
    val p = finalPlan(q("q09_monthly_report"))
    val shuffles = p.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 1, s"expected 1 exchange, got ${shuffles.size}:\n$p")
    val s = p.toString
    assert(s.contains("HashAggregate"), s)
  }

  test("q02: projection prunes the lineitem scan to the 5 used columns") {
    val scan = scans(q("q02_filter_project")).head
    assert(scan.requiredSchema.fields.length == 5,
      scan.requiredSchema.treeString)
  }

  test("q24: recompute count stays bounded and cartesian-free") {
    // the measured-fastest shape recomputes the n-gram subtree per
    // consumer: 2 candidate-join sides × (toks + df agg) + 2 verify
    // join-backs = 6 scans. A 7th means someone added a recompute
    // path; an InMemoryTableScan means someone re-added the columnar
    // array cache (measured slower than recompute AND it poisons AQE
    // join choices on later invocations — see Dedup.scala).
    val df = q("q24_ngram_jaccard_pairs")
    assert(scans(df).size == 6, s"expected 6 documents scans, got ${scans(df).size}")
    val s = planString(df)
    assert(!s.contains("InMemoryTableScan"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q25: multi-table LSH probes broadcast; no cartesian anywhere") {
    val p = finalPlan(q("q25_ann_lsh"))
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q42: IVF centroid assignment broadcasts the centroid set") {
    val p = finalPlan(q("q42_ann_ivf"))
    val s = p.toString
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q33: set-op classification is one scan + one exchange") {
    val df = q("q33_set_ops")
    assert(scans(df).size == 1,
      s"expected a single lineitem scan, got ${scans(df).size}")
    val p = finalPlan(df)
    val shuffles = p.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 1, s"expected 1 exchange, got ${shuffles.size}:\n$p")
  }
}
