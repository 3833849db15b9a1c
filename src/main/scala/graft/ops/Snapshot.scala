package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot reconciliation — the "what changed since the last
  * crawl/export" diff every incremental pipeline needs before it can
  * do incremental anything: which documents appeared, vanished, or
  * changed content between two snapshots of the same table. Drives
  * selective re-processing (only `added`/`changed` re-enter the
  * curation loop, [[graft.streaming.IngestLoop]]-style) and audit
  * reporting (`removed` counts catch upstream data loss).
  *
  * Shape: each side collapses to (id, 128-bit content fingerprint) at
  * scan time — the diff never moves document BODIES, only digests —
  * then ONE full-outer equi-join on the id decides the status. Cost
  * is two scans plus a join keyed on the id at digest width,
  * regardless of document size. */
object Snapshot {
  /** Per-id status between two snapshots: `added` (new side only),
    * `removed` (old side only), `changed` (both, different content),
    * `unchanged`. Content identity is md5 over `contentCols` joined
    * with a 0x01 separator (prevents ("ab","c")/("a","bc")
    * boundary collisions; chr(1) replays in any SQL engine). */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
           contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "contentCols must be non-empty")
    def fp(d: DataFrame, as: String) = d.select(col(idCol).as("__id"),
      md5(concat_ws("", contentCols.map(col): _*)).as(as))
    fp(oldSnap, "__fp_old").join(fp(newSnap, "__fp_new"),
        Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__fp_old").isNull, "added")
          .when(col("__fp_new").isNull, "removed")
          .when(col("__fp_old") === col("__fp_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Distribution drift between two snapshots of a numeric feature —
    * the data-quality monitor that catches an upstream change
    * [[diff]]'s id-level statuses can't see (same ids, same texts
    * added/removed in the usual churn, but the POPULATION shifted:
    * suddenly everything is short, or one length band vanished).
    *
    * The feature buckets into fixed-width bins (`value div binWidth`
    * — absolute, not quantile, so the two sides bucket identically by
    * construction and no boundary estimation can drift between them),
    * each side aggregates to |bins| counts, and the report is the
    * full-outer bin join with the RELATIVE RATE ratio in fixed point:
    *
    *   ratio_fp = (new_n · old_total · 10^4) div (old_n · new_total)
    *
    * — 10000 means the bin holds the same SHARE of its snapshot as
    * before, independent of total volume change. Bins present on only
    * one side get a null ratio and always flag. All integer; two
    * corpus scans, bin-keyed aggregates, a |bins|-row join. */
  def driftReport(oldSnap: DataFrame, newSnap: DataFrame,
                  valueCol: String, binWidth: Long,
                  tolerance: Long = 2000): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(d: DataFrame, as: String) = d
      .groupBy(call_function("div", col(valueCol).cast("long"),
        lit(binWidth)).as("bucket"))
      .agg(count(lit(1)).as(as))
    val o = binned(oldSnap, "old_n")
    val n = binned(newSnap, "new_n")
    o.join(n, Seq("bucket"), "full_outer")
      .select(col("bucket"), coalesce(col("old_n"), lit(0L)).as("old_n"),
        coalesce(col("new_n"), lit(0L)).as("new_n"))
      .withColumn("__ot", sum(col("old_n"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("__nt", sum(col("new_n"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("bucket"), col("old_n"), col("new_n"),
        when(col("old_n") > 0 && col("new_n") > 0,
          expr("(new_n * __ot * 10000) DIV (old_n * __nt)")).as("ratio_fp"))
      .withColumn("drifted", coalesce(
        abs(col("ratio_fp") - 10000) > tolerance, lit(true)))
  }

  /** Per-group two-sample Kolmogorov–Smirnov drift between two
    * snapshots of a numeric feature — the binless companion to
    * [[driftReport]]: KS compares whole ECDFs, so it catches a shift
    * that re-buckets nothing (every value moves 3% right inside its
    * bin) and needs no binWidth choice. Grouped by `groupCol`
    * (source, language, shard), it answers the per-feed question
    * "which upstream changed distribution since the last crawl".
    *
    *   ks_fp = max over distinct values v of
    *           |cum_old(v)·10^6 div old_n  −  cum_new(v)·10^6 div new_n|
    *
    * i.e. the KS statistic in micro-units, each ECDF quantized to
    * 1e-6 BEFORE the difference: two integral divisions on
    * non-negative longs, so Spark's DIV and DuckDB's // agree bit-
    * for-bit and no product ever exceeds rows·10^6 (overflow-safe to
    * ~9·10^12 rows per group, where a cross-multiplied exact form
    * would overflow int64 at ~3·10^9). Quantization error is ≤2e-6 —
    * noise against any usable tolerance. A group with either side
    * empty reports ks_fp = 10^6 (ECDF vs nothing) and always flags.
    *
    * Shape: union-with-tag → one (group, value) aggregate (map-side
    * combined), then cumulative sums under ONE window partitioned by
    * group and ordered by value — groups parallelize across the
    * cluster; within a group the sort is over DISTINCT values, which
    * for discrete features (token counts, lengths) is bounded far
    * below row count. */
  def ksDrift(oldSnap: DataFrame, newSnap: DataFrame, groupCol: String,
              valueCol: String, toleranceFp: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def side(d: DataFrame, o: Int, n: Int) =
      d.select(col(groupCol).as("__g"), col(valueCol).cast("long").as("__v"),
        lit(o.toLong).as("__o"), lit(n.toLong).as("__n"))
    val perValue = side(oldSnap, 1, 0).unionAll(side(newSnap, 0, 1))
      .groupBy(col("__g"), col("__v"))
      .agg(sum(col("__o")).as("__oc"), sum(col("__n")).as("__nc"))
    val wCum = Window.partitionBy("__g").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wGrp = Window.partitionBy("__g")
    val stepped = perValue
      .withColumn("__co", sum(col("__oc")).over(wCum))
      .withColumn("__cn", sum(col("__nc")).over(wCum))
      .withColumn("old_n", sum(col("__oc")).over(wGrp))
      .withColumn("new_n", sum(col("__nc")).over(wGrp))
      .withColumn("__dfp",
        when(col("old_n") === 0 || col("new_n") === 0, lit(1000000L))
          .otherwise(abs(expr("(__co * 1000000) DIV old_n") -
            expr("(__cn * 1000000) DIV new_n"))))
    stepped.groupBy(col("__g").as(groupCol))
      .agg(max(col("old_n")).as("old_n"), max(col("new_n")).as("new_n"),
        max(col("__dfp")).as("ks_fp"))
      .withColumn("drifted", col("ks_fp") > toleranceFp)
  }
}
