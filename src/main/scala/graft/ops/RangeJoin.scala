package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) joins without a nested-loop plan.
  *
  * A naive `points JOIN intervals ON t BETWEEN s AND e` has no equi
  * conjunct, so Spark plans BroadcastNestedLoopJoin — O(|P|·|I|) work
  * and a broadcast of a whole side. At 100 TB neither side fits, and
  * the quadratic work is the real killer. The standard fix (bin-based
  * range join — the same blocking DataBricks' range-join hint and
  * Flink's interval join use) turns the range predicate into an
  * equi-join on a coarse bin: each interval is replicated to every
  * bin it overlaps, each point maps to exactly ONE bin, the join runs
  * on (bin + optional equi keys) through a normal shuffled hash /
  * sort-merge join, and the exact range predicate filters residual
  * false candidates inside the join.
  *
  * Replication factor is `interval_span / binWidth + 1`, so bin width
  * is the single tuning knob: comparable to the typical interval span
  * keeps replication ≤ 2× while candidate groups stay small. Both
  * sides shuffle-partition on the bin key — no broadcast, no
  * cartesian, skew bounded by (bin, keys) cardinality.
  *
  * Times are `Long`s (e.g. `unix_micros(ts)`) — callers convert, so
  * the same operator serves timestamps, versions, or numeric ranges.
  */
object RangeJoin {
  private val Bin = "__rj_bin"

  /** Bin id covering value `v` for width `w`: EXACT long floor
    * division — `(v - pmod(v, w)) / w` stays in integer arithmetic,
    * handles negative values (pmod is non-negative), and is correct
    * for the full long range. A double-division floor would misbin
    * values above 2^53 (nanosecond epochs ≈ 1.7e18 round to the
    * nearest 256 as doubles) and silently LOSE matching pairs — the
    * residual filter can only remove false candidates, never recover
    * a pair the binning failed to co-locate. */
  private def binOf(v: Column, w: Long): Column =
    call_function("div", v - pmod(v, lit(w)), lit(w))

  /** points ⋈ intervals on `start <= t < end` (half-open, ASOF-style)
    * plus any `equiKeys` present on BOTH sides.
    *
    * Each point lands in exactly one bin, so a (point, interval) pair
    * can only meet in that bin — the output needs no dedup. Column
    * name collisions (other than `equiKeys`) must be resolved by the
    * caller; the bin column is internal.
    *
    * @param pointTime long-typed column on `points`
    * @param start,end long-typed columns on `intervals`, `start <= end`
    * @param binWidth  bin span in the same unit as the time columns;
    *                  pick ≈ the typical interval span
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTime: Column, start: Column, end: Column,
                      binWidth: Long, equiKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn(Bin, binOf(pointTime, binWidth))
    // end is exclusive: an interval whose end sits exactly on a bin
    // boundary contributes nothing to that bin, hence end - 1.
    val i = intervals.withColumn(Bin,
      explode(sequence(binOf(start, binWidth),
        binOf(greatest(end - lit(1), start), binWidth))))
    p.join(i, Seq(Bin) ++ equiKeys)
      .filter(pointTime >= start && pointTime < end)
      .drop(Bin)
  }

  /** left ⋈ right on interval overlap: `lStart < rEnd && rStart < lEnd`
    * (half-open intervals) plus any shared `equiKeys`.
    *
    * Both sides replicate to every bin they overlap, so a pair could
    * meet in several bins; emitting it only in the FIRST bin both
    * occupy — `max(bin(lStart), bin(rStart))` — makes the join
    * duplicate-free without a distinct. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: Column, lEnd: Column,
                      rStart: Column, rEnd: Column,
                      binWidth: Long, equiKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(df: DataFrame, s: Column, e: Column) =
      df.withColumn(Bin, explode(sequence(binOf(s, binWidth),
        binOf(greatest(e - lit(1), s), binWidth))))
    binned(left, lStart, lEnd)
      .join(binned(right, rStart, rEnd), Seq(Bin) ++ equiKeys)
      .filter(lStart < rEnd && rStart < lEnd &&
        col(Bin) === greatest(binOf(lStart, binWidth), binOf(rStart, binWidth)))
      .drop(Bin)
  }
}
