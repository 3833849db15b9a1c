package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: attach to every row the most recent
  * matching observation at-or-before its timestamp.
  *
  * Expressed as a composition (SURVEY §7.3 preference (a)): tag the
  * observation columns, then `last(..., ignoreNulls)` over a
  * rows-unbounded-preceding window ordered by (time, tiebreak). One
  * shuffle on the partition key, one sort — the same cost profile as a
  * dedicated sort-merge as-of SparkPlan, without custom-strategy
  * maintenance. For two distinct tables, union the observation rows in
  * (self-as-of needs no union at all). Ties on the timestamp resolve to
  * the greatest tiebreak value, matching a QUALIFY row_number()=1
  * dedup of the observation side.
  */
object AsOf {
  /** For each row, carry forward the latest non-null value of each
    * (name → source expression when `isObservation`) pair.
    *
    * Two windows per column: a running last-observation in (time,
    * tiebreak) row order, then a broadcast of the value at each
    * same-time group's greatest tiebreak to the whole group — so a row
    * sees observations sharing its exact timestamp regardless of
    * tiebreak order, matching ASOF `ts >= obs_ts` semantics (the
    * single-window form missed an observation at the same timestamp
    * with a larger tiebreak). */
  def lastObservation(df: DataFrame, partitionBy: Seq[Column],
                      time: Column, tiebreak: Column,
                      isObservation: Column,
                      obs: (String, Column)*): DataFrame = {
    val running = Window.partitionBy(partitionBy: _*)
      .orderBy(time, tiebreak)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tieGroup = Window.partitionBy((partitionBy :+ time): _*)
      .orderBy(tiebreak)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    obs.foldLeft(df) { case (d, (name, value)) =>
      d.withColumn(name,
          last(when(isObservation, value), ignoreNulls = true).over(running))
        .withColumn(name, last(col(name)).over(tieGroup))
    }
  }
}
