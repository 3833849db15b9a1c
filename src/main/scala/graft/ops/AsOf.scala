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
  /** For each row, attach the attached-column values of the latest
    * observation row at-or-before it (per partition).
    *
    * All attached columns are packed into ONE struct per observation
    * row before the windows, so every output column comes from the
    * same observation row and a NULL observation value propagates as
    * ASOF semantics require. (Carrying each column independently with
    * `last(..., ignoreNulls)` mixed rows whenever an observation held
    * a NULL: the value came from an older observation while the
    * timestamp came from the newer one.)
    *
    * Two windows over the struct: a running last-observation in (time,
    * tiebreak) row order, then a broadcast of the struct at each
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
    // struct() is non-null whenever isObservation holds, even if every
    // field inside is NULL — so ignoreNulls skips non-observation rows
    // only, never a null-valued observation
    val packed = struct(obs.map { case (name, value) => value.as(name) }: _*)
    val carried = df
      .withColumn("__asof_obs",
        last(when(isObservation, packed), ignoreNulls = true).over(running))
      .withColumn("__asof_obs", last(col("__asof_obs")).over(tieGroup))
    obs.foldLeft(carried) { case (d, (name, _)) =>
      d.withColumn(name, col(s"__asof_obs.$name"))
    }.drop("__asof_obs")
  }
}
