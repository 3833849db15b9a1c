package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral path mining: the frequency table of event-type
  * TRIGRAMS inside user sessions — the "what do users actually do in
  * sequence" report (funnel analysis q121 asks about ONE prescribed
  * path; this surfaces every 3-step path with its mass, the
  * exploratory sibling). Sessions are the q17 rule verbatim — a new
  * session opens after a `gapSeconds` silence, order is the tie-free
  * `(ts, tieCol)` — so a trigram never straddles a session boundary:
  * "view→click→purchase" across a week of absence is noise, not a
  * path.
  *
  * Scale shape: one window pass per user (the session tagging + two
  * leads — per-user partitions, bounded history, the same regime as
  * q17), then ONE map-side-combinable count keyed on the trigram —
  * output cardinality is |event types|³, driver-safe by construction.
  * All strings and longs; nothing floats. */
object Paths {
  /** (e1, e2, e3, n_paths): every within-session event-type trigram
    * and how often it occurs across the corpus. */
  def sessionPathTrigrams(events: DataFrame, userCol: String,
                          tsCol: String, tieCol: String, typeCol: String,
                          gapSeconds: Long = 1800): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val sec = unix_timestamp(col(tsCol).cast("timestamp"))
    val gap = sec - lag(sec, 1).over(w)
    val tagged = events
      .withColumn("__new", when(gap.isNull || gap > gapSeconds, 1)
        .otherwise(0))
      .withColumn("__sess",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    tagged
      .withColumn("__t2", lead(col(typeCol), 1).over(w))
      .withColumn("__s2", lead(col("__sess"), 1).over(w))
      .withColumn("__t3", lead(col(typeCol), 2).over(w))
      .withColumn("__s3", lead(col("__sess"), 2).over(w))
      .filter(col("__s2") === col("__sess") && col("__s3") === col("__sess"))
      .groupBy(col(typeCol).as("e1"), col("__t2").as("e2"),
        col("__t3").as("e3"))
      .agg(count(lit(1)).as("n_paths"))
  }
}
