package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Burst detection over an event stream: per (type, time-bin) volume
  * against its own trailing baseline — the rate-spike monitor that
  * flags crawler floods, error storms, and bot bursts in ingest
  * telemetry. A bin "bursts" when its count reaches `threshold`
  * (fixed-point, 10000 = 1.0×) times the trailing `trail`-bin mean.
  *
  * Scale shape: the only pass over the RAW stream is the (type, bin)
  * count — one shuffle at event volume. Everything after runs on the
  * aggregated frame (|types| · |bins| rows — telemetry scale, not
  * data scale), so the trailing window partitioned by type is cheap
  * at any event volume. The baseline uses a RANGE window over the
  * bin VALUE, so empty bins correctly thin the baseline rather than
  * being skipped the way a ROWS window would.
  *
  * All integer: `burst_fp = (n · trail · 10000) div trail_sum` — no
  * float division, bit-identical in any engine; bins with no trailing
  * history get a null score and never flag. */
object Bursts {
  /** Per (event_type, bin): count, trailing-window sum, fixed-point
    * burst ratio vs the trailing mean, and the `is_burst` verdict.
    * `tsCol` must be castable to timestamp; bins are epoch-second
    * `div binSeconds` (exact long division, UTC-session-pinned). */
  def burstScore(events: DataFrame, tsCol: String, typeCol: String,
                 binSeconds: Long, trail: Int,
                 threshold: Long = 20000): DataFrame = {
    require(binSeconds > 0 && trail > 0, "binSeconds and trail must be > 0")
    val binUs = binSeconds * 1000000L
    val bin: Column = call_function("div",
      unix_micros(col(tsCol).cast("timestamp")), lit(binUs))
    val counts = events
      .groupBy(col(typeCol).as("event_type"), bin.as("bin"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bin"))
      .rangeBetween(-trail, -1)
    counts
      .withColumn("trail_n", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("burst_fp", when(col("trail_n") > 0,
        expr(s"(n * $trail * 10000) DIV trail_n")))
      .withColumn("is_burst",
        coalesce(col("burst_fp") >= threshold, lit(false)))
  }
}
