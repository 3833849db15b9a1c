package graft

import org.apache.spark.sql.functions._
import graft.ops.Bursts

/** ops.Bursts: trailing-baseline rate-spike detection (q135). */
class BurstsSpec extends SparkTestBase {
  import spark.implicits._

  private def at(sec: Long) = java.time.LocalDateTime
    .ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  test("hand-built spike flags; empty bins thin the baseline (RANGE)") {
    // bins of 10s: bin0 has 2, bin1 has 2, bin3 has 8 (bin2 empty)
    val rows = (Seq(1L, 5L) ++ Seq(11L, 15L) ++
      (0 until 8).map(i => 30L + i)).map(s => (at(s), "x"))
    val df = rows.toDF("ts", "event_type")
    val r = Bursts.burstScore(df, "ts", "event_type",
        binSeconds = 10, trail = 3, threshold = 20000)
      .orderBy("bin").collect()
    assert(r.map(_.getAs[Long]("n")).toSeq == Seq(2L, 2L, 8L))
    // bin3's trailing window covers bins 0..2 = 2 + 2 + (empty) = 4
    assert(r(2).getAs[Long]("trail_n") == 4L)
    // ratio = 8 * 3 * 10000 / 4 = 60000 -> burst at 2.0x
    assert(r(2).getAs[Long]("burst_fp") == 60000L)
    assert(r(2).getAs[Boolean]("is_burst"))
    // first bin has no history: null score, never flags
    assert(r(0).isNullAt(r(0).fieldIndex("burst_fp")))
    assert(!r(0).getAs[Boolean]("is_burst"))
  }

  test("types are independent; raw stream only aggregates once") {
    val df = (Seq((at(1L), "a"), (at(2L), "a"), (at(11L), "b")))
      .toDF("ts", "event_type")
    val r = Bursts.burstScore(df, "ts", "event_type", 10, 2)
    assert(r.filter(col("event_type") === "b")
      .head().getAs[Long]("trail_n") == 0L) // a's bins don't leak into b
    val plan = Bursts.burstScore(
        Tables.events(spark, sf), "ts", "event_type", 3600, 6)
      .queryExecution.executedPlan.toString
    // one partial+final count over events, then window on the bin frame
    assert(plan.contains("partial_count"), plan.take(1500))
  }

  test("deterministic on the real stream; flags the 2x spikes") {
    val e = Tables.events(spark, sf)
    val a = Bursts.burstScore(e, "ts", "event_type", 3600, 6).collect().toSet
    val b = Bursts.burstScore(e, "ts", "event_type", 3600, 6).collect().toSet
    assert(a == b && a.nonEmpty)
    assert(a.exists(_.getAs[Boolean]("is_burst")))
    assert(a.exists(r => !r.getAs[Boolean]("is_burst")))
  }
}
