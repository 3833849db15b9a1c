package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** functions.session_window (q177): the native session-merging
  * aggregate against hand-built sessions, including the boundary law
  * that distinguishes it from q17's lag-based form. */
class SessionWindowSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def sessions(rows: Seq[(Long, Timestamp)], gap: String) =
    rows.toDF("user_id", "ts")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("n"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3))).sortBy(x => (x._1, x._2)).toSeq

  test("chained events inside the gap merge into one session; end = last + gap") {
    val got = sessions(Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:20:00")),   // 20 min after — chains
      (1L, ts("2024-01-01 10:45:00")),   // 25 min after — chains again
      (1L, ts("2024-01-01 12:00:00")),   // new session
      (2L, ts("2024-01-01 10:05:00"))), "30 minutes")
    assert(got == Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:15:00"), 3L),
      (1L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:30:00"), 1L),
      (2L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:35:00"), 1L)))
  }

  test("an event exactly AT the previous end still MERGES (the close-boundary law)") {
    // measured Spark semantics: merge while gap <= window; only a
    // STRICTLY longer gap opens a new session. q177's oracle encodes
    // exactly this (`> INTERVAL 30 MINUTE` break).
    val got = sessions(Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:30:00"))), "30 minutes")
    assert(got ==
      Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), 2L)),
      s"got $got")
    // one second past the boundary DOES split
    val split = sessions(Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:30:01"))), "30 minutes")
    assert(split.size == 2, s"expected two sessions, got $split")
  }

  test("session_window totals agree with the q17 lag-based islands on real events") {
    val ev = Tables.events(spark, sf)
    val native = ev.groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n").as("n_events"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    // the lag form with the SAME strict-> law (which is also q17's —
    // the native operator and the window form agree on the boundary)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSec = unix_timestamp(col("ts").cast("timestamp")) -
      unix_timestamp(lag(col("ts"), 1).over(w).cast("timestamp"))
    val lagged = ev
      .withColumn("brk", when(gapSec.isNull || gapSec > 1800, 1)
        .otherwise(0))
      .withColumn("sid", sum(col("brk"))
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .groupBy("user_id", "sid").agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n").as("n_events"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(native == lagged)
  }

  test("streaming session_window (append mode) emits exactly the watermark-closed batch sessions") {
    val batchEvents = Tables.events(spark, sf)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sess-stream").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    val stream = graft.streaming.EventStreams.readEvents(spark, dir,
      spark.read.parquet(dir).schema)
    val q = graft.streaming.EventStreams.sessionWindowAgg(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_native").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sess_native")
        .collect().map(r => (r.getLong(0),
          r.getAs[java.time.LocalDateTime]("session_start"),
          r.getAs[java.time.LocalDateTime]("session_end"),
          r.getLong(3))).toSet
      val batch = SparkEntry.queries("q177_session_window")(spark, sf)
        .collect().map(r => (r.getLong(0),
          r.getAs[java.time.LocalDateTime]("session_start"),
          r.getAs[java.time.LocalDateTime]("session_end"),
          r.getLong(3))).toSet
      // append mode holds back sessions the final watermark never
      // passed (the last hour of the fixture) — everything emitted
      // must be a real batch session, and nearly all must emit
      assert(streamed.subsetOf(batch),
        s"streaming emitted ${(streamed -- batch).take(3)} not in batch")
      assert(streamed.size >= (batch.size * 9) / 10,
        s"only ${streamed.size} of ${batch.size} sessions emitted")
    } finally q.stop()
  }
}
