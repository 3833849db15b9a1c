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

  test("burstFold (the stream kernel, bounded) == the batch operator") {
    import graft.streaming.EventStreams
    val e = Tables.events(spark, sf)
    val typed = e.select(col("ts").cast("timestamp").as("ts"),
      col("event_type")).as[EventStreams.TypedEvent]
    val fold = EventStreams.burstFold(typed, 3600, 6).collect()
      .map(r => (r.event_type, r.bin, r.n, r.trail_n,
        r.burst_fp.getOrElse(-1L), r.is_burst)).toSet
    val batch = Bursts.burstScore(e, "ts", "event_type", 3600, 6)
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("bin"), r.getAs[Long]("n"), r.getAs[Long]("trail_n"),
        if (r.isNullAt(r.fieldIndex("burst_fp"))) -1L
        else r.getAs[Long]("burst_fp"),
        r.getAs[Boolean]("is_burst"))).toSet
    assert(fold == batch)
  }

  test("burstStream closes and scores bins as the watermark advances") {
    import graft.streaming.EventStreams
    val dir = java.nio.file.Files.createTempDirectory("graft-burst").toString
    val all = Tables.events(spark, sf)
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"))
    all.filter(col("ts") < "2024-01-10").write.parquet(s"$dir/b=1")
    val schema = spark.read.parquet(s"$dir/b=1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
      .as[EventStreams.TypedEvent]
    val q = EventStreams.burstStream(stream, 3600, 6)
      .writeStream.outputMode("append").format("memory")
      .queryName("burst_stream").start()
    try {
      q.processAllAvailable()
      val early = spark.table("burst_stream").count()
      all.filter(col("ts") >= "2024-01-10").write.parquet(s"$dir/b=2")
      q.processAllAvailable()
      val late = spark.table("burst_stream").count()
      assert(late > early, s"watermark should close bins: $early -> $late")
      // every emitted bin agrees exactly with the batch operator's row
      val batch = Bursts.burstScore(Tables.events(spark, sf),
          "ts", "event_type", 3600, 6).collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bin")) ->
          (r.getAs[Long]("n"), r.getAs[Long]("trail_n"),
            r.getAs[Boolean]("is_burst"))).toMap
      val emitted = spark.table("burst_stream").collect()
      assert(emitted.nonEmpty)
      emitted.foreach { r =>
        val key = (r.getAs[String]("event_type"), r.getAs[Long]("bin"))
        val want = batch(key)
        assert((r.getAs[Long]("n"), r.getAs[Long]("trail_n"),
          r.getAs[Boolean]("is_burst")) == want, s"bin $key")
      }
    } finally q.stop()
  }
}
