package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** streaming.EventStreams: memory-sink runs must agree with the batch
  * twins (q16/q17), which are themselves oracle-checked. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("hourlyAgg over a file stream matches the batch q16 result") {
    val batchEvents = Tables.events(spark, sf)
    // stage the normalized events as a stream source dir
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    val stream = EventStreams.readEvents(spark, dir,
      spark.read.parquet(dir).schema)
    val q = EventStreams.hourlyAgg(stream).writeStream
      .outputMode("complete").format("memory").queryName("hourly").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(_.toSeq).toSet
      val batch = SparkEntry.queries("q16_event_windows")(spark, sf)
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream-static enrich and stream-stream correlate match batch twins") {
    val dir = java.nio.file.Files.createTempDirectory("graft-join-stream").toString
    val batchEvents = Tables.events(spark, sf)
    batchEvents.write.mode("overwrite").parquet(dir)
    val stream = EventStreams.readEvents(spark, dir, spark.read.parquet(dir).schema)

    val dim = Seq((0L, "free"), (1L, "pro")).toDF("user_mod", "tier")
    val enriched = EventStreams.enrich(
      stream.withColumn("user_mod", col("user_id") % 2), dim, Seq("user_mod"))
    val q1 = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enriched").start()

    val correlated = EventStreams.correlate(stream, "click", "purchase", 600)
    val q2 = correlated.writeStream.outputMode("append")
      .format("memory").queryName("correlated").start()
    try {
      q1.processAllAvailable(); q2.processAllAvailable()
      val e = spark.table("enriched")
      assert(e.count() == batchEvents.count())
      assert(e.filter(col("tier").isNull).count() == 0)
      // batch twin of the correlate join
      val ev = batchEvents.withColumn("ts", col("ts").cast("timestamp"))
      val l = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("l_id"), col("user_id"), col("ts").as("l_ts"))
      val r = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("r_id"), col("user_id").as("r_user"),
          col("ts").as("r_ts"))
      val batchPairs = l.join(r,
          col("user_id") === col("r_user") && col("r_ts") >= col("l_ts") &&
            col("r_ts") <= col("l_ts") + expr("INTERVAL 600 SECONDS"))
        .select("l_id", "r_id").collect().map(_.toSeq).toSet
      val streamPairs = spark.table("correlated")
        .select("l_id", "r_id").collect().map(_.toSeq).toSet
      assert(streamPairs == batchPairs)
      assert(streamPairs.nonEmpty)
    } finally { q1.stop(); q2.stop() }
  }

  test("dedupStream drops in-horizon duplicates, matches batch dedupByKey") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stream").toString
    val batchEvents = Tables.events(spark, sf)
    // plant duplicates: every event twice, same key and event time
    batchEvents.unionAll(batchEvents).write.mode("overwrite").parquet(dir)
    val stream = EventStreams.readEvents(spark, dir, spark.read.parquet(dir).schema)
    val q = EventStreams.dedupStream(stream, Seq("event_id"), "ts")
      .writeStream.outputMode("append")
      .format("memory").queryName("deduped").start()
    try {
      q.processAllAvailable()
      assert(spark.table("deduped").count() == batchEvents.count())
      assert(spark.table("deduped").select("event_id").distinct().count() ==
        batchEvents.count())
    } finally q.stop()
  }

  test("event-time-timeout sessionization closes sessions as the watermark advances") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sess-stream").toString
    val all = Tables.events(spark, sf)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    // first half of the month, then the rest — the second batch drags
    // the watermark far past the first batch's sessions
    all.filter(col("ts") < "2024-01-10").write.parquet(s"$dir/b=1")
    val schema = spark.read.parquet(s"$dir/b=1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    import spark.implicits._
    val q = EventStreams.sessionizeStream(stream.as[EventStreams.Event])
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_stream").start()
    try {
      q.processAllAvailable()
      val early = spark.table("sess_stream").count()
      all.filter(col("ts") >= "2024-01-10").write.parquet(s"$dir/b=2")
      q.processAllAvailable()
      val late = spark.table("sess_stream").count()
      assert(late > early, s"timeout should flush sessions: $early -> $late")
      // batch 3: an admissible OUT-OF-ORDER event — later than the
      // watermark but earlier than the max-ts user's stored session end
      // (exercises the merge-backwards path: bounds must extend, not
      // regress)
      val last = all.orderBy(col("ts").desc).head()
      val lateTs = last.getAs[java.sql.Timestamp]("ts")
      val earlier = new java.sql.Timestamp(lateTs.getTime - 5 * 60 * 1000)
      Seq((999999L, earlier, last.getAs[Long]("user_id"), "click", 1.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.parquet(s"$dir/b=3")
      q.processAllAvailable()
      // every emitted session respects the gap invariant
      val bad = spark.table("sess_stream")
        .filter(col("session_end") < col("session_start")).count()
      assert(bad == 0)
    } finally q.stop()
  }

  test("stateful sessionize agrees with the batch window-function twin") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event]
    // emitOpen=true flushes each user's final session too, so the
    // stateful result must EQUAL the q17 window-function twin.
    val sessions = EventStreams.sessionize(events, emitOpen = true).collect()
    val batch = SparkEntry.queries("q17_sessionize")(spark, sf).collect()
    val batchSet = batch.map { r =>
      val start = r.getAs[java.time.LocalDateTime]("session_start")
      (r.getAs[Long]("user_id"),
        start.toEpochSecond(java.time.ZoneOffset.UTC),
        r.getAs[Long]("n_events"))
    }.toSet
    val streamSet = sessions.map(s =>
      (s.user_id, s.session_start.getTime / 1000, s.n_events)).toSet
    assert(streamSet == batchSet)
  }
}
