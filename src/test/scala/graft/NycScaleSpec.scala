package graft

import org.apache.spark.sql.functions._
import graft.nyc.NycScale

class NycScaleSpec extends SparkTestBase {
  import spark.implicits._

  private def trips = Seq(
    (1L, "2023-01-05 10:00:00", "2023-01-05 10:20:00", 12.5),
    (2L, "2023-01-17 22:10:00", "2023-01-17 22:45:00", 30.0),
    (1L, "2023-01-31 23:50:00", "2023-02-01 00:05:00", 8.0))
    .toDF("VendorID", "p", "d", "fare_amount")
    .select(col("VendorID"),
      col("p").cast("timestamp_ntz").as("lpep_pickup_datetime"),
      col("d").cast("timestamp_ntz").as("lpep_dropoff_datetime"),
      col("fare_amount"))

  test("factor x rows, copy 0 verbatim, durations preserved") {
    val out = NycScale.amplifyFrame(trips, 10)
    assert(out.count() == 30)
    // copy 0 rides through untouched: every original row is present
    val orig = trips.collect().toSet
    val outSet = out.collect().toSet
    assert(orig.subsetOf(outSet))
    // every amplified row keeps its original duration (same jitter on
    // both ends) — 20, 35, and 15 minutes
    val durs = out.select(
        (unix_timestamp(col("lpep_dropoff_datetime").cast("timestamp")) -
          unix_timestamp(col("lpep_pickup_datetime").cast("timestamp")))
          .as("s"))
      .as[Long].collect().toSet
    assert(durs == Set(1200L, 2100L, 900L))
    // jitter is bounded by +-900 s of SOME original pickup
    val origPu = trips.select(unix_timestamp(
        col("lpep_pickup_datetime").cast("timestamp"))).as[Long].collect()
    out.select(unix_timestamp(col("lpep_pickup_datetime").cast("timestamp")))
      .as[Long].collect()
      .foreach(t => assert(origPu.exists(o => math.abs(t - o) <= 900)))
  }

  test("deterministic: two amplifications are byte-identical") {
    val a = NycScale.amplifyFrame(trips, 5).collect().toSeq
      .map(_.toString).sorted
    val b = NycScale.amplifyFrame(trips, 5).collect().toSeq
      .map(_.toString).sorted
    assert(a == b && a.size == 15)
  }

  test("NullType columns stabilize to double (parquet-writable)") {
    val withVoid = trips.withColumn("ehail_fee", lit(null))
    val out = NycScale.amplifyFrame(withVoid, 3)
    assert(out.schema("ehail_fee").dataType ==
      org.apache.spark.sql.types.DoubleType)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_nycscale_").toString
    out.write.mode("overwrite").parquet(dir) // must not throw
    assert(spark.read.parquet(dir).count() == 9)
  }

  test("amplified real month feeds the pipeline cleanse unchanged") {
    val real = "/root/reference/data/green_data/2023-01.parquet"
    assume(new java.io.File(real).exists())
    val raw = spark.read.parquet(real)
    val amp = NycScale.amplifyFrame(raw, 2)
    assert(amp.count() == 2 * raw.count())
    // the cleanse (bronze conformance downstream of it) accepts the
    // amplified frame exactly like the original
    val cleansed = graft.nyc.Nyc.cleanseGreen(
      amp.withColumn("ehail_fee", col("ehail_fee").cast("double")))
    assert(cleansed.count() > 0)
  }
}
