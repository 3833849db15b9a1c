package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.nyc.Nyc

/** nyc.Nyc: the reference pipeline's own domain end-to-end on synthetic
  * taxi trips — canonical schema, cleanse effects, fact build with
  * calendar pruning, dim upsert, report golden values. */
class NycSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (VendorID, lpep_pu, lpep_do, sfw, Rate, PU, DO, pax, dist, fare,
  //  extra, mta, tip, tolls, ehail, improv, total, payment, trip_type, cong)
  type GreenRow = (Long, Timestamp, Timestamp, String, Double, Long, Long,
    Double, Double, Double, Double, Double, Double, Double, Option[Double],
    Double, Double, Double, Double, Double)

  val rowA: GreenRow = (1L, ts("2023-01-05 10:00:00"), ts("2023-01-05 10:30:00"),
    "N", 1.0, 74L, 75L, 2.0, 3.5, 20.00, 1.00, 0.50, 4.00, 0.00, None,
    0.30, 25.80, 1.0, 1.0, 0.00)
  val rowD: GreenRow = (2L, ts("2023-01-06 12:00:00"), ts("2023-01-06 12:15:00"),
    "N", 1.0, 41L, 42L, 1.0, 1.2, 8.00, 0.50, 0.50, 0.00, 0.00, None,
    0.30, 9.30, 7.0, 1.0, 2.50) // unseen payment code 7
  val rowC: GreenRow = (1L, ts("2022-12-31 23:00:00"), ts("2022-12-31 23:10:00"),
    "N", 1.0, 10L, 11L, 1.0, 2.0, 10.00, 0.00, 0.50, 1.00, 0.00, None,
    0.30, 11.80, 2.0, 1.0, 0.00) // outside the 2023 calendar

  lazy val green = Seq(
    rowA, rowA, // exact duplicate → dedup
    rowD, rowC,
    // null pickup → dropped by dropna
    (3L, null.asInstanceOf[Timestamp], ts("2023-01-07 09:00:00"), "N", 1.0,
      1L, 2L, 1.0, 1.0, 5.0, 0.0, 0.5, 0.0, 0.0, Option.empty[Double],
      0.3, 5.8, 2.0, 1.0, 0.0),
  ).toDF("VendorID", "lpep_pickup_datetime", "lpep_dropoff_datetime",
    "store_and_fwd_flag", "RatecodeID", "PULocationID", "DOLocationID",
    "passenger_count", "trip_distance", "fare_amount", "extra", "mta_tax",
    "tip_amount", "tolls_amount", "ehail_fee", "improvement_surcharge",
    "total_amount", "payment_type", "trip_type", "congestion_surcharge")

  lazy val yellow = Seq(
    (2L, ts("2023-02-01 08:00:00"), ts("2023-02-01 08:20:00"), "N", 1.0,
      2.0, 5.0, 132L, 138L, 1.0, 14.0, 0.0, 0.5, 2.0, 0.0, 0.3, 18.05, 0.0, 1.25),
  ).toDF("VendorID", "tpep_pickup_datetime", "tpep_dropoff_datetime",
    "store_and_fwd_flag", "RatecodeID", "passenger_count", "trip_distance",
    "PULocationID", "DOLocationID", "payment_type", "fare_amount", "extra",
    "mta_tax", "tip_amount", "tolls_amount", "improvement_surcharge",
    "total_amount", "congestion_surcharge", "airport_fee")

  lazy val silverGreen = Nyc.cleanseGreen(green)
  lazy val silverYellow = Nyc.cleanseYellow(yellow)
  lazy val trips = Nyc.unionTrips(Seq(silverGreen, silverYellow))
  lazy val dateDim = Nyc.dateDim2023(spark).cache()
  lazy val fact = Nyc.factBuild(trips, dateDim, Nyc.seedTypes(spark), None)

  test("green and yellow conform to the canonical 17-column schema (R1)") {
    assert(silverGreen.columns.toSeq == Nyc.canonicalColumns)
    assert(silverYellow.columns.toSeq == Nyc.canonicalColumns)
    assert(silverGreen.schema("trip_duration").dataType.typeName == "long")
    assert(silverGreen.schema("payment_type").dataType.typeName == "integer")
  }

  test("cleanse drops duplicates and null-timestamp rows") {
    assert(silverGreen.count() == 3) // A (deduped), D, C; null-pickup dropped
    val a = silverGreen.filter(col("VendorID") === 1 && col("PULocationID") === 74).head()
    assert(a.getAs[Long]("trip_duration") == 1800L) // seconds (R2)
    assert(a.getAs[Double]("total_surcharges") == 1.00 + 0.50 + 0.30 + 0.00)
    assert(a.getAs[String]("taxi_type") == "Green")
    assert(a.getAs[Double]("airport_fee") == 0.0)
  }

  test("fact build prunes trips outside the calendar and keys all dims") {
    assert(fact.count() == 2 + 1) // A, D + yellow; 2022 row dropped
    val a = fact.filter(col("PULocationID") === 74).head()
    assert(a.getAs[Long]("date_puID") == 5L)   // 2023-01-05
    assert(a.getAs[Int]("typeID") == 1)        // Green
    assert(a.getAs[Int]("paymentID") == 1)
    val y = fact.filter(col("PULocationID") === 132).head()
    assert(y.getAs[Int]("typeID") == 2)        // Yellow
    assert(y.getAs[Long]("date_puID") == 32L)  // 2023-02-01
  }

  test("watermark makes the fact load incremental (gold.py:56-65,278)") {
    val incr = Nyc.factBuild(trips, dateDim, Nyc.seedTypes(spark),
      Some(ts("2023-01-05 10:00:00")))
    assert(incr.count() == 2) // A excluded (not strictly newer), D + yellow
  }

  test("payment dim upsert labels the unseen code 7 as Unknown") {
    val rows = Nyc.dimUpsertRows(
      trips.withColumnRenamed("payment_type", "paymentID"),
      Nyc.seedPayments(spark), "paymentID", "paymentType")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSet == Set((7, "Unknown 7")))
  }

  test("monthly report golden values for the row-A group (R2: minutes)") {
    val m = Nyc.monthlyReport(fact, dateDim)
      .filter(col("PULocationID") === 74).head()
    assert(m.getAs[Long]("total_rows") == 1L)
    assert(m.getAs[Int]("month_pu") == 1)
    assert(m.getAs[Double]("sum_trip_duration_min") == 30.0)
    assert(m.getAs[Double]("sum_total_amount") == 25.80)
    assert(m.getAs[Double]("avg_passenger_count") == 2.0)
  }

  test("referenceCompat mart reproduces platinum.py:88-112 byte-shape") {
    val m = Nyc.monthlyReport(fact, dateDim,
      Nyc.Compat(rounded = true, legacyDurationScale = true))
    assert(m.columns.toSeq == Seq(
      "PULocationID", "DOLocationID", "typeID", "VendorID", "month_pu",
      "RatecodeID", "paymentID",
      "avg_passenger_count", "total_passenger_count",
      "avg_trip_distance", "total_trip_distance",
      "avg_trip_duration", "total_trip_duration",
      "avg_tip_amount", "total_tip_amount",
      "avg_tolls_amount", "total_tolls_amount",
      "avg_total_amount", "total_total_amount",
      "avg_fare_amount", "total_fare_amount", "total_trips"))
    val a = m.filter(col("PULocationID") === 74).head()
    // R2 preserved under the flag: 1800 s treated as ms -> /(1000*60)
    assert(a.getAs[Double]("avg_trip_duration") == 0.03)
    assert(a.getAs[Double]("total_total_amount") == 25.8)
    assert(a.getAs[Long]("total_trips") == 1L)
    // flag off: true minutes (the documented R2 fix)
    val fixed = Nyc.monthlyReport(fact, dateDim, Nyc.Compat(rounded = true))
      .filter(col("PULocationID") === 74).head()
    assert(fixed.getAs[Double]("avg_trip_duration") == 30.0)
  }

  test("zones attach to the aggregated mart per side (platinum J6)") {
    val zones = Seq((74, "Manhattan", "East Harlem North", "Boro"),
      (75, "Manhattan", "East Harlem South", "Boro"))
      .toDF("LocationID", "Borough", "Zone", "service_zone")
    val m = Nyc.attachZones(Nyc.monthlyReport(fact, dateDim), zones)
      .filter(col("PULocationID") === 74).head()
    assert(m.getAs[String]("pu_zone") == "East Harlem North")
    assert(m.getAs[String]("do_zone") == "East Harlem South")
    assert(m.getAs[String]("pu_borough") == "Manhattan")
  }

  test("weekly report keys swap month for (dayName, weekOfYear)") {
    val w = Nyc.weeklyReport(fact, dateDim)
      .filter(col("PULocationID") === 74).head()
    assert(w.getAs[String]("dayOfWeek_pu") == "Thursday") // 2023-01-05
    assert(w.getAs[Int]("weekOfYear_pu") == 1)
  }
}
