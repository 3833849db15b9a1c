package graft

import org.apache.spark.sql.functions._
import graft.nyc.Nyc
import graft.sources.Sources

/** Golden end-to-end over the REAL reference data: the reference ships
  * `data/green_data/2023-01.parquet` (68,211 rows; reference
  * README.md:34-41) and `data/taxi_zone.csv` (265 zones) — this spec
  * runs the actual file through silver cleanse → gold fact → platinum
  * marts and pins layer row counts, schemas, golden group values, and a
  * hash of the sorted mart, with `Nyc.Compat` both off and on.
  *
  * Ground truth derivation: counts and aggregates below were computed
  * independently in DuckDB over the same parquet (dedup → non-null
  * timestamps → 2023-calendar prune → group-by), so the pins are
  * cross-engine, not self-referential. The mart hash is a Spark-side
  * regression pin over the count-verified output.
  *
  * Read-only access to `/root/reference/data`; nothing is copied.
  */
class NycGoldenSpec extends SparkTestBase {

  private val greenPath = "/root/reference/data/green_data/2023-01.parquet"
  private val zonePath = "/root/reference/data/taxi_zone.csv"

  private def available = new java.io.File(greenPath).canRead

  // The raw file carries `ehail_fee` as a parquet NULL-typed column
  // (all-null, pandas-written); cleanseGreen drops it first thing.
  lazy val raw = spark.read.parquet(greenPath)
  lazy val silver = Nyc.cleanseGreen(raw).cache()
  lazy val dateDim = Nyc.dateDim2023(spark).cache()
  lazy val fact =
    Nyc.factBuild(silver, dateDim, Nyc.seedTypes(spark), None).cache()
  lazy val zones = Sources.readCsv(spark, zonePath, Some(Nyc.zoneSchema))

  test("silver: real 2023-01 green file cleanses to 68,211 canonical rows") {
    assume(available)
    assert(raw.count() == 68211L) // BASELINE.md footer count
    assert(silver.columns.toSeq == Nyc.canonicalColumns)
    // no exact duplicates and no null timestamps in this month's file,
    // so cleanse is row-preserving here (DuckDB: 68211 → 68211 → 68211)
    assert(silver.count() == 68211L)
    assert(silver.schema("trip_duration").dataType.typeName == "long")
    assert(silver.filter(col("pickup_datetime").isNull).isEmpty)
  }

  test("gold: calendar prune drops exactly the 3 out-of-2023 trips") {
    assume(available)
    // DuckDB: 1 trip with a 2009 pickup, 2 with 2022 pickups; all
    // dropoffs share the pickup year → 68,208 survive both date joins
    assert(fact.count() == 68208L)
    assert(fact.columns.length == 17)
    // every fact row keyed: typeID=1 (Green), date keys within 2023
    assert(fact.filter(col("typeID") =!= 1).isEmpty)
    assert(fact.agg(min("date_puID"), max("date_puID")).head() match {
      case r => r.getLong(0) >= 1L && r.getLong(1) <= 365L
    })
  }

  test("platinum: monthly/weekly mart cardinality and mass balance") {
    assume(available)
    val monthly = Nyc.monthlyReport(fact, dateDim).cache()
    val weekly = Nyc.weeklyReport(fact, dateDim)
    assert(monthly.count() == 11187L) // DuckDB distinct 7-key groups
    assert(weekly.count() == 36099L)  // DuckDB distinct 8-key groups
    // mass balance: every fact row lands in exactly one group
    assert(monthly.agg(sum("total_rows")).head().getLong(0) == 68208L)
    assert(weekly.agg(sum("total_rows")).head().getLong(0) == 68208L)
    monthly.unpersist()
  }

  test("platinum: golden values for the heaviest group (74→75, compat off)") {
    assume(available)
    val m = Nyc.monthlyReport(fact, dateDim)
      .filter(col("PULocationID") === 74 && col("DOLocationID") === 75 &&
        col("VendorID") === 2 && col("month_pu") === 1 &&
        col("RatecodeID") === 1 && col("paymentID") === 1)
      .head()
    assert(m.getAs[Long]("total_rows") == 1100L)        // DuckDB count
    assert(m.getAs[Double]("sum_total_amount") == 15557.92)
    assert(math.abs(m.getAs[Double]("avg_passenger_count") - 1.445) < 5e-4)
    // DuckDB-exact: sum(trip_duration)=989,635 s over 1,100 trips; the
    // Money aggregate rounds each minute value to cents first, so the
    // mean sits within half a cent of the true 989635/66000 ≈ 14.99447
    assert(math.abs(m.getAs[Double]("avg_trip_duration_min")
      - 989635.0 / 66000.0) < 5e-3)
  }

  test("platinum: Compat(rounded, legacyDurationScale) reproduces the legacy mart") {
    assume(available)
    val legacy = Nyc.monthlyReport(fact, dateDim,
      Nyc.Compat(rounded = true, legacyDurationScale = true))
      .filter(col("PULocationID") === 74 && col("DOLocationID") === 75 &&
        col("VendorID") === 2 && col("month_pu") === 1 &&
        col("RatecodeID") === 1 && col("paymentID") === 1)
      .head()
    assert(legacy.getAs[Long]("total_trips") == 1100L)
    // R2 preserved under the flag: seconds treated as ms → /(1000*60)
    assert(legacy.getAs[Double]("avg_trip_duration") == 0.015)
    assert(legacy.getAs[Double]("total_total_amount") == 15557.92)
    // flag off: true minutes (the documented R2 fix)
    val fixed = Nyc.monthlyReport(fact, dateDim, Nyc.Compat(rounded = true))
      .filter(col("PULocationID") === 74 && col("DOLocationID") === 75 &&
        col("VendorID") === 2 && col("month_pu") === 1 &&
        col("RatecodeID") === 1 && col("paymentID") === 1)
      .head()
    assert(fixed.getAs[Double]("avg_trip_duration") == 14.994)
  }

  test("platinum: real zone CSV attaches to every mart row (J6)") {
    assume(available)
    val monthly = Nyc.monthlyReport(fact, dateDim)
    val zoned = Nyc.attachZones(monthly, zones).cache()
    assert(zones.count() == 265L)
    // inner zone join preserves cardinality → every LocationID in the
    // real data resolves against the real lookup
    assert(zoned.count() == 11187L)
    val r = zoned.filter(col("PULocationID") === 74 &&
      col("DOLocationID") === 75).head()
    assert(r.getAs[String]("pu_zone") == "East Harlem North")
    assert(r.getAs[String]("do_zone") == "East Harlem South")
    assert(r.getAs[String]("pu_borough") == "Manhattan")
    zoned.unpersist()
  }

  // ------------------------------------------------- yellow union (R1)

  // The snapshot strips all 12 yellow parquet files
  // (/root/reference/.MISSING_LARGE_BLOBS:2-13), so the R1-fixing
  // two-type union runs against a SCHEMA-FAITHFUL synthetic yellow
  // 2023-01: the real TLC yellow footer layout (19 columns — int64
  // keys, double measures, int64 payment_type, string
  // store_and_fwd_flag, timestamps NTZ like the real files), 50,000
  // rows derived deterministically from xxhash64(id, seed), plus 100
  // planted exact duplicates (dedup must drop) and one 2022-dated
  // pickup (calendar prune must drop).
  private val yellowN = 50000L
  lazy val rawYellow: org.apache.spark.sql.DataFrame = {
    def h(seed: Int, m: Long) = pmod(xxhash64(col("id"), lit(seed)), lit(m))
    def money(seed: Int, m: Long) = h(seed, m).cast("double") / lit(100.0)
    val base = spark.range(yellowN)
      // 2023-01-01 00:00:00 UTC = 1672531200; id 0 plants a 2022-12-31
      // pickup that must fall out of the 2023 calendar join
      .withColumn("pu_s",
        when(col("id") === 0, lit(1672444800L))
          .otherwise(lit(1672531200L) + h(2, 31L * 24 * 3600)))
      .select(
        col("id"),
        (lit(1L) + h(1, 2)).as("VendorID"),
        timestamp_seconds(col("pu_s")).cast("timestamp_ntz")
          .as("tpep_pickup_datetime"),
        timestamp_seconds(col("pu_s") + lit(60L) + h(3, 3600))
          .cast("timestamp_ntz").as("tpep_dropoff_datetime"),
        when(h(4, 50) === 0, lit(null)).otherwise(h(4, 5).cast("double") + 1.0)
          .as("passenger_count"),
        money(5, 3000).as("trip_distance"),
        when(h(6, 50) === 0, lit(null)).otherwise(h(6, 6).cast("double") + 1.0)
          .as("RatecodeID"),
        when(h(7, 20) === 0, lit("Y")).otherwise(lit("N"))
          .as("store_and_fwd_flag"),
        (lit(1L) + h(8, 265)).as("PULocationID"),
        (lit(1L) + h(9, 265)).as("DOLocationID"),
        (lit(1L) + h(10, 4)).as("payment_type"),
        money(11, 5000).as("fare_amount"),
        money(12, 300).as("extra"),
        lit(0.5).as("mta_tax"),
        money(13, 1500).as("tip_amount"),
        money(14, 700).as("tolls_amount"),
        lit(1.0).as("improvement_surcharge"),
        money(15, 8000).as("total_amount"),
        when(h(16, 50) === 0, lit(null).cast("double")).otherwise(lit(2.5))
          .as("congestion_surcharge"),
        when(h(17, 3) === 0, lit(1.25)).otherwise(lit(0.0)).as("airport_fee"))
    // planted exact duplicates: rows 0..99 appear twice (id selected by
    // value, not limit() — deterministic under any partitioning), then
    // the id column drops so the copies are bit-identical
    base.union(base.filter(col("id") < 100)).drop("id")
  }
  lazy val silverYellow = Nyc.cleanseYellow(rawYellow).cache()

  test("silver: synthetic yellow conforms, dedups, and unions by name with real green (R1)") {
    assume(available)
    assert(silverYellow.columns.toSeq == Nyc.canonicalColumns)
    assert(silverYellow.count() == yellowN) // 100 planted dupes dropped
    val union = Nyc.unionTrips(Seq(silver, silverYellow))
    assert(union.columns.toSeq == Nyc.canonicalColumns)
    assert(union.count() == 68211L + yellowN)
    // both taxi types present post-union — the exact composition the
    // reference's positional 17x16 union crashes on (gold.py:273)
    assert(union.select("taxi_type").distinct().count() == 2)
  }

  test("gold: two-type fact keys yellow rows typeID=2, prunes the 2022 pickup") {
    assume(available)
    val union = Nyc.unionTrips(Seq(silver, silverYellow))
    val fact2 = Nyc.factBuild(union, dateDim, Nyc.seedTypes(spark), None).cache()
    // green loses its 3 out-of-2023 trips, yellow exactly the planted one
    assert(fact2.count() == 68208L + (yellowN - 1))
    assert(fact2.filter(col("typeID") === 1).count() == 68208L)
    assert(fact2.filter(col("typeID") === 2).count() == yellowN - 1)
    // marts aggregate the union without loss
    val monthly = Nyc.monthlyReport(fact2, dateDim)
    assert(monthly.agg(sum("total_rows")).head().getLong(0) ==
      68208L + yellowN - 1)
    fact2.unpersist()
  }

  test("platinum: mart content hash is pinned (regression golden)") {
    assume(available)
    // deterministic row image: sorted keys, exact-aggregate measures
    // (Reports.report is bit-deterministic across partitionings)
    val monthly = Nyc.monthlyReport(fact, dateDim)
    val cols = monthly.columns.sorted.map(col)
    val hash = monthly
      .select(md5(concat_ws("|", cols: _*)).as("h"))
      .agg(bit_xor(conv(substring(col("h"), 1, 15), 16, 10).cast("long")))
      .head().getLong(0)
    val pinned = NycGoldenSpec.monthlyMartHash
    if (pinned != 0L) assert(hash == pinned,
      s"monthly mart drifted: got $hash")
    else info(s"pin this: monthlyMartHash = ${hash}L")
  }
}

object NycGoldenSpec {
  /** XOR of per-row md5 prefixes over the sorted-column monthly mart —
    * order-insensitive, content-sensitive. 0L = unpinned (first run
    * prints the value to pin). */
  val monthlyMartHash: Long = 226114823944386740L
}
