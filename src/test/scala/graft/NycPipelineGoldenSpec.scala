package graft

import org.apache.spark.sql.functions._
import graft.catalog.ParquetCatalog
import graft.nyc.{Nyc, NycPipeline}

/** The ORCHESTRATION loop against the full real dataset: all 12 green
  * monthly files (787,060 raw rows, reference README.md:34-41) driven
  * bronze → silver → gold → platinum by [[NycPipeline]] with per-month
  * partition replace, plus the watermark-incremental append contract on
  * the first two months. NycGoldenSpec pins the per-layer OPERATORS on
  * one month; this spec pins the LOOP — partitioned writes, idempotent
  * re-runs, dim upserts, watermark state — on the full year.
  *
  * Ground truth (DuckDB, independent of this engine):
  *  - per-month dedup → non-null-ts → 2023-calendar-prune counts sum to
  *    787,042 fact rows (18 of 787,060 raw rows drop: 0 dupes, 0 null
  *    ts, 18 out-of-2023 dates);
  *  - 143,332 distinct monthly-mart groups over the year;
  *  - golden group (74→75, V2, rc1, pt1, June): 1,264 trips,
  *    sum(total_amount) = 18,280.67;
  *  - January's max pickup DATE is 2023-02-01 (the file carries early-
  *    February pickups), max pickup TIMESTAMP 2023-02-01 03:10:05; the
  *    February fact delta strictly above that timestamp is 64,719 of
  *    the month's 64,808 fact rows (89 late arrivals at/below the
  *    watermark drop by contract — recoverable via runMonth).
  */
class NycPipelineGoldenSpec extends SparkTestBase {

  private val greenDir = "/root/reference/data/green_data"
  private val zonePath = "/root/reference/data/taxi_zone.csv"
  private def available = new java.io.File(s"$greenDir/2023-01.parquet").canRead

  private def freshCfg(zones: Boolean = false) = NycPipeline.Config(
    greenDir,
    new ParquetCatalog(
      java.nio.file.Files.createTempDirectory("graft-nyc-pipe").toString),
    zonePath = if (zones) Some(zonePath) else None)

  test("full-year backfill: 12 real months land 787,042 fact rows in 12 partitions") {
    assume(available)
    val cfg = freshCfg(zones = true)
    NycPipeline.runYear(spark, cfg)
    val fact = cfg.catalog.read(spark, "fact_nyc")
    assert(fact.count() == 787042L)
    assert(fact.select("month_key").distinct().count() == 12L)
    // every fact row keyed Green and inside the 2023 calendar
    assert(fact.filter(col("typeID") =!= 1).isEmpty)
    val mm = fact.agg(min("date_puID"), max("date_puID")).head()
    assert(mm.getLong(0) >= 1L && mm.getLong(1) <= 365L)

    // platinum over the whole year, zones attached (inner join lossless:
    // every LocationID in the year resolves against the real CSV)
    val monthly = cfg.catalog.read(spark, "report_monthly")
    assert(monthly.count() == 143332L)
    assert(monthly.agg(sum("total_rows")).head().getLong(0) == 787042L)
    // golden group, June (DuckDB-derived)
    val g = monthly.filter(col("PULocationID") === 74 &&
      col("DOLocationID") === 75 && col("VendorID") === 2 &&
      col("month_pu") === 6 && col("RatecodeID") === 1 &&
      col("paymentID") === 1).head()
    assert(g.getAs[Long]("total_rows") == 1264L)
    assert(g.getAs[Double]("sum_total_amount") == 18280.67)
    assert(g.getAs[String]("pu_zone") == "East Harlem North")

    // re-running one month is a no-op (idempotent partition replace)
    NycPipeline.runMonth(spark, cfg, "2023-03")
    assert(cfg.catalog.read(spark, "fact_nyc").count() == 787042L)
    assert(cfg.catalog.read(spark, "report_monthly").count() == 143332L)

    // dims: seeds intact, no spurious upserts for the seeded keys
    assert(cfg.catalog.read(spark, "dim_type").count() == 2L)
    assert(cfg.catalog.read(spark, "dim_vendor")
      .filter(col("vendorName").startsWith("Unknown")).count() ==
      cfg.catalog.read(spark, "dim_vendor").count() - 2)
  }

  test("incremental append: 2023-02 lands exactly the February delta (R3 fixed)") {
    assume(available)
    val cfg = freshCfg()
    // January through the APPEND path: cold start, no watermark
    NycPipeline.bronzeMonth(spark, cfg, "2023-01")
    NycPipeline.silverMonth(spark, cfg, "2023-01")
    NycPipeline.goldAppend(spark, cfg, "2023-01")
    assert(cfg.catalog.read(spark, "fact_nyc").count() == 68208L)
    // watermark = the exact max LOADED pickup timestamp — the January
    // file's trailing early-February trip, NOT a day-granular date (the
    // reference's date-midnight watermark would re-insert that day's
    // trips on the next run: defect R3)
    val wm = cfg.catalog.read(spark, "fact_nyc_watermark").head().get(0)
    assert(wm.toString.replace(' ', 'T').startsWith("2023-02-01T03:10:05"))

    // February: strictly-newer rows append once; 89 late arrivals
    // at/below the watermark drop by contract
    NycPipeline.bronzeMonth(spark, cfg, "2023-02")
    NycPipeline.silverMonth(spark, cfg, "2023-02")
    NycPipeline.goldAppend(spark, cfg, "2023-02")
    val fact = cfg.catalog.read(spark, "fact_nyc")
    assert(fact.count() == 68208L + 64719L)
    assert(fact.filter(col("month_key") === "2023-02").count() == 64719L)
    // re-running February appends NOTHING (watermark advanced)
    NycPipeline.goldAppend(spark, cfg, "2023-02")
    assert(cfg.catalog.read(spark, "fact_nyc").count() == 68208L + 64719L)
  }

  test("append crash window: a leftover intent marker triggers month " +
      "rebuild, not a double append") {
    assume(available)
    val cfg = freshCfg()
    NycPipeline.bronzeMonth(spark, cfg, "2023-01")
    NycPipeline.silverMonth(spark, cfg, "2023-01")
    NycPipeline.goldAppend(spark, cfg, "2023-01")
    NycPipeline.bronzeMonth(spark, cfg, "2023-02")
    NycPipeline.silverMonth(spark, cfg, "2023-02")
    NycPipeline.goldAppend(spark, cfg, "2023-02")
    val wmBefore = cfg.catalog.read(spark, "fact_nyc_watermark")
      .head().get(0).toString
    // simulate the crash state goldAppend fences against: the batch
    // was APPENDED but the run died before the watermark write and
    // marker drop — fact holds February twice-appended rows, marker
    // still present, watermark stale. (Reproduce by hand-appending a
    // second copy of the February partition and restoring the marker.)
    val feb = cfg.catalog.read(spark, "fact_nyc")
      .filter(col("month_key") === "2023-02")
    assert(feb.count() == 64719L)
    cfg.catalog.append(feb, "fact_nyc", partitionBy = Seq("month_key"))
    assert(cfg.catalog.read(spark, "fact_nyc")
      .filter(col("month_key") === "2023-02").count() == 2 * 64719L)
    val sess = spark
    import sess.implicits._
    cfg.catalog.overwrite(Seq("2023-02").toDF("month_key"),
      "fact_nyc_append_pending")
    // the next append call recovers FIRST: February rebuilds to its
    // full backfill shape (64,808 = delta + the 89 late arrivals —
    // recovery is watermark-independent by contract), the marker
    // drops, the watermark never regresses, and the re-run appends
    // nothing new
    NycPipeline.goldAppend(spark, cfg, "2023-02")
    val fact = cfg.catalog.read(spark, "fact_nyc")
    assert(fact.filter(col("month_key") === "2023-02").count() == 64808L)
    assert(fact.filter(col("month_key") === "2023-01").count() == 68208L)
    assert(!cfg.catalog.exists(spark, "fact_nyc_append_pending"))
    val wmAfter = cfg.catalog.read(spark, "fact_nyc_watermark")
      .head().get(0).toString
    assert(wmAfter >= wmBefore, s"watermark regressed: $wmBefore -> $wmAfter")
    // and the recovered state is stable: another run is a no-op
    NycPipeline.goldAppend(spark, cfg, "2023-02")
    assert(cfg.catalog.read(spark, "fact_nyc").count() == 68208L + 64808L)
  }
}
