package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables
import graft.catalog.TableCatalog
import graft.etl.{Cleanse, DateDim, Reports, Star}

/** The medallion pipeline re-expressed over the testdata star schema:
  * bronze (verbatim partitioned ingest) → silver (cleanse to a canonical
  * fact-input schema) → gold (incremental dim upsert + watermark fact
  * append) → platinum (report marts). Mirrors the reference's asset
  * graph (SURVEY.md §0) with its defects fixed: unions are by-name (R1),
  * durations are seconds (R2), upserts are left-anti, the fact frame is
  * persisted once before its multi-action section instead of replanned
  * per action (reference recomputes for count/show/write/toPandas,
  * gold.py:256-347).
  *
  * Scale posture: every write is partitioned by calendar month, every
  * dim join is broadcast, the only wide shuffles are the fact groupBys,
  * and nothing ever `collect`s except the scalar watermark.
  *
  * Two entry points: [[runAll]] (whole-table watermark-incremental run)
  * and [[runMonth]] (one `yyyy-MM` partition — the reference's Dagster
  * unit of work, `MonthlyPartitionsDefinition`, bronze.py:49: backfill
  * or re-run a single month idempotently via dynamic partition replace).
  */
object Pipeline {
  final case class Config(srcDir: String, catalog: TableCatalog,
                          dateStart: String = "1995-01-01",
                          dateEnd: String = "2001-12-31")

  /** Calendar-month partition key ("1996-03") — the pipeline's unit of
    * work, mirroring the reference's monthly partitions (bronze.py:49).
    *
    * Every fact layer partitions on the ORDER month: lineitem rows are
    * tagged with their order's month at ingest (one join, once — the
    * stand-in for the reference's monthly raw files, whose path encodes
    * exactly this). Ship dates are uncorrelated with order dates in
    * this data, so partitioning lineitem by ship month would make a
    * month's fact depend on every other partition; keying both tables
    * on the same month makes each month self-contained and lets every
    * downstream join prune to one partition per side. */
  private def ym(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    date_format(c, "yyyy-MM")

  // ------------------------------------------------------------- bronze

  /** Raw lineitem rows tagged with their order's month key (left join:
    * orphan lineitems keep a NULL month and land in the default
    * partition rather than silently vanishing from bronze). */
  private def monthTaggedLineitem(spark: SparkSession, cfg: Config): DataFrame = {
    val orderMonths = Tables.orders(spark, cfg.srcDir)
      .select(col("o_orderkey").as("__ok"), ym(col("o_orderdate")).as("month_o"))
    Tables.lineitem(spark, cfg.srcDir)
      .join(orderMonths, col("l_orderkey") === col("__ok"), "left")
      .drop("__ok")
  }

  /** Verbatim ingest of the raw tables, facts partitioned by month. */
  def bronze(spark: SparkSession, cfg: Config): Unit = {
    bronzeDims(spark, cfg)
    cfg.catalog.overwrite(
      Tables.orders(spark, cfg.srcDir)
        .withColumn("month_o", ym(col("o_orderdate"))),
      "bronze_orders", partitionBy = Seq("month_o"))
    cfg.catalog.overwrite(monthTaggedLineitem(spark, cfg),
      "bronze_lineitem", partitionBy = Seq("month_o"))
  }

  private def bronzeDims(spark: SparkSession, cfg: Config): Unit =
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      cfg.catalog.overwrite(Tables.load(spark, cfg.srcDir, t), s"bronze_$t")
    }

  /** Bronze for one month: dims refresh (tiny, idempotent); orders and
    * lineitem land in exactly the `month` partition, replaced whole. */
  def bronzeMonth(spark: SparkSession, cfg: Config, month: String): Unit = {
    bronzeDims(spark, cfg)
    cfg.catalog.replacePartitions(
      Tables.orders(spark, cfg.srcDir)
        .withColumn("month_o", ym(col("o_orderdate")))
        .filter(col("month_o") === month),
      "bronze_orders", partitionBy = Seq("month_o"))
    cfg.catalog.replacePartitions(
      monthTaggedLineitem(spark, cfg).filter(col("month_o") === month),
      "bronze_lineitem", partitionBy = Seq("month_o"))
  }

  // ------------------------------------------------------------- silver

  /** Canonical cleansed fact input: dedup, required keys non-null,
    * derived measures, explicit casts (reference silver semantics).
    * The month partition key rides along (it is derived from the
    * order, so duplicate rows share it and full-row dedup is intact). */
  def silverLineitem(df: DataFrame): DataFrame =
    Cleanse.derive(
      Cleanse.requireNonNull(
        Cleanse.dedup(df),
        Seq("l_orderkey", "l_shipdate")),
      "disc_price" -> (col("l_extendedprice") * (lit(1) - col("l_discount"))),
      "charge" -> (col("l_extendedprice") * (lit(1) - col("l_discount"))
        * (lit(1) + col("l_tax"))))
      .withColumn("l_linenumber", col("l_linenumber").cast("int"))

  def silver(spark: SparkSession, cfg: Config): Unit = {
    cfg.catalog.overwrite(
      silverLineitem(cfg.catalog.read(spark, "bronze_lineitem")),
      "silver_lineitem", partitionBy = Seq("month_o"))
    cfg.catalog.overwrite(
      Cleanse.dedup(cfg.catalog.read(spark, "bronze_orders")),
      "silver_orders", partitionBy = Seq("month_o"))
  }

  /** Silver for one month: reads exactly the month's bronze partitions
    * (pruned at the scan) and replaces the month's silver partitions. */
  def silverMonth(spark: SparkSession, cfg: Config, month: String): Unit = {
    cfg.catalog.replacePartitions(
      silverLineitem(cfg.catalog.read(spark, "bronze_lineitem")
        .filter(col("month_o") === month)),
      "silver_lineitem", partitionBy = Seq("month_o"))
    cfg.catalog.replacePartitions(
      Cleanse.dedup(cfg.catalog.read(spark, "bronze_orders")
        .filter(col("month_o") === month)),
      "silver_orders", partitionBy = Seq("month_o"))
  }

  // --------------------------------------------------------------- gold

  /** Incremental dim upsert (left-anti new keys, reference gold
    * semantics incl. the 'Unknown' default label). */
  private def upsert(spark: SparkSession, cfg: Config, dimTable: String,
                     fresh: DataFrame, key: String, nameCol: String): Unit = {
    val dim =
      if (cfg.catalog.exists(spark, dimTable)) cfg.catalog.read(spark, dimTable)
      else fresh.limit(0).select(col(key))
        .withColumn(nameCol, lit("")).limit(0)
    val novel = Star.dimUpsert(fresh, dim, key, nameCol,
      concat(lit("Unknown "), col(key).cast("string")))
    if (!novel.isEmpty) cfg.catalog.append(novel, dimTable)
  }

  /** Calendar dim + the three key dims, idempotent (anti-join upsert). */
  private def ensureDims(spark: SparkSession, cfg: Config): Unit = {
    if (!cfg.catalog.exists(spark, "dim_date"))
      cfg.catalog.overwrite(DateDim.build(spark, cfg.dateStart, cfg.dateEnd),
        "dim_date")
    val orders = cfg.catalog.read(spark, "silver_orders")
    upsert(spark, cfg, "dim_priority", orders.select("o_orderpriority"),
      "o_orderpriority", "priority_name")
    upsert(spark, cfg, "dim_status", orders.select("o_orderstatus"),
      "o_orderstatus", "status_name")
    val customer = cfg.catalog.read(spark, "bronze_customer")
    upsert(spark, cfg, "dim_segment", customer.select("c_mktsegment"),
      "c_mktsegment", "segment_name")
  }

  /** The fact frame for the given order rows — shared by the watermark
    * append and the monthly partition rebuild. `liMonth` prunes the
    * lineitem side to one partition (both join inputs are keyed on the
    * order month, so a month's fact never reads another month's data). */
  private def buildFact(spark: SparkSession, cfg: Config,
                        orders: DataFrame,
                        liMonth: Option[String] = None): DataFrame = {
    val dateDim = cfg.catalog.read(spark, "dim_date")
    val customer = cfg.catalog.read(spark, "bronze_customer")
    val li0 = cfg.catalog.read(spark, "silver_lineitem")
    val li = liMonth.fold(li0)(m => li0.filter(col("month_o") === m))
      .drop("month_o")
    Star.joinDateDim(
      Star.joinDateDim(
        li.join(orders, li("l_orderkey") === orders("o_orderkey"), "inner"),
        dateDim, "o_orderdate", "date_o_id"),
      dateDim, "l_shipdate", "date_s_id")
      .join(broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"), "inner")
      .select(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("disc_price"), col("charge"),
        col("l_returnflag"), col("l_linestatus"), col("o_orderdate"),
        col("o_orderpriority"), col("o_orderstatus"), col("o_totalprice"),
        col("c_mktsegment"), col("date_o_id"), col("date_s_id"),
        ym(col("o_orderdate")).as("month_o"))
      .na.fill(0.0)
  }

  /** Gold: upsert dims, then watermark-incremental fact append joined to
    * the calendar dimension on both order and ship dates. */
  def gold(spark: SparkSession, cfg: Config): Unit = {
    ensureDims(spark, cfg)
    val orders = cfg.catalog.read(spark, "silver_orders")
    val wm =
      if (cfg.catalog.exists(spark, "fact_sales"))
        Star.watermark(cfg.catalog.read(spark, "fact_sales"), "o_orderdate")
      else None
    val fact = buildFact(spark, cfg,
      Star.newerThan(orders.drop("month_o"), "o_orderdate", wm))
    if (!fact.isEmpty) cfg.catalog.append(fact, "fact_sales",
      partitionBy = Seq("month_o"))
  }

  /** Gold for one month: rebuild the fact partition from that month's
    * orders and lineitems (one pruned partition per side) and replace
    * it in place — re-running a month is a no-op by construction,
    * independent of the watermark. */
  def goldMonth(spark: SparkSession, cfg: Config, month: String): Unit = {
    ensureDims(spark, cfg)
    val orders = cfg.catalog.read(spark, "silver_orders")
      .filter(col("month_o") === month).drop("month_o")
    cfg.catalog.replacePartitions(buildFact(spark, cfg, orders, Some(month)),
      "fact_sales", partitionBy = Seq("month_o"))
  }

  // ----------------------------------------------------------- platinum

  private val reportMeasures = Seq(
    Reports.Measure("quantity", col("l_quantity"), Reports.Integral),
    Reports.Measure("price", col("l_extendedprice"), Reports.Money),
    Reports.Measure("disc_price", col("disc_price"), Reports.Money),
    Reports.Measure("charge", col("charge"), Reports.Money),
    Reports.Measure("totalprice", col("o_totalprice"), Reports.Money))

  /** Monthly + weekly report marts off one persisted fact ⋈ date frame
    * (the reference replans this subtree per mart; we share it). */
  def platinum(spark: SparkSession, cfg: Config): Unit = {
    val fact = cfg.catalog.read(spark, "fact_sales")
    val dd = cfg.catalog.read(spark, "dim_date")
      .select(col("dateID").as("date_o_id"), col("year"),
        col("month"), col("weekOfYear"), col("dayName"))
    val joined = Star.joinDim(fact, dd, Seq("date_o_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      cfg.catalog.overwrite(
        Reports.report(joined,
          Seq(col("year"), col("month"), col("l_returnflag"),
            col("o_orderpriority"), col("c_mktsegment")),
          reportMeasures),
        "report_monthly")
      cfg.catalog.overwrite(
        Reports.report(joined,
          Seq(col("year"), col("weekOfYear"), col("dayName"),
            col("l_returnflag"), col("c_mktsegment")),
          reportMeasures),
        "report_weekly")
    } finally joined.unpersist()
  }

  // ----------------------------------------------------- dedup artifacts

  /** Materialize the duplicate-pair graph of a document corpus into the
    * pipeline catalog — the medallion treatment of near-dup state: the
    * similarity join (hours at 100 TB) runs once, its KB-scale output
    * becomes a table, and every consumer reads the table. Idempotent
    * overwrite, like every other pipeline artifact. */
  def dupPairs(docs: DataFrame, idCol: String, textCol: String,
               cfg: Config, ngramN: Int = 5, threshold: Double = 0.8): Unit =
    graft.dedup.Curation.materializePairs(docs, idCol, textCol,
      cfg.catalog, "dup_pairs", ngramN, threshold)

  /** Duplicate clusters resolved off the PERSISTED pair graph: reads
    * only the `dup_pairs` table — no document scan, no similarity join
    * anywhere in the plan. Re-running after [[dupPairs]] refreshes is
    * seconds, not hours, whatever the corpus size. */
  def dupClusters(spark: SparkSession, cfg: Config): DataFrame =
    graft.dedup.Curation.componentsFromCatalog(spark, cfg.catalog, "dup_pairs")

  def runAll(spark: SparkSession, cfg: Config): Unit = {
    bronze(spark, cfg); silver(spark, cfg); gold(spark, cfg); platinum(spark, cfg)
  }

  /** Materialize ONE calendar month end-to-end — the reference user's
    * "re-run March" (Dagster backfills one `MonthlyPartitionsDefinition`
    * partition): bronze/silver/fact partitions for `month` ("1996-03")
    * are rebuilt and replaced in place; dims upsert idempotently;
    * report marts refresh off the updated fact. Safe to run for any
    * subset of months, in any order, any number of times. */
  def runMonth(spark: SparkSession, cfg: Config, month: String): Unit = {
    bronzeMonth(spark, cfg, month)
    silverMonth(spark, cfg, month)
    goldMonth(spark, cfg, month)
    platinum(spark, cfg)
  }
}
