package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.{Cleanse, DateDim, Reports, Star}
import graft.ops.Exact

/** Driver contract — one entry per implemented operator class from
  * SURVEY.md §2, each with a DuckDB oracle twin in [[oracleSql]].
  *
  * Float-output discipline: every double column is bit-deterministic
  * (exact integral sums / identical op sequences on both engines) —
  * see [[graft.ops.Exact]] — so the driver's hash compare is stable.
  */
object SparkEntry {
  import Tables._

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q09_monthly_report")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- helpers

  private def centsSum(c: Column) = Exact.sumMoney(c)

  /** Lineitem with the silver-style derived columns used downstream. */
  private def cleansedLineitem(s: SparkSession, dir: String): DataFrame =
    Cleanse.derive(
      lineitem(s, dir),
      "disc_price" -> (col("l_extendedprice") * (lit(1) - col("l_discount"))),
      "charge" -> (col("l_extendedprice") * (lit(1) - col("l_discount"))
        * (lit(1) + col("l_tax"))))

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A3/A4-class: grouped aggregation with deterministic sums & means
    // (reference report shape, platinum.py:88-112).
    "q01_pricing_summary" -> ((s, dir) => {
      cleansedLineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Exact.sumIntegral(col("l_quantity")).as("sum_qty"),
          centsSum(col("l_extendedprice")).as("sum_base_price"),
          centsSum(col("disc_price")).as("sum_disc_price"),
          centsSum(col("charge")).as("sum_charge"),
          Exact.avgIntegral(col("l_quantity")).as("avg_qty"),
          Exact.avgMoney(col("l_extendedprice")).as("avg_price"),
          (sum(round(col("l_discount") * 10000)) / lit(10000.0) / count(lit(1)))
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // P1/P5/P8/P9-class: filter + projection + arithmetic + cast
    // (reference silver cleanse, silver.py:67-85).
    "q02_filter_project" -> ((s, dir) => {
      lineitem(s, dir)
        .filter(col("l_discount") >= 0.05 && col("l_quantity") < 25)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (round(col("l_extendedprice") * col("l_discount") * 100) / lit(100.0))
            .as("disc_amount"),
          col("l_quantity").cast("int").as("qty_int"))
    }),

    // J1/J6-class: multi-way equi-join with broadcast dims + grouped agg
    // (reference report joins, platinum.py:132-142).
    "q03_region_revenue" -> ((s, dir) => {
      val o = orders(s, dir); val c = customer(s, dir)
      val n = nation(s, dir).withColumnRenamed("n_nationkey", "c_nationkey")
      val r = region(s, dir).withColumnRenamed("r_regionkey", "n_regionkey")
      val joined = o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      Star.joinDim(Star.joinDim(joined, n, Seq("c_nationkey")), r, Seq("n_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_orders"),
          centsSum(col("o_totalprice")).as("revenue"))
    }),

    // F9-class: generated calendar dimension (replaces the reference's
    // MySQL stored procedure, create_datamart.sql:43-91).
    "q04_date_dim" -> ((s, _) => DateDim.build(s, "1995-01-01", "1996-12-31")),

    // J3-class: new-key detection as LEFT ANTI (reference right-join +
    // isNull, gold.py:93-94).
    "q05_anti_join_new_keys" -> ((s, dir) => {
      val c = customer(s, dir)
      val o = orders(s, dir).filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    }),

    // A1/P6-class: scalar watermark + incremental filter (reference
    // batch-incremental load, gold.py:56-65,278).
    "q06_watermark_incremental" -> ((s, dir) => {
      val o = orders(s, dir)
      val wm = Star.watermark(o.filter(col("o_orderstatus") === "F"), "o_orderdate")
      Star.newerThan(o, "o_orderdate", wm)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          centsSum(col("o_totalprice")).as("sum_total"))
    }),

    // U1-class: schema-aligned union + distinct (fixes reference defect
    // R1 — positional union, gold.py:273).
    "q07_union_dedup" -> ((s, dir) => {
      Cleanse.dedup(Cleanse.unionConformed(Seq(
        lineitem(s, dir).select(col("l_suppkey").as("suppkey")),
        supplier(s, dir).select(col("s_suppkey").as("suppkey")))))
    }),

    // O1-class: deterministic top-k (sort + limit with unique tiebreak).
    "q08_top_customers" -> ((s, dir) => {
      customer(s, dir)
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .limit(10)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    }),

    // E3-class: the platinum monthly report shape — date-dim join +
    // multi-key groupBy with avg+sum per measure + count
    // (platinum.py:69-154).
    "q09_monthly_report" -> ((s, dir) => {
      val fact = factBase(s, dir)
      Reports.report(fact,
        Seq(col("year_o"), col("month_o"), col("l_returnflag"),
          col("o_orderpriority"), col("c_mktsegment")),
        Seq(
          Reports.Measure("quantity", col("l_quantity"), Reports.Integral),
          Reports.Measure("price", col("l_extendedprice"), Reports.Money),
          Reports.Measure("disc_price", col("disc_price"), Reports.Money),
          Reports.Measure("charge", col("charge"), Reports.Money),
          Reports.Measure("totalprice", col("o_totalprice"), Reports.Money)))
    }),

    // E3-class: weekly report twin — keys swap month for ISO week +
    // day name (platinum.py:166-252).
    "q10_weekly_report" -> ((s, dir) => {
      val fact = factBase(s, dir)
        .withColumn("week_o", weekofyear(col("o_orderdate")))
        .withColumn("day_name_o", date_format(col("o_orderdate"), "EEEE"))
      Reports.report(fact,
        Seq(col("year_o"), col("week_o"), col("day_name_o"),
          col("l_returnflag"), col("c_mktsegment")),
        Seq(
          Reports.Measure("quantity", col("l_quantity"), Reports.Integral),
          Reports.Measure("price", col("l_extendedprice"), Reports.Money)))
    }),
  )

  /** Shared gold-style fact: lineitem ⋈ orders ⋈ customer with derived
    * calendar attributes (reference fact build, gold.py:256-330). */
  private def factBase(s: SparkSession, dir: String): DataFrame = {
    val li = cleansedLineitem(s, dir)
    val o = orders(s, dir)
    val c = customer(s, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"), "inner")
      .join(c, o("o_custkey") === c("c_custkey"), "inner")
      .withColumn("year_o", year(col("o_orderdate")))
      .withColumn("month_o", month(col("o_orderdate")))
  }

  // ----------------------------------------------------------------- oracle

  private val discPrice = "(l_extendedprice*(1-l_discount))"
  private val charge    = "(l_extendedprice*(1-l_discount)*(1+l_tax))"

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | sum(l_quantity) AS sum_qty,
         | ${Exact.sql.sumMoney("l_extendedprice")} AS sum_base_price,
         | ${Exact.sql.sumMoney(discPrice)} AS sum_disc_price,
         | ${Exact.sql.sumMoney(charge)} AS sum_charge,
         | ${Exact.sql.avgIntegral("l_quantity")} AS avg_qty,
         | ${Exact.sql.avgMoney("l_extendedprice")} AS avg_price,
         | sum(round(l_discount*10000))/10000.0/count(*) AS avg_disc,
         | count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_extendedprice*l_discount*100)/100.0 AS disc_amount,
        | CAST(l_quantity AS INTEGER) AS qty_int
        |FROM lineitem WHERE l_discount >= 0.05 AND l_quantity < 25""".stripMargin,

    "q03_region_revenue" ->
      s"""SELECT r_name, count(*) AS n_orders,
         | ${Exact.sql.sumMoney("o_totalprice")} AS revenue
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name""".stripMargin,

    "q04_date_dim" -> DateDim.sql("1995-01-01", "1996-12-31"),

    "q05_anti_join_new_keys" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""".stripMargin,

    "q06_watermark_incremental" ->
      s"""SELECT o_orderpriority, count(*) AS n_orders,
         | ${Exact.sql.sumMoney("o_totalprice")} AS sum_total
         |FROM orders
         |WHERE o_orderdate > (SELECT max(o_orderdate) FROM orders
         |                     WHERE o_orderstatus = 'F')
         |GROUP BY o_orderpriority""".stripMargin,

    "q07_union_dedup" ->
      """SELECT DISTINCT suppkey FROM (
        | SELECT l_suppkey AS suppkey FROM lineitem
        | UNION ALL SELECT s_suppkey AS suppkey FROM supplier)""".stripMargin,

    "q08_top_customers" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey LIMIT 10""".stripMargin,

    "q09_monthly_report" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS year_o,
         | CAST(month(o_orderdate) AS INTEGER) AS month_o,
         | l_returnflag, o_orderpriority, c_mktsegment,
         | ${Reports.sqlAggs(Seq(
             ("quantity", "l_quantity", Reports.Integral),
             ("price", "l_extendedprice", Reports.Money),
             ("disc_price", discPrice, Reports.Money),
             ("charge", charge, Reports.Money),
             ("totalprice", "o_totalprice", Reports.Money)))}
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1, 2, 3, 4, 5""".stripMargin,

    "q10_weekly_report" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS year_o,
         | CAST(weekofyear(o_orderdate) AS INTEGER) AS week_o,
         | dayname(o_orderdate) AS day_name_o,
         | l_returnflag, c_mktsegment,
         | ${Reports.sqlAggs(Seq(
             ("quantity", "l_quantity", Reports.Integral),
             ("price", "l_extendedprice", Reports.Money)))}
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1, 2, 3, 4, 5""".stripMargin,
  )
}
