package graft

import org.apache.spark.sql.functions._
import graft.catalog.ParquetCatalog
import graft.runner.Pipeline

/** runner.Pipeline: full medallion run + incremental re-run safety. */
class PipelineSpec extends SparkTestBase {

  lazy val root = java.nio.file.Files.createTempDirectory("graft-wh").toString
  lazy val cfg = Pipeline.Config(sf, new ParquetCatalog(root))

  test("full run materializes every layer") {
    Pipeline.runAll(spark, cfg)
    val fact = cfg.catalog.read(spark, "fact_sales")
    assert(fact.count() > 0)
    // facts survive only within the calendar dim's range (inner join)
    assert(cfg.catalog.read(spark, "report_monthly").count() > 0)
    assert(cfg.catalog.read(spark, "report_weekly").count() > 0)
    assert(cfg.catalog.read(spark, "dim_priority").count() > 0)
    // partitioned fact layout: month_o=... subdirectories exist
    val dirs = new java.io.File(s"$root/fact_sales").list()
    assert(dirs.exists(_.startsWith("month_o=")))
  }

  test("gold re-run is a no-op: watermark blocks re-insert, dims stable") {
    Pipeline.runAll(spark, cfg) // ensure first run happened
    val factBefore = cfg.catalog.read(spark, "fact_sales").count()
    val dimBefore = cfg.catalog.read(spark, "dim_priority").count()
    Pipeline.gold(spark, cfg)
    assert(cfg.catalog.read(spark, "fact_sales").count() == factBefore)
    assert(cfg.catalog.read(spark, "dim_priority").count() == dimBefore)
  }

  test("month filter on the fact prunes partitions at the scan") {
    Pipeline.runAll(spark, cfg)
    val filtered = cfg.catalog.read(spark, "fact_sales")
      .filter(col("month_o") === "1996-03")
    val scan = filtered.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty, "month_o should be a partition filter")
    assert(filtered.count() > 0)
  }

  test("silver cleanse drops duplicate rows and null keys") {
    val li = Tables.lineitem(spark, sf).withColumn("month_s", month(col("l_shipdate")))
    val withDups = li.unionByName(li.limit(5))
    assert(Pipeline.silverLineitem(withDups).count() == li.count())
  }

  test("dupPairs materializes the pair graph; dupClusters resolves off it") {
    val docs = Tables.documents(spark, sf)
    Pipeline.dupPairs(docs, "doc_id", "text", cfg, ngramN = 5, threshold = 0.4)
    assert(cfg.catalog.exists(spark, "dup_pairs"))
    val clusters = Pipeline.dupClusters(spark, cfg)
    // resolution reads only the persisted graph — corpus never rescanned
    val plan = clusters.queryExecution.sparkPlan.toString
    assert(!plan.contains("documents.parquet"), plan.take(2000))
    // identical to the self-contained transitive closure
    val fresh = graft.dedup.Dedup.connectedComponents(
      graft.dedup.Dedup.exactNgramJaccardPairs(
        docs, "doc_id", "text", n = 5, threshold = 0.4))
    assert(clusters.orderBy("id").collect().toSeq ==
      fresh.orderBy("id").collect().toSeq)
  }

  test("dim upsert labels unseen keys with Unknown default") {
    val dim = cfg.catalog.read(spark, "dim_priority")
    val r = dim.head()
    assert(r.getAs[String]("priority_name").startsWith("Unknown "))
  }

  test("runMonth backfills one month, re-runs are no-ops, counts match full run") {
    Pipeline.runAll(spark, cfg) // reference warehouse
    val month = "1996-03"
    val full = cfg.catalog.read(spark, "fact_sales")
      .filter(col("month_o") === month).count()
    assert(full > 0)

    val root2 = java.nio.file.Files.createTempDirectory("graft-wh-m").toString
    val cfg2 = Pipeline.Config(sf, new ParquetCatalog(root2))
    Pipeline.runMonth(spark, cfg2, month)
    val fact2 = cfg2.catalog.read(spark, "fact_sales")
    assert(fact2.count() == full, "single-month backfill must match the full run")
    assert(fact2.select("month_o").distinct().count() == 1)

    // re-run: dynamic partition replace makes it idempotent
    Pipeline.runMonth(spark, cfg2, month)
    assert(cfg2.catalog.read(spark, "fact_sales").count() == full)

    // a second month lands beside the first without touching it
    Pipeline.runMonth(spark, cfg2, "1996-04")
    val months = cfg2.catalog.read(spark, "fact_sales")
      .select("month_o").distinct().count()
    assert(months == 2)
    assert(cfg2.catalog.read(spark, "fact_sales")
      .filter(col("month_o") === month).count() == full)
  }
}
