package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: the shuffle-elimination path for joins
  * repeated against the same key at scale (SURVEY §4.1 / the 100 TB
  * posture — pre-bucket the fact on its join key once, then every
  * downstream join on that key is exchange-free). */
class BucketingSpec extends SparkTestBase {

  test("join of two tables bucketed on the key runs without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")

    val joined = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("q"))
    val rows = joined.collect()
    assert(rows.nonEmpty)

    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shufflesBelowJoin = plan.collect {
      case e: ShuffleExchangeExec => e
    }
    // exactly one exchange (for the groupBy); the join itself is
    // co-located via bucketing
    assert(shufflesBelowJoin.size <= 1,
      s"expected bucketed join without shuffle, got:\n$plan")
  }

  test("catalog.Bucketed external tables: exchange-free join, layout changes no answer") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bkt_").toString
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    graft.catalog.Bucketed.write(o, "spec_bkt_o", s"$root/o",
      "o_custkey", buckets = 8)
    graft.catalog.Bucketed.write(c, "spec_bkt_c", s"$root/c",
      "c_custkey", buckets = 8)
    // one file per bucket: the write repartitions on the bucket hash
    val files = new java.io.File(s"$root/o").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 8, s"expected 8 bucket files, got $files")

    val bo = graft.catalog.Bucketed.table(spark, "spec_bkt_o")
    val bc = graft.catalog.Bucketed.table(spark, "spec_bkt_c")
    val joined = bo.join(bc, bo("o_custkey") === bc("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("s"))
    val got = joined.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq

    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(plan.collect { case e: ShuffleExchangeExec => e }.size <= 1,
      s"expected only the groupBy exchange, got:\n$plan")

    // the same aggregate straight off the source parquet
    val want = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("s"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == want)
  }
}
