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
}
