package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.GlobalOrder

/** ops.GlobalOrder: exact global rank under a seeded hash without a
  * single-task window. */
class GlobalOrderSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf).select("doc_id")

  test("pos is a permutation equal to the naive global window") {
    val got = GlobalOrder
      .deterministicShuffle(docs, "doc_id", "s1", nBuckets = 8)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    val h = md5(concat(lit("s1"), lit(":"), col("doc_id").cast("string")))
    val want = docs
      .withColumn("pos",
        row_number().over(Window.orderBy(h, col("doc_id"))) - lit(1L))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
    assert(got.values.toSeq.sorted == (0L until got.size.toLong))
  }

  test("a new seed is a new permutation; the same seed reproduces") {
    val a = GlobalOrder.deterministicShuffle(docs, "doc_id", "s1", 8)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    val b = GlobalOrder.deterministicShuffle(docs, "doc_id", "s2", 8)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    val a2 = GlobalOrder
      .deterministicShuffle(docs.repartition(7), "doc_id", "s1", 8)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(a == a2)   // partitioning- and rerun-stable
    assert(a != b)    // 500 docs: colliding permutations are absurd
  }

  test("no single-task exchange ever carries corpus rows") {
    val plan = GlobalOrder.deterministicShuffle(docs, "doc_id", "s1", 8)
      .queryExecution.executedPlan
    // the offsets frame (<= nBuckets aggregated rows) may legally pass
    // through one partition; any single-partition exchange must
    // therefore sit ABOVE an aggregation, never on the raw data path
    val singles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.outputPartitioning.numPartitions == 1 => e
    }
    singles.foreach { e =>
      val aggBelow = e.child.collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }
      assert(aggBelow.nonEmpty, e.toString)
    }
    // and the corpus-ranking window is bucket-partitioned
    assert(plan.toString.contains("windowspecdefinition(__bkt"),
      plan.toString)
  }

  test("bucket count does not change ranks") {
    val a = GlobalOrder.deterministicShuffle(docs, "doc_id", "s9", 2)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    val b = GlobalOrder.deterministicShuffle(docs, "doc_id", "s9", 64)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}
