package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Quantiles

/** ops.Quantiles: the two-phase scale-safe rank windows (q52). */
class QuantilesSpec extends SparkTestBase {
  import spark.implicits._

  test("distribution is bit-identical to the window form on customers") {
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    val windowed = cust.select(col("c_custkey"), col("c_mktsegment"),
      col("c_acctbal"),
      ntile(4).over(w).as("balance_quartile"),
      percent_rank().over(w).as("balance_pct_rank"))
    val twoPhase = Quantiles.distribution(cust,
      "c_mktsegment", "c_acctbal", "c_custkey")
      .select(windowed.columns.map(col): _*)
    assert(twoPhase.orderBy("c_custkey").collect().toSeq ==
      windowed.orderBy("c_custkey").collect().toSeq)
  }

  test("the per-row window sorts per (segment, bucket), not per segment") {
    // the scale property: the only window over the DATA partitions by
    // (segment, bucket) — each reducer sorts ~1/nBuckets of a segment.
    // The per-segment windows that remain run over the bucket-count
    // frame (|segments|*nBuckets rows), never the data.
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val plan = Quantiles.distribution(cust,
      "c_mktsegment", "c_acctbal", "c_custkey")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__bkt"), plan.take(2000))
  }

  test("uneven tiles and singleton segments match ntile semantics") {
    // 7 rows / 4 tiles: sizes 2,2,2,1 — exercises the n%t big-tile
    // split; a singleton segment pins the pct_rank 0/0 guard
    val df = Seq(
      ("A", 10.0, 1L), ("A", 20.0, 2L), ("A", 30.0, 3L), ("A", 40.0, 4L),
      ("A", 50.0, 5L), ("A", 60.0, 6L), ("A", 70.0, 7L),
      ("B", 99.0, 8L)
    ).toDF("seg", "v", "id")
    val w = Window.partitionBy(col("seg")).orderBy(col("v").asc, col("id").asc)
    val expect = df.select(col("id"), ntile(4).over(w).as("t"),
      percent_rank().over(w).as("pr"))
    val got = Quantiles.distribution(df, "seg", "v", "id")
      .select(col("id"), col("balance_quartile").as("t"),
        col("balance_pct_rank").as("pr"))
    assert(got.orderBy("id").collect().toSeq ==
      expect.orderBy("id").collect().toSeq)
  }

  test("null segments and all-null-value segments rank like the window form") {
    // Window.partitionBy treats a null segment as its own partition and
    // sorts null values first; the two-phase form must reproduce both
    // (null-safe joins, null-sketch bucket-0 fallback), not drop rows
    val df = Seq(
      (Option.empty[String], Some(3.0), 1L),
      (Option.empty[String], Some(1.0), 2L),
      (Option.empty[String], Option.empty[Double], 3L), // null value too
      (Some("A"), Option.empty[Double], 4L),            // all-null segment
      (Some("A"), Option.empty[Double], 5L),
      (Some("B"), Some(7.0), 6L), (Some("B"), Some(2.0), 7L)
    ).toDF("seg", "v", "id")
    val w = Window.partitionBy(col("seg")).orderBy(col("v").asc, col("id").asc)
    val expect = df.select(col("id"), ntile(4).over(w).as("t"),
      percent_rank().over(w).as("pr"))
    val got = Quantiles.distribution(df, "seg", "v", "id")
      .select(col("id"), col("balance_quartile").as("t"),
        col("balance_pct_rank").as("pr"))
    assert(got.count() == df.count()) // nothing silently dropped
    assert(got.orderBy("id").collect().toSeq ==
      expect.orderBy("id").collect().toSeq)
  }

  test("tied values land in one bucket and rank by the tiebreak") {
    // many duplicates of one value — the sketch may place a boundary
    // AT the tie; membership is strict-below so all ties share a bucket
    val df = (1L to 40L).map(i => ("S", if (i <= 30) 5.0 else i.toDouble, i))
      .toDF("seg", "v", "id")
    val w = Window.partitionBy(col("seg")).orderBy(col("v").asc, col("id").asc)
    val expect = df.select(col("id"), ntile(4).over(w).as("t"),
      percent_rank().over(w).as("pr"))
    val got = Quantiles.distribution(df, "seg", "v", "id", nBuckets = 8)
      .select(col("id"), col("balance_quartile").as("t"),
        col("balance_pct_rank").as("pr"))
    assert(got.orderBy("id").collect().toSeq ==
      expect.orderBy("id").collect().toSeq)
  }

  test("equiDepthHistogram matches the global NTILE window; spans nest") {
    val df = (1L to 100L).map(i => (i, (i * i % 97).toDouble))
      .toDF("id", "v")
    val w = Window.orderBy(col("v").asc, col("id").asc)
    val expect = df.select(col("v"), ntile(8).over(w).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val got = Quantiles.equiDepthHistogram(df, "v", "id", nTiles = 8)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == expect && got.size == 8)
    // equal depth: bucket sizes differ by at most one
    val sizes = got.values.map(_._1)
    assert(sizes.max - sizes.min <= 1)
    // buckets tile the value axis in order
    val byBucket = got.toSeq.sortBy(_._1).map(_._2)
    byBucket.sliding(2).foreach { case Seq(a, b) => assert(a._3 <= b._2)
      case _ => () }
  }

  test("equiDepthHistogram skips nulls and never funnels into one window task") {
    val df = (1L to 50L).map(i =>
        (i, if (i % 10 == 0) None else Some(i.toDouble)))
      .toDF("id", "v")
    val out = Quantiles.equiDepthHistogram(df, "v", "id", nTiles = 5)
    assert(out.agg(sum("n")).head().getLong(0) == 45L)
    // the rank runs through bucket-partitioned windows (the
    // GlobalOrderSpec contract), never an empty partition spec
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("__bkt"), plan.take(2000))
    assert(!plan.contains("windowspecdefinition(v#"), plan.take(2000))
  }
}
