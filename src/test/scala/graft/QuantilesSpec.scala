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

  test("weightedLowerMedian: mass decides, not row count; unit weights reduce to the row median") {
    val df = Seq(
      ("a", 1L, 1L, 1L), ("a", 2L, 2L, 1L), ("a", 3L, 100L, 10L),
      ("b", 4L, 1L, 1L), ("b", 5L, 2L, 1L), ("b", 6L, 3L, 1L),
      ("b", 7L, 4L, 1L)).toDF("seg", "id", "v", "w")
    val out = Quantiles.weightedLowerMedian(df, "seg", "v", "w", "id")
      .select("seg", "w_median", "total_weight")
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // seg a: W=12, ceil 6 — the heavy doc carries the median token
    // seg b: unit weights — plain lower median of (1,2,3,4) = 2
    assert(out == Map("a" -> ((100L, 12L)), "b" -> ((2L, 4L))))
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

  test("quantileNormalize: single-segment identity, row preservation, monotone mapping") {
    import spark.implicits._
    // one segment: the mapping is the identity (pos == r, value == value)
    val one = (1L to 20L).map(i => ("s", i, i * 3)).toDF("seg", "id", "v")
    val idOut = Quantiles.quantileNormalize(one, "seg", "v", "id",
      nBuckets = 4).collect()
    assert(idOut.length == 20)
    idOut.foreach(r =>
      assert(r.getAs[Long]("norm_value") == r.getAs[Long]("v")))

    // two skewed segments: every row survives, and within a segment
    // the normalized value is monotone in the original
    val rnd = new scala.util.Random(7)
    val rows = (1L to 60L).map(i => ("small", i, rnd.nextInt(50).toLong)) ++
      (61L to 160L).map(i => ("big", i, 1000L + rnd.nextInt(50)))
    val out = Quantiles.quantileNormalize(rows.toDF("seg", "id", "v"),
      "seg", "v", "id", nBuckets = 8).collect()
    assert(out.length == 160)
    out.groupBy(_.getAs[String]("seg")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r.getAs[Long]("v"), r.getAs[Long]("id")))
      sorted.sliding(2).foreach { p =>
        if (p.length == 2)
          assert(p(0).getAs[Long]("norm_value") <=
            p(1).getAs[Long]("norm_value"))
      }
      // a segment's top rank maps to the pooled maximum
      assert(sorted.last.getAs[Long]("pos") == 160L)
    }
    // after normalization both segments draw from the SAME pooled
    // values — their medians coincide where the raw medians differ
    // by ~1000
    val med = out.groupBy(_.getAs[String]("seg")).map { case (s, rs) =>
      s -> rs.map(_.getAs[Long]("norm_value")).sorted
        .apply(rs.length / 2)
    }
    val gap = math.abs(med("small") - med("big"))
    assert(gap <= 60L, s"medians still far apart: $med")
  }
}
