package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** ops.Sketches: mergeable HLL distinct-count sketches. */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private def events = Tables.events(spark, sf)
    .withColumn("month", date_format(col("ts"), "yyyy-MM"))

  test("merge-then-estimate equals estimate-of-full (not just close)") {
    val perMonth = Sketches.distinctSketch(events, col("user_id"), Seq("month"))
    val merged = Sketches.rollup(perMonth, Seq.empty)
      .select("n_distinct_est").as[Long].head()
    val direct = Sketches.rollup(
        Sketches.distinctSketch(events, col("user_id"), Seq.empty), Seq.empty)
      .select("n_distinct_est").as[Long].head()
    assert(merged == direct) // HLL merge is exact, not approximate
  }

  test("estimate within the lgK=12 error bound of the exact count") {
    val est = Sketches.rollup(
        Sketches.distinctSketch(events, col("event_type"), Seq.empty), Seq.empty)
      .select("n_distinct_est").as[Long].head()
    val exact = events.select(countDistinct(col("event_type"))).head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05, s"est=$est exact=$exact")
  }

  test("incremental: old sketch + new batch == full recompute, and replays are idempotent") {
    val old = events.filter(dayofmonth(col("ts")) < 15)
    val batch = events.filter(dayofmonth(col("ts")) >= 15)
    val oldSk = Sketches.distinctSketch(old, col("user_id"), Seq.empty)
    val batchSk = Sketches.distinctSketch(batch, col("user_id"), Seq.empty)
    val incremental = Sketches.rollup(oldSk.unionByName(batchSk), Seq.empty)
      .select("n_distinct_est").as[Long].head()
    val full = Sketches.rollup(
        Sketches.distinctSketch(events, col("user_id"), Seq.empty), Seq.empty)
      .select("n_distinct_est").as[Long].head()
    assert(incremental == full)
    // replaying the same batch sketch changes nothing (max-register merge)
    val replayed = Sketches.rollup(
        oldSk.unionByName(batchSk).unionByName(batchSk), Seq.empty)
      .select("n_distinct_est").as[Long].head()
    assert(replayed == full)
  }

  test("rollup to a coarser grouping preserves row accounting") {
    val byTypeMonth = Sketches.distinctSketch(events, col("user_id"),
      Seq("event_type", "month"))
    val byType = Sketches.rollup(byTypeMonth, Seq("event_type"))
    val n = byType.agg(sum("n_rows")).head().getLong(0)
    assert(n == events.count())
  }
}
