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

  // ---- Count-Min frequency sketches ----

  private def toks = Tables.documents(spark, sf)
    .select(col("source"),
      explode(graft.text.TextFunctions.tokens(col("text"))).as("token"))

  test("cm: estimates upper-bound exact counts; sketch mass is conserved") {
    val sk = toks.agg(graft.functions.aggs.cm_sketch(col("token"), 4, 256)
      .as("sk"))
    val exact = toks.groupBy("token").count()
    val est = exact.crossJoin(broadcast(sk))
      .select(col("token"), col("count"),
        Sketches.cmEstimate(col("sk"), col("token"), 4, 256).as("est"))
      .as[(String, Long, Long)].collect()
    assert(est.nonEmpty && est.forall { case (_, c, e) => e >= c })
    // every row of the grid holds the full stream mass
    val total = toks.count()
    val grid = sk.select(col("sk")).as[Seq[Long]].head()
    (0 until 4).foreach { r =>
      assert(grid.slice(r * 256, (r + 1) * 256).sum == total)
    }
  }

  test("cm: merged per-source sketches equal the global sketch, bit-exactly") {
    val perSource = Sketches.freqSketch(toks, col("token"), Seq("source"))
    val merged = Sketches.rollupFreq(perSource, Seq.empty)
      .select("sketch").as[Seq[Long]].head()
    val direct = toks.agg(graft.functions.aggs.cm_sketch(col("token"), 4, 256)
      .as("sk")).select("sk").as[Seq[Long]].head()
    assert(merged == direct)
  }

  test("cm: sketch is partition-independent") {
    val a = toks.agg(graft.functions.aggs.cm_sketch(col("token"), 4, 256)
      .as("sk")).select("sk").as[Seq[Long]].head()
    val b = toks.repartition(13)
      .agg(graft.functions.aggs.cm_sketch(col("token"), 4, 256)
        .as("sk")).select("sk").as[Seq[Long]].head()
    assert(a == b)
  }
}
