package graft

import org.apache.spark.sql.functions._
import graft.sim.Whitening

/** sim.Whitening: exact per-dimension moments for standardization
  * (q130). */
class WhiteningSpec extends SparkTestBase {

  test("moments match the naive computation on crafted vectors") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.5, -0.25)), (2L, Array(1.0, 0.75)), (3L, Array(-0.5, 0.0)))
      .toDF("vec_id", "embedding")
    val r = Whitening.dimMoments(df, scale = 2).orderBy("dim").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // codes at scale 2: dim0 = (50, 100, -50), dim1 = (-25, 75, 0)
    assert(r.toSeq == Seq(
      (0, 3L, 100L, 50L * 50 + 100L * 100 + 50L * 50),
      (1, 3L, 50L, 25L * 25 + 75L * 75)))
  }

  test("bit-identical across partitionings (map-combine is exact)") {
    val e = Tables.embeddings(spark, sf)
    val a = Whitening.dimMoments(e).collect().toSet
    val b = Whitening.dimMoments(e.repartition(13)).collect().toSet
    assert(a == b && a.size == 64)
  }

  test("whiten standardizes: zero mean code for symmetric data, zero for constant dim") {
    import spark.implicits._
    // dim0 symmetric around 0.5 → z-codes mirror; dim1 constant → std 0 → 0
    val df = Seq(
      (1L, Array(0.0, 0.3)), (2L, Array(1.0, 0.3))).toDF("vec_id", "embedding")
    val r = Whitening.whiten(df).orderBy("vec_id", "dim").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getLong(2)))
    // dim0 codes (0, 10000): mean 5000, std 5000 → z = -1, +1 → ±1024
    assert(r.toSeq == Seq(
      (1L, 0, -1024L), (1L, 1, 0L), (2L, 0, 1024L), (2L, 1, 0L)))
  }

  test("whiten emits one row per (vector, dimension); no corpus exchange after the moments") {
    val e = Tables.embeddings(spark, sf)
    val out = Whitening.whiten(e)
    assert(out.count() == e.count() * 64)
    val plan = out.queryExecution.executedPlan.toString
    // apply side: explode → broadcast join → project; the only
    // aggregate is the moments pass, the only join is broadcast
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("map-side partial aggregation: buffers shuffle, not rows") {
    val plan = Whitening.dimMoments(Tables.embeddings(spark, sf))
      .queryExecution.executedPlan.toString
    // the corpus folds into per-task buffers before any exchange; the
    // only Generate is the 64-element unpack of the ONE result row
    assert(plan.contains("partial_vectorsumfixed"), plan.take(1500))
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
  }
}
