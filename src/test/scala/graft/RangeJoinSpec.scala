package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** ops.RangeJoin: bin-blocked range joins ≡ the naive theta join, with
  * an equi-join (not nested-loop) physical plan. */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def points =
    (0L until 500L by 7L).map(t => (t, s"p$t")).toDF("t", "pid")
  private def intervals = Seq(
    (0L, 0L, 50L), (1L, 40L, 60L), (2L, 60L, 60L), // empty half-open
    (3L, 95L, 96L), (4L, 100L, 400L), (5L, 490L, 1000L))
    .toDF("iid", "s", "e")

  test("pointInInterval equals the naive theta join for every bin width") {
    val naive = points.join(intervals,
        col("t") >= col("s") && col("t") < col("e"))
      .select("pid", "iid").collect().map(_.toSeq).toSet
    assert(naive.nonEmpty)
    for (w <- Seq(1L, 13L, 50L, 64L, 1000L)) {
      val binned = RangeJoin.pointInInterval(points, intervals,
          col("t"), col("s"), col("e"), binWidth = w)
        .select("pid", "iid").collect().map(_.toSeq).toSet
      assert(binned == naive, s"binWidth=$w")
    }
  }

  test("pointInInterval respects equi keys") {
    val p = Seq((10L, 1L, "a"), (10L, 2L, "b")).toDF("t", "u", "pid")
    val i = Seq((1L, 0L, 20L, "i1"), (2L, 15L, 20L, "i2")).toDF("u", "s", "e", "iid")
    val out = RangeJoin.pointInInterval(p, i, col("t"), col("s"), col("e"),
        binWidth = 8, equiKeys = Seq("u"))
      .select("pid", "iid").as[(String, String)].collect().toSet
    assert(out == Set(("a", "i1"))) // u=2's interval starts after t=10
  }

  test("intervalOverlap equals naive and emits each pair exactly once") {
    val l = Seq((1L, 0L, 100L), (2L, 100L, 200L), (3L, 250L, 260L))
      .toDF("lid", "ls", "le")
    val r = Seq((10L, 50L, 150L), (11L, 100L, 101L), (12L, 255L, 256L),
        (13L, 200L, 250L)) // abuts lid=2 and lid=3: no overlap (half-open)
      .toDF("rid", "rs", "re")
    val naive = l.join(r, col("ls") < col("re") && col("rs") < col("le"))
      .select("lid", "rid").collect().map(_.toSeq).toList
    for (w <- Seq(10L, 64L, 500L)) {
      val binned = RangeJoin.intervalOverlap(l, r, col("ls"), col("le"),
          col("rs"), col("re"), binWidth = w)
        .select("lid", "rid").collect().map(_.toSeq).toList
      assert(binned.sortBy(_.toString) == naive.sortBy(_.toString), s"binWidth=$w")
      assert(binned.distinct.size == binned.size, s"duplicates at binWidth=$w")
    }
  }

  test("negative times bin correctly (floor, not truncate-toward-zero)") {
    val p = Seq((-5L, "neg")).toDF("t", "pid")
    val i = Seq((1L, -10L, 0L)).toDF("iid", "s", "e")
    val out = RangeJoin.pointInInterval(p, i, col("t"), col("s"), col("e"), 8)
    assert(out.select("pid").as[String].collect().toSeq == Seq("neg"))
  }

  test("binning is exact above 2^53 (nanosecond-epoch longs)") {
    // 10^18 + 999 rounds to 10^18 + 1024 as a double — a double-based
    // floor division misbins it and the pair silently vanishes
    val base = 1000000000000000000L
    val p = Seq((base + 999L, "hi"), (base + 1L, "lo")).toDF("t", "pid")
    val i = Seq((1L, base, base + 1000L)).toDF("iid", "s", "e")
    val out = RangeJoin.pointInInterval(p, i, col("t"), col("s"), col("e"),
        binWidth = 1000L)
      .select("pid").as[String].collect().toSet
    assert(out == Set("hi", "lo"))
  }

  test("physical plan is an equi join on the bin, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, intervals,
        col("t"), col("s"), col("e"), binWidth = 50)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
