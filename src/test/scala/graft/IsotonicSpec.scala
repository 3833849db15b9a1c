package graft

import org.apache.spark.sql.functions._
import graft.functions.aggs

/** functions.aggs.IsotonicFit: per-group PAV calibration (q192) —
  * hand-computed pools, the monotonicity invariant, partitioning
  * independence (merge = concat, sort at eval), and equivalence with
  * a driver-side minimax-identity replay (the oracle's independent
  * algorithm) including the floor-commutation claim. */
class IsotonicSpec extends SparkTestBase {
  import spark.implicits._

  private def fit(rows: Seq[(String, Long, Long, Long)], parts: Int = 4) =
    rows.toDF("g", "x", "id", "y").repartition(parts)
      .groupBy(col("g"))
      .agg(aggs.isotonic_fit(struct(col("x"), col("id"), col("y")))
        .as("fits"))
      .select(col("g"), explode(col("fits")).as("f"))
      .select(col("g"), col("f.id"), col("f.fit_fp"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap

  test("hand-computed PAV pools on the textbook violator sequence") {
    // y along x-order: 1, 0, 0, 1 → PAV pools {1,0,0} (mean 1/3) then
    // {1}: fit = 333333, 333333, 333333, 1000000
    val r = fit(Seq(("a", 10L, 1L, 1L), ("a", 20L, 2L, 0L),
      ("a", 30L, 3L, 0L), ("a", 40L, 4L, 1L)))
    assert(r == Map(("a", 1L) -> 333333L, ("a", 2L) -> 333333L,
      ("a", 3L) -> 333333L, ("a", 4L) -> 1000000L))
  }

  test("already-monotone input is untouched; x ties sequence by id") {
    val r = fit(Seq(("a", 1L, 1L, 0L), ("a", 2L, 2L, 0L),
      ("a", 3L, 3L, 1L), ("a", 3L, 4L, 1L)))
    assert(r == Map(("a", 1L) -> 0L, ("a", 2L) -> 0L,
      ("a", 3L) -> 1000000L, ("a", 4L) -> 1000000L))
    // all-violator input collapses to one pool = global mean
    val c = fit(Seq(("b", 1L, 1L, 1L), ("b", 2L, 2L, 0L)))
    assert(c == Map(("b", 1L) -> 500000L, ("b", 2L) -> 500000L))
  }

  test("fit is non-decreasing along (x,id) and partitioning-independent") {
    // deterministic pseudo-random labels over two groups
    val rows = for (g <- Seq("a", "b"); i <- 1L to 40L)
      yield (g, (i * 7) % 23, i, (i * i * 13 + g.length) % 2)
    val p1 = fit(rows, parts = 1)
    val p7 = fit(rows, parts = 7)
    assert(p1 == p7)
    for (g <- Seq("a", "b")) {
      val ordered = rows.filter(_._1 == g).sortBy(t => (t._2, t._3))
        .map(t => p1((g, t._3)))
      assert(ordered.sliding(2).forall(p => p.head <= p.last))
    }
  }

  test("equals the minimax identity with floored means (the oracle's algorithm)") {
    val rows = for (g <- Seq("a", "b"); i <- 1L to 25L)
      yield (g, (i * 11) % 17, i, (i * 5 + 3 * g.length) % 3) // y in {0,1,2}
    val got = fit(rows)
    for (g <- Seq("a", "b")) {
      val ys = rows.filter(_._1 == g).sortBy(t => (t._2, t._3))
      val n = ys.length
      def avgFp(j: Int, k: Int): Long = {
        val s = (j to k).map(i => ys(i)._4).sum
        Math.floorDiv(s * 1000000L, (k - j + 1).toLong)
      }
      for (i <- 0 until n) {
        val minimax = (0 to i).map(j =>
          (i until n).map(k => avgFp(j, k)).min).max
        assert(got((g, ys(i)._3)) == minimax,
          s"group $g position $i")
      }
    }
  }
}
