package graft

import org.apache.spark.sql.functions._
import graft.ops.Robust

/** ops.Robust: per-segment median ± k·MAD outlier gate. */
class RobustSpec extends SparkTestBase {
  import spark.implicits._

  test("median/MAD are exact lower medians; only the heavy tail flags") {
    val df = Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L),
      (4L, "a", 4L), (5L, "a", 100L)).toDF("id", "seg", "v")
    val out = Robust.madOutliers(df, "seg", "v", "id")
      .select("id", "med", "mad", "outlier")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // sorted values (1,2,3,4,100): lower median 3; devs (2,1,0,1,97)
    // sort to (0,1,1,2,97): mad 1; outlier iff dev > 3
    assert(out.values.forall(v => v._1 == 3L && v._2 == 1L))
    assert(out.map { case (k, v) => k -> v._3 } ==
      Map(1L -> false, 2L -> false, 3L -> false, 4L -> false, 5L -> true))
  }

  test("degenerate segment (mad 0) flags every row off the median") {
    val df = Seq((1L, "a", 5L), (2L, "a", 5L), (3L, "a", 5L),
      (4L, "a", 7L)).toDF("id", "seg", "v")
    val out = Robust.madOutliers(df, "seg", "v", "id")
      .select("id", "outlier").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> false, 2L -> false, 3L -> false, 4L -> true))
  }

  test("pearsonFixed: perfect lines hit ±scale, zero variance emits 0") {
    val df = Seq(
      ("up", 1L, 2L), ("up", 2L, 4L), ("up", 3L, 6L),      // y = 2x
      ("dn", 1L, 9L), ("dn", 2L, 6L), ("dn", 3L, 3L),      // y = -3x + 12
      ("fl", 1L, 5L), ("fl", 2L, 5L), ("fl", 3L, 5L)       // constant y
    ).toDF("seg", "x", "y")
    val out = graft.ops.Robust.pearsonFixed(df, "seg", "x", "y")
      .select("seg", "corr_code").as[(String, Long)].collect().toMap
    assert(out == Map("up" -> 16384L, "dn" -> -16384L, "fl" -> 0L))
  }

  test("segments are independent and a null segment is ranked, not dropped") {
    val df = Seq((1L, Some("a"), 10L), (2L, Some("a"), 12L),
      (3L, None, 1L), (4L, None, 100L)).toDF("id", "seg", "v")
    val out = Robust.madOutliers(df, "seg", "v", "id")
    assert(out.count() == 4) // null segment rows survive both joins
    val meds = out.select("seg", "med").distinct()
      .as[(Option[String], Long)].collect().toMap
    assert(meds == Map(Some("a") -> 10L, None -> 1L))
  }

  test("rateSignificance: hand-computed z, symmetry, degenerate nulls") {
    import org.apache.spark.sql.functions._
    def run(rows: Seq[(String, Boolean)]) =
      graft.ops.Robust.rateSignificance(
        rows.toDF("g", "p"), "g", col("p"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3),
            if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    // a: 8/10 pass, b: 2/10 -> pooled 0.5,
    // z_a = 0.6 / sqrt(0.25 * 0.2) = 2.68328... -> 26833; b mirrors
    val rows = Seq.fill(8)(("a", true)) ++ Seq.fill(2)(("a", false)) ++
      Seq.fill(2)(("b", true)) ++ Seq.fill(8)(("b", false))
    val r = run(rows)
    assert(r("a") == ((10L, 8L, 800000L, Some(26833L))))
    assert(r("b") == ((10L, 2L, 200000L, Some(-26833L))))
    // single group: no complement -> NULL z
    assert(run(Seq(("x", true), ("x", false)))("x")._4.isEmpty)
    // everything passes: pooled rate 1, no variance -> NULL z
    val all = run(Seq(("a", true), ("a", true), ("b", true)))
    assert(all.values.forall(_._4.isEmpty))
  }
}
