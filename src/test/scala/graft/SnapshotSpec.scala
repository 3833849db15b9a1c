package graft

import org.apache.spark.sql.functions._
import graft.ops.Snapshot

/** ops.Snapshot: two-snapshot corpus reconciliation (q134). */
class SnapshotSpec extends SparkTestBase {
  import spark.implicits._

  test("all four statuses, by construction") {
    val oldS = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val newS = Seq((1L, "a"), (2L, "B!"), (4L, "d")).toDF("id", "text")
    val got = Snapshot.diff(oldS, newS, "id", Seq("text"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("multi-column content; separator blocks boundary collisions") {
    val oldS = Seq((1L, "ab", "c")).toDF("id", "x", "y")
    val newS = Seq((1L, "a", "bc")).toDF("id", "x", "y")
    val got = Snapshot.diff(oldS, newS, "id", Seq("x", "y"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "changed")) // "ab"+"c" must NOT equal "a"+"bc"
  }

  test("identical snapshots diff to all-unchanged; statuses partition ids") {
    val d = Tables.documents(spark, sf)
    val same = Snapshot.diff(d, d, "doc_id", Seq("text"))
    assert(same.count() == d.count())
    assert(same.select("status").distinct.as[String].collect().toSeq ==
      Seq("unchanged"))
    // the q134 shape: every id of either side appears exactly once
    val o = d.filter(col("doc_id") % 7 =!= 0)
    val n = d.filter(col("doc_id") % 5 =!= 0)
    val diff = Snapshot.diff(o, n, "doc_id", Seq("text"))
    val union = o.select("doc_id").union(n.select("doc_id")).distinct.count()
    assert(diff.count() == union)
    assert(diff.select("doc_id").distinct.count() == union)
  }

  test("driftReport: hand-built shift, volume-independence, one-sided bins") {
    // old: 4 in bucket 0, 4 in bucket 1; new: 2 in bucket 0, 6 in
    // bucket 1, 2 in bucket 3 (bucket 3 is new-only)
    val oldS = Seq(1L, 2L, 3L, 4L, 11L, 12L, 13L, 14L).toDF("v")
    val newS = Seq(5L, 6L, 15L, 16L, 17L, 18L, 19L, 10L, 31L, 32L).toDF("v")
    val r = Snapshot.driftReport(oldS, newS, "v", binWidth = 10,
        tolerance = 2000)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3), x.getBoolean(4))).toMap
    // bucket 0: share 4/8 -> 2/10 = ratio (2*8*10000)/(4*10) div = 4000
    assert(r(0L) == ((4L, 2L, 4000L, true)))
    // bucket 1: 4/8 -> 6/10 = (6*8*10000)/(4*10) = 12000, inside 2000
    assert(r(1L) == ((4L, 6L, 12000L, false)))
    // new-only bucket: null ratio, always drifted
    assert(r(3L) == ((0L, 2L, -1L, true)))
    // pure volume change, same shape -> ratio exactly 10000 everywhere
    val doubled = Snapshot.driftReport(oldS, oldS.union(oldS), "v", 10)
      .select("ratio_fp").distinct().as[Long].collect().toSeq
    assert(doubled == Seq(10000L))
  }
}
