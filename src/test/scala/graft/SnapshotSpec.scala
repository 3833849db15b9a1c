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
}
