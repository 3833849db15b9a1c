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

  test("ksDrift: hand-built ECDFs, identity, volume-independence, empty side") {
    def grab(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap

    // group "a": old {1,2,3,4}, new {3,4,5,6} — ECDFs diverge most at
    // v=2: old 2/4=0.5, new 0 → 500000 micro-units exactly.
    // group "b": identical sides → ks 0.
    // group "c": old-only → sentinel 1000000, always drifted.
    val oldS = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 7L), ("b", 9L), ("c", 1L)).toDF("g", "v")
    val newS = Seq(("a", 3L), ("a", 4L), ("a", 5L), ("a", 6L),
      ("b", 7L), ("b", 9L)).toDF("g", "v")
    val r = grab(Snapshot.ksDrift(oldS, newS, "g", "v", toleranceFp = 100000L))
    assert(r("a") == ((4L, 4L, 500000L, true)))
    assert(r("b") == ((2L, 2L, 0L, false)))
    assert(r("c") == ((1L, 0L, 1000000L, true)))

    // KS compares SHAPES: doubling one side's volume changes nothing
    val dbl = grab(Snapshot.ksDrift(oldS, newS.union(newS), "g", "v"))
    assert(dbl("a") == ((4L, 8L, 500000L, true)))
    assert(dbl("b") == ((2L, 4L, 0L, false)))

    // quantization floor: n=3 vs an identical-shape side still reads 0
    // (each ECDF quantizes identically before the difference)
    val third = Seq(("d", 1L), ("d", 2L), ("d", 3L)).toDF("g", "v")
    val same3 = grab(Snapshot.ksDrift(third, third.union(third), "g", "v"))
    assert(same3("d") == ((3L, 6L, 0L, false)))
  }

  test("ksDrift matches a driver-side brute-force KS on real documents") {
    import graft.text.{TextFunctions => TF}
    val d = Tables.documents(spark, sf).where(col("text").isNotNull)
    val o = d.filter(col("doc_id") % 7 =!= 0)
      .select(col("source"), TF.tokenCount(col("text")).cast("long").as("v"))
    val n = d.filter(col("doc_id") % 5 =!= 0)
      .select(col("source"), TF.tokenCount(col("text")).cast("long").as("v"))
    val got = Snapshot.ksDrift(o, n, "source", "v")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // brute force with the same micro-unit quantization
    val oRows = o.collect().map(r => (r.getString(0), r.getLong(1)))
    val nRows = n.collect().map(r => (r.getString(0), r.getLong(1)))
    val want = (oRows.map(_._1) ++ nRows.map(_._1)).distinct.map { g =>
      val ov = oRows.filter(_._1 == g).map(_._2)
      val nv = nRows.filter(_._1 == g).map(_._2)
      val ks =
        if (ov.isEmpty || nv.isEmpty) 1000000L
        else (ov ++ nv).distinct.sorted.map { v =>
          math.abs(ov.count(_ <= v).toLong * 1000000L / ov.length -
            nv.count(_ <= v).toLong * 1000000L / nv.length)
        }.max
      g -> ks
    }.toMap
    assert(got == want)
    assert(got.nonEmpty)
  }
}
