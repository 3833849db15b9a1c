package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.etl.Scd

/** etl.Scd: SCD2 history build + incremental maintenance. */
class ScdSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def log = Seq(
    // key 1: gold -> gold (no-op, collapses) -> silver
    (1L, "gold", ts("2024-01-01 00:00:00"), 10L),
    (1L, "gold", ts("2024-02-01 00:00:00"), 11L),
    (1L, "silver", ts("2024-03-01 00:00:00"), 12L),
    // key 2: single observation stays open
    (2L, "bronze", ts("2024-01-15 00:00:00"), 20L)
  ).toDF("k", "tier", "ts", "seq")

  test("history collapses no-op changes and opens the latest period") {
    val h = Scd.history(log, Seq("k"), "ts", Seq("tier"), Seq("seq"))
      .orderBy("k", "effective_from").collect()
    assert(h.length == 3) // the 2024-02-01 re-observation of gold collapsed
    val r0 = h(0)
    assert(r0.getString(1) == "gold" &&
      r0.getTimestamp(2) == ts("2024-01-01 00:00:00") &&
      r0.getTimestamp(3) == ts("2024-03-01 00:00:00") && !r0.getBoolean(4))
    val r1 = h(1)
    assert(r1.getString(1) == "silver" && r1.isNullAt(3) && r1.getBoolean(4))
    val r2 = h(2)
    assert(r2.getLong(0) == 2L && r2.isNullAt(3) && r2.getBoolean(4))
  }

  test("null attributes compare null-safely (no version churn on nulls)") {
    val withNulls = Seq(
      (1L, null.asInstanceOf[String], ts("2024-01-01 00:00:00"), 1L),
      (1L, null.asInstanceOf[String], ts("2024-02-01 00:00:00"), 2L),
      (1L, "a", ts("2024-03-01 00:00:00"), 3L)
    ).toDF("k", "tier", "ts", "seq")
    val h = Scd.history(withNulls, Seq("k"), "ts", Seq("tier"), Seq("seq"))
    assert(h.count() == 2) // null==null collapses, null->a versions
  }

  test("applyChanges(history(a), b) == history(a union b) on real events") {
    val e = Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts", $"event_id")
    val cut = ts("2024-01-15 00:00:00")
    val a = e.filter($"ts" < lit(cut))
    val b = e.filter($"ts" >= lit(cut))
    val full = Scd.history(e, Seq("user_id"), "ts", Seq("event_type"), Seq("event_id"))
    val inc = Scd.applyChanges(
      Scd.history(a, Seq("user_id"), "ts", Seq("event_type"), Seq("event_id")),
      b, Seq("user_id"), "ts", Seq("event_type"), Seq("event_id"))
    assert(full.count() > 0)
    // exact frame equality both directions
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
  }

  test("closed periods pass through applyChanges without recompute") {
    val h = Scd.history(log, Seq("k"), "ts", Seq("tier"), Seq("seq"))
    val more = Seq((2L, "silver", ts("2024-04-01 00:00:00"), 21L))
      .toDF("k", "tier", "ts", "seq")
    val h2 = Scd.applyChanges(h, more, Seq("k"), "ts", Seq("tier"), Seq("seq"))
      .orderBy("k", "effective_from").collect()
    assert(h2.length == 4)
    // key 1's closed gold period is byte-identical
    assert(h2(0).getString(1) == "gold" &&
      h2(0).getTimestamp(3) == ts("2024-03-01 00:00:00"))
    // key 2's bronze row closed at the new observation, silver now open
    assert(h2(2).getString(1) == "bronze" &&
      h2(2).getTimestamp(3) == ts("2024-04-01 00:00:00") && !h2(2).getBoolean(4))
    assert(h2(3).getString(1) == "silver" && h2(3).getBoolean(4))
  }

  test("applyChanges throws on a late observation inside closed history") {
    val h = Scd.history(log, Seq("k"), "ts", Seq("tier"), Seq("seq"))
    // key 1's open period starts 2024-03-01; this observation predates it
    val late = Seq((1L, "retro", ts("2024-01-15 00:00:00"), 99L))
      .toDF("k", "tier", "ts", "seq")
    val ex = intercept[Exception](
      Scd.applyChanges(h, late, Seq("k"), "ts", Seq("tier"), Seq("seq")).count())
    assert(ex.getMessage.contains("full rebuild") ||
      Option(ex.getCause).exists(_.getMessage.contains("full rebuild")))
  }

  test("applyChanges accepts out-of-order batches for keys with no closed history") {
    // key 9 has a single (open) observation — an earlier batch row
    // needs no closed-history rewrite and must match the full rebuild
    val a = Seq((9L, "b", ts("2024-02-01 00:00:00"), 2L)).toDF("k", "tier", "ts", "seq")
    val b = Seq((9L, "a", ts("2024-01-01 00:00:00"), 1L)).toDF("k", "tier", "ts", "seq")
    val inc = Scd.applyChanges(
      Scd.history(a, Seq("k"), "ts", Seq("tier"), Seq("seq")),
      b, Seq("k"), "ts", Seq("tier"), Seq("seq"))
    val full = Scd.history(a.unionByName(b), Seq("k"), "ts", Seq("tier"), Seq("seq"))
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
    assert(full.count() == 2)
  }

  test("guard key semi-join shuffles when broadcastGuardKeys=false, same result") {
    // the huge-delta escape hatch: routing the late-arrival guard's
    // key set through a shuffle instead of a broadcast must be
    // semantics-neutral (incremental still equals the full rebuild)
    val e = Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts", $"event_id")
    val cut = ts("2024-01-15 00:00:00")
    val a = e.filter($"ts" < lit(cut))
    val b = e.filter($"ts" >= lit(cut))
    spark.conf.set("graft.scd.broadcastGuardKeys", "false")
    try {
      val inc = Scd.applyChanges(
        Scd.history(a, Seq("user_id"), "ts", Seq("event_type"), Seq("event_id")),
        b, Seq("user_id"), "ts", Seq("event_type"), Seq("event_id"))
      val full = Scd.history(e, Seq("user_id"), "ts", Seq("event_type"), Seq("event_id"))
      assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
      // and the FORCED broadcast hint is gone (the planner may still
      // auto-broadcast a small key set — the escape hatch's job is
      // only to stop forcing it past the size estimator)
      val analyzed = inc.queryExecution.analyzed.toString
      assert(!analyzed.contains("ResolvedHint"), analyzed)
    } finally spark.conf.set("graft.scd.broadcastGuardKeys", "true")
  }

  test("one exchange feeds both window functions") {
    val h = Scd.history(log, Seq("k"), "ts", Seq("tier"), Seq("seq"))
    val plan = h.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected a single shuffle, plan:\n$plan")
  }

  test("asOf returns exactly the covering period per key") {
    val h = Scd.history(log, Seq("k"), "ts", Seq("tier"), Seq("seq"))
    def at(t: String) = Scd.asOf(h, lit(ts(t)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // mid key-1's first period; key 2 not yet observed
    assert(at("2024-01-10 00:00:00") == Map(1L -> "gold"))
    // both alive; key 1 still gold (the no-op row opened nothing)
    assert(at("2024-02-15 00:00:00") == Map(1L -> "gold", 2L -> "bronze"))
    // after key 1's change
    assert(at("2024-06-01 00:00:00") == Map(1L -> "silver", 2L -> "bronze"))
    // before anything existed
    assert(at("2023-12-31 23:59:59").isEmpty)
  }

  test("asOf boundary: a period starts AT its effective_from, ends before effective_to") {
    val h = Scd.history(log, Seq("k"), "ts", Seq("tier"), Seq("seq"))
    val atChange = Scd.asOf(h, lit(ts("2024-03-01 00:00:00")))
      .filter(col("k") === 1L).collect()
    assert(atChange.length == 1 && atChange(0).getString(1) == "silver")
  }
}
