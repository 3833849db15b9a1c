package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence event analytics over the event stream: conversion
  * funnels (did the user view → click → purchase IN ORDER, and when)
  * and cohort retention (of the users who first appeared in week W,
  * how many were active W+k). The two standing product-analytics
  * reports every event warehouse serves; here as deterministic
  * DataFrame plans with exact DuckDB twins.
  *
  * Scale shape — funnel: one conditional-min aggregate per stage over
  * the stage-filtered stream, each keyed by user (the filters prune
  * the fact scan to that stage's rows; stage k's input is stage k-1's
  * user frame joined back, so every join is user-keyed and the only
  * exchanges are on the one key the computation genuinely needs).
  * No window over the whole stream, no per-user event collection —
  * memory is O(users), not O(events). Cohort: two user-keyed
  * aggregates (first-seen week, then per-(cohort, offset) distinct
  * users) — the second is a two-level exact distinct, partial on
  * (cohort, offset, user).
  *
  * Determinism: stage times are MINIMA of timestamps (no tie-break
  * needed — equal minima are the same value); week buckets are
  * `date_trunc('week')` (ISO Monday in both engines) and offsets
  * integer day-diffs div 7 — all exact.
  */
object Funnels {

  /** Strictly-ordered three-stage funnel: per user, the first
    * `stages(0)`, the first `stages(1)` STRICTLY AFTER it, the first
    * `stages(2)` strictly after that. Output: (user_id, stage —
    * 0..3 = how deep the ORDERED chain got, first_view, first_click,
    * first_purchase — each null once the chain broke). Late clicks
    * before the first view don't count: order is the point. */
  def funnel(events: DataFrame,
             stages: Seq[String] = Seq("view", "click", "purchase"),
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts"): DataFrame = {
    require(stages.length == 3, "funnel: exactly three stages")
    val users = events.select(col(userCol)).distinct()
    val s1 = events.filter(col(typeCol) === stages(0))
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    val s2 = events.filter(col(typeCol) === stages(1))
      .join(s1, Seq(userCol))
      .filter(col(tsCol) > col("t1"))
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t2"))
    val s3 = events.filter(col(typeCol) === stages(2))
      .join(s2, Seq(userCol))
      .filter(col(tsCol) > col("t2"))
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t3"))
    users.join(s1, Seq(userCol), "left")
      .join(s2, Seq(userCol), "left")
      .join(s3, Seq(userCol), "left")
      .select(col(userCol),
        (when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1)
          .otherwise(0)).as("stage"),
        col("t1").as(s"first_${stages(0)}"),
        col("t2").as(s"first_${stages(1)}"),
        col("t3").as(s"first_${stages(2)}"))
  }

  /** Weekly cohort retention: users bucket into the ISO week of
    * their FIRST event (any type); a (cohort_week, week_offset) cell
    * counts the cohort's users active that many whole weeks later.
    * Offset 0 is the cohort itself, so every cohort's offset-0 count
    * equals its size — the standard retention-table invariant (pinned
    * in FunnelsSpec). Output: (cohort_week, week_offset, n_active). */
  /** Rolling 7-day active users — the WAU curve per observed day:
    * distinct users active in [day−6, day], reported for every day
    * the events table actually contains. Computed WITHOUT a range
    * join or window: each (user, active-day) fact is exploded to the
    * ≤ 7 window-end days it contributes to (a fixed 7× map-side
    * blowup), then ONE distinct-count aggregate keyed on the day —
    * linear, shuffle only on (day, user), and the explode constant is
    * the window width, not the data. Days with no events emit no row
    * (a gap day has no anchor in the table; densify against a date
    * dim downstream if the report needs zeros). */
  def rollingActive(events: DataFrame, userCol: String = "user_id",
                    tsCol: String = "ts", windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"window must be positive: $windowDays")
    val act = events
      .select(to_date(col(tsCol)).as("uday"), col(userCol).as("u"))
      .distinct()
    val observed = act.select(col("uday").as("day")).distinct()
    act
      .select(explode(sequence(col("uday"),
        date_add(col("uday"), windowDays - 1))).as("day"), col("u"))
      .join(observed, Seq("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("u")).as("active_users"))
  }

  /** Stickiness — DAU/WAU per observed day, the engagement ratio
    * product teams read daily ("of the people active this week, how
    * many came back today"): two [[rollingActive]] passes (window 1
    * = DAU, window `windowDays` = WAU) joined on the day, the ratio
    * in fixed point (`round(dau·2^14 / wau)` — one IEEE division of
    * exact longs, bit-stable). DAU ≤ WAU by construction, so the
    * code lives in [0, 16384]. */
  def stickiness(events: DataFrame, userCol: String = "user_id",
                 tsCol: String = "ts", windowDays: Int = 7): DataFrame = {
    val dau = rollingActive(events, userCol, tsCol, windowDays = 1)
      .withColumnRenamed("active_users", "dau")
    val wau = rollingActive(events, userCol, tsCol, windowDays)
      .withColumnRenamed("active_users", "wau")
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau").cast("double")
          * lit(16384.0)).cast("long").as("stickiness_code"))
  }

  def cohortRetention(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    val firstSeen = events.groupBy(col(userCol))
      .agg(to_date(date_trunc("week", min(col(tsCol)))).as("cohort_week"))
    events.select(col(userCol), to_date(col(tsCol)).as("d"))
      .join(firstSeen, Seq(userCol))
      .select(col(userCol), col("cohort_week"),
        (datediff(col("d"), col("cohort_week"))
          .cast("int") / 7).cast("int").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_active"))
  }
}
