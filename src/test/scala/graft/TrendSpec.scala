package graft

import org.apache.spark.sql.functions._
import graft.ops.Trend

/** ops.Trend: exact-integer OLS over per-key daily counts. */
class TrendSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(rows: (String, String)*) =
    rows.toDF("k", "ts").select(col("k"),
      col("ts").cast("timestamp_ntz").as("ts"))

  test("hand-computed slope and intercept: y = 2x + 2 fits exactly") {
    // day 0: 2 events, day 1: 4, day 2: 6 -> slope 2, intercept 2
    val e = ev(
      (Seq.fill(2)(("a", "2024-01-01 05:00:00")) ++
        Seq.fill(4)(("a", "2024-01-02 09:30:00")) ++
        Seq.fill(6)(("a", "2024-01-03 23:59:59"))): _*)
    val r = Trend.dailyTrend(e, "k", "ts", anchor = "2024-01-01").head()
    assert(r.getAs[Long]("n_days") == 3)
    assert(r.getAs[Long]("sum_y") == 12)
    val den = r.getAs[Long]("den")
    assert(den != 0)
    assert(r.getAs[Long]("slope_num") == 2 * den)
    assert(r.getAs[Long]("intercept_num") == 2 * den)
  }

  test("flat series: slope exactly zero, intercept exactly the level") {
    val e = ev((for (d <- 1 to 9; _ <- 1 to 3)
      yield ("b", f"2024-02-0$d 12:00:00")): _*)
    val r = Trend.dailyTrend(e, "k", "ts", anchor = "2024-02-01").head()
    assert(r.getAs[Long]("slope_num") == 0L)
    val den = r.getAs[Long]("den")
    assert(r.getAs[Long]("intercept_num") == 3 * den)
  }

  test("single observed day: den = 0, the undefined-trend sentinel") {
    val e = ev(("c", "2024-03-05 01:00:00"), ("c", "2024-03-05 02:00:00"))
    val r = Trend.dailyTrend(e, "k", "ts").head()
    assert(r.getAs[Long]("den") == 0L)
    assert(r.getAs[Long]("n_days") == 1L)
  }

  test("theilSen: perfect line recovers the exact slope") {
    val e = ev(
      (Seq.fill(2)(("a", "2024-01-01 05:00:00")) ++
        Seq.fill(4)(("a", "2024-01-02 09:30:00")) ++
        Seq.fill(6)(("a", "2024-01-03 23:59:59"))): _*)
    val r = Trend.theilSen(e, "k", "ts", anchor = "2024-01-01").head()
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Long]("slope_milli_med") == 2000L)
  }

  test("theilSen shrugs off the outlier day that drags OLS") {
    // days 0-4: counts 2,4,6,8,100 — the last day is a backfill spike
    val rows = (0 to 3).flatMap(d =>
      Seq.fill(2 * (d + 1))(("a", f"2024-01-0${d + 1} 12:00:00"))) ++
      Seq.fill(100)(("a", "2024-01-05 12:00:00"))
    val e = ev(rows: _*)
    val ts = Trend.theilSen(e, "k", "ts", anchor = "2024-01-01").head()
    assert(ts.getAs[Long]("n_pairs") == 10L)
    // 6 of 10 pair slopes are exactly 2/day; the lower median sits on them
    assert(ts.getAs[Long]("slope_milli_med") == 2000L)
    // OLS on the same series reports a slope an order larger
    val ols = Trend.dailyTrend(e, "k", "ts", anchor = "2024-01-01").head()
    val olsMilli = 1000.0 * ols.getAs[Long]("slope_num") /
      ols.getAs[Long]("den")
    assert(olsMilli > 15000.0, s"OLS milli-slope $olsMilli")
  }

  test("theilSen: declining series yields a negative median slope") {
    val rows = Seq.fill(9)(("d", "2024-02-01 01:00:00")) ++
      Seq.fill(5)(("d", "2024-02-02 01:00:00")) ++
      Seq.fill(1)(("d", "2024-02-03 01:00:00"))
    val r = Trend.theilSen(ev(rows: _*), "k", "ts",
      anchor = "2024-02-01").head()
    assert(r.getAs[Long]("slope_milli_med") == -4000L)
  }

  test("keys fit independently; a declining key gets a negative numerator") {
    val rows = Seq.fill(5)(("up", "2024-01-01 00:00:01")) ++
      Seq.fill(9)(("up", "2024-01-04 00:00:01")) ++
      Seq.fill(9)(("down", "2024-01-01 00:00:01")) ++
      Seq.fill(5)(("down", "2024-01-04 00:00:01"))
    val out = Trend.dailyTrend(ev(rows: _*), "k", "ts",
        anchor = "2024-01-01")
      .collect().map(r => r.getAs[String]("k") ->
        (r.getAs[Long]("slope_num"), r.getAs[Long]("den"))).toMap
    assert(out("up")._1 > 0 && out("down")._1 < 0)
    assert(out("up")._2 > 0 && out("down")._2 > 0)
    // symmetric series: equal magnitude
    assert(out("up")._1 == -out("down")._1)
  }

  test("autocorrFixed: perfect period-2 square wave reads -1 at lag 1, +1 at lag 2") {
    // hours 0..7 alternate 2 events / 1 event — a period-2 wave
    val rows = for {
      h <- 0 to 7
      c <- 1 to (if (h % 2 == 0) 2 else 1)
    } yield ("a", f"2024-01-01 $h%02d:30:00")
    val e = ev(rows: _*)
    def corr(lag: Int) =
      Trend.autocorrFixed(e, "ts", "k", binSeconds = 3600L, lag = lag)
        .head()
    val l1 = corr(1); val l2 = corr(2)
    assert(l1.getAs[Long]("corr_code") == -16384L)
    assert(l1.getAs[Long]("n") == 7)
    assert(l2.getAs[Long]("corr_code") == 16384L)
    assert(l2.getAs[Long]("n") == 6)
  }

  test("autocorrFixed: gaps zero-fill (the gap IS the signal); short spans vanish") {
    // events only at hours 0, 2, 4, 6 — the densified series is
    // (1,0,1,0,1,0,1): lag-2 correlation of a period-2 wave is +1,
    // which only holds if the empty hours really entered as zeros
    val rows = for (h <- Seq(0, 2, 4, 6)) yield ("a", f"2024-01-01 $h%02d:15:00")
    val e = ev(rows: _*)
    val r = Trend.autocorrFixed(e, "ts", "k", binSeconds = 3600L, lag = 2)
      .head()
    assert(r.getAs[Long]("corr_code") == 16384L)
    assert(r.getAs[Long]("n") == 5)
    // span (7 bins) <= lag: no pairs, key absent
    assert(Trend.autocorrFixed(e, "ts", "k", 3600L, lag = 7).count() == 0)
    // constant series: zero variance -> code 0, not a crash
    val flat = ev((0 to 5).map(h => ("a", f"2024-01-01 $h%02d:00:00")): _*)
    assert(Trend.autocorrFixed(flat, "ts", "k", 3600L, lag = 1)
      .head().getAs[Long]("corr_code") == 0L)
  }

  test("cusumChangepoint: hand-computed level shift, gaps, constant feed") {
    // days 1-3: 1 event/day, days 4-6: 9/day. S_t = 1,2,3,12,21,30,
    // B=6, S_B=30 -> dev_t = 24,48,72,48,24,0: split at t=3 (dev 72),
    // means 1.0 before / 9.0 after exactly
    val shift = ev((for {
      d <- 1 to 6
      _ <- 1 to (if (d <= 3) 1 else 9)
    } yield ("a", f"2024-01-0$d%01d 12:00:00")): _*)
    val r = Trend.cusumChangepoint(shift, "k", "ts", anchor = "2024-01-01")
      .head()
    assert(r.getAs[Long]("n_bins") == 6)
    assert(r.getAs[Long]("split_bin") == 2) // day index: Jan 3 = day 2
    assert(r.getAs[Long]("dev_num") == 72)
    assert(r.getAs[Long]("mean_before_fp") == 1000000L)
    assert(r.getAs[Long]("mean_after_fp") == 9000000L)

    // a missing day zero-fills: days 1,2 one event, day 3 GAP, days
    // 4,5 five events -> series 1,1,0,5,5: S_t = 1,2,2,7,12, B=5,
    // dev = |5·S_t - 12·t| = 7,14,26,13,0 -> split t=3 (the gap day)
    val gap = ev((for {
      d <- Seq(1, 2, 4, 5); _ <- 1 to (if (d <= 2) 1 else 5)
    } yield ("g", f"2024-01-0$d%01d 01:00:00")): _*)
    val g = Trend.cusumChangepoint(gap, "k", "ts", anchor = "2024-01-01")
      .head()
    assert(g.getAs[Long]("dev_num") == 26 && g.getAs[Long]("split_bin") == 2)

    // constant feed: dev identically 0, earliest tie wins, after-mean
    // defined (t=1 < B)
    val const = ev((for (d <- 1 to 4) yield ("c", f"2024-01-0$d%01d 03:00:00")): _*)
    val c = Trend.cusumChangepoint(const, "k", "ts", anchor = "2024-01-01")
      .head()
    assert(c.getAs[Long]("dev_num") == 0 && c.getAs[Long]("split_bin") == 0)
    assert(c.getAs[Long]("mean_before_fp") == 1000000L)
    assert(c.getAs[Long]("mean_after_fp") == 1000000L)
  }

  test("coverageReport: gap runs vs scattered quiet days, full coverage") {
    // key a: active 1,2, silent 3-5 (run of 3), active 6, silent 7,
    // active 8 → span 8, active 4, missing 4, longest 3
    val a = ev(Seq(1, 2, 6, 8).map(d => ("a", f"2024-01-0$d%01d 10:00:00")): _*)
    // key b: same missing COUNT (4) but scattered singles over span 9:
    // active 1,3,5,7,9 → longest gap 1
    val b = ev(Seq(1, 3, 5, 7, 9).map(d => ("b", f"2024-01-0$d%01d 10:00:00")): _*)
    val r = Trend.coverageReport(a.union(b), "k", "ts",
        anchor = "2024-01-01")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r("a") == ((8L, 4L, 4L, 3L)))
    assert(r("b") == ((9L, 5L, 4L, 1L)))
    // a fully-covered key reads zero missing, zero gap
    val full = ev((1 to 3).map(d => ("c", f"2024-01-0$d%01d 00:30:00")): _*)
    val f = Trend.coverageReport(full, "k", "ts", anchor = "2024-01-01")
      .head()
    assert(f.getAs[Long]("n_missing") == 0 &&
      f.getAs[Long]("longest_gap") == 0)
  }
}
