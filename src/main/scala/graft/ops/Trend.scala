package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-key trend estimation — exact-integer ordinary least squares over
  * the (day, daily count) series of each key. "Is this source growing
  * or dying?" is the monitoring question behind every ingest mix
  * decision; the OLS slope over daily volumes answers it in one pass.
  *
  * Determinism: both engines' `regr_slope` run IEEE double sums whose
  * association order is partition-dependent — useless for a hash gate
  * and quietly nondeterministic at 1000 executors. Instead the slope
  * is kept as an exact integer FRACTION: with x = epoch day and y =
  * daily count (both BIGINT), slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
  * and intercept = (ΣyΣx² − ΣxΣxy) / same-denominator are ratios of
  * integer moments, computed here as BIGINT numerator/denominator
  * pairs. No division ever happens, so no rounding rule can drift
  * between engines. The `anchor` date re-zeroes x so the moments stay
  * small: with x = days since the corpus epoch (hundreds, not the
  * ~2·10⁴ of raw epoch days), the intercept numerator ≈ Σy·Σx² keeps
  * ~12 decimal digits of headroom below 2⁶³ even for keys carrying
  * billions of events per day — and the intercept is the fitted
  * volume AT the anchor, the number a drift monitor actually reads.
  *
  * Scale: one partial-aggregating group-by to days, one to keys — both
  * map-side combinable; state per key is five longs. No windows, no
  * sorts, no driver math.
  */
object Trend {
  /** Daily-count OLS per `keyCol`: returns (key, n_days, sum_y,
    * slope_num, intercept_num, den) with slope = slope_num/den,
    * intercept = intercept_num/den. `den = 0` (single observed day)
    * means the trend is undefined — callers treat it as "no signal",
    * never as zero slope. */
  def dailyTrend(df: DataFrame, keyCol: String, tsCol: String,
                 anchor: String = "1970-01-01"): DataFrame = {
    val daily = df
      .select(col(keyCol).as("k"),
        datediff(to_date(col(tsCol)), lit(anchor).cast("date"))
          .cast("long").as("x"))
      .groupBy("k", "x")
      .agg(count(lit(1)).as("y"))
    daily.groupBy(col("k").as(keyCol))
      .agg(count(lit(1)).as("n_days"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col(keyCol), col("n_days"), col("sy").as("sum_y"),
        (col("n_days") * col("sxy") - col("sx") * col("sy"))
          .as("slope_num"),
        (col("sy") * col("sxx") - col("sx") * col("sxy"))
          .as("intercept_num"),
        (col("n_days") * col("sxx") - col("sx") * col("sx")).as("den"))
  }

  /** Theil–Sen robust trend per key: the MEDIAN of all pairwise daily
    * slopes — up to ~29% of the days can be outliers (a crawler
    * outage, a backfill spike) without moving it, where [[dailyTrend]]
    * 's OLS chases every spike. Slopes are exact-integer milli-units
    * `(1000·Δy) div Δx` (both engines truncate integer division
    * toward zero, verified), and the median is the deterministic
    * LOWER median under (slope, Δx, Δy) order.
    *
    * Scale: the pair join is per-key O(d²) in OBSERVED DAYS d — not
    * in rows — so a year-long series is ≤ 66k pairs per key no matter
    * how many billions of events back it; the join shuffles the
    * |keys|·d daily frame once on the key. */
  def theilSen(df: DataFrame, keyCol: String, tsCol: String,
               anchor: String = "1970-01-01"): DataFrame = {
    val daily = df
      .select(col(keyCol).as("k"),
        datediff(to_date(col(tsCol)), lit(anchor).cast("date"))
          .cast("long").as("x"))
      .groupBy("k", "x")
      .agg(count(lit(1)).as("y"))
    val a = daily.select(col("k"), col("x").as("xi"), col("y").as("yi"))
    val b = daily.select(col("k"), col("x").as("xj"), col("y").as("yj"))
    val pairs = a.join(b, Seq("k")).filter(col("xi") < col("xj"))
      .select(col("k"),
        expr("(1000 * (yj - yi)) div (xj - xi)").as("slope_milli"),
        (col("xj") - col("xi")).as("dx"), (col("yj") - col("yi")).as("dy"))
    // deterministic lower median: rank under the total (slope, dx, dy)
    // order, pick ceil(n/2). Keys are many and series short, so the
    // per-key window never funnels a corpus through one task.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k"))
      .orderBy(col("slope_milli"), col("dx"), col("dy"))
    pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("n_pairs", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("k"))))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("k").as(keyCol), col("n_pairs"),
        col("slope_milli").as("slope_milli_med"))
  }

  /** Temporal coverage report per key — the feed-outage detector:
    * over each key's [first, last] day span, how many days actually
    * carried data, how many were silent, and the LONGEST consecutive
    * silent run (one 14-day outage is an incident; fourteen scattered
    * quiet days are a low-volume feed — `n_missing` alone can't tell
    * them apart). Gap runs come from the classic gaps-and-islands
    * grouping (`day − row_number` is constant within a consecutive
    * zero run) over the zero-filled span — all integer, no session
    * windows. Output: (key, span_days, n_active, n_missing,
    * longest_gap). Shape: one (key, day) map-side aggregate at corpus
    * scale, then day-span cardinality. */
  def coverageReport(df: DataFrame, keyCol: String, tsCol: String,
                     anchor: String = "1970-01-01"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df
      .select(col(keyCol).as("k"),
        datediff(to_date(col(tsCol)), lit(anchor).cast("date"))
          .cast("long").as("day"))
      .groupBy(col("k"), col("day")).agg(count(lit(1)).as("y"))
    val dense = daily.groupBy(col("k"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("k"), explode(sequence(col("lo"), col("hi"))).as("day"))
      .join(daily, Seq("k", "day"), "left")
      .select(col("k"), col("day"), coalesce(col("y"), lit(0L)).as("y"))
    val zeroRuns = dense.filter(col("y") === 0)
      .withColumn("grp", col("day") - row_number().over(
        Window.partitionBy("k").orderBy("day")))
      .groupBy(col("k"), col("grp")).agg(count(lit(1)).as("len"))
      .groupBy(col("k")).agg(max(col("len")).as("longest_gap"))
    dense.groupBy(col("k").as(keyCol))
      .agg(count(lit(1)).as("span_days"),
        sum((col("y") > 0).cast("long")).as("n_active"),
        sum((col("y") === 0).cast("long")).as("n_missing"))
      .join(zeroRuns.withColumnRenamed("k", keyCol), Seq(keyCol), "left")
      .select(col(keyCol), col("span_days"), col("n_active"),
        col("n_missing"), coalesce(col("longest_gap"), lit(0L))
          .as("longest_gap"))
  }

  /** CUSUM changepoint localization over per-key daily volume — WHERE
    * [[dailyTrend]]/[[autocorrFixed]] say "this feed changed", this
    * says WHEN: the split t maximizing the centered prefix deviation
    *
    *   dev_t = |S_t·B − t·S_B|,  t = 1..B
    *
    * (Page 1954's CUSUM statistic, integer form: S_t the prefix sum
    * of daily counts over the zero-filled day span, B the span
    * length, S_B the total — dev is |prefix − expected-under-no-
    * change| scaled by B, so every product is ≤ total·span and stays
    * exact in int64 far past any real feed). Ties break to the
    * EARLIEST day. Output per key: (key, n_bins, split_bin — change
    * begins the bin AFTER it, days since `anchor` — dev_num, and the
    * exact before/after daily means in 10⁻⁶ units for the human
    * reading). A constant feed reads dev_num = 0 at split_bin = 1.
    *
    * Shape: the corpus collapses to (key, day) counts in one
    * map-side-combined aggregate; everything after runs at
    * day-span cardinality under key-partitioned windows. */
  def cusumChangepoint(df: DataFrame, keyCol: String, tsCol: String,
                       anchor: String = "1970-01-01"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df
      .select(col(keyCol).as("k"),
        datediff(to_date(col(tsCol)), lit(anchor).cast("date"))
          .cast("long").as("day"))
      .groupBy(col("k"), col("day")).agg(count(lit(1)).as("y"))
    val spans = daily.groupBy(col("k"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val dense = spans
      .select(col("k"), col("lo"),
        explode(sequence(col("lo"), col("hi"))).as("day"))
      .join(daily, Seq("k", "day"), "left")
      .select(col("k"), col("lo"), col("day"),
        coalesce(col("y"), lit(0L)).as("y"))
    val wCum = Window.partitionBy("k").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("k")
    val stepped = dense
      .withColumn("t", col("day") - col("lo") + 1L)
      .withColumn("st", sum(col("y")).over(wCum))
      .withColumn("b", count(lit(1)).over(wAll))
      .withColumn("sb", sum(col("y")).over(wAll))
      .withColumn("dev", abs(col("st") * col("b") - col("t") * col("sb")))
    stepped.groupBy(col("k").as(keyCol))
      .agg(max(col("b")).as("n_bins"), max(col("sb")).as("__sb"),
        max(col("lo")).as("__lo"),
        min(struct((-col("dev")).as("nd"), col("t").as("t"),
          col("st").as("st"))).as("m"))
      .select(col(keyCol), col("n_bins"),
        (col("__lo") + col("m.t") - 1L).as("split_bin"),
        (-col("m.nd")).as("dev_num"),
        call_function("div", col("m.st") * lit(1000000L), col("m.t"))
          .as("mean_before_fp"),
        when(col("n_bins") > col("m.t"),
          call_function("div", (col("__sb") - col("m.st")) * lit(1000000L),
            col("n_bins") - col("m.t"))).as("mean_after_fp"))
  }

  /** Lag-L autocorrelation of per-key event volume — the seasonality
    * detector behind "is this feed daily-periodic?" (lag 24 on hourly
    * bins) and the alarm-tuning input [[graft.ops.Bursts]]' trailing
    * baseline assumes. Bins events like Bursts (`epoch_us div
    * binSeconds·10^6`), DENSIFIES every key's [min, max] bin range
    * with zero counts first — autocorrelation over only-present bins
    * would silently skip the gaps that ARE the signal — then pairs
    * each bin with its lag-L successor and hands the (x, y) series to
    * [[Robust.pearsonFixed]] (integer moments, one guarded IEEE
    * division, `corr_code = round(r·scale)`; zero variance → 0).
    *
    * Output: (event_type, n, corr_code) with n the pair count
    * (span − lag bins). Keys whose whole span is ≤ lag emit nothing
    * (no pairs exist). Cost: one map-side-combined bin aggregate at
    * corpus scale, then everything runs at BIN cardinality — the
    * densify explode, the lag self-join (bin-keyed equi-join), and
    * the per-key moment fold. The sequence explode is bounded by the
    * observed span per key; a key with a pathological span (one
    * event in 1970, one today) costs span/binSeconds rows — bound
    * the scan's time range upstream, as any telemetry query does. */
  def autocorrFixed(events: DataFrame, tsCol: String, typeCol: String,
                    binSeconds: Long, lag: Int,
                    scale: Int = 16384): DataFrame = {
    require(binSeconds > 0 && lag > 0,
      s"autocorrFixed: binSeconds and lag must be > 0, got $binSeconds/$lag")
    val binUs = binSeconds * 1000000L
    val bin = call_function("div",
      unix_micros(col(tsCol).cast("timestamp")), lit(binUs))
    val counts = events
      .groupBy(col(typeCol).as("event_type"), bin.as("bin"))
      .agg(count(lit(1)).as("n"))
    val spans = counts.groupBy(col("event_type"))
      .agg(min(col("bin")).as("lo"), max(col("bin")).as("hi"))
    val dense = spans
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"))).as("bin"))
      .join(counts, Seq("event_type", "bin"), "left")
      .select(col("event_type"), col("bin"),
        coalesce(col("n"), lit(0L)).as("n"))
    val lagged = dense.select(col("event_type"),
      (col("bin") - lag).as("bin"), col("n").as("y"))
    val pairs = dense.join(lagged, Seq("event_type", "bin"))
      .select(col("event_type"), col("n").as("x"), col("y"))
    Robust.pearsonFixed(pairs, "event_type", "x", "y", scale)
  }
}
