package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-segment outlier detection: median ± k·MAD (median
  * absolute deviation) — the gate that survives what mean ± k·σ does
  * not: a heavy-tailed score distribution, where outliers inflate σ
  * until they hide themselves. On integer scores (the classifier /
  * quality family are all fixed-point longs) the whole statistic is
  * exact integer arithmetic: LOWER medians (rank ⌈n/2⌉ in a tie-free
  * ordering), integer deviations, integer comparison — nothing floats,
  * so the verdict is bit-stable across engines and partitionings.
  *
  * Scale shape: both median passes run through
  * [[Quantiles.segmentedRowNumber]] — the exact two-phase rank
  * (boundary sketch, bucket-local sorts) that q136's calibration uses,
  * |segments|·nBuckets-way parallel instead of one reducer per
  * segment; the per-segment medians join back as a broadcast-size
  * frame. Two passes over the scored frame, no window over a whole
  * segment anywhere. */
object Robust {
  /** (tieCol, segCol, valCol, med, mad, outlier) for every input row:
    * `med` the segment's lower median of `valCol`, `mad` the lower
    * median of |val − med|, outlier ⇔ |val − med| > k·mad. A
    * degenerate segment (mad 0 — over half its rows at the median)
    * flags every row off the median, the conservative reading. */
  def madOutliers(scored: DataFrame, segCol: String, valCol: String,
                  tieCol: String, k: Long = 3L,
                  nBuckets: Int = 32): DataFrame = {
    def lowerMedianRank(n: Column): Column =
      floor((n + lit(1L)) / lit(2.0)).cast("long")
    val r1 = Quantiles.segmentedRowNumber(scored, segCol, valCol,
      Seq(col(valCol).asc, col(tieCol).asc), nBuckets)
    val med = r1
      .filter(col("__rn").cast("long") === lowerMedianRank(col("__n")))
      .select(col(segCol).as("__mseg"), col(valCol).as("med"))
    val withMed = scored.join(med, col(segCol) <=> col("__mseg"))
      .drop("__mseg")
      .withColumn("__dev", abs(col(valCol) - col("med")))
    val r2 = Quantiles.segmentedRowNumber(withMed, segCol, "__dev",
      Seq(col("__dev").asc, col(tieCol).asc), nBuckets)
    val mad = r2
      .filter(col("__rn").cast("long") === lowerMedianRank(col("__n")))
      .select(col(segCol).as("__mseg"), col("__dev").as("mad"))
    withMed.join(mad, col(segCol) <=> col("__mseg")).drop("__mseg")
      .select(col(tieCol), col(segCol), col(valCol), col("med"), col("mad"),
        (col("__dev") > lit(k) * col("mad")).as("outlier"))
  }

  /** Per-segment Pearson correlation of two INTEGRAL columns in fixed
    * point — the metric-relationship report ("does length predict the
    * classifier score per source?") with the repo's determinism
    * discipline: the five moments (Σx, Σy, Σxy, Σx², Σy²) are exact
    * long sums in ONE map-combinable aggregate, the correlation
    * derives through a fixed IEEE op sequence
    * (`(n·Σxy − Σx·Σy) / (√(n·Σx²−Σx²ᵗᵒᵗ) · √(n·Σy²−Σy²ᵗᵒᵗ))`), and
    * the emitted value is `round(r · scale)`. A zero-variance side
    * emits code 0 (correlation undefined → no signal, the
    * conservative reading). Exactness bound: products must fit a
    * long — n·Σ(x·y) < 2^63; feed scaled-down codes past that. */
  def pearsonFixed(df: DataFrame, segCol: String, xCol: String,
                   yCol: String, scale: Int = 16384): DataFrame = {
    val x = col(xCol).cast("long"); val y = col(yCol).cast("long")
    df.groupBy(col(segCol))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select(col(segCol), col("n"),
        when(col("n") * col("sxx") - col("sx") * col("sx") === 0L
            || col("n") * col("syy") - col("sy") * col("sy") === 0L,
          lit(0L))
          .otherwise(round(
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                  .cast("double"))
                * sqrt((col("n") * col("syy") - col("sy") * col("sy"))
                  .cast("double")))
              * lit(scale.toDouble))
            .cast("long")).as("corr_code"))
  }

  /** Per-group two-proportion z-test against the REST of the corpus —
    * "which sources significantly under- (or over-) perform the
    * corpus pass rate", the significance layer over any boolean gate
    * (quality verdicts, dedup keeps, parse successes). For group g
    * with k_g passes of n_g rows vs the complement's k_r of n_r:
    *
    *   z = (p_g − p_r) / √(p̂(1−p̂)(1/n_g + 1/n_r)),  p̂ pooled
    *
    * emitted as `z_code = round(z·10⁴)` — counts are exact longs and
    * the z arithmetic is ONE pinned IEEE op sequence (the
    * [[pearsonFixed]] discipline), identical in the SQL replay, so
    * the code is bit-stable. Degenerate cases read NULL, never a
    * fabricated 0: an empty complement, or a pooled rate of exactly
    * 0 or 1 (no variance to test against). |z| ≥ 1.96 is the usual
    * 5% two-sided flag; the raw counts ride along so consumers can
    * pick their own threshold. One map-side-combined aggregate at
    * group cardinality plus one broadcast total — the corpus is
    * scanned once. */
  def rateSignificance(df: DataFrame, groupCol: String,
                       pass: Column, scale: Int = 10000): DataFrame = {
    val per = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(pass.cast("long")).as("k"))
    val tot = broadcast(per.agg(sum(col("n")).as("__tn"),
      sum(col("k")).as("__tk")))
    per.crossJoin(tot)
      .select(col(groupCol), col("n"), col("k"),
        expr("(k * 1000000) DIV n").as("rate_fp"),
        when(col("__tn") > col("n") && col("__tk") > 0
            && col("__tk") < col("__tn"),
          round(
            ((col("k").cast("double") / col("n").cast("double"))
              - ((col("__tk") - col("k")).cast("double")
                / (col("__tn") - col("n")).cast("double")))
            / sqrt(
                (col("__tk").cast("double") / col("__tn").cast("double"))
                * (lit(1.0) - col("__tk").cast("double")
                    / col("__tn").cast("double"))
                * (lit(1.0) / col("n").cast("double")
                  + lit(1.0) / (col("__tn") - col("n")).cast("double")))
            * lit(scale.toDouble)).cast("long")).as("z_code"))
  }
}
