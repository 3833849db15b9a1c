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
}
