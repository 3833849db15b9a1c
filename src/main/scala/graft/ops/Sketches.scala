package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, via
  * Spark's built-in `hll_sketch_agg` / `hll_union_agg`): the medallion
  * pattern for COUNT(DISTINCT) at 100 TB. Each partition/batch/layer
  * persists a kilobyte-scale sketch COLUMN next to its aggregates;
  * any rollup — month → year, shard → corpus, yesterday + today —
  * merges sketches instead of rescanning rows. Distinct counting
  * becomes O(sketches) incremental work, and a new batch updates the
  * total with one union, which a plain `approx_count_distinct` number
  * can never do (estimates don't add; sketches do).
  *
  * HLL register updates are max-operations: order-independent and
  * idempotent, so sketch bytes — and therefore merged estimates — are
  * identical under any partitioning, and re-unioning the same batch
  * is harmless (exactly-once accounting tolerates replays). Pinned in
  * SketchesSpec: merge-then-estimate ≡ estimate-of-full, bit-equal.
  */
object Sketches {
  /** Per-group HLL sketches of `key`: (groupCols..., n_rows, sketch).
    * `lgK` trades size for accuracy (2^lgK registers; 12 → 4 KiB,
    * ~1.6% rse — DataSketches' published bound). */
  def distinctSketch(df: DataFrame, key: Column, groupCols: Seq[String],
                     lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        hll_sketch_agg(key, lit(lgK)).as("sketch"))

  /** Roll sketches up to a coarser grouping: merge within the new
    * groups and estimate. Never touches base rows. Strict merge (all
    * sketches must share lgK — mixing precisions silently degrades to
    * the coarsest, so it throws instead). */
  def rollup(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
          .as("n_distinct_est"))
}
