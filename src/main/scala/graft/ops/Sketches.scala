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

  /** Per-group Count-Min FREQUENCY sketches of `key` — the "how often
    * does this token/domain/id occur" twin of [[distinctSketch]]
    * ([[graft.functions.CmSketch]]): (groupCols..., n_rows, sketch)
    * with sketch an `array<long>` of d·w counters. Defaults (4×256 =
    * 8 KiB) bound the over-estimate at ~0.4% of the stream mass per
    * row with collision probability (1/256)^4 of all rows agreeing. */
  def freqSketch(df: DataFrame, key: Column, groupCols: Seq[String],
                 d: Int = 4, w: Int = 256): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.aggs.cm_sketch(key, d, w).as("sketch"))

  /** Merge frequency sketches to a coarser grouping by element-wise
    * addition — counters are plain sums, so merged-then-estimated ≡
    * estimated-over-everything, bit-exactly (pinned in SketchesSpec).
    * The d·w explode is sketch-sized (KBs), never row-sized. */
  def rollupFreq(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.select(groupCols.map(col) :+
        posexplode(col("sketch")).as(Seq("pos", "c")): _*)
      .groupBy((groupCols :+ "pos").map(col): _*)
      .agg(sum(col("c")).as("c"))
      .groupBy(groupCols.map(col): _*)
      .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("c")))),
          x => x.getField("c")).as("sketch"))

  /** Point estimate from a Count-Min sketch column: the minimum of
    * the key's d cells — an upper bound on the true count, exact
    * unless the key collides in every row. Bucket arithmetic is the
    * sketch's own (row r reads its disjoint log2(w)-bit window of the
    * [[graft.functions.TokenHash64]] hash — unsigned shift + mask),
    * so estimates replay in SQL as `(H // w^r) % w`. */
  def cmEstimate(sketch: Column, key: Column,
                 d: Int = 4, w: Int = 256): Column = {
    val h = graft.functions.exprs.token_hash64(key)
    val shift = java.lang.Integer.numberOfTrailingZeros(w)
    val cells = (0 until d).map { r =>
      val bucket = shiftrightunsigned(h, r * shift)
        .bitwiseAND(lit((w - 1).toLong))
      element_at(sketch, bucket.cast("int") + lit(r * w + 1))
    }
    if (cells.size == 1) cells.head else least(cells: _*)
  }
}
