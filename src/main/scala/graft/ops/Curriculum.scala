package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum ordering — a training order that presents STAGES in a
  * fixed progression while shuffling freely inside each stage: the
  * published sequence-length-warmup recipe (Li et al. 2022, "The
  * Stability-Efficiency Dilemma: short sequences first") and every
  * easy-to-hard quality curriculum share this shape. The output is a
  * single global position column, so the curriculum composes with
  * everything downstream that already consumes [[GlobalOrder]]'s
  * `pos` — round-robin sharding, [[Packing.concatChunk]] — unchanged.
  *
  * Determinism/scale: within-stage order is the [[GlobalOrder]] seeded
  * md5 permutation ranked by [[Quantiles.segmentedRowNumber]] with the
  * stage as the segment — parallel two-phase ranks, no task ever holds
  * more than ~stage/nBuckets rows. Stage offsets come from the
  * |stages|-row count frame (a broadcast join; the one window there
  * runs over |stages| rows, not data). The oracle's naive
  * `row_number() OVER (ORDER BY stage, hash, id)` reproduces `pos`
  * bit-for-bit because bucket offsets compose with within-bucket
  * ranks exactly.
  */
object Curriculum {

  /** Whole-bit length stage: floor(log2(n + 1)) — doc-length bands
    * that widen geometrically, the natural warmup schedule (stage 0 =
    * empty docs, stage k = [2^k - 1, 2^(k+1) - 1) tokens). Integer
    * bit-length arithmetic, engine-portable like every whole-bit
    * score here. */
  def lengthStage(nTokens: Column): Column =
    (length(bin((nTokens + 1).cast("long"))) - 1).cast("int")

  /** Adds `pos` (0-based LongType, a permutation of 0..n-1): global
    * training order = (stageCol ASC, seeded-md5 hash, idCol). Lower
    * stages train first; a new seed reshuffles within every stage
    * without touching the progression. */
  def stagedOrder(df: DataFrame, idCol: String, stageCol: String,
                  seed: String, nBuckets: Int = 256): DataFrame = {
    val tagged = df
      .withColumn("__h",
        md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))))
      .withColumn("__hn",
        conv(substring(col("__h"), 1, 15), 16, 10).cast("long"))
    val ranked = Quantiles.segmentedRowNumber(tagged, stageCol, "__hn",
      Seq(col("__h"), col(idCol)), nBuckets)
    // |stages|-row offset frame: stage sizes -> exclusive prefix sums
    val wS = Window.orderBy(col("__os"))
    val offsets = ranked.select(col(stageCol).as("__os"), col("__n"))
      .distinct()
      .select(col("__os"),
        (sum(col("__n")).over(wS) - col("__n")).as("__soff"))
    ranked.join(broadcast(offsets), col(stageCol) === col("__os"))
      .withColumn("pos", col("__soff") + col("__rn") - 1)
      .drop("__h", "__hn", "__rn", "__n", "__os", "__soff")
  }
}
