package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle — the "randomize training order" step
  * of a dataset build, as an exact, engine-portable, scale-safe
  * global rank.
  *
  * Training builds want documents in a pseudo-random order that (a)
  * breaks source/crawl locality, (b) reproduces bit-for-bit across
  * reruns and engines, and (c) never funnels the corpus through one
  * task. The order key is `md5(seed || ":" || id)` — the same
  * portable uniform [[Sampling]] and [[Splits]] hash with — and the
  * global position comes from [[Quantiles.segmentedRowNumber]] run
  * over a single constant segment: boundary-sketch the hash space,
  * rank within each of `nBuckets` hash ranges in parallel, add the
  * bucket's prefix offset. The naive
  * `row_number() OVER (ORDER BY hash)` is what the ORACLE runs — on
  * the cluster that window's empty partitioning is an exchange to ONE
  * task holding the whole corpus; here no task ever sees more than
  * ~1/nBuckets of it (a sketch-skewed bucket only unbalances, never
  * corrupts).
  *
  * A new seed is a completely new permutation (epoch reshuffles are
  * one column swap); downstream, `pmod(pos, nShards)` deals the
  * shuffled stream round-robin into balanced shards, and
  * [[Packing.concatChunk]] can consume `pos` as its deterministic
  * concatenation order. */
object GlobalOrder {
  /** Adds `pos` (0-based, LongType, a permutation of 0..n-1): the
    * row's global rank under the seeded-hash order, ties on the full
    * 128-bit hash broken by `idCol` (total as long as ids are
    * unique). `nBuckets` is the parallelism knob — ranks are exact at
    * any value; size it so corpus/nBuckets fits a task. */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: String,
                           nBuckets: Int = 256): DataFrame = {
    val tagged = df
      .withColumn("__h",
        md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))))
      // numeric prefix of the hash for the boundary sketch; the full
      // hex string refines it (fixed-width lowercase hex orders
      // lexicographically exactly as the 128-bit value)
      .withColumn("__hn",
        conv(substring(col("__h"), 1, 15), 16, 10).cast("long"))
      .withColumn("__g", lit(0))
    Quantiles.segmentedRowNumber(tagged, "__g", "__hn",
        Seq(col("__h"), col(idCol)), nBuckets)
      .withColumn("pos", col("__rn") - 1)
      .drop("__h", "__hn", "__g", "__rn", "__n")
  }
}
