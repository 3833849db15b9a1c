package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing (the GPT-style training-data
  * layout — public methodology): documents concatenate in a
  * deterministic order into one virtual token stream per shard, and
  * the stream chunks into fixed-length training sequences. Each doc's
  * placement is fully described by its exclusive running offset:
  * `seq_id = offset / seqLen`, `offset_in_seq = offset % seqLen`
  * (docs crossing a boundary continue into the next sequence —
  * chunking, not bin packing, so no token is ever padded or dropped).
  *
  * Scale shape: packing is PER SHARD, which is how production
  * pipelines lay out training data anyway (each output shard packs
  * independently — readers shuffle shards, not tokens). The only wide
  * operation is one shuffle on the shard key and a per-shard
  * cumulative sum; shard count is the parallelism knob — size shards
  * to O(shard bytes) (thousands at corpus scale), NEVER a small
  * constant, or the per-shard sort serializes (the q38
  * low-cardinality-partition trap; see SCALE.md). The shard id is
  * `id % nShards` — engine-portable and deterministic, so the same
  * corpus packs identically everywhere (the DuckDB oracle reproduces
  * the layout bit-for-bit).
  */
object Packing {
  /** Assign every document its packed position: (shard, n_tokens,
    * start — the exclusive per-shard running token offset, seq_id,
    * offset_in_seq). `tokens` is any Int/Long token-count column
    * (e.g. [[graft.text.TextFunctions.tokenCount]]). Deterministic
    * order within a shard: ascending `idCol`. */
  def concatChunk(docs: DataFrame, idCol: String, tokens: Column,
                  seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), pmod(col(idCol), lit(nShards.toLong)).as("shard"),
        tokens.cast("long").as("n_tokens"))
      .withColumn("start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // integral division, not a double floor: offsets are exact for
      // the whole long range (a 2^53+ token stream would misbin under
      // binary64 — same fix as RangeJoin.binOf)
      .withColumn("seq_id",
        call_function("div", col("start"), lit(seqLen.toLong)))
      .withColumn("offset_in_seq", pmod(col("start"), lit(seqLen.toLong)))
  }
}
