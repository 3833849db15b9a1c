package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus unigram language-model scoring in the LOG domain with exact
  * integer arithmetic — the CCNet perplexity-filter and DSIR
  * importance-selection steps of an LLM data pipeline (both public
  * methodology: Wenzek et al. 2020 "CCNet", Xie et al. 2023 "Data
  * Selection for Language Models via Importance Resampling").
  *
  * The classic scores are sums of log-probabilities. Transcendental
  * logs are bit-nondeterministic across engines (libm `ln` differs in
  * final ulps and float addition order differs across partitions), so
  * — like [[NgramLm]]'s ratio-of-sums — this module never calls a
  * float log. Instead each token's information content is QUANTIZED
  * to whole bits with pure integer arithmetic:
  *
  *   s(tok) = floor(log2(N / c(tok))) = length(bin(N div c)) - 1
  *
  * (`bin` renders a positive integer in base 2 in both Spark and
  * DuckDB, so the bit length IS the floor-log — no rounding mode, no
  * libm). Per-document sums of these small ints are exact longs; the
  * one IEEE division producing the mean is correctly rounded, hence
  * bit-identical cross-engine. The quantization keeps the score's
  * ORDER semantics (rare tokens contribute more bits) — it is a
  * whole-bit perplexity, which is what a thresholded filter decision
  * actually consumes.
  *
  * Scale shape: the count table is vocabulary-sized, not corpus-sized
  * — one map-side-combined shuffle. Scoring joins the exploded token
  * stream to the counts on the token key (shuffled hash join; Spark
  * auto-broadcasts when the vocab fits, which real subword/word
  * vocabularies at 100 TB often do — O(100M) keys is the ceiling, a
  * Zipf-hot token skews a reducer only in the shuffle form and the
  * count side is one row per key, so no row explosion). The doc
  * aggregate is the only other exchange. The grand total N rides a
  * broadcast one-row cross join — never a driver collect.
  */
object UnigramLm {

  /** floor(log2(q)) for a positive integral column, as whole bits.
    * Shared with [[Retrieval]]'s idf weighting. */
  private[text] def floorLog2(q: Column): Column =
    (length(bin(q.cast("long"))) - 1).cast("int")

  /** Vocabulary-sized (token, c) counts over `docs`' text. */
  private[text] def tokenCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))

  /** Per-document quantized surprisal against a unigram LM trained on
    * `docs` ITSELF (the curation bootstrap; CCNet trains on a trusted
    * reference — to do that, train [[tokenCounts]] there instead).
    * Output, one row per input document: (idCol, n_tokens,
    * sum_surprisal, mean_surprisal); zero-token documents carry
    * n_tokens = 0 and a NULL mean — an explicit decision input, never
    * an absent row. */
  def surprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    val cnt = tokenCounts(docs, textCol)
    val tot = cnt.agg(sum(col("c")).cast("long").as("n_total"))
    val s = cnt.crossJoin(broadcast(tot))
      .select(col("token"), floorLog2(expr("n_total div c")).as("s"))
    val agg = toks.join(s, Seq("token"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"), sum(col("s")).cast("long").as("sum_s"))
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_toks"), lit(0L)).as("n_tokens"),
        coalesce(col("sum_s"), lit(0L)).as("sum_surprisal"),
        when(col("n_toks").isNotNull,
          col("sum_s").cast("double") / col("n_toks").cast("double"))
          .as("mean_surprisal"))
  }

  /** The CCNet-style KEEP-THE-MIDDLE band filter over [[surprisal]]:
    * too-predictable documents are boilerplate, too-surprising ones
    * are noise or the wrong language; training data comes from the
    * band between. Emits every document with its stats and the kept
    * decision (0/1) — zero-token documents are never kept. */
  def perplexityBand(docs: DataFrame, idCol: String, textCol: String,
                     lo: Double, hi: Double): DataFrame =
    surprisal(docs, idCol, textCol)
      .withColumn("kept",
        (col("mean_surprisal").isNotNull &&
          col("mean_surprisal") >= lo && col("mean_surprisal") <= hi)
          .cast("int"))

  /** Add-one-smoothed whole-bit surprisal table for one corpus:
    * (token, s) with s = floor(log2((N + V) div (c + 1))), plus the
    * one-row totals frame (n_total, vocab) the OOV default needs. */
  private def smoothed(docs: DataFrame, textCol: String)
      : (DataFrame, DataFrame) = {
    val cnt = tokenCounts(docs, textCol)
    val tot = cnt.agg(sum(col("c")).cast("long").as("n_total"),
      count(lit(1)).cast("long").as("vocab"))
    val s = cnt.crossJoin(broadcast(tot))
      .select(col("token"),
        floorLog2(expr("(n_total + vocab) div (c + 1)")).as("s"))
    (s, tot)
  }

  /** DSIR-style importance SELECTION: rank every `raw` document by
    * its quantized log-likelihood ratio toward the `target` domain
    * (sum over tokens of s_raw(tok) - s_target(tok) — whole-bit
    * log2 p_target/p_raw; higher = the target LM prefers it) and keep
    * the deterministic top `topN` (ties broken by ascending id — the
    * published method samples ∝ the weight; the deterministic rank
    * form is its reproducible-CI twin). Both LMs are add-one
    * smoothed; raw tokens unseen in the target fall back to the
    * target's OOV surprisal floor(log2(N_t + V_t)). Output: (idCol,
    * n_tokens, llr_q, rank), rank 1..topN.
    *
    * Scale: two vocabulary-sized count shuffles, one token-key join
    * per LM, one doc aggregate; the top-N is orderBy+limit — Spark
    * plans TakeOrdered (a per-partition bounded heap + driver merge
    * of topN rows), never a global sort shuffle. */
  def importanceRank(raw: DataFrame, target: DataFrame, idCol: String,
                     textCol: String, topN: Int): DataFrame = {
    val (sRaw, _) = smoothed(raw, textCol)
    val (sTgt, totTgt) = smoothed(target, textCol)
    val toks = raw.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    val scored = toks
      .join(sRaw.withColumnRenamed("s", "s_r"), Seq("token"))
      .join(sTgt.withColumnRenamed("s", "s_t"), Seq("token"), "left")
      .crossJoin(broadcast(totTgt))
      .select(col(idCol), col("s_r"),
        coalesce(col("s_t"), floorLog2(expr("n_total + vocab"))).as("s_t2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("s_r") - col("s_t2")).cast("long").as("llr_q"))
    val top = scored.orderBy(col("llr_q").desc, col(idCol).asc).limit(topN)
    // rank over the already-bounded topN rows only — one tiny task
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("llr_q").desc, col(idCol).asc)
    top.withColumn("rank", row_number().over(w))
  }
}
