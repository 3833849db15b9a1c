package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus n-gram language-model quality scoring — the CCNet/KenLM
  * filtering step of an LLM data pipeline, re-expressed with exact
  * integer arithmetic. A document whose bigrams are common corpus
  * continuations is "in-distribution"; one full of rare combinations
  * is noise, boilerplate, or another language.
  *
  * The classic score is mean log P(w2|w1) (a perplexity). Log-space is
  * deliberately NOT used here: summing per-bigram transcendentals is
  * bit-nondeterministic across engines (libm `ln` differs in final
  * ulps, and float addition order differs across partitions), which
  * would break the exact-hash oracle gate and make reruns unstable.
  * Instead the score is the RATIO OF SUMS Σc(w1,w2) / Σc(w1) — both
  * integral, summed exactly, divided once (IEEE division is correctly
  * rounded, so one division of identical integers is identical
  * everywhere). It orders documents the same way for the filtering
  * decision: high = common continuations, low = out-of-distribution.
  *
  * Scale shape: bigram and head counts are corpus aggregates bounded
  * by vocabulary size, not corpus size — map-side combined, one
  * shuffle each. Scoring joins the exploded bigram stream to the two
  * count tables on word keys (shuffled hash joins; a Zipf-hot bigram
  * skews its reducer, which AQE skew-split handles — the count side
  * is one row per key, so no row explosion).
  */
object NgramLm {
  /** Per-document bigram coherence: (idCol, n_bigrams, sum_c2, sum_c1,
    * lm_score) for every document with >= 2 tokens; lm_score =
    * sum_c2/sum_c1 in (0, 1]. Counts are trained on `docs` itself —
    * self-scoring, the common curation bootstrap; to score against a
    * reference corpus, train counts there and join here. */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bi = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col(idCol),
        explode(zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    bi.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("c2")).cast("long").as("sum_c2"),
        sum(col("c1")).cast("long").as("sum_c1"))
      .withColumn("lm_score",
        col("sum_c2").cast("double") / col("sum_c1").cast("double"))
  }
}
