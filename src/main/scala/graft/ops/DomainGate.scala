package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-level (per-source) corpus curation gate — the RefinedWeb /
  * C4-style step that judges WHOLE domains, not documents: a domain
  * whose pages are mostly mutual duplicates, or too short on average,
  * or linguistically incoherent, is dropped wholesale before any
  * per-document filter runs (public methodology: Penedo et al. 2023
  * "The RefinedWeb Dataset", Raffel et al. 2020 "C4").
  *
  * All stats are exact integer sums with one IEEE division each, so
  * the gate decision is bit-deterministic cross-engine:
  *   - dup_frac    = 1 - distinct(text)/n_docs   (within-domain exact
  *     duplicate mass; at 100 TB swap the raw text key for a 128-bit
  *     fingerprint — collision-safe for a fraction estimate)
  *   - mean_chars  = sum(chars)/n_docs
  *   - modal_frac  = share of the domain's modal language (ties break
  *     to the lexicographically first language)
  *
  * Scale shape: one map-side-combined aggregate keyed by source for
  * the counts/sums, one distinct-aggregate for the dup mass (Spark
  * plans count(DISTINCT) as a two-level expand+aggregate, still one
  * logical shuffle keyed by source), and a per-(source, lang) count
  * whose modal pick is a window over vocabulary-of-languages-sized
  * groups. The output is domain-cardinality — millions of rows at
  * web scale, never corpus-cardinality. Documents are then gated by
  * a broadcast semi-join against the kept domains.
  */
object DomainGate {

  /** Per-source stats + the gate decision, one row per source:
    * (source, n_docs, n_dup, dup_frac, mean_chars, modal_lang,
    * modal_frac, kept). */
  def sourceGate(docs: DataFrame, srcCol: String, textCol: String,
                 langCol: String, charsCol: String,
                 maxDupFrac: Double, minMeanChars: Double,
                 minModalFrac: Double): DataFrame = {
    val base = docs.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col(textCol)).as("n_distinct"),
        sum(col(charsCol)).cast("long").as("sum_chars"))
    val langCnt = docs.groupBy(col(srcCol), col(langCol))
      .agg(count(lit(1)).as("lc"))
    val modal = langCnt
      .withColumn("rn", row_number().over(Window.partitionBy(col(srcCol))
        .orderBy(col("lc").desc, col(langCol).asc)))
      .filter(col("rn") === 1)
      .select(col(srcCol), col(langCol).as("modal_lang"),
        col("lc").as("modal_cnt"))
    base.join(modal, Seq(srcCol))
      .select(col(srcCol),
        col("n_docs"),
        (col("n_docs") - col("n_distinct")).as("n_dup"),
        ((col("n_docs") - col("n_distinct")).cast("double") /
          col("n_docs").cast("double")).as("dup_frac"),
        (col("sum_chars").cast("double") / col("n_docs").cast("double"))
          .as("mean_chars"),
        col("modal_lang"),
        (col("modal_cnt").cast("double") / col("n_docs").cast("double"))
          .as("modal_frac"))
      .withColumn("kept",
        (col("dup_frac") <= maxDupFrac &&
          col("mean_chars") >= minMeanChars &&
          col("modal_frac") >= minModalFrac).cast("int"))
  }

  /** Document-level application of [[sourceGate]]: the input frame
    * filtered to kept domains via a broadcast semi-join (the gate
    * table is domain-cardinality; at web scale it broadcasts or, past
    * that, bucket-joins on the domain key). */
  def applyGate(docs: DataFrame, gate: DataFrame, srcCol: String): DataFrame =
    docs.join(broadcast(gate.filter(col("kept") === 1).select(col(srcCol))),
      Seq(srcCol), "left_semi")
}
