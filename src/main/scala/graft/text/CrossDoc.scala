package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document repeated-substring signal (training-data dedup):
  * for every document, how much of it is made of k-word shingles that
  * also appear in OTHER documents. The per-corpus complement of the
  * within-document repetition score (q46) — high shared fraction marks
  * boilerplate, mirrored pages, and template spam that exact dedup
  * (identical full text) and pairwise near-dup joins both miss when
  * the duplication is many-to-many at the substring level (the
  * motivation for suffix-level dedup in Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better" — public methodology).
  *
  * Scale shape: one corpus scan explodes per-doc DISTINCT shingles
  * ([[graft.functions.exprs.word_shingles]] emits a set); a groupBy on
  * the shingle counts carrier docs (count(*) IS the distinct-doc count);
  * the join back is a plain shingle equi-join — the aggregated side is
  * already hash-partitioned on the shingle (no re-exchange), and AQE
  * downgrades it to a broadcast when the distinct-shingle frame is
  * small; the final aggregate keys on doc id. No doc×doc pair frame
  * ever exists, so cost is linear in corpus shingle mass — unlike
  * pairwise similarity joins whose candidate mass is the
  * scale-sensitive term. At petabyte scale,
  * group on `xxhash64(shingle)` instead of the string to move 8-byte
  * keys (collision-tolerant for a scoring decision; the string form here
  * keeps the DuckDB oracle exact).
  */
object CrossDoc {
  /** (idCol, n_shingles, n_shared, shared_fraction) for every document:
    * `n_shared` of its `n_shingles` distinct k-shingles occur in ≥ 1
    * other document. Documents shorter than k tokens contribute their
    * whole text as one shingle (WordShingles short-doc rule), so every
    * document scores. */
  def duplicateShingleStats(docs: DataFrame, idCol: String, textCol: String,
                            shingleK: Int = 5): DataFrame = {
    // generator form: shingle rows stream straight out of the builder,
    // no per-doc array materialization before the explode
    val sh = docs.select(col(idCol),
      graft.functions.exprs.word_shingle_rows(
        TextFunctions.tokens(col(textCol)), shingleK).as("shingle"))
    val carriers = sh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("__n_docs"))
    sh.join(carriers, Seq("shingle"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum((col("__n_docs") >= 2).cast("long")).as("n_shared"))
      .select(col(idCol), col("n_shingles"), col("n_shared"),
        (col("n_shared") / col("n_shingles")).as("shared_fraction"))
  }
}
