package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection (training-data decontamination):
  * annotate every corpus document with the number of distinct k-word
  * shingles it shares with ANY document of a probe set (the held-out
  * benchmark), and a flag at `minHits`. The standard n-gram-overlap
  * decontamination check (e.g. GPT-3 appendix C / PaLM-style 13-gram
  * filtering — public methodology), expressed as one Spark plan.
  *
  * Scale shape: benchmarks are tiny next to a 100 TB corpus, so the
  * probe shingle set dedupes and BROADCASTS; the corpus explodes its
  * shingles in a single scan, hash-joins the broadcast set (no corpus
  * shuffle), and aggregates hit counts keyed on doc id — the only
  * exchange. Shingles compare as exact strings here; at petabyte scale
  * swap the join key for `xxhash64(shingle)` to move 8-byte keys
  * (collision-tolerant for a flagging decision).
  */
object Contamination {
  /** (idCol, n_hits, contaminated) for EVERY document of `docs` —
    * zero-hit rows are kept (n_hits = 0) so downstream filters see an
    * explicit decision per document, never an absence. */
  def flag(docs: DataFrame, probes: DataFrame, idCol: String,
           textCol: String, shingleK: Int = 5, minHits: Int = 2): DataFrame = {
    // generator form (word_shingle_rows): shingle rows stream straight
    // out of the tight-loop builder, no per-doc array materialization
    val probeShingles = probes
      .select(graft.functions.exprs.word_shingle_rows(
        TextFunctions.tokens(col(textCol)), shingleK).as("shingle"))
      .distinct()
    // doc shingle sets are distinct per doc (the builder emits a set),
    // so count(*) after the join IS the distinct-overlap size
    val hits = docs
      .select(col(idCol), graft.functions.exprs.word_shingle_rows(
        TextFunctions.tokens(col(textCol)), shingleK).as("shingle"))
      .join(broadcast(probeShingles), Seq("shingle"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) >= minHits).cast("int")
          .as("contaminated"))
  }
}
