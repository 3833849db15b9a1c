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

  /** Span-level decontamination — [[flag]]'s surgical sibling: instead
    * of dropping a contaminated document wholesale, remove only the
    * token positions covered by a probe-matching k-shingle and keep
    * the rest (the Dolma/RefinedWeb-style span scrub that preserves
    * the document's uncontaminated mass). Output per corpus doc:
    * (idCol, n_tokens, n_removed, clean_text), where clean_text is
    * the surviving tokens joined by single spaces (reassembly is
    * whitespace-normalizing by construction). Documents shorter than
    * `shingleK` follow the [[flag]] convention: the whole text is one
    * shingle, so a probe match removes the entire document (empty
    * clean_text).
    *
    * Scale shape: the probe set broadcasts as in [[flag]]; positional
    * shingles explode once per corpus token (the same mass q44/q59
    * already pay); covered positions aggregate into a PER-DOC bounded
    * array (≤ doc length) on the contaminated minority only, and the
    * rewrite is a higher-order array op — no (doc, position)-grained
    * shuffle, no anti-join of the corpus against its own positions. */
  def removeSpans(docs: DataFrame, probes: DataFrame, idCol: String,
                  textCol: String, shingleK: Int = 5): DataFrame = {
    val probeShingles = probes
      .select(graft.functions.exprs.word_shingle_rows(
        TextFunctions.tokens(col(textCol)), shingleK).as("shingle"))
      .distinct()
    val base = tokenized(docs, idCol, textCol)
    val matches = positionalShingles(base, idCol, shingleK)
      .join(broadcast(probeShingles), Seq("shingle"))
    scrubCovered(base, matches, idCol, shingleK)
  }

  /** Tokenized corpus frame the span-scrub family shares:
    * (idCol, t = token array, m = token count). */
  private[text] def tokenized(docs: DataFrame, idCol: String,
                              textCol: String): DataFrame =
    docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("t"))
      .withColumn("m", size(col("t")))

  /** Positional (i, shingle) rows over a [[tokenized]] frame — the
    * set-emitting generator can't drive a rewrite, positions matter
    * here. Documents shorter than k emit their whole text as the
    * single position-1 shingle (the [[flag]] convention). */
  private[text] def positionalShingles(base: DataFrame, idCol: String,
                                       k: Int): DataFrame =
    base.select(col(idCol), col("m"),
      explode(
        when(col("m") < k,
          array(struct(lit(1).as("i"),
            array_join(col("t"), " ").as("sh"))))
        .otherwise(transform(sequence(lit(1), col("m") - (k - 1)),
          i => struct(i.as("i"),
            array_join(slice(col("t"), i, lit(k)), " ").as("sh"))))).as("x"))
      .select(col(idCol), col("m"),
        col("x.i").as("i"), col("x.sh").as("shingle"))

  /** Rewrite tail shared by the scrub family: aggregate matched
    * positional rows `matches` (idCol, m, i, shingle) into per-doc
    * covered-position sets and emit (idCol, n_tokens, n_removed,
    * clean_text). The m >= 1 filter: an empty document's '' shingle
    * can match an empty probe doc, but there is no position to
    * cover — and Spark's sequence(1, 0) would helpfully count DOWN
    * ([1, 0]) instead of being empty like DuckDB's range(1, 1). */
  private[text] def scrubCovered(base: DataFrame, matches: DataFrame,
                                 idCol: String, k: Int): DataFrame = {
    val covered = matches.filter(col("m") >= 1)
      .select(col(idCol),
        explode(sequence(col("i"), least(col("i") + (k - 1), col("m"))))
          .as("p"))
      .groupBy(col(idCol))
      .agg(collect_set(col("p")).as("covs"))
    base.join(covered, Seq(idCol), "left")
      .select(col(idCol),
        col("m").as("n_tokens"),
        coalesce(size(col("covs")), lit(0)).as("n_removed"),
        when(col("covs").isNull, array_join(col("t"), " "))
          .otherwise(array_join(
            filter(col("t"), (w, i0) => !array_contains(col("covs"), i0 + 1)),
            " "))
          .as("clean_text"))
  }
}
