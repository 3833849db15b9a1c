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

  /** Snapshot novelty: per FRESH document, the fraction of its
    * distinct k-shingles absent from the standing REFERENCE corpus —
    * the "how much genuinely new text does this crawl add" accounting
    * every recurring-crawl pipeline fronts before paying for full
    * dedup (a snapshot that is 95% shingle-overlap with the standing
    * corpus earns a shallower pipeline; the per-doc scores feed the
    * crawl-selection mixture directly). Within-corpus sharing is
    * [[duplicateShingleStats]]; this is the CROSS-snapshot form with
    * the reference as a fixed probe set.
    *
    * Scale shape: the reference's distinct-shingle frame does NOT
    * broadcast (corpus-derived, huge at 100 TB) — the membership
    * probe is a plain shingle equi-join both sides hash-partition on,
    * left-outer so zero-overlap docs score novelty 1. The one-pass
    * approximate path at petabyte scale is the bloom gate
    * ([[graft.ops.BloomGate]]) fed with the reference shingles; this
    * exact form is its oracle. At that scale carry `xxhash64(shingle)`
    * instead of the string (collision-tolerant for a score; the
    * string keeps the DuckDB oracle exact). `novelty_fraction` is one
    * IEEE division of exact longs — bit-deterministic. */
  def snapshotNovelty(reference: DataFrame, fresh: DataFrame,
                      idCol: String, textCol: String,
                      shingleK: Int = 5): DataFrame = {
    def shingles(df: DataFrame) = df.select(col(idCol),
      graft.functions.exprs.word_shingle_rows(
        TextFunctions.tokens(col(textCol)), shingleK).as("shingle"))
    val seen = shingles(reference).select(col("shingle")).distinct()
      .withColumn("__seen", lit(1L))
    shingles(fresh).join(seen, Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(col("__seen").isNull.cast("long")).as("n_novel"))
      .select(col(idCol), col("n_shingles"), col("n_novel"),
        (col("n_novel") / col("n_shingles")).as("novelty_fraction"))
  }

  /** First-carrier attribution: in id order, how much of each
    * document is text IT INTRODUCED to the corpus — every distinct
    * k-shingle is attributed to its lowest-id carrier, and a document
    * scores the fraction of its shingles it owns. The ordering twin
    * of [[snapshotNovelty]] (which scores a batch against a fixed
    * reference): here the reference is "everything earlier", the view
    * a crawl-ordered corpus uses to rank origins above mirrors —
    * canonical-survivor selection (q91) picks WHO stays, this reports
    * HOW MUCH each doc originated.
    *
    * Scale shape: identical to [[duplicateShingleStats]] — distinct
    * per-doc shingles from the set-emitting generator, one min
    * aggregate keyed on the shingle (map-combinable), one equi-join
    * back, one doc-keyed rollup; linear in shingle mass, no pair
    * frame. `novelty_fraction` is one IEEE division of exact longs. */
  def firstCarrierStats(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 5): DataFrame = {
    val sh = docs.select(col(idCol),
      graft.functions.exprs.word_shingle_rows(
        TextFunctions.tokens(col(textCol)), shingleK).as("shingle"))
    val first = sh.groupBy(col("shingle"))
      .agg(min(col(idCol)).as("__first"))
    sh.join(first, Seq("shingle"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum((col(idCol) === col("__first")).cast("long"))
          .as("n_introduced"))
      .select(col(idCol), col("n_shingles"), col("n_introduced"),
        (col("n_introduced") / col("n_shingles")).as("novelty_fraction"))
  }

  /** Cross-document repeated-span SCRUB — [[duplicateShingleStats]]'
    * acting sibling, the substring-level dedup of Lee et al. 2021:
    * every k-shingle carried by ≥ `minDocs` distinct documents is
    * removed from every document EXCEPT its lowest-id carrier, which
    * keeps its copy. Dedup, not deletion: the corpus retains each
    * repeated span exactly once (a document can be the keeper for one
    * shingle and scrubbed for another). Exact dedup misses this when
    * duplication is many-to-many at the substring level; pairwise
    * near-dup misses it when the shared mass is spread over many
    * unrelated documents (boilerplate headers, license text,
    * templates). Output per doc: (idCol, n_tokens, n_removed,
    * clean_text) — [[Contamination.removeSpans]]'s contract, scrub
    * driven by the corpus itself instead of a benchmark probe set.
    *
    * Scale shape: positional shingles are the q73 corpus scan; the
    * carrier aggregate runs on DISTINCT (shingle, doc) pairs —
    * map-side combinable after the distinct — and the shared-shingle
    * frame joins back by plain shingle equi-join. Unlike the
    * benchmark probe set, this frame is CORPUS-derived and must not
    * be blindly broadcast (at 100 TB the shared-shingle set is
    * itself huge); the hint-free join lets AQE downgrade to broadcast
    * only when it measures small. At petabyte scale carry
    * `xxhash64(shingle)` instead of the string (collision-tolerant
    * for a scrub; the string keeps the DuckDB oracle exact). */
  def removeSharedSpans(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 5, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs < 2 would scrub unshared text: $minDocs")
    val base = Contamination.tokenized(docs, idCol, textCol)
    val sh = Contamination.positionalShingles(base, idCol, shingleK)
    val carriers = sh.select(col("shingle"), col(idCol)).distinct()
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("__n_docs"), min(col(idCol)).as("__keeper"))
      .filter(col("__n_docs") >= minDocs)
      .select(col("shingle"), col("__keeper"))
    val matches = sh.join(carriers, Seq("shingle"))
      .filter(col(idCol) =!= col("__keeper"))
    Contamination.scrubCovered(base, matches, idCol, shingleK)
  }

  /** Exact LINE-level cross-document dedup (the CCNet / RefinedWeb
    * paragraph-hash discipline, public methodology): every non-empty
    * line carried verbatim by ≥ `minDocs` distinct documents survives
    * only in its lowest-id carrier document; every other document
    * loses ALL its occurrences of that line. The line-granular sibling
    * of [[removeSharedSpans]] — boilerplate navigation, cookie
    * banners, and footers repeat as whole lines, and exact line
    * equality catches them at a fraction of the shingle machinery's
    * cost (no tokenize, no positional cover). Empty lines are
    * structure, not content: they are never dedup candidates and are
    * preserved verbatim at their positions.
    *
    * Output per doc: (idCol, n_lines, n_removed, clean_text) — the
    * [[removeSharedSpans]] contract with lines for tokens (`n_lines`
    * counts every split piece, empties included, matching what the
    * reassembly preserves); the frame
    * is total over the corpus (docs losing every line keep an empty
    * clean_text). Scale shape: one (line → carrier) aggregate over
    * DISTINCT (line, doc) pairs, a hint-free equi-join back (AQE
    * broadcasts when the shared-line frame measures small — like the
    * shingle form, it is corpus-derived and must not be blindly
    * broadcast), and one doc-keyed reassembly; linear in corpus line
    * mass, no pair frame. At petabyte scale carry `xxhash64(line)`
    * instead of the string (collision-tolerant for a scrub; the
    * string keeps the DuckDB oracle exact). */
  def removeSharedLines(docs: DataFrame, idCol: String, textCol: String,
                        minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs < 2 would scrub unshared text: $minDocs")
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), "\\n", -1)).as(Seq("__pos", "__line")))
    val carriers = lines.filter(col("__line") =!= "")
      .select(col("__line"), col(idCol)).distinct()
      .groupBy(col("__line"))
      .agg(count(lit(1)).as("__n_docs"), min(col(idCol)).as("__keeper"))
      .filter(col("__n_docs") >= minDocs)
      .select(col("__line"), col("__keeper"))
    val marked = lines.join(carriers, Seq("__line"), "left")
      .withColumn("__drop",
        col("__keeper").isNotNull && col(idCol) =!= col("__keeper"))
    marked.groupBy(col(idCol)).agg(
        count(lit(1)).as("n_lines"),
        sum(col("__drop").cast("long")).as("n_removed"),
        array_join(
          transform(
            filter(sort_array(collect_list(
              struct(col("__pos"), col("__drop"), col("__line")))),
              s => !s.getField("__drop")),
            s => s.getField("__line")),
          "\n").as("clean_text"))
      .select(col(idCol), col("n_lines"), col("n_removed"), col("clean_text"))
  }

  /** DuckDB oracle twin of [[removeSharedLines]] — full query over
    * `table`; kept adjacent so the split rule, keeper policy, and
    * reassembly cannot drift. */
  def removeSharedLinesOracleSql(table: String, idCol: String,
                                 textCol: String, minDocs: Int = 2): String =
    s"""WITH lines AS (
       |  SELECT $idCol, L,
       |    CAST(unnest(range(1, len(L)+1)) AS INTEGER) AS pos
       |  FROM (SELECT $idCol,
       |    string_split($textCol, chr(10)) AS L FROM $table)),
       |pieces AS (SELECT $idCol, pos, L[pos] AS line FROM lines),
       |carriers AS (
       |  SELECT line, min($idCol) AS keeper
       |  FROM (SELECT DISTINCT line, $idCol FROM pieces WHERE line <> '')
       |  GROUP BY 1 HAVING count(*) >= $minDocs),
       |marked AS (
       |  SELECT p.$idCol, p.pos, p.line,
       |    (c.keeper IS NOT NULL AND p.$idCol <> c.keeper) AS dropped
       |  FROM pieces p LEFT JOIN carriers c ON p.line = c.line)
       |SELECT $idCol,
       |  CAST(count(*) AS BIGINT) AS n_lines,
       |  CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_removed,
       |  coalesce(array_to_string(
       |    list(line ORDER BY pos) FILTER (WHERE NOT dropped),
       |    chr(10)), '') AS clean_text
       |FROM marked GROUP BY 1""".stripMargin
}
