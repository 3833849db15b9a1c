package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style within-document repetition statistics (Rae et al.
  * 2021, "Scaling Language Models: ... Gopher", §A1.1 — public
  * methodology, reused by MassiveText/RefinedWeb/RedPajama corpus
  * filters): documents dominated by repeated lines, paragraphs, or a
  * single n-gram are template spam / crawler artifacts and are dropped
  * before training. The per-STRUCTURE complement of q46's token-level
  * distinct ratio — a doc can have high token diversity yet be 90% one
  * repeated paragraph.
  *
  * Definitions (exact, mirrored in the DuckDB twin):
  *   - unit (line/paragraph) duplicate fraction
  *       = (occurrences − distinct units) / occurrences
  *     — the share of unit occurrences that are repeats of an earlier
  *     unit;
  *   - unit duplicate CHARACTER fraction
  *       = Σ_dup-occurrences len(unit) / Σ_all-occurrences len(unit)
  *     — repeats weighted by size (one duplicated 2-char line is not
  *     one duplicated 500-char paragraph), occurrences beyond the
  *     first of each distinct unit counted;
  *   - top n-gram character fraction
  *       = count(most frequent n-gram) × len(n-gram) / len(text)
  *     over n-grams occurring ≥ 2 times (a singleton gram is not
  *     repetition — docs with no repeated n-gram score 0.0);
  *     tie-broken deterministically (count DESC, gram DESC — the
  *     struct-max order, replayed as a window in SQL).
  * Lines split on `\n`, paragraphs on `\n{2,}`, empty pieces dropped;
  * n-grams are ALL overlapping word k-grams with multiplicity
  * ([[graft.functions.WordGrams]] — docs shorter than n tokens have no
  * n-gram and score 0.0). Docs with no units at all score 0.0, not
  * null, so the frame is total over the corpus.
  *
  * Scale shape: each statistic family is one explode + two map-side-
  * combinable aggregates keyed by (doc, unit) then doc — linear in
  * corpus text mass, no pair frame, no window over the corpus. The
  * final assembly is doc-keyed joins of per-doc aggregates (batch-
  * sized frames relative to the exploded mass); every fraction is an
  * IEEE division of exact Long sums, so the output is deterministic
  * and cross-engine hashable.
  */
object Repetition {
  /** Per-document repetition statistics over lines, paragraphs, and
    * word n-grams (one `top_{n}gram_char_frac` column per entry of
    * `gramNs`). Output columns: (idCol, n_chars, n_lines,
    * dup_line_frac, dup_line_char_frac, n_paras, dup_para_frac,
    * dup_para_char_frac, top_2gram_char_frac, ...). */
  def stats(docs: DataFrame, idCol: String, textCol: String,
            gramNs: Seq[Int] = Seq(2, 3, 4)): DataFrame = {
    require(gramNs.nonEmpty && gramNs.forall(_ >= 1), s"bad gramNs: $gramNs")
    val id = col(idCol)
    val base = docs.select(id, col(textCol).as("__text"))

    // lines / paragraphs: explode non-empty pieces, count per (doc,
    // unit), then fold to per-doc occurrence/distinct/char sums
    def unitStats(sepRe: String, prefix: String): DataFrame = {
      // explode the raw split then row-filter empties: the row filter
      // stays inside whole-stage codegen where an array-HOF filter
      // (CodegenFallback) would not
      val units = base.select(id,
          explode(split(col("__text"), sepRe, -1)).as("__u"))
        .filter(col("__u") =!= "")
      val perUnit = units.groupBy(id, col("__u"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__len", length(col("__u")).cast("long"))
      perUnit.groupBy(id).agg(
        sum(col("__c")).as(s"n_$prefix"),
        ((sum(col("__c")) - count(lit(1))).cast("double") / sum(col("__c")))
          .as(s"dup_${prefix.dropRight(1)}_frac"),
        (sum((col("__c") - 1) * col("__len")).cast("double") /
          sum(col("__c") * col("__len")))
          .as(s"dup_${prefix.dropRight(1)}_char_frac"))
    }

    // top n-gram: count per (doc, gram), take the struct-max (count
    // DESC, gram DESC — deterministic) over grams occurring ≥ 2
    // times — a singleton gram is not repetition, and without the
    // floor every short document scores its own longest n-gram
    // (len(gram)/len(text), tripping the Gopher gate on clean prose);
    // weigh by gram length over doc length
    def topGram(n: Int): DataFrame = {
      val grams = base.select(id,
        explode(graft.functions.exprs.word_grams(
          TextFunctions.tokens(col("__text")), n)).as("__g"))
      grams.groupBy(id, col("__g"))
        .agg(count(lit(1)).as("__c"))
        .filter(col("__c") >= 2)
        .groupBy(id)
        .agg(max(struct(col("__c"), col("__g"))).as("__top"))
        .select(id,
          (col("__top.__c") * length(col("__top.__g")).cast("long"))
            .as(s"__topchars_$n"))
    }

    val withUnits = Seq(unitStats("\\n", "lines"), unitStats("\\n{2,}", "paras"))
      .foldLeft(base.select(id, length(col("__text")).cast("long").as("n_chars"))) {
        (acc, st) => acc.join(st, Seq(idCol), "left")
      }
    val withGrams = gramNs.foldLeft(withUnits) { (acc, n) =>
      acc.join(topGram(n), Seq(idCol), "left")
    }
    val zeroFilled = withGrams.select(
      id +: col("n_chars") +:
        (Seq(col("n_lines"), col("dup_line_frac"), col("dup_line_char_frac"),
          col("n_paras"), col("dup_para_frac"), col("dup_para_char_frac"))
          ++ gramNs.map(n =>
            when(col("n_chars") > 0,
              coalesce(col(s"__topchars_$n").cast("double"), lit(0.0)) /
                col("n_chars"))
              .otherwise(lit(0.0)).as(s"top_${n}gram_char_frac"))): _*)
    zeroFilled
      .withColumn("n_lines", coalesce(col("n_lines"), lit(0L)))
      .withColumn("dup_line_frac", coalesce(col("dup_line_frac"), lit(0.0)))
      .withColumn("dup_line_char_frac",
        coalesce(col("dup_line_char_frac"), lit(0.0)))
      .withColumn("n_paras", coalesce(col("n_paras"), lit(0L)))
      .withColumn("dup_para_frac", coalesce(col("dup_para_frac"), lit(0.0)))
      .withColumn("dup_para_char_frac",
        coalesce(col("dup_para_char_frac"), lit(0.0)))
  }

  /** The published Gopher repetition GATE (Rae et al. 2021, Table A1)
    * applied over [[stats]]: keep a document only if every structural
    * repetition signal sits under its threshold — duplicate
    * line/paragraph fraction ≤ 0.30, duplicate line/paragraph
    * CHARACTER fraction ≤ 0.20, top 2-/3-/4-gram character fraction
    * ≤ 0.20/0.18/0.16. Thresholds compare doubles both engines
    * compute identically, so the kept set is cross-engine exact.
    * Returns the surviving rows with their stats (compose with
    * [[graft.dedup.Curation]]'s lang/quality gates upstream of
    * dedup). */
  def gopherFilter(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame =
    stats(docs, idCol, textCol).filter(
      col("dup_line_frac") <= 0.30 && col("dup_para_frac") <= 0.30 &&
        col("dup_line_char_frac") <= 0.20 &&
        col("dup_para_char_frac") <= 0.20 &&
        col("top_2gram_char_frac") <= 0.20 &&
        col("top_3gram_char_frac") <= 0.18 &&
        col("top_4gram_char_frac") <= 0.16)

  /** DuckDB oracle twin of [[gopherFilter]] — [[statsOracleSql]]
    * wrapped in the same threshold predicate. */
  def gopherFilterOracleSql(table: String, idCol: String,
                            textCol: String): String =
    s"""SELECT * FROM (
       |${statsOracleSql(table, idCol, textCol)}
       |) WHERE dup_line_frac <= 0.30 AND dup_para_frac <= 0.30
       |  AND dup_line_char_frac <= 0.20 AND dup_para_char_frac <= 0.20
       |  AND top_2gram_char_frac <= 0.20 AND top_3gram_char_frac <= 0.18
       |  AND top_4gram_char_frac <= 0.16""".stripMargin

  /** DuckDB oracle twin of [[stats]] — full query over `table`; kept
    * adjacent so split rules, tie-breaks, and zero-fills cannot drift. */
  def statsOracleSql(table: String, idCol: String, textCol: String,
                     gramNs: Seq[Int] = Seq(2, 3, 4)): String = {
    def unitCte(sepRe: String, prefix: String): String =
      s"""${prefix}_units AS (
         |  SELECT $idCol,
         |    unnest(list_filter(string_split_regex($textCol, '$sepRe'),
         |      u -> u <> '')) AS u
         |  FROM $table),
         |${prefix}_per AS (
         |  SELECT $idCol, u, count(*) AS c, CAST(length(u) AS BIGINT) AS len
         |  FROM ${prefix}_units GROUP BY 1, 2),
         |${prefix}_doc AS (
         |  SELECT $idCol, sum(c) AS n_units,
         |    CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS dup_frac,
         |    CAST(sum((c-1)*len) AS DOUBLE) / sum(c*len) AS dup_char_frac
         |  FROM ${prefix}_per GROUP BY 1)""".stripMargin
    def gramCte(n: Int): String =
      s"""grams_$n AS (
         |  SELECT $idCol, T,
         |    CAST(unnest(range(1, len(T)-$n+2)) AS INTEGER) AS i
         |  FROM toks WHERE len(T) >= $n),
         |gcnt_$n AS (
         |  SELECT $idCol, array_to_string(T[i:i+${n - 1}], ' ') AS g,
         |    count(*) AS c
         |  FROM grams_$n GROUP BY 1, 2),
         |gtop_$n AS (
         |  SELECT $idCol, c * CAST(length(g) AS BIGINT) AS topchars
         |  FROM (SELECT *, row_number() OVER
         |    (PARTITION BY $idCol ORDER BY c DESC, g DESC) AS rnk
         |    FROM gcnt_$n WHERE c >= 2) WHERE rnk = 1)""".stripMargin
    val gramCols = gramNs.map(n =>
      s"""  CASE WHEN length(d.$textCol) > 0
         |    THEN coalesce(CAST(g$n.topchars AS DOUBLE), 0.0) /
         |      length(d.$textCol)
         |    ELSE 0.0 END AS top_${n}gram_char_frac""".stripMargin)
      .mkString(",\n")
    val gramJoins = gramNs.map(n =>
      s"LEFT JOIN gtop_$n g$n ON d.$idCol = g$n.$idCol").mkString("\n")
    s"""WITH toks AS (SELECT $idCol, ${TextFunctions.sql.tokens(textCol)} AS T
       |  FROM $table),
       |${unitCte("\\n", "lines")},
       |${unitCte("\\n{2,}", "paras")},
       |${gramNs.map(gramCte).mkString(",\n")}
       |SELECT d.$idCol, CAST(length(d.$textCol) AS BIGINT) AS n_chars,
       |  CAST(coalesce(l.n_units, 0) AS BIGINT) AS n_lines,
       |  coalesce(l.dup_frac, 0.0) AS dup_line_frac,
       |  coalesce(l.dup_char_frac, 0.0) AS dup_line_char_frac,
       |  CAST(coalesce(p.n_units, 0) AS BIGINT) AS n_paras,
       |  coalesce(p.dup_frac, 0.0) AS dup_para_frac,
       |  coalesce(p.dup_char_frac, 0.0) AS dup_para_char_frac,
       |$gramCols
       |FROM $table d
       |LEFT JOIN lines_doc l ON d.$idCol = l.$idCol
       |LEFT JOIN paras_doc p ON d.$idCol = p.$idCol
       |$gramJoins""".stripMargin
  }
}
