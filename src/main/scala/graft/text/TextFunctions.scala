package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale document pipelines.
  *
  * Everything here is built-in-function composition (codegen'd, no
  * UDFs), so the expressions stay inside whole-stage codegen and scale
  * linearly with no shuffle. Each function has a DuckDB oracle twin in
  * [[sql]] — kept adjacent so Spark and oracle semantics cannot drift.
  *
  * Extension surface beyond the reference (which has no text ops —
  * SURVEY.md §2.9): language-ID heuristic, quality scoring, token
  * counting, document fingerprinting.
  */
object TextFunctions {
  /** Whitespace tokens, empty strings removed. Declaratively this is
    * `filter(split(c, "\\s+"), _ =!= "")`; the codegen'd byte-walk
    * expression ([[graft.functions.WhitespaceTokens]]) computes the
    * identical array without the HOF chain's CodegenFallback — the
    * fallback split whole-stage codegen at the tokenize, the FIRST
    * step of every text operator (see the semantics proof on
    * [[graft.functions.ExprOps.wsTokens]]; TextFunctionsSpec pins
    * ≡ on the edge shapes). */
  def tokens(c: Column): Column = graft.functions.exprs.ws_tokens(c)

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Count of tokens found in `set` (stopword hits). */
  def hitCount(c: Column, set: Seq[String]): Column =
    size(filter(tokens(c), t => t.isin(set.map(_.asInstanceOf[Any]): _*)))

  /** ASCII punctuation count. */
  def punctCount(c: Column): Column = regexp_count(c, lit("[\\p{Punct}]"))

  /** CJK character count (cheap zh signal). */
  def cjkCount(c: Column): Column = regexp_count(c, lit("[\\x{4e00}-\\x{9fff}]"))

  val stopEn = Seq("the", "a", "and", "of", "to", "in", "is")
  val stopEs = Seq("el", "la", "los", "de", "que", "y")
  val stopDe = Seq("der", "die", "das", "und", "ist")
  val stopFr = Seq("le", "les", "des", "et", "est")

  /** Deterministic n-gram/stopword language-ID heuristic: CJK chars win
    * for zh, else argmax of per-language stopword hits with a fixed
    * tie-break order (en, es, de, fr). */
  def langId(c: Column): Column = {
    val en = hitCount(c, stopEn); val es = hitCount(c, stopEs)
    val de = hitCount(c, stopDe); val fr = hitCount(c, stopFr)
    when(cjkCount(c) > 0, "zh")
      .when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  /** BPE-ish pre-tokenization pattern (GPT-2-style): contraction
    * suffixes, letter runs, digit runs, punctuation runs, whitespace.
    * Identical semantics in Java regex (Spark) and RE2 (DuckDB). */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Count of BPE-ish pre-tokens (upper-bounds subword token count). */
  def bpeTokenCount(c: Column): Column = regexp_count(c, lit(bpePattern))

  /** Sliding-window token chunks: windows of `chunkSize` tokens every
    * `stride` tokens, tail-COVERING — the final window starts on the
    * stride grid and may be shorter than `chunkSize` (it is not
    * re-anchored to end exactly at the last token). The segmentation
    * step of a training-data pipeline — explode the result to get one
    * row per chunk. */
  def chunks(c: Column, chunkSize: Int, stride: Int): Column = {
    require(chunkSize > 0 && stride > 0,
      s"chunkSize ($chunkSize) and stride ($stride) must be positive")
    val toks = tokens(c)
    val n = size(toks)
    val nChunks = ceil(greatest(n - chunkSize, lit(0)) / stride) + 1
    transform(sequence(lit(0), nChunks.cast("int") - 1),
      i => array_join(slice(toks, i * stride + 1, lit(chunkSize)), " "))
  }

  /** Normalized-text MD5 fingerprint (case/whitespace-insensitive). */
  def fingerprint(c: Column): Column =
    md5(trim(regexp_replace(lower(c), "\\s+", " ")))

  // PII scrubbing patterns — deliberately restricted to the RE2-safe
  // subset (no lookaround, no backrefs) so Java regex (Spark) and RE2
  // (DuckDB, Go/Rust scrubbers) reproduce the identical replacement.
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Octets constrained to 0-255 (RE2-safe alternation, no lookaround),
    * so 999.999.999.999 is no longer treated as an IP, while zero-padded
    * log forms (192.168.001.001, 010.2.3.4) still redact — each octet
    * admits up to two leading zeros. Known residual looseness, inherent
    * without lookahead: a longer dotted run like 1.2.3.4.5 still has its
    * first four octets redacted (leaving ".5") — acceptable for scrubbing
    * (over-redaction of version-ish strings, never under-redaction of a
    * real embedded IP). */
  val ipv4Re = {
    val octet = "(?:0{0,2}(?:25[0-5]|2[0-4]\\d|1\\d\\d)|0{0,2}[1-9]?\\d)"
    s"\\b$octet(?:\\.$octet){3}\\b"
  }
  val longDigitsRe = "\\b\\d{9,}\\b" // SSN / phone / account-number class

  /** PII redaction (training-data scrubbing): emails, bare IPv4s and
    * long digit runs replaced with typed sentinels, applied in that
    * order (emails first, so an address's digits can't be half-eaten
    * by the number rule). */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      longDigitsRe, "<NUM>")

  /** 64-bit chained-hash rolling fingerprint over tokens — order-
    * sensitive (unlike [[fingerprint]]); each step rehashes the running
    * state with the next token, so no arithmetic overflow under ANSI
    * mode. Not SQL-expressible; used by rows-only dedup variants. */
  def rollingHash(c: Column): Column =
    aggregate(tokens(c), lit(0L), (acc, t) => xxhash64(acc, t))

  /** Content-defined chunking: split each document's token stream at
    * tokens whose hash lands on the boundary mask (`tokenHash64 ≡ 0
    * mod modulus` — a boundary token is the LAST token of its chunk),
    * emitting per chunk its token count, start position, and an
    * XOR-of-token-hashes fingerprint. Because boundaries are keyed on
    * CONTENT, not position, an edit perturbs only its own chunk and
    * at most its two neighbors — the shift-resistance fixed-width
    * chunking (q35) lacks, and the property dedup storage (and chunk-
    * level near-dup detection) is built on. Expected chunk length is
    * `modulus` tokens.
    *
    * Scale: one generator pass + a per-DOCUMENT running sum (windows
    * partition on the id — documents are the parallel unit, like the
    * q17/q73 doc-local shapes), then a (doc, chunk) aggregate. */
  def contentChunks(docs: DataFrame, idCol: String, textCol: String,
                    modulus: Int = 16): DataFrame = {
    require(modulus >= 2, s"modulus must be >= 2, got $modulus")
    val toks = docs
      .select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("h", graft.functions.exprs.token_hash64(col("tok")))
      .withColumn("b",
        when(pmod(col("h"), lit(modulus.toLong)) === 0, 1L)
          .otherwise(0L))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    toks
      // chunk = boundaries strictly BEFORE this token, so the
      // boundary token itself closes its own chunk
      .withColumn("chunk", coalesce(sum(col("b"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .groupBy(col(idCol), col("chunk"))
      .agg(count(lit(1)).as("n_tokens"),
        min(col("pos")).as("start_pos"),
        expr("bit_xor(h)").as("chunk_fp"))
  }

  /** Top-k keywords per document by a log-free TF-IDF surrogate
    * (tf × nDocs / df — same ordering as tf·idf for ranking, and
    * bit-deterministic across engines, which log() is not: libm last-ulp
    * differences would break oracle parity). Two shuffles: (doc, token)
    * term counts, then token document-frequency; the scalar corpus size
    * is the only driver-side value (watermark-style). */
  def topKeywords(docs: DataFrame, idCol: String, textCol: String,
                  k: Int): DataFrame = {
    // corpus size as a lazy broadcast scalar — an eager docs.count()
    // here would run a job at plan-construction time and scan the
    // corpus once more per invocation
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dft, "token").crossJoin(broadcast(nDocs))
      .withColumn("score", (col("tf").cast("double") * col("n_docs")) / col("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("token").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /** Oracle twins (DuckDB SQL fragments over a text expression). */
  object sql {
    def tokens(c: String): String =
      s"list_filter(string_split_regex($c, '\\s+'), t -> t <> '')"
    def tokenCount(c: String): String = s"CAST(len(${tokens(c)}) AS INTEGER)"
    def hitCount(c: String, set: Seq[String]): String = {
      val inList = set.map(s => s"'$s'").mkString(", ")
      s"CAST(len(list_filter(${tokens(c)}, t -> t IN ($inList))) AS INTEGER)"
    }
    def punctCount(c: String): String =
      s"CAST(len(regexp_extract_all($c, '[[:punct:]]')) AS INTEGER)"
    def cjkCount(c: String): String =
      s"CAST(len(regexp_extract_all($c, '[\\x{4e00}-\\x{9fff}]')) AS INTEGER)"
    def langId(c: String): String = {
      val en = hitCount(c, stopEn); val es = hitCount(c, stopEs)
      val de = hitCount(c, stopDe); val fr = hitCount(c, stopFr)
      s"""CASE WHEN ${cjkCount(c)} > 0 THEN 'zh'
         | WHEN $en >= $es AND $en >= $de AND $en >= $fr THEN 'en'
         | WHEN $es >= $de AND $es >= $fr THEN 'es'
         | WHEN $de >= $fr THEN 'de'
         | ELSE 'fr' END""".stripMargin
    }
    def fingerprint(c: String): String =
      s"md5(trim(regexp_replace(lower($c), '\\s+', ' ', 'g')))"
    def redactPii(c: String): String =
      s"regexp_replace(regexp_replace(regexp_replace($c, " +
        s"'$emailRe', '<EMAIL>', 'g'), '$ipv4Re', '<IP>', 'g'), " +
        s"'$longDigitsRe', '<NUM>', 'g')"
    def bpeTokenCount(c: String): String = {
      val p = bpePattern.replace("'", "''") // SQL string-literal escape
      s"CAST(len(regexp_extract_all($c, '$p')) AS INTEGER)"
    }
    /** Oracle twin of [[TextFunctions.topKeywords]] — kept here so the
      * score formula, tie-break, and column list cannot drift from the
      * Spark side. */
    def topKeywordsQuery(table: String, idCol: String, c: String,
                         k: Int): String =
      s"""WITH toks AS (SELECT $idCol, unnest(${tokens(c)}) AS token
         |  FROM $table),
         |tf AS (SELECT $idCol, token, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dft AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         |scored AS (
         |  SELECT $idCol, tf.token, tf.tf, dft.df,
         |    (CAST(tf.tf AS DOUBLE) * (SELECT count(*) FROM $table)) / dft.df
         |      AS score
         |  FROM tf JOIN dft ON tf.token = dft.token)
         |SELECT $idCol, token, tf, df, score, CAST(rnk AS INTEGER) AS rank
         |FROM (SELECT *, row_number() OVER
         |  (PARTITION BY $idCol ORDER BY score DESC, token) AS rnk FROM scored)
         |WHERE rnk <= $k""".stripMargin

    /** Oracle twin of [[TextFunctions.chunks]] exploded to rows; emits
      * a full query over `table` with (idCol, chunk_idx, chunk). */
    def chunksQuery(table: String, idCol: String, c: String,
                    chunkSize: Int, stride: Int): String =
      s"""WITH t AS (SELECT $idCol, ${tokens(c)} AS toks FROM $table),
         |e AS (SELECT $idCol, toks,
         |  unnest(generate_series(0,
         |    CAST(ceil(greatest(len(toks)-$chunkSize,0)/$stride) AS BIGINT))) AS i
         |  FROM t)
         |SELECT $idCol, CAST(i AS INTEGER) AS chunk_idx,
         |  array_to_string(toks[(i*$stride+1):(i*$stride+$chunkSize)], ' ') AS chunk
         |FROM e""".stripMargin
  }
}
