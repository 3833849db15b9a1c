package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.TableCatalog

/** Keyword retrieval over an inverted index — the corpus-search
  * primitive an LLM data pipeline runs constantly: decontamination
  * lookups ("which documents carry this benchmark phrase"), targeted
  * corpus slicing, and quality forensics. The public shape is BM25
  * (Robertson & Zaragoza 2009); scoring here is the deliberately
  * reduced integer form
  *
  *   score(q, d) = Σ_{t ∈ terms(q)} tf(t, d) · floor(log2(N div df(t)))
  *
  * — term frequency times WHOLE-BIT idf (the [[UnigramLm]]
  * quantization: bit length of an integer quotient, no libm log), no
  * length normalization. Dropping the saturation/length terms is what
  * makes every score an exact long and the ranking hash-replayable
  * cross-engine; the idf keeps the part of BM25 that does the real
  * lifting (rare terms dominate). Ties break (score DESC, id ASC).
  * Query terms are SET-valued (duplicates in the query string don't
  * double-count — the standard bag-of-terms boolean model).
  *
  * Scale shape: postings are one row per (token, doc) — the same
  * cardinality as the token stream after the per-doc tf combine, one
  * map-side-combined shuffle to build. df is a vocabulary-sized
  * aggregate of the postings. A search broadcasts the (qid, token,
  * idf) weight frame (|queries|·|terms| rows — tiny), so candidate
  * generation is a BROADCAST join against postings: no postings
  * shuffle, only the candidate (qid, doc) aggregate moves. With the
  * persisted index ([[buildIndex]]) the postings also carry a
  * token-hash bucket partition column, and [[searchTopKFromCatalog]]
  * prunes the scan to the query terms' buckets at the FILE level —
  * the top-k never reads most of a 100 TB index.
  */
object Retrieval {

  /** (token, idCol, tf) — the inverted index rows. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col(idCol))
      .agg(count(lit(1)).as("tf"))
      .select(col("token"), col(idCol), col("tf"))

  /** Bucket column for partition pruning: non-negative token-hash
    * modulo `nBuckets`. xxhash64 is Spark-stable (the same literal
    * probes compute the same buckets forever) — the oracle never
    * needs it because persistence is proven bit-neutral instead. */
  private def bucketOf(token: org.apache.spark.sql.Column,
                       nBuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(token), lit(nBuckets.toLong)).cast("int")

  /** Persist the index: `<prefix>_postings` partitioned by token-hash
    * bucket (the pruning lever), `<prefix>_meta` one row (n_docs).
    * df(t) is NOT materialized: it must be consistent with the
    * postings by construction, and deriving it at search time from
    * the pruned buckets alone would be wrong (df needs the global
    * count) — so it lives in the postings themselves as a per-token
    * aggregate over ONE bucket's files (cheap: a token's rows are all
    * in its own bucket). */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
                 catalog: TableCatalog, prefix: String,
                 nBuckets: Int = 64,
                 commitBatchId: Option[Long] = None): Unit = {
    val spark = docs.sparkSession
    // a maintenance REBUILD of a stream-fed index keeps the replay
    // fence: the rebuilt corpus already contains every committed
    // batch, so dropping batch_id here would invite the next restart
    // to re-append the last one (see the appendToIndex carry note).
    // The flip side: a rebuild that will be fed by a NEW stream with
    // a FRESH checkpoint (batch ids restarting at 0) must NOT carry
    // the old fence — the sink would silently skip every batch up to
    // the stale id. Such a rebuild uses a fresh prefix, or passes
    // commitBatchId = Some(-1L) explicitly to reset the fence.
    val carried = commitBatchId.orElse {
      if (catalog.exists(spark, s"${prefix}_meta")) {
        val m = catalog.read(spark, s"${prefix}_meta")
        if (m.columns.contains("batch_id"))
          Some(m.head().getAs[Long]("batch_id"))
        else None
      } else None
    }
    val post = postings(docs, idCol, textCol)
      .withColumn("bucket", bucketOf(col("token"), nBuckets))
    catalog.overwrite(post, s"${prefix}_postings", partitionBy = Seq("bucket"))
    val positions = positionalPostings(docs, idCol, textCol)
      .withColumn("bucket", bucketOf(col("token"), nBuckets))
    catalog.overwrite(positions, s"${prefix}_positions",
      partitionBy = Seq("bucket"))
    writeMeta(spark, catalog, prefix, docs.count(),
      nBuckets.toLong, carried)
  }

  /** The one-row meta overwrite. When `commitBatchId` is set (the
    * streaming sink), the batch id rides IN the same row — meta
    * advance and batch commit are then a single parquet overwrite, so
    * a replayed batch can never re-advance n_docs (it re-appends
    * postings at worst; see [[indexSink]]). */
  private def writeMeta(spark: SparkSession, catalog: TableCatalog,
                        prefix: String, nDocs: Long, nBuckets: Long,
                        commitBatchId: Option[Long]): Unit = {
    import spark.implicits._
    val meta = commitBatchId match {
      case Some(b) => Seq((nDocs, nBuckets, b))
        .toDF("n_docs", "n_buckets", "batch_id")
      case None => Seq((nDocs, nBuckets)).toDF("n_docs", "n_buckets")
    }
    catalog.overwrite(meta, s"${prefix}_meta")
  }

  /** Append new documents to a persisted index: delta postings land
    * in their token buckets, n_docs advances. Sound because postings
    * rows are per-(token, doc) — new docs only ADD rows (the caller
    * guarantees id disjointness, the same contract as every appendable
    * index here). idf weights shift with N and df as they must; they
    * are derived at search time, never frozen into the index. */
  def appendToIndex(delta: DataFrame, idCol: String, textCol: String,
                    catalog: TableCatalog, prefix: String,
                    commitBatchId: Option[Long] = None): Unit = {
    val spark = delta.sparkSession
    val meta = catalog.read(spark, s"${prefix}_meta").head()
    val nBuckets = meta.getAs[Long]("n_buckets").toInt
    catalog.append(
      postings(delta, idCol, textCol)
        .withColumn("bucket", bucketOf(col("token"), nBuckets)),
      s"${prefix}_postings", partitionBy = Seq("bucket"))
    catalog.append(
      positionalPostings(delta, idCol, textCol)
        .withColumn("bucket", bucketOf(col("token"), nBuckets)),
      s"${prefix}_positions", partitionBy = Seq("bucket"))
    // a direct (batch-unaware) append must CARRY the streaming fence
    // forward, not drop it: overwriting _meta without batch_id would
    // reset the sink's replay guard to -1 and the next restart would
    // re-apply an already-committed batch — double postings AND a
    // re-advanced n_docs, the exact drift the one-write design exists
    // to prevent
    val carried = commitBatchId.orElse(
      if (meta.schema.fieldNames.contains("batch_id"))
        Some(meta.getAs[Long]("batch_id"))
      else None)
    writeMeta(spark, catalog, prefix,
      meta.getAs[Long]("n_docs") + delta.count(), nBuckets.toLong,
      carried)
  }

  /** Top-k documents per query over in-memory postings. `queries` is
    * (qidCol, qtextCol); query text tokenizes exactly like documents.
    * Only documents sharing ≥1 term with the query are candidates (a
    * no-hit query returns no rows — an explicit semantic, not a
    * bug). `docCount` is a one-row (n_docs) broadcast frame, never a
    * driver value, so the plan is collect-free end to end. */
  def searchTopK(post: DataFrame, docCount: DataFrame,
                 queries: DataFrame, k: Int,
                 idCol: String = "doc_id", qidCol: String = "qid",
                 qtextCol: String = "qtext"): DataFrame = {
    val dfreq = post.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val qterms = queries.select(col(qidCol),
        explode(TextFunctions.tokens(col(qtextCol))).as("token"))
      .distinct()
    val w = qterms.join(dfreq, Seq("token"))
      .crossJoin(broadcast(docCount))
      .select(col(qidCol), col("token"),
        UnigramLm.floorLog2(expr("n_docs div df")).cast("long").as("idf"))
    val scored = post.join(broadcast(w), Seq("token"))
      .groupBy(col(qidCol), col(idCol))
      .agg(sum(col("tf") * col("idf")).as("score"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol))
      .orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("score"), col("rank"))
  }

  /** [[searchTopK]] against docs directly (builds transient postings —
    * the inline form the q106 oracle replays). */
  def searchTopKInline(docs: DataFrame, idCol: String, textCol: String,
                       queries: DataFrame, k: Int,
                       qidCol: String = "qid",
                       qtextCol: String = "qtext"): DataFrame =
    searchTopK(postings(docs, idCol, textCol),
      docs.agg(count(lit(1)).as("n_docs")), queries, k,
      idCol, qidCol, qtextCol)

  /** (token, idCol, pos) — POSITIONAL postings (0-based token index),
    * the phrase-search sibling of [[postings]]. Bigger than the tf
    * form by the duplicate-token factor, still one row per token
    * occurrence — the same cardinality as the token stream. */
  def positionalPostings(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs.select(col(idCol),
        posexplode(TextFunctions.tokens(col(textCol)))
          .as(Seq("pos", "token")))
      .select(col("token"), col(idCol), col("pos").cast("long").as("pos"))

  /** Exact phrase occurrences per (query, document) — the
    * decontamination primitive ("which documents carry this benchmark
    * phrase VERBATIM"). A phrase p_0..p_{m-1} matches at start s iff
    * token p_i sits at position s+i for every i; equivalently every
    * matched (token, off) pair votes for start = pos − off, and a
    * start with exactly m votes is a match (repeated phrase tokens
    * cannot double-vote a start: pos = s + off pins one row per off).
    * That reformulation is the whole algorithm — one token-key join
    * against the broadcast (qid, token, off) frame, one (qid, doc,
    * start) count — so the plan has a single aggregate exchange
    * bounded by the matched postings, no m-way self-join, no per-doc
    * string scan; and the oracle replays it as the same GROUP BY …
    * HAVING. Output: (qidCol, idCol, n_occurrences, first_pos), only
    * documents containing the phrase at least once. */
  def phraseSearch(positional: DataFrame, queries: DataFrame,
                   idCol: String = "doc_id", qidCol: String = "qid",
                   qtextCol: String = "qtext"): DataFrame =
    phraseOccurrences(positional, queries, idCol, qidCol, qtextCol)
      .groupBy(col(qidCol), col(idCol))
      .agg(count(lit(1)).as("n_occurrences"),
        min(col("start")).as("first_pos"))

  /** Every verbatim occurrence as its own row — (qidCol, idCol,
    * start, m). OVERLAPPING occurrences all count ("a a" occurs at
    * starts 0 AND 1 in "a a a"); consumers that must not double-use
    * positions (the scrub) dedup the position union, not the
    * occurrence list. */
  def phraseOccurrences(positional: DataFrame, queries: DataFrame,
                        idCol: String = "doc_id", qidCol: String = "qid",
                        qtextCol: String = "qtext"): DataFrame = {
    val qt = queries.select(col(qidCol),
      posexplode(TextFunctions.tokens(col(qtextCol)))
        .as(Seq("off", "token")))
    val qlen = qt.groupBy(col(qidCol)).agg(count(lit(1)).as("m"))
    val votes = positional.join(broadcast(qt), Seq("token"))
      .select(col(qidCol), col(idCol),
        (col("pos") - col("off")).as("start"))
    votes.groupBy(col(qidCol), col(idCol), col("start"))
      .agg(count(lit(1)).as("votes"))
      .join(broadcast(qlen), Seq(qidCol))
      .filter(col("votes") === col("m") && col("start") >= 0)
      .select(col(qidCol), col(idCol), col("start"), col("m"))
  }

  /** [[phraseSearch]] straight off documents (transient positional
    * postings — the q110 oracle's form). */
  def phraseSearchInline(docs: DataFrame, idCol: String, textCol: String,
                         queries: DataFrame, qidCol: String = "qid",
                         qtextCol: String = "qtext"): DataFrame =
    phraseSearch(positionalPostings(docs, idCol, textCol), queries,
      idCol, qidCol, qtextCol)

  /** The decontamination GATE built on [[phraseSearch]]: every
    * document scored by how many of the benchmark phrases it carries
    * verbatim, kept iff it carries none (the n-gram-overlap
    * decontamination rule of GPT-3 appendix C / PaLM — here with
    * exact positional matching, not just shingle overlap). Output is
    * the TOTAL frame (idCol, n_hit_phrases, kept) — funnel
    * accounting needs the zero rows, so the hit aggregate left-joins
    * back to the corpus rather than the corpus filtering through it.
    * Scale: [[phraseSearch]]'s cost (the phrase terms' posting mass)
    * plus one doc-keyed left join of a hits frame bounded by the
    * matching docs. */
  def phraseDecontaminate(docs: DataFrame, idCol: String, textCol: String,
                          phrases: DataFrame, qidCol: String = "qid",
                          qtextCol: String = "qtext"): DataFrame = {
    val hits = phraseSearch(positionalPostings(docs, idCol, textCol),
        phrases, idCol, qidCol, qtextCol)
      .groupBy(col(idCol))
      .agg(countDistinct(col(qidCol)).as("n_hit_phrases"))
    docs.select(col(idCol)).join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hit_phrases"), lit(0L)).as("n_hit_phrases"))
      .withColumn("kept",
        when(col("n_hit_phrases") === 0L, lit(1)).otherwise(lit(0)))
  }

  /** The SURGICAL decontamination variant: instead of dropping a
    * document that carries a benchmark phrase ([[phraseDecontaminate]]),
    * remove exactly the verbatim occurrences and keep the rest — the
    * span-scrub discipline of [[CrossDoc]] applied to literal phrase
    * hits. Every matched occurrence contributes its token positions
    * (overlapping matches union — a run of "a a a" under phrase
    * "a a" scrubs whole); the survivor text is the remaining tokens
    * space-rejoined in position order (whitespace-normalized output,
    * the [[TextFunctions.fingerprint]] convention). Output the TOTAL
    * frame (idCol, text_clean, n_removed) — funnel accounting again.
    * Scale: [[phraseOccurrences]]'s posting-mass cost, a position
    * anti-join, and ONE per-doc reassembly aggregate (the same
    * collect-sort shape as [[CrossDoc.removeSharedLines]] — bounded
    * by document length, the row the pipeline already holds). */
  def phraseScrub(docs: DataFrame, idCol: String, textCol: String,
                  phrases: DataFrame, qidCol: String = "qid",
                  qtextCol: String = "qtext"): DataFrame = {
    val positional = positionalPostings(docs, idCol, textCol)
    val occ = phraseOccurrences(positional, phrases, idCol, qidCol,
      qtextCol)
    val drops = occ.select(col(idCol),
        explode(sequence(col("start"), col("start") + col("m") - 1))
          .as("pos"))
      .distinct()
    val kept = positional.join(drops, Seq(idCol, "pos"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("token")))),
          x => x.getField("token")), " ").as("text_clean"),
        count(lit(1)).as("n_kept"))
    docs.select(col(idCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_toks"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        (col("n_toks") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"))
  }

  /** Retrieval-quality evaluation of a ranked result against a
    * relevance set — the offline eval loop (MRR / hit-count /
    * recall@k) every retrieval change ships behind. `ranked` is a
    * (qidCol, idCol, rank) frame; `relevant` the ground-truth
    * (qidCol, idCol) pairs, which DEFINE the query set (a query with
    * no ranked rows scores zero, it doesn't vanish). rr is the
    * reciprocal of the first relevant rank (0.0 on a miss) and
    * recall@k the hit fraction — each one IEEE division of exact
    * integers. Scale: both inputs are top-k/ground-truth bounded, so
    * everything is query-workload-sized. */
  def rankEval(ranked: DataFrame, relevant: DataFrame, k: Int,
               idCol: String = "doc_id",
               qidCol: String = "qid"): DataFrame = {
    val rel = relevant.select(col(qidCol), col(idCol), lit(1).as("is_rel"))
    val nRel = rel.groupBy(col(qidCol))
      .agg(count(lit(1)).as("n_relevant"))
    val per = ranked.filter(col("rank") <= k)
      .join(rel, Seq(qidCol, idCol), "left")
      .groupBy(col(qidCol))
      .agg(min(when(col("is_rel") === 1, col("rank")))
          .as("first_rel_rank"),
        sum(when(col("is_rel") === 1, 1L).otherwise(0L)).as("n_hits"))
    nRel.join(per, Seq(qidCol), "left")
      .select(col(qidCol), col("n_relevant"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(col("first_rel_rank").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("first_rel_rank")).as("rr"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_relevant").cast("double")).as("recall_at_k"))
  }

  /** Reciprocal-rank-fusion of two ranked retrieval legs (Cormack et
    * al. 2009) — the HYBRID-search combiner: a sparse (BM25) and a
    * dense (embedding) ranking fuse into one list without score
    * calibration, because RRF consumes only RANKS:
    *
    *   rrf(d) = Σ_legs 1 / (k0 + rank_leg(d)),  absent leg → 0
    *
    * over the UNION of both top-k lists. Each term is one IEEE
    * division of exact integers and the sum is two doubles in fixed
    * (kw, dense) order, so the fused ranking hash-replays cross-
    * engine (the repo-wide determinism discipline); ties break by
    * document id. Inputs are the (qidCol, idCol, rank) frames the
    * retrieval operators already emit. Output: (qidCol, idCol,
    * r_kw, r_dense — 0 where absent — rrf, rank), top-k per query.
    * Scale: both legs are top-k-bounded (|queries|·k rows), so the
    * fusion join, window, and output are all query-workload-sized —
    * nothing corpus-scale happens here. */
  def hybridRrf(kwRanked: DataFrame, denseRanked: DataFrame, k: Int,
                k0: Int = 60, idCol: String = "doc_id",
                qidCol: String = "qid"): DataFrame = {
    def leg(df: DataFrame, as: String): DataFrame =
      df.select(col(qidCol), col(idCol), col("rank").cast("long").as(as))
    val fused = leg(kwRanked, "r_kw")
      .join(leg(denseRanked, "r_dense"), Seq(qidCol, idCol), "full_outer")
      .select(col(qidCol), col(idCol),
        coalesce(col("r_kw"), lit(0L)).as("r_kw"),
        coalesce(col("r_dense"), lit(0L)).as("r_dense"))
      .withColumn("rrf",
        when(col("r_kw") === 0L, lit(0.0))
          .otherwise(lit(1.0) / (lit(k0.toLong) + col("r_kw"))) +
        when(col("r_dense") === 0L, lit(0.0))
          .otherwise(lit(1.0) / (lit(k0.toLong) + col("r_dense"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol))
      .orderBy(col("rrf").desc, col(idCol).asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** The persisted index as a STREAMING SINK: each micro-batch of
    * documents lands in the index, so retrieval state stays current
    * as a corpus ingests. Crash posture is IDEMPOTENT REPLAY, closed
    * at both seams:
    *
    *   - the last applied batch id rides IN the one-row `_meta`
    *     overwrite (the final write of every batch), so "n_docs
    *     advanced" and "batch committed" are one atomic file swap —
    *     a fully replayed batch (at-least-once `foreachBatch`) is
    *     skipped outright;
    *   - a sink-fed index is partitioned by (bucket, EPOCH = batch
    *     id) and each batch lands via dynamic partition REPLACE, so
    *     a crash between the postings write and the meta commit
    *     replays the batch into ITS OWN partitions — overwriting the
    *     half-landed files, never double-appending. df (a row count
    *     per token) and n_docs both converge to the truth; nothing
    *     drifts until a rebuild (RetrievalSpec kills a batch at each
    *     write boundary and pins convergence).
    *
    * Requires a catalog with real partition-replace semantics —
    * checked at setup, because a backend that throws mid-batch after
    * some writes landed is exactly the torn state the design exists
    * to prevent. Attaching a sink to a pre-existing BATCH-BUILT index
    * (no epoch layout) falls back to plain appends for compatibility;
    * that legacy mode keeps the n_docs fence but reverts to the
    * weaker "df doubles until rebuild" posture — rebuild into a fresh
    * sink-owned prefix to get the closed seam. */
  def indexSink(stream: DataFrame, idCol: String, textCol: String,
                catalog: TableCatalog, prefix: String,
                checkpoint: String, nBuckets: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(catalog.supportsPartitionReplace,
      s"indexSink needs partition-replace semantics for idempotent " +
        s"batch replay; ${catalog.getClass.getName} does not provide it")
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applySinkBatch(batch, batchId, idCol, textCol, catalog,
          prefix, nBuckets)
      }
      .start()
  }

  /** One sink micro-batch, replay-idempotent (see [[indexSink]]).
    * `onStage` fires immediately before each state write — the
    * kill-injection seam the crash tests drive, the
    * [[graft.streaming.IngestLoop]] discipline. */
  private[graft] def applySinkBatch(batch: DataFrame, batchId: Long,
      idCol: String, textCol: String, catalog: TableCatalog,
      prefix: String, nBuckets: Int,
      onStage: String => Unit = _ => ()): Unit = {
    val s = batch.sparkSession
    val metaExists = catalog.exists(s, s"${prefix}_meta")
    val meta = if (metaExists)
      Some(catalog.read(s, s"${prefix}_meta").head()) else None
    val committed = meta match {
      case Some(m) if m.schema.fieldNames.contains("batch_id") =>
        m.getAs[Long]("batch_id")
      case Some(_) => -1L // pre-existing batch-unaware index: append once
      case None => -1L
    }
    if (batchId > committed && !batch.isEmpty) {
      val legacyAttach = metaExists && !catalog.read(s,
        s"${prefix}_postings").columns.contains("epoch")
      if (legacyAttach) {
        // batch-built index without the epoch layout: plain append
        // (the documented weaker posture — replay of a torn batch
        // doubles the batch's postings rows until a rebuild)
        appendToIndex(batch, idCol, textCol, catalog, prefix,
          commitBatchId = Some(batchId))
      } else {
        val (nPrev, nb) = meta match {
          case Some(m) =>
            (m.getAs[Long]("n_docs"), m.getAs[Long]("n_buckets").toInt)
          case None => (0L, nBuckets)
        }
        onStage("postings")
        catalog.replacePartitions(
          postings(batch, idCol, textCol)
            .withColumn("bucket", bucketOf(col("token"), nb))
            .withColumn("epoch", lit(batchId)),
          s"${prefix}_postings", partitionBy = Seq("bucket", "epoch"))
        onStage("positions")
        catalog.replacePartitions(
          positionalPostings(batch, idCol, textCol)
            .withColumn("bucket", bucketOf(col("token"), nb))
            .withColumn("epoch", lit(batchId)),
          s"${prefix}_positions", partitionBy = Seq("bucket", "epoch"))
        onStage("meta")
        writeMeta(s, catalog, prefix, nPrev + batch.count(),
          nb.toLong, Some(batchId))
      }
    }
  }

  /** [[searchTopK]] over a persisted index, scanning ONLY the buckets
    * the query terms hash into: one tiny action over the literal
    * query workload (|terms| rows — not the corpus) yields the bucket
    * IN-list, which lands in the partitioned parquet scan as a STATIC
    * partition filter, so file pruning bounds index IO by |query
    * terms| buckets regardless of index size. df stays GLOBAL per
    * token — a token's postings all live in its own bucket, so the
    * pruned scan still sees every row of each token it scores. */
  def searchTopKFromCatalog(spark: SparkSession, catalog: TableCatalog,
                            prefix: String, queries: DataFrame, k: Int,
                            idCol: String = "doc_id",
                            qidCol: String = "qid",
                            qtextCol: String = "qtext"): DataFrame = {
    val meta = catalog.read(spark, s"${prefix}_meta")
    val post = prunedToQueryBuckets(spark, catalog, prefix, "postings",
      queries, qtextCol, meta)
    searchTopK(post, meta.select(col("n_docs")), queries, k,
      idCol, qidCol, qtextCol)
  }

  /** [[phraseSearch]] over the persisted POSITIONAL postings with the
    * same static bucket pruning — phrase lookups against a 100 TB
    * index read only the phrase terms' buckets. */
  def phraseSearchFromCatalog(spark: SparkSession, catalog: TableCatalog,
                              prefix: String, queries: DataFrame,
                              idCol: String = "doc_id",
                              qidCol: String = "qid",
                              qtextCol: String = "qtext"): DataFrame = {
    val meta = catalog.read(spark, s"${prefix}_meta")
    val positional = prunedToQueryBuckets(spark, catalog, prefix,
      "positions", queries, qtextCol, meta)
    phraseSearch(positional, queries, idCol, qidCol, qtextCol)
  }

  /** Static bucket pruning from the (small, literal) query workload:
    * one local action over the tiny query frame — never the corpus —
    * yields a partition-value IN-list the parquet scan prunes files
    * by. */
  private def prunedToQueryBuckets(spark: SparkSession,
                                   catalog: TableCatalog, prefix: String,
                                   table: String, queries: DataFrame,
                                   qtextCol: String,
                                   meta: DataFrame): DataFrame = {
    val nBuckets = meta.head().getAs[Long]("n_buckets").toInt
    val buckets = queries
      .select(explode(TextFunctions.tokens(col(qtextCol))).as("token"))
      .distinct()
      .select(pmod(xxhash64(col("token")), lit(nBuckets.toLong))
        .cast("int").as("bucket"))
      .distinct().collect().map(_.getInt(0)).toSeq
    catalog.read(spark, s"${prefix}_$table")
      .filter(col("bucket").isin(buckets: _*))
      .drop("bucket")
  }
}
