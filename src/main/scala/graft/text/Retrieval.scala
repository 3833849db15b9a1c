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
                 nBuckets: Int = 64): Unit = {
    val post = postings(docs, idCol, textCol)
      .withColumn("bucket", bucketOf(col("token"), nBuckets))
    catalog.overwrite(post, s"${prefix}_postings", partitionBy = Seq("bucket"))
    val spark = docs.sparkSession
    import spark.implicits._
    catalog.overwrite(
      Seq((docs.count(), nBuckets.toLong)).toDF("n_docs", "n_buckets"),
      s"${prefix}_meta")
  }

  /** Append new documents to a persisted index: delta postings land
    * in their token buckets, n_docs advances. Sound because postings
    * rows are per-(token, doc) — new docs only ADD rows (the caller
    * guarantees id disjointness, the same contract as every appendable
    * index here). idf weights shift with N and df as they must; they
    * are derived at search time, never frozen into the index. */
  def appendToIndex(delta: DataFrame, idCol: String, textCol: String,
                    catalog: TableCatalog, prefix: String): Unit = {
    val spark = delta.sparkSession
    import spark.implicits._
    val meta = catalog.read(spark, s"${prefix}_meta").head()
    val nBuckets = meta.getAs[Long]("n_buckets").toInt
    catalog.append(
      postings(delta, idCol, textCol)
        .withColumn("bucket", bucketOf(col("token"), nBuckets)),
      s"${prefix}_postings", partitionBy = Seq("bucket"))
    catalog.overwrite(
      Seq((meta.getAs[Long]("n_docs") + delta.count(), nBuckets.toLong))
        .toDF("n_docs", "n_buckets"),
      s"${prefix}_meta")
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
    val post0 = catalog.read(spark, s"${prefix}_postings")
    // static bucket pruning from the (small, literal) query workload:
    // one local action over the tiny query frame, never the corpus
    val nBuckets = meta.head().getAs[Long]("n_buckets").toInt
    val terms = queries
      .select(explode(TextFunctions.tokens(col(qtextCol))).as("token"))
      .distinct()
    val buckets = terms
      .select(pmod(xxhash64(col("token")), lit(nBuckets.toLong))
        .cast("int").as("bucket"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val post = post0.filter(col("bucket").isin(buckets: _*))
    searchTopK(post.drop("bucket"),
      meta.select(col("n_docs")), queries, k, idCol, qidCol, qtextCol)
  }
}
