package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small)
  *    query set against the corpus, one pass, no corpus shuffle except
  *    the per-query top-k. Correctness baseline.
  *  - [[lshTopK]]: random-hyperplane LSH bucketing — corpus and queries
  *    hash to sign-bit buckets; candidates are same-bucket pairs only,
  *    so the scan cost drops from |Q|·|C| to the bucket collision mass.
  *    The scale path for 100 TB corpora: buckets partition the corpus,
  *    the bucket join is an equi-join Catalyst can shuffle-partition,
  *    and recall is tunable via nPlanes / multi-probe.
  */
object Ann {
  /** Corpus frame → (id, v:array<double>) projection. */
  private def prep(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("id"), Vectors.asDouble(col(vecCol)).as("v"))

  /** Exact top-k neighbors for each query row (excluding self-matches).
    * Ties broken by candidate id for determinism. */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val corpus = prep(emb, idCol, vecCol)
    val q = prep(queries, idCol, vecCol)
      .withColumnRenamed("id", "qid").withColumnRenamed("v", "qv")
    val scored = corpus.join(broadcast(q), col("id") =!= col("qid"))
      .withColumn("sim", Vectors.cosine(col("qv"), col("v")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as(idCol), col("sim"), col("rank"))
  }

  /** IVF-style ANN: corpus is partitioned into `nCentroids` inverted
    * lists (nearest-centroid assignment); each query probes only its
    * `nProbe` closest lists. Centroid selection is deterministic (the
    * lowest-id vectors) — at scale you'd swap in sampled k-means
    * centroids, which changes only `centroids`. The scan cost drops
    * from |C| to ≈ |C|·nProbe/nCentroids per query, and the list
    * assignment is a plain equi-join that partitions cleanly. */
  def ivfTopK(emb: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val corpus = prep(emb, idCol, vecCol)
    val centroids = corpus.orderBy(col("id")).limit(nCentroids)
      .select(col("id").as("cid"), col("v").as("cv"))
    def assign(df: DataFrame, outCol: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(col("id"))
        .orderBy(col("csim").desc, col("cid").asc)
      df.crossJoin(broadcast(centroids))
        .withColumn("csim", Vectors.cosine(col("v"), col("cv")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .select(df.columns.map(col) :+ col("cid").as(outCol): _*)
    }
    val lists = assign(corpus, "list_id", 1)
    val probes = assign(prep(queries, idCol, vecCol), "list_id", nProbe)
      .withColumnRenamed("id", "qid").withColumnRenamed("v", "qv")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id").asc)
    lists.join(broadcast(probes), Seq("list_id"))
      .filter(col("id") =!= col("qid"))
      .withColumn("sim", Vectors.cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as(idCol), col("sim"), col("rank"))
  }

  /** LSH-bucketed ANN: candidates limited to matching sign-bit buckets.
    * Multi-probe: each query also probes every bucket at Hamming
    * distance 1 from its own (one flipped hyperplane bit), recovering
    * the neighbors that fell just across a plane — the standard recall
    * fix that beats adding independent hash tables at the same cost.
    * The query side stays tiny (×(nPlanes+1) rows, broadcast); the
    * corpus is scanned once and joined by bucket equi-key. */
  def lshTopK(emb: DataFrame, queries: DataFrame, k: Int, nPlanes: Int = 12,
              dim: Int = 64, multiProbe: Boolean = true,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planes = Vectors.seededPlanes(nPlanes, dim)
    val corpus = prep(emb, idCol, vecCol)
      .withColumn("bucket", Vectors.hyperplaneBucket(col("v"), planes))
    val probeSet =
      if (multiProbe)
        array(col("bucket") +: (0 until nPlanes)
          .map(j => col("bucket").bitwiseXOR(lit(1L << j))): _*)
      else array(col("bucket"))
    val q = prep(queries, idCol, vecCol)
      .withColumn("bucket", Vectors.hyperplaneBucket(col("v"), planes))
      .select(col("id").as("qid"), col("v").as("qv"),
        explode(probeSet).as("bucket"))
    val scored = corpus.join(broadcast(q), Seq("bucket"))
      .filter(col("id") =!= col("qid"))
      .dropDuplicates("qid", "id")
      .withColumn("sim", Vectors.cosine(col("qv"), col("v")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as(idCol), col("sim"), col("rank"))
  }
}
