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

  /** LSH-bucketed ANN: candidates limited to equal sign-bit buckets. */
  def lshTopK(emb: DataFrame, queries: DataFrame, k: Int, nPlanes: Int = 12,
              dim: Int = 64, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val planes = Vectors.seededPlanes(nPlanes, dim)
    val corpus = prep(emb, idCol, vecCol)
      .withColumn("bucket", Vectors.hyperplaneBucket(col("v"), planes))
    val q = prep(queries, idCol, vecCol)
      .withColumn("bucket", Vectors.hyperplaneBucket(col("v"), planes))
      .select(col("id").as("qid"), col("v").as("qv"), col("bucket"))
    val scored = corpus.join(broadcast(q), Seq("bucket"))
      .filter(col("id") =!= col("qid"))
      .withColumn("sim", Vectors.cosine(col("qv"), col("v")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as(idCol), col("sim"), col("rank"))
  }
}
