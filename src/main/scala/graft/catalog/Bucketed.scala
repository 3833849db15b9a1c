package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the PERSISTED side of shuffle avoidance.
  * A broadcast join needs one small side; when BOTH sides are huge
  * (fact ⋈ fact, orders ⋈ customer at 100 TB) every repeated join
  * pays two full shuffles unless the tables are stored pre-hashed on
  * the join key. Writing with `bucketBy(n, key).sortBy(key)` pays that
  * shuffle ONCE at write time; every subsequent equi-join or group-by
  * on the key reads co-located buckets and the plan carries ZERO
  * Exchange on either side (BucketedJoinSpec pins exactly that).
  *
  * This is Spark's native bucketing (hash(key) mod n file groups,
  * recorded in the session catalog), the same contract Hive/Trino
  * read. Bucket count is a layout decision: at 100 TB pick n so one
  * bucket ≈ one task's worth (128-512 MB); joins between tables
  * bucketed with equal n on the same key type need no exchange at
  * all, and AQE handles a mismatched pair by shuffling only the
  * smaller side. */
object Bucketed {
  /** Write `df` as an external bucketed+sorted parquet table at
    * `path`, registered as `name` in the session catalog (bucketing
    * metadata lives in the catalog — a plain parquet reader sees
    * ordinary files; a catalog reader gets the no-shuffle plans). */
  def write(df: DataFrame, name: String, path: String,
            key: String, buckets: Int): Unit =
    // repartition on the SAME hash the bucket spec uses, so each task
    // holds exactly one bucket's rows → one file per bucket. Without
    // this every write task emits a file per bucket it touches
    // (tasks × buckets files) and the per-bucket sort order is lost
    // across files, costing the downstream sort-free merge join.
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(name)

  /** Read a bucketed table back through the catalog (never via
    * `spark.read.parquet(path)` — that path loses the bucket spec and
    * with it the exchange-free plans). */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  def exists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)
}
