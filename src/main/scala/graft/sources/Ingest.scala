package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1 — the reference's raw ingest (raw.py:18-25 yellow, 51-58 green,
  * 77-84 zone CSV: single-node `requests.get` from the TLC CDN to
  * local disk), re-expressed as a DISTRIBUTED fetch: the url list
  * parallelizes across executors, each partition pulls its urls
  * through the pluggable [[Fetcher]], and payloads land as a parquet
  * manifest of binary columns (url, payload, sha256, n_bytes) — the
  * same landing-zone shape the multimodal operators
  * ([[graft.mm.Multimodal]]) consume.
  *
  * The HTTP client itself is the environment-forced stub (this
  * container has zero egress): production supplies a `Fetcher` backed
  * by any http library; tests use the deterministic [[Ingest.Echo]].
  * The seam is the stub — the Spark plumbing (partitioning, binary
  * schema, checksum, idempotent batch column) is real and tested
  * (IngestSpec).
  */
trait Fetcher extends Serializable {
  def fetch(url: String): Array[Byte]
}

object Ingest {
  /** Deterministic offline fake: payload = the url's UTF-8 bytes. */
  object Echo extends Fetcher {
    override def fetch(url: String): Array[Byte] = url.getBytes("UTF-8")
  }

  /** The zero-egress boundary, marked honestly (SURVEY §2 S1). */
  object Http extends Fetcher {
    override def fetch(url: String): Array[Byte] =
      throw new UnsupportedOperationException(
        "HTTP egress is unavailable in this environment — supply a " +
          "Fetcher backed by your http client (reference: raw.py:18-25)")
  }

  /** Fetch `urls` into a (url, payload, sha256, n_bytes, batch_id)
    * manifest frame. One url per task up to `maxParallel` partitions —
    * fetches are IO-bound, so parallelism is the url count, not the
    * core count; a straggling CDN response stalls one task, not the
    * stage. Write the result via a partitioned catalog keyed on
    * batch_id for idempotent monthly re-ingest (the reference re-runs
    * months the same way, raw.py's month_year partitioning). */
  def land(spark: SparkSession, urls: Seq[String], fetcher: Fetcher,
           batchId: String, maxParallel: Int = 64): DataFrame = {
    import spark.implicits._
    val parts = math.max(1, math.min(urls.size, maxParallel))
    spark.createDataset(urls).repartition(parts)
      .mapPartitions(_.map(u => (u, fetcher.fetch(u))))
      .toDF("url", "payload")
      .select(col("url"), col("payload"),
        sha2(col("payload"), 256).as("sha256"),
        length(col("payload")).cast("int").as("n_bytes"),
        lit(batchId).as("batch_id"))
  }
}
