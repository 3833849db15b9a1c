package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format sources beyond parquet (reference S5: the taxi-zone CSV
  * with header + quoted fields, raw.py:85-87 / create_datamart.sql:
  * 142-147). Explicit schema preferred — schema inference is a full
  * extra pass over the data, unacceptable at scale. */
object Sources {
  /** Header+quoted CSV (the reference's zone-lookup shape). */
  def readCsv(spark: SparkSession, path: String,
              schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true")
      .option("quote", "\"").option("escape", "\"").csv(path)

  /** JSON-lines source (events `props` style payloads). */
  def readJson(spark: SparkSession, path: String,
               schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** JSON-lines sink — the interchange format LLM data pipelines live
    * on (one document object per line, splittable, appendable). JSONL
    * drops null fields by default on write; reading back with the
    * writer's schema restores them as nulls, so a write→read
    * round-trip is lossless for JSON-representable types (the q72
    * oracle hash-verifies this on the documents table). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
