package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver testdata star schema (see TESTDATA.md).
  *
  * Mirrors the reference's source layer — parquet scans per table
  * (reference: src/NYC_Open_Data/assets/bronze.py:68) — but as one
  * catalog object so every operator reads through a single seam.
  * Schemas are inferred from parquet footers (reference behavior);
  * explicit StructTypes live in the tests that pin them.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** Events ship with TIMESTAMP(NANOS) — unsupported by Spark's parquet
    * reader. Sessions set `spark.sql.legacy.parquet.nanosAsLong`, and we
    * truncate to micros here (integer DIV — DuckDB also truncates, and a
    * double division would lose precision above 2^53 nanos). */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      // NTZ keeps the wall-clock naive like every other testdata
      // timestamp (and like DuckDB's reading of them).
      case LongType => df.withColumn("ts",
        timestamp_micros(expr("ts DIV 1000")).cast(TimestampNTZType))
      case _        => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
