package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Silver-layer cleanse operators.
  *
  * Re-expresses the reference's silver asset semantics
  * (reference: src/NYC_Open_Data/assets/silver.py:67-86,125-140) as
  * composable `DataFrame => DataFrame` functions: projection, full-row
  * dedup, timestamp parsing, renames, null handling, casts, derived
  * columns. All are narrow (no shuffle) except `dedup`, which is a
  * hash-aggregate over all columns — at 100 TB that shuffle is keyed on
  * every column, so prefer `dedupByKey` on a business key when one
  * exists.
  */
object Cleanse {
  /** P1: explicit column projection (prunes the parquet scan). */
  def project(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)

  /** A4: full-row distinct (reference: silver.py:71,129). */
  def dedup(df: DataFrame): DataFrame = df.dropDuplicates()

  /** A4 variant: first-row-wins dedup on a business key — shuffles on
    * the key only, the scalable form of full-row distinct. */
  def dedupByKey(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** A4 variant: full-row distinct keyed on a 128-bit row fingerprint
    * (two independently-salted xxhash64s) instead of every column.
    * Same result as [[dedup]] — identical rows hash identically, and a
    * cross-row collision needs both 64-bit hashes to collide
    * (p ≈ n²/2¹²⁹ ≈ 10⁻²⁰ at 10¹⁸ rows) — but the exchange and
    * hash-aggregate compare a 16-byte key instead of sorting/hashing
    * the full row width per comparison. At 100 TB with wide rows this
    * is the difference between a narrow-key shuffle and a shuffle whose
    * KEY is the entire dataset. See docs/SCALE.md §Fact build.
    *
    * Each column hashes as (is-null indicator, value): xxhash64 SKIPS
    * null children (a null leaves the accumulator untouched), so
    * hashing bare values would collide distinct rows that differ only
    * in which column holds the null — ('a', null) vs (null, 'a'), or
    * (null, 'a') vs ('a', 'a'). The indicator re-injects the null's
    * position into the hash. */
  def dedupByFingerprint(df: DataFrame): DataFrame = {
    val cols = df.columns.flatMap(c => Seq(col(c).isNull.cast("int"), col(c)))
    df.withColumn("__fp1", xxhash64(cols: _*))
      .withColumn("__fp2", xxhash64(lit("graft-fp2-salt") +: cols: _*))
      .dropDuplicates("__fp1", "__fp2")
      .drop("__fp1", "__fp2")
  }

  /** F1: parse string timestamps (reference: silver.py:72-73). */
  def parseTimestamps(df: DataFrame, cols: Seq[String], fmt: String): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, to_timestamp(col(c), fmt)))

  /** P3: bulk rename (reference: silver.py:75-76,132-133). */
  def rename(df: DataFrame, mapping: Map[String, String]): DataFrame =
    mapping.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

  /** F8: drop rows with nulls in required columns (reference: silver.py:77). */
  def requireNonNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.drop(cols)

  /** F7: fill numeric nulls (reference: silver.py:86, gold.py:328). */
  def fillNumeric(df: DataFrame, value: Double): DataFrame = df.na.fill(value)

  /** F7: fill string nulls per column (reference: gold.py:101,160,218). */
  def fillStrings(df: DataFrame, defaults: Map[String, String]): DataFrame =
    df.na.fill(defaults)

  /** P8: bulk cast (reference: silver.py:80-82,135-137). */
  def castCols(df: DataFrame, types: Map[String, DataType]): DataFrame =
    types.foldLeft(df) { case (d, (c, t)) => d.withColumn(c, col(c).cast(t)) }

  /** P7/P9: derived columns (reference: silver.py:78-85). */
  def derive(df: DataFrame, cols: (String, Column)*): DataFrame =
    cols.foldLeft(df) { case (d, (name, expr)) => d.withColumn(name, expr) }

  /** U2 fixed: schema-aligned union (reference defect R1 — gold.py:273
    * unions by position and throws on arity mismatch; we union by name). */
  def unionConformed(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_))

  /** F6: duration in SECONDS between two timestamp columns (reference
    * defect R2 — silver.py:85 produces seconds, platinum divides by
    * 1000*60; we document seconds and divide by 60 downstream). */
  def durationSeconds(start: Column, end: Column): Column =
    unix_timestamp(end) - unix_timestamp(start)
}
