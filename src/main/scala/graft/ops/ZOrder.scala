package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — the multi-dimensional clustering that
  * makes file-level min/max statistics prune BOX predicates, not just
  * one sort key. Sorting a 100 TB table by `user_id` alone makes time
  * filters scan everything; interleaving the bits of both dimensions
  * gives every file a small bounding box in (user, day) space, so a
  * `user BETWEEN a AND b AND day BETWEEN c AND d` scan skips every
  * file whose box misses the query box. This is the layout trick
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`, built here from plain
  * integer arithmetic so the z-value is engine-neutral (the oracle
  * replays it term by term in SQL) and codegen-friendly (shifts, ands,
  * adds — one WholeStageCodegen span, zero shuffle to compute).
  *
  * At cluster scale the layout pass is `repartitionByRange(z)` — one
  * range shuffle, the same cost as any sorted write — and the payoff
  * is permanent: every later box scan reads only the overlapping
  * z-range of files. The [[bucketStats]]/[[boxSkipReport]] pair is the
  * measurable form of that claim: it computes, per z-bucket, the
  * bounding box a parquet footer would carry, and for a concrete box
  * query the exact fraction of buckets a reader must touch.
  */
object ZOrder {
  /** Bit-interleaved z-value of two dimensions in `[0, 2^bits)`: bit
    * i of x lands at 2i, bit i of y at 2i+1. Disjoint bit positions
    * make the combination a plain SUM, which is exactly how the SQL
    * twin spells it.
    *
    * The domain is ENFORCED: a value with bits above `bits` (or a
    * negative, whose sign extension survives any shift) would
    * silently interleave to a meaningless z — files laid out by
    * garbage keys and a [[boxSkipReport]] whose boxes lie. One
    * guard CASE per row (`raise_error`), added as a +0 term so the
    * interleave itself stays a flat shift/and/add sum; the layout
    * write is where corrupt keys do permanent damage, so the check
    * belongs in the plan, not a comment. Callers with wider values
    * must scale/offset them into the domain first. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val guard = when(
      shiftright(x.cast("long"), bits) =!= 0 ||
        shiftright(y.cast("long"), bits) =!= 0,
      raise_error(concat(
        lit(s"zValue: input out of [0, 2^$bits): ("),
        x.cast("string"), lit(", "), y.cast("string"), lit(")")))
        .cast("long"))
      .otherwise(lit(0L))
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _) + guard
  }

  /** The same z-value as ANSI SQL text (the oracle twin — one source
    * of truth for the term expansion, so Spark and SQL cannot drift).
    * The masked bit is pinned to BIGINT before shifting: a bare `& 1`
    * over an INTEGER column keeps 32-bit arithmetic, and a shift past
    * bit 31 would wrap or error where [[zValue]]'s `lit(1L)` widens.
    * Domain `[0, 2^bits)` as for [[zValue]]; the SQL twin ASSUMES
    * in-domain input (the Scala side raises at write time, so
    * anything the oracle replays already passed the guard). */
  def zValueSql(x: String, y: String, bits: Int): String = {
    val one = "CAST(1 AS BIGINT)"
    (0 until bits).map { i =>
      s"((($x >> $i) & $one) << ${2 * i}) + " +
        s"((($y >> $i) & $one) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
  }

  /** Physically lay `df` out in z-order: one range shuffle on the
    * z-value, sorted within partitions, so each output file covers a
    * contiguous z-range (= a small bounding box in (x, y) space).
    * `numFiles` maps 1:1 to output files on write. */
  def layoutByZ(df: DataFrame, xCol: String, yCol: String, bits: Int,
                numFiles: Int): DataFrame =
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** Per-z-bucket statistics — the footer a z-laid-out file would
    * carry: row count plus the min/max of BOTH dimensions. Bucket =
    * z >> bucketShift, so one bucket stands in for one file of
    * 2^bucketShift consecutive z-values. One group-by, no joins. */
  def bucketStats(df: DataFrame, xCol: String, yCol: String, bits: Int,
                  bucketShift: Int): DataFrame =
    df.select(col(xCol).as("x"), col(yCol).as("y"))
      .withColumn("bucket",
        shiftright(zValue(col("x"), col("y"), bits), bucketShift))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))

  /** The skip report for a box query over [[bucketStats]] output: a
    * bucket is `touched` iff its bounding box intersects the query box
    * — the exact test a min/max-pruning reader runs per file. The
    * emitted rows ARE the pruning decision table; `touched = false`
    * rows are bytes a 100 TB scan never reads. */
  def boxSkipReport(stats: DataFrame, x0: Long, x1: Long,
                    y0: Long, y1: Long): DataFrame =
    stats.withColumn("touched",
      col("max_x") >= x0 && col("min_x") <= x1 &&
        col("max_y") >= y0 && col("min_y") <= y1)
}
