package graft

import org.apache.spark.sql.functions._
import graft.ops.ZOrder

/** ops.ZOrder: the Morton interleave, the physical layout's locality,
  * and the box-pruning report's exactness. */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference interleave, written the obvious way. */
  private def zRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zValue matches the reference interleave over the full 8-bit grid edge + random interior") {
    val pts = (for (x <- 0L to 255L by 17; y <- 0L to 255L by 13)
      yield (x, y)) ++ Seq((0L, 0L), (255L, 255L), (0L, 255L), (255L, 0L))
    val df = pts.toDF("x", "y")
      .withColumn("z", ZOrder.zValue(col("x"), col("y"), 8))
    df.collect().foreach { r =>
      assert(r.getLong(2) == zRef(r.getLong(0), r.getLong(1), 8),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("zValueSql is the same function (DuckDB-shaped SQL, evaluated by Spark)") {
    val pts = Seq((3L, 200L), (77L, 12L), (255L, 1L)).toDF("x", "y")
    val viaSql = pts.withColumn("z",
      expr(ZOrder.zValueSql("x", "y", 8)))
    viaSql.collect().foreach { r =>
      assert(r.getLong(2) == zRef(r.getLong(0), r.getLong(1), 8))
    }
  }

  test("z-order layout bounds BOTH dimensions per file; a single-key sort cannot") {
    // uniform 64x64 grid into 16 files. An x-sort gives each file
    // dx ~= 4 but dy = 64 (the full span — y filters prune nothing);
    // z-order caps both: a file of <= 512 consecutive z values fits
    // inside a 32x16 (or 16x32) tile, so dy <= 32 even when a range
    // boundary straddles two 16x16 quadrants.
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L)
      yield (x, y)).toDF("x", "y")
    def spans(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_zorder_").toString
      df.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
        .withColumn("f", input_file_name())
        .groupBy("f")
        .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
        .select("dx", "dy").as[(Long, Long)].collect().toSeq
    }
    val z = spans(ZOrder.layoutByZ(grid, "x", "y", bits = 6, numFiles = 16))
    val s = spans(
      grid.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    assert(z.size >= 8, s"expected ~16 z files, got ${z.size}")
    // aggregate, not per-file: repartitionByRange samples its
    // boundaries, and a boundary landing just past a z-curve jump
    // (e.g. z = 2048, where the curve hops from (63,31) to (0,32))
    // legitimately gives THAT file a wide box. Most files are tiles.
    def avg(v: Seq[Long]): Double = v.sum.toDouble / v.size
    val zDy = avg(z.map(_._2))
    assert(zDy <= 32.0, s"z layout avg dy $zDy of 64")
    assert(z.count { case (dx, dy) => dx <= 31 && dy <= 31 } * 2 >= z.size,
      s"fewer than half the z files are compact tiles: $z")
    // the x-sorted layout leaves the y dimension unbounded
    assert(s.forall(_._2 >= 48),
      s"x-sort should leave dy ~ full span, got ${s.map(_._2)}")
    assert(zDy < avg(s.map(_._2)) / 1.5)
  }

  test("boxSkipReport's touched flag is exactly the brute-force overlap test") {
    val pts = (for (x <- 0L until 256L by 3; y <- 0L until 256L by 5)
      yield (x, y)).toDF("x", "y")
    val stats = ZOrder.bucketStats(pts, "x", "y", bits = 8, bucketShift = 10)
    val report = ZOrder.boxSkipReport(stats, 40, 80, 100, 140).collect()
    assert(report.nonEmpty)
    report.foreach { r =>
      val expected = r.getAs[Long]("max_x") >= 40 &&
        r.getAs[Long]("min_x") <= 80 &&
        r.getAs[Long]("max_y") >= 100 && r.getAs[Long]("min_y") <= 140
      assert(r.getAs[Boolean]("touched") == expected)
    }
    // pruning must actually happen AND never lose a row: rows inside
    // the box live only in touched buckets
    val touchedRows = report.filter(_.getAs[Boolean]("touched"))
      .map(_.getAs[Long]("n_rows")).sum
    val inBox = pts.where(col("x").between(40, 80) &&
      col("y").between(100, 140)).count()
    assert(report.exists(!_.getAs[Boolean]("touched")), "nothing pruned")
    assert(touchedRows >= inBox)
  }

  test("zValue enforces the [0, 2^bits) domain: overflow and negatives raise, boundaries pass") {
    // out-of-range or negative dimensions would interleave to
    // meaningless z-values and silently lying skip reports — the
    // guard raises with the offending pair instead
    def z(x: Long, y: Long) = Seq((x, y)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), bits = 8).as("z"))
      .collect().head.getLong(0)
    assert(z(0L, 0L) == 0L)
    assert(z(255L, 255L) == 65535L) // both boundaries: all 16 bits set
    val over = intercept[Exception](z(256L, 0L))
    assert(over.getMessage.contains("out of [0, 2^8)"), over.getMessage)
    val neg = intercept[Exception](z(0L, -1L))
    assert(neg.getMessage.contains("out of [0, 2^8)"), neg.getMessage)
  }
}
