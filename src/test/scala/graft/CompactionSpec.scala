package graft

import org.apache.spark.sql.functions._
import graft.catalog.ParquetCatalog

/** ParquetCatalog.compact: small-file maintenance for incremental
  * sinks — fewer files, identical data, partition-scoped, idempotent. */
class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def newCatalog() = {
    val root = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    (new ParquetCatalog(root), root)
  }

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(dir))
  }

  test("compaction merges micro-batch files and preserves data exactly") {
    val (cat, root) = newCatalog()
    // 12 appends of 100 rows each → ≥ 12 files (micro-batch shape)
    for (b <- 0 until 12)
      cat.append((0 until 100).map(i => (b * 100L + i, s"v$i")).toDF("id", "v"),
        "t")
    val before = parquetFiles(s"$root/t")
    assert(before.size >= 12)
    val beforeRows = cat.read(spark, "t").collect().map(_.toSeq).toSet
    cat.compact(spark, "t")
    val after = parquetFiles(s"$root/t")
    assert(after.size < before.size && after.nonEmpty)
    assert(cat.read(spark, "t").collect().map(_.toSeq).toSet == beforeRows)
    assert(beforeRows.size == 1200)
    // idempotent: a second run leaves data identical
    cat.compact(spark, "t")
    assert(cat.read(spark, "t").collect().map(_.toSeq).toSet == beforeRows)
  }

  test("partitioned root refuses a flat rewrite; scratch dirs invisible to discovery") {
    val (cat, root) = newCatalog()
    cat.append(Seq((1L, "x", "m1"), (2L, "y", "m2")).toDF("id", "v", "m"),
      "p", partitionBy = Seq("m"))
    intercept[IllegalArgumentException](cat.compact(spark, "p"))
    // a stale _-prefixed scratch dir is ignored by partition discovery
    new java.io.File(s"$root/p/_m=m1__compacting").mkdirs()
    assert(cat.read(spark, "p").count() == 2)
  }

  test("crash recovery: a run that died between renames restores on re-entry") {
    val (cat, root) = newCatalog()
    cat.append((1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "v"), "t")
    val rows = cat.read(spark, "t").collect().map(_.toSeq).toSet
    // simulate the crash window: data moved aside, replacement missing
    val fs = new java.io.File(s"$root/t")
    assert(fs.renameTo(new java.io.File(s"$root/_t__old")))
    cat.compact(spark, "t")
    assert(cat.read(spark, "t").collect().map(_.toSeq).toSet == rows)
    assert(!new java.io.File(s"$root/_t__old").exists())
  }

  test("partition-scoped compaction leaves other partitions untouched") {
    val (cat, root) = newCatalog()
    for (b <- 0 until 6)
      cat.append(Seq((b.toLong, "x", "m1"), (b.toLong, "y", "m2"))
        .toDF("id", "v", "m"), "p", partitionBy = Seq("m"))
    val m2Before = parquetFiles(s"$root/p/m=m2").map(_.getName).toSet
    val allBefore = cat.read(spark, "p").collect().map(_.toSeq).toSet
    cat.compact(spark, "p", partition = Some("m=m1"))
    assert(parquetFiles(s"$root/p/m=m1").size < 6)
    assert(parquetFiles(s"$root/p/m=m2").map(_.getName).toSet == m2Before)
    // partition column is directory-encoded; data (incl. m) survives
    assert(cat.read(spark, "p").collect().map(_.toSeq).toSet == allBefore)
  }
}
