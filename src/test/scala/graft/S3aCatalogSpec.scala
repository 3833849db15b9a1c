package graft

import org.apache.spark.sql.functions._
import graft.catalog.ParquetCatalog

/** S4 — the object-store parquet sink exercised through an `s3a://`
  * root. The real S3AFileSystem binding is environment-bound (no
  * hadoop-aws jar ships in this container and there is zero egress),
  * so the scheme is served by [[S3aMockFileSystem]], a local-disk
  * FileSystem registered at `fs.s3a.impl`: every catalog operation
  * still goes through s3a URI parsing, Hadoop FileSystem resolution,
  * qualified-path handling, and the parquet committer against a
  * non-`file:` scheme — the full code path a real object store sees,
  * minus the wire protocol. Swapping in the real thing is
  * configuration (`fs.s3a.impl` + credentials), not code.
  */
class S3aCatalogSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val root: String = {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.s3a.impl", classOf[S3aMockFileSystem].getName)
    // one FS instance per (scheme, authority, conf) is cached; disable
    // so a prior suite's conf can never pin a stale implementation
    spark.sparkContext.hadoopConfiguration.set("fs.s3a.impl.disable.cache", "true")
    val local = java.nio.file.Files.createTempDirectory("graft-s3a").toString
    s"s3a://test-bucket$local"
  }
  private lazy val cat = new ParquetCatalog(root)

  test("overwrite/read round-trip through the s3a scheme") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    cat.overwrite(df, "t1")
    assert(cat.exists(spark, "t1"))
    assert(!cat.exists(spark, "nope"))
    val back = cat.read(spark, "t1").orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("append accumulates; partitioned replacePartitions is surgical") {
    val d1 = Seq((1L, "2024-01", "x")).toDF("id", "month", "v")
    val d2 = Seq((2L, "2024-02", "y")).toDF("id", "month", "v")
    cat.overwrite(d1, "t2", partitionBy = Seq("month"))
    cat.append(d2, "t2", partitionBy = Seq("month"))
    assert(cat.read(spark, "t2").count() == 2)
    // replace only 2024-01; 2024-02 must survive
    cat.replacePartitions(
      Seq((9L, "2024-01", "z")).toDF("id", "month", "v"),
      "t2", partitionBy = Seq("month"))
    val rows = cat.read(spark, "t2").orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 9L))
    assert(rows.find(_.getLong(0) == 9L).get.getAs[String]("v") == "z")
  }
}

/** Local-disk FileSystem answering for the `s3a` scheme: path
  * operations resolve against the URI's path component on local disk.
  * Test-only stand-in — see [[S3aCatalogSpec]]. */
class S3aMockFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  import org.apache.hadoop.fs.{FileStatus, Path}
  import org.apache.hadoop.fs.permission.FsPermission

  override def getScheme: String = "s3a"
  override def getUri: java.net.URI = java.net.URI.create("s3a://test-bucket")

  // RawLocal's lazy permission loading does `new File(path.toUri)`,
  // which rejects non-file schemes — materialize synthetic permissions
  // up front (object stores have no POSIX permissions anyway)
  private def eagerPerms(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getAccessTime,
      if (s.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
      "graft", "graft", s.getPath)

  override def getFileStatus(f: Path): FileStatus =
    eagerPerms(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(eagerPerms)
}
