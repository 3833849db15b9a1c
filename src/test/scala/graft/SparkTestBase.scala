package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared session factory for ALL test frameworks (ScalaTest and
  * ScalaCheck): whichever suite runs first creates the session, so the
  * config — notably the temp warehouse dir — must come from one place
  * or a first-created session with defaults poisons the rest (managed
  * tables landing in ./spark-warehouse broke BucketingSpec). */
object TestSessions {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSessions.spark
  val sf = "/root/testdata/sf0.001"
}
