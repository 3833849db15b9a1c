package graft

import org.apache.spark.sql.types._
import graft.sources.Sources

/** sources.Sources: CSV with header + quoted fields (reference S5). */
class SourcesSpec extends SparkTestBase {

  test("csv round-trip preserves quoted fields and schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val zone = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1, "Manhattan", "Alphabet City, East", "Boro"),
        org.apache.spark.sql.Row(2, "Queens", "Airport \"JFK\"", "Airports")),
      StructType(Seq(
        StructField("LocationID", IntegerType),
        StructField("Borough", StringType),
        StructField("Zone", StringType),
        StructField("service_zone", StringType))))
    Sources.writeCsv(zone, s"$dir/zones")
    val back = Sources.readCsv(spark, s"$dir/zones", Some(zone.schema))
    assert(back.count() == 2)
    val rows = back.collect().map(r => (r.getInt(0), r.getString(2))).toMap
    assert(rows(1) == "Alphabet City, East") // comma survived quoting
    assert(rows(2) == "Airport \"JFK\"")     // embedded quote survived
  }
}
