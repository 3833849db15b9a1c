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

  test("jsonl round-trip is lossless, including nulls and escapes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, "plain words", "en", 11L),
        // JSON metachars must survive the escape round-trip
        org.apache.spark.sql.Row(2L, "quote \" slash \\ brace { nl", "en", 26L),
        // null fields are DROPPED on write; the reader's schema
        // restores them as nulls
        org.apache.spark.sql.Row(3L, null, null, 0L)),
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("lang", StringType),
        StructField("n_chars", LongType))))
    Sources.writeJson(docs, s"$dir/docs")
    val back = Sources.readJson(spark, s"$dir/docs", Some(docs.schema))
    assert(back.schema == docs.schema)
    val rows = back.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(2).getString(1) == "quote \" slash \\ brace { nl")
    assert(rows(3).isNullAt(1) && rows(3).isNullAt(2))
    assert(rows.size == 3)
  }
}
