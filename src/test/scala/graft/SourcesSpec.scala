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

  test("orc round-trip is lossless: schema, nulls, timestamps, binary") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, "text with ünïcode", 2.5,
        java.sql.Timestamp.valueOf("2024-02-29 23:59:59.123456"),
        Array[Byte](0, 1, -1, 127)),
      org.apache.spark.sql.Row(2L, null, null, null, null))
    val df = spark.createDataFrame(rows,
      StructType(Seq(
        StructField("id", LongType),
        StructField("text", StringType),
        StructField("score", DoubleType),
        StructField("ts", TimestampType),
        StructField("payload", BinaryType))))
    Sources.writeOrc(df, s"$dir/docs")
    val back = Sources.readOrc(spark, s"$dir/docs")
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val m = back.collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1).getString(1) == "text with ünïcode")
    assert(m(1).getAs[java.sql.Timestamp]("ts") ==
      java.sql.Timestamp.valueOf("2024-02-29 23:59:59.123456"))
    assert(m(1).getAs[Array[Byte]]("payload").toSeq ==
      Seq[Byte](0, 1, -1, 127))
    assert(m(2).isNullAt(1) && m(2).isNullAt(2) && m(2).isNullAt(4))
  }

  test("mergeSchema read reconciles added columns; old epochs read NULL") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-evolve").toString
    val e1 = Seq((1L, "early")).toDF("id", "text")
    val e2 = Seq((2L, "late", "web", 4L))
      .toDF("id", "text", "source", "n")
    e1.write.parquet(s"$dir/e1")
    e2.write.parquet(s"$dir/e2")
    val merged = Sources.readParquetMerged(spark,
        Seq(s"$dir/e1", s"$dir/e2"))
      .select("id", "text", "source", "n")
    assert(merged.schema.fieldNames.toSeq ==
      Seq("id", "text", "source", "n"))
    val m = merged.collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getString(1) == "early" &&
      m(1L).isNullAt(2) && m(1L).isNullAt(3))
    assert(m(2L).getString(2) == "web" && m(2L).getLong(3) == 4L)
    // a TYPE change is refused loudly, not silently cast
    Seq((3L, 7L)).toDF("id", "text").write.parquet(s"$dir/e3")
    val err = intercept[Exception] {
      Sources.readParquetMerged(spark,
        Seq(s"$dir/e1", s"$dir/e3")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("merg") ||
      err.getMessage.toLowerCase.contains("schema") ||
      err.getMessage.toLowerCase.contains("type"))
  }
}
