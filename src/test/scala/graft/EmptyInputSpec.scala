package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.dedup.{Curation, Dedup}
import graft.etl.{Reports, Star}
import graft.sim.Ann

/** Degenerate-input behavior: every operator must return empty (not
  * throw) on empty frames — at scale, empty partitions and empty
  * incremental batches are routine, not edge cases. */
class EmptyInputSpec extends SparkTestBase {
  import spark.implicits._

  lazy val noDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType))))

  lazy val noVecs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))))

  test("dedup family returns empty on empty docs") {
    assert(Dedup.exactGroups(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.minhashPairs(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simhashPairs(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.ngramJaccardPairs(noDocs, "doc_id", "text").count() == 0)
  }

  test("ann returns empty for empty corpus or empty query set") {
    val e = Tables.embeddings(spark, sf)
    assert(Ann.bruteForceTopK(noVecs, noVecs, 5).count() == 0)
    assert(Ann.bruteForceTopK(e, noVecs, 5).count() == 0)
    assert(Ann.lshTopK(noVecs, noVecs, 5).count() == 0)
  }

  test("report aggregation of an empty fact is empty") {
    val fact = Tables.lineitem(spark, sf).filter(lit(false))
    val out = Reports.report(fact, Seq(col("l_returnflag")),
      Seq(Reports.Measure("q", col("l_quantity"), Reports.Integral)))
    assert(out.count() == 0)
  }

  test("watermark over empty input is None; incremental passthrough") {
    val empty = Tables.orders(spark, sf).filter(lit(false))
    assert(Star.watermark(empty, "o_orderdate").isEmpty)
    assert(Star.newerThan(empty, "o_orderdate", None).count() == 0)
  }

  test("curation of an empty corpus reports zeros and keeps nothing") {
    val (kept, report) = Curation.curate(noDocs, "doc_id", "text", "lang",
      Curation.Config(langs = Set.empty))
    assert(kept.count() == 0)
    assert(report.head().getAs[Long]("input") == 0)
  }
}
