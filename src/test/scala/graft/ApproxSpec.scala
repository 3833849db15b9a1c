package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates: accuracy bounds vs exact computation. */
class ApproxSpec extends SparkTestBase {

  test("approx_count_distinct within its rsd bound on documents") {
    val docs = Tables.documents(spark, sf)
    val exact = docs.select(countDistinct(col("text"))).head().getLong(0)
    val approx = docs.select(approx_count_distinct(col("text"), 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx brackets the exact median") {
    val docs = Tables.documents(spark, sf)
    val approx = docs.select(
      percentile_approx(col("n_chars"), lit(0.5), lit(10000))).head().getLong(0)
    val exact = docs.select(expr("percentile(n_chars, 0.5)")).head().getDouble(0)
    assert(math.abs(approx - exact) <= exact * 0.1 + 5,
      s"approx=$approx exact=$exact")
  }

  test("q29 corpus profile is sane") {
    val r = SparkEntry.queries("q29_corpus_profile")(spark, sf)
    assert(r.count() == 5) // five languages in testdata
    val row = r.filter(col("lang") === "en").head()
    assert(row.getAs[Long]("n_docs") > 0)
    assert(row.getAs[Long]("n_distinct_texts") <= row.getAs[Long]("n_docs"))
    assert(row.getAs[Long]("chars_p50") <= row.getAs[Long]("chars_p90"))
  }
}
