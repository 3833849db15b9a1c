package graft

import org.apache.spark.sql.functions._
import graft.ops.Balance

/** ops.Balance: NTILE length strata + integer inverse-frequency
  * weights (q129). */
class BalanceSpec extends SparkTestBase {
  import spark.implicits._

  test("decile assignment equals Spark's own ntile window") {
    val docs = Tables.documents(spark, sf)
    val mine = Balance.lengthDecileWeights(docs, "doc_id", "text")
      .select("doc_id", "decile").as[(Long, Int)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_tokens"), col("doc_id"))
    val want = docs.select(col("doc_id"),
        graft.text.TextFunctions.tokenCount(col("text")).as("n_tokens"))
      .select(col("doc_id"), ntile(10).over(w).as("decile"))
      .as[(Long, Int)].collect().toMap
    assert(mine == want)
  }

  test("bucket sizes partition the corpus; weights invert frequency") {
    // 23 docs over 4 buckets: sizes 6,6,6,5 (first n%k get the extra)
    val df = (1 to 23).map(i => (i.toLong, ("w " * i).trim))
      .toDF("doc_id", "text")
    val r = Balance.lengthDecileWeights(df, "doc_id", "text", k = 4)
      .collect()
    val sizes = r.map(x => x.getAs[Int]("decile") -> x.getAs[Long]("bucket_n"))
      .distinct.sortBy(_._1)
    assert(sizes.toSeq == Seq(1 -> 6L, 2 -> 6L, 3 -> 6L, 4 -> 5L))
    // every doc accounted for, exactly once
    assert(r.length == 23 && r.map(_.getAs[Long]("doc_id")).distinct.length == 23)
    // weight_fp = (n * 10000) div (k * bucket_n), integer-exact
    r.foreach { x =>
      assert(x.getAs[Long]("weight_fp") ==
        23L * 10000 / (4 * x.getAs[Long]("bucket_n")))
    }
  }

  test("equal-population buckets weigh exactly 1.0 (10000 fixed-point)") {
    val df = (1 to 20).map(i => (i.toLong, ("w " * i).trim))
      .toDF("doc_id", "text")
    val r = Balance.lengthDecileWeights(df, "doc_id", "text", k = 4)
    assert(r.select("weight_fp").distinct.as[Long].collect().toSeq == Seq(10000L))
  }
}
