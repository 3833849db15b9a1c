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

  test("sourceBudget keeps each source's best k, total frame, score ties by id") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 20L), (4L, "a", 30L),
      (9L, "b", 5L)).toDF("id", "src", "score")
    val r = Balance.sourceBudget(df, "id", "src", "score", k = 2)
      .as[(Long, String, Long, Boolean)].collect()
      .map { case (id, _, _, kept) => id -> kept }.toMap
    // a: rank by (score desc, id asc) -> 2(30), 4(30), 3(20), 1(10)
    assert(r == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true,
      9L -> true)) // under-budget source keeps everything
  }

  test("sourceBudget == the window-rank form on the real corpus") {
    val scored = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        graft.functions.exprs.classifier_score(
          graft.text.TextFunctions.tokens(col("text"))).as("score"))
    val mine = Balance.sourceBudget(scored, "doc_id", "source", "score", 15)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val want = scored.withColumn("kept",
      org.apache.spark.sql.functions.row_number().over(w) <= 15)
    assert(mine.collect().toSet == want.collect().toSet)
    // the shuffle carries heaps, not rows: heap aggregate, no window
    val plan = mine.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && !plan.contains("Window"),
      plan.take(1500))
  }

  test("giniConcentration: uniform = 0, total monopoly = (n-1)/n, hand case") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def gini(rows: Seq[(String, Long)]): (Long, Long, Long) = {
      val r = graft.ops.Balance.giniConcentration(
        rows.toDF("g", "v"), "g", col("v")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // perfectly uniform: exactly 0
    assert(gini(Seq(("a", 5L), ("b", 5L), ("c", 5L), ("d", 5L)))
      == ((4L, 20L, 0L)))
    // one group holds everything: (n-1)/n = 3/4 exactly
    assert(gini(Seq(("a", 0L), ("b", 0L), ("c", 0L), ("d", 8L)))
      == ((4L, 8L, 750000L)))
    // hand case x = (1,2,3,4) sorted: weights (-3,-1,1,3) →
    // ws = -3-2+3+12 = 10; gini = 10/(4·10) = 0.25 exactly
    assert(gini(Seq(("a", 4L), ("b", 1L), ("c", 3L), ("d", 2L)))
      == ((4L, 10L, 250000L)))
    // multiple rows per group aggregate before ranking
    assert(gini(Seq(("a", 2L), ("a", 2L), ("b", 4L))) == ((2L, 8L, 0L)))
  }
}
