package graft

import org.apache.spark.sql.functions._
import graft.functions.aggs

/** functions.TopKOrdered: bounded grouped top-k ≡ the window form,
  * under any partitioning, with map-side-prunable buffers. */
class TopKSpec extends SparkTestBase {
  import spark.implicits._

  private def df = (1 to 1000).map { i =>
    (s"g${i % 7}", (i * 37 % 101).toDouble, i.toLong)
  }.toDF("g", "score", "id")

  private def windowForm(k: Int) = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("rnk", row_number().over(
        Window.partitionBy("g").orderBy(col("score").desc, col("id").desc)))
      .filter(col("rnk") <= k)
      .select("g", "rnk", "score", "id")
      .collect().map(_.toSeq).toSet
  }

  private def topkForm(d: org.apache.spark.sql.DataFrame, k: Int) =
    d.groupBy("g")
      .agg(aggs.top_k(struct(col("score"), col("id")), k).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("rnk", "t")))
      .select(col("g"), (col("rnk") + 1).cast("int").as("rnk"),
        col("t.score"), col("t.id"))
      .collect().map(_.toSeq).toSet

  test("top_k equals the row_number window form (with tie groups)") {
    // scores collide heavily (mod 101), so the id tiebreak is live
    for (k <- Seq(1, 3, 10)) assert(topkForm(df, k) == windowForm(k), s"k=$k")
  }

  test("partitioning-invariant") {
    val expected = topkForm(df, 5)
    assert(topkForm(df.repartition(1), 5) == expected)
    assert(topkForm(df.repartition(17, col("id")), 5) == expected)
  }

  test("asc=true keeps the smallest; groups smaller than k emit all rows") {
    val tiny = Seq(("a", 3L), ("a", 1L), ("a", 2L), ("b", 9L)).toDF("g", "v")
    val out = tiny.groupBy("g").agg(aggs.top_k(col("v"), 2, asc = true).as("t"))
      .select(col("g"), col("t")).as[(String, Seq[Long])].collect().toMap
    assert(out == Map("a" -> Seq(1L, 2L), "b" -> Seq(9L)))
  }

  test("null inputs are ignored; all-null group yields empty array") {
    val d = Seq(("a", Some(5L)), ("a", None), ("b", None)).toDF("g", "v")
    val out = d.groupBy("g").agg(aggs.top_k(col("v"), 3).as("t"))
      .select(col("g"), col("t")).as[(String, Seq[Long])].collect().toMap
    assert(out == Map("a" -> Seq(5L), "b" -> Seq.empty[Long]))
  }

  test("plan uses ObjectHashAggregate with a partial stage, not a window sort") {
    val plan = df.groupBy("g")
      .agg(aggs.top_k(struct(col("score"), col("id")), 3).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
