package graft

import org.apache.spark.sql.functions._
import graft.dedup.SortedNeighborhood

/** dedup.SortedNeighborhood: windowed merge/purge candidate pairs
  * over the parallel two-phase text rank (q128). */
class SortedNeighborhoodSpec extends SparkTestBase {
  import spark.implicits._

  test("pairs are exactly the window over the sorted order") {
    // sorted by text: bat(4) < cat(1) < cathode(2) < dog(3) < dot(5)
    val df = Seq((1L, "cat"), (2L, "cathode"), (3L, "dog"),
      (4L, "bat"), (5L, "dot")).toDF("doc_id", "text")
    val got = SortedNeighborhood
      .candidatePairs(df, "doc_id", "text", window = 2, threshold = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2), r.getBoolean(3))).toSet
    assert(got == Set(
      (4L, 1L, 1, true),   // bat->cat (one substitution)
      (1L, 2L, 4, false),  // cat->cathode
      (2L, 3L, 6, false),  // cathode->dog
      (3L, 5L, 1, true)))  // dog->dot (one edit)
  }

  test("window 3 adds the distance-2 pairs; nothing further") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("doc_id", "text")
    val got = SortedNeighborhood
      .candidatePairs(df, "doc_id", "text", window = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (2L, 4L)))
  }

  test("finds the corpus's planted near-dups; matches the naive window form") {
    val docs = Tables.documents(spark, sf)
    val mine = SortedNeighborhood
      .candidatePairs(docs, "doc_id", "text", window = 3, threshold = 40)
    // the naive single-window spec it must equal row-for-row
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("text"), col("doc_id"))
    val r = docs.select(col("doc_id"), col("text"),
      row_number().over(w).as("rn"))
    val naive = r.as("a").join(r.as("b"),
        col("b.rn") - col("a.rn") >= 1 && col("b.rn") - col("a.rn") <= 2)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        levenshtein(substring(col("a.text"), 1, 128),
          substring(col("b.text"), 1, 128)).as("lev"))
      .withColumn("is_dup", col("lev") <= 40)
    assert(mine.collect().toSet == naive.collect().toSet)
    assert(mine.filter(col("is_dup")).count() > 0)
  }

  test("the data-scale rank window is bucket-partitioned, not global") {
    val plan = SortedNeighborhood
      .candidatePairs(Tables.documents(spark, sf), "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the row_number over the CORPUS partitions by the sketch bucket
    // (SinglePartition exchanges still exist for the |buckets|-row
    // boundary/offset frames — metadata scale, not data scale)
    assert(plan.contains("windowspecdefinition(__bkt"), plan.take(2000))
  }
}
