package graft

import org.apache.spark.sql.functions._
import graft.ops.Merge

/** ops.Merge: CDC apply (batch MERGE INTO). */
class MergeSpec extends SparkTestBase {
  import spark.implicits._

  test("insert, update, delete, delete-of-absent-key fold correctly") {
    val standing = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "v", "n")
    val changes = Seq(
      (4L, "d", 40L, "I"),   // insert
      (2L, "B", 21L, "U"),   // update
      (3L, "c", 30L, "D"),   // delete
      (9L, "x", 0L, "D")     // delete of an absent key: no-op
    ).toDF("id", "v", "n", "op")
    val rows = Merge.applyChanges(standing, changes, "id")
      .select("id", "v", "n").as[(Long, String, Long)].collect().toSet
    assert(rows == Set((1L, "a", 10L), (2L, "B", 21L), (4L, "d", 40L)))
  }

  test("a malformed op (null or unrecognized) is a no-op, never a silent delete") {
    val standing = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val changes = Seq(
      (1L, "X", null.asInstanceOf[String]), // null op
      (2L, "Y", "changed")                  // snapshot-diff status, not an op
    ).toDF("id", "v", "op")
    val out = Merge.applyChanges(standing, changes, "id")
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "b"))) // both rows SURVIVE untouched
  }

  test("untouched standing rows pass through unchanged (no-op feed)") {
    val standing = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val empty = Seq.empty[(Long, String, String)].toDF("id", "v", "op")
    val out = Merge.applyChanges(standing, empty, "id")
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "b")))
  }

  test("the anti-join side broadcasts: untouched rows never shuffle") {
    val standing = Tables.documents(spark, sf)
    val changes = standing.filter(col("doc_id") % 50 === 0)
      .withColumn("op", lit("U"))
    val plan = Merge.applyChanges(standing, changes, "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
  }
}
