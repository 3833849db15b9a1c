package graft

import org.apache.spark.sql.functions._
import graft.ops.TargetEncode

/** ops.TargetEncode: deterministic folds, exact smoothing arithmetic,
  * and the leakage property the operator exists for. */
class TargetEncodeSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)
    .withColumn("quality", (col("n_chars") >= 300).cast("int"))

  test("folds are deterministic, uniform-ish, and in range") {
    val f1 = docs.select(col("doc_id"),
        TargetEncode.foldOf("doc_id", 5, "te42").as("fold"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val f2 = docs.select(col("doc_id"),
        TargetEncode.foldOf("doc_id", 5, "te42").as("fold"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f1 == f2)
    assert(f1.values.forall(f => f >= 0 && f < 5))
    val byFold = f1.values.groupBy(identity).view.mapValues(_.size)
    assert(byFold.size == 5 && byFold.values.min > f1.size / 10)
    // a different salt is a different assignment
    val other = docs.select(TargetEncode.foldOf("doc_id", 5, "other")
      .as("fold")).collect().map(_.getLong(0))
    assert(other.toSeq != f1.toSeq.sortBy(_._1).map(_._2))
  }

  test("out-of-fold counts exclude exactly the row's own fold; code is the exact formula") {
    val m = 20L
    val table = TargetEncode.encodingTable(docs, "source", "quality",
      "doc_id", folds = 5, m = m, salt = "te42").collect()
    // recompute the ground state by hand
    val tagged = docs.select(col("source"), col("quality").cast("long"),
        TargetEncode.foldOf("doc_id", 5, "te42"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val all = tagged.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val p = tagged.map(_._2).sum
    val n = tagged.size.toLong
    val priorCode = 1000000L * p / n
    table.foreach { r =>
      val (src, fold) = (r.getString(0), r.getLong(1))
      val in = tagged.filter(t => t._1 == src && t._3 == fold)
      val nOut = all(src)._1 - in.size
      val sOut = all(src)._2 - in.map(_._2).sum
      assert(r.getAs[Long]("n_out") == nOut, s"($src, $fold)")
      assert(r.getAs[Long]("s_out") == sOut)
      assert(r.getAs[Long]("code") ==
        (1000000L * sOut + m * priorCode) / (nOut + m))
    }
    // leakage check by construction: no cell's own-fold rows counted
    assert(table.nonEmpty)
  }

  test("m = 0 with a single-fold category emits an explicit NULL code, never a bare div") {
    // a one-row category is single-fold under ANY fold assignment, so
    // its only cell has n_out = 0 — with m = 0 there is no evidence
    // and no smoothing mass: the code must be an explicit NULL
    val one = Seq(("cat", 1L, 1)).toDF("c", "id", "t")
    val table = TargetEncode.encodingTable(one, "c", "t", "id",
      folds = 2, m = 0L, salt = "s").collect()
    assert(table.length == 1)
    val r = table.head
    assert(r.getAs[Long]("n_out") == 0L)
    assert(r.isNullAt(r.fieldIndex("code")),
      "zero out-of-fold evidence with m=0 must encode NULL")
  }

  test("heavy smoothing collapses every cell onto the prior") {
    val table = TargetEncode.encodingTable(docs, "source", "quality",
      "doc_id", folds = 5, m = 100000000L, salt = "te42")
    val g = docs.agg(sum(col("quality").cast("long")),
      count(lit(1))).head()
    val prior = 1000000L * g.getLong(0) / g.getLong(1)
    table.collect().foreach { r =>
      assert(math.abs(r.getAs[Long]("code") - prior) <= 1,
        s"code ${r.getAs[Long]("code")} vs prior $prior")
    }
  }
}
