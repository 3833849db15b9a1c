package graft

import org.apache.spark.sql.functions._
import graft.sim.Outliers

/** sim.Outliers: per-label centroid-distance outliers on the
  * division-free integer key n·⟨x,x⟩ − 2·⟨x,s⟩ (q127). */
class OutliersSpec extends SparkTestBase {
  import spark.implicits._

  test("planted outlier ranks first; ranking matches true centroid distance") {
    // label 0: three clustered near (1,0), one planted far at (-9,9)
    val df = Seq(
      (0L, 0, Array(1.0, 0.1)), (1L, 0, Array(1.1, 0.0)),
      (2L, 0, Array(0.9, -0.1)), (3L, 0, Array(-9.0, 9.0)),
      (10L, 1, Array(5.0, 5.0)), (11L, 1, Array(5.2, 5.1)),
      (12L, 1, Array(4.8, 4.9))).toDF("vec_id", "label", "embedding")
    val r = Outliers.centroidOutliers(df, topN = 2)
      .orderBy("label", "rank").collect()
    assert(r.map(x => (x.getAs[Int]("label"), x.getAs[Long]("vec_id")))
      .head == ((0, 3L)))
    // exhaustive check: integer-key order == true squared-distance order
    val all = Outliers.centroidOutliers(df, topN = 10).collect()
      .map(x => (x.getAs[Int]("label"), x.getAs[Long]("vec_id"),
        x.getAs[Int]("rank")))
    val vecs = df.collect().map(x => (x.getLong(0), x.getInt(1),
      x.getSeq[Double](2).toArray))
    val want = vecs.groupBy(_._2).toSeq.flatMap { case (lbl, vs) =>
      val cent = vs.map(_._3).transpose.map(c => c.sum / c.length)
      vs.map { case (id, _, v) =>
        val d = v.zip(cent).map { case (a, b) => (a - b) * (a - b) }.sum
        (lbl, id, d)
      }.sortBy { case (_, id, d) => (-d, id) }
        .zipWithIndex.map { case ((l, id, _), i) => (l, id, i + 1) }
    }.toSet
    assert(all.toSet == want)
  }

  test("ties break by ascending id; topN bounds each group") {
    val df = Seq( // two vectors equidistant from the centroid
      (5L, 7, Array(1.0, 0.0)), (2L, 7, Array(-1.0, 0.0)),
      (9L, 7, Array(0.0, 0.0))).toDF("vec_id", "label", "embedding")
    val r = Outliers.centroidOutliers(df, topN = 2)
      .orderBy("rank").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Long]("vec_id") == 2L) // tie -> smaller id first
    assert(r(1).getAs[Long]("vec_id") == 5L)
  }

  test("deterministic and label-partition-shaped on the real table") {
    val e = Tables.embeddings(spark, sf)
    val a = Outliers.centroidOutliers(e, topN = 3).collect().toSet
    val b = Outliers.centroidOutliers(e, topN = 3).collect().toSet
    assert(a == b && a.nonEmpty)
    // exactly topN rows per label present in the corpus
    val labels = e.select("label").distinct().count()
    assert(a.size == labels * 3)
  }
}
