package graft

import org.apache.spark.sql.functions._
import graft.functions.aggs

/** functions.VectorSumFixed / aggs.vec_mean_fixed: grouped element-wise
  * vector aggregation on a fixed-point integral image. */
class VectorAggSpec extends SparkTestBase {
  import spark.implicits._

  private def sample = Seq(
    ("a", Array(0.5, -1.25, 2.0)),
    ("a", Array(0.25, 0.75, -0.5)),
    ("b", Array(1.0, 1.0, 1.0)),
    ("b", null.asInstanceOf[Array[Double]]),
    ("c", null.asInstanceOf[Array[Double]])
  ).toDF("g", "v")

  test("vec_sum_fixed matches a posexplode reference and skips null vectors") {
    val got = sample.groupBy($"g").agg(aggs.vec_sum_fixed($"v", 9).as("s"))
      .select($"g", $"s.n".as("n"), $"s.sums".as("sums"))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else (r.getLong(1), r.getSeq[Long](2).toVector)))
      .toMap
    assert(got("a") == ((2L, Vector(750000000L, -500000000L, 1500000000L))))
    assert(got("b") == ((1L, Vector(1000000000L, 1000000000L, 1000000000L))))
    // group with only null vectors -> null struct (n would be 0)
    val cRow = sample.filter($"g" === "c").groupBy($"g")
      .agg(aggs.vec_sum_fixed($"v", 9).as("s")).head()
    assert(cRow.isNullAt(1))
  }

  test("vec_mean_fixed is the pinned (double)sum/10^scale/n op sequence") {
    val m = sample.filter($"g" === "a").groupBy($"g")
      .agg(aggs.vec_mean_fixed($"v", 9).as("m"))
      .head().getSeq[Double](1).toVector
    assert(m == Vector(
      750000000L.toDouble / 1e9 / 2,
      -500000000L.toDouble / 1e9 / 2,
      1500000000L.toDouble / 1e9 / 2))
  }

  test("bit-identical across partitionings (order independence)") {
    val e = Tables.embeddings(spark, sf)
      .select($"label", graft.sim.Vectors.asDouble($"embedding").as("v"))
    def run(parts: Int): Array[(String, Vector[Double])] =
      e.repartition(parts).groupBy($"label")
        .agg(aggs.vec_mean_fixed($"v").as("m"))
        .orderBy($"label").collect()
        .map(r => (String.valueOf(r.get(0)), r.getSeq[Double](1).toVector))
    assert(run(1).sameElements(run(13)))
  }

  test("negative quantization floors toward -inf in both engines' terms") {
    // floor(-1.25e9) = -1250000000 exactly; floor(-0.3*1e9) = floor(-3.0e8±ulp)
    val r = Seq(Tuple1(Array(-0.3))).toDF("v")
      .agg(aggs.vec_sum_fixed($"v", 9).as("s")).select($"s.sums"(0)).head().getLong(0)
    assert(r == Math.floor(-0.3 * 1e9).toLong)
  }

  test("dimension mismatch within a group throws, not truncates") {
    val bad = Seq(("a", Array(1.0, 2.0)), ("a", Array(1.0))).toDF("g", "v")
    val ex = intercept[Exception] {
      bad.groupBy($"g").agg(aggs.vec_sum_fixed($"v").as("s")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("non-finite elements throw loudly") {
    val bad = Seq(("a", Array(Double.NaN))).toDF("g", "v")
    intercept[Exception] {
      bad.groupBy($"g").agg(aggs.vec_sum_fixed($"v").as("s")).collect()
    }
  }

  test("registered as a SQL function") {
    graft.functions.GraftExtensions.register(spark)
    sample.createOrReplaceTempView("vec_agg_sample")
    val r = spark.sql(
      """SELECT g, vec_sum_fixed(v, 9).n AS n FROM vec_agg_sample
        |WHERE g = 'a' GROUP BY g""".stripMargin).head()
    assert(r.getLong(1) == 2L)
  }
}
