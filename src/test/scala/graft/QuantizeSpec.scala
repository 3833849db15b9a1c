package graft

import org.apache.spark.sql.functions._
import graft.sim.Quantize

/** sim.Quantize: int8 embedding quantization (q75) and the quantized
  * top-k (q76). */
class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  test("dot_product_l / eq_count_l kernels ≡ their HOF forms") {
    import graft.functions.exprs
    val df = Seq(
      (Array(1, -2, 3, 127), Array(4, 5, -6, 127),
       Array(1L, 2L, 3L), Array(1L, 9L, 3L)),
      (Array[Int](), Array[Int](), Array[Long](), Array[Long]()))
      .toDF("a", "b", "x", "y")
    val r = df.select(
      exprs.dot_product_l(col("a"), col("b")).as("k"),
      aggregate(zip_with(col("a"), col("b"),
          (p, q) => p.cast("long") * q.cast("long")),
        lit(0L), (acc, v) => acc + v).as("h"),
      exprs.eq_count_l(col("x"), col("y")).as("ek"),
      aggregate(zip_with(col("x"), col("y"),
          (p, q) => when(p === q, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).as("eh")).collect()
    r.foreach { row =>
      assert(row.getLong(0) == row.getLong(1))
      assert(row.getInt(2) == row.getInt(3))
    }
    assert(r(0).getLong(0) == 4 - 10 - 18 + 127L * 127L)
    assert(r(0).getInt(2) == 2)
  }

  test("hand-checked quantization: scale, values, zero vector") {
    val emb = Seq(
      (1L, Array(1.27f, -0.635f, 0.0f, 0.01f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))) // all-zero: scale 0, q = 0
      .toDF("vec_id", "embedding")
    val got = Quantize.int8(emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Int](2))).toMap
    val (s1, q1) = got(1L)
    assert(math.abs(s1 - 0.01) < 1e-9) // maxAbs 1.27 / 127
    assert(q1 == Seq(127, -64, 0, 1)) // -63.5 rounds away from zero
    val (s2, q2) = got(2L)
    assert(s2 == 0.0 && q2 == Seq(0, 0, 0, 0))
  }

  test("exploded rows reconstruct within half a quantization step") {
    val emb = Tables.embeddings(spark, sf)
    val rows = Quantize.int8Rows(emb, "vec_id", "embedding")
    assert(rows.count() == emb.count() * 64)
    // |err| <= scale/2 (+ 1e-6 rounding slack), qval in [-127, 127]
    val bad = rows.filter(
      abs(col("err_1e6").cast("double") / 1e6) > col("scale") / 2 + 1e-6 ||
        abs(col("qval")) > 127).count()
    assert(bad == 0L)
    // every vector attains |qval| = 127 somewhere (maxAbs element)
    val maxed = rows.filter(abs(col("qval")) === 127)
      .select("vec_id").distinct().count()
    assert(maxed == emb.filter(col("vec_id").isNotNull).count())
  }

  test("int8 top-k matches float top-k on well-separated neighbors") {
    // planted geometry: neighbors far apart in cosine, so quantization
    // noise cannot flip the ranking — int8 must agree with float
    // exactly
    val base = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val near = Array.tabulate(64)(i =>
      if (i == 0) 1.0f else if (i == 1) 0.3f else 0.0f)
    val far = Array.tabulate(64)(i => if (i == 2) 1.0f else 0.0f)
    val emb = Seq((0L, base), (1L, near), (2L, far), (3L, base.map(-_)))
      .toDF("vec_id", "embedding")
    val got = Quantize.bruteForceTopKInt8(emb, emb.filter(col("vec_id") === 0),
        k = 3)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    val want = graft.sim.Ann.bruteForceTopK(emb,
        emb.filter(col("vec_id") === 0), k = 3)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(got == want && got == Seq(1L, 2L, 3L))
  }
}
