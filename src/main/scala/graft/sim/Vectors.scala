package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float|double>` columns.
  *
  * Pure higher-order-function composition — the fold runs left-to-right
  * in array order, so results are bit-deterministic and match a DuckDB
  * `list_dot_product` on the same doubles. No UDFs, no MLlib Vector
  * boxing: the hot path stays in Tungsten arrays.
  */
object Vectors {
  /** Lossless float→double element cast. A NATIVE array cast, not
    * `transform(c, _.cast("double"))`: the HOF form is semantically
    * identical but interpreted per element and (being CodegenFallback)
    * splits whole-stage codegen at the embedding scan — the first step
    * of every ANN/near-dup query. Cast is codegen'd end to end. */
  def asDouble(c: Column): Column =
    c.cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))

  /** Ordered-fold dot product. Backed by a custom tight-loop Expression
    * ([[graft.functions.DotProductD]]) — the HOF formulation
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` is semantically identical
    * (same IEEE op order) but interpreted per element. */
  def dot(a: Column, b: Column): Column =
    graft.functions.exprs.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-bit bucket from `planes` (seeded pseudo-random hyperplanes):
    * bit j set iff dot(v, plane_j) > 0. Deterministic random-projection
    * LSH for cosine similarity. */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(v, planeLit) > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Fixed-seed hyperplane set (values in [-1, 1), seed pinned so plans
    * are reproducible across runs and engines). */
  def seededPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
  }
}
