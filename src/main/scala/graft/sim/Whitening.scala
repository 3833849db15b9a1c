package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-dimension moment statistics over an embedding column — the
  * sufficient statistics for feature whitening / standardization
  * (subtract the mean, divide by the standard deviation, the
  * preprocessing step in front of PQ codebooks, linear probes, and
  * any distance that assumes isotropic features). One pass computes
  * `(n, Σx, Σx²)` for every dimension; mean and variance derive
  * downstream as `Σx/n` and `(Σx² − (Σx)²/n)/n` at whatever precision
  * the consumer wants.
  *
  * The moments are EXACT LONGS over fixed-point codes
  * `x = floor(v·10^scale)` (one IEEE multiply + floor per element —
  * deterministic everywhere), accumulated by the map-combinable
  * [[graft.functions.aggs.vec_sum_fixed]] vector aggregate: the
  * corpus scans ONCE, each task folds its partition into one
  * dim-length buffer, and the shuffle moves |partitions| buffers —
  * never rows. The naive form (explode to n·dim rows, groupBy dim)
  * shuffles the whole corpus; this shape is what survives 10^9
  * vectors. Magnitudes: Σx² ≤ n·dim·10^{2·scale} stays in long to
  * n ≈ 9·10^9 at the default scale 4, and overflow past that throws
  * (`Math.addExact` inside the aggregate) rather than wrapping.
  */
object Whitening {
  /** Per-dimension `(dim, n, s, ss)`: population count, exact sum and
    * sum-of-squares of the fixed-point codes. `dim` is 0-based. */
  def dimMoments(emb: DataFrame, scale: Int = 4,
                 vecCol: String = "embedding"): DataFrame = {
    val pow = math.pow(10.0, scale)
    // codes as integer-valued doubles: vec_sum_fixed(scale=0) floors
    // them unchanged, and code² stays exactly representable (< 2^53)
    val codes = transform(Vectors.asDouble(col(vecCol)),
      e => floor(e * lit(pow)).cast("double"))
    val sq = transform(codes, c => c * c)
    emb.agg(
        graft.functions.aggs.vec_sum_fixed(codes, scale = 0).as("s1"),
        graft.functions.aggs.vec_sum_fixed(sq, scale = 0).as("s2"))
      .select(col("s1.n").as("n"),
        posexplode(arrays_zip(col("s1.sums").as("s"), col("s2.sums").as("ss")))
          .as(Seq("dim", "z")))
      .select(col("dim").cast("int").as("dim"), col("n"),
        col("z.s").as("s"), col("z.ss").as("ss"))
  }

  /** Apply the standardization [[dimMoments]] parameterizes: per
    * `(id, dim)`, the z-score of the fixed-point code against the
    * corpus mean/std of that dimension, itself in fixed point
    * (`z_code = round(z · zScale)`). The whitening step run in front
    * of PQ codebooks, linear probes, and isotropic-distance ANN —
    * kept as its own operator so the statistics pass (one corpus
    * scan, dim-length buffers) and the apply pass (pure projection)
    * compose with a standing moments table: at 100 TB you compute
    * moments once per snapshot and re-apply them to every batch.
    *
    * Determinism: the moments are exact longs; mean, std, and the
    * z-score derive through a FIXED IEEE op sequence
    * (`mean = s/n; std = sqrt((ss − s·mean)/n); z = (x − mean)/std`)
    * both engines replay literally, and the emitted value lands back
    * in fixed point. Zero-variance dimensions emit `z_code = 0`.
    *
    * Scale shape: moments are `dim` rows — broadcast; the apply side
    * is explode → broadcast-join → project, fully pipelined, ZERO
    * exchanges after the moments aggregate (the explode inflates rows
    * map-side only). No driver state, no corpus shuffle. */
  def whiten(emb: DataFrame, scale: Int = 4, zScale: Int = 1024,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val pow = math.pow(10.0, scale)
    val mean = col("s").cast("double") / col("n").cast("double")
    val m = dimMoments(emb, scale, vecCol)
      .select(col("dim"), mean.as("mean"),
        sqrt((col("ss").cast("double") - col("s").cast("double") * mean)
          / col("n").cast("double")).as("std"))
    val codes = emb.select(col(idCol),
      posexplode(transform(Vectors.asDouble(col(vecCol)),
        e => floor(e * lit(pow)))).as(Seq("dim", "x")))
    // std can come out NaN, not just 0, once n·10^{2·scale} rounds
    // past 2^53 in the double subtraction (a near-constant dimension
    // at ~10^8+ vectors): guard both, or Spark silently casts NaN→0
    // while a SQL replay errors on the conversion
    codes.join(broadcast(m), Seq("dim"))
      .select(col(idCol), col("dim"),
        when(col("std") === 0.0 || isnan(col("std")), lit(0L))
          .otherwise(round((col("x") - col("mean")) / col("std")
            * lit(zScale.toDouble)).cast("long"))
          .as("z_code"))
  }
}
