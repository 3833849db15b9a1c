package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Margin-based bitext mining: pair every source-language document
  * with its best target-language counterpart and keep only pairs whose
  * similarity stands OUT against both sides' neighborhoods — the
  * ratio-margin criterion of the large-scale mined-parallel-corpora
  * literature (Artetxe & Schwenk's margin scoring, the CCMatrix /
  * LASER recipe). Plain cosine thresholds fail here because some
  * vectors are "hubs" that sit close to everything; dividing the best
  * cosine by the mean of each side's top-k neighborhood cancels the
  * hubness and leaves genuine translation pairs above ~1.1 while
  * hub-induced matches fall back toward 1.0.
  *
  * Determinism contract (every emitted value is hash-gated against a
  * DuckDB replay): cosines are quantized to fixed-point longs
  * (`round(cos · 2^20)`) the moment they are computed, so the top-k
  * neighborhood sums are EXACT integer arithmetic — no float-sum
  * ordering anywhere — and the final margin pays exactly one IEEE
  * division, then lands back in fixed point (`round(margin · 2^14)`).
  * Ties inside a neighborhood break by ascending candidate id.
  *
  * Scale shape: the target side broadcasts (it is the probe set — at
  * 100 TB you mine language pair by language pair and the smaller
  * side of each pair rides the broadcast, exactly like
  * [[Ann.bruteForceTopK]]); the source side streams once; both
  * neighborhood reductions are k-bounded heaps
  * ([[graft.functions.aggs.top_k]]), so no all-pairs frame ever
  * materializes past the map side. When neither side broadcasts,
  * swap the candidate step for [[Ann.lshTopK]]'s bucketed form — the
  * margin arithmetic downstream is unchanged.
  *
  * The plan deliberately scores the pair frame TWICE (once under each
  * neighborhood aggregate): the pairs are a map-side product of two
  * scans — recomputing them costs one more pass over the broadcast,
  * while materializing |S|·|T| scored rows to share them would spill
  * the very frame the k-bounded heaps exist to never hold.
  */
object Bitext {
  private val CosScale = 1L << 20
  private val MarginScale = 1 << 14

  /** Mine candidate translation pairs between `src` and `tgt`
    * (each `(idCol, vecCol)` frames). Output: one row per source
    * vector — its best target match, the fixed-point ratio margin,
    * and the `mined` verdict (`margin ≥ marginMin`).
    *
    * @param k       neighborhood size for the margin denominator
    * @param marginMin ratio-margin keep threshold (e.g. 1.10)
    */
  def mine(src: DataFrame, tgt: DataFrame, k: Int, marginMin: Double,
           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, "bitext margin needs a neighborhood of at least 1")
    // both sides' ids ride the negated-id tie trick -> must be numeric
    Ann.requireNumericId(src, idCol, "bitextMine")
    Ann.requireNumericId(tgt, idCol, "bitextMine")
    val s = src.select(col(idCol).as("sid"),
        Vectors.asDouble(col(vecCol)).as("sv"))
      .withColumn("snrm", Vectors.norm(col("sv")))
    val t = tgt.select(col(idCol).as("tid"),
        Vectors.asDouble(col(vecCol)).as("tv"))
      .withColumn("tnrm", Vectors.norm(col("tv")))
    // fixed-point cosine the moment the pair is scored; everything
    // downstream is integer until the single margin division
    val pairs = s.join(broadcast(t))
      .select(col("sid"), col("tid"),
        round(Vectors.dot(col("sv"), col("tv"))
          / (col("snrm") * col("tnrm")) * lit(CosScale))
          .cast("long").as("c"))
    // forward neighborhood: per source, top-k target codes (ties by
    // ascending tid via the negated-id trick — ids are checked numeric)
    val fwd = pairs.groupBy(col("sid"))
      .agg(graft.functions.aggs.top_k(
        struct(col("c"), (-col("tid")).as("nt")), k).as("top"))
      .select(col("sid"),
        aggregate(col("top"), lit(0L), (a, x) => a + x("c")).as("fsum"),
        size(col("top")).cast("long").as("nf"),
        col("top")(0)("c").as("bc"),
        (-col("top")(0)("nt")).as("tid"))
    // backward neighborhood: per target, top-k source codes — the
    // other half of the hubness denominator
    val bwd = pairs.groupBy(col("tid"))
      .agg(graft.functions.aggs.top_k(
        struct(col("c"), (-col("sid")).as("ns")), k).as("top"))
      .select(col("tid"),
        aggregate(col("top"), lit(0L), (a, x) => a + x("c")).as("bsum"),
        size(col("top")).cast("long").as("nb"))
    val minCode = math.round(marginMin * MarginScale)
    // margin = c / ((fsum/nf + bsum/nb) / 2), cleared of divisions:
    // 2·c·nf·nb / (fsum·nb + bsum·nf). The ACTUAL neighborhood sizes
    // (nf, nb) scale the means — a side with fewer than k vectors
    // would otherwise inflate every margin by ~k/m and spuriously
    // mine low-resource pairs. With both sides ≥ k this reduces to
    // the fixed-2k form exactly. A zero denominator (the codes
    // cancelling exactly) is pathological but possible on adversarial
    // vectors — emit code 0 (never mined), not a cross-engine ±inf.
    fwd.join(bwd, Seq("tid"))
      .select(col("sid").as("src_id"), col("tid").as("tgt_id"),
        when(col("fsum") * col("nb") + col("bsum") * col("nf") === 0L,
          lit(0L))
          .otherwise(round(
            (lit(2L) * col("bc") * col("nf") * col("nb")).cast("double")
              / (col("fsum") * col("nb") + col("bsum") * col("nf"))
                .cast("double")
              * lit(MarginScale.toDouble))
            .cast("long")).as("margin_code"))
      .withColumn("mined", col("margin_code") >= lit(minCode))
  }
}
