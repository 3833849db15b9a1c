package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-label centroid-distance outlier detection over an embedding
  * column: the "prototypicality" pruning step of curated-pretraining
  * pipelines (mislabeled / off-distribution vectors sit far from
  * their class centroid; SemDeDup's companion heuristic) — and the
  * embedding-side twin of the quality gates on the text side.
  *
  * Everything is integer-exact so the full ranking replays in any
  * SQL engine (the repo's hash-gated-oracle discipline): vectors
  * quantize to fixed-point codes `x = floor(v·10^scale)` (one IEEE
  * multiply + floor per element — deterministic everywhere), label
  * centroids are exact integer SUMS `s` (never the mean — a mean
  * needs a division whose rounding engines disagree on), and the
  * per-vector ranking key is
  *
  *   key = n·⟨x,x⟩ − 2·⟨x,s⟩        (n = label population)
  *
  * which equals n·‖x − s/n‖² − ‖s‖²/n: within a label the dropped
  * term is CONSTANT, so ordering by `key` is ordering by true
  * centroid distance — with zero divisions. Magnitudes stay in long
  * at any realistic shard size (n·⟨x,x⟩ ≤ n·dim·10^{2·scale}; at the
  * default scale 4 and dim 64 that holds to n ≈ 10^9 per label).
  */
object Outliers {
  /** Top `topN` centroid-distance outliers per label:
    * (label, id, score, rank), score the integer ranking key above
    * (larger = farther from the label centroid), ties broken by
    * ascending id. One shuffle for the centroid aggregate, centroids
    * broadcast back (|labels| rows), one bounded-heap top-k — the
    * corpus is scanned twice and never pair-joined, so the plan is
    * indifferent to corpus size. */
  def centroidOutliers(emb: DataFrame, topN: Int, scale: Int = 4,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       labelCol: String = "label"): DataFrame = {
    Ann.requireNumericId(emb, idCol, "centroidOutliers")
    val pow = math.pow(10.0, scale)
    val coded = emb.select(col(idCol).as("id"), col(labelCol).as("lbl"),
      transform(Vectors.asDouble(col(vecCol)),
        e => floor(e * lit(pow)).cast("int")).as("x"))
    val cent = coded.groupBy(col("lbl"))
      .agg(count(lit(1)).as("n"),
        graft.functions.aggs.vec_sum_fixed(
          transform(col("x"), _.cast("double")), scale = 0).as("st"))
      .select(col("lbl"), col("n"), col("st.sums").as("s"))
    // ⟨x,x⟩ through the codegen'd int kernel; ⟨x,s⟩ needs long×long
    // (centroid sums outgrow int once n·10^scale > 2^31), so it runs
    // as the exact HOF fold — one interpreted pass over dim elements
    // per row, still single-scan
    val scored = coded.join(broadcast(cent), Seq("lbl"))
      .select(col("lbl"), col("id"),
        (col("n") * graft.functions.exprs.dot_product_l(col("x"), col("x"))
          - lit(2L) * aggregate(
              zip_with(col("x"), col("s"), (a, b) => a.cast("long") * b),
              lit(0L), (acc, v) => acc + v)).as("score"))
    scored.groupBy(col("lbl"))
      .agg(graft.functions.aggs.top_k(
        struct(col("score").as("sc"), (-col("id")).as("ni")), topN)
        .as("top"))
      .select(col("lbl").as(labelCol), posexplode(col("top")).as(Seq("r", "t")))
      .select(col(labelCol), (-col("t.ni")).as(idCol),
        col("t.sc").as("score"), (col("r") + 1).cast("int").as("rank"))
  }
}
