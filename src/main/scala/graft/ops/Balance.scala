package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Length-balanced sampling weights — the "don't let short documents
  * dominate the epoch" step of a mixture build. Training corpora are
  * heavily length-skewed; uniform document sampling over-represents
  * whatever length band is most numerous. The standard fix is
  * inverse-frequency weighting over length strata: cut the corpus
  * into k equal-population length buckets (SQL NTILE semantics) and
  * weight each document by `total / (k · bucket_size)` — a bucket at
  * exactly average population weighs 1.0, an underpopulated stratum
  * gets up-weighted, and the weights feed [[Sampling.weightedSample]]
  * / [[Mixture]] directly.
  *
  * Everything is integer: the decile comes from an exact global rank
  * ([[Quantiles.segmentedRowNumber]] — parallel two-phase ranks, not
  * a single-partition window) pushed through the NTILE formula
  * (first `n mod k` buckets take `n div k + 1` rows), and the weight
  * is fixed-point `(n · weightScale) div (k · bucket_size)` — no
  * float division, so the output replays bit-for-bit in any engine.
  */
object Balance {
  /** Per-document length stratum and balance weight:
    * `(id, n_tokens, decile 1..k, bucket_n, weight_fp)` where
    * `weight_fp` is the inverse-frequency weight at `weightScale`
    * fixed-point (10000 = weight 1.0). Ranks order by
    * `(n_tokens, id)` — total, deterministic, engine-portable. */
  def lengthDecileWeights(docs: DataFrame, idCol: String, textCol: String,
                          k: Int = 10, weightScale: Int = 10000,
                          nBuckets: Int = 32): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val t = docs.select(col(idCol).as("__id"),
        graft.text.TextFunctions.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("__g", lit(0))
    val ranked = Quantiles.segmentedRowNumber(t, "__g", "n_tokens",
      Seq(col("n_tokens"), col("__id")), nBuckets)
    // NTILE(k) from (rank, total): first r = n mod k buckets hold
    // q+1 = n div k + 1 rows each; the rest hold q. All `div`s are
    // long integer division; the q == 0 branch (n < k) never reaches
    // the divide because rn <= r·(q+1) = n then holds for every row.
    val rn = col("__rn")
    val q = expr(s"__n DIV $k"); val r = expr(s"__n % $k")
    val decile =
      when(rn <= r * (q + 1), expr(s"(__rn - 1) DIV (__n DIV $k + 1)"))
        .otherwise(expr(
          s"__n % $k + (__rn - 1 - (__n % $k) * (__n DIV $k + 1)) DIV (__n DIV $k)")) + 1
    ranked
      .withColumn("decile", decile.cast("int"))
      .withColumn("bucket_n",
        when(col("decile") <= r, q + 1).otherwise(q).cast("long"))
      .select(col("__id").as(idCol), col("n_tokens"), col("decile"),
        col("bucket_n"),
        expr(s"(__n * $weightScale) DIV ($k * bucket_n)").cast("long")
          .as("weight_fp"))
  }

  /** Per-source document budget cap — the C4 / RefinedWeb-style
    * per-domain quota: no source may contribute more than `k`
    * documents, and when a source is over budget its BEST `k` by
    * `(scoreCol DESC, id ASC)` survive. This is the anti-domination
    * gate in front of mixture building (one gigantic crawl domain
    * must not become the dataset).
    *
    * Shape: one bounded-heap `top_k` aggregate per source — the
    * shuffle carries k-row heaps, never the corpus — then the keeper
    * set (≤ |sources|·k rows) joins back id-keyed. Output is the
    * TOTAL frame with verdicts (funnel accounting). Requires a
    * numeric id for the heap's tie encoding. */
  def sourceBudget(docs: DataFrame, idCol: String, srcCol: String,
                   scoreCol: String, k: Int): DataFrame = {
    graft.sim.Ann.requireNumericId(docs, idCol, "sourceBudget")
    val keepers = docs.groupBy(col(srcCol))
      .agg(graft.functions.aggs.top_k(
        struct(col(scoreCol).as("s"), (-col(idCol)).as("ni")), k).as("top"))
      .select(explode(col("top")).as("t"))
      .select((-col("t.ni")).as("__keep_id"))
    docs.select(col(idCol), col(srcCol), col(scoreCol))
      .join(keepers, col(idCol) === col("__keep_id"), "left")
      .select(col(idCol), col(srcCol), col(scoreCol),
        col("__keep_id").isNotNull.as("kept"))
  }

  /** Gini concentration of a grouped measure — "how unequal is the
    * corpus across sources?", the one-number audit behind every
    * mixture decision ([[sourceBudget]] caps the symptom; this
    * MEASURES it, before and after). Exact integer form of the
    * classic rank formula over groups sorted by ascending measure
    * (ties by group name — a total order, so the rank weights are
    * deterministic):
    *
    *   gini_fp = Σᵢ (2i − n − 1)·xᵢ · 10⁶ div (n · Σx)
    *
    * 0 = perfectly uniform shares, →10⁶·(n−1)/n = one group holds
    * everything. No floats: the weighted sum and both divisor factors
    * are exact longs (envelope n·Σx < 2⁶³ — beyond that, measure in
    * coarser units). Output one row: (n_groups, total, gini_fp).
    *
    * Shape: the corpus collapses to |groups| rows in one
    * map-side-combined aggregate; the rank window and the two
    * scalars run at group cardinality. */
  def giniConcentration(df: DataFrame, groupCol: String,
                        measure: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grouped = df.groupBy(col(groupCol).as("__g"))
      .agg(sum(measure).as("__x"))
    val w = Window.orderBy(col("__x").asc, col("__g").asc)
    grouped
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy()))
      .agg(max(col("__n")).as("n_groups"), sum(col("__x")).as("total"),
        sum((lit(2L) * col("__i") - col("__n") - 1L) * col("__x"))
          .as("__ws"))
      .select(col("n_groups"), col("total"),
        when(col("total") > 0, call_function("div",
          col("__ws") * lit(1000000L), col("n_groups") * col("total")))
          .as("gini_fp"))
  }
}
