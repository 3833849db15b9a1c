package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier evaluation over corpus segments — the report that
  * decides whether a quality gate's score is worth thresholding.
  * Both metrics are EXACT integer statistics (the q93 classifier
  * emits integer score codes, so nothing here touches IEEE until a
  * final display division, and the oracle replays every step):
  *
  * - [[aucBySegment]]: AUC as the Mann–Whitney rank-sum — the
  *   probability a random positive outranks a random negative, with
  *   the tie convention (counted 1/2) carried exactly by doubled
  *   midranks: an element in a tie run at positions p..p+c−1 takes
  *   `2·midrank = 2p + c − 1`, an integer.
  * - [[confusionAt]]: the TP/FP/FN/TN cell counts at a pinned score
  *   threshold plus fixed-point precision/recall/F1 codes.
  *
  * Scale: the AUC rank runs per segment — ranking is one shuffle on
  * the segment key, and segments are many (sources), so no global
  * sort; the confusion report is one conditional-count aggregate,
  * map-side combinable, four longs of state per segment.
  */
object Eval {
  /** Per-segment AUC of `scoreCol` (integral) predicting `labelCol`
    * (0/1): emits the exact doubled rank-sum `u2 = 2·U`, the class
    * sizes, and `auc_code = (1e6·u2) div (2·P·N)` (NULL when a class
    * is absent — an AUC of a one-class segment is undefined, never
    * 0.5 by fiat). */
  def aucBySegment(df: DataFrame, segCol: String, scoreCol: String,
                   labelCol: String): DataFrame = {
    val w = Window.partitionBy(col(segCol)).orderBy(col(scoreCol))
    val tie = Window.partitionBy(col(segCol), col(scoreCol))
    val ranked = df.select(col(segCol), col(scoreCol),
        col(labelCol).cast("long").as("y"))
      .withColumn("r2",
        // rank() is IntegerType: widen BEFORE the doubling or a
        // segment past 2^30 rows wraps r2 silently in non-ANSI mode
        lit(2L) * rank().over(w).cast("long")
          + count(lit(1)).over(tie) - 1)
    ranked.groupBy(col(segCol))
      .agg(sum("y").as("n_pos"),
        (count(lit(1)) - sum(col("y"))).as("n_neg"),
        (sum(when(col("y") === 1, col("r2")).otherwise(lit(0L)))
          - sum("y") * (sum("y") + 1)).as("u2"))
      .withColumn("auc_code",
        expr("CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL " +
          "ELSE (1000000 * u2) div (2 * n_pos * n_neg) END"))
  }

  /** Pinned 1e6-scale NDCG discounts `round(1e6 / log2(rank+1))` for
    * ranks 1..20 — a literal table (never a runtime `log`, whose
    * intrinsic is not bit-specified across JVMs/engines), shared with
    * the oracle via [[discountCaseSql]]. */
  private[graft] val ndcgDiscounts: Seq[Long] = Seq(
    1000000L, 630930L, 500000L, 430677L, 386853L, 356207L, 333333L,
    315465L, 301030L, 289065L, 278943L, 270238L, 262650L, 255958L,
    250000L, 244651L, 239812L, 235409L, 231378L, 227670L)

  /** The discount table as a SQL CASE over a rank expression. */
  def discountCaseSql(rank: String): String =
    ndcgDiscounts.zipWithIndex.map { case (d, i) =>
      s"WHEN $rank = ${i + 1} THEN $d"
    }.mkString("CASE ", " ", " ELSE 0 END")

  private def discountCol(rank: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    ndcgDiscounts.zipWithIndex.foldRight(
      lit(0L): org.apache.spark.sql.Column) { case ((d, i), acc) =>
      when(rank === (i + 1), lit(d)).otherwise(acc)
    }

  /** NDCG@k per query over a ranked list and GRADED relevance:
    * `dcg_code = Σ grade·D(rank)` over ranked hits, `idcg_code` the
    * same sum over the ideal (grade-descending) order of that query's
    * relevant set truncated at k, `ndcg_code = (1e6·dcg) div idcg` —
    * exact integers end to end. The output covers the UNION of qids
    * seen in `ranked` (at rank <= k) and `relevant`: a query with an
    * empty relevant set still appears, with idcg_code and ndcg_code
    * NULL (undefined, never a silent drop and never 0 by fiat);
    * a query that was never ranked appears with dcg_code = 0 and
    * ndcg_code = 0 (it ranked nothing, the metric IS zero). `ranked`
    * needs (qid, doc_id, rank); `relevant` needs (qid, doc_id,
    * grade). */
  def ndcgAtK(ranked: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= ndcgDiscounts.size,
      s"k must be in [1, ${ndcgDiscounts.size}], got $k")
    val dcg = ranked.filter(col("rank") <= k)
      .join(relevant, Seq("qid", "doc_id"), "left")
      .select(col("qid"),
        (coalesce(col("grade"), lit(0L)) * discountCol(col("rank")))
          .as("g"))
      .groupBy("qid").agg(sum("g").as("dcg_code"))
    val wIdeal = Window.partitionBy(col("qid"))
      .orderBy(col("grade").desc, col("doc_id"))
    val idcg = relevant
      .withColumn("irank", row_number().over(wIdeal))
      .filter(col("irank") <= k)
      .select(col("qid"),
        (col("grade") * discountCol(col("irank"))).as("g"))
      .groupBy("qid").agg(sum("g").as("idcg_code"))
    // full outer: the output must be driven by the union of qids, or
    // ranked-only queries (empty relevant set) silently vanish while
    // relevant-only queries emit rows — an asymmetry a rank-eval
    // report reader would misread as "those queries were fine"
    idcg.join(dcg, Seq("qid"), "full_outer")
      .select(col("qid"),
        coalesce(col("dcg_code"), lit(0L)).as("dcg_code"),
        col("idcg_code"))
      .withColumn("ndcg_code",
        expr("CASE WHEN idcg_code IS NULL OR idcg_code = 0 THEN NULL " +
          "ELSE (1000000 * dcg_code) div idcg_code END"))
  }

  /** Kendall tau-b rank correlation per segment — "do these two
    * signals ORDER the corpus the same way?", the assumption-free
    * complement to q162's Pearson (which sees only linear structure).
    * All five pair classes are exact longs from one id-ordered
    * self-join; tau-b then takes q162's fixed-IEEE-op-sequence
    * discipline: one sqrt each side, one division, `round(·2^14)` —
    * identical instruction order in both engines, code 0 when either
    * side is all-ties (no ordering to correlate).
    *
    * Scale: pairs are per-segment O(n²) — the EVAL-SET operator, like
    * q65's exact oracle: right where segments are samples (thousands),
    * deliberately not the corpus path. */
  def kendallBySegment(df: DataFrame, segCol: String, xCol: String,
                       yCol: String, idCol: String): DataFrame = {
    val a = df.select(col(segCol), col(idCol).as("ia"),
      col(xCol).cast("long").as("xa"), col(yCol).cast("long").as("ya"))
    val b = df.select(col(segCol), col(idCol).as("ib"),
      col(xCol).cast("long").as("xb"), col(yCol).cast("long").as("yb"))
    val sgn = (col("xa") - col("xb")) * (col("ya") - col("yb"))
    a.join(b, Seq(segCol)).filter(col("ia") < col("ib"))
      .groupBy(col(segCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(sgn > 0, 1L).otherwise(0L)).as("nc"),
        sum(when(sgn < 0, 1L).otherwise(0L)).as("nd"),
        sum(when(col("xa") === col("xb") && col("ya") =!= col("yb"), 1L)
          .otherwise(0L)).as("tie_x"),
        sum(when(col("ya") === col("yb") && col("xa") =!= col("xb"), 1L)
          .otherwise(0L)).as("tie_y"))
      .withColumn("tau_b_code",
        when(col("nc") + col("nd") + col("tie_x") === 0 ||
          col("nc") + col("nd") + col("tie_y") === 0, lit(0L))
          .otherwise(round(
            (col("nc") - col("nd")).cast("double") /
              (sqrt((col("nc") + col("nd") + col("tie_x")).cast("double"))
                * sqrt((col("nc") + col("nd") + col("tie_y"))
                  .cast("double"))) * lit(16384.0)).cast("long")))
  }

  /** Per-segment confusion cells at `predicted = score >= threshold`,
    * plus 1e-6 fixed-point precision/recall/F1. Degenerate segments
    * emit NULL codes (no positives predicted, no positives present)
    * rather than an arbitrary zero. */
  def confusionAt(df: DataFrame, segCol: String, scoreCol: String,
                  labelCol: String, threshold: Long): DataFrame = {
    val p = (col(scoreCol) >= threshold).cast("long")
    val y = col(labelCol).cast("long")
    df.groupBy(col(segCol))
      .agg(sum(p * y).as("tp"),
        sum(p * (lit(1L) - y)).as("fp"),
        sum((lit(1L) - p) * y).as("fn"),
        sum((lit(1L) - p) * (lit(1L) - y)).as("tn"))
      .withColumn("precision_code",
        expr("CASE WHEN tp + fp = 0 THEN NULL " +
          "ELSE (1000000 * tp) div (tp + fp) END"))
      .withColumn("recall_code",
        expr("CASE WHEN tp + fn = 0 THEN NULL " +
          "ELSE (1000000 * tp) div (tp + fn) END"))
      // F1 = 2tp / (2tp + fp + fn), computed from the exact cells —
      // NOT from the rounded precision/recall codes
      .withColumn("f1_code",
        expr("CASE WHEN 2 * tp + fp + fn = 0 THEN NULL " +
          "ELSE (2000000 * tp) div (2 * tp + fp + fn) END"))
  }
}
