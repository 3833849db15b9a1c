package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-weighted dataset mixture building: the step after curation
  * where a training corpus is assembled from per-domain token budgets
  * ("20 B tokens of web, 5 B of code, 1 B of reference"). Each domain
  * contributes its documents in md5(id) order until the budget is
  * reached — a deterministic, engine-portable prefix of a uniform
  * permutation, so reruns and engine swaps assemble the SAME corpus
  * (md5 order, like [[Sampling.md5Sample]], is reproducible anywhere
  * with a hex md5; the DuckDB oracle replays the exact kept set).
  *
  * Scale shape: the naive form is a per-domain window cumsum — one
  * reducer sorts an entire domain, exactly the q38 trap (a web domain
  * at 100 TB is most of the corpus). This implementation runs the
  * two-phase [[Quantiles.segmentedPrefixSum]] instead: a boundary
  * sketch on the hash prefix splits each domain into `nBuckets`
  * ranges, bucket-level weight offsets compose over a driver-scale
  * frame, and only ~1/nBuckets of a domain sorts per task. Results
  * are EXACT and bit-identical to the window form.
  */
object Mixture {
  /** Null-id rows dropped (no identity → no stable selection order,
    * the [[Sampling.hashSample]] rule), plus the selection-order
    * columns: `__u` — the portable md5 order; `__un` — its first 15
    * hex digits as a number (fits a long, 16^15 = 2^60) for the
    * boundary sketch. Numeric order on a fixed-width prefix ==
    * lexicographic order on the full digest wherever prefixes differ,
    * so (__u, id) refines __un as segmentedPrefixSum requires. ONE
    * definition for both mixture forms — the epoch form's partial
    * prefix must select exactly [[tokenBudget]]'s documents
    * (spec-pinned), which duplicated preambles would let drift. */
  private def withSelectionOrder(df: DataFrame, idCol: String): DataFrame =
    df.filter(col(idCol).isNotNull)
      .withColumn("__u", md5(col(idCol).cast("string")))
      .withColumn("__un", conv(substring(col("__u"), 1, 15), 16, 10)
        .cast("long"))

  /** The per-row budget from the declared domain map; unbudgeted
    * domains get −1, which every consumer filters out. */
  private def budgetCol(domainCol: String, budgets: Map[String, Long]): Column = {
    require(budgets.nonEmpty, "budgets must name at least one domain")
    require(budgets.values.forall(_ > 0), s"budgets must be positive: $budgets")
    budgets.foldLeft(lit(-1L)) { case (acc, (k, b)) =>
      when(col(domainCol) === k, lit(b)).otherwise(acc)
    }
  }

  private def prefixSummed(df: DataFrame, idCol: String, domainCol: String,
                           weightCol: String, nBuckets: Int): DataFrame =
    Quantiles.segmentedPrefixSum(withSelectionOrder(df, idCol), domainCol,
      weightCol, "__un", Seq(col("__u").asc, col(idCol).asc), nBuckets)

  /** Documents selected into the mixture: for each domain with a
    * budget, the docs whose md5-order token prefix STARTS inside the
    * budget (so the budget-crossing doc is kept and every budget is
    * met, not undershot — when the domain's supply suffices; a domain
    * smaller than its budget contributes everything it has, see
    * [[tokenBudgetEpochs]] for the upsampling alternative). Domains
    * absent from `budgets` contribute nothing. Output: (idCol,
    * domainCol, weightCol, cum_tokens) where cum_tokens is the
    * inclusive running total within the domain — the audit column a
    * mixture manifest wants. */
  def tokenBudget(df: DataFrame, idCol: String, domainCol: String,
                  weightCol: String, budgets: Map[String, Long],
                  nBuckets: Int = 64): DataFrame = {
    val budget = budgetCol(domainCol, budgets)
    prefixSummed(df, idCol, domainCol, weightCol, nBuckets)
      .filter(col("__cum") - col(weightCol) < budget)
      .select(col(idCol), col(domainCol), col(weightCol),
        col("__cum").as("cum_tokens"))
  }

  /** Supply-aware mixture with REPETITION: when a domain's budget
    * exceeds its token supply, its documents repeat — floor(budget /
    * supply) full epochs for every document, plus one extra epoch for
    * the md5-order prefix that covers the remainder (the same
    * crossing-doc-kept semantics as [[tokenBudget]], so the budget is
    * met, never undershot). This is how real mixtures upsample small
    * high-quality domains ("4 epochs of reference text") while large
    * domains contribute a subset — with `n_epochs` as the explicit
    * per-document repeat factor a dataset manifest records, instead
    * of physically materializing duplicate rows. Domains without a
    * budget, and docs outside a partial-epoch prefix when there are
    * no full epochs, contribute nothing (n_epochs = 0 rows are
    * dropped). Supply is computed over the same null-id-filtered rows
    * the prefix runs on — an unselectable row must not inflate the
    * epoch denominator; a budgeted domain whose selectable weight sums
    * to zero has no meaningful epoch and contributes nothing (the
    * null result of `DIV 0` is filtered, not thrown). Output: (idCol,
    * domainCol, weightCol, n_epochs).
    *
    * Scale shape: identical to [[tokenBudget]] (two-phase prefix sum,
    * no per-domain reducer) plus one domain-supply aggregate joined
    * back — a |domains|-row broadcast. */
  def tokenBudgetEpochs(df: DataFrame, idCol: String, domainCol: String,
                        weightCol: String, budgets: Map[String, Long],
                        nBuckets: Int = 64): DataFrame = {
    val budget = budgetCol(domainCol, budgets)
    val selectable = df.filter(col(idCol).isNotNull)
    val supply = selectable.groupBy(col(domainCol).as("__sd"))
      .agg(sum(col(weightCol)).cast("long").as("__supply"))
    prefixSummed(df, idCol, domainCol, weightCol, nBuckets)
      .join(broadcast(supply), col(domainCol) <=> col("__sd"))
      .withColumn("__b", budget)
      .withColumn("__full", expr("__b DIV __supply")) // exact integral
      .withColumn("__rem", col("__b") % col("__supply"))
      .withColumn("n_epochs",
        (col("__full") +
          when(col("__cum") - col(weightCol) < col("__rem"), 1L)
            .otherwise(0L)).cast("long"))
      .filter(col("__b") >= 0 && col("n_epochs") >= 1)
      .select(col(idCol), col(domainCol), col(weightCol), col("n_epochs"))
  }

  /** Per-domain budgets DERIVED from the corpus by temperature
    * flattening — the multilingual-training recipe where sampling
    * probability ∝ supply^α (α = 1/2 here) upweights small domains
    * relative to their raw share without hand-written budgets. All
    * arithmetic is integer-exact and engine-portable: the flattened
    * weight is `floor(sqrt(supply))` (supply < 2⁵² is exact in a
    * double and sqrt is a correctly-rounded IEEE op — identical bits
    * in any engine), and each budget is `totalBudget * w DIV Σw` in
    * long integer math. A fractional α would need per-domain
    * transcendentals (`pow`), whose last-ulp freedom breaks
    * cross-engine reproducibility — α = 1/2 is the flattening
    * exponent with an exact portable form. The long product bounds
    * `totalBudget` by 2⁶³/max(w); with petascale domains
    * (supply ~2⁵², w ~2²⁶) that caps budgets at ~10¹¹ tokens —
    * widen the product to DECIMAL(38,0) beyond that.
    *
    * Output: (domainCol, budget) — one row per domain with positive
    * supply, a driver-scale frame for [[tokenBudgetFrom]]. Derived
    * budgets can exceed a small domain's supply (that is the point of
    * flattening); such domains contribute everything they have under
    * [[tokenBudgetFrom]]'s subset semantics — compose with
    * [[tokenBudgetEpochs]] when upsampling should repeat them
    * instead. */
  def temperatureBudgets(df: DataFrame, domainCol: String,
                         weightCol: String, totalBudget: Long): DataFrame = {
    require(totalBudget > 0, s"totalBudget must be positive: $totalBudget")
    val w = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol))
      .agg(sum(col(weightCol)).cast("long").as("__supply"))
      .filter(col("__supply") > 0)
      .withColumn("__w",
        floor(sqrt(col("__supply").cast("double"))).cast("long"))
    // Σw over the |domains|-row frame: a one-row aggregate broadcast
    // back (the funnel-report shape), not a window
    val wsum = w.agg(sum(col("__w")).as("__wsum"))
    w.crossJoin(broadcast(wsum))
      .select(col(domainCol),
        expr(s"CAST(($totalBudget * __w) DIV __wsum AS BIGINT)").as("budget"))
  }

  /** [[tokenBudget]] with the budgets as a DATAFRAME (domain, budget)
    * instead of a literal map — the form a derived-budget planner
    * ([[temperatureBudgets]]) composes with. Budgets are one row per
    * domain, broadcast onto the corpus; domains absent from the frame
    * contribute nothing, and the budget-crossing document is kept,
    * exactly as [[tokenBudget]]. */
  def tokenBudgetFrom(df: DataFrame, idCol: String, domainCol: String,
                      weightCol: String, budgets: DataFrame,
                      nBuckets: Int = 64): DataFrame =
    prefixSummed(df, idCol, domainCol, weightCol, nBuckets)
      .join(broadcast(budgets.select(col(domainCol), col("budget"))),
        Seq(domainCol))
      .filter(col("__cum") - col(weightCol) < col("budget"))
      .select(col(idCol), col(domainCol), col(weightCol),
        col("__cum").as("cum_tokens"))
}
