package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-safe target encoding — the categorical-feature transform
  * that replaces a category with the target's smoothed mean over
  * OTHER rows. Naive target encoding leaks: a row's own label flows
  * into its own feature and the model memorizes instead of learning.
  * The standard fix is leave-fold-out: assign rows to k deterministic
  * folds, and encode each row's category from the k−1 folds it is NOT
  * in, with m-estimate smoothing toward the global prior so rare
  * categories don't collapse onto their own noise.
  *
  * Determinism: folds come from the seeded-md5 uniform (the q87/q174
  * discipline), the prior is frozen to an exact fixed-point code
  * first (`prior_code = (1e6·P) div N`), and the encoded value is
  * `(1e6·S_out + m·prior_code) div (C_out + m)` — exact long
  * arithmetic, replayable by the oracle, and overflow-safe to
  * corpus sizes of ~10⁹ positive rows per category (documented
  * headroom, no 128-bit intermediate needed). With m = 0 a category
  * confined to a single fold has zero out-of-fold rows; its code is
  * an explicit NULL (guarded CASE), not an engine-dependent div.
  *
  * Scale: one grouped aggregate to (category, fold) — |cats|·k state
  * rows — one tiny global aggregate for the prior, and the per-row
  * encode is a broadcast join against that state. Nothing scans
  * history twice.
  */
object TargetEncode {
  /** Deterministic fold id in [0, k) from the seeded md5 of the row id. */
  def foldOf(idCol: String, k: Int, salt: String)
      : org.apache.spark.sql.Column =
    pmod(conv(substring(md5(concat(lit(s"$salt:"),
      col(idCol).cast("string"))), 1, 7), 16, 10).cast("long"), lit(k))

  /** Per-(category, fold) leave-fold-out encoding table: rows in fold
    * f of category c read `code` — the smoothed out-of-fold target
    * mean in 1e-6 units — plus the out-of-fold counts backing it.
    * Join this back on (category, fold) to featurize. */
  def encodingTable(df: DataFrame, catCol: String, targetCol: String,
                    idCol: String, folds: Int, m: Long,
                    salt: String): DataFrame = {
    require(folds >= 2, s"folds must be >= 2, got $folds")
    require(m >= 0, s"smoothing m must be >= 0, got $m")
    val tagged = df.select(col(catCol), col(idCol),
      col(targetCol).cast("long").as("t"),
      foldOf(idCol, folds, salt).as("fold"))
    // global prior, frozen to a code FIRST (exact given this one div).
    // An EMPTY frame has sum = NULL and count = 0: the prior is moot
    // (the per-fold aggregate below is empty too), so take 0 instead
    // of crashing — operators return empty on empty, never throw
    // (EmptyInputSpec discipline).
    val g = tagged.agg(sum("t").as("p"), count(lit(1)).as("n")).head()
    val priorCode =
      if (g.isNullAt(0) || g.getLong(1) == 0L) 0L
      else 1000000L * g.getLong(0) / g.getLong(1)
    val perFold = tagged.groupBy(col(catCol), col("fold"))
      .agg(count(lit(1)).as("n_in"), sum("t").as("s_in"))
    val perCat = perFold.groupBy(col(catCol))
      .agg(sum("n_in").as("n_all"), sum("s_in").as("s_all"))
    perFold.join(perCat, catCol)
      .select(col(catCol), col("fold"),
        (col("n_all") - col("n_in")).as("n_out"),
        (col("s_all") - col("s_in")).as("s_out"))
      // m = 0 is legal (no smoothing) but then a category confined to
      // a single fold has n_out + m = 0: emit an explicit NULL code
      // (undefined — there is no out-of-fold evidence), never a bare
      // div that NULLs silently in non-ANSI mode and THROWS under ANSI
      .withColumn("code",
        expr(s"CASE WHEN n_out + $m = 0 THEN NULL " +
          s"ELSE (1000000 * s_out + $m * ${priorCode}L) div (n_out + $m) END"))
  }
}
