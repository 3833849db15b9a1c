package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Quantiles

/** Sorted-neighborhood deduplication (Hernández & Stolfo's classic
  * merge/purge method): sort the corpus by a key, slide a window of
  * `w` over the sorted order, and verify only the pairs that fall
  * inside a window — O(n·w) comparisons instead of O(n²). The method
  * every entity-resolution stack keeps next to blocking ([[FuzzyJoin]]
  * is the blocked form; this is the ordered form — near-duplicates
  * that share a PREFIX land adjacent even when no shingle-block key
  * catches them).
  *
  * Scale shape: the naive form is `row_number() OVER (ORDER BY text)`
  * — an exchange to ONE task holding the whole corpus. Here the
  * global rank comes from [[Quantiles.segmentedRowNumber]] instead
  * (boundary-sketch the key space, rank each range in parallel, add
  * prefix offsets — exact at any bucket count), and the numeric
  * sketch proxy is the first 7 UTF-8 BYTES of the key packed
  * big-endian into a long: UTF-8 byte order equals code-point order,
  * so the proxy is monotone in the true string order at any alphabet
  * (zero-padding on the right makes short strings sort first, exactly
  * as strings do). Neighbor pairing is then an equi-join on rank —
  * shuffles on a long, never a single-partition window — and the
  * Levenshtein verify is clamped to `levPrefix` chars so per-pair
  * cost is bounded no matter how long documents get.
  */
object SortedNeighborhood {
  /** Candidate pairs from a window of `window` over the text-sorted
    * corpus (ties broken by id, so the order — and the output — is
    * total and deterministic): `(a_id, b_id, lev, is_dup)` for every
    * pair at rank distance 1..window-1, `lev` the edit distance of
    * the first `levPrefix` chars, `is_dup` its `<= threshold`
    * verdict. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     window: Int = 3, levPrefix: Int = 128,
                     threshold: Int = 40, nBuckets: Int = 64): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    // monotone numeric proxy of the string order for the rank sketch:
    // first 7 UTF-8 bytes, big-endian, right-padded with 0x00
    val keyNum = conv(
      rpad(hex(substring(encode(col("__txt"), "UTF-8"), 1, 7)), 14, "0"),
      16, 10).cast("long")
    val tagged = docs
      .select(col(idCol).as("__id"), col(textCol).as("__txt"))
      .withColumn("__hn", keyNum)
      .withColumn("__g", lit(0))
    val ranked = Quantiles.segmentedRowNumber(tagged, "__g", "__hn",
        Seq(col("__txt"), col("__id")), nBuckets)
      .select(col("__id"), col("__txt"), col("__rn"))
    val lhs = ranked
      .select(col("__id").as("a_id"), col("__txt").as("__a_txt"),
        col("__rn"), explode(sequence(lit(1), lit(window - 1))).as("__d"))
      .select(col("a_id"), col("__a_txt"), (col("__rn") + col("__d")).as("__brn"))
    val rhs = ranked.select(col("__id").as("b_id"),
      col("__txt").as("__b_txt"), col("__rn").as("__brn"))
    lhs.join(rhs, Seq("__brn"))
      .select(col("a_id"), col("b_id"),
        levenshtein(substring(col("__a_txt"), 1, levPrefix),
          substring(col("__b_txt"), 1, levPrefix)).as("lev"))
      .withColumn("is_dup", col("lev") <= threshold)
  }

  /** The verified duplicates only — [[candidatePairs]] with the
    * below-threshold filter applied. The predicate is written in the
    * NATURAL unbounded form and relies on
    * [[graft.plans.BoundedLevenshtein]] (installed here, idempotent)
    * to plan it as the banded `levenshtein(a, b, t)`: predicate
    * pushdown inlines the alias into the filter, then the rule swaps
    * the O(|a|·|b|) verify for the O(t·|a|) band — the dominant cost
    * of the window scan once documents get long. */
  def duplicatePairs(docs: DataFrame, idCol: String, textCol: String,
                     window: Int = 3, levPrefix: Int = 128,
                     threshold: Int = 40, nBuckets: Int = 64): DataFrame = {
    graft.plans.Rules.ensureRegistered(docs.sparkSession)
    candidatePairs(docs, idCol, textCol, window, levPrefix, threshold,
        nBuckets)
      .filter(col("is_dup"))
      .select(col("a_id"), col("b_id"), col("lev"))
  }
}
