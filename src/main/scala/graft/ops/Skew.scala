package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for large joins.
  *
  * AQE's skew-join split handles moderate skew at runtime; salting is
  * the explicit remedy when one key dominates (hot customers, null-ish
  * sentinel keys) and the small side can be replicated: the big side
  * gets a random-but-deterministic salt in [0, buckets), the small side
  * is exploded ×buckets, and the join key becomes (key, salt) — the hot
  * key's rows spread over `buckets` reducers instead of one.
  */
object Skew {
  /** Deterministic per-row salt (hash of the row's whole key set, not
    * `rand()` — reruns and retries must land identically). */
  private def salt(cols: Seq[Column], buckets: Int): Column =
    pmod(xxhash64(cols: _*), lit(buckets))

  /** Equi-join `big ⋈ small` on `key`, spreading each big-side key over
    * `buckets` partitions; `small` is replicated `buckets`×. Use when a
    * broadcast is too large and AQE's split still leaves stragglers. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int, joinType: String = "inner",
                 tiebreak: Seq[String] = Nil): DataFrame = {
    // right/full outer would duplicate unmatched small-side rows
    // x buckets (the small side is replicated) — only the modes where
    // every emitted row is anchored on the big side are salting-safe
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left-anchored joins only, got $joinType")
    val bigSalted = big.withColumn("__salt",
      salt((key +: tiebreak).map(col) :+ monotonicallyDistinct(big), buckets))
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    bigSalted.join(smallExploded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** A column that distributes rows of `df` pseudo-randomly but
    * deterministically: hash of all columns. */
  private def monotonicallyDistinct(df: DataFrame): Column =
    xxhash64(df.columns.map(col): _*)

  /** Differential (hot/cold) skew join: keys the Misra-Gries summary
    * flags as heavy are joined through a BROADCAST of the small side's
    * matching rows — the hot keys never enter an exchange at all —
    * while every other key takes the ordinary shuffled path, now free
    * of its stragglers. Complements [[saltedJoin]]: salting spreads a
    * hot reducer at the cost of replicating the whole small side
    * ×buckets; here the replicated slice is only the hot keys' rows,
    * and the cold shuffle sheds the skew instead of dividing it.
    *
    * The split is semantics-neutral — hot and cold key sets are
    * disjoint and their unioned joins reconstruct `big ⋈ small`
    * exactly for every big-side-anchored join type — so detection
    * quality affects performance only, never the output (a missed
    * hot key rides the cold shuffle; a false positive costs broadcast
    * bytes). Null-keyed big rows ride the cold path, preserving
    * left-outer semantics. Hot keys number at most `hotDenom` (each
    * holds ≥ n/hotDenom rows), so the driver-side key list and the
    * broadcast slice are bounded by construction.
    *
    * Cost: one bounded-exchange detection pass over the big side's
    * key column plus one scan per branch — worth it exactly when the
    * hot reducer, not total throughput, gates the job. */
  def hotColdJoin(big: DataFrame, small: DataFrame, key: String,
                  joinType: String = "inner",
                  hotDenom: Long = 1000L, cap: Int = 4096): DataFrame = {
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"hotColdJoin supports inner/left-anchored joins only, got $joinType")
    val hotKeys = HeavyHitters
      .frequentItemsRelative(big.select(col(key)), col(key), key,
        denom = hotDenom, cap = cap)
      .select(col(key)).collect().map(_.get(0)).toSeq
    if (hotKeys.isEmpty) big.join(small, Seq(key), joinType)
    else {
      // null keys are never hot: coalesce routes them cold, where the
      // join itself gives them their correct (un)matched treatment
      val isHot = coalesce(col(key).isInCollection(hotKeys), lit(false))
      val smallHot = small.where(isHot)
      big.where(isHot).join(broadcast(smallHot), Seq(key), joinType)
        .unionByName(big.where(!isHot).join(small, Seq(key), joinType))
    }
  }

  /** Salted groupBy: two-phase aggregation for skewed grouping keys —
    * partial aggregate on (key, salt), then final on key. `partials`
    * must be re-aggregable (sum/count/min/max). */
  def saltedAgg(df: DataFrame, key: String, buckets: Int,
                partials: Seq[(String, Column)],
                finals: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      salt(Seq(col(key), monotonicallyDistinct(df)), buckets))
    val phase1 = salted.groupBy(col(key), col("__salt"))
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    phase1.groupBy(col(key))
      .agg(finals.head._2.as(finals.head._1),
        finals.tail.map { case (n, c) => c.as(n) }: _*)
  }
}
