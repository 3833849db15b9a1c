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
