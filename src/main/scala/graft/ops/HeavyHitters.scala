package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Frequency heavy hitters — "which keys appear at least `minCount`
  * times?" — without shuffling the full key cardinality.
  *
  * The naive `groupBy(key).count().filter(cnt >= t)` is exact but its
  * exchange carries one partial-count row per (partition, distinct
  * key): over a 100 TB stream of near-unique keys (URLs, shingles,
  * fingerprints) map-side combine buys nothing and the shuffle IS the
  * key cardinality. Here each partition keeps a Misra-Gries summary
  * of at most `cap` counters — one bounded in-memory map, amortized
  * O(1) per row — so the only exchange is `numPartitions × cap`
  * summary rows, independent of how many distinct keys exist.
  *
  * The summary is approximate (counts undercount by at most n/cap,
  * never overcount), but the GATE is exact, the same contract as
  * [[BloomGate]]: Misra-Gries never loses a key whose true count
  * exceeds the error bound, so `merged estimate + n/cap >= minCount`
  * yields a candidate set that provably contains every true heavy
  * hitter; a second pass counts ONLY candidate rows exactly (the
  * candidate keys travel as an `InSet` predicate, eligible for scan
  * pushdown, and the confirm aggregation map-side combines over a key
  * space of at most |candidates|). False candidates cost one exact
  * count each; they can never corrupt the output.
  *
  * When `cap <= n / minCount` the pruning guarantee is void, so the
  * gate falls back to the exact full aggregation — correct either
  * way, the summary is purely a narrowing device. Null keys are
  * excluded (document the matching WHERE in any oracle). Output is
  * `(out, cnt)`, deterministic and partitioning-independent: the
  * summaries vary with the split, the confirmed counts do not. */
object HeavyHitters {

  /** Keys whose exact count is at least `minCount`. */
  def frequentItems(df: DataFrame, key: Column, out: String,
                    minCount: Long, cap: Int = 4096,
                    maxCandidates: Int = 1 << 20): DataFrame =
    gate(df, key, out, cap, maxCandidates, _ => minCount)

  /** Keys covering at least 1/`denom` of the non-null rows —
    * `minCount = max(1, n / denom)` with the same integer floor
    * division an oracle's `count(*) // denom` computes, so the
    * threshold cannot drift between engines. */
  def frequentItemsRelative(df: DataFrame, key: Column, out: String,
                            denom: Long, cap: Int = 4096,
                            maxCandidates: Int = 1 << 20): DataFrame =
    gate(df, key, out, cap, maxCandidates, n => math.max(1L, n / denom))

  private def gate(df: DataFrame, key: Column, out: String, cap: Int,
                   maxCandidates: Int, minOf: Long => Long): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.filter(key.isNotNull)
    // one scan: per-partition MG summaries + per-partition row counts,
    // then everything else is driver-side arithmetic on <= P*(cap+1)
    // tiny rows — collect once, no cache/unpersist lifetime to manage
    val summary = mgSummary(base.select(key.cast("string")).as[String], cap)
      .groupBy("is_total", "k").agg(sum("cnt").as("est"))
      .collect()
    val n = summary.collectFirst {
      case r if r.getBoolean(0) => r.getLong(2) }.getOrElse(0L)
    val minCount = minOf(n)
    require(minCount > 0, s"minCount must be positive, got $minCount")
    val slack = n / cap // max undercount across all merged summaries
    val candidates = summary.collect {
      case r if !r.getBoolean(0) && r.getLong(2) + slack >= minCount =>
        r.getString(1)
    }
    // guarantee void (cap too small for the threshold) or candidate
    // set over the driver budget: stay exact, just unpruned
    val pruned =
      if (slack >= minCount || candidates.length > maxCandidates) base
      else base.where(key.cast("string").isInCollection(candidates))
    pruned.groupBy(key.as(out)).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** Per-partition Misra-Gries: at most `cap` counters; an arrival
    * missing from a full map decrements every counter instead of
    * entering (each such round retires cap+1 arrivals, so rounds
    * <= n_p/cap — that bounds both the undercount and the amortized
    * cost). Emits the surviving counters plus one `is_total` row
    * carrying the partition's row count, so the caller gets n from
    * the same single scan. */
  private[graft] def mgSummary(keys: Dataset[String],
                             cap: Int): DataFrame = {
    import keys.sparkSession.implicits._
    keys.mapPartitions { it =>
      val counters = new scala.collection.mutable.HashMap[String, Long]()
      var np = 0L
      it.foreach { k =>
        np += 1
        counters.get(k) match {
          case Some(c) => counters.update(k, c + 1)
          case None if counters.size < cap => counters.update(k, 1L)
          case None =>
            counters.keys.toArray.foreach { key =>
              val c = counters(key)
              if (c == 1L) counters.remove(key)
              else counters.update(key, c - 1L)
            }
        }
      }
      Iterator.single((true, null: String, np)) ++
        counters.iterator.map { case (k, c) => (false, k, c) }
    }.toDF("is_total", "k", "cnt")
  }
}
