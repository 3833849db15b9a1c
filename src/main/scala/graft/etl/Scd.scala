package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history: turn a change log (one row
  * per observed dimension state) into versioned periods
  * `[effective_from, effective_to)` with an open (`effective_to` null,
  * `is_current` true) row per key.
  *
  * Shape: one shuffle on the dimension key, then two window functions
  * over the SAME (key, ts, tie) sort — the no-op-change filter between
  * them preserves ordering and partitioning, so Catalyst plans a single
  * Exchange + Sort, not two. Keys are high-cardinality (customer ids,
  * user ids), so the sort never funnels through one reducer — this is
  * the partition-safe twin of the MERGE-statement SCD2 idiom.
  *
  * Consecutive observations with unchanged attributes are collapsed
  * (null-safe comparison), so re-delivering an unchanged snapshot never
  * fabricates a new version — the property that makes the operator
  * idempotent under at-least-once upstream delivery.
  */
object Scd {

  /** Full rebuild: change log → SCD2 history.
    *
    * @param changes one row per observation: key cols + attr cols + a
    *                timestamp column (+ optional tie-breaker columns for
    *                total determinism when timestamps can collide)
    * @return `keyCols ++ attrCols ++ (effective_from, effective_to,
    *         is_current)`, one row per distinct consecutive state
    */
  def history(changes: DataFrame, keyCols: Seq[String], tsCol: String,
              attrCols: Seq[String], tieCols: Seq[String] = Nil): DataFrame = {
    val order: Seq[Column] = (tsCol +: tieCols).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val attrs = struct(attrCols.map(col): _*)
    changes
      .select((keyCols ++ attrCols :+ tsCol) ++ tieCols map col: _*)
      .withColumn("__prev", lag(attrs, 1).over(w))
      // first observation, or any attribute changed (null-safe)
      .filter(col("__prev").isNull || !(col("__prev") <=> attrs))
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .select(keyCols ++ attrCols ++
        Seq("effective_from", "effective_to", "is_current") map col: _*)
  }

  /** Point-in-time read over an SCD2 history: each key's single row
    * whose period `[effective_from, effective_to)` covers `at` — the
    * "what did the dimension say when the model trained?" query, and
    * the join side a time-travel fact rebuild uses. A key first
    * observed after `at` is (correctly) absent.
    *
    * Pure per-row predicate: no window, no shuffle — at 100 TB this is
    * a scan with the filter pushed to parquet, and on a history
    * partitioned by period year it prunes to the covering partitions. */
  def asOf(history: DataFrame, at: Column): DataFrame =
    history.filter(col("effective_from") <= at &&
      (col("effective_to").isNull || col("effective_to") > at))

  /** Incremental maintenance: fold a new change batch into an existing
    * history WITHOUT reshuffling closed periods.
    *
    * Closed rows (`effective_to` non-null) are immutable by SCD2
    * semantics and pass through untouched; only each key's single open
    * row re-enters the window alongside the incoming batch. At 100 TB
    * the closed set is the accumulated history (arbitrarily large,
    * never shuffled again) while open ∪ batch is one row per live key
    * plus the delta — the working set an incremental run should pay
    * for, and nothing more. The late-arrival guard broadcasts the
    * batch's distinct keys by default (delta-sized in the daily-ingest
    * regime); for deltas whose KEY SET itself is too large to
    * broadcast, set `graft.scd.broadcastGuardKeys=false` to shuffle
    * that semi-join instead.
    *
    * Equivalence `applyChanges(history(a), b) == history(a ∪ b)` holds
    * exactly (spec-pinned) for in-order batches: the open row carries
    * its original `effective_from` into the recompute, and an incoming
    * unchanged snapshot collapses against it. A batch observation
    * OLDER than a key's open-period start, when that key has CLOSED
    * periods, would require rewriting closed history — the operator
    * THROWS on it (spec-pinned) instead of silently emitting
    * overlapping periods; retro-corrections go through a full
    * rebuild. Keys with no closed rows accept out-of-order batches
    * exactly (their entire history is the open row, which re-enters
    * the recompute).
    *
    * @param current output of [[history]] (or a previous applyChanges)
    * @param changes new observations, same key/attr/ts columns
    */
  def applyChanges(current: DataFrame, changes: DataFrame,
                   keyCols: Seq[String], tsCol: String,
                   attrCols: Seq[String], tieCols: Seq[String] = Nil): DataFrame = {
    val closed = current.filter(col("effective_to").isNotNull)
      .select(keyCols ++ attrCols ++
        Seq("effective_from", "effective_to", "is_current") map col: _*)
    // the open row re-enters as an observation at its ORIGINAL
    // effective_from, so its period start survives the recompute
    val openAsChange = current.filter(col("effective_to").isNull)
      .withColumn(tsCol, col("effective_from"))
      .select(keyCols ++ attrCols :+ tsCol map col: _*)
    val openAndNew = (if (tieCols.isEmpty) openAsChange
      // synthesize tie cols for the reopened row: null sorts FIRST in
      // ascending order, so it predates every new observation at the
      // same timestamp regardless of the tie column's type
      else tieCols.foldLeft(openAsChange)((d, t) =>
        d.withColumn(t, lit(null).cast(changes.schema(t).dataType))))
      .withColumn("__reopened", lit(true))
      .unionByName(
        changes.select((keyCols ++ attrCols :+ tsCol) ++ tieCols map col: _*)
          .withColumn("__reopened", lit(false)))
    // GUARD: an observation OLDER than its key's open-period start
    // AND older than some CLOSED row belongs inside closed history —
    // folding it into the open∪batch recompute would emit overlapping
    // periods and silently diverge from history(a ∪ b). Refuse loudly
    // (the caller must full-rebuild for retro-corrections). Keys with
    // no closed rows are exempt: their whole history re-enters the
    // window, so an out-of-order batch row is handled exactly. The
    // check rides ON the ts column (not a side column Catalyst would
    // prune) and its window shares the key partitioning the history
    // windows use. The closed-key flag must NOT scan the accumulated
    // closed history (the scaling contract above: closed rows never
    // reshuffle) — the guard only matters for keys IN the batch, so
    // closed is first semi-joined against the batch's distinct keys
    // and the distinct runs over that slice. The key set is BROADCAST
    // by default — right for the daily-delta regime this operator
    // targets — but a delta carrying hundreds of millions of distinct
    // keys would blow the broadcast: set
    // `graft.scd.broadcastGuardKeys=false` to route the semi-join
    // through a shuffle instead (same semantics, closed rows still
    // touched once, keyed not collected).
    val batchKeys = changes.select(keyCols.map(col): _*).distinct()
    val guardKeySide =
      if (changes.sparkSession.conf
            .get("graft.scd.broadcastGuardKeys", "true").toBoolean)
        broadcast(batchKeys)
      else batchKeys
    val closedKeys = closed
      .join(guardKeySide, keyCols, "left_semi")
      .select(keyCols.map(col): _*).distinct()
      .withColumn("__has_closed", lit(true))
    val wKey = Window.partitionBy(keyCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val openStart = max(when(col("__reopened"), col(tsCol))).over(wKey)
    val guarded = openAndNew
      .join(closedKeys, keyCols, "left")
      .withColumn(tsCol,
        when(col("__has_closed") && !col("__reopened") && col(tsCol) < openStart,
          raise_error(concat(
            lit("Scd.applyChanges: observation at "),
            col(tsCol).cast("string"),
            lit(" predates the open period start "),
            openStart.cast("string"),
            lit(" — late-arriving changes inside closed history need a full rebuild (history(a ∪ b))"))))
          .otherwise(col(tsCol)))
      .drop("__reopened", "__has_closed")
    closed.unionByName(
      history(guarded, keyCols, tsCol, attrCols, tieCols))
  }
}
