package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable aggregate state — materialized-view maintenance for the
  * reports a pipeline refreshes every batch. Recomputing a per-key
  * (n, sum, min, max) from 100 TB of history on each tick is the
  * classic scale killer; the algebraic fix is to keep the aggregate's
  * STATE as a table and fold only the new batch into it:
  * count/sum/min/max are commutative monoids, so
  * `state(history ∪ batch) = merge(state(history), state(batch))`
  * exactly — no approximation, no rescan. The q173 oracle is that
  * equation's right side checked against its left.
  *
  * Only holds for algebraic aggregates: avg derives from (n, sum) at
  * READ time (never store a mergeable "avg"), and distinct-count
  * needs a sketch ([[Sketches]]' HLL is the mergeable form).
  *
  * Scale: `state` is one map-combinable group-by over the batch;
  * `merge` shuffles only |keys| state rows — at 1000 executors the
  * history never moves again.
  */
object IncAgg {
  /** The per-key state of one frame: n / sum / min / max of an
    * integral value column. */
  def state(df: DataFrame, keyCols: Seq[String],
            valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol)).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Fold any number of state frames into one — associative and
    * commutative, so batches can merge in any order or grouping
    * (hourly states into daily, daily into the standing total). */
  def merge(keyCols: Seq[String], states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "at least one state frame")
    states.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(sum("n").as("n"),
        sum("sum_v").as("sum_v"),
        min("min_v").as("min_v"),
        max("max_v").as("max_v"))
  }
}
