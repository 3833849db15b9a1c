package graft.ops

import org.apache.spark.sql.DataFrame

/** Eager materialization ("pin") of a multi-consumer intermediate
  * frame — the shared discipline behind the containment engine's
  * vocabulary/encode pins and the semantic-dedup assignment pin.
  *
  * Default: `localCheckpoint(eager = true)` — blocks land in
  * executor-local storage, lineage truncates to a leaf, and the
  * ContextCleaner reaps the blocks once the returned frame becomes
  * unreachable. THE FAULT-TOLERANCE TRADE (guide §5): localCheckpoint
  * blocks are NOT recoverable — on a real cluster an executor loss
  * makes them unreadable and fails the job, and doc-cardinality pins
  * at corpus scale hold real executor memory/disk. That is the right
  * trade for a single-JVM harness and for short-lived intermediates;
  * it is NOT the right trade for an hour-long 100 TB pass on
  * preemptible executors.
  *
  * `graft.checkpoint.reliable=true` (Spark runtime conf, or a `-D`
  * system property) swaps every pin to the RELIABLE `checkpoint()` —
  * DFS-backed via `spark.checkpoint.dir`, which must be set or Spark
  * throws loudly. Results are identical under either mode (PinsSpec
  * pins a containment query and a semantic-dedup query bit-equal
  * across the flag); only the storage medium and recovery story
  * change.
  */
object Pins {
  private[graft] def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption("graft.checkpoint.reliable")
      .orElse(sys.props.get("graft.checkpoint.reliable"))
      .exists(_.toBoolean)

  /** Materialize `df` now; return a lineage-truncated frame. */
  def pin(df: DataFrame): DataFrame =
    if (reliable(df)) df.checkpoint() else df.localCheckpoint(true)
}
