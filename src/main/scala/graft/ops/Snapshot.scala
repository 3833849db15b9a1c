package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot reconciliation — the "what changed since the last
  * crawl/export" diff every incremental pipeline needs before it can
  * do incremental anything: which documents appeared, vanished, or
  * changed content between two snapshots of the same table. Drives
  * selective re-processing (only `added`/`changed` re-enter the
  * curation loop, [[graft.streaming.IngestLoop]]-style) and audit
  * reporting (`removed` counts catch upstream data loss).
  *
  * Shape: each side collapses to (id, 128-bit content fingerprint) at
  * scan time — the diff never moves document BODIES, only digests —
  * then ONE full-outer equi-join on the id decides the status. Cost
  * is two scans plus a join keyed on the id at digest width,
  * regardless of document size. */
object Snapshot {
  /** Per-id status between two snapshots: `added` (new side only),
    * `removed` (old side only), `changed` (both, different content),
    * `unchanged`. Content identity is md5 over `contentCols` joined
    * with a 0x01 separator (prevents ("ab","c")/("a","bc")
    * boundary collisions; chr(1) replays in any SQL engine). */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
           contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "contentCols must be non-empty")
    def fp(d: DataFrame, as: String) = d.select(col(idCol).as("__id"),
      md5(concat_ws("", contentCols.map(col): _*)).as(as))
    fp(oldSnap, "__fp_old").join(fp(newSnap, "__fp_new"),
        Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__fp_old").isNull, "added")
          .when(col("__fp_new").isNull, "removed")
          .when(col("__fp_old") === col("__fp_new"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
