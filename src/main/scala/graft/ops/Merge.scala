package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture APPLY — the batch MERGE INTO: fold a keyed
  * change feed (inserts / updates / deletes) into a standing table
  * and return the new standing content. The consolidation step every
  * snapshot-maintained corpus runs between [[graft.etl.Scd]]-style
  * history (which keeps all versions) and plain overwrite (which
  * rewrites everything): only keys the feed touches change.
  *
  * Contract: `changes` carries the standing schema plus `opCol` with
  * `'I' | 'U' | 'D'`, AT MOST ONE row per key — a raw multi-version
  * feed reduces to latest-wins upstream first (the
  * [[graft.etl.Scd]]/q134 snapshot-diff machinery produces exactly
  * this shape). Inserts and updates are both upserts here (the
  * distinction matters to history keeping, not to the merged result);
  * a delete for an absent key is a no-op, matching SQL MERGE.
  *
  * Scale shape: the standing side pays ONE anti-join on the touched
  * keys — the delta is small next to the standing table, so AQE
  * broadcasts it and untouched rows stream through with no shuffle at
  * all; the surviving changes union in by name. Nothing standing is
  * ever shuffled or rewritten beyond the touched keys — the dataframe
  * twin of the catalog's partition-scoped `replacePartitions`. */
object Merge {
  def applyChanges(standing: DataFrame, changes: DataFrame,
                   idCol: String, opCol: String = "op"): DataFrame = {
    // ONLY recognized ops touch the standing table. Deriving the
    // touched set from all rows and the upserts from op != 'D' would
    // turn a malformed row (op null / unrecognized — e.g. a raw
    // snapshot-diff status fed in by mistake) into a silent DELETE:
    // its key anti-joins away and nothing replaces it. Here such a
    // row is a no-op.
    val known = changes.filter(col(opCol).isin("I", "U", "D"))
    val touched = known.select(col(idCol)).distinct()
    standing.join(touched, Seq(idCol), "left_anti")
      .unionByName(known.filter(col(opCol) =!= "D").drop(opCol))
  }
}
