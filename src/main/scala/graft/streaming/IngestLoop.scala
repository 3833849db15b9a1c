package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import graft.dedup.Dedup
import graft.ops.BloomGate
import graft.text.TextFunctions

/** The production ingest loop: one tick (a micro-batch from
  * `foreachBatch`, or a daily delta) folded through every standing
  * corpus artifact this library maintains — the composition q84, q89
  * and q90 each prove one stage of.
  *
  * Per tick, with `|batch| = b` and corpus size `N`:
  *   1. EXACT GATE — [[BloomGate.newRowsFromCatalog]] drops rows whose
  *      content fingerprint the corpus already holds (bloom narrows,
  *      an exact join confirms; one corpus scan, zero shuffles).
  *   2. PAIR DISCOVERY — [[Dedup.incrementalPairsFromCatalog]] finds
  *      every near-dup pair touching the survivors off the persisted
  *      prefix index (batch-scale probe, frozen token order).
  *   3. COMPONENT FOLD — [[Dedup.incrementalComponents]] merges those
  *      pairs into the standing cluster assignment (delta-contracted
  *      CC, broadcast remap; the assignment is scanned, not shuffled).
  *   4. STATE APPEND — survivors enter the corpus table, their prefix
  *      rows the index, their fingerprints the bloom (lossless bit-OR)
  *      — so tick t+1 sees tick t.
  *
  * Every stage is O(batch) except the unavoidable corpus SCANS (gate
  * confirm, pair verification) — nothing corpus-scale is ever
  * exchanged. IngestLoopSpec proves the loop ≡ batch: after any
  * sequence of ticks the corpus table equals one exact-dedup over the
  * arrivals, and the components table equals a from-scratch
  * [[Dedup.connectedComponents]] over the final corpus's pair graph.
  *
  * Crash posture: stages append/overwrite left-to-right; re-running a
  * tick whose append partially landed would double-append — drive the
  * loop from a replayable source and fence ticks with the marker
  * protocol [[graft.nyc.Nyc]] uses for gold appends (marker → append
  * → advance watermark → drop marker) when exactly-once matters. */
object IngestLoop {
  /** Standing-state table names; `build` creates them all from a seed
    * corpus. */
  final case class State(corpus: String, bloom: String, prefixIndex: String,
                         components: String, idCol: String = "doc_id",
                         textCol: String = "text",
                         threshold: Double = 0.4, ngramN: Int = 5,
                         bloomItems: Long = (1L << 22))

  private def withFp(df: DataFrame, st: State): DataFrame =
    df.withColumn("__fp", TextFunctions.fingerprint(col(st.textCol)))

  private def setsOf(df: DataFrame, st: State): DataFrame =
    df.select(col(st.idCol),
      Dedup.charNgrams(col(st.textCol), st.ngramN).as("set"))

  /** Initialize every artifact from the seed corpus (exact-deduped
    * first — the corpus table's invariant is fingerprint-unique). */
  def build(seed: DataFrame, catalog: TableCatalog, st: State): Unit = {
    val unique = Dedup.exactDedup(seed, st.idCol, st.textCol)
      .localCheckpoint(true)
    catalog.overwrite(unique, st.corpus)
    BloomGate.buildBloomIndex(withFp(unique, st), "__fp", catalog,
      st.bloom, expectedItems = st.bloomItems)
    Dedup.buildPrefixIndex(setsOf(unique, st), st.idCol, st.threshold,
      catalog, st.prefixIndex)
    val pairs = Dedup.exactSimilarityPairs(
      setsOf(unique, st), st.idCol, st.threshold)
    catalog.overwrite(
      Dedup.connectedComponents(pairs.select("id_a", "id_b")),
      st.components)
  }

  /** One tick. Returns the batch's SURVIVORS (the rows that entered
    * the corpus) so a `foreachBatch` caller can fan them onward.
    *
    * Dedup keeps the FIRST ARRIVAL of a fingerprint (the standing
    * copy gates later ones), while one batch-mode [[Dedup.exactDedup]]
    * over all arrivals keeps the minimum id — identical whenever ids
    * are assigned monotonically with arrival, the normal ingest
    * regime (and [[DocStreams.curateStream]]'s stream/batch contract). */
  def ingest(batch: DataFrame, catalog: TableCatalog, st: State): DataFrame = {
    val spark = batch.sparkSession
    val corpus = catalog.read(spark, st.corpus)
    // batch-internal exact dups collapse first (the corpus gate can
    // only see the corpus), then the bloom gate drops re-ingests
    val survivors = BloomGate.newRowsFromCatalog(
        withFp(Dedup.exactDedup(batch, st.idCol, st.textCol), st),
        withFp(corpus, st), "__fp", catalog, st.bloom)
      .localCheckpoint(true) // gate once; five consumers below
    val newSets = setsOf(survivors, st)
    val deltaPairs = Dedup.incrementalPairsFromCatalog(
      setsOf(corpus, st), newSets, st.idCol, catalog, st.prefixIndex)
    val folded = Dedup.incrementalComponents(
        catalog.read(spark, st.components),
        deltaPairs.select("id_a", "id_b"))
      .localCheckpoint(true) // read and overwrite the same table
    catalog.overwrite(folded, st.components)
    Dedup.appendToPrefixIndex(newSets, st.idCol, catalog, st.prefixIndex)
    BloomGate.appendToBloomIndex(survivors, "__fp", catalog, st.bloom)
    val out = survivors.drop("__fp")
    catalog.append(out, st.corpus)
    out
  }
}
