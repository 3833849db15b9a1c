package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *   3. COMPONENT FOLD — [[Dedup.incrementalComponentsDelta]] reduces
  *      those pairs to a delta-scale (remap, newNodes) pair against
  *      the standing cluster assignment; the assignment itself is
  *      stored PARTITIONED BY ID-HASH (`State.componentParts`), so the
  *      apply rewrites only the partitions holding touched rows —
  *      never the corpus (id-hash, not component-hash: a row's id
  *      never changes, so no row ever migrates between partitions and
  *      no replaced partition can empty out).
  *   4. STATE APPEND — survivors enter the corpus table, their prefix
  *      rows the index (or, when [[Dedup.prefixIndexDrift]] crosses
  *      `State.maxUnseenPrefixShare`, the index is REBUILT under a
  *      fresh vocabulary snapshot), their fingerprints the bloom
  *      (lossless bit-OR) — so tick t+1 sees tick t.
  *
  * Every stage is O(batch ∪ touched-partitions) except the
  * unavoidable corpus SCANS (gate confirm, pair verification,
  * drift-triggered rebuilds) — nothing corpus-scale is ever exchanged
  * OR rewritten. IngestLoopSpec proves the loop ≡ batch: after any
  * sequence of ticks the corpus table equals one exact-dedup over the
  * arrivals, and the components table equals a from-scratch
  * [[Dedup.connectedComponents]] over the final corpus's pair graph.
  *
  * CRASH POSTURE — a tick is fenced by an intent-marker protocol (the
  * same family as [[graft.nyc.NycPipeline]]'s gold append and
  * `ParquetCatalog.compact`): all reads and similarity work happen
  * first, then the tick's roll-forward artifacts (the survivors, the
  * component remap, and the new-node labels — all delta-scale) are
  * STAGED to side tables, then a tiny marker commits the intent, then
  * the four state writes land, then the marker drops. A crash before
  * the marker mutates nothing a re-run would double-count (staging
  * tables are inert without the marker); a crash after it is ROLLED
  * FORWARD by [[recoverPendingTick]] from the staged artifacts with
  * per-artifact idempotence guards — the component remap is idempotent
  * by construction (merged roots are fixed points) and the partition
  * rewrite dedups by id, corpus and prefix appends anti-join out ids
  * that already landed (each id's rows commit atomically: both appends
  * route every id through one task file), and the bloom re-ORs the
  * same fingerprints (a bit-identical no-op). Re-running the crashed
  * batch afterwards is a pure re-ingest tick: the gate sees the
  * recovered corpus and passes nothing. */
object IngestLoop {
  /** Standing-state table names; `build` creates them all from a seed
    * corpus. `maxUnseenPrefixShare` is the [[Dedup.prefixIndexDrift]]
    * threshold above which a tick rebuilds the prefix index instead of
    * appending to it — pairs are identical either way (the frozen
    * order is sound); what a rebuild restores is the rarest-first
    * candidate-MASS guarantee the frozen snapshot erodes under
    * vocabulary drift. `componentParts` is the assignment table's
    * id-hash partition count — size it so one partition's rows fit a
    * task comfortably (thousands at corpus scale; the per-tick rewrite
    * touches only partitions holding remapped or new rows). */
  final case class State(corpus: String, bloom: String, prefixIndex: String,
                         components: String, idCol: String = "doc_id",
                         textCol: String = "text",
                         threshold: Double = 0.4, ngramN: Int = 5,
                         bloomItems: Long = (1L << 22),
                         maxUnseenPrefixShare: Double = 0.5,
                         componentParts: Int = 64)

  private def stagedSurvivors(st: State) = s"${st.corpus}__tick_survivors"
  private def stagedRemap(st: State) = s"${st.corpus}__tick_remap"
  private def stagedNewNodes(st: State) = s"${st.corpus}__tick_newnodes"
  private def tickMarker(st: State) = s"${st.corpus}__tick_pending"

  private def withFp(df: DataFrame, st: State): DataFrame =
    df.withColumn("__fp", TextFunctions.fingerprint(col(st.textCol)))

  private def setsOf(df: DataFrame, st: State): DataFrame =
    df.select(col(st.idCol),
      Dedup.charNgrams(col(st.textCol), st.ngramN).as("set"))

  private def partOf(st: State, id: Column): Column =
    pmod(xxhash64(id), lit(st.componentParts))

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
      Dedup.connectedComponents(pairs.select("id_a", "id_b"))
        .withColumn("__part", partOf(st, col("id"))),
      st.components, partitionBy = Seq("__part"))
  }

  /** The standing assignment as its logical (id, component) self. */
  def readComponents(spark: SparkSession, catalog: TableCatalog,
                     st: State): DataFrame =
    catalog.read(spark, st.components).select(col("id"), col("component"))

  /** One tick. Returns the batch's SURVIVORS (the rows that entered
    * the corpus) so a `foreachBatch` caller can fan them onward.
    *
    * Dedup keeps the FIRST ARRIVAL of a fingerprint (the standing
    * copy gates later ones), while one batch-mode [[Dedup.exactDedup]]
    * over all arrivals keeps the minimum id — identical whenever ids
    * are assigned monotonically with arrival, the normal ingest
    * regime (and [[DocStreams.curateStream]]'s stream/batch contract). */
  def ingest(batch: DataFrame, catalog: TableCatalog, st: State): DataFrame =
    ingestImpl(batch, catalog, st, _ => ())

  /** [[ingest]] with a fault-injection seam: `failpoint` is invoked
    * with a stage name immediately BEFORE each state mutation
    * ("stage", "marker", "components", "prefix", "bloom", "corpus",
    * "unmark"); a test that throws from it simulates a crash at that
    * boundary (IngestLoopSpec kills ticks at several and proves
    * recovery keeps loop ≡ batch). */
  private[graft] def ingestImpl(batch: DataFrame, catalog: TableCatalog,
                                st: State,
                                failpoint: String => Unit): DataFrame = {
    val spark = batch.sparkSession
    recoverPendingTick(spark, catalog, st, failpoint)
    val corpus = catalog.read(spark, st.corpus)
    // batch-internal exact dups collapse first (the corpus gate can
    // only see the corpus), then the bloom gate drops re-ingests
    val survivors = BloomGate.newRowsFromCatalog(
        withFp(Dedup.exactDedup(batch, st.idCol, st.textCol), st),
        withFp(corpus, st), "__fp", catalog, st.bloom)
      .localCheckpoint(true) // gate once; every stage below consumes
    // a tick of pure re-ingests mutates NOTHING — no staging, no
    // marker, no partition rewrites
    if (survivors.isEmpty) return survivors.drop("__fp")
    val newSets = setsOf(survivors, st)
    // pair discovery and the drift measure share one materialized
    // probe (one batch tokenize + vocab probe + ranking window)
    val (deltaPairs, drift) = Dedup.incrementalPairsFromCatalogWithDrift(
      setsOf(corpus, st), newSets, st.idCol, catalog, st.prefixIndex)
    // delta-scale component fold: (old-root → merged-root) remap plus
    // labeled new nodes; None when every delta edge dissolved into the
    // standing clusters — but new SINGLETON docs still need no row
    // (singletons are absent from the assignment, as in the batch form)
    val fold = Dedup.incrementalComponentsDelta(
      readComponents(spark, catalog, st),
      deltaPairs.select("id_a", "id_b"))
    // the rebuild-vs-append decision is made HERE, against the
    // pre-tick vocabulary, and pinned into the marker: re-measuring
    // during recovery would read whatever vocabulary a mid-rebuild
    // crash left behind and could bolt new-vocab batch rows onto an
    // old-vocab index — the one mixed state the frozen-order proof
    // does not cover
    val rebuild = drift > st.maxUnseenPrefixShare
    // ---- staged two-phase commit: artifacts first, marker last ----
    failpoint("stage")
    catalog.overwrite(survivors, stagedSurvivors(st))
    val (remap, newNodes) = fold.getOrElse((
      spark.emptyDataFrame.select(lit(0L).as("component"), lit(0L).as("newc"))
        .limit(0),
      spark.emptyDataFrame.select(lit(0L).as("id"), lit(0L).as("component"))
        .limit(0)))
    catalog.overwrite(remap, stagedRemap(st))
    catalog.overwrite(newNodes, stagedNewNodes(st))
    failpoint("marker")
    locally {
      import spark.implicits._
      catalog.overwrite(Seq((st.corpus, rebuild)).toDF("tick", "rebuild"),
        tickMarker(st))
    }
    applyStagedTick(spark, catalog, st, rebuild, guarded = false, failpoint)
    failpoint("unmark")
    catalog.drop(spark, tickMarker(st))
    survivors.drop("__fp")
  }

  /** Land the staged tick's four state writes. `guarded = true` (the
    * recovery path) makes the append-shaped writes idempotent against
    * a partial prior landing; the component partition rewrite and the
    * bloom OR are idempotent in both modes by construction. */
  private def applyStagedTick(spark: SparkSession, catalog: TableCatalog,
                              st: State, rebuild: Boolean, guarded: Boolean,
                              failpoint: String => Unit): Unit = {
    val survivors = catalog.read(spark, stagedSurvivors(st))
      .localCheckpoint(true)
    val newSets = setsOf(survivors, st)
    failpoint("components")
    applyComponentDelta(spark, catalog, st)
    failpoint("prefix")
    if (rebuild) {
      // fresh vocabulary snapshot over corpus ∪ survivors — overwrite-
      // based and keyed by the marker-pinned decision, so any number
      // of recovery re-runs land the identical index (the id-dedup
      // also absorbs a corpus append that already landed)
      val union = setsOf(catalog.read(spark, st.corpus), st)
        .unionByName(newSets)
        .dropDuplicates(st.idCol)
      Dedup.buildPrefixIndex(union, st.idCol, st.threshold, catalog,
        st.prefixIndex)
    } else {
      val toAppend =
        if (!guarded) newSets
        else {
          // ids whose prefix rows already landed: each id's rows are
          // written by ONE task (the ranking window partitions by id),
          // so a file-level partial commit is id-atomic and the
          // anti-join is an exact guard
          val batchIds = survivors.select(col(st.idCol).as("__bid"))
            .distinct()
          val present = catalog.read(spark, st.prefixIndex)
            .join(broadcast(batchIds), col("id") === col("__bid"),
              "left_semi")
            .select(col("id").as(st.idCol)).distinct()
          newSets.join(broadcast(present), Seq(st.idCol), "left_anti")
        }
      if (!toAppend.isEmpty)
        Dedup.appendToPrefixIndex(toAppend, st.idCol, catalog,
          st.prefixIndex)
    }
    failpoint("bloom")
    // idempotent by construction: OR-ing the same fingerprints into
    // the bloom a second time is bit-identical
    BloomGate.appendToBloomIndex(survivors, "__fp", catalog, st.bloom)
    failpoint("corpus")
    val out = survivors.drop("__fp")
    val corpusRows =
      if (!guarded) out
      else {
        // semi-probe FIRST (broadcast of the batch ids), distinct on
        // the tiny survivor subset — never a corpus-wide distinct
        val present = catalog.read(spark, st.corpus)
          .join(broadcast(survivors.select(col(st.idCol))),
            Seq(st.idCol), "left_semi")
          .select(col(st.idCol)).distinct()
        out.join(broadcast(present), Seq(st.idCol), "left_anti")
      }
    if (!corpusRows.isEmpty) catalog.append(corpusRows, st.corpus)
  }

  /** Partition-scoped apply of the staged component delta: replace
    * ONLY the id-hash partitions that hold a remapped row or a new
    * node. Safe to re-run in any partially-landed state:
    *  - the remap is idempotent (merged roots are fixed points), so a
    *    partition already rewritten re-remaps to itself;
    *  - touched partitions are recomputed from the CURRENT table —
    *    ones already rewritten have no old-root rows left and simply
    *    drop out of the touched set (new-node partitions stay in it
    *    and regenerate identically, deduped by id);
    *  - partitions never empty out (content keys on id-hash, and ids
    *    never change), so "replace partitions present in the data"
    *    covers every partition that could hold stale rows. */
  private def applyComponentDelta(spark: SparkSession, catalog: TableCatalog,
                                  st: State): Unit = {
    val remap = broadcast(catalog.read(spark, stagedRemap(st))
      .localCheckpoint(true))
    val newNodes = catalog.read(spark, stagedNewNodes(st))
      .localCheckpoint(true)
    if (remap.isEmpty && newNodes.isEmpty) return
    val standing = catalog.read(spark, st.components)
    // partitions holding a row whose component is an OLD root (scan
    // with the broadcast remap map-side — the BloomGate discipline),
    // plus the partitions every new node hashes into
    val touchedParts = standing
      .join(remap.select(col("component")), Seq("component"), "left_semi")
      .select(col("__part"))
      .unionByName(newNodes.select(partOf(st, col("id")).as("__part")))
      .distinct()
      .localCheckpoint(true)
    if (touchedParts.isEmpty) return
    val content = standing
      .join(broadcast(touchedParts), Seq("__part"), "left_semi")
      .join(remap, Seq("component"), "left")
      .select(col("id"),
        coalesce(col("newc"), col("component")).as("component"),
        col("__part"))
      .unionByName(newNodes
        .select(col("id"), col("component"),
          partOf(st, col("id")).as("__part")))
      // recovery may find already-landed new nodes in the standing
      // rows — one row per id, deterministically (both copies carry
      // the same merged label)
      .dropDuplicates("id")
    catalog.replacePartitions(content, st.components,
      partitionBy = Seq("__part"))
  }

  /** Roll forward a tick whose marker survived a crash: the staged
    * artifacts are complete by the marker's contract, so re-apply the
    * four writes with idempotence guards and drop the marker. A crash
    * DURING recovery leaves the marker in place — recovery simply
    * reruns. Called automatically at the head of every tick; safe (and
    * cheap — one existence probe) when there is nothing to recover. */
  def recoverPendingTick(spark: SparkSession, catalog: TableCatalog,
                         st: State,
                         failpoint: String => Unit = _ => ()): Unit =
    if (catalog.exists(spark, tickMarker(st))) {
      val rebuild = catalog.read(spark, tickMarker(st))
        .head().getAs[Boolean]("rebuild")
      applyStagedTick(spark, catalog, st, rebuild, guarded = true, failpoint)
      catalog.drop(spark, tickMarker(st))
    }
}
