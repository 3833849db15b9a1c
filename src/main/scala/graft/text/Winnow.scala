package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints — the local fingerprinting
  * algorithm of Schleimer, Wilkerson & Aiken (SIGMOD 2003, the MOSS
  * plagiarism detector; public methodology): hash every k-gram, slide
  * a window of `w` consecutive hashes over each document, and in each
  * window select the MINIMUM hash, rightmost occurrence on ties. The
  * guarantee that makes it the standard for substring-level matching:
  * any shared run of at least w+k−1 tokens between two documents is
  * certain to share at least one selected fingerprint, while the
  * expected density of selected positions is only 2/(w+1) — unlike
  * "every j-th hash" schemes, the selection is position-independent,
  * so insertions far away cannot shift which fingerprints a shared
  * passage contributes.
  *
  * Spark shape: positional k-shingles are one generate over a corpus
  * scan ([[Contamination.positionalShingles]] — short docs contribute
  * their whole text as a single position-1 shingle); the window
  * argmin packs `(hash, rightmost-pos)` into ONE long —
  * `code = h40·2^20 + (2^20−1−pos)` — so the per-window reduction is
  * a plain BIGINT `min` (codegen'd, no struct ordering), and the
  * selected hash/position decode by shift/mask afterwards. The only
  * exchange is the per-doc window partition; the algorithm is
  * document-local, so 100 TB parallelizes across docs (positions cap
  * at 2^20 tokens/doc — split longer docs upstream with q35 chunking).
  *
  * Determinism: the k-gram hash is the house FNV-1a/fmix64 token hash
  * (the one every oracle replays in HUGEINT), reduced mod 2^40 —
  * `pmod` on the signed long equals unsigned mod because 2^64 ≡ 0
  * (mod 2^40). All-integer; no floats anywhere. */
object Winnow {
  private val PosBits = 20
  private val PosMask = (1L << PosBits) - 1

  /** Per document, the winnowed fingerprint set: one row per selected
    * `(pos, fp)` — `pos` the 1-based position of the selected k-gram,
    * `fp` its 40-bit hash. Windows shorter than `w` only exist for
    * documents with fewer than `w` k-grams, which emit the argmin of
    * what they have (one complete window over the whole doc). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 3, window: Int = 4): DataFrame = {
    require(window >= 1, s"winnowing needs a positive window: $window")
    val base = Contamination.tokenized(docs, idCol, textCol)
    val sh = Contamination.positionalShingles(base, idCol, shingleK)
    val h40 = pmod(graft.functions.exprs.token_hash64(col("shingle")),
      lit(1L << 40))
    // positions beyond 2^20 would silently borrow into the hash bits
    // of the packed code (BOTH engines reproduce the corruption, so
    // the oracle could not catch it) — fail loudly instead; q35
    // chunking is the upstream answer for mega-token documents
    val packed = sh.select(col(idCol), col("i"),
      when(col("i") > lit(PosMask),
        raise_error(lit("winnow: document exceeds 2^20 k-grams — " +
          "chunk it upstream (q35) before fingerprinting"))
          .cast("long"))
        .otherwise(h40 * lit(1L << PosBits) + (lit(PosMask) - col("i")))
        .as("code"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("i"))
      .rowsBetween(-(window - 1), Window.currentRow)
    val seq = Window.partitionBy(col(idCol)).orderBy(col("i"))
    val part = Window.partitionBy(col(idCol))
    packed
      .withColumn("sel", min(col("code")).over(win))
      .withColumn("rn", row_number().over(seq))
      .withColumn("tot", count(lit(1)).over(part))
      // complete windows only; a short doc's single complete window
      // is its last row
      .filter(col("rn") >= least(lit(window.toLong), col("tot")))
      .select(col(idCol),
        (lit(PosMask) - pmod(col("sel"), lit(1L << PosBits)))
          .cast("int").as("pos"),
        shiftright(col("sel"), PosBits).as("fp"))
      .distinct()
  }

  /** Winnowing as a DEDUP CANDIDATE GENERATOR — what MOSS actually
    * does with the fingerprints: documents sharing ≥ `minShared`
    * selected fingerprints are substring-overlap candidates, found by
    * a fingerprint-keyed self-join instead of any pairwise scan. The
    * guarantee transfers: two documents sharing a run of ≥ w+k−1
    * tokens share ≥ 1 fingerprint, so `minShared = 2` already demands
    * two independent shared regions (or one long one) — far stronger
    * evidence than one hash collision.
    *
    * Scale shape: exactly the [[graft.sim.Ann.knnJoin]] bucket
    * discipline — distinct (fp, doc) rows, a flood cap excluding
    * fingerprints carried by > `maxCarrier` docs (ubiquitous
    * boilerplate shingles would emit carrier² pairs; the cap list is
    * corpus-derived and joins hint-free so AQE broadcasts it only
    * when small), unordered pairs (id_a < id_b), one count aggregate.
    * Pair mass is the fingerprint collision mass, never |docs|². */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     shingleK: Int = 3, window: Int = 4,
                     minShared: Int = 2, maxCarrier: Int = 10000): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol, shingleK, window)
      .select(col("fp"), col(idCol)).distinct()
    val survivors = fp.groupBy(col("fp"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxCarrier)
      .select(col("fp"))
    val capped = fp.join(survivors, Seq("fp"))
    capped.select(col("fp"), col(idCol).as("id_a"))
      .join(capped.select(col("fp"), col(idCol).as("id_b")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
