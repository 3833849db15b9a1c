package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sim.Vectors
import graft.text.TextFunctions

/** Document deduplication operators for training-data pipelines.
  *
  * Four families, all expressed as declarative plans (no UDFs, no
  * driver-side loops) so they scale by partitioning:
  *
  *  - exact: hash-groupBy on (normalized) content — one shuffle keyed
  *    on a 128-bit fingerprint, the canonical 100 TB exact-dedup plan;
  *  - MinHash + LSH: word-shingles → H minhashes → B bands; candidate
  *    pairs come from equal band signatures (equi-join), never from a
  *    quadratic cross join;
  *  - SimHash: 64-bit sign-aggregated token hash; near-dups are pairs
  *    within Hamming distance `maxHamming`, found by pigeonholing the
  *    64 bits into chunks (a pair within distance d must agree on one
  *    of d+1 chunks);
  *  - embedding cosine: sign-bit LSH buckets over the embedding column,
  *    verified by exact cosine above a threshold.
  */
object Dedup {
  // ------------------------------------------------------------ exact

  /** Exact duplicate groups by normalized fingerprint: one surviving
    * id (min) + group size. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(TextFunctions.fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))

  /** Kept rows after exact dedup (first id per content group wins). */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(docs, idCol, textCol)
      .select(col("keep_id").as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  // ---------------------------------------------------------- minhash

  /** k-word shingles of the token array (distinct). */
  def shingles(textCol: Column, k: Int): Column = {
    val toks = TextFunctions.tokens(textCol)
    array_distinct(
      when(size(toks) < k, array(array_join(toks, " ")))
        .otherwise(transform(sequence(lit(1), size(toks) - k + 1),
          i => array_join(slice(toks, i, lit(k)), " "))))
  }

  /** One minhash value: min over shingles of a seeded 64-bit hash. */
  private def minhash(sh: Column, seed: Int): Column =
    array_min(transform(sh, s => xxhash64(s, lit(seed))))

  /** MinHash signature as `nHashes` columns mh0..mh{n-1} plus band
    * signatures band0..band{b-1} (xxhash of the band's row hashes). */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
                 shingleK: Int = 3, nHashes: Int = 16, bands: Int = 4): DataFrame = {
    val rows = nHashes / bands
    val withSh = docs.select(col(idCol), shingles(col(textCol), shingleK).as("sh"))
    val withMh = (0 until nHashes).foldLeft(withSh) { (d, i) =>
      d.withColumn(s"mh$i", minhash(col("sh"), i))
    }
    (0 until bands).foldLeft(withMh) { (d, b) =>
      val cols = (b * rows until (b + 1) * rows).map(i => col(s"mh$i"))
      d.withColumn(s"band$b", xxhash64(cols: _*))
    }
  }

  /** Candidate near-dup pairs from LSH banding, with the estimated
    * Jaccard (fraction of agreeing minhashes) and the exact shingle-set
    * Jaccard for verification. Pairs are (a < b), distinct. */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 3, nHashes: Int = 16, bands: Int = 4,
                   minJaccard: Double = 0.5): DataFrame = {
    val sig = signatures(docs, idCol, textCol, shingleK, nHashes, bands)
    val bandCols = (0 until bands).map(b => s"band$b")
    val exploded = sig.select(
      (Seq(col(idCol), col("sh")) ++
        (0 until nHashes).map(i => col(s"mh$i"))): _*)
    val banded = bandCols.zipWithIndex.map { case (bc, bi) =>
      sig.select(lit(bi).as("band_no"), col(bc).as("band_sig"), col(idCol))
    }.reduce(_.unionByName(_))
    val l = banded.withColumnRenamed(idCol, "id_a")
    val r = banded.withColumnRenamed(idCol, "id_b")
    val cand = l.join(r, Seq("band_no", "band_sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val la = exploded.toDF(exploded.columns.map(c => s"a_$c"): _*)
    val rb = exploded.toDF(exploded.columns.map(c => s"b_$c"): _*)
    val mhAgree = (0 until nHashes)
      .map(i => when(col(s"a_mh$i") === col(s"b_mh$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(la, col("id_a") === col(s"a_$idCol"))
      .join(rb, col("id_b") === col(s"b_$idCol"))
      .withColumn("est_jaccard", mhAgree / lit(nHashes.toDouble))
      .withColumn("jaccard",
        size(array_intersect(col("a_sh"), col("b_sh"))) /
          size(array_union(col("a_sh"), col("b_sh"))).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("est_jaccard"), col("jaccard"))
  }

  // ---------------------------------------------------------- simhash

  /** Per-token ±1 bit vector of the 64-bit token hash. */
  private def bitVector(t: Column): Column =
    array((0 until 64).map(j =>
      when(shiftright(xxhash64(t), j).bitwiseAND(1) === 1, lit(1L))
        .otherwise(lit(-1L))): _*)

  /** 64-bit SimHash of the token multiset — per-row fold, no shuffle.
    * Two-step (bit sums column, then sign reconstruction) so the bit-sum
    * aggregate appears once in the plan instead of 64 times. */
  def withSimhash(df: DataFrame, textCol: String, out: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val bitSums = aggregate(toks, array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc, bitVector(t), (a, b) => a + b))
    df.withColumn("__bitsums", bitSums)
      .withColumn(out, (0 until 64).map(j =>
        when(element_at(col("__bitsums"), j + 1) > 0, lit(1L << j))
          .otherwise(lit(0L))).reduce(_ + _))
      .drop("__bitsums")
  }

  /** Near-dup pairs within `maxHamming` bits, via chunk pigeonhole:
    * split 64 bits into maxHamming+1 chunks; any qualifying pair agrees
    * exactly on ≥1 chunk, so candidates come from chunk equi-joins. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val nChunks = maxHamming + 1
    val chunkBits = 64 / nChunks
    val sh = withSimhash(docs.select(col(idCol), col(textCol)), textCol, "sim")
      .select(col(idCol), col("sim"))
    val chunked = (0 until nChunks).map { ci =>
      sh.select(lit(ci).as("chunk_no"),
        shiftright(col("sim"), ci * chunkBits)
          .bitwiseAND((1L << chunkBits) - 1).as("chunk_val"),
        col(idCol), col("sim"))
    }.reduce(_.unionByName(_))
    val l = chunked.toDF("chunk_no", "chunk_val", "id_a", "sim_a")
    val r = chunked.toDF("chunk_no", "chunk_val", "id_b", "sim_b")
    l.join(r, Seq("chunk_no", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ----------------------------------------------------- ngram jaccard

  /** Character n-gram set of a text column. */
  def charNgrams(textCol: Column, n: Int): Column = {
    val norm = regexp_replace(lower(textCol), "\\s+", " ")
    array_distinct(transform(
      sequence(lit(1), greatest(length(norm) - n + 1, lit(1))),
      i => norm.substr(i, lit(n))))
  }

  /** Pairs with character-n-gram Jaccard ≥ threshold. Candidates are
    * pre-filtered by minhash banding over the n-gram set (same LSH
    * machinery), keeping the pair generation sub-quadratic. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 5, threshold: Double = 0.6,
                        nHashes: Int = 16, bands: Int = 8): DataFrame = {
    val rows = nHashes / bands
    val base = docs.select(col(idCol), charNgrams(col(textCol), n).as("ng"))
    val withMh = (0 until nHashes).foldLeft(base) { (d, i) =>
      d.withColumn(s"mh$i", minhash(col("ng"), i))
    }
    val banded = (0 until bands).map { b =>
      val cols = (b * rows until (b + 1) * rows).map(i => col(s"mh$i"))
      withMh.select(lit(b).as("band_no"), xxhash64(cols: _*).as("band_sig"),
        col(idCol))
    }.reduce(_.unionByName(_))
    val cand = banded.withColumnRenamed(idCol, "id_a")
      .join(banded.withColumnRenamed(idCol, "id_b"), Seq("band_no", "band_sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(base.select(col(idCol).as("id_a"), col("ng").as("ng_a")), Seq("id_a"))
      .join(base.select(col(idCol).as("id_b"), col("ng").as("ng_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("ng_a"), col("ng_b"))) /
          size(array_union(col("ng_a"), col("ng_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ----------------------------------------------- embedding near-dup

  /** Near-duplicate pairs by embedding cosine ≥ threshold, bucketed by
    * random-hyperplane LSH so the pair join is an equi-join. */
  def embeddingPairs(emb: DataFrame, idCol: String, vecCol: String,
                     threshold: Double = 0.95, nPlanes: Int = 8,
                     dim: Int = 64): DataFrame = {
    val planes = Vectors.seededPlanes(nPlanes, dim)
    val b = emb.select(col(idCol), Vectors.asDouble(col(vecCol)).as("v"))
      .withColumn("bucket", Vectors.hyperplaneBucket(col("v"), planes))
    val l = b.select(col("bucket"), col(idCol).as("id_a"), col("v").as("v_a"))
    val r = b.select(col("bucket"), col(idCol).as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Vectors.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
      .distinct()
  }
}
