package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT edit-distance self-join (fuzzy key matching / entity
  * resolution): every pair of rows whose string column is within
  * `maxDist` Levenshtein edits — without an all-pairs comparison.
  *
  * Blocking is the PassJoin segment pigeonhole (Li, Deng, Feng —
  * PASS-JOIN, VLDB'12; reference behavior: near-dup detection over
  * short keys): split each indexed string into `maxDist + 1` contiguous
  * segments; ≤ `maxDist` edits cannot touch them all, so at least one
  * segment survives VERBATIM in any matching string, at a position
  * shifted by at most `maxDist`. Candidates are therefore an EQUI-JOIN
  * on (source length, segment index, segment text) between index-side
  * segments and probe-side substrings — Catalyst shuffles both sides on
  * the key, never materializing the quadratic pair space. Recall is 1.0
  * by construction (structural, not probabilistic — unlike the MinHash/
  * SimHash family in [[Dedup]]); every candidate is then verified with
  * the early-abandoning `levenshtein(_, _, maxDist)`.
  *
  * Scale shape: probe fan-out is (2d+1)·(d+1)·(2d+1) short substrings
  * per row (75 at d = 2) — linear in corpus size, constant in corpus
  * COUNT², and the candidate join carries ids only; full strings join
  * back for verification afterward. Segment keys start with the
  * source-length column, so length skew (many strings of one length)
  * spreads across segment texts, not one reducer.
  *
  * Degenerate strings (length ≤ maxDist) can have empty segments whose
  * keys would match everything; they are excluded from the index (their
  * pairs with longer strings are still found in the other join
  * direction) and paired directly in a broadcast nano-branch — any two
  * strings of length ≤ d are trivially within d edits of each other.
  */
object FuzzyJoin {

  /** All unordered pairs `(id_a < id_b, dist)` with
    * `levenshtein(s_a, s_b) <= maxDist`. Null or missing strings never
    * pair (no identity, no stable decision — same rule as
    * [[graft.ops.Sampling]]). */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 8,
      s"maxDist must be in [1, 8] (probe fan-out grows cubically), got $maxDist")
    val k = maxDist + 1
    val t = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
      .withColumn("len", length(col("s")))

    // --- index side: the k segments of every non-degenerate string.
    // Even split: segment i has length len/k (+1 for the first len%k
    // segments), starting at i*(len/k) + min(i, len%k).
    val seg = t.filter(col("len") >= k)
      .select(col("id").as("xid"), col("s"), col("len"),
        explode(sequence(lit(0), lit(maxDist))).as("i"))
      .withColumn("li",
        expr(s"len DIV $k") +
          when(col("i") < expr(s"len % $k"), 1).otherwise(0))
      .withColumn("pi",
        col("i") * expr(s"len DIV $k") + least(col("i"), expr(s"len % $k")))
      .select(col("xid"), col("len").as("xlen"), col("i"),
        expr("substring(s, pi + 1, li)").as("sub"))

    // --- probe side: for every candidate indexed length L within ±d,
    // every segment index, every start within the ±d shift window,
    // the substring of that segment's length at that start.
    val probe = t
      .select(col("id").as("pid"), col("s"), col("len"),
        explode(sequence(col("len") - maxDist, col("len") + maxDist)).as("L"))
      .filter(col("L") >= k)
      .select(col("pid"), col("s"), col("len"), col("L"),
        explode(sequence(lit(0), lit(maxDist))).as("i"))
      .withColumn("li",
        expr(s"L DIV $k") + when(col("i") < expr(s"L % $k"), 1).otherwise(0))
      .withColumn("pi",
        col("i") * expr(s"L DIV $k") + least(col("i"), expr(s"L % $k")))
      .withColumn("lo", greatest(col("pi") - maxDist, lit(0)))
      .withColumn("hi", least(col("pi") + maxDist, col("len") - col("li")))
      // an empty window must be dropped BEFORE explode — sequence(lo, hi)
      // with lo > hi runs DESCENDING and would emit out-of-range starts
      .filter(col("li") >= 1 && col("hi") >= col("lo"))
      .select(col("pid"), col("s"), col("L"), col("i"), col("li"),
        explode(sequence(col("lo"), col("hi"))).as("p"))
      .select(col("pid"), col("L").as("xlen"), col("i"),
        expr("substring(s, p + 1, li)").as("sub"))

    // candidate ids only — strings re-join for verification below
    val cand = seg.join(probe, Seq("xlen", "i", "sub"))
      .filter(col("xid") =!= col("pid"))
      .select(least(col("xid"), col("pid")).as("id_a"),
        greatest(col("xid"), col("pid")).as("id_b"))
      .dropDuplicates("id_a", "id_b")

    val verified = cand
      .join(t.select(col("id").as("id_a"), col("s").as("sa")), Seq("id_a"))
      .join(t.select(col("id").as("id_b"), col("s").as("sb")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("sa"), col("sb"), maxDist))
      // the thresholded form returns -1 past the early-abandon bound
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))

    // nano-branch: both strings length <= d are within d edits always
    val shorts = t.filter(col("len") <= maxDist)
    val shortPairs = shorts.select(col("id").as("id_a"), col("s").as("sa"))
      .join(broadcast(shorts.select(col("id").as("id_b"), col("s").as("sb"))),
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("sa"), col("sb")).as("dist"))

    verified.unionByName(shortPairs)
  }
}
