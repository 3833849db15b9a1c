package graft

import graft.sim.{Ann, Vectors}

/** sim.Ann.knnJoinScaled: the production LSH sizing rule (one extra
  * hyperplane per corpus doubling past refSize — BENCH_SF1 measured
  * exponent 0.83 vs 1.35 fixed). Pins the integer doubling rule the
  * q188 oracle replays in SQL, the seeded-plane prefix property the
  * dynamic-r bucket mask depends on, and below-reference identity
  * with the fixed-plane form. */
class KnnScaledSpec extends SparkTestBase {

  test("planeDoublings: integer rule, exact at powers of two") {
    // n <= refSize (including the exact boundary) adds nothing
    assert(Ann.planeDoublings(0L, 2000L) == 0)
    assert(Ann.planeDoublings(1999L, 2000L) == 0)
    assert(Ann.planeDoublings(2000L, 2000L) == 0)
    // one past the boundary starts the ladder; exact doublings sit on
    // the closed side (refSize*2^e >= n), where a float
    // ceil(log2(n/ref)) could round either way
    assert(Ann.planeDoublings(2001L, 2000L) == 1)
    assert(Ann.planeDoublings(4000L, 2000L) == 1)
    assert(Ann.planeDoublings(4001L, 2000L) == 2)
    assert(Ann.planeDoublings(16000L, 2000L) == 3)
    assert(Ann.planeDoublings(20000L, 2000L) == 4)
    // capped so a pathological count cannot demand >35 sign bits
    assert(Ann.planeDoublings(Long.MaxValue, 1L) == 32)
    // refSize >= 2^32: the old (refSize << e) form wrapped negative at
    // high e, making the loop run to the 32 cap instead of stopping
    val big = 1L << 33
    assert(Ann.planeDoublings(big, big) == 0)
    assert(Ann.planeDoublings(big + 1, big) == 1)
    assert(Ann.planeDoublings(4 * big, big) == 2)
    assert(Ann.planeDoublings(Long.MaxValue, Long.MaxValue) == 0)
  }

  test("matryoshkaRecall: empty corpus emits zero rows (not a div-by-zero)") {
    import spark.implicits._
    val e = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    assert(graft.sim.Ann.matryoshkaRecall(e, dims = Seq(1, 2), k = 1)
      .collect().isEmpty)
  }

  test("seeded planes are a per-table LCG prefix: planes(12).take(3) == planes(3)") {
    // the q188 oracle generates the 12-plane prefix and masks buckets
    // down to r bits — sound ONLY if the first r planes of a larger
    // generation are bit-identical to a generation of exactly r
    for (t <- 0 until 4) {
      val big = Vectors.seededPlanes(12, 64, seed = 42L + t)
      val small = Vectors.seededPlanes(3, 64, seed = 42L + t)
      assert(big.take(3) == small, s"table $t")
    }
  }

  test("below refSize the scaled form is bit-identical to knnJoin") {
    val e = Tables.embeddings(spark, sf) // 500 vectors << 2000
    val scaled = Ann.knnJoinScaled(e, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    val fixed = Ann.knnJoin(e, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(scaled == fixed)
    assert(scaled.nonEmpty)
  }

  test("past refSize the plane count rises and candidate mass falls") {
    val e = Tables.embeddings(spark, sf)
    // 500 vectors with refSize=100 → doublings(500,100)=3 → 6 planes.
    // Prefix planes mean 6-bit bucket agreement IMPLIES 3-bit bucket
    // agreement, so the scaled candidate set is a strict refinement of
    // the fixed one. k=499 (= n-1) makes the fixed output the FULL
    // candidate edge set, against which subset/shrinkage are valid
    // claims (top-5 of a sparser set needn't subset top-5 of a denser
    // one, so the comparison must be against all candidates).
    val scaledAll = Ann.knnJoinScaled(e, k = 499, refSize = 100L)
    val fixedAll = Ann.knnJoin(e, k = 499)
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vec_id", "sim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sKeys = keys(scaledAll)
    val fKeys = keys(fixedAll)
    assert(sKeys.nonEmpty)
    assert(sKeys.subsetOf(fKeys)) // same sims on shared edges, too
    assert(sKeys.size < fKeys.size)
  }

  test("matryoshkaRecall: hand-computed prefix inversion; full width reads 1.0") {
    import spark.implicits._
    // 2-D corpus where the 1-D prefix inverts one neighbor: full top-1
    // is 0→1, 1→0, 2→1; at d=1 vector 2 ties (-1 cosine to both) and
    // id ASC picks 0 instead → hits 2/3 = 666666 in 1e-6 units
    val e = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)),
      (2L, Seq(-1.0, 5.0))).toDF("vec_id", "embedding")
    val r = graft.sim.Ann.matryoshkaRecall(e, dims = Seq(1, 2), k = 1)
      .collect().map(x => x.getInt(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1) == ((3L, 2L, 666666L)))
    assert(r(2) == ((3L, 3L, 1000000L)))
  }

  test("matryoshkaRecall on real embeddings: full-dim row exact 1.0, prefixes bounded") {
    val e = Tables.embeddings(spark, sf).filter(
      org.apache.spark.sql.functions.col("vec_id") % 5 === 0)
    val rows = graft.sim.Ann.matryoshkaRecall(e, Seq(8, 64), k = 5)
      .collect().map(x => x.getInt(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    val (nq, hits64, r64) = rows(64)
    assert(r64 == 1000000L && hits64 == 5 * nq)
    val (_, hits8, r8) = rows(8)
    assert(hits8 <= hits64 && r8 <= 1000000L && r8 >= 0L)
  }
}
