package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** dedup.Dedup: exact, MinHash-LSH, SimHash, n-gram Jaccard. */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 1
    (3L, "THE  quick   brown fox jumps over the lazy dog near the river bank"), // exact after norm of 1
    (4L, "completely different text about spark query engines and shuffles"),
    (5L, "the quick brown fox jumps over the lazy dog near the river bank"), // verbatim dup of 1
  ).toDF("doc_id", "text")

  test("exactGroups groups normalized-identical docs, keeps min id") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
    assert(g.count() == 3) // {1,3,5} collapse
    val grp = g.filter(col("n_docs") === 3).head()
    assert(grp.getAs[Long]("keep_id") == 1L)
  }

  test("exactDedup keeps first id per content group") {
    val kept = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 4L))
  }

  test("minhashPairs surfaces the planted near-dup and not the unrelated doc") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        shingleK = 2, nHashes = 16, bands = 8, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("minhash jaccard: verbatim dup scores 1.0, case-variant stays high") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        shingleK = 2, nHashes = 16, bands = 8, minJaccard = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard"))).toMap
    assert(pairs((1L, 5L)) == 1.0)
    pairs.get((1L, 3L)).foreach(j => assert(j > 0.7)) // only 'THE' shingles differ
  }

  test("simhash: verbatim dup collides at hamming 0, near-dups stay close") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 16)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Int]("hamming"))).toMap
    assert(pairs((1L, 5L)) == 0)
    assert(pairs.get((1L, 2L)).exists(_ <= 16))
  }

  test("ngramJaccardPairs: normalized-identical pair scores 1.0") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 4,
        threshold = 0.5, nHashes = 16, bands = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard"))).toMap
    assert(pairs((1L, 3L)) == 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("degenerate 1e5-row flood bucket is dropped, not single-task-expanded") {
    // 100k identical docs collide into one bucket per chunk; with the
    // default maxBucket those buckets exceed the recall bound and must
    // be skipped — completing quickly instead of expanding ~5e9 pairs
    // (the old collect_list expansion built them inside ONE row)
    val flood = spark.range(100000)
      .select(col("id").as("doc_id"),
        lit("identical degenerate document text for every single row").as("text"))
    assert(Dedup.simhashPairs(flood, "doc_id", "text", maxHamming = 3).isEmpty)
  }

  test("sub-cap bucket still expands all pairs via the self-join") {
    val dup = spark.range(200)
      .select(col("id").as("doc_id"),
        lit("same text repeated across a moderate bucket").as("text"))
    val n = Dedup.simhashPairs(dup, "doc_id", "text", maxHamming = 3).count()
    assert(n == 200L * 199 / 2, s"expected all C(200,2) pairs, got $n")
  }

  test("exactNgramJaccardPairs equals the brute-force all-pairs join") {
    // ground truth: unfiltered cross join + exact jaccard, on the real
    // sf documents table (50 docs at sf0.001 — cheap to brute-force)
    val d = Tables.documents(spark, sf)
    val sets = d.select(col("doc_id").as("id"),
      Dedup.charNgrams(col("text"), 5).as("set"))
    val a = sets.select(col("id").as("id_a"), col("set").as("set_a"))
    val b = sets.select(col("id").as("id_b"), col("set").as("set_b"))
    val truth = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        graft.functions.exprs.jaccard_sim(col("set_a"), col("set_b")))
      .filter(col("jaccard") >= 0.4)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = Dedup.exactNgramJaccardPairs(d, "doc_id", "text", n = 5,
        threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == truth, s"prefix filter lost ${truth -- got} / invented ${got -- truth}")
    assert(truth.nonEmpty, "testdata should contain at least one near-dup pair")
  }

  test("exactSimilarityPairs: tiny sets and threshold-boundary pairs survive") {
    // sets of size 1-2 stress the prefix-length arithmetic
    // (|X| - ceil(t|X|) + 1 must stay >= 1), and a pair at exactly the
    // threshold must be kept (>= semantics)
    val rows = Seq(
      (1L, Seq("a")), (2L, Seq("a")),           // identical singletons, J=1
      (3L, Seq("a", "b")), (4L, Seq("b", "c")), // J(3,4) = 1/3 — out
      (5L, Seq("x", "y", "z")), (6L, Seq("x", "y", "w")), // J = 2/4 = 0.5 exactly
    ).toDF("id", "set")
    val got = Dedup.exactSimilarityPairs(rows, "id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // J(1,3) = J(2,3) = 1/2 — singleton-vs-pair boundary pairs count too
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (5L, 6L)))
  }

  test("connectedComponents labels every node with its component min") {
    // chain 1-2-3-4 (diameter 3, needs iteration), clique {10,11,12},
    // isolated pair {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents refuses to return partial components") {
    // path of length 5 cannot settle in 2 min-propagation rounds
    val longChain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("id_a", "id_b")
    intercept[IllegalArgumentException](
      Dedup.connectedComponents(longChain, maxIter = 2))
  }

  test("incrementalSimilarityPairs == full join restricted to batch-touching pairs") {
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"), Dedup.charNgrams(col("text"), 5).as("set"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = pairs(Dedup.exactSimilarityPairs(sets, "doc_id", 0.4))
    val expected = full.filter(p => p._1 % 5 == 0 || p._2 % 5 == 0)
    val inc = pairs(Dedup.incrementalSimilarityPairs(
      sets.filter(col("doc_id") % 5 =!= 0),
      sets.filter(col("doc_id") % 5 === 0), "doc_id", 0.4))
    assert(inc == expected)
    assert(expected.nonEmpty, "trivially-true test — pick a batch that has pairs")
    assert(inc.size < full.size, "batch restriction must prune something")
  }

  test("incrementalSimilarityPairs: lazy path matches eager; empty batch is empty") {
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"), Dedup.charNgrams(col("text"), 5).as("set"))
    val corpus = sets.filter(col("doc_id") % 5 =!= 0)
    val batch = sets.filter(col("doc_id") % 5 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(_.toSeq).toSet
    val eager = pairs(Dedup.incrementalSimilarityPairs(corpus, batch, "doc_id", 0.4))
    val lazyP = pairs(Dedup.incrementalSimilarityPairs(corpus, batch, "doc_id", 0.4,
      eager = false))
    assert(lazyP == eager && eager.nonEmpty)
    val emptyBatch = batch.filter(lit(false))
    assert(Dedup.incrementalSimilarityPairs(corpus, emptyBatch, "doc_id", 0.4)
      .count() == 0)
  }

  test("semanticPairs: tight duplicate balls — recall 1.0 at single-probe cost") {
    // SemDeDup's actual regime: clusters of near-identical vectors
    // (cos ≥ 0.99 within a ball, ≈ 0.06 across). Near-identical
    // vectors rank centroids identically, so a ball never splits
    // across cells — probes = 1 suffices, unlike the weak cos-0.3
    // regime docs/RECALL.md measures (where probes buy recall back).
    val dim = 16
    // ids member-major so the lowest-id Lloyd init picks one vector
    // from 8 DIFFERENT balls (ball-major ids would seed three
    // duplicate centroids inside ball 0 and split it — the degenerate
    // init k-means++-style seeding avoids; spreading ids is this
    // test's equivalent)
    val rows = for (ball <- 0 until 10; m <- 0 until 3) yield {
      val v = Array.fill(dim)(0.0f)
      v(ball) = 1.0f
      v((ball + 1) % dim) = 0.02f * (m + 1) // tiny per-member jitter
      ((m * 10 + ball + 1).toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val truth = (for (b <- 0 until 10; i <- 0 until 3; j <- (i + 1) until 3)
      yield ((i * 10 + b + 1).toLong, (j * 10 + b + 1).toLong)).toSet
    val found = Dedup.semanticPairs(emb, "vec_id", "embedding",
        threshold = 0.95, nClusters = 8, iters = 2, probes = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(found == truth) // recall 1.0 AND precision 1.0
  }

  test("semanticDedup keeps the lowest id of each similar pair") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.01f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val kept = Dedup.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.99, nClusters = 2, iters = 1, probes = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("embeddingPairs finds the planted duplicate vector") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.01f, 0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.5f, 0.5f, 0.0f))).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(emb, "vec_id", "embedding",
        threshold = 0.99, planesPerBand = 2, bands = 4, dim = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("containmentPairs: excerpt found where symmetric Jaccard misses") {
    import org.apache.spark.sql.functions._
    // doc 1 = {a,b,c}; doc 2 ⊇ doc 1 with 7 extra grams: containment
    // 1→2 is 3/3 = 1.0 while Jaccard is 3/10 — far below any usable
    // symmetric threshold. doc 3 shares one gram with 1 (1/3 < 3/5).
    def set(ts: String*) = ts.toArray
    val base = Seq(
      (1L, set("a", "b", "c")),
      (2L, set("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")),
      (3L, set("a", "x", "y"))).toDF("doc_id", "set")
    val r = Dedup.containmentPairs(base, base, "doc_id", tNum = 3, tDen = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    // only 1→2 passes: full containment, exact fp
    assert(r == Map((1L, 2L) -> ((3L, 3L, 1000000L))))
    // directionality: 2→1 is 3/10 < 3/5, absent — asymmetric indeed
    assert(!r.contains((2L, 1L)))
    // boundary: ovl·tDen == tNum·sz passes exactly (3/5 of 5 = 3)
    val edge = Seq(
      (1L, set("a", "b", "c", "d", "e")),
      (2L, set("a", "b", "c", "q", "r", "s", "t"))).toDF("doc_id", "set")
    val e = Dedup.containmentPairs(edge, edge, "doc_id", 3, 5)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(4)).toMap
    assert(e == Map((1L, 2L) -> 600000L))
    // batch-vs-corpus shape: restricting the inner side restricts
    // DIRECTIONS, not the corpus evidence — and an inner doc whose
    // grams are unseen in the corpus (df 0) must not crash the prefix
    val batch = Seq((1L, set("a", "b", "c")), (9L, set("zz", "qq", "uu")))
      .toDF("doc_id", "set")
    val bc = Dedup.containmentPairs(batch, base, "doc_id", 3, 5)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(bc == Set((1L, 2L))) // 1 contained in corpus doc 2; 9 nowhere
  }

  test("containmentPairs: wide df-degenerate vocabulary ranks exactly; duplicate elements count once") {
    import org.apache.spark.sql.functions._
    // 2,000-word vocabulary where ~all dfs tie at 1 (the word-gram
    // long-tail shape that collapses a df-keyed bucket split): 20
    // disjoint 50-word hosts, each with a 25-word excerpt. The
    // two-phase rank must stay exact — every excerpt→host pair at
    // containment 1.0, hosts themselves 25/50 = 0.5 < 3/5 in the
    // reverse direction, cross-family pairs impossible (disjoint).
    val hosts = (0 until 20).map { i =>
      (100L + i, (0 until 50).map(j => s"w${i * 100 + j}").toArray)
    }
    val excerpts = (0 until 20).map { i =>
      (i.toLong, (0 until 25).map(j => s"w${i * 100 + j}").toArray)
    }
    // duplicated elements behave as their distinct set (set semantics):
    // host 100's first 25 words, each twice — sz_inner 25, fp exact 1.0
    val dup = Seq((500L,
      (0 until 25).flatMap(j => Seq(s"w$j", s"w$j")).toArray))
    val d = (hosts ++ excerpts ++ dup).toDF("doc_id", "set")
    val r = Dedup.containmentPairs(d, d, "doc_id", tNum = 3, tDen = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    val expected =
      (0 until 20).map(i => (i.toLong, 100L + i) ->
        ((25L, 25L, 1000000L))).toMap ++
      // dup doc ≡ excerpt 0's set: contained in host 100, and mutually
      // containment-1.0 with excerpt 0 (both directions)
      Map((500L, 100L) -> ((25L, 25L, 1000000L)),
        (500L, 0L) -> ((25L, 25L, 1000000L)),
        (0L, 500L) -> ((25L, 25L, 1000000L)))
    assert(r == expected)
  }

  test("sorted_intersect_count kernel ≡ array_intersect size on sorted distinct sets") {
    import graft.functions.exprs
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Array(1, 3, 5, 9), Array(2, 3, 4, 5, 10)),
      (Array(1, 2, 3), Array(1, 2, 3)),
      (Array(7, 8), Array(1, 2)),
      (Array[Int](), Array(1, 2)),
      (Array(-5, 0, 4), Array(-5, 4))).toDF("a", "b")
    df.select(
        exprs.sorted_intersect_count(col("a"), col("b")).as("k"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("h"))
      .collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("excerptDedup: drops the quote keeps the page; equal sets keep min id; chains scrub") {
    import org.apache.spark.sql.functions._
    def set(ts: String*) = ts.toArray
    def kept(d: org.apache.spark.sql.DataFrame, t: (Long, Long)) =
      Dedup.excerptDedup(d, "doc_id", t._1, t._2)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    // excerpt 1 ⊂ page 2 at containment 1.0: quote dropped, page kept;
    // doc 3 shares one gram (1/3 < 3/5) — untouched
    val base = Seq(
      (1L, set("a", "b", "c")),
      (2L, set("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")),
      (3L, set("a", "x", "y"))).toDF("doc_id", "set")
    assert(kept(base, (3L, 5L)) == Set(2L, 3L))
    // identical sets: mutual containment 1.0 both ways — exactly ONE
    // survives, the smaller id (the tie rule), never zero
    val twins = Seq((7L, set("p", "q", "r")), (4L, set("p", "q", "r")))
      .toDF("doc_id", "set")
    assert(kept(twins, (3L, 5L)) == Set(4L))
    // chain A ⊂ B ⊂ C: A and B both drop (A on its own (A,C) or (A,B)
    // evidence), C alone survives
    val chain = Seq(
      (1L, set("a", "b", "c")),
      (2L, set("a", "b", "c", "d", "e")),
      (3L, set("a", "b", "c", "d", "e", "f", "g"))).toDF("doc_id", "set")
    assert(kept(chain, (3L, 5L)) == Set(3L))
    // empty sets never pair — they survive (an empty doc is no excerpt)
    val withEmpty = base.union(Seq((9L, Array.empty[String]))
      .toDF("doc_id", "set"))
    assert(kept(withEmpty, (3L, 5L)) == Set(2L, 3L, 9L))
  }

  test("containmentPairsSketch: capped prefix equals exact below the cap, catches excerpts above it") {
    import org.apache.spark.sql.functions._
    def set(ts: String*) = ts.toArray
    // small docs (prefix <= k): the capped form must be BIT-IDENTICAL
    // to the exact gate — the guaranteed-recall regime
    val base = Seq(
      (1L, set("a", "b", "c")),
      (2L, set("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")),
      (3L, set("a", "x", "y"))).toDF("doc_id", "set")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    val exact = rows(Dedup.containmentPairs(base, base, "doc_id", 3, 5))
    val capped = rows(Dedup.containmentPairsSketch(base, base, "doc_id",
      3, 5, sketchK = 32))
    assert(capped == exact && exact.contains((1L, 2L)))
    // large excerpt: 100-gram doc fully contained in a 400-gram doc.
    // Exact prefix would be 41 grams; cap 8 keeps only the 8 rarest —
    // the excerpt is still found because its grams ARE the host's
    val big = (0 until 100).map(i => f"g$i%03d")
    val host = (0 until 400).map(i => f"g$i%03d")
    val docs = Seq((10L, big.toArray), (20L, host.toArray))
      .toDF("doc_id", "set")
    val r = rows(Dedup.containmentPairsSketch(docs, docs, "doc_id", 3, 5,
      sketchK = 8))
    assert(r((10L, 20L)) == ((100L, 100L, 1000000L)))
    assert(!r.contains((20L, 10L))) // 100/400 = 1/4 < 3/5
    // cap actually bites: candidate keys per doc are bounded by k, so
    // a doc sharing ONLY non-rarest grams can be missed — construct
    // the adversarial miss to pin the documented semantics. Inner doc
    // 30: 10 grams, 6 shared with host 40 (containment 3/5 exactly).
    // The 4 unshared grams are UNIQUE (df 1 — rarest), so with k = 4
    // the whole prefix is unshared and no candidate forms.
    val sharedSix = (0 until 6).map(i => s"s$i")
    val uniqueFour = (0 until 4).map(i => s"u$i")
    val filler = (0 until 50).map(i => s"f$i")
    val adv = Seq((30L, (sharedSix ++ uniqueFour).toArray),
      (40L, (sharedSix ++ filler).toArray)).toDF("doc_id", "set")
    val exactAdv = rows(Dedup.containmentPairs(adv, adv, "doc_id", 3, 5))
    assert(exactAdv.contains((30L, 40L)))
    val missed = rows(Dedup.containmentPairsSketch(adv, adv, "doc_id",
      3, 5, sketchK = 4))
    assert(!missed.contains((30L, 40L)))
    // ...and a cap at the exact prefix width restores the guarantee
    // (prefix = 10 - 6 + 1 = 5)
    val healed = rows(Dedup.containmentPairsSketch(adv, adv, "doc_id",
      3, 5, sketchK = 5))
    assert(healed.contains((30L, 40L)))
  }

  test("containment: self-join encode reuse is output-identical to the two-object form") {
    import org.apache.spark.sql.functions._
    // the engine encodes ONCE when inner IS outer (reference
    // equality); passing an equal-but-distinct frame takes the
    // two-encode path — both must produce the same directed pairs,
    // sizes, overlaps and fingerprints
    def set(ts: String*) = ts.toArray
    val base = Seq(
      (1L, set("a", "b", "c")),
      (2L, set("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")),
      (3L, set("a", "x", "y")),
      (4L, set("d", "e", "f", "g", "h"))).toDF("doc_id", "set")
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).toSet
    assert(rows(Dedup.containmentPairs(base, base, "doc_id", 3, 5)) ==
      rows(Dedup.containmentPairs(base, base.toDF(), "doc_id", 3, 5)))
    assert(rows(Dedup.containmentPairsSketch(base, base, "doc_id", 3, 5,
        sketchK = 2)) ==
      rows(Dedup.containmentPairsSketch(base, base.toDF(), "doc_id", 3, 5,
        sketchK = 2)))
  }
}
