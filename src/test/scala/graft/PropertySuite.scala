package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import graft.etl.{Cleanse, Star}
import graft.ops.Exact

/** Property-based invariants (SURVEY.md §5.2): dedup idempotence,
  * union-by-name stability, exact-sum order independence, anti-join
  * disjointness. Run by sbt's native ScalaCheck framework. */
object PropertySuite extends Properties("graft") {
  // 30 generated cases per property: each case runs 1-3 Spark actions,
  // so the default 100 adds minutes of wall time for no extra coverage
  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(30)

  private lazy val spark: SparkSession = TestSessions.spark
  import spark.implicits._

  private val smallInts = Gen.listOfN(30, Gen.choose(-50, 50))

  property("dedup is idempotent and yields distinct rows") =
    Prop.forAll(smallInts) { xs =>
      val df = xs.toDF("v")
      val once = Cleanse.dedup(df)
      val twice = Cleanse.dedup(once)
      once.count() == xs.distinct.size && twice.count() == once.count()
    }

  property("unionConformed is column-order independent") =
    Prop.forAll(smallInts) { xs =>
      val a = xs.map(x => (x, x.toString)).toDF("k", "v")
      val b = xs.map(x => (x.toString, x)).toDF("v", "k")
      Cleanse.unionConformed(Seq(a, b)).count() == 2L * xs.size
    }

  property("sumMoney is exact under any repartitioning") =
    Prop.forAll(Gen.listOfN(50, Gen.choose(-1000000L, 1000000L)),
        Gen.choose(1, 7)) { (cents, parts) =>
      val vals = cents.map(_ / 100.0)
      val got = vals.toDF("v").repartition(parts)
        .agg(Exact.sumMoney(col("v"))).head().getDouble(0)
      got == cents.sum / 100.0
    }

  property("newKeys is disjoint from the dim and covers fresh \\ dim") =
    Prop.forAll(smallInts, smallInts) { (fresh, dim) =>
      val novel = Star.newKeys(fresh.toDF("k"), dim.toDF("k"), "k")
        .as[Int].collect().toSet
      novel == (fresh.toSet -- dim.toSet)
    }

  // Soundness armor for the AllPairs prefix + PPJoin positional filter:
  // on random corpora the exact join must equal the brute-force answer
  // EXACTLY — any over-eager prune (prefix too short, positional bound
  // too tight, float edge at the size filter) shows up as a lost pair.
  property("exactSimilarityPairs == brute-force Jaccard join") = {
    val genDoc = Gen.nonEmptyListOf(Gen.choose(0, 12)).map(_.distinct)
    val genCorpus = Gen.listOfN(8, genDoc)
    val genT = Gen.oneOf(0.3, 0.5, 0.75, 1.0)
    Prop.forAll(genCorpus, genT) { (docs, t) =>
      val rows = docs.zipWithIndex.map { case (d, i) =>
        (i.toLong, d.map(_.toString))
      }
      val df = rows.toDF("id", "set")
      val got = graft.dedup.Dedup.exactSimilarityPairs(df, "id", t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val want = (for {
        a <- rows; b <- rows if a._1 < b._1
        inter = a._2.toSet.intersect(b._2.toSet).size
        union = a._2.toSet.union(b._2.toSet).size
        if union > 0 && inter.toDouble / union >= t
      } yield (a._1, b._1)).toSet
      got == want
    }
  }

  property("dedupByFingerprint == dropDuplicates on nullable rows") =
    Prop.forAll(Gen.listOfN(25,
        Gen.zip(Gen.option(Gen.choose(0, 3)), Gen.option(Gen.oneOf("a", "b"))))) {
      rows =>
        val df = rows.toDF("x", "y")
        val got = Cleanse.dedupByFingerprint(df)
          .collect().map(r => (r.get(0), r.get(1))).toSet
        got == rows.toSet.map { p: (Option[Int], Option[String]) =>
          (p._1.map(Int.box).orNull, p._2.orNull)
        }
    }

  property("durationSeconds is non-negative when end >= start") =
    Prop.forAll(Gen.choose(0L, 1700000000L), Gen.choose(0L, 100000L)) {
      (start, delta) =>
        val df = Seq((new java.sql.Timestamp(start * 1000),
          new java.sql.Timestamp((start + delta) * 1000))).toDF("s", "e")
        df.select(Cleanse.durationSeconds(col("s"), col("e")))
          .head().getLong(0) == delta
    }

  property("bin-blocked range join == naive theta join, any bin width") =
    Prop.forAll(
      Gen.listOfN(25, Gen.choose(-200L, 200L)),
      Gen.listOfN(10, for {
        s <- Gen.choose(-200L, 200L); len <- Gen.choose(0L, 120L)
      } yield (s, s + len)),
      Gen.oneOf(1L, 7L, 64L, 1000L)) { (ts, ivals, w) =>
      val points = ts.zipWithIndex.map { case (t, i) => (t, i.toLong) }
        .toDF("t", "pid")
      val intervals = ivals.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("iid", "s", "e")
      val naive = points.join(intervals,
          col("t") >= col("s") && col("t") < col("e"))
        .select("pid", "iid").collect().map(_.toSeq).toSet
      val binned = graft.ops.RangeJoin.pointInInterval(points, intervals,
          col("t"), col("s"), col("e"), binWidth = w)
        .select("pid", "iid").collect().map(_.toSeq).toSet
      binned == naive
    }

  property("top_k aggregate == sort-take, any partitioning") =
    Prop.forAll(
      Gen.listOfN(40, Gen.zip(Gen.choose(0, 3), Gen.choose(-100L, 100L))),
      Gen.choose(1, 6), Gen.choose(1, 5)) { (rows, k, parts) =>
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (s"g$g", v, i.toLong) }
        .toDF("g", "v", "id")
        .repartition(parts)
      val got = df.groupBy("g")
        .agg(graft.functions.aggs.top_k(struct(col("v"), col("id")), k).as("t"))
        .select(col("g"), explode(col("t")).as("x"))
        .select(col("g"), col("x.v"), col("x.id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toList).toMap
      val want = rows.zipWithIndex
        .map { case ((g, v), i) => (s"g$g", v, i.toLong) }
        .groupBy(_._1).view.mapValues(
          _.map(x => (x._2, x._3)).sorted.reverse.take(k).toList).toMap
      got == want
    }

  // Count-Min soundness on random token streams: every estimate
  // upper-bounds its exact count (the sketch's one-sided guarantee),
  // and the grid is invariant under repartitioning (merge order).
  property("cm sketch estimates upper-bound exact counts") = {
    val word = Gen.oneOf("a", "b", "c", "dd", "ee", "f", "g", "h")
    Prop.forAll(Gen.listOfN(60, word), Gen.choose(1, 5)) { (ws, parts) =>
      val df = ws.toDF("token")
      val sk = df.repartition(parts)
        .agg(graft.functions.aggs.cm_sketch(col("token"), 4, 256).as("sk"))
      val got = df.distinct().crossJoin(broadcast(sk))
        .select(col("token"),
          graft.ops.Sketches.cmEstimate(col("sk"), col("token"), 4, 256))
        .as[(String, Long)].collect().toMap
      val exact = ws.groupBy(identity).view.mapValues(_.size.toLong).toMap
      exact.forall { case (t, c) => got(t) >= c }
    }
  }

  // phraseScrub soundness vs a literal reference model: remove the
  // union of all matched spans, rejoin the rest — on dense repeating
  // corpora where overlaps are the norm.
  property("phraseScrub == reference span-removal on random corpora") = {
    val word = Gen.oneOf("a", "b", "c")
    Prop.forAll(Gen.listOfN(4, Gen.listOfN(10, word)),
        Gen.choose(1, 3).flatMap(m => Gen.listOfN(m, word))) {
      (docs, phrase) =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val q = Seq((0L, phrase.mkString(" "))).toDF("qid", "qtext")
      val got = graft.text.Retrieval.phraseScrub(df, "doc_id", "text", q)
        .as[(Long, String, Long)].collect().toSet
      val want = docs.zipWithIndex.map { case (ws, i) =>
        val starts = ws.indices.filter(s =>
          s + phrase.length <= ws.length &&
            ws.slice(s, s + phrase.length) == phrase)
        val drop = starts.flatMap(s => s until s + phrase.length).toSet
        val keep = ws.indices.filterNot(drop).map(ws)
        (i.toLong, keep.mkString(" "), drop.size.toLong)
      }.toSet
      got == want
    }
  }

  // Soundness armor for the votes-per-start phrase matcher: on random
  // corpora over a 3-token alphabet (dense with repeats and overlaps —
  // the adversarial regime for positional logic) the join+aggregate
  // must equal a literal sliding-window scan exactly.
  property("phraseSearch == sliding-window scan on random corpora") = {
    val word = Gen.oneOf("a", "b", "c")
    val genDoc = Gen.listOfN(12, word)
    Prop.forAll(Gen.listOfN(5, genDoc),
        Gen.choose(1, 3).flatMap(m => Gen.listOfN(m, word))) {
      (docs, phrase) =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val q = Seq((0L, phrase.mkString(" "))).toDF("qid", "qtext")
      val got = graft.text.Retrieval
        .phraseSearchInline(df, "doc_id", "text", q)
        .select("doc_id", "n_occurrences", "first_pos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val want = docs.zipWithIndex.flatMap { case (ws, i) =>
        val starts = ws.indices
          .filter(s => s + phrase.length <= ws.length &&
            ws.slice(s, s + phrase.length) == phrase)
        if (starts.isEmpty) None
        else Some((i.toLong, starts.length.toLong, starts.min.toLong))
      }.toSet
      got == want
    }
  }

  // The canonicalizer must be a PROJECTION onto its own image:
  // normalizing twice changes nothing (dedup pipelines rely on this —
  // a canonical form that isn't a fixed point re-dedups differently
  // on re-ingest), and the output never carries the artifacts the
  // kernel claims to remove.
  property("normalize_text is idempotent; output has no uppercase/ws-runs") = {
    val chunk = Gen.oneOf("Ab", "  ", "\t", "x", "Ý", "\n", "ZZ ")
    Prop.forAll(Gen.listOfN(8, chunk)) { parts =>
      val s = parts.mkString
      val once = Seq(Tuple1(s)).toDF("t")
        .select(graft.functions.exprs.normalize_text(col("t")))
        .head().getString(0)
      val twice = Seq(Tuple1(once)).toDF("t")
        .select(graft.functions.exprs.normalize_text(col("t")))
        .head().getString(0)
      twice == once &&
        !once.exists(c => c.isUpper) &&
        !once.contains("  ") && once.trim == once
    }
  }

  // Sorted-neighborhood completeness: every window pair and only
  // window pairs — on random corpora the operator must equal the
  // definition applied to the plainly-sorted list.
  property("sortedNeighborhood pairs == definition on random corpora") = {
    val word = Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)
    Prop.forAll(Gen.choose(2, 8).flatMap(n => Gen.listOfN(n, word)),
        Gen.choose(2, 4)) { (texts, w) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.dedup.SortedNeighborhood
        .candidatePairs(df, "doc_id", "text", window = w, threshold = 2)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val sorted = texts.zipWithIndex
        .sortBy { case (t, i) => (t, i.toLong) }.map(_._2.toLong)
      val want = (for {
        i <- sorted.indices; d <- 1 until w; if i + d < sorted.length
      } yield (sorted(i), sorted(i + d))).toSet
      got == want
    }
  }

  // NTILE partition law: bucket sizes differ by at most one, larger
  // buckets come first, and they sum to n — for ANY (n, k).
  property("lengthDecileWeights buckets partition n with the NTILE law") =
    Prop.forAll(Gen.choose(1, 40), Gen.choose(2, 9)) { (n, k) =>
      val df = (1 to n).map(i => (i.toLong, ("w " * i).trim)).toDF("doc_id", "text")
      val rows = graft.ops.Balance
        .lengthDecileWeights(df, "doc_id", "text", k = k)
        .select("decile", "bucket_n").as[(Int, Long)].collect()
      val sizes = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      rows.forall { case (d, bn) => sizes(d) == bn } &&
        sizes.values.sum == n.toLong &&
        sizes.values.forall(s => s == n / k || s == n / k + 1) &&
        sizes.toSeq.sortBy(_._1).map(_._2).sliding(2)
          .forall(p => p.length < 2 || p(0) >= p(1))
    }

  // q168's layout primitive: the interleave is a BIJECTION on the
  // bit-bounded grid (no two cells share a z-value, every z decodes
  // back) — the property file-range pruning soundness rests on.
  property("zValue is injective on the grid and inverts exactly") =
    Prop.forAll(Gen.choose(1, 8),
      Gen.listOfN(40, Gen.choose(0L, 255L)),
      Gen.listOfN(40, Gen.choose(0L, 255L))) { (bits, xs, ys) =>
      val mask = (1L << bits) - 1
      val pts = xs.zip(ys).map { case (x, y) => (x & mask, y & mask) }
        .distinct
      val zs = pts.toDF("x", "y")
        .select(col("x"), col("y"),
          graft.ops.ZOrder.zValue(col("x"), col("y"), bits).as("z"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      def dec(z: Long): (Long, Long) = {
        var (x, y, i) = (0L, 0L, 0)
        while (i < bits) {
          x |= ((z >> (2 * i)) & 1L) << i
          y |= ((z >> (2 * i + 1)) & 1L) << i
          i += 1
        }
        (x, y)
      }
      zs.map(_._3).distinct.length == pts.length &&
        zs.forall { case (x, y, z) => dec(z) == ((x, y)) }
    }

  // q173's contract verbatim: merge(state(a), state(b)) equals
  // state(a ++ b) for ANY split of ANY data — the monoid law.
  property("IncAgg.merge is state(a ++ b) for any split") =
    Prop.forAll(Gen.listOfN(40, Gen.zip(Gen.choose(0, 3),
      Gen.choose(-500L, 500L))), Gen.choose(0, 40)) { (rows, cut) =>
      val (a, b) = rows.map { case (k, v) => (s"k$k", v) }.splitAt(cut)
      def st(r: Seq[(String, Long)]) =
        graft.ops.IncAgg.state(r.toDF("k", "v"), Seq("k"), "v")
      val full = st(a ++ b).collect().map(_.toSeq).toSet
      val merged = (a.nonEmpty, b.nonEmpty) match {
        case (true, true) =>
          graft.ops.IncAgg.merge(Seq("k"), Seq(st(a), st(b)))
            .collect().map(_.toSeq).toSet
        case _ => full // an empty side merges trivially
      }
      merged == full
    }

  // q180's statistic is RANK-based: any strictly monotone transform
  // of the scores must leave every AUC output bit-identical.
  property("AUC is invariant under strictly monotone score transforms") =
    Prop.forAll(Gen.listOfN(30, Gen.zip(Gen.choose(-20L, 20L),
      Gen.oneOf(0, 1)))) { rows =>
      val df = rows.map { case (s, y) => ("g", s, y) }
        .toDF("seg", "score", "y")
      def auc(d: org.apache.spark.sql.DataFrame) =
        graft.ops.Eval.aucBySegment(d, "seg", "score", "y")
          .collect().map(_.toSeq).toSet
      // 3s + 41 is strictly increasing and order-preserving on longs
      auc(df) == auc(df.withColumn("score",
        col("score") * 3 + 41))
    }

  // q200: Gini is a SHARE statistic — scaling every measure by the
  // same k must leave the fixed-point code bit-identical (exact
  // because floor(k·a / (k·b)) = floor(a/b)), and the code always
  // lies in [0, 1e6).
  property("gini_fp is scale-invariant and bounded") =
    Prop.forAll(Gen.listOfN(12, Gen.zip(Gen.identifier.map(_.take(4)),
      Gen.choose(0L, 1000L))), Gen.choose(2L, 9L)) { (rows, k) =>
      if (rows.map(_._2).sum == 0) true
      else {
        val df = rows.toDF("g", "v")
        def g(d: org.apache.spark.sql.DataFrame) =
          graft.ops.Balance.giniConcentration(d, "g", col("v"))
            .head().getLong(2)
        val base = g(df)
        base == g(df.withColumn("v", col("v") * k)) &&
          base >= 0L && base < 1000000L
      }
    }

  // q189: two identical snapshots have identical ECDFs in every
  // group — KS must read exactly 0 and never flag, whatever the
  // data or the partitioning.
  property("ksDrift of a frame against itself is exactly zero") =
    Prop.forAll(Gen.listOfN(25, Gen.zip(Gen.oneOf("a", "b", "c"),
      Gen.choose(-30L, 30L))), Gen.choose(1, 6)) { (rows, parts) =>
      val df = rows.toDF("g", "v").repartition(parts)
      graft.ops.Snapshot.ksDrift(df, df, "g", "v")
        .collect().forall(r => r.getLong(3) == 0L && !r.getBoolean(4))
    }

  // q192: the PAV fit is a projection onto non-decreasing sequences —
  // its fitted values are monotone along (x, id), its total mass in
  // exact fixed point is within per-pool floor loss (< n units) of
  // the input's, and it is idempotent: feeding the fit back as y
  // returns it unchanged (already monotone → no pooling).
  property("isotonic fit is monotone and idempotent") =
    Prop.forAll(Gen.listOfN(20, Gen.choose(0L, 9L))) { ys =>
      val rows = ys.zipWithIndex.map { case (y, i) =>
        ("g", i.toLong, i.toLong, y) }
      def fit(rs: Seq[(String, Long, Long, Long)]) =
        rs.toDF("g", "x", "id", "y")
          .groupBy(col("g"))
          .agg(graft.functions.aggs.isotonic_fit(
            struct(col("x"), col("id"), col("y"))).as("f"))
          .select(explode(col("f")).as("e"))
          .select(col("e.id"), col("e.fit_fp"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val f1 = fit(rows)
      val mono = f1.map(_._2).sliding(2).forall(p =>
        p.length < 2 || p.head <= p.last)
      // idempotence: the fitted values (already non-decreasing along
      // the same order) pool nothing on a second pass — every pool is
      // a singleton, so the second fit is each value re-scaled by 1e6
      val f2 = fit(f1.map { case (id, v) => ("g", id, id, v) })
      mono && f2.map(_._2).sameElements(f1.map(_._2 * 1000000L))
    }

  // Chain semantics at arbitrary depth: A ⊂ B ⊂ C with B dropped must
  // still drop A on (A,B) evidence — pairwise, never transitive-
  // survivor. The brute force replays the documented rule exactly
  // (directed containment on distinct sets, keep-superset with the
  // min-id tie, empty sets survive). Set sizes stay ≤ 40, so the
  // sketchK=32 capped prefix is the EXACT prefix at t = 3/5 (exact
  // below 77 grams) and recall is guaranteed, not probabilistic.
  property("excerptDedup == brute-force keep-superset scrub on random nested chains") = {
    val genToks = Gen.listOfN(40, Gen.choose(0, 99))
      .map(_.distinct.map(i => s"t$i"))
    val genFree = Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 99)).map(_.distinct.map(i => s"t$i")))
    val genCase = for {
      c1 <- genToks; c2 <- genToks
      k1 <- Gen.choose(2, 4); k2 <- Gen.choose(2, 4)
      free <- Gen.listOfN(2, genFree)
      idSeed <- Gen.choose(0, 1000)
    } yield (c1, k1, c2, k2, free, idSeed)
    Prop.forAll(genCase) { case (c1, k1, c2, k2, free, idSeed) =>
      // nested prefixes of one random token order = a containment
      // chain; equal cut points yield identical sets (the twins case)
      def chain(toks: List[String], k: Int): List[List[String]] =
        if (toks.isEmpty) Nil
        else (1 to k).map(i =>
          toks.take(math.max(1, i * toks.size / k))).toList
      val sets = (chain(c1, k1) ++ chain(c2, k2) ++ free).zipWithIndex
        .map { case (s, i) =>
          // 7919 invertible mod the prime 104729: ids distinct, and
          // the shuffle exercises the min-id tie rule both ways
          ((i.toLong * 7919 + idSeed) % 104729) -> s
        }
      val got = graft.dedup.Dedup.excerptDedup(
          sets.map { case (id, s) => (id, s.toArray) }.toDF("doc_id", "set"),
          "doc_id", 3, 5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val docs = sets.map { case (id, s) => id -> s.toSet }
      val losers = (for {
        (ia, a) <- docs; (ib, b) <- docs
        if ia != ib && a.nonEmpty && b.nonEmpty
        if (a & b).size.toLong * 5 >= 3L * a.size
        if a.size < b.size || (a.size == b.size && ia > ib)
      } yield ia).toSet
      got == (docs.map(_._1).toSet -- losers)
    }
  }
}
