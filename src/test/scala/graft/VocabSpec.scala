package graft

import graft.text.Vocab

/** text.Vocab: frequency vocabulary + OOV coverage (q114), per-group
  * diversity (q115), BPE merge-pair stats (q116). */
class VocabSpec extends SparkTestBase {
  import spark.implicits._

  private def docs3 = Seq(
    (1L, "a b a", "x"),
    (2L, "b c", "x"),
    (3L, "a", "y")).toDF("doc_id", "text", "source")

  test("topVocabulary ranks by count then token") {
    val v = Vocab.topVocabulary(docs3, "text", topV = 2)
      .as[(String, Long, Int)].collect().toSet
    assert(v == Set(("a", 3L, 1), ("b", 2L, 2)))
    // pure tie: count 1 each, token ASC decides
    val t = Vocab.topVocabulary(Seq((1L, "b a")).toDF("doc_id", "text"),
        "text", topV = 1)
      .as[(String, Long, Int)].collect().toSet
    assert(t == Set(("a", 1L, 1)))
  }

  test("oovProfile counts against the top-V vocabulary; empty text rates 0") {
    val docs = docs3.union(Seq((4L, "", "y")).toDF("doc_id", "text", "source"))
    val got = Vocab.oovProfile(docs, "doc_id", "text", topV = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set(
      (1L, 3L, 0L, 0.0),        // "a b a" fully in {a, b}
      (2L, 2L, 1L, 0.5),        // "c" is OOV
      (3L, 1L, 0L, 0.0),
      (4L, 0L, 0L, 0.0)))       // token-less doc present, rate 0
  }

  test("diversityProfile: unigram + bigram TTR per group, short-doc zeros") {
    val got = Vocab.diversityProfile(docs3, "source", "text")
      .as[(String, Long, Long, Double, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    // x: tokens a,b,a,b,c (5; 3 distinct); bigrams "a b","b a","b c" (3; 3 distinct)
    assert(got("x") == ("x", 5L, 3L, 3.0 / 5.0, 3L, 3L, 1.0))
    // y: one token, no bigrams -> zero bigram axis, not a dropped group
    assert(got("y") == ("y", 1L, 1L, 1.0, 0L, 0L, 0.0))
  }

  test("encode maps tokens to vocab ranks, OOV to 0, position order") {
    val docs = Seq((1L, "a b a c"), (2L, ""), (3L, "c"))
      .toDF("doc_id", "text")
    // counts: a=2, b=1, c=2 -> topV=2 keeps a(1), c(2); b is OOV
    val got = Vocab.encode(docs, "doc_id", "text", topV = 2)
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set(
      (1L, "1,0,1,2", 4L),
      (2L, "", 0L),
      (3L, "2", 1L)))
  }

  test("mergePairStats: adjacent-pair counts with multiplicity, ties ASC") {
    val docs = Seq((1L, "a b a b"), (2L, "c d")).toDF("doc_id", "text")
    val got = Vocab.mergePairStats(docs, "text", topK = 2)
      .as[(String, Long, Int)].collect().toSeq.sortBy(_._3)
    // pairs: "a b" x2, "b a" x1, "c d" x1 -> tie at 1 broken by pair ASC
    assert(got == Seq(("a b", 2L, 1), ("b a", 1L, 2)))
  }

  test("collocations: lift ranks the bound pair over the frequent pair") {
    // "x y" always co-occurs (2 of each, pair 2x); "a b" co-occurs 2x
    // but a,b are everywhere (6 each) -> x y lifts far higher
    val docs = Seq(
      (1L, "x y a b a b a"), (2L, "x y b a b a b")).toDF("doc_id", "text")
    val got = Vocab.collocations(docs, "text", topK = 3, minCount = 2)
      .orderBy("crank")
      .as[(String, Long, Long, Long, Long, Int)].collect().toSeq
    assert(got.head._1 == "x y")
    // exact integer lift: n_pair * 10^6 div (n1 * n2)
    got.foreach { case (_, np, n1, n2, lift, _) =>
      assert(lift == np * 1000000L / (n1 * n2))
    }
    // ranking is (lift DESC, n_pair DESC, pair ASC), strictly ordered
    assert(got.map(g => (-g._5, -g._2, g._1)).sorted ==
      got.map(g => (-g._5, -g._2, g._1)))
  }

  test("collocations: minCount prunes hapax bigrams before scoring") {
    val docs = Seq((1L, "p q r s")).toDF("doc_id", "text")
    assert(Vocab.collocations(docs, "text", topK = 10, minCount = 2)
      .count() == 0)
    assert(Vocab.collocations(docs, "text", topK = 10, minCount = 1)
      .count() == 3)
  }

  test("clusterKeywords: everywhere-terms score zero, distinctive terms rank") {
    val docs = Seq(
      (1, "alpha alpha common"), (1, "common alpha"),
      (2, "beta common common")).toDF("cluster", "text")
    val out = Vocab.clusterKeywords(docs, "cluster", "text",
        k = 5, shingleK = 1)
      .select("cluster", "token", "tf", "score", "rank")
      .as[(Int, String, Long, Long, Int)].collect().toSet
    // n_clusters = 2; 'common' is in both -> idf 0 -> dropped;
    // 'alpha' carried by 2 docs of cluster 1 (set-per-doc, the double
    // occurrence counts once), 'beta' by 1 doc of cluster 2, idf 1
    assert(out == Set((1, "alpha", 2L, 2L, 1), (2, "beta", 1L, 1L, 1)))
  }

  test("clusterKeywords ties break token-descending (the heap's order)") {
    val docs = Seq((1, "aa bb"), (2, "zz")).toDF("cluster", "text")
    val out = Vocab.clusterKeywords(docs, "cluster", "text",
        k = 2, shingleK = 1)
      .filter("cluster = 1")
      .select("token", "rank").as[(String, Int)].collect().toMap
    assert(out == Map("bb" -> 1, "aa" -> 2))
  }

  test("coverageCurve matches the naive window form and is monotone") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val d = Tables.documents(spark, sf).limit(100)
    val got = Vocab.coverageCurve(d, "text")
      .select("vocab_k", "token", "cnt", "cum_mass", "total_mass")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    val freq = d.select(explode(
        graft.functions.exprs.ws_tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("cnt").desc, col("token").asc)
    val ks = (0 to 14).map(1L << _).toSet
    val expect = freq
      .withColumn("rn", row_number().over(w))
      .withColumn("cum", sum("cnt").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("rn").isin(ks.toSeq: _*))
      .select(col("rn").cast("long"), col("token"), col("cnt"),
        col("cum"), lit(0L))
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSeq ==
      expect.map(t => (t._1, t._2, t._3, t._4)).toSeq)
    // cumulative mass is monotone in k; total is constant
    assert(got.map(_._4).sliding(2).forall(p => p.head <= p.last))
    assert(got.map(_._5).distinct.length == 1)
  }

  test("chiSquareTokens: hand-computed 2x2, presence not frequency, guards") {
    import org.apache.spark.sql.functions._
    // 6 docs, label = lang=='en'. Token "aa" in all 3 en docs and no
    // others (perfect association); "zz" in all 3 non-en; "cc" in all
    // 6 docs (degenerate margin — excluded); "mm" split 2/1 (weak).
    val d = Seq(
      (1L, "aa cc mm", "en"), (2L, "aa cc mm", "en"), (3L, "aa aa cc", "en"),
      (4L, "zz cc mm", "de"), (5L, "zz cc", "de"), (6L, "zz cc", "de"))
      .toDF("doc_id", "text", "lang")
    val r = Vocab.chiSquareTokens(d, "text", col("lang") === "en",
        topK = 10, minDf = 1)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getInt(4)))).toMap
    // "aa": a=3 b=0 c=0 d=3 → chi2 = 6*(9-0)^2/(3*3*3*3) = 6 → 60000.
    // doc 3 has "aa" twice: presence counting keeps df=3, not 4.
    assert(r("aa") == ((3L, 3L, 60000L, 1)))
    // "zz": mirror image, same chi2; tie broken token ASC → rank 2
    assert(r("zz") == ((3L, 0L, 60000L, 2)))
    // "cc" in every doc: df == N excluded (zero margin)
    assert(!r.contains("cc"))
    // "mm": a=2 b=1 c=1 d=2 → chi2 = 6*(4-1)^2/(3*3*3*3) = 54/81
    //   fp: (9 DIV 9)=1 → 1*10000*6 DIV 9 = 6666 (floor of 6666.67)
    assert(r("mm") == ((3L, 2L, 6666L, 3)))
  }

  test("vocabOverlapMatrix: hand Jaccard, presence-not-frequency, ordering") {
    import org.apache.spark.sql.functions.col
    // a: {x,y,z}, b: {y,z,w}, c: {q} — a∩b = {y,z} → 2/4 = 500000;
    // c shares nothing → rows only for pairs with intersection
    val d = Seq(
      (1L, "x y z", "a"), (2L, "y y z", "b"), (3L, "w", "b"),
      (4L, "q", "c")).toDF("doc_id", "text", "source")
    val r = Vocab.vocabOverlapMatrix(d, "text", "source")
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    assert(r == Map(("a", "b") -> ((2L, 3L, 3L, 500000L))))
    // identical vocabularies read exactly 1.0, pair emitted once
    val same = Seq((1L, "m n", "a"), (2L, "n m m", "b"))
      .toDF("doc_id", "text", "source")
    val s = Vocab.vocabOverlapMatrix(same, "text", "source").collect()
    assert(s.length == 1 && s.head.getLong(5) == 1000000L)
    assert(s.head.getString(0) == "a" && s.head.getString(1) == "b")
  }

  test("chiSquareTokens: minDf prunes before ranking; topK bounds output") {
    import org.apache.spark.sql.functions._
    val d = Seq(
      (1L, "aa rare1", "en"), (2L, "aa", "en"),
      (3L, "bb rare2", "de"), (4L, "bb", "de"))
      .toDF("doc_id", "text", "lang")
    val r = Vocab.chiSquareTokens(d, "text", col("lang") === "en",
      topK = 1, minDf = 2)
    val rows = r.collect()
    assert(rows.length == 1) // topK honored
    assert(Set("aa", "bb").contains(rows.head.getString(0))) // hapax pruned
    assert(rows.head.getInt(4) == 1)
  }
}
