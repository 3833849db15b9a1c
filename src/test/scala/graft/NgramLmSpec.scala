package graft

import org.apache.spark.sql.functions._
import graft.text.NgramLm

/** text.NgramLm: exact-integer bigram coherence scoring (q70). */
class NgramLmSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-computed counts on a five-doc corpus") {
    // bigram instances: d1 (a,b),(b,a),(a,b); d2 (a,b); d3 (c,d); d5 (a,c)
    // c2: (a,b)=3 (b,a)=1 (c,d)=1 (a,c)=1; heads c1: a=4, b=1, c=1
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b"),
      (3L, "c d"),
      (4L, "x"),        // < 2 tokens: excluded
      (5L, "a c")       // rare continuation of the common head 'a'
    ).toDF("doc_id", "text")
    val got = NgramLm.bigramScore(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.length == 4)
    assert(got(0) == ((1L, 3L, 7L, 9L, 7.0 / 9.0))) // (3+1+3)/(4+1+4)
    assert(got(1) == ((2L, 1L, 3L, 4L, 0.75)))
    assert(got(2) == ((3L, 1L, 1L, 1L, 1.0)))
    assert(got(3) == ((5L, 1L, 1L, 4L, 0.25))) // rare pair, common head
  }

  test("rare continuations score lower than common ones") {
    // "a b" is the dominant continuation of a; "a z" is unique.
    val docs = (Seq.tabulate(9)(i => (i.toLong, "a b")) :+ (9L, "a z"))
      .toDF("doc_id", "text")
    val scores = NgramLm.bigramScore(docs, "doc_id", "text")
      .select("doc_id", "lm_score").as[(Long, Double)].collect().toMap
    assert(scores(0L) == 0.9)  // c2(a,b)=9 / c1(a)=10
    assert(scores(9L) == 0.1)  // c2(a,z)=1 / c1(a)=10
    assert(scores(9L) < scores(0L))
  }

  test("score is in (0, 1] and partition-independent on real docs") {
    val docs = Tables.documents(spark, sf)
    val a = NgramLm.bigramScore(docs, "doc_id", "text")
    val rows = a.collect()
    assert(rows.length == docs.filter(
      size(graft.text.TextFunctions.tokens(col("text"))) >= 2).count())
    rows.foreach { r =>
      val s = r.getAs[Double]("lm_score")
      assert(s > 0.0 && s <= 1.0, r.toString)
    }
    val b = NgramLm.bigramScore(docs.repartition(13), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a.orderBy("doc_id").collect().toSeq == b)
  }
}
