package graft

import graft.ops.DomainGate

/** ops.DomainGate: per-source curation stats and the wholesale
  * domain keep/drop decision (q102). */
class DomainGateSpec extends SparkTestBase {
  import spark.implicits._

  private def fixture = Seq(
    // srcA: one exact dup pair, mean 200 chars, modal en 2/3
    (1L, "x", "en", 100L, "srcA"),
    (2L, "x", "en", 300L, "srcA"),
    (3L, "y", "fr", 200L, "srcA"),
    // srcB: all distinct, mean 400, modal split en/fr -> tie to 'en'
    (4L, "p", "en", 400L, "srcB"),
    (5L, "q", "fr", 400L, "srcB"),
    // srcC: short docs, all distinct, all en
    (6L, "r", "en", 10L, "srcC"),
    (7L, "s", "en", 20L, "srcC")
  ).toDF("doc_id", "text", "lang", "n_chars", "source")

  test("hand-computed stats, modal tie-break, and gate decision") {
    val got = DomainGate.sourceGate(fixture, "source", "text", "lang",
      "n_chars", maxDupFrac = 0.2, minMeanChars = 100.0,
      minModalFrac = 0.5)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getString(5), r.getDouble(6),
        r.getInt(7)))
    // srcA: dup_frac 1/3 > 0.2 -> dropped despite length and modal
    assert(got(0) == (("srcA", 3L, 1L, 1.0 / 3.0, 200.0, "en",
      2.0 / 3.0, 0)))
    // srcB: 1-1 language tie breaks to 'en' (lexicographic); kept
    assert(got(1) == (("srcB", 2L, 0L, 0.0, 400.0, "en", 0.5, 1)))
    // srcC: mean 15 < 100 -> dropped
    assert(got(2) == (("srcC", 2L, 0L, 0.0, 15.0, "en", 1.0, 0)))
  }

  test("applyGate keeps exactly the docs of kept sources") {
    val gate = DomainGate.sourceGate(fixture, "source", "text", "lang",
      "n_chars", maxDupFrac = 0.2, minMeanChars = 100.0,
      minModalFrac = 0.5)
    val kept = DomainGate.applyGate(fixture, gate, "source")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(4L, 5L))
  }

  test("partition-independent on real docs; fractions are the one division") {
    val docs = Tables.documents(spark, sf)
    val a = DomainGate.sourceGate(docs, "source", "text", "lang",
      "n_chars", 0.1, 290.0, 0.40).orderBy("source").collect().toSeq
    val b = DomainGate.sourceGate(docs.repartition(13), "source", "text",
      "lang", "n_chars", 0.1, 290.0, 0.40).orderBy("source")
      .collect().toSeq
    assert(a == b)
    assert(a.map(_.getString(0)).distinct.length == a.length)
    a.foreach { r =>
      assert(r.getDouble(3) ==
        r.getLong(2).toDouble / r.getLong(1).toDouble)
    }
  }
}
