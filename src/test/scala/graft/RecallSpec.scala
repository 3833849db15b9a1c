package graft

/** Pins the lower bounds documented in docs/RECALL.md: the approximate
  * (rows-only) operators must keep their measured recall against exact
  * ground truth. Ground truths are brute-force / prefix-filter joins
  * computed in-session — see [[graft.RecallReport]] for the shared
  * measurement code.
  */
class RecallSpec extends SparkTestBase {
  lazy val docs = Tables.documents(spark, sf)
  lazy val emb = Tables.embeddings(spark, sf)

  test("minhash LSH recall >= 0.8 vs exact shingle-Jaccard join") {
    val x = RecallReport.minhash(docs)
    assert(x.recall >= 0.8, s"recall ${x.recall} (${x.hit}/${x.truth})")
    assert(x.precision == 1.0, "exact-verify step must kill false positives")
  }

  test("simhash pigeonhole recall is exactly 1.0 (structural)") {
    val x = RecallReport.simhash(docs)
    assert(x.recall == 1.0, s"recall ${x.recall} (${x.hit}/${x.truth})")
    assert(x.precision == 1.0) // hamming filter re-verifies candidates
  }

  test("embedding hyperplane-LSH recall >= 0.5 at one 8-plane band") {
    val x = RecallReport.embedding(emb)
    assert(x.recall >= 0.5, s"recall ${x.recall} (${x.hit}/${x.truth})")
    assert(x.precision == 1.0) // exact cosine verification
  }

  test("multi-probe LSH top-k recall@5 >= 0.6 vs brute force") {
    val x = RecallReport.annTopK(emb)
    assert(x.recall >= 0.6, s"recall ${x.recall} (${x.hit}/${x.truth})")
  }
}
