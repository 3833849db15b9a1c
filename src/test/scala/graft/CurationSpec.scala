package graft

import org.apache.spark.sql.functions._
import graft.dedup.Curation

/** dedup.Curation: the integrated corpus-curation chain. */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("curate filters languages, quality, exact and near dups — with accounting") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog by the river", "en"),
      (2L, "the quick brown fox jumps over the lazy dog by the river", "en"), // exact dup
      (3L, "the quick brown fox jumps over the lazy dog by the creek", "en"), // near dup
      (4L, "short", "en"),                                                    // quality fail
      (5L, "el perro corre por la calle de la ciudad con el gato", "es"),     // lang fail
      (6L, "a completely different document about query engines and the planner", "en"),
    ).toDF("doc_id", "text", "lang")
    val (kept, report) = Curation.curate(docs, "doc_id", "text", "lang",
      Curation.Config(langs = Set("en"), minTokens = 5, minJaccard = 0.6,
        shingleK = 2))
    val ids = kept.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 6L))
    val r = report.head()
    assert(r.getAs[Long]("input") == 6)
    assert(r.getAs[Long]("after_lang") == 5)
    assert(r.getAs[Long]("after_quality") == 4)
    assert(r.getAs[Long]("after_exact_dedup") == 3)
    assert(r.getAs[Long]("after_near_dedup") == 2)
  }

  test("curate runs exactly three actions regardless of corpus size") {
    // at 100 TB what matters is PASSES OVER THE RAW CORPUS, and curate
    // makes exactly two: the folded funnel aggregation, and the near-dup
    // chain (whose first job fills the exact-dedup cache). The third
    // action is Dedup's eager materialization of the (tiny) verified
    // near-dup pair frame — the step that lets it release its internal
    // signature/set caches instead of leaking them — and reads no raw
    // corpus beyond that same chain. The funnel counters must stay
    // folded into one aggregation: a stage-by-stage counter version
    // cost three extra full corpus scans.
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { actions.incrementAndGet(); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val docs = Tables.documents(spark, sf)
      val (kept, _) = Curation.curate(docs, "doc_id", "text", "lang",
        Curation.Config(langs = Set.empty, minTokens = 3))
      // the listener bus is async — wait for it to drain, then settle
      var waited = 0
      while (waited < 10000 && actions.get < 3) { Thread.sleep(100); waited += 100 }
      Thread.sleep(500)
      assert(actions.get == 3, s"curate must run exactly 3 actions, saw ${actions.get}")
      kept.unpersist()
    } finally spark.listenerManager.unregister(listener)
  }

  test("dropNearDupComponents keeps one document per transitive cluster") {
    // doc 3 is near-dup of both 1 and 2, but 1 and 2 differ enough
    // that (1, 2) is not itself a pair. Pairwise removal only drops
    // the higher-id side of pairs (1,3) and (2,3) — doc 2 survives
    // even though it chains to 1 through 3; component resolution
    // merges {1,2,3} and keeps only the min
    val a = "the quick brown fox jumps over the lazy dog in the misty morning park"
    val b = "the quick brown fox jumps over the lazy dog in the misty evening park"
    val c = "the quick brown fox leaps over the lazy dog in the misty evening park"
    val docs = Seq((1L, a), (3L, b), (2L, c)).toDF("doc_id", "text")
    val cfg = Curation.Config(minJaccard = 0.6)
    val pairwise = Curation.dropNearDups(docs, "doc_id", "text", cfg)
      .select("doc_id").as[Long].collect().toSet
    val components = Curation.dropNearDupComponents(docs, "doc_id", "text", cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(pairwise == Set(1L, 2L))
    assert(components == Set(1L))
  }

  test("materialized pair graph: components from catalog match the self-contained form") {
    val catalog = new graft.catalog.ParquetCatalog(
      java.nio.file.Files.createTempDirectory("graft-pairs").toString)
    val docs = Tables.documents(spark, sf)
    // write the pair graph ONCE (the expensive similarity join)...
    Curation.materializePairs(docs, "doc_id", "text", catalog,
      ngramN = 5, threshold = 0.4)
    // ...then resolve clusters from the persisted table
    val reuse = Curation.componentsFromCatalog(spark, catalog)
    val direct = dedup.Dedup.connectedComponents(
      dedup.Dedup.exactNgramJaccardPairs(docs, "doc_id", "text",
        n = 5, threshold = 0.4))
    assert(reuse.orderBy("id").collect().toSeq ==
      direct.orderBy("id").collect().toSeq)
    // the reuse plan must read ONLY the pair table: no document scan,
    // no shingle/ngram expressions, no similarity join to re-derive
    val inputs = catalog.read(spark, "dup_pairs")
      .select(col("id_a"), col("id_b")).inputFiles
    assert(inputs.nonEmpty && inputs.forall(_.contains("dup_pairs")))
    // and the anti-join gate off the same table keeps one doc/cluster
    val keptReuse = Curation.dropNearDupsFromCatalog(docs, "doc_id", catalog)
    val nClusters = direct.select("component").distinct().count()
    val nClustered = direct.count()
    assert(keptReuse.count() == docs.count() - (nClustered - nClusters))
  }

  test("curateExactFromCatalog ≡ curateExact off a lower-threshold pair graph") {
    // Jaccard is pairwise, so the FULL-corpus graph at t=0.4 filtered
    // to >= cfg.minJaccard and restricted to stage survivors must
    // reproduce the in-place chain's kept set exactly — including the
    // both-endpoints-survive subtlety (a pair whose lower id failed
    // quality must not drop the higher id).
    val catalog = new graft.catalog.ParquetCatalog(
      java.nio.file.Files.createTempDirectory("graft-pairs2").toString)
    val docs = Tables.documents(spark, sf)
    Curation.materializePairs(docs, "doc_id", "text", catalog,
      ngramN = 5, threshold = 0.4)
    val cfg = Curation.Config() // minJaccard 0.8 > materialized 0.4
    val fromCat = Curation.curateExactFromCatalog(
      docs, "doc_id", "text", "lang", catalog, "dup_pairs", cfg)
    val direct = Curation.curateExact(docs, "doc_id", "text", "lang", cfg)
    assert(fromCat.select("doc_id").orderBy("doc_id").collect().toSeq ==
      direct.select("doc_id").orderBy("doc_id").collect().toSeq)
  }

  test("a pair graph too coarse for the curation threshold fails loudly") {
    // a graph built at 0.8 does not CONTAIN the [0.5, 0.8) pairs a
    // 0.5-curation needs — the built_at_threshold stamp turns that
    // silent under-removal into an immediate error
    val catalog = new graft.catalog.ParquetCatalog(
      java.nio.file.Files.createTempDirectory("graft-pairs3").toString)
    val docs = Tables.documents(spark, sf)
    Curation.materializePairs(docs, "doc_id", "text", catalog,
      ngramN = 5, threshold = 0.8)
    val e = intercept[IllegalArgumentException] {
      Curation.curateExactFromCatalog(docs, "doc_id", "text", "lang",
        catalog, "dup_pairs", Curation.Config(minJaccard = 0.5)).count()
    }
    assert(e.getMessage.contains("re-materialize"))
    // equal threshold passes the stamp check
    Curation.curateExactFromCatalog(docs, "doc_id", "text", "lang",
      catalog, "dup_pairs", Curation.Config(minJaccard = 0.8)).count()
  }

  test("sourceOverlapFromCatalog counts each unordered source pair once") {
    val rootDir = java.nio.file.Files.createTempDirectory("graft-ovl").toString
    val catalog = new graft.catalog.ParquetCatalog(rootDir)
    // controlled graph: pairs (1,2) (3,4) (5,6) with known sources
    Seq((1L, 2L, 0.9), (3L, 4L, 0.8), (5L, 6L, 0.7))
      .toDF("id_a", "id_b", "jaccard")
      .write.parquet(rootDir + "/dup_pairs")
    val docs = Seq(
      (1L, "sA"), (2L, "sB"), // cross-source, A<B by doc order
      (3L, "sB"), (4L, "sA"), // cross-source, REVERSED label order
      (5L, "sA"), (6L, "sA")  // within-source (diagonal)
    ).toDF("doc_id", "source")
    val got = Curation.sourceOverlapFromCatalog(docs, "doc_id", "source",
        catalog).orderBy("src_a", "src_b")
      .as[(String, String, Long)].collect().toSeq
    // both A-B pairs normalize to (sA, sB) whatever the doc_id order
    assert(got == Seq(("sA", "sA", 1L), ("sA", "sB", 2L)))
    // threshold filter trims the matrix
    val strict = Curation.sourceOverlapFromCatalog(docs, "doc_id", "source",
        catalog, minJaccard = 0.85)
      .as[(String, String, Long)].collect().toSeq
    assert(strict == Seq(("sA", "sB", 1L)))
  }

  test("curate on the documents table keeps a plausible fraction") {
    val docs = Tables.documents(spark, sf)
    val (kept, report) = Curation.curate(docs, "doc_id", "text", "lang",
      Curation.Config(langs = Set.empty, minTokens = 3, minJaccard = 0.8))
    val r = report.head()
    assert(r.getAs[Long]("after_near_dedup") > 0)
    assert(kept.count() == r.getAs[Long]("after_near_dedup"))
    assert(r.getAs[Long]("after_near_dedup") <= r.getAs[Long]("input"))
  }

  test("dedupWeightedSample: singletons always survive, family weights are 1/size") {
    import spark.implicits._
    val docs = (1L to 20L).toDF("doc_id")
    // family {1,2,3} and family {4,5}; 6..20 singletons
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("id", "component")
    val out = Curation.dedupWeightedSample(docs, "doc_id", comp)
    val rows = out.as[(Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // every singleton (weight 1.0) is kept
    (6L to 20L).foreach(i => assert(rows.get(i).contains((1L, 1.0))))
    // family members that survive carry the reciprocal weight
    rows.collect { case (k, v) if k <= 3L => v }
      .foreach(v => assert(v == ((3L, 1.0 / 3))))
    rows.collect { case (k, v) if k == 4L || k == 5L => v }
      .foreach(v => assert(v == ((2L, 0.5))))
    // deterministic: the same kept set under a different partitioning
    val again = Curation.dedupWeightedSample(
      docs.repartition(7), "doc_id", comp.repartition(3))
      .as[(Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(again == rows)
  }
}
