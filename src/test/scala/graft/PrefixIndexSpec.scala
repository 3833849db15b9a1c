package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.catalog.ParquetCatalog
import graft.dedup.Dedup

/** dedup.Dedup persisted prefix index: build once, append per batch,
  * query ≡ the rebuild-every-time incremental join. */
class PrefixIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def sets(df: DataFrame) =
    df.select(col("doc_id"), Dedup.charNgrams(col("text"), 5).as("set"))

  private def docs = Tables.documents(spark, sf)
  private def corpus = sets(docs.filter(col("doc_id") % 10 =!= 0))
  private def batch = sets(docs.filter(col("doc_id") % 10 === 0))

  private def asSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet

  private def freshCatalog =
    new ParquetCatalog(
      java.nio.file.Files.createTempDirectory("graft-pfx").toString)

  test("drift probe: same-vocabulary batches read ~0, alien ones ~1") {
    val cat = freshCatalog
    Dedup.buildPrefixIndex(corpus, "doc_id", 0.4, cat, "pfx")
    // the held-out tenth of the same corpus shares its character
    // 5-gram vocabulary almost entirely
    val same = Dedup.prefixIndexDrift(batch, "doc_id", cat, "pfx")
    assert(same < 0.3, s"same-vocab drift should be low, got $same")
    // a batch from a different writing system shares nothing
    val alien = sets(Seq(
      (90001L, "ΩΨΦΞΔΘΛΠΣΓ ΩΨΦΞΔΘΛΠΣΓ ΞΞΔΔΘΘΛΛ"),
      (90002L, "ΔΘΛΠΣΓΩΨΦΞ ΣΣΓΓΩΩΨΨ ΦΦΞΞΔΔ")).toDF("doc_id", "text"))
    val far = Dedup.prefixIndexDrift(alien, "doc_id", cat, "pfx")
    assert(far > 0.9, s"alien-vocab drift should be ~1, got $far")
    // drift never changes OUTPUT pairs — only candidate mass: the
    // frozen-order query still equals the rebuild-every-time form
    // even for the fully-drifted batch
    val got = asSet(Dedup.incrementalPairsFromCatalog(
      corpus, alien, "doc_id", cat, "pfx"))
    val want = asSet(Dedup.incrementalSimilarityPairs(
      corpus, alien, "doc_id", 0.4))
    assert(got == want)
  }

  test("the sampled and on-disk index size models agree on the same corpus") {
    val cat = freshCatalog
    Dedup.buildPrefixIndex(corpus, "doc_id", 0.4, cat, "pfx")
    val prepped = corpus.select(col("doc_id").as("id"), col("set"))
      .withColumn("sz", size(col("set")))
    val sampled = Dedup.IndexSizing.estimateFromSample(prepped, 0.4)
    val path = new org.apache.hadoop.fs.Path(s"${cat.root}/pfx")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val disk = Dedup.IndexSizing.estimateFromDisk(
      fs.getContentSummary(path).getLength)
    val cap = Dedup.IndexSizing.cap(spark)
    // same decision at the shared default cap...
    assert((sampled <= cap) == (disk < cap), s"sampled=$sampled disk=$disk")
    // ...and the two estimates of the same deserialized relation stay
    // within an order of magnitude of each other — if either model's
    // constant drifts from reality this is the canary
    val ratio = sampled.max(1L).toDouble / disk.max(1L)
    assert(ratio > 0.1 && ratio < 10.0,
      s"estimates diverged: sampled=$sampled disk=$disk ratio=$ratio")
  }

  test("catalog query equals the rebuild-every-time incremental join") {
    val cat = freshCatalog
    Dedup.buildPrefixIndex(corpus, "doc_id", 0.4, cat, "pfx")
    val got = asSet(
      Dedup.incrementalPairsFromCatalog(corpus, batch, "doc_id", cat, "pfx"))
    val want = asSet(
      Dedup.incrementalSimilarityPairs(corpus, batch, "doc_id", 0.4))
    assert(got == want && got.nonEmpty)
  }

  /** batch1 carries tokens the frozen vocab never saw; after its
    * append, batch2 must still find pairs against corpus AND batch1 —
    * the frozen (0, tok) rank for new tokens at work. */
  test("append keeps the index exact across batches with unseen tokens") {
    val cat = freshCatalog
    val b1 = sets(Seq(
      (10001L, "zzqy wvxk pprr mmnn zzqy wvxk pprr"),
      (10002L, "totally fresh shingle stream qqqq")).toDF("doc_id", "text"))
    val b2 = sets(Seq(
      (20001L, "zzqy wvxk pprr mmnn zzqy wvxk pprr"), // dups b1's 10001
      (20002L, docs.filter(col("doc_id") === 7L)
        .select("text").as[String].head())) // dups a corpus doc
      .toDF("doc_id", "text"))
    Dedup.buildPrefixIndex(corpus, "doc_id", 0.4, cat, "pfx")
    Dedup.appendToPrefixIndex(b1, "doc_id", cat, "pfx")
    val got = asSet(Dedup.incrementalPairsFromCatalog(
      corpus.unionByName(b1), b2, "doc_id", cat, "pfx"))
    val want = asSet(Dedup.incrementalSimilarityPairs(
      corpus.unionByName(b1), b2, "doc_id", 0.4))
    assert(got == want)
    assert(got.exists(p => p._1 == 10001L && p._2 == 20001L),
      s"batch1-batch2 pair through the appended index: $got")
    assert(got.exists(p => p._1 == 7L && p._2 == 20002L),
      s"corpus-batch2 pair through the built index: $got")
  }

  test("a batch of only never-seen tokens still pairs within itself") {
    val cat = freshCatalog
    Dedup.buildPrefixIndex(corpus, "doc_id", 0.4, cat, "pfx")
    val b = sets(Seq(
      (30001L, "xqjz kvwp bhtm rrss xqjz kvwp"),
      (30002L, "xqjz kvwp bhtm rrss xqjz kvwp"),
      (30003L, "unrelated brand new content here")).toDF("doc_id", "text"))
    val got = asSet(
      Dedup.incrementalPairsFromCatalog(corpus, b, "doc_id", cat, "pfx"))
    val want = asSet(
      Dedup.incrementalSimilarityPairs(corpus, b, "doc_id", 0.4))
    assert(got == want)
    assert(got.contains(got.find(p => p._1 == 30001L && p._2 == 30002L).get))
  }

  test("the catalog query recomputes no prefixes: a window-free verify plan") {
    val cat = freshCatalog
    Dedup.buildPrefixIndex(corpus, "doc_id", 0.4, cat, "pfx")
    val plan = Dedup.incrementalPairsFromCatalog(
        corpus, batch, "doc_id", cat, "pfx")
      .queryExecution.executedPlan.toString
    // corpus prefixes arrive from the persisted table and the
    // candidate id-pairs are materialized eagerly (they feed both the
    // verify join and its payload semi-probe), so the returned plan is
    // verification-only: no ranking Window anywhere (paid at build
    // time, not per query), and the corpus side appears solely as the
    // semi-probed payload lookup — never a per-query re-rank
    assert(plan.contains("ExistingRDD"), plan) // the materialized pairs
    assert(!plan.contains("Window"), plan)
  }

  test("the probe's parallelism survives AQE (no one-task candidate join)") {
    // the delta frame is small enough that AQE coalesces its window
    // exchange to one partition; the candidate join's ~100× per-row
    // expansion then runs single-threaded (measured 6× the query).
    // probePrefixes pins the partition count before the checkpoint.
    val cat = freshCatalog
    Dedup.buildPrefixIndex(corpus, "doc_id", 0.4, cat, "pfx")
    val probe = Dedup.probePrefixes(batch, "doc_id", cat, "pfx", 0.4)
    assert(probe.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism, probe.rdd.getNumPartitions)
  }
}
