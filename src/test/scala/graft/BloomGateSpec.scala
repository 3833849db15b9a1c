package graft

import org.apache.spark.sql.functions._
import graft.ops.BloomGate

/** ops.BloomGate: bloom-accelerated, exactly-correct new-row gating. */
class BloomGateSpec extends SparkTestBase {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf)

  /** batch = 50 rows already in the corpus + 50 genuinely new keys. */
  private def mixedBatch = {
    val dups = docs.filter(col("doc_id") < 50).select("doc_id", "text")
    val fresh = docs.filter(col("doc_id") >= 450)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" fresh")).as("text"))
    dups.unionByName(fresh)
      .withColumn("fp", graft.text.TextFunctions.fingerprint(col("text")))
  }

  lazy val corpus =
    docs.withColumn("fp", graft.text.TextFunctions.fingerprint(col("text")))

  test("gate output equals the plain anti-join exactly") {
    val bloom = BloomGate.collectBloom(corpus, "fp", expectedItems = 1000)
    val got = BloomGate.newRows(mixedBatch, corpus, "fp", bloom)
      .select("doc_id").as[Long].collect().toSet
    val want = mixedBatch
      .join(corpus.select("fp"), Seq("fp"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
    assert(got.nonEmpty && got.forall(_ >= 10000L), "only shifted ids are new")
  }

  test("a deliberately-underscaled bloom (many false positives) stays exact") {
    // 64 bits for 500 keys: nearly every probe is a false positive —
    // the exact confirm join must absorb them all
    val tiny = BloomGate.collectBloom(corpus, "fp",
      expectedItems = 1000, numBits = 64)
    val got = BloomGate.newRows(mixedBatch, corpus, "fp", tiny)
      .select("doc_id").as[Long].collect().toSet
    val want = mixedBatch
      .join(corpus.select("fp"), Seq("fp"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
  }

  test("no false negatives: every true duplicate is bloom-positive") {
    val bloom = BloomGate.collectBloom(corpus, "fp", expectedItems = 1000)
    val dupRows = mixedBatch.filter(col("doc_id") < 50)
    val positives = dupRows
      .filter(BloomGate.mightContain(bloom, col("fp"))).count()
    assert(positives == dupRows.count())
  }

  test("empty corpus: the whole batch is new") {
    val empty = corpus.filter(lit(false))
    val bloom = BloomGate.collectBloom(empty, "fp", expectedItems = 10)
    assert(bloom == null) // aggregate over no rows
    val got = BloomGate.newRows(mixedBatch, empty, "fp", bloom)
    assert(got.count() == mixedBatch.count())
  }

  test("the gate plan never shuffles the corpus (no sort-merge join)") {
    val bloom = BloomGate.collectBloom(corpus, "fp", expectedItems = 1000)
    val plan = BloomGate.newRows(mixedBatch, corpus, "fp", bloom)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("persisted index: append merges bit-identically to a one-shot build") {
    val rootDir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    val catalog = new graft.catalog.ParquetCatalog(rootDir)
    val a = corpus.filter(col("doc_id") < 250)
    val b = corpus.filter(col("doc_id") >= 250)
    BloomGate.buildBloomIndex(a, "fp", catalog, "bf", expectedItems = 1000)
    BloomGate.appendToBloomIndex(b, "fp", catalog, "bf")
    val merged = BloomGate.readBloom(spark, catalog, "bf")
    BloomGate.buildBloomIndex(corpus, "fp", catalog, "bf_full",
      expectedItems = 1000)
    val oneShot = BloomGate.readBloom(spark, catalog, "bf_full")
    assert(java.util.Arrays.equals(merged, oneShot))
    // and the gate off the appended index sees both halves as dups
    val got = BloomGate.newRowsFromCatalog(mixedBatch, corpus, "fp",
      catalog, "bf").select("doc_id").as[Long].collect().toSet
    assert(got.forall(_ >= 10000L))
    // empty append is a no-op
    BloomGate.appendToBloomIndex(corpus.filter(lit(false)), "fp",
      catalog, "bf")
    assert(java.util.Arrays.equals(
      BloomGate.readBloom(spark, catalog, "bf"), oneShot))
  }
}
