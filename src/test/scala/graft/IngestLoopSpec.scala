package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.catalog.ParquetCatalog
import graft.dedup.Dedup
import graft.ops.BloomGate
import graft.streaming.IngestLoop
import graft.streaming.IngestLoop.State

/** streaming.IngestLoop: any sequence of ticks ≡ one batch build over
  * the same arrivals — corpus, components, and bloom all converge. */
class IngestLoopSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)
    .select("doc_id", "text")

  private val st = State("corpus", "bloom", "pfx", "comps",
    bloomItems = 4096L)

  private def freshCatalog =
    new ParquetCatalog(
      java.nio.file.Files.createTempDirectory("graft-ingest").toString)

  private def sets(df: DataFrame) =
    df.select(col("doc_id"), Dedup.charNgrams(col("text"), 5).as("set"))

  private def reDup(of: DataFrame, newIdBase: Long) = of
    .select((col("doc_id") + newIdBase).as("doc_id"), col("text"))

  test("two ticks converge to the one-shot batch build") {
    val cat = freshCatalog
    val seed = docs.filter(col("doc_id") < 300)
    // each batch: genuinely new docs + exact re-ingests of older ones
    // (ids grow with arrival, the contract's monotone regime)
    val b1 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
      .unionByName(reDup(seed.filter(col("doc_id") < 10), 10000L))
    val b2 = docs.filter(col("doc_id") >= 400)
      .unionByName(reDup(b1.filter(col("doc_id") < 310), 20000L))

    IngestLoop.build(seed, cat, st)
    val s1 = IngestLoop.ingest(b1, cat, st)
    val s2 = IngestLoop.ingest(b2, cat, st)
    // survivors are exactly the non-re-ingested rows
    assert(s1.select("doc_id").as[Long].collect().toSet ==
      (300L until 400L).toSet)
    assert(s2.select("doc_id").as[Long].collect().toSet ==
      (400L until 500L).toSet)

    // corpus table ≡ one exact dedup over all arrivals
    val arrivals = seed.unionByName(b1).unionByName(b2)
    val corpusGot = cat.read(spark, st.corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val corpusWant = Dedup.exactDedup(arrivals, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(corpusGot == corpusWant)

    // components table ≡ from-scratch CC over the final corpus
    val finalCorpus = cat.read(spark, st.corpus)
    val scratch = Dedup.connectedComponents(
      Dedup.exactSimilarityPairs(sets(finalCorpus), "doc_id", st.threshold)
        .select("id_a", "id_b"))
    val compGot = cat.read(spark, st.components)
      .as[(Long, Long)].collect().toMap
    assert(compGot == scratch.as[(Long, Long)].collect().toMap)
    assert(compGot.nonEmpty)

    // bloom ≡ a one-shot build over the final corpus, bit-for-bit
    BloomGate.buildBloomIndex(
      finalCorpus.withColumn("__fp",
        graft.text.TextFunctions.fingerprint(col("text"))),
      "__fp", cat, "bloom_oneshot", expectedItems = st.bloomItems)
    assert(java.util.Arrays.equals(
      BloomGate.readBloom(spark, cat, st.bloom),
      BloomGate.readBloom(spark, cat, "bloom_oneshot")))
  }

  test("a tick of pure re-ingests is a no-op on every artifact") {
    val cat = freshCatalog
    val seed = docs.filter(col("doc_id") < 200)
    IngestLoop.build(seed, cat, st)
    val before = cat.read(spark, st.corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val compBefore = cat.read(spark, st.components)
      .as[(Long, Long)].collect().toMap
    val s = IngestLoop.ingest(reDup(seed, 50000L), cat, st)
    assert(s.isEmpty)
    assert(cat.read(spark, st.corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq == before)
    assert(cat.read(spark, st.components)
      .as[(Long, Long)].collect().toMap == compBefore)
  }
}
