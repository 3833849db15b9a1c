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
    val compGot = IngestLoop.readComponents(spark, cat, st)
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

  /** Shared convergence oracle: corpus ≡ one exact dedup over all
    * arrivals, components ≡ from-scratch CC over the final corpus. */
  private def assertConverged(cat: ParquetCatalog, arrivals: DataFrame,
                              clue: String): Unit = {
    val corpusGot = cat.read(spark, st.corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val corpusWant = Dedup.exactDedup(arrivals, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(corpusGot == corpusWant, clue)
    val finalCorpus = cat.read(spark, st.corpus)
    val scratch = Dedup.connectedComponents(
      Dedup.exactSimilarityPairs(sets(finalCorpus), "doc_id", st.threshold)
        .select("id_a", "id_b"))
    assert(IngestLoop.readComponents(spark, cat, st)
      .as[(Long, Long)].collect().toMap ==
      scratch.as[(Long, Long)].collect().toMap, clue)
  }

  test("a tick killed at each state-write boundary rolls forward to loop ≡ batch") {
    // one catalog per kill site: the tick dies immediately before the
    // named write, the retry's head-of-tick recovery rolls the staged
    // tick forward from the marker, and the retried batch then gates
    // out as pure re-ingests — every artifact must converge to the
    // batch oracle regardless of which boundary the crash hit
    for (stage <- Seq("components", "prefix", "bloom", "corpus", "unmark")) {
      val cat = freshCatalog
      val seed = docs.filter(col("doc_id") < 300)
      IngestLoop.build(seed, cat, st)
      val b1 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
        .unionByName(reDup(seed.filter(col("doc_id") < 10), 10000L))
      val boom = intercept[RuntimeException] {
        IngestLoop.ingestImpl(b1, cat, st,
          s => if (s == stage) throw new RuntimeException(s"kill@$s"))
      }
      assert(boom.getMessage == s"kill@$stage")
      val retry = IngestLoop.ingest(b1, cat, st)
      assert(retry.isEmpty,
        s"$stage: the recovered tick already landed; retry must gate out")
      assertConverged(cat, seed.unionByName(b1), s"killed at $stage")
    }
  }

  test("a crash before the marker mutates nothing; the retry lands first") {
    val cat = freshCatalog
    val seed = docs.filter(col("doc_id") < 300)
    IngestLoop.build(seed, cat, st)
    val before = cat.read(spark, st.corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b1 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    intercept[RuntimeException] {
      IngestLoop.ingestImpl(b1, cat, st,
        s => if (s == "marker") throw new RuntimeException("kill@marker"))
    }
    // no marker was written, so nothing may have changed and nothing
    // is pending recovery
    assert(cat.read(spark, st.corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq == before)
    val s1 = IngestLoop.ingest(b1, cat, st)
    assert(s1.select("doc_id").as[Long].collect().toSet ==
      (300L until 400L).toSet)
    assertConverged(cat, seed.unionByName(b1), "killed at marker")
  }

  test("vocabulary drift REQUESTS a rebuild; the tick appends and stays exact") {
    val cat = freshCatalog
    val seed = docs.filter(col("doc_id") < 300)
    IngestLoop.build(seed, cat, st)
    val vocabBefore = cat.read(spark, s"${st.prefixIndex}__vocab").count()
    // an alien-alphabet batch: near-total unseen-prefix share, plus an
    // internal near-dup pair so the fold has work to do
    val alien = Seq(
      (50001L, "ΩΨΦΞΔΘΛΠΣΓ ΩΨΦΞΔΘΛΠΣΓ ΞΞΔΔΘΘΛΛ ΠΠΣΣΓΓ"),
      (50002L, "ΩΨΦΞΔΘΛΠΣΓ ΩΨΦΞΔΘΛΠΣΓ ΞΞΔΔΘΘΛΛ ΠΠΣΣΓΓ αβ"),
      (50003L, "πολύ διαφορετικό κείμενο εδώ καθόλου όμοιο"))
      .toDF("doc_id", "text")
    assert(!IngestLoop.rebuildRequested(spark, cat, st))
    val s1 = IngestLoop.ingest(alien, cat, st)
    assert(s1.count() == 3)
    // the TICK stays batch-scale: it appended on the frozen order
    // (vocab untouched) and recorded the rebuild request for the
    // maintenance window instead of stalling on a corpus-scale job
    assert(cat.read(spark, s"${st.prefixIndex}__vocab").count()
      == vocabBefore, "a tick must never rebuild the vocabulary")
    assert(IngestLoop.rebuildRequested(spark, cat, st))
    assertConverged(cat, seed.unionByName(alien), "drift append")
    // the maintenance op rebuilds under a fresh snapshot: alien tokens
    // now carry REAL frequencies, the request clears, pairs unchanged
    assert(IngestLoop.maintainPrefixIndex(spark, cat, st))
    val vocabAfter = cat.read(spark, s"${st.prefixIndex}__vocab")
    assert(vocabAfter.count() > vocabBefore)
    assert(vocabAfter.filter(col("tok") === "ωψφξδ").count() == 1,
      "rebuilt vocab must hold the (lowercased) alien 5-grams")
    assert(!IngestLoop.rebuildRequested(spark, cat, st))
    assert(!IngestLoop.maintainPrefixIndex(spark, cat, st),
      "no standing request: maintenance must be a no-op")
    assertConverged(cat, seed.unionByName(alien), "post-rebuild")
    // and the rebuilt index serves the next tick
    val b2 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 350)
    IngestLoop.ingest(b2, cat, st)
    assertConverged(cat, seed.unionByName(alien).unionByName(b2),
      "tick after rebuild")
  }

  test("a rebuild killed mid-swap rolls forward before the next tick appends") {
    val cat = freshCatalog
    val seed = docs.filter(col("doc_id") < 300)
    IngestLoop.build(seed, cat, st)
    val alien = Seq(
      (50001L, "ΩΨΦΞΔΘΛΠΣΓ ΩΨΦΞΔΘΛΠΣΓ ΞΞΔΔΘΘΛΛ ΠΠΣΣΓΓ"),
      (50002L, "ΩΨΦΞΔΘΛΠΣΓ ΩΨΦΞΔΘΛΠΣΓ ΞΞΔΔΘΘΛΛ ΠΠΣΣΓΓ αβ"))
      .toDF("doc_id", "text")
    IngestLoop.ingest(alien, cat, st)
    assert(IngestLoop.rebuildRequested(spark, cat, st))
    // die AFTER the swap marker committed, BEFORE the install — the
    // staged index is complete; the next tick must land it before its
    // first append or the late-arriving swap would erase that append
    val boom = intercept[RuntimeException] {
      IngestLoop.rebuildPrefixIndexImpl(spark, cat, st,
        s => if (s == "rebuild_swap") throw new RuntimeException("kill@swap"))
    }
    assert(boom.getMessage == "kill@swap")
    val b2 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 350)
    IngestLoop.ingest(b2, cat, st)
    // the swap landed (alien vocab present), the request cleared, and
    // b2's prefix rows live in the NEW index (convergence proves the
    // next batch can still pair against them)
    assert(cat.read(spark, s"${st.prefixIndex}__vocab")
      .filter(col("tok") === "ωψφξδ").count() == 1)
    assert(!IngestLoop.rebuildRequested(spark, cat, st))
    assertConverged(cat,
      seed.unionByName(alien).unionByName(b2), "swap rolled forward")
    val b3 = docs.filter(col("doc_id") >= 350 && col("doc_id") < 400)
    IngestLoop.ingest(b3, cat, st)
    assertConverged(cat,
      seed.unionByName(alien).unionByName(b2).unionByName(b3),
      "tick after recovered swap")
  }

  test("a partition destroyed mid-component-write is restored from staged content") {
    // the delete-then-rename window inside dynamic partition overwrite
    // can vaporize a whole touched id-hash partition — including rows
    // of components the tick never remapped. Recovery must rewrite it
    // from the STAGED replacement content (recomputing from the
    // damaged standing table would silently drop the partition).
    val cat = freshCatalog
    val seed = docs.filter(col("doc_id") < 300)
    IngestLoop.build(seed, cat, st)
    // an internal near-dup pair → new nodes → non-empty staged content
    val b1 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
      .unionByName(Seq(
        (60001L, "shared shingle payload shared shingle payload alpha"),
        (60002L, "shared shingle payload shared shingle payload beta"))
        .toDF("doc_id", "text"))
    val boom = intercept[RuntimeException] {
      IngestLoop.ingestImpl(b1, cat, st,
        s => if (s == "prefix") throw new RuntimeException("kill@prefix"))
    }
    assert(boom.getMessage == "kill@prefix")
    // components landed before the kill; now destroy one touched
    // partition wholesale, as a crash inside the next write's
    // delete/rename pair would
    val staged = cat.read(spark, s"${st.corpus}__tick_components")
    assert(!staged.isEmpty, "test needs a non-empty staged delta")
    // pick a staged partition that exists on disk (one holding
    // standing rows — an all-new partition has no dir to destroy yet)
    val parts = staged.select("__part").distinct().as[Long].collect()
    val target = parts.map(p =>
        new java.io.File(s"${cat.root}/${st.components}/__part=$p"))
      .find(_.exists)
      .getOrElse(fail("no touched partition dir exists on disk"))
    def nuke(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(nuke)
      f.delete()
    }
    nuke(target)
    assert(!target.exists)
    // the retry's head-of-tick recovery replaces every touched
    // partition from staged content — the destroyed one included
    val retry = IngestLoop.ingest(b1, cat, st)
    assert(retry.isEmpty,
      "the recovered tick already landed; retry must gate out")
    assertConverged(cat, seed.unionByName(b1), "partition restored")
  }

  test("compactState merges the per-tick file accumulation; loop stays ≡ batch") {
    val cat = freshCatalog
    val seed = docs.filter(col("doc_id") < 200)
    IngestLoop.build(seed, cat, st)
    val b1 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 300)
    val b2 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    IngestLoop.ingest(b1, cat, st)
    IngestLoop.ingest(b2, cat, st)
    def parquetFiles(table: String): Int =
      new java.io.File(s"${cat.root}/$table").listFiles()
        .count(_.getName.endsWith(".parquet"))
    val corpusBefore = parquetFiles(st.corpus)
    val pfxBefore = parquetFiles(st.prefixIndex)
    assert(corpusBefore > 1 && pfxBefore > 1,
      s"appends should fragment ($corpusBefore, $pfxBefore)")
    IngestLoop.compactState(spark, cat, st, componentParts = true)
    assert(parquetFiles(st.corpus) < corpusBefore)
    assert(parquetFiles(st.prefixIndex) < pfxBefore)
    // data byte-equal through the rename protocol, and the loop keeps
    // working on the compacted tables
    assertConverged(cat, seed.unionByName(b1).unionByName(b2), "compacted")
    val b3 = docs.filter(col("doc_id") >= 400)
    IngestLoop.ingest(b3, cat, st)
    assertConverged(cat,
      seed.unionByName(b1).unionByName(b2).unionByName(b3),
      "tick after compaction")
  }

  test("ingestSink drives the loop from a real stream: micro-batches ≡ batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val cat = freshCatalog
    val seed = docs.filter(col("doc_id") < 300)
    IngestLoop.build(seed, cat, st)
    val src = MemoryStream[(Long, String)](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ingest-ckpt").toString
    val q = IngestLoop.ingestSink(
      src.toDF().toDF("doc_id", "text"), cat, st, ckpt)
    try {
      def rows(df: DataFrame) = df.select("doc_id", "text")
        .as[(Long, String)].collect().toSeq
      // batch 1: new docs + exact re-ingests of the seed
      src.addData(rows(docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
        .unionByName(reDup(seed.filter(col("doc_id") < 10), 10000L))): _*)
      q.processAllAvailable()
      // batch 2: the rest, plus re-ingests of batch 1
      src.addData(rows(docs.filter(col("doc_id") >= 400)): _*)
      q.processAllAvailable()
      val arrivals = seed
        .unionByName(docs.filter(col("doc_id") >= 300))
        .unionByName(reDup(seed.filter(col("doc_id") < 10), 10000L))
      assertConverged(cat, arrivals, "streamed ticks")
      // a drift batch REQUESTS a rebuild and the sink's maintain pass
      // runs it before the next micro-batch
      src.addData(
        (50001L, "ΩΨΦΞΔΘΛΠΣΓ ΩΨΦΞΔΘΛΠΣΓ ΞΞΔΔΘΘΛΛ ΠΠΣΣΓΓ"),
        (50002L, "ΩΨΦΞΔΘΛΠΣΓ ΩΨΦΞΔΘΛΠΣΓ ΞΞΔΔΘΘΛΛ ΠΠΣΣΓΓ αβ"))
      q.processAllAvailable()
      assert(!IngestLoop.rebuildRequested(spark, cat, st),
        "the sink's maintenance pass must have consumed the request")
      assert(cat.read(spark, s"${st.prefixIndex}__vocab")
        .filter(col("tok") === "ωψφξδ").count() == 1)
      val alien = Seq(
        (50001L, "ΩΨΦΞΔΘΛΠΣΓ ΩΨΦΞΔΘΛΠΣΓ ΞΞΔΔΘΘΛΛ ΠΠΣΣΓΓ"),
        (50002L, "ΩΨΦΞΔΘΛΠΣΓ ΩΨΦΞΔΘΛΠΣΓ ΞΞΔΔΘΘΛΛ ΠΠΣΣΓΓ αβ"))
        .toDF("doc_id", "text")
      assertConverged(cat, arrivals.unionByName(alien), "post-maintain")
    } finally q.stop()
  }

  test("a tick of pure re-ingests is a no-op on every artifact") {
    val cat = freshCatalog
    val seed = docs.filter(col("doc_id") < 200)
    IngestLoop.build(seed, cat, st)
    val before = cat.read(spark, st.corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val compBefore = IngestLoop.readComponents(spark, cat, st)
      .as[(Long, Long)].collect().toMap
    val s = IngestLoop.ingest(reDup(seed, 50000L), cat, st)
    assert(s.isEmpty)
    assert(cat.read(spark, st.corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq == before)
    assert(IngestLoop.readComponents(spark, cat, st)
      .as[(Long, Long)].collect().toMap == compBefore)
  }
}
