package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.dedup.{Curation, Dedup}
import graft.etl.{Reports, Star}
import graft.sim.Ann

/** Degenerate-input behavior: every operator must return empty (not
  * throw) on empty frames — at scale, empty partitions and empty
  * incremental batches are routine, not edge cases. */
class EmptyInputSpec extends SparkTestBase {
  import spark.implicits._

  lazy val noDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType))))

  lazy val noVecs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))))

  test("dedup family returns empty on empty docs") {
    assert(Dedup.exactGroups(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.minhashPairs(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simhashPairs(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.ngramJaccardPairs(noDocs, "doc_id", "text").count() == 0)
  }

  test("ann returns empty for empty corpus or empty query set") {
    val e = Tables.embeddings(spark, sf)
    assert(Ann.bruteForceTopK(noVecs, noVecs, 5).count() == 0)
    assert(Ann.bruteForceTopK(e, noVecs, 5).count() == 0)
    assert(Ann.lshTopK(noVecs, noVecs, 5).count() == 0)
  }

  test("report aggregation of an empty fact is empty") {
    val fact = Tables.lineitem(spark, sf).filter(lit(false))
    val out = Reports.report(fact, Seq(col("l_returnflag")),
      Seq(Reports.Measure("q", col("l_quantity"), Reports.Integral)))
    assert(out.count() == 0)
  }

  test("watermark over empty input is None; incremental passthrough") {
    val empty = Tables.orders(spark, sf).filter(lit(false))
    assert(Star.watermark(empty, "o_orderdate").isEmpty)
    assert(Star.newerThan(empty, "o_orderdate", None).count() == 0)
  }

  test("curation of an empty corpus reports zeros and keeps nothing") {
    val (kept, report) = Curation.curate(noDocs, "doc_id", "text", "lang",
      Curation.Config(langs = Set.empty))
    assert(kept.count() == 0)
    assert(report.head().getAs[Long]("input") == 0)
  }

  test("range join, packing, top-k, cross-doc, semantic dedup on empty frames") {
    val noPoints = Seq.empty[(Long, Long)].toDF("t", "pid")
    val noIvals = Seq.empty[(Long, Long, Long)].toDF("iid", "s", "e")
    assert(graft.ops.RangeJoin.pointInInterval(noPoints, noIvals,
      col("t"), col("s"), col("e"), binWidth = 10).count() == 0)
    val somePoints = Seq((5L, 1L)).toDF("t", "pid")
    assert(graft.ops.RangeJoin.pointInInterval(somePoints, noIvals,
      col("t"), col("s"), col("e"), binWidth = 10).count() == 0)
    assert(graft.ops.Packing.concatChunk(
      noDocs.withColumn("n", lit(1L)), "doc_id", col("n"), 16, 4).count() == 0)
    val noKv = Seq.empty[(String, Long)].toDF("g", "v")
    assert(noKv.groupBy("g")
      .agg(graft.functions.aggs.top_k(col("v"), 3).as("t")).count() == 0)
    assert(graft.text.CrossDoc.duplicateShingleStats(
      noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.semanticPairs(noVecs, "vec_id", "embedding",
      threshold = 0.5, nClusters = 4, iters = 1, probes = 1).count() == 0)
    assert(graft.ops.Sketches.rollup(graft.ops.Sketches.distinctSketch(
      noDocs, col("doc_id"), Seq.empty), Seq.empty).count() == 1) // global agg row
  }

  test("the r9 additions return empty (not throw) on empty frames") {
    val noSrc = noDocs.withColumn("source", lit("s"))
      .filter(lit(false))
    assert(graft.sim.Bitext.mine(noVecs, noVecs, k = 2, marginMin = 1.1)
      .count() == 0)
    assert(graft.text.CrossDoc.snapshotNovelty(noDocs, noDocs,
      "doc_id", "text").count() == 0)
    assert(graft.sim.Whitening.whiten(noVecs).count() == 0)
    assert(graft.text.Winnow.fingerprints(noDocs, "doc_id", "text")
      .count() == 0)
    assert(graft.text.Winnow.candidatePairs(noDocs, "doc_id", "text")
      .count() == 0)
    assert(graft.ops.LinkAnalysis.triangles(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() == 0)
    assert(graft.dedup.Curation.dedupWeightedSample(noDocs, "doc_id",
      Seq.empty[(Long, Long)].toDF("id", "component")).count() == 0)
    assert(graft.ops.Privacy.kAnonymize(noSrc, "doc_id",
      Seq("lang", "source"), k = 5).count() == 0)
    assert(graft.ops.Merge.applyChanges(noDocs,
      noDocs.withColumn("op", lit("I")).filter(lit(false)), "doc_id")
      .count() == 0)
    assert(graft.ops.Robust.madOutliers(
      Seq.empty[(Long, String, Long)].toDF("id", "seg", "v"),
      "seg", "v", "id").count() == 0)
    assert(graft.text.LangConsistency.mixedLanguage(noDocs,
      "doc_id", "text").count() == 0)
    assert(graft.ops.Paths.sessionPathTrigrams(
      Seq.empty[(Long, Long, java.sql.Timestamp, String)]
        .toDF("user_id", "event_id", "ts", "event_type"),
      "user_id", "ts", "event_id", "event_type").count() == 0)
    assert(graft.ops.Quantiles.equiDepthHistogram(
      Seq.empty[(Long, Long)].toDF("id", "v"), "v", "id", 4).count() == 0)
    assert(graft.text.Vocab.coverageCurve(noDocs, "text").count() == 0)
    assert(graft.text.Vocab.clusterKeywords(noSrc, "source", "text")
      .count() == 0)
    assert(graft.dedup.Dedup.componentChurn(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"),
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() == 0)
    assert(graft.text.CrossDoc.firstCarrierStats(noDocs, "doc_id", "text")
      .count() == 0)
    assert(graft.etl.Funnels.rollingActive(
      Seq.empty[(Long, java.sql.Timestamp)].toDF("user_id", "ts"))
      .count() == 0)
  }

  test("r10 operators return empty on empty frames") {
    val noEv = Seq.empty[(String, java.sql.Timestamp)].toDF("k", "ts")
    assert(graft.ops.Trend.dailyTrend(noEv, "k", "ts").count() == 0)
    assert(graft.ops.Trend.theilSen(noEv, "k", "ts").count() == 0)
    val noKv = Seq.empty[(String, Long)].toDF("k", "v")
    assert(graft.ops.IncAgg.state(noKv, Seq("k"), "v").count() == 0)
    assert(graft.ops.IncAgg.merge(Seq("k"),
      Seq(graft.ops.IncAgg.state(noKv, Seq("k"), "v"),
        graft.ops.IncAgg.state(noKv, Seq("k"), "v"))).count() == 0)
    val noDocs3 = Seq.empty[(String, Long, Long)].toDF("src", "id", "v")
    assert(graft.ops.Bootstrap.replicateMeans(noDocs3, "src", "id", "v",
      reps = 4, salt = "s").count() == 0)
    assert(graft.ops.TargetEncode.encodingTable(
      Seq.empty[(String, Long, Long)].toDF("src", "t", "id"),
      "src", "t", "id", folds = 3, m = 5L, salt = "s").count() == 0)
    val noScored = Seq.empty[(String, Long, Int)].toDF("seg", "score", "y")
    assert(graft.ops.Eval.aucBySegment(noScored, "seg", "score", "y")
      .count() == 0)
    assert(graft.ops.Eval.confusionAt(noScored, "seg", "score", "y", 0L)
      .count() == 0)
    assert(graft.ops.Eval.kendallBySegment(
      Seq.empty[(String, Long, Long, Long)].toDF("seg", "id", "x", "y"),
      "seg", "x", "y", "id").count() == 0)
    val noRanked = Seq.empty[(Long, String, Int)].toDF("qid", "doc_id", "rank")
    val noRel = Seq.empty[(Long, String, Long)].toDF("qid", "doc_id", "grade")
    assert(graft.ops.Eval.ndcgAtK(noRanked, noRel, k = 5).count() == 0)
    val noXy = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(graft.ops.ZOrder.bucketStats(noXy, "x", "y", 8, 8).count() == 0)
    assert(graft.ops.Quantiles.quantileNormalize(
      Seq.empty[(String, Long, Long)].toDF("seg", "id", "v"),
      "seg", "v", "id").count() == 0)
    assert(graft.ops.Linkage.scorePairs(
      Seq.empty[(Long, Long, String, String)]
        .toDF("a_id", "b_id", "a_l", "b_l"),
      Seq(graft.ops.Linkage.Field("l", col("a_l") === col("b_l"),
        5L, -1L)), 3L).count() == 0)
  }

  test("r12 graph family returns empty on an empty pair frame") {
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    import graft.ops.LinkAnalysis
    assert(LinkAnalysis.labelPropagation(noPairs).count() == 0)
    assert(LinkAnalysis.kCore(noPairs, k = 2).count() == 0)
    assert(LinkAnalysis.personalizedPageRank(noPairs,
      Seq(1L).toDF("id")).count() == 0)
    assert(LinkAnalysis.assortativityFixed(noPairs).count() == 0)
    // modularity with an empty labels frame on an empty graph
    assert(LinkAnalysis.modularity(noPairs,
      Seq.empty[(Long, Long)].toDF("id", "label")).count() == 0)
  }

  test("r12 stat/drift family degrades to empty or sane rows on empty input") {
    val noRows = Seq.empty[(String, Long)].toDF("g", "v")
    assert(graft.ops.Snapshot.ksDrift(noRows, noRows, "g", "v")
      .count() == 0)
    assert(graft.ops.Balance.giniConcentration(noRows, "g", col("v"))
      .head().isNullAt(2)) // 0 groups, null gini, no crash
    assert(graft.ops.Robust.rateSignificance(noRows, "g", col("v") > 0)
      .count() == 0)
    val noEvents = Seq.empty[(String, java.sql.Timestamp)].toDF("k", "ts")
    assert(graft.ops.Trend.autocorrFixed(noEvents, "ts", "k", 3600L, 1)
      .count() == 0)
    assert(graft.ops.Trend.cusumChangepoint(noEvents, "k", "ts")
      .count() == 0)
    assert(graft.text.Vocab.chiSquareTokens(noDocs, "text",
      col("lang") === "en", topK = 5).count() == 0)
    assert(graft.ops.Profiler.benford(Seq.empty[Long].toDF("v"),
      col("v")).collect().forall(r => r.getLong(1) == 0 && r.isNullAt(3)))
    assert(graft.sim.Ann.knnJoinScaled(noVecs, k = 3).count() == 0)
    // isotonic over an empty group set yields no rows after explode
    assert(Seq.empty[(String, Long, Long, Long)].toDF("g", "x", "id", "y")
      .groupBy(col("g"))
      .agg(graft.functions.aggs.isotonic_fit(
        struct(col("x"), col("id"), col("y"))).as("f"))
      .count() == 0)
  }
}
