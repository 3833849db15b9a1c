package graft

import org.apache.spark.sql.functions._

/** BenchSf1's replica tiers must preserve workload DENSITY, or the
  * fitted exponents measure the generator, not the algorithm. The
  * first design (token salting) failed this for char n-grams: the
  * uniform `k1_` prefix injected universal boundary 5-grams, pushing
  * unrelated within-replica pairs over the 0.25 Jaccard threshold —
  * the x2 pair graph densified toward a clique and the triangle
  * shuffle filled the disk. The rotation scheme is pinned here by the
  * property that killed its predecessor: the 0.25-threshold char-5-
  * gram pair graph of the x2 tier has EXACTLY 2x the edges of x1,
  * every edge within one replica. */
class BenchSf1TierSpec extends SparkTestBase {

  test("x2 tier: exactly 2x the 0.25 pair-graph edges, none cross-replica") {
    val root = java.nio.file.Files.createTempDirectory("sf1_tier_spec_")
    try {
      BenchSf1.generateTiers(spark, "/root/testdata/sf0.001",
        root.toString)
      def pairs(dir: String) = {
        val corpus = Tables.documents(spark, dir)
          .select(col("doc_id"),
            graft.dedup.Dedup.charNgrams(col("text"), 5).as("set"))
        graft.dedup.Dedup
          .exactSimilarityPairs(corpus, "doc_id", threshold = 0.25)
          .select("id_a", "id_b")
      }
      val e1 = pairs(s"$root/x1").count()
      val p2 = pairs(s"$root/x2").cache()
      val e2 = p2.count()
      assert(e2 == 2 * e1,
        s"x2 edges $e2 != 2 * x1 edges $e1 — tier generation is " +
          "densifying or thinning the graph")
      // replica membership = id div 10^7; an edge crossing replicas
      // means the rotation leaked shared n-grams
      val cross = p2.filter(
        expr("(id_a div 10000000) != (id_b div 10000000)")).count()
      assert(cross == 0, s"$cross cross-replica edges")
      p2.unpersist()
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).sorted(
          java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("rotation preserves length and keeps replica text disjoint") {
    val root = java.nio.file.Files.createTempDirectory("sf1_tier_spec2_")
    try {
      BenchSf1.generateTiers(spark, "/root/testdata/sf0.001",
        root.toString)
      val d2 = Tables.documents(spark, s"$root/x2")
      // n_chars column must match the actual rotated text length
      assert(d2.filter(length(col("text")) =!= col("n_chars")).count() == 0)
      // replica 1's token space shares nothing with replica 0's
      val toks = d2.select(
          (col("doc_id") >= 10000000L).as("rep"),
          explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(countDistinct("rep").as("reps"))
      assert(toks.filter(col("reps") > 1).count() == 0,
        "a token appears in both replicas — rotation is not disjoint")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).sorted(
          java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
