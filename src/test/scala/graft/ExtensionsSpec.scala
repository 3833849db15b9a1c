package graft

import org.apache.spark.sql.SparkSession

/** functions.GraftExtensions: custom expressions reachable from SQL. */
class ExtensionsSpec extends SparkTestBase {

  lazy val sqlSpark: SparkSession = {
    // builder extensions only apply at session creation; in a shared
    // test JVM register directly on the live session instead
    graft.functions.GraftExtensions.register(spark)
    spark
  }

  test("custom expressions callable from SQL") {
    val r = sqlSpark.sql(
      """SELECT
        |  jaccard_sim(array('a','b','c'), array('b','c','d')) AS j,
        |  simhash64(array('x','y')) AS sh,
        |  size(char_ngrams('abcdef', 3)) AS ng,
        |  size(word_shingles(array('a','b','c'), 2)) AS ws,
        |  dot_product_d(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  element_at(minhash_signature(array('a','b'), 4), 1) AS mh,
        |  classifier_score(array('x','y')) AS cs
        |""".stripMargin).head()
    assert(r.getAs[Double]("j") == 0.5)
    assert(r.getAs[Int]("ng") == 4)
    assert(r.getAs[Int]("ws") == 2)
    assert(r.getAs[Double]("dp") == 11.0)
    assert(r.getAs[Long]("sh") != 0L)
    assert(r.getAs[Long]("cs") ==
      Seq("x", "y").map { t =>
        val bucket = graft.functions.SimHash64.tokenHash(t) & 0xFFFFFL
        ((bucket * 2654435761L) >>> 16) % 65536L - 32768L
      }.sum)
  }

  test("custom aggregates callable from SQL") {
    import spark.implicits._
    Seq(("a", 3L), ("a", 1L), ("a", 2L), ("b", 9L)).toDF("g", "v")
      .createOrReplaceTempView("ext_topk_in")
    val rows = sqlSpark.sql(
      """SELECT g, top_k(v, 2) AS top2, top_k(v, 1, true) AS min1
        |FROM ext_topk_in GROUP BY g ORDER BY g""".stripMargin)
      .collect()
    assert(rows(0).getSeq[Long](1).toSeq == Seq(3L, 2L))
    assert(rows(0).getSeq[Long](2).toSeq == Seq(1L))
    assert(rows(1).getSeq[Long](1).toSeq == Seq(9L))
  }

  test("bloom gate expressible in pure SQL (scalar-subquery bloom)") {
    import spark.implicits._
    Seq("k1", "k2", "k3").toDF("k").createOrReplaceTempView("ext_corpus")
    Seq("k2", "k9").toDF("k").createOrReplaceTempView("ext_batch")
    val rows = sqlSpark.sql(
      """WITH bf AS (SELECT bloom_agg(k, 100, 1000) AS b FROM ext_corpus)
        |SELECT k, bloom_might_contain((SELECT b FROM bf), k) AS hit
        |FROM ext_batch ORDER BY k""".stripMargin).collect()
    // k2 is a true member (no false negatives); k9 is almost surely out
    assert(rows(0).getString(0) == "k2" && rows(0).getBoolean(1))
    assert(rows(1).getString(0) == "k9" && !rows(1).getBoolean(1))
  }
}
