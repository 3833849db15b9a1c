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
        |  element_at(minhash_signature(array('a','b'), 4), 1) AS mh
        |""".stripMargin).head()
    assert(r.getAs[Double]("j") == 0.5)
    assert(r.getAs[Int]("ng") == 4)
    assert(r.getAs[Int]("ws") == 2)
    assert(r.getAs[Double]("dp") == 11.0)
    assert(r.getAs[Long]("sh") != 0L)
  }
}
