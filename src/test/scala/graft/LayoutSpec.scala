package graft

import org.apache.spark.sql.functions._
import graft.catalog.{Layout, ParquetCatalog}

/** catalog.Layout: range-clustered writes produce files whose min/max
  * spans tile the key domain — the property row-group skipping needs. */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  private def freshCatalog = {
    val root = java.nio.file.Files.createTempDirectory("graft-layout")
    new ParquetCatalog(root.toString)
  }

  private def parquetFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    d.listFiles().toSeq.map(_.toString).filter(_.endsWith(".parquet"))
  }

  private def span(file: String): (Long, Long) = {
    val r = spark.read.parquet(file)
      .agg(min("doc_id"), max("doc_id")).head()
    (r.getLong(0), r.getLong(1))
  }

  test("clustered files carry pairwise-disjoint doc_id spans; content survives") {
    val cat = freshCatalog
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    Layout.overwriteClustered(cat, docs, "docs_clustered",
      numFiles = 8, clusterCols = Seq("doc_id"))
    val files = parquetFiles(s"${cat.root}/docs_clustered")
    assert(files.size == 8, files.mkString(","))
    val spans = files.map(span).sortBy(_._1)
    spans.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2, spans.mkString(","))
      case _ =>
    }
    val got = cat.read(spark, "docs_clustered")
      .select("doc_id").as[Long].collect().sorted
    val want = docs.select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == want.toSeq)
  }

  test("an unclustered hash shuffle leaves every file spanning the domain") {
    val cat = freshCatalog
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    cat.overwrite(docs.repartition(8, col("doc_id")), "docs_hashed")
    val n = docs.count()
    val spans = parquetFiles(s"${cat.root}/docs_hashed").map(span)
    // hash placement: every file's span covers most of the key domain,
    // so a range predicate can skip nothing — the contrast the
    // clustered layout exists to fix
    assert(spans.forall { case (lo, hi) => hi - lo > n / 2 },
      spans.mkString(","))
  }

  test("the range predicate reaches the clustered scan as a pushed filter") {
    val cat = freshCatalog
    Layout.overwriteClustered(cat,
      Tables.documents(spark, sf).select("doc_id", "text"),
      "docs_pushed", numFiles = 8, clusterCols = Seq("doc_id"))
    val q = cat.read(spark, "docs_pushed")
      .filter(col("doc_id") >= 100 && col("doc_id") < 120)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") &&
      scan.contains("GreaterThanOrEqual(doc_id,100"), scan)
  }

  test("partitionBy composes: directory pruning above, clustering within") {
    val cat = freshCatalog
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    Layout.overwriteClustered(cat, docs, "docs_part",
      numFiles = 4, clusterCols = Seq("doc_id"),
      partitionBy = Seq("lang"))
    val langs = docs.select("lang").distinct().as[String].collect()
    langs.foreach { lang =>
      val dir = s"${cat.root}/docs_part/lang=$lang"
      val files = parquetFiles(dir)
      assert(files.nonEmpty, dir)
      val spans = files.map(span).sortBy(_._1)
      spans.sliding(2).foreach {
        case Seq((_, hi), (lo2, _)) => assert(hi < lo2, s"$lang: $spans")
        case _ =>
      }
    }
    assert(cat.read(spark, "docs_part").count() == docs.count())
  }
}
