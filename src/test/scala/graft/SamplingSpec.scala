package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** ops.Sampling: partition-independent, composable hash sampling. */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf)

  test("hashSample is partition-count independent and ~fraction sized") {
    val a = Sampling.hashSample(docs, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs.repartition(13), "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    val n = docs.count()
    assert(math.abs(a.size - 0.2 * n) < 0.1 * n, s"${a.size} of $n")
  }

  test("smaller fraction is a subset of the larger (same salt)") {
    val small = Sampling.hashSample(docs, "doc_id", 0.05)
      .select("doc_id").as[Long].collect().toSet
    val big = Sampling.hashSample(docs, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("stratifiedHashSample balances per-language fractions") {
    val out = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Map("en" -> 0.5, "fr" -> 1.0))
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("en", "fr")) // unlisted strata dropped
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("fr") == total("fr"))
    assert(math.abs(counts("en") - 0.5 * total("en")) < 0.2 * total("en"))
  }
}
