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

  test("md5Sample matches a reference MD5 implementation row-for-row") {
    // the point of md5Sample is cross-engine portability, so the test
    // oracle is NOT Spark: recompute the decision with java.security
    val kept = Sampling.md5Sample(docs, "doc_id", "2")
      .select("doc_id").as[Long].collect().toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    val all = docs.select("doc_id").as[Long].collect()
    val want = all.filter { id =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      hex < "2"
    }.toSet
    assert(kept == want)
    assert(kept.nonEmpty && kept.size < all.length)
  }

  test("weightedMd5Sample keeps each row per its own probability, portably") {
    import org.apache.spark.sql.functions._
    // weights proportional to id (clamped): java-side replica decides
    val withW = docs.withColumn("w", least(lit(1.0), col("doc_id") / lit(250.0)))
    val kept = Sampling.weightedMd5Sample(withW, "doc_id", col("w"))
      .select("doc_id").as[Long].collect().toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    val all = docs.select("doc_id").as[Long].collect()
    val want = all.filter { id =>
      val w = math.min(1.0, id / 250.0)
      val cutLong = math.min(math.floor(w * 4294967296.0).toLong, 4294967295L)
      val cut = f"$cutLong%08x"
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 8)
      w >= 1.0 || hex < cut
    }.toSet
    assert(kept == want)
    assert(kept.nonEmpty && kept.size < all.length)
    // weight 1 is a GUARANTEED no-op filter (hash compare bypassed,
    // including the 1-in-2^32 "ffffffff" md5 prefix); weight 0 keeps nothing
    assert(Sampling.weightedMd5Sample(withW, "doc_id", lit(1.0)).count() == all.length)
    assert(Sampling.weightedMd5Sample(withW, "doc_id", lit(0.0)).count() == 0)
    // monotone: lowering weights only removes rows
    val lower = Sampling.weightedMd5Sample(withW, "doc_id", col("w") / 2)
      .select("doc_id").as[Long].collect().toSet
    assert(lower.subsetOf(kept))
  }

  test("groupedMd5Sample: exactly k per group, nested, heap not window") {
    import org.apache.spark.sql.functions._
    val d = Tables.documents(spark, sf)
    val k5 = Sampling.groupedMd5Sample(d, "doc_id", Seq("lang"), 5)
    val counts = k5.groupBy("lang").count().select("count").as[Long].collect()
    assert(counts.nonEmpty && counts.forall(_ == 5))
    // nested: the k=3 sample is a subset of the k=5 sample per group
    val k3 = Sampling.groupedMd5Sample(d, "doc_id", Seq("lang"), 3)
      .collect().map(_.toSeq).toSet
    assert(k3.subsetOf(k5.collect().map(_.toSeq).toSet))
    // matches the reference MD5 rank computed java-side
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = d.select("lang", "doc_id").as[(String, Long)].collect()
      .groupBy(_._1).values.flatMap(_.sortBy { case (_, id) =>
        md.digest(id.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      }.take(5)).toSet
    assert(k5.select("lang", "doc_id").as[(String, Long)].collect().toSet == want)
    // selection is the bounded-heap aggregate, not a per-group sort
    val plan = k5.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && !plan.contains("Window"), plan)
  }

  test("md5Sample thresholds nest and reject non-hex input") {
    val small = Sampling.md5Sample(docs, "doc_id", "1")
      .select("doc_id").as[Long].collect().toSet
    val big = Sampling.md5Sample(docs, "doc_id", "4")
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(big))
    intercept[IllegalArgumentException] {
      Sampling.md5Sample(docs, "doc_id", "2A") // uppercase → silent empty sample
    }
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

  test("stratifiedMd5Sample applies per-stratum thresholds portably") {
    val out = Sampling.stratifiedMd5Sample(docs, "doc_id", "lang",
      Map("en" -> "8", "fr" -> "f"))
    val kept = out.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val want = docs.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, lang) =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        lang match {
          case "en" => hex < "8"
          case "fr" => hex < "f"
          case _ => false // unlisted strata dropped
        }
      }.toSet
    assert(kept == want)
    assert(kept.nonEmpty)
    intercept[IllegalArgumentException] {
      Sampling.stratifiedMd5Sample(docs, "doc_id", "lang", Map("en" -> "2A"))
    }
  }
}
