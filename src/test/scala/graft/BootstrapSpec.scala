package graft

import org.apache.spark.sql.functions._
import graft.ops.Bootstrap

/** ops.Bootstrap: deterministic Poisson replicates — weight law,
  * exact means, replayability, and the statistics they exist for. */
class BootstrapSpec extends SparkTestBase {
  import spark.implicits._

  test("poissonWeight inverts the pinned thresholds") {
    val edges = Bootstrap.thresholds
    val cases = Seq(0L -> 0, (edges(0) - 1) -> 0, edges(0) -> 1,
      (edges(1) - 1) -> 1, edges(1) -> 2, edges(4) -> 5,
      edges(5) -> 6, ((1L << 28) - 1) -> 6)
    val got = cases.map(_._1).toDF("u")
      .select(Bootstrap.poissonWeight(col("u")).as("w"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == cases.map(_._2))
  }

  test("weights follow Poisson(1) closely on a large uniform population") {
    val n = 100000
    val df = (1L to n).toDF("id")
      .select(Bootstrap.poissonWeight(
        conv(substring(md5(concat(lit("law:"), col("id").cast("string"))),
          1, 7), 16, 10).cast("long")).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // P(0) = P(1) = e^-1 ~ 0.3679
    assert(math.abs(df(0).toDouble / n - 0.3679) < 0.01)
    assert(math.abs(df(1).toDouble / n - 0.3679) < 0.01)
    assert(math.abs(df(2).toDouble / n - 0.1839) < 0.01)
    // mean weight ~ 1 (the resample preserves expected mass)
    val mean = df.map { case (w, c) => w.toLong * c }.sum.toDouble / n
    assert(math.abs(mean - 1.0) < 0.01)
  }

  test("replicates are deterministic and differ from each other") {
    val docs = Tables.documents(spark, sf).limit(200)
    def run() = Bootstrap.replicateMeans(docs, "source", "doc_id",
        "n_chars", reps = 8, salt = "s1")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val a = run()
    assert(a == run(), "two runs must be byte-identical")
    // different replicates of one source draw different samples
    val bySource = a.keys.groupBy(_._1).head._1
    val effs = (0 until 8).map(b => a((bySource, b))._1)
    assert(effs.distinct.size > 1, s"all replicates identical: $effs")
  }

  test("the replicate spread brackets the true mean (the CI actually works)") {
    val docs = Tables.documents(spark, sf)
    val trueMean = docs.groupBy("source")
      .agg((lit(1000000L) * sum(col("n_chars")) / count(lit(1)))
        .cast("long").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val reps = Bootstrap.replicateMeans(docs, "source", "doc_id",
        "n_chars", reps = 32, salt = "boot42")
      .filter(col("mean_code").isNotNull)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toSeq
      .groupBy(_._1).map { case (s, v) => s -> v.map(_._2).sorted }
    reps.foreach { case (s, codes) =>
      assert(codes.size >= 30)
      // the true mean lies inside the replicate range for every
      // source (with 32 reps the min/max range is ~99% coverage;
      // the fixture is pinned, so this is exact, not flaky)
      assert(codes.head <= trueMean(s) && trueMean(s) <= codes.last,
        s"$s: true ${trueMean(s)} outside [${codes.head}, ${codes.last}]")
    }
  }

  test("working columns are collision-safe: an input column named b or w is inert") {
    // before the __b/__w rename, withColumn("b", ...) silently replaced
    // a same-named input column — and a value column named "b" would
    // have corrupted the seeded uniform itself
    val base = Seq(("k", 1L, 10L), ("k", 2L, 30L), ("k", 3L, 50L))
    val plain = Bootstrap.replicateMeans(
      base.toDF("key", "id", "v"), "key", "id", "v",
      reps = 8, salt = "s").collect()
      .map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
    val collide = Bootstrap.replicateMeans(
      base.toDF("key", "id", "w"), "key", "id", "w",
      reps = 8, salt = "s").collect()
      .map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(plain == collide, "a value column named w must not change results")
    // reserved names fail loudly rather than corrupting silently
    val ex = intercept[IllegalArgumentException](
      Bootstrap.replicateMeans(base.toDF("__b", "id", "v"),
        "__b", "id", "v", reps = 2, salt = "s"))
    assert(ex.getMessage.contains("reserved"), ex.getMessage)
    val exB = intercept[IllegalArgumentException](
      Bootstrap.replicateMeans(base.toDF("b", "id", "v"),
        "b", "id", "v", reps = 2, salt = "s"))
    assert(exB.getMessage.contains("collides"), exB.getMessage)
  }
}
