package graft

import org.apache.spark.sql.functions._

/** Pins Catalyst's runtime bloom-filter semi-join reduction — the
  * engine-level complement to our explicit pushdown discipline. When a
  * join's build side is selective, Spark injects a bloom filter built
  * from the build-side keys into the PROBE side's scan, pruning fact
  * rows before the shuffle — at 100 TB this is the difference between
  * shuffling the whole fact table and shuffling the matching slice.
  * The thresholds here are lowered to demonstrate on test-scale data;
  * production leaves the 10 MB defaults. If a Spark upgrade or a conf
  * regression silently disables the rewrite, this spec fails.
  */
class RuntimeFilterSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val tmpDir =
    java.nio.file.Files.createTempDirectory("graft_rf_").toString

  private def withRuntimeFilterConfs(f: => Unit): Unit = {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a shuffled join
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim side injects a bloom filter into the fact scan") {
    withRuntimeFilterConfs {
      val fact = (1L to 50000L).map(i => (i % 1000, i)).toDF("k", "v")
        .write.mode("overwrite")
        .parquet(s"$tmpDir/rf_fact")
      val dim = (1L to 1000L).map(i => (i, s"d$i")).toDF("k", "name")
        .write.mode("overwrite")
        .parquet(s"$tmpDir/rf_dim")
      val f = spark.read.parquet(s"$tmpDir/rf_fact")
      val d = spark.read.parquet(s"$tmpDir/rf_dim")
        .filter(col("k") < 20) // selective build side
      val joined = f.join(d, Seq("k"))
      val plan = joined.queryExecution.optimizedPlan.toString
      // the probe (fact) side gains might_contain(<bloom_filter_agg of
      // the build side's keys>) — plus the k<20 predicate itself via
      // constraint propagation through the equi-join
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$plan")
      // semantics unchanged by the rewrite
      assert(joined.count() == 19 * 50)
    }
  }
}
