package graft

import org.apache.spark.sql.functions._
import graft.ops.HeavyHitters

/** ops.HeavyHitters: Misra-Gries-narrowed, exactly-correct frequency
  * gating. */
class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  private def tokens = Tables.documents(spark, sf)
    .select(explode(split(col("text"), " ")).as("tok"))
    .filter(col("tok") =!= "")

  private def exactCounts(minCount: Long) = tokens
    .groupBy("tok").agg(count(lit(1)).as("cnt"))
    .filter(col("cnt") >= minCount)
    .as[(String, Long)].collect().toMap

  test("matches the exact aggregation on document tokens") {
    val n = tokens.count()
    val minCount = math.max(1L, n / 500L)
    val got = HeavyHitters
      .frequentItems(tokens, col("tok"), "tok", minCount)
      .as[(String, Long)].collect().toMap
    assert(got == exactCounts(minCount))
    assert(got.nonEmpty)
  }

  test("relative threshold equals the absolute one at n/denom") {
    val n = tokens.count()
    val abs = HeavyHitters
      .frequentItems(tokens, col("tok"), "tok", math.max(1L, n / 500L))
      .as[(String, Long)].collect().toMap
    val rel = HeavyHitters
      .frequentItemsRelative(tokens, col("tok"), "tok", denom = 500L)
      .as[(String, Long)].collect().toMap
    assert(rel == abs)
  }

  /** ~20k near-unique keys + two planted hot keys: the regime the
    * summary exists for. cap=64 > n/minCount ≈ 43, so the pruning
    * guarantee holds and the confirm pass sees only candidates. */
  test("planted hot keys in a high-cardinality stream, small summary") {
    val noise = spark.range(20000)
      .select(md5(concat(lit("hh-noise-"), col("id"))).as("k"))
    val hot = Seq.fill(600)("hot-a") ++ Seq.fill(550)("hot-b")
    val df = noise.unionByName(hot.toDF("k")).repartition(16)
    val got = HeavyHitters
      .frequentItems(df, col("k"), "k", minCount = 500, cap = 64)
      .as[(String, Long)].collect().toMap
    assert(got == Map("hot-a" -> 600L, "hot-b" -> 550L))
  }

  test("candidate pruning reaches the physical plan as an In/InSet filter") {
    val noise = spark.range(5000)
      .select(md5(concat(lit("hh-plan-"), col("id"))).as("k"))
    val df = noise.unionByName(Seq.fill(400)("hot-a").toDF("k"))
    val plan = HeavyHitters
      .frequentItems(df, col("k"), "k", minCount = 300, cap = 64)
      .queryExecution.executedPlan.toString.toLowerCase
    // the candidate literal reaches the plan only via the pruning
    // filter (a lone candidate simplifies In -> equality; more become
    // In/InSet) — either way the scan side is filtered pre-aggregate
    assert(plan.contains("hot-a"), plan)
  }

  test("cap too small for the guarantee falls back to the exact path") {
    // slack = n/cap ≈ 2644/8 >= minCount: pruning is void, output exact
    val hot = Seq.fill(80)("x") ++ Seq.fill(60)("y")
    val noise = spark.range(2500)
      .select(md5(concat(lit("hh-fb-"), col("id"))).as("k"))
    val df = noise.unionByName(hot.toDF("k")).repartition(7)
    val got = HeavyHitters
      .frequentItems(df, col("k"), "k", minCount = 50, cap = 8)
      .as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 80L, "y" -> 60L))
  }

  test("output is independent of the input partitioning") {
    val a = HeavyHitters
      .frequentItemsRelative(tokens.repartition(1), col("tok"), "tok", 500L)
      .as[(String, Long)].collect().toMap
    val b = HeavyHitters
      .frequentItemsRelative(tokens.repartition(13), col("tok"), "tok", 500L)
      .as[(String, Long)].collect().toMap
    assert(a == b && a.nonEmpty)
  }

  test("null keys are excluded") {
    val df = Seq(Some("a"), Some("a"), None, None, None).toDF("k")
    val got = HeavyHitters
      .frequentItems(df, col("k"), "k", minCount = 2, cap = 16)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L))
  }

  test("summary exchange is bounded by partitions x cap, not cardinality") {
    val df = spark.range(10000)
      .select(md5(concat(lit("hh-bound-"), col("id"))).as("k"))
      .repartition(4)
    val rows = HeavyHitters.mgSummary(df.as[String], cap = 32).count()
    assert(rows <= 4L * (32L + 1L), s"summary rows $rows")
  }
}
