package graft

import org.apache.spark.sql.DataFrame
import graft.dedup.Dedup

/** dedup.Dedup.incrementalComponents: folding delta pairs into a
  * standing component assignment ≡ from-scratch CC on the union. */
class IncrementalComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def pairs(ps: (Long, Long)*): DataFrame =
    ps.toDF("id_a", "id_b")

  private def asMap(df: DataFrame): Map[Long, Long] =
    df.select("id", "component").as[(Long, Long)].collect().toMap

  // standing graph: {10,20,30} -> 10, {40,50} -> 40, {60,70} -> 60
  private val base = pairs((10L, 20L), (20L, 30L), (40L, 50L), (60L, 70L))

  test("delta merges, new chains, and a root-lowering id ≡ scratch CC") {
    val delta = pairs(
      (20L, 40L),   // bridges components 10 and 40
      (10L, 30L),   // internal to component 10 — contracts away
      (80L, 90L), (90L, 100L), // brand-new three-node chain
      (5L, 60L),    // new id BELOW the standing root: 60 -> 5
      (45L, 50L), (45L, 70L)) // new node transitively merging 40 & 60
    val got = asMap(Dedup.incrementalComponents(
      Dedup.connectedComponents(base), delta))
    val want = asMap(Dedup.connectedComponents(base.unionByName(delta)))
    assert(got == want)
    // the root-lowering and transitive merges actually happened
    assert(got(70L) == 5L && got(40L) == 5L && got(10L) == 5L,
      got.toString) // 20-40 bridge + 45 links pull everything to 5
    assert(got(100L) == 80L)
  }

  test("distributed resolver (cap 0) ≡ driver union-find ≡ scratch CC") {
    // the same root-lowering/merging delta as above, but with the
    // driver union-find fast path disabled so the pointer-jumping CC
    // resolves the contracted graph — both paths must produce the
    // identical assignment
    val delta = pairs((20L, 40L), (80L, 90L), (5L, 60L), (45L, 70L))
    val comps = Dedup.connectedComponents(base)
    val want = asMap(Dedup.connectedComponents(base.unionByName(delta)))
    assert(asMap(Dedup.incrementalComponents(comps, delta)) == want)
    spark.conf.set("graft.cc.driverUnionFindMaxEdges", "0")
    try assert(asMap(Dedup.incrementalComponents(comps, delta)) == want)
    finally spark.conf.unset("graft.cc.driverUnionFindMaxEdges")
  }

  test("empty delta is an exact no-op") {
    val comps = Dedup.connectedComponents(base)
    val got = asMap(Dedup.incrementalComponents(comps, pairs()))
    assert(got == asMap(comps))
  }

  test("internal-only delta changes no labels and adds no rows") {
    val comps = Dedup.connectedComponents(base)
    val got = asMap(Dedup.incrementalComponents(comps,
      pairs((10L, 30L), (40L, 50L))))
    assert(got == asMap(comps))
  }

  test("batch-only pairs form their own components beside the old ones") {
    val comps = Dedup.connectedComponents(base)
    val got = asMap(Dedup.incrementalComponents(comps,
      pairs((200L, 300L), (300L, 250L))))
    assert(got == asMap(comps) ++ Map(200L -> 200L, 300L -> 200L,
      250L -> 200L))
  }

  test("the standing assignment is never shuffled (no sort-merge join)") {
    val comps = Dedup.connectedComponents(base)
    val out = Dedup.incrementalComponents(comps, pairs((20L, 40L), (5L, 60L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("increments compose: two batches ≡ one combined batch ≡ scratch") {
    val d1 = pairs((20L, 40L), (80L, 90L))
    val d2 = pairs((90L, 100L), (5L, 60L), (45L, 50L), (45L, 70L))
    val stepwise = asMap(Dedup.incrementalComponents(
      Dedup.incrementalComponents(Dedup.connectedComponents(base), d1), d2))
    val scratch = asMap(Dedup.connectedComponents(
      base.unionByName(d1).unionByName(d2)))
    assert(stepwise == scratch)
  }

  test("componentChurn: a bridging node marks the united family as merged") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // old families {1,2} and {3,4}; node 9 (the "new batch") bridges them
    val pairs = Seq((1L, 2L), (3L, 4L), (2L, 9L), (9L, 3L))
      .toDF("id_a", "id_b")
    val churn = Dedup.componentChurn(pairs,
        pairs.filter(col("id_a") % 9 =!= 0 && col("id_b") % 9 =!= 0))
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(churn.toSeq == Seq((1L, 5L, 4L, 2L, true)))
  }
}
