package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

/** ops.Skew: salted join/agg equivalence with the unsalted plans. */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin matches plain join results on a skewed key") {
    // 90% of rows share one key — the salting target
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "v")
    val small = Seq((7L, "hot"), (20L, "a"), (40L, "b")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, "k", buckets = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 1802) // 1800 hot-key rows + keys 20 and 40
  }

  test("saltedAgg equals direct aggregation") {
    val df = (1 to 1000).map(i => (if (i % 4 == 0) "hot" else s"k$i", i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(df, "k", buckets = 4,
      partials = Seq("s" -> sum(col("v")), "n" -> count(lit(1))),
      finals = Seq("s" -> sum(col("s")), "n" -> sum(col("n"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  /** 85% of big rows share two keys; one of them is absent from the
    * dim, and null keys ride along — the full hot/cold routing. */
  private def skewed = {
    val big = (1 to 2000).map { i =>
      val k: java.lang.Long =
        if (i % 20 == 0) null
        else if (i % 10 < 6) 7L        // hot, matched
        else if (i % 10 < 9) 13L       // hot, unmatched in small
        else i.toLong
      (k, i)
    }.toDF("k", "v")
    val small = Seq((7L, "hot"), (20L, "a"), (40L, "b"), (7L, "dup"))
      .toDF("k", "name")
    (big, small)
  }

  test("hotColdJoin equals the plain join (inner, duplicates, nulls)") {
    val (big, small) = skewed
    val plain = big.join(small, Seq("k"), "inner")
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    val got = Skew.hotColdJoin(big, small, "k", "inner", hotDenom = 10L)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(got == plain && got.nonEmpty)
  }

  test("hotColdJoin equals the plain join (left outer + semi + anti)") {
    val (big, small) = skewed
    for (jt <- Seq("left", "left_semi", "left_anti")) {
      val cols = if (jt == "left") Seq("k", "v", "name") else Seq("k", "v")
      val plain = big.join(small, Seq("k"), jt)
        .select(cols.map(col): _*).collect().map(_.toSeq).toSet
      val got = Skew.hotColdJoin(big, small, "k", jt, hotDenom = 10L)
        .select(cols.map(col): _*).collect().map(_.toSeq).toSet
      assert(got == plain, jt)
      if (jt == "left") // unmatched-hot (13) and null rows all survive
        assert(got.exists(r => r.head == 13L && r(2) == null) &&
          got.exists(r => r.head == null))
    }
  }

  test("hotColdJoin: hot branch is a broadcast join in the plan") {
    val (big, small) = skewed
    val plan = Skew.hotColdJoin(big, small, "k", "inner", hotDenom = 10L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("Union"), plan)
  }

  test("hotColdJoin with no detected hot keys degrades to the plain join") {
    val big = (1 to 200).map(i => (i.toLong, i)).toDF("k", "v") // uniform
    val small = Seq((7L, "x")).toDF("k", "name")
    val got = Skew.hotColdJoin(big, small, "k", "inner", hotDenom = 4L)
      .collect().map(_.toSeq).toSet
    assert(got == big.join(small, Seq("k")).collect().map(_.toSeq).toSet)
  }
}
