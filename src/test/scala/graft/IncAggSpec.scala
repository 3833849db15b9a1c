package graft

import org.apache.spark.sql.functions._
import graft.ops.IncAgg

/** ops.IncAgg: merge(state(A), state(B)) == state(A union B), in any
  * grouping — the algebra materialized-view maintenance rests on. */
class IncAggSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(n: Int, seed: Int) = {
    val r = new scala.util.Random(seed)
    (1 to n).map(_ => (s"k${r.nextInt(4)}", r.nextInt(1000).toLong - 200))
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq

  test("two-way merge equals the from-scratch aggregate") {
    val a = rows(200, 1).toDF("k", "v")
    val b = rows(150, 2).toDF("k", "v")
    val merged = IncAgg.merge(Seq("k"),
      Seq(IncAgg.state(a, Seq("k"), "v"), IncAgg.state(b, Seq("k"), "v")))
    val full = IncAgg.state(a.unionByName(b), Seq("k"), "v")
    assert(canon(merged) == canon(full))
  }

  test("merge is associative and order-blind: hourly->daily == all-at-once") {
    val batches = (1 to 6).map(i => rows(60, i).toDF("k", "v"))
    val states = batches.map(IncAgg.state(_, Seq("k"), "v"))
    // fold pairwise left-to-right
    val chained = states.reduce((x, y) => IncAgg.merge(Seq("k"), Seq(x, y)))
    // fold in one flat merge, reversed order
    val flat = IncAgg.merge(Seq("k"), states.reverse)
    val full = IncAgg.state(batches.reduce(_ unionByName _), Seq("k"), "v")
    assert(canon(chained) == canon(full))
    assert(canon(flat) == canon(full))
  }

  test("a key present in only one batch survives the merge intact") {
    val a = Seq(("only_a", 5L), ("both", 1L)).toDF("k", "v")
    val b = Seq(("both", 3L)).toDF("k", "v")
    val m = canon(IncAgg.merge(Seq("k"),
      Seq(IncAgg.state(a, Seq("k"), "v"), IncAgg.state(b, Seq("k"), "v"))))
    assert(m == Seq(("both", 2L, 4L, 1L, 3L), ("only_a", 1L, 5L, 5L, 5L)))
  }
}
