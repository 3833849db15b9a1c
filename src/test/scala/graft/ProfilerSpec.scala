package graft

import org.apache.spark.sql.functions._
import graft.ops.Profiler
import graft.ops.Profiler.Expectation

/** ops.Profiler: per-column profiles (q139) and expectation gates
  * (q140). */
class ProfilerSpec extends SparkTestBase {
  import spark.implicits._

  test("profile counts rows, nulls, exact distincts per column, in order") {
    val df = Seq(
      (Some(1), Some("a")), (Some(1), None), (Some(2), Some("b")),
      (None, Some("a"))).toDF("x", "y")
    val r = Profiler.profile(df, Seq("y", "x")).orderBy("ord").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      (0, "y", 4L, 1L, 2L),   // request order preserved: y first
      (1, "x", 4L, 1L, 2L)))
  }

  test("profile is one job over one scan (single aggregate)") {
    val plan = Profiler.profile(Tables.orders(spark, sf),
        Seq("o_orderkey", "o_orderstatus"))
      .queryExecution.executedPlan.toString
    assert(plan.split("Scan parquet").length == 2, plan.take(1500)) // exactly one scan
  }

  test("expect: violations counted, null predicate counts as violation") {
    val df = Seq((Some(5.0), "A"), (Some(60.0), "B"), (None, "A"))
      .toDF("q", "f")
    val r = Profiler.expect(df, Seq(
        Expectation.between("q", 1, 50),
        Expectation.inSet("f", Seq("A")),
        Expectation.notNull("f")))
      .orderBy("ord").collect()
      .map(x => (x.getString(1), x.getLong(2), x.getLong(3),
        x.getBoolean(4)))
    assert(r.toSeq == Seq(
      ("q in [1.0,50.0]", 3L, 2L, false),  // 60 out of range, null q
      ("f in {A}", 3L, 1L, false),
      ("f is not null", 3L, 0L, true)))
  }

  test("the q140 contract on the real table: tight range fails, others hold") {
    val r = Profiler.expect(Tables.lineitem(spark, sf), Seq(
        Expectation.notNull("l_orderkey"),
        Expectation.between("l_quantity", 1, 45),
        Expectation.inSet("l_returnflag", Seq("A", "N", "R"))))
      .orderBy("ord").collect()
    assert(r(0).getAs[Boolean]("passed"))
    assert(!r(1).getAs[Boolean]("passed") &&
      r(1).getAs[Long]("n_violations") > 0)
    assert(r(2).getAs[Boolean]("passed"))
    // every rule saw the full table
    assert(r.forall(_.getAs[Long]("n") == Tables.lineitem(spark, sf).count()))
  }

  test("tableDigest: order/partition-independent, any row change moves it") {
    import spark.implicits._
    val base = Seq((1L, "a", null.asInstanceOf[String]),
      (2L, "b", "x"), (3L, "c", "y")).toDF("id", "v", "o")
    def dig(df: org.apache.spark.sql.DataFrame) =
      Profiler.tableDigest(df, Seq("id", "v", "o"))
        .as[(Long, Long, Long)].head()
    val d0 = dig(base)
    assert(d0._1 == 3L)
    assert(dig(base.repartition(7)) == d0)              // layout-blind
    assert(dig(base.orderBy(col("id").desc)) == d0)     // order-blind
    val changed = Seq((1L, "a", null.asInstanceOf[String]),
      (2L, "B", "x"), (3L, "c", "y")).toDF("id", "v", "o")
    assert(dig(changed) != d0)                          // content-aware
    // doubling every row cancels the XOR to 0 — exactly why the
    // count and the mod-p sum ride along: they both still move
    val d2 = dig(base.union(base))
    assert(d2._2 == 0L && d2._1 == 6L && d2._3 == d0._3 * 2)
  }

  test("benford: hand-built histogram, digit-string extraction, exclusions") {
    import org.apache.spark.sql.functions._
    // values: first digits 1,1,1,2,9; 0 and negatives excluded
    val d = Seq(1L, 15L, 1234567890123L, 200L, 9L, 0L, -300L).toDF("v")
    val r = Profiler.benford(d, col("v"))
      .collect().map(x => x.getInt(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r.keySet == (1 to 9).toSet) // all digits present
    assert(r(1) == ((3L, 301030L, 600000L, 298970L)))
    assert(r(2) == ((1L, 176091L, 200000L, 23909L)))
    assert(r(9) == ((1L, 45757L, 200000L, 154243L)))
    assert(r(5) == ((0L, 79181L, 0L, 79181L))) // zero-count digit emitted
    // the expected table sums to exactly one million — no residual
    assert(r.values.map(_._2).sum == 1000000L)
    // a perfect Benford sample (counts proportional to expectation)
    // would zero every deviation; approximate with the table itself
    val scaled = (1 to 9).flatMap(dg =>
      Seq.fill(r(dg)._2.toInt / 45757)(math.pow(10, dg.toString.length).toLong * dg))
    val perfect = Profiler.benford(scaled.toDF("v"), col("v"))
      .agg(max(col("dev_fp"))).head().getLong(0)
    assert(perfect < 50000L) // integer-rounded proportions stay close
  }
}
