package graft

import org.apache.spark.sql.functions._
import graft.ops.Exact

/** ops.Exact: order-independent exact sums for 2-decimal money. */
class ExactSpec extends SparkTestBase {
  import spark.implicits._

  test("sumMoney is exact and partition-count independent") {
    val rnd = new scala.util.Random(7)
    val cs = Seq.fill(500)(rnd.between(-10000000L, 10000000L))
    val vals = cs.map(_ / 100.0)
    val expected = cs.sum / 100.0 // integral cents sum, exact in double
    for (parts <- Seq(1, 3, 7)) {
      val got = vals.toDF("v").repartition(parts)
        .agg(Exact.sumMoney(col("v"))).head().getDouble(0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("avgMoney equals exact-sum / count, bit-for-bit") {
    val vals = Seq(1.01, 2.02, 3.03, 4.07)
    val got = vals.toDF("v").agg(Exact.avgMoney(col("v"))).head().getDouble(0)
    assert(got == (101L + 202L + 303L + 407L) / 100.0 / 4)
  }

  test("sumIntegral exact for integer-valued doubles") {
    val got = Seq(1.0, 2.0, 3.0).toDF("v")
      .agg(Exact.sumIntegral(col("v"))).head().getDouble(0)
    assert(got == 6.0)
  }
}
