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
}
