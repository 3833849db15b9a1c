package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import graft.etl.{Cleanse, Star}
import graft.ops.Exact

/** Property-based invariants (SURVEY.md §5.2): dedup idempotence,
  * union-by-name stability, exact-sum order independence, anti-join
  * disjointness. Run by sbt's native ScalaCheck framework. */
object PropertySuite extends Properties("graft") {
  // 30 generated cases per property: each case runs 1-3 Spark actions,
  // so the default 100 adds minutes of wall time for no extra coverage
  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(30)

  private lazy val spark: SparkSession = TestSessions.spark
  import spark.implicits._

  private val smallInts = Gen.listOfN(30, Gen.choose(-50, 50))

  property("dedup is idempotent and yields distinct rows") =
    Prop.forAll(smallInts) { xs =>
      val df = xs.toDF("v")
      val once = Cleanse.dedup(df)
      val twice = Cleanse.dedup(once)
      once.count() == xs.distinct.size && twice.count() == once.count()
    }

  property("unionConformed is column-order independent") =
    Prop.forAll(smallInts) { xs =>
      val a = xs.map(x => (x, x.toString)).toDF("k", "v")
      val b = xs.map(x => (x.toString, x)).toDF("v", "k")
      Cleanse.unionConformed(Seq(a, b)).count() == 2L * xs.size
    }

  property("sumMoney is exact under any repartitioning") =
    Prop.forAll(Gen.listOfN(50, Gen.choose(-1000000L, 1000000L)),
        Gen.choose(1, 7)) { (cents, parts) =>
      val vals = cents.map(_ / 100.0)
      val got = vals.toDF("v").repartition(parts)
        .agg(Exact.sumMoney(col("v"))).head().getDouble(0)
      got == cents.sum / 100.0
    }

  property("newKeys is disjoint from the dim and covers fresh \\ dim") =
    Prop.forAll(smallInts, smallInts) { (fresh, dim) =>
      val novel = Star.newKeys(fresh.toDF("k"), dim.toDF("k"), "k")
        .as[Int].collect().toSet
      novel == (fresh.toSet -- dim.toSet)
    }

  property("durationSeconds is non-negative when end >= start") =
    Prop.forAll(Gen.choose(0L, 1700000000L), Gen.choose(0L, 100000L)) {
      (start, delta) =>
        val df = Seq((new java.sql.Timestamp(start * 1000),
          new java.sql.Timestamp((start + delta) * 1000))).toDF("s", "e")
        df.select(Cleanse.durationSeconds(col("s"), col("e")))
          .head().getLong(0) == delta
    }
}
