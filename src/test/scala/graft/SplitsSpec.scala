package graft

import org.apache.spark.sql.functions._
import graft.ops.Splits

/** ops.Splits: leakage-safe, engine-portable dataset splitting. */
class SplitsSpec extends SparkTestBase {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf)
  val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("hexCut renders the exact 8-digit lowercase cut points") {
    assert(Splits.hexCut(0.8) == "cccccccc")
    assert(Splits.hexCut(0.9) == "e6666666")
    assert(Splits.hexCut(1.0) == "ffffffff")
    assert(Splits.hexCut(0.0) == "00000000")
  }

  test("no duplicate group ever straddles a split") {
    // synthetic components: pair up neighbors (0,1) (2,3) ... under
    // rep = even id, leaving ids >= 100 unclustered singletons
    val comp = spark.range(0, 100)
      .select(col("id"), (col("id") - col("id") % 2).as("component"))
    val out = Splits.leakageSafeSplit(docs, "doc_id",
      comp, "id", "component", fracs)
    val perGroup = out.groupBy("grp")
      .agg(countDistinct(col("split")).as("n"))
      .agg(max(col("n"))).as[Long].head()
    assert(perGroup == 1L, "a group spans multiple splits")
    // both members of a clustered pair landed together
    val pairSplit = out.filter(col("doc_id") < 100)
      .groupBy((col("doc_id") - col("doc_id") % 2).as("rep"))
      .agg(countDistinct(col("split")).as("n"))
      .agg(max(col("n"))).as[Long].head()
    assert(pairSplit == 1L)
  }

  test("every row is assigned exactly once and fractions are honored") {
    val comp = spark.emptyDataset[(Long, Long)].toDF("id", "component")
    val out = Splits.leakageSafeSplit(docs, "doc_id",
      comp, "id", "component", fracs).cache()
    assert(out.count() == docs.count())
    val byName = out.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    val n = docs.count().toDouble
    assert(byName.keySet.subsetOf(Set("train", "val", "test")))
    // md5 is uniform: at n=100 allow a generous tolerance
    assert(math.abs(byName.getOrElse("train", 0L) - 0.8 * n) < 0.2 * n,
      byName.toString)
    out.unpersist()
  }

  test("assignment is portable: a java-side md5 replica agrees") {
    val comp = spark.emptyDataset[(Long, Long)].toDF("id", "component")
    val got = Splits.leakageSafeSplit(docs, "doc_id",
        comp, "id", "component", fracs)
      .select(col("doc_id").as[Long], col("split").as[String])
      .collect().toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    got.foreach { case (id, split) =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      val want =
        if (hex < Splits.hexCut(0.8)) "train"
        else if (hex < Splits.hexCut(0.9)) "val"
        else "test"
      assert(split == want, s"doc $id: $split vs $want")
    }
  }

  test("assignment is independent of cluster size and partitioning") {
    // group rep 0 with 50 members: the family takes ONE coin flip —
    // every member gets rep 0's assignment
    val comp = spark.range(0, 50).select(col("id"), lit(0L).as("component"))
    val out = Splits.leakageSafeSplit(docs, "doc_id",
      comp, "id", "component", fracs)
    val fam = out.filter(col("doc_id") < 50)
      .select(countDistinct(col("split"))).as[Long].head()
    assert(fam == 1L)
    val a = out.select("doc_id", "split").as[(Long, String)].collect().toSet
    val b = Splits.leakageSafeSplit(docs.repartition(13), "doc_id",
        comp, "id", "component", fracs)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(a == b)
  }

  test("string group keys (domains) work; a source never straddles splits") {
    val d = Tables.documents(spark, sf)
    val out = Splits.leakageSafeSplit(d, "doc_id",
      d.select(col("doc_id"), col("source")), "doc_id", "source",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.count() == d.count())
    // every source lands wholly on one side
    val straddlers = out.groupBy("grp")
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(straddlers == 0)
    // grp carries the source key as a string
    assert(out.schema("grp").dataType ==
      org.apache.spark.sql.types.StringType)
    val grps = out.select("grp").distinct.as[String].collect().toSet
    assert(grps == d.select("source").distinct.as[String].collect().toSet)
  }

  test("bad fraction declarations fail loudly") {
    val comp = spark.emptyDataset[(Long, Long)].toDF("id", "component")
    intercept[IllegalArgumentException] {
      Splits.leakageSafeSplit(docs, "doc_id", comp, "id", "component",
        Seq("train" -> 0.8, "val" -> 0.1)) // sums to 0.9
    }
    intercept[IllegalArgumentException] {
      Splits.leakageSafeSplit(docs, "doc_id", comp, "id", "component",
        Seq("a" -> 1.5, "b" -> -0.5))
    }
    intercept[IllegalArgumentException] {
      Splits.leakageSafeSplit(docs, "doc_id", comp, "id", "component", Nil)
    }
  }
}
