package graft

import org.apache.spark.sql.functions._
import graft.ops.Curriculum

/** ops.Curriculum: staged training order (q108) — stages ascend,
  * seeded-md5 shuffle within each stage, one global pos. */
class CurriculumSpec extends SparkTestBase {
  import spark.implicits._

  test("lengthStage is the whole-bit band of n+1") {
    val got = Seq(0, 1, 2, 3, 6, 7, 8, 100).toDF("n")
      .select(Curriculum.lengthStage(col("n")).as("s"))
      .as[Int].collect().toSeq
    assert(got == Seq(0, 1, 1, 2, 2, 3, 3, 6))
  }

  test("stagedOrder: pos is a permutation, stages ascend along it") {
    val docs = Tables.documents(spark, sf)
      .withColumn("n_tokens", graft.text.TextFunctions.tokenCount(col("text")))
      .withColumn("stage", Curriculum.lengthStage(col("n_tokens")))
      .select(col("doc_id"), col("stage"))
    val out = Curriculum.stagedOrder(docs, "doc_id", "stage", "s1",
        nBuckets = 8)
      .select(col("pos"), col("stage"), col("doc_id"))
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L until out.length))
    val stagesAlongPos = out.map(_._2)
    assert(stagesAlongPos.toSeq == stagesAlongPos.sorted.toSeq)
  }

  test("within-stage order IS the seeded md5 permutation") {
    val docs = Tables.documents(spark, sf)
      .withColumn("stage",
        (col("doc_id") % 3).cast("int")).select(col("doc_id"), col("stage"))
    val out = Curriculum.stagedOrder(docs, "doc_id", "stage", "s2",
        nBuckets = 4)
      .as[(Long, Int, Long)].collect()
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val expect = out.sortBy { case (id, stage, _) =>
      (stage, md5hex(s"s2:$id"), id)
    }.map(_._1).toSeq
    val got = out.sortBy(_._3).map(_._1).toSeq
    assert(got == expect)
  }

  test("stagedOrder is partition-independent") {
    val docs = Tables.documents(spark, sf)
      .withColumn("stage", (col("doc_id") % 4).cast("int"))
      .select(col("doc_id"), col("stage"))
    val a = Curriculum.stagedOrder(docs, "doc_id", "stage", "s3", 8)
      .select("doc_id", "pos").as[(Long, Long)].collect().toSeq.sorted
    val b = Curriculum.stagedOrder(docs.repartition(13), "doc_id",
        "stage", "s3", 8)
      .select("doc_id", "pos").as[(Long, Long)].collect().toSeq.sorted
    assert(a == b)
  }
}
