package graft

import org.apache.spark.sql.functions._
import graft.ops.Packing

/** ops.Packing: concat-and-chunk sequence layout. */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  test("per-shard running layout with boundary-crossing docs") {
    // one shard (nShards=1): docs 1..4 with 3,4,2,6 tokens, seqLen 5
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 2L), (4L, 6L)).toDF("doc_id", "n")
    val out = Packing.concatChunk(docs, "doc_id", col("n"), seqLen = 5, nShards = 1)
      .select("doc_id", "start", "seq_id", "offset_in_seq")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 0L),   // [0,3)
      (2L, 3L, 0L, 3L),   // [3,7) — crosses into seq 1
      (3L, 7L, 1L, 2L),   // [7,9)
      (4L, 9L, 1L, 4L)))  // [9,15)
  }

  test("sharding: offsets restart per shard, layout is partition-invariant") {
    val docs = (1L to 100L).map(i => (i, i % 7 + 1)).toDF("doc_id", "n")
    def layout(d: org.apache.spark.sql.DataFrame) =
      Packing.concatChunk(d, "doc_id", col("n"), seqLen = 16, nShards = 4)
        .select("doc_id", "shard", "start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val base = layout(docs)
    assert(layout(docs.repartition(13)) == base)
    // shard k's lowest doc id starts at offset 0
    for (k <- 0L until 4L) {
      val inShard = base.filter(_._2 == k)
      assert(inShard.minBy(_._1)._3 == 0L, s"shard $k")
    }
    // within a shard, start = sum of preceding docs' tokens
    val s0 = base.filter(_._2 == 0L).toSeq.sortBy(_._1)
    val expected = s0.map(_._1 % 7 + 1).scanLeft(0L)(_ + _).init
    assert(s0.map(_._3) == expected)
  }

  test("no token lost: per-shard total equals last start + last n") {
    val docs = (1L to 50L).map(i => (i, i)).toDF("doc_id", "n")
    val out = Packing.concatChunk(docs, "doc_id", col("n"), 128, 3)
    val perShard = out.groupBy("shard")
      .agg(sum("n_tokens").as("total"), max(col("start") + col("n_tokens")).as("end"))
      .select("total", "end").as[(Long, Long)].collect()
    perShard.foreach { case (total, end) => assert(total == end) }
  }
}
