package graft

import org.apache.spark.sql.functions._
import graft.mm.Multimodal

/** mm.Multimodal: binary plumbing + stubbed codec batch shape. */
class MultimodalSpec extends SparkTestBase {

  lazy val media = Multimodal.asMedia(Tables.documents(spark, sf))

  test("asMedia assigns a media_type per doc and carries payload bytes") {
    val r = media.filter(col("doc_id") === 0).head()
    assert(r.media_type == "image")
    assert(r.payload.nonEmpty)
  }

  test("extractFeatures is deterministic and partition-count independent") {
    val a = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    val b = Multimodal.extractFeatures(media.repartition(7)).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(f => f.checksum.length == 64 && f.n_bytes > 0))
    assert(a.forall(f => f.width >= 64 && f.height >= 64))
  }

  test("resize hits maxSide exactly on the longest side, never upscales") {
    val feats = Multimodal.extractFeatures(media)
    val out = Multimodal.resize(feats, maxSide = 200).collect()
    out.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (rw, rh) = (r.getAs[Int]("resized_width"), r.getAs[Int]("resized_height"))
      if (math.max(w, h) >= 200)
        assert(math.max(rw, rh) == 200, s"$w x $h -> $rw x $rh")
      else assert(rw == w && rh == h) // no upscale
      assert(rw >= 1 && rh >= 1)
    }
  }

  test("video rows get multiple frames; sampleFrames strides them") {
    val feats = Multimodal.extractFeatures(media)
    val frames = Multimodal.sampleFrames(feats, stride = 10)
    val perDoc = frames.groupBy("doc_id").count().collect()
    assert(perDoc.nonEmpty)
    val r = frames.filter(col("frame_idx") > 0).head()
    assert(r.getAs[Int]("frame_idx") % 10 == 0)
  }
}
