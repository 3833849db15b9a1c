package graft

import org.apache.spark.sql.functions._
import graft.sources.Ingest

/** sources.Ingest: the S1 landing-zone plumbing with the deterministic
  * offline fetcher (the http client is the documented zero-egress
  * stub). */
class IngestSpec extends SparkTestBase {

  test("land builds the binary manifest with checksums and batch id") {
    val urls = Seq("https://example.org/a.parquet", "https://example.org/b.parquet")
    val m = Ingest.land(spark, urls, Ingest.Echo, batchId = "2023-01")
    val rows = m.collect()
    assert(rows.length == 2)
    assert(m.columns.toSeq ==
      Seq("url", "payload", "sha256", "n_bytes", "batch_id"))
    val a = rows.find(_.getAs[String]("url").endsWith("a.parquet")).get
    assert(new String(a.getAs[Array[Byte]]("payload"), "UTF-8") == urls.head)
    assert(a.getAs[Int]("n_bytes") == urls.head.length)
    assert(a.getAs[String]("batch_id") == "2023-01")
    // checksum agrees with Spark's own sha2 of the same bytes
    val expect = m.select(sha2(col("payload"), 256).as("s"), col("sha256"))
      .collect()
    assert(expect.forall(r => r.getString(0) == r.getString(1)))
  }

  test("the http fetcher is an honest zero-egress stub") {
    intercept[UnsupportedOperationException](
      Ingest.Http.fetch("https://example.org"))
  }

  test("landed manifest composes into the multimodal feature path (q51)") {
    val out = SparkEntry.queries("q51_ingest_media")(spark, sf)
      .orderBy("doc_id").collect()
    assert(out.length == 48)
    // checksum is sha256 of the fetched payload (= url bytes for Echo)
    val digest = java.security.MessageDigest.getInstance("SHA-256")
    val u7 = "https://cdn.example.org/media/item_0007.wav"
    val exp7 = digest.digest(u7.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val r7 = out(7)
    assert(r7.getAs[String]("checksum") == exp7)
    assert(r7.getAs[String]("media_type") == "audio")
    assert(r7.getAs[Int]("n_bytes") == u7.length)
    // feature values match the stub codec applied to the same bytes
    val (w, h, f, mi) = graft.mm.Multimodal.Codec.decodeStub(
      u7.getBytes("UTF-8"), "audio")
    assert(r7.getAs[Int]("width") == w && r7.getAs[Int]("height") == h)
    assert(r7.getAs[Int]("n_frames") == f)
    assert(r7.getAs[Double]("mean_intensity") == mi)
    // only videos multi-frame
    assert(out.filter(_.getAs[String]("media_type") != "video")
      .forall(_.getAs[Int]("n_frames") == 1))
  }
}
