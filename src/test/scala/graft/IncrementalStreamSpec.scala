package graft

import graft.catalog.ParquetCatalog
import graft.streaming.EventStreams

/** EventStreams.incrementalAppend: checkpointed exactly-once ingest —
  * the streaming form of the reference's batch watermark load. */
class IncrementalStreamSpec extends SparkTestBase {

  test("restarting the stream does not re-ingest processed files") {
    val src = java.nio.file.Files.createTempDirectory("graft-src").toString
    val wh = java.nio.file.Files.createTempDirectory("graft-inc-wh").toString
    val cp = java.nio.file.Files.createTempDirectory("graft-cp").toString
    val catalog = new ParquetCatalog(wh)

    val batch = Tables.events(spark, sf)
    batch.write.mode("overwrite").parquet(src)
    val n = batch.count()

    def runOnce(): Unit = {
      val stream = EventStreams.readEvents(spark, src,
        spark.read.parquet(src).schema)
      val q = EventStreams.incrementalAppend(stream, catalog, "events_inc", cp)
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    assert(catalog.read(spark, "events_inc").count() == n)
    runOnce() // same checkpoint, no new files → no new rows
    assert(catalog.read(spark, "events_inc").count() == n)
  }
}
