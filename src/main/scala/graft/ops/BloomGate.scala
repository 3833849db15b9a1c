package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.util.sketch.BloomFilter
import graft.catalog.TableCatalog

/** Bloom-filter membership gate for incremental ingest — "which rows
  * of this batch are NEW against the accumulated corpus?" without the
  * full-corpus shuffle the naive anti-join pays.
  *
  * Built on Spark's OWN bloom machinery — the codegen'd
  * `BloomFilterAggregate` / `BloomFilterMightContain` expressions
  * that power AQE's runtime row-level filtering — not a UDF: the
  * membership probe stays inside whole-stage codegen.
  *
  * The bloom is approximate (false positives, never false negatives),
  * but the GATE is exact: the bloom only narrows the probe set, and
  * every bloom-positive row is confirmed by an exact join. A false
  * positive costs one extra probe; it can never corrupt the output.
  *
  * Scale accounting vs the naive `batch ANTI JOIN corpus` (which
  * shuffles the FULL corpus on the key): here the corpus is only ever
  * SCANNED — once to build the bloom (an associative aggregate,
  * map-side combined; pay it once and persist via
  * [[buildBloomIndex]]), and once semi-joined against the broadcast
  * candidate keys. Zero corpus shuffles. The candidate set is
  * `|batch ∩ corpus| + fpp·|batch|`, so sizing the bloom for the
  * corpus keeps the broadcast delta-scale even for large batches. */
object BloomGate {
  /** Aggregate column: serialized bloom filter over `xxhash64(key)`
    * sized for `expectedItems` at `numBits` bits (binary output;
    * mergeable — blooms of two corpora OR together, see
    * [[appendToBloomIndex]]). */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Codegen'd membership probe of `key` against a CONSTANT bloom
    * (the expression Spark's runtime filters evaluate). Catalyst
    * requires the bloom side be a literal or scalar subquery — pass
    * the collected bytes, not a joined column. */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes),
      new XxHash64(Seq(ColumnBridge.expression(key)))))

  /** Exact new-row gate: rows of `batch` whose `keyCol` does not
    * appear in `corpus`. Bloom-accelerated, exactly equal to the
    * plain anti-join (BloomGateSpec pins the equivalence even with a
    * deliberately-underscaled bloom).
    *
    * `bloomBytes` comes from [[buildBloomIndex]]/`collectBloom` — at
    * 100 TB the bloom is built once per corpus version, not per
    * batch. */
  def newRows(batch: DataFrame, corpus: DataFrame, keyCol: String,
              bloomBytes: Array[Byte]): DataFrame = {
    val candidates = batch
      .filter(mightContain(bloomBytes, col(keyCol)))
      .select(col(keyCol)).distinct()
    // corpus side: SCAN + broadcast semi-join — never a corpus shuffle
    val dupKeys = corpus.select(col(keyCol))
      .join(broadcast(candidates), Seq(keyCol), "left_semi").distinct()
    // definitely-new rows (bloom-negative) are never in dupKeys ⊆
    // corpus keys, so one anti-join answers for the whole batch
    batch.join(broadcast(dupKeys), Seq(keyCol), "left_anti")
  }

  /** One aggregate job: the corpus bloom as driver-side bytes.
    * `numBits` defaults to the classic ~1% false-positive sizing
    * (≈ 9.6 bits/item). An EMPTY corpus yields null (the aggregate's
    * no-input result) — [[newRows]] treats a null bloom as
    * match-nothing, which is exactly right for an empty corpus. */
  def collectBloom(corpus: DataFrame, keyCol: String, expectedItems: Long,
                   numBits: Long = -1L): Array[Byte] = {
    val bits = if (numBits > 0) numBits
      else math.max(64L, expectedItems * 10L)
    corpus.select(bloomAgg(col(keyCol), expectedItems, bits).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** Persist the corpus bloom as a one-row catalog table — the
    * build-once, gate-many shape ([[graft.sim.Ann.buildIvfIndex]]'s
    * sibling): the corpus-scale aggregate is paid once per corpus
    * version, and each ingest batch reads KBs–MBs of bloom bytes.
    * The sizing parameters ride along so [[appendToBloomIndex]] can
    * rebuild a delta bloom of IDENTICAL geometry (merge compatibility
    * requires equal bit size AND hash count, and the hash count is
    * derived from both parameters). */
  def buildBloomIndex(corpus: DataFrame, keyCol: String,
                      catalog: TableCatalog, table: String,
                      expectedItems: Long, numBits: Long = -1L): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bits = if (numBits > 0) numBits
      else math.max(64L, expectedItems * 10L)
    val bytes = collectBloom(corpus, keyCol, expectedItems, bits)
    catalog.overwrite(
      Seq((bytes, expectedItems, bits))
        .toDF("bloom", "expected_items", "num_bits"), table)
  }

  /** Incremental index maintenance: OR the batch's bloom into the
    * persisted one — blooms of identical geometry merge losslessly
    * (bloom(A) ∪ bloom(B) = bloom(A ∪ B) bit-for-bit), so after
    * gating a batch its keys join the index without rescanning the
    * corpus. The delta-sized job every per-batch ingest needs.
    * The accumulating false-positive rate is governed by the ORIGINAL
    * `expectedItems` sizing — when total inserts outgrow it, rebuild
    * with [[buildBloomIndex]] (callers own that policy, like the IVF
    * centroid refresh). */
  def appendToBloomIndex(batch: DataFrame, keyCol: String,
                         catalog: TableCatalog, table: String): Unit =
    catalog.overwrite(mergedBloomFrame(batch, keyCol, catalog, table), table)

  /** The merged (persisted ∪ batch) bloom as a one-row frame of the
    * index table's schema, WITHOUT writing it — so a fenced caller
    * ([[graft.streaming.IngestLoop]]) can stage the merged bytes
    * before its commit marker and install them idempotently
    * afterwards: `overwrite` backends are delete-then-write, and
    * merging in place would leave a crash mid-overwrite with no
    * surviving copy of the base bloom. */
  def mergedBloomFrame(batch: DataFrame, keyCol: String,
                       catalog: TableCatalog, table: String): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val row = catalog.read(spark, table).head()
    val base = BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("bloom")))
    val expectedItems = row.getAs[Long]("expected_items")
    val bits = row.getAs[Long]("num_bits")
    // delta bloom with the SAME geometry, so the merge is compatible;
    // an empty batch aggregates to null — nothing to merge. The delta
    // stays a DISTRIBUTED aggregate here: this overload serves
    // arbitrary batch sizes (a corpus-scale backfill must not collect)
    val delta = collectBloom(batch, keyCol, expectedItems, bits)
    if (delta != null)
      base.mergeInPlace(
        BloomFilter.readFrom(new java.io.ByteArrayInputStream(delta)))
    val out = new java.io.ByteArrayOutputStream()
    base.writeTo(out)
    Seq((out.toByteArray, expectedItems, bits))
      .toDF("bloom", "expected_items", "num_bits")
  }

  /** [[mergedBloomFrame]] from an ALREADY-READ index row — a per-tick
    * caller that probed the bloom moments earlier passes the same row
    * and skips a second head job over the index table.
    *
    * The batch's bits are inserted DRIVER-SIDE: collect the batch's
    * `xxhash64(key)` values (batch-scale by the caller's contract) and
    * `putLong` each into the deserialized base — the exact insertion
    * `BloomFilterAggregate` performs distributed (it hashes the
    * XxHash64 child's long; IngestLoopSpec pins the result
    * bit-identical to a from-scratch distributed build). One tiny
    * collect instead of a full aggregate job per tick. */
  def mergedBloomFrame(batch: DataFrame, keyCol: String,
                       row: org.apache.spark.sql.Row): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val base = BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("bloom")))
    val expectedItems = row.getAs[Long]("expected_items")
    val bits = row.getAs[Long]("num_bits")
    batch.select(xxhash64(col(keyCol)).as("h")).as[Long].collect()
      .foreach(base.putLong)
    val out = new java.io.ByteArrayOutputStream()
    base.writeTo(out)
    Seq((out.toByteArray, expectedItems, bits))
      .toDF("bloom", "expected_items", "num_bits")
  }

  /** The persisted bloom's bytes. */
  def readBloom(spark: SparkSession, catalog: TableCatalog,
                table: String): Array[Byte] =
    catalog.read(spark, table).head().getAs[Array[Byte]]("bloom")

  /** [[newRows]] against the PERSISTED index. */
  def newRowsFromCatalog(batch: DataFrame, corpus: DataFrame,
                         keyCol: String, catalog: TableCatalog,
                         table: String): DataFrame =
    newRows(batch, corpus, keyCol,
      readBloom(batch.sparkSession, catalog, table))
}
