package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{lit, transform}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}

/** Grouped element-wise vector aggregation over `array<double>` columns
  * (mean-pooled embeddings per group, k-means centroid recomputation,
  * class prototypes).
  *
  * Accumulates a FIXED-POINT image of each element — `floor(x · 10^scale)`
  * as a long — extending the engine's integral-image determinism rule
  * ([[graft.ops.Exact]], money cents) to vectors:
  *
  *  - **Order-independent.** Long addition is associative/commutative, so
  *    the sums (and the means derived from them) are bit-identical under
  *    any partitioning, shuffle layout, or executor count. A raw
  *    `sum(double)` per dimension drifts in the last ulps across layouts —
  *    fatal for reproducible dataset builds and hash-compared gates.
  *  - **Engine-portable.** `x · 10^scale` is one IEEE multiply and `floor`
  *    is exact, so any engine reproduces the identical longs — the DuckDB
  *    oracle for q53 recomputes the same image in SQL and hash-matches.
  *  - **Overflow is LOUD.** Sums use `Math.addExact`: at scale 9 with
  *    unit-bounded elements a group overflows past ~9.2e9 rows — a 100 TB
  *    corpus grouped into few classes can hit that, and a silent wrap
  *    would corrupt every downstream centroid. The throw names the fix
  *    (lower `scale`).
  *  - Quantization error is bounded by 10^-scale per element — at the
  *    default scale 9, far below the noise floor of any embedding model.
  *
  * One buffer per group per partition (map-side partial aggregation via
  * ObjectHashAggregate), so the shuffle carries `partitions × groups`
  * skinny buffers, never rows.
  *
  * Output: `struct(n: long, sums: array<long>)` — n is the count of
  * non-null input vectors; derive means with [[exprs.vec_mean_fixed]].
  * Null vectors are ignored (not counted); a group with no non-null
  * vectors yields a null struct. Null ELEMENTS and non-finite values
  * throw: a partially-null embedding is upstream corruption, and
  * averaging it silently would fabricate a centroid.
  */
case class VectorSumFixed(
    child: Expression,
    scale: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression]
  with ExpectsInputTypes {

  require(scale >= 0 && scale <= 15,
    s"vec_sum_fixed: scale must be in [0, 15], got $scale")

  // exact powers of ten up to 1e15 are exactly representable in binary64
  private val pow = math.pow(10.0, scale)
  // beyond 2^53 the quantized double can't hold the integer exactly, so
  // the fixed-point image would silently lose low digits
  private val MaxAbs = 9.007199254740992e15

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true

  // buffer layout: [count, sum_0, ..., sum_{dim-1}]; empty until the
  // first non-null vector fixes the dimension
  override def createAggregationBuffer(): Array[Long] = Array.empty[Long]

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      val b = if (buf.isEmpty) new Array[Long](d + 1) else buf
      if (b.length != d + 1) throw new IllegalArgumentException(
        s"vec_sum_fixed: dimension mismatch — got $d-element vector, " +
          s"group established ${b.length - 1}")
      b(0) = Math.addExact(b(0), 1L)
      var i = 0
      while (i < d) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          s"vec_sum_fixed: null element at position $i")
        val q = Math.floor(arr.getDouble(i) * pow)
        if (!(Math.abs(q) <= MaxAbs)) throw new ArithmeticException(
          s"vec_sum_fixed: element at position $i out of exact fixed-point " +
            s"range at scale $scale (|x|*10^$scale > 2^53, or non-finite)")
        b(i + 1) = Math.addExact(b(i + 1), q.toLong)
        i += 1
      }
      b
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      if (a.length != b.length) throw new IllegalArgumentException(
        s"vec_sum_fixed: merging buffers of dimension ${a.length - 1} and ${b.length - 1}")
      var i = 0
      while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
      a
    }

  override def eval(buf: Array[Long]): Any =
    if (buf.isEmpty) null
    else InternalRow(buf(0), new GenericArrayData(buf.drop(1)))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorSumFixed =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumFixed =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): VectorSumFixed =
    copy(child = newChild)
}

/** Bounded grouped top-k: keep the `k` greatest (or smallest) values of
  * an orderable column — typically a `struct(sortKey, tiebreak, payload…)`
  * ordered lexicographically — per group, as `array<childType>` sorted
  * best-first.
  *
  * This is the scale-safe form of "top N per group". The window form
  * (`row_number() OVER (PARTITION BY g ORDER BY …) <= k`) fully sorts
  * every group through one reducer each — at low group cardinality that
  * is a handful of reducers sorting the whole table (the q38 trap). A
  * `collect_list` + `slice(sort_array(…))` rewrite restores parallelism
  * but its map-side partial buffers hold ENTIRE groups, so memory grows
  * with data, not with k. This aggregate's buffer is a k-bounded heap:
  * map-side partials prune to k before the shuffle, the exchange
  * carries `partitions × groups × k` rows, and no group is ever fully
  * sorted or fully materialized anywhere.
  *
  * Determinism: ties beyond position k are cut by the ordering itself,
  * so include a unique tiebreak field in the struct (as any
  * deterministic top-k requires). Null inputs are ignored; a group with
  * no non-null input yields an empty array.
  */
case class TopKOrdered(
    child: Expression,
    k: Int,
    asc: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[Any]]
  with UnaryLike[Expression] {

  require(k > 0, s"top_k: k must be positive, got $k")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    org.apache.spark.sql.catalyst.util.TypeUtils
      .checkForOrderingExpr(child.dataType, prettyName)

  // "best" = greatest under natural ordering when asc=false; the queue
  // is keyed by the REVERSED best-first ordering so head is always the
  // worst kept element (the eviction candidate)
  @transient private lazy val best: Ordering[Any] = {
    val natural = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(child.dataType)
    if (asc) natural.reverse else natural
  }

  @transient private lazy val ser =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(Array(child.dataType))

  override def prettyName: String = "top_k"
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[Any] =
    scala.collection.mutable.PriorityQueue.empty[Any](best.reverse)

  private def offer(buf: scala.collection.mutable.PriorityQueue[Any], v: Any): Unit =
    if (buf.size < k) buf.enqueue(v)
    else if (best.compare(v, buf.head) > 0) { buf.dequeue(); buf.enqueue(v) }

  override def update(buf: scala.collection.mutable.PriorityQueue[Any],
                      input: InternalRow): scala.collection.mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    // copy: unsafe rows/arrays returned by eval are reused per input row
    if (v != null) offer(buf, InternalRow.copyValue(v))
    buf
  }

  override def merge(a: scala.collection.mutable.PriorityQueue[Any],
                     b: scala.collection.mutable.PriorityQueue[Any]): scala.collection.mutable.PriorityQueue[Any] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[Any]): Any =
    // ascending under `best`, then flipped → best-first
    new GenericArrayData(buf.toArray.sorted(best).reverse)

  override def serialize(buf: scala.collection.mutable.PriorityQueue[Any]): Array[Byte] = {
    val rows = buf.toArray.map(v => ser(InternalRow(v)).getBytes)
    val bb = java.nio.ByteBuffer.allocate(4 + rows.map(_.length + 4).sum)
    bb.putInt(rows.length)
    rows.foreach { r => bb.putInt(r.length); bb.put(r) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[Any] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val chunk = new Array[Byte](bb.getInt)
      bb.get(chunk)
      val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(1)
      row.pointTo(chunk, chunk.length)
      buf.enqueue(InternalRow.copyValue(row.get(0, child.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKOrdered =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKOrdered =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): TopKOrdered =
    copy(child = newChild)
}

/** Isotonic regression fit (pool-adjacent-violators) per group:
  * input `struct(x, id, y)` (all LONG — x the score, id the unique
  * total-order tiebreak, y the 0/1 label or integer target), output
  * `array<struct<id, fit_fp>>` where `fit_fp = floor(pool_mean·10^6)`
  * and the fit is non-decreasing along (x ASC, id ASC) — the
  * calibration curve mapping a classifier's raw score to an empirical
  * probability (Zadrozny & Elkan 2002's isotonic calibration).
  *
  * Algorithm: the classic PAV stack — append each point as its own
  * pool, merge backwards while a predecessor pool's mean is ≥ the
  * current's. Means never materialize: the violator test is the exact
  * integer cross-multiply `s₁·c₂ ≥ s₂·c₁`, and the emitted value is
  * one integral division of exact longs — so the output replays
  * bit-for-bit in any engine. The DuckDB oracle (q192) computes the
  * SAME numbers by a DIFFERENT algorithm — the minimax identity
  * `fit(i) = max_{j≤i} min_{k≥i} mean(y[j..k])` as an O(n²) windowed
  * SQL — valid because floor commutes with max/min over finite sets,
  * so quantizing each candidate mean quantizes the fit. Two
  * independent derivations agreeing is the correctness statement
  * (the q184/q187 discipline).
  *
  * Scale posture: one buffer per (group, partition), merged by
  * concatenation, SORTED AT EVAL — memory is the group's point count,
  * so this is an EVAL-SET operator (calibration sets are thousands of
  * points, not corpora), declared like the exact-oracle forms of
  * q24/q65/q184. X ties are sequenced by id, not pooled — both
  * engines apply the identical convention, and with distinct-x data
  * the fit is the textbook one. Null structs are ignored; an empty
  * group yields an empty array. Overflow: |y|·10^6 per pool must fit
  * int64 — sums use Math.addExact/multiplyExact and throw loudly. */
case class IsotonicFit(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StructType(fs) if fs.length == 3 && fs.forall(_.dataType == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"isotonic_fit expects struct<x:bigint,id:bigint,y:bigint>, got $other")
    }
  }

  override def prettyName: String = "isotonic_fit"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("fit_fp", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[(Long, Long, Long)] =
    scala.collection.mutable.ArrayBuffer.empty

  override def update(buf: scala.collection.mutable.ArrayBuffer[(Long, Long, Long)],
                      input: InternalRow): scala.collection.mutable.ArrayBuffer[(Long, Long, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val r = v.asInstanceOf[InternalRow]
      buf += ((r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    buf
  }

  override def merge(a: scala.collection.mutable.ArrayBuffer[(Long, Long, Long)],
                     b: scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]): scala.collection.mutable.ArrayBuffer[(Long, Long, Long)] = {
    a ++= b; a
  }

  override def eval(buf: scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]): Any = {
    val pts = buf.sortBy(t => (t._1, t._2)) // (x, id) total order
    val n = pts.length
    // PAV stack of pools (ySum, count, firstIndex)
    val sums = new Array[Long](n); val cnts = new Array[Long](n)
    val starts = new Array[Int](n)
    var top = -1
    var i = 0
    while (i < n) {
      top += 1
      sums(top) = pts(i)._3; cnts(top) = 1L; starts(top) = i
      // merge while the previous pool's mean >= this pool's mean
      while (top > 0 && Math.multiplyExact(sums(top - 1), cnts(top)) >=
               Math.multiplyExact(sums(top), cnts(top - 1))) {
        sums(top - 1) = Math.addExact(sums(top - 1), sums(top))
        cnts(top - 1) += cnts(top)
        top -= 1
      }
      i += 1
    }
    val out = new Array[Any](n)
    var p = 0
    while (p <= top) {
      // floorDiv, not /: DuckDB's // floors, and a negative integer
      // target must not round toward zero on one side only
      val fp = Math.floorDiv(Math.multiplyExact(sums(p), 1000000L), cnts(p))
      val end = if (p == top) n else starts(p + 1)
      var j = starts(p)
      while (j < end) {
        out(j) = InternalRow(pts(j)._2, fp)
        j += 1
      }
      p += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 24 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { t => bb.putLong(t._1); bb.putLong(t._2); bb.putLong(t._3) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[(Long, Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    val n = bb.getInt
    var i = 0
    while (i < n) { buf += ((bb.getLong, bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): IsotonicFit =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): IsotonicFit =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): IsotonicFit =
    copy(child = newChild)
}

/** Count-Min frequency sketch of a string key (Cormode &
  * Muthukrishnan 2005): a d×w grid of counters; each key increments
  * one counter per row (bucket = low bits of an affine image of the
  * key's 64-bit token hash), a point estimate reads the MINIMUM of
  * its d cells — an upper bound on the true count that over-counts
  * only when a key collides in EVERY row (probability ~(1/w)^d).
  * The mergeable-frequency twin of the HLL distinct sketch
  * ([[graft.ops.Sketches]]): counters are plain long sums, so merge
  * is element-wise addition — order-independent, partitioning-proof,
  * and a persisted sketch column rolls up by addition forever.
  *
  * Determinism discipline: buckets derive from the SQL-replayable
  * FNV-1a/fmix64 token hash ([[TokenHash64]]): row r reads its own
  * DISJOINT log2(w)-bit window, `(h >>> r·log2(w)) & (w−1)` — a
  * well-mixed 64-bit hash split into independent row functions (an
  * affine family `h·(2r+1) mod w` would NOT work: mod a power of two
  * it depends only on `h mod w`, so one collision is a collision in
  * every row). Unsigned shift-and-mask is `(H // w^r) % w` on the
  * unsigned HUGEINT image, so the DuckDB oracle replays the exact
  * grid and the sketch (hence every estimate) is bit-identical
  * cross-engine. Requires d·log2(w) ≤ 64.
  *
  * One d·w-long buffer per group per partition (map-side partials via
  * ObjectHashAggregate); the shuffle carries skinny buffers, never
  * rows. Output: `array<long>` of length d·w, row-major. */
case class CmSketch(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression]
  with ExpectsInputTypes {

  require(d >= 1 && d <= 16, s"cm_sketch: d must be in [1, 16], got $d")
  require(w >= 2 && (w & (w - 1)) == 0,
    s"cm_sketch: w must be a power of two >= 2, got $w")
  private val shift = java.lang.Integer.numberOfTrailingZeros(w)
  require(d * shift <= 64,
    s"cm_sketch: d*log2(w) must be <= 64 (disjoint hash windows), " +
      s"got $d*$shift")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val h = ExprOps.tokenHash64(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
      var r = 0
      while (r < d) {
        val b = ((h >>> (r * shift)) & (w - 1)).toInt
        buf(r * w + b) = Math.addExact(buf(r * w + b), 1L)
        r += 1
      }
      buf
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): CmSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): CmSketch =
    copy(child = newChild)
}

/** Column-level entry points for the custom aggregates. */
object aggs {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Fixed-point element-wise vector sum: `struct(n, sums: array<long>)`
    * where `sums[i] = Σ floor(v[i] · 10^scale)`. See [[VectorSumFixed]]. */
  def vec_sum_fixed(c: Column, scale: Int = 9): Column =
    ColumnBridge.column(
      VectorSumFixed(ColumnBridge.expression(c), scale).toAggregateExpression())

  /** Count-Min frequency sketch: `array<long>` of length d·w,
    * row-major (see [[CmSketch]]); estimate with
    * [[graft.ops.Sketches.cmEstimate]], merge by element-wise sum. */
  def cm_sketch(c: Column, d: Int = 4, w: Int = 256): Column =
    ColumnBridge.column(
      CmSketch(ColumnBridge.expression(c), d, w).toAggregateExpression())

  /** Bounded grouped top-k (see [[TopKOrdered]]): the `k` greatest
    * (`asc=false`) or smallest values of `c` per group, best-first. */
  def top_k(c: Column, k: Int, asc: Boolean = false): Column =
    ColumnBridge.column(
      TopKOrdered(ColumnBridge.expression(c), k, asc).toAggregateExpression())

  /** Per-group isotonic (PAV) calibration fit (see [[IsotonicFit]]):
    * input `struct(x, id, y)` all-long, output `array<struct<id,
    * fit_fp>>` with the non-decreasing fitted mean in 10^-6 units. */
  def isotonic_fit(c: Column): Column =
    ColumnBridge.column(
      IsotonicFit(ColumnBridge.expression(c)).toAggregateExpression())

  /** Element-wise mean vector (`array<double>`) at fixed-point `scale`:
    * `(double) sums[i] / 10^scale / n` — exact integer sum, then two
    * divisions in a pinned order, so the result is bit-identical across
    * partitionings AND engines (the DuckDB twin writes the same three
    * ops). The duplicated [[vec_sum_fixed]] reference is deduplicated by
    * Catalyst (one aggregate buffer, not two). */
  def vec_mean_fixed(c: Column, scale: Int = 9): Column = {
    val st = vec_sum_fixed(c, scale)
    val powLit = lit(math.pow(10.0, scale))
    transform(st.getField("sums"),
      s => s.cast("double") / powLit / st.getField("n"))
  }
}
