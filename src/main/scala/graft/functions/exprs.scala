package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, ImplicitCastInputTypes, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the hot loops the built-in
  * higher-order functions evaluate interpretively (ArrayAggregate /
  * ArrayTransform have no codegen and re-enter the expression
  * interpreter per element — measured 3-25s per LSH query at sf0.1).
  * Each expression here is one call per ROW into a tight static kernel
  * ([[ExprOps]]); semantics stay those of the declarative forms they
  * replace.
  *
  * Every scalar expression implements `doGenCode` as a single static
  * call into the SAME kernel its interpreted `eval` uses — one
  * implementation, two entry points — so projections over these no
  * longer drop out of WholeStageCodegen the way CodegenFallback did
  * (the fallback re-boxes an InternalRow per value and splits the
  * codegen span right where the similarity pipelines are hottest).
  *
  * Registered as Columns via [[graft.functions.exprs]] helpers.
  */

/** Static (Java-callable from generated code) kernels shared by the
  * interpreted and codegen paths of the expressions below. */
object ExprOps {
  /** Codegen entry for [[TokenHash64]] (delegates to the shared
    * FNV-1a/fmix64 kernel in [[SimHash64]]). */
  def tokenHash64(u: org.apache.spark.unsafe.types.UTF8String): Long =
    SimHash64.tokenHashUtf8(u)

  /** Code-point histogram shared by [[charEntropyProxy]] and
    * [[charDistinctCp]]: ASCII counts in a flat array (the whole
    * corpus in practice), anything above U+007F in a small map. The
    * hot path walks the UTF8String's BYTES in place — for a pure
    * ASCII row (byte == code point) that is one pass and zero
    * allocation beyond the 128-slot array; the first non-ASCII byte
    * bails to a String decode, whose cost the row's multi-byte text
    * already implies. */
  private def cpHist(u: org.apache.spark.unsafe.types.UTF8String)
      : (Array[Long], java.util.HashMap[Integer, Long]) = {
    val ascii = new Array[Long](128)
    val n = u.numBytes()
    var i = 0
    while (i < n && u.getByte(i) >= 0) {
      ascii(u.getByte(i)) += 1L
      i += 1
    }
    if (i == n) return (ascii, null)
    // non-ASCII byte hit: restart cleanly on the decoded string
    java.util.Arrays.fill(ascii, 0L)
    var wide: java.util.HashMap[Integer, Long] = null
    val s = u.toString
    var j = 0
    while (j < s.length) {
      val cp = s.codePointAt(j)
      j += Character.charCount(cp)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (wide == null) wide = new java.util.HashMap[Integer, Long]()
        val prev = wide.get(cp)
        wide.put(cp, if (prev == null) 1L else prev + 1L)
      }
    }
    (ascii, wide)
  }

  /** Whole-bit entropy proxy over the code-point histogram:
    * Σ_c count_c · floor(log2 count_c) — the exact-integer stand-in
    * for Shannon's Σ count·log2(count) (itself one algebraic step
    * from −Σ p·log2 p). Low values at a given length mean the mass
    * sits on few characters (boilerplate, repeated padding, encoder
    * junk); the whole-bit floor keeps the number engine-replayable
    * where an IEEE log2 is not (same discipline as the idf and
    * perplexity codes). */
  def charEntropyProxy(u: org.apache.spark.unsafe.types.UTF8String): Long = {
    val (ascii, wide) = cpHist(u)
    var s = 0L
    var c = 0
    while (c < 128) {
      val n = ascii(c)
      if (n > 0L) s += n * (63 - java.lang.Long.numberOfLeadingZeros(n))
      c += 1
    }
    if (wide != null) {
      val it = wide.values().iterator()
      while (it.hasNext) {
        val n = it.next()
        s += n * (63 - java.lang.Long.numberOfLeadingZeros(n))
      }
    }
    s
  }

  /** Distinct code points — the character-diversity gate's other leg
    * (a 500-char document drawing on 6 characters is not prose). */
  def charDistinctCp(u: org.apache.spark.unsafe.types.UTF8String): Int = {
    val (ascii, wide) = cpHist(u)
    var d = 0
    var c = 0
    while (c < 128) { if (ascii(c) > 0L) d += 1; c += 1 }
    if (wide != null) d += wide.size()
    d
  }

  def dotD(x: ArrayData, y: ArrayData): Double = {
    val m = x.numElements()
    // fail loudly: a silent min-length truncation would mask dimension
    // mismatches (e.g. 128-dim embeddings against 64-dim hyperplanes)
    require(m == y.numElements(),
      s"dot product dimension mismatch: $m vs ${y.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < m) {
      acc = acc + x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  def jaccard(x: ArrayData, y: ArrayData): Double = {
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i < x.numElements()) { seen.add(x.getUTF8String(i)); i += 1 }
    val nx = seen.size
    var inter = 0
    var ny = 0
    val seenY = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    i = 0
    while (i < y.numElements()) {
      val s = y.getUTF8String(i)
      if (seenY.add(s)) { ny += 1; if (seen.contains(s)) inter += 1 }
      i += 1
    }
    val union = nx + ny - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val m = arr.numElements()
    while (i < m) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = SimHash64.tokenHashUtf8(s)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Hashed-linear classifier score: Σ over token OCCURRENCES of
    * weight(bucket(token)) — the fastText-style bag-of-words linear
    * model every modern pretraining pipeline uses as its cheap quality
    * gate (the DCLM / FineWeb-Edu filter shape: score each document
    * with a linear classifier over hashed token features, keep above
    * threshold). bucket = low 20 bits of the FNV-1a/fmix64 token hash
    * (2^20-dim feature hashing); weight = a Knuth-multiplicative mix of
    * the bucket into [-32768, 32767]. The weight table is a
    * DETERMINISTIC STAND-IN for trained coefficients — the seam where a
    * real model's weights plug in is exactly this bucket→weight lookup
    * (at 2^20 × 2 bytes a trained table broadcasts trivially) — while
    * staying integer-exact so the DuckDB oracle replays it bit-for-bit
    * (Long sum: order-independent, no float accumulation). Null tokens
    * skipped; empty array scores 0. */
  def classifierScore(arr: ArrayData): Long = {
    var score = 0L
    var i = 0
    val m = arr.numElements()
    while (i < m) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val bucket = SimHash64.tokenHashUtf8(s) & 0xFFFFFL
        score += ((bucket * 2654435761L) >>> 16) % 65536L - 32768L
      }
      i += 1
    }
    score
  }

  /** Whitespace tokenization — byte-walk twin of
    * `filter(split(text, "\\s+"), _ =!= "")`, the tokenizer every text
    * operator shares (graft.text.TextFunctions.tokens). Semantics are
    * IDENTICAL by construction: Java's `\s` is the six ASCII
    * whitespace chars [ \t\n\x0B\f\r] (no UNICODE_CHARACTER_CLASS in
    * Spark's split), and in UTF-8 those are single bytes that can
    * never occur inside a multi-byte sequence — so "maximal run of
    * non-ws bytes" ≡ "regex-split token, empties dropped", unicode
    * whitespace (NBSP, U+2028…) staying inside tokens on both paths.
    * Why it exists: the HOF chain is a CodegenFallback that breaks
    * whole-stage codegen at the tokenize — the FIRST step of every
    * text pipeline — and re-enters the expression interpreter per
    * element; this is one static call per row, token views sliced
    * zero-copy off one byte array. */
  def wsTokens(u: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val bytes = u.getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](8)
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (b == 32 || (b >= 9 && b <= 13)) i += 1
      else {
        val start = i
        var c = b
        while (c != 32 && !(c >= 9 && c <= 13)) {
          i += 1
          if (i < n) c = bytes(i) else c = 32
        }
        out += org.apache.spark.unsafe.types.UTF8String
          .fromBytes(bytes, start, i - start)
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Canonical text form for [[NormalizeText]]: NFC normalization
    * (skipped via the cheap `isNormalized` probe when the input — the
    * common ASCII case — already is), ROOT-locale lowercase, then one
    * pass that collapses ASCII whitespace runs (0x09-0x0D, 0x20) to
    * single spaces and trims both ends. Composition order matches the
    * SQL twin `trim(regexp_replace(lower(nfc_normalize(s)), '\s+',
    * ' ', 'g'))` exactly. */
  def normalizeText(u: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    var s = u.toString
    if (!java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      s = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    s = s.toLowerCase(java.util.Locale.ROOT)
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pending = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ' || (c >= '\t' && c <= '\r')) {
        if (sb.length > 0) pending = true // leading ws never emits
      } else {
        if (pending) { sb.append(' '); pending = false }
        sb.append(c)
      }
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }

  /** Exact integer dot product of two array<int> columns — the int8
    * rerank kernel (quantized ANN scores whole candidate pairs with
    * this; as a HOF chain `aggregate(zip_with(a,b,_*_),0L,_+_)` it ran
    * interpreted per ELEMENT per PAIR, the hottest loop in q76). Long
    * accumulation of int products is overflow-free below 2^31 elements
    * and order-independent, so the value is bit-identical to the HOF
    * form and to the DuckDB list replay. */
  def dotL(x: ArrayData, y: ArrayData): Long = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    s
  }

  /** L2-normalize an array<double> in one pass (zero vectors pass
    * through unchanged). Same arithmetic as
    * `transform(v, x => x / sqrt(dot(v, v)))` — sequential-fold norm,
    * one IEEE division per element — but ONE codegen'd call per row:
    * the HOF form is interpreted per element AND re-evaluated once per
    * consumer expression (the PQ blocked view referenced it from m
    * slice expressions — m × interpreted normalization per row,
    * measured as the dominant cost of the q96 corpus scan). */
  def normalizeL2(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); s += x * x; i += 1 }
    val nrm = math.sqrt(s)
    val out = new Array[Any](n)
    i = 0
    if (nrm == 0.0)
      while (i < n) { out(i) = v.getDouble(i); i += 1 }
    else
      while (i < n) { out(i) = java.lang.Double.valueOf(v.getDouble(i) / nrm); i += 1 }
    new GenericArrayData(out)
  }

  /** ADC (asymmetric distance computation) lookup sum — product
    * quantization's scoring loop: `codes` holds one codebook index per
    * subspace block, `lut` the query's per-(block, code) fixed-point
    * distances laid out block-major (index = block·k + code). The sum
    * of m Long lookups is order-independent and exact, so PQ rankings
    * hash-match a DuckDB integer-sum replay. One kernel call per
    * (query, vector) pair — the loop an ADC SIMD scan runs. The
    * per-block stride is DERIVED (lut.length / codes.length), so a
    * codebook smaller than the declared k (corpus < k vectors) still
    * indexes correctly. */
  def adcSum(lut: ArrayData, codes: ArrayData): Long = {
    val m = codes.numElements()
    // Loud dimension checks (matching dotD's discipline): an empty codes
    // row (corrupt persisted index) must not surface as a bare
    // divide-by-zero from codegen, and a LUT whose length is not a
    // multiple of m would silently mis-stride every lookup after it.
    if (m == 0)
      throw new IllegalArgumentException("adcSum: empty codes array")
    if (lut.numElements() % m != 0)
      throw new IllegalArgumentException(
        s"adcSum: lut length ${lut.numElements()} not a multiple of m=$m")
    val k = lut.numElements() / m
    var s = 0L
    var j = 0
    while (j < m) {
      s += lut.getLong(j * k + codes.getInt(j))
      j += 1
    }
    s
  }

  /** Count of positions where two array<long> columns agree — the
    * MinHash signature-agreement estimator's inner loop (runs per
    * candidate PAIR in the LSH chain; the HOF form
    * `aggregate(zip_with(a,b,(x,y)=>if(x==y)1 else 0),0,_+_)` was
    * interpreted per element). Inputs are signature arrays: fixed
    * equal length, no null elements. */
  def eqCount(x: ArrayData, y: ArrayData): Int = {
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** Intersection size of two STRICTLY-ASCENDING int arrays — one
    * merge scan, O(|a|+|b|) int compares, zero allocation. The
    * set-verify kernel for dictionary-encoded gram sets
    * ([[graft.dedup.Dedup.containmentPairs]]): `array_intersect` on
    * string arrays builds a hash set PER ROW, which at millions of
    * candidate pairs is the whole query's cost; two sorted int arrays
    * intersect in a register loop. Inputs with duplicates would count
    * each duplicate — callers must encode from DISTINCT sets (a
    * dictionary over a set is injective, so sorted output is strictly
    * ascending by construction). */
  def sortedIntersectCount(x: ArrayData, y: ArrayData): Long = {
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      val a = x.getInt(i)
      val b = y.getInt(j)
      if (a == b) { c += 1L; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    c
  }

  /** [[classifierScore]] with an EXPLICIT weight table — the
    * trained-model form. `w.length` is the feature dimension (power of
    * two; bucket = hash & (len-1), which for 2^20 is exactly
    * [[classifierScore]]'s low-20-bit bucket). */
  def classifierScoreWeighted(arr: ArrayData, w: Array[Long]): Long = {
    val mask = w.length - 1
    var score = 0L
    var i = 0
    val m = arr.numElements()
    while (i < m) {
      val s = arr.getUTF8String(i)
      if (s != null)
        score += w((SimHash64.tokenHashUtf8(s) & mask).toInt)
      i += 1
    }
    score
  }

  def minhash(arr: ArrayData, n: Int): ArrayData = {
    val out = Array.fill(n)(Long.MaxValue)
    var i = 0
    val m = arr.numElements()
    while (i < m) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        var j = 0
        while (j < n) {
          val h = XxHash64Function.hash(s, StringType, j.toLong)
          if (h < out(j)) out(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def charNgrams(input: org.apache.spark.unsafe.types.UTF8String,
                 n: Int): ArrayData = {
    val s = input.toString
    val out = new java.util.LinkedHashSet[String]()
    if (s.length <= n) out.add(s)
    else {
      var i = 0
      val m = s.length - n
      while (i <= m) { out.add(s.substring(i, i + n)); i += 1 }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) {
      arr(i) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      i += 1
    }
    new GenericArrayData(arr)
  }

  /** ALL overlapping k-word grams (multiplicity kept, input order) —
    * the counting twin of [[wordShingles]]: repetition statistics need
    * occurrence counts, so nothing dedups. Fewer than k tokens yield
    * an EMPTY array (a 3-token doc has no 4-grams) — unlike the
    * shingle short-doc rule, which exists so SET-overlap operators can
    * still represent short docs. */
  def wordGrams(input: ArrayData, k: Int): ArrayData = {
    val m = input.numElements()
    if (m < k) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[String](m)
    var i = 0
    while (i < m) {
      val s = input.getUTF8String(i)
      toks(i) = if (s == null) "" else s.toString
      i += 1
    }
    val res = new Array[Any](m - k + 1)
    i = 0
    while (i <= m - k) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      res(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(res)
  }

  def wordShingles(input: ArrayData, k: Int): ArrayData = {
    val out = ShingleBuilder.distinctShingles(input, k)
    val res = new Array[Any](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) {
      res(i) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      i += 1
    }
    new GenericArrayData(res)
  }
}

/** n-element MinHash signature of an array<string> in one pass:
  * sig[i] = min over elements of xxhash64(element, seed=i). */
case class MinHashSignature(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ExprOps.minhash(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprOps.minhash($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of an array<string>: per-element 64-bit token hash,
  * ±1 bit votes, sign-of-sum reconstruction.
  *
  * The token hash is FNV-1a-64 over UNICODE CODEPOINTS finished with
  * the murmur3 fmix64 avalanche — not xxhash64 — because this exact
  * sequence is replayable in ANSI-ish SQL (128-bit integer arithmetic
  * mod 2^64 + a per-character fold), which is what lets q21 carry a
  * full DuckDB oracle instead of a rows-only check. Hash quality for
  * SimHash's per-bit independence comes from the fmix64 finalizer
  * (the same mixer murmur3 relies on); cost class is unchanged — a
  * few integer ops per character, single pass, no allocation beyond
  * the codepoint walk. */
object SimHash64 {
  private final val FnvBasis = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** FNV-1a over codepoints + fmix64 — the oracle-replayable token
    * hash ([[graft.SparkEntry]] emits its SQL twin for q21). */
  def tokenHash(s: String): Long = {
    var h = FnvBasis
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h ^ cp) * FnvPrime
      i += Character.charCount(cp)
    }
    fmix64(h)
  }

  /** Allocation-free path for the expression hot loop: ASCII tokens
    * (the overwhelming case — whitespace-split corpus words) hash
    * straight off the UTF8 bytes, where byte == codepoint; the first
    * high byte falls back to the codepoint walk. Bit-identical to
    * [[tokenHash]] on every input. */
  private[functions] def tokenHashUtf8(
      u: org.apache.spark.unsafe.types.UTF8String): Long = {
    val n = u.numBytes()
    var h = FnvBasis
    var i = 0
    while (i < n) {
      val b = u.getByte(i)
      if (b < 0) return tokenHash(u.toString) // non-ASCII: decode properly
      h = (h ^ b) * FnvPrime
      i += 1
    }
    fmix64(h)
  }

  private def fmix64(x: Long): Long = {
    var h = x
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }
}

/** The 64-bit token hash as a scalar COLUMN (FNV-1a over codepoints +
  * murmur3 fmix64 — [[SimHash64.tokenHashUtf8]], the one token hash
  * every oracle replays in HUGEINT): sketch bucket derivations
  * (Count-Min rows, classifier features) hang off this so the Spark
  * plan and the SQL twin share one hash by construction. */
case class TokenHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(ExprOps.tokenHash64(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprOps.tokenHash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(ExprOps.simhash64(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprOps.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Agreeing-position count of two long arrays — see [[ExprOps.eqCount]]. */
case class EqCountL(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Integer.valueOf(
      ExprOps.eqCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprOps.eqCount($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sorted-int-array intersection count — see
  * [[ExprOps.sortedIntersectCount]]. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(ExprOps.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ExprOps.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Exact integer dot product — see [[ExprOps.dotL]]. */
case class DotProductL(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(
      ExprOps.dotL(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprOps.dotL($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** One-pass L2 normalization — see [[ExprOps.normalizeL2]]. */
case class NormalizeL2(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ExprOps.normalizeL2(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprOps.normalizeL2($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ ADC lookup sum — see [[ExprOps.adcSum]]. `left` is the query's
  * block-major fixed-point LUT (array<long>, length m·k), `right` the
  * vector's code array (array<int>, length m). */
case class AdcSumL(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(ExprOps.adcSum(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ExprOps.adcSum($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Whitespace tokenizer — see [[ExprOps.wsTokens]] for the semantics
  * proof vs the `filter(split(...))` HOF chain it replaces. Keeps the
  * tokenize — the first step of every text pipeline — inside
  * whole-stage codegen. */
case class WhitespaceTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ExprOps.wsTokens(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprOps.wsTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode text canonicalizer — NFC normalize, ROOT-locale lower,
  * collapse ASCII whitespace runs, trim — in one kernel call per row
  * (see [[ExprOps.normalizeText]]). The canonical form in front of
  * exact dedup / fingerprinting: byte-identical content that differs
  * only in case, composition form, or spacing hashes identically
  * after this. Composing the built-ins (`lower` + two
  * `regexp_replace` + `trim`) walks the string four times and Spark
  * has no NFC primitive at all; this stays one pass inside
  * whole-stage codegen. */
case class NormalizeText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ExprOps.normalizeText(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprOps.normalizeText($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hashed-linear classifier score of a token array — see
  * [[ExprOps.classifierScore]] for the model shape and the
  * trained-weights seam. One row-level kernel call (vs an
  * interpreted transform+aggregate per token), oracle-replayable
  * integer arithmetic end to end. */
case class ClassifierScore64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(ExprOps.classifierScore(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprOps.classifierScore($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[ClassifierScore64]] with EXPLICIT trained weights — the concrete
  * form of the coefficient seam. `weights` is the dense bucket→weight
  * table (length = feature dimension, power of two); it rides the plan
  * as a reference object — serialized once per executor with the task
  * closure, indexed as a plain long[] from generated code — so scoring
  * stays one kernel call per row with zero joins and zero shuffles. A
  * 2^20-dim model is 8 MB: the standard fastText-gate size, far below
  * closure/broadcast limits. Load a (bucket, weight) frame into the
  * array with [[ClassifierWeights.fromFrame]]. */
case class ClassifierScoreWeighted(child: Expression, weights: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {
  require(weights.nonEmpty && (weights.length & (weights.length - 1)) == 0,
    s"weights length must be a power of two, got ${weights.length}")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      ExprOps.classifierScoreWeighted(input.asInstanceOf[ArrayData], weights))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val w = ctx.addReferenceObj("clfWeights", weights, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ExprOps.classifierScoreWeighted($c, $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Model-weight loading for [[ClassifierScoreWeighted]]. */
object ClassifierWeights {
  /** Densify a (bucket, weight) frame into the long[] the expression
    * indexes. The collect is bounded by `dim` BY CONSTRUCTION (this is
    * model loading, not a data path — a classifier's coefficient table
    * is driver-sized in every serving system); buckets outside
    * [0, dim) are rejected rather than silently masked, missing
    * buckets weigh 0. */
  def fromFrame(df: org.apache.spark.sql.DataFrame, dim: Int,
                bucketCol: String = "bucket",
                weightCol: String = "weight"): Array[Long] = {
    require(dim > 0 && (dim & (dim - 1)) == 0,
      s"dim must be a power of two, got $dim")
    val w = new Array[Long](dim)
    import org.apache.spark.sql.functions.col
    df.select(col(bucketCol).cast("long"), col(weightCol).cast("long"))
      .collect().foreach { r =>
        val b = r.getLong(0)
        require(b >= 0 && b < dim, s"bucket $b outside [0, $dim)")
        w(b.toInt) = r.getLong(1)
      }
    w
  }
}

/** Ordered dot product of two array<double> columns. The accumulation
  * is a strict left-to-right fold — the SAME IEEE-754 operation sequence
  * as `aggregate(zip_with(a,b,_*_), 0.0, _+_)` and as DuckDB's
  * list_dot_product, so results are bit-identical to both (oracle
  * parity depends on this). */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(
      ExprOps.dotD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprOps.dotD($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Distinct character n-grams of a string, in input order. The HOF
  * equivalent (`transform(sequence(...), i => substr(...))` +
  * `array_distinct`) re-enters the interpreter per character position —
  * 15s per 5000 docs at sf0.1; this is one eval per row. Strings
  * shorter than `n` yield the whole string as the single gram. */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ExprOps.charNgrams(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprOps.charNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct k-word shingles of an array<string> of tokens (space-
  * joined), in input order; fewer than k tokens yield one shingle of
  * all tokens. */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ExprOps.wordShingles(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprOps.wordShingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ALL overlapping k-word grams of an array<string> of tokens (space-
  * joined, multiplicity kept, input order); fewer than k tokens yield
  * an empty array. The counting twin of [[WordShingles]] — repetition
  * statistics ([[graft.text.Repetition]]) need occurrence counts, so
  * nothing dedups and the short-doc set rule does not apply. */
case class WordGrams(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ExprOps.wordGrams(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprOps.wordGrams($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared tight-loop shingle-set builder for [[WordShingles]] (array
  * form) and [[WordShingleExplode]] (generator form) — one definition,
  * so the two surfaces can never drift. */
private[functions] object ShingleBuilder {
  def distinctShingles(arr: ArrayData, k: Int): java.util.LinkedHashSet[String] = {
    val m = arr.numElements()
    val toks = new Array[String](m)
    var i = 0
    while (i < m) {
      val s = arr.getUTF8String(i)
      toks(i) = if (s == null) "" else s.toString
      i += 1
    }
    val out = new java.util.LinkedHashSet[String]()
    if (m < k) out.add(toks.mkString(" "))
    else {
      i = 0
      while (i <= m - k) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    out
  }
}

/** GENERATOR form of [[WordShingles]]: emits each distinct k-word
  * shingle as its own output ROW — the custom-`Generator` surface
  * (SURVEY §7.4). Semantically identical to
  * `explode(word_shingles(toks, k))`, but the per-document shingle
  * array is never materialized: rows stream straight out of the
  * builder, which matters on the corpus-wide shingle scans (q44/q59
  * explode ~300 shingles per document). Null token arrays generate
  * nothing (matching explode-of-null). */
case class WordShingleExplode(child: Expression, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with CodegenFallback {
  override def elementSchema: StructType =
    new StructType().add("shingle", StringType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val it = ShingleBuilder
        .distinctShingles(v.asInstanceOf[ArrayData], k).iterator()
      new Iterator[InternalRow] {
        override def hasNext: Boolean = it.hasNext
        override def next(): InternalRow = InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(it.next()))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integral cents image of a 2-decimal money double, as LONG — the
  * codegen'd core of [[graft.ops.Exact]]. `Math.round(x*100)` agrees
  * with both Spark's HALF_UP `round` and DuckDB's half-away-from-zero
  * on every reachable input: a 2-decimal value has no exact binary
  * representation, so its double image ×100 never lands exactly on a
  * .5 tie (where the three conventions could diverge). Unlike the
  * built-in Round (BigDecimal allocation per value), this inlines into
  * whole-stage codegen. */
case class Cents(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(Math.round(v.asInstanceOf[Double] * 100.0))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.round($c * 100.0)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Set Jaccard similarity of two array<string> columns in one pass
  * (inputs are already distinct sets from CharNgrams/WordShingles;
  * the built-in array_intersect + array_union pair walks both arrays
  * twice with intermediate allocations). */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(
      ExprOps.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprOps.jaccard($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Whole-bit character-entropy proxy — see [[ExprOps.charEntropyProxy]].
  * One static-call codegen span per row: the 100 TB form of a
  * character-diversity quality gate is this expression inside the scan
  * projection, zero shuffle, zero explode (the oracle DOES explode to
  * one row per character — at sf0.01; that shape is the cross-check,
  * not the plan). */
case class CharEntropyProxy(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(ExprOps.charEntropyProxy(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprOps.charEntropyProxy($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct code points — see [[ExprOps.charDistinctCp]]. */
case class CharDistinctCp(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(ExprOps.charDistinctCp(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprOps.charDistinctCp($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points for the custom expressions. */
object exprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  private def toExpr(c: Column): Expression = ColumnBridge.expression(c)
  private def toCol(e: Expression): Column = ColumnBridge.column(e)

  def minhash_signature(c: Column, n: Int): Column =
    toCol(MinHashSignature(toExpr(c), n))
  def simhash64(c: Column): Column = toCol(SimHash64(toExpr(c)))
  def token_hash64(c: Column): Column = toCol(TokenHash64(toExpr(c)))
  def ws_tokens(c: Column): Column = toCol(WhitespaceTokens(toExpr(c)))
  def normalize_text(c: Column): Column = toCol(NormalizeText(toExpr(c)))
  def classifier_score(c: Column): Column = toCol(ClassifierScore64(toExpr(c)))
  /** Trained-weights form; load `weights` via [[ClassifierWeights.fromFrame]]. */
  def classifier_score(c: Column, weights: Array[Long]): Column =
    toCol(ClassifierScoreWeighted(toExpr(c), weights))
  def dot_product(a: Column, b: Column): Column =
    toCol(DotProductD(toExpr(a), toExpr(b)))
  def dot_product_l(a: Column, b: Column): Column =
    toCol(DotProductL(toExpr(a), toExpr(b)))
  def eq_count_l(a: Column, b: Column): Column =
    toCol(EqCountL(toExpr(a), toExpr(b)))
  def sorted_intersect_count(a: Column, b: Column): Column =
    toCol(SortedIntersectCount(toExpr(a), toExpr(b)))
  def adc_sum_l(lut: Column, codes: Column): Column =
    toCol(AdcSumL(toExpr(lut), toExpr(codes)))
  def normalize_l2(c: Column): Column = toCol(NormalizeL2(toExpr(c)))
  def char_ngrams(c: Column, n: Int): Column = toCol(CharNgrams(toExpr(c), n))
  def word_shingles(c: Column, k: Int): Column = toCol(WordShingles(toExpr(c), k))
  /** All overlapping k-grams with multiplicity (see [[WordGrams]]). */
  def word_grams(c: Column, k: Int): Column = toCol(WordGrams(toExpr(c), k))
  /** Generator: one row per distinct k-shingle (see [[WordShingleExplode]]). */
  def word_shingle_rows(c: Column, k: Int): Column =
    toCol(WordShingleExplode(toExpr(c), k))
  def jaccard_sim(a: Column, b: Column): Column =
    toCol(JaccardSim(toExpr(a), toExpr(b)))
  def cents(c: Column): Column = toCol(Cents(toExpr(c)))
  def char_entropy_proxy(c: Column): Column =
    toCol(CharEntropyProxy(toExpr(c)))
  def char_distinct_cp(c: Column): Column = toCol(CharDistinctCp(toExpr(c)))
}
