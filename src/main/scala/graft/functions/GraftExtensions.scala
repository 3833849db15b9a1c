package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering the engine's custom
  * expressions as SQL functions, so `spark.sql` users can call them:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * spark.sql("SELECT minhash_signature(shingles, 16) FROM docs")
  * }}}
  *
  * (DataFrame users go through [[graft.functions.exprs]] directly.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.registrations

  override def apply(ext: SparkSessionExtensions): Unit = {
    registrations.foreach(ext.injectFunction)
    graft.plans.Rules.all.foreach(r => ext.injectOptimizerRule(_ => r))
  }
}

/** Same registrations, applied directly to a live session (builder
  * extensions only take effect on session creation — `getOrCreate`
  * against an existing session ignores them). */
object GraftExtensions {

  /** Register all graft SQL functions on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** SQL integer literals parse as INT; BloomFilterAggregate demands
    * BIGINT — re-literal either width as long. */
  private def longArg(e: Expression, what: String): Expression = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) =>
      org.apache.spark.sql.catalyst.expressions.Literal(v.toLong)
    case l @ org.apache.spark.sql.catalyst.expressions.Literal(_: Long, _) => l
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private type Reg =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def registrations: Seq[Reg] = Seq(
    (FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(arr, n) - n-seed MinHash signature"),
      (args: Seq[Expression]) => MinHashSignature(args.head, intArg(args(1), "n"))),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(arr) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    (FunctionIdentifier("ws_tokens"),
      info("ws_tokens", "ws_tokens(str) - whitespace tokens, empties dropped (codegen'd twin of filter(split(str,'\\\\s+'), t -> t <> ''))"),
      (args: Seq[Expression]) => WhitespaceTokens(args.head)),
    (FunctionIdentifier("normalize_text"),
      info("normalize_text", "normalize_text(str) - NFC + lowercase + collapse whitespace + trim, one pass"),
      (args: Seq[Expression]) => NormalizeText(args.head)),
    (FunctionIdentifier("classifier_score"),
      info("classifier_score", "classifier_score(arr) - hashed-linear quality-classifier score of a token array"),
      (args: Seq[Expression]) => ClassifierScore64(args.head)),
    (FunctionIdentifier("char_ngrams"),
      info("char_ngrams", "char_ngrams(str, n) - distinct character n-grams"),
      (args: Seq[Expression]) => CharNgrams(args.head, intArg(args(1), "n"))),
    (FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(arr, k) - distinct k-word shingles"),
      (args: Seq[Expression]) => WordShingles(args.head, intArg(args(1), "k"))),
    (FunctionIdentifier("jaccard_sim"),
      info("jaccard_sim", "jaccard_sim(a, b) - set Jaccard of two string arrays"),
      (args: Seq[Expression]) => JaccardSim(args.head, args(1))),
    (FunctionIdentifier("dot_product_d"),
      info("dot_product_d", "dot_product_d(a, b) - ordered dot product of double arrays"),
      (args: Seq[Expression]) => DotProductD(args.head, args(1))),
    (FunctionIdentifier("vec_sum_fixed"),
      info("vec_sum_fixed",
        "vec_sum_fixed(v, scale) - grouped element-wise vector sum as struct(n, sums) of floor(x*10^scale) longs"),
      (args: Seq[Expression]) =>
        VectorSumFixed(args.head, intArg(args(1), "scale"))),
    (FunctionIdentifier("top_k"),
      info("top_k",
        "top_k(expr, k[, asc]) - bounded per-group top-k of any orderable value, best-first array"),
      (args: Seq[Expression]) => TopKOrdered(args.head, intArg(args(1), "k"),
        asc = args.lift(2).exists {
          case org.apache.spark.sql.catalyst.expressions.Literal(b: Boolean, _) => b
          case other => throw new IllegalArgumentException(
            s"asc must be a boolean literal, got $other")
        })),
    // Spark's OWN runtime-filter bloom expressions, surfaced to SQL
    // (upstream registers them internal-only): the ingest-gate
    // primitives graft.ops.BloomGate drives from the DataFrame side.
    // The key is xxhash64'd here so callers pass raw keys, exactly as
    // the optimizer's InjectRuntimeFilter composes the pair.
    (FunctionIdentifier("bloom_agg"),
      info("bloom_agg",
        "bloom_agg(key, items, bits) - serialized bloom filter over xxhash64(key)"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(args.head)),
          longArg(args(1), "items"), longArg(args(2), "bits"))),
    (FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain",
        "bloom_might_contain(bloom, key) - membership probe; bloom must be a constant or scalar subquery"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args.head,
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(args(1))))))
}
