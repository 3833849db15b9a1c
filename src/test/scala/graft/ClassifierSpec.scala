package graft

import org.apache.spark.sql.functions._
import graft.functions.{exprs, SimHash64}
import graft.text.{TextFunctions => TF}

/** functions.ClassifierScore64: the hashed-linear quality-classifier
  * kernel (q93) — occurrence semantics, Scala replay of the bucket →
  * weight arithmetic, composed-HOF equivalence, edge shapes. */
class ClassifierSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent replay of the kernel's arithmetic off the public
    * token hash — the same derivation the DuckDB oracle runs. */
  private def expected(tokens: Seq[String]): Long =
    tokens.map { t =>
      val bucket = SimHash64.tokenHash(t) & 0xFFFFFL
      ((bucket * 2654435761L) >>> 16) % 65536L - 32768L
    }.sum

  private def score(text: String): Long =
    Seq(text).toDF("text")
      .select(exprs.classifier_score(TF.tokens(col("text"))).as("s"))
      .head().getLong(0)

  test("score ≡ per-occurrence Scala replay (dups count per occurrence)") {
    assert(score("the quick brown fox") ==
      expected(Seq("the", "quick", "brown", "fox")))
    // bag-of-words, not a set: a repeated token's weight accrues per hit
    assert(score("spam spam spam") == 3 * expected(Seq("spam")))
    assert(score("héllo wörld 你好") == expected(Seq("héllo", "wörld", "你好")))
  }

  test("empty and whitespace-only docs score 0; weights span both signs") {
    assert(score("") == 0L)
    assert(score("   \t ") == 0L)
    // the synthetic weight mix must not be degenerate — over a token
    // spread both positive and negative weights appear, so the keep
    // threshold actually partitions a corpus
    val ws = ('a' to 'z').map(c => expected(Seq(c.toString)))
    assert(ws.exists(_ > 0) && ws.exists(_ < 0))
  }

  test("kernel ≡ composed transform+aggregate over the same hash") {
    // the expression exists to replace this interpreted HOF chain;
    // semantics must be identical on a real column of docs
    val docs = Seq("a b c", "zz top", "", "one one two", "ümlaut mix")
      .toDF("text")
    val viaKernel = docs
      .select(exprs.classifier_score(TF.tokens(col("text"))).as("s"))
      .collect().map(_.getLong(0)).toSeq
    val viaReplay = docs.collect().map(r =>
      expected(r.getString(0).split("\\s+").filter(_.nonEmpty).toSeq)).toSeq
    assert(viaKernel == viaReplay)
  }

  test("weighted form: explicit 2^20 mix table ≡ the synthetic kernel") {
    // materialize the synthetic weight mix as an ACTUAL table — the
    // trained-coefficient seam, fed with the coefficients the built-in
    // kernel derives — and the two forms must agree on every doc
    val dim = 1 << 20
    val w = Array.tabulate(dim)(b =>
      ((b.toLong * 2654435761L) >>> 16) % 65536L - 32768L)
    val docs = Seq("the quick brown fox", "spam spam spam", "", "ümlaut mix")
      .toDF("text")
    val both = docs.select(
      exprs.classifier_score(TF.tokens(col("text"))).as("syn"),
      exprs.classifier_score(TF.tokens(col("text")), w).as("tab"))
    assert(both.collect().forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("weighted form: toy trained model, mask semantics, frame loader") {
    import graft.functions.ClassifierWeights
    // dim 8: bucket = tokenHash & 7; put a deciding weight on 'good'
    // and a penalty on 'bad' — colliding buckets get the SUM semantics
    // a linear model over hashed features actually has
    val gb = (SimHash64.tokenHash("good") & 7L).toInt
    val bb = (SimHash64.tokenHash("bad") & 7L).toInt
    assume(gb != bb) // fixed hash, fixed tokens: stable across runs
    val wf = Seq((gb.toLong, 10L), (bb.toLong, -10L)).toDF("bucket", "weight")
    val w = ClassifierWeights.fromFrame(wf, 8)
    val scores = Seq("good good story", "bad bad bad", "neutral words")
      .toDF("text")
      .select(exprs.classifier_score(TF.tokens(col("text")), w).as("s"))
      .collect().map(_.getLong(0))
    val nw = Seq("neutral", "words", "story").map(t =>
      w((SimHash64.tokenHash(t) & 7L).toInt))
    assert(scores(0) == 20L + nw(2) && scores(1) == -30L)
    assert(scores(2) == nw(0) + nw(1))
    // loader rejects out-of-range buckets instead of masking silently
    intercept[IllegalArgumentException] {
      ClassifierWeights.fromFrame(Seq((8L, 1L)).toDF("bucket", "weight"), 8)
    }
  }

  test("q93 query shape: per-doc rows, keep = score > 0, no shuffle") {
    val df = Seq((1L, "alpha beta gamma"), (2L, null.asInstanceOf[String]),
        (3L, "")).toDF("doc_id", "text")
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        exprs.classifier_score(TF.tokens(col("text"))).as("clf_score"),
        TF.tokenCount(col("text")).as("n_tokens"))
      .withColumn("keep", (col("clf_score") > 0L).cast("int"))
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 3L)) // null text filtered, empty kept
    assert(rows(1) == ((3L, 0L, 0, 0)))
    assert(rows(0)._2 == expected(Seq("alpha", "beta", "gamma")))
    assert(rows(0)._4 == (if (rows(0)._2 > 0) 1 else 0))
    // per-row projection only: no exchange anywhere in the plan
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
