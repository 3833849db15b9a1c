package graft

import org.apache.spark.sql.functions._
import graft.ops.Eval

/** ops.Eval: exact rank-sum AUC (tie convention included) and the
  * confusion/F1 report. */
class EvalSpec extends SparkTestBase {
  import spark.implicits._

  test("AUC hand case with a tie: midranks give exactly 0.75") {
    // neg scores 1,2,3; pos scores 2,4 -> U = 4.5, AUC = 4.5/6
    val df = Seq(("s", 1L, 0), ("s", 2L, 0), ("s", 2L, 1),
      ("s", 3L, 0), ("s", 4L, 1)).toDF("seg", "score", "y")
    val r = Eval.aucBySegment(df, "seg", "score", "y").head()
    assert(r.getAs[Long]("n_pos") == 2 && r.getAs[Long]("n_neg") == 3)
    assert(r.getAs[Long]("u2") == 9L)
    assert(r.getAs[Long]("auc_code") == 750000L)
  }

  test("perfect separation = 1e6, reversed = 0, one-class = NULL") {
    val df = Seq(
      ("perfect", 1L, 0), ("perfect", 2L, 0), ("perfect", 9L, 1),
      ("reversed", 9L, 0), ("reversed", 1L, 1),
      ("onecls", 5L, 1), ("onecls", 6L, 1))
      .toDF("seg", "score", "y")
    val m = Eval.aucBySegment(df, "seg", "score", "y").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(r.fieldIndex("auc_code")))
        None else Some(r.getAs[Long]("auc_code")))).toMap
    assert(m("perfect").contains(1000000L))
    assert(m("reversed").contains(0L))
    assert(m("onecls").isEmpty)
  }

  test("all-tied scores give exactly AUC 1/2 — the tie convention, not luck") {
    val df = Seq(("t", 7L, 0), ("t", 7L, 0), ("t", 7L, 1), ("t", 7L, 1))
      .toDF("seg", "score", "y")
    assert(Eval.aucBySegment(df, "seg", "score", "y")
      .head().getAs[Long]("auc_code") == 500000L)
  }

  test("NDCG hand case: order matters, codes are the exact pinned-table sums") {
    // rel: A grade 3, B 2, C 1; ranked: B(1), X(2), A(3), C(4)
    // DCG  = 2*1000000 + 3*500000 + 1*430677 = 3930677
    // IDCG = 3*1000000 + 2*630930 + 1*500000 = 4761860
    val ranked = Seq((1L, "B", 1), (1L, "X", 2), (1L, "A", 3),
      (1L, "C", 4)).toDF("qid", "doc_id", "rank")
    val rel = Seq((1L, "A", 3L), (1L, "B", 2L), (1L, "C", 1L))
      .toDF("qid", "doc_id", "grade")
    val r = Eval.ndcgAtK(ranked, rel, k = 10).head()
    assert(r.getAs[Long]("dcg_code") == 3930677L)
    assert(r.getAs[Long]("idcg_code") == 4761860L)
    assert(r.getAs[Long]("ndcg_code") == 825449L)
    // the perfect ordering scores exactly 1e6
    val perfect = Seq((1L, "A", 1), (1L, "B", 2), (1L, "C", 3))
      .toDF("qid", "doc_id", "rank")
    assert(Eval.ndcgAtK(perfect, rel, k = 10)
      .head().getAs[Long]("ndcg_code") == 1000000L)
    // a query whose relevant set is all missed still emits (dcg 0)
    val miss = Seq((1L, "X", 1)).toDF("qid", "doc_id", "rank")
    val m = Eval.ndcgAtK(miss, rel, k = 10).head()
    assert(m.getAs[Long]("dcg_code") == 0L &&
      m.getAs[Long]("ndcg_code") == 0L)
  }

  test("NDCG output is the UNION of qids: ranked-only emits NULL, relevant-only emits 0") {
    // qid 1: both sides; qid 2: ranked but NO relevant rows (must
    // appear, ndcg NULL — undefined, not dropped); qid 3: relevant
    // but never ranked (must appear, ndcg 0 — it ranked nothing)
    val ranked = Seq((1L, "A", 1), (2L, "X", 1), (2L, "Y", 2))
      .toDF("qid", "doc_id", "rank")
    val rel = Seq((1L, "A", 3L), (3L, "B", 2L))
      .toDF("qid", "doc_id", "grade")
    val out = Eval.ndcgAtK(ranked, rel, k = 10).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("dcg_code"),
          if (r.isNullAt(r.fieldIndex("idcg_code"))) None
          else Some(r.getAs[Long]("idcg_code")),
          if (r.isNullAt(r.fieldIndex("ndcg_code"))) None
          else Some(r.getAs[Long]("ndcg_code")))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((3000000L, Some(3000000L), Some(1000000L))))
    assert(out(2L) == ((0L, None, None)))
    assert(out(3L) == ((0L, Some(2000000L), Some(0L))))
  }

  test("Kendall tau-b: perfect agreement, reversal, the tie case, all-ties guard") {
    def tau(rows: Seq[(String, Long, Long, Long)]) =
      Eval.kendallBySegment(rows.toDF("seg", "id", "x", "y"),
          "seg", "x", "y", "id")
        .collect().map(r => r.getString(0) -> r).toMap
    val m = tau(Seq(
      ("up", 1L, 1L, 10L), ("up", 2L, 2L, 20L), ("up", 3L, 3L, 30L),
      ("down", 1L, 1L, 30L), ("down", 2L, 2L, 20L), ("down", 3L, 3L, 10L),
      // x ties once: nc=2, tie_x=1 -> 2/sqrt(6) -> 13377
      ("tied", 1L, 1L, 1L), ("tied", 2L, 1L, 2L), ("tied", 3L, 2L, 3L),
      // y constant: no ordering to correlate -> 0 by the guard
      ("flat", 1L, 1L, 7L), ("flat", 2L, 2L, 7L), ("flat", 3L, 3L, 7L)))
    assert(m("up").getAs[Long]("tau_b_code") == 16384L)
    assert(m("down").getAs[Long]("tau_b_code") == -16384L)
    val t = m("tied")
    assert(t.getAs[Long]("nc") == 2 && t.getAs[Long]("tie_x") == 1)
    assert(t.getAs[Long]("tau_b_code") == 13377L)
    assert(m("flat").getAs[Long]("tau_b_code") == 0L)
  }

  test("confusion cells and F1 at a threshold, with degenerate guards") {
    val df = Seq(
      ("s", 5L, 1), ("s", 5L, 0), ("s", -1L, 1), ("s", -2L, 0),
      ("s", -3L, 0),
      ("allneg", -5L, 0), ("allneg", -6L, 0))
      .toDF("seg", "score", "y")
    val out = Eval.confusionAt(df, "seg", "score", "y", threshold = 0L)
      .collect().map(r => r.getString(0) -> r).toMap
    val s = out("s")
    assert(s.getAs[Long]("tp") == 1 && s.getAs[Long]("fp") == 1 &&
      s.getAs[Long]("fn") == 1 && s.getAs[Long]("tn") == 2)
    assert(s.getAs[Long]("precision_code") == 500000L)
    assert(s.getAs[Long]("recall_code") == 500000L)
    assert(s.getAs[Long]("f1_code") == 500000L)
    val a = out("allneg")
    assert(a.getAs[Long]("tp") == 0 && a.getAs[Long]("tn") == 2)
    assert(a.isNullAt(a.fieldIndex("precision_code")))
    assert(a.isNullAt(a.fieldIndex("recall_code")))
    assert(a.isNullAt(a.fieldIndex("f1_code")))
  }

  test("AUC is threshold-free: it upper-bounds every confusion point's balanced accuracy story") {
    // sanity on the real corpus: the classifier score vs the length
    // label must produce SOME defined AUC per source and the exact
    // identity u2 <= 2 * n_pos * n_neg (AUC <= 1) always holds
    val scored = Tables.documents(spark, sf).where(col("text").isNotNull)
      .select(col("source"),
        graft.functions.exprs.classifier_score(
          graft.text.TextFunctions.tokens(col("text"))).as("score"),
        (col("n_chars") >= 300).cast("int").as("y"))
    val rows = Eval.aucBySegment(scored, "source", "score", "y").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, n, u2) = (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
        r.getAs[Long]("u2"))
      if (p > 0 && n > 0) {
        assert(u2 >= 0 && u2 <= 2 * p * n)
        val code = r.getAs[Long]("auc_code")
        assert(code >= 0 && code <= 1000000)
      }
    }
  }

  test("reliabilityBins: hand bands, ntile remainder law, exact rates") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 8 rows, 4 bands of 2, labels chosen so rates read 0, 1/2, 1/2, 1
    val d = Seq(
      ("g", 1L, 10L, 0L), ("g", 2L, 20L, 0L), ("g", 3L, 30L, 0L),
      ("g", 4L, 40L, 1L), ("g", 5L, 50L, 0L), ("g", 6L, 60L, 1L),
      ("g", 7L, 70L, 1L), ("g", 8L, 80L, 1L))
      .toDF("seg", "id", "score", "y")
    val r = graft.ops.Eval.reliabilityBins(d, "seg", "score", "id", "y",
        bins = 4)
      .collect().map(x => x.getInt(1) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5),
          x.getLong(6)))).toMap
    assert(r(1) == ((2L, 0L, 10L, 20L, 0L)))
    assert(r(2) == ((2L, 1L, 30L, 40L, 500000L)))
    assert(r(3) == ((2L, 1L, 50L, 60L, 500000L)))
    assert(r(4) == ((2L, 2L, 70L, 80L, 1000000L)))
    // ntile remainder law: 5 rows into 2 bands -> sizes 3 and 2
    val odd = Seq(("g", 1L, 1L, 0L), ("g", 2L, 2L, 0L), ("g", 3L, 3L, 1L),
      ("g", 4L, 4L, 1L), ("g", 5L, 5L, 1L)).toDF("seg", "id", "score", "y")
    val o = graft.ops.Eval.reliabilityBins(odd, "seg", "score", "id", "y",
        bins = 2)
      .collect().map(x => x.getInt(1) -> x.getLong(2)).toMap
    assert(o == Map(1 -> 3L, 2 -> 2L))
    // score ties sequence by id, so bands stay deterministic
    val tied = Seq(("g", 1L, 7L, 0L), ("g", 2L, 7L, 1L),
      ("g", 3L, 7L, 0L), ("g", 4L, 7L, 1L)).toDF("seg", "id", "score", "y")
    val t = graft.ops.Eval.reliabilityBins(tied, "seg", "score", "id", "y",
        bins = 2)
      .collect().map(x => x.getInt(1) -> x.getLong(3)).toMap
    assert(t == Map(1 -> 1L, 2 -> 1L)) // ids (1,2) then (3,4)
  }
}
