package graft

import org.apache.spark.sql.Row
import graft.text.Repetition

/** text.Repetition: Gopher-style structural repetition statistics. */
class RepetitionSpec extends SparkTestBase {
  import spark.implicits._

  private def rowsOf(docs: org.apache.spark.sql.DataFrame): Map[Long, Row] =
    Repetition.stats(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("duplicate line fractions, hand-computed") {
    // doc 1: lines "aa","bb","aa","aa" → 4 occurrences, 2 distinct
    //   dup_frac = 2/4; chars: all len 2 → dup_char_frac = 4/8
    // doc 2: no repeats → zeros
    val docs = Seq(
      (1L, "aa\nbb\naa\naa"),
      (2L, "xx\nyy")
    ).toDF("doc_id", "text")
    val m = rowsOf(docs)
    assert(m(1L).getAs[Long]("n_lines") == 4L)
    assert(m(1L).getAs[Double]("dup_line_frac") == 0.5)
    assert(m(1L).getAs[Double]("dup_line_char_frac") == 0.5)
    assert(m(2L).getAs[Long]("n_lines") == 2L)
    assert(m(2L).getAs[Double]("dup_line_frac") == 0.0)
  }

  test("character weighting differs from occurrence weighting") {
    // lines: "aaaaaaaaaa" (10 chars, ×2) and "b" (1 char, once):
    // dup_frac = (3-2)/3 = 1/3; dup_char_frac = 10/21
    val docs = Seq((1L, "aaaaaaaaaa\nb\naaaaaaaaaa")).toDF("doc_id", "text")
    val r = rowsOf(docs)(1L)
    assert(r.getAs[Double]("dup_line_frac") == 1.0 / 3)
    assert(r.getAs[Double]("dup_line_char_frac") == 10.0 / 21)
  }

  test("paragraphs split on blank lines, lines on every newline") {
    // two identical paragraphs of two lines each
    val docs = Seq((1L, "p q\nr s\n\np q\nr s")).toDF("doc_id", "text")
    val r = rowsOf(docs)(1L)
    assert(r.getAs[Long]("n_paras") == 2L)
    assert(r.getAs[Double]("dup_para_frac") == 0.5)
    assert(r.getAs[Double]("dup_para_char_frac") == 0.5)
    assert(r.getAs[Long]("n_lines") == 4L)
    assert(r.getAs[Double]("dup_line_frac") == 0.5)
  }

  test("top n-gram char fraction with deterministic tie-break") {
    // "x y x y x y": 2-grams = [x y, y x, x y, y x, x y] → top is
    // "x y" (count 3, len 3); text len 11 → 9/11
    val docs = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
    val r = rowsOf(docs)(1L)
    assert(r.getAs[Double]("top_2gram_char_frac") == 9.0 / 11)
    // 3-grams: [x y x, y x y, x y x, y x y] → tie at 2; struct-max
    // takes the DESC-greater gram "y x y" (len 5) → 10/11
    assert(r.getAs[Double]("top_3gram_char_frac") == 10.0 / 11)
  }

  test("docs shorter than n tokens, empty docs, and single lines zero-fill") {
    val docs = Seq(
      (1L, "one two three"), // 3 tokens: no 4-grams
      (2L, ""),              // nothing at all
      (3L, "solo")           // one line, one token
    ).toDF("doc_id", "text")
    val m = rowsOf(docs)
    assert(m(1L).getAs[Double]("top_4gram_char_frac") == 0.0)
    assert(m(2L).getAs[Long]("n_lines") == 0L)
    assert(m(2L).getAs[Double]("dup_line_frac") == 0.0)
    assert(m(2L).getAs[Double]("top_2gram_char_frac") == 0.0)
    assert(m(3L).getAs[Long]("n_lines") == 1L)
    assert(m(3L).getAs[Double]("dup_line_frac") == 0.0)
    assert(m.size == 3) // frame is total over the corpus
  }

  test("gopher filter drops a repeated-paragraph doc, keeps clean prose") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over one lazy dog near the river"),
      (2L, "spam spam spam spam spam spam spam spam"), // top-2gram ≫ 0.20
      (3L, "copy me\n\ncopy me\n\ncopy me") // dup_para_char_frac = 2/3
    ).toDF("doc_id", "text")
    val kept = Repetition.gopherFilter(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("word-gram kernel: all occurrences, order kept, short arrays empty") {
    val df = Seq("a b a b a", "a", "").toDF("t")
    val out = df.select(graft.functions.exprs.word_grams(
        graft.text.TextFunctions.tokens(org.apache.spark.sql.functions.col("t")), 2))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a b", "b a", "a b", "b a"))
    assert(out(1) == Seq.empty)
    assert(out(2) == Seq.empty)
  }
}
