package graft

import org.apache.spark.sql.functions._
import graft.text.LineQuality

/** text.LineQuality: C4-style line-level filtering (q125 runs the
  * requirePunct=false transcript configuration on the synthetic
  * corpus; the FULL published gate incl. terminal punctuation is
  * pinned here). */
class LineQualitySpec extends SparkTestBase {
  import spark.implicits._

  private val prose = Seq(
    // 3 good lines -> kept under the default doc gate
    (1L, "The quick brown fox jumps over the lazy dog today.\n" +
         "A second sentence with plenty of words ends here too!\n" +
         "Does this third line carry enough words to pass?"),
    // good lines but a lorem-ipsum placeholder -> doc rejected
    (2L, "Lorem ipsum dolor sit amet consectetur adipiscing elit sed.\n" +
         "This otherwise fine sentence has enough words to pass."),
    // code-ish doc: '{' -> rejected regardless of lines
    (3L, "function f() { return the value of the thing now. }"),
    // boilerplate marker line dropped, too few survivors
    (4L, "Please enable JavaScript to view this page properly now.\n" +
         "ok."),
    // no terminal punctuation anywhere -> zero kept lines
    (5L, "this line has many words but never terminates with punctuation\n" +
         "neither does this one though it is equally long and wordy")
  ).toDF("doc_id", "text")

  test("published gate: punctuation + word count + marker, doc gates on top") {
    val r = LineQuality.c4Filter(prose, "doc_id", "text",
        minKeptLines = 3, minWords = 5, requirePunct = true)
      .orderBy("doc_id").collect()
    assert(r.length == 5) // funnel accounting: every doc survives, flagged
    val byId = r.map(x => x.getLong(0) ->
      (x.getInt(1), x.getInt(2), x.getBoolean(3), x.getString(4))).toMap
    assert(byId(1L) == ((3, 3, true,
      prose.filter($"doc_id" === 1).head().getString(1))))
    assert(byId(2L)._3 == false)        // lorem ipsum doc gate
    assert(byId(2L)._2 == 2)            // ...but its lines were fine
    assert(byId(3L)._3 == false)        // '{' doc gate
    assert(byId(4L)._2 == 0 && !byId(4L)._3) // marker + short line both dropped
    assert(byId(5L)._2 == 0 && byId(5L)._4 == "") // no punct -> nothing kept
  }

  test("kept lines rejoin in original order; rejected lines vanish") {
    val doc = Seq((9L,
      "First good sentence with enough words right here now.\n" +
      "short.\n" +
      "Second good sentence also with enough words right here.")).toDF("doc_id", "text")
    val row = LineQuality.c4Filter(doc, "doc_id", "text",
      minKeptLines = 1, minWords = 5, requirePunct = true).head()
    assert(row.getAs[Int]("n_lines") == 3 && row.getAs[Int]("n_kept") == 2)
    assert(row.getAs[String]("text_clean") ==
      "First good sentence with enough words right here now.\n" +
      "Second good sentence also with enough words right here.")
  }

  test("requirePunct=false keeps word-count/marker rules biting") {
    val doc = Seq(
      (1L, "plenty of words but no punctuation on this transcript line"),
      (2L, "too few words")).toDF("doc_id", "text")
    val r = LineQuality.c4Filter(doc, "doc_id", "text",
        minKeptLines = 1, minWords = 5, requirePunct = false)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Boolean]("kept") && r(0).getAs[Int]("n_kept") == 1)
    assert(!r(1).getAs[Boolean]("kept") && r(1).getAs[Int]("n_kept") == 0)
  }

  test("plan shape: one projection, no shuffle, no explode") {
    val plan = LineQuality.c4Filter(Tables.documents(spark, sf),
      "doc_id", "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Generate"))
  }
}
