package graft

import org.apache.spark.sql.functions._
import graft.text.LangConsistency

/** text.LangConsistency: per-chunk language-ID majority report. */
class LangConsistencySpec extends SparkTestBase {
  import spark.implicits._

  test("embedded foreign block trips the 80% agreement gate") {
    val en = "the of and is" // one 4-token English chunk
    val zh = "中文 字符 测试 文本"
    val docs = Seq(
      (1L, s"$en $en $zh $en $en"),       // 4/5 agree → exactly 0.8, not mixed
      (2L, s"$en $zh $zh $en $zh"),       // 2/5 en vs 3/5 zh → majority zh, mixed
      (3L, s"$en $en $en $en $en")        // uniform
    ).toDF("doc_id", "text")
    val out = LangConsistency.mixedLanguage(docs, "doc_id", "text",
        chunkSize = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L) == (("en", 5L, 4L, false)))
    assert(out(2L) == (("zh", 5L, 3L, true)))
    assert(out(3L) == (("en", 5L, 5L, false)))
  }

  test("short documents emit one chunk and never read as mixed") {
    val docs = Seq((1L, "the of")).toDF("doc_id", "text")
    val out = LangConsistency.mixedLanguage(docs, "doc_id", "text", 32)
      .head()
    assert(out.getLong(2) == 1L && out.getLong(3) == 1L)
    assert(!out.getBoolean(4))
  }

  test("total over the corpus; agreement mass bounded by chunk count") {
    val d = Tables.documents(spark, sf)
    val out = LangConsistency.mixedLanguage(d, "doc_id", "text")
    assert(out.count() == d.count())
    assert(out.filter(col("n_major") > col("n_chunks")
      || col("n_major") < 1).isEmpty)
  }
}
