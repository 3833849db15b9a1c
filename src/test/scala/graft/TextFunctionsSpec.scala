package graft

import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** text.TextFunctions: tokenizer edges, lang-ID, fingerprint. */
class TextFunctionsSpec extends SparkTestBase {

  test("word_shingle_rows generator ≡ explode(word_shingles) incl. short/dup docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.exprs
    import graft.text.{TextFunctions => TF}
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c a b c a b c"), // dup shingles collapse
      (3L, "tiny"), (4L, "x y"), (5L, "")             // short-doc whole-text rule
    ).toDF("doc_id", "text")
    val viaArray = docs.select(col("doc_id"),
        explode(exprs.word_shingles(TF.tokens(col("text")), 3)).as("shingle"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaGen = docs.select(col("doc_id"),
        exprs.word_shingle_rows(TF.tokens(col("text")), 3).as("shingle"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaGen == viaArray)
    assert(viaGen.contains((3L, "tiny")) && viaGen.contains((5L, "")))
    assert(viaGen.count(_._1 == 2L) == 3) // distinct, not 7
  }
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c).head().getAs[T](0)

  test("ws_tokens ≡ filter(split(text, \\s+), _ != '') on every edge shape") {
    import org.apache.spark.sql.functions._
    // the declarative form the codegen'd tokenizer replaces — must be
    // bit-identical, incl. unicode whitespace NOT splitting (Java \s
    // is ASCII-only) and multi-byte tokens surviving intact
    val edges = Seq(
      "a  b\t c", "   ", "", "solo", " lead", "trail ", "\tx\n\ry z",
      "nb sp stays", "héllo wörld", "你好 世界", "mix 你好x line")
    val df = edges.toDF("t")
    val old = df.select(filter(split(col("t"), "\\s+"), x => x =!= "").as("a"))
      .collect().map(_.getSeq[String](0).toList)
    val neu = df.select(graft.functions.exprs.ws_tokens(col("t")).as("a"))
      .collect().map(_.getSeq[String](0).toList)
    assert(neu.toSeq == old.toSeq)
    assert(neu(7) == List("nb sp", "stays")) // NBSP is not \s
    // null text → null array on both paths
    val n2 = Seq[String](null).toDF("t")
    assert(n2.select(graft.functions.exprs.ws_tokens(col("t"))).head().isNullAt(0))
  }

  test("tokenCount handles runs of whitespace and empty-ish strings") {
    assert(one[Int](TextFunctions.tokenCount(col("t")), "a  b\t c") == 3)
    assert(one[Int](TextFunctions.tokenCount(col("t")), "   ") == 0)
    assert(one[Int](TextFunctions.tokenCount(col("t")), "solo") == 1)
  }

  test("langId picks the language with most stopword hits") {
    assert(one[String](TextFunctions.langId(col("t")),
      "the cat and the dog of the house") == "en")
    assert(one[String](TextFunctions.langId(col("t")),
      "el perro y la casa de los gatos que ladran") == "es")
    assert(one[String](TextFunctions.langId(col("t")),
      "der hund und die katze ist hier") == "de")
    assert(one[String](TextFunctions.langId(col("t")),
      "le chien et les chats est des amis") == "fr")
    assert(one[String](TextFunctions.langId(col("t")), "你好世界") == "zh")
  }

  test("fingerprint is whitespace- and case-insensitive") {
    val a = one[String](TextFunctions.fingerprint(col("t")), "Hello   World")
    val b = one[String](TextFunctions.fingerprint(col("t")), "hello world ")
    val c = one[String](TextFunctions.fingerprint(col("t")), "hello earth")
    assert(a == b && a != c)
  }

  test("rollingHash is order-sensitive where fingerprint is not") {
    val ab = one[Long](TextFunctions.rollingHash(col("t")), "alpha beta")
    val ba = one[Long](TextFunctions.rollingHash(col("t")), "beta alpha")
    assert(ab != ba)
  }

  test("chunks cover every token with tail-anchored windows") {
    val words = (1 to 150).map(i => s"w$i").mkString(" ")
    val out = Seq(words).toDF("t")
      .select(TextFunctions.chunks(col("t"), chunkSize = 64, stride = 48))
      .head().getSeq[String](0)
    assert(out.length == 3) // ceil((150-64)/48)+1
    assert(out.head.startsWith("w1 ") && out.head.split(" ").length == 64)
    assert(out.last.contains("w150")) // tail covered
    // short doc → one chunk of everything
    val short = Seq("a b c").toDF("t")
      .select(TextFunctions.chunks(col("t"), 64, 48)).head().getSeq[String](0)
    assert(short == Seq("a b c"))
  }

  test("punct and cjk counters") {
    assert(one[Int](TextFunctions.punctCount(col("t")), "a,b. c! (d)") == 5)
    assert(one[Int](TextFunctions.cjkCount(col("t")), "abc 中文 def") == 2)
  }

  test("redactPii scrubs emails, IPv4s, and long digit runs in order") {
    val planted = "mail bob.smith+x@corp.example.org from 10.0.42.7, " +
      "card 4111111111111111, year 2023 ok"
    val got = one[String](TextFunctions.redactPii(col("t")), planted)
    assert(got == "mail <EMAIL> from <IP>, card <NUM>, year 2023 ok")
    // order matters: the email's domain digits must not become <NUM>
    assert(!got.contains("@"))
    // short numbers survive (year untouched)
    assert(got.contains("2023"))
  }

  test("ipv4 redaction constrains octets to 0-255") {
    // impossible octets are not an IP — left intact
    assert(one[String](TextFunctions.redactPii(col("t")),
      "v 999.999.999.999 x") == "v 999.999.999.999 x")
    // boundary values redact
    assert(one[String](TextFunctions.redactPii(col("t")),
      "a 255.0.199.249 b") == "a <IP> b")
    // documented residual looseness: the first four octets of a longer
    // dotted run still redact (no lookahead in the RE2-safe subset)
    assert(one[String](TextFunctions.redactPii(col("t")),
      "ver 1.2.3.4.5 z") == "ver <IP>.5 z")
    // zero-padded log forms are still real IPs — must redact
    assert(one[String](TextFunctions.redactPii(col("t")),
      "src 192.168.001.001 dst 010.2.3.4 e") == "src <IP> dst <IP> e")
    // but padding can't smuggle an impossible octet past the 0-255 bound
    assert(one[String](TextFunctions.redactPii(col("t")),
      "w 00256.1.1.1 x") == "w 00256.1.1.1 x")
  }

  test("contentChunks: partition law, boundary law, shift resistance") {
    val d = Tables.documents(spark, sf).limit(20)
      .where(col("text").isNotNull).cache()
    val out = TextFunctions.contentChunks(d, "doc_id", "text", 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getLong(4)))
    // chunks PARTITION each doc's tokens: counts sum to the token
    // count, start positions are the running sums of chunk lengths
    val tokCounts = d.select(col("doc_id"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._3).sum == tokCounts(id))
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      var at = 0L
      sorted.foreach { c => assert(c._4 == at); at += c._3 }
    }
    // boundary law: every chunk except a doc's last ENDS on a token
    // whose pmod-16 hash is 0, and contains no earlier boundary token
    val hs = d.select(col("doc_id"),
        posexplode(TextFunctions.tokens(col("text")))
          .as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"),
        pmod(graft.functions.exprs.token_hash64(col("tok")), lit(16L))
          .as("m"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    out.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      sorted.dropRight(1).foreach { c =>
        val last = c._4 + c._3.toInt - 1
        assert(hs((id, last)) == 0L, s"chunk $c does not end on a boundary")
        (c._4 until last).foreach(p =>
          assert(hs((id, p.toInt)) != 0L, s"early boundary inside $c"))
      }
    }
    // SHIFT RESISTANCE: appending text changes ONLY each doc's last
    // chunk — every earlier chunk row survives identically (the CDC
    // property; a fixed-width chunker would reshuffle nothing here,
    // but an INSERT shifts all its downstream windows; for CDC it
    // cannot reach past the next boundary)
    val edited = d.withColumn("text",
      concat(col("text"), lit(" zz appended tail qq")))
    val after = TextFunctions.contentChunks(edited, "doc_id", "text", 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getLong(4))).toSet
    out.groupBy(_._1).foreach { case (_, cs) =>
      cs.sortBy(_._2).dropRight(1).foreach(c =>
        assert(after.contains(c), s"pre-edit chunk $c vanished"))
    }
  }
}
