package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import graft.plans.{BoundedLevenshtein, Rules}

/** plans.BoundedLevenshtein: the optimizer rule planning unbounded
  * `levenshtein(a,b) <cmp> t` predicates as the banded three-argument
  * form (q132 exercises it end to end). */
class BoundedLevenshteinSpec extends SparkTestBase {
  import spark.implicits._

  // parquet-backed pairs (a LocalRelation would be folded away by
  // ConvertToLocalRelation before any optimizer rule can be observed)
  private lazy val pairs: org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-lev").toString
    Seq(
      ("abc", "abc"),      // 0
      ("abc", "axc"),      // 1
      ("abc", "xyz"),      // 3
      ("abc", "abcdef"),   // 3 (length gap)
      (null, "abc"),       // null
      ("abc", null)        // null
    ).toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def levsIn(plan: LogicalPlan): Seq[Levenshtein] =
    plan.collect { case n => n.expressions }.flatten
      .flatMap(_.collect { case l: Levenshtein => l })

  test("upstream contract: 3-arg levenshtein is banded with -1 sentinel") {
    val r = Seq(("kitten", "sitting")).toDF("a", "b").select(
      levenshtein(col("a"), col("b")),
      levenshtein(col("a"), col("b"), 3),
      levenshtein(col("a"), col("b"), 2)).head()
    assert(r.getInt(0) == 3 && r.getInt(1) == 3 && r.getInt(2) == -1)
  }

  test("rule rewrites every comparison shape to the bounded plan") {
    Rules.ensureRegistered(spark)
    val shapes = Seq[org.apache.spark.sql.Column](
      levenshtein(col("a"), col("b")) <= 2,
      levenshtein(col("a"), col("b")) < 2,
      levenshtein(col("a"), col("b")) > 2,
      levenshtein(col("a"), col("b")) >= 2,
      lit(2) >= levenshtein(col("a"), col("b")),
      lit(2) <= levenshtein(col("a"), col("b")))
    shapes.foreach { cond =>
      val levs = levsIn(pairs.filter(cond).queryExecution.optimizedPlan)
      assert(levs.nonEmpty && levs.forall(_.threshold.isDefined),
        s"not rewritten: ${pairs.filter(cond).queryExecution.optimizedPlan}")
    }
  }

  test("rewritten filters keep exact (incl. null) semantics") {
    Rules.ensureRegistered(spark)
    def ids(c: org.apache.spark.sql.Column): Set[(String, String)] =
      pairs.filter(c).as[(String, String)].collect().toSet
    // nulls never pass any comparison, matching the unbounded form
    assert(ids(levenshtein(col("a"), col("b")) <= 1) ==
      Set(("abc", "abc"), ("abc", "axc")))
    assert(ids(levenshtein(col("a"), col("b")) < 1) == Set(("abc", "abc")))
    assert(ids(levenshtein(col("a"), col("b")) <= 0) == Set(("abc", "abc")))
    assert(ids(levenshtein(col("a"), col("b")) > 1) ==
      Set(("abc", "xyz"), ("abc", "abcdef")))
    assert(ids(levenshtein(col("a"), col("b")) >= 3) ==
      Set(("abc", "xyz"), ("abc", "abcdef")))
    // boundary exactly at the threshold stays included
    assert(ids(levenshtein(col("a"), col("b")) <= 3) ==
      Set(("abc", "abc"), ("abc", "axc"), ("abc", "xyz"), ("abc", "abcdef")))
  }

  test("duplicatePairs == filtered candidatePairs; plan is banded") {
    val docs = Tables.documents(spark, sf)
    val dup = graft.dedup.SortedNeighborhood
      .duplicatePairs(docs, "doc_id", "text", threshold = 40)
    val want = graft.dedup.SortedNeighborhood
      .candidatePairs(docs, "doc_id", "text", threshold = 40)
      .filter(col("is_dup")).select("a_id", "b_id", "lev")
    assert(dup.collect().toSet == want.collect().toSet)
    assert(dup.count() > 0)
    assert(levsIn(dup.queryExecution.optimizedPlan)
        .exists(_.threshold.isDefined),
      dup.queryExecution.optimizedPlan.toString.take(2000))
  }

  test("rule is idempotent and leaves bounded/derived forms alone") {
    val df = pairs.filter(levenshtein(col("a"), col("b"), 2) >= 0)
    val once = BoundedLevenshtein(df.queryExecution.analyzed)
    assert(BoundedLevenshtein(once) fastEquals once)
  }

  test("WsTokensSubstitution: the HOF tokenize plans as the kernel") {
    Rules.ensureRegistered(spark)
    graft.functions.GraftExtensions.register(spark)
    val docs = Tables.documents(spark, sf)
    docs.createOrReplaceTempView("ws_docs")
    // SQL spelling a user would write, both lambda operand orders
    val sql = spark.sql(
      """SELECT doc_id,
        |  size(filter(split(text, '\\s+'), t -> t != '')) AS n1,
        |  size(filter(split(text, '\\s+'), t -> '' != t)) AS n2
        |FROM ws_docs""".stripMargin)
    val subbed = sql.queryExecution.optimizedPlan
      .collect { case n => n.expressions }.flatten
      .flatMap(_.collect {
        case w: graft.functions.WhitespaceTokens => w })
    assert(subbed.size == 2, sql.queryExecution.optimizedPlan.toString)
    // and the values are exactly the kernel's (== the HOF semantics)
    val want = docs.select(col("doc_id"),
      size(graft.functions.exprs.ws_tokens(col("text"))).as("n1"),
      size(graft.functions.exprs.ws_tokens(col("text"))).as("n2"))
    assert(sql.collect().toSet == want.collect().toSet)
  }

  test("WsTokensSubstitution leaves other regexes and lambdas alone") {
    Rules.ensureRegistered(spark)
    val docs = Tables.documents(spark, sf)
    val other = docs.select(
      filter(split(col("text"), ","), t => t =!= "").as("a"),
      filter(split(col("text"), "\\s+"), t => length(t) > 1).as("b"))
    val subbed = other.queryExecution.optimizedPlan
      .collect { case n => n.expressions }.flatten
      .flatMap(_.collect {
        case w: graft.functions.WhitespaceTokens => w })
    assert(subbed.isEmpty)
  }
}
