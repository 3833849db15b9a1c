package graft

import org.apache.spark.sql.functions._
import graft.dedup.FuzzyJoin

/** dedup.FuzzyJoin: exact edit-distance self-join via PassJoin segment
  * blocking. Exactness (recall 1.0) is structural — proven here against
  * a brute-force all-pairs join on the real documents table. */
class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def prefixes = Tables.documents(spark, sf)
    .select($"doc_id", substring($"text", 1, 48).as("p"))

  private def brute(maxDist: Int) = {
    val a = prefixes.select($"doc_id".as("id_a"), $"p".as("sa"))
    val b = prefixes.select($"doc_id".as("id_b"), $"p".as("sb"))
    a.join(b, $"id_a" < $"id_b" &&
        abs(length($"sa") - length($"sb")) <= maxDist)
      .withColumn("dist", levenshtein($"sa", $"sb", maxDist))
      .filter($"dist" >= 0 && $"dist" <= maxDist)
      .select($"id_a", $"id_b", $"dist")
  }

  test("matches brute force exactly on real document prefixes (d=2)") {
    val got = FuzzyJoin.editDistancePairs(prefixes, "doc_id", "p", maxDist = 2)
    val want = brute(2)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(want.count() > 0) // the corpus really has planted near-dups
  }

  test("hand-built edits at every segment position are found (d=1)") {
    val df = Seq(
      (1L, "abcdefghij"),          // base
      (2L, "Xbcdefghij"),          // sub in segment 0
      (3L, "abcdeXfghij"),         // insert mid
      (4L, "abcdefghi"),           // delete last
      (5L, "zzzzzzzzzz")           // unrelated
    ).toDF("id", "s")
    val pairs = FuzzyJoin.editDistancePairs(df, "id", "s", maxDist = 1)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (1L, 4L)))
  }

  test("degenerate short strings pair through the nano-branch") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "ab"), (4L, "xyxyxyxy"))
      .toDF("id", "s")
    val pairs = FuzzyJoin.editDistancePairs(df, "id", "s", maxDist = 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // 1-2 (both <= d), 1-3 / 2-3 (short vs segmented... "ab" len 2 <= d)
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L))
      && pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("null strings never pair") {
    val df = Seq((1L, "abcdef"), (2L, null.asInstanceOf[String]),
      (3L, "abcdef")).toDF("id", "s")
    val pairs = FuzzyJoin.editDistancePairs(df, "id", "s", maxDist = 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 3L)))
  }

  test("candidate join carries ids only (no quadratic string shuffle)") {
    val got = FuzzyJoin.editDistancePairs(prefixes, "doc_id", "p", maxDist = 2)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"unexpected cartesian product in:\n$plan")
  }
}
