package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.etl.Cleanse

/** etl.Cleanse: silver-layer operators (SURVEY.md §2.2, §2.9). */
class CleanseSpec extends SparkTestBase {
  import spark.implicits._

  test("dedup is idempotent and removes exact duplicate rows") {
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("k", "v")
    val once = Cleanse.dedup(df)
    assert(once.count() == 2)
    assert(Cleanse.dedup(once).count() == 2)
  }

  test("dedupByFingerprint matches dropDuplicates on null-bearing rows") {
    // xxhash64 skips null children, so without per-column null
    // indicators these distinct rows collide: the null "slides" between
    // columns without changing the bare-value hash sequence
    val df = Seq(
      (Option("a"), Option.empty[String]),
      (Option.empty[String], Option("a")),
      (Option.empty[String], Option("a")), // true duplicate of row 2
      (Option("a"), Option("a"))).toDF("x", "y")
    val got = Cleanse.dedupByFingerprint(df)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", null), (null, "a"), ("a", "a")))
    assert(Cleanse.dedupByFingerprint(df).count() == Cleanse.dedup(df).count())
  }

  test("unionConformed aligns by name regardless of column order (fixes R1)") {
    val a = Seq((1, "x")).toDF("k", "v")
    val b = Seq(("y", 2)).toDF("v", "k")
    val u = Cleanse.unionConformed(Seq(a, b)).collect().map(r => (r.getInt(0), r.getString(1)))
    assert(u.toSet == Set((1, "x"), (2, "y")))
  }

  test("requireNonNull drops rows with nulls only in the named columns") {
    val df = Seq((Some(1), Option.empty[Int]), (None, Some(2)), (Some(3), Some(4)))
      .toDF("a", "b")
    assert(Cleanse.requireNonNull(df, Seq("a")).count() == 2)
    assert(Cleanse.requireNonNull(df, Seq("a", "b")).count() == 1)
  }

  test("fillNumeric + fillStrings fill only nulls") {
    val df = Seq((Some(1.5), Some("x")), (None, None))
      .toDF("n", "s")
    val filled = Cleanse.fillStrings(Cleanse.fillNumeric(df, 0.0), Map("s" -> "unk"))
    assert(filled.collect().map(r => (r.getDouble(0), r.getString(1))).toSet ==
      Set((1.5, "x"), (0.0, "unk")))
  }

  test("castCols + derive produce expected schema and values") {
    val df = Seq((1.9, 2.0)).toDF("a", "b")
    val out = Cleanse.derive(
      Cleanse.castCols(df, Map("a" -> IntegerType)),
      "sum" -> (col("a") + col("b")))
    val r = out.head()
    assert(r.getInt(0) == 1 && r.getDouble(2) == 3.0) // cast truncates
  }

  test("durationSeconds yields seconds (reference defect R2 documented)") {
    val df = Seq(("2023-01-01 00:00:00", "2023-01-01 00:02:30")).toDF("s", "e")
      .select(to_timestamp(col("s")).as("s"), to_timestamp(col("e")).as("e"))
    assert(df.select(Cleanse.durationSeconds(col("s"), col("e"))).head().getLong(0) == 150L)
  }
}
