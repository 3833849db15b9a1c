package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling and expectation gating — the data-quality layer
  * every ETL run fronts with: first PROFILE what arrived (per-column
  * volumes, null rates, cardinalities), then ASSERT the contract
  * (ranges, non-null keys, uniqueness) and fail or quarantine on
  * violation. The ([[profile]], [[expect]]) pair is that layer as two
  * operators whose outputs are small enough to log, diff round-over-
  * round ([[Snapshot.driftReport]]'s tabular cousin), and alert on.
  */
object Profiler {
  /** Per-column profile: `(col_name, n, n_null, n_distinct)` — one row
    * per requested column, in request order (`ord` carries it).
    *
    * Scale shape: ONE aggregate over ONE scan. The exact
    * multi-column `count(DISTINCT ...)` plans through Spark's Expand
    * (each row fans to |cols| tagged rows before the partial
    * aggregate) — the standard exact plan, costing |cols|× the scan
    * in shuffled rows but distinct-exact, which the round-over-round
    * diff needs (a sketch's ±2% noise would read as drift). Corpora
    * where that multiplier hurts should profile column subsets per
    * pass; the operator takes any subset. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"__n_$c"),
        count(when(col(c).isNull, 1)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("ord"), lit(c).as("col_name"),
        col(s"__n_$c").as("n"), col(s"__nn_$c").as("n_null"),
        col(s"__nd_$c").as("n_distinct"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.ord").cast("int").as("ord"), col("r.col_name"),
        col("r.n"), col("r.n_null"), col("r.n_distinct"))
  }

  /** One declarative expectation over a table. `name` keys the report
    * row; `holds` is the per-row predicate a VIOLATION negates. */
  final case class Expectation(name: String, holds: Column)

  /** Expectation helpers — the common contract clauses. */
  object Expectation {
    def notNull(c: String): Expectation =
      Expectation(s"$c is not null", col(c).isNotNull)
    def between(c: String, lo: Double, hi: Double): Expectation =
      Expectation(s"$c in [$lo,$hi]", col(c).isNotNull &&
        col(c) >= lo && col(c) <= hi)
    def inSet(c: String, allowed: Seq[String]): Expectation =
      Expectation(s"$c in {${allowed.mkString(",")}}",
        col(c).isin(allowed.map(x => x: Any): _*))
    def matches(c: String, regex: String): Expectation =
      Expectation(s"$c matches $regex", col(c).rlike(regex))
  }

  /** Evaluate every expectation in ONE pass: `(ord, rule, n,
    * n_violations, passed)` per rule. Each rule is a conditional
    * count over the same scan — |rules| long counters per task, no
    * extra shuffle, no per-rule jobs. A null predicate result counts
    * as a violation (the conservative reading: an unevaluable
    * contract is a broken contract). */
  def expect(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "rules must be non-empty")
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map {
      case (r, i) =>
        count(when(!coalesce(r.holds, lit(false)), 1)).as(s"__v_$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(i).as("ord"), lit(r.name).as("rule"),
        col("__n").as("n"), col(s"__v_$i").as("n_violations"),
        (col(s"__v_$i") === 0L).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.ord").cast("int").as("ord"), col("r.rule"),
        col("r.n"), col("r.n_violations"), col("r.passed"))
  }

  /** Order-independent table DIGEST — the freeze audit: one row of
    * (n_rows, xor_digest, sum_digest) that changes if any row of the
    * frozen dataset changes, regardless of partitioning, file layout,
    * or row order. Per-row code = the md5 of the canonical column
    * string (columns joined on U+0001, nulls encoded as U+0002 —
    * control characters that cannot appear in corpus text) truncated to 60
    * bits; the two digests are complementary: XOR is blind to an even
    * number of identical rows, the mod-p sum is blind to nothing a
    * prime modulus can't express, and together with the count a
    * collision needs to fool all three. Engine-portable (hex md5 +
    * integer arithmetic) and one map-combinable aggregate — the digest
    * of a 100 TB freeze costs one scan and moves three longs. */
  def tableDigest(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableDigest needs at least one column")
    val rowStr = concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)
    val code = conv(substring(md5(rowStr), 1, 15), 16, 10).cast("long")
    df.select(code.as("__c"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__c)").as("xor_digest"),
        sum(pmod(col("__c"), lit(2147483647L))).as("sum_digest"))
  }

  /** log10(1+1/d)·10⁶ for d = 1..9 — rounds to per-million units that
    * sum to EXACTLY 1 000 000, so deviations are comparable across
    * digits with no residual. */
  private val benfordFp =
    Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L,
      51153L, 45757L)

  /** Benford first-digit audit of a positive integer measure — the
    * classic fabricated-or-corrupted-feed screen (Benford 1938;
    * Nigrini's forensic use): natural multi-magnitude quantities
    * (prices, populations, file sizes) put ~30.1% of first digits at
    * 1, and a generator that draws uniformly (or a pipeline bug that
    * truncates a field) shows up as a flat digit histogram long
    * before any row-level check fires.
    *
    * `intCol` must be an integral image of the measure (e.g.
    * [[Exact.cents]] of a money column) — the first digit is taken
    * from the DECIMAL STRING of the value, which both engines format
    * identically for BIGINT (no float log10 whose boundary rounding
    * at exact powers of ten could disagree). Non-positive values are
    * excluded (Benford is undefined there); all nine digits are
    * emitted even at zero count. Output per digit:
    * (digit, n, expected_fp, observed_fp = n·10⁶ div total, dev_fp)
    * — all integer; consumers alarm on max(dev_fp) or a chi-square
    * over `n`. One scan, a 9-row aggregate, a broadcast total. */
  def benford(df: DataFrame, intCol: Column): DataFrame = {
    val digits = df.select(intCol.cast("long").as("__v"))
      .filter(col("__v") > 0)
      .select(substring(col("__v").cast("string"), 1, 1)
        .cast("int").as("digit"))
    val counts = digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = broadcast(counts.agg(sum(col("n")).as("total")))
    val all = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    all.join(counts, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"))
      .crossJoin(total)
      .select(col("digit"), col("n"),
        element_at(array(benfordFp.map(lit): _*), col("digit"))
          .as("expected_fp"),
        when(col("total") > 0, expr("(n * 1000000) DIV total"))
          .otherwise(lit(null)).as("observed_fp"))
      .withColumn("dev_fp", abs(col("observed_fp") - col("expected_fp")))
  }
}
