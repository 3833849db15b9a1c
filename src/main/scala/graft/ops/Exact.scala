package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-deterministic numeric aggregation helpers.
  *
  * Raw `sum(double)` is order-dependent (parallel partial aggregation
  * reorders the fold), so its low bits differ run-to-run and engine-to-
  * engine — fatal for hash-compared correctness gates and irreproducible
  * at 1000-executor scale. Money columns in both the reference
  * (FLOAT money, Databases/create_datamart.sql:176-182) and the driver
  * testdata are 2-decimal, so we aggregate an integral "cents" image of
  * the column: sums of integer-valued doubles are EXACT in IEEE binary64
  * (until 2^53), hence order-independent and identical across engines.
  *
  * `round(x*100)` never actually hits a .5 tie: a 2-decimal value has no
  * exact binary representation, so its double image times 100 is never
  * exactly half-way — Spark's HALF_UP and DuckDB's half-away-from-zero
  * agree on every real input.
  */
object Exact {
  /** Integral cents image of a 2-decimal double column (LONG; codegen'd
    * custom expression — see [[graft.functions.Cents]] for the tie
    * analysis proving parity with both engines' round conventions). */
  def cents(c: Column): Column = graft.functions.exprs.cents(c)

  /** Order-independent exact sum of a 2-decimal money column. */
  def sumMoney(c: Column): Column = sum(cents(c)) / lit(100.0)

  /** Deterministic mean of a money column: exact sum, then one division.
    * (Built-in `avg` accumulates doubles in arbitrary order — avoided.) */
  def avgMoney(c: Column): Column = sumMoney(c) / count(lit(1))

  /** Exact sum for an integer-valued double column (e.g. quantities). */
  def sumIntegral(c: Column): Column = sum(c)

  /** Deterministic mean for an integer-valued double column. */
  def avgIntegral(c: Column): Column = sum(c) / count(lit(1))

  /** SQL fragments mirroring the above, for DuckDB oracle strings.
    * Kept adjacent to the Spark forms so the two can never drift. */
  object sql {
    def sumMoney(c: String): String    = s"sum(round(($c)*100))/100.0"
    def avgMoney(c: String): String    = s"(sum(round(($c)*100))/100.0)/count(*)"
    def sumIntegral(c: String): String = s"sum($c)"
    def avgIntegral(c: String): String = s"sum($c)/count(*)"
  }
}
