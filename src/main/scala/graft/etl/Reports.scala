package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Exact

/** Platinum-layer report aggregation.
  *
  * The reference's report marts are one shape (reference:
  * src/NYC_Open_Data/assets/platinum.py:88-112,186-210): groupBy N keys,
  * then mean+sum per measure plus a row count. We keep the shape but
  * make every float output bit-deterministic (see [[graft.ops.Exact]]):
  * money measures aggregate an integral cents image, integral measures
  * sum exactly, and means are exact-sum / count — so results are
  * identical regardless of partitioning, which also makes the mart
  * reproducible across cluster sizes.
  *
  * One hash-aggregate, partial+final (map-side combine) — the single
  * shuffle is on the grouping keys, which is the minimum possible.
  */
object Reports {
  sealed trait MeasureKind
  case object Money    extends MeasureKind // 2-decimal double
  case object Integral extends MeasureKind // integer-valued double

  final case class Measure(name: String, expr: Column, kind: MeasureKind)

  /** avg_<m>, sum_<m> per measure + total_rows, grouped by `keys`. */
  def report(fact: DataFrame, keys: Seq[Column], measures: Seq[Measure]): DataFrame = {
    val aggs = measures.flatMap { m =>
      val (s, a) = m.kind match {
        case Money    => (Exact.sumMoney(m.expr), Exact.avgMoney(m.expr))
        case Integral => (Exact.sumIntegral(m.expr), Exact.avgIntegral(m.expr))
      }
      Seq(a.as(s"avg_${m.name}"), s.as(s"sum_${m.name}"))
    } :+ count(lit(1)).as("total_rows")
    fact.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Reference-fidelity report (platinum.py:88-112): round(mean, 3) /
    * round(sum, 3) per measure, named avg_<m> / total_<m>, row count as
    * `countName` (the reference's `total_trips`) — byte-compatible with
    * the legacy mart, including its rounding of inexact doubles. NOT
    * bit-deterministic across partitionings/engines (round() of an
    * inexact double sum); the oracle-gated marts use [[report]], this
    * mode exists so legacy consumers diff cleanly during migration. */
  def reportCompat(fact: DataFrame, keys: Seq[Column],
                   measures: Seq[(String, Column)],
                   countName: String = "total_trips"): DataFrame = {
    val aggs = measures.flatMap { case (name, e) =>
      Seq(round(avg(e), 3).as(s"avg_$name"),
        round(sum(e), 3).as(s"total_$name"))
    } :+ count(lit(1)).as(countName)
    fact.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Oracle-twin SQL SELECT list for the same measures (DuckDB). */
  def sqlAggs(measures: Seq[(String, String, MeasureKind)]): String =
    measures.flatMap { case (name, c, kind) =>
      val (s, a) = kind match {
        case Money    => (Exact.sql.sumMoney(c), Exact.sql.avgMoney(c))
        case Integral => (Exact.sql.sumIntegral(c), Exact.sql.avgIntegral(c))
      }
      Seq(s"$a AS avg_$name", s"$s AS sum_$name")
    }.mkString(", ") + ", count(*) AS total_rows"
}
