package graft

import org.apache.spark.sql.functions._
import graft.etl.DateDim

/** etl.DateDim: calendar semantics pinned to the reference's MySQL
  * procedure (ISO weeks, weekend flag, Qn quarter — SURVEY.md §2.9 F9). */
class DateDimSpec extends SparkTestBase {

  lazy val dim2023 = DateDim.build(spark, "2023-01-01", "2023-12-31").cache()

  private def rowFor(d: String) =
    dim2023.filter(col("date") === lit(java.sql.Date.valueOf(d))).head()

  test("365 rows, contiguous 1-based dateID") {
    assert(dim2023.count() == 365)
    val ids = dim2023.orderBy("dateID").select("dateID").collect().map(_.getLong(0))
    assert(ids.head == 1L && ids.last == 365L)
  }

  test("2023-01-01 is ISO week 52 (of 2022) and a weekend") {
    val r = rowFor("2023-01-01")
    assert(r.getAs[Int]("weekOfYear") == 52)
    assert(r.getAs[Int]("isWeekend") == 1)
    assert(r.getAs[String]("dayName") == "Sunday")
  }

  test("quarter renders as Qn string") {
    assert(rowFor("2023-05-15").getAs[String]("quarter") == "Q2")
    assert(rowFor("2023-10-01").getAs[String]("quarter") == "Q4")
  }

  test("weekday is not flagged weekend") {
    val r = rowFor("2023-01-04") // Wednesday
    assert(r.getAs[Int]("isWeekend") == 0)
    assert(r.getAs[String]("dayName") == "Wednesday")
  }
}
