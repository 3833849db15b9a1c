package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generated calendar dimension.
  *
  * Replaces the reference's MySQL stored-procedure date dimension
  * (reference: Databases/create_datamart.sql:43-91) with a
  * deterministically generated DataFrame: `spark.range` over day
  * ordinals → date functions. Notes on semantics preserved from the
  * reference:
  *  - `weekOfYear` is ISO (MySQL WEEKOFYEAR mode 3 == Spark weekofyear);
  *  - `quarter` is the string "Qn" (create_datamart.sql:66-74);
  *  - `isWeekend` is the reference's (mis-named) `Weekday` flag: 1 on
  *    Sat/Sun (MySQL WEEKDAY in {5,6}, create_datamart.sql:53-57);
  *  - `dateID` is the 1-based day ordinal from `start`, replacing the
  *    MySQL AUTO_INCREMENT key (create_datamart.sql:16) so the dimension
  *    is reproducible without a database.
  *
  * Tiny by construction (365 rows/year) — always broadcast it into joins.
  */
object DateDim {
  /** Calendar rows for [start, end] inclusive, ISO dates "yyyy-MM-dd". */
  def build(spark: SparkSession, start: String, end: String): DataFrame = {
    val startDay = java.time.LocalDate.parse(start)
    val nDays = java.time.temporal.ChronoUnit.DAYS
      .between(startDay, java.time.LocalDate.parse(end)).toInt + 1
    spark.range(0, nDays, 1, 1)
      .select(
        (col("id") + 1).as("dateID"),
        date_add(lit(java.sql.Date.valueOf(start)), col("id").cast("int")).as("date"))
      .withColumn("day", dayofmonth(col("date")))
      .withColumn("month", month(col("date")))
      .withColumn("year", year(col("date")))
      .withColumn("quarter", concat(lit("Q"), quarter(col("date"))))
      .withColumn("weekOfYear", weekofyear(col("date")))
      .withColumn("dayName", date_format(col("date"), "EEEE"))
      .withColumn("isWeekend",
        when(dayofweek(col("date")).isin(1, 7), 1).otherwise(0))
  }

  /** DuckDB SQL producing the identical dimension (oracle twin).
    * INTEGER casts pin the narrow types Spark's date functions emit. */
  def sql(start: String, end: String): String =
    s"""SELECT datediff('day', DATE '$start', d) + 1 AS dateID,
       |  CAST(d AS DATE) AS date,
       |  CAST(dayofmonth(d) AS INTEGER) AS day,
       |  CAST(month(d) AS INTEGER) AS month,
       |  CAST(year(d) AS INTEGER) AS year,
       |  'Q' || CAST(quarter(d) AS INTEGER) AS quarter,
       |  CAST(weekofyear(d) AS INTEGER) AS weekOfYear,
       |  dayname(d) AS dayName,
       |  CASE WHEN isodow(d) IN (6,7) THEN 1 ELSE 0 END AS isWeekend
       |FROM (SELECT unnest(generate_series(DATE '$start', DATE '$end',
       |  INTERVAL 1 DAY)) AS d)""".stripMargin
}
