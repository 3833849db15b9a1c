package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic bootstrap — sampling-with-replacement uncertainty
  * for corpus statistics, with every random draw replayable by any
  * engine. "Mean document length per source" is a point estimate;
  * a curation decision ("did the new filter MOVE the mean?") needs
  * its sampling distribution. The Poisson bootstrap (Chamandy et al.,
  * Google, 2012) makes that distributed-friendly: instead of
  * resampling n rows (which needs global coordination), each row
  * enters replicate b with weight w ~ Poisson(1) — independent per
  * (row, replicate), so the whole thing is one explode + one
  * group-by, map-side combinable, no shuffle beyond the aggregate.
  *
  * Determinism: w comes from the seeded-md5 uniform (the q87
  * discipline — `md5(salt:b:id)` hex prefix as a 2^28-scale integer)
  * inverted through PINNED cumulative Poisson(1) thresholds, and the
  * replicate mean is an exact integer fraction emitted as a
  * `(1e6·Σwx) div Σw` fixed-point code. Two engines, or two runs at
  * different parallelism, produce byte-identical replicates.
  */
object Bootstrap {
  /** floor(2^28 · P(Poisson(1) ≤ k)) for k = 0..5; u below
    * `thresholds(k)` means weight ≤ k. Weights cap at 6
    * (P(w > 6) ≈ 6·10⁻⁴ — beyond the fixture's resolution). */
  private[graft] val thresholds: Seq[Long] =
    Seq(98751885L, 197503771L, 246879713L, 263338361L, 267453023L,
      268275955L)

  /** Poisson(1) weight from a uniform integer in [0, 2^28). */
  def poissonWeight(u: Column): Column =
    thresholds.zipWithIndex.foldRight(lit(6): Column) {
      case ((t, k), acc) => when(u < t, lit(k)).otherwise(acc)
    }

  /** The same inverse-CDF as ANSI SQL (the oracle twin — one
    * threshold table for both engines). */
  def weightCaseSql(u: String): String =
    thresholds.zipWithIndex.map { case (t, k) =>
      s"WHEN $u < $t THEN $k"
    }.mkString("CASE ", " ", " ELSE 6 END")

  /** Per-(key, replicate) bootstrap means of an integral value:
    * `reps` Poisson replicates per row, exact `n_eff = Σw` and
    * `sum_wx = Σ w·x`, and the fixed-point `mean_code =
    * (1e6·sum_wx) div n_eff` (NULL when a replicate drew the key
    * empty). Downstream, the per-key spread of `mean_code` across
    * replicates IS the confidence interval. */
  def replicateMeans(df: DataFrame, keyCol: String, idCol: String,
                     valueCol: String, reps: Int,
                     salt: String): DataFrame = {
    require(reps >= 1, s"reps must be >= 1, got $reps")
    // working columns use the repo's double-underscore convention: a
    // bare withColumn("b", ...) would silently REPLACE an input column
    // named b — and worse, corrupt the seeded uniform when keyCol or
    // valueCol is itself "b"/"w" (the q185/ZOrder collision rule)
    require(!Set("__b", "__w").contains(keyCol) &&
      !Set("__b", "__w").contains(idCol) &&
      !Set("__b", "__w").contains(valueCol),
      "replicateMeans: __b/__w are reserved working column names")
    require(keyCol != "b",
      "replicateMeans: keyCol \"b\" collides with the output replicate-id column")
    val u = conv(substring(md5(concat(lit(s"$salt:"),
      col("__b").cast("string"), lit(":"),
      col(idCol).cast("string"))), 1, 7), 16, 10).cast("long")
    df.select(col(keyCol), col(idCol), col(valueCol))
      .withColumn("__b", explode(sequence(lit(0), lit(reps - 1))))
      .withColumn("__w", poissonWeight(u).cast("long"))
      .groupBy(col(keyCol), col("__b").as("b"))
      .agg(sum("__w").as("n_eff"),
        sum(col("__w") * col(valueCol)).as("sum_wx"))
      .withColumn("mean_code",
        expr("CASE WHEN n_eff = 0 THEN NULL " +
          "ELSE (1000000 * sum_wx) div n_eff END"))
  }
}
