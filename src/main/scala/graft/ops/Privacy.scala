package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity enforcement over quasi-identifier columns (Sweeney
  * 2002, public methodology): a row is re-identifiable when its
  * combination of quasi-identifiers (language, source domain, region,
  * …) is shared by fewer than k rows — the release-gating check run
  * on training corpora before metadata columns ship alongside text.
  * Enforcement here is full-tuple SUPPRESSION (every quasi column of
  * a rare combination masks to `"*"`), the conservative baseline the
  * generalization-hierarchy variants relax.
  *
  * Scale shape: one aggregate over the quasi columns (combo counts —
  * map-side combinable), one equi-join back (the combo frame is
  * bounded by the quasi domain product; AQE broadcasts it when small,
  * hash-joins when a high-cardinality quasi column makes it big), and
  * a projection. Null-safe on the quasi keys: a null quasi value is a
  * combination like any other (dropping such rows from the join would
  * silently EXEMPT them from the k check — the unsafe direction). */
object Privacy {
  /** (idCol, quasiCols… as strings — `"*"` where suppressed, combo_n,
    * suppressed) for every input row. `k` is the minimum combination
    * count that may ship unmasked. */
  def kAnonymize(df: DataFrame, idCol: String, quasiCols: Seq[String],
                 k: Long): DataFrame = {
    require(k >= 1, s"k-anonymity needs k >= 1: $k")
    require(quasiCols.nonEmpty, "kAnonymize needs quasi-identifier columns")
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("combo_n"))
      .select(quasiCols.map(c => col(c).as(s"__q_$c")) :+ col("combo_n"): _*)
    val on = quasiCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _)
    val sup = col("combo_n") < k
    df.select((idCol +: quasiCols).map(col): _*)
      .join(counts, on)
      .select(col(idCol) +:
        quasiCols.map(c =>
          when(sup, lit("*")).otherwise(col(c).cast("string")).as(c)) :+
        col("combo_n") :+ sup.as("suppressed"): _*)
  }
}
