package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter record-linkage scoring — the probabilistic step
  * between candidate generation (blocking / sorted-neighborhood /
  * LSH) and a match decision. Each compared field contributes a
  * log-odds weight: +log(m/u) when it agrees (m = P(agree | match),
  * u = P(agree | non-match)), −log((1−m)/(1−u)) when it does not;
  * the pair's score is the sum and the decision is a threshold.
  *
  * Weights here are pinned INTEGER log-odds (scaled ×2, rounded) —
  * the caller derives them offline from labeled data or priors and
  * declares them as literals, so the score is exact long arithmetic
  * replayable by any engine, and a model update is a visible diff in
  * the field table, not a buried float.
  *
  * Scale: scoring is per-pair projection arithmetic over whatever
  * candidate frame the generator bounded — no joins, no shuffles of
  * its own; at 100 TB the cost lives entirely in candidate
  * generation, which is the bounded stage by construction
  * (sorted-neighborhood O(n·w), LSH bucket mass).
  */
object Linkage {
  /** One compared field: `agree` is any boolean Column over the pair
    * frame (equality, banded distance, numeric tolerance). A NULL
    * agreement (null attribute on either side) takes the DISAGREE
    * weight — the conservative reading: absent evidence is not
    * agreement. */
  final case class Field(name: String, agree: Column,
                         wAgree: Long, wDisagree: Long)

  /** Attach per-field `<name>_agree` flags, the summed `score`, and
    * the `is_match` verdict at `matchThreshold`. */
  def scorePairs(pairs: DataFrame, fields: Seq[Field],
                 matchThreshold: Long): DataFrame = {
    require(fields.nonEmpty, "at least one field")
    val flagged = fields.foldLeft(pairs) { (d, f) =>
      d.withColumn(s"${f.name}_agree", f.agree)
    }
    flagged
      .withColumn("score", fields.map { f =>
        when(col(s"${f.name}_agree"), lit(f.wAgree))
          .otherwise(lit(f.wDisagree))
      }.reduce(_ + _))
      .withColumn("is_match", col("score") >= matchThreshold)
  }
}
