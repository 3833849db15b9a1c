package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe dataset splitting for training pipelines.
  *
  * A naive per-document train/val/test split leaks evaluation data
  * whenever two near-duplicate documents land on opposite sides of
  * the cut — the model "memorizes" the eval set through its training
  * twin. The fix is to split by duplicate GROUP: every document in
  * the same near-dup component gets the same assignment, so a
  * duplicate family is entirely train or entirely held out.
  *
  * The assignment is the engine-portable md5 uniform from
  * [[Sampling]]: the first 8 hex digits of `md5(group)` compared
  * against cumulative-fraction cut points rendered as 8-digit hex
  * literals ([[Splits.hexCut]]), so lexicographic compare equals
  * numeric compare and any hex-md5 engine (the DuckDB oracle
  * included) reproduces the exact assignment. Deterministic,
  * partition-independent, rerun-stable, and independent of cluster
  * SIZE — a 10 000-copy spam family is one coin flip, not 10 000.
  *
  * Scale shape: the group frame is the connected-components output —
  * KBs per million documents (only clustered docs appear in it) — so
  * the join is AQE-broadcast at any realistic dup rate, and the
  * split itself is a narrow per-row map. No shuffle beyond the one
  * the left join may need when the component frame outgrows the
  * broadcast threshold.
  */
object Splits {
  /** `frac` ∈ [0, 1] rendered as the 8-hex-digit cut the md5-prefix
    * compare uses: `lpad(hex(floor(frac·16⁸)), 8, '0')`, capped at
    * "ffffffff". ONE definition shared by the Spark operator and the
    * oracle-SQL builder so the literals cannot drift. */
  def hexCut(frac: Double): String = {
    val n = math.min(math.floor(frac * 4294967296.0).toLong, 4294967295L)
    f"$n%08x"
  }

  /** Assign every row of `docs` to a named split, keyed on its
    * duplicate group. `groups` maps a subset of ids to their group
    * representative (connected-components shape: only clustered docs
    * appear); unclustered docs are their own singleton group. Output:
    * every input row with `grp` (the group key) and `split` columns
    * appended.
    *
    * `splits` are (name, fraction) in declaration order; fractions
    * must sum to 1 (±1e-9). The LAST split takes the residual hex
    * range, so the one-in-2³² "ffffffff" md5 prefix is still
    * assigned — no row is ever dropped. */
  def leakageSafeSplit(docs: DataFrame, idCol: String,
                       groups: DataFrame, groupIdCol: String,
                       groupCol: String,
                       splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 > 0), s"fractions must be positive: $splits")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"fractions must sum to 1, got $total — a shortfall would " +
        "silently funnel the residual hex range into the last split")
    val g = groups.select(col(groupIdCol).as("__gid"),
      col(groupCol).as("__grp"))
    // grp is canonically a STRING: group keys may be numeric
    // (components) or textual (domains), and coalescing mixed types
    // would otherwise coerce the textual arm to the id's numeric type
    // and throw at runtime. The md5 assignment already hashes the
    // string form, so the cast changes no assignment.
    val keyed = docs.join(g, docs(idCol) === col("__gid"), "left")
      .withColumn("grp",
        coalesce(col("__grp").cast("string"), col(idCol).cast("string")))
      .drop("__gid", "__grp")
    val u = substring(md5(col("grp")), 1, 8)
    val cuts = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    // build the CASE low-to-high so each WHEN tests the cumulative cut
    val split = splits.init.zip(cuts.init).reverse.foldLeft(
      lit(splits.last._1): Column) { case (els, ((name, _), cum)) =>
      when(u < lit(hexCut(cum)), lit(name)).otherwise(els)
    }
    keyed.withColumn("split", split)
  }

  /** DuckDB-SQL twins of the split assignment, for oracle queries. */
  object sql {
    /** The CASE expression assigning `grpExpr`'s md5 prefix to a
      * split name — same cut literals as the Spark operator via
      * [[hexCut]]. */
    def splitCase(grpExpr: String, splits: Seq[(String, Double)]): String = {
      val cuts = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      val whens = splits.init.zip(cuts.init).map { case ((name, _), cum) =>
        s"WHEN substr(md5(CAST($grpExpr AS VARCHAR)),1,8) < " +
          s"'${hexCut(cum)}' THEN '$name'"
      }.mkString(" ")
      s"CASE $whens ELSE '${splits.last._1}' END"
    }
  }
}
