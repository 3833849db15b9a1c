package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample`/`sampleBy` draw per-row randoms seeded per PARTITION, so
  * the selected set changes with partitioning — a repartitioned rerun
  * of a 100 TB job samples different rows, which breaks reproducible
  * dataset builds. Hash sampling keys the decision on row identity:
  * the same row is always in or out, on any cluster layout, and
  * samples compose (a 1% sample is a subset of the 10% sample for the
  * same salt).
  */
object Sampling {
  private val Buckets = 1000000L

  private def bucket(id: Column, salt: Long): Column =
    pmod(xxhash64(id, lit(salt)), lit(Buckets))

  /** Keep ~`fraction` of rows, decided by hash of `idCol`. Rows with a
    * NULL id are always EXCLUDED (they would otherwise share one hash
    * bucket and flip in/out en masse with the salt — no per-row
    * identity, no stable decision). */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 salt: Long = 0L): DataFrame =
    df.filter(col(idCol).isNotNull &&
      bucket(col(idCol), salt) < (fraction * Buckets).toLong)

  /** Engine-portable deterministic sample: keep rows whose
    * `md5(cast(id as string))` is lexicographically below
    * `hexThreshold`. Same in/out decision in ANY engine with a
    * hex-md5 (DuckDB, Trino, Spark…) — the portable twin of
    * [[hashSample]] (xxhash64 seeds differ across engines). The
    * fraction is threshold/16ⁿ for an n-hex-digit threshold, e.g.
    * "19999999" ≈ 10%. Partition-independent, rerun-stable, and
    * samples nest (a lower threshold selects a subset). */
  def md5Sample(df: DataFrame, idCol: String, hexThreshold: String): DataFrame = {
    require(hexThreshold.nonEmpty && hexThreshold.forall(c =>
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
      s"hexThreshold must be lowercase hex, got '$hexThreshold' — md5 emits " +
        "lowercase, so an uppercase digit would silently select ~nothing")
    df.filter(col(idCol).isNotNull &&
      md5(col(idCol).cast("string")) < lit(hexThreshold))
  }

  /** Per-stratum fractions (e.g. language balancing): strata absent
    * from the map are dropped, making the kept set fully explicit. */
  def stratifiedHashSample(df: DataFrame, idCol: String, stratumCol: String,
                           fractions: Map[String, Double],
                           salt: Long = 0L): DataFrame = {
    val threshold = fractions.foldLeft(lit(-1L)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(col(idCol).isNotNull && bucket(col(idCol), salt) < threshold)
  }

  /** Engine-portable WEIGHTED (importance) sample: keep each row with
    * its own probability `weight` ∈ [0, 1] — quality-score resampling,
    * perplexity-bucket rebalancing, upweighting rare domains. The
    * per-row uniform is the first 8 md5 hex digits of the id; the
    * per-row cut is `weight` rendered as an 8-digit lowercase-hex
    * threshold, so lexicographic compare == numeric compare and ANY
    * hex-md5 engine reproduces the exact kept set (the DuckDB oracle
    * does). Weights ≤ 0 drop the row; weights ≥ 1 BYPASS the hash
    * compare entirely, so "weight 1" is a genuine no-op filter — the
    * strict `< cut` against "ffffffff" alone would drop the one-in-
    * 2³² row whose md5 prefix is exactly "ffffffff". Out-of-range
    * weights clamp rather than throw. Deterministic,
    * partition-independent, and nested: lowering a row's weight can
    * only remove it, never swap it for another. */
  def weightedMd5Sample(df: DataFrame, idCol: String, weight: Column): DataFrame = {
    val w = least(greatest(weight.cast("double"), lit(0.0)), lit(1.0))
    // 16^8 = 4294967296, capped at 16^8−1 so weight-1 rows emit
    // "ffffffff", never a 9-digit string (lpad TRUNCATES overlength);
    // hex() uppercases in Spark, md5 is lowercase
    val cut = lpad(lower(hex(
      least(floor(w * lit(4294967296.0)).cast("long"), lit(4294967295L)))), 8, "0")
    df.filter(col(idCol).isNotNull &&
      (w >= lit(1.0) ||
        substring(md5(col(idCol).cast("string")), 1, 8) < cut))
  }

  /** Deterministic FIXED-SIZE sample per group: the `k` rows with the
    * smallest md5(id) in each group — "exactly k per class", the
    * balanced-dataset build primitive, where the fraction-based
    * samplers can't promise a count. The md5 rank is a uniform
    * permutation, so this is sampling without replacement; it is
    * engine-portable (same kept set anywhere with hex md5), nested
    * (k−1 keeps a subset of k), and partition-independent. Selection
    * runs through the k-bounded heap aggregate — map-side pruned, no
    * per-group window sort (the q38 trap at low group cardinality).
    * Returns (groupCols..., idCol); join back for payloads. */
  def groupedMd5Sample(df: DataFrame, idCol: String, groupCols: Seq[String],
                       k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val key = struct(md5(col(idCol).cast("string")).as("u"), col(idCol).as("i"))
    df.filter(col(idCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.aggs.top_k(key, k, asc = true).as("__s"))
      .select(groupCols.map(col) :+ explode(col("__s")).as("__x"): _*)
      .select(groupCols.map(col) :+ col("__x.i").as(idCol): _*)
  }

  /** Engine-portable stratified sample: per-stratum lowercase-hex md5
    * thresholds ([[md5Sample]] semantics per stratum — e.g. language
    * rebalancing a corpus with a decision any hex-md5 engine
    * reproduces). Strata absent from the map are dropped (md5 is never
    * < the empty string). */
  def stratifiedMd5Sample(df: DataFrame, idCol: String, stratumCol: String,
                          thresholds: Map[String, String]): DataFrame = {
    thresholds.values.foreach(t =>
      require(t.nonEmpty && t.forall(c =>
        (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
        s"thresholds must be lowercase hex, got '$t'"))
    val cut = thresholds.foldLeft(lit("")) { case (acc, (k, t)) =>
      when(col(stratumCol) === k, lit(t)).otherwise(acc)
    }
    df.filter(col(idCol).isNotNull &&
      md5(col(idCol).cast("string")) < cut)
  }
}
