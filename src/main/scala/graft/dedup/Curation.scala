package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** End-to-end corpus curation: the composition a training-data
  * pipeline actually runs — language filter → quality gate → exact
  * dedup → near-dup removal — with per-stage drop accounting so
  * nothing is silently truncated.
  *
  * Stage order matters at scale: cheap narrow filters (language,
  * quality — pure per-row expressions) run first and shrink the corpus
  * before the shuffling stages (exact dedup groupBy, MinHash-LSH).
  * Near-dup removal keeps the minimum id of each pair's connected
  * component approximated by one union-find round (min over direct
  * neighbors) — exact transitive closure needs iteration, which
  * callers can add by re-running `dropNearDups` to a fixed point.
  */
object Curation {
  final case class Config(
      langs: Set[String] = Set("en"),
      minTokens: Int = 5,
      maxTokens: Int = 100000,
      minStopRatio: Double = 0.0,
      shingleK: Int = 3,
      minJaccard: Double = 0.8,
      // recall knobs: more bands with fewer rows each → higher recall
      // at the cost of more candidate pairs (b bands of r rows catch a
      // jaccard-j pair with prob 1-(1-j^r)^b)
      nHashes: Int = 16,
      bands: Int = 8)

  /** Per-row quality predicate (no shuffle). */
  def qualityOk(text: Column, cfg: Config): Column = {
    val n = TextFunctions.tokenCount(text)
    n.between(cfg.minTokens, cfg.maxTokens) &&
      (lit(cfg.minStopRatio) <= lit(0.0) ||
        TextFunctions.hitCount(text, TextFunctions.stopEn) / n >= cfg.minStopRatio)
  }

  /** Remove the higher-id side of each near-dup pair. */
  def dropNearDups(docs: DataFrame, idCol: String, textCol: String,
                   cfg: Config): DataFrame = {
    val losers = Dedup.minhashPairs(docs, idCol, textCol,
        shingleK = cfg.shingleK, nHashes = cfg.nHashes, bands = cfg.bands,
        minJaccard = cfg.minJaccard)
      .select(col("id_b").as(idCol)).distinct()
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Full chain; returns the kept rows plus a one-row accounting frame
    * (input / after each stage) so drops are observable. The shuffle
    * outputs (exact, near) are persisted so the per-stage counts don't
    * recompute the chain stage-by-stage; the returned frame stays
    * cached — callers unpersist when done. */
  def curate(docs: DataFrame, idCol: String, textCol: String, langCol: String,
             cfg: Config = Config()): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n0 = docs.count()
    val langFiltered =
      if (cfg.langs.isEmpty) docs
      else docs.filter(col(langCol).isin(cfg.langs.toSeq: _*))
    val n1 = langFiltered.count()
    val quality = langFiltered.filter(qualityOk(col(textCol), cfg))
    val n2 = quality.count()
    val exact = Dedup.exactDedup(quality, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n3 = exact.count()
    val near = dropNearDups(exact, idCol, textCol, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n4 = near.count()
    exact.unpersist()
    val report = Seq((n0, n1, n2, n3, n4))
      .toDF("input", "after_lang", "after_quality", "after_exact_dedup",
        "after_near_dedup")
    (near, report)
  }
}
