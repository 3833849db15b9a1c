package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The modern pretraining filter stack, composed end to end — the
  * gate sequence current public curation recipes share (Gopher /
  * CCNet / DCLM-shaped): structural repetition, perplexity band,
  * learned quality classifier, exact dedup. Each gate is an operator
  * this library already oracle-gates on its own (q100, q101, q93,
  * q14/q15); this composition emits every document with its
  * PER-GATE verdict plus the conjunction — the funnel-accounting
  * shape (which gate kills what) a curation run actually needs, not
  * just the survivor set.
  *
  * Scale: the gates are independent doc-keyed frames (each with its
  * own operator's scale shape) joined back on the id — no gate ever
  * sees another's intermediate state, so the stack parallelizes as
  * its widest member and the final join is id-keyed. Exact-dedup
  * keeper selection is min-id per 128-bit fingerprint — one
  * fingerprint-keyed aggregate, the q15 discipline.
  */
object FilterStack {

  /** (idCol, rep_pass, ppl_pass, clf_pass, uniq_pass, kept) for EVERY
    * input document, flags 0/1, kept = the conjunction. */
  def modernGates(docs: DataFrame, idCol: String, textCol: String,
                  pplLo: Double, pplHi: Double): DataFrame = {
    val ids = docs.select(col(idCol))
    // 1. Gopher structural-repetition gate: survivors of the pinned
    // thresholds (q100's operator, survivor frame -> flag by join)
    val rep = Repetition.gopherFilter(docs, idCol, textCol)
      .select(col(idCol), lit(1).as("rep_pass"))
    // 2. CCNet keep-the-middle perplexity band (q101's operator)
    val ppl = UnigramLm.perplexityBand(docs, idCol, textCol, pplLo, pplHi)
      .select(col(idCol), col("kept").as("ppl_pass"))
    // 3. hashed-linear classifier gate (q93's operator: exact-long
    // score, keep iff positive); null-text docs never reach the
    // kernel and fail the gate explicitly
    val clf = docs.where(col(textCol).isNotNull)
      .select(col(idCol),
        (graft.functions.exprs.classifier_score(
          TextFunctions.tokens(col(textCol))) > 0L).cast("int")
          .as("clf_pass"))
    // 4. exact-dedup keeper: min-id carrier of the normalized
    // fingerprint survives, every other copy fails the gate
    val fp = docs.select(col(idCol),
      TextFunctions.fingerprint(col(textCol)).as("__fp"))
    val uniq = fp.join(
        fp.groupBy(col("__fp")).agg(min(col(idCol)).as("__keeper")),
        Seq("__fp"))
      .select(col(idCol),
        (col(idCol) === col("__keeper")).cast("int").as("uniq_pass"))
    def flag(c: String): Column = coalesce(col(c), lit(0))
    ids
      .join(rep, Seq(idCol), "left")
      .join(ppl, Seq(idCol), "left")
      .join(clf, Seq(idCol), "left")
      .join(uniq, Seq(idCol), "left")
      .select(col(idCol),
        flag("rep_pass").as("rep_pass"),
        flag("ppl_pass").as("ppl_pass"),
        flag("clf_pass").as("clf_pass"),
        flag("uniq_pass").as("uniq_pass"))
      .withColumn("kept",
        (col("rep_pass") === 1 && col("ppl_pass") === 1 &&
          col("clf_pass") === 1 && col("uniq_pass") === 1).cast("int"))
  }

  /** Cross-source quality-score calibration: the classifier score is
    * only comparable WITHIN a source (each source has its own score
    * distribution — a web crawl's median differs from an academic
    * dump's), so a single global threshold over- or under-prunes
    * every source. The standard fix is rank calibration: convert each
    * score to its percentile WITHIN its source, then threshold / mix
    * on percentiles — "keep every source's best 40%" instead of "keep
    * score > c". Output: (idCol, srcCol, score, pct) with `pct` the
    * per-source percent_rank of `(score, id)` — exact ranks from the
    * parallel two-phase form ([[graft.ops.Quantiles]], never one
    * reducer per source), one IEEE division per row at the end. */
  def calibratedScores(docs: DataFrame, idCol: String, textCol: String,
                       srcCol: String): DataFrame = {
    val scored = docs.where(col(textCol).isNotNull)
      .select(col(idCol), col(srcCol),
        graft.functions.exprs.classifier_score(
          TextFunctions.tokens(col(textCol))).as("score"))
    graft.ops.Quantiles.distribution(scored, segCol = srcCol,
        valCol = "score", tieCol = idCol)
      .select(col(idCol), col(srcCol), col("score"),
        col("balance_pct_rank").as("pct"))
  }
}
