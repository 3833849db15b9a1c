package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.{Curation, Dedup}
import graft.text.TextFunctions

/** Curation AT INGEST: the batch curation gates ([[Curation.curate]])
  * applied to a document stream, so a corpus is clean as it lands
  * instead of waiting for the next batch sweep. The narrow stages
  * (language, quality, PII) are stateless row filters/maps — they run
  * identically on a stream by construction. Exact dedup becomes
  * `dropDuplicatesWithinWatermark` keyed on the normalized-content
  * fingerprint: state is bounded by the lateness horizon (the batch
  * form's "whole-corpus seen-set" is unbounded on an infinite
  * stream — the watermark IS the retention policy, and re-ingests
  * beyond the horizon must be caught by the batch sweep). Near-dup
  * removal stays a batch concern: candidate generation is a corpus
  * self-join, which no bounded-state stream operator expresses.
  *
  * StreamingDocSpec proves stream ≡ batch on the overlapping stages:
  * the streamed kept-set equals [[Curation]]'s lang→quality→exact
  * prefix when every document arrives within the watermark. */
object DocStreams {
  /** Language + quality + fingerprint-dedup + redaction over a
    * document stream with event-time column `tsCol`. Emits the
    * surviving documents with `text` redacted.
    *
    * The dedup fingerprint is computed on the RAW text, matching the
    * batch chain ([[Curation.curate]] fingerprints before any
    * redaction): two documents differing only in their PII are NOT
    * duplicates, and redacting first would silently merge them.
    * Redaction runs after the dedup — on the survivors only, which is
    * also the cheaper order. On a batch frame the dedup delegates to
    * [[Dedup.exactDedup]] (lowest-`idCol` survivor, rerun-stable); a
    * stream keeps the first arrival per fingerprint instead — arrival
    * order IS the deterministic order a stream has. */
  def curateStream(docs: DataFrame, tsCol: String, watermark: String,
                   cfg: Curation.Config = Curation.Config(),
                   langCol: String = "lang",
                   textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val filtered = docs
      .withWatermark(tsCol, watermark)
      .filter(Curation.langOk(col(langCol), cfg) &&
        Curation.qualityOk(col(textCol), cfg))
    val deduped =
      if (docs.isStreaming)
        filtered
          .withColumn("__fp", TextFunctions.fingerprint(col(textCol)))
          .dropDuplicatesWithinWatermark("__fp")
          .drop("__fp")
      else Dedup.exactDedup(filtered, idCol, textCol)
    deduped.withColumn(textCol, TextFunctions.redactPii(col(textCol)))
  }

  /** Benchmark decontamination AT INGEST: drop any document carrying
    * one of the `phrases` VERBATIM — q112's gate
    * ([[graft.text.Retrieval.phraseDecontaminate]]) in the STATELESS
    * per-row form a stream needs. Against a FIXED literal phrase set
    * the positional-postings join is unnecessary: a phrase of m
    * tokens occurs verbatim iff the document's all-occurrence m-gram
    * array contains it (`array_contains(word_grams(tokens(text), m),
    * phrase)` — the codegen'd [[graft.functions.WordGrams]] kernel,
    * space-joined exactly like the driver-side normalization here),
    * so the gate is a row filter: no state, no watermark, identical
    * on stream and batch by construction (StreamingDocSpec pins
    * stream ≡ q112's kept set). Phrases tokenize with the corpus
    * rule (whitespace split); empty phrases are refused rather than
    * silently matching everything or nothing. */
  def decontaminateFilter(textCol: String,
                          phrases: Seq[String]): org.apache.spark.sql.Column = {
    require(phrases.nonEmpty, "decontaminateFilter: no phrases")
    val tk = TextFunctions.tokens(col(textCol))
    val hits = phrases.map { p =>
      val toks = p.trim.split("\\s+").filter(_.nonEmpty)
      require(toks.nonEmpty, s"decontaminateFilter: empty phrase '$p'")
      array_contains(
        graft.functions.exprs.word_grams(tk, toks.length),
        toks.mkString(" "))
    }
    !hits.reduce(_ || _)
  }

  /** [[decontaminateFilter]] applied: the surviving documents. */
  def decontaminateStream(docs: DataFrame, phrases: Seq[String],
                          textCol: String = "text"): DataFrame =
    docs.filter(decontaminateFilter(textCol, phrases))
}
