package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style LINE-level quality filtering (the published construction
  * of the C4 corpus, Raffel et al. 2020 §2.2): the classic web-text
  * cleanup that works on lines where the doc-level gates
  * ([[TextFunctions]] quality score, the Gopher stats) work on whole
  * documents. Lines survive only if they read like prose — terminal
  * punctuation, a minimum word count, no boilerplate marker — and a
  * document survives only if enough of it does.
  *
  * Shape: ONE projection pass, zero shuffles, zero explodes — the
  * line split, per-line gate, and rejoin all run as per-row array
  * ops, so the operator costs a corpus scan at any scale and the
  * output is the TOTAL frame (funnel accounting: rejected docs stay,
  * flagged, so curation reports don't lose mass).
  */
object LineQuality {
  /** The C4 line gate: a line is kept iff (after right-trimming) it
    * ends in terminal punctuation (`.` `!` `?` `"`), carries at least
    * `minWords` whitespace-separated words, and does not mention
    * "javascript" (the canonical enable-JS boilerplate marker). The
    * punctuation rule assumes prose corpora; `requirePunct = false`
    * drops it for token-stream / transcript corpora where no line
    * ever terminates in punctuation and the published rule would
    * reject everything (the word-count and marker rules still bite). */
  private def lineKeep(l: Column, minWords: Int,
                       requirePunct: Boolean): Column = {
    val base = size(filter(split(l, "\\s+"), w => w =!= "")) >= minWords &&
      !contains(lower(l), lit("javascript"))
    if (requirePunct) rtrim(l).rlike("[.!?\"]$") && base else base
  }

  /** Apply the gate per line and the doc-level C4 gates on top:
    * ≥ `minKeptLines` surviving lines, no "lorem ipsum" placeholder
    * text, no `{` (source-code marker). Output per doc: line counts
    * before/after, the kept verdict, and the cleaned text (surviving
    * lines rejoined in order — rejected docs keep their cleaned form
    * too, callers decide whether to salvage or drop). */
  def c4Filter(docs: DataFrame, idCol: String, textCol: String,
               minKeptLines: Int = 3, minWords: Int = 5,
               requirePunct: Boolean = true): DataFrame = {
    val lines = split(col(textCol), "\n", -1)
    val kept = filter(lines, l => lineKeep(l, minWords, requirePunct))
    docs.select(col(idCol),
      size(lines).as("n_lines"),
      size(kept).as("n_kept"),
      (size(kept) >= minKeptLines &&
        !contains(lower(col(textCol)), lit("lorem ipsum")) &&
        !contains(col(textCol), lit("{"))).as("kept"),
      array_join(kept, "\n").as("text_clean"))
  }
}
