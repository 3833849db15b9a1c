package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mixed-language document detection — the CCNet/C4 discipline of
  * running language-ID per PARAGRAPH, not per document: a page that
  * is 60% English boilerplate around a German article passes a
  * doc-level language gate in both directions and poisons either
  * corpus. Chunk the document on the token grid, language-ID each
  * chunk ([[TextFunctions.langId]] — the same classifier q13 gates
  * with), and report the majority language with its agreement mass;
  * `mixed` trips when under 80% of chunks agree (integer
  * cross-multiplication — no division, no float).
  *
  * Scale shape: one generate (the chunk explode) over a corpus scan,
  * one (doc, lang) count aggregate — map-side combinable, ≤ 5 rows
  * per doc out — and one per-doc argmax folded as a min-struct
  * aggregate (ties to the lexicographically smallest language). No
  * windows, no joins; linear in chunk mass. */
object LangConsistency {
  /** (idCol, major_lang, n_chunks, n_major, mixed) per document.
    * Chunks are non-overlapping `chunkSize`-token windows (the final
    * one may be short); documents shorter than one window still emit
    * one chunk, so every document scores. */
  def mixedLanguage(docs: DataFrame, idCol: String, textCol: String,
                    chunkSize: Int = 32): DataFrame = {
    val chunkLangs = docs.select(col(idCol),
        posexplode(TextFunctions.chunks(col(textCol), chunkSize,
          stride = chunkSize)).as(Seq("__i", "__chunk")))
      .select(col(idCol), TextFunctions.langId(col("__chunk")).as("__cl"))
    val perLang = chunkLangs.groupBy(col(idCol), col("__cl"))
      .agg(count(lit(1)).as("__n"))
    perLang.groupBy(col(idCol))
      .agg(min(struct((-col("__n")).as("nn"), col("__cl").as("l"))).as("m"),
        sum(col("__n")).as("n_chunks"))
      .select(col(idCol), col("m.l").as("major_lang"), col("n_chunks"),
        (-col("m.nn")).as("n_major"))
      .withColumn("mixed",
        col("n_major") * lit(5L) < col("n_chunks") * lit(4L))
  }
}
