package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus vocabulary analytics — the tokenizer-facing triple every
  * training-data pipeline runs before (and after) a tokenizer is
  * trained: frequency-ranked vocabulary selection, per-document
  * out-of-vocabulary rates against that vocabulary (coverage — the
  * WordPiece/BPE vocabulary-size decision input, Wu et al. 2016), and
  * adjacent-pair merge statistics (the first iteration of BPE
  * learning, Sennrich et al. 2016 — the candidate list the merge loop
  * consumes). Plus per-group type-token-ratio diversity profiles
  * (distinct/total for unigrams and bigrams), the classic lexical-
  * diversity screen for TEMPLATED or machine-generated sources whose
  * per-document stats look fine while the SOURCE repeats itself.
  *
  * Every number is an exact Long count until at most one IEEE
  * division per emitted value (the repo-wide oracle discipline), so
  * all outputs hash-replay in DuckDB.
  *
  * Scale shape: vocabulary/merge-pair selection is a map-side-combined
  * token (or gram) count — ONE shuffle at vocabulary cardinality, far
  * below corpus cardinality — followed by a distributed sort-limit
  * (TakeOrderedAndProject: per-partition top-V heaps, V rows to the
  * driver-side take, never a global sort materialization). OOV rating
  * then BROADCASTS the V-row vocabulary against the token stream — the
  * corpus never shuffles for coverage, only the per-doc count
  * aggregate moves. Diversity profiles are two-level distinct
  * aggregates (partial distinct on (group, unit) then the group
  * rollup), the standard exact-distinct plan.
  */
object Vocab {

  /** Top-V tokens by corpus frequency, ties token ASC — (token, cnt,
    * vrank). The frequency-cut vocabulary every coverage question is
    * asked against. */
  def topVocabulary(docs: DataFrame, textCol: String, topV: Int): DataFrame = {
    val counts = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(topV)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("token").asc)
    // the window runs AFTER the limit: V rows, one partition — bounded
    counts.withColumn("vrank", row_number().over(w))
  }

  /** Vocabulary coverage CURVE: at each checkpoint size k (powers of
    * two by default), what fraction of the corpus token mass the
    * k most frequent types cover — the plot that answers "how big a
    * vocabulary does this corpus actually need" before committing to
    * a tokenizer budget. One row per checkpoint that exists (a k past
    * the type count emits nothing): the k-th type itself (the
    * marginal token the budget buys), its frequency, the cumulative
    * and total mass, and their ratio (the one IEEE division).
    *
    * Scale shape: the frequency aggregate is the corpus-mass pass
    * (map-combinable); rank and running mass over the TYPE frame run
    * through the constant-segment two-phase machinery
    * ([[graft.ops.Quantiles.segmentedRowNumber]] /
    * [[graft.ops.Quantiles.segmentedPrefixSum]]) — exact order
    * statistics, never one global window task even when the type
    * frame is billions of rows. */
  def coverageCurve(docs: DataFrame, textCol: String,
                    ks: Seq[Long] = (0 to 14).map(1L << _)): DataFrame = {
    val freq = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val tagged = freq.withColumn("__ord", -col("cnt"))
      .withColumn("__g", lit(0))
    val order = Seq(col("cnt").desc, col("token").asc)
    val ranked = graft.ops.Quantiles.segmentedRowNumber(
      tagged, "__g", "__ord", order, nBuckets = 32)
    val cum = graft.ops.Quantiles.segmentedPrefixSum(
      ranked, "__g", "cnt", "__ord", order, nBuckets = 32)
    val total = freq.agg(sum(col("cnt")).as("__total"))
    cum.filter(col("__rn").isin(ks: _*))
      .crossJoin(broadcast(total))
      .select(col("__rn").cast("long").as("vocab_k"), col("token"),
        col("cnt"), col("__cum").as("cum_mass"),
        col("__total").as("total_mass"),
        (col("__cum") / col("__total")).as("coverage"))
  }

  /** Cluster keyword profiling — the c-TF-IDF labeling step of the
    * BERTopic-style pipeline (public methodology): treat each cluster
    * as one meta-document and score terms by
    * `tf_in_cluster · floor(log2(n_clusters div cluster_df))`, the
    * whole-bit idf the retrieval family pins (q106): a term present
    * in every cluster scores ZERO exactly (idf 0 — stopwords and
    * template boilerplate eliminate themselves), and the integer
    * scores are hash-stable across engines. `tf` counts CARRYING
    * DOCUMENTS in the cluster (set-per-doc), not raw occurrences —
    * one bursty document can't crown a term. Emits the top-`k` terms
    * per cluster (ties
    * break token-DESCENDING — the struct max-heap's natural order,
    * mirrored in the oracle). The human-readable answer to "what IS
    * cluster 7" after k-means/label assignment.
    *
    * Scale shape: one token-mass aggregate keyed (cluster, token) —
    * map-combinable; the cluster-df aggregate runs over that (already
    * reduced) frame; n_clusters is a 1-row broadcast; selection is
    * the k-bounded heap per cluster, never a window over the vocab. */
  def clusterKeywords(docs: DataFrame, clusterCol: String,
                      textCol: String, k: Int = 8,
                      shingleK: Int = 3): DataFrame = {
    // terms are k-word shingles, ONE count per carrying document
    // (the set-emitting generator) — burstiness inside one doc can't
    // crown a term, and shingles stay discriminative where a small
    // unigram vocabulary saturates every cluster
    val tf = docs
      .select(col(clusterCol).as("cluster"),
        graft.functions.exprs.word_shingle_rows(
          TextFunctions.tokens(col(textCol)), shingleK).as("token"))
      .groupBy(col("cluster"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("token")).agg(count(lit(1)).as("dfc"))
    val nc = tf.agg(countDistinct(col("cluster")).as("n_clusters"))
    val scored = tf.join(dfc, Seq("token"))
      .crossJoin(broadcast(nc))
      .withColumn("score",
        col("tf") * (length(bin(expr("n_clusters div dfc"))) - 1)
          .cast("long"))
      .filter(col("score") > 0)
    scored.groupBy(col("cluster"))
      .agg(graft.functions.aggs.top_k(
        struct(col("score"), col("token"), col("tf"), col("dfc")), k)
        .as("top"))
      .select(col("cluster"), posexplode(col("top")).as(Seq("r", "t")))
      .select(col("cluster"), col("t.token").as("token"),
        col("t.tf").as("tf"), col("t.dfc").as("dfc"),
        col("t.score").as("score"),
        (col("r") + 1).cast("int").as("rank"))
  }

  /** Per-document coverage against the top-V vocabulary: (idCol,
    * n_tokens, n_oov, oov_rate). Token-less documents rate 0.0 (no
    * evidence of OOV mass — the conservative direction for a
    * keep/drop gate built on top). */
  def oovProfile(docs: DataFrame, idCol: String, textCol: String,
                 topV: Int): DataFrame = {
    val vocab = topVocabulary(docs, textCol, topV)
      .select(col("token"), lit(1).as("iv"))
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    val per = toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
    docs.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_rate",
        when(col("n_tokens") === 0L, lit(0.0))
          .otherwise(col("n_oov").cast("double") /
            col("n_tokens").cast("double")))
  }

  /** Per-group lexical diversity: (groupCol, n_tokens,
    * n_distinct_tokens, ttr, n_bigrams, n_distinct_bigrams,
    * bigram_ttr). Groups appear iff they carry ≥1 token; a group
    * whose documents are all too short for bigrams rates 0.0 on the
    * bigram axis. */
  def diversityProfile(docs: DataFrame, groupCol: String,
                       textCol: String): DataFrame = {
    val tk: Column = TextFunctions.tokens(col(textCol))
    val tokAgg = docs.select(col(groupCol), explode(tk).as("token"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("token")).as("n_distinct_tokens"))
    val biAgg = docs.select(col(groupCol),
        explode(graft.functions.exprs.word_grams(tk, 2)).as("g"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_bigrams"),
        countDistinct(col("g")).as("n_distinct_bigrams"))
    tokAgg.join(biAgg, Seq(groupCol), "left")
      .select(col(groupCol), col("n_tokens"), col("n_distinct_tokens"),
        (col("n_distinct_tokens").cast("double") /
          col("n_tokens").cast("double")).as("ttr"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_distinct_bigrams"), lit(0L))
          .as("n_distinct_bigrams"))
      .withColumn("bigram_ttr",
        when(col("n_bigrams") === 0L, lit(0.0))
          .otherwise(col("n_distinct_bigrams").cast("double") /
            col("n_bigrams").cast("double")))
  }

  /** Encode the corpus against the top-V vocabulary — the tokenizer
    * APPLY step ([[topVocabulary]] selects, this maps): every token
    * becomes its vocabulary rank (1..V), out-of-vocabulary tokens the
    * reserved id 0 (`<unk>`), per document in position order. Ids are
    * emitted as a comma-joined string (the q53 fixed-image convention
    * — cross-engine array equality without array hashing). Output:
    * (idCol, token_ids, n_tokens); token-less docs keep an empty
    * string. Scale: the V-row vocabulary broadcasts against the
    * positional token stream; the only aggregate is the per-doc
    * reassembly, bounded by document length. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             topV: Int): DataFrame = {
    val vocab = topVocabulary(docs, textCol, topV)
      .select(col("token"), col("vrank"))
    val pos = docs.select(col(idCol),
      posexplode(TextFunctions.tokens(col(textCol)))
        .as(Seq("pos", "token")))
    val mapped = pos.join(broadcast(vocab), Seq("token"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("vrank"), lit(0)).as("tid"))
    val reb = mapped.groupBy(col(idCol))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tid")))),
          x => x.getField("tid").cast("string")), ",").as("token_ids"),
        count(lit(1)).as("n_tokens"))
    docs.select(col(idCol)).join(reb, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("token_ids"), lit("")).as("token_ids"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }

  /** Top-K adjacent token pairs by corpus count, ties pair ASC —
    * (pair, cnt, mrank). The BPE merge-candidate list: iteration one
    * of merge learning picks `mrank = 1`; the full loop re-runs this
    * after applying each merge. Pairs carry multiplicity (the
    * [[graft.functions.WordGrams]] kernel — all overlapping bigrams,
    * space-joined). */
  def mergePairStats(docs: DataFrame, textCol: String,
                     topK: Int): DataFrame = {
    val counts = docs
      .select(explode(graft.functions.exprs.word_grams(
        TextFunctions.tokens(col(textCol)), 2)).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("pair").asc)
    counts.withColumn("mrank", row_number().over(w))
  }

  /** PMI-style collocation mining: the top-K bigrams whose observed
    * frequency most exceeds what their parts predict — multi-word
    * expressions ("new york", "machine learning") that tokenizer
    * vocabularies, stop-phrase lists, and boilerplate detectors all
    * want surfaced. The ranking key is the fixed-point LIFT
    * `lift_fp = (n_pair · 10^scale) div (n1 · n2)` — for a fixed
    * corpus this orders exactly as PMI does (PMI adds the per-corpus
    * constant log(N²/M)) while staying division-free-integer, so the
    * full ranking replays bit-for-bit in SQL. Raw counts ride along
    * so consumers needing true PMI values can finish the arithmetic
    * at whatever precision they want. Ties: (n_pair DESC, pair ASC).
    *
    * Cost: the unigram and bigram counts (two map-side-combined
    * aggregates, one shuffle each at vocabulary cardinality), two
    * token-keyed joins of the bigram frame against the unigram frame,
    * and a distributed sort-limit. `minCount` prunes the long tail of
    * hapax bigrams BEFORE the joins — at web scale that filter is
    * what keeps the joined frame vocabulary-sized. Long-range safety:
    * `n1 · n2` stays exact below ~3·10⁹ occurrences per token;
    * corpora beyond that should raise `minCount` and drop `scale`. */
  def collocations(docs: DataFrame, textCol: String, topK: Int,
                   minCount: Long = 5, scale: Int = 6): DataFrame = {
    val uni = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val bi = docs
      .select(explode(graft.functions.exprs.word_grams(
        TextFunctions.tokens(col(textCol)), 2)).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val pow = math.pow(10, scale).toLong
    val scored = bi
      .withColumn("w1", substring_index(col("pair"), " ", 1))
      .withColumn("w2", substring_index(col("pair"), " ", -1))
      .join(uni.select(col("token").as("w1"), col("cnt").as("n1")), Seq("w1"))
      .join(uni.select(col("token").as("w2"), col("cnt").as("n2")), Seq("w2"))
      .withColumn("lift_fp", expr(s"(n_pair * ${pow}L) DIV (n1 * n2)"))
      .orderBy(col("lift_fp").desc, col("n_pair").desc, col("pair").asc)
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("lift_fp").desc, col("n_pair").desc, col("pair").asc)
    scored.withColumn("crank", row_number().over(w))
      .select(col("pair"), col("n_pair"), col("n1"), col("n2"),
        col("lift_fp"), col("crank"))
  }

  /** Pairwise vocabulary overlap between sources — the Jaccard
    * matrix over per-source token SETS: two feeds with near-identical
    * vocabularies are redundant in a mixture (q82's doc-level overlap
    * catches shared DOCUMENTS; this catches shared LANGUAGE — two
    * crawls of different pages from one template ecosystem), while a
    * low-overlap source buys [[diversityProfile]]-style breadth.
    * Exact: distinct (source, token) presence, token-keyed self-join
    * for intersections (fan-out per token ≤ |sources|²/2 — sources
    * are feeds, a bounded set, so the joined frame stays
    * vocabulary-sized), `jaccard_fp = inter·10⁶ div (union)` one
    * integral division. Unordered pairs (src_a < src_b). */
  def vocabOverlapMatrix(docs: DataFrame, textCol: String,
                         srcCol: String): DataFrame = {
    val vocab = docs.filter(col(textCol).isNotNull)
      .select(col(srcCol).as("src"),
        explode(array_distinct(TextFunctions.tokens(col(textCol))))
          .as("token"))
      .distinct()
    val sizes = vocab.groupBy(col("src")).agg(count(lit(1)).as("sz"))
    vocab.join(vocab.select(col("src").as("src_b"), col("token")),
        Seq("token"))
      .filter(col("src") < col("src_b"))
      .groupBy(col("src").as("src_a"), col("src_b"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes).select(col("src").as("src_a"),
        col("sz").as("sz_a")), Seq("src_a"))
      .join(broadcast(sizes).select(col("src").as("src_b"),
        col("sz").as("sz_b")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("inter"),
        col("sz_a"), col("sz_b"),
        expr("(inter * 1000000) DIV (sz_a + sz_b - inter)")
          .as("jaccard_fp"))
  }

  /** Chi-square token–label feature selection: the top-K tokens most
    * associated with a boolean document label — the feature-selection
    * pass behind n-gram language-ID models, fastText-style quality
    * classifiers, and domain-tagger vocabularies (pick the discrimina-
    * tive features BEFORE training, Yang & Pedersen 1997). Per token,
    * the 2×2 presence/label contingency (a,b,c,d) yields
    *
    *   chi2 = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))
    *
    * emitted as `chi2_fp` in 10^-4 units via two integral divisions
    * over DECIMAL(38,0) intermediates — the widest product is
    * (ad−bc)² ≤ N⁴/16, inside 38 digits to N ≈ 2·10⁹ documents and
    * replayed identically by DuckDB's HUGEINT, so the full ranking
    * hash-matches (the [[collocations]] discipline; shard corpora
    * past that envelope). The floor in the first division costs at
    * most ~10⁴·N/((a+c)(b+d)) fixed-point units — ≲1 chi2 unit even
    * for heavily imbalanced labels, and identical in both engines.
    *
    * Shape: one array_distinct token explode (presence, not
    * frequency) → ONE map-side-combined (token) aggregate carrying
    * the label side-sum — vocabulary cardinality, not corpus — then
    * per-row scalar arithmetic against broadcast totals and a
    * distributed sort-limit. `minDf` prunes the hapax tail before
    * any arithmetic; tokens present in EVERY document are excluded
    * (degenerate margin). Ties: (df DESC, token ASC). */
  def chiSquareTokens(docs: DataFrame, textCol: String, label: Column,
                      topK: Int, minDf: Long = 5): DataFrame = {
    val base = docs.filter(col(textCol).isNotNull)
      .select(label.cast("boolean").as("__lbl"),
        array_distinct(TextFunctions.tokens(col(textCol))).as("__toks"))
    val perToken = base
      .select(col("__lbl"), explode(col("__toks")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"),
        sum(when(col("__lbl"), 1L).otherwise(0L)).as("a"))
    val totals = base.agg(count(lit(1)).as("__n"),
      sum(when(col("__lbl"), 1L).otherwise(0L)).as("__c1"))
    val scored = perToken
      .crossJoin(broadcast(totals))
      .filter(col("df") >= minDf && col("df") < col("__n"))
      .withColumn("b", col("df") - col("a"))       // token & !label
      .withColumn("cc", col("__c1") - col("a"))    // label & !token
      .withColumn("dd", col("__n") - col("df") - col("cc")) // neither
      .withColumn("chi2_fp", when(
        col("__c1") > 0 && col("__n") > col("__c1"), expr(
          """((CAST(a AS DECIMAL(38,0)) * dd - CAST(b AS DECIMAL(38,0)) * cc)
            |  * (CAST(a AS DECIMAL(38,0)) * dd - CAST(b AS DECIMAL(38,0)) * cc)
            |  DIV (CAST(df AS DECIMAL(38,0)) * (__n - df)))
            | * CAST(10000 AS DECIMAL(38,0)) * __n
            | DIV (CAST(__c1 AS DECIMAL(38,0)) * (__n - __c1))""".stripMargin)))
      .select(col("token"), col("df"), col("a").as("label_df"),
        col("chi2_fp"))
      .orderBy(col("chi2_fp").desc, col("df").desc, col("token").asc)
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("chi2_fp").desc, col("df").desc, col("token").asc)
    scored.withColumn("crank", row_number().over(w))
  }
}
