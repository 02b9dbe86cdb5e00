package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-hygiene signals a pretraining data pipeline runs after dedup:
  * repetition metrics (the Gopher-style "is this doc mostly the same words
  * over and over" family), a composite keep/reject quality gate (the C4
  * recipe shape), and eval-set n-gram decontamination.
  *
  * Repetition and decontamination are built explode → hash-aggregate
  * rather than per-row lambda folds: Spark's higher-order array functions
  * run interpreted and hold the whole token array per row, while explode
  * streams through codegen'd partial aggregates and is indifferent to a
  * single 100k-token document. The quality gate deliberately stays a
  * scan-local map stage (its whole point is zero shuffle), with every
  * signal computed by codegen'd built-ins — no HOF fold in the hot path.
  */
object CorpusSignals {

  /** Per-document repetition signals: token count, unique-word fraction,
    * most-frequent-word fraction, and unique-bigram fraction. Two explode
    * passes (words, bigrams) each ending in a hash aggregate keyed on the
    * doc id, joined co-partitioned on that key.
    *
    * A document that tokenizes to nothing produces no explode rows and so
    * no output row — callers wanting full corpus coverage left-join this
    * back to the corpus ([[qualityGate]], by contrast, emits such docs
    * with NULL signals and kept=0, so the two surfaces compose).
    */
  def repetitionSignals(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val base = docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("tk"))
      .select(col("doc_id"), col("tk"), bigrams(col("tk")).as("bg"))

    val wordStats = base.select(col("doc_id"), explode(col("tk")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_words"),
        count(lit(1)).as("n_uniq_words"),
        max("c").as("max_word_count"))

    val bigramStats = base.select(col("doc_id"), explode(col("bg")).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_bigrams"),
        count(lit(1)).as("n_uniq_bigrams"))

    // left join: a doc with <2 tokens has no bigram rows at all.
    wordStats.join(bigramStats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n_words").cast("long").as("n_words"),
        round(col("n_uniq_words").cast("double") / col("n_words"), 6)
          .as("uniq_word_frac"),
        round(col("max_word_count").cast("double") / col("n_words"), 6)
          .as("top_word_frac"),
        round(col("n_uniq_bigrams").cast("double") /
          nullif(col("n_bigrams"), lit(0)), 6).as("uniq_bigram_frac"))
  }

  /** Word bigrams WITH duplicates (unlike
    * [[TextFunctions.shinglesFromTokens]], which dedups) — duplicate mass
    * is exactly what repetition metrics and n-gram counts measure. The
    * lambda only slices the already-materialized array reference, the
    * documented cheap-HOF shape.
    */
  def bigrams(tk: Column): Column =
    when(size(tk) >= 2,
      transform(sequence(lit(1), size(tk) - 1),
        i => concat_ws(" ", slice(tk, i, lit(2)))))
      .otherwise(array())

  /** C4-style composite keep/reject gate: scan-local scalar signals (no
    * shuffle at all — this is a map stage that runs at wire speed in front
    * of any corpus sink), with per-rule 0/1 flags so rejected docs are
    * attributable. Signals use exact integer arithmetic plus one IEEE
    * division each, so any engine computes bit-identical values.
    */
  def qualityGate(docs: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 20, maxWords: Int = 80,
                  minUniq: Double = 0.45,
                  minMeanWl: Double = 3.8, maxMeanWl: Double = 5.2): DataFrame = {
    val withSignals = docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("tk"))
      .select(col("doc_id"),
        // null text → 0 words, so empty docs hit the length rule instead
        // of sliding through every NULL comparison unflagged.
        coalesce(size(col("tk")), lit(0)).as("n_words"),
        // nullif keeps 0-token docs at NULL signals rather than 0.0/0=NaN.
        (size(array_distinct(col("tk"))).cast("double") /
          nullif(size(col("tk")), lit(0))).as("uniq_ratio"),
        // sum of token lengths without an interpreted HOF fold:
        // concat_ws over the materialized array is codegen'd.
        (length(concat_ws("", col("tk"))).cast("double") /
          nullif(size(col("tk")), lit(0))).as("mean_wl"))
    withSignals.select(col("doc_id"), col("n_words"),
      round(col("uniq_ratio"), 6).as("uniq_ratio"),
      round(col("mean_wl"), 6).as("mean_wl"),
      when(col("n_words") < minWords || col("n_words") > maxWords, 1)
        .otherwise(0).as("flag_length"),
      when(col("uniq_ratio") < minUniq, 1).otherwise(0).as("flag_repetitive"),
      when(col("mean_wl") < minMeanWl || col("mean_wl") > maxMeanWl, 1)
        .otherwise(0).as("flag_word_shape"),
      // kept derives from the raw conditions, not the flag sum — a NULL
      // signal (0-token doc) must reject, exactly as SQL CASE does.
      when(col("n_words") >= minWords && col("n_words") <= maxWords &&
        col("uniq_ratio") >= minUniq &&
        col("mean_wl") >= minMeanWl && col("mean_wl") <= maxMeanWl, 1)
        .otherwise(0).as("kept"))
  }

  /** Per-document unigram entropy (bits): −Σ p·log2(p) over the token
    * distribution — low entropy is the information-theoretic repetition
    * signal (a doc of one repeated word scores 0). Counts come from the
    * explode → hash-agg path; the per-doc float fold then runs over counts
    * sorted by word, so accumulation order — and therefore the IEEE result
    * — is engine-independent. Per-doc state is the *distinct*-word list,
    * bounded by vocabulary, not document length.
    */
  def unigramEntropy(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val counts = docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    counts.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("w"), col("c")))).as("cs"),
        sum("c").cast("double").as("n"))
      .select(col("doc_id"),
        round(-aggregate(col("cs"), lit(0.0), (acc, x) => {
          val p = x.getField("c").cast("double") / col("n")
          acc + p * log2(p)
        }), 6).as("entropy"))
  }

  /** Eval-set decontamination: flag every corpus document sharing at least
    * one word n-gram with any document of `evalDocs` (self-matches by id
    * excluded). Returns (doc_id, n_shared, first_eval_id).
    *
    * The eval side is tiny by construction (a benchmark suite, not a
    * corpus) — explicit `broadcast` makes the shingle join a map-side hash
    * probe, so the corpus is never shuffled; only the per-doc aggregate
    * exchanges data, keyed on the doc id.
    */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame, idCol: String,
                    textCol: String, n: Int = 3): DataFrame = {
    def shingleSet(df: DataFrame, idAs: String) = df
      .select(col(idCol).as(idAs), TextFunctions.tokens(col(textCol)).as("tk"))
      .select(col(idAs),
        explode(TextFunctions.shinglesFromTokens(col("tk"), n)).as("sh"))
    shingleSet(docs, "doc_id")
      .join(broadcast(shingleSet(evalDocs, "eval_id")), "sh")
      .filter(col("doc_id") =!= col("eval_id"))
      .groupBy("doc_id")
      .agg(countDistinct(col("sh")).as("n_shared"),
        min(col("eval_id")).as("first_eval_id"))
  }

  /** Passage-level exact dedup with document reassembly: chunk every
    * document into fixed `window`-token passages, keep exactly one copy of
    * each distinct passage corpus-wide (first occurrence by (doc, chunk
    * index) — the lowest `(doc_id, p_idx)` pair), and rebuild each
    * document from its surviving passages in order. This is the
    * boilerplate-removal pass pipelines run *between* exact whole-doc
    * dedup and fuzzy dedup: repeated headers/footers/licence blocks
    * disappear even when the surrounding documents differ.
    *
    * Scale shape: explode to (passage, doc, idx) → one hash aggregate on
    * the passage (min-pair keeper), join back on the passage key, then one
    * aggregate on the doc id to reassemble. Passages shuffle as single
    * strings; no per-doc state ever exceeds the document's own passage
    * list, and the keeper aggregate is partial+final so a passage repeated
    * a million times costs one row per map partition, not a million.
    *
    * Returns one row per input document, zero-token documents included:
    * (doc_id, n_passages, n_kept, clean_text).
    */
  def passageDedup(docs: DataFrame, idCol: String, textCol: String,
                   window: Int = 20): DataFrame = {
    require(window >= 1, s"passage window must be >= 1, got $window")
    val base = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("tk"))
    // chunk index range 0..floor((n-1)/W) guarded to n>0 (sequence(0,-1)
    // would descend); slice beyond the array end clamps, so the tail
    // passage is simply shorter
    val chunks = base.filter(size(col("tk")) > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), floor((size(col("tk")) - 1) / lit(window)).cast("int")),
          i => array_join(slice(col("tk"), i * window + 1, lit(window)), " ")))
          .as(Seq("p_idx", "passage")))
    // The keeper aggregate and join-back key on the passage's 128-bit md5,
    // not the passage text: the exchange then carries 16 bytes + ids per
    // row instead of the ~window-token string (the text rides only on the
    // chunks side, where reassembly needs it). Equality-by-fingerprint is
    // the standard exact-dedup contract (collision odds ~n²/2¹²⁸).
    val keyed = chunks.withColumn("__fp", md5(col("passage")))
    val keeper = keyed.groupBy("__fp")
      .agg(min(struct(col("doc_id"), col("p_idx"))).as("__keep"))
    val kept = keyed.join(keeper, "__fp")
      .filter(struct(col("doc_id"), col("p_idx")) === col("__keep"))
    val rebuilt = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      concat_ws(" ", transform(
        array_sort(collect_list(struct(col("p_idx"), col("passage")))),
        s => s.getField("passage"))).as("clean_text"))
    val totals = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_passages"))
    docs.select(col(idCol).as("doc_id"))
      .join(totals, Seq("doc_id"), "left")
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_passages"), lit(0L)).as("n_passages"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** CCNet-style perplexity scoring: per-doc average negative log
    * probability under an interpolated bigram LM fit on the corpus itself —
    * the "sort the crawl by LM perplexity, keep the head" curation signal.
    *
    * p(w2|w1) = λ·c(w1w2)/c(w1·) + (1−λ)·c(w2)/N, with c(w1·) the
    * bigram-first count, so probabilities are positive for every bigram the
    * corpus contains (the model scores its own training corpus; there is no
    * unseen-event path).
    *
    * Scale shape: the LM is two explode → hash-aggregate tables (distinct
    * bigrams / vocabulary — both vocabulary-bounded, not corpus-bounded);
    * scoring is one join of the doc-bigram stream against each, then a
    * per-doc aggregate. Per-bigram log terms are rounded to 9dp and summed
    * as DECIMAL, so the score is addition-order-free and oracle-replayable.
    *
    * @return (doc_id, n_bigrams, avg_nll) — avg_nll in nats rounded to
    *         6dp; docs with fewer than 2 tokens come back with 0 bigrams
    *         and NULL avg_nll (no evidence, not "perfect").
    */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
                 lambda: Double = 0.9): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda in (0,1), got $lambda")
    import org.apache.spark.sql.types.DecimalType
    val tok = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("tk"))
    val bg = tok.select(col("doc_id"), explode(bigrams(col("tk"))).as("bg"))
    val uni = tok.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c2"))
    val nTok = uni.agg(sum(col("c2")).as("n"))
    val bgCounts = bg.groupBy("bg").agg(count(lit(1)).as("c12"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val firstCounts = bgCounts.groupBy("w1")
      .agg(sum(col("c12")).as("c1f"))
    val lm = bgCounts.join(firstCounts, "w1")
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(uni.withColumnRenamed("w", "w2"), "w2")
      .crossJoin(broadcast(nTok))
      .select(col("bg"),
        round(-log(
          lit(lambda) * (col("c12").cast("double") / col("c1f").cast("double")) +
            lit(1.0 - lambda) * (col("c2").cast("double") / col("n").cast("double"))),
          9).cast(DecimalType(20, 9)).as("nll"))
    val perDoc = bg.join(lm, "bg")
      .groupBy("doc_id").agg(count(lit(1)).as("n_bigrams"),
        sum(col("nll")).as("snll"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("snll").cast("double") / col("n_bigrams").cast("double"), 6)
          .as("avg_nll"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_nll"))
  }
}
