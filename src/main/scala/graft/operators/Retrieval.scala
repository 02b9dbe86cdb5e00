package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Lexical retrieval scoring over the document table — BM25, the ranking
  * function behind every inverted-index search engine, expressed as one
  * declarative Spark plan.
  *
  * Scale shape: corpus stats (N, avgdl) are a one-row aggregate broadcast
  * into the scoring join; per-term document frequencies are a small
  * (|query terms|-row) aggregate, also broadcast. The only data-sized
  * operations are the tokenize-explode and one hash aggregate on
  * (doc, term) — both partial+final, no shuffle of raw text, no driver
  * collect. TF-IDF is the k1→∞, b=0 degenerate case of the same plan.
  */
object Retrieval {

  /** BM25 score of every document containing ≥1 query term.
    * Output: (idCol, score) — `score` rounded to 6dp for cross-engine
    * reproducibility; the per-term contributions are accumulated as
    * decimals so the sum is order-independent (double addition is not).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val toks = docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"), size(col("__toks")).as("__dl"))

    // corpus stats: exact long sum / count → one double division (stable)
    val stats = toks.agg(count(lit(1)).as("__n_docs"),
      (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl"))

    // one row per (doc, query-term) occurrence bag
    val tf = toks.select(col(idCol), col("__dl"),
        explode(col("__toks")).as("__term"))
      .filter(col("__term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))

    scoreFromTf(tf, idCol, stats, k1, b)
  }

  /** The BM25 scoring tail, shared by the live path ([[bm25]]) and the
    * layout-routed path ([[bm25FromPostings]]) so the two produce
    * IDENTICAL digits from identical (tf, dl, stats) inputs: per-term df
    * over the matched docs (terms-sized, broadcast), the idf·tfNorm
    * contribution per (doc, term) as 10dp decimal, and an order-free
    * decimal sum per doc rounded to 6dp.
    */
  private def scoreFromTf(tf: DataFrame, idCol: String, stats: DataFrame,
                          k1: Double, b: Double): DataFrame = {
    val df = tf.groupBy("__term").agg(count(lit(1)).as("__df"))

    val idf = log(lit(1.0) +
      (col("__n_docs") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val tfNorm = (col("__tf") * (lit(k1) + 1.0)) /
      (col("__tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__dl") / col("__avgdl")))

    tf.join(broadcast(df), "__term")
      .crossJoin(broadcast(stats))
      .select(col(idCol), (idf * tfNorm).cast("decimal(28,10)").as("__contrib"))
      .groupBy(idCol)
      .agg(round(sum(col("__contrib")).cast("double"), 6).as("score"))
  }

  /** BM25 served from a bucketed postings layout: the probe terms'
    * buckets are partition-pruned at plan time (non-probed buckets never
    * open), the stored (tf, dl) rows feed the shared scoring tail, and
    * the corpus stats are the layout's two stored scalars — the corpus
    * is never re-tokenized. Because a term's rows live entirely in its
    * hash bucket, the per-term df over pruned rows is the exact global
    * df, so the scores are digit-identical to [[bm25]] over the same
    * corpus.
    */
  def bm25FromPostings(spark: org.apache.spark.sql.SparkSession,
                       postings: DataFrame, buckets: Int,
                       nDocs: Long, avgdl: Double, idCol: String,
                       queryTerms: Seq[String],
                       k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val tbs = termBuckets(spark, queryTerms, buckets)
    val tf = postings
      .filter(col("__tb").isInCollection(tbs) &&
        col("term").isInCollection(queryTerms))
      .select(col("doc").as(idCol), col("dl").as("__dl"),
        col("term").as("__term"), col("tf").as("__tf"))
    val stats = spark.range(1).select(lit(nDocs).as("__n_docs"),
      lit(avgdl).as("__avgdl"))
    scoreFromTf(tf, idCol, stats, k1, b)
  }

  /** Sliding passage windows: overlapping token windows of `winTokens`
    * tokens advancing by `stride` per document — the chunking step that
    * turns documents into passages for passage-level embedding, BM25, and
    * decontamination. One codegen'd array projection + posexplode; no
    * shuffle, no UDF, scales linearly with token count.
    *
    * Window layout: starts at 0, stride, 2·stride, …; the last window is
    * always FULL (count = 1 + ⌊(n−w)/stride⌋ for n > w), so up to
    * stride−1 trailing tokens may be uncovered — the standard fixed-stride
    * chunking contract. Documents with 0 < n ≤ w yield one whole-doc
    * window; empty documents yield no row.
    * Output: (doc_id, win_idx, passage, n_win_tokens).
    */
  def passageWindows(docs: DataFrame, idCol: String, textCol: String,
                     winTokens: Int, stride: Int): DataFrame = {
    require(winTokens > 0, "winTokens must be positive")
    require(stride > 0 && stride <= winTokens,
      "stride must be in [1, winTokens] — larger strides skip tokens silently")
    val nWin = when(col("__n") === 0, 0)
      .when(col("__n") <= winTokens, 1)
      .otherwise(expr(s"1 + (__n - $winTokens) div $stride"))
    docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("__nw", nWin.cast("long"))
      // sequence(0, -1) would infer a NEGATIVE step; guard the empty case
      .withColumn("__passages",
        when(col("__nw") > 0, transform(sequence(lit(0L), col("__nw") - 1),
          i => concat_ws(" ",
            slice(col("__toks"), (i * stride + 1).cast("int"), lit(winTokens)))))
          .otherwise(array()))
      .select(col("doc_id"),
        posexplode(col("__passages")).as(Seq("win_idx", "passage")))
      .withColumn("n_win_tokens",
        size(split(col("passage"), " ")).cast("long"))
  }

  /** Inverted-index posting lists: one row per term with its document
    * frequency and the sorted list of containing doc ids (deduped per
    * document, rendered as a comma-joined string so the row is a stable
    * scalar). This is the index-build side of [[bm25]] — materialize it
    * once, and term lookup becomes a pruned scan instead of a corpus pass.
    *
    * Scale shape: explode distinct per-doc terms → single partial+final
    * hash aggregate keyed on the term. The posting list for a stop-word-
    * grade term is that term's true cost in any inverted index; `minDf`
    * exists to cut the long tail of hapax terms, and at true scale the
    * output would be written bucketed by term for pruned lookups.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String,
               minDf: Long = 1L): DataFrame =
    docs.select(col(idCol).as("__doc"),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        array_join(sort_array(collect_list(col("__doc"))), ",").as("plist"))
      .filter(col("df") >= minDf)

  /** The at-scale shape of the inverted index (r8 verdict task #6):
    * one row per (term, doc) — never a concatenated posting-list cell,
    * whose size for a stop-word-grade term is O(corpus) — written
    * directory-partitioned on `__tb = pmod(xxhash64(term), buckets)` so
    * a term lookup is a PARTITION-PRUNED read of ~1/buckets of the
    * index. The repartition on `__tb` before the write gives one
    * shuffle at build time and one part file per bucket; at 100 TB the
    * bucket count scales so a bucket ≈ one task's read.
    */
  def writePostingsBucketed(docs: DataFrame, idCol: String, textCol: String,
                            path: String, buckets: Int = 64): Unit =
    postingsRows(docs, idCol, "doc", textCol, buckets)
      .repartition(buckets, col("__tb"))
      .write.partitionBy("__tb").parquet(path)

  /** The index's row shape, shared by the build and the delta path: one
    * row per distinct (doc, term) carrying the within-doc term frequency
    * `tf` and the doc's token count `dl` (denormalized — exactly the two
    * numbers BM25 needs, so a routed score never re-tokenizes), plus the
    * term-hash bucket `__tb`. The tf aggregation is a partial+final hash
    * agg keyed on (doc, term); row count equals the distinct-term
    * explode the index stored before tf/dl existed.
    */
  private def postingsRows(docs: DataFrame, idCol: String, keyName: String,
                           textCol: String, buckets: Int): DataFrame =
    docs.select(col(idCol).as(keyName),
        TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col(keyName), size(col("__toks")).as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy(keyName, "dl", "term")
      .agg(count(lit(1)).as("tf"))
      .withColumn("__tb", pmod(xxhash64(col("term")), lit(buckets)).cast("int"))

  /** Corpus-level BM25 stats of `docs`: (n_docs, avgdl) — ONE projection
    * + scalar aggregate pass (no explode, no shuffle of bodies).
    * Computed at layout build time and re-computed on a text-edit delta
    * refresh: a single cell edit can move `avgdl`, and these two scalars
    * are the only corpus-level state a routed BM25 needs.
    */
  def postingsStats(docs: DataFrame, textCol: String): (Long, Double) = {
    val r = docs.select(size(TextFunctions.tokens(col(textCol))).as("__dl"))
      .agg(count(lit(1)).as("n"),
        (sum(col("__dl")).cast("double") / count(lit(1))).as("avgdl"))
      .head()
    (r.getLong(0), if (r.isNullAt(1)) 0.0 else r.getDouble(1))
  }

  /** The stored buckets a probe term set lives in — computed WITH Spark
    * over a terms-sized local relation so the hash is bit-identical to
    * the write side's partition values (terms are control-plane sized;
    * this is a plan-time driver job, like a skipping-index probe).
    */
  def termBuckets(spark: org.apache.spark.sql.SparkSession,
                  terms: Seq[String], buckets: Int): Seq[Int] = {
    import spark.implicits._
    terms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(buckets)).cast("int").as("tb"))
      .distinct().collect().map(_.getInt(0)).toSeq
  }

  /** Term lookup against a [[writePostingsBucketed]] layout: literal
    * partition predicate on the probe terms' buckets (directory pruning
    * at plan time — non-probed buckets never open) + the exact term
    * filter, then the posting aggregation over only the pruned rows.
    * Output matches [[postings]] restricted to `terms`.
    */
  def termLookup(spark: org.apache.spark.sql.SparkSession, path: String,
                 terms: Seq[String], buckets: Int): DataFrame =
    termLookupFrom(spark, spark.read.parquet(path), terms, buckets)

  /** [[termLookup]] over an already-assembled postings relation (the
    * stored base, or base-minus-shadowed-plus-patch after a delta
    * refresh): the literal bucket predicate still reaches the underlying
    * parquet scan as a partition filter — Catalyst pushes it through the
    * patch composition's anti-join and union.
    */
  def termLookupFrom(spark: org.apache.spark.sql.SparkSession,
                     postings: DataFrame, terms: Seq[String],
                     buckets: Int): DataFrame = {
    require(terms.nonEmpty, "termLookup needs at least one probe term")
    val tbs = termBuckets(spark, terms, buckets)
    postings
      .filter(col("__tb").isInCollection(tbs) &&
        col("term").isInCollection(terms))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        array_join(sort_array(collect_list(col("doc"))), ",").as("plist"))
  }

  /** Postings rows of a batch of NEW or EDITED docs against an existing
    * bucketed layout — the delta-maintenance path: same tokenization,
    * same bucket hash, doc ids surfaced as `id` for the patch machinery.
    */
  def postingsRowsFor(docs: DataFrame, idCol: String, textCol: String,
                      buckets: Int): DataFrame =
    postingsRows(docs, idCol, "id", textCol, buckets)

  /** [[postings]] restricted to a probe term set — the LIVE fallback of
    * a layout-routed term lookup (corpus-sized tokenize, same answer).
    */
  def postingsFor(docs: DataFrame, idCol: String, textCol: String,
                  terms: Seq[String]): DataFrame =
    docs.select(col(idCol).as("__doc"),
        explode(array_distinct(TextFunctions.tokens(col(textCol))))
          .as("term"))
      .filter(col("term").isInCollection(terms))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        array_join(sort_array(collect_list(col("__doc"))), ",").as("plist"))

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009) — the standard
    * hybrid-retrieval combiner: each input ranking contributes
    * 1/(k0 + rank) per id and the fused score is the sum, so an id that
    * several rankers place high beats one ranker's favorite. This is how
    * a lexical (BM25) and a vector (ANN) leg merge without score
    * calibration — ranks are scale-free where raw scores are not.
    *
    * Scale shape: the inputs are top-k lists (control-plane sized by
    * construction — each ranker already did its distributed work), so the
    * fusion itself is a union + one tiny aggregate. Determinism: each
    * 1/(k0+rank) term is 9dp-rounded DECIMAL, the per-id sum is exact
    * (addition-order-free), and the final double comparison is identical
    * cross-engine.
    *
    * Input rankings: (id, rank) with rank 1-based; ids absent from a list
    * simply contribute nothing. Output: (id, rrf 9dp, n_lists) top-`k` by
    * (rrf desc, id).
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val scored = rankings.map(_.select(col("id"),
        round(lit(1.0) / (lit(k0) + col("rank")), 9)
          .cast("decimal(18,9)").as("__s")))
      .reduce(_.unionAll(_))
    scored.groupBy("id")
      .agg(count(lit(1)).as("n_lists"), sum("__s").cast("double").as("__r"))
      .select(col("id"), round(col("__r"), 9).as("rrf"), col("n_lists"))
      .orderBy(col("rrf").desc, col("id"))
      .limit(k)
  }
}
