package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.TextFunctions

/** DSIR-style data selection: importance weights from hashed n-gram models
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", 2023) — the standard recipe for carving a target-domain-like
  * subset out of a raw web corpus.
  *
  * Pipeline: hash every token into one of `buckets` feature buckets, fit
  * smoothed unigram bucket models over the target slice and the raw corpus,
  * score each document by its tokens' summed log-likelihood ratio, then
  * resample with the Gumbel top-k trick (deterministic: the "noise" is the
  * md5-uniform of the doc id, so the selected set is reproducible across
  * runs, partitionings, and engines — same rationale as
  * [[Sampling.hashUniform]]).
  *
  * Scale shape: one explode→hash-aggregate over tokens (map-side partial
  * agg), a `buckets`-row model relation broadcast back onto the token
  * stream, one per-doc aggregate, and a distributed top-k
  * (`TakeOrderedAndProject`) for the resample — no global window, no
  * driver-side loop, nothing sized by the corpus except the two token
  * passes.
  *
  * Determinism: per-bucket log-ratios are rounded to 6dp and carried as
  * DECIMAL(12,6), so the per-doc score is an exact decimal sum (addition
  * order cannot change it) and the final DOUBLE cast is exact below 2^52/1e6.
  */
object ImportanceWeights {

  /** Feature bucket of a token: top-60-bit md5 (always non-negative) mod
    * `buckets`. DuckDB mirror: `('0x' || substr(md5(term),1,15))::BIGINT % B`.
    */
  def bucketOf(token: Column, buckets: Int): Column =
    pmod(conv(substring(md5(token), 1, 15), 16, 10).cast("long"), lit(buckets))

  /** Per-document DSIR score over hashed unigram features.
    *
    * @param targetPred row predicate defining the target domain slice (the
    *                   distribution we want more of); the raw model is fit
    *                   on the whole corpus.
    * @return one row per input doc: (idCol, n_toks, dsir_score), docs with
    *         no tokens scoring 0.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            targetPred: Column, buckets: Int = 1024,
            alpha: Double = 0.5): DataFrame = {
    require(buckets > 0 && alpha > 0, "buckets and alpha must be positive")
    val tok = docs.select(col(idCol).as("__id"), targetPred.as("__t"),
        explode(TextFunctions.tokens(col(textCol))).as("__term"))
      .select(col("__id"), col("__t"),
        bucketOf(col("__term"), buckets).as("__b"))
    // one pass fits both models: raw count + target count per bucket
    val model = tok.groupBy("__b").agg(
      count(lit(1)).as("cr"),
      sum(when(col("__t"), 1L).otherwise(0L)).as("ct"))
    // totals via broadcast one-row aggregate (B-bounded relation, but the
    // scalar-attach idiom keeps the plan shape uniform with the rest of the
    // engine and free of single-partition windows)
    val totals = model.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val denomT = lit(alpha * buckets)
    val ratios = model.crossJoin(broadcast(totals))
      .select(col("__b"),
        round(
          log((col("ct") + lit(alpha)) / (col("nt") + denomT)) -
            log((col("cr") + lit(alpha)) / (col("nr") + denomT)), 6)
          .cast(DecimalType(12, 6)).as("__lr"))
    val scored = tok.join(broadcast(ratios), Seq("__b"))
      .groupBy("__id").agg(
        count(lit(1)).as("n_toks"),
        sum(col("__lr")).cast("double").as("dsir_score"))
    docs.select(col(idCol))
      .join(scored, docs(idCol) === scored("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(col("dsir_score"), lit(0.0)).as("dsir_score"))
  }

  /** Gumbel top-k resample: draw `k` docs without replacement with
    * probability ∝ exp(dsir_score). `key = score − ln(−ln(u))` with u the
    * md5-uniform of the doc id makes the draw deterministic; the top-k is
    * Spark's distributed `TakeOrderedAndProject` (per-partition heads merged
    * on the driver), never a global sort or window.
    */
  def resample(docs: DataFrame, idCol: String, textCol: String,
               targetPred: Column, k: Int, buckets: Int = 1024,
               alpha: Double = 0.5): DataFrame = {
    require(k > 0, "k must be positive")
    val u = Sampling.hashUniform(col(idCol))
    score(docs, idCol, textCol, targetPred, buckets, alpha)
      .withColumn("gumbel_key", round(col("dsir_score") - log(-log(u)), 6))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("dsir_score"), col("gumbel_key"))
  }
}
