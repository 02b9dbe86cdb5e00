package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.MinhashExpressions
import graft.operators.Dedup

/** r15: the native [[graft.functions.MinhashBands]] expression that
  * replaced the explode → 32 × min(xxhash64) aggregates → join signature
  * pipeline inside [[Dedup.lshIndex]] / [[Dedup.minhashLshPairs]]. The
  * LSH pair sets are oracle-pinned, so the band keys must be BIT-equal to
  * both prior formulations; this suite keeps the old explode+agg and HOF
  * forms as the executable spec over the real test corpus (every shingle
  * of every document — not a synthetic sample).
  */
class MinhashBandsSpec extends SparkSpec {

  private val n = 3
  private val numHashes = 32
  private val bands = 16

  private def shingled() = {
    graft.functions.TextExpressions.register(spark)
    val d = Tables.load(spark, sf, "documents")
    d.select(col("doc_id").as("id"),
        array_distinct(call_function(
          graft.functions.TextExpressions.SHINGLES_FN,
          graft.functions.TextFunctions.tokens(col("text")), lit(n))).as("sh"))
      .withColumn("n_sh", size(col("sh")))
      .filter(col("n_sh") > 0)
  }

  test("native bands == explode+min-agg bands == HOF bands, whole corpus") {
    MinhashExpressions.register(spark)
    val s0 = shingled()
    val r = numHashes / bands
    // old form 1: explode + 32 min(xxhash64) aggregates + lshBands
    val sigCols = (0 until numHashes).map(k =>
      min(xxhash64(lit(k), col("s"))).as(s"h$k"))
    val aggSigs = s0.select(col("id"), explode(col("sh")).as("s"))
      .groupBy("id").agg(sigCols.head, sigCols.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(k => col(s"h$k")): _*).as("sig"))
    val aggBands = aggSigs.select(col("id"),
      Dedup.lshBands(col("sig"), bands, r).as("bands"))
    // old form 2: the nested HOF fold
    val hofBands = s0.select(col("id"),
      Dedup.lshBands(Dedup.minhashSignature(col("sh"), numHashes),
        bands, r).as("bands"))
    // new form: one native expression
    val native = s0.select(col("id"),
      call_function(MinhashExpressions.BANDS_FN, col("sh"),
        lit(numHashes), lit(bands)).as("bands"))
    def m(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val nm = m(native)
    assert(nm.nonEmpty)
    assert(nm == m(aggBands), "native bands must equal the explode+agg form")
    assert(nm == m(hofBands), "native bands must equal the HOF form")
  }

  test("lshIndex output schema and dedup pair results are unchanged") {
    val d = Tables.load(spark, sf, "documents")
    val idx = Dedup.lshIndex(d.filter(col("doc_id") % 5 =!= 0),
      "doc_id", "text", n, numHashes, bands)
    assert(idx.columns.toSeq == Seq("id", "sh", "n_sh", "bands"))
    val matches = Dedup.incrementalLshMatches(idx,
      d.filter(col("doc_id") % 5 === 0), "doc_id", "text",
      n, 0.4, numHashes, bands)
    // LSH candidates verified by exact jaccard: every emitted pair must
    // ALSO be a true pair of the brute-force shingle join (precision 1)
    val brute = Dedup.shingleJaccardPairs(d, "doc_id", "text", n, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = matches.collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    assert(got.subsetOf(brute), s"${(got -- brute).size} false pairs")
    assert(got.nonEmpty)
  }
}
