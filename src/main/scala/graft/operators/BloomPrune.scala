package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: cut the big side of a selective join down to
  * (probable) matches before any exchange.
  *
  * The 100 TB scenario: `big ⋈ small` where `small`'s key set is too large
  * to broadcast exactly (a broadcast hash join is off the table) but the
  * join is selective — most `big` rows match nothing. A sort-merge join
  * would shuffle all of `big`. Instead, build a bloom filter over `small`'s
  * keys (a few MB at fpp=1% even for tens of millions of keys), broadcast
  * it, and prefilter `big` at the scan — only survivors (true matches plus
  * ~fpp false positives) reach the exchange. The exact join that follows
  * removes the false positives, so results are identical to the plain join;
  * the bloom pass only changes how many bytes move.
  *
  * Spark's optimizer injects the same trick automatically in narrow cases
  * (runtime bloom filters); this operator makes it explicit and reusable —
  * e.g. build once, prune many tables against the same key set.
  *
  * The probe is a Scala UDF (the sketch probe is not expressible as a
  * built-in): one hash per row against a broadcast bitmap — cheap even
  * uncodegen'd, and the surrounding scan/filter stages stay codegen'd.
  */
object BloomPrune {

  /** Exact semi-join `big ⋉ small` on integral keys, bloom-prefiltered.
    * `expectedKeys`/`fpp` size the filter; correctness does not depend on
    * either (false positives are re-checked by the exact semi join).
    */
  def bloomSemiJoin(big: DataFrame, small: DataFrame,
                    bigKey: String, smallKey: String,
                    expectedKeys: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    val bf = small.stat.bloomFilter(smallKey, expectedKeys, fpp)
    // The broadcast lives as long as the returned plan may execute; callers
    // looping over many prunes against fresh key sets should unpersist the
    // session or reuse one filter (build once, prune many).
    val bcast = big.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bcast.value.mightContainLong(k))
    // no distinct() on the build side: semi-join semantics already dedup,
    // and an extra aggregate would just add a shuffle of `small`
    big.filter(mightContain(col(bigKey)))
      .join(small.select(col(smallKey).as(bigKey)), Seq(bigKey), "left_semi")
  }
}
