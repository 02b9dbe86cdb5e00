package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.FrequencyAggregates

/** Heavy-hitter detection over unbounded key universes — the two-pass
  * exact scheme built on the SpaceSaving summary
  * ([[graft.functions.SpaceSavingSummary]]).
  *
  * Why not `groupBy(key).count()`: at 100 TB the key universe (terms,
  * URLs, n-grams) can be billions of distinct values, so the straight
  * aggregate shuffles and holds the *whole vocabulary*. Here pass 1
  * carries O(capacity) state per partition and surfaces a candidate set
  * guaranteed to contain every item above the threshold; pass 2 re-scans
  * the data but aggregates ONLY those candidates (an InSet probe over a
  * driver-bounded set) — tiny state, exact counts. Data is read twice,
  * vocabulary-sized state never exists.
  */
object Frequency {

  /** Items whose exact frequency is at least `minFrac` of all non-null
    * rows, with exact counts — candidate generation via SpaceSaving, then
    * an exact verification pass over the candidates only.
    *
    * Superset guarantee: SpaceSaving retains any item with true count
    * > n/capacity, and partial-aggregation merges relax that to
    * (#merged summaries)·n_i/capacity ≤ 2n/capacity in the usual
    * two-level (partial → final) plan; `slack` sizes
    * capacity = slack/minFrac with slack ≥ 2.5 so the candidate set
    * provably covers the threshold. Returns (item, cnt, share) ordered by
    * count desc, item.
    */
  def exactHeavyHitters(df: DataFrame, itemCol: String, minFrac: Double,
                        slack: Double = 2.5): DataFrame = {
    require(minFrac > 0 && minFrac < 1, s"minFrac in (0,1), got $minFrac")
    require(slack >= 2.5, s"slack < 2.5 voids the superset guarantee")
    val spark = df.sparkSession
    FrequencyAggregates.register(spark)
    val capacity = math.ceil(slack / minFrac).toInt
    // pass 1 (one scan): SpaceSaving summary + total count, collected as
    // ONE driver row — the summary is O(capacity) by construction, and
    // materializing it once keeps the lazy plan from re-running the full
    // aggregate for each of its two consumers (candidates and n)
    val row = df.agg(
      call_function(FrequencyAggregates.SPACESAVING_FN,
        col(itemCol), lit(capacity)).as("__ss"),
      count(col(itemCol)).as("__n")).head()
    val n = row.getLong(1)
    val candidates = row.getSeq[org.apache.spark.sql.Row](0).map(_.get(0))
    if (candidates.isEmpty)
      return df.select(col(itemCol), lit(0L).as("cnt"), lit(0.0).as("share"))
        .limit(0)
    // pass 2 (one scan): exact counts for the bounded candidate set — an
    // InSet probe beats a broadcast join here, the set is driver-bounded
    df.filter(col(itemCol).isInCollection(candidates))
      .groupBy(itemCol).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= math.ceil(minFrac * n).toLong)
      .select(col(itemCol), col("cnt"),
        round(col("cnt").cast("double") / n.toDouble, 6).as("share"))
      .orderBy(col("cnt").desc, col(itemCol))
  }
}
