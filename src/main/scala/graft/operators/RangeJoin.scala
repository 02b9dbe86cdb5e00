package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: points matched into intervals, executed as an
  * equi-join on bucketed bins instead of a non-equi join.
  *
  * Spark plans a plain `p.ts BETWEEN i.lo AND i.hi` join as
  * BroadcastNestedLoopJoin (or a cartesian product if neither side fits in a
  * broadcast) — O(|P|·|I|) comparisons, a non-starter at 100 TB. Binning
  * restores a shuffled hash join: every interval is exploded to the bins it
  * overlaps, every point maps to exactly one bin, and the join key becomes
  * (keys…, bin). Work is then proportional to co-binned pairs only, both
  * sides shuffle once, and AQE can still rebalance skewed bins. Because a
  * point lands in a single bin, no post-join dedup is needed.
  *
  * Pick `binWidth` close to the typical interval span: intervals then
  * explode to ~2 bins each (rows ≈ 2·|I|), the standard time-bin interval
  * join used for "events within the preceding hour" workloads.
  */
object RangeJoin {

  /** Join `points` into `intervals` on equal `keys` and
    * `lo <= point < hi` (half-open). `ptCol`/`loCol`/`hiCol` are long
    * columns in a common unit (e.g. epoch micros via `unix_micros`).
    * Output: all columns of both inputs (minus the duplicated keys).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], ptCol: String,
                      loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // Floor division in exact long arithmetic: Column./ is DOUBLE division,
    // which silently mis-bins values above 2^53 (epoch nanos are ~2^60).
    // (c - pmod(c, w)) is long-exact and a multiple of w; the division then
    // happens in decimal, which is also exact.
    def bin(c: Column): Column =
      ((c - pmod(c, lit(binWidth))).cast("decimal(38,0)") / binWidth)
        .cast("long")
    // hi is exclusive: an interval touching a bin boundary at hi must not
    // be exploded into the bin starting there. Degenerate intervals
    // (hi <= lo) contain no point under half-open semantics — drop them
    // BEFORE the explode: sequence() with start > stop counts *down*,
    // so one corrupt row would otherwise explode into millions of bins.
    val binned = intervals.filter(col(hiCol) > col(loCol)).withColumn("__bin",
      explode(sequence(bin(col(loCol)), bin(col(hiCol) - 1))))
    val pts = points.withColumn("__bin", bin(col(ptCol)))
    pts.join(binned, keys :+ "__bin")
      .filter(col(loCol) <= col(ptCol) && col(ptCol) < col(hiCol))
      .drop("__bin")
  }

  /** Interval×interval overlap join (*closed* intervals, unlike
    * [[pointInInterval]]'s half-open contract): all pairs with
    * `lo_l <= hi_r AND lo_r <= hi_l`, on equal `keys`. Both sides explode
    * into their covered bins and equi-join on (keys…, bin); a pair sharing
    * several bins would surface once per shared bin, so the match is
    * *claimed* only in the bin containing `max(lo_l, lo_r)` — the standard
    * claim rule that makes the join duplicate-free without a `distinct`
    * (which would re-shuffle the whole pair set).
    *
    * Column names must be disjoint across the two inputs (alias before
    * calling); degenerate intervals (hi < lo) are dropped on both sides.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
                      loL: String, hiL: String, loR: String, hiR: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: Column): Column =
      ((c - pmod(c, lit(binWidth))).cast("decimal(38,0)") / binWidth)
        .cast("long")
    val lb = left.filter(col(hiL) >= col(loL)).withColumn("__bin",
      explode(sequence(bin(col(loL)), bin(col(hiL)))))
    val rb = right.filter(col(hiR) >= col(loR)).withColumn("__bin",
      explode(sequence(bin(col(loR)), bin(col(hiR)))))
    lb.join(rb, keys :+ "__bin")
      .filter(col(loL) <= col(hiR) && col(loR) <= col(hiL))
      .filter(col("__bin") === bin(greatest(col(loL), col(loR))))
      .drop("__bin")
  }
}
