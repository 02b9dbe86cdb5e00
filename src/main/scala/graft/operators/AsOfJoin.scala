package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal nearest-before) join.
  *
  * Implemented with the merge-and-carry-forward algorithm rather than a
  * range join: tag both sides, union, sort each key-partition by
  * (ts, side, tiebreak), and carry the most recent right-side payload onto
  * every left row with `last(..., ignoreNulls)` over a running window.
  *
  * Scale: exactly ONE shuffle (hash on the key for the window), state is a
  * single carried row per key — compare a naive `l JOIN r ON ts_r <= ts_l`
  * range join, which explodes to |matches-per-key|² intermediate rows and
  * then needs an argmax. This is the same plan shape Flink/kdb-style as-of
  * joins use. Skewed keys fall back to AQE skew handling; a very hot key can
  * additionally be salted by time-bucket (carrying the last row of the
  * previous bucket), not needed at these SFs.
  */
object AsOfJoin {

  /** Backward as-of join (at-or-before semantics): for every `left` row,
    * attach `carry` columns from the latest `right` row with
    * `right.ts <= left.ts` on the same key. Right rows at the exact same
    * timestamp count as "before" (side ordering puts right first).
    *
    * @param tiebreak right-side column (from `carry`) that breaks equal-ts
    *                 ties among right rows deterministically (max wins).
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, carry: Seq[String],
                   carryPrefix: String = "asof_",
                   tiebreak: Option[String] = None): DataFrame = {
    val passthrough = left.columns.filterNot(c => c == keyCol || c == tsCol).toSeq

    val rightSel = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__side")) ++
        carry.map(c => col(c).as(carryPrefix + c)) ++
        passthrough.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftSel = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__side")) ++
        carry.map(c =>
          lit(null).cast(right.schema(c).dataType).as(carryPrefix + c)) ++
        passthrough.map(col): _*)

    val ordering: Seq[Column] =
      Seq(col(tsCol).asc, col("__side").asc) ++
        tiebreak.map(t => col(carryPrefix + t).asc_nulls_first).toSeq
    val w = Window.partitionBy(keyCol).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rightSel.unionByName(leftSel)
      .select(Seq(col(keyCol), col(tsCol), col("__side")) ++
        carry.map(c =>
          last(col(carryPrefix + c), ignoreNulls = true).over(w)
            .as(carryPrefix + c)) ++
        passthrough.map(col): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }

  /** Forward as-of join (at-or-after semantics): for every `left` row,
    * attach `carry` columns from the *earliest* `right` row with
    * `right.ts >= left.ts` on the same key. Same single-shuffle
    * merge-and-carry plan, with the running frame reversed
    * (current row → unbounded following, `first` ignoreNulls). Right rows
    * at the exact same timestamp count as "after"; equal-ts ties among
    * right rows break by minimum `tiebreak`.
    */
  def asofForward(left: DataFrame, right: DataFrame, keyCol: String,
                  tsCol: String, carry: Seq[String],
                  carryPrefix: String = "asof_",
                  tiebreak: Option[String] = None): DataFrame = {
    val passthrough = left.columns.filterNot(c => c == keyCol || c == tsCol).toSeq

    val rightSel = right.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__side")) ++
        carry.map(c => col(c).as(carryPrefix + c)) ++
        passthrough.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftSel = left.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__side")) ++
        carry.map(c =>
          lit(null).cast(right.schema(c).dataType).as(carryPrefix + c)) ++
        passthrough.map(col): _*)

    val ordering: Seq[Column] =
      Seq(col(tsCol).asc, col("__side").asc) ++
        tiebreak.map(t => col(carryPrefix + t).asc_nulls_last).toSeq
    val w = Window.partitionBy(keyCol).orderBy(ordering: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    rightSel.unionByName(leftSel)
      .select(Seq(col(keyCol), col(tsCol), col("__side")) ++
        carry.map(c =>
          first(col(carryPrefix + c), ignoreNulls = true).over(w)
            .as(carryPrefix + c)) ++
        passthrough.map(col): _*)
      .filter(col("__side") === 0)
      .drop("__side")
  }
}
