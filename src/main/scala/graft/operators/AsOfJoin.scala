package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal nearest) join, backward and forward.
  *
  * Implemented with the merge-and-carry algorithm rather than a range join:
  * tag both sides, union, sort each key-partition by (ts, side, tiebreak),
  * and carry the nearest right-side payload onto every left row with
  * `last/first(..., ignoreNulls)` over a running window.
  *
  * The carried payload is a single STRUCT of the carry columns, null only
  * for left rows. This matters twice: a matched right row whose carry
  * *values* are null must still win (ignoreNulls skips nulls — wrapping in
  * a non-null struct makes the match itself the thing carried), and one
  * window expression serves any number of carry columns.
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

  private val PAYLOAD = "__asof_payload"

  /** Shared merge-and-carry core; `forward` flips the frame direction and
    * which side sorts first at equal timestamps.
    */
  private val RTS = "__asof_rts"

  private def asof(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, carry: Seq[String], carryPrefix: String,
                   tiebreak: Option[String], forward: Boolean,
                   toleranceUs: Option[Long] = None): DataFrame = {
    val passthrough = left.columns.filterNot(c => c == keyCol || c == tsCol).toSeq
    // the matched right timestamp rides inside the payload struct so a
    // staleness bound can void too-old matches AFTER the carry — the carry
    // itself stays one window pass regardless of tolerance
    val payloadType = org.apache.spark.sql.types.StructType(
      carry.map(c => right.schema(c).copy(name = c)) :+
        org.apache.spark.sql.types.StructField(RTS,
          right.schema(tsCol).dataType))

    // right rows sort before left at equal ts for backward (at-or-before
    // includes same-ts), after left for forward (at-or-after includes it)
    val rightSide = if (forward) 1 else 0
    val leftSide = 1 - rightSide

    val rightSel = right.select(
      Seq(col(keyCol), col(tsCol), lit(rightSide).as("__side"),
        struct(carry.map(col) :+ col(tsCol).as(RTS): _*).as(PAYLOAD)) ++
        passthrough.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftSel = left.select(
      Seq(col(keyCol), col(tsCol), lit(leftSide).as("__side"),
        lit(null).cast(payloadType).as(PAYLOAD)) ++
        passthrough.map(col): _*)

    // equal-ts tie among right rows: backward wants the max tiebreak to win
    // (last in ascending order), forward wants the min (first in order)
    val ordering: Seq[Column] =
      Seq(col(tsCol).asc, col("__side").asc) ++
        tiebreak.map(t => if (forward) col(PAYLOAD).getField(t).asc_nulls_last
                          else col(PAYLOAD).getField(t).asc_nulls_first).toSeq
    val base = Window.partitionBy(keyCol).orderBy(ordering: _*)
    val w =
      if (forward) base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried =
      if (forward) first(col(PAYLOAD), ignoreNulls = true).over(w)
      else last(col(PAYLOAD), ignoreNulls = true).over(w)

    // a match older (backward) / farther ahead (forward) than the bound is
    // voided per row — the null payload then renders like "no match at all"
    val bounded = toleranceUs match {
      case None => col(PAYLOAD)
      case Some(tol) =>
        val gap =
          if (forward) unix_micros(col(PAYLOAD).getField(RTS)) -
            unix_micros(col(tsCol))
          else unix_micros(col(tsCol)) -
            unix_micros(col(PAYLOAD).getField(RTS))
        when(gap <= tol, col(PAYLOAD))
          .otherwise(lit(null).cast(payloadType))
    }
    rightSel.unionByName(leftSel)
      .withColumn(PAYLOAD, carried)
      .filter(col("__side") === leftSide)
      .withColumn(PAYLOAD, bounded)
      .select(Seq(col(keyCol), col(tsCol)) ++
        carry.map(c => col(PAYLOAD).getField(c).as(carryPrefix + c)) ++
        passthrough.map(col): _*)
  }

  /** Backward as-of join (at-or-before semantics): for every `left` row,
    * attach `carry` columns from the latest `right` row with
    * `right.ts <= left.ts` on the same key. Right rows at the exact same
    * timestamp count as "before".
    *
    * @param tiebreak right-side column (from `carry`) that breaks equal-ts
    *                 ties among right rows deterministically (max wins).
    * @param toleranceUs max staleness in microseconds (pandas merge_asof's
    *                 `tolerance`): a carried match with
    *                 left.ts − right.ts > bound is voided to null carries,
    *                 exactly as if no right row existed. Requires a
    *                 timestamp `tsCol`. Same single-shuffle plan.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, carry: Seq[String],
                   carryPrefix: String = "asof_",
                   tiebreak: Option[String] = None,
                   toleranceUs: Option[Long] = None): DataFrame =
    asof(left, right, keyCol, tsCol, carry, carryPrefix, tiebreak,
      forward = false, toleranceUs = toleranceUs)

  /** Nearest as-of join (pandas merge_asof `direction='nearest'`): for
    * every left row, the right row minimizing |right.ts − left.ts| on the
    * key, composed from one backward and one forward pass joined on a
    * caller-named unique left id. Equal distance breaks toward the
    * backward match (the at-or-before row); equal-ts ties WITHIN a
    * direction inherit that pass's tiebreak (backward max, forward min).
    * Cost: two merge-and-carry shuffles plus an id-keyed join — still no
    * range join, no |matches|² blowup.
    *
    * Output: left columns + `carryPrefix`+carry
    * + (asof_gap_us, asof_direction ∈ {backward, forward, NULL}).
    */
  def asofNearest(left: DataFrame, right: DataFrame, keyCol: String,
                  tsCol: String, leftIdCol: String, carry: Seq[String],
                  carryPrefix: String = "asof_",
                  tiebreak: Option[String] = None): DataFrame = {
    val NTS = "__asof_nts"
    val rightExt = right.withColumn(NTS, col(tsCol))
    val b = asofBackward(left, rightExt, keyCol, tsCol, carry :+ NTS,
      carryPrefix = "__b_", tiebreak = tiebreak)
    val f = asofForward(left, rightExt, keyCol, tsCol, carry :+ NTS,
        carryPrefix = "__f_", tiebreak = tiebreak)
      .select(col(leftIdCol).as("__fid") +:
        (carry :+ NTS).map(c => col(s"__f_$c")): _*)
    val joined = b.join(f, b(leftIdCol) === f("__fid"), "left")
    val gapB = unix_micros(col(tsCol)) - unix_micros(col(s"__b_$NTS"))
    val gapF = unix_micros(col(s"__f_$NTS")) - unix_micros(col(tsCol))
    val chooseB = col(s"__b_$NTS").isNotNull &&
      (col(s"__f_$NTS").isNull || gapB <= gapF)
    val passthrough = left.columns.filterNot(c => c == keyCol || c == tsCol)
    joined.select(
      Seq(col(keyCol), col(tsCol)) ++ passthrough.map(col) ++
        carry.map(c => when(chooseB, col(s"__b_$c"))
          .otherwise(col(s"__f_$c")).as(carryPrefix + c)) ++
        Seq(
          when(chooseB, gapB)
            .when(col(s"__f_$NTS").isNotNull, gapF)
            .otherwise(lit(null)).as("asof_gap_us"),
          when(chooseB, lit("backward"))
            .when(col(s"__f_$NTS").isNotNull, lit("forward"))
            .otherwise(lit(null).cast("string")).as("asof_direction")): _*)
  }

  /** Forward as-of join (at-or-after semantics): for every `left` row,
    * attach `carry` columns from the *earliest* `right` row with
    * `right.ts >= left.ts` on the same key. Right rows at the exact same
    * timestamp count as "after"; equal-ts ties break by minimum `tiebreak`.
    */
  def asofForward(left: DataFrame, right: DataFrame, keyCol: String,
                  tsCol: String, carry: Seq[String],
                  carryPrefix: String = "asof_",
                  tiebreak: Option[String] = None,
                  toleranceUs: Option[Long] = None): DataFrame =
    asof(left, right, keyCol, tsCol, carry, carryPrefix, tiebreak,
      forward = true, toleranceUs = toleranceUs)
}
