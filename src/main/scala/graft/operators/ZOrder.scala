package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys: interleave the bits of two dimension
  * columns so that sorting by the single z-value keeps rows close in BOTH
  * dimensions. Written out range-partitioned by z (e.g. via
  * [[graft.io.Compaction.compact]] with `clusterBy = Seq("__z")`), every
  * file then covers a small rectangle of (x, y) space and carries tight
  * min/max stats for *both* columns — predicates on either dimension prune
  * files, where a plain sort only serves its leading column. This is the
  * layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`.
  *
  * The interleave is unrolled over literal shift amounts, so the whole
  * expression stays in whole-stage codegen (no interpreted lambda folds).
  * Inputs must be non-negative and below 2^bitsPer (pre-bucket wider
  * domains with `pmod` or range-rank them first).
  */
object ZOrder {

  /** 2-D Morton code: bit b of `x` lands at position 2b, of `y` at 2b+1.
    * Default 21 bits per dimension → a 42-bit non-negative long.
    */
  def zValue(x: Column, y: Column, bitsPer: Int = 21): Column = {
    require(bitsPer >= 1 && bitsPer <= 31, "bitsPer in [1,31]")
    (0 until bitsPer).flatMap { b =>
      Seq(shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b),
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce((a, c) => a.bitwiseOR(c))
  }

  /** The matching SQL-text form (same unrolled arithmetic), for oracles and
    * engines that speak SQL only.
    */
  def zValueSql(x: String, y: String, bitsPer: Int = 21): String =
    (0 until bitsPer).flatMap { b =>
      Seq(s"((($x >> $b) & 1) << ${2 * b})", s"((($y >> $b) & 1) << ${2 * b + 1})")
    }.mkString(" | ")

  /** 3-D Morton code (r11 verdict task #8): bit b of `x` lands at 3b, of
    * `y` at 3b+1, of `z` at 3b+2. Default 16 bits per dimension → a
    * 48-bit non-negative long; bitsPer ≤ 20 keeps the code in 60 bits.
    * Same unrolled-literal-shift form as [[zValue]] — one codegen'd
    * expression, no interpreted folds.
    */
  def zValue3(x: Column, y: Column, z: Column, bitsPer: Int = 16): Column = {
    require(bitsPer >= 1 && bitsPer <= 20, "bitsPer in [1,20]")
    (0 until bitsPer).flatMap { b =>
      Seq(shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 3 * b),
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 3 * b + 1),
        shiftleft(shiftright(z, b).bitwiseAND(lit(1L)), 3 * b + 2))
    }.reduce((a, c) => a.bitwiseOR(c))
  }
}
