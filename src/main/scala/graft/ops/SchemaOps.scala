package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, NumericType}
import graft.core.Positional.POS

/** P1-P3: schema-evolution and type-predicate projection operators.
  *
  * Reference: drop column by position (v2 pyc@116-120), insert column at
  * position with typed default (v2 pyc@102-114), numeric-only projection
  * before plotting (`select_dtypes(include=[np.number])`, v2 pyc@406).
  * Spark columns are not positional, so ordinal position is emulated by
  * select-list order.
  */
object SchemaOps {

  /** user-visible columns = everything except the `__pos` bookkeeping. */
  private def userCols(df: DataFrame): Array[String] =
    df.columns.filterNot(_ == POS)

  /** P1: drop the column at ordinal `position`. */
  def dropColumnAt(df: DataFrame, position: Int): DataFrame = {
    val cols = userCols(df)
    require(position >= 0 && position < cols.length, s"bad position $position")
    df.drop(cols(position))
  }

  /** P2: insert a column at ordinal `position` with a typed default
    * (`np.full(n, default, dtype)` semantics, v2 pyc@113). A pure
    * projection — no shuffle, folds into whole-stage codegen.
    */
  def insertColumnAt(df: DataFrame, position: Int, name: String,
                     dt: DataType, default: Any): DataFrame = {
    val cols = userCols(df)
    require(position >= 0 && position <= cols.length, s"bad position $position")
    val (before, after) = cols.splitAt(position)
    val selectList: Seq[Column] =
      before.map(col).toSeq ++ Seq(lit(default).cast(dt).as(name)) ++
        after.map(col).toSeq ++
        (if (df.columns.contains(POS)) Seq(col(POS)) else Nil)
    df.select(selectList: _*)
  }

  /** P2 convenience with reference defaults (bool→false, int→0, float→0.0,
    * else null; v2 pyc@104-111).
    */
  def insertColumnAt(df: DataFrame, position: Int, name: String, dt: DataType): DataFrame =
    insertColumnAt(df, position, name, dt, CellOps.defaultFor(dt))

  /** P3: numeric-columns-only projection (pre-plot guard, v2 pyc@406). */
  def numericProjection(df: DataFrame): DataFrame = {
    val nums = df.schema.fields
      .filter(f => f.name != POS && f.dataType.isInstanceOf[NumericType])
      .map(f => col(f.name))
    df.select(nums.toSeq: _*)
  }
}
