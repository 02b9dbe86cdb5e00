package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Stable row-position (`__pos`) maintenance.
  *
  * The reference addresses every cell positionally (`DataFrame.iloc[row, col]`,
  * `/root/reference/main.py:29,35`; v2 pyc@63,71-74) over an intrinsically
  * ordered pandas table. Spark DataFrames are unordered, so the engine carries
  * an explicit dense `__pos: Long` column (0..n-1) and defines every
  * positional operator against it.
  *
  * Scale note: `row_number()` over a global window collapses to a single
  * partition — fine interactively, fatal at 100 TB. The scalable path
  * ([[attachPos]]) is sort → `zipWithIndex`: the sort is a distributed
  * range-partitioned exchange and the index assignment is per-partition with
  * one extra count job for the offsets. Positions stay dense and deterministic
  * given a deterministic ordering key.
  */
object Positional {
  val POS = "__pos"

  /** Dense 0..n-1 `__pos` from a deterministic ordering, distributed — no
    * single-partition window and no RDD roundtrip (stays columnar and
    * codegen'd): range-partition sort, pinned by an eager `localCheckpoint`,
    * then `monotonically_increasing_id` decomposed into (partition id,
    * local index) with collected per-partition offsets added back.
    *
    * Why the pin matters: any two-job scheme (count partitions, then
    * assign) is WRONG under AQE if both jobs re-execute the sort — adaptive
    * coalescing can partition the two executions differently and silently
    * corrupt positions. Checkpointing first means the counts job and every
    * consumer read the *same materialized blocks*, so the decomposition of
    * the id is stable by construction. (`rdd.zipWithIndex` is the classic
    * alternative but costs a second full execution of the upstream plan
    * plus a Row encode/decode of every row.)
    *
    * The offsets ride along as a small map literal (one entry per
    * partition); at true scale positions are assigned once at load and
    * persisted (sorted/bucketed layout), not recomputed per query.
    */
  def attachPos(df: DataFrame, order: Column*): DataFrame = {
    val sorted = if (order.nonEmpty) df.orderBy(order: _*) else df
    val pinned = sorted.localCheckpoint(eager = true)
    // monotonically_increasing_id = (partitionId << 33) + local row index,
    // deterministic over pinned blocks
    val mid = monotonically_increasing_id()
    val pidOf = shiftright(col("__mid"), 33)
    val localOf = col("__mid").bitwiseAND(lit((1L << 33) - 1))
    val withMid = pinned.withColumn("__mid", mid)
    val counts = withMid.groupBy(pidOf.as("pid")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    if (counts.isEmpty) return pinned.withColumn(POS, lit(0L)) // zero rows
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val o = (pid, acc); acc += c; o }
    val offsetMap = map(offsets.flatMap { case (pid, off) =>
      Seq(lit(pid), lit(off)) }.toIndexedSeq: _*)
    withMid
      .withColumn(POS, localOf + element_at(offsetMap, pidOf))
      .drop("__mid")
  }

  /** Small-data variant: `row_number()` global window (single partition).
    * Used only for interactive-size tables; documented trade-off per
    * SURVEY.md §7.3.
    */
  def attachPosWindow(df: DataFrame, order: Column*): DataFrame = {
    val w =
      if (order.nonEmpty) Window.orderBy(order: _*)
      else Window.orderBy(monotonically_increasing_id())
    df.withColumn(POS, row_number().over(w).cast(LongType) - 1L)
  }

  /** Re-number to dense 0..n-1 preserving current `__pos` order (after a
    * delete/splice the positions have holes or shifted duplicates).
    */
  def renumber(df: DataFrame): DataFrame = {
    require(df.columns.contains(POS), s"renumber requires $POS")
    attachPos(df.withColumnRenamed(POS, "__stale_pos"), col("__stale_pos"))
      .drop("__stale_pos")
  }

  /** Serve one page [lo, hi) of rows by position — the engine-side
    * equivalent of the reference's virtualized QTableView rendering
    * (v2 pyc@58-66). A range predicate on `__pos` prunes row groups when the
    * table is written sorted-by-`__pos` (min/max parquet stats).
    */
  def page(df: DataFrame, lo: Long, hi: Long): DataFrame =
    df.filter(col(POS) >= lo && col(POS) < hi).orderBy(col(POS))

  /** Drop the bookkeeping column before a sink write (positions are an
    * engine convention, not user data).
    */
  def strip(df: DataFrame): DataFrame =
    if (df.columns.contains(POS)) df.drop(POS) else df
}
