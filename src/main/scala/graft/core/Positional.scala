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
    * codegen'd): explicit range-partition sort, pinned by `localCheckpoint`,
    * then `monotonically_increasing_id` decomposed into (partition id,
    * local index) with per-partition offsets added back.
    *
    * Why the pin matters: any two-job scheme (count partitions, then
    * assign) is WRONG under AQE if both jobs re-execute the sort — adaptive
    * coalescing can partition the two executions differently and silently
    * corrupt positions. Checkpointing means the counts pass and every
    * consumer read the *same materialized blocks*, so the decomposition of
    * the id is stable by construction. (`rdd.zipWithIndex` is the classic
    * alternative but costs a second full execution of the upstream plan
    * plus a Row encode/decode of every row.)
    *
    * Two deliberate performance choices, both measured on the r1 bench:
    *  - the sort is an explicit `repartitionByRange(n, keys)` + local sort,
    *    not `orderBy` — AQE coalesces an orderBy's exchange toward its
    *    advisory size, which on an interactive table collapses the
    *    checkpoint materialization onto a fraction of the cores (16 of 32
    *    at sf0.1, ~1.9× slower cold). An explicit partition count is
    *    exempt from coalescing, so materialization uses the full session
    *    parallelism;
    *  - the checkpoint is *lazy* and the per-partition counts job is the
    *    materializing action (a narrow `runJob` with no shuffle): one scan
    *    assigns blocks AND returns counts, where the old eager-pin scheme
    *    paid a full second pass over the freshly pinned table.
    *
    * The offsets ride along as a small map literal (one entry per
    * partition); at true scale positions are assigned once at load and
    * persisted (sorted/bucketed layout), not recomputed per query.
    */
  def attachPos(df: DataFrame, order: Column*): DataFrame =
    attachPosCounted(df, order: _*)._1

  /** [[attachPos]] plus the TOTAL row count, which the materializing
    * counts job computes anyway — callers that need the size (e.g. an
    * ingest append) read it here instead of paying a second scan of the
    * freshly pinned blocks.
    */
  def attachPosCounted(df: DataFrame, order: Column*): (DataFrame, Long) = {
    val spark = df.sparkSession
    val sorted = if (order.nonEmpty) {
      val nParts = math.max(spark.sessionState.conf.numShufflePartitions,
        spark.sparkContext.defaultParallelism)
      df.repartitionByRange(nParts, order: _*).sortWithinPartitions(order: _*)
    } else df
    val pinned = sorted.localCheckpoint(eager = false)
    // one job: materializes the checkpoint blocks and returns the count of
    // every partition (indices align with monotonically_increasing_id's
    // embedded partition id)
    val counts = spark.sparkContext.runJob(pinned.queryExecution.toRdd,
      (it: Iterator[_]) => { var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n })
    if (counts.isEmpty) // zero partitions
      return (pinned.withColumn(POS, lit(0L)), 0L)
    // monotonically_increasing_id = (partitionId << 33) + local row index,
    // deterministic over pinned blocks
    val pidOf = shiftright(col("__mid"), 33)
    val localOf = col("__mid").bitwiseAND(lit((1L << 33) - 1))
    var acc = 0L
    val offsets = counts.zipWithIndex.map { case (c, pid) =>
      val o = (pid.toLong, acc); acc += c; o }
    // typedLit, not map(lit, lit, ...): a MapType literal rides in the
    // codegen references array, so the generated source is identical no
    // matter what the offsets are — per-pid `lit`s would inline the values
    // as Java constants and force a fresh Janino compile for every distinct
    // partition layout (measured ~0.7 s on the first sf0.1 session open
    // after an sf0.001 warmup).
    val offsetMap = typedLit(offsets.toMap)
    (pinned.withColumn("__mid", monotonically_increasing_id())
      .withColumn(POS, localOf + element_at(offsetMap, pidOf))
      .drop("__mid"), acc)
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
