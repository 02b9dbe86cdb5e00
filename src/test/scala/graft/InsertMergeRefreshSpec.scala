package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import graft.core.{Catalog, Positional, Tables}

/** r14 optimization: a PURE-INSERT delta refreshes grouped layouts
  * (cube / pairs) by MERGING stored partials with batch-sized partials —
  * no pass over the base table — instead of the recompute path's two
  * full scans (touched-row group keys + affected-group recompute).
  * These tests pin (a) that the batch plans are retained and surfaced,
  * (b) that the merge path reads batch-plus-cells-sized data where the
  * recompute path reads the base, and (c) that every answer stays
  * digit-equal to the live aggregate in every regime (merge, merge with
  * irrelevant edits, delete fallback, merged multi-batch patches).
  */
class InsertMergeRefreshSpec extends SparkSpec {

  /** Total records read by tasks while `f` runs — pinned-block scans
    * report their reads through inputMetrics, so a refresh that scans
    * the 6k-row base is distinguishable from one that reads only the
    * batch and the group-count-sized stored cells.
    */
  private def recordsReadDuring[A](f: => A): (A, Long) = {
    @volatile var n = 0L
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          n += t.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = f
      // listener events are async; drain the bus before sampling the
      // counter (a fixed sleep undercounts under load — r14 ADVICE #3)
      org.apache.spark.sql.GraftShims.waitListenerBus(spark, 30000L)
      (r, n)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("appendRows retains the batch plan and deltaSince surfaces it") {
    val cat = new Catalog(spark)
    cat.open("imr0", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    val s = cat.get("imr0").get
    val e0 = s.epoch
    val batch = Positional.strip(s.current).limit(64)
    assert(s.appendRows(batch) == 64L)
    val d = s.deltaSince(e0).get
    assert(d.insertedRows.isDefined, "a bounded append must retain its rows")
    assert(d.insertedRows.get.count() == 64L)
    // a delete after the insert invalidates the retained-plan shortcut
    assert(s.deleteRow(0L))
    val d2 = s.deltaSince(e0).get
    assert(d2.insertedRows.isEmpty,
      "a delete since the epoch must withhold insertedRows (overcount risk)")
  }

  test("pure-insert cube refresh never scans the base; answers digit-equal") {
    val cat = new Catalog(spark)
    cat.open("imr1", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    cat.buildCubeLayout("imr1", Seq("l_returnflag", "l_linestatus"),
      Seq("l_quantity"))
    val s = cat.get("imr1").get
    val base = s.rowCount
    val batch = Positional.strip(s.current).limit(128)
    s.appendRows(batch)
    val (_, readMerge) = recordsReadDuring(cat.refreshStale("imr1"))
    assert(readMerge < base,
      s"insert-merge refresh must not scan the $base-row base " +
        s"(read $readMerge records)")
    // served answer == live recompute, digit for digit
    val routed = cat.aggregate("imr1", Seq("l_returnflag"), Seq("l_quantity"))
    assert(cat.recentRoutes.last.decision == "layout", "must serve routed")
    val live = graft.core.Catalog.cubeFinish(
      graft.core.Catalog.cubePartials(Positional.strip(s.current),
        Seq("l_returnflag"), Seq("l_quantity")),
      Seq("l_returnflag"), Seq("l_quantity"))
    assert(sortedRows(routed) == sortedRows(live))

    // non-vacuousness: a delete forces the recompute path, which DOES
    // scan the base — the instrument must see the difference
    s.deleteRow(3L)
    val (_, readRecompute) = recordsReadDuring(cat.refreshStale("imr1"))
    assert(readRecompute >= base,
      s"expected the delete-path recompute to scan the base " +
        s"($base rows), read $readRecompute — instrument broken?")
    val routed2 = cat.aggregate("imr1", Seq("l_returnflag"), Seq("l_quantity"))
    val live2 = graft.core.Catalog.cubeFinish(
      graft.core.Catalog.cubePartials(Positional.strip(s.current),
        Seq("l_returnflag"), Seq("l_quantity")),
      Seq("l_returnflag"), Seq("l_quantity"))
    assert(sortedRows(routed2) == sortedRows(live2))
  }

  test("merge survives irrelevant edits and merges multi-batch patches") {
    val cat = new Catalog(spark)
    cat.open("imr2", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    cat.buildCubeLayout("imr2", Seq("l_returnflag"), Seq("l_quantity"))
    val s = cat.get("imr2").get
    val base = s.rowCount
    val batch = Positional.strip(s.current).limit(32)
    // batch 1 + an edit to a column the cube never reads
    s.appendRows(batch)
    assert(s.setCell(0L, "l_comment_like", "x") ||
      !s.current.columns.contains("l_comment_like")) // column may not exist
    s.setCell(0L, "l_extendedprice", "9999.5") // irrelevant to this cube
    val (_, r1) = recordsReadDuring(cat.refreshStale("imr2"))
    assert(r1 < base, s"irrelevant edits must not defeat the merge ($r1)")
    // batch 2 against the now-patched layout: merge folds the old patch
    s.appendRows(batch)
    val (_, r2) = recordsReadDuring(cat.refreshStale("imr2"))
    assert(r2 < base, s"second merge must fold the existing patch ($r2)")
    val routed = cat.aggregate("imr2", Seq("l_returnflag"), Seq("l_quantity"))
    val live = graft.core.Catalog.cubeFinish(
      graft.core.Catalog.cubePartials(Positional.strip(s.current),
        Seq("l_returnflag"), Seq("l_quantity")),
      Seq("l_returnflag"), Seq("l_quantity"))
    assert(sortedRows(routed) == sortedRows(live))
  }

  test("pure-insert pairs refresh is batch-sized and stays exact") {
    val cat = new Catalog(spark)
    cat.open("imr3", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    cat.buildPairsLayout("imr3", Seq("l_returnflag"), "l_suppkey")
    val s = cat.get("imr3").get
    val base = s.rowCount
    s.appendRows(Positional.strip(s.current).limit(64))
    val (_, read) = recordsReadDuring(cat.refreshStale("imr3"))
    assert(read < base,
      s"pairs insert-merge must not scan the $base-row base ($read)")
    val routed = cat.distinctCount("imr3", Seq("l_returnflag"), "l_suppkey")
    assert(cat.recentRoutes.last.decision == "layout", "must serve routed")
    val live = Positional.strip(s.current)
      .groupBy("l_returnflag")
      .agg(count_distinct(col("l_suppkey")).as("cd_l_suppkey"))
    assert(sortedRows(routed) == sortedRows(live))
  }
}
