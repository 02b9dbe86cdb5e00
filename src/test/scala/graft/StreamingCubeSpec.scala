package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Catalog, Tables}
import graft.streaming.EventStreams

/** Streaming-maintained aggregate cube ([[EventStreams.cubeMaintain]]):
  * per-batch partials merge into an at-rest cube whose final state must
  * equal the one-shot batch aggregate — for ANY batching and ANY arrival
  * order, because every stored statistic is a commutative merge.
  */
class StreamingCubeSpec extends SparkSpec {

  private def writeSlices(df: DataFrame, splitCol: String,
                          slices: Int, reverse: Boolean): String = {
    val scratch = java.nio.file.Files
      .createTempDirectory("st_cube_spec_").toString + "/src"
    val order = if (reverse) (slices - 1) to 0 by -1 else 0 until slices
    order.foreach { i =>
      df.filter(pmod(col(splitCol), lit(slices)) === i)
        .drop(splitCol)
        .coalesce(1).write.mode("append").parquet(scratch)
      Thread.sleep(20) // distinct mtimes → deterministic arrival order
    }
    scratch
  }

  private def batchCube(df: DataFrame): Seq[Seq[Any]] =
    Catalog.cubeFinish(
      Catalog.cubePartials(df, Seq("event_type"), Seq("value")),
      Seq("event_type"), Seq("value"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq

  test("maintained cube equals the one-shot batch aggregate, for any arrival order") {
    val ev = Tables.loadEvents(spark, sf)
      .select("event_id", "event_type", "value")
    val expected = batchCube(ev.drop("event_id"))
    assert(expected.nonEmpty)

    val fwd = writeSlices(ev, "event_id", slices = 3, reverse = false)
    val cubeF = EventStreams.cubeMaintain(spark, fwd, Seq("event_type"),
      Seq("value"), "st_cube_spec_fwd")
    assert(Catalog.cubeFinish(cubeF, Seq("event_type"), Seq("value"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq == expected,
      "3 merged micro-batches must reproduce the batch aggregate exactly")
    // the at-rest state is cube-sized: one row per live group
    assert(cubeF.count() ==
      ev.select("event_type").distinct().count(),
      "maintained state must be one row per group, never data-sized")

    val rev = writeSlices(ev, "event_id", slices = 3, reverse = true)
    val cubeR = EventStreams.cubeMaintain(spark, rev, Seq("event_type"),
      Seq("value"), "st_cube_spec_rev")
    assert(Catalog.cubeFinish(cubeR, Seq("event_type"), Seq("value"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq == expected,
      "arrival order must not change a single digit — all merges commute")
  }

  test("maintained HLL sketch: arrival-order invariant, estimate equals the batch-built layout's routed path") {
    val ev = Tables.loadEvents(spark, sf)
      .select("event_id", "event_type", "user_id")

    // the comparison target: a batch-BUILT sketch layout, served through
    // the catalog's routed union+estimate path
    val cat = new Catalog(spark)
    cat.openFrom("ev_sk", ev, orderCols = Seq("event_id"))
    cat.buildSketchLayout("ev_sk", Seq("event_type"), "user_id", lgK = 12)
    val routed = cat.approxDistinct("ev_sk", Seq("event_type"), "user_id",
        lgK = 12)
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(cat.recentRoutes.exists(r =>
      r.slot == "sketch:event_type:user_id" && r.reason == "routed"))

    // the maintained state estimates through the SAME union+estimate
    // expression the routed branch uses: identical registers (max is
    // associative) ⇒ identical digits
    def estimates(maintained: DataFrame): Seq[Seq[Any]] = maintained
      .groupBy("event_type")
      .agg(hll_sketch_estimate(
        hll_union_agg(col("__hll"), lit(false))).as("nd_user_id"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq

    val fwd = writeSlices(ev, "event_id", slices = 3, reverse = false)
    val mF = EventStreams.sketchMaintain(spark, fwd, Seq("event_type"),
      "user_id", 12, "st_sketch_spec_fwd")
    assert(mF.count() == ev.select("event_type").distinct().count(),
      "maintained state must be one sketch row per group, never data-sized")
    assert(estimates(mF) == routed,
      "the stream-maintained estimate must equal the batch-built layout's")

    val rev = writeSlices(ev, "event_id", slices = 3, reverse = true)
    val mR = EventStreams.sketchMaintain(spark, rev, Seq("event_type"),
      "user_id", 12, "st_sketch_spec_rev")
    assert(estimates(mR) == routed,
      "arrival order must not move the estimate — register max commutes")
  }

  test("quantiles serve exactly from a stream-maintained value-histogram cube") {
    // a cube whose group columns include the (binned) value column is a
    // value-level histogram; because its cell counts are commutative
    // merges, the streaming maintenance that keeps sums fresh keeps
    // ORDER STATISTICS fresh too — no new machinery
    val ev = Tables.loadEvents(spark, sf)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 1).as("vbin"))
    val probes = Seq("med" -> 0.5, "p90" -> 0.9)
    val expected = graft.operators.RankStats.exactPercentiles(
        ev.drop("event_id"), col("vbin"), Seq("event_type"), probes)
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(expected.nonEmpty)

    val src = writeSlices(ev, "event_id", slices = 3, reverse = true)
    val hist = EventStreams.cubeMaintain(spark, src,
      Seq("event_type", "vbin"), Nil, "st_hist_spec")
    assert(hist.count() ==
      ev.select("event_type", "vbin").distinct().count(),
      "maintained state must be one row per (group, value) cell")
    val served = graft.operators.RankStats.percentilesOfHist(
      hist.groupBy(col("event_type"), col("vbin").as("__v"))
        .agg(sum(col("__cnt")).as("__m")),
      Seq("event_type"), probes)
    assert(served.orderBy("event_type").collect().map(_.toSeq).toSeq ==
      expected,
      "quantiles from stream-merged cells must equal the one-shot walk")
  }
}
