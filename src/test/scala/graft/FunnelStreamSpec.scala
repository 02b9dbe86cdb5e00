package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** True-STREAMING contract of funnelStateful (the batch side is pinned by
  * e_funnel_stateful's oracle): the output is an append-only depth-INCREASE
  * log — a micro-batch that brings events but no new depth emits nothing —
  * and per-user state is evicted once the watermark passes the attribution
  * horizon.
  */
class FunnelStreamSpec extends SparkSpec {

  private val stages = Seq("view", "cart", "purchase")
  private def ts(min: Long) =
    new java.sql.Timestamp(1700000000000L + min * 60000L)

  test("streaming funnel emits only on depth change, once per new depth") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = EventStreams.funnelStateful(
      mem.toDF.toDF("user_id", "ts", "event_type"), stages)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("spec_funnel_stream").start()
    try {
      def rows() = spark.table("spec_funnel_stream")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq

      // batch 1: user 1 views -> depth 1 emitted
      mem.addData((1L, ts(0), "view")); q.processAllAvailable()
      assert(rows() == Seq((1L, 1)))
      // batch 2: user 1 views AGAIN -> new events, same depth, NO emission
      mem.addData((1L, ts(5), "view")); q.processAllAvailable()
      assert(rows() == Seq((1L, 1)), "re-emitted an unchanged depth")
      // batch 3: cart + purchase arrive together -> one emission at the
      // new deepest stage, not one per stage
      mem.addData((1L, ts(10), "cart"), (1L, ts(15), "purchase"))
      q.processAllAvailable()
      assert(rows().sorted == Seq((1L, 1), (1L, 3)).sorted)
      // the downstream rollup contract: per-user MAX depth
      val byUser = rows().groupBy(_._1).map { case (u, rs) =>
        (u, rs.map(_._2).max) }
      assert(byUser == Map(1L -> 3))
    } finally q.stop()
  }

  test("streaming funnel evicts abandoned state past the horizon; a returning user restarts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = EventStreams.funnelStateful(
      mem.toDF.toDF("user_id", "ts", "event_type"), stages, horizonHours = 1)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("spec_funnel_evict").start()
    try {
      def rows() = spark.table("spec_funnel_evict")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      // user 1 reaches depth 2, then goes quiet
      mem.addData((1L, ts(0), "view"), (1L, ts(1), "cart"))
      q.processAllAvailable()
      assert(rows() == Seq((1L, 2)))
      // another user far in the future advances the watermark (1h delay)
      // beyond user 1's last event + 1h horizon; the timeout fires while
      // the NEXT batch processes
      mem.addData((2L, ts(300), "view")); q.processAllAvailable()
      mem.addData((2L, ts(310), "view")); q.processAllAvailable()
      // user 1 returns AFTER eviction with a purchase: the chain restarted,
      // so a bare stage-3 event cannot emit (no stage-1 anchor in state)
      mem.addData((1L, ts(320), "purchase")); q.processAllAvailable()
      assert(rows().sorted == Seq((1L, 2), (2L, 1)).sorted,
        s"evicted user's purchase must not extend a forgotten chain: ${rows()}")
      // but a fresh view re-anchors a NEW chain at depth 1... which is a
      // depth the old chain already emitted — the high-water mark died
      // with the state, so the fresh chain reports its own progress
      mem.addData((1L, ts(321), "view")); q.processAllAvailable()
      assert(rows().count { case (u, d) => u == 1L && d == 1 } == 1,
        s"fresh chain after eviction reports depth 1 once: ${rows()}")
    } finally q.stop()
  }
}
