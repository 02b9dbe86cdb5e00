package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Behavior, Merge}

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "t_ms", "event_type")
      .select(col("user_id"), timestamp_millis(col("t_ms")).as("ts"),
        col("event_type"))

  test("funnel requires strict in-order completion") {
    // u1 completes all three; u2 clicks before viewing (click doesn't
    // count, and there is no later click); u3 views only.
    val e = ev(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 10L, "click"), (2L, 20L, "view"), (2L, 5L, "purchase"),
      (3L, 10L, "view"))
    val got = Behavior.funnel(e, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).collect()
    assert(got.toSeq === Seq(
      Row(1, "view", 3L), Row(2, "click", 1L), Row(3, "purchase", 1L)))
  }

  test("stateful funnel == cascade funnel on any partitioning/arrival order") {
    val stages = Seq("view", "click", "purchase")
    def rollup(sr: org.apache.spark.sql.DataFrame): Seq[(Int, Long)] =
      stages.indices.map { i =>
        (i + 1, sr.filter(col("stage") >= i + 1).count())
      }
    val base = Tables.loadEvents(spark, sf)
    val cascade = Behavior.funnel(base, "user_id", "ts", "event_type", stages)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    Seq(base, base.repartition(7), base.orderBy(col("ts").desc))
      .foreach { arrangement =>
        val got = rollup(graft.streaming.EventStreams
          .funnelStateful(arrangement, stages).toDF())
        assert(got == cascade, s"stateful diverged: $got vs $cascade")
      }
  }

  test("stateful funnel re-anchors on an out-of-order earlier stage-1 event") {
    // events arrive purchase-first; the chain only closes because the
    // state replays, not cursors forward
    val e = ev((1L, 30L, "purchase"), (1L, 20L, "click"), (1L, 10L, "view"))
    val got = graft.streaming.EventStreams
      .funnelStateful(e, Seq("view", "click", "purchase"))
      .collect().map(s => (s.user_id, s.stage)).toSeq
    assert(got == Seq((1L, 3)))
  }

  test("stage events at the exact same timestamp do not advance the funnel") {
    val e = ev((1L, 10L, "view"), (1L, 10L, "click"))
    val got = Behavior.funnel(e, "user_id", "ts", "event_type",
      Seq("view", "click")).collect()
    assert(got.toSeq === Seq(Row(1, "view", 1L), Row(2, "click", 0L)))
  }

  test("greedy earliest-match can miss sequences a lenient matcher finds") {
    // view@10, click@15, view@20, click@25, purchase@12: greedy anchors on
    // view@10 then click@15, so purchase@12 (before the click) never counts.
    val e = ev((1L, 10L, "view"), (1L, 15L, "click"), (1L, 20L, "view"),
      (1L, 25L, "click"), (1L, 12L, "purchase"))
    val got = Behavior.funnel(e, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).collect()
    assert(got.map(_.getLong(2)).toSeq === Seq(1L, 1L, 0L))
  }
}

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  test("weekly retention buckets users by first-seen week") {
    // 2024-01-01 and 2024-01-08 are both Mondays.
    val e = Seq(
      (1L, "2024-01-02 10:00:00"), (1L, "2024-01-09 10:00:00"),
      (2L, "2024-01-03 10:00:00"),
      (3L, "2024-01-10 10:00:00"))
      .toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val got = Behavior.weeklyRetention(e, "user_id", "ts").collect()
    assert(got.toSeq === Seq(
      Row("2024-01-01", 0, 2L), // u1+u2 in the Jan-1 cohort, week 0
      Row("2024-01-01", 1, 1L), // u1 returns in week 1
      Row("2024-01-08", 0, 1L))) // u3's own cohort
  }

  test("multiple events in one week count once") {
    val e = Seq((1L, "2024-01-02 10:00:00"), (1L, "2024-01-04 11:00:00"))
      .toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val got = Behavior.weeklyRetention(e, "user_id", "ts").collect()
    assert(got.toSeq === Seq(Row("2024-01-01", 0, 1L)))
  }
}

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("resampleHourly zero-fills counts and forward-fills values") {
    val e = Seq(
      ("a", "2024-01-01 00:10:00", 1.0),
      ("a", "2024-01-01 00:40:00", 2.0),
      // hour 01 empty for a; b only exists at hour 02
      ("a", "2024-01-01 02:30:00", 5.0),
      ("b", "2024-01-01 02:00:00", 7.0))
      .toDF("k", "s", "v")
      .select(col("k"), col("s").cast("timestamp").as("ts"), col("v"))
    val got = Behavior.resampleHourly(e, "k", "ts", "v").collect()
    assert(got.toSeq === Seq(
      Row("a", "2024-01-01 00:00", 2L, 3.0),
      Row("a", "2024-01-01 01:00", 0L, 3.0), // gap: count 0, value carried
      Row("a", "2024-01-01 02:00", 1L, 5.0),
      Row("b", "2024-01-01 00:00", 0L, null), // before b's first value
      Row("b", "2024-01-01 01:00", 0L, null),
      Row("b", "2024-01-01 02:00", 1L, 7.0)))
  }
}

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  test("scd2History chains validity intervals per key") {
    val chg = Seq((1L, 101L, "2024-01-01"), (1L, 102L, "2024-02-01"),
      (2L, 201L, "2024-03-01"))
      .toDF("k", "id", "d").select(col("k"), col("id"),
        col("d").cast("timestamp").as("d"))
    val got = Merge.scd2History(chg, Seq("k"), "d", Seq("id"))
      .select(col("k"), col("id"), col("version"),
        date_format(col("valid_from"), "yyyy-MM-dd").as("f"),
        date_format(col("valid_to"), "yyyy-MM-dd").as("t"),
        col("is_current"))
      .orderBy("k", "version").collect()
    assert(got.toSeq === Seq(
      Row(1L, 101L, 1, "2024-01-01", "2024-02-01", 0),
      Row(1L, 102L, 2, "2024-02-01", null, 1),
      Row(2L, 201L, 1, "2024-03-01", null, 1)))
  }

  test("ties on the order column are broken deterministically") {
    val chg = Seq((1L, 2L, "2024-01-01"), (1L, 1L, "2024-01-01"))
      .toDF("k", "id", "d").select(col("k"), col("id"),
        col("d").cast("timestamp").as("d"))
    val got = Merge.scd2History(chg, Seq("k"), "d", Seq("id"))
      .orderBy("version").select("id", "version", "is_current").collect()
    assert(got.toSeq === Seq(Row(1L, 1, 0), Row(2L, 2, 1)))
  }
}

class OrcRoundtripSpec extends SparkSpec {
  test("orc write/read preserves rows and schema") {
    val out = java.nio.file.Files.createTempDirectory("orc_spec_")
      .toString + "/supplier.orc"
    val src = Tables.load(spark, sf, "supplier")
    graft.io.Formats.write(src, out)
    val back = graft.io.Formats.read(spark, out)
    assert(back.schema === src.schema)
    assert(back.orderBy("s_suppkey").collect().toSeq ===
      src.orderBy("s_suppkey").collect().toSeq)
  }
}

class ShardingSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Sharding

  test("shard index is floor(exclusive prior tokens / budget) in id order") {
    val d = Seq((1L, 100L), (2L, 400L), (3L, 600L), (4L, 50L))
      .toDF("doc_id", "n")
    val got = Sharding.shardByTokenBudget(d, "doc_id", col("n"), 500L)
      .orderBy("doc_id").collect()
    // priors: 0, 100, 500, 1100 → shards 0, 0, 1, 2
    assert(got.map(_.getInt(2)).toSeq === Seq(0, 0, 1, 2))
  }

  test("input partitioning does not change the plan") {
    val d = (1L to 200L).map(i => (i, (i % 37) + 5)).toDF("doc_id", "n")
    val a = Sharding.shardByTokenBudget(d, "doc_id", col("n"), 300L)
      .orderBy("doc_id").collect().toSeq
    val b = Sharding.shardByTokenBudget(d.repartition(7), "doc_id",
      col("n"), 300L).orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("shuffleOrder is a partitioning-stable permutation; new seed reorders") {
    val d = (1L to 300L).toDF("doc_id")
    val a = Sharding.shuffleOrder(d, "doc_id", seed = 7L, nShards = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    // permutation: every doc exactly once, per-shard positions are 1..n
    assert(a.map(_._1).toSet.size == 300)
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted == (1 to rows.size),
        s"shard $shard positions not contiguous")
    }
    // stable under input partitioning (the md5 key, not row order, decides)
    val b = Sharding.shuffleOrder(d.repartition(7), "doc_id", 7L, 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(a === b)
    // a different seed is a genuinely different epoch order
    val c = Sharding.shuffleOrder(d, "doc_id", seed = 8L, nShards = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(a !== c)
  }
}

class ShardingNullSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Sharding

  test("null token counts are clamped to zero, not dropped or corrupting") {
    val d = Seq((1L, Some(100L)), (2L, None), (3L, Some(450L)))
      .toDF("doc_id", "n")
    val got = Sharding.shardByTokenBudget(d, "doc_id", col("n"), 500L)
      .orderBy("doc_id").collect()
    // priors: 0, 100, 100 → shards 0, 0, 0; all three docs present
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ===
      Seq((1L, 100L, 0), (2L, 0L, 0), (3L, 450L, 0)))
  }
}
