package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.io.Bucketing
import graft.operators.{Behavior, Graph, Merge, SkewJoin}
import graft.streaming.EventStreams

/** Event-sequence analytics (funnel, retention), SCD2 dimension history,
  * the salted skew join, and the ORC scan/sink — beyond-parity pipeline
  * surface per SURVEY.md §7.5. Oracle SQL mirrors each query
  * expression-for-expression; event timestamps are truncated to
  * microseconds in the oracle because Spark reads the ns-precision events
  * table at microsecond resolution (see [[graft.core.Tables.loadEvents]])
  * while DuckDB keeps nanos.
  */
object BehaviorQueries {

  private def events(s: SparkSession, dir: String) = Tables.loadEvents(s, dir)

  /** st_funnel's time-sliced scratch copy of the events table, memoized
    * per sfDir (path, horizonHours) — built once per JVM, like the ANN
    * layout caches in PipelineQueries.
    */
  private val stFunnelScratch =
    scala.collection.concurrent.TrieMap[String, (String, Int)]()

  /** The time-sliced scratch copy of (event_type, value) shared by the
    * streaming-maintenance queries (st_cube, st_pairs), memoized per
    * sfDir like [[stFunnelScratch]]: the events table split into 4
    * time-ordered parquet files with distinct mtimes, so maxFilesPerTrigger
    * replays a deterministic micro-batch arrival.
    */
  private val stCubeScratch =
    scala.collection.concurrent.TrieMap[String, String]()

  private def stCubeScratchFor(s: SparkSession, dir: String): String =
    stCubeScratch.getOrElseUpdate(dir, {
      val ev = events(s, dir).select(col("event_type"), col("value"),
        unix_micros(col("ts")).as("us"))
      val b = ev.agg(min("us").as("lo"), max("us").as("hi")).head()
      val (lo, hi) = (b.getLong(0), b.getLong(1))
      val root = java.nio.file.Files.createTempDirectory("st_cube_src_")
      graft.core.Catalog.registerTempDir(root)
      val scratch = root.toString + "/events"
      val slices = 4
      for (i <- 0 until slices) {
        val from = lo + (hi - lo + 1) * i / slices
        val until = lo + (hi - lo + 1) * (i + 1) / slices
        ev.filter(col("us") >= from && col("us") < until)
          .select("event_type", "value")
          .coalesce(1).write.mode("append").parquet(scratch)
        Thread.sleep(20) // distinct mtimes → deterministic arrival order
      }
      scratch
    })

  // j_catalog_bucketed's catalog (two sessions + bucketed layouts)
  // memoizes per (SparkSession, sfDir) through [[SessionScoped]] — a
  // cached Catalog holds that session's managed tables, so it must never
  // be served to another.

  /** Closed-form z-score from decimal moments — single Spark-side copy;
    * the SQL twin is [[OracleIdioms.zScoreSql]]. Callers guard n > 1 and
    * positive variance.
    */
  private def zCol(x: org.apache.spark.sql.Column,
                   n: org.apache.spark.sql.Column,
                   sx: org.apache.spark.sql.Column,
                   sxx: org.apache.spark.sql.Column) =
    round((x - sx / n) / sqrt((sxx - sx * sx / n) / (n - lit(1.0))), 6)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    /** Ordered view → click → purchase funnel: per-stage completion counts
      * under greedy earliest-match semantics. Aggregation cascade keyed on
      * the user — no per-user event list, no data-sized build side.
      */
    "e_funnel" -> ((s, dir) =>
      Behavior.funnel(events(s, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))),

    /** The funnel as a custom-state operator: per-user
      * flatMapGroupsWithState replays the greedy earliest-anchor chain
      * from a compact per-user event list (the state an out-of-order
      * stream needs — see [[graft.streaming.EventStreams.funnelStateful]]),
      * then a stage rollup. Registered against the SAME oracle as
      * e_funnel: the two execution strategies must land on identical
      * semantics.
      */
    "e_funnel_stateful" -> ((s, dir) => {
      val stages = Seq("view", "click", "purchase")
      val r = EventStreams.funnelStateful(events(s, dir), stages).toDF()
      val counts = r.groupBy("stage").agg(count(lit(1)).as("m"))
      stages.indices.map { i =>
        val k = i + 1
        counts.filter(col("stage") >= k)
          .agg(coalesce(sum("m"), lit(0L)).as("users"))
          .select(lit(k).as("stage"), lit(stages(i)).as("event_type"),
            col("users"))
      }.reduce(_ unionByName _).orderBy("stage")
    }),

    /** The funnel as a REAL streaming query: the events table is copied
      * once into a time-sliced multi-file scratch dir (4 slices written in
      * event-time order with distinct mtimes), streamed back with
      * `maxFilesPerTrigger=1` — so [[EventStreams.funnelStateful]] runs
      * under `Trigger.AvailableNow` across SEVERAL micro-batches with the
      * 1-hour watermark advancing and per-user EventTimeTimeout eviction
      * armed (the streaming branch, not the batch NoTimeout path
      * e_funnel_stateful takes). The horizon is sized to the fixture's
      * span (the attribution window covers the whole campaign), so no
      * state evicts mid-chain and the output must land on the SAME
      * single-copy cascade the e_funnel oracle checks; sub-span horizons
      * and actual eviction/re-anchor behavior are pinned in
      * FunnelStreamSpec. Rollup follows the operator's stream contract:
      * per-user MAX depth (a user deepening across micro-batches emits
      * once per new depth), then cumulative stage counts.
      */
    "st_funnel" -> ((s, dir) => {
      val stages = Seq("view", "click", "purchase")
      val (path, horizonH) = stFunnelScratch.getOrElseUpdate(dir, {
        val ev = events(s, dir).select("user_id", "ts", "event_type")
        val b = ev.agg(min(unix_micros(col("ts"))).as("lo"),
          max(unix_micros(col("ts"))).as("hi")).head()
        val (lo, hi) = (b.getLong(0), b.getLong(1))
        val root = java.nio.file.Files.createTempDirectory("st_funnel_")
        graft.core.Catalog.registerTempDir(root)
        val scratch = root.toString + "/events"
        val slices = 4
        for (i <- 0 until slices) {
          val from = lo + (hi - lo + 1) * i / slices
          val until = lo + (hi - lo + 1) * (i + 1) / slices
          ev.filter(unix_micros(col("ts")) >= from &&
              unix_micros(col("ts")) < until)
            .coalesce(1).write.mode("append").parquet(scratch)
          Thread.sleep(20) // distinct mtimes → deterministic arrival order
        }
        (scratch, ((hi - lo) / 3600000000L + 48).toInt)
      })
      val r = EventStreams.runAvailableNow(s, path,
        st => EventStreams.funnelStateful(st, stages,
          horizonHours = horizonH).toDF(),
        "st_funnel", outputMode = "append",
        sourceOptions = Map("maxFilesPerTrigger" -> "1"))
      val counts = r.groupBy("user_id").agg(max("stage").as("depth"))
        .groupBy("depth").agg(count(lit(1)).as("m"))
      stages.indices.map { i =>
        val k = i + 1
        counts.filter(col("depth") >= k)
          .agg(coalesce(sum("m"), lit(0L)).as("users"))
          .select(lit(k).as("stage"), lit(stages(i)).as("event_type"),
            col("users"))
      }.reduce(_ unionByName _).orderBy("stage")
    }),

    /** Streaming-maintained aggregate cube: the events table arrives as
      * 4 time-ordered micro-batches and
      * [[graft.streaming.EventStreams.cubeMaintain]] folds each into an
      * at-rest cube of commutative partials (count + decimal sums +
      * min/max per group) — the streaming side of the catalog cube's
      * IVM. Because every partial is order-free, the maintained cube is
      * IDENTICAL to the one-shot batch aggregate, which is exactly what
      * the oracle checks.
      */
    "st_cube" -> ((s, dir) => {
      val path = stCubeScratchFor(s, dir)
      graft.core.Catalog.cubeFinish(
        EventStreams.cubeMaintain(s, path, Seq("event_type"), Seq("value"),
          "st_cube"),
        Seq("event_type"), Seq("value"))
        .orderBy("event_type")
    }),

    /** Streaming-maintained distinct pairs: the same 4 micro-batch
      * arrival as st_cube, folded by [[graft.streaming.EventStreams
      * .pairsMaintain]] into the at-rest distinct (event_type, value)
      * set — the stream side of the round-10 pairs layout. Distinct is
      * idempotent and order-free, so the exact COUNT(DISTINCT) served
      * from the maintained pairs equals the one-shot batch answer,
      * which is what the oracle checks.
      */
    "st_pairs" -> ((s, dir) => {
      EventStreams.pairsMaintain(s, stCubeScratchFor(s, dir),
          Seq("event_type"), "value", "st_pairs")
        .groupBy("event_type")
        .agg(count_distinct(col("value")).as("cd_value"))
        .orderBy("event_type")
    }),

    /** Streaming INGESTION end-to-end (the CDC/append loop): a third of
      * the lineitem table opens a catalog session with a cube layout;
      * the other two thirds arrive as micro-batches through
      * [[graft.streaming.EventStreams.appendMaintain]], each batch
      * APPENDED to the session (position-stamped row INSERT) and the
      * layouts refreshed — delta-patched while the batch fits the delta
      * bound, rebuilt past it, either way exact. The routed aggregate
      * must then serve original ∪ batches, which is exactly what the
      * one-shot oracle over the full table checks.
      */
    "st_ingest" -> ((s, dir) => {
      val cat = SessionScoped.memo(s, s"stIngest:$dir") {
        val full = Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_returnflag",
            "l_linestatus", "l_quantity")
        val scratch = java.nio.file.Files
          .createTempDirectory("st_ingest_").toString
        full.filter(pmod(col("l_orderkey"), lit(3)) === 0)
          .coalesce(1).write.parquet(s"$scratch/head")
        (1 until 3).foreach { i =>
          full.filter(pmod(col("l_orderkey"), lit(3)) === i)
            .coalesce(1).write.mode("append").parquet(s"$scratch/feed")
          Thread.sleep(20) // distinct mtimes → deterministic order
        }
        val c = new graft.core.Catalog(s)
        c.openFrom("st_ing", s.read.parquet(s"$scratch/head"),
          Seq("l_orderkey", "l_linenumber"))
        c.buildCubeLayout("st_ing", Seq("l_returnflag", "l_linestatus"),
          Seq("l_quantity"))
        EventStreams.appendMaintain(s, s"$scratch/feed", c, "st_ing",
          "st_ingest")
        c
      }
      cat.aggregate("st_ing", Seq("l_returnflag"), Seq("l_quantity"))
        .select(col("l_returnflag"), col("n"),
          col("sum_l_quantity").as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    /** Time-boxed funnel: each stage within 24 hours of the previous —
      * the conversion-velocity question the unbounded e_funnel can't
      * answer. Same aggregation-cascade shape; see
      * [[graft.operators.Behavior.funnelWindowed]].
      */
    "e_funnel_windowed" -> ((s, dir) =>
      Behavior.funnelWindowed(events(s, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), window = "24 HOURS")),

    /** Weekly cohort retention triangle over the events table. */
    "e_retention" -> ((s, dir) =>
      Behavior.weeklyRetention(events(s, dir), "user_id", "ts")),

    /** SCD2 history: the orders change-log becomes a versioned per-customer
      * dimension with validity intervals — one exchange + sort shared by
      * `row_number` and `lead`.
      */
    "o_scd2" -> ((s, dir) =>
      Merge.scd2History(
        Tables.load(s, dir, "orders")
          .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"),
        keys = Seq("o_custkey"), orderCol = "o_orderdate",
        tieBreak = Seq("o_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("version"),
          date_format(col("valid_from"), "yyyy-MM-dd").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd").as("valid_to"),
          col("is_current"))
        .orderBy("o_custkey", "version")),

    /** Salted skew join lineitem ⋈ orders: the hot-key mitigation path.
      * Salting redistributes each key over 8 reducers; the aggregate after
      * it is salt-oblivious, so the oracle is the plain join.
      */
    "j_skew" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      SkewJoin.saltedInnerJoin(li, o, "l_orderkey", salts = 8,
        saltSource = struct(col("l_orderkey"), col("l_linenumber")))
        .groupBy("o_orderpriority")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    /** Hourly resample of the events table with a dense grid: zero-filled
      * counts + forward-filled hourly value sums (distributed
      * `resample().ffill()`).
      */
    "e_gapfill" -> ((s, dir) =>
      Behavior.resampleHourly(events(s, dir), "event_type", "ts", "value")),

    /** 2-D histogram (heatmap feed) over lineitem: price × quantity
      * buckets — the two-column generalization of v3_histogram, one hash
      * aggregate over scan-local bucket keys.
      */
    "v5_heatmap" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(
          floor(col("l_extendedprice") / 10000).cast("int")
            .as("price_bucket"),
          floor(col("l_quantity") / 10).cast("int").as("qty_bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
            .as("price_sum"))
        .orderBy("price_bucket", "qty_bucket")),

    /** Engagement: per-week WAU, average DAU, and the DAU/WAU stickiness
      * ratio. One distinct pass over (user, day) feeds both sides; every
      * aggregate after it is over day- or week-sized frames.
      */
    "e_dau_wau" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"),
        date_trunc("day", col("ts")).as("__day"),
        date_trunc("week", col("ts")).as("__wk")).distinct()
      val daily = e.groupBy("__wk", "__day").agg(count(lit(1)).as("dau"))
      val weekly = e.select("user_id", "__wk").distinct()
        .groupBy("__wk").agg(count(lit(1)).as("wau"))
      daily.groupBy("__wk")
        .agg(sum("dau").as("sdau"), count(lit(1)).as("nd"))
        .join(weekly, "__wk")
        .select(date_format(col("__wk"), "yyyy-MM-dd").as("week"),
          col("wau"),
          round(col("sdau").cast("double") / col("nd"), 6).as("avg_dau"),
          round((col("sdau").cast("double") / col("nd")) / col("wau"), 6)
            .as("stickiness"))
        .orderBy("week")
    }),

    /** Per-user event-type Markov transitions: lag over (ts, event_id)
      * gives each event its predecessor type; counts aggregate globally
      * and the row-conditional probability normalizes over the tiny
      * transition matrix, not the event stream.
      */
    "e_markov" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val trans = events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("__prev", lag("event_type", 1).over(w))
        .filter(col("__prev").isNotNull)
        .groupBy(col("__prev").as("from_type"),
          col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val byFrom = org.apache.spark.sql.expressions.Window
        .partitionBy("from_type")
      trans.select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / sum("n").over(byFrom).cast("double"),
          6).as("p"))
        .orderBy("from_type", "to_type")
    }),

    /** PageRank over the event-type transition graph — the Markov edge
      * counts fed through [[Graph.pageRankScaled]]'s exact fixed-point
      * power iteration. Ranks are BIGINT multiples of 1e-12, so an
      * iterative float-free distributed algorithm hash-matches a SQL
      * oracle (10 unrolled iterations in DuckDB) bit-for-bit.
      */
    "g_pagerank" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val edges = events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("__prev", lag("event_type", 1).over(w))
        .filter(col("__prev").isNotNull)
        .groupBy(col("__prev").as("src"), col("event_type").as("dst"))
        .agg(count(lit(1)).as("n"))
      Graph.pageRankScaled(edges, "src", "dst", "n", iterations = 10)
        .orderBy("node")
    }),

    /** Semi-structured extraction: pull a typed field out of the `props`
      * JSON column (codegen'd `get_json_object`, no UDF) and aggregate it
      * per event type — the event-payload analytics every product
      * pipeline runs. Parse failures surface as nulls (`n` vs `n_parsed`
      * makes the failure count visible); the average is computed as
      * exact-int sum / count so no float accumulation order exists.
      */
    "e_props_extract" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          count(col("k")).as("n_parsed"),
          sum(coalesce(col("k"), lit(0L))).as("sum_k"))
        .select(col("event_type"), col("n"), col("n_parsed"), col("sum_k"),
          when(col("n_parsed") > 0,
            round(col("sum_k").cast("double") /
              col("n_parsed").cast("double"), 6)).as("avg_k"))
        .orderBy("event_type")),

    /** First-touch conversion attribution: conversion credit to the
      * channel of each user's first event; (ts, event_id) total order
      * makes "first" deterministic.
      */
    "e_attribution" -> ((s, dir) =>
      Behavior.firstTouchAttribution(events(s, dir), "user_id", "ts",
        "event_id", "event_type", "purchase")
        .orderBy("channel")),

    /** Power-user concentration: the share of all events produced by the
      * top decile of users. No global ranking exists anywhere in the plan:
      * because every user tied at the decile-cut activity level
      * contributes the same count, the aggregate is fully determined by
      * the *histogram of activity levels* (groupBy(n) — one row per
      * distinct per-user count, bounded by the busiest user's total, a
      * control-plane read like the positional offsets). The old
      * row_number() over an unpartitioned window funneled the data-sized
      * per-user relation through one task; this shape is two keyed
      * aggregates and driver math on a tiny relation.
      */
    "e_power_users" -> ((s, dir) => {
      val perUser = events(s, dir).groupBy("user_id")
        .agg(count(lit(1)).as("n"))
      val hist = perUser.groupBy("n").agg(count(lit(1)).as("users"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
      import s.implicits._
      if (hist.isEmpty)
        Seq.empty[(Long, Long, Long, Long)]
          .toDF("n_users", "n_events", "top_users", "top_events")
          .withColumn("top_decile_share", lit(0.0))
      else {
        val nUsers = hist.map(_._2).sum
        val nEvents = hist.map { case (n, u) => n * u }.sum
        val k = math.ceil(nUsers.toDouble / 10).toLong
        var remaining = k
        var topEvents = 0L
        hist.foreach { case (n, u) =>
          if (remaining > 0) {
            val take = math.min(u, remaining)
            topEvents += take * n
            remaining -= take
          }
        }
        Seq((nUsers, nEvents, k, topEvents))
          .toDF("n_users", "n_events", "top_users", "top_events")
          .withColumn("top_decile_share",
            round(col("top_events").cast("double") /
              col("n_events").cast("double"), 6))
      }
    }),

    /** Revenue Pareto (80/20) report: the share of total order revenue
      * carried by orders above the exact p90/p95/p99 value thresholds —
      * how concentrated the book is. Thresholds come from one percentile
      * pass (a4 idiom, a21's sketch is the stated 100 TB path) and
      * broadcast into a single conditional decimal aggregate; everything
      * else is integer/decimal until the share divisions.
      */
    "e_pareto" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      // thresholds via the RankStats crossing walk (no Percentile
      // aggregate — prices are a continuous domain; see a4_percentile)
      val qs = graft.operators.RankStats.exactPercentiles(o,
          col("o_totalprice"), Nil,
          Seq("__p90" -> 0.90, "__p95" -> 0.95, "__p99" -> 0.99))
        .select(round(col("__p90"), 6).as("p90"),
          round(col("__p95"), 6).as("p95"),
          round(col("__p99"), 6).as("p99"))
      val probes = Seq(("p90", 90), ("p95", 95), ("p99", 99))
      val base = o.crossJoin(broadcast(qs))
      probes.map { case (cn, pct) =>
        base.groupBy().agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("o_totalprice") > col(cn), 1L).otherwise(0L))
            .as("n_above"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"),
          sum(when(col("o_totalprice") > col(cn),
            col("o_totalprice").cast("decimal(18,2)"))
            .otherwise(lit(0).cast("decimal(18,2)"))).as("rev_above"))
          .select(lit(pct).as("probe_pct"), col("n_orders"),
            col("n_above"),
            round(col("rev_above").cast("double") /
              col("rev").cast("double"), 6).as("revenue_share"))
      }.reduce(_ unionByName _).orderBy("probe_pct")
    }),

    /** Burstiness index per event type (Goh & Barabási 2008,
      * B = (σ−μ)/(σ+μ) over inter-event gaps): −1 = metronome, 0 =
      * Poisson, →1 = heavy bursts — the one-number answer to "is this
      * stream machine-regular or human-bursty". Gaps are integer
      * microseconds from the e_gap_stats lag idiom; moment sums ride
      * DECIMAL(38,0) (gap² ~1e20 overflows BIGINT), and only the closed
      * form at the end touches doubles.
      */
    "e_burstiness" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("us").asc, col("event_id").asc)
      val gaps = e.select(col("event_type"),
          (col("us") - lag("us", 1).over(w)).as("gap"))
        .filter(col("gap").isNotNull)
      val m = gaps.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("gap").cast("decimal(38,0)")).as("sg"),
          sum(col("gap").cast("decimal(19,0)") *
            col("gap").cast("decimal(19,0)")).as("sgg"))
      val nD = col("n").cast("double")
      val mu = col("sg").cast("double") / nD
      val sd = sqrt((col("sgg").cast("double") -
        col("sg").cast("double") * col("sg").cast("double") / nD) /
        (nD - 1.0))
      m.select(col("event_type"), col("n").as("n_gaps"),
          round(mu, 4).as("mean_gap_us"),
          round(sd / mu, 6).as("cv"),
          round((sd - mu) / (sd + mu), 6).as("burstiness"))
        .orderBy("event_type")
    }),

    /** RFM segmentation — the marketing-standard user partition: each
      * user scores 1–5 on Recency (days since last event, vs the corpus
      * max day), Frequency (event count), and Monetary (decimal value
      * sum) against the exact quintile boundaries of the per-user
      * distribution. The boundary pass melts the three metrics into one
      * (metric, value) stream and runs ONE keyed RankStats crossing walk
      * (no Percentile aggregate — the per-user domain grows with the
      * data; see a4_percentile), then pivots the 3×4 boundary grid back
      * into a 1-row broadcast; scoring is a map pass; the output is the
      * 5×5×5 segment census.
      */
    "e_rfm" -> ((s, dir) => {
      val e = events(s, dir)
      val anchor = e.groupBy().agg(max(to_date(col("ts"))).as("maxd"))
      val perUser = e.groupBy("user_id")
        .agg(max(to_date(col("ts"))).as("lastd"),
          count(lit(1)).as("freq"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("mon"))
        .crossJoin(broadcast(anchor))
        .select(col("user_id"),
          datediff(col("maxd"), col("lastd")).cast("long").as("rec"),
          col("freq"), col("mon"))
      val melted = perUser.select(explode(map(
        lit("r"), col("rec").cast("double"),
        lit("f"), col("freq").cast("double"),
        lit("m"), col("mon"))).as(Seq("__metric", "__x")))
      val walked = graft.operators.RankStats.exactPercentiles(melted,
        col("__x"), Seq("__metric"),
        Seq("__q1" -> 0.2, "__q2" -> 0.4, "__q3" -> 0.6, "__q4" -> 0.8))
      val qsAggs = Seq("r", "f", "m").flatMap { m =>
        (1 to 4).map(i => round(max(when(col("__metric") === m,
          col(s"__q$i"))), 6).as(s"$m$i"))
      }
      val qs = walked.groupBy().agg(qsAggs.head, qsAggs.tail: _*)
      def score(v: org.apache.spark.sql.Column, bs: Seq[String],
                invert: Boolean) = {
        val raw = bs.map(b => when(v > col(b), 1).otherwise(0))
          .reduce(_ + _) + 1
        if (invert) lit(6) - raw else raw
      }
      perUser.crossJoin(broadcast(qs))
        .select(
          score(col("rec").cast("double"), Seq("r1", "r2", "r3", "r4"),
            invert = true).as("r_score"),
          score(col("freq").cast("double"), Seq("f1", "f2", "f3", "f4"),
            invert = false).as("f_score"),
          score(col("mon"), Seq("m1", "m2", "m3", "m4"),
            invert = false).as("m_score"))
        .groupBy("r_score", "f_score", "m_score")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("r_score", "f_score", "m_score")
    }),

    /** Cohort lifetime-value triangle — retention's revenue sibling:
      * cumulative event value per cohort user by weeks-since-first-seen.
      * The data-sized work is one (user, week) decimal aggregate and the
      * user-keyed cohort join (co-partitioned, as in e_retention); the
      * cumulative runs per cohort over the bounded age axis. Week
      * arithmetic stays on Monday-truncated dates (exact multiples of 7
      * days), so the age division is integer-exact on any engine.
      */
    "e_ltv" -> ((s, dir) => {
      val e = events(s, dir)
      val wk = date_trunc("week", col("ts"))
      val perUserWeek = e.select(col("user_id"), wk.as("week"),
          col("value"))
        .groupBy("user_id", "week")
        .agg(sum(col("value").cast("decimal(18,4)")).as("v"))
      val cohort = e.groupBy(col("user_id"))
        .agg(min(wk).as("cohort_week"))
      val sizes = cohort.groupBy("cohort_week")
        .agg(count(lit(1)).as("cohort_users"))
      val aged = perUserWeek.join(cohort, Seq("user_id"))
        .select(col("cohort_week"),
          (datediff(col("week"), col("cohort_week")) / 7).cast("int")
            .as("age_weeks"), col("v"))
        .groupBy("cohort_week", "age_weeks").agg(sum("v").as("wv"))
      val cum = org.apache.spark.sql.expressions.Window
        .partitionBy("cohort_week").orderBy(col("age_weeks"))
      aged.join(sizes, Seq("cohort_week"))
        .select(col("cohort_week"), col("age_weeks"), col("cohort_users"),
          round(sum("wv").over(cum).cast("double") /
            col("cohort_users").cast("double"), 6).as("cum_value_per_user"))
        .orderBy("cohort_week", "age_weeks")
    }),

    /** Day-of-week seasonality indexes: each weekday's event volume and
      * value relative to the all-days mean (the multiplicative seasonal
      * profile a forecast divides out). One 7-cell conditional aggregate;
      * the index arithmetic runs on the 7-row relation with BIGINT counts
      * and decimal value sums until the final divisions.
      */
    "e_dow_seasonality" -> ((s, dir) => {
      val d = events(s, dir).select(dayofweek(col("ts")).as("dow"),
        col("value"))
      val cells = d.groupBy("dow").agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).as("v"))
      val tot = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
      cells.select(col("dow"), col("n"),
          round(col("v").cast("double"), 4).as("value_sum"),
          round(col("n").cast("double") * 7.0 /
            sum("n").over(tot).cast("double"), 6).as("volume_index"),
          round(col("v").cast("double") * 7.0 /
            sum("v").over(tot).cast("double"), 6).as("value_index"))
        .orderBy("dow")
    }),

    /** Theil–Sen robust trend of weekly revenue — the slope estimator a
      * single outlier week cannot drag (OLS's breakdown point is 0%;
      * Theil–Sen's is 29%): the median of all pairwise week-to-week
      * slopes, intercept = median of (y − slope·x). Pairs live on the
      * calendar-bounded weekly relation (~345²/2 — fixed by the time
      * span, not the fact table), so the exact-percentile pass is
      * bounded-state by construction. BOUNDED-DOMAIN EXEMPTION: with
      * a30_bootstrap_ci this is the other remaining `percentile()`
      * aggregate — its value→count buffer is capped by the pairwise-slope
      * relation of a calendar-sized series, not by the corpus (see
      * a4_percentile for the migrated continuous-domain sites). Weeks
      * convert to integer day
      * offsets from the first week so slope units are per-day.
      */
    "e_theil_sen" -> ((s, dir) => {
      val wk = Tables.load(s, dir, "orders")
        .groupBy(date_trunc("week", col("o_orderdate")).as("week"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("y"))
      val t0 = wk.groupBy().agg(min("week").as("w0"))
      val xy = wk.crossJoin(broadcast(t0))
        .select(datediff(col("week"), col("w0")).cast("long").as("x"),
          col("y"))
      val a = xy.select(col("x").as("x1"), col("y").as("y1"))
      val b = xy.select(col("x").as("x2"), col("y").as("y2"))
      val slopes = a.join(b, col("x2") > col("x1"))
        .select(((col("y2") - col("y1")) /
          (col("x2") - col("x1")).cast("double")).as("sl"))
      val slope = slopes.groupBy()
        .agg(count(lit(1)).as("n_pairs"),
          round(expr("percentile(sl, 0.5)"), 6).as("slope_per_day"))
      xy.crossJoin(broadcast(slope))
        .select(col("n_pairs"), col("slope_per_day"),
          (col("y") - col("slope_per_day") * col("x").cast("double"))
            .as("r"))
        .groupBy("n_pairs", "slope_per_day")
        .agg(round(expr("percentile(r, 0.5)"), 4).as("intercept"))
        .select(col("n_pairs"), col("slope_per_day"), col("intercept"))
    }),

    /** Seasonal-naive forecast backtest — the baseline every demand model
      * must beat, evaluated in-engine: forecast(week) = revenue(week−52),
      * scored by MAPE and SMAPE over the last 26 fully-covered weeks. The
      * fact table collapses to weekly decimal revenue once; lag-52 and
      * the evaluation-window cut run on the bounded weekly relation; the
      * 26 error ratios round to 9dp and sum as decimal so both means are
      * order-exact.
      */
    "e_seasonal_naive" -> ((s, dir) => {
      val wk = Tables.load(s, dir, "orders")
        .select(date_trunc("week", col("o_orderdate")).as("week"),
          col("o_totalprice"))
        .groupBy("week")
        .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("rev"))
      val byWeek = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1)).orderBy(col("week"))
      val rn = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
        .orderBy(col("week").desc)
      val scored = wk.select(col("week"), col("rev"),
          lag("rev", 52).over(byWeek).as("fc"),
          row_number().over(rn).as("recency"))
        .filter(col("recency") <= 26 && col("fc").isNotNull)
        .select(
          round(abs(col("rev") - col("fc")) / col("rev"), 9)
            .cast("decimal(18,9)").as("ape"),
          round(abs(col("rev") - col("fc")) /
            ((col("rev") + col("fc")) / 2.0), 9)
            .cast("decimal(18,9)").as("sape"))
      scored.groupBy().agg(count(lit(1)).as("n_weeks"),
        round(sum("ape").cast("double") / count(lit(1)), 6).as("mape"),
        round(sum("sape").cast("double") / count(lit(1)), 6).as("smape"))
    }),

    /** U-shaped (position-based) multi-touch attribution — first-touch's
      * fairer sibling: each converting user's pre-conversion touches split
      * the credit 40% first / 40% last / 20% across the middles (100% and
      * 50/50 for 1- and 2-touch journeys). The conversion anchor is the
      * user's earliest purchase under the (ts, event_id) total order;
      * per-user windows keyed on the user are the only data-sized work.
      * Per-touch credits round to 9dp and sum as DECIMAL so channel
      * totals are independent of addition order (the gradient-sum trick).
      */
    "e_attribution_u" -> ((s, dir) => {
      val e = events(s, dir)
      val conv = e.filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(min(struct(col("ts"), col("event_id"))).as("c"))
        .select(col("user_id"), col("c.ts").as("cts"),
          col("c.event_id").as("cid"))
      val touches = e.join(conv, Seq("user_id"))
        .filter(struct(col("ts"), col("event_id")) <
          struct(col("cts"), col("cid")))
      val byTime = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val perUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
      val ranked = touches.select(col("user_id"),
        col("event_type").as("channel"),
        row_number().over(byTime).as("rn"),
        count(lit(1)).over(perUser).as("k"))
      val credit = when(col("k") === 1, 1.0)
        .when(col("k") === 2, 0.5)
        .when(col("rn") === 1 || col("rn") === col("k"), 0.4)
        .otherwise(lit(0.2) / (col("k") - 2).cast("double"))
      ranked
        .select(col("channel"),
          round(credit, 9).cast("decimal(18,9)").as("cr"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_touches"),
          round(sum("cr").cast("double"), 6).as("credit"))
        .orderBy("channel")
    }),

    /** Single changepoint detection on the weekly revenue series (binary
      * segmentation step 1, the classic CUSUM/SSE scan): pick the week
      * boundary whose two-segment mean model minimizes total SSE. The
      * fact-table work is ONE weekly moment aggregate (n, Σy, Σy² in
      * decimal); every candidate split's SSE then comes from cumulative
      * prefix moments over the bounded weekly relation — 345 weeks however
      * many orders — via SSE = Σy² − (Σy)²/n per segment. Argmin
      * tie-breaks to the earliest week on the SSE, the KS-max
      * equality-join idiom (raw doubles: both engines walk the identical
      * IEEE op chain, and rounding ~1e15-magnitude SSEs to 6dp is where
      * engines can diverge, so the SSEs stay unrounded). Output: the split, both segment means, and the
      * variance-explained ratio vs the single-segment model.
      */
    "e_changepoint" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val wk = o.select(date_trunc("week", col("o_orderdate")).as("week"),
          col("o_totalprice").as("y"))
        .groupBy("week")
        .agg(count(lit(1)).as("n"),
          sum(col("y").cast("decimal(18,2)")).as("sy"),
          sum((col("y") * col("y")).cast("decimal(28,4)")).as("syy"))
      val walk = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1)).orderBy(col("week"))
      val tot = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
      val c = wk.select(col("week"),
        sum("n").over(walk).as("cn"),
        sum("sy").over(walk).cast("double").as("csy"),
        sum("syy").over(walk).cast("double").as("csyy"),
        sum("n").over(tot).as("tn"),
        sum("sy").over(tot).cast("double").as("tsy"),
        sum("syy").over(tot).cast("double").as("tsyy"))
      def dd(n: String) = col(n).cast("double")
      val sseL = col("csyy") - col("csy") * col("csy") / dd("cn")
      val sseR = (col("tsyy") - col("csyy")) -
        (col("tsy") - col("csy")) * (col("tsy") - col("csy")) /
          (dd("tn") - dd("cn"))
      val sse1 = col("tsyy") - col("tsy") * col("tsy") / dd("tn")
      val cand = c.filter(col("cn") < col("tn"))
        .select(col("week"), col("cn"), col("csy"), col("tn"), col("tsy"),
          (sseL + sseR).as("sse2"), sse1.as("sse1"))
      val best = cand.groupBy().agg(min("sse2").as("best2"))
      cand.join(broadcast(best), cand("sse2") === best("best2"))
        .groupBy("sse1", "sse2", "best2")
        .agg(min("week").as("wk"))
        .select(col("wk"))
        .join(cand.withColumnRenamed("week", "wk"), Seq("wk"))
        .select(col("wk").as("split_week"),
          round(col("csy") / dd("cn"), 4).as("mean_before"),
          round((col("tsy") - col("csy")) / (dd("tn") - dd("cn")), 4)
            .as("mean_after"),
          col("sse1").as("sse_single"), col("sse2").as("sse_split"),
          round(lit(1.0) - col("sse2") / col("sse1"), 6).as("drop_ratio"))
    }),

    /** Association rules over the per-user event-type presence sets (the
      * basket-analysis triple support/confidence/lift, Agrawal et al.):
      * which behaviors co-occur in the same users beyond chance. Presence
      * means HEAVY usage — at least 16 events of the type — so baskets
      * are selective rather than everyone-owns-everything; the per-user
      * type counts are the only data-sized aggregate, and
      * every rule statistic is integer counting over the 5-type vocabulary
      * (≤ 20 ordered pairs, a control-plane relation at any event volume).
      */
    "e_assoc_rules" -> ((s, dir) => {
      val pres = events(s, dir)
        .groupBy(col("user_id"), col("event_type").as("t"))
        .agg(count(lit(1)).as("__c")).filter(col("__c") >= 16)
        .select("user_id", "t")
      val cnt = pres.groupBy("t").agg(count(lit(1)).as("nt"))
      val nu = events(s, dir).select("user_id").distinct()
        .groupBy().agg(count(lit(1)).as("nu"))
      val both = pres.as("a").join(pres.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.t") =!= col("b.t"))
        .groupBy(col("a.t").as("ante"), col("b.t").as("cons"))
        .agg(count(lit(1)).as("nboth"))
      both
        .join(broadcast(cnt.select(col("t").as("ante"), col("nt").as("na"))),
          Seq("ante"))
        .join(broadcast(cnt.select(col("t").as("cons"), col("nt").as("nc"))),
          Seq("cons"))
        .crossJoin(broadcast(nu))
        .select(col("ante"), col("cons"), col("nboth"),
          round(col("nboth").cast("double") / col("nu").cast("double"), 6)
            .as("support"),
          round(col("nboth").cast("double") / col("na").cast("double"), 6)
            .as("confidence"),
          round(col("nboth").cast("double") * col("nu").cast("double") /
            (col("na").cast("double") * col("nc").cast("double")), 6)
            .as("lift"))
        .orderBy("ante", "cons")
    }),

    /** Lorenz curve of per-user event concentration — e_gini's full
      * picture: the exact polyline vertices (cumulative user fraction,
      * cumulative event fraction) walking activity levels ascending.
      * Counts-of-counts again: one row per distinct per-user count, so
      * the curve relation is bounded by the busiest user's total, and
      * every coordinate is an integer ratio rounded once.
      */
    "e_lorenz" -> ((s, dir) => {
      val dist = events(s, dir).groupBy("user_id")
        .agg(count(lit(1)).as("v"))
        .groupBy("v").agg(count(lit(1)).as("m"))
      val walk = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1)).orderBy(col("v"))
      val tot = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
      dist.select(col("v"), col("m"),
          round(sum("m").over(walk).cast("double") /
            sum("m").over(tot).cast("double"), 6).as("cum_users_frac"),
          round(sum(col("m") * col("v")).over(walk).cast("double") /
            sum(col("m") * col("v")).over(tot).cast("double"), 6)
            .as("cum_events_frac"))
        .orderBy("v")
    }),

    /** Gini coefficient of per-user event concentration — e_power_users'
      * one-number summary (0 = perfectly even, →1 = one user owns the
      * stream). Same counts-of-counts discipline: per-user totals hash-
      * aggregate once, then everything runs on the activity-level
      * histogram (one row per distinct per-user count, bounded by the
      * busiest user's total — control-plane-sized at any corpus scale).
      * Gini = Σ_{i,j}|x_i−x_j| / (2n²μ) = W / (n·S) where, walking
      * distinct activity levels v ascending with exclusive prefix sums
      * Cm (users below) and Cs (events below), W = Σ_v m_v·(v·Cm − Cs) —
      * all BIGINT arithmetic until the single final division.
      */
    "e_gini" -> ((s, dir) =>
      graft.operators.RankStats.gini(
        events(s, dir).groupBy("user_id").agg(count(lit(1)).as("x")),
        "x", nName = "n_users", totalName = "n_events")),

    /** New-vs-returning split per day: events from users on their first
      * active day vs returners — one first-seen aggregate keyed on the
      * user, broadcast back into the per-day rollup.
      */
    "e_new_returning" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val firstSeen = e.groupBy("user_id").agg(min("day").as("first_day"))
      e.join(firstSeen, "user_id")
        .groupBy("day")
        .agg(sum(when(col("day") === col("first_day"), 1).otherwise(0))
            .cast("long").as("new_events"),
          sum(when(col("day") =!= col("first_day"), 1).otherwise(0))
            .cast("long").as("returning_events"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("new_events"), col("returning_events"))
        .orderBy("day")
    }),

    /** Inter-event gap distribution per event type: p50/p90/max of the
      * microsecond gaps between consecutive events ((ts, id) total
      * order) — the burstiness report. Percentiles run the RankStats
      * crossing walk over the per-type gap histogram (no Percentile
      * aggregate — gaps are a continuous domain; see a4_percentile);
      * n_gaps and max_us fold out of the SAME histogram pass via the
      * walk's extra-aggregate hooks, so the gap relation is scanned once.
      */
    "e_gap_stats" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("__us").asc, col("event_id").asc)
      val gaps = events(s, dir)
        .select(col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("__us"))
        .withColumn("__gap", col("__us") - lag("__us", 1).over(w))
        .filter(col("__gap").isNotNull)
      graft.operators.RankStats.exactPercentiles(gaps, col("__gap"),
          Seq("event_type"), Seq("__p50" -> 0.5, "__p90" -> 0.9),
          finalAggs = Seq(
            "n_gaps" -> sum("__m").cast("long"),
            "max_us" -> max("__v")))
        .select(col("event_type"), col("n_gaps"),
          round(col("__p50"), 4).as("p50_us"),
          round(col("__p90"), 4).as("p90_us"), col("max_us"))
        .orderBy("event_type")
    }),

    /** Time-weighted average (TWAP) per event type: each observation is
      * weighted by the microseconds until the next one ((ts, event_id)
      * total order; the last span has no successor and drops out). The
      * value×duration products accumulate as decimals, so the weighted
      * sum is order-independent and exact.
      */
    "e_twap" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("__us").asc, col("event_id").asc)
      events(s, dir)
        .select(col("event_type"), col("event_id"), col("value"),
          unix_micros(col("ts")).as("__us"))
        .withColumn("__next", lead("__us", 1).over(w))
        .filter(col("__next").isNotNull)
        .select(col("event_type"),
          (col("value").cast("decimal(18,4)") * (col("__next") - col("__us")))
            .as("__vw"),
          (col("__next") - col("__us")).as("__w"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_spans"),
          round(sum(col("__vw")).cast("double") /
            sum(col("__w")).cast("double"), 6).as("twap"))
        .orderBy("event_type")
    }),

    /** A/B test readout: users split into arms by id parity, conversion =
      * ≥1 high-value purchase (value > 300 — the all-users-convert
      * degenerate case exercises the zero-variance null-z guard instead);
      * the two-proportion z-test (pooled variance) prices the
      * observed lift. All inputs are exact integer counts — the closed
      * form evaluates the same doubles on any engine. Two 1-row arm
      * aggregates cross-attach (broadcast scalars, never a data-sized
      * cross).
      */
    "e_ab_test" -> ((s, dir) => {
      val perUser = events(s, dir).groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase" &&
          col("value") > 300, 1).otherwise(0)).as("conv"))
        .select((col("user_id") % 2).as("arm"), col("conv"))
      val arms = perUser.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum("conv").as("c"))
      val ctl = arms.filter(col("arm") === 0)
        .select(col("n").as("n_c"), col("c").as("conv_c"))
      val trt = arms.filter(col("arm") === 1)
        .select(col("n").as("n_t"), col("c").as("conv_t"))
      ctl.crossJoin(broadcast(trt)).select(
        col("n_c"), col("conv_c"), col("n_t"), col("conv_t"),
        round(col("conv_c").cast("double") / col("n_c"), 6).as("rate_c"),
        round(col("conv_t").cast("double") / col("n_t"), 6).as("rate_t"),
        round(col("conv_t").cast("double") / col("n_t") -
          col("conv_c").cast("double") / col("n_c"), 6).as("lift"),
        {
          // pooled p̂ of 0 or 1 ⇒ zero variance ⇒ z undefined (null), the
          // degenerate everyone-converts case — ANSI division would throw
          val se = sqrt(((col("conv_c") + col("conv_t")).cast("double") /
            (col("n_c") + col("n_t"))) *
            (lit(1.0) - (col("conv_c") + col("conv_t")).cast("double") /
              (col("n_c") + col("n_t"))) *
            (lit(1.0) / col("n_c") + lit(1.0) / col("n_t")))
          round((col("conv_t").cast("double") / col("n_t") -
            col("conv_c").cast("double") / col("n_c")) /
            when(se === 0.0, lit(null)).otherwise(se), 6).as("z")
        })
    }),

    /** Daily EWMA per event type in exact scaled-integer arithmetic
      * ([[graft.operators.Behavior.ewmaDaily]]): decimal daily sums →
      * 1e-4-unit integers → s_i = (v_i + 3·s_{i-1}) div 4 per-key fold.
      * Bit-identical on any engine, replayed by a recursive-CTE oracle.
      */
    "e_ewma" -> ((s, dir) =>
      graft.operators.Behavior.ewmaDaily(events(s, dir),
        "event_type", "ts", "value", num = 1, den = 4)
        .withColumnRenamed("key", "event_type")
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))),

    /** Interval-overlap join: view-activity windows × click-activity
      * windows ([ts, ts + 10·value sec] each), executed as the binned
      * equi-join with the claim-bin rule — no nested loop, no distinct.
      */
    "j_interval" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("s_us"),
        (unix_micros(col("ts")) +
          floor(col("value") * 10).cast("long") * 1000000L).as("e_us"))
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"),
          col("s_us").as("s_i"), col("e_us").as("e_i"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("s_us").as("s_j"), col("e_us").as("e_j"))
      graft.operators.RangeJoin.intervalOverlap(views, clicks, Nil,
        "s_i", "e_i", "s_j", "e_j", binWidth = 3600L * 1000000L)
        .select(col("view_id"), col("click_id"),
          (least(col("e_i"), col("e_j")) - greatest(col("s_i"), col("s_j")))
            .as("overlap_us"))
        .orderBy("view_id", "click_id")
    }),

    /** Trailing-7-day rolling distinct actives per day — the
      * explode-cover equi-join shape, not a range self-join.
      */
    "e_rolling_dau" -> ((s, dir) =>
      Behavior.rollingDistinctUsers(events(s, dir), "user_id", "ts", days = 7)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("active_users"))
        .orderBy("day")),

    /** Top 3-step user paths: consecutive event-type triples per user
      * ((ts, event_id) total order), counted corpus-wide. Two lag frames
      * share one window sort; count-desc/path tiebreak keeps top-20
      * deterministic.
      */
    "e_paths" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("__p1", lag("event_type", 1).over(w))
        .withColumn("__p2", lag("event_type", 2).over(w))
        .filter(col("__p2").isNotNull)
        .select(concat_ws(">", col("__p2"), col("__p1"), col("event_type"))
          .as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path")).limit(20)
    }),

    /** Hourly OHLC bars per event type: open/close are the first/last
      * value by (ts, event_id) — the unique id makes the ordering total,
      * so the bars are deterministic even with timestamp ties. One
      * exchange on (type, hour) shared by the window and the aggregate.
      */
    "e_ohlc" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_type"),
        date_trunc("hour", col("ts")).as("__hr"), col("ts"), col("event_id"),
        col("value"))
      val frame = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type", "__hr")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      // group on the window's own (type, __hr) key so the aggregate reuses
      // the window's exchange — grouping on the formatted string would
      // repartition every row a second time; format only the tiny result.
      e.withColumn("__open", first("value").over(frame))
        .withColumn("__close", last("value").over(frame))
        .groupBy(col("event_type"), col("__hr"))
        .agg(max("__open").as("open"), max("value").as("high"),
          min("value").as("low"), max("__close").as("close"),
          count(lit(1)).as("n"))
        .select(col("event_type"),
          date_format(col("__hr"), "yyyy-MM-dd HH:00").as("hour"),
          col("open"), col("high"), col("low"), col("close"), col("n"))
        .orderBy("event_type", "hour")
    }),

    /** The same hourly OHLC bars as a REAL streaming query (AvailableNow
      * over the events directory): open/close become min_by/max_by state
      * the stream maintains incrementally — window frames don't run on
      * streams. The oracle is e_ohlc's: batch/stream parity is the
      * assertion.
      */
    "st_ohlc" -> ((s, dir) =>
      EventStreams.runAvailableNow(s, s"$dir/events.parquet",
        EventStreams.ohlcBars(_, "1 hour"), "st_ohlc")
        .orderBy("event_type", "hour")),

    /** Hourly resample with linear interpolation across gaps — the
      * model-input-grid companion to e_gapfill's forward fill; hours
      * outside a key's observed span stay null (no extrapolation).
      */
    "e_interp" -> ((s, dir) =>
      Behavior.resampleHourlyInterp(events(s, dir), "event_type", "ts",
        "value")),

    /** Recency-based churn report: users bucketed by how long before the
      * corpus's last event they were last seen (active ≤ 6h, lapsed ≤ 18h,
      * else churned — bars sized to this event stream's cadence; a real
      * product would use days). One per-user aggregate, a broadcast 1-row
      * max, and a 3-row rollup — all integer-microsecond arithmetic, no
      * calendar types in the comparison.
      */
    "e_churn" -> ((s, dir) => {
      val hour = 3600000000L
      val per = events(s, dir)
        .groupBy("user_id")
        .agg(max(unix_micros(col("ts"))).as("__last_us"),
          count(lit(1)).as("__n"))
      val mx = per.agg(max("__last_us").as("__mx"))
      per.crossJoin(broadcast(mx))
        .withColumn("status",
          when(col("__mx") - col("__last_us") <= 6 * hour, "active")
            .when(col("__mx") - col("__last_us") <= 18 * hour, "lapsed")
            .otherwise("churned"))
        .groupBy("status")
        .agg(count(lit(1)).as("n_users"), sum("__n").as("n_events"))
        .orderBy("status")
    }),

    /** Time-to-convert quartiles: minutes from a user's FIRST view to the
      * first purchase after it, exact percentiles over converting users —
      * the funnel-latency read beside e_funnel's stage counts (a funnel
      * that converts in minutes and one that converts in days need
      * different attribution windows). Two filtered aggregates + one
      * per-user min; only converting users reach the percentile.
      */
    "e_conversion_time" -> ((s, dir) => {
      val e = events(s, dir)
      val v = e.filter(col("event_type") === "view").groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("v_us"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
      val conv = v.join(p, "user_id").filter(col("p_us") > col("v_us"))
        .groupBy("user_id", "v_us").agg(min("p_us").as("p_us"))
        .select(((col("p_us") - col("v_us")) / 60000000.0).as("mins"))
      // quartiles via the RankStats crossing walk (no Percentile
      // aggregate — latencies are a continuous domain; see a4_percentile);
      // n_converted folds out of the same histogram pass
      graft.operators.RankStats.exactPercentiles(conv, col("mins"), Nil,
          Seq("__p25" -> 0.25, "__p50" -> 0.5, "__p75" -> 0.75),
          finalAggs = Seq("n_converted" -> sum("__m").cast("long")))
        .select(col("n_converted"), round(col("__p25"), 4).as("p25_min"),
          round(col("__p50"), 4).as("p50_min"),
          round(col("__p75"), 4).as("p75_min"))
    }),

    /** Activity heatmap: events per (day-of-week, hour-of-day) cell with
      * each cell's share of total — the ops-dashboard read for traffic
      * shaping and maintenance windows. One hash aggregate over calendar
      * parts; the share divides by a broadcast scalar.
      */
    "e_activity_heatmap" -> ((s, dir) => {
      val cells = events(s, dir)
        .groupBy(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hod"))
        .agg(count(lit(1)).as("n_events"))
      val tot = cells.agg(sum("n_events").as("__t"))
      cells.crossJoin(broadcast(tot))
        .select(col("dow"), col("hod"), col("n_events"),
          round(col("n_events").cast("double") / col("__t").cast("double"),
            6).as("share"))
        .orderBy("dow", "hod")
    }),

    /** Cohort LTV matrix: weekly signup cohorts × week offset →
      * cumulative revenue per cohort member — e_retention's revenue
      * sibling, the growth table that says how fast each vintage pays
      * back. Revenue sums are decimal(18,4) (order-free); the cumulative
      * walk runs per cohort over the bounded (cohort × offset) grid, and
      * cohort sizes broadcast back in.
      */
    "e_cohort_ltv" -> ((s, dir) => {
      val wk = events(s, dir).select(col("user_id"),
        date_trunc("week", col("ts")).as("wk"), col("value"))
      val cohort = wk.groupBy("user_id").agg(min("wk").as("cwk"))
      val sized = cohort.groupBy("cwk").agg(count(lit(1)).as("cohort_users"))
      val rev = wk.join(cohort, "user_id")
        .groupBy(col("cwk"),
          (datediff(to_date(col("wk")), to_date(col("cwk"))) / 7)
            .cast("int").as("week_offset"))
        .agg(sum(col("value").cast("decimal(18,4)")).as("__rev"))
      val walk = org.apache.spark.sql.expressions.Window
        .partitionBy("cwk").orderBy("week_offset")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      rev.withColumn("__cum", sum("__rev").over(walk))
        .join(broadcast(sized), "cwk")
        .select(date_format(col("cwk"), "yyyy-MM-dd").as("cohort_week"),
          col("week_offset"), col("cohort_users"),
          round(col("__rev").cast("double"), 4).as("week_revenue"),
          round(col("__cum").cast("double") /
            col("cohort_users").cast("double"), 4).as("cum_ltv_per_user"))
        .orderBy("cohort_week", "week_offset")
    }),

    /** Longest consecutive-day activity streak per user — the canonical
      * gaps-and-islands window: distinct active days minus their per-user
      * row_number is constant within a run, so one exchange on user_id
      * and two cheap aggregates turn the day stream into streak lengths.
      * (The engagement metric daily-habit products report; a data-sized
      * self-join formulation would be quadratic per user.)
      */
    "e_streaks" -> ((s, dir) => {
      val days = events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("d")
      val islands = days.withColumn("__grp",
        datediff(col("d"), to_date(lit("1970-01-01"))) -
          row_number().over(w))
      islands.groupBy("user_id", "__grp").agg(count(lit(1)).as("__len"))
        .groupBy("user_id")
        .agg(sum("__len").as("n_active_days"),
          max("__len").as("longest_streak"),
          count(lit(1)).as("n_streaks"))
        .orderBy("user_id")
    }),

    /** Power-law exponent of the user-activity distribution — the
      * continuous-MLE approximation for discrete data (Clauset, Shalizi &
      * Newman 2009): α ≈ 1 + n/Σ ln(x_i/(xmin−½)) with xmin = 1, i.e.
      * Σ ln(2x). "Is engagement heavy-tailed, and how heavy" in one
      * number (α→2 is extreme concentration; α>3 is thin). Computed from
      * counts-of-counts — the Σ runs over distinct activity LEVELS
      * weighted by their multiplicity, 9dp-rounded decimal log terms, so
      * the data-sized work is one per-user aggregate.
      */
    "e_power_law" -> ((s, dir) => {
      val cc = events(s, dir).groupBy("user_id").agg(count(lit(1)).as("x"))
        .groupBy("x").agg(count(lit(1)).as("m"))
      cc.agg(sum("m").as("n_users"),
          sum(col("m").cast("decimal(19,0)") *
            round(log(col("x").cast("double") * 2.0), 9)
              .cast("decimal(28,9)")).cast("decimal(38,9)").as("__s"))
        .select(col("n_users"), lit(1L).as("xmin"),
          round(lit(1.0) + col("n_users").cast("double") /
            col("__s").cast("double"), 6).as("alpha"))
    }),

    /** Recency-weighted engagement score: per user,
      * Σ value · 2^(−age/7d) — the exponential-decay feature churn and
      * ranking models consume, where yesterday's purchase counts ~2× last
      * week's. One data-sized aggregate (the corpus max-timestamp scalar
      * broadcasts); each decay term is 6dp-rounded DECIMAL so the per-user
      * sums are addition-order-free, beside the raw (undecayed) sum for
      * contrast.
      */
    "e_decay_score" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"),
        unix_micros(col("ts")).as("__us"), col("value"))
      val mx = e.agg(max("__us").as("__mx"))
      val halfLifeUs = 604800000000.0 // 7 days
      val term = round(col("value") * pow(lit(2.0),
        -(col("__mx") - col("__us")).cast("double") / halfLifeUs), 6)
        .cast("decimal(18,6)")
      e.crossJoin(broadcast(mx))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(term).cast("double").as("__d"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("__r"))
        .select(col("user_id"), col("n_events"),
          round(col("__d"), 6).as("decay7d_score"),
          round(col("__r"), 4).as("raw_sum"))
        .orderBy("user_id")
    }),

    /** Kaplan–Meier survival curve over user lifetimes — the standard
      * censoring-aware "how long do users stay" estimator (a naive
      * average-lifetime drops every still-active user and biases low).
      * Lifetime = hours between a user's first and last event; users still
      * active in the final 18 h of the window (e_churn's non-churned band)
      * are CENSORED, not deaths. The per-user aggregate is the only
      * data-sized pass; the KM product Π(1 − d_t/n_t) runs over the
      * bounded lifetime histogram (≤ observation-window hours, however
      * many users) as exp of a cumulative sum of 9dp-rounded log terms —
      * the t_zipf discipline that keeps libm noise out of the hash — with
      * an explicit dead-end guard because ln(0) is NULL on one engine and
      * −inf on the other. Output per observed lifetime: risk set, deaths,
      * censored, survival 6dp.
      */
    "e_survival_km" -> ((s, dir) => {
      val hourUs = 3600000000L
      val per = events(s, dir).groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("__f"),
          max(unix_micros(col("ts"))).as("__l"))
      val mx = per.agg(max("__l").as("__mx"))
      val durs = per.crossJoin(broadcast(mx))
        .select(
          floor((col("__l") - col("__f")) / hourUs).cast("long").as("dur_h"),
          when(col("__mx") - col("__l") > 18L * hourUs, 1L).otherwise(0L)
            .as("obs"))
      val hist = durs.groupBy("dur_h")
        .agg(sum("obs").as("d"), sum(lit(1L) - col("obs")).as("c"))
      val one = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1)).orderBy(col("dur_h"))
      val wBelow = one.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val wUpto = one.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val tot = hist.agg(sum(col("d") + col("c")).as("__n"))
      val walked = hist.crossJoin(broadcast(tot))
        .withColumn("n_risk", col("__n") -
          coalesce(sum(col("d") + col("c")).over(wBelow), lit(0L)))
        .withColumn("__term", when(col("d") > 0 && col("d") < col("n_risk"),
            round(log(lit(1.0) -
              col("d").cast("double") / col("n_risk").cast("double")), 9))
          .otherwise(lit(0.0)).cast("decimal(28,9)"))
        .withColumn("__dead",
          when(col("d") === col("n_risk") && col("d") > 0, 1L).otherwise(0L))
      walked.select(col("dur_h"), col("n_risk"), col("d").as("n_events"),
          col("c").as("n_censored"),
          when(max("__dead").over(wUpto) === 1L, lit(0.0))
            .otherwise(round(exp(sum("__term").over(wUpto).cast("double")), 6))
            .as("survival"))
        .orderBy("dur_h")
    }),

    /** Trailing-1-hour sliding window per event: RANGE frame over the
      * event-time axis (not row counts), the time-decayed-metrics shape.
      * One exchange on the type key; the frame slides per partition.
      */
    "w_sliding" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("event_id"), col("event_type"), col("value"),
          unix_micros(col("ts")).as("__us"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("__us")
        .rangeBetween(-3600L * 1000000L, 0L)
      e.select(col("event_id"), col("event_type"),
        count(lit(1)).over(w).as("cnt_1h"),
        sum(col("value").cast("decimal(18,4)")).over(w).cast("double")
          .as("sum_1h"))
        .orderBy("event_id")
    }),

    /** Rolling 20-row Pearson correlation (price vs quantity per supplier):
      * all six moments are exact decimal window sums over ONE exchange +
      * sort, evaluated in closed form per row — the a7_corr discipline on
      * a moving frame; the streaming-quant shape (rolling beta/corr) that
      * would otherwise need a self-join per offset. Degenerate windows
      * (cnt < 2, zero variance) yield null via the guarded denominator.
      */
    "w_rolling_corr" -> ((s, dir) => {
      // the synthetic lineitem does NOT enforce the TPC-H (orderkey,
      // linenumber) PK — ties must break on the moment columns themselves,
      // so rows that still tie are identical in every value the window
      // reads and any tie order yields the same frames
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_suppkey")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice",
          "l_quantity")
        .rowsBetween(-19, 0)
      val x = col("l_extendedprice")
      val y = col("l_quantity")
      val m = Tables.load(s, dir, "lineitem").select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        count(lit(1)).over(w).as("cnt"),
        sum(x.cast("decimal(18,2)")).over(w).cast("double").as("sx"),
        sum(y.cast("decimal(18,2)")).over(w).cast("double").as("sy"),
        sum((x * x).cast("decimal(28,4)")).over(w).cast("double").as("sxx"),
        sum((y * y).cast("decimal(28,4)")).over(w).cast("double").as("syy"),
        sum((x * y).cast("decimal(28,4)")).over(w).cast("double").as("sxy"))
      // float cancellation can push a zero-variance moment a hair negative;
      // clamp so both engines see sqrt(0) (DuckDB ERRORS on sqrt(<0))
      val denom =
        sqrt(greatest(col("cnt") * col("sxx") - col("sx") * col("sx"),
          lit(0.0))) *
        sqrt(greatest(col("cnt") * col("syy") - col("sy") * col("sy"),
          lit(0.0)))
      m.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          round((col("cnt") * col("sxy") - col("sx") * col("sy")) /
            when(denom === 0.0, lit(null)).otherwise(denom), 6).as("corr20"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    }),

    /** Sliding-window anomaly detection: flag events whose value sits more
      * than 3σ from the trailing-24h mean of their type, with the moments
      * as exact decimal window sums → one closed-form double evaluation
      * (the a7_corr discipline applied to a moving frame). Same single
      * exchange as any per-type window.
      */
    "e_anomaly" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("__us")
        .rangeBetween(-24L * 3600L * 1000000L, 0L)
      val x = col("value")
      events(s, dir)
        .select(col("event_id"), col("event_type"), x,
          unix_micros(col("ts")).as("__us"))
        .select(col("event_id"), col("event_type"), x,
          count(lit(1)).over(w).as("__n"),
          sum(x.cast("decimal(18,4)")).over(w).cast("double").as("__sx"),
          sum((x * x).cast("decimal(28,8)")).over(w).cast("double")
            .as("__sxx"))
        // positive-variance guard: a degenerate all-equal window would be
        // NaN here but a hard sqrt-of-negative ERROR in DuckDB — exclude
        // it identically on both sides instead.
        .filter(col("__n") >= 30 &&
          col("__sxx") - col("__sx") * col("__sx") / col("__n") > 0)
        .select(col("event_id"), col("event_type"),
          zCol(x, col("__n"), col("__sx"), col("__sxx")).as("z"))
        .filter(abs(col("z")) > 3.0)
        .orderBy("event_id")
    }),

    /** Bucketed sort-merge join: both sides written bucketed+sorted on the
      * key, so the join plan has NO Exchange on either side (asserted in
      * BucketingSpec) — the co-located-join layout a 100 TB star schema
      * would maintain. Result is layout-independent, so the oracle is the
      * plain join.
      */
    "j_bucketed" -> ((s, dir) => {
      Bucketing.writeBucketed(Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority"), "vq_b_orders",
        "o_orderkey", 8)
      Bucketing.writeBucketed(Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity"), "vq_b_lineitem",
        "l_orderkey", 8)
      Bucketing.readTable(s, "vq_b_lineitem")
        .join(Bucketing.readTable(s, "vq_b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("qty"))
        .orderBy("o_orderpriority")
    }),

    /** j_bucketed through the r8 layout-routing surface: two catalog
      * sessions each register a bucketed layout once, and the caller asks
      * [[graft.core.Catalog.join]] for an equi-join — the CATALOG detects
      * the matching 8-bucket layouts and plans the co-located
      * exchange-free join (pinned in CatalogRoutingSpec); the caller
      * never mentions buckets. Result is layout-independent, so it shares
      * j_bucketed's plain-join oracle.
      */
    "j_catalog_bucketed" -> ((s, dir) => {
      val cat = SessionScoped.memo(s, s"routedJoinCatalog:$dir") {
        val c = new graft.core.Catalog(s)
        c.openFrom("cat_orders", Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_orderpriority"), Seq("o_orderkey"))
        c.openFrom("cat_lineitem", Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity"),
          Seq("l_orderkey", "l_linenumber"))
        c.buildBucketedLayout("cat_orders", "o_orderkey", 8)
        c.buildBucketedLayout("cat_lineitem", "l_orderkey", 8)
        c
      }
      cat.join("cat_lineitem", "l_orderkey", "cat_orders", "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("qty"))
        .orderBy("o_orderpriority")
    }),

    /** j_catalog_bucketed stated as SQL TEXT (r8 verdict task #4): the
      * same two bucketed sessions, but the caller writes a plain
      * `JOIN … ON l_orderkey = o_orderkey` and
      * [[graft.plans.SqlLayoutRouting]] rewrites both sides onto the
      * bucketed tables at analysis time — the join plans exchange-free
      * from SQL exactly as from the typed entry point (plan pin in
      * SqlRoutingSpec). Layout-independent answer, so it shares the
      * plain-join oracle.
      */
    "j_sql_bucketed" -> ((s, dir) => {
      val cat = SessionScoped.memo(s, s"routedJoinCatalog:$dir") {
        val c = new graft.core.Catalog(s)
        c.openFrom("cat_orders", Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_orderpriority"), Seq("o_orderkey"))
        c.openFrom("cat_lineitem", Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity"),
          Seq("l_orderkey", "l_linenumber"))
        c.buildBucketedLayout("cat_orders", "o_orderkey", 8)
        c.buildBucketedLayout("cat_lineitem", "l_orderkey", 8)
        c
      }
      cat.sql(
        """SELECT o_orderpriority, count(*) AS n,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
          |FROM cat_lineitem JOIN cat_orders ON l_orderkey = o_orderkey
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),

    /** Robust spread per group: median + median-absolute-deviation —
      * outlier-resistant where variance is not. Both medians run the
      * RankStats crossing walk (no Percentile aggregate — prices are a
      * continuous domain, so the built-in's single merged value→count map
      * is data-sized; see a4_percentile): group medians from one walk,
      * broadcast back for the deviation pass, whose median is a second
      * walk over the |x−med| histogram.
      */
    "a11_mad" -> ((s, dir) => {
      val x = col("l_extendedprice")
      val li = Tables.load(s, dir, "lineitem").select(col("l_returnflag"), x)
      val med = graft.operators.RankStats.exactPercentiles(li, x,
        Seq("l_returnflag"), Seq("__med" -> 0.5))
      val dev = li.join(broadcast(med), "l_returnflag")
      graft.operators.RankStats.exactPercentiles(dev,
          abs(x - col("__med")), Seq("l_returnflag"), Seq("__mad" -> 0.5),
          histAggs = Seq(max(col("__med")).as("__medh")),
          finalAggs = Seq("med" -> round(max(col("__medh")), 4)))
        .select(col("l_returnflag"), col("med"),
          round(col("__mad"), 4).as("mad"))
        .orderBy("l_returnflag")
    }),

    /** Per-row group z-score via broadcast closed-form moments (the
      * a7_corr decimal-moment pattern): one aggregate over the slice, one
      * broadcast join back — no window, no second shuffle.
      */
    "a10_zscore" -> ((s, dir) => {
      val x = col("l_extendedprice")
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          x)
      val m = li.groupBy("l_returnflag").agg(
        count(lit(1)).cast("double").as("cnt"),
        sum(x.cast("decimal(18,2)")).cast("double").as("sx"),
        sum((x * x).cast("decimal(28,4)")).cast("double").as("sxx"))
      li.join(broadcast(m), "l_returnflag")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          zCol(x, col("cnt"), col("sx"), col("sxx")).as("z"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    /** ORC round-trip (scan + sink via extension dispatch); the oracle
      * reads the original parquet — format fidelity is the assertion.
      */
    "s_orc_roundtrip" -> ((s, dir) => {
      // per-JVM path (+ overwrite): repeated verify/smoke runs in one JVM
      // reuse one directory; concurrent JVMs never collide
      val out = graft.io.Scratch.dir(s, "supplier.orc")
      graft.io.Formats.write(Tables.load(s, dir, "supplier"), out)
      graft.io.Formats.read(s, out).orderBy("s_suppkey")
    }),

    /** Raw line-delimited text round-trip: each document rides as one
      * `id|hex(bytes)` line (hex, because the format's record separator is
      * the newline — structure must be encoded, which is exactly the
      * contract the scaladoc on [[graft.io.Formats]] states). The re-read
      * decodes and fingerprints; the oracle fingerprints the original
      * table, so the assertion is byte fidelity through the text sink.
      */
    "s_text_roundtrip" -> ((s, dir) => {
      val out = graft.io.Scratch.dir(s, "documents.txt")
      val lines = Tables.load(s, dir, "documents")
        .select(concat(col("doc_id").cast("string"), lit("|"),
          hex(col("text").cast("binary"))).as("value"))
      graft.io.Formats.write(lines, out)
      graft.io.Formats.read(s, out)
        .select(split(col("value"), "\\|", 2).as("__p"))
        .select(element_at(col("__p"), 1).cast("long").as("doc_id"),
          md5(unhex(element_at(col("__p"), 2))).as("text_md5"),
          length(decode(unhex(element_at(col("__p"), 2)), "UTF-8"))
            .as("n_chars"))
        .orderBy("doc_id")
    })
  )

  /** Single-copy cascade oracle shared by e_funnel and its stateful
    * twin (the operator contract is equality with this exact semantics).
    */
  private lazy val funnelOracle: String =
      """WITH e AS (SELECT user_id, date_trunc('microseconds', ts) AS ts,
        |                  event_type FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t
        |       FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s1.t
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t
        |       FROM e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t
        |       GROUP BY e.user_id)
        |SELECT 1 AS stage, 'view' AS event_type, count(*) AS users FROM s1
        |UNION ALL
        |SELECT 2, 'click', count(*) FROM s2
        |UNION ALL
        |SELECT 3, 'purchase', count(*) FROM s3
        |ORDER BY stage""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "e_funnel" -> funnelOracle,
    // the stateful operator must land on the identical cascade semantics
    "e_funnel_stateful" -> funnelOracle,
    // ... and so must the real multi-micro-batch streaming run
    "st_funnel" -> funnelOracle,

    /** st_cube's maintained partials must re-merge to exactly the one-shot
      * batch aggregate — same decimal/min/max idioms as the catalog cube
      * oracles.
      */
    "st_cube" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value, 6) AS DECIMAL(38,6))) AS DOUBLE)
        |    AS sum_value,
        |  CAST(sum(CAST(round(value, 6) AS DECIMAL(38,6))) AS DOUBLE)
        |    / count(value) AS avg_value,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    /** st_pairs' maintained distinct set must serve exactly the one-shot
      * batch COUNT(DISTINCT) — distinctness is order-free across any
      * batch slicing.
      */
    "st_pairs" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT value) AS BIGINT) AS cd_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    /** st_ingest's session (head slice + streamed appends, layouts
      * refreshed per batch) must serve exactly the one-shot aggregate
      * over the FULL table — ingestion loses and duplicates nothing.
      */
    "st_ingest" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(round(l_quantity, 6) AS DECIMAL(38,6)))
        |    AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "e_funnel_windowed" ->
      """WITH e AS (SELECT user_id, date_trunc('microseconds', ts) AS ts,
        |                  event_type FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t
        |       FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s1.t
        |         AND e.ts <= s1.t + INTERVAL 24 HOURS
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t
        |       FROM e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t
        |         AND e.ts <= s2.t + INTERVAL 24 HOURS
        |       GROUP BY e.user_id)
        |SELECT 1 AS stage, 'view' AS event_type, count(*) AS users FROM s1
        |UNION ALL
        |SELECT 2, 'click', count(*) FROM s2
        |UNION ALL
        |SELECT 3, 'purchase', count(*) FROM s3
        |ORDER BY stage""".stripMargin,

    "e_retention" ->
      """WITH wk AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
        |cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM wk
        |           GROUP BY user_id),
        |activity AS (SELECT DISTINCT user_id, wk FROM wk)
        |SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
        |       CAST(date_diff('day', cohort_wk, wk) // 7 AS INT)
        |         AS week_offset,
        |       count(*) AS active_users
        |FROM activity JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e_gapfill" ->
      """WITH h AS (SELECT event_type AS k, date_trunc('hour', ts) AS hr,
        |    count(*) AS c,
        |    round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 6) AS v
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(hr) AS mn, max(hr) AS mx FROM h),
        |grid AS (SELECT k, unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
        |           AS hr
        |         FROM (SELECT DISTINCT k FROM h) CROSS JOIN b)
        |SELECT g.k AS event_type, strftime(g.hr, '%Y-%m-%d %H:00') AS hour,
        |  coalesce(h.c, 0) AS n_events,
        |  last_value(h.v IGNORE NULLS) OVER (PARTITION BY g.k ORDER BY g.hr
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
        |FROM grid g LEFT JOIN h ON g.k = h.k AND g.hr = h.hr
        |ORDER BY event_type, hour""".stripMargin,

    "v5_heatmap" ->
      """SELECT CAST(floor(l_extendedprice / 10000) AS INT) AS price_bucket,
        |  CAST(floor(l_quantity / 10) AS INT) AS qty_bucket,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS price_sum
        |FROM lineitem GROUP BY 1, 2
        |ORDER BY price_bucket, qty_bucket""".stripMargin,

    "o_scd2" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER w AS INT) AS version,
        |  strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
        |  strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to,
        |  CASE WHEN lead(o_orderdate) OVER w IS NULL THEN 1 ELSE 0 END
        |    AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, version""".stripMargin,

    "j_skew" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // z is rounded before the |z| > 3 cut on BOTH sides so the flag set is
    // decided on identical values; positive-variance guard mirrors Spark
    // (DuckDB sqrt(<0) is a hard error, not NaN)
    "e_anomaly" ->
      s"""WITH e AS (SELECT event_id, event_type,
         |             date_trunc('microseconds', ts) AS ts, value
         |           FROM events),
         |w AS (SELECT event_id, event_type, value,
         |  count(*) OVER f AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER f AS DOUBLE) AS sx,
         |  CAST(sum(CAST(value * value AS DECIMAL(28,8))) OVER f AS DOUBLE)
         |    AS sxx
         |  FROM e
         |  WINDOW f AS (PARTITION BY event_type ORDER BY ts
         |    RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)),
         |z AS (SELECT event_id, event_type,
         |  ${OracleIdioms.zScoreSql("value", "n", "sx", "sxx")} AS z
         |  FROM w WHERE n >= 30 AND (sxx - sx * sx / n) > 0)
         |SELECT event_id, event_type, z FROM z WHERE abs(z) > 3.0
         |ORDER BY event_id""".stripMargin,

    "e_dau_wau" ->
      """WITH e AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day,
        |             date_trunc('week', ts) AS wk FROM events),
        |d AS (SELECT wk, day, count(*) AS dau FROM e GROUP BY wk, day),
        |w AS (SELECT wk, count(*) AS wau FROM (
        |        SELECT DISTINCT user_id, wk FROM e) GROUP BY wk),
        |a AS (SELECT wk, CAST(sum(dau) AS BIGINT) AS sdau, count(*) AS nd
        |      FROM d GROUP BY wk)
        |SELECT strftime(a.wk, '%Y-%m-%d') AS week, w.wau,
        |  round(CAST(sdau AS DOUBLE) / nd, 6) AS avg_dau,
        |  round((CAST(sdau AS DOUBLE) / nd) / wau, 6) AS stickiness
        |FROM a JOIN w ON a.wk = w.wk ORDER BY week""".stripMargin,

    "e_markov" ->
      """WITH e AS (SELECT user_id, date_trunc('microseconds', ts) AS ts,
        |             event_id, event_type FROM events),
        |s AS (SELECT event_type, lag(event_type) OVER (
        |        PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev
        |      FROM e),
        |c AS (SELECT prev AS from_type, event_type AS to_type,
        |        count(*) AS n
        |      FROM s WHERE prev IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE) /
        |    CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,

    // 10 unrolled power-iteration CTEs in exact BIGINT fixed-point:
    // DuckDB `//` and Spark `div` agree on all-positive operands, and
    // BIGINT sums are order-independent, so the iterative Spark job and
    // this SQL are bit-identical. Mirrors Graph.pageRankScaled
    // (scale=1e12, damping 85%, teleport (1e12*15)//(100*N)).
    "g_pagerank" -> {
      val iterCtes = (1 to 10).map { i =>
        s"""r$i AS (SELECT n.node,
           |  (1000000000000 * 15) // (100 * (SELECT count(*) FROM n)) +
           |    (85 * coalesce(c.c, 0)) // 100 AS r
           |  FROM n LEFT JOIN (
           |    SELECT ew.dst AS node, sum((p.r * ew.w) // ew.out_w) AS c
           |    FROM ew JOIN r${i - 1} p ON ew.src = p.node
           |    GROUP BY ew.dst) c USING (node))""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT user_id, date_trunc('microseconds', ts) AS ts,
         |              event_id, event_type FROM events),
         |s0 AS (SELECT event_type, lag(event_type) OVER (
         |         PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev
         |       FROM e0),
         |ed AS (SELECT prev AS src, event_type AS dst, count(*) AS w
         |       FROM s0 WHERE prev IS NOT NULL GROUP BY 1, 2),
         |ew AS (SELECT src, dst, w,
         |         sum(w) OVER (PARTITION BY src) AS out_w FROM ed),
         |n AS (SELECT DISTINCT src AS node FROM ed
         |      UNION SELECT DISTINCT dst FROM ed),
         |r0 AS (SELECT node,
         |         1000000000000 // (SELECT count(*) FROM n) AS r FROM n),
         |$iterCtes
         |SELECT node, CAST(r AS BIGINT) AS rank_scaled
         |FROM r10 ORDER BY node""".stripMargin
    },

    "e_props_extract" ->
      """WITH k AS (SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n, count(k) AS n_parsed,
        |  CAST(sum(coalesce(k, 0)) AS BIGINT) AS sum_k,
        |  CASE WHEN count(k) > 0 THEN
        |    round(CAST(CAST(sum(coalesce(k, 0)) AS BIGINT) AS DOUBLE)
        |      / CAST(count(k) AS DOUBLE), 6) END AS avg_k
        |FROM k GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e_attribution" ->
      """WITH e AS (SELECT user_id, date_trunc('microseconds', ts) AS ts,
        |             event_id, event_type FROM events),
        |r AS (SELECT user_id, event_type, row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
        |      FROM e),
        |u AS (SELECT user_id,
        |        max(CASE WHEN rn = 1 THEN event_type END) AS channel,
        |        max(CASE WHEN rn > 1 AND event_type = 'purchase'
        |            THEN 1 ELSE 0 END) AS conv
        |      FROM r GROUP BY user_id)
        |SELECT channel, count(*) AS n_users,
        |  CAST(sum(conv) AS BIGINT) AS n_converted,
        |  round(CAST(sum(conv) AS DOUBLE) / count(*), 6) AS conv_rate
        |FROM u GROUP BY channel ORDER BY channel""".stripMargin,

    "e_power_users" ->
      """WITH u AS (SELECT user_id, count(*) AS n FROM events
        |           GROUP BY user_id),
        |r AS (SELECT user_id, n, row_number() OVER (
        |        ORDER BY n DESC, user_id) AS rn FROM u),
        |t AS (SELECT count(*) AS n_users,
        |        CAST(sum(n) AS BIGINT) AS n_events FROM u)
        |SELECT n_users, n_events,
        |  count(*) AS top_users, CAST(sum(n) AS BIGINT) AS top_events,
        |  round(CAST(sum(n) AS DOUBLE) / CAST(n_events AS DOUBLE), 6)
        |    AS top_decile_share
        |FROM r CROSS JOIN t
        |WHERE rn <= ceil(CAST(n_users AS DOUBLE) / 10)
        |GROUP BY n_users, n_events""".stripMargin,

    // exact percentile thresholds broadcast into one conditional
    // decimal aggregate per probe
    "e_pareto" ->
      """WITH q AS (SELECT
        |    round(quantile_cont(o_totalprice, 0.90), 6) AS p90,
        |    round(quantile_cont(o_totalprice, 0.95), 6) AS p95,
        |    round(quantile_cont(o_totalprice, 0.99), 6) AS p99
        |  FROM orders),
        |b AS (SELECT o_totalprice, p90, p95, p99 FROM orders CROSS JOIN q),
        |l AS (
        |  SELECT 90 AS probe_pct, CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(CASE WHEN o_totalprice > p90 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_above,
        |    round(CAST(sum(CASE WHEN o_totalprice > p90
        |        THEN CAST(o_totalprice AS DECIMAL(18,2))
        |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6)
        |      AS revenue_share
        |  FROM b
        |  UNION ALL
        |  SELECT 95, CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN o_totalprice > p95 THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    round(CAST(sum(CASE WHEN o_totalprice > p95
        |        THEN CAST(o_totalprice AS DECIMAL(18,2))
        |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6)
        |  FROM b
        |  UNION ALL
        |  SELECT 99, CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN o_totalprice > p99 THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    round(CAST(sum(CASE WHEN o_totalprice > p99
        |        THEN CAST(o_totalprice AS DECIMAL(18,2))
        |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6)
        |  FROM b)
        |SELECT * FROM l ORDER BY probe_pct""".stripMargin,

    // e_gap_stats lag idiom; decimal-first gap squares; closed form
    // mirrored operation-for-operation
    "e_burstiness" ->
      """WITH e AS (SELECT event_type, event_id,
        |    epoch_us(date_trunc('microseconds', ts)) AS us FROM events),
        |g AS (SELECT event_type,
        |    us - lag(us, 1) OVER (PARTITION BY event_type
        |      ORDER BY us ASC, event_id ASC) AS gap FROM e),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(gap AS DECIMAL(38,0))) AS sg,
        |    sum(CAST(gap AS DECIMAL(19,0)) * CAST(gap AS DECIMAL(19,0)))
        |      AS sgg
        |  FROM g WHERE gap IS NOT NULL GROUP BY event_type)
        |SELECT event_type, n AS n_gaps,
        |  round(CAST(sg AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean_gap_us,
        |  round(sqrt((CAST(sgg AS DOUBLE) -
        |      CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0))
        |    / (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS cv,
        |  round((sqrt((CAST(sgg AS DOUBLE) -
        |      CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0))
        |    - CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (sqrt((CAST(sgg AS DOUBLE) -
        |      CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0))
        |    + CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS burstiness
        |FROM m ORDER BY event_type""".stripMargin,

    // exact quintile boundaries (quantile_cont ≡ percentile, the a4
    // idiom) broadcast into a scoring map pass; 5x5x5 census
    "e_rfm" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d, value
        |  FROM events),
        |a AS (SELECT max(d) AS maxd FROM e),
        |pu AS (SELECT user_id,
        |    CAST(date_diff('day', max(d), (SELECT maxd FROM a))
        |      AS BIGINT) AS rec,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS mon
        |  FROM e GROUP BY user_id),
        |q AS (SELECT
        |    round(quantile_cont(rec, 0.2), 6) AS r1,
        |    round(quantile_cont(rec, 0.4), 6) AS r2,
        |    round(quantile_cont(rec, 0.6), 6) AS r3,
        |    round(quantile_cont(rec, 0.8), 6) AS r4,
        |    round(quantile_cont(freq, 0.2), 6) AS f1,
        |    round(quantile_cont(freq, 0.4), 6) AS f2,
        |    round(quantile_cont(freq, 0.6), 6) AS f3,
        |    round(quantile_cont(freq, 0.8), 6) AS f4,
        |    round(quantile_cont(mon, 0.2), 6) AS m1,
        |    round(quantile_cont(mon, 0.4), 6) AS m2,
        |    round(quantile_cont(mon, 0.6), 6) AS m3,
        |    round(quantile_cont(mon, 0.8), 6) AS m4
        |  FROM pu),
        |sc AS (SELECT
        |    6 - (CASE WHEN CAST(rec AS DOUBLE) > r1 THEN 1 ELSE 0 END +
        |         CASE WHEN CAST(rec AS DOUBLE) > r2 THEN 1 ELSE 0 END +
        |         CASE WHEN CAST(rec AS DOUBLE) > r3 THEN 1 ELSE 0 END +
        |         CASE WHEN CAST(rec AS DOUBLE) > r4 THEN 1 ELSE 0 END + 1)
        |      AS r_score,
        |    CASE WHEN CAST(freq AS DOUBLE) > f1 THEN 1 ELSE 0 END +
        |      CASE WHEN CAST(freq AS DOUBLE) > f2 THEN 1 ELSE 0 END +
        |      CASE WHEN CAST(freq AS DOUBLE) > f3 THEN 1 ELSE 0 END +
        |      CASE WHEN CAST(freq AS DOUBLE) > f4 THEN 1 ELSE 0 END + 1
        |      AS f_score,
        |    CASE WHEN mon > m1 THEN 1 ELSE 0 END +
        |      CASE WHEN mon > m2 THEN 1 ELSE 0 END +
        |      CASE WHEN mon > m3 THEN 1 ELSE 0 END +
        |      CASE WHEN mon > m4 THEN 1 ELSE 0 END + 1 AS m_score
        |  FROM pu CROSS JOIN q)
        |SELECT r_score, f_score, m_score,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // (user, week) decimal sums -> cohort join -> per-cohort cumulative
    // over the bounded age axis; Monday weeks make the /7 exact
    "e_ltv" ->
      """WITH e AS (SELECT user_id, date_trunc('week', ts) AS week, value
        |  FROM events),
        |puw AS (SELECT user_id, week,
        |    sum(CAST(value AS DECIMAL(18,4))) AS v
        |  FROM e GROUP BY user_id, week),
        |c AS (SELECT user_id, min(week) AS cohort_week FROM e
        |  GROUP BY user_id),
        |sz AS (SELECT cohort_week, CAST(count(*) AS BIGINT)
        |    AS cohort_users FROM c GROUP BY cohort_week),
        |aged AS (SELECT c.cohort_week,
        |    CAST(date_diff('day', c.cohort_week, puw.week) / 7 AS INT)
        |      AS age_weeks,
        |    sum(puw.v) AS wv
        |  FROM puw JOIN c USING (user_id)
        |  GROUP BY c.cohort_week, 2)
        |SELECT a.cohort_week, a.age_weeks, sz.cohort_users,
        |  round(CAST(sum(a.wv) OVER (PARTITION BY a.cohort_week
        |      ORDER BY a.age_weeks) AS DOUBLE)
        |    / CAST(sz.cohort_users AS DOUBLE), 6) AS cum_value_per_user
        |FROM aged a JOIN sz USING (cohort_week)
        |ORDER BY cohort_week, age_weeks""".stripMargin,

    // 7-cell aggregate; duck dayofweek is 0-based (Sunday=0) vs Spark's
    // 1-based, hence the +1
    "e_dow_seasonality" ->
      """WITH d AS (SELECT dayofweek(ts) + 1 AS dow,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |cells AS (SELECT dow, CAST(count(*) AS BIGINT) AS n,
        |    sum(v) AS v FROM d GROUP BY dow)
        |SELECT dow, n, round(CAST(v AS DOUBLE), 4) AS value_sum,
        |  round(CAST(n AS DOUBLE) * 7.0
        |    / CAST(sum(n) OVER () AS DOUBLE), 6) AS volume_index,
        |  round(CAST(v AS DOUBLE) * 7.0
        |    / CAST(sum(v) OVER () AS DOUBLE), 6) AS value_index
        |FROM cells ORDER BY dow""".stripMargin,

    // calendar-bounded pairwise slopes; quantile_cont ≡ percentile
    "e_theil_sen" ->
      """WITH wk AS (SELECT date_trunc('week', o_orderdate) AS week,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
        |  FROM orders GROUP BY 1),
        |t0 AS (SELECT min(week) AS w0 FROM wk),
        |xy AS (SELECT CAST(date_diff('day', w0, week) AS BIGINT) AS x, y
        |  FROM wk CROSS JOIN t0),
        |sl AS (SELECT (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS sl
        |  FROM xy a JOIN xy b ON b.x > a.x),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |    round(quantile_cont(sl, 0.5), 6) AS slope_per_day FROM sl)
        |SELECT n_pairs, slope_per_day,
        |  round(quantile_cont(y - slope_per_day * CAST(x AS DOUBLE), 0.5),
        |    4) AS intercept
        |FROM xy CROSS JOIN s GROUP BY n_pairs, slope_per_day""".stripMargin,

    // weekly decimal revenue -> lag-52 + recency cut on the bounded
    // weekly relation; 9dp-decimal error sums
    "e_seasonal_naive" ->
      """WITH wk AS (SELECT date_trunc('week', o_orderdate) AS week,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS rev
        |  FROM orders GROUP BY 1),
        |sc AS (SELECT week, rev,
        |    lag(rev, 52) OVER (ORDER BY week) AS fc,
        |    row_number() OVER (ORDER BY week DESC) AS recency
        |  FROM wk),
        |e AS (SELECT
        |    CAST(round(abs(rev - fc) / rev, 9) AS DECIMAL(18,9)) AS ape,
        |    CAST(round(abs(rev - fc) / ((rev + fc) / 2.0), 9)
        |      AS DECIMAL(18,9)) AS sape
        |  FROM sc WHERE recency <= 26 AND fc IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n_weeks,
        |  round(CAST(sum(ape) AS DOUBLE) / count(*), 6) AS mape,
        |  round(CAST(sum(sape) AS DOUBLE) / count(*), 6) AS smape
        |FROM e""".stripMargin,

    // conversion anchor under the (us-truncated ts, event_id) tuple
    // order; 9dp-decimal credit sums
    "e_attribution_u" ->
      """WITH pe AS (SELECT user_id, event_id, event_type,
        |    date_trunc('microseconds', ts) AS us FROM events),
        |conv AS (SELECT user_id, us AS cts, event_id AS cid FROM (
        |  SELECT user_id, us, event_id, row_number() OVER (
        |      PARTITION BY user_id ORDER BY us, event_id) AS rn
        |  FROM pe WHERE event_type = 'purchase') WHERE rn = 1),
        |touches AS (SELECT pe.user_id, pe.event_type AS channel, pe.us,
        |    pe.event_id
        |  FROM pe JOIN conv USING (user_id)
        |  WHERE (pe.us, pe.event_id) < (cts, cid)),
        |rk AS (SELECT channel,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS k
        |  FROM touches)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
        |  round(CAST(sum(CAST(round(
        |    CASE WHEN k = 1 THEN 1.0 WHEN k = 2 THEN 0.5
        |         WHEN rn = 1 OR rn = k THEN 0.4
        |         ELSE 0.2 / CAST(k - 2 AS DOUBLE) END, 9)
        |    AS DECIMAL(18,9))) AS DOUBLE), 6) AS credit
        |FROM rk GROUP BY channel ORDER BY channel""".stripMargin,

    // weekly decimal moments -> cumulative prefix SSEs; unrounded IEEE
    // doubles both sides, argmin by equality + earliest week
    "e_changepoint" ->
      """WITH wk AS (SELECT date_trunc('week', o_orderdate) AS week,
        |    CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sy,
        |    sum(CAST(o_totalprice * o_totalprice AS DECIMAL(28,4))) AS syy
        |  FROM orders GROUP BY 1),
        |c AS (SELECT week,
        |    CAST(sum(n) OVER w AS BIGINT) AS cn,
        |    CAST(sum(sy) OVER w AS DOUBLE) AS csy,
        |    CAST(sum(syy) OVER w AS DOUBLE) AS csyy,
        |    CAST(sum(n) OVER () AS BIGINT) AS tn,
        |    CAST(sum(sy) OVER () AS DOUBLE) AS tsy,
        |    CAST(sum(syy) OVER () AS DOUBLE) AS tsyy
        |  FROM wk WINDOW w AS (ORDER BY week)),
        |cand AS (SELECT week, cn, csy, tn, tsy,
        |    (csyy - csy * csy / CAST(cn AS DOUBLE)) +
        |    ((tsyy - csyy) - (tsy - csy) * (tsy - csy) /
        |      (CAST(tn AS DOUBLE) - CAST(cn AS DOUBLE))) AS sse2,
        |    tsyy - tsy * tsy / CAST(tn AS DOUBLE) AS sse1
        |  FROM c WHERE cn < tn),
        |best AS (SELECT min(sse2) AS best2 FROM cand),
        |pick AS (SELECT min(week) AS wk FROM cand, best WHERE sse2 = best2)
        |SELECT week AS split_week,
        |  round(csy / CAST(cn AS DOUBLE), 4) AS mean_before,
        |  round((tsy - csy) / (CAST(tn AS DOUBLE) - CAST(cn AS DOUBLE)), 4)
        |    AS mean_after,
        |  sse1 AS sse_single, sse2 AS sse_split,
        |  round(1.0 - sse2 / sse1, 6) AS drop_ratio
        |FROM cand JOIN pick ON cand.week = pick.wk""".stripMargin,

    // per-user presence sets; all rule stats are integer counts over the
    // <=20-pair type vocabulary
    "e_assoc_rules" ->
      """WITH pres AS (SELECT user_id, event_type AS t FROM events
        |  GROUP BY user_id, event_type HAVING count(*) >= 16),
        |cnt AS (SELECT t, CAST(count(*) AS BIGINT) AS nt FROM pres
        |  GROUP BY t),
        |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu
        |  FROM events),
        |bt AS (SELECT a.t AS ante, b.t AS cons,
        |    CAST(count(*) AS BIGINT) AS nboth
        |  FROM pres a JOIN pres b
        |    ON a.user_id = b.user_id AND a.t != b.t
        |  GROUP BY a.t, b.t)
        |SELECT ante, cons, nboth,
        |  round(CAST(nboth AS DOUBLE) / CAST(nu.nu AS DOUBLE), 6)
        |    AS support,
        |  round(CAST(nboth AS DOUBLE) / CAST(ca.nt AS DOUBLE), 6)
        |    AS confidence,
        |  round(CAST(nboth AS DOUBLE) * CAST(nu.nu AS DOUBLE) /
        |    (CAST(ca.nt AS DOUBLE) * CAST(cc.nt AS DOUBLE)), 6) AS lift
        |FROM bt
        |JOIN cnt ca ON ca.t = ante
        |JOIN cnt cc ON cc.t = cons
        |CROSS JOIN nu
        |ORDER BY ante, cons""".stripMargin,

    // activity-level histogram, inclusive cumulative walks
    "e_lorenz" ->
      """WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS v
        |  FROM events GROUP BY user_id),
        |d AS (SELECT v, CAST(count(*) AS BIGINT) AS m FROM u GROUP BY v)
        |SELECT v, m,
        |  round(CAST(sum(m) OVER (ORDER BY v) AS DOUBLE)
        |    / CAST(sum(m) OVER () AS DOUBLE), 6) AS cum_users_frac,
        |  round(CAST(sum(m * v) OVER (ORDER BY v) AS DOUBLE)
        |    / CAST(sum(m * v) OVER () AS DOUBLE), 6) AS cum_events_frac
        |FROM d ORDER BY v""".stripMargin,

    // activity-level histogram + exclusive prefix sums; BIGINT W = Σ
    // m·(v·Cm − Cs) until the one final division
    "e_gini" ->
      """WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS x
        |           FROM events GROUP BY user_id),
        |d AS (SELECT x, CAST(count(*) AS BIGINT) AS m FROM u GROUP BY x),
        |p AS (SELECT x, m,
        |    m * (x * coalesce(CAST(sum(m) OVER (ORDER BY x
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |        AS BIGINT), 0) -
        |      coalesce(CAST(sum(m * x) OVER (ORDER BY x
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |        AS BIGINT), 0)) AS w
        |  FROM d)
        |SELECT CAST(sum(m) AS BIGINT) AS n_users,
        |  CAST(sum(m * x) AS BIGINT) AS n_events,
        |  round(CAST(sum(w) AS DOUBLE) /
        |    (CAST(sum(m) AS DOUBLE) * CAST(sum(m * x) AS DOUBLE)), 6)
        |    AS gini
        |FROM p""".stripMargin,

    "e_new_returning" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS first_day FROM e
        |      GROUP BY user_id)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
        |    AS new_events,
        |  CAST(sum(CASE WHEN day != first_day THEN 1 ELSE 0 END) AS BIGINT)
        |    AS returning_events
        |FROM e JOIN f USING (user_id)
        |GROUP BY day ORDER BY day""".stripMargin,

    "e_gap_stats" ->
      """WITH e AS (SELECT event_type, event_id,
        |    epoch_us(date_trunc('microseconds', ts)) AS us FROM events),
        |g AS (SELECT event_type,
        |        us - lag(us, 1) OVER (PARTITION BY event_type
        |          ORDER BY us ASC, event_id ASC) AS gap FROM e)
        |SELECT event_type, count(*) AS n_gaps,
        |  round(quantile_cont(gap, 0.5), 4) AS p50_us,
        |  round(quantile_cont(gap, 0.9), 4) AS p90_us,
        |  max(gap) AS max_us
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e_twap" ->
      """WITH e AS (SELECT event_type, event_id, value,
        |    epoch_us(date_trunc('microseconds', ts)) AS us FROM events),
        |s AS (SELECT event_type, value, us,
        |        lead(us, 1) OVER (PARTITION BY event_type
        |          ORDER BY us ASC, event_id ASC) AS next FROM e)
        |SELECT event_type, count(*) AS n_spans,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,4)) * (next - us))
        |      AS DOUBLE) /
        |    CAST(sum(next - us) AS DOUBLE), 6) AS twap
        |FROM s WHERE next IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the same closed form over the same exact integer counts; operation
    // order mirrored so every intermediate double is identical
    "e_ab_test" ->
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 300
        |        THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |a AS (SELECT user_id % 2 AS arm, conv FROM u),
        |g AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(conv) AS BIGINT) AS c FROM a GROUP BY arm),
        |ctl AS (SELECT n AS n_c, c AS conv_c FROM g WHERE arm = 0),
        |trt AS (SELECT n AS n_t, c AS conv_t FROM g WHERE arm = 1)
        |SELECT n_c, conv_c, n_t, conv_t,
        |  round(conv_c::DOUBLE / n_c, 6) AS rate_c,
        |  round(conv_t::DOUBLE / n_t, 6) AS rate_t,
        |  round(conv_t::DOUBLE / n_t - conv_c::DOUBLE / n_c, 6) AS lift,
        |  round((conv_t::DOUBLE / n_t - conv_c::DOUBLE / n_c) /
        |    nullif(sqrt(((conv_c + conv_t)::DOUBLE / (n_c + n_t)) *
        |      (1.0 - (conv_c + conv_t)::DOUBLE / (n_c + n_t)) *
        |      (1.0 / n_c + 1.0 / n_t)), 0), 6) AS z
        |FROM ctl, trt""".stripMargin,

    // recursive replay of the scaled-integer smoothing: row n's EWMA joins
    // row n-1's; `//` (floor div) ≡ Spark `div` on the non-negative values
    "e_ewma" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |num AS (SELECT event_type, day, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |  FROM daily),
        |ew AS (
        |  SELECT event_type, day, rn, v, v AS e FROM num WHERE rn = 1
        |  UNION ALL
        |  SELECT n.event_type, n.day, n.rn, n.v, (n.v + 3 * w.e) // 4
        |  FROM num n JOIN ew w
        |    ON n.event_type = w.event_type AND n.rn = w.rn + 1)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
        |  v AS v_scaled, e AS ewma_scaled
        |FROM ew ORDER BY event_type, day""".stripMargin,

    // the oracle is the plain quadratic range join — the binned equi-join
    // must produce exactly its pairs (closed-interval overlap predicate)
    "j_interval" ->
      """WITH e AS (SELECT event_id, event_type,
        |    epoch_us(date_trunc('microseconds', ts)) AS s_us,
        |    epoch_us(date_trunc('microseconds', ts)) +
        |      CAST(floor(value * 10) AS BIGINT) * 1000000 AS e_us
        |  FROM events),
        |v AS (SELECT event_id AS view_id, s_us AS s_i, e_us AS e_i FROM e
        |      WHERE event_type = 'view' AND e_us >= s_us),
        |c AS (SELECT event_id AS click_id, s_us AS s_j, e_us AS e_j FROM e
        |      WHERE event_type = 'click' AND e_us >= s_us)
        |SELECT view_id, click_id,
        |  least(e_i, e_j) - greatest(s_i, s_j) AS overlap_us
        |FROM v JOIN c ON s_i <= e_j AND s_j <= e_i
        |ORDER BY view_id, click_id""".stripMargin,

    // explode each (user, day) into the trailing window's covered days,
    // then trim days never observed — mirrors the Spark explode-cover
    // shape (and so also its semantics at the range edges)
    "e_rolling_dau" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |            FROM events),
        |obs AS (SELECT DISTINCT day FROM du),
        |cov AS (SELECT user_id, CAST(unnest(generate_series(
        |          day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE) AS day
        |        FROM du)
        |SELECT strftime(cov.day, '%Y-%m-%d') AS day,
        |  count(DISTINCT user_id) AS active_users
        |FROM cov JOIN obs ON cov.day = obs.day
        |GROUP BY 1 ORDER BY day""".stripMargin,

    "e_paths" ->
      """WITH e AS (SELECT user_id, date_trunc('microseconds', ts) AS ts,
        |             event_id, event_type FROM events),
        |s AS (SELECT event_type,
        |        lag(event_type, 1) OVER (PARTITION BY user_id
        |          ORDER BY ts ASC, event_id ASC) AS p1,
        |        lag(event_type, 2) OVER (PARTITION BY user_id
        |          ORDER BY ts ASC, event_id ASC) AS p2
        |      FROM e)
        |SELECT p2 || '>' || p1 || '>' || event_type AS path, count(*) AS n
        |FROM s WHERE p2 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,

    "e_ohlc" -> ohlcOracle,
    // batch/stream parity: the streaming bars must equal the batch bars
    "st_ohlc" -> ohlcOracle,

    "e_churn" ->
      """WITH p AS (SELECT user_id,
        |    max(epoch_us(date_trunc('microseconds', ts))) AS last_us,
        |    count(*) AS n FROM events GROUP BY user_id),
        |m AS (SELECT max(last_us) AS mx FROM p)
        |SELECT CASE WHEN mx - last_us <= 21600000000 THEN 'active'
        |            WHEN mx - last_us <= 64800000000 THEN 'lapsed'
        |            ELSE 'churned' END AS status,
        |  count(*) AS n_users, CAST(sum(n) AS BIGINT) AS n_events
        |FROM p CROSS JOIN m GROUP BY 1 ORDER BY status""".stripMargin,

    // first view -> first later purchase, exact quartiles over converters
    "e_conversion_time" ->
      """WITH v AS (SELECT user_id,
        |    min(epoch_us(date_trunc('microseconds', ts))) AS v_us
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |p AS (SELECT user_id, epoch_us(date_trunc('microseconds', ts))
        |    AS p_us
        |  FROM events WHERE event_type = 'purchase'),
        |conv AS (SELECT (min(p_us) - v_us) / 60000000.0 AS mins
        |  FROM v JOIN p USING (user_id) WHERE p_us > v_us
        |  GROUP BY user_id, v_us)
        |SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |  round(quantile_cont(mins, 0.25), 4) AS p25_min,
        |  round(quantile_cont(mins, 0.5), 4) AS p50_min,
        |  round(quantile_cont(mins, 0.75), 4) AS p75_min
        |FROM conv""".stripMargin,

    // calendar-part hash agg; share over a broadcast scalar. DuckDB dow is
    // 0=Sunday while Spark dayofweek is 1=Sunday — shifted to match
    "e_activity_heatmap" ->
      """WITH cells AS (SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
        |    CAST(hour(ts) AS INT) AS hod, CAST(count(*) AS BIGINT)
        |      AS n_events
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n_events) AS BIGINT) AS tt FROM cells)
        |SELECT dow, hod, n_events,
        |  round(CAST(n_events AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS share
        |FROM cells CROSS JOIN t ORDER BY dow, hod""".stripMargin,

    // cohort grid cumulative walk; decimal revenue; sizes broadcast
    "e_cohort_ltv" ->
      """WITH wk AS (SELECT user_id, date_trunc('week', ts) AS wk, value
        |  FROM events),
        |cohort AS (SELECT user_id, min(wk) AS cwk FROM wk GROUP BY user_id),
        |sized AS (SELECT cwk, CAST(count(*) AS BIGINT) AS cohort_users
        |  FROM cohort GROUP BY cwk),
        |rev AS (SELECT cwk,
        |    CAST(date_diff('day', CAST(cwk AS DATE), CAST(wk.wk AS DATE))
        |      // 7 AS INT) AS week_offset,
        |    sum(CAST(value AS DECIMAL(18,4))) AS r
        |  FROM wk JOIN cohort USING (user_id) GROUP BY 1, 2),
        |c AS (SELECT cwk, week_offset, r,
        |    sum(r) OVER (PARTITION BY cwk ORDER BY week_offset
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM rev)
        |SELECT strftime(cwk, '%Y-%m-%d') AS cohort_week, week_offset,
        |  cohort_users, round(CAST(r AS DOUBLE), 4) AS week_revenue,
        |  round(CAST(cum AS DOUBLE) / CAST(cohort_users AS DOUBLE), 4)
        |    AS cum_ltv_per_user
        |FROM c JOIN sized USING (cwk)
        |ORDER BY cohort_week, week_offset""".stripMargin,

    // gaps-and-islands: day - row_number constant within a run
    "e_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |  FROM events),
        |i AS (SELECT user_id, d,
        |    date_diff('day', DATE '1970-01-01', d) -
        |      row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
        |  FROM days),
        |s AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
        |  FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |  CAST(max(len) AS BIGINT) AS longest_streak,
        |  CAST(count(*) AS BIGINT) AS n_streaks
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,

    // counts-of-counts MLE; 9dp decimal ln(2x) terms
    "e_power_law" ->
      """WITH per AS (SELECT user_id, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY user_id),
        |cc AS (SELECT x, CAST(count(*) AS BIGINT) AS m FROM per GROUP BY x),
        |f AS (SELECT CAST(sum(m) AS BIGINT) AS n_users,
        |    CAST(sum(CAST(m AS DECIMAL(19,0)) *
        |      CAST(round(ln(CAST(x AS DOUBLE) * 2.0), 9) AS DECIMAL(28,9)))
        |      AS DECIMAL(38,9)) AS s
        |  FROM cc)
        |SELECT n_users, CAST(1 AS BIGINT) AS xmin,
        |  round(1.0 + CAST(n_users AS DOUBLE) / CAST(s AS DOUBLE), 6)
        |    AS alpha
        |FROM f""".stripMargin,

    // 6dp decimal decay terms; scalar max broadcast; 7d half-life in µs
    "e_decay_score" ->
      """WITH e AS (SELECT user_id,
        |    epoch_us(date_trunc('microseconds', ts)) AS us, value
        |  FROM events),
        |m AS (SELECT max(us) AS mx FROM e)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  round(CAST(sum(CAST(round(value * pow(2.0,
        |      -CAST(mx - us AS DOUBLE) / 604800000000.0), 6)
        |    AS DECIMAL(18,6))) AS DOUBLE), 6) AS decay7d_score,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
        |    AS raw_sum
        |FROM e CROSS JOIN m GROUP BY user_id ORDER BY user_id""".stripMargin,

    // KM product as exp of cumulative 9dp log terms; 18h censor band
    "e_survival_km" ->
      """WITH p AS (SELECT user_id,
        |    min(epoch_us(date_trunc('microseconds', ts))) AS f,
        |    max(epoch_us(date_trunc('microseconds', ts))) AS l
        |  FROM events GROUP BY user_id),
        |m AS (SELECT max(l) AS mx FROM p),
        |durs AS (SELECT CAST(floor((l - f) / 3600000000) AS BIGINT) AS dur_h,
        |    CASE WHEN mx - l > 64800000000 THEN 1 ELSE 0 END AS obs
        |  FROM p CROSS JOIN m),
        |hist AS (SELECT dur_h, CAST(sum(obs) AS BIGINT) AS d,
        |    CAST(sum(1 - obs) AS BIGINT) AS c
        |  FROM durs GROUP BY dur_h),
        |tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n FROM hist),
        |w AS (SELECT dur_h, d, c,
        |    n - coalesce(CAST(sum(d + c) OVER (ORDER BY dur_h
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS n_risk
        |  FROM hist CROSS JOIN tot),
        |t AS (SELECT dur_h, d, c, n_risk,
        |    CAST(CASE WHEN d > 0 AND d < n_risk
        |      THEN round(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)),
        |        9)
        |      ELSE 0.0 END AS DECIMAL(28,9)) AS term,
        |    CASE WHEN d = n_risk AND d > 0 THEN 1 ELSE 0 END AS dead
        |  FROM w)
        |SELECT dur_h, n_risk, d AS n_events, c AS n_censored,
        |  CASE WHEN max(dead) OVER u = 1 THEN 0.0
        |    ELSE round(exp(CAST(sum(term) OVER u AS DOUBLE)), 6)
        |  END AS survival
        |FROM t
        |WINDOW u AS (ORDER BY dur_h
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY dur_h""".stripMargin,

    "e_interp" ->
      """WITH h AS (SELECT event_type AS k, date_trunc('hour', ts) AS hr,
        |    count(*) AS c,
        |    round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 6) AS v
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(hr) AS mn, max(hr) AS mx FROM h),
        |grid AS (SELECT k, unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
        |           AS hr
        |         FROM (SELECT DISTINCT k FROM h) CROSS JOIN b),
        |j AS (SELECT g.k, g.hr, h.c, h.v,
        |  last_value(h.v IGNORE NULLS) OVER wp AS pv,
        |  last_value(CASE WHEN h.v IS NOT NULL THEN g.hr END IGNORE NULLS)
        |    OVER wp AS ph,
        |  first_value(h.v IGNORE NULLS) OVER wn AS nv,
        |  first_value(CASE WHEN h.v IS NOT NULL THEN g.hr END IGNORE NULLS)
        |    OVER wn AS nh
        |  FROM grid g LEFT JOIN h ON g.k = h.k AND g.hr = h.hr
        |  WINDOW wp AS (PARTITION BY g.k ORDER BY g.hr
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wn AS (PARTITION BY g.k ORDER BY g.hr
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT k AS event_type, strftime(hr, '%Y-%m-%d %H:00') AS hour,
        |  coalesce(c, 0) AS n_events,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |         round(pv + (nv - pv) *
        |           (CAST(epoch_us(hr) // 3600000000 - epoch_us(ph) // 3600000000
        |              AS DOUBLE) /
        |            CAST(epoch_us(nh) // 3600000000 - epoch_us(ph) // 3600000000
        |              AS DOUBLE)), 6)
        |  END AS value_interp
        |FROM j ORDER BY event_type, hour""".stripMargin,

    // six decimal window moments -> closed-form correlation; null on a
    // zero denominator via nullif, matching the Spark-side guard
    "w_rolling_corr" ->
      """WITH s AS (SELECT l_suppkey, l_orderkey, l_linenumber,
        |    count(*) OVER w AS cnt,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) OVER w
        |      AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER w
        |      AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_extendedprice * l_extendedprice
        |      AS DECIMAL(28,4))) OVER w AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(l_quantity * l_quantity
        |      AS DECIMAL(28,4))) OVER w AS DOUBLE) AS syy,
        |    CAST(sum(CAST(l_extendedprice * l_quantity
        |      AS DECIMAL(28,4))) OVER w AS DOUBLE) AS sxy
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey
        |    ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT l_suppkey, l_orderkey, l_linenumber,
        |  round((cnt * sxy - sx * sy) /
        |    nullif(sqrt(greatest(cnt * sxx - sx * sx, 0))
        |         * sqrt(greatest(cnt * syy - sy * sy, 0)), 0), 6) AS corr20
        |FROM s ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "w_sliding" ->
      """WITH e AS (SELECT event_id, event_type,
        |             date_trunc('microseconds', ts) AS ts, value
        |           FROM events)
        |SELECT event_id, event_type,
        |  count(*) OVER w AS cnt_1h,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
        |FROM e
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "j_bucketed" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // the catalog-routed co-located join is layout-independent too, so it
    // shares the plain-join oracle
    "j_catalog_bucketed" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // and so is its SQL-text twin
    "j_sql_bucketed" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "a11_mad" ->
      """WITH m AS (SELECT l_returnflag,
        |             quantile_cont(l_extendedprice, 0.5) AS med
        |           FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag, round(max(m.med), 4) AS med,
        |  round(quantile_cont(abs(l.l_extendedprice - m.med), 0.5), 4) AS mad
        |FROM lineitem l JOIN m USING (l_returnflag)
        |GROUP BY l.l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a10_zscore" ->
      s"""WITH s AS (SELECT l_orderkey, l_linenumber, l_returnflag,
         |             l_extendedprice FROM lineitem WHERE l_orderkey < 100),
         |m AS (SELECT l_returnflag, count(*)::DOUBLE AS cnt,
         |  cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sx,
         |  cast(sum(cast(l_extendedprice * l_extendedprice as decimal(28,4)))
         |    as double) AS sxx
         |  FROM s GROUP BY l_returnflag)
         |SELECT l_orderkey, l_linenumber, s.l_returnflag,
         |  ${OracleIdioms.zScoreSql("l_extendedprice", "cnt", "sx", "sxx")}
         |    AS z
         |FROM s JOIN m ON s.l_returnflag = m.l_returnflag
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "s_orc_roundtrip" ->
      ("SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier " +
        "ORDER BY s_suppkey"),

    // the oracle fingerprints the ORIGINAL rows: a text-sink round-trip
    // that corrupts any byte of any document changes its md5
    "s_text_roundtrip" ->
      """SELECT doc_id, md5(text) AS text_md5,
        |  CAST(length(text) AS INT) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin
  )

  /** Single-copy OHLC oracle — e_ohlc (batch windows) and st_ohlc (streaming
    * min_by/max_by state) must both equal it.
    */
  private lazy val ohlcOracle: String =
    """WITH e AS (SELECT event_type, date_trunc('hour', ts) AS hr,
      |             date_trunc('microseconds', ts) AS ts, event_id, value
      |           FROM events),
      |w AS (SELECT event_type, hr, value,
      |  first_value(value) OVER f AS o, last_value(value) OVER f AS c
      |  FROM e
      |  WINDOW f AS (PARTITION BY event_type, hr
      |    ORDER BY ts ASC, event_id ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      |SELECT event_type, strftime(hr, '%Y-%m-%d %H:00') AS hour,
      |  max(o) AS open, max(value) AS high, min(value) AS low,
      |  max(c) AS close, count(*) AS n
      |FROM w GROUP BY event_type, hr
      |ORDER BY event_type, hour""".stripMargin
}
