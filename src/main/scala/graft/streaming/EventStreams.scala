package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The transform is defined once, batch/stream agnostic ([[windowedCounts]]),
  * then bound either to `spark.read` (batch backfill) or `spark.readStream`
  * (incremental) — the Spark-idiomatic way to keep the two paths from
  * drifting. Watermarking bounds state: late events beyond the watermark are
  * dropped instead of growing the state store forever.
  */
object EventStreams {

  /** Tumbling-window counts+sums per event_type. Works on batch or
    * streaming input unchanged.
    */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Hourly OHLC bars as a pure streaming aggregation: open/close are
    * `min_by`/`max_by` on the (ts, event_id) event-time order — declarative
    * aggregates a streaming state store can maintain incrementally, unlike
    * the batch path's first/last window frames (window functions don't run
    * on streams). The unique event_id tiebreak makes open/close
    * deterministic even under identical timestamps, so batch and stream
    * agree bit-for-bit with [[graft.queries.BehaviorQueries]]'s e_ohlc.
    * Works on batch or streaming input unchanged.
    */
  def ohlcBars(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n"))
      .select(col("event_type"),
        date_format(col("window.start"), "yyyy-MM-dd HH:00").as("hour"),
        col("open"), col("high"), col("low"), col("close"), col("n"))

  /** Sessionization-flavored stateful shape without custom state: per-user
    * windowed activity (counts per user per window) — the aggregation whose
    * state the watermark is actually bounding at scale.
    */
  def userActivity(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), windowLen), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("user_id"), col("n_events"))

  /** Gap-based sessionization with Spark's native `session_window` —
    * batch/stream agnostic like [[windowedCounts]]. A session's end is
    * last-event-ts + gap (Spark semantics); two events exactly `gap` apart
    * fall in different sessions.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("sess_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("sess_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  case class TEv(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class StageReached(user_id: Long, stage: Int)

  /** Funnel event list + the deepest stage already emitted — emit-on-change
    * needs the high-water mark in state, not just the events.
    */
  case class FunnelState(evs: Vector[(String, Long)], emitted: Int,
                         lastUs: Long)

  /** Funnel progress as a custom-state operator
    * (`flatMapGroupsWithState`): per user, the greedy earliest-anchor
    * chain (the e_funnel semantics) evaluated from a compact state — one
    * (type, ts) vector per user, bounded by that user's funnel-type
    * events, never the whole stream.
    *
    * Output contract (batch AND streaming): an append-only DEPTH-INCREASE
    * log — (user_id, depth) is emitted only when the user's deepest
    * reached stage strictly exceeds everything already emitted for them.
    * On a batch input there is exactly one invocation per user, so each
    * user appears at most once and a plain `groupBy(stage).count()` is the
    * stage rollup (what e_funnel_stateful asserts). On a stream a user who
    * deepens across micro-batches appears once per NEW depth, so the
    * rollup is over the per-user MAX depth (`groupBy(user).agg(max)` →
    * count) — counting raw rows would credit the same user at several
    * depths. The emit-only-on-change discipline means a micro-batch that
    * brings a user new events but no new depth emits nothing.
    *
    * State lifetime: on a streaming input the input gets a 1-hour
    * watermark and per-user state an event-time timeout `horizonHours`
    * past the user's last funnel event — an abandoned funnel is evicted
    * once the watermark passes that point, bounding state by the
    * active-user set instead of growing forever. A user who returns after
    * eviction starts a fresh chain; `horizonHours` is therefore the funnel
    * attribution window, not a tuning knob. Batch inputs keep NoTimeout
    * (one invocation,
    * nothing outlives the job).
    *
    * Why state is the event list and not a stage cursor: the greedy chain
    * re-anchors when an EARLIER stage-1 event arrives (out-of-order
    * delivery), which a bare cursor cannot undo — the list is the minimal
    * state that replays exactly, and it is what makes the operator equal
    * to the batch cascade on any arrival order (spec-pinned).
    */
  def funnelStateful(events: DataFrame, stages: Seq[String],
                     horizonHours: Int = 24): Dataset[StageReached] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val horizonMs = horizonHours * 3600000L
    def usOf(t: java.sql.Timestamp): Long = {
      val i = t.toInstant; i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def chain(evs: Seq[(String, Long)]): Int = {
      var anchor = Long.MinValue
      var depth = 0
      stages.foreach { st =>
        if (depth == stages.indexOf(st)) {
          val next = evs.iterator
            .filter(e => e._1 == st &&
              (if (depth == 0) true else e._2 > anchor))
            .map(_._2).reduceOption(_ min _)
          next.foreach { t => anchor = t; depth += 1 }
        }
      }
      depth
    }
    val src = if (streaming) events.withWatermark("ts", "1 hour") else events
    src.select(col("user_id"), col("ts"), col("event_type"))
      .filter(col("event_type").isin(stages: _*)).as[TEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageReached](
        OutputMode.Append,
        if (streaming) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[TEv], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // abandoned funnel: depth was already emitted on change, so
            // eviction is silent
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(
              FunnelState(Vector.empty, 0, Long.MinValue))
            val evs = prev.evs ++ it.map(e => (e.event_type, usOf(e.ts)))
            val last = evs.foldLeft(prev.lastUs)((m, e) => math.max(m, e._2))
            val d = chain(evs)
            state.update(FunnelState(evs, math.max(prev.emitted, d), last))
            if (streaming)
              state.setTimeoutTimestamp(math.max(last / 1000L + horizonMs,
                state.getCurrentWatermarkMs() + 1))
            if (d > prev.emitted) Iterator(StageReached(uid, d))
            else Iterator.empty
          }
      }
  }

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class Sess(user_id: Long, sess_start: java.sql.Timestamp,
                  sess_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Open-session state carried across micro-batches: timestamps in epoch
    * micros; the running sum quantized to 1e-4 (a long of value×10000, the
    * exact integer form of the batch path's `cast(value as decimal(18,4))`)
    * so re-aggregation order can never perturb the float result.
    */
  case class SessState(startUs: Long, lastUs: Long, n: Long, sumQ: Long)

  /** The same sessionization as [[sessionize]] but through
    * `flatMapGroupsWithState` — the custom-state surface for logic
    * session_window can't express (e.g. per-session caps, custom merge
    * rules).
    *
    * On a *streaming* input the open session is persisted in [[GroupState]]
    * with an event-time timeout at (last event + gap): sessions spanning
    * micro-batches keep merging until the watermark passes the session end,
    * at which point the timeout fires and the closed session is emitted —
    * any event that could still have extended it would by then be beyond the
    * watermark and dropped anyway. State is per-user, hash-distributed on
    * user_id, and bounded by the watermark.
    *
    * On a *batch* input (detected via `isStreaming`) there is exactly one
    * invocation per user with all events, so trailing sessions are flushed
    * at end-of-group instead of parked in state.
    */
  def sessionizeStateful(events: DataFrame, gapMinutes: Int): Dataset[Sess] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L
    val gapMs = gapMinutes * 60000L
    val streaming = events.isStreaming

    def us(t: java.sql.Timestamp): Long = {
      val i = t.toInstant; i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def tsOf(u: Long): java.sql.Timestamp = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(u / 1000000L, (u % 1000000L) * 1000L))
    def close(uid: Long, s: SessState): Sess =
      Sess(uid, tsOf(s.startUs), tsOf(s.lastUs + gapUs), s.n, s.sumQ / 1e4)

    val src = if (streaming) events.withWatermark("ts", "1 hour") else events
    src.select(col("user_id"), col("ts"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Sess](
        OutputMode.Append,
        if (streaming) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // watermark passed session end: close and clear
            val out = state.getOption.map(close(uid, _)).iterator
            state.remove()
            out
          } else {
            val evs = it.toVector.sortBy(e => us(e.ts))
            val out = Vector.newBuilder[Sess]
            var cur = state.getOption
            evs.foreach { e =>
              val t = us(e.ts)
              val q = (BigDecimal(e.value.toString)
                .setScale(4, BigDecimal.RoundingMode.HALF_UP) * 10000).toLongExact
              cur match {
                case Some(s) if t - s.lastUs >= gapUs =>
                  out += close(uid, s)
                  cur = Some(SessState(t, t, 1, q))
                case Some(s) =>
                  // max/min guards: a late-but-within-watermark event may
                  // sort before the stored session bounds
                  cur = Some(SessState(math.min(s.startUs, t),
                    math.max(s.lastUs, t), s.n + 1, s.sumQ + q))
                case None =>
                  cur = Some(SessState(t, t, 1, q))
              }
            }
            cur.foreach { s =>
              if (streaming) {
                state.update(s)
                // timeout must be strictly beyond the current watermark
                state.setTimeoutTimestamp(
                  math.max(s.lastUs / 1000L + gapMs, state.getCurrentWatermarkMs() + 1))
              } else out += close(uid, s)
            }
            out.result().iterator
          }
      }
  }

  /** Stream-stream interval join: (purchase, click) pairs where the click
    * happened within the hour before the purchase, by the same user. Both
    * sides carry a watermark, so the join state (clicks awaiting future
    * purchases and vice versa) is bounded: a click older than
    * watermark - window can never match a future purchase and is evicted.
    * Batch/stream agnostic like [[windowedCounts]] — on a batch input Spark
    * plans the same expression as an equi-join on user_id with a range
    * post-filter.
    */
  def rangeJoinPairs(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("event_id"))
      .withWatermark("purchase_ts", "1 hour")
    purchases.join(clicks,
        col("p_user_id") === col("user_id") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
          col("click_ts") < col("purchase_ts"))
      .select(col("event_id"), col("click_id"))
  }

  /** Shared streaming file source: batch-inferred schema, single-file paths
    * served as parent-dir + glob (the file source wants a directory), and
    * the events ns-`ts` convention applied (no-op for other schemas — see
    * [[graft.core.Tables.normalizeEventTs]]).
    */
  private def fileSource(spark: SparkSession, path: String,
                         options: Map[String, String] = Map.empty): DataFrame = {
    // set at session build time by every graft entry point; only written
    // here as a fallback for external sessions (avoids racing concurrent
    // query planning in Verify — see ADVICE r3)
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        .toLowerCase != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(path).schema
    val f = new java.io.File(path)
    val reader = spark.readStream.schema(schema).options(options)
    val src =
      if (f.isFile) reader.option("pathGlobFilter", f.getName).parquet(f.getParent)
      else reader.parquet(path)
    graft.core.Tables.normalizeEventTs(src)
  }

  /** Drive a started query to completion; a timeout is an ERROR (stopping a
    * half-done AvailableNow run would silently truncate the sink).
    */
  private def runToCompletion(q: org.apache.spark.sql.streaming.StreamingQuery,
                              timeoutMs: Long): Unit =
    try {
      if (!q.awaitTermination(timeoutMs))
        throw new IllegalStateException(
          s"streaming query '${q.name}' still running after ${timeoutMs}ms — " +
            "output would be truncated")
    } finally q.stop()

  /** Continuous file-pipeline sink: stream a transform's append output into
    * a parquet directory with a checkpoint location — Spark's commit-log
    * gives exactly-once file output across restarts (crashed batches are
    * re-run, half-written files are never visible to readers via the
    * `_spark_metadata` log). This is the shape of a production ingest hop:
    * raw events dir → transform → curated parquet dir.
    */
  def streamToParquet(spark: SparkSession, srcPath: String, outPath: String,
                      checkpointPath: String,
                      transform: DataFrame => DataFrame): Unit = {
    val q = transform(fileSource(spark, srcPath)).writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
    runToCompletion(q, 300000)
  }

  /** Maintain a MATERIALIZED AGGREGATE CUBE from an append stream — the
    * streaming side of the catalog cube's IVM: each micro-batch reduces
    * to group-count-sized partials ([[graft.core.Catalog.cubePartials]]:
    * count + order-free decimal sums + min/max per measure) which MERGE
    * into the accumulated at-rest cube (sums add, counts add, mins min,
    * maxes max — all commutative, so the result is identical for ANY
    * batching or arrival order of the same rows). Every batch rewrites
    * only cube-sized parquet (one version dir per batch — the refresh
    * ledger a warehouse MV keeps), never data-sized state: at 100 TB/day
    * the stream-side cost per batch is one partial aggregation of that
    * batch plus a kilobyte-scale merge. Returns the final cube partials;
    * project with [[graft.core.Catalog.cubeFinish]].
    */
  def cubeMaintain(spark: SparkSession, srcPath: String,
                   groupCols: Seq[String], measures: Seq[String],
                   queryName: String): DataFrame =
    maintainVersioned(spark, srcPath, queryName, "stream_cube_") {
      (prev, batch) =>
        val partial =
          graft.core.Catalog.cubePartials(batch, groupCols, measures)
        graft.core.Catalog.cubeMergePartials(
          prev.fold(partial)(_.unionByName(partial)), groupCols, measures)
    }

  /** The versioned at-rest maintenance loop shared by [[cubeMaintain]]
    * and [[pairsMaintain]]: each micro-batch folds the previous at-rest
    * state (None on the first batch) with the arriving rows into the
    * next version dir under `foreachBatch` + AvailableNow; the final
    * version is the maintained result. The fold must be commutative and
    * idempotent-on-replay for the result to equal a one-shot batch
    * computation — which is exactly what the st_* oracles check.
    */
  private def maintainVersioned(spark: SparkSession, srcPath: String,
                                queryName: String, prefix: String)(
      fold: (Option[DataFrame], DataFrame) => DataFrame): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(prefix)
    graft.core.Catalog.registerTempDir(root) // refresh ledger dies at exit
    val version = new java.util.concurrent.atomic.AtomicInteger(0)
    def verDir(v: Int) = s"$root/v$v"
    val mergeBatch: (DataFrame, Long) => Unit = (batch, _) => {
      val v = version.get()
      val prev = if (v == 0) None else Some(spark.read.parquet(verDir(v)))
      fold(prev, batch).coalesce(1).write.parquet(verDir(v + 1))
      version.incrementAndGet()
      ()
    }
    val q = fileSource(spark, srcPath,
        Map("maxFilesPerTrigger" -> "1")).writeStream
      .queryName(queryName)
      .foreachBatch(mergeBatch)
      .trigger(Trigger.AvailableNow())
      .start()
    runToCompletion(q, 300000)
    require(version.get() > 0, s"stream '$queryName' saw no batches")
    spark.read.parquet(verDir(version.get()))
  }

  /** Streaming maintenance of the bucketed BM25 postings (the
    * [[graft.core.Catalog]] postings layout's stream side): each batch's
    * per-(doc, term) tf/dl rows UNION into the at-rest index — appended
    * docs are NEW keys, so the union IS the merged index — and a per-doc
    * sidecar row (NULL term) accumulates the two corpus scalars exactly,
    * including zero-token docs, which have no postings row but still
    * count in nDocs/avgdl. A RE-DELIVERED doc id (an update, or an
    * at-least-once source replay) UPSERTS: the batch first dedups to
    * its last-arriving row per id, then the previous generation's
    * rows anti-join away before the union, so the maintained state is
    * exactly one generation per doc — last writer wins, never a silent
    * double count, whether the replay lands in a later batch or inside
    * the same one. Per-batch tokenize is batch-sized; the versioned
    * fold rewrites the at-rest state per batch (the simple AvailableNow
    * shape shared by every st_* twin — the at-SCALE incremental path is
    * the catalog postings layout, which delta-patches instead). Returns
    * (postings, nDocs, avgdl) — BM25 served from them is
    * digit-identical to a one-shot index build over the latest
    * generation of every doc, for ANY batching and ANY arrival order of
    * distinct docs, which is what st_bm25's oracle checks.
    */
  def postingsMaintain(spark: SparkSession, srcPath: String,
                       idCol: String, textCol: String, buckets: Int,
                       queryName: String): (DataFrame, Long, Double) = {
    import graft.functions.TextFunctions
    val all = maintainVersioned(spark, srcPath, queryName,
      "stream_postings_") { (prev, batch0) =>
      // one generation per doc id WITHIN the batch too: the anti-join
      // below only dedups ACROSS batches, so a doc re-delivered twice
      // in one micro-batch would otherwise double-count nDocs/avgdl and
      // its postings. Keep the last-arriving row per id — arrival order
      // via monotonically_increasing_id, which is EXACT here because
      // maintainVersioned feeds one FILE per micro-batch
      // (maxFilesPerTrigger=1) and a single file's splits are ordered by
      // offset; a multi-file batch would order by partition index, not
      // delivery, and would need an explicit sequence column instead.
      val batch = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol)).orderBy(col("__arr").desc)
        batch0.withColumn("__arr", monotonically_increasing_id())
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__arr", "__rn")
      }
      val rows = graft.operators.Retrieval
        .postingsRowsFor(batch, idCol, textCol, buckets)
        .withColumnRenamed("id", "doc")
        .select("doc", "dl", "term", "tf", "__tb")
      val docRows = batch.select(col(idCol).as("doc"),
          size(TextFunctions.tokens(col(textCol))).cast("int").as("dl"))
        .select(col("doc"), col("dl"),
          lit(null).cast("string").as("term"), lit(0L).as("tf"),
          lit(-1).as("__tb"))
      val add = rows.unionByName(docRows)
      prev.map(_.join(batch.select(col(idCol).as("doc")).distinct(),
          Seq("doc"), "left_anti"))
        .fold(add)(_.unionByName(add))
    }
    // the scalars replay postingsStats' exact arithmetic over the
    // sidecar rows (one per ingested doc)
    val st = all.filter(col("term").isNull)
      .agg(count(lit(1)).as("n"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      .head()
    (all.filter(col("term").isNotNull), st.getLong(0),
      if (st.isNullAt(1)) 0.0 else st.getDouble(1))
  }

  /** Streaming INGESTION into a catalog session — the CDC/append loop
    * of a training-data pipeline. Each micro-batch APPENDS its rows to
    * the session ([[graft.core.EditorSession.appendRows]]: position-
    * stamped, checkpoint-pinned, logged as a row INSERT) and then
    * refreshes the session's stale layouts, which delta-patch with
    * exactly the batch's rows — base files stay byte-identical, patch
    * legs are batch-sized, and compaction folds them on the usual 8×
    * bound. This is the difference at 100 TB/day between "re-index the
    * corpus nightly" and "every layout is queryable seconds behind the
    * feed". Returns the number of ingested rows; the maintained state
    * is the session itself (every routed read now serves
    * original ∪ batches).
    */
  def appendMaintain(spark: SparkSession, srcPath: String,
                     cat: graft.core.Catalog, name: String,
                     queryName: String): Long = {
    val appended = new java.util.concurrent.atomic.AtomicLong(0L)
    val ingest: (DataFrame, Long) => Unit = (batch, _) => {
      appended.addAndGet(cat.get(name).get.appendRows(batch))
      cat.refreshStale(name)
      ()
    }
    val q = fileSource(spark, srcPath,
        Map("maxFilesPerTrigger" -> "1")).writeStream
      .queryName(queryName)
      .foreachBatch(ingest)
      .trigger(Trigger.AvailableNow())
      .start()
    runToCompletion(q, 300000)
    appended.get()
  }

  /** Streaming maintenance of a distinct-pairs projection (the
    * [[graft.core.Catalog]] pairs layout's stream side): each
    * micro-batch's distinct (groupCols…, pairCol) tuples merge into the
    * at-rest set by union + re-distinct. Distinctness is idempotent,
    * commutative, and order-free, so the maintained pairs — and any
    * `COUNT(DISTINCT)` served from them — are IDENTICAL to a one-shot
    * batch distinct no matter how the rows were sliced into batches;
    * per-batch work is batch + pairs-count-sized, never corpus-sized.
    */
  def pairsMaintain(spark: SparkSession, srcPath: String,
                    groupCols: Seq[String], pairCol: String,
                    queryName: String): DataFrame = {
    val cols = (groupCols :+ pairCol).map(col)
    maintainVersioned(spark, srcPath, queryName, "stream_pairs_") {
      (prev, batch) =>
        val partial = batch.select(cols: _*).distinct()
        prev.fold(partial)(_.unionByName(partial)).distinct()
    }
  }

  /** Streaming maintenance of a per-group HLL DISTINCT-COUNT sketch (the
    * [[graft.core.Catalog]] sketch layout's stream side — r10 verdict
    * task #6): each micro-batch sketches its own rows per group
    * (`hll_sketch_agg`), then merges into the at-rest state with
    * `hll_union_agg`. HLL register state is a MAX over hashed values —
    * associative, commutative, idempotent — so the maintained registers
    * are identical for any batching or arrival order of the same rows,
    * and an estimate through the union+estimate path (the same
    * expression [[graft.core.Catalog.approxDistinct]]'s routed branch
    * uses) is digit-identical to one served from a batch-built layout.
    * Per-batch work is batch + group-count-sized; the at-rest state is
    * kilobytes per group, never data-sized.
    */
  def sketchMaintain(spark: SparkSession, srcPath: String,
                     groupCols: Seq[String], sketchCol: String, lgK: Int,
                     queryName: String): DataFrame =
    maintainVersioned(spark, srcPath, queryName, "stream_sketch_") {
      (prev, batch) =>
        val partial = batch.groupBy(groupCols.map(col): _*)
          .agg(hll_sketch_agg(col(sketchCol), lit(lgK)).as("__hll"))
        prev.fold(partial)(p => p.unionByName(partial)
          .groupBy(groupCols.map(col): _*)
          .agg(hll_union_agg(col("__hll"), lit(false)).as("__hll")))
    }

  /** Run a streaming query over a parquet directory with Trigger.AvailableNow
    * (process-everything-then-stop) into a memory sink; returns the result
    * table. This is the full streaming engine path — source → watermark →
    * stateful agg → sink — driven synchronously so batch oracles can check it.
    */
  def runAvailableNow(spark: SparkSession, path: String,
                      transform: DataFrame => DataFrame,
                      queryName: String,
                      outputMode: String = "complete",
                      sourceOptions: Map[String, String] = Map.empty)
      : DataFrame = {
    val q = transform(fileSource(spark, path, sourceOptions)).writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    runToCompletion(q, 300000)
    spark.table(queryName)
  }
}
