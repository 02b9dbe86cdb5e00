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

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class Sess(user_id: Long, sess_start: java.sql.Timestamp,
                  sess_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** The same sessionization as [[sessionize]] but through
    * `flatMapGroupsWithState` — the custom-state surface for logic
    * session_window can't express (e.g. per-session caps, custom merge
    * rules). State here is per-user only; at scale the hash shuffle on
    * user_id distributes state across executors and the watermark bounds it.
    */
  def sessionizeStateful(events: DataFrame, gapMinutes: Int): Dataset[Sess] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events.select(col("user_id"), col("ts"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Sess](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], _: GroupState[Long]) =>
          val evs = it.toVector.sortBy(_.ts.getTime)
          if (evs.isEmpty) Iterator.empty
          else {
            val sessions = Vector.newBuilder[Sess]
            var start = evs.head.ts; var last = evs.head.ts
            var n = 0L; var sum = BigDecimal(0)
            def flush(): Unit = sessions += Sess(uid, start,
              new java.sql.Timestamp(last.getTime + gapMs), n, sum.toDouble)
            evs.foreach { e =>
              if (e.ts.getTime - last.getTime >= gapMs) { flush(); start = e.ts; n = 0; sum = 0 }
              n += 1
              // quantize like the batch path's cast(value as decimal(18,4))
              sum += BigDecimal(e.value.toString)
                .setScale(4, BigDecimal.RoundingMode.HALF_UP)
              last = e.ts
            }
            flush()
            sessions.result().iterator
          }
      }
  }

  /** Run a streaming query over a parquet directory with Trigger.AvailableNow
    * (process-everything-then-stop) into a memory sink; returns the result
    * table. This is the full streaming engine path — source → watermark →
    * stateful agg → sink — driven synchronously so batch oracles can check it.
    */
  def runAvailableNow(spark: SparkSession, path: String,
                      transform: DataFrame => DataFrame,
                      queryName: String): DataFrame = {
    // events parquet carries nanosecond timestamps — read as long + convert
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(path).schema
    // the streaming file source wants a directory; a single-file path is
    // served as parent-dir + glob so the same API covers both layouts
    val f = new java.io.File(path)
    val reader = spark.readStream.schema(schema)
    val src =
      if (f.isFile) reader.option("pathGlobFilter", f.getName).parquet(f.getParent)
      else reader.parquet(path)
    val stream = graft.core.Tables.normalizeEventTs(src)
    val q = transform(stream).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination(300000)
    finally q.stop()
    spark.table(queryName)
  }
}
