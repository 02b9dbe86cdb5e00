package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

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
