package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Helpers for loading the driver-generated test tables.
  *
  * The reference app (sayakpanja15/parquet_editor) loads one file into one
  * in-memory table (`/root/reference/main.py:67-76`). Our engine reads the
  * same data lazily through the Spark parquet source so scans are columnar,
  * predicate-pushed and distributed.
  */
object Tables {
  val tpchTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Lazy parquet scan of one named table under `dir`.
    *
    * The test tables store timestamps as tz-less micros (`timestamp[us]`),
    * which Spark 4 would surface as TIMESTAMP_NTZ by default. We want
    * instant semantics (session tz is pinned to UTC everywhere), so every
    * graft entry point builds its session with
    * `spark.sql.parquet.inferTimestampNTZ.enabled=false`. For external
    * sessions built without the flag there is no per-read parquet option
    * (ParquetOptions carries no NTZ key), and a `spark.conf.set` here would
    * both race concurrent planning and silently change NTZ inference for
    * the caller's other reads — so instead the fallback casts any top-level
    * NTZ column to an instant after the read, leaving the session conf
    * untouched. The test tables are flat; nested NTZ fields (absent here)
    * would pass through unchanged.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (!df.schema.fields.exists(_.dataType == TimestampNTZType)) df
    else df.select(df.schema.fields.map { f =>
      if (f.dataType == TimestampNTZType)
        col(f.name).cast(TimestampType).as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)
  }

  /** The `events` table is written with nanosecond timestamps, which the
    * Spark 4 parquet reader rejects outright; read them as raw nanos
    * (legacy flag) and surface a proper micros TimestampType `ts`.
    *
    * The flag should be set at SparkSession build time (every graft entry
    * point does); query builders run concurrently in Verify, so a per-load
    * conf write would race with other queries' planning. The conditional set
    * below is only a fallback for external sessions built without it —
    * read-only when the flag is already in place.
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        .toLowerCase != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(spark, dir, "events"))
  }

  /** Events-table convention: a LongType `ts` column holds epoch NANOS and
    * is converted to TimestampType (micros); a no-op for any other shape,
    * including sources with no `ts` column at all. Integer `div` — a double
    * roundtrip would lose precision at ~1.7e18 ns. Sources whose long `ts`
    * means something else (e.g. millis) must convert before this sees them.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => df
    }
}
