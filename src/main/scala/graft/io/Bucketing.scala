package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sorted-bucketed table layout — the persisted-partitioning tool that makes
  * repeated big joins/aggregations on the same key shuffle-free.
  *
  * At 100 TB the dominant cost of a fact-fact join is the exchange of both
  * sides. Writing each fact bucketed (`bucketBy(n, key).sortBy(key)`) pays
  * that shuffle ONCE at ingest; every later equi-join or aggregation on the
  * bucket key reads co-located, pre-sorted buckets and plans a sort-merge
  * join with no Exchange on either side (see BucketingSpec, which asserts
  * the absence of shuffles in the physical plan). Bucket counts should be
  * sized so one bucket ≈ one task's worth of data at target scale.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed+sorted on `key`.
    *
    * A previous process may have left this table's files under the
    * warehouse dir without a catalog entry (the default catalog is
    * in-memory, the directory is not) — `saveAsTable` then fails with
    * LOCATION_ALREADY_EXISTS rather than overwriting, so clear both the
    * catalog entry and the orphaned location first.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    // Simple names only: a qualified "db.t" would backtick-quote as one
    // identifier in DROP TABLE (dropping nothing) while the orphan path
    // below pointed at <warehouse>/db.t instead of <warehouse>/db.db/t —
    // the cleanup would miss and saveAsTable would still fail.
    require(!table.contains("."),
      s"writeBucketed takes a simple table name, got: $table")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val db = spark.catalog.currentDatabase
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      if (db == "default") table.toLowerCase
      else s"$db.db/${table.toLowerCase}")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
