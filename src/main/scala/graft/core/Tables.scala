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

  /** Lazy parquet scan of one named table under `dir`. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
