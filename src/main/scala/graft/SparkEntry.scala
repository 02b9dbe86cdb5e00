package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registries live under [[graft.queries]]; this object is the stable
  * aggregation point the driver (Verify/Bench/smoke) talks to.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises scan → partial/final hash aggregate → shuffle → sort.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ pipeline
    * extensions).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.ParityQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.MaintenanceQueries.queries ++
      graft.queries.BehaviorQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.ParityQueries.oracleSql ++
      graft.queries.AnalyticsQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql ++
      graft.queries.MaintenanceQueries.oracleSql ++
      graft.queries.BehaviorQueries.oracleSql
}
