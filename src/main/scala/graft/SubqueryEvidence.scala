package graft

import org.apache.spark.sql.SparkSession

/** Scale evidence for the r13 decorrelated-subquery shapes: wall-clock of
  * the TPC-H Q21 multi-anti (correlated EXISTS + NOT EXISTS → one semi +
  * one anti join) and the Q17 correlated scalar aggregate at the given SF
  * dir, min-of-2. The design claim is LINEAR scaling: Catalyst plans both
  * as joins over single scans (never per-outer-row re-execution), so 10×
  * the facts should cost ~10× the time — a correlated-loop plan would go
  * quadratic.
  */
object SubqueryEvidence {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-subquery-evidence")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String): Unit = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.queries.AnalyticsQueries.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: sec=${times.min}%.3f")
    }
    run("q21_suppliers_waiting")
    run("q17_small_qty")
    spark.stop()
  }
}
