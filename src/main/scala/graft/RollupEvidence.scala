package graft

import org.apache.spark.sql.SparkSession

/** Scan-volume evidence for the r13 grouping-sets cube rewrite: the same
  * 3-set ROLLUP text over a cube-covered session vs the raw fact table,
  * reporting input files, input bytes, and min-of-2 wall-clock at the
  * given SF. The claim at scale is the INPUT-VOLUME ratio — the routed
  * form reads group-count-sized stored partials per set, the live form
  * re-scans the fact table once (Spark's Expand replicates rows, not
  * scans) — so the gap grows linearly with corpus size while the routed
  * cost stays flat.
  */
object RollupEvidence {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-rollup-evidence")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cat = new graft.core.Catalog(spark)
    cat.openFrom("li_re",
      graft.core.Tables.load(spark, sfDir, "lineitem"),
      Seq("l_orderkey", "l_linenumber"))
    cat.buildCubeLayout("li_re", Seq("l_returnflag", "l_linestatus"),
      Seq("l_extendedprice"))
    graft.core.Tables.load(spark, sfDir, "lineitem")
      .createOrReplaceTempView("li_re_raw")

    val body =
      """SELECT coalesce(l_returnflag, '(all)') AS flag,
        |  coalesce(l_linestatus, '(all)') AS status, count(*) AS n,
        |  CAST(sum(CAST(round(l_extendedprice, 6) AS DECIMAL(38,6)))
        |    AS DOUBLE) AS rev
        |FROM __T__ GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin

    def bytesOf(files: Seq[String]): Long =
      files.map(f => new java.io.File(new java.net.URI(f)).length()).sum

    def run(label: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val probe = df
      val files = probe.inputFiles.toSeq
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: files=${files.size} bytes=${bytesOf(files)} " +
        f"sec=${times.min}%.3f")
    }

    run("routed", cat.sql(body.replace("__T__", "li_re")))
    run("live  ", spark.sql(body.replace("__T__", "li_re_raw")))
    spark.stop()
  }
}
