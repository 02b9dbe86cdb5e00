package graft

import org.apache.spark.sql.SparkSession

/** Scan-volume evidence for the r14 join-mv rewrite (eager aggregation
  * onto the stored fact cube): the same fact⋈dim aggregate text over a
  * cube-covered session vs the raw tables, reporting input files, input
  * bytes, and min-of-2 wall-clock at the given SF. The claim at scale
  * is the INPUT-VOLUME ratio — the routed form joins
  * distinct-key-cardinality stored cells against the dimension while
  * the live form scans the fact table — so the live cost grows linearly
  * with the corpus and the routed cost stays key-cardinality-flat.
  */
object JoinMvEvidence {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-joinmv-evidence")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cat = new graft.core.Catalog(spark)
    cat.openFrom("li_jme",
      graft.core.Tables.load(spark, sfDir, "lineitem"),
      Seq("l_orderkey", "l_linenumber"))
    cat.openFrom("sup_jme",
      graft.core.Tables.load(spark, sfDir, "supplier"), Seq("s_suppkey"))
    cat.buildCubeLayout("li_jme", Seq("l_suppkey"), Seq("l_quantity"))
    graft.core.Tables.load(spark, sfDir, "lineitem")
      .createOrReplaceTempView("li_jme_raw")
    graft.core.Tables.load(spark, sfDir, "supplier")
      .createOrReplaceTempView("sup_jme_raw")

    val body =
      """SELECT s_name, count(*) AS n,
        |  CAST(sum(CAST(round(l_quantity, 6) AS DECIMAL(38,6)))
        |    AS DOUBLE) AS qty
        |FROM __F__ JOIN __D__ ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin

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

    run("routed",
      cat.sql(body.replace("__F__", "li_jme").replace("__D__", "sup_jme")))
    run("live  ",
      spark.sql(body.replace("__F__", "li_jme_raw")
        .replace("__D__", "sup_jme_raw")))
    spark.stop()
  }
}
