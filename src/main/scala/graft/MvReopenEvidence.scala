package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scan-volume + wall-clock evidence for the r14 durable-MV and
  * partitioned-CTAS surfaces at a given SF:
  *
  *  1. `CREATE MATERIALIZED VIEW` on a DURABLE catalog (one-time build),
  *     then a FRESH catalog over the same warehouse — the cross-process
  *     reopen the r13 verdict's top task exists for. Reported: reopen
  *     cost (the digest-gated attach — one column-pruned hash pass,
  *     never a re-aggregate) and the reopened mv read's input
  *     files/bytes/sec vs the same aggregate over the raw fact table.
  *     The scale claim: reopen cost grows with ONE narrow projection of
  *     the corpus, and the read stays cube-sized (flat) while the live
  *     aggregate grows with the corpus.
  *  2. SQL `PARTITIONED BY` CTAS over orders, then a downstream
  *     partition-filtered read of the written directory — files/bytes
  *     read vs the directory total (plan-time pruning).
  *
  * Protocol: min-of-2 wall-clock, idle box, local[32] — same as
  * RollupEvidence.
  */
object MvReopenEvidence {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-mv-reopen-evidence")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      // AQE re-plans at execution, detaching the probe's collected scan
      // node from the one that runs — its numFiles metric then reads 0;
      // this main measures scan volume, so plan once
      .config("spark.sql.adaptive.enabled", false)
      .config("spark.ui.enabled", false)
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def bytesOf(files: Seq[String]): Long =
      files.map(f => new java.io.File(new java.net.URI(f)).length()).sum

    val wh = java.nio.file.Files.createTempDirectory("graft_mvev_wh_")
      .toString
    val body =
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice, 6) AS DECIMAL(38,6)))
        |    AS DOUBLE) AS tot
        |FROM __T__ GROUP BY o_orderstatus ORDER BY o_orderstatus"""
        .stripMargin

    // one-time: durable catalog, session, CREATE MATERIALIZED VIEW
    val (buildSec, _) = timed {
      val cat = new graft.core.Catalog(spark, Some(wh))
      cat.open("mvev", s"$sfDir/orders.parquet",
        orderCols = Seq("o_orderkey"))
      cat.sql("CREATE MATERIALIZED VIEW evmv AS " +
        body.replace("__T__", "mvev").replace("ORDER BY o_orderstatus", ""))
      cat.sql("SELECT * FROM evmv").collect()
    }
    println(f"mv_build: sec=$buildSec%.3f (one-time, includes open+cube)")

    // the cross-process reopen: fresh catalog, digest-gated re-attach
    val (reopenSec, cat2) = timed {
      val c = new graft.core.Catalog(spark, Some(wh))
      c.open("mvev", s"$sfDir/orders.parquet",
        orderCols = Seq("o_orderkey"))
      c
    }
    println(f"mv_reopen: sec=$reopenSec%.3f (digest attach, no rebuild)")

    def run(label: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val files = df.inputFiles.toSeq
      val times = (1 to 2).map { _ => timed(df.collect())._1 }
      println(f"$label: files=${files.size} bytes=${bytesOf(files)} " +
        f"sec=${times.min}%.3f")
    }
    run("mv_read_reopened",
      cat2.sql("SELECT * FROM evmv ORDER BY o_orderstatus"))
    graft.core.Tables.load(spark, sfDir, "orders")
      .createOrReplaceTempView("mvev_raw")
    run("live_aggregate", spark.sql(body.replace("__T__", "mvev_raw")))

    // partitioned CTAS + downstream pruned read
    val (ctasSec, _) = timed {
      cat2.sql("CREATE TABLE evpart PARTITIONED BY (o_orderstatus) AS " +
        "SELECT * FROM mvev")
    }
    val dir = cat2.sourcePathOf("evpart").get
    val all = spark.read.parquet(dir).inputFiles.toSeq
    val pruned = spark.read.parquet(dir)
      .filter(col("o_orderstatus") === "P")
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val times = (1 to 2).map { _ => timed(pruned.collect())._1 }
    // the partition-pruned file set = the named partition's directory
    // census (the plan-time pin — readFiles == census — is SqlDdlSpec's
    // numFiles-metric assertion; here the census is the volume report)
    val pFiles = all.filter(_.contains("o_orderstatus=P"))
    println(f"ctas_partitioned: write_sec=$ctasSec%.3f " +
      f"total_files=${all.size} total_bytes=${bytesOf(all)}")
    println(f"pruned_read: files=${pFiles.size} bytes=${bytesOf(pFiles)} " +
      f"sec=${times.min}%.3f partition_filtered=" +
      s"${scan.toString.contains("o_orderstatus")}")
    spark.stop()
  }
}
