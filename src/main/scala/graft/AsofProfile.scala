package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Dev-only phase profiler for the routed as-of join — measures where the
  * routed plan spends its time vs the live twin. Not a driver contract.
  */
object AsofProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[asof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val ev = Tables.loadEvents(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id")
    val nClicks = t("count clicks")(clicks.count())
    println(s"[asof] clicks=$nClicks files=${math.max(8, (nClicks / 4096L).toInt)}")
    val probe = t("probe materialize")(
      ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id")
        .orderBy("event_id").limit(1000).localCheckpoint(true))
    val cat = new graft.core.Catalog(spark)
    cat.openFrom("clk_sc", clicks, orderCols = Seq("event_id"))
    t("build layout")(cat.buildRangedLayout("clk_sc", "ts",
      files = math.max(8, (nClicks / 4096L).toInt), idCol = Some("event_id")))
    val l = cat.layoutsOf("clk_sc").collectFirst {
      case (_, r: graft.core.Catalog.RangedLayout) => r
    }.get
    (1 to 3).foreach { i =>
      println(s"--- pass $i ---")
      val mm = t("  envelope agg")(
        probe.agg(min(col("ts")), max(col("ts"))).head())
      val files = t("  candidateFiles")(
        graft.io.SkippingIndex.candidateFilesOpt(l.stats,
          Some(java.sql.Timestamp.from(mm.getTimestamp(0).toInstant
            .minusNanos(1800000000L * 1000L))), Some(mm.get(1))))
      val base = t("  read.parquet")(spark.read.parquet(files: _*))
      t("  asof construct")(graft.operators.AsOfJoin.asofBackward(probe,
        base.select("user_id", "ts", "event_id"), "user_id", "ts",
        Seq("event_id"), tiebreak = Some("event_id"),
        toleranceUs = Some(1800000000L)))
      val routed = t("routed plan")(cat.asofJoin(probe, "clk_sc", "user_id",
        "ts", Seq("event_id"), tiebreak = Some("event_id"),
        toleranceUs = Some(1800000000L)))
      val statRows = l.stats.select("file", "n_rows").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      def norm(p: String) = new org.apache.hadoop.fs.Path(p).toUri.toString
      val normStats = statRows.map { case (k, v) => norm(k) -> v }
      val readFiles = routed.inputFiles.filter(_.contains("catalog_ranged_"))
        .map(norm)
      val readRows = readFiles.flatMap(normStats.get).sum
      println(s"[asof] routed reads ${readFiles.length}/${statRows.size} " +
        s"files, $readRows/$nClicks rows " +
        f"(${100.0 * readRows / nClicks}%.1f%% of the corpus)")
      t("routed count")(routed.count())
      val live = t("live plan")(graft.operators.AsOfJoin.asofBackward(probe,
        clicks, "user_id", "ts", Seq("event_id"),
        tiebreak = Some("event_id"), toleranceUs = Some(1800000000L)))
      t("live count")(live.count())
    }
    spark.stop()
  }
}
