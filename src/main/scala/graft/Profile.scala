package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{EditorSession, Tables}

/** Dev-only phase profiler for the bench workloads: prints per-phase wall
  * times so optimization targets are measured, not guessed. Not part of the
  * driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // warmup
    EditorSession.fromDataFrame(Tables.load(spark, "/root/testdata/sf0.001", "lineitem"),
      Seq("l_orderkey", "l_linenumber", "l_extendedprice")).rowCount

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val li = t("load")(Tables.load(spark, sfDir, "lineitem"))
      val sess = t("open(attachPos+pin)")(
        EditorSession.fromDataFrame(li, Seq("l_orderkey", "l_linenumber", "l_extendedprice")))
      t("delete2")(sess.deleteRows(Seq(0L, 1L)))
      t("cut3")(sess.cut(Seq(10L, 11L, 12L)))
      t("paste")(sess.paste(5L))
      t("count")(sess.rowCount)

      val sess2 = t("open2")(
        EditorSession.fromDataFrame(Tables.load(spark, sfDir, "lineitem"),
          Seq("l_orderkey", "l_linenumber", "l_extendedprice")))
      t("edit1000")({ var i = 0; while (i < 1000) { sess2.setCell(i.toLong, "l_quantity", "42"); i += 1 } })
      t("editcount")(sess2.current.filter(col("l_quantity") === 42.0).count())
    }
    spark.stop()
  }
}
