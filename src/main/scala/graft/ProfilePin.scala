package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Tables

/** Dev-only: compare strategies for pinning the sorted positional base
  * (the dominant phase of the R-workloads per graft.Profile). Not part of
  * the driver contract.
  */
object ProfilePin {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pin] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    def load() = Tables.load(spark, sfDir, "lineitem")
    val ord = Seq(col("l_orderkey"), col("l_linenumber"))

    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      t("sort+count (no pin)") {
        load().orderBy(ord: _*).count()
      }
      t("sort+localCheckpoint eager") {
        val d = load().orderBy(ord: _*).localCheckpoint(eager = true)
        d.unpersist(blocking = true)
      }
      t("sort+persist MEMORY_ONLY") {
        val d = load().orderBy(ord: _*).persist(StorageLevel.MEMORY_ONLY)
        d.count(); d.unpersist(blocking = true)
      }
      t("sort+persist MEM_ONLY_SER") {
        val d = load().orderBy(ord: _*).persist(StorageLevel.MEMORY_ONLY_SER)
        d.count(); d.unpersist(blocking = true)
      }
      t("full attachPos (current)") {
        val d = graft.core.Positional.attachPos(load(), ord: _*)
        d.count()
      }
      t("sort+localCk MEM_ONLY_SER") {
        val d = load().orderBy(ord: _*)
          .localCheckpoint(true, StorageLevel.MEMORY_ONLY_SER)
        d.unpersist(blocking = true)
      }
      t("sort+localCk MEMORY_ONLY") {
        val d = load().orderBy(ord: _*)
          .localCheckpoint(true, StorageLevel.MEMORY_ONLY)
        d.unpersist(blocking = true)
      }
      // consumer-read cost over each pin flavor
      val ck = load().orderBy(ord: _*).localCheckpoint(eager = true)
      t("read localCheckpoint x3") {
        (1 to 3).foreach(_ => ck.filter(col("l_quantity") === 42.0).count())
      }
      ck.unpersist(blocking = true)
      val pm = load().orderBy(ord: _*).persist(StorageLevel.MEMORY_ONLY)
      pm.count()
      t("read MEMORY_ONLY cache x3") {
        (1 to 3).foreach(_ => pm.filter(col("l_quantity") === 42.0).count())
      }
      pm.unpersist(blocking = true)
    }
    spark.stop()
  }
}
