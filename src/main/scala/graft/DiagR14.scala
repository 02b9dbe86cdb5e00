package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{EditorSession, Tables}

/** r13 verdict task #4 diagnostic: per-iteration standalone series for
  * the two workloads that regressed settled-vs-r12 with UNTOUCHED code
  * (`d_minhash_lsh` 1.10 → 1.62 s, `r46_delete_splice` 1.43 → 1.86 s —
  * both still under the r02 baseline). Same protocol as DiagR13: idle
  * box, standalone JVM, 8 iterations each, flat-after-iter-2 = the
  * in-suite numbers were contention, a rising tail = state accumulation,
  * a uniformly high series = a real regression.
  */
object DiagR14 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-diag-r14")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // exactly the bench's d_minhash_lsh body
    {
      val ts = (1 to 8).map { _ =>
        timed {
          graft.operators.Dedup.minhashLshPairs(
            Tables.load(spark, sfDir, "documents"), "doc_id", "text",
            n = 3, threshold = 0.4, numHashes = 32, bands = 16).count()
        }
      }
      println("d_minhash_lsh iters: " + ts.map(t => f"$t%.3f").mkString(","))
    }

    // exactly the bench's r46_delete_splice body
    {
      val ts = (1 to 8).map { _ =>
        timed {
          val sess = EditorSession.fromDataFrame(
            Tables.load(spark, sfDir, "lineitem"),
            Seq("l_orderkey", "l_linenumber", "l_extendedprice"))
          sess.deleteRows(Seq(0L, 1L))
          sess.cut(Seq(10L, 11L, 12L))
          sess.paste(5L)
          sess.rowCount
        }
      }
      println("r46_delete_splice iters: " +
        ts.map(t => f"$t%.3f").mkString(","))
    }

    spark.stop()
  }
}
