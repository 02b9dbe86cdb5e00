package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables

/** r12 verdict tasks #5/#6 diagnostic: per-iteration timing of the three
  * settled-gap workloads (r_dml_refresh, r_edit_refresh, v_ann_pq) and
  * the regressed a_distinct_routed.
  *
  * Hypothesis under test for #5: the settle pass runs LAST, after ten
  * in-suite passes have accumulated per-pass state (each r_dml/r_edit
  * pass adds one more edit to the layout's delta patch; refreshStale
  * merges a strictly growing edit history), so the gap is STATE GROWTH,
  * not cache warmth — pass-min reflects the early, small-patch
  * iterations. A flat per-iteration series refutes that; a rising one
  * confirms it.
  */
object DiagR13 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-diag-r13")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // ---- r_dml_refresh: per-iteration series --------------------------------
    {
      val cat = new graft.core.Catalog(spark)
      cat.open("diag_ro", s"$sfDir/orders.parquet",
        orderCols = Seq("o_orderkey"))
      cat.buildRangedLayout("diag_ro", "o_totalprice", files = 8,
        idCol = Some("o_orderkey"))
      val sess = cat.get("diag_ro").get
      var n = 0L
      val ts = (1 to 12).map { _ =>
        n += 1
        timed {
          sess.setCell(n % 100, "o_totalprice", (50000 + n).toString + ".5")
          sess.deleteRow(100L + (n % 100))
          cat.refreshStale("diag_ro")
          cat.rangeScan("diag_ro", "o_totalprice", 1000.0, 60000.0).count()
          sess.checkpoint()
        }
      }
      println("r_dml_refresh iters: " +
        ts.map(t => f"$t%.3f").mkString(","))
    }

    // ---- r_edit_refresh: per-iteration series -------------------------------
    {
      val cat = new graft.core.Catalog(spark)
      cat.openFrom("diag_emb", Tables.load(spark, sfDir, "embeddings")
        .filter(col("vec_id") =!= 0L), Seq("vec_id"))
      cat.buildPqLayout("diag_emb", "vec_id", "embedding")
      val q = Tables.load(spark, sfDir, "embeddings")
        .filter(col("vec_id") === 0L).head()
        .getAs[scala.collection.Seq[Float]]("embedding").toSeq
      var n = 0L
      val ts = (1 to 12).map { _ =>
        n += 1
        timed {
          cat.get("diag_emb").get
            .setCell(n % 100, "vec_id", (900000 + n).toString)
          cat.refreshStale("diag_emb")
          cat.topK("diag_emb", "vec_id", "embedding", q, 10).count()
        }
      }
      println("r_edit_refresh iters: " +
        ts.map(t => f"$t%.3f").mkString(","))
    }

    // ---- v_ann_pq: repeat series (pure re-encode, no state) -----------------
    {
      val ts = (1 to 6).map { _ =>
        timed {
          graft.queries.PipelineQueries.queries("v_ann_pq")(spark, sfDir)
            .count()
        }
      }
      println("v_ann_pq iters: " + ts.map(t => f"$t%.3f").mkString(","))
    }

    // ---- a_distinct_routed: repeat series ------------------------------------
    {
      val ts = (1 to 8).map { _ =>
        timed {
          graft.queries.AnalyticsQueries.queries("a_catalog_distinct")(
            spark, sfDir).count()
        }
      }
      println("a_distinct_routed iters: " +
        ts.map(t => f"$t%.3f").mkString(","))
    }

    spark.stop()
  }
}
