package graft

import org.apache.spark.sql.SparkSession
import graft.core.{Catalog, Positional}

/** Measures the steady-state ingest-loop economics at a given SF dir:
  * open a session over the lineitem corpus, build the three serving
  * layouts (measure cube, pairs, value-histogram cube), then run fixed
  * 2048-row append cycles — [[graft.core.EditorSession.appendRows]] +
  * `refreshStale` + one routed read per layout kind. The 100 TB claim
  * under test: a cycle's cost scales with the BATCH (position-stamp 2048
  * rows, recompute their groups' cells, group-count-sized serves), not
  * the corpus — so sf0.1 → sf1 cycle times should be near-flat while a
  * re-build-per-batch strategy would grow 10×. One JSON line; run at two
  * scales and the ratios are the scaling evidence (README "Scaling
  * evidence").
  */
object IngestEvidence {
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

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    val batchRows = 2048
    val cycles = 5 // 5×2048 stays under the 8×4096 compaction bound

    val cat = new Catalog(spark)
    cat.open("ie", s"$sfDir/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    val sess = cat.get("ie").get
    val (buildSec, _) = time {
      cat.buildCubeLayout("ie", Seq("l_returnflag", "l_linestatus"),
        Seq("l_quantity"))
      cat.buildPairsLayout("ie", Seq("l_returnflag"), "l_partkey")
      cat.buildCubeLayout("ie", Seq("l_returnflag", "l_quantity"), Nil)
    }
    def paths() = cat.layoutsOf("ie").collect {
      case (slot, l: Catalog.CubeLayout) => slot -> l.path
      case (slot, l: Catalog.PairsLayout) => slot -> l.path
    }.toMap
    val pathsBefore = paths()
    // the batch: a fixed-size slice of the corpus itself (schema matches
    // by construction; appendRows pins it before the rebind)
    val batch = Positional.strip(sess.current).limit(batchRows)

    val cycleSecs = (0 until cycles).map { _ =>
      time {
        require(sess.appendRows(batch) == batchRows)
        cat.refreshStale("ie")
        cat.aggregate("ie", Seq("l_returnflag"), Seq("l_quantity")).count()
        cat.distinctCount("ie", Seq("l_returnflag"), "l_partkey").count()
        cat.quantiles("ie", Seq("l_returnflag"), "l_quantity",
          Seq("med" -> 0.5)).count()
      }._1
    }
    require(paths() == pathsBefore,
      "steady-state appends must delta-patch, never rebuild")

    val qjson = cycleSecs.zipWithIndex
      .map { case (s, i) => s""""cycle_${i + 1}":$s""" }.mkString(",")
    println(s"""{"metric":"ingest_cycles","unit":"sec",""" +
      s""""sf":"$sfDir","batch_rows":$batchRows,"build_sec":$buildSec,""" +
      s""""min_cycle_sec":${cycleSecs.min},$qjson}""")
    spark.stop()
  }
}
