package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Catalog, Positional}

/** Measures the round-11 partial-compaction economics at a given SF dir:
  * the one-time cluster build, the steady-state DML-patch cycles, the
  * cycle where the accumulated patch crosses the merge bound and FOLDS
  * into only the intersecting base files, and — for comparison — the
  * full re-cluster that fold replaces. One JSON line; run at two scales
  * and the ratios are the scaling evidence (README "Scaling evidence").
  *
  * The delta bound is overridden to 512 so the bound crosses in nine
  * 512-row cycles — the economics under test are per-FILE (how many base
  * files rewrite), which the override does not change.
  */
object CompactEvidence {
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
    val deltaBound = 512
    val cycles = 9 // cycle 9 crosses 8×bound and triggers the fold

    val cat = new Catalog(spark, deltaMaxRowsOverride = Some(deltaBound))
    cat.open("ce", s"$sfDir/orders.parquet", orderCols = Seq("o_orderkey"))
    val sess = cat.get("ce").get
    val (buildSec, _) = time(cat.buildRangedLayout("ce", "o_totalprice",
      files = 16, idCol = Some("o_orderkey")))
    def ranged() = cat.layoutsOf("ce").collectFirst {
      case (_, l: Catalog.RangedLayout) => l
    }.get
    val built = ranged()
    val files0 = built.stats.select("file").collect()
      .map(_.getString(0)).toSet

    // localized mutations: every edited row inside ONE file's key range
    val target = built.stats.collect().minBy(_.getAs[Double]("min_v"))
    val pos = sess.current
      .filter(col("o_totalprice") > target.getAs[Double]("min_v") &&
        col("o_totalprice") < target.getAs[Double]("max_v"))
      .select(col(Positional.POS)).orderBy(col(Positional.POS))
      .limit(deltaBound * cycles).collect().map(_.getLong(0))
    require(pos.length == deltaBound * cycles,
      s"need ${deltaBound * cycles} rows in one file, got ${pos.length}")

    val cycleSecs = (0 until cycles).map { k =>
      val slice = pos.slice(k * deltaBound, (k + 1) * deltaBound)
      val (sec, _) = time {
        require(sess.setCells("o_orderstatus", slice.map(_ -> "Q").toSeq))
        cat.refreshStale("ce")
        cat.rangeScan("ce", "o_totalprice", 0.0, 1e9).count()
      }
      sec
    }
    val folded = ranged()
    require(folded.patch.isEmpty, "cycle 9 must have folded the patch")
    val filesAfter = folded.stats.select("file").collect()
      .map(_.getString(0)).toSet
    val rewritten = files0.diff(filesAfter).size

    // the comparison leg: the full re-cluster a fold replaces
    val (rebuildSec, _) = time(cat.buildRangedLayout("ce", "o_totalprice",
      files = 16, idCol = Some("o_orderkey")))

    // ---- keyed merge-compact (r11): cube fold vs fact re-aggregation
    val cat2 = new Catalog(spark, deltaMaxRowsOverride = Some(deltaBound))
    cat2.open("cek", s"$sfDir/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    val sess2 = cat2.get("cek").get
    val (cubeBuildSec, _) = time(cat2.buildCubeLayout("cek",
      Seq("l_partkey"), Seq("l_quantity")))
    def cube() = cat2.layoutsOf("cek").collectFirst {
      case (_, l: Catalog.CubeLayout) => l
    }.get
    val cubePath0 = cube().path
    val pos2 = sess2.current.dropDuplicates("l_partkey")
      .select(col(Positional.POS)).limit(deltaBound * cycles)
      .collect().map(_.getLong(0))
    require(pos2.length == deltaBound * cycles,
      s"need ${deltaBound * cycles} distinct partkey rows")
    val cubeCycleSecs = (0 until cycles).map { k =>
      val slice = pos2.slice(k * deltaBound, (k + 1) * deltaBound)
      val (sec, _) = time {
        require(sess2.setCells("l_quantity", slice.map(_ -> "17.0").toSeq))
        cat2.refreshStale("cek")
        cat2.aggregate("cek", Seq("l_partkey"), Seq("l_quantity")).count()
      }
      sec
    }
    require(cube().patch.isEmpty && cube().path != cubePath0,
      "cycle 9 must have merge-compacted the cube")
    val (cubeRebuildSec, _) = time(cat2.buildCubeLayout("cek",
      Seq("l_partkey"), Seq("l_quantity")))

    val steady = cycleSecs.dropRight(1)
    val qs = steady.map(s => f"$s%.3f").mkString("[", ",", "]")
    val cqs = cubeCycleSecs.dropRight(1).map(s => f"$s%.3f")
      .mkString("[", ",", "]")
    println(s"""{"metric":"partial_compact","build_sec":$buildSec,""" +
      s""""steady_patch_sec":$qs,"fold_cycle_sec":${cycleSecs.last},""" +
      s""""rebuild_sec":$rebuildSec,"files_total":${files0.size},""" +
      s""""files_rewritten":$rewritten,"rows":${sess.rowCount},""" +
      s""""cube_build_sec":$cubeBuildSec,"cube_steady_sec":$cqs,""" +
      s""""cube_fold_cycle_sec":${cubeCycleSecs.last},""" +
      s""""cube_rebuild_sec":$cubeRebuildSec,""" +
      s""""delta_bound":$deltaBound,"sf":"$sfDir"}""")
    spark.stop()
  }
}
