package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 dev diagnostic: fast range-partition attach vs the classic
  * repartitionByRange attach — position equality on unique keys, timing,
  * and the narrow-sample plan capture. Dev tool, not driver contract.
  */
object DiagR15 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // warm loop at sf0.1: steady-state attach cost, fast vs classic
    {
      val sf = "/root/testdata/sf0.1"
      val ord = Seq("l_orderkey", "l_linenumber", "l_extendedprice")
      (1 to 6).foreach { i =>
        val li = graft.core.Tables.load(spark, sf, "lineitem")
        System.gc()
        graft.core.Positional.fastRangeEnabled = false
        t(s"warm classic attach #$i")(
          graft.core.Positional.attachPos(li, ord.map(col): _*))
        System.gc()
        graft.core.Positional.fastRangeEnabled = true
        t(s"warm fast attach #$i")(
          graft.core.Positional.attachPos(li, ord.map(col): _*))
      }
    }
    // sub-phase breakdown of the fast attach at sf0.1
    {
      val sf = "/root/testdata/sf0.1"
      val ord = Seq("l_orderkey", "l_linenumber", "l_extendedprice").map(col)
      (1 to 3).foreach { i =>
        System.gc()
        val li = graft.core.Tables.load(spark, sf, "lineitem")
        val nParts = math.max(spark.sessionState.conf.numShufflePartitions,
          spark.sparkContext.defaultParallelism)
        // mirror fastRangeSorted manually for phase timing
        val narrow = t(s"#$i narrow sample scan+collect")(
          li.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
            .queryExecution.toRdd.count())
        graft.core.Positional.fastRangeEnabled = true
        val sorted = t(s"#$i plan fast sorted") {
          // private; approximate with full attach phases below
          li.repartition(nParts, col("l_orderkey")).sortWithinPartitions(ord: _*)
        }
        val pinned = t(s"#$i localCheckpoint(lazy)=mapstage")(
          sorted.localCheckpoint(eager = false))
        t(s"#$i counts runJob")(
          spark.sparkContext.runJob(pinned.queryExecution.toRdd,
            (it: Iterator[_]) => { var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n }))
      }
      // same but WITHOUT pin: exchange+sort noop
      (1 to 2).foreach { i =>
        System.gc()
        val li = graft.core.Tables.load(spark, sf, "lineitem")
        val nParts = 32
        t(s"#$i hash-exchange+sort noop")(
          li.repartition(nParts, col("l_orderkey")).sortWithinPartitions(ord: _*)
            .write.format("noop").mode("overwrite").save())
        t(s"#$i exchange only noop")(
          li.repartition(nParts, col("l_orderkey"))
            .write.format("noop").mode("overwrite").save())
        t(s"#$i scan only noop")(
          li.write.format("noop").mode("overwrite").save())
      }
    }
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { sf =>
      println(s"===== $sf =====")
      val li = graft.core.Tables.load(spark, sf, "lineitem")
      val ord = Seq("l_orderkey", "l_linenumber", "l_extendedprice")
      graft.core.Positional.fastRangeEnabled = false
      val classic = t(s"classic attach")(
        graft.core.Positional.attachPos(li, ord.map(col): _*))
      graft.core.Positional.fastRangeEnabled = true
      val fast = t(s"fast attach")(
        graft.core.Positional.attachPos(li, ord.map(col): _*))
      val a = classic.select(col("l_orderkey"), col("l_linenumber"), col("__pos"))
      val b = fast.select(col("l_orderkey"), col("l_linenumber"), col("__pos"))
      val diff = t("except both ways")(
        a.except(b).count() + b.except(a).count())
      println(s"[diag] position diff rows: $diff")
      // string keys too (nation name)
      val nat = graft.core.Tables.load(spark, sf, "nation")
      graft.core.Positional.fastRangeEnabled = false
      val cn = graft.core.Positional.attachPos(nat, col("n_name"), col("n_nationkey"))
      graft.core.Positional.fastRangeEnabled = true
      val fn = graft.core.Positional.attachPos(nat, col("n_name"), col("n_nationkey"))
      val dn = cn.select(col("n_nationkey"), col("__pos"))
        .except(fn.select(col("n_nationkey"), col("__pos"))).count()
      println(s"[diag] nation string-key diff rows: $dn")
    }
    spark.stop()
  }
}
