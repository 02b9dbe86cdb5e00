package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.core.{EditorSession, Tables}

/** r14 phase profiler: per-phase wall times inside the composite bench
  * workloads (r_ingest_cycle, r_edit_refresh, r_dml_refresh, v_ann_pq,
  * r1_edit_burst_1k) so the optimization targets are measured, not
  * guessed. Dev tool, not part of the driver contract.
  */
object ProfileR14 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
      println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // warmup at sf0.001: classloading + codegen
    {
      val wd = "/root/testdata/sf0.001"
      val c = new graft.core.Catalog(spark)
      c.open("w", s"$wd/lineitem.parquet", orderCols = Seq("l_orderkey", "l_linenumber"))
      c.buildCubeLayout("w", Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"))
      val sess = c.get("w").get
      val b = graft.core.Positional.strip(sess.current).limit(512)
      sess.appendRows(b); c.refreshStale("w")
      c.aggregate("w", Seq("l_returnflag"), Seq("l_quantity")).count()
      val embs = Tables.load(spark, wd, "embeddings")
      val q = embs.filter(col("vec_id") === 0L).head()
        .getAs[scala.collection.Seq[Float]]("embedding").toSeq
      graft.operators.Similarity.pqTopK(
        embs.filter(col("vec_id") =!= 0L), "vec_id", "embedding", q, 10).count()
    }

    (1 to 2).foreach { round =>
      println(s"===== round $round =====")

      println("--- r_ingest_cycle ---")
      t("TOTAL r_ingest_cycle") {
        val cat = new graft.core.Catalog(spark)
        t("open(attachPos+pin)")(cat.open("bench_ing", s"$sfDir/lineitem.parquet",
          orderCols = Seq("l_orderkey", "l_linenumber")))
        t("buildCubeLayout")(cat.buildCubeLayout("bench_ing",
          Seq("l_returnflag", "l_linestatus"), Seq("l_quantity")))
        val sess = cat.get("bench_ing").get
        val batch = t("batch limit(512)")(
          graft.core.Positional.strip(sess.current).limit(512))
        (0 until 3).foreach { i =>
          t(s"appendRows#$i")(sess.appendRows(batch))
          t(s"refreshStale#$i")(cat.refreshStale("bench_ing"))
          t(s"aggregate#$i")(cat.aggregate("bench_ing",
            Seq("l_returnflag"), Seq("l_quantity")).count())
        }
      }

      println("--- refresh internals (cube patch after 512-row append) ---")
      locally {
        val cat = new graft.core.Catalog(spark)
        cat.open("prof_rf", s"$sfDir/lineitem.parquet",
          orderCols = Seq("l_orderkey", "l_linenumber"))
        cat.buildCubeLayout("prof_rf", Seq("l_returnflag", "l_linestatus"),
          Seq("l_quantity"))
        val sess = cat.get("prof_rf").get
        val batch = graft.core.Positional.strip(sess.current).limit(512)
        val at = sess.rowCount
        sess.appendRows(batch)
        val pos = (at until at + 512).toSeq
        val keyExpr = to_json(struct(col("l_returnflag"), col("l_linestatus")))
        val dirtyKeys = t("affectedGroupKeys-like") {
          sess.current.filter(col("__pos").isInCollection(pos))
            .select(keyExpr.as("id")).distinct().collect().map(_.getString(0))
        }
        val affected = graft.core.Positional.strip(sess.current)
          .filter(keyExpr.isin(dirtyKeys.toSeq: _*))
        t("cubeRows(affected).collect") {
          graft.core.Catalog.cubePartials(affected,
            Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"))
            .withColumn("id",
              to_json(struct(col("l_returnflag"), col("l_linestatus"))))
            .collect()
        }
        t("refreshStale(real)")(cat.refreshStale("prof_rf"))
        t("aggregate(routed)")(cat.aggregate("prof_rf",
          Seq("l_returnflag"), Seq("l_quantity")).count())
      }

      println("--- v_ann_pq ---")
      t("TOTAL v_ann_pq") {
        val embs = Tables.load(spark, sfDir, "embeddings")
        val q = t("query head()")(embs.filter(col("vec_id") === 0L).head()
          .getAs[scala.collection.Seq[Float]]("embedding").toSeq)
        t("pqTopK")(graft.operators.Similarity.pqTopK(
          embs.filter(col("vec_id") =!= 0L), "vec_id", "embedding", q, 10).count())
      }

      println("--- r1_edit_burst_1k ---")
      t("TOTAL r1_edit_burst_1k") {
        val sess = t("open")(EditorSession.fromDataFrame(
          Tables.load(spark, sfDir, "lineitem"),
          Seq("l_orderkey", "l_linenumber", "l_extendedprice")))
        t("1000 setCell") {
          var i = 0
          while (i < 1000) { sess.setCell(i.toLong, "l_quantity", "42"); i += 1 }
        }
        t("count")(sess.current.filter(col("l_quantity") === 42.0).count())
      }

      println("--- r_edit_refresh internals ---")
      locally {
        val cat = new graft.core.Catalog(spark)
        cat.openFrom("prof_er", Tables.load(spark, sfDir, "embeddings")
          .filter(col("vec_id") =!= 0L), Seq("vec_id"))
        cat.buildPqLayout("prof_er", "vec_id", "embedding")
        val q = Tables.load(spark, sfDir, "embeddings")
          .filter(col("vec_id") === 0L).head()
          .getAs[scala.collection.Seq[Float]]("embedding").toSeq
        (1 to 2).foreach { i =>
          t(s"edit#$i")(cat.get("prof_er").get
            .setCell(i.toLong, "vec_id", (800000 + i).toString))
          t(s"refreshStale#$i")(cat.refreshStale("prof_er"))
          t(s"topK#$i")(cat.topK("prof_er", "vec_id", "embedding", q, 10).count())
        }
      }

      println("--- r_dml_refresh internals ---")
      locally {
        val cat = new graft.core.Catalog(spark)
        cat.open("prof_dr", s"$sfDir/orders.parquet",
          orderCols = Seq("o_orderkey"))
        t("buildRangedLayout")(cat.buildRangedLayout("prof_dr", "o_totalprice",
          files = 8, idCol = Some("o_orderkey")))
        (1 to 2).foreach { i =>
          val sess = cat.get("prof_dr").get
          t(s"edit+delete#$i") {
            sess.setCell(i.toLong, "o_totalprice", (50000 + i).toString + ".5")
            sess.deleteRow(100L + i)
          }
          t(s"refreshStale#$i")(cat.refreshStale("prof_dr"))
          t(s"rangeScan#$i")(cat.rangeScan("prof_dr", "o_totalprice",
            1000.0, 60000.0).count())
          t(s"checkpoint#$i")(sess.checkpoint())
        }
      }

      println("--- attachPos internals ---")
      locally {
        val li = Tables.load(spark, sfDir, "lineitem")
        val order = Seq("l_orderkey", "l_linenumber", "l_extendedprice").map(col)
        val nParts = math.max(
          spark.sessionState.conf.numShufflePartitions,
          spark.sparkContext.defaultParallelism)
        val sorted = t("plan repartitionByRange")(
          li.repartitionByRange(nParts, order: _*)
            .sortWithinPartitions(order: _*))
        val pinned = t("localCheckpoint(lazy)")(
          sorted.localCheckpoint(eager = false))
        t("counts runJob (materialize)")(
          spark.sparkContext.runJob(pinned.queryExecution.toRdd,
            (it: Iterator[_]) => {
              var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
            }))
        // reference: raw scan + count, and scan + shuffle + count
        t("raw scan count")(li.count())
        t("scan+rbr+sort count(noop)")(
          li.repartitionByRange(nParts, order: _*)
            .sortWithinPartitions(order: _*)
            .write.format("noop").mode("overwrite").save())
      }

      println("--- r46_delete_splice ---")
      t("TOTAL r46_delete_splice") {
        val sess = t("open46")(EditorSession.fromDataFrame(
          Tables.load(spark, sfDir, "lineitem"),
          Seq("l_orderkey", "l_linenumber", "l_extendedprice")))
        t("deleteRows")(sess.deleteRows(Seq(0L, 1L)))
        t("cut")(sess.cut(Seq(10L, 11L, 12L)))
        t("paste")(sess.paste(5L))
        t("rowCount")(sess.rowCount)
      }
    }
    spark.stop()
  }
}
