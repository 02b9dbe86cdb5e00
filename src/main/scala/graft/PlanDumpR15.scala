package graft

import java.io.{File, PrintWriter}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{EditorSession, Tables}

/** r15 optimization-round plan capture: writes `.explain("formatted")` for
  * each bench workload's final DataFrame to `plans/r15/<name>_<suffix>.txt`
  * so before/after plan claims in OPTIMIZATION_r15.md are checkable without
  * running Spark. Dev tool, not part of the driver contract.
  *
  * Usage: `runMain graft.PlanDumpR15 before [name ...]` — no names = all.
  * Captured at the bench's own SF (sf0.1) and core count so join-strategy
  * and AQE-threshold decisions match what the bench actually plans.
  */
object PlanDumpR15 {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val only = args.drop(1).toSet
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
    new File("plans/r15").mkdirs()

    def dump(name: String)(mk: => DataFrame): Unit =
      if (only.isEmpty || only.contains(name)) {
        val out = new PrintWriter(new File(s"plans/r15/${name}_$suffix.txt"))
        try {
          val df = mk
          out.println(s"== $name ($suffix) @ $sfDir local[$cpus] ==")
          out.println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        } catch { case e: Throwable =>
          out.println(s"ERROR building $name: ${e.getMessage}")
        } finally out.close()
        println(s"[plandump] $name -> plans/r15/${name}_$suffix.txt")
      }

    dump("s1_scan_count")(Tables.load(spark, sfDir, "lineitem")
      .groupBy().count())

    dump("p12_add_drop") {
      val li = Tables.load(spark, sfDir, "lineitem")
      val added = graft.ops.SchemaOps.insertColumnAt(li, 3, "flag",
        org.apache.spark.sql.types.BooleanType)
      graft.ops.SchemaOps.dropColumnAt(added, 0)
    }

    dump("a1_pivot")(graft.ops.PivotOps.pivotTable(
      Tables.load(spark, sfDir, "lineitem"),
      "l_returnflag", "l_linestatus", "l_extendedprice", "sum", Seq("F", "O")))

    dump("a_widegroup_q18")(
      graft.queries.AnalyticsQueries.queries("q18_large_orders")(spark, sfDir))

    dump("p3v3_histogram")(graft.ops.StatsOps.histogramFixed(
      graft.ops.SchemaOps.numericProjection(Tables.load(spark, sfDir, "lineitem")),
      "l_extendedprice", 0.0, 120000.0, 12))

    dump("d_minhash_lsh")(graft.operators.Dedup.minhashLshPairs(
      Tables.load(spark, sfDir, "documents"), "doc_id", "text",
      n = 3, threshold = 0.4, numHashes = 32, bands = 16))

    dump("d_incr_lsh") {
      val d = Tables.load(spark, sfDir, "documents")
      val idx = graft.operators.Dedup.lshIndex(
        d.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", 3, 32, 16)
      graft.operators.Dedup.incrementalLshMatches(idx,
        d.filter(col("doc_id") % 5 === 0), "doc_id", "text", 3, 0.4, 32, 16)
    }

    dump("t_text_stats")(Tables.load(spark, sfDir, "documents").select(
      graft.functions.TextFunctions.tokenCount(col("text")).as("n"),
      graft.functions.TextFunctions.qualityScore(col("text")).as("q"),
      graft.functions.TextFunctions.langId(col("text")).as("l")))

    dump("v_ann_topk") {
      val embs = Tables.load(spark, sfDir, "embeddings")
      val q = embs.filter(col("vec_id") === 0L).head()
        .getAs[scala.collection.Seq[Float]]("embedding").toSeq
      graft.operators.Similarity.topK(embs, "vec_id", "embedding", q, 10)
    }

    dump("v_ann_pq") {
      val embs = Tables.load(spark, sfDir, "embeddings")
      val q = embs.filter(col("vec_id") === 0L).head()
        .getAs[scala.collection.Seq[Float]]("embedding").toSeq
      graft.operators.Similarity.pqTopK(
        embs.filter(col("vec_id") =!= 0L), "vec_id", "embedding", q, 10)
    }

    dump("v_ann_pq_layout") {
      val embs = Tables.load(spark, sfDir, "embeddings")
      val q = embs.filter(col("vec_id") === 0L).head()
        .getAs[scala.collection.Seq[Float]]("embedding").toSeq
      val base = embs.filter(col("vec_id") =!= 0L)
      val seeds = graft.operators.Similarity.pqCodebook(base, "vec_id", "embedding")
      val path = java.nio.file.Files.createTempDirectory("plandump_pq_")
        .toString + "/codes"
      graft.operators.Similarity.pqCodes(base, "vec_id", "embedding", seeds)
        .write.parquet(path)
      graft.operators.Similarity.pqTopKFromCodes(
        spark.read.parquet(path), seeds, q, 10)
    }

    dump("a_subquery_q21")(
      graft.queries.AnalyticsQueries.queries("q21_suppliers_waiting")(spark, sfDir))

    dump("j_star")(
      graft.queries.AnalyticsQueries.queries("j_star")(spark, sfDir))

    dump("e_batch_window")(graft.streaming.EventStreams.windowedCounts(
      Tables.loadEvents(spark, sfDir)))

    dump("r46_delete_splice") {
      val sess = EditorSession.fromDataFrame(
        Tables.load(spark, sfDir, "lineitem"),
        Seq("l_orderkey", "l_linenumber", "l_extendedprice"))
      sess.deleteRows(Seq(0L, 1L))
      sess.cut(Seq(10L, 11L, 12L))
      sess.paste(5L)
      sess.current
    }

    dump("r1_edit_burst_1k") {
      val sess = EditorSession.fromDataFrame(
        Tables.load(spark, sfDir, "lineitem"),
        Seq("l_orderkey", "l_linenumber", "l_extendedprice"))
      var i = 0
      while (i < 1000) { sess.setCell(i.toLong, "l_quantity", "42"); i += 1 }
      sess.current.filter(col("l_quantity") === 42.0)
    }

    // --- attachPos internals: the exchange plan BEFORE the checkpoint ---
    // (the pinned session plan hides the exchange, so the open cost's
    // plan evidence is the pre-pin sorted DataFrame itself)
    locally {
      val ord = Seq("l_orderkey", "l_linenumber", "l_extendedprice").map(col)
      val nParts = math.max(spark.sessionState.conf.numShufflePartitions,
        spark.sparkContext.defaultParallelism)
      dump("attach_exchange_classic") {
        Tables.load(spark, sfDir, "lineitem")
          .repartitionByRange(nParts, ord: _*).sortWithinPartitions(ord: _*)
      }
      dump("attach_exchange_fast") {
        // the private fast path plans exactly what attachPos now builds;
        // reproduce it through the public seam (flag stays default=true)
        val before = graft.core.Positional.fastRangeEnabled
        graft.core.Positional.fastRangeEnabled = true
        try {
          // attachPos pins eagerly; re-plan its sorted stage via a probe
          // of the same shape: sample+token repartition happen inside, so
          // dump the POS-attached plan built from a tiny slice is not the
          // exchange. Instead rebuild the sorted stage the same way the
          // fast path does (sample job included at plan time).
          graft.core.Positional.fastSortedForDump(
            Tables.load(spark, sfDir, "lineitem"), ord, nParts)
            .getOrElse(sys.error("fast path unavailable"))
        } finally graft.core.Positional.fastRangeEnabled = before
      }
      dump("attach_sample_narrow") {
        Tables.load(spark, sfDir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"))
      }
    }

    // --- keyed-refresh vanished-id derivation: EXCEPT vs bounded probes ---
    locally {
      val cat = new graft.core.Catalog(spark)
      cat.openFrom("pd_er", Tables.load(spark, sfDir, "embeddings")
        .filter(col("vec_id") =!= 0L), Seq("vec_id"))
      cat.buildPqLayout("pd_er", "vec_id", "embedding")
      val sess = cat.get("pd_er").get
      val builtAt = sess.epoch
      sess.setCell(1L, "vec_id", "912345")
      val p = cat.layoutsOf("pd_er").collectFirst {
        case (_, l: graft.core.Catalog.PqCodesLayout) => l }.get
      dump("vanished_except") {
        // the old derivation: served EXCEPT now (two full id scans)
        spark.read.parquet(p.path).select(col("id"))
          .except(graft.core.Positional.strip(sess.current)
            .select(col("vec_id").as("id")))
      }
      dump("vanished_probe_candidates") {
        // new tier 1a: the since-epoch plan filtered to the feed's
        // touched positions (bounded, no exchange)
        sess.planAt(builtAt).get
          .filter(col(graft.core.Positional.POS).isInCollection(Seq(1L)))
          .select(col("vec_id"))
      }
      dump("vanished_probe_membership") {
        // new tier 1b: current ids probed for the candidates (bounded,
        // pushdown-friendly, no exchange)
        graft.core.Positional.strip(sess.current)
          .filter(col("vec_id").isInCollection(Seq(123456L)))
          .select(col("vec_id"))
      }
    }

    spark.stop()
  }
}
