package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.Explain [queryName ...]` prints the
  * formatted physical plan of registered queries at sf0.001 — the tool used
  * to keep scans pruned (PushedFilters/ReadSchema), small dims broadcast,
  * and expressions inside WholeStageCodegen spans.
  *
  * The default set is side-effect-free: building some queries runs real
  * jobs (j_bucketed writes+drops bucketed tables, s_partition_prune and
  * s_orc_roundtrip write scratch datasets, t_pipeline_v2 localCheckpoints),
  * so those plans print only when named explicitly.
  */
object Explain {

  /** The queries printed when no names are given. Must stay side-effect
    * free: building these plans may not write datasets, mutate the
    * catalog, or materialize checkpoints (ExplainDefaultSpec pins this).
    */
  val defaultSet: Seq[String] =
    Seq("q1_agg", "j_star", "p3_numeric_projection", "e_batch_window",
      "j_asof", "w_topn_per_group", "e_funnel", "d_minhash_lsh",
      "t_pipeline_e2e", "j_interval", "t_passage_dedup", "e_rolling_dau",
      "a15_regression", "q18_large_orders", "t_pack_windows")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else defaultSet
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
