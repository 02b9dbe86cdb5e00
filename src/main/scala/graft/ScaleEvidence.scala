package graft

import org.apache.spark.sql.SparkSession

/** Times the at-scale dedup/ANN/curation paths (the operators whose 100×
  * story the headline bench doesn't cover) at a given SF directory —
  * run at two scales, the per-query ratios are the empirical scaling
  * evidence cited in README "Scaling evidence" alongside [[Bench]]'s
  * headline set. Same protocol as Bench: sf0.001 warmup, two passes,
  * min-of-2, one JSON line.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> runMain graft.ScaleEvidence [names]`
  * — the optional comma-separated subset serves corpus-only scale dirs
  * (e.g. the 100× sf10 documents/embeddings inflation, where the
  * TPC-H-reading entries have no tables to run against).
  */
object ScaleEvidence {

  /** The scale-path subset: every entry is the bucketed/banded/derived-k
    * variant, never a brute-force baseline.
    */
  val names: Seq[String] = Seq(
    "d_drop_near",    // MinHash-LSH pairs -> star-CC -> anti join
    "d_cc_star",      // star contraction rounds alone
    "d_semdedup",     // sqrt(n)-blocked semantic dedup
    "t_dup_spans",    // char-span fingerprint scan
    "t_decontam",     // broadcast n-gram decontamination
    "v_ann_ivf_flat", // IVF build + probe
    "v_ann_ivfpq",    // IVF cell pruning + compressed-domain PQ ranking
    "d_incr_lsh",     // stored-index probe: batch-sized work vs the corpus
    "t_shuffle_order",// per-shard epoch-order windows, no global sort
    "t_pipeline_v2",  // gate -> decontam -> shard plan end-to-end
    "d_prefix_join",  // rare-shingle prefix index: exact join, pruned candidates
    "m_phash_dedup")  // dHash banding over binary payloads

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val run: Seq[String] =
      if (args.nonEmpty) args(0).split(",").map(_.trim).toSeq else names
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

    val warmDir = "/root/testdata/sf0.001"
    run.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    val results = run.map { n =>
      def pass(): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows = try SparkEntry.queries(n)(spark, sfDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[scale] $n failed: ${e.getMessage}"); -1L
        }
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (t1, r1) = pass()
      if (r1 < 0) (n, t1, r1)
      else { val (t2, r2) = pass(); (n, math.min(t1, t2), r2) }
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rs = results.map { case (k, _, r) => "\"" + k + "\":" + r }
      .mkString("{", ",", "}")
    val nFailed = results.count(_._3 < 0)
    val total = results.map(_._2).sum + 600.0 * nFailed
    println(s"""{"metric":"scale_paths","value":$total,"unit":"sec","queries":$qs,"rows":$rs,"failed":$nFailed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
