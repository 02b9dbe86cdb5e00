package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{RankStats, Similarity}

/** Closed-form pins for the round-7 rank tests (Mann–Whitney U,
  * Kruskal–Wallis H), the Kaplan–Meier invariants, and the Lloyd
  * refinement guarantee of the PQ codebook.
  */
class SurvivalRankSpec extends SparkSpec {

  private def two(a: Seq[Int], b: Seq[Int]) = {
    val rows = a.map(v => (v, "A")) ++ b.map(v => (v, "B"))
    spark.createDataFrame(rows).toDF("v", "g")
  }

  test("mannWhitney: fully separated samples give U_A = 0 / n_a*n_b") {
    val df = two(Seq(1, 2, 3), Seq(4, 5, 6))
    val r = RankStats.mannWhitney(df, "v",
      col("g") === "A", col("g") === "B").head()
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 3)
    assert(r.getAs[Double]("u_a") == 0.0)
    assert(r.getAs[Double]("z") < -1.9, s"z=${r.getAs[Double]("z")}")
    val rev = RankStats.mannWhitney(df, "v",
      col("g") === "B", col("g") === "A").head()
    assert(rev.getAs[Double]("u_a") == 9.0)
    assert(rev.getAs[Double]("z") > 1.9)
  }

  test("mannWhitney: all-tied samples sit exactly at the null mean") {
    val r = RankStats.mannWhitney(two(Seq(7, 7), Seq(7, 7)), "v",
      col("g") === "A", col("g") === "B").head()
    // U_A = n_a*n_b/2 with half-credit ties; the degenerate variance
    // yields a NULL z, not an ANSI divide-by-zero
    assert(r.getAs[Double]("u_a") == 2.0)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("mannWhitney: U_A + U_B = n_a*n_b on arbitrary tied data (fundamental identity)") {
    // deterministic pseudo-random tied data: values hash-derived so the
    // fixture is stable across runs
    val rows = (0 until 200).map { i =>
      (math.abs((i * 2654435761L) % 13).toInt,
        if (i % 3 == 0) "A" else "B")
    }
    val df = spark.createDataFrame(rows).toDF("v", "g")
    val ua = RankStats.mannWhitney(df, "v",
      col("g") === "A", col("g") === "B").head()
    val ub = RankStats.mannWhitney(df, "v",
      col("g") === "B", col("g") === "A").head()
    val (na, nb) = (ua.getAs[Long]("n_a"), ua.getAs[Long]("n_b"))
    assert(ua.getAs[Double]("u_a") + ub.getAs[Double]("u_a") ==
      na.toDouble * nb, s"U_A=${ua.getAs[Double]("u_a")} U_B=${ub.getAs[Double]("u_a")}")
    // and the two directions' z are exact negatives
    assert(ua.getAs[Double]("z") == -ub.getAs[Double]("z"))
  }

  test("kruskalWallis: identical groups give H = 0; separated groups the closed form") {
    val same = RankStats.kruskalWallis(two(Seq(1, 2, 3), Seq(1, 2, 3)),
      "v", "g").head()
    assert(same.getAs[Double]("h") == 0.0)
    val rows = Seq(1, 2, 3).map((_, "A")) ++ Seq(10, 20, 30).map((_, "B")) ++
      Seq(100, 200, 300).map((_, "C"))
    val sep = RankStats.kruskalWallis(
      spark.createDataFrame(rows).toDF("v", "g"), "v", "g").head()
    // no ties, perfect separation of 3 groups of 3: H = 12/(9*10)*279-30
    assert(math.abs(sep.getAs[Double]("h") - 7.2) < 1e-9)
    assert(sep.getAs[Long]("n_groups") == 3)
  }

  test("Kaplan-Meier: survival starts from full risk set, stays in [0,1], never increases") {
    val km = graft.queries.BehaviorQueries.queries("e_survival_km")(spark, sf)
      .collect()
    assert(km.nonEmpty)
    val users = Tables.loadEvents(spark, sf)
      .select(countDistinct("user_id")).head.getLong(0)
    assert(km.head.getAs[Long]("n_risk") == users)
    val surv = km.map(_.getAs[Double]("survival"))
    assert(surv.forall(s => s >= 0.0 && s <= 1.0))
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-12 },
      s"survival increased: ${surv.toSeq}")
    // risk sets shrink monotonically too
    val risk = km.map(_.getAs[Long]("n_risk"))
    assert(risk.zip(risk.tail).forall { case (a, b) => b < a })
  }

  test("brownForsythe: equal spreads give F = 0, the hand-computed case gives 0.15") {
    val eq = RankStats.brownForsythe(
      two(Seq(1, 3), Seq(11, 13)), "v", "g").head()
    // both groups deviate identically from their medians -> zero
    // between-group deviation variance
    assert(eq.getAs[Double]("f") == 0.0)
    // A={1,3} (|2x-4|={2,2}), B={10,14,12} (|2x-24|={4,4,0}):
    // F = 3 * (8 + 64/3 - 144/5) / (0 + 32 - 64/3) = 0.15
    val rows = Seq(1, 3).map((_, "A")) ++ Seq(10, 14, 12).map((_, "B"))
    val f = RankStats.brownForsythe(
      spark.createDataFrame(rows).toDF("v", "g"), "v", "g").head()
    assert(math.abs(f.getAs[Double]("f") - 0.15) < 1e-9,
      s"f=${f.getAs[Double]("f")}")
    // degenerate within-group mass -> NULL, not a divide-by-zero
    val degen = RankStats.brownForsythe(
      two(Seq(5, 5), Seq(7, 7)), "v", "g").head()
    assert(degen.isNullAt(degen.fieldIndex("f")))
  }

  test("e_streaks: streak laws hold for every user") {
    val rows = SparkEntry.queries("e_streaks")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (days, longest, streaks) = (r.getAs[Long]("n_active_days"),
        r.getAs[Long]("longest_streak"), r.getAs[Long]("n_streaks"))
      assert(longest >= 1 && longest <= days)
      assert(streaks >= 1 && streaks <= days)
      // n_streaks runs of length >= 1 partition the active days
      assert(longest + (streaks - 1) <= days)
    }
  }

  test("e_cohort_ltv: cumulative LTV never decreases within a cohort") {
    val rows = SparkEntry.queries("e_cohort_ltv")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, cohort) =>
      val ltv = cohort.sortBy(_.getAs[Int]("week_offset"))
        .map(_.getAs[Double]("cum_ltv_per_user"))
      assert(ltv.zip(ltv.tail).forall { case (a, b) => b >= a - 1e-9 },
        s"cumulative LTV decreased: ${ltv.toSeq}")
    }
  }

  test("e_decay_score: decay never exceeds the raw sum and weights recency") {
    val rows = SparkEntry.queries("e_decay_score")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d, raw) = (r.getAs[Double]("decay7d_score"), r.getAs[Double]("raw_sum"))
      assert(d <= raw + 1e-6, s"decayed $d above raw $raw")
      assert(d >= 0.0 || raw < 0.0)
    }
  }

  test("rrfFuse: consensus beats a single ranker's favorite; ranks fuse scale-free") {
    import graft.operators.Retrieval
    val ra = spark.createDataFrame(Seq((100L, 1), (7L, 2), (8L, 3)))
      .toDF("id", "rank")
    val rb = spark.createDataFrame(Seq((200L, 1), (7L, 2), (9L, 3)))
      .toDF("id", "rank")
    val fused = Retrieval.rrfFuse(Seq(ra, rb), k = 5).collect()
    // id 7 sits at rank 2 in BOTH lists: 2/62 > 1/61, so consensus
    // outranks either list's unilateral #1
    assert(fused.head.getLong(0) == 7L, fused.mkString(","))
    assert(fused.head.getAs[Long]("n_lists") == 2)
    // the unilateral #1s tie on score and break by id
    val next = fused.slice(1, 3).map(_.getLong(0)).toSeq
    assert(next == Seq(100L, 200L), fused.mkString(","))
    // every input id appears; nothing is invented
    assert(fused.map(_.getLong(0)).toSet == Set(7L, 8L, 9L, 100L, 200L))
  }

  test("v_silhouette: one row per cluster, scores in [0,1], members cover the corpus") {
    val rows = SparkEntry.queries("v_silhouette")(spark, sf).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val s = r.getAs[Double]("mean_silhouette")
      assert(s >= 0.0 && s <= 1.0, s"silhouette $s out of [0,1]")
    }
    val total = Tables.load(spark, sf, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
  }

  test("IVF-PQ layout: cell-partitioned codes prune partitions and replay the search exactly") {
    val embs = Tables.load(spark, sf, "embeddings")
    val query = embs.filter(col("vec_id") === 0L).head()
      .getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val base = embs.filter(col("vec_id") =!= 0L)
    val (codes, cents, seeds) =
      Similarity.ivfPqCodes(base, "vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_layout_")
      .toString + "/codes"
    graft.io.Formats.writePartitioned(codes, dir, Seq("__ivf_cid"))
    val search = Similarity.ivfPqTopKFromLayout(spark, dir, cents, seeds,
      query, k = 10)
    // plan-time partition pruning: the scan itself lists the cell filter
    val scan = search.queryExecution.executedPlan.collectLeaves().mkString
    assert(scan.contains("PartitionFilters") && scan.contains("__ivf_cid"),
      s"no partition filter in scan: $scan")
    // and the layout search replays the build-per-query path exactly
    val fromLayout = search.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val direct = Similarity.ivfPqTopK(base, "vec_id", "embedding",
      query, k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromLayout == direct,
      s"layout diverged:\n$fromLayout\nvs\n$direct")
  }

  test("pqCodebookRefined: Lloyd rounds never increase the quantization error") {
    val base = Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 0L)
    val seeds = Similarity.pqCodebook(base, "vec_id", "embedding")
    val refined = Similarity.pqCodebookRefined(base, "vec_id", "embedding",
      iters = 2)
    def err(cb: Array[scala.collection.Seq[Float]]): Double =
      Similarity.pqQuantizationError(base, "vec_id", "embedding", cb)
        .head.getAs[Double]("total_sqerr")
    val (e0, e1) = (err(seeds), err(refined))
    assert(e1 <= e0 + 1e-6, s"refinement worsened the objective: $e0 -> $e1")
    assert(e1 < e0, s"refinement did nothing on this corpus: $e0 -> $e1")
    // the refined codebook drops into the same search surface
    val q = Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") === 0L).head()
      .getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val hits = Similarity.pqTopKFromCodes(
      Similarity.pqCodes(base, "vec_id", "embedding", refined),
      refined, q, k = 10).collect()
    assert(hits.length == 10)
    assert(hits.map(_.getDouble(1)).toSeq.sorted == hits.map(_.getDouble(1)).toSeq)
  }
}
