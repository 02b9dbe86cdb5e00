package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Behavior, Clustering, Dedup}
import graft.streaming.EventStreams

class ClusteringSpec extends SparkSpec {

  private lazy val embs = Tables.load(spark, sf, "embeddings")

  test("assign: exactly one centroid per vector, sims bounded, ids from the seed set") {
    val cent = Clustering.seedCentroids(embs, "vec_id", "embedding", 4)
    val a = Clustering.assign(embs, "vec_id", "embedding", cent).cache()
    val n = embs.count()
    assert(a.count() == n)
    assert(a.select("id").distinct().count() == n)
    assert(a.filter(col("sim") < -1.0 || col("sim") > 1.0).count() == 0)
    val cids = cent.collect().map(_.getLong(0)).toSet
    val used = a.select("centroid_id").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(used.subsetOf(cids))
  }

  test("powerIteration: unit vector, Rayleigh gain over v0, partition-stable") {
    def rayleigh(v: Array[Double]): Double = {
      // mean squared projection onto v — what power iteration maximizes
      val rows = embs.collect().map(
        _.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble))
      rows.map(x => math.pow(x.zip(v).map { case (a, b) => a * b }.sum, 2)).sum
    }
    val out = Clustering.powerIteration(embs, "vec_id", "embedding", rounds = 4)
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    val v = out.sortBy(_._1).map(_._2)
    assert(v.length == 64)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-4, "result is unit norm")
    val dim = v.length
    val v0 = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    assert(rayleigh(v) > rayleigh(v0),
      "iterated direction must capture more variance than the uniform start")
    // the ordered-fold contract: identical output under any partitioning
    val again = Clustering.powerIteration(embs.repartition(7), "vec_id",
      "embedding", rounds = 4).collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(again.sortBy(_._1).map(_._2).toSeq == v.toSeq)
  }

  test("assign: a centroid vector is assigned to itself") {
    val cent = Clustering.seedCentroids(embs, "vec_id", "embedding", 4)
    val cids = cent.collect().map(_.getLong(0)).toSeq
    val a = Clustering.assign(embs, "vec_id", "embedding", cent)
    assert(a.filter(col("id").isin(cids: _*))
      .filter(col("id") =!= col("centroid_id")).count() == 0)
  }

  test("semanticDedup: full disposition, top-ranked survivor per cluster") {
    val cent = Clustering.seedCentroids(embs, "vec_id", "embedding", 8)
    val m = Dedup.semanticDedup(embs, "vec_id", "embedding", cent,
      threshold = 0.43).cache()
    assert(m.count() == embs.count())
    // each cluster's best-ranked vector (lowest cent_sim, then lowest id)
    // can never be dominated
    val top = m.groupBy("centroid_id")
      .agg(min(struct(col("cent_sim"), col("id"))).as("t"))
      .select(col("t.id").as("id"))
    assert(m.join(top, Seq("id")).filter(col("kept") === 0L).count() == 0)
  }

  test("semanticDedup: no >=-threshold pair survives within a cluster") {
    val thr = 0.43
    val cent = Clustering.seedCentroids(embs, "vec_id", "embedding", 8)
    val m = Dedup.semanticDedup(embs, "vec_id", "embedding", cent, thr)
      .select(col("id"), col("centroid_id"), col("kept"))
    val pairs = graft.operators.Similarity.cosinePairs(
      embs, "vec_id", "embedding", threshold = thr)
    val survivors = pairs
      .join(m.select(col("id").as("id_i"), col("centroid_id").as("c_i"),
        col("kept").as("k_i")), Seq("id_i"))
      .join(m.select(col("id").as("id_j"), col("centroid_id").as("c_j"),
        col("kept").as("k_j")), Seq("id_j"))
      .filter(col("c_i") === col("c_j") &&
        col("k_i") === 1L && col("k_j") === 1L)
    assert(survivors.count() == 0)
  }

  test("semanticDedup: k = ceil(sqrt(n)) blocking keeps pair work O(n*sqrt(n))") {
    // the d_semdedup query derives k from a corpus count; this pins the
    // regime that derivation buys: the within-cluster candidate-pair count
    // sum(|c| choose 2) stays a small multiple of n*sqrt(n), nowhere near
    // the n(n-1)/2 of an unblocked scan.
    val n = embs.count()
    val k = math.ceil(math.sqrt(n.toDouble)).toInt
    val cent = Clustering.seedCentroids(embs, "vec_id", "embedding", k)
    val sizes = Clustering.assign(embs, "vec_id", "embedding", cent)
      .groupBy("centroid_id").agg(count(lit(1)).as("sz"))
      .select(sum(col("sz") * (col("sz") - 1) / 2).as("pairs"))
      .head().getDouble(0)
    val budget = 4.0 * n * math.sqrt(n.toDouble)
    val unblocked = n.toDouble * (n - 1) / 2
    assert(sizes <= budget,
      s"pair work $sizes exceeds 4*n^1.5 = $budget (k=$k, n=$n)")
    assert(sizes < unblocked / 4,
      s"blocking barely helps: $sizes vs unblocked $unblocked")
  }

  test("semanticDedup: an impossible threshold keeps everything") {
    val cent = Clustering.seedCentroids(embs, "vec_id", "embedding", 8)
    val m = Dedup.semanticDedup(embs, "vec_id", "embedding", cent,
      threshold = 1.01)
    assert(m.filter(col("kept") === 0L).count() == 0)
  }

  test("step: every non-empty cluster reports all dims and members partition the set") {
    val cent = Clustering.seedCentroids(embs, "vec_id", "embedding", 4)
    val st = Clustering.step(embs, "vec_id", "embedding", cent).cache()
    val dim = embs.select(size(col("embedding"))).head().getInt(0)
    st.groupBy("centroid_id").agg(countDistinct("dim").as("d")).collect()
      .foreach(r => assert(r.getLong(1) == dim,
        s"centroid ${r.get(0)} covers ${r.getLong(1)}/$dim dims"))
    val tot = st.filter(col("dim") === 0)
      .agg(sum("n_members")).head().getLong(0)
    assert(tot == embs.count())
  }

  test("step: each mean lies within the global per-dim value range") {
    val cent = Clustering.seedCentroids(embs, "vec_id", "embedding", 4)
    val st = Clustering.step(embs, "vec_id", "embedding", cent)
    val bounds = embs
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("dim").agg(min(col("x").cast("double")).as("lo"),
        max(col("x").cast("double")).as("hi"))
    val bad = st.join(bounds, "dim")
      .filter(col("mean_val") < col("lo") - 1e-6 ||
        col("mean_val") > col("hi") + 1e-6)
    assert(bad.count() == 0)
  }
}

class Round4OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("containment: a doc fully inside another scores 1.0 where jaccard would miss it") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    val cont = Dedup.shingleContainmentPairs(df, "doc_id", "text",
      n = 3, threshold = 0.9).collect()
    assert(cont.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(cont.head.getDouble(2) == 1.0)
    // the jaccard join at a matching bar would not surface the pair:
    // 3 shared shingles of 8 in the long doc → j = 3/8 < 0.9
    val jac = Dedup.shingleJaccardPairs(df, "doc_id", "text",
      n = 3, threshold = 0.9)
    assert(jac.count() == 0)
  }

  test("weighted median: at least half the total weight sits at or below it") {
    val rows = Tables.load(spark, sf, "lineitem")
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .groupBy(_.getString(0))
    val out = graft.queries.AnalyticsQueries
      .queries("a12_weighted_percentile")(spark, sf).collect()
    out.foreach { r =>
      val flag = r.getString(0)
      val wm = r.getDouble(1)
      val grp = rows(flag)
      val tot = grp.map(_.getDouble(2)).sum
      val atOrBelow = grp.filter(_.getDouble(1) <= wm).map(_.getDouble(2)).sum
      val strictlyBelow = grp.filter(_.getDouble(1) < wm).map(_.getDouble(2)).sum
      assert(2 * atOrBelow >= tot, s"$flag: median too low")
      assert(2 * strictlyBelow < tot, s"$flag: median too high")
    }
  }

  test("ohlcBars on a batch input equals the window-frame OHLC bars") {
    val stream = EventStreams.ohlcBars(Tables.loadEvents(spark, sf), "1 hour")
      .orderBy("event_type", "hour").collect().toSeq
    val batch = graft.queries.BehaviorQueries.queries("e_ohlc")(spark, sf)
      .collect().toSeq
    assert(stream == batch)
  }

  test("resampleHourlyInterp: observed hours keep their value, gaps stay between neighbours") {
    val ev = Tables.loadEvents(spark, sf)
    val interp = Behavior.resampleHourlyInterp(ev, "event_type", "ts", "value")
    val ffill = Behavior.resampleHourly(ev, "event_type", "ts", "value")
      .drop("n_events")
    val j = interp.join(ffill, Seq("event_type", "hour")).cache()
    // on observed hours the two fills agree exactly (both are the rounded
    // hourly decimal sum)
    assert(j.filter(col("n_events") > 0 &&
      (col("value_interp") =!= col("value_ffill"))).count() == 0)
    // a gap hour with a defined interp lies within the key's observed range
    val bounds = interp.filter(col("n_events") > 0)
      .groupBy("event_type")
      .agg(min("value_interp").as("lo"), max("value_interp").as("hi"))
    val bad = interp.filter(col("n_events") === 0 &&
        col("value_interp").isNotNull)
      .join(bounds, "event_type")
      .filter(col("value_interp") < col("lo") - 1e-6 ||
        col("value_interp") > col("hi") + 1e-6)
    assert(bad.count() == 0)
  }

  test("lshParameterSweep: counts are consistent and rates bounded") {
    val docs = Tables.load(spark, sf, "documents")
    val rep = Dedup.lshParameterSweep(docs, "doc_id", "text",
      n = 3, threshold = 0.4, numHashes = 16, bandCounts = Seq(8, 4))
      .collect()
    assert(rep.length == 2)
    rep.foreach { r =>
      val (nc, nt, ne) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nt <= nc, "true candidates exceed candidates")
      assert(nt <= ne, "true candidates exceed exact pairs")
      if (nc > 0) {
        val p = r.getDouble(5)
        assert(p >= 0.0 && p <= 1.0)
      }
      if (ne > 0) {
        val rc = r.getDouble(6)
        assert(rc >= 0.0 && rc <= 1.0)
      }
    }
  }

  test("resampleHourlyInterp: a synthetic two-point gap interpolates linearly") {
    val e = Seq(
      ("k", 0L, 10.0),
      ("k", 3L * 3600000L, 40.0)) // observed at hour 0 and hour 3
      .toDF("k", "t_ms", "value")
      .select(col("k"), timestamp_millis(col("t_ms")).as("ts"), col("value"))
    val got = Behavior.resampleHourlyInterp(e, "k", "ts", "value")
      .select("hour", "n_events", "value_interp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(
      ("1970-01-01 00:00", 1L, 10.0),
      ("1970-01-01 01:00", 0L, 20.0),
      ("1970-01-01 02:00", 0L, 30.0),
      ("1970-01-01 03:00", 1L, 40.0)))
  }
}
