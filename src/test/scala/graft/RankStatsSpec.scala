package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.RankStats

/** Distribution-free laws for the counts-of-counts rank statistics: the
  * closed-form Gini/AUC/KS answers on constructed inputs are known
  * exactly, so a law failure localizes the arithmetic (prefix-sum walk,
  * tie handling, final division) without an oracle in the loop.
  */
class RankStatsSpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](g: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private def gini1(xs: Seq[Long]): (Long, Long, Double) = {
    val r = RankStats.gini(xs.toDF("x"), "x").head()
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  test("law: gini of an all-equal distribution is 0") {
    forAll(Gen.zip(Gen.choose(2, 40), Gen.choose(1L, 99L))) { case (n, v) =>
      val (gotN, gotT, g) = gini1(Seq.fill(n)(v))
      assert(gotN == n && gotT == n * v && g == 0.0)
    }
  }

  test("law: gini of one-owner mass is (n-1)/n") {
    forAll(Gen.zip(Gen.choose(2, 40), Gen.choose(1L, 99L))) { case (n, t) =>
      val (_, _, g) = gini1(t +: Seq.fill(n - 1)(0L))
      val expect = BigDecimal((n - 1).toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(g == expect, s"n=$n t=$t")
    }
  }

  test("law: gini is invariant under positive integer scaling") {
    forAll(Gen.listOfN(12, Gen.choose(0L, 20L)).suchThat(_.sum > 0)) { xs =>
      assert(gini1(xs)._3 == gini1(xs.map(_ * 7))._3)
    }
  }

  test("law: gini matches the brute-force pairwise definition") {
    forAll(Gen.listOfN(10, Gen.choose(0L, 15L)).suchThat(_.sum > 0)) { xs =>
      val n = xs.size.toLong
      val s = xs.sum
      val w = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum / 2
      val expect = BigDecimal(w.toDouble / (n * s).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(gini1(xs)._3 == expect)
    }
  }

  private def auc1(rows: Seq[(Double, Long)]): Double =
    RankStats.auc(rows.toDF("s", "y"), "s", "y").head().getDouble(2)

  test("law: AUC is 1 for perfect separation, 0 reversed, 0.5 for ties") {
    forAll(Gen.choose(2, 20)) { k =>
      val pos = (1 to k).map(i => (0.5 + i * 0.01, 1L))
      val neg = (1 to k).map(i => (0.1 + i * 0.01, 0L))
      assert(auc1(pos ++ neg) == 1.0)
      assert(auc1(pos.map { case (s, _) => (s, 0L) } ++
        neg.map { case (s, _) => (s, 1L) }) == 0.0)
      assert(auc1((1 to k).map(_ => (0.7, 1L)) ++
        (1 to k).map(_ => (0.7, 0L))) == 0.5)
    }
  }

  test("law: AUC matches the brute-force concordant-pair count") {
    val scores = Gen.listOfN(14,
      Gen.zip(Gen.choose(0, 9).map(_ * 0.1), Gen.oneOf(0L, 1L)))
      .suchThat(l => l.exists(_._2 == 1L) && l.exists(_._2 == 0L))
    forAll(scores) { rows =>
      val pos = rows.filter(_._2 == 1L).map(_._1)
      val neg = rows.filter(_._2 == 0L).map(_._1)
      val num2 = (for (p <- pos; q <- neg)
        yield if (p > q) 2L else if (p == q) 1L else 0L).sum
      val expect = BigDecimal(num2.toDouble / (2.0 * pos.size * neg.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(auc1(rows) == expect)
    }
  }

  private def ks1(a: Seq[Double], b: Seq[Double]): (Long, Long, Double) = {
    val df = a.map((_, "a")) ++ b.map((_, "b"))
    val r = RankStats.ksBinned(df.toDF("v", "side"), "v",
      isA = col("side") === "a", isB = col("side") === "b",
      w = 0.25, bins = 64).head()
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  test("law: KS of identical samples is 0; of disjoint supports is 1") {
    forAll(Gen.listOfN(15, Gen.choose(0.0, 15.0))) { xs =>
      val (na, nb, d0) = ks1(xs, xs)
      assert(na == xs.size && nb == xs.size && d0 == 0.0)
      val lowHi = ks1(xs.map(_ / 16.0), xs.map(x => 8.0 + x / 16.0))
      assert(lowHi._3 == 1.0)
    }
  }

  test("degenerate all-tied samples: mannWhitney z and kruskalWallis h are NULL") {
    // one distinct value — MW variance and the KW tie factor are both 0,
    // so the statistics are undefined; both engines must say NULL, never
    // an IEEE inf/NaN (the a36/a37 oracle SQL carries matching CASEs)
    val tied = Seq.fill(12)(("a", 5.0)) ++ Seq.fill(9)(("b", 5.0))
    val df = tied.toDF("g", "x")
    val mw = RankStats.mannWhitney(df, "x",
      isA = col("g") === "a", isB = col("g") === "b").head()
    assert(mw.getLong(0) == 12 && mw.getLong(1) == 9 && mw.isNullAt(3))
    val kw = RankStats.kruskalWallis(df, "x", "g").head()
    assert(kw.getLong(0) == 21 && kw.isNullAt(2))
    // sanity: a non-degenerate sample still yields finite statistics
    val ok = (Seq.fill(6)(("a", 1.0)) ++ Seq.fill(6)(("b", 2.0))).toDF("g", "x")
    assert(!RankStats.mannWhitney(ok, "x",
      isA = col("g") === "a", isB = col("g") === "b").head().isNullAt(3))
    assert(!RankStats.kruskalWallis(ok, "x", "g").head().isNullAt(2))
  }

  /** The crossing-walk percentile must be bit-for-bit Spark's own
    * `percentile()` — it replays the identical interpolation arithmetic —
    * so the law is direct equality against the built-in on arbitrary
    * samples, probes, and group keys. (The built-in stays correct at test
    * scale; it's only its single-task value→count merge that dies at
    * 100 TB, which is why production paths use the walk.)
    */
  test("law: exactPercentiles ≡ built-in percentile, bit-for-bit") {
    val probes = Seq("p10" -> 0.1, "p25" -> 0.25, "p50" -> 0.5,
      "p90" -> 0.9, "p99" -> 0.99)
    forAll(Gen.listOfN(60, Gen.zip(Gen.oneOf("g1", "g2", "g3"),
        Gen.choose(0.0, 50.0).map(x => math.rint(x * 4) / 4))), n = 4) { xs =>
      val df = xs.toDF("g", "x")
      // global
      val got = RankStats.exactPercentiles(df, col("x"), Nil, probes).head()
      val want = df.agg(
        expr("percentile(x, 0.1)"), expr("percentile(x, 0.25)"),
        expr("percentile(x, 0.5)"), expr("percentile(x, 0.9)"),
        expr("percentile(x, 0.99)")).head()
      for (i <- probes.indices)
        assert(got.getDouble(i) == want.getDouble(i), s"probe $i in $xs")
      // per-key
      val gotK = RankStats.exactPercentiles(df, col("x"), Seq("g"), probes)
        .orderBy("g").collect()
      val wantK = df.groupBy("g").agg(
          expr("percentile(x, 0.1)"), expr("percentile(x, 0.25)"),
          expr("percentile(x, 0.5)"), expr("percentile(x, 0.9)"),
          expr("percentile(x, 0.99)")).orderBy("g").collect()
      assert(gotK.length == wantK.length)
      for ((g, w) <- gotK.zip(wantK); i <- probes.indices)
        assert(g.getDouble(i + 1) == w.getDouble(i + 1),
          s"group ${g.getString(0)} probe $i")
    }
  }

  test("exactPercentiles: singleton, all-ties, nulls, empty input") {
    // singleton: every probe is the value
    val one = RankStats.exactPercentiles(Seq(7.5).toDF("x"), col("x"), Nil,
      Seq("a" -> 0.1, "b" -> 0.9)).head()
    assert(one.getDouble(0) == 7.5 && one.getDouble(1) == 7.5)
    // all ties: no interpolation error, exactly the tied value
    val tied = RankStats.exactPercentiles(Seq.fill(9)(3.3).toDF("x"),
      col("x"), Nil, Seq("m" -> 0.5)).head()
    assert(tied.getDouble(0) == 3.3)
    // nulls ignored (like the built-in)
    val withNull = RankStats.exactPercentiles(
      Seq[Option[Double]](Some(1.0), None, Some(3.0)).toDF("x"),
      col("x"), Nil, Seq("m" -> 0.5)).head()
    assert(withNull.getDouble(0) == 2.0)
    // empty: one row, NULL percentile (matches percentile() on empty)
    val empty = RankStats.exactPercentiles(
      Seq.empty[Double].toDF("x"), col("x"), Nil, Seq("m" -> 0.5)).collect()
    assert(empty.length == 1 && empty.head.isNullAt(0))
    // extras fold out of the same pass
    val ex = RankStats.exactPercentiles(
      Seq(1.0, 2.0, 2.0, 4.0).toDF("x"), col("x"), Nil,
      Seq("m" -> 0.5),
      finalAggs = Seq("n" -> sum("__m").cast("long"), "mx" -> max("__v")))
      .head()
    assert(ex.getDouble(0) == 2.0 && ex.getLong(1) == 4L &&
      ex.getDouble(2) == 4.0)
  }

  test("exactPercentiles: an all-NULL key still emits its row (like GROUP BY + percentile)") {
    // the built-in percentile() and SQL GROUP BY both keep a group whose
    // values are entirely NULL, with a NULL percentile — the walk must
    // too, or a migrated query loses rows vs its oracle on sparse data
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)),
      ("b", None: Option[Double]), ("b", None)).toDF("g", "x")
    val got = RankStats.exactPercentiles(df, col("x"), Seq("g"),
        Seq("p50" -> 0.5),
        finalAggs = Seq("n_rows" -> sum("__m").cast("long")))
      .orderBy("g").collect()
    assert(got.length == 2)
    assert(got(0).getString(0) == "a" && got(0).getDouble(1) == 2.0 &&
      got(0).getLong(2) == 2L)
    // group b survives with NULL percentile; n_rows counts its NULL rows
    // the way count(*) did before the migration
    assert(got(1).getString(0) == "b" && got(1).isNullAt(1) &&
      got(1).getLong(2) == 2L)
    // mixed nulls within a key: percentile ignores them, extras count them
    val mixed = RankStats.exactPercentiles(
      Seq(Some(1.0), None, Some(3.0)).toDF("x"), col("x"), Nil,
      Seq("p50" -> 0.5),
      finalAggs = Seq("n_rows" -> sum("__m").cast("long"))).head()
    assert(mixed.getDouble(0) == 2.0 && mixed.getLong(1) == 3L)
  }
}
