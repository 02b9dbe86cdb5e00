package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("histogram quantile picks the first bin-edge at or past ceil(q*n)") {
    // values 1..100, bins [0,10)..[90,100]: p50 needs the 50th value; bins
    // 0..4 hold 1..49 (49 values), so bin 5 crosses — estimate = its upper
    // edge 60. p90 needs the 90th: bins 0..8 hold 1..89, bin 8's cum is 89,
    // bin 9 (90..100, incl. clamped 100) crosses — estimate 100.
    val df = (1 to 100).map(v => ("g", v.toDouble)).toDF("k", "x")
    val got = Sketches.histogramQuantiles(df, "x", 0.0, 100.0, 10,
      Seq(0.5, 0.9), Seq("k")).collect()
    assert(got.map(r => (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toSeq === Seq((0.5, 60.0, 100L), (0.9, 100.0, 100L)))
  }

  test("histogram quantile clamps out-of-range values into edge bins") {
    val df = Seq(("g", -5.0), ("g", 0.5), ("g", 99.0), ("g", 250.0))
      .toDF("k", "x")
    // n=4: p50 needs cum>=2 — bin 0 holds {-5, 0.5} (cum 2) → est 10;
    // p100 needs cum>=4 — bin 9 holds {99, 250} → est 100
    val got = Sketches.histogramQuantiles(df, "x", 0.0, 100.0, 10,
      Seq(0.5, 1.0), Seq("k")).collect()
    assert(got.map(_.getDouble(2)).toSeq === Seq(10.0, 100.0))
  }

  test("histogram cells merge across shards by addition") {
    val all = (1 to 100).map(v => ("g", v.toDouble)).toDF("k", "x")
    val half1 = all.filter(col("x") <= 50)
    val half2 = all.filter(col("x") > 50)
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.select(least(lit(9), greatest(lit(0),
          floor(col("x") / 10.0).cast("int"))).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("c"))
    val merged = cells(half1).unionByName(cells(half2))
      .groupBy("bin").agg(sum("c").as("c"))
    val direct = cells(all)
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
  }

  test("count-min never underestimates; collision-free fixture is exact") {
    val toks = Seq("a", "a", "a", "b", "b", "c").toDF("token")
    val cells = Sketches.countMinCells(toks, "token", depth = 4, width = 512)
    val probes = Seq("a", "b", "c", "zzz_absent").toDF("token")
    val est = Sketches.countMinEstimate(cells, probes, "token", 4, 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 distinct tokens into 4x512 cells: est >= exact always, and with no
    // collisions (checked below) est == exact; absent token estimates 0
    assert(est("a") >= 3L && est("b") >= 2L && est("c") >= 1L)
    assert(est("zzz_absent") === 0L)
    val nCells = cells.select(countDistinct(col("row"), col("cell"))).head().getLong(0)
    if (nCells == 12L) // 3 tokens x 4 rows, all distinct -> exact
      assert(est("a") === 3L && est("b") === 2L && est("c") === 1L)
  }

  private def forAll[A](g: org.scalacheck.Gen[A], n: Int = 5)(
      body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(42L + i)).foreach(body)
    }

  test("law: quantile estimate brackets the true quantile within one bin") {
    // est = upper edge of the bin holding the ceil(q*n)-th value, so for
    // in-range data: true <= est <= true + binWidth — distribution-free
    val gen = org.scalacheck.Gen.nonEmptyListOf(
      org.scalacheck.Gen.choose(0.0, 99.999))
    forAll(gen) { xs =>
      val df = xs.map(("g", _)).toDF("k", "x")
      val est = Sketches.histogramQuantiles(df, "x", 0.0, 100.0, 20,
        Seq(0.5), Seq("k")).head().getDouble(2)
      val sorted = xs.sorted
      val truth = sorted(math.ceil(0.5 * xs.size).toInt - 1)
      assert(truth <= est && est <= truth + 5.0 + 1e-9,
        s"est $est vs true $truth for n=${xs.size}")
    }
  }

  test("law: count-min never underestimates any present token") {
    val gen = org.scalacheck.Gen.nonEmptyListOf(
      org.scalacheck.Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
    forAll(gen, n = 3) { ts =>
      val toks = ts.toDF("token")
      val cells = Sketches.countMinCells(toks, "token", depth = 4, width = 32)
      val probes = ts.distinct.toDF("token")
      val est = Sketches.countMinEstimate(cells, probes, "token", 4, 32)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = ts.groupBy(identity).view.mapValues(_.size.toLong).toMap
      exact.foreach { case (t, c) =>
        assert(est(t) >= c, s"CMS underestimated '$t': ${est(t)} < $c")
      }
    }
  }

  test("count-min cells merge across shards by addition") {
    val toks = Seq("a", "a", "b", "c", "c", "c").toDF("token")
    val s1 = Sketches.countMinCells(toks.limit(3), "token", 4, 64)
    val s2 = Sketches.countMinCells(
      toks.exceptAll(toks.limit(3)), "token", 4, 64)
    val merged = s1.unionByName(s2).groupBy("row", "cell")
      .agg(sum("c").as("c"))
    val direct = Sketches.countMinCells(toks, "token", 4, 64)
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
  }
}
