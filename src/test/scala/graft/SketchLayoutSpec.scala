package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Catalog, Tables}

/** Per-group HLL distinct-count sketch layout (`Catalog.buildSketchLayout`
  * / `approxDistinct`).
  *
  * The contract pinned here is the sketch's contract, stated precisely
  * (see the `approxDistinct` scaladoc): routed and live estimates agree
  * within the sketch's error bound — digit equality across merge
  * topologies is unattainable for any HLL (direct builds use the HIP
  * estimator, unions the composite one, and even live Spark runs merge
  * per-partition partials). What IS exact: the routed path is
  * deterministic (at-rest register state — no partitioning or arrival
  * order in the answer), untouched groups' estimates never move under
  * IVM, and a durable reopen reproduces the builder's digits.
  */
class SketchLayoutSpec extends SparkSpec {

  private val g2 = Seq("l_returnflag", "l_linestatus")

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def rows(df: DataFrame, order: Seq[String]): Seq[Seq[Any]] =
    df.orderBy(order.map(col): _*).collect().map(_.toSeq).toSeq

  private def newCat(): Catalog = {
    val c = new Catalog(spark)
    c.open("sli", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    c.buildSketchLayout("sli", g2, "l_orderkey")
    c
  }

  /** Exact per-group distinct counts, keyed by the group tuple. */
  private def exactBy(df: DataFrame, g: Seq[String]): Map[Seq[Any], Long] =
    df.groupBy(g.map(col): _*)
      .agg(countDistinct(col("l_orderkey")).as("nd"))
      .collect().map(r => (g.indices.map(r.get), r.getLong(g.size))).toMap

  private def assertWithin(est: Seq[Seq[Any]], exact: Map[Seq[Any], Long],
                           g: Seq[String], tol: Double): Unit =
    est.foreach { row =>
      val key = row.take(g.size)
      val e = row.last.asInstanceOf[Long].toDouble
      val x = exact(key).toDouble
      assert(math.abs(e - x) / x <= tol,
        s"group $key: estimate $e vs exact $x drifted past $tol")
    }

  test("routed estimate reads stored sketches, stays in the error bound, and is deterministic") {
    val c = newCat()
    val li = Tables.load(spark, sf, "lineitem")
    val routed = c.approxDistinct("sli", g2, "l_orderkey")
    val p = plan(routed)
    assert(p.contains("catalog_sketch_"),
      s"a covered distinct count must serve from stored sketches; plan:\n$p")
    assert(p.contains("__hll") && !p.contains("Scan ExistingRDD"),
      s"the routed plan must read sketch binaries, never the session rows; plan:\n$p")
    assert(c.recentRoutes.last.reason == "routed")
    val got = rows(routed, g2)
    assertWithin(got, exactBy(li, g2), g2, tol = 0.05)
    // a live single-pass build agrees within the bound too (estimator
    // may differ — HIP vs composite — but the registers describe the
    // same rows)
    assertWithin(rows(li.groupBy(g2.map(col): _*)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"), lit(12)))
        .as("nd_l_orderkey")), g2), exactBy(li, g2), g2, 0.05)
    // deterministic: at-rest register state has no partitioning in it
    assert(rows(c.approxDistinct("sli", g2, "l_orderkey"), g2) == got)
  }

  test("rollup to a subset unions stored sketches — in bound, fact table untouched") {
    val c = newCat()
    val li = Tables.load(spark, sf, "lineitem")
    val routed = c.approxDistinct("sli", Seq("l_returnflag"), "l_orderkey")
    assert(plan(routed).contains("catalog_sketch_"))
    assertWithin(rows(routed, Seq("l_returnflag")),
      exactBy(li, Seq("l_returnflag")), Seq("l_returnflag"), 0.05)
    // global rollup too
    val total = c.approxDistinct("sli", Seq.empty, "l_orderkey")
    assert(plan(total).contains("catalog_sketch_"))
    val est = total.head().getLong(0).toDouble
    val exact = li.select("l_orderkey").distinct().count().toDouble
    assert(math.abs(est - exact) / exact < 0.05)
    // filtered rollup: a group-column equality selects whole stored
    // sketches; a measure-column filter refuses
    val flt = c.approxDistinct("sli", Seq("l_linestatus"), "l_orderkey",
      where = Seq("l_returnflag" -> "A"))
    assert(plan(flt).contains("catalog_sketch_"))
    val exactA = li.filter(col("l_returnflag") === "A")
      .groupBy("l_linestatus")
      .agg(countDistinct(col("l_orderkey")).as("nd")).collect()
      .map(r => (Seq(r.get(0)), r.getLong(1))).toMap
    assertWithin(rows(flt, Seq("l_linestatus")), exactA,
      Seq("l_linestatus"), 0.05)
    assert(c.explainDistinct("sli", Seq("l_linestatus"), "l_orderkey",
      where = Seq("l_partkey" -> 1)).reason == "param-mismatch")
  }

  test("different lgK or column falls back to live; edit goes stale; IVM re-sketches dirty groups only") {
    val c = newCat()
    assert(c.explainDistinct("sli", Seq("l_returnflag"), "l_orderkey")
      .reason == "routed")
    assert(c.explainDistinct("sli", Seq("l_returnflag"), "l_orderkey",
      lgK = 14).reason == "param-mismatch")
    assert(!plan(c.approxDistinct("sli", Seq("l_returnflag"), "l_orderkey",
      lgK = 14)).contains("catalog_sketch_"),
      "a different register width is a different sketch — no route")
    assert(c.recentRoutes.last.reason == "param-mismatch")
    assert(!plan(c.approxDistinct("sli", Seq("l_returnflag"), "l_partkey"))
      .contains("catalog_sketch_"))

    val before = rows(c.approxDistinct("sli", g2, "l_orderkey"), g2)
    val s = c.get("sli").get
    // position 0's group: read it BEFORE the edit
    val dirtyGroup = s.current.filter(col("__pos") === 0L)
      .select(g2.map(col): _*).head().toSeq
    assert(s.setCell(0L, "l_orderkey", "999999"))
    assert(!plan(c.approxDistinct("sli", g2, "l_orderkey"))
      .contains("catalog_sketch_"))
    assert(c.recentRoutes.last.reason == "stale-epoch")

    assert(c.refreshStale("sli") ==
      Seq("sketch:l_returnflag,l_linestatus:l_orderkey"))
    val l = c.layoutsOf("sli").collectFirst {
      case (_, sk: Catalog.SketchLayout) => sk
    }.get
    assert(l.patch.isDefined, "a 1-cell edit must re-sketch, not rebuild")
    assert(l.patch.get.add.count() == 1L,
      "one edited row re-sketches exactly its own group")

    val after = rows(c.approxDistinct("sli", g2, "l_orderkey"), g2)
    assert(c.recentRoutes.last.reason == "routed")
    // untouched groups' stored sketches are byte-identical: their
    // estimates must not move AT ALL
    before.zip(after).foreach { case (b, a) =>
      if (b.take(2) != dirtyGroup) assert(b == a,
        s"untouched group ${b.take(2)} moved: $b -> $a")
    }
    // and the re-sketched group stays in bound vs the post-edit exact
    assertWithin(after.filter(_.take(2) == dirtyGroup),
      exactBy(graft.core.Positional.strip(s.current), g2), g2, 0.05)
  }

  test("durable sketches re-attach in a fresh Catalog and reproduce the builder's digits") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh_").toString
    val a = new Catalog(spark, Some(wh))
    a.open("sli", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    a.buildSketchLayout("sli", Seq("l_returnflag"), "l_orderkey")
    val fromA = rows(a.approxDistinct("sli", Seq("l_returnflag"),
      "l_orderkey"), Seq("l_returnflag"))
    a.close("sli")

    val b = new Catalog(spark, Some(wh))
    b.open("sli", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    assert(b.explainRoute("sli", "sketch:l_returnflag:l_orderkey")
      .reason == "routed")
    val routed = b.approxDistinct("sli", Seq("l_returnflag"), "l_orderkey")
    assert(plan(routed).contains(wh))
    assert(rows(routed, Seq("l_returnflag")) == fromA,
      "same stored registers, same digits")
  }
}
