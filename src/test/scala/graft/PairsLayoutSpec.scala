package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Catalog, Tables}

/** Exact distinct-pairs layout (r9 verdict task #5):
  * `Catalog.buildPairsLayout` + `Catalog.distinctCount`.
  *
  * Laws pinned here:
  *  - a routed distinct count reads the stored pairs, never the fact
  *    table (plan pin), and is DIGIT-EQUAL to the live plan (this is
  *    the exact sibling of the HLL sketch layout);
  *  - any SUBSET of the layout's group columns rolls up exactly
  *    (distinctness of (group, value) tuples survives re-distincting);
  *  - group-column equality filters route (whole stored tuples);
  *  - row deletes retraction-patch (tuple existence recomputes, base
  *    files untouched); cell edits to stored columns rebuild;
  *  - a durable pairs layout re-attaches through the digest gate.
  */
class PairsLayoutSpec extends SparkSpec {

  private val groupsAll = Seq("l_returnflag", "l_linestatus")

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def direct(df: DataFrame, g: Seq[String],
                     pairCol: String): Seq[Seq[Any]] =
    df.groupBy(g.map(col): _*)
      .agg(count_distinct(col(pairCol)).as(s"cd_$pairCol"))
      .orderBy(g.map(col): _*)
      .collect().map(_.toSeq).toSeq

  private def got(df: DataFrame, g: Seq[String]): Seq[Seq[Any]] =
    df.orderBy(g.map(col): _*).collect().map(_.toSeq).toSeq

  private def newPairsCatalog(): Catalog = {
    val c = new Catalog(spark)
    c.open("pli", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    c.buildPairsLayout("pli", groupsAll, "l_partkey")
    c
  }

  private def pairsOf(c: Catalog): Catalog.PairsLayout =
    c.layoutsOf("pli").collectFirst {
      case (_, l: Catalog.PairsLayout) => l
    }.get

  test("routed distinct count reads stored pairs, not the fact table, digit-equal to live") {
    val c = newPairsCatalog()
    val routed = c.distinctCount("pli", groupsAll, "l_partkey")
    val p = plan(routed)
    assert(p.contains("catalog_pairs_"),
      s"a covered distinct count must serve from stored pairs; plan:\n$p")
    assert(!p.contains("l_orderkey"),
      s"the routed plan must never touch fact-table columns; plan:\n$p")
    assert(c.recentRoutes.last.reason == "routed")
    assert(got(routed, groupsAll) ==
      direct(Tables.load(spark, sf, "lineitem"), groupsAll, "l_partkey"))
  }

  test("subset rollup and group-column filter re-distinct stored pairs exactly") {
    val c = newPairsCatalog()
    val rolled = c.distinctCount("pli", Seq("l_returnflag"), "l_partkey")
    assert(plan(rolled).contains("catalog_pairs_"))
    assert(got(rolled, Seq("l_returnflag")) ==
      direct(Tables.load(spark, sf, "lineitem"), Seq("l_returnflag"),
        "l_partkey"))
    val filtered = c.distinctCount("pli", Seq("l_linestatus"), "l_partkey",
      where = Seq("l_returnflag" -> "A"))
    assert(plan(filtered).contains("catalog_pairs_"))
    assert(got(filtered, Seq("l_linestatus")) ==
      direct(Tables.load(spark, sf, "lineitem")
        .filter(col("l_returnflag") === "A"), Seq("l_linestatus"),
        "l_partkey"))
    // the covering dry-run names the decision without running anything
    assert(c.explainDistinctExact("pli", Seq("l_returnflag"), "l_partkey")
      .reason == "routed")
    assert(c.explainDistinctExact("pli", Seq("l_returnflag"), "l_suppkey")
      .reason == "param-mismatch")
    assert(c.explainDistinctExact("pli", Seq("l_returnflag"), "l_partkey",
      where = Seq("l_quantity" -> 1.0)).reason == "param-mismatch",
      "a filter on a non-group column must not route")
    // a different counted column is a param mismatch: live fallback
    val other = c.distinctCount("pli", Seq("l_returnflag"), "l_suppkey")
    assert(!plan(other).contains("catalog_pairs_"))
    assert(c.recentRoutes.last.reason == "param-mismatch" ||
      c.recentRoutes.last.reason == "no-layout")
    assert(got(other, Seq("l_returnflag")) ==
      direct(Tables.load(spark, sf, "lineitem"), Seq("l_returnflag"),
        "l_suppkey"))
  }

  test("row delete retraction-patches tuple existence; edits to stored columns rebuild") {
    val c = newPairsCatalog()
    val before = pairsOf(c)
    val s = c.get("pli").get
    assert(s.deleteRow(0L))
    assert(c.refreshStale("pli") == Seq("pairs:l_returnflag,l_linestatus:l_partkey"))
    val patched = pairsOf(c)
    assert(patched.path == before.path && patched.patch.isDefined,
      "a delete must retraction-patch, never rewrite the pairs base")
    val routed = c.distinctCount("pli", groupsAll, "l_partkey")
    assert(plan(routed).contains("catalog_pairs_"))
    assert(got(routed, groupsAll) ==
      direct(graft.core.Positional.strip(s.current), groupsAll,
        "l_partkey"))
    // an edit to a stored column loses the pre-edit tuple: rebuild
    assert(s.setCell(0L, "l_partkey", "1"))
    c.refreshStale("pli")
    val rebuilt = pairsOf(c)
    assert(rebuilt.path != before.path && rebuilt.patch.isEmpty,
      "a stored-column edit must rebuild the pairs")
    assert(got(c.distinctCount("pli", groupsAll, "l_partkey"), groupsAll)
      == direct(graft.core.Positional.strip(s.current), groupsAll,
        "l_partkey"))
  }

  test("durable pairs re-attach in a fresh Catalog over the same warehouse") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh_pr_")
      .toString
    val a = new Catalog(spark, Some(wh))
    a.open("pli", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    a.buildPairsLayout("pli", groupsAll, "l_partkey")
    val fromA = got(a.distinctCount("pli", groupsAll, "l_partkey"),
      groupsAll)
    a.close("pli")

    val b = new Catalog(spark, Some(wh))
    b.open("pli", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    assert(b.explainRoute("pli",
      "pairs:l_returnflag,l_linestatus:l_partkey").reason == "routed")
    val routed = b.distinctCount("pli", groupsAll, "l_partkey")
    assert(plan(routed).contains(wh),
      s"the reopened catalog must serve from warehouse files; plan:\n" +
        plan(routed))
    assert(got(routed, groupsAll) == fromA)
  }

  test("with no covering pairs layout, a histogram cube serves the exact distinct") {
    val cat = new Catalog(spark)
    cat.open("pcb", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    // ONLY a cube — whose group columns include the counted column, so
    // its stored rows are one per distinct (flag, quantity) tuple
    cat.buildCubeLayout("pcb", Seq("l_returnflag", "l_quantity"), Nil)
    assert(cat.explainDistinctExact("pcb", Seq("l_returnflag"),
      "l_quantity").reason == "routed")
    val served = cat.distinctCount("pcb", Seq("l_returnflag"), "l_quantity")
    assert(plan(served).contains("catalog_cube_") &&
      !plan(served).contains("l_orderkey"),
      s"the cube fallback must read stored tuples; plan:\n${plan(served)}")
    assert(cat.recentRoutes.last ==
      Catalog.RouteReport("cube:l_returnflag,l_quantity", "layout",
        "routed"))
    val live = Tables.load(spark, sf, "lineitem")
    assert(got(served, Seq("l_returnflag")) ==
      direct(live, Seq("l_returnflag"), "l_quantity"))
    // a column the cube does not group by still falls to the live plan
    assert(cat.explainDistinctExact("pcb", Seq("l_returnflag"),
      "l_partkey").reason == "no-layout")
    assert(!plan(cat.distinctCount("pcb", Seq("l_returnflag"),
      "l_partkey")).contains("catalog_cube_"))
    // when BOTH cover, the purpose-built pairs layout wins
    cat.buildPairsLayout("pcb", Seq("l_returnflag"), "l_quantity")
    cat.distinctCount("pcb", Seq("l_returnflag"), "l_quantity")
    assert(cat.recentRoutes.last.slot == "pairs:l_returnflag:l_quantity")
  }

  test("typed multi-distinct joins per-column layout serves, never the fact table") {
    val cat = new Catalog(spark)
    cat.open("pmd", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    cat.buildPairsLayout("pmd", Seq("l_returnflag"), "l_partkey")
    // the second column serves from a HISTOGRAM CUBE (no pairs built) —
    // the per-column decision composes inside one call
    cat.buildCubeLayout("pmd", Seq("l_returnflag", "l_quantity"), Nil)
    val served = cat.distinctCounts("pmd", Seq("l_returnflag"),
      Seq("l_partkey", "l_quantity"))
    val p = plan(served)
    assert(p.contains("catalog_pairs_") && p.contains("catalog_cube_") &&
      !p.contains("l_orderkey"),
      s"each column must serve from its own layout; plan:\n$p")
    val live = Tables.load(spark, sf, "lineitem")
    assert(got(served, Seq("l_returnflag")) ==
      live.groupBy("l_returnflag")
        .agg(count_distinct(col("l_partkey")).as("cd_l_partkey"),
          count_distinct(col("l_quantity")).as("cd_l_quantity"))
        .orderBy("l_returnflag").collect().map(_.toSeq).toSeq)
    // the GLOBAL form: single-row sides, 1×1 cross
    assert(cat.distinctCounts("pmd", Nil, Seq("l_partkey", "l_quantity"))
      .collect().map(_.toSeq).toSeq ==
      live.agg(count_distinct(col("l_partkey")).as("cd_l_partkey"),
        count_distinct(col("l_quantity")).as("cd_l_quantity"))
        .collect().map(_.toSeq).toSeq)
  }
}
