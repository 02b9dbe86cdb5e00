package graft

import org.apache.spark.sql.functions._
import graft.core.{Catalog, Tables}

/** SQL-text routing through catalog layouts (r8 verdict task #4): a
  * range predicate in `catalog.sql` text must read the pruned file set
  * of a valid ranged layout, and an equi-join of two bucketed sessions
  * must plan exchange-free — rewritten by
  * [[graft.plans.SqlLayoutRouting]] at analysis time, with the answers
  * byte-identical to the unrouted plans. Edits invalidate: stale
  * layouts are never published, so SQL falls back to the live views.
  */
class SqlRoutingSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def withoutAutoBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("range predicate in SQL text routes through the ranged layout; edit falls back") {
    val cat = new Catalog(spark)
    cat.open("li_sql", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    cat.buildRangedLayout("li_sql", "l_extendedprice", files = 8)
    val q = """SELECT l_returnflag, count(*) AS n
              |FROM li_sql
              |WHERE l_extendedprice BETWEEN 1000.0 AND 5000.0
              |GROUP BY l_returnflag""".stripMargin
    val routed = cat.sql(q)
    val p = plan(routed)
    assert(p.contains("catalog_ranged"),
      s"SQL range predicate must read the clustered layout; plan:\n$p")
    assert(cat.recentRoutes.exists(r =>
      r.slot == "range:l_extendedprice" && r.reason == "sql-routed"))
    // byte-identical to the live-view plan of the same text
    val live = Tables.load(spark, sf, "lineitem")
      .filter(col("l_extendedprice").between(1000.0, 5000.0))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(routed.collect().map(_.toSeq).toSet ==
      live.collect().map(_.toSeq).toSet)
    // an edit invalidates the layout: same SQL plans against the live view
    assert(cat.get("li_sql").get.setCell(0L, "l_quantity", "42"))
    val p2 = plan(cat.sql(q))
    assert(!p2.contains("catalog_ranged"),
      s"stale ranged layout must not serve SQL; plan:\n$p2")
  }

  test("one-sided and reversed comparisons still prune; non-matching shapes don't route") {
    val cat = new Catalog(spark)
    cat.open("li_sql1", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    cat.buildRangedLayout("li_sql1", "l_extendedprice", files = 8)
    val oneSided = cat.sql(
      "SELECT count(*) AS n FROM li_sql1 WHERE 9000.0 <= l_extendedprice")
    assert(plan(oneSided).contains("catalog_ranged"))
    assert(oneSided.head().getLong(0) ==
      Tables.load(spark, sf, "lineitem")
        .filter(col("l_extendedprice") >= 9000.0).count())
    // a bound on an expression of the column is NOT a bound on the
    // stored values — the conservative matcher must not route it
    val noRoute = cat.sql(
      "SELECT count(*) AS n FROM li_sql1 WHERE l_extendedprice * 2 >= 4000.0")
    assert(!plan(noRoute).contains("catalog_ranged"))
  }

  test("SQL equi-join of two bucketed sessions plans with no exchange") {
    val cat = new Catalog(spark)
    cat.open("ord_sql", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    cat.open("lit_sql", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    cat.buildBucketedLayout("ord_sql", "o_orderkey", 8)
    cat.buildBucketedLayout("lit_sql", "l_orderkey", 8)
    withoutAutoBroadcast {
      // plain join projection: the ONLY possible exchange is the join's,
      // so zero Exchange pins storage co-location (an aggregation above
      // would legitimately shuffle on its own grouping key)
      val q = """SELECT l_orderkey, o_orderpriority
                |FROM lit_sql JOIN ord_sql ON l_orderkey = o_orderkey""".stripMargin
      val routed = cat.sql(q)
      val p = plan(routed)
      assert(!p.contains("Exchange"),
        s"bucket-co-located SQL join must not shuffle; plan:\n$p")
      assert(cat.recentRoutes.exists(r =>
        r.slot == "bucket:l_orderkey" && r.reason == "sql-routed"))
      val live = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "o_orderpriority")
      assert(routed.count() == live.count())
      // mismatched join key: no route, and the answer is still correct
      val cross = cat.sql(
        """SELECT count(*) AS n
          |FROM lit_sql JOIN ord_sql ON l_linenumber = o_orderkey""".stripMargin)
      assert(plan(cross).contains("Exchange"))
    }
  }
}
