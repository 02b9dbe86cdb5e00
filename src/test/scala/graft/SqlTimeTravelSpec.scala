package graft

import org.apache.spark.sql.functions._
import graft.core.{Catalog, Positional}

/** Time-travel SQL (r11 verdict task #6): `FROM <session> VERSION AS OF
  * <pinned epoch>` serves the pinned snapshot — the VacuumSpec
  * pre-maintenance law, stated from SQL text — while the bare name in
  * the same statement serves the live route; the pinned route still
  * prunes through the pinned layout's skipping stats.
  */
class SqlTimeTravelSpec extends SparkSpec {

  test("VERSION AS OF a pinned epoch serves the pre-edit answer; the live name serves the post-edit one") {
    val cat = new Catalog(spark)
    cat.open("tt", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    cat.buildRangedLayout("tt", "o_totalprice", files = 8,
      idCol = Some("o_orderkey"))
    val s = cat.get("tt").get
    val epoch = cat.pin("tt")
    val preCount = s.rowCount

    // maintenance: delete a band of rows, refresh the layout
    cat.sql("DELETE FROM tt WHERE o_orderkey % 10 = 1")
    assert(cat.refreshStale("tt").nonEmpty)
    val postCount = s.rowCount
    assert(postCount < preCount)

    val pre = cat.sql(s"SELECT count(*) AS n FROM tt VERSION AS OF $epoch")
      .head().getLong(0)
    val post = cat.sql("SELECT count(*) AS n FROM tt").head().getLong(0)
    assert(pre == preCount, "pinned SQL must serve the pre-maintenance state")
    assert(post == postCount, "the live name must serve the refreshed state")

    // BOTH epochs in one statement: the rewrite is per-clause
    val both = cat.sql(
      s"""SELECT (SELECT count(*) FROM tt VERSION AS OF $epoch) AS pre,
         |       count(*) AS post FROM tt""".stripMargin).head()
    assert(both.getLong(0) == preCount && both.getLong(1) == postCount)
  }

  test("a range predicate on the pinned epoch routes through the PINNED layout's stats") {
    val cat = new Catalog(spark)
    cat.open("ttr", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    cat.buildRangedLayout("ttr", "o_totalprice", files = 8,
      idCol = Some("o_orderkey"))
    val s = cat.get("ttr").get
    val epoch = cat.pin("ttr")
    val want = Positional.strip(s.current)
      .filter(col("o_totalprice") >= 1000.0 && col("o_totalprice") <= 50000.0)
      .count()
    // mutate + refresh: live layout moves on, the pin must not
    assert(s.setCell(0L, "o_totalprice", "999999.99"))
    assert(cat.refreshStale("ttr").nonEmpty)
    val got = cat.sql(
      s"""SELECT count(*) AS n FROM ttr VERSION AS OF $epoch
         |WHERE o_totalprice >= 1000.0 AND o_totalprice <= 50000.0""".stripMargin)
    assert(got.head().getLong(0) == want)
    assert(cat.recentRoutes.exists(r => r.decision == "layout" &&
      r.reason == "sql-pinned"),
      s"pinned SQL range read must route through the pinned layout: " +
        s"${cat.recentRoutes}")
    // and the file-pruned plan is visible (pruned parquet read)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("catalog_ranged_"),
      "the pinned route must read the layout's part files")
  }

  test("an aggregate over VERSION AS OF routes through the PINNED cube — no fact scan, pre-edit digits") {
    val cat = new Catalog(spark)
    cat.open("ttc", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    cat.buildCubeLayout("ttc", Seq("l_returnflag"), Seq("l_quantity"))
    val q = (view: String) =>
      s"""SELECT l_returnflag, count(*) AS n,
         |  CAST(sum(CAST(round(l_quantity, 6) AS DECIMAL(38,6)))
         |    AS DOUBLE) AS sum_qty
         |FROM $view GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    val pre = cat.sql(q("ttc")).collect().map(_.toSeq).toSeq
    val epoch = cat.pin("ttc")
    // mutate + refresh: the LIVE cube moves on
    val s = cat.get("ttc").get
    assert(s.setCell(0L, "l_quantity", "9999.0"))
    assert(cat.refreshStale("ttc").nonEmpty)
    val pinnedQ = cat.sql(q(s"ttc VERSION AS OF $epoch"))
    val p = pinnedQ.queryExecution.executedPlan.toString
    assert(p.contains("catalog_cube_") && !p.contains("l_orderkey"),
      s"the pinned aggregate must re-merge the PINNED cube, never scan " +
        s"the fact table; plan:\n$p")
    assert(cat.recentRoutes.exists(r => r.decision == "layout" &&
      r.reason == "sql-pinned" && r.slot.startsWith("cube:")))
    assert(pinnedQ.collect().map(_.toSeq).toSeq == pre,
      "the pinned route must serve the pre-edit digits")
    assert(cat.sql(q("ttc")).collect().map(_.toSeq).toSeq != pre,
      "the live route must serve the post-refresh digits")
  }

  test("restore rolls the session back to a pinned epoch; refresh rebuilds; the pin survives") {
    val cat = new Catalog(spark)
    cat.open("ttr2", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    cat.buildRangedLayout("ttr2", "o_totalprice", files = 4,
      idCol = Some("o_orderkey"))
    val s = cat.get("ttr2").get
    val epoch = cat.pin("ttr2")
    val preCount = s.rowCount
    val preSum = Positional.strip(s.current)
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head().getDecimal(0)

    // a bad ingest: delete a band, append garbage, refresh
    cat.sql("DELETE FROM ttr2 WHERE o_orderkey % 7 = 0")
    cat.sql("INSERT INTO ttr2 SELECT o_orderkey + 900000, o_custkey, " +
      "o_orderstatus, o_totalprice * 100, o_orderdate, o_orderpriority " +
      "FROM ttr2 WHERE o_orderkey % 11 = 0")
    assert(cat.refreshStale("ttr2").nonEmpty)
    assert(s.rowCount != preCount)

    cat.restore("ttr2", epoch)
    assert(s.rowCount == preCount, "restore must serve the pinned row set")
    assert(Positional.strip(s.current)
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head()
      .getDecimal(0) == preSum, "restored values must be the pinned ones")
    // structural: the layout rebuilds on refresh and routes again
    assert(cat.refreshStale("ttr2").nonEmpty)
    assert(cat.explainRoute("ttr2", "range:o_totalprice").reason == "routed")
    // the pin survives a restore — a wrong rollback can be re-rolled
    assert(cat.sql(s"SELECT count(*) AS n FROM ttr2 VERSION AS OF $epoch")
      .head().getLong(0) == preCount)
  }

  test("ROLLUP over VERSION AS OF re-merges the PINNED cube — composition of the two r13 rewrites") {
    val cat = new Catalog(spark)
    cat.open("ttgs", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    cat.buildCubeLayout("ttgs", Seq("l_returnflag", "l_linestatus"),
      Seq("l_quantity"))
    val s = cat.get("ttgs").get
    val epoch = cat.pin("ttgs")
    val want = Positional.strip(s.current)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
      .collect().map(_.toSeq).toSeq
    // mutate + refresh: the live cube moves on; the pinned one must
    // still serve the pre-edit rollup, from STORED partials
    assert(s.setCell(0L, "l_quantity", "42"))
    assert(cat.refreshStale("ttgs").nonEmpty)
    val routed = cat.sql(
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n
         |FROM ttgs VERSION AS OF $epoch
         |GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
        .stripMargin)
    val p = routed.queryExecution.executedPlan.toString
    assert(p.contains("catalog_cube_") && !p.contains("l_orderkey"),
      s"the pinned rollup must re-merge the pinned cube; plan:\n$p")
    assert(routed.collect().map(_.toSeq).toSeq == want,
      "the pinned rollup must serve the pre-edit answer")
  }

  test("TIMESTAMP AS OF resolves to the newest pin at-or-before the instant (r12 task #3)") {
    val cat = new Catalog(spark)
    cat.open("ttts", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    val s = cat.get("ttts").get
    def micros(iso: String): Long =
      java.time.Instant.parse(iso).toEpochMilli * 1000L
    // controlled clock: two pins at known instants bracketing a mutation
    var now = micros("2026-01-01T00:00:00Z")
    cat.pinClock = () => now
    val e0 = cat.pin("ttts")
    val n0 = s.rowCount
    cat.sql("DELETE FROM ttts WHERE o_orderkey % 10 = 1")
    now = micros("2026-02-01T00:00:00Z")
    val e1 = cat.pin("ttts")
    val n1 = s.rowCount
    assert(e1 != e0 && n1 < n0)
    cat.sql("DELETE FROM ttts WHERE o_orderkey % 10 = 2")
    val nLive = s.rowCount
    assert(nLive < n1)
    def countAt(ts: String): Long = cat.sql(
      s"SELECT count(*) AS n FROM ttts TIMESTAMP AS OF '$ts'")
      .head().getLong(0)
    // between the two pins → the FIRST pin's state
    assert(countAt("2026-01-15 00:00:00+00:00") == n0,
      "an instant between two pins must resolve to the earlier pin")
    // after the second pin → the second pin's state (newest at-or-before)
    assert(countAt("2026-03-01 00:00:00+00:00") == n1,
      "an instant after the last pin must resolve to that pin, " +
        "never the live state")
    // exactly the first pin's instant → inclusive (at-or-before)
    assert(countAt("2026-01-01 00:00:00+00:00") == n0)
    // before the first pin → fail fast, same contract as unpinned VERSION
    val err = intercept[NoSuchElementException] {
      countAt("2025-12-01 00:00:00+00:00")
    }
    assert(err.getMessage.contains("ttts"))
    // the live name in the same statement still serves the live state
    val both = cat.sql(
      """SELECT (SELECT count(*) FROM ttts
        |   TIMESTAMP AS OF '2026-01-15 00:00:00+00:00') AS pre,
        |  count(*) AS live FROM ttts""".stripMargin).head()
    assert(both.getLong(0) == n0 && both.getLong(1) == nLive)
  }

  test("INSERT INTO t SELECT FROM t VERSION AS OF <pin>: one-statement row recovery (r13)") {
    val cat = new Catalog(spark)
    cat.open("rcv", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    val s = cat.get("rcv").get
    val epoch = cat.pin("rcv")
    val n0 = s.rowCount
    // the incident: a band of rows is deleted
    assert(cat.sql("DELETE FROM rcv WHERE o_orderkey % 10 = 3")
      .head().getLong(1) > 0)
    val nAfter = s.rowCount
    assert(nAfter < n0)
    // the recovery, in ONE statement: re-insert exactly the deleted rows
    // from the pinned snapshot (the travel clause resolves inside the
    // INSERT's source query)
    val rep = cat.sql(
      s"""INSERT INTO rcv
         |SELECT * FROM rcv VERSION AS OF $epoch
         |WHERE o_orderkey % 10 = 3""".stripMargin)
    assert(rep.head().getLong(1) == n0 - nAfter)
    assert(s.rowCount == n0)
    // content equals the pinned state (modulo row order)
    val got = graft.core.Positional.strip(s.current)
      .orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    val want = cat.snapshotAsOf("rcv", epoch)
      .orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    assert(got == want, "recovery must reproduce the pinned rows exactly")
    // the appended lineage binds LIVE/snapshot plans, never layout
    // storage: unpin + vacuum must not be able to break the session
    // (r13 review — the same invariant CTAS pins)
    assert(!s.current.inputFiles.exists(_.contains("catalog_")),
      "a DML source plan must never reference layout storage")
    // MERGE sources resolve travel clauses too
    val rep2 = cat.sql(
      s"""MERGE INTO rcv t
         |USING (SELECT o_orderkey, o_totalprice
         |       FROM rcv VERSION AS OF $epoch
         |       WHERE o_orderkey % 100 = 7) p
         |ON t.o_orderkey = p.o_orderkey
         |WHEN MATCHED THEN UPDATE SET o_totalprice = p.o_totalprice"""
        .stripMargin)
    assert(rep2.head().getLong(1) > 0)
  }

  test("SQL pin management round-trips: CREATE SNAPSHOT → TIMESTAMP AS OF → DROP SNAPSHOT (r13 verdict task #2)") {
    val cat = new Catalog(spark)
    cat.open("snp", s"$sf/region.parquet", orderCols = Seq("r_regionkey"))
    def micros(iso: String): Long =
      java.time.Instant.parse(iso).toEpochMilli * 1000L
    cat.pinClock = () => micros("2027-01-01T00:00:00Z")
    val rep = cat.sql("CREATE SNAPSHOT snp")
    assert(rep.head().getString(0) == "create_snapshot")
    val epoch = rep.head().getLong(1)
    assert(cat.pinnedEpochs("snp") == Seq(epoch))
    cat.sql("DELETE FROM snp WHERE r_regionkey >= 0")
    assert(cat.sql("SELECT count(*) AS n FROM snp").head().getLong(0) == 0)
    // the SQL-created pin is exactly what TIMESTAMP AS OF resolves to —
    // SQL-only time travel no longer depends on a typed-API pin existing
    assert(cat.sql(
      """SELECT count(*) AS n FROM snp
        |TIMESTAMP AS OF '2027-06-01 00:00:00+00:00'""".stripMargin)
      .head().getLong(0) == 5L)
    assert(cat.sql(s"SELECT count(*) AS n FROM snp VERSION AS OF $epoch")
      .head().getLong(0) == 5L)
    // DROP SNAPSHOT releases the pin (and its lease); a repeat fails fast
    assert(cat.sql(s"DROP SNAPSHOT snp AT $epoch")
      .head().getString(0) == "drop_snapshot")
    assert(cat.pinnedEpochs("snp").isEmpty)
    intercept[Exception] { cat.sql(s"DROP SNAPSHOT snp AT $epoch") }
  }

  test("TIMESTAMP AS OF resolves retained (unpinned) epochs; a trimmed instant fails fast (r13 verdict task #3)") {
    val cat = new Catalog(spark)
    cat.open("rte", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    val s = cat.get("rte").get
    def micros(iso: String): Long =
      java.time.Instant.parse(iso).toEpochMilli * 1000L
    // controlled epoch clock: two mutations at known instants, NO pins
    var now = micros("2027-01-01T00:00:00Z")
    s.epochClock = () => now
    cat.sql("DELETE FROM rte WHERE o_orderkey % 10 = 1")
    val n1 = s.rowCount
    val e1 = s.epoch
    now = micros("2027-02-01T00:00:00Z")
    cat.sql("DELETE FROM rte WHERE o_orderkey % 10 = 2")
    val nLive = s.rowCount
    assert(nLive < n1)
    def countAt(ts: String): Long = cat.sql(
      s"SELECT count(*) AS n FROM rte TIMESTAMP AS OF '$ts'")
      .head().getLong(0)
    // between the two gestures → the first gesture's state, from the
    // undo history's exact plan reference — no pin ever existed
    assert(countAt("2027-01-15 00:00:00+00:00") == n1,
      "an unpinned-but-retained epoch must be addressable by timestamp")
    // after the last gesture → the live state
    assert(countAt("2027-03-01 00:00:00+00:00") == nLive)
    // VERSION AS OF the retained epoch works too
    assert(cat.sql(s"SELECT count(*) AS n FROM rte VERSION AS OF $e1")
      .head().getLong(0) == n1)
    // and retained plans bind session lineage, never layout storage —
    // the vacuum-safety argument for serving them
    assert(!cat.sql(s"SELECT * FROM rte VERSION AS OF $e1").inputFiles
      .exists(_.contains("catalog_")))
    // an instant before every retained stamp fails fast (the law a
    // vacuumed lakehouse version shares)
    intercept[NoSuchElementException] {
      countAt("2020-01-01 00:00:00+00:00")
    }
    // TRIM the history: >maxHistory gestures later, e1 is unrecoverable
    // — resolution must fail fast, never guess
    (1 to 130).foreach(i => assert(s.setCell(0L, "o_orderpriority", s"P$i")))
    intercept[NoSuchElementException] {
      cat.sql(s"SELECT count(*) AS n FROM rte VERSION AS OF $e1").head()
    }
    intercept[NoSuchElementException] {
      countAt("2027-01-15 00:00:00+00:00")
    }
  }

  test("VERSION AS OF an unpinned epoch fails fast") {
    val cat = new Catalog(spark)
    cat.open("ttu", s"$sf/region.parquet", orderCols = Seq("r_regionkey"))
    val e = intercept[NoSuchElementException] {
      cat.sql("SELECT * FROM ttu VERSION AS OF 12345")
    }
    assert(e.getMessage.contains("no pinned snapshot"))
  }

  test("VERSION AS OF a non-session relation falls through to Spark's own handling") {
    val cat = new Catalog(spark)
    cat.open("ttn", s"$sf/region.parquet", orderCols = Seq("r_regionkey"))
    intercept[Exception] {
      cat.sql("SELECT * FROM some_delta_table VERSION AS OF 3")
    }
    // the window cleaned up; normal SQL still works
    assert(cat.sql("SELECT count(*) AS n FROM ttn").head().getLong(0) == 5L)
  }
}
