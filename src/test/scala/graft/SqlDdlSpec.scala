package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Catalog, Positional}

/** SQL DDL surface (r12 verdict task #2): CREATE TABLE AS SELECT /
  * ALTER TABLE ADD|DROP|RENAME COLUMN / DROP TABLE against the session
  * namespace route through the typed lifecycle and schema gestures —
  * completing the SQL-only lifecycle. Laws pinned here:
  *  - CTAS opens a session over the ROUTED query result (a layout-served
  *    source routes) and the new name serves SQL immediately;
  *  - ADD COLUMN delta-handles layouts that don't reference the new
  *    column (no rebuild — the zero-position CellEdits law from the
  *    typed gesture, now reachable from SQL);
  *  - DROP/RENAME COLUMN and DROP TABLE behave like their typed twins;
  *  - non-session names fall through to Spark's ordinary path.
  */
class SqlDdlSpec extends SparkSpec {

  private def strip(df: DataFrame): DataFrame = Positional.strip(df)

  test("CTAS opens a session over the routed query result; OR REPLACE and IF NOT EXISTS behave") {
    val cat = new Catalog(spark)
    cat.open("csrc", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    cat.buildRangedLayout("csrc", "o_totalprice", files = 8)
    val rep = cat.sql(
      """CREATE TABLE chigh AS
        |SELECT o_orderkey, o_totalprice FROM csrc
        |WHERE o_totalprice BETWEEN 100000.0 AND 200000.0""".stripMargin)
    assert(rep.head().getString(0) == "create_table")
    // the CTAS binds LIVE source plans, never layout storage: the new
    // session is long-lived, and a routed plan would pin layout files a
    // later rebuild + vacuum may collect (r13 review finding #7)
    assert(!cat.get("chigh").get.current.inputFiles
      .exists(_.contains("catalog_")),
      "a CTAS session must not reference layout storage")
    // the new session serves SQL, matches the live computation
    val n = cat.sql("SELECT count(*) AS n FROM chigh").head().getLong(0)
    val want = graft.core.Tables.load(spark, sf, "orders")
      .filter(col("o_totalprice").between(100000.0, 200000.0)).count()
    assert(n == want && n > 0)
    // and is a full session: DML applies
    assert(cat.sql("DELETE FROM chigh WHERE o_orderkey % 2 = 0")
      .head().getLong(1) > 0)
    assert(cat.sql("SELECT count(*) AS n FROM chigh").head().getLong(0) < n)
    // a second CREATE of the same name rejects...
    intercept[Exception] {
      cat.sql("CREATE TABLE chigh AS SELECT 1 AS one")
    }
    // ...IF NOT EXISTS skips without touching the session...
    val skip = cat.sql(
      "CREATE TABLE IF NOT EXISTS chigh AS SELECT 1 AS one")
    assert(skip.head().getString(0) == "create_table_skipped")
    assert(cat.sql("SELECT count(*) AS n FROM chigh").head().getLong(0) > 1)
    // ...and OR REPLACE rebinds it
    val rep2 = cat.sql(
      "CREATE OR REPLACE TABLE chigh AS SELECT 1 AS one UNION ALL SELECT 2")
    assert(rep2.head().getString(0) == "create_or_replace_table")
    assert(cat.sql("SELECT count(*) AS n FROM chigh").head().getLong(0) == 2)
  }

  test("ADD COLUMN delta-handles layouts not referencing the column: no rebuild (r12 task #2 pin)") {
    val cat = new Catalog(spark)
    cat.open("ac", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    cat.buildCubeLayout("ac", Seq("o_orderstatus"), Seq("o_totalprice"))
    def cube = cat.layoutsOf("ac").collectFirst {
      case (_, c: Catalog.CubeLayout) => c
    }.get
    val builtPath = cube.path
    val s = cat.get("ac").get
    val epoch0 = s.epoch

    cat.sql("ALTER TABLE ac ADD COLUMN flag STRING DEFAULT 'new'")
    assert(s.epoch != epoch0, "ADD COLUMN is a gesture")
    // the cube references o_orderstatus/o_totalprice only: the refresh
    // must revalidate it in place — same storage path, no re-aggregation
    assert(cat.refreshStale("ac") == Seq("cube:o_orderstatus"))
    assert(cube.path == builtPath,
      "a column add must not rebuild a layout that never references it")
    // the refreshed cube serves, and the new column reads its default
    val routed = cat.aggregate("ac", Seq("o_orderstatus"),
      Seq("o_totalprice"))
    assert(routed.count() > 0)
    assert(cat.recentRoutes.exists(r =>
      r.slot == "cube:o_orderstatus" && r.decision == "layout"))
    val vals = cat.sql(
      "SELECT DISTINCT flag FROM ac").collect().map(_.getString(0)).toSeq
    assert(vals == Seq("new"))
    // position forms: FIRST and AFTER place the column; a bare INT takes
    // the typed default 0
    cat.sql("ALTER TABLE ac ADD COLUMN bonus INT FIRST")
    assert(strip(s.current).columns.head == "bonus")
    cat.sql("ALTER TABLE ac ADD COLUMN note STRING AFTER o_orderkey")
    val cols = strip(s.current).columns.toSeq
    assert(cols(cols.indexOf("o_orderkey") + 1) == "note")
    assert(cat.sql("SELECT max(bonus) AS m FROM ac").head().getInt(0) == 0)
    // duplicate add rejects
    intercept[Exception] {
      cat.sql("ALTER TABLE ac ADD COLUMN flag STRING")
    }
  }

  test("r13 review regressions: typed defaults coerce, multi-add is atomic, resolution is case-insensitive, PARTITIONED BY rejects") {
    val cat = new Catalog(spark)
    cat.open("rg", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    val s = cat.get("rg").get
    // a DEFAULT whose literal type differs from the declared column type
    // coerces through the projection cast (finding #2)
    cat.sql("ALTER TABLE rg ADD COLUMN price2 DECIMAL(10,2) DEFAULT 0")
    cat.sql("ALTER TABLE rg ADD COLUMN since TIMESTAMP DEFAULT '2020-01-02 03:04:05'")
    val r = cat.sql("SELECT price2, since FROM rg LIMIT 1").head()
    assert(r.getDecimal(0).compareTo(new java.math.BigDecimal("0.00")) == 0)
    assert(r.getTimestamp(1).toString.startsWith("2020-01-02"))
    // multi-column ADD failing on a later column rolls the earlier one
    // back (finding #6 — the DML atomicity bracket covers ALTER)
    val pre = strip(s.current).columns.toSeq
    intercept[Exception] {
      cat.sql("ALTER TABLE rg ADD COLUMNS (brandnew INT, price2 STRING)")
    }
    assert(strip(s.current).columns.toSeq == pre,
      "a failed multi-add must leave no column behind")
    // case-insensitive resolution, like INSERT lists (finding #8)
    cat.sql("ALTER TABLE rg ADD COLUMN y INT AFTER O_ORDERKEY")
    assert(strip(s.current).columns.toSeq
      .indexOf("y") == strip(s.current).columns.toSeq.indexOf("o_orderkey") + 1)
    intercept[Exception] { // duplicate check sees through case too
      cat.sql("ALTER TABLE rg ADD COLUMN PRICE2 INT")
    }
    cat.sql("ALTER TABLE rg DROP COLUMN O_ORDERPRIORITY")
    assert(!strip(s.current).columns.contains("o_orderpriority"))
    // a non-identity PARTITIONED BY transform is a clear rejection, not
    // a regex crash (finding #9's sibling); identity transforms write a
    // real hive layout (r14 — see the partitioned-CTAS test)
    intercept[Exception] {
      cat.sql("CREATE TABLE pt PARTITIONED BY (bucket(4, o_orderkey)) " +
        "AS SELECT * FROM rg")
    }
    assert(!cat.names.contains("pt"))
  }

  test("PARTITIONED BY CTAS writes a hive layout; downstream reads prune to the named partition (r13 verdict task #7)") {
    val cat = new Catalog(spark)
    cat.openFrom("pdocs", graft.core.Tables.load(spark, sf, "documents")
      .select("doc_id", "lang", "n_chars"), Seq("doc_id"))
    val rep = cat.sql(
      "CREATE TABLE pt PARTITIONED BY (lang) AS SELECT * FROM pdocs")
    assert(rep.head().getString(0) == "create_table_partitioned")
    // the session serves SQL like any CTAS session (partition columns
    // move to the tail of the schema, hive-style)
    val n = cat.sql("SELECT count(*) AS n FROM pt WHERE lang = 'zh'")
      .head().getLong(0)
    val want = graft.core.Tables.load(spark, sf, "documents")
      .filter(col("lang") === "zh").count()
    assert(n == want && n > 0)
    // the written layout is the real deliverable: a downstream reader's
    // partition filter prunes to the lang=zh directory at PLAN time
    // (inputFiles lists the unpruned relation, so the pin is the scan's
    // own files-read metric vs the directory census)
    val dir = cat.sourcePathOf("pt").get
    val all = spark.read.parquet(dir).inputFiles
    val pruned = spark.read.parquet(dir).filter(col("lang") === "zh")
    val scan = pruned.queryExecution.executedPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }.head
    assert(pruned.collect().length == want) // executes THIS plan instance
    val readFiles = scan.metrics("numFiles").value
    val zhFiles = all.count(_.contains("lang=zh")).toLong
    assert(readFiles == zhFiles && readFiles < all.length,
      s"the partition filter must read only the lang=zh directory: " +
        s"read $readFiles of ${all.length} files ($zhFiles in lang=zh)")
    // a PARTITIONED BY column missing from the output is a clear error
    intercept[Exception] {
      cat.sql("CREATE TABLE pt2 PARTITIONED BY (nope) AS SELECT * FROM pdocs")
    }
    assert(!cat.names.contains("pt2"))
    // the read-back pins the QUERY schema (r14 review #1): digit-like
    // string partition values must stay distinct strings, never be
    // inference-retyped to INT (which would merge '01' and '1'), and the
    // column order must stay the query's, not partition-last
    // the partition column deliberately FIRST in the query: Spark's
    // read-back appends partition columns last even under a pinned
    // schema, so the engine must re-select the query order (r14 review,
    // 2nd pass — empirically verified against this Spark)
    cat.sql(
      """CREATE TABLE ptyp PARTITIONED BY (k) AS
        |SELECT CASE WHEN doc_id % 2 = 0 THEN '01' ELSE '1' END AS k,
        |  doc_id
        |FROM pdocs""".stripMargin)
    val st = strip(cat.get("ptyp").get.current)
    assert(st.columns.toSeq == Seq("k", "doc_id"),
      s"the session must keep the QUERY's column order: ${st.columns.toSeq}")
    assert(st.schema("k").dataType ==
      org.apache.spark.sql.types.StringType)
    val n01 = cat.sql("SELECT count(*) AS n FROM ptyp WHERE k = '01'")
      .head().getLong(0)
    val n1 = cat.sql("SELECT count(*) AS n FROM ptyp WHERE k = '1'")
      .head().getLong(0)
    assert(n01 > 0 && n1 > 0 && n01 + n1 == st.count(),
      s"'01' and '1' must stay distinct partitions: $n01 / $n1")
    // case-insensitive PARTITIONED BY resolution, like every other DDL
    cat.sql("CREATE TABLE ptc PARTITIONED BY (LANG) AS SELECT * FROM pdocs")
    assert(cat.names.contains("ptc"))
  }

  test("REFRESH MATERIALIZED VIEW / REFRESH TABLE delta-patch from SQL text (r14)") {
    val cat = new Catalog(spark)
    cat.open("rfs", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    cat.sql(
      """CREATE MATERIALIZED VIEW rfm AS
        |SELECT o_orderstatus, count(*) AS n FROM rfs
        |GROUP BY o_orderstatus""".stripMargin)
    def cube = cat.layoutsOf("rfs").collectFirst {
      case (_, c: Catalog.CubeLayout) => c
    }.get
    val builtPath = cube.path
    cat.sql("INSERT INTO rfs SELECT o_orderkey + 7000000, o_custkey, " +
      "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority " +
      "FROM rfs WHERE o_orderkey % 300 = 5")
    // the SQL refresh patches (same storage path — delta, not rebuild)
    assert(cat.sql("REFRESH MATERIALIZED VIEW rfm").head().getLong(1) >= 1)
    assert(cube.path == builtPath, "bounded DML must delta-patch")
    val read = cat.sql("SELECT * FROM rfm ORDER BY o_orderstatus")
    assert(read.queryExecution.executedPlan.toString
      .contains("catalog_cube_"))
    val want = Positional.strip(cat.get("rfs").get.current)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus").collect().map(_.toSeq).toSeq
    assert(read.collect().map(_.toSeq).toSeq == want)
    // the per-table twin — CASE-INSENSITIVE like every other DDL name
    // resolution (a mismatched case must never fall through to Spark's
    // own REFRESH TABLE, which silently no-ops on the window temp view)
    cat.sql("INSERT INTO rfs SELECT o_orderkey + 8000000, o_custkey, " +
      "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority " +
      "FROM rfs WHERE o_orderkey % 300 = 6")
    val tRep = cat.sql("REFRESH TABLE RFS").head()
    assert(tRep.getString(0) == "refresh_table" && tRep.getLong(1) >= 1)
    assert(cat.explainRoute("rfs", cube.groupCols.mkString("cube:", ",", ""))
      .reason == "routed")
    // unknown mv fails fast; a non-session REFRESH TABLE falls through
    intercept[Exception] { cat.sql("REFRESH MATERIALIZED VIEW nope") }
    intercept[Exception] { cat.sql("REFRESH TABLE not_a_session") }
  }

  test("SHOW SNAPSHOTS / SHOW MATERIALIZED VIEWS / DESCRIBE HISTORY: the operator's read side (r14)") {
    val cat = new Catalog(spark)
    cat.open("inf", s"$sf/region.parquet", orderCols = Seq("r_regionkey"))
    val s = cat.get("inf").get
    assert(cat.sql("SHOW SNAPSHOTS inf").collect().isEmpty)
    val e0 = cat.sql("CREATE SNAPSHOT inf").head().getLong(1)
    cat.sql("DELETE FROM inf WHERE r_regionkey = 0")
    val snaps = cat.sql("SHOW SNAPSHOTS FOR inf").collect()
    assert(snaps.map(_.getLong(0)).toSeq == Seq(e0))
    assert(snaps.head.getTimestamp(1) != null)
    // history lists every addressable epoch with its state — exactly
    // what TIMESTAMP AS OF can reach
    val hist = cat.sql("DESCRIBE HISTORY inf").collect()
    val byEpoch = hist.map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byEpoch(e0) == "pinned")
    assert(byEpoch(s.epoch) == "current")
    assert(hist.forall(_.getTimestamp(1) != null))
    cat.sql("CREATE MATERIALIZED VIEW infmv AS SELECT count(*) AS n FROM inf")
    val mvRows = cat.sql("SHOW MATERIALIZED VIEWS").collect()
    assert(mvRows.exists(r => r.getString(0) == "infmv" &&
      r.getString(1).toLowerCase.contains("from inf")))
    cat.sql("DROP MATERIALIZED VIEW infmv")
    assert(!cat.sql("SHOW MATERIALIZED VIEWS").collect()
      .exists(_.getString(0) == "infmv"))
    // unknown names fail fast; Spark's own SHOW/DESCRIBE fall through
    intercept[Exception] { cat.sql("DESCRIBE HISTORY nope") }
    assert(cat.sql("SHOW TABLES").columns.nonEmpty)
    assert(cat.sql("DESCRIBE inf").collect().nonEmpty)
  }

  test("OPTIMIZE accepts extensionless parquet dirs; non-parquet refuses up front (r14 review, 2nd pass)") {
    val cat = new Catalog(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_opt_").toString
    val flat = s"$root/flat" // df.write.parquet's standard shape: no
                             // suffix on the dir, only on the part files
    spark.read.parquet(s"$sf/region.parquet").repartition(4)
      .write.parquet(flat)
    val rep = cat.sql(s"OPTIMIZE '$flat'")
    assert(rep.head().getString(0) == "optimize")
    assert(spark.read.parquet(flat).count() == 5)
    val csv = s"$root/c"
    spark.read.parquet(s"$sf/region.parquet").write.csv(csv)
    val ex = intercept[Exception] { cat.sql(s"OPTIMIZE '$csv'") }
    assert(ex.getMessage.contains("parquet"))
  }

  test("the MV registry rolls forward from a crash-interrupted persist (r14 review #3)") {
    val wh = java.nio.file.Files.createTempDirectory("graft_mvrf_").toString
    val cat = new Catalog(spark, Some(wh))
    cat.open("rfsrc", s"$sf/region.parquet", orderCols = Seq("r_regionkey"))
    cat.sql("CREATE MATERIALIZED VIEW rfv AS SELECT count(*) AS n FROM rfsrc")
    // simulate a writer killed inside stagedWrite's delete→rename window:
    // _mvs is gone, the COMPLETE _mvs_tmp is still there
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$wh/_mvs"),
      new org.apache.hadoop.fs.Path(s"$wh/_mvs_tmp")))
    val cat2 = new Catalog(spark, Some(wh))
    cat2.open("rfsrc", s"$sf/region.parquet", orderCols = Seq("r_regionkey"))
    assert(cat2.sql("SELECT * FROM rfv").head().getLong(0) == 5L,
      "the registry must roll the committed tmp forward, not erase it")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$wh/_mvs")),
      "the roll-forward completes the interrupted rename")
  }

  test("r13 review regression: RENAME/DROP of a layout's column retires the layout; refresh never wedges (finding #1)") {
    val cat = new Catalog(spark)
    cat.open("rl", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    cat.buildCubeLayout("rl", Seq("l_returnflag"), Seq("l_quantity"))
    cat.buildPairsLayout("rl", Seq("l_returnflag"), "l_partkey")
    // rename the cube's measure: the cube is orphaned (its definition
    // names a column that no longer exists) and must retire; the pairs
    // layout never references l_quantity and must survive + refresh
    cat.sql("ALTER TABLE rl RENAME COLUMN l_quantity TO qty")
    assert(!cat.layoutsOf("rl").exists(_._1 == "cube:l_returnflag"),
      "a layout whose definition names the renamed column must retire")
    assert(cat.layoutsOf("rl")
      .exists(_._1 == "pairs:l_returnflag:l_partkey"))
    // the refresh loop is NOT wedged — this used to throw forever
    assert(cat.refreshStale("rl") == Seq("pairs:l_returnflag:l_partkey"))
    val served = cat.distinctCount("rl", Seq("l_returnflag"), "l_partkey")
    assert(served.count() > 0)
    // DROP retires referencing layouts the same way
    cat.sql("ALTER TABLE rl DROP COLUMN l_partkey")
    assert(!cat.layoutsOf("rl")
      .exists(_._1 == "pairs:l_returnflag:l_partkey"))
    assert(cat.refreshStale("rl").isEmpty)
  }

  test("r13 review regressions: MV over a join registers live; a dangling mv never poisons the window") {
    val cat = new Catalog(spark)
    cat.open("j1", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    cat.open("j2", s"$sf/customer.parquet", orderCols = Seq("c_custkey"))
    // aggregate over a JOIN: inference declines (no single target), the
    // view still registers and serves live (finding #3)
    cat.sql(
      """CREATE MATERIALIZED VIEW jmv AS
        |SELECT c_mktsegment, count(*) AS n
        |FROM j1 JOIN j2 ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)
    val got = cat.sql("SELECT * FROM jmv ORDER BY c_mktsegment")
      .collect().map(_.toSeq).toSeq
    val want = graft.core.Tables.load(spark, sf, "orders")
      .join(graft.core.Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment").collect().map(_.toSeq).toSeq
    assert(got == want)
    // CTAS cannot shadow an mv name (finding #5)
    intercept[Exception] { cat.sql("CREATE TABLE jmv AS SELECT 1 AS x") }
    // an mv with a ROLLUP body infers the cube (the synthetic grouping
    // id is dropped from the grouping) and its reads route through the
    // grouping-sets rewrite — the MV and multi-set stories compose
    cat.sql(
      """CREATE MATERIALIZED VIEW rmv AS
        |SELECT o_orderstatus, count(*) AS n
        |FROM j1 GROUP BY ROLLUP (o_orderstatus)""".stripMargin)
    assert(cat.layoutsOf("j1").exists(_._1 == "cube:o_orderstatus"),
      "a ROLLUP mv body must infer and build the cube")
    val rRead = cat.sql("SELECT * FROM rmv ORDER BY o_orderstatus")
    val rp = rRead.queryExecution.executedPlan.toString
    assert(rp.contains("catalog_cube_") && !rp.contains("o_orderkey"),
      s"the ROLLUP mv read must re-merge stored partials; plan:\n$rp")
    assert(rRead.collect().map(_.toSeq).toSeq ==
      graft.core.Tables.load(spark, sf, "orders")
        .rollup("o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first)
        .collect().map(_.toSeq).toSeq)
    cat.sql("DROP MATERIALIZED VIEW rmv")
    // drop the mv's source: statements that merely MENTION the word jmv
    // still run (finding #4); actually reading it is a clean not-found
    cat.sql("DROP TABLE j1")
    assert(cat.sql("SELECT 'jmv mention' AS jmv_label, count(*) AS n FROM j2")
      .head().getLong(1) > 0)
    intercept[Exception] { cat.sql("SELECT * FROM jmv") }
    // and the window is clean afterwards: session views were dropped
    // (a leak would leave j2 resolvable on the RAW SparkSession)
    intercept[Exception] { spark.sql("SELECT * FROM j2") }
  }

  test("DROP COLUMN and RENAME COLUMN route through the typed gestures") {
    val cat = new Catalog(spark)
    cat.open("dc", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    val s = cat.get("dc").get
    cat.sql("ALTER TABLE dc DROP COLUMN o_orderpriority")
    assert(!strip(s.current).columns.contains("o_orderpriority"))
    // IF EXISTS tolerates the already-gone column; bare drop rejects
    cat.sql("ALTER TABLE dc DROP COLUMN IF EXISTS o_orderpriority")
    intercept[Exception] {
      cat.sql("ALTER TABLE dc DROP COLUMN o_orderpriority")
    }
    cat.sql("ALTER TABLE dc RENAME COLUMN o_totalprice TO price")
    val cols = strip(s.current).columns.toSeq
    assert(cols.contains("price") && !cols.contains("o_totalprice"))
    // the renamed column is queryable and carries the same values
    val tot = cat.sql(
      """SELECT CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS t
        |FROM dc""".stripMargin).head().getDouble(0)
    val want = graft.core.Tables.load(spark, sf, "orders")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
      .head().getDouble(0)
    assert(math.abs(tot - want) < 1e-6)
    // rename onto an existing name rejects
    intercept[Exception] {
      cat.sql("ALTER TABLE dc RENAME COLUMN price TO o_orderstatus")
    }
  }

  test("CREATE MATERIALIZED VIEW infers+builds layouts; DML delta-patches; the view serves updated (r12 task #8)") {
    val cat = new Catalog(spark)
    cat.open("mvs", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    val rep = cat.sql(
      """CREATE MATERIALIZED VIEW omv AS
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice, 6) AS DECIMAL(38,6)))
        |    AS DOUBLE) AS tot,
        |  count(DISTINCT o_custkey) AS cd
        |FROM mvs GROUP BY o_orderstatus""".stripMargin)
    assert(rep.head().getString(0) == "create_materialized_view")
    // the inference built BOTH layouts
    assert(cat.layoutsOf("mvs").exists(_._1 == "cube:o_orderstatus"))
    assert(cat.layoutsOf("mvs")
      .exists(_._1 == "pairs:o_orderstatus:o_custkey"))
    def cubePath = cat.layoutsOf("mvs").collectFirst {
      case (_, c: Catalog.CubeLayout) => c
    }.get.path
    val builtPath = cubePath
    // reading the mv routes through the mixed cube ⋈ pairs rewrite —
    // never the fact table
    val read = cat.sql("SELECT * FROM omv ORDER BY o_orderstatus")
    val p = read.queryExecution.executedPlan.toString
    assert(p.contains("catalog_cube_") && p.contains("catalog_pairs_"),
      s"the mv read must serve from its layouts; plan:\n$p")
    assert(!p.contains("o_orderkey"),
      s"the mv read must never scan the fact table; plan:\n$p")
    def live = {
      val s = cat.get("mvs").get
      Positional.strip(s.current).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice"), 6).cast("decimal(38,6)"))
            .cast("double").as("tot"),
          count_distinct(col("o_custkey")).as("cd"))
        .orderBy("o_orderstatus").collect().map(_.toSeq).toSeq
    }
    assert(read.collect().map(_.toSeq).toSeq == live)
    // DML: the stale layouts step aside (mv serves live, still correct)
    cat.sql(
      """INSERT INTO mvs
        |SELECT o_orderkey + 9000000, o_custkey, o_orderstatus,
        |  o_totalprice, o_orderdate, o_orderpriority
        |FROM mvs WHERE o_orderkey % 200 = 7""".stripMargin)
    val stale = cat.sql("SELECT * FROM omv ORDER BY o_orderstatus")
    assert(stale.collect().map(_.toSeq).toSeq == live,
      "a stale mv must serve the live (post-DML) answer, never stale cells")
    // refresh DELTA-PATCHES both layouts (same storage path), and the
    // mv read routes again, serving the post-DML answer
    assert(cat.refreshStale("mvs").toSet ==
      Set("cube:o_orderstatus", "pairs:o_orderstatus:o_custkey"))
    assert(cubePath == builtPath,
      "the mv's cube must delta-patch after bounded DML, not rebuild")
    val read2 = cat.sql("SELECT * FROM omv ORDER BY o_orderstatus")
    val p2 = read2.queryExecution.executedPlan.toString
    assert(p2.contains("catalog_cube_") && !p2.contains("o_orderkey"),
      s"the refreshed mv must route again; plan:\n$p2")
    assert(read2.collect().map(_.toSeq).toSeq == live)
    // DROP MATERIALIZED VIEW unregisters; the name stops resolving
    assert(cat.sql("DROP MATERIALIZED VIEW omv").head().getString(0) ==
      "drop_materialized_view")
    intercept[Exception] { cat.sql("SELECT * FROM omv") }
    assert(cat.sql("DROP MATERIALIZED VIEW IF EXISTS omv")
      .head().getString(0) == "drop_materialized_view_skipped")
  }

  test("a FILTERED mv body infers the extended cube, serves routed, and delta-patches under DML (r13 verdict task #8)") {
    val cat = new Catalog(spark)
    cat.open("fmv", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    cat.sql(
      """CREATE MATERIALIZED VIEW fm AS
        |SELECT o_orderpriority, count(*) AS n
        |FROM fmv WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority""".stripMargin)
    // the filter column joined the built grouping
    assert(cat.layoutsOf("fmv")
      .exists(_._1 == "cube:o_orderpriority,o_orderstatus"),
      s"inference must fold the WHERE column into the cube: " +
        s"${cat.layoutsOf("fmv").map(_._1)}")
    def read = cat.sql("SELECT * FROM fm ORDER BY o_orderpriority")
    val p = read.queryExecution.executedPlan.toString
    assert(p.contains("catalog_cube_") && !p.contains("o_orderkey"),
      s"the filtered mv must serve from stored partials; plan:\n$p")
    def live = {
      val s = cat.get("fmv").get
      Positional.strip(s.current).filter(col("o_orderstatus") === "F")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority").collect().map(_.toSeq).toSeq
    }
    assert(read.collect().map(_.toSeq).toSeq == live)
    // DML + refresh: the extended cube delta-patches and serves updated
    cat.sql("DELETE FROM fmv WHERE o_orderkey % 50 = 3")
    assert(cat.refreshStale("fmv").nonEmpty)
    val read2 = read
    assert(read2.queryExecution.executedPlan.toString
      .contains("catalog_cube_"))
    assert(read2.collect().map(_.toSeq).toSeq == live)
  }

  test("a JOIN mv body infers the fact cube keyed by the join key; serves via eager aggregation; DML delta-patches (r14)") {
    val cat = new Catalog(spark)
    cat.open("jfact", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    cat.open("jdim", s"$sf/supplier.parquet", orderCols = Seq("s_suppkey"))
    cat.sql(
      """CREATE MATERIALIZED VIEW jm AS
        |SELECT s_name, count(*) AS n,
        |  CAST(sum(CAST(round(l_quantity, 6) AS DECIMAL(38,6)))
        |    AS DOUBLE) AS qty
        |FROM jfact JOIN jdim ON l_suppkey = s_suppkey
        |GROUP BY s_name""".stripMargin)
    // the fact owns the measure → a cube keyed by the fact join key
    assert(cat.layoutsOf("jfact").exists(_._1 == "cube:l_suppkey"),
      s"join inference must key the fact cube by the join key: " +
        s"${cat.layoutsOf("jfact").map(_._1)}")
    def read = cat.sql("SELECT * FROM jm ORDER BY s_name")
    val p = read.queryExecution.executedPlan.toString
    assert(p.contains("catalog_cube_") && !p.contains("l_orderkey"),
      s"the join mv must serve via eager aggregation on the cube — the " +
        s"fact table never rescans; plan:\n$p")
    def live = {
      val f = Positional.strip(cat.get("jfact").get.current)
      val d = Positional.strip(cat.get("jdim").get.current)
      f.join(d, col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_quantity"), 6).cast("decimal(38,6)"))
            .cast("double").as("qty"))
        .orderBy("s_name").collect().map(_.toSeq).toSeq
    }
    assert(read.collect().map(_.toSeq).toSeq == live)
    // fact DML + refresh: the cube delta-patches, the view serves updated
    cat.sql(
      """INSERT INTO jfact
        |SELECT l_orderkey + 9000000, l_partkey, l_suppkey,
        |  l_linenumber, l_quantity + 1, l_extendedprice, l_discount,
        |  l_tax, l_returnflag, l_linestatus, l_shipdate
        |FROM jfact WHERE l_orderkey % 200 = 9""".stripMargin)
    assert(cat.refreshStale("jfact").nonEmpty)
    val read2 = read
    assert(read2.queryExecution.executedPlan.toString
      .contains("catalog_cube_"),
      "the refreshed cube must keep serving the join mv")
    assert(read2.collect().map(_.toSeq).toSeq == live)

    // a STAR body (two dims) infers a cube keyed by BOTH join keys
    cat.open("jdim2", s"$sf/part.parquet", orderCols = Seq("p_partkey"))
    cat.sql(
      """CREATE MATERIALIZED VIEW jm2 AS
        |SELECT s_name, p_brand,
        |  CAST(sum(CAST(round(l_extendedprice, 6) AS DECIMAL(38,6)))
        |    AS DOUBLE) AS rev
        |FROM jfact
        |JOIN jdim ON l_suppkey = s_suppkey
        |JOIN jdim2 ON l_partkey = p_partkey
        |GROUP BY s_name, p_brand""".stripMargin)
    assert(cat.layoutsOf("jfact")
      .exists(_._1 == "cube:l_suppkey,l_partkey"),
      s"star inference must key the cube by both join keys: " +
        s"${cat.layoutsOf("jfact").map(_._1)}")
    val star = cat.sql("SELECT * FROM jm2 ORDER BY s_name, p_brand")
    assert(star.queryExecution.executedPlan.toString
      .contains("catalog_cube_"),
      "the star mv must serve from the fact cube")
  }

  test("a single-table mv body still infers its cube when the session's own plan holds an internal join (r14 join-mv review finding #1)") {
    val cat = new Catalog(spark)
    cat.open("ijmv", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    val s = cat.get("ijmv").get
    // push the edit log past literalEditMax so the session plan folds
    // through a broadcast JOIN — the join-body dispatch must not divert
    // this single-table body off the single-target inference
    assert(s.setCells("o_totalprice",
      (0L until 40L).map(p => p -> "1000.5")))
    cat.sql(
      """CREATE MATERIALIZED VIEW ijm AS
        |SELECT o_orderstatus, count(*) AS n
        |FROM ijmv GROUP BY o_orderstatus""".stripMargin)
    assert(cat.layoutsOf("ijmv").exists(_._1 == "cube:o_orderstatus"),
      s"the single-table inference must still build: " +
        s"${cat.layoutsOf("ijmv").map(_._1)}")
    val read = cat.sql("SELECT * FROM ijm ORDER BY o_orderstatus")
    assert(read.queryExecution.executedPlan.toString
      .contains("catalog_cube_"),
      "the mv must serve routed despite the session's internal join")
    assert(read.collect().map(_.toSeq).toSeq ==
      Positional.strip(s.current).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n")).orderBy("o_orderstatus")
        .collect().map(_.toSeq).toSeq)
  }

  test("DROP TABLE closes the session; IF EXISTS is a no-op on unknown names") {
    val cat = new Catalog(spark)
    cat.open("dt", s"$sf/region.parquet", orderCols = Seq("r_regionkey"))
    assert(cat.names.contains("dt"))
    val rep = cat.sql("DROP TABLE dt")
    assert(rep.head().getString(0) == "drop_table")
    assert(!cat.names.contains("dt"))
    // the view is gone too: the name no longer resolves
    intercept[Exception] { cat.sql("SELECT * FROM dt") }
    // IF EXISTS of an unknown single-part name: session-namespace no-op
    val skip = cat.sql("DROP TABLE IF EXISTS never_opened")
    assert(skip.head().getString(0) == "drop_table_skipped")
    // bare DROP of an unknown name falls through to Spark's own error
    intercept[Exception] { cat.sql("DROP TABLE never_opened") }
  }

  test("CREATE TABLE (schema) / TRUNCATE / RENAME TO: the SQL-only lifecycle from nothing (r13)") {
    val cat = new Catalog(spark)
    assert(cat.sql("CREATE TABLE fresh (k INT, v STRING)")
      .head().getString(0) == "create_table")
    assert(cat.names.contains("fresh"))
    assert(cat.sql("SELECT count(*) AS n FROM fresh").head().getLong(0) == 0)
    assert(cat.sql("INSERT INTO fresh VALUES (1, 'a'), (2, 'b')")
      .head().getLong(1) == 2)
    // IF NOT EXISTS skips; a bare duplicate rejects
    assert(cat.sql("CREATE TABLE IF NOT EXISTS fresh (x INT)")
      .head().getString(0) == "create_table_skipped")
    intercept[Exception] { cat.sql("CREATE TABLE fresh (x INT)") }
    // RENAME TO re-keys the session; the old name stops resolving
    assert(cat.sql("ALTER TABLE fresh RENAME TO fresher")
      .head().getString(1) == "fresher")
    assert(!cat.names.contains("fresh") && cat.names.contains("fresher"))
    assert(cat.sql("SELECT count(*) AS n FROM fresher")
      .head().getLong(0) == 2)
    intercept[Exception] { cat.sql("SELECT * FROM fresh") }
    // TRUNCATE empties, schema survives, INSERT works again
    assert(cat.sql("TRUNCATE TABLE fresher").head().getLong(1) == 2)
    assert(cat.sql("SELECT count(*) AS n FROM fresher")
      .head().getLong(0) == 0)
    assert(cat.sql("INSERT INTO fresher VALUES (3, 'c')")
      .head().getLong(1) == 1)
    assert(cat.sql("SELECT k, v FROM fresher").head().toSeq == Seq(3, "c"))
  }

  test("RENAME TO carries live layouts; pinned sessions refuse (r13)") {
    val cat = new Catalog(spark)
    cat.open("rt", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    cat.buildCubeLayout("rt", Seq("o_orderstatus"), Seq("o_totalprice"))
    cat.sql("ALTER TABLE rt RENAME TO rt2")
    // the layout followed the rename with zero IO and still serves
    assert(cat.explainRoute("rt2", "cube:o_orderstatus").reason == "routed")
    val routed = cat.aggregate("rt2", Seq("o_orderstatus"),
      Seq("o_totalprice"))
    assert(routed.count() > 0)
    assert(cat.recentRoutes.last.decision == "layout")
    // the SQL cube rewrite serves the NEW name too
    val sqlRouted = cat.sql(
      """SELECT o_orderstatus, count(*) AS n FROM rt2
        |GROUP BY o_orderstatus""".stripMargin)
    assert(sqlRouted.queryExecution.executedPlan.toString
      .contains("catalog_cube_"))
    // a pinned session refuses the rename (pins are name-keyed)
    cat.pin("rt2")
    intercept[Exception] { cat.sql("ALTER TABLE rt2 RENAME TO rt3") }
    assert(cat.names.contains("rt2"))
  }

  test("the MV registry is durable: a fresh catalog over the warehouse serves the view ROUTED; a fenced writer's mv DDL fails fast (r13 verdict task #1)") {
    val wh = java.nio.file.Files.createTempDirectory("graft_mvwh_").toString
    val cat = new Catalog(spark, Some(wh))
    cat.open("msrc", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    cat.sql(
      """CREATE MATERIALIZED VIEW dmv AS
        |SELECT o_orderstatus, count(*) AS n
        |FROM msrc GROUP BY o_orderstatus""".stripMargin)
    val want = cat.sql("SELECT * FROM dmv ORDER BY o_orderstatus")
      .collect().map(_.toSeq).toSeq
    // a FRESH catalog over the warehouse = reopen after process death:
    // the registry restores with the manifest, the cube re-attaches
    // through the digest gate, and the mv read serves ROUTED — no
    // orphaned storage, no broken dashboards
    val cat2 = new Catalog(spark, Some(wh))
    cat2.open("msrc", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    val read = cat2.sql("SELECT * FROM dmv ORDER BY o_orderstatus")
    val p = read.queryExecution.executedPlan.toString
    assert(p.contains("catalog_cube_") && !p.contains("o_orderkey"),
      s"the reopened mv must serve from its re-attached cube; plan:\n$p")
    assert(read.collect().map(_.toSeq).toSeq == want)
    // cat2's reads took the writer role when it persisted nothing — but
    // its mv CREATE is a registry write: it takes the token, and the
    // SUPERSEDED cat's next mv DDL must fail fast, leaving no
    // half-registered view behind
    cat2.sql(
      "CREATE MATERIALIZED VIEW dmv2 AS SELECT count(*) AS n FROM msrc")
    val ex = intercept[IllegalStateException] {
      cat.sql(
        "CREATE MATERIALIZED VIEW dmv3 AS SELECT count(*) AS n FROM msrc")
    }
    assert(ex.getMessage.contains("fenced"))
    intercept[Exception] { cat.sql("SELECT * FROM dmv3") }
    // DROP is durable too: a third catalog never sees the dropped view
    cat2.sql("DROP MATERIALIZED VIEW dmv")
    val cat3 = new Catalog(spark, Some(wh))
    cat3.open("msrc", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    intercept[Exception] { cat3.sql("SELECT * FROM dmv") }
    assert(cat3.sql("SELECT * FROM dmv2").head().getLong(0) > 0,
      "the surviving view must still serve from the reopened registry")
  }

  test("CTAS with a time-travel source composes like INSERT: the new session holds the pinned rows (r14 ADVICE #2)") {
    val cat = new Catalog(spark)
    cat.open("tt", s"$sf/region.parquet", orderCols = Seq("r_regionkey"))
    val pin = cat.pin("tt")
    val before = cat.sql("SELECT count(*) AS n FROM tt").head().getLong(0)
    cat.sql("DELETE FROM tt WHERE r_regionkey >= 0")
    assert(cat.sql("SELECT count(*) AS n FROM tt").head().getLong(0) == 0)
    cat.sql(
      s"CREATE TABLE tt_rescue AS SELECT * FROM tt VERSION AS OF $pin")
    assert(cat.sql("SELECT count(*) AS n FROM tt_rescue")
      .head().getLong(0) == before,
      "the CTAS source must resolve onto the pinned snapshot")
  }

  test("RENAME TO refuses while a materialized view references the session (r14 ADVICE #3)") {
    val cat = new Catalog(spark)
    cat.open("rmv", s"$sf/region.parquet", orderCols = Seq("r_regionkey"))
    cat.sql(
      "CREATE MATERIALIZED VIEW rr AS SELECT count(*) AS n FROM rmv")
    val ex = intercept[Exception] {
      cat.sql("ALTER TABLE rmv RENAME TO rmv2")
    }
    assert(ex.getMessage.contains("materialized view"))
    assert(cat.names.contains("rmv"), "a refused rename must not re-key")
    // dropping the dependent view unblocks the rename
    cat.sql("DROP MATERIALIZED VIEW rr")
    cat.sql("ALTER TABLE rmv RENAME TO rmv2")
    assert(cat.names.contains("rmv2"))
  }

  test("DDL on non-session (multipart) names falls through to Spark's ordinary path") {
    val cat = new Catalog(spark)
    cat.open("ft", s"$sf/region.parquet", orderCols = Seq("r_regionkey"))
    // a multipart CTAS is Spark's business (default catalog): it either
    // succeeds as a real table or raises Spark's own error — either way
    // the session namespace is untouched
    try {
      cat.sql("CREATE TABLE spark_catalog.default.ddl_ft AS " +
        "SELECT 1 AS one")
      assert(spark.catalog.tableExists("spark_catalog.default.ddl_ft"))
      spark.sql("DROP TABLE spark_catalog.default.ddl_ft")
    } catch { case _: Exception => () /* no metastore in this config */ }
    assert(cat.names == Seq("ft"))
  }
}
