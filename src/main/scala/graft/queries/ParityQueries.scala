package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{EditorSession, Positional, Tables}
import graft.ops._

/** Parity query surface: one runnable query per SURVEY.md §2 operator row,
  * paired with DuckDB oracle SQL over the same parquet tables.
  *
  * Determinism rules (the driver hash-compares values):
  *  - every money aggregate goes through `decimal(18,2)` so the sum is exact
  *    and engine-order-independent, then casts to double for a stable final
  *    representation;
  *  - every result carries an ORDER BY over a total order;
  *  - doubles are never rendered to strings (engines format differently);
  *  - column aliases match the oracle exactly.
  */
object ParityQueries {

  /** s_nested_roundtrip's scratch parquet (struct/array/map/decimal38/
    * timestamp columns derived from nation), memoized per sfDir — built
    * once per JVM, the PipelineQueries ANN-layout discipline.
    */
  private val nestedScratch =
    scala.collection.concurrent.TrieMap[String, String]()

  private def li(s: SparkSession, dir: String) = Tables.load(s, dir, "lineitem")

  /** lineitem with deterministic dense positions. NOT the TPC-H PK: the
    * synthetic testdata contains duplicate (l_orderkey, l_linenumber)
    * pairs (~20% of rows at every SF), so that pair alone is a TIE, and
    * tied positions are assigned arbitrarily per engine — a latent
    * cross-engine flake wherever a dup pair straddles an observable
    * boundary (caught live in w_running_sum at sf0.1). l_extendedprice
    * completes a verified-unique total order at all three SFs.
    */
  private val liOrderCols = Seq("l_orderkey", "l_linenumber", "l_extendedprice")

  private def liPos(s: SparkSession, dir: String) =
    Positional.attachPos(li(s, dir), liOrderCols.map(col): _*)

  private val liPosSql =
    "SELECT *, row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_extendedprice) - 1 AS __pos FROM lineitem"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A-ops -----------------------------------------------------------------
    "q1_agg" -> ((s, dir) =>
      li(s, dir).groupBy("l_returnflag")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    /** q1 through the typed Dataset surface: case-class rows + a custom
      * Aggregator (exact micro-unit integer state) — same partial+final
      * plan as the untyped aggregate, compile-time-checked business logic.
      */
    "q1_typed" -> ((s, dir) =>
      graft.core.Typed.pricingSummary(s, dir)
        .toDF("l_returnflag", "summary")
        .select(col("l_returnflag"), col("summary.n").as("n"),
          round(col("summary.sum_qty"), 2).as("sum_qty"),
          round(col("summary.sum_price"), 2).as("sum_price"))
        .orderBy("l_returnflag")),

    "a1_pivot" -> ((s, dir) =>
      PivotOps.pivotTable(
          li(s, dir).withColumn("l_extendedprice",
            col("l_extendedprice").cast("decimal(18,2)")),
          "l_returnflag", "l_linestatus", "l_extendedprice", "sum",
          pivotValues = Seq("F", "O"))
        .select(col("l_returnflag"),
          col("F").cast("double").as("F"), col("O").cast("double").as("O"))
        .orderBy("l_returnflag")),

    "a2_selection_stats" -> ((s, dir) =>
      PivotOps.selectionStats(li(s, dir), "l_orderkey", "l_linenumber")),

    // S-ops -----------------------------------------------------------------
    "s1_scan" -> ((s, dir) =>
      li(s, dir).select("l_orderkey", "l_linenumber", "l_quantity")
        .filter(col("l_quantity") > 45)
        .orderBy("l_orderkey", "l_linenumber")),

    // P-ops -----------------------------------------------------------------
    "p1_drop_column" -> ((s, dir) =>
      SchemaOps.dropColumnAt(Tables.load(s, dir, "region"), 1)
        .orderBy("r_regionkey")),

    "p2_add_column" -> ((s, dir) =>
      SchemaOps.insertColumnAt(Tables.load(s, dir, "nation"), 1, "flag",
          org.apache.spark.sql.types.BooleanType)
        .orderBy("n_nationkey")),

    "p3_numeric_projection" -> ((s, dir) =>
      SchemaOps.numericProjection(li(s, dir))
        .orderBy("l_orderkey", "l_linenumber")),

    // R-ops (positional DML through the EditorSession surface) --------------
    "r1_cell_edit" -> ((s, dir) => {
      val sess = EditorSession.fromDataFrame(li(s, dir), liOrderCols)
      require(sess.setCell(5L, "l_quantity", "999"), "edit rejected")
      require(!sess.setCell(6L, "l_quantity", "not-a-number"),
        "bad cast must be rejected")
      sess.current.select("__pos", "l_orderkey", "l_linenumber", "l_quantity")
        .filter(col("__pos") < 20).orderBy("__pos")
    }),

    "r4_row_delete" -> ((s, dir) => {
      val sess = EditorSession.fromDataFrame(li(s, dir), liOrderCols)
      sess.deleteRows(Seq(3L, 4L))
      sess.current.select("__pos", "l_orderkey", "l_linenumber")
        .filter(col("__pos") < 20).orderBy("__pos")
    }),

    "r6_cut_paste" -> ((s, dir) => {
      val sess = EditorSession.fromDataFrame(li(s, dir), liOrderCols)
      sess.cut(Seq(10L, 11L, 12L))
      require(sess.paste(0L), "paste with clipboard must succeed")
      sess.current.select("__pos", "l_orderkey", "l_linenumber")
        .filter(col("__pos") < 20).orderBy("__pos")
    }),

    // F-ops -----------------------------------------------------------------
    "f1_render_string" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          col("o_orderkey").cast("string").as("key_str"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("date_str"),
          coalesce(col("o_orderpriority"), lit("")).as("prio_str"))
        .orderBy("o_orderkey")),

    // V-ops -----------------------------------------------------------------
    "v3_histogram" -> ((s, dir) =>
      StatsOps.histogramFixed(li(s, dir), "l_extendedprice", 0.0, 120000.0, 12)
        .orderBy("bucket")),

    /** V1 at scale: line series pre-bucketed to chart resolution — avg per
      * 1000-row position bucket instead of collecting raw rows.
      */
    "v1_line_bucketed" -> ((s, dir) =>
      liPos(s, dir)
        .groupBy(expr("__pos div 1000").as("bucket"))
        .agg((sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          / count(lit(1))).as("avg_qty"), count(lit(1)).as("n"))
        .orderBy("bucket")),

    /** V2: scatter source — first two numeric columns. */
    "v2_scatter" -> ((s, dir) =>
      StatsOps.scatterSource(li(s, dir))
        .orderBy("l_orderkey", "l_partkey")),

    /** P4: positional page serve [100, 120). */
    "p4_page" -> ((s, dir) =>
      graft.core.Positional.page(liPos(s, dir), 100L, 120L)
        .select("__pos", "l_orderkey", "l_linenumber", "l_quantity")),

    /** S2/S6 full round-trip: write CSV, re-read with schema inference,
      * project a type-mixed slice. Oracle is the identity — the round trip
      * must be lossless for these columns.
      */
    "s2_csv_roundtrip" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("vrfy_csv_").toString + "/orders.csv"
      graft.io.Formats.write(Tables.load(s, dir, "orders"), out)
      graft.io.Formats.read(s, out)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("date_str"))
        .orderBy("o_orderkey")
    }),

    /** Gzip-compressed CSV round-trip — the interchange format logs and
      * legacy exports actually arrive in. Write path sets the codec;
      * read path needs no branch (Hadoop's codec registry decompresses
      * `.gz` transparently). Gzip is not splittable — one stream per
      * file — which is exactly why [[graft.io.Formats.write]] emits one
      * compressed part per task rather than one giant file.
      */
    "s_csv_gz_roundtrip" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("vrfy_csvgz_")
        .toString + "/orders.csv.gz"
      graft.io.Formats.write(Tables.load(s, dir, "orders"), out)
      graft.io.Formats.read(s, out)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("date_str"))
        .orderBy("o_orderkey")
    }),

    /** S3/S7 round-trip via the dependency-free xlsx codec. */
    "s37_xlsx_roundtrip" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("vrfy_xlsx_").toString + "/nation.xlsx"
      graft.io.Formats.write(Tables.load(s, dir, "nation"), out)
      graft.io.Formats.read(s, out).orderBy("n_nationkey")
    }),

    /** S4/S8 round-trip via JSON-lines. */
    "s48_json_roundtrip" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("vrfy_json_").toString + "/customer.json"
      graft.io.Formats.write(Tables.load(s, dir, "customer"), out)
      graft.io.Formats.read(s, out)
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    /** S4/S8 interchange with the reference's own save-as-JSON output:
      * pandas columns-orient `{"col":{"row":v}}` (`main.py:83-84`), written
      * and re-read through the [[graft.io.PandasJson]] shim (auto-detected
      * by `Formats.read`'s sniff). Oracle is the identity.
      */
    "s48_json_pandas_orient" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("vrfy_pjson_").toString + "/supplier.json"
      graft.io.PandasJson.write(
        Tables.load(s, dir, "supplier").orderBy("s_suppkey"), out)
      graft.io.Formats.read(s, out)
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .orderBy("s_suppkey")
    }),

    /** Nested-type round-trip (SURVEY §1.2's "whatever Parquet supports"
      * claim, proven): nation grows a struct, an array-of-struct, a map,
      * a decimal(38,10) and a derived timestamp, writes to a scratch
      * parquet ONCE per JVM (memoized), reads back through the engine's
      * own dispatch, then — through EditorSession — edits one struct LEAF
      * via [[graft.core.EditorSession.setNestedField]] (withField: the
      * sibling field must survive untouched). The output flattens every
      * nested value back to primitives so the DuckDB oracle can recompute
      * them from the base table; equality certifies both the storage
      * round-trip and the nested edit. The decimal(38,10) renders as
      * VARCHAR on both sides (the o_table_digest discipline — wide
      * decimals can't survive a float64 bridge).
      */
    "s_nested_roundtrip" -> ((s, dir) => {
      val path = nestedScratch.getOrElseUpdate(dir, {
        val p = java.nio.file.Files.createTempDirectory("vrfy_nested_")
          .toString + "/nested.parquet"
        Tables.load(s, dir, "nation").select(
            col("n_nationkey"),
            struct(col("n_name").as("name"),
              col("n_regionkey").as("region")).as("st"),
            array(
              struct(lit("rk").as("k"), col("n_regionkey").cast("long").as("v")),
              struct(lit("nk").as("k"), col("n_nationkey").cast("long").as("v")))
              .as("arr"),
            map(col("n_name"), col("n_regionkey").cast("long")).as("m"),
            // +1 keeps the integer part nonzero (BigDecimal renders a
            // scale-10 zero as "0E-10", DuckDB as "0.0000000000");
            // ×0.25 exercises a real fractional part, exactly
            (col("n_nationkey").cast("decimal(20,0)") * lit(1000000000L) +
              col("n_regionkey") + lit(1) +
              col("n_regionkey") * lit(new java.math.BigDecimal("0.25")))
              .cast("decimal(38,10)").as("dec"),
            timestamp_micros(lit(1700000000000000L) +
              col("n_nationkey").cast("long") * 86400000000L).as("ts"))
          .coalesce(1).write.parquet(p)
        p
      })
      val sess = EditorSession.open(s, path, orderCols = Seq("n_nationkey"))
      // nested leaf edit: nation 0's struct name -> "EDITED" (region
      // sibling must survive); bad leaf cast must reject
      require(sess.setNestedField(0L, "st", "name", "EDITED"))
      require(!sess.setNestedField(0L, "st", "region", "not-an-int"))
      sess.current.select(
          col("n_nationkey"),
          col("st.name").as("st_name"),
          col("st.region").as("st_region"),
          element_at(col("arr"), 2).getField("v").as("arr_nk"),
          element_at(map_values(col("m")), 1).as("m_region"),
          col("dec").cast("string").as("dec_str"),
          col("ts"))
        .orderBy("n_nationkey")
    }),

    /** A1 extension: exact quantiles per group. Computed via
      * [[graft.operators.RankStats.exactPercentiles]] (counts-of-counts
      * crossing walk) rather than Spark's `percentile()` aggregate, whose
      * final merge holds a distinct-value-sized value→count map on one
      * task — prices are a continuous domain, so that map grows with the
      * data. Same bit-exact interpolated answers.
      */
    "a4_percentile" -> ((s, dir) =>
      graft.operators.RankStats.exactPercentiles(li(s, dir),
          col("l_extendedprice"), Seq("l_returnflag"),
          Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75))
        .select(col("l_returnflag"), round(col("p25"), 4).as("p25"),
          round(col("p50"), 4).as("p50"), round(col("p75"), 4).as("p75"))
        .orderBy("l_returnflag")),

    // The HLL + t-digest sketch surface (approx_count_distinct /
    // percentile_approx) is intentionally NOT registered: sketch
    // internals differ across engines by design, so the gate would
    // record `no_oracle` every round. a5_sketches_md5 below reports the
    // same sketch *report* from deterministic md5-state sketches
    // (oracle-green); TwinVariantsSpec pins the built-in sketches'
    // accuracy against exact answers.

    /** a5's oracle-checkable twin (d_simhash_md5 pattern): the same sketch
      * *report* — distinct estimate + median estimate per group — from
      * sketches whose state is exactly determined by the data. Distinct via
      * md5-KMV (k=128: estimate = (k−1)/frac(kth smallest hash)); median
      * via a bottom-k-by-hash uniform row sample (k=101, keyed on the md5
      * of the row PK — order- and partitioning-independent, so the sampled
      * middle value is bit-reproducible on any cluster layout). Prices are
      * scaled to exact cents for the sample payload, so no float compare.
      */
    "a5_sketches_md5" -> ((s, dir) => {
      graft.functions.SampleAggregates.register(s)
      val lineitem = li(s, dir)
      val h = lineitem.select(col("l_returnflag"),
        conv(substring(md5(col("l_partkey").cast("string")), 1, 15), 16, 10)
          .cast("long").as("hv")).distinct()
      val kth = h.groupBy("l_returnflag")
        .agg(try_element_at(
          call_function(graft.functions.SampleAggregates.BOTTOMK_FN,
            lpad(col("hv").cast("string"), 19, "0"), col("hv"), lit(128)),
          lit(128)).as("hk"))
        .filter(col("hk").isNotNull)
        .select(col("l_returnflag"),
          round(lit(127.0) /
            (col("hk").cast("double") / 1152921504606846976.0), 4)
            .as("kmv_parts"))
      val med = lineitem.select(col("l_returnflag"),
        md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"))).as("sk"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
        .groupBy("l_returnflag")
        .agg(call_function(graft.functions.SampleAggregates.BOTTOMK_FN,
          col("sk"), col("cents"), lit(101)).as("arr"))
        .select(col("l_returnflag"),
          (expr("element_at(array_sort(arr), cast((size(arr) + 1) / 2 as int))")
            .cast("double") / 100.0).as("median_est"))
      kth.join(med, Seq("l_returnflag")).orderBy("l_returnflag")
    }),

    /** A1 extension: rollup (grouping-sets family). */
    "a3_rollup" -> ((s, dir) =>
      li(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),
  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag,
        |  cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // micro-unit mirror of the typed Aggregator: round() half-away equals
    // Java math.round for positive inputs, BIGINT sums are exact, the
    // /1e6 division is one IEEE op on both engines
    "q1_typed" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(CAST(sum(CAST(round(l_quantity * 1000000.0) AS BIGINT))
        |    AS DOUBLE) / 1000000.0, 2) AS sum_qty,
        |  round(CAST(sum(CAST(round(l_extendedprice * 1000000.0) AS BIGINT))
        |    AS DOUBLE) / 1000000.0, 2) AS sum_price
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "a1_pivot" ->
      """SELECT l_returnflag,
        |  cast(sum(CASE WHEN l_linestatus = 'F' THEN cast(l_extendedprice as decimal(18,2)) END) as double) AS F,
        |  cast(sum(CASE WHEN l_linestatus = 'O' THEN cast(l_extendedprice as decimal(18,2)) END) as double) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a2_selection_stats" ->
      """SELECT count(*) AS n_cells,
        |  count(DISTINCT l_orderkey) AS n_rows,
        |  count(DISTINCT l_linenumber) AS n_cols
        |FROM lineitem""".stripMargin,

    "s1_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "p1_drop_column" ->
      "SELECT r_regionkey FROM region ORDER BY r_regionkey",

    "p2_add_column" ->
      """SELECT n_nationkey, false AS flag, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "p3_numeric_projection" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |  l_extendedprice, l_discount, l_tax
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "r1_cell_edit" ->
      s"""WITH t AS ($liPosSql)
         |SELECT __pos, l_orderkey, l_linenumber,
         |  CASE WHEN __pos = 5 THEN cast(999 as double) ELSE l_quantity END AS l_quantity
         |FROM t WHERE __pos < 20 ORDER BY __pos""".stripMargin,

    "r4_row_delete" ->
      s"""WITH t AS ($liPosSql),
         |d AS (SELECT * FROM t WHERE __pos NOT IN (3, 4))
         |SELECT row_number() OVER (ORDER BY __pos) - 1 AS __pos,
         |  l_orderkey, l_linenumber
         |FROM d ORDER BY 1 LIMIT 20""".stripMargin,

    "r6_cut_paste" ->
      s"""WITH t AS ($liPosSql)
         |SELECT CASE WHEN __pos BETWEEN 10 AND 12 THEN __pos - 10
         |            WHEN __pos < 10 THEN __pos + 3
         |            ELSE __pos END AS __pos,
         |  l_orderkey, l_linenumber
         |FROM t WHERE (CASE WHEN __pos BETWEEN 10 AND 12 THEN __pos - 10
         |                   WHEN __pos < 10 THEN __pos + 3
         |                   ELSE __pos END) < 20
         |ORDER BY __pos""".stripMargin,

    "f1_render_string" ->
      """SELECT o_orderkey, cast(o_orderkey as varchar) AS key_str,
        |  strftime(o_orderdate, '%Y-%m-%d') AS date_str,
        |  coalesce(o_orderpriority, '') AS prio_str
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "v3_histogram" ->
      """SELECT least(cast(floor(l_extendedprice / 10000.0) as bigint), 11) AS bucket,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "v1_line_bucketed" ->
      s"""WITH t AS ($liPosSql)
         |SELECT __pos // 1000 AS bucket,
         |  cast(sum(cast(l_quantity as decimal(18,2))) as double) / count(*) AS avg_qty,
         |  count(*) AS n
         |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "v2_scatter" ->
      """SELECT l_orderkey, l_partkey FROM lineitem
        |ORDER BY l_orderkey, l_partkey""".stripMargin,

    "p4_page" ->
      s"""WITH t AS ($liPosSql)
         |SELECT __pos, l_orderkey, l_linenumber, l_quantity
         |FROM t WHERE __pos >= 100 AND __pos < 120 ORDER BY __pos""".stripMargin,

    "s2_csv_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS date_str
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // identity: the compressed round-trip must lose nothing
    "s_csv_gz_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS date_str
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "s48_json_roundtrip" ->
      """SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "s37_xlsx_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",

    // identity over the nested scratch: every flattened value recomputes
    // from nation; nation 0's struct name carries the setNestedField edit
    "s_nested_roundtrip" ->
      """SELECT n_nationkey,
        |  CASE WHEN n_nationkey = 0 THEN 'EDITED' ELSE n_name END
        |    AS st_name,
        |  n_regionkey AS st_region,
        |  CAST(n_nationkey AS BIGINT) AS arr_nk,
        |  CAST(n_regionkey AS BIGINT) AS m_region,
        |  CAST(CAST(CAST(n_nationkey AS BIGINT) * 1000000000
        |      + n_regionkey + 1 + n_regionkey * 0.25 AS DECIMAL(38,10))
        |    AS VARCHAR) AS dec_str,
        |  make_timestamp(1700000000000000
        |    + CAST(n_nationkey AS BIGINT) * 86400000000) AS ts
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "s48_json_pandas_orient" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    // the deterministic-sketch twin of a5: md5-KMV kth-smallest-hash
    // estimator + the middle value of a bottom-101-by-hash row sample.
    // row_number ... ORDER BY sk, cents mirrors BottomKSample's
    // (sortKey, payload) tuple order; the middle index (n+1)//2 matches
    // Spark's cast((size+1)/2 as int) truncation for odd and even n.
    "a5_sketches_md5" ->
      """WITH h AS (SELECT DISTINCT l_returnflag,
        |    ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS hv
        |  FROM lineitem),
        |r AS (SELECT l_returnflag, hv,
        |        row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn
        |      FROM h),
        |kth AS (SELECT l_returnflag,
        |    round(127.0 / (hv::DOUBLE / 1152921504606846976.0), 4) AS kmv_parts
        |  FROM r WHERE rn = 128),
        |s AS (SELECT l_returnflag,
        |    md5(CAST(l_orderkey AS VARCHAR) || '-'
        |        || CAST(l_linenumber AS VARCHAR)) AS sk,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem),
        |samp AS (SELECT l_returnflag, cents, row_number() OVER (
        |    PARTITION BY l_returnflag ORDER BY sk, cents) AS rn FROM s),
        |keep AS (SELECT l_returnflag, cents FROM samp WHERE rn <= 101),
        |cnt AS (SELECT l_returnflag, count(*) AS n FROM keep GROUP BY l_returnflag),
        |ord AS (SELECT l_returnflag, cents, row_number() OVER (
        |    PARTITION BY l_returnflag ORDER BY cents) AS cr FROM keep),
        |med AS (SELECT o.l_returnflag, CAST(o.cents AS DOUBLE) / 100.0 AS median_est
        |  FROM ord o JOIN cnt USING (l_returnflag) WHERE o.cr = (n + 1) // 2)
        |SELECT kth.l_returnflag, kth.kmv_parts, med.median_est
        |FROM kth JOIN med USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,

    "a4_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a3_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
  )
}
