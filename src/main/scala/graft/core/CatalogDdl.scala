package graft.core

import scala.util.Try
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.{FieldName, UnresolvedIdentifier, UnresolvedTable}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types.DataType

/** SQL DDL text surface (r12 verdict task #2): `CREATE TABLE ... AS
  * SELECT`, `ALTER TABLE ADD/DROP/RENAME COLUMN`, and `DROP TABLE`
  * against the SESSION namespace route through the existing typed
  * gestures — [[Catalog.openFrom]], [[EditorSession.insertColumnAt]],
  * [[EditorSession.dropColumnAt]], [[EditorSession.renameColumn]],
  * [[Catalog.close]] — completing the SQL lifecycle: after DML (r11)
  * and time travel (r11/r12), a SQL-only user could read, mutate, and
  * rewind a session but not create, evolve, or drop one.
  *
  * Namespace rule, same as DML: a SINGLE-PART table name inside
  * [[Catalog.sql]] belongs to the session namespace. CTAS with a
  * single-part name opens a session over the (routed) query result;
  * ALTER/DROP against a single-part OPEN session name applies the
  * gesture. Multipart names, and ALTER/DROP of names that are not open
  * sessions, fall through to Spark's ordinary path (real catalogs keep
  * working; unknown names raise Spark's own errors).
  *
  * Scale law: CTAS never materializes on the driver — [[Catalog
  * .openFrom]] binds the analyzed plan itself (position pinning is the
  * session's ordinary lazy machinery), and binds it to LIVE source
  * plans, never layout storage: the session outlives the vacuum grace
  * window that protects handed-out routed plans. Column add/rename log
  * a zero-position [[EditorSession]] CellEdits delta, so layouts not
  * referencing the touched column revalidate with ZERO IO on the next
  * refresh (pinned by SqlDdlSpec); column drop is structural, exactly
  * like the typed gesture; a layout whose DEFINITION names a dropped or
  * renamed column retires (its definition can never be satisfied again
  * — rebuilding it would wedge the refresh loop).
  */
trait CatalogDdl { self: Catalog =>

  /** Fast pre-screen: only texts that can possibly be DDL pay a parse. */
  private[core] def looksLikeDdl(query: String): Boolean = {
    val t = query.trim
    val head = t.takeWhile(!_.isWhitespace).toUpperCase(java.util.Locale.ROOT)
    head == "CREATE" || head == "ALTER" || head == "DROP" ||
      head == "TRUNCATE" || head == "VACUUM" || head == "OPTIMIZE" ||
      head == "REFRESH" || head == "SHOW" || head == "DESCRIBE"
  }

  // ---- informational SQL (r14) ----------------------------------------------
  // The incident-operator's read side of the lifecycle surface: which
  // version handles exist and what `TIMESTAMP AS OF` can actually reach.
  // Precise textual forms only — everything else (SHOW TABLES, DESCRIBE
  // <table>, …) falls through to Spark's own statements untouched.

  private val showSnaps = java.util.regex.Pattern.compile(
    "(?is)^\\s*show\\s+snapshots\\s+(?:for\\s+)?([A-Za-z_][\\w]*)\\s*;?\\s*$")
  private val showMvs = java.util.regex.Pattern.compile(
    "(?is)^\\s*show\\s+materialized\\s+views\\s*;?\\s*$")
  private val descHistory = java.util.regex.Pattern.compile(
    "(?is)^\\s*describe\\s+history\\s+([A-Za-z_][\\w]*)\\s*;?\\s*$")
  private val descChanges = java.util.regex.Pattern.compile(
    "(?is)^\\s*describe\\s+changes\\s+([A-Za-z_][\\w]*)\\s+" +
      "from\\s+(?:version\\s+(\\d+)|timestamp\\s+'([^']+)')" +
      "(?:\\s+to\\s+(?:version\\s+(\\d+)|timestamp\\s+'([^']+)'))?" +
      "\\s*;?\\s*$")

  private def infoFrame(schema: Seq[(String, DataType)],
                        rows: Seq[org.apache.spark.sql.Row]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType(schema.map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n, t, nullable = true) }))

  private def runInfo(query: String): Option[DataFrame] = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, TimestampType}
    def ts(micros: Long) = new java.sql.Timestamp(micros / 1000L)
    val ss = showSnaps.matcher(query)
    if (ss.matches()) {
      val name = canonSession(ss.group(1)).getOrElse(throw
        new NoSuchElementException(
          s"no open session named '${ss.group(1)}'"))
      val rows = pins.collect {
        case ((n, e), sn) if n == name =>
          Row(e, if (sn.pinnedAtMicros == Long.MinValue) null
                 else ts(sn.pinnedAtMicros))
      }.toSeq.sortBy(_.getLong(0))
      return Some(infoFrame(
        Seq("epoch" -> LongType, "pinned_at" -> TimestampType), rows))
    }
    if (showMvs.matcher(query).matches())
      return Some(infoFrame(
        Seq("name" -> StringType, "body" -> StringType),
        mvs.toSeq.map { case (n, b) => Row(n, b) }))
    val dh = descHistory.matcher(query)
    if (dh.matches()) {
      val name = canonSession(dh.group(1)).getOrElse(throw
        new NoSuchElementException(
          s"no open session named '${dh.group(1)}'"))
      val s = sessions(name)
      val pinnedSet = pinnedEpochs(name).toSet
      val retained = s.retainedHistory
      val rows = retained.map { case (e, st) =>
        Row(e, ts(st),
          if (e == s.epoch) "current"
          else if (pinnedSet.contains(e)) "pinned" else "retained")
      } ++ pins.collect {
        // a pin can outlive the undo history (or predate a restore):
        // still addressable, so still listed
        case ((n, e), sn)
            if n == name && !retained.exists(_._1 == e) =>
          Row(e, if (sn.pinnedAtMicros == Long.MinValue) null
                 else ts(sn.pinnedAtMicros), "pinned")
      }
      return Some(infoFrame(
        Seq("epoch" -> LongType, "stamped_at" -> TimestampType,
          "state" -> StringType),
        rows.sortBy(_.getLong(0))))
    }
    val dc = descChanges.matcher(query)
    if (dc.matches()) {
      // the CDC read — classified rows, not an info frame; serving path
      // (log-served vs content diff) chosen by [[CatalogSnapshots
      // .changes]]. Endpoints accept VERSION <n> or TIMESTAMP '<ts>'
      // (resolved against pins + retained epochs, the TIMESTAMP AS OF
      // law — session zone for zoneless literals).
      val name = canonSession(dc.group(1)).getOrElse(throw
        new NoSuchElementException(
          s"no open session named '${dc.group(1)}'"))
      // the SAME literal folding `TIMESTAMP AS OF` uses (session zone,
      // Catalyst cast) — one law, two surfaces (r14 review, 3rd pass)
      def tsEpoch(text: String): Long =
        resolvePinAt(name, tsOperandMicros(
          org.apache.spark.sql.catalyst.expressions.Literal(text))
          .getOrElse(throw new IllegalArgumentException(
            s"not a timestamp: '$text'")))
      val from = Option(dc.group(2)).map(_.toLong)
        .getOrElse(tsEpoch(dc.group(3)))
      val to = Option(dc.group(4)).map(_.toLong)
        .orElse(Option(dc.group(5)).map(tsEpoch))
        .getOrElse(-1L)
      return Some(changes(name, from, to))
    }
    None
  }

  // ---- REFRESH (r14): the last typed-only maintenance gesture ---------------
  // A SQL-only operator can CREATE a materialized view and mutate its
  // source, but the layout delta-patch that makes the view serve the
  // post-DML answer routed was reachable only through the typed
  // [[CatalogRefresh.refreshStale]]. `REFRESH MATERIALIZED VIEW <mv>`
  // refreshes every open session the view's body reads; `REFRESH TABLE
  // <session>` is the per-table twin (intercepted: Spark's own REFRESH
  // TABLE would no-op against the window's temp view). Both refuse
  // inside a transaction like every other maintenance statement.

  private val mvRefresh = java.util.regex.Pattern.compile(
    "(?is)^\\s*refresh\\s+materialized\\s+view\\s+([A-Za-z_][\\w]*)\\s*;?\\s*$")
  private val tblRefresh = java.util.regex.Pattern.compile(
    "(?is)^\\s*refresh\\s+table\\s+([A-Za-z_][\\w]*)\\s*;?\\s*$")

  /** The single-part table names a SQL body references (parsed, never
    * analyzed — subqueries included). Shared by the rename guard and
    * REFRESH; resolution against open sessions is the caller's job and
    * must be CASE-INSENSITIVE like Spark's own (r14 review, 2nd pass).
    */
  private[core] def sessionRefsOf(body: String): Seq[String] =
    Try(spark.sessionState.sqlParser.parsePlan(body)).toOption.toSeq
      .flatMap(_.collectWithSubqueries {
        case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
            if r.multipartIdentifier.size == 1 =>
          r.multipartIdentifier.head
      }).distinct

  /** `name` resolved against the open sessions, case-insensitively
    * (exact spelling preferred) — a case-mismatched REFRESH must never
    * fall through to Spark's own REFRESH TABLE, which would silently
    * no-op against the window's temp view.
    */
  private[core] def canonSession(name: String): Option[String] =
    sessions.keys.find(_ == name)
      .orElse(sessions.keys.find(_.equalsIgnoreCase(name)))

  private def runRefresh(query: String): Option[DataFrame] = {
    val mr = mvRefresh.matcher(query)
    if (mr.matches()) {
      requireNoTxn("REFRESH MATERIALIZED VIEW")
      val name = mvs.keys.find(_ == mr.group(1))
        .orElse(mvs.keys.find(_.equalsIgnoreCase(mr.group(1))))
        .getOrElse(throw new NoSuchElementException(
          s"no materialized view '${mr.group(1)}'"))
      val srcs = sessionRefsOf(mvs(name)).flatMap(canonSession).distinct
      return Some(report("refresh_materialized_view",
        srcs.flatMap(refreshStale).size.toLong))
    }
    val tr = tblRefresh.matcher(query)
    if (tr.matches()) {
      canonSession(tr.group(1)).foreach { n =>
        requireNoTxn("REFRESH TABLE")
        return Some(report("refresh_table", refreshStale(n).size.toLong))
      }
    }
    None
  }

  // ---- SQL maintenance statements (r13 verdict task #2) ---------------------
  // `VACUUM`, `OPTIMIZE`, and pin management close the last typed-only
  // lifecycle gestures: a SQL-only operator could create, mutate,
  // evolve, rewind, and recover a table, but not garbage-collect its
  // warehouse, compact its files, or take the pin that `TIMESTAMP AS OF`
  // resolves against. Spark's parser has none of these statements, so —
  // like MATERIALIZED VIEW — they are recognized textually before the
  // parse; anything that doesn't match falls through to the ordinary
  // path and its ordinary error.

  private val vacuumStmt = java.util.regex.Pattern.compile(
    "(?is)^\\s*vacuum(?:\\s+([A-Za-z_][\\w]*))?" +
      "(?:\\s+retain\\s+(\\d+)\\s+hours)?\\s*$")
  private val optimizeStmt = java.util.regex.Pattern.compile(
    "(?is)^\\s*optimize\\s+(?:([A-Za-z_][\\w]*)|'([^']+)')" +
      "(?:\\s+cluster\\s+by\\s*\\(([^)]*)\\))?\\s*$")
  private val snapCreate = java.util.regex.Pattern.compile(
    "(?is)^\\s*create\\s+snapshot\\s+([A-Za-z_][\\w]*)\\s*$")
  private val snapDrop = java.util.regex.Pattern.compile(
    "(?is)^\\s*drop\\s+snapshot\\s+([A-Za-z_][\\w]*)\\s+at\\s+(\\d+)\\s*$")

  /** Run `query` as a maintenance statement, or None when it is not one.
    *
    *  - `VACUUM [<session>] [RETAIN <n> HOURS]` → [[CatalogVacuum
    *    .vacuum]]. The pass is WAREHOUSE-scoped by design (the manifest
    *    diff is global — per-table scoping would just skip garbage); a
    *    named session is validated so a typo'd name errs instead of
    *    silently collecting. Returns (operation, paths deleted).
    *  - `OPTIMIZE <session>|'<path>' [CLUSTER BY (c, …)]` →
    *    [[graft.io.Compaction.compact]] of the session's SOURCE
    *    directory (recorded by [[Catalog.open]]) or an explicit path.
    *    Safe under the open session: [[Positional.attachPos]] pinned the
    *    base eagerly, so the session never re-reads the rewritten files;
    *    the compaction serves every FUTURE open. Returns (operation,
    *    files removed by the rewrite).
    *  - `CREATE SNAPSHOT <session>` → [[CatalogSnapshots.pin]]; returns
    *    the pinned epoch — the handle `VERSION AS OF` takes, and the
    *    durable resolution floor for `TIMESTAMP AS OF`.
    *  - `DROP SNAPSHOT <session> AT <epoch>` → [[CatalogSnapshots
    *    .unpin]]; fails fast on an unknown pin (a silent no-op would let
    *    an incident runbook believe a lease was released).
    */
  private def runMaintenance(query: String): Option[DataFrame] = {
    if (vacuumStmt.matcher(query).matches() ||
        optimizeStmt.matcher(query).matches() ||
        snapCreate.matcher(query).matches() ||
        snapDrop.matcher(query).matches())
      requireNoTxn("a maintenance statement")
    val vm = vacuumStmt.matcher(query)
    if (vm.matches()) {
      Option(vm.group(1)).foreach { n =>
        require(sessions.contains(n), s"no open session named '$n' — " +
          "VACUUM takes an open session name (the pass itself is " +
          "warehouse-scoped)")
      }
      val grace = Option(vm.group(2)).map(_.toLong * 3600000L)
        .getOrElse(Catalog.vacuumGraceMs)
      return Some(report("vacuum", vacuum(grace).size.toLong))
    }
    val om = optimizeStmt.matcher(query)
    if (om.matches()) {
      val path = Option(om.group(1)) match {
        case Some(n) =>
          require(sessions.contains(n), s"no open session named '$n'")
          sourcePaths.getOrElse(n, throw new IllegalArgumentException(
            s"session '$n' was not opened from a file path — OPTIMIZE " +
              "rewrites source files; pass a quoted path, or export the " +
              "session first (saveAs)"))
        case None => om.group(2)
      }
      val clusterBy = Option(om.group(3)).toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      // route by layout (r14 review finding #10): a hive-partitioned
      // directory (a PARTITIONED BY CTAS's storage) compacts PER
      // PARTITION — flattening it would destroy plan-time pruning for
      // every downstream reader; a flat parquet dataset compacts whole;
      // anything else (a csv/json-backed session) refuses up front with
      // the real reason instead of dying mid-rewrite on a footer error.
      val hp = new org.apache.hadoop.fs.Path(path)
      val hfs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(hfs.exists(hp), s"OPTIMIZE: no such path '$path'")
      val partitionedDir = hfs.getFileStatus(hp).isDirectory &&
        hfs.listStatus(hp).exists(st =>
          st.isDirectory && st.getPath.getName.contains("="))
      if (partitionedDir) {
        val stats = graft.io.Compaction.compactPartitioned(spark, path,
          clusterBy = clusterBy)
        return Some(report("optimize", stats.values
          .map(v => (v.filesBefore - v.filesAfter).toLong).sum))
      }
      // parquet-ness is detected from the CONTENT (part files), not the
      // directory name: df.write.parquet("/out") has no suffix on the
      // dir, only on the parts (r14 review, 2nd pass)
      val isParquet =
        path.toLowerCase(java.util.Locale.ROOT).endsWith(".parquet") ||
          (hfs.getFileStatus(hp).isDirectory && hfs.listStatus(hp).exists(
            st => st.isFile && st.getPath.getName.endsWith(".parquet")))
      require(isParquet,
        s"OPTIMIZE rewrites parquet storage; '$path' holds no parquet " +
          "data files — export the session first (saveAs/write) and " +
          "OPTIMIZE the exported path")
      val stats = graft.io.Compaction.compact(spark, path,
        clusterBy = clusterBy)
      return Some(report("optimize",
        (stats.filesBefore - stats.filesAfter).toLong))
    }
    val sc = snapCreate.matcher(query)
    if (sc.matches()) {
      val name = sc.group(1)
      require(sessions.contains(name), s"no open session named '$name'")
      return Some(report("create_snapshot", pin(name)))
    }
    val sd = snapDrop.matcher(query)
    if (sd.matches()) {
      val (name, epoch) = (sd.group(1), sd.group(2).toLong)
      require(unpin(name, epoch),
        s"no pinned snapshot of '$name' at epoch $epoch")
      return Some(report("drop_snapshot", epoch))
    }
    None
  }

  // ---- materialized views (r12 verdict task #8) ----------------------------
  // `CREATE MATERIALIZED VIEW mv AS SELECT g…, agg… FROM s GROUP BY g…`
  // does two things: (1) INFERS and builds the at-rest layouts that can
  // serve the body — a cube for the canonical-sum/count/min/max leaves,
  // a pairs layout per count(DISTINCT y) — and (2) registers `mv` as a
  // named view whose body text re-plans through the routed read path on
  // every [[Catalog.sql]] call that mentions it. Correctness never
  // depends on the inference: the body text is the contract, and a leaf
  // the layouts can't serve simply plans live ([[graft.plans
  // .SqlLayoutRouting]]'s refusal law). Maintenance is the ordinary
  // refresh law — DML delta-patches the cube/pairs, and the next read
  // of `mv` serves the patched layout (pinned by SqlDdlSpec).
  // Spark's parser has no MATERIALIZED VIEW syntax, so the statement is
  // recognized textually before the parse.

  private[core] val mvs =
    scala.collection.mutable.LinkedHashMap.empty[String, String]

  /** Cell cap for a FILTER-extended mv cube: past this many distinct
    * (group × filter) tuples a cube stops paying (it approaches the fact
    * table it exists to avoid scanning), so the inference falls back to
    * the un-extended grouping and the view serves live.
    */
  private val mvCubeCellCap = 1 << 20

  /** Persist the registry with the warehouse control plane (r13 verdict
    * task #1): CREATE/DROP MATERIALIZED VIEW are explicit operator
    * gestures, so — like [[CatalogVacuum.dropLayout]] — they TAKE the
    * writer token when this catalog holds none, and a SUPERSEDED
    * catalog's create/drop fails fast on the fence instead of clobbering
    * the new writer's registry. In-memory-only catalogs skip the write;
    * callers roll their map mutation back when this throws, so a fenced
    * gesture leaves no half-registered view behind.
    */
  private def persistMvs(): Unit = warehouse.foreach { wh =>
    fenceWriter(wh)
    LayoutStore.saveMvs(spark, wh,
      mvs.toSeq.map { case (n, b) => MvEntry(n, b) })
  }

  private val mvCreate = java.util.regex.Pattern.compile(
    "(?is)^\\s*create\\s+materialized\\s+view\\s+([A-Za-z_][\\w]*)\\s+as\\s+(.+)$")
  private val mvDrop = java.util.regex.Pattern.compile(
    "(?is)^\\s*drop\\s+materialized\\s+view\\s+(if\\s+exists\\s+)?([A-Za-z_][\\w]*)\\s*$")

  /** The registered materialized views this statement references —
    * their views must be materialized into the temp-view window before
    * the statement plans ([[Catalog.sql]] calls this).
    */
  private[core] def mvsReferenced(query: String): Seq[String] =
    // mv DDL/maintenance statements manage the registry; they never
    // READ the view — registering it would pay a routed analysis and
    // record misleading routes for a statement that ignores it
    if (mvCreate.matcher(query).matches() ||
        mvDrop.matcher(query).matches() ||
        mvRefresh.matcher(query).matches()) Nil
    else mvs.keys.filter(n => java.util.regex.Pattern
      .compile("(?i)\\b" + java.util.regex.Pattern.quote(n) + "\\b")
      .matcher(query).find()).toSeq

  /** Plan one registered mv body through the routed read path (must run
    * inside the view window).
    */
  private[core] def mvPlan(name: String): DataFrame =
    graft.plans.SqlRouting.withRoutes(spark, sqlRoutes()) {
      spark.sql(mvs(name))
    }

  private def runCreateMv(name: String, body: String): DataFrame = {
    requireNoTxn("CREATE MATERIALIZED VIEW")
    require(!sessions.contains(name) && !mvs.contains(name),
      s"name '$name' is already a session or materialized view")
    // infer the serving layouts from the ANALYZED body (we are inside
    // the view window, so session names resolve): the aggregate's
    // grouping columns + measure references become a cube, each
    // count(DISTINCT y) a pairs layout — built over the session the
    // aggregate directly reads. A body the inference doesn't recognize
    // (joins, no aggregate) still registers; it just serves live.
    val analyzed = graft.plans.SqlRouting.withRoutes(spark, sqlRoutes()) {
      spark.sql(body)
    }.queryExecution.analyzed
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
    // inference failures (joins, derived grouping, columns the session
    // doesn't own) must never fail the CREATE — the view still registers
    // and serves live; only the acceleration is skipped
    Try {
      analyzed.collectFirst { case a: Aggregate => a }.foreach { agg =>
        // the session the aggregate reads — exactly ONE (a join of two
        // sessions has no single table to build a layout over)
        val targets = agg.child.collect {
          case sa: SubqueryAlias if sessions.contains(sa.identifier.name) =>
            sa.identifier.name
        }.distinct
        // a WHERE between the aggregate and the session (r13 verdict
        // task #8): the routed read path serves a filtered aggregate
        // from a cube only when the predicate constrains CUBE GROUP
        // columns (constant within each group) — so the inference folds
        // the filter's referenced columns into the built grouping. The
        // cube then costs distinct(group × filter) cells instead of
        // distinct(group) — the same size law as any hand-built cube
        // over those columns, and the price the mv's own body states.
        val filterRefs = agg.child.collect {
          case f: Filter => f.condition.references.toSeq.map(_.name)
        }.flatten.distinct
        // a JOIN body (r14): the eager-aggregation rewrite
        // ([[graft.plans.SqlLayoutRouting]] tryJoinAgg) serves
        // aggregate-over-join from a cube on the FACT keyed by the fact
        // side of the equi-join — so the inference's job is to find the
        // fact (the one session owning every measure leaf) and build
        // that cube. Dim sides stay live (they are dim-sized reads).
        // The dispatch matches the AGGREGATE'S DIRECT CHILD only: a
        // Join buried inside a session's own lazy plan (edit-join past
        // literalEditMax, a CTAS-from-join session) must not divert a
        // plain single-table body off the single-target inference
        // (r14 join-mv review finding #1).
        // flatten the INNER-join spine with the router's own helper —
        // the inference must build exactly what tryJoinAgg will serve.
        // ANY direct-child Join body takes this branch: a join shape
        // the rewrite can't serve builds NOTHING (falling through to
        // the single-table inference would build layouts keyed as if
        // the body were single-table, which no read ever routes —
        // r14 star review finding #6)
        val directJoin = agg.child match {
          case jn: Join => Some(jn)
          case Filter(_, jn: Join) => Some(jn)
          case _ => None
        }
        (targets, directJoin) match {
          case (ts, Some(jn)) if ts.nonEmpty =>
            val (treeLeaves, treeJoins) =
              graft.plans.SqlRouting.flattenInnerJoins(jn)
            val leaves = agg.aggregateExpressions.flatMap(_.collect {
              case ae: AggregateExpression => ae
            })
            val attributed = leaves.filter(_.references.nonEmpty)
            // fact = the single session whose output carries EVERY
            // attributed measure leaf AND that is a LEAF of the join
            // tree (the shape tryJoinAgg matches — a fact behind a
            // subquery or filter would build a cube no read ever
            // serves); count(*)-only bodies are ambiguous — serve live
            val aliases = treeLeaves.collect {
              case sa: SubqueryAlias
                  if sessions.contains(sa.identifier.name) =>
                sa
            }
            val factAliases = aliases.filter(sa =>
              attributed.nonEmpty && attributed.forall(
                _.references.forall(sa.outputSet.contains)))
            val groupBare = agg.groupingExpressions
              .forall(_.isInstanceOf[AttributeReference])
            (factAliases, leaves.filter(_.isDistinct)) match {
              case (Seq(factSa), Seq()) if groupBare =>
                val t = factSa.identifier.name
                // mirror the router's PER-CONJUNCT decline: a
                // fact-referencing conjunct that is not a bare-attr
                // equi-link makes the whole read unservable, so skip
                // the build instead of paying for a cube the router
                // will always refuse (r14 star review finding #5)
                val perConjunct = treeJoins.flatMap(_.condition.toSeq)
                  .flatMap(graft.plans.SqlRouting.splitConjuncts).map { c =>
                    if (!c.references.exists(factSa.outputSet.contains))
                      Some(Seq.empty[String])
                    else c match {
                      case org.apache.spark.sql.catalyst.expressions
                          .EqualTo(at: AttributeReference, o)
                          if factSa.outputSet.contains(at) &&
                            !o.references.exists(
                              factSa.outputSet.contains) =>
                        Some(Seq(at.name))
                      case org.apache.spark.sql.catalyst.expressions
                          .EqualTo(o, at: AttributeReference)
                          if factSa.outputSet.contains(at) &&
                            !o.references.exists(
                              factSa.outputSet.contains) =>
                        Some(Seq(at.name))
                      case _ => None
                    }
                  }
                val factKeys =
                  if (perConjunct.exists(_.isEmpty)) Nil
                  else perConjunct.flatMap(_.get)
                val factGroup = agg.groupingExpressions.collect {
                  case at: AttributeReference
                      if factSa.outputSet.contains(at) => at.name
                }
                val factFilter = agg.child.collect {
                  case f: Filter => f.condition.references.toSeq.collect {
                    case at: AttributeReference
                        if factSa.outputSet.contains(at) => at.name
                  }
                }.flatten
                val measures = attributed
                  .flatMap(_.references.toSeq.map(_.name)).distinct
                val buildGroup =
                  (factKeys ++ factGroup ++ factFilter).distinct
                val schema =
                  Positional.strip(sessions(t).current).columns.toSet
                // a column can't be both a cube dimension and a stored
                // partial — a join key or grouping attr that doubles as
                // a measure makes the shape unservable, so skip the
                // build instead of paying for a layout no read uses;
                // same cell-cap guard as the filtered inference (a cube
                // keyed by the join key is dim-cardinality — the point;
                // a runaway grouping falls back to serving live)
                if (factKeys.nonEmpty &&
                    buildGroup.nonEmpty &&
                    !buildGroup.exists(measures.contains) &&
                    buildGroup.forall(schema.contains) &&
                    measures.forall(schema.contains) &&
                    Positional.strip(sessions(t).current)
                      .select(buildGroup.map(
                        org.apache.spark.sql.functions.col): _*)
                      .distinct()
                      .limit(mvCubeCellCap + 1).count() <= mvCubeCellCap)
                  buildCubeLayout(t, buildGroup, measures)
              case _ => ()
            }
          case (Seq(t), None) =>
            val schema = Positional.strip(sessions(t).current).columns.toSet
            // a GROUPING SETS / ROLLUP / CUBE body grouping-refs the
            // Expand-produced attrs plus the grouping id; the id is
            // synthetic and the set attrs carry their source column
            // NAMES, so dropping the id yields the buildable grouping —
            // the mv read then routes through the grouping-sets rewrite
            val groupAttrs = agg.groupingExpressions.collect {
              case at: AttributeReference => at.name
            }
            val groupCols =
              groupAttrs.filterNot(_ == "spark_grouping_id").distinct
            if (groupAttrs.size == agg.groupingExpressions.size &&
                groupCols.forall(schema.contains)) {
              val leaves = agg.aggregateExpressions.flatMap(_.collect {
                case ae: AggregateExpression => ae
              })
              val pairsCols = leaves.filter(_.isDistinct).flatMap {
                _.aggregateFunction match {
                  case c: Count => c.children.collect {
                    case at: AttributeReference
                        if !groupCols.contains(at.name) => at.name
                  }
                  case _ => Nil
                }
              }.distinct
              val measures = leaves.filterNot(_.isDistinct)
                .flatMap(_.references.toSeq.map(_.name))
                .filterNot(groupCols.contains).distinct
              // every inferred column must be the session's own — a
              // derived alias (substr(c,1,1) AS g) is not buildable.
              // Filter columns extend the built grouping only when they
              // are plain session columns NOT already serving as
              // measures (a column can't be both a cube dimension and a
              // stored partial); otherwise the un-extended layouts still
              // build and the mv serves live — the refusal law
              val filterOk = filterRefs.nonEmpty &&
                filterRefs.forall(c => schema.contains(c) &&
                  !measures.contains(c) && !pairsCols.contains(c))
              val extGroup = (groupCols ++ filterRefs).distinct
              // cardinality guard (r14 review finding #5): a filter on a
              // high-cardinality column (an id, a timestamp) would make
              // the extended cube fact-sized — one capped distinct-count
              // probe decides, and an oversized extension falls back to
              // the plain grouping (the mv then serves live, exactly the
              // pre-extension behavior). The probe is one column-pruned
              // pass, noise next to the cube build it gates.
              val boundedExt = filterOk && {
                import org.apache.spark.sql.functions.col
                Positional.strip(sessions(t).current)
                  .select(extGroup.map(col): _*).distinct()
                  .limit(mvCubeCellCap + 1).count() <= mvCubeCellCap
              }
              val buildGroup = if (boundedExt) extGroup else groupCols
              if ((measures ++ pairsCols).forall(schema.contains)) {
                if (measures.nonEmpty || leaves.exists(!_.isDistinct))
                  buildCubeLayout(t, buildGroup, measures)
                pairsCols.foreach(y => buildPairsLayout(t, buildGroup, y))
              }
            }
          case _ => ()
        }
      }
    }.getOrElse(())
    mvs(name) = body
    try persistMvs()
    catch { case e: Throwable => mvs.remove(name); throw e }
    ddlReport("create_materialized_view", name)
  }

  /** Run `query` as session DDL, or None when the parsed statement is
    * not DDL aimed at the session namespace. Must be called inside the
    * [[Catalog.sql]] view window — a CTAS source query resolves against
    * the session temp views and routes through their layouts.
    */
  private[core] def runDdl(query: String): Option[DataFrame] = {
    val mvc = mvCreate.matcher(query)
    if (mvc.matches()) return Some(runCreateMv(mvc.group(1), mvc.group(2)))
    val mvd = mvDrop.matcher(query)
    if (mvd.matches()) {
      requireNoTxn("DROP MATERIALIZED VIEW")
      val name = mvd.group(2)
      mvs.remove(name) match {
        case Some(body) =>
          try persistMvs()
          catch { case e: Throwable => mvs(name) = body; throw e }
          return Some(ddlReport("drop_materialized_view", name))
        case None =>
          if (mvd.group(1) != null)
            return Some(ddlReport("drop_materialized_view_skipped", name))
          throw new NoSuchElementException(s"no materialized view '$name'")
      }
    }
    runMaintenance(query).foreach(r => return Some(r))
    runRefresh(query).foreach(r => return Some(r))
    runInfo(query).foreach(r => return Some(r))
    val plan = Try(spark.sessionState.sqlParser.parsePlan(query))
      .getOrElse(return None)
    plan match {
      case c: CreateTableAsSelect =>
        singlePart(c.name).map(runCtas(query, _, c.query,
          partCols(c.partitioning), replace = false,
          ifNotExists = c.ignoreIfExists))
      case r: ReplaceTableAsSelect =>
        singlePart(r.name).map(runCtas(query, _, r.query,
          partCols(r.partitioning), replace = true,
          ifNotExists = false))
      // ALTER statements share the DML statement-atomicity bracket: a
      // multi-column ADD/DROP failing on a later column must not leave
      // the earlier ones applied (same law SqlDmlSpec pins for MERGE)
      case a: AddColumns =>
        sessionTarget(a.table).map(n => atomically(n)(runAddColumns(n, a)))
      case d: DropColumns =>
        sessionTarget(d.table).map(n => atomically(n)(runDropColumns(n, d)))
      case r: RenameColumn =>
        sessionTarget(r.table).map(n => atomically(n)(runRenameColumn(n, r)))
      case d: DropTable =>
        singlePart(d.child).filter(sessions.contains).map { name =>
          requireNoTxn("DROP TABLE")
          close(name)
          ddlReport("drop_table", name)
        }.orElse {
          // DROP TABLE IF EXISTS of an unknown single-part name is a
          // session-namespace no-op, not Spark's error
          singlePart(d.child).filter(_ => d.ifExists)
            .map(ddlReport("drop_table_skipped", _))
        }
      case c: CreateTable if plainCreate(c.tableSpec) =>
        // only the PURE `CREATE TABLE name (cols)` form belongs to the
        // session namespace: USING / LOCATION / EXTERNAL / OPTIONS /
        // TBLPROPERTIES describe real storage and fall through to Spark
        // (hijacking a LOCATION would silently serve an empty session
        // where the user's files hold data — r13 review finding #2)
        singlePart(c.name).map(runCreateEmpty(_, c))
      case t: TruncateTable =>
        sessionTarget(t.table).map(n => atomically(n)(runTruncate(n)))
      case r: RenameTable if !r.isView && r.newName.size == 1 =>
        tableOrViewTarget(r.child).map(runRenameTable(_, r.newName.head))
      case _ => None
    }
  }

  /** The storage-free CREATE TABLE form the session namespace owns. */
  private def plainCreate(spec: TableSpecBase): Boolean = spec match {
    case u: UnresolvedTableSpec =>
      u.provider.isEmpty && u.location.isEmpty && !u.external &&
        u.properties.isEmpty && u.serde.isEmpty
    case _ => false
  }

  /** An empty session from a bare `CREATE TABLE name (schema)` — the
    * SQL-only lifecycle's starting point (CREATE → INSERT → SELECT with
    * no pre-existing file). Every column is nullable: sessions enforce
    * types, not constraints.
    */
  private def runCreateEmpty(name: String, c: CreateTable): DataFrame = {
    requireNoTxn("CREATE TABLE")
    require(!mvs.contains(name),
      s"name '$name' is a materialized view — DROP MATERIALIZED VIEW first")
    require(!sessions.contains(name) || c.ignoreIfExists,
      s"session '$name' already exists (use IF NOT EXISTS)")
    if (sessions.contains(name) && c.ignoreIfExists)
      return ddlReport("create_table_skipped", name)
    require(c.partitioning.isEmpty,
      "CREATE TABLE ... PARTITIONED BY is not supported against a " +
        "session (sessions are unpartitioned)")
    require(c.columns.nonEmpty, "CREATE TABLE needs a column list")
    require(c.columns.forall(_.defaultValue.isEmpty),
      "CREATE TABLE column DEFAULTs are not supported against a session " +
        "— add the column via ALTER TABLE ADD COLUMN ... DEFAULT instead")
    val schema = org.apache.spark.sql.types.StructType(c.columns.map(cd =>
      org.apache.spark.sql.types.StructField(cd.name, cd.dataType,
        nullable = true)))
    openFrom(name, spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema))
    Positional.strip(sessions(name).current).createOrReplaceTempView(name)
    ddlReport("create_table", name)
  }

  /** `TRUNCATE TABLE`: a structural replace with the empty plan of the
    * same schema — layouts rebuild (to empty) on the next refresh,
    * exactly like any oversized delete.
    */
  private def runTruncate(name: String): DataFrame = {
    val s = sessions(name)
    val before = s.rowCount
    s.replace(s.current.limit(0))
    report("truncate", before)
  }

  /** `ALTER TABLE old RENAME TO new`: re-keys the session, its live
    * layouts, and (writer permitting) its manifest entries — the
    * layouts keep serving under the new name with zero IO. Refused
    * while the session has pinned epochs: pins (and their durable
    * leases) are keyed by name, and silently splitting a pin from its
    * session would break the time-travel contract.
    */
  private def runRenameTable(name: String, newName: String): DataFrame = {
    requireNoTxn("ALTER TABLE RENAME TO")
    require(!sessions.contains(newName) && !mvs.contains(newName),
      s"name '$newName' is already a session or materialized view")
    // a DORMANT session's manifest entries (another process's durable
    // state awaiting digest-gated re-attach) must not be clobbered —
    // CTAS/register deliberately keeps such entries, so rename refuses
    require(!manifest.keys.exists(_._1 == newName),
      s"name '$newName' has durable layout entries in this warehouse — " +
        "vacuum or dropLayout them first")
    require(pinnedEpochs(name).isEmpty,
      s"session '$name' has pinned epochs — unpin before renaming")
    // an mv whose body reads this session would silently stop analyzing
    // after the rename (its view skips, readers get a confusing
    // not-found for the OLD inner name) — refuse, like the pinned-epochs
    // guard: the dependency is user-visible state keyed by name. The
    // check is at TABLE-REFERENCE level (parsed relations, subqueries
    // included), not a word scan: a column or alias merely spelled like
    // the session must not block the rename (r14 review finding #9)
    val mvDeps = mvs.collect {
      case (n, body)
          if sessionRefsOf(body).exists(_.equalsIgnoreCase(name)) => n
    }
    require(mvDeps.isEmpty,
      s"session '$name' is referenced by materialized view(s) " +
        s"${mvDeps.mkString(", ")} — DROP MATERIALIZED VIEW (and recreate " +
        "against the new name) first")
    val s = sessions.remove(name).get
    sessions(newName) = s
    sourcePaths.remove(name).foreach(sourcePaths(newName) = _)
    val movedLayouts = layouts.collect {
      case ((n, slot), l) if n == name => (slot, l)
    }.toSeq
    movedLayouts.foreach { case (slot, l) =>
      layouts.remove((name, slot))
      layouts((newName, slot)) = l
    }
    // manifest entries move only when this catalog already holds the
    // writer token (an implicit write must never SEIZE writership); a
    // skipped move degrades safely — the old-named entries go dormant.
    // The disk write commits FIRST and the in-memory map mutates only
    // after it succeeds (r14 ADVICE #4): a save that threw after the map
    // moved would leave memory on new-name entries and disk on old-name
    // ones, silently carrying the divergence into the next persist.
    val movedEntries = manifest.collect {
      case ((n, slot), e) if n == name => (slot, e)
    }.toSeq
    if (movedEntries.nonEmpty && writerToken.isDefined)
      warehouse.foreach { wh =>
        Try {
          fenceWriter(wh)
          val staged = manifest.toSeq.map {
            case ((n, slot), e) if n == name =>
              ((newName, slot), e.copy(session = newName))
            case other => other
          }
          LayoutStore.save(spark, wh, staged.map(_._2))
          staged // committed: mirror it in memory
        }.foreach { staged =>
          manifest.clear()
          staged.foreach { case (k, e) => manifest(k) = e }
        }
      }
    // the view window opened under the old name: re-point it
    spark.catalog.dropTempView(name)
    Positional.strip(s.current).createOrReplaceTempView(newName)
    ddlReport("rename_table", newName)
  }

  /** RENAME TO targets resolve like ALTER targets but arrive as
    * UnresolvedTableOrView.
    */
  private def tableOrViewTarget(p: LogicalPlan): Option[String] = p match {
    case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView
        if t.multipartIdentifier.size == 1 &&
          sessions.contains(t.multipartIdentifier.head) =>
      Some(t.multipartIdentifier.head)
    case _ => sessionTarget(p)
  }

  private def ddlReport(op: String, name: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    spark.createDataFrame(
      java.util.Arrays.asList(Row(op, name)),
      StructType(Seq(StructField("operation", StringType, nullable = false),
        StructField("table", StringType, nullable = false))))
  }

  private def singlePart(p: LogicalPlan): Option[String] = p match {
    case u: UnresolvedIdentifier if u.nameParts.size == 1 =>
      Some(u.nameParts.head)
    case _ => None
  }

  /** ALTER targets must be OPEN sessions (altering an unknown name is
    * Spark's error to raise, through the fall-through).
    */
  private def sessionTarget(p: LogicalPlan): Option[String] = p match {
    case t: UnresolvedTable if t.multipartIdentifier.size == 1 &&
        sessions.contains(t.multipartIdentifier.head) =>
      Some(t.multipartIdentifier.head)
    case _ => None
  }

  /** PARTITIONED BY columns of a CTAS — identity transforms only (a
    * bucket/days transform has no hive-directory equivalent to write).
    */
  private def partCols(
      partitioning: Seq[org.apache.spark.sql.connector.expressions.Transform])
      : Seq[String] = partitioning.map {
    case t if t.name == "identity" && t.references.length == 1 &&
        t.references.head.fieldNames.length == 1 =>
      t.references.head.fieldNames.head
    case other => throw new IllegalArgumentException(
      s"unsupported PARTITIONED BY transform '$other' against a session " +
        "— only plain column names write as hive partitions")
  }

  private def runCtas(query: String, name: String, src: LogicalPlan,
                      partitionBy: Seq[String], replace: Boolean,
                      ifNotExists: Boolean): DataFrame = {
    requireNoTxn("CREATE TABLE AS SELECT")
    require(!mvs.contains(name),
      s"name '$name' is a materialized view — DROP MATERIALIZED VIEW first")
    require(!sessions.contains(name) || ifNotExists || replace,
      s"session '$name' already exists (use OR REPLACE / IF NOT EXISTS)")
    if (sessions.contains(name) && ifNotExists && !replace)
      return ddlReport("create_table_skipped", name)
    // the source query's own text, extracted as the statement TAIL from
    // the first query-head keyword after `AS` — the parsed query plan's
    // Origin cannot be trusted here (an Aggregate root anchors at its
    // GROUP BY clause, and no node's origin covers the SELECT keyword),
    // and a rigid clause-by-clause prefix regex would reject legal
    // forms (backticked names, USING a.b.c).
    // candidate positions are tried in order and the first whose tail
    // PARSES wins — a single reluctant match would stop inside a string
    // literal (`COMMENT 'used as select source' AS SELECT …`) and hand
    // garbage to spark.sql (r13 review finding #4)
    val head = java.util.regex.Pattern.compile(
      "(?is)^\\s*create\\s+(?:or\\s+replace\\s+)?table\\s").matcher(query)
    require(head.find(), s"not a CTAS statement: $query")
    val cand = java.util.regex.Pattern.compile(
      "(?is)\\bas\\s+((?:select|from|table|values|with|\\()\\b?.*)$")
      .matcher(query)
    var srcText: Option[String] = None
    var from = head.end()
    while (srcText.isEmpty && cand.find(from)) {
      val tail = cand.group(1)
      if (Try(spark.sessionState.sqlParser.parsePlan(tail)).isSuccess)
        srcText = Some(tail)
      from = cand.start() + 1
    }
    require(srcText.isDefined, s"cannot locate CTAS source query in: $query")
    // planned through [[CatalogDml.planRead]] — shared with the DML
    // source path deliberately: the CTAS result is a LONG-LIVED lazy
    // plan (openFrom binds it un-executed), so it must bind live session
    // plans, never layout storage a later rebuild + vacuum may collect;
    // a referenced MATERIALIZED VIEW re-registers live for the same
    // reason (r13 review finding #1); and a time-travel clause in the
    // source (`CREATE TABLE x AS SELECT * FROM t VERSION AS OF p`)
    // resolves onto the pinned snapshot exactly as it does for INSERT
    // (r14 ADVICE #2 — the two write surfaces used to diverge here).
    val rows = planRead(srcText.get)
    if (partitionBy.nonEmpty) {
      // PARTITIONED BY (r13 verdict task #7): the result WRITES as a
      // hive-partitioned dataset first — one directory per partition
      // value, the layout every downstream plan-time pruner understands
      // — and the session opens over the written files. The write lands
      // in JVM-scratch (NOT the warehouse: vacuum's manifest diff would
      // collect an untracked warehouse dir), living exactly as long as
      // the session's own checkpoint state; [[sourcePathOf]] exposes the
      // directory for downstream pruned readers and exports. ROW order
      // follows the written layout (partition dirs, then file order),
      // not the source query's ORDER BY — positions address the stored
      // layout, the documented price of asking for partitioned storage.
      // The read-back pins the QUERY's schema: without it, partition
      // -column type inference would silently retype (and can merge —
      // '01' and '1' both read as INT 1) the partition values, and the
      // columns would reorder partition-last (r14 review findings).
      val canonPart = partitionBy.map(c =>
        rows.columns.find(_ == c)
          .orElse(rows.columns.find(_.equalsIgnoreCase(c)))
          .getOrElse(throw new IllegalArgumentException(
            s"PARTITIONED BY column '$c' is not in the CTAS output " +
              s"(${rows.columns.mkString(", ")})")))
      val out = layoutTempDir(s"graft_ctas_${name}_")
      graft.io.Formats.writePartitioned(rows, out, canonPart)
      // HadoopFsRelation appends partition columns LAST regardless of
      // the pinned schema (verified on this Spark) — re-select the
      // query's own order so positional semantics match the
      // unpartitioned twin (r14 review, 2nd pass)
      openFrom(name, spark.read.schema(rows.schema).parquet(out)
        .select(rows.columns.map(org.apache.spark.sql.functions.col): _*))
      sourcePaths(name) = out
    } else openFrom(name, rows)
    // the brand-new session's view must be visible to the REST of this
    // sql() call's window and to later calls — the window opened before
    // this session existed
    Positional.strip(sessions(name).current).createOrReplaceTempView(name)
    ddlReport(
      if (partitionBy.nonEmpty)
        if (replace) "create_or_replace_table_partitioned"
        else "create_table_partitioned"
      else if (replace) "create_or_replace_table"
      else "create_table",
      name)
  }

  /** Session-schema name resolution for DDL text — CASE-INSENSITIVE,
    * like Spark's own (and this engine's INSERT-list) resolution, with
    * an EXACT match preferred so a case-colliding schema ('A' and 'a')
    * resolves the spelled column, never its sibling (r13 review
    * finding #6). Returns the schema's canonical spelling.
    */
  private def canonCol(cols: Seq[String], c: String): Option[String] =
    cols.find(_ == c).orElse(cols.find(_.equalsIgnoreCase(c)))

  private def runAddColumns(name: String, a: AddColumns): DataFrame = {
    val s = sessions(name)
    a.columnsToAdd.foreach { qc =>
      // re-read per column: a multi-add statement's later columns must
      // see (and may position AFTER) the earlier ones
      val cols = Positional.strip(s.current).columns.toSeq
      require(qc.path.isEmpty,
        "ALTER TABLE ADD COLUMNS into a nested struct is not supported " +
          "against a session")
      require(canonCol(cols, qc.colName).isEmpty,
        s"column ${qc.colName} already exists in session '$name'")
      val at = positionOf(qc.position.map(_.position), cols)
      val default: Any = qc.default match {
        case Some(d) =>
          val v = d.child
          require(v.foldable, "ADD COLUMN DEFAULT must be a literal")
          // convert with the LITERAL's own type — the projection casts
          // to the declared column type (SchemaOps: lit(v).cast(dt)), so
          // `DECIMAL(10,2) DEFAULT 0` coerces instead of class-casting
          toExternal(v.eval(), v.dataType)
        case None => graft.ops.CellOps.defaultFor(qc.dataType)
      }
      s.insertColumnTyped(at, qc.colName, qc.dataType, default)
    }
    ddlReport("add_columns", name)
  }

  /** Ordinal of FIRST / AFTER x / default-tail in the session's
    * user-visible column list.
    */
  private def positionOf(
      pos: Option[org.apache.spark.sql.connector.catalog.TableChange.ColumnPosition],
      cols: Seq[String]): Int = {
    import org.apache.spark.sql.connector.catalog.TableChange
    pos match {
      case None => cols.length
      case Some(_: TableChange.First) => 0
      case Some(af: TableChange.After) =>
        val i = canonCol(cols, af.column()).map(cols.indexOf).getOrElse(-1)
        require(i >= 0, s"AFTER ${af.column()}: no such column")
        i + 1
      case Some(other) =>
        throw new IllegalArgumentException(s"unsupported position $other")
    }
  }

  /** Catalyst internal literal value → the external Scala value the
    * typed default projection expects (`lit(default)`).
    */
  private def toExternal(v: Any, dt: DataType): Any =
    org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToScalaConverter(dt)(v)

  private def runDropColumns(name: String, d: DropColumns): DataFrame = {
    val s = sessions(name)
    // retirement is DEFERRED until every gesture succeeded: the
    // atomically() bracket rolls the SESSION back on a later column's
    // failure, but a layout retired mid-statement would stay retired —
    // the statement would report failure yet silently cost its
    // acceleration (r13 review finding #2)
    val dropped = scala.collection.mutable.ArrayBuffer.empty[String]
    d.columnsToDrop.foreach { fn =>
      require(fn.name.size == 1,
        "ALTER TABLE DROP COLUMN of a nested field is not supported " +
          "against a session")
      val cols = Positional.strip(s.current).columns.toSeq
      canonCol(cols, fn.name.head) match {
        case None =>
          require(d.ifExists,
            s"no column ${fn.name.head} in session '$name'")
        case Some(c) =>
          s.dropColumnAt(cols.indexOf(c))
          dropped += c
      }
    }
    dropped.foreach(retireLayoutsReferencing(name, _))
    ddlReport("drop_columns", name)
  }

  private def runRenameColumn(name: String, r: RenameColumn): DataFrame = {
    val s = sessions(name)
    require(r.column.name.size == 1,
      "ALTER TABLE RENAME COLUMN of a nested field is not supported " +
        "against a session")
    val cols = Positional.strip(s.current).columns.toSeq
    val from = canonCol(cols, r.column.name.head).getOrElse(
      throw new IllegalArgumentException(
        s"no column ${r.column.name.head} in session '$name'"))
    require(canonCol(cols, r.newName).isEmpty,
      s"column ${r.newName} already exists in session '$name'")
    s.renameColumn(from, r.newName)
    retireLayoutsReferencing(name, from)
    ddlReport("rename_column", name)
  }

  /** Unregister this session's layouts whose DEFINITION names `column` —
    * after a drop or rename their definition can never be satisfied
    * again (a rebuild would reference a column that no longer exists and
    * wedge every later refresh — the r13 review's finding #1). Layouts
    * NOT naming the column keep the ordinary delta law: a column add /
    * rename of an unrelated column revalidates them with zero IO.
    * Manifest entries are removed too (ONE batched persist, and only
    * when this catalog already holds the writer token — an implicit
    * retirement must never seize writership): an orphaned entry could
    * never re-attach (its projection is gone) yet would pin its storage
    * against vacuum forever. When the removal is not permitted the
    * entry degrades exactly as before — the reopen digest gate declines
    * it, queries serve live.
    */
  private[core] def retireLayoutsReferencing(name: String,
                                             column: String): Unit = {
    // inside an open transaction, DEFER: a retirement is not restorable,
    // so it must wait for COMMIT (a rolled-back DROP COLUMN would
    // otherwise silently cost its layouts); the layouts stay epoch-stale
    // meanwhile, so correctness never depends on the deferral
    if (txnPre.isDefined) { txnRetires += ((name, column)); return }
    val victims = layouts.collect {
      case ((n, slot), l)
          if n == name && Catalog.layoutRefs(l).contains(column) => slot
    }.toSeq
    victims.foreach(slot => layouts.remove((name, slot)))
    removeManifestEntries(victims.map((name, _)), seize = false)
    ()
  }

}
