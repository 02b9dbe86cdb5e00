package graft.core

import scala.collection.mutable
import scala.util.{Failure, Success, Try}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Catalog._

/** Epoch-pinned snapshot serving: pin/unpin leases, asOf reads over pinned plans and layouts (rangeScanAsOf, topKAsOf, aggregateAsOf, distinctCountAsOf, quantilesAsOf).
  *
  * An internal implementation seam of [[Catalog]] (split out of the
  * single-file class, r11 verdict task #7): every member here is
  * Catalog implementation detail with zero behavior change — the trait
  * exists so the file stays navigable, not as user API.
  */
trait CatalogSnapshots { self: Catalog =>
  // ---- epoch-pinned snapshots ----------------------------------------------
  // The serving tier's consistency lever during maintenance (r10 verdict
  // task #4): a pin captures the session's CURRENT plan (an immutable
  // lineage reference — nothing copies) plus its registered layouts at
  // that epoch. While a refresh or rebuild runs, readers on the pinned
  // epoch keep answering from the pre-maintenance state — the pinned
  // layout's base files are never rewritten by a delta refresh, and
  // [[vacuum]] keeps every dir a pin references (composing with the
  // grace window) until the pin is released. Pins are process-scoped:
  // they exist to bridge a maintenance window, not to time-travel
  // across restarts.

  private[core] val pins = mutable.LinkedHashMap.empty[(String, Long), Snapshot]

  /** Wall-clock source for pin timestamps (`TIMESTAMP AS OF` resolution,
    * r12 verdict task #3) — a seam so specs can pin epochs at controlled
    * instants; production uses the system clock.
    */
  private[graft] var pinClock: () => Long =
    () => System.currentTimeMillis() * 1000L

  /** Pin the session's current state; returns the pinned epoch (the
    * handle for [[rangeScanAsOf]] / [[snapshotAsOf]] / [[unpin]]).
    * Pinning the same epoch twice is idempotent. On a DURABLE catalog
    * the pin also writes a LEASE file under `<warehouse>/_pins`, so a
    * vacuum run by ANOTHER process honors this pin too; a crashed
    * process's lease holds its dirs until any catalog unpins it (or an
    * operator deletes the lease file).
    */
  def pin(name: String): Long = {
    val s = sessionOf(name)
    if (!pins.contains((name, s.epoch))) {
      val sn = Snapshot(s.epoch, s.current,
        layoutsOf(name).filter(_._2.builtAtEpoch == s.epoch).toMap,
        pinnedAtMicros = pinClock())
      pins((name, s.epoch)) = sn
      warehouse.foreach { wh =>
        val refs = sn.layouts.values.flatMap(l =>
          layoutPathsOf(l) ++ statsFilesOf(l) ++
            patchOf(l).flatMap(_.path).map(r => s"$wh/$r")).toSeq.distinct
        if (refs.nonEmpty) {
          val p = pinLeasePath(wh, name, s.epoch)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val out = fs.create(p, true)
          try out.write(refs.mkString("\n").getBytes("UTF-8"))
          finally out.close()
        }
      }
    }
    s.epoch
  }

  /** Release a pin (and its durable lease); its dirs become
    * vacuum-eligible once otherwise unreferenced.
    */
  def unpin(name: String, epoch: Long): Boolean = {
    warehouse.foreach { wh =>
      val p = pinLeasePath(wh, name, epoch)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) { fs.delete(p, false); () }
    }
    pins.remove((name, epoch)).isDefined
  }

  /** One lease per (session, epoch) — catalog-agnostic, so any catalog
    * over the warehouse can release a crashed process's pin.
    */
  private[core] def pinLeasePath(wh: String, name: String,
                           epoch: Long): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$wh/_pins/${name}_$epoch")

  def pinnedEpochs(name: String): Seq[Long] =
    pins.keys.collect { case (n, e) if n == name => e }.toSeq

  /** The pinned session plan itself (every column, pre-maintenance). */
  def snapshotAsOf(name: String, epoch: Long): DataFrame =
    Positional.strip(pinOf(name, epoch).plan)

  /** Roll the session BACK to a pinned epoch — the rollback a bad
    * deploy/ingest needs once pins exist (Delta's RESTORE, typed). The
    * pinned plan replaces the live table as a STRUCTURAL gesture: the
    * mutation log records no recoverable delta (the rollback may cross
    * many epochs), so every layout rebuilds on the next refresh; the
    * pinned layouts themselves keep serving the pin until then, and the
    * pin stays valid — restore does not consume it, so a wrong rollback
    * can itself be rolled back.
    */
  def restore(name: String, epoch: Long): Unit = {
    val sn = pinOf(name, epoch)
    sessionOf(name).replace(sn.plan) // plan carries __pos — positions
                                     // are the pinned epoch's, dense
  }

  /** Name of the change-classification column [[changes]] appends —
    * Delta CDF's convention, appended LAST so the table columns stay in
    * user order.
    */
  val changeTypeCol = "_change_type"

  /** Row-level change feed between two addressable epochs of `name` —
    * the incremental-consumer contract (Delta's `table_changes`, typed):
    * the table's columns plus [[changeTypeCol]] ∈ {insert, delete,
    * update_preimage, update_postimage}. `toEpoch` < 0 means the current
    * epoch. Both endpoints resolve like every other time-travel read —
    * pinned snapshots or retained history, fail-fast otherwise.
    *
    * Two serving paths, chosen like layout refresh chooses patch vs
    * rebuild:
    *  - **log-served** when the span's mutation log is recoverable and
    *    delta-sized: each slice is a bounded `__pos` IN-filter over the
    *    retained endpoint plans — broadcast-trivial at any corpus size,
    *    updates classified with BOTH images, and the pre-images read
    *    from the since-plan (never the per-gesture victim plans, so the
    *    feed works even past the victim-plan retention window).
    *  - **content diff** otherwise (structural gesture, mass delete,
    *    trimmed log, over-bound span): two `EXCEPT ALL` legs — a
    *    full-shuffle multiset diff on row content. Honest semantics at
    *    that point: updates surface as delete+insert pairs, because
    *    without the log there is no row identity to pair them with.
    *
    * A column add/drop/rename inside the span fails fast (the two
    * schemas don't line up row-for-row) — Delta CDF's rule.
    */
  def changes(name: String, fromEpoch: Long, toEpoch: Long = -1L): DataFrame = {
    import Positional.POS
    val s = sessionOf(name)
    val to = if (toEpoch < 0L) s.epoch else toEpoch
    require(fromEpoch <= to,
      s"change span is reversed: from epoch $fromEpoch is newer than $to")
    val fromPlan = planAtEpoch(name, fromEpoch)._1
    val toPlan = planAtEpoch(name, to)._1
    val fromFlat = Positional.strip(fromPlan)
    val toFlat = Positional.strip(toPlan)
    def tag(df: DataFrame, t: String) =
      df.withColumn(changeTypeCol, lit(t))
    val empty = tag(toFlat, "insert").limit(0)
    if (fromEpoch == to) return empty
    if (fromFlat.schema != toFlat.schema)
      throw new IllegalStateException(
        s"the span ($fromEpoch, $to] of '$name' contains a schema " +
          "change — the endpoint schemas don't line up row for row; " +
          "read changes up to the DDL epoch and from it separately")
    s.changeFeedSince(fromEpoch, to) match {
      case Some(feed) =>
        def slice(plan: DataFrame, pos: Seq[Long], t: String) =
          if (pos.isEmpty) Nil
          else Seq(tag(
            Positional.strip(plan.filter(col(POS).isInCollection(pos))), t))
        val parts =
          slice(toPlan, feed.insertedPos, "insert") ++
            slice(toPlan, feed.updatedPos.map(_._1), "update_postimage") ++
            slice(fromPlan, feed.updatedPos.map(_._2), "update_preimage") ++
            slice(fromPlan, feed.deletedPos, "delete")
        parts.reduceOption(_.unionByName(_)).getOrElse(empty)
      case None =>
        tag(toFlat.exceptAll(fromFlat), "insert")
          .unionByName(tag(fromFlat.exceptAll(toFlat), "delete"))
    }
  }

  private[core] def pinOf(name: String, epoch: Long): Snapshot =
    pins.getOrElse((name, epoch), throw new NoSuchElementException(
      s"no pinned snapshot of '$name' at epoch $epoch"))

  /** Range scan against a PINNED epoch: serves from the snapshot's
    * ranged layout when one covers the column (same pruned-plus-patched
    * plan as [[rangeScan]], against the pre-maintenance patch state),
    * else filters the pinned session plan — either way the answer is
    * the pinned epoch's, even while the live route already serves the
    * post-refresh state. [[topKAsOf]] / [[aggregateAsOf]] /
    * [[distinctCountAsOf]] extend the same contract to the other
    * serving-tier routes.
    */
  def rangeScanAsOf(name: String, epoch: Long, column: String, lo: Any,
                    hi: Any): DataFrame = {
    val sn = pinOf(name, epoch)
    sn.layouts.get(s"range:$column") match {
      case Some(l: RangedLayout) =>
        recordRoute(RouteReport(s"range:$column", "layout", "pinned"))
        serveRangedScan(l, column, lo, hi)
      case _ =>
        recordRoute(RouteReport(s"range:$column", "live", "pinned-live"))
        val c = org.apache.spark.sql.functions.col(column)
        Positional.strip(sn.plan).filter(c >= lit(lo) && c <= lit(hi))
    }
  }

  /** ANN top-k against a PINNED epoch — the pinned twin of [[topK]],
    * through the same [[serveAnnTopK]] body.
    */
  def topKAsOf(name: String, epoch: Long, idCol: String, vecCol: String,
               query: Seq[Float], k: Int): DataFrame = {
    val sn = pinOf(name, epoch)
    sn.layouts.get(s"ann:$vecCol")
      .flatMap(serveAnnTopK(_, idCol, query, k)) match {
      case Some(served) =>
        recordRoute(RouteReport(s"ann:$vecCol", "layout", "pinned"))
        served
      case None =>
        recordRoute(RouteReport(s"ann:$vecCol", "live", "pinned-live"))
        graft.operators.Similarity.topK(
          Positional.strip(sn.plan), idCol, vecCol, query, k)
    }
  }

  /** Grouped count/sum/avg against a PINNED epoch — the pinned twin of
    * [[aggregate]], through the SAME covering rule ([[cubeCovers]]) and
    * serving body ([[serveCubeAggregate]]) the live route uses.
    */
  def aggregateAsOf(name: String, epoch: Long, groupCols: Seq[String],
                    measures: Seq[String],
                    where: Seq[(String, Any)] = Nil): DataFrame = {
    val sn = pinOf(name, epoch)
    sn.layouts.values.collectFirst {
      case c: CubeLayout
          if cubeCovers(c, groupCols, measures, where.map(_._1).toSet) => c
    } match {
      case Some(c) =>
        recordRoute(RouteReport(s"cube:${c.groupCols.mkString(",")}",
          "layout", "pinned"))
        serveCubeAggregate(c, groupCols, measures, where)
      case None =>
        recordRoute(RouteReport(s"cube:${groupCols.mkString(",")}",
          "live", "pinned-live"))
        liveCubeAggregate(Positional.strip(sn.plan), groupCols, measures,
          where)
    }
  }

  /** Exact grouped distinct count against a PINNED epoch — the pinned
    * twin of [[distinctCount]], same covering rule and serving body.
    */
  def distinctCountAsOf(name: String, epoch: Long, groupCols: Seq[String],
                        pairCol: String,
                        where: Seq[(String, Any)] = Nil): DataFrame = {
    val sn = pinOf(name, epoch)
    val whereCols = where.map(_._1).toSet
    val src = sn.layouts.values.collectFirst {
      case l: PairsLayout
          if pairsCovers(l, groupCols, pairCol, whereCols) => l
    } match {
      case Some(l) =>
        recordRoute(RouteReport(
          s"pairs:${l.groupCols.mkString(",")}:$pairCol", "layout",
          "pinned"))
        whereFilter(where)(patchedCodes(spark.read.parquet(l.path),
          l.patch))
      case None =>
        // same fallback order as the live route ([[decideDistinct]]):
        // a pinned histogram cube serves the exact distinct too
        sn.layouts.values.collectFirst {
          case c: CubeLayout
              if quantileCovers(c, groupCols, pairCol, whereCols) => c
        } match {
          case Some(c) =>
            recordRoute(RouteReport(s"cube:${c.groupCols.mkString(",")}",
              "layout", "pinned"))
            whereFilter(where)(patchedCube(c))
          case None =>
            recordRoute(RouteReport(
              s"pairs:${groupCols.mkString(",")}:$pairCol", "live",
              "pinned-live"))
            whereFilter(where)(Positional.strip(sn.plan))
        }
    }
    pairsDistinctOver(src, groupCols, pairCol)
  }

  /** Exact per-key percentiles against a PINNED epoch — the pinned twin
    * of [[quantiles]], through the SAME covering rule
    * ([[quantileCovers]]) and serving body ([[serveHistQuantiles]] /
    * [[liveQuantiles]]) the live route uses.
    */
  def quantilesAsOf(name: String, epoch: Long, keys: Seq[String],
                    valueCol: String, probes: Seq[(String, Double)],
                    where: Seq[(String, Any)] = Nil): DataFrame = {
    val sn = pinOf(name, epoch)
    sn.layouts.values.collectFirst {
      case c: CubeLayout
          if quantileCovers(c, keys, valueCol, where.map(_._1).toSet) => c
    } match {
      case Some(c) =>
        recordRoute(RouteReport(s"cube:${c.groupCols.mkString(",")}",
          "layout", "pinned"))
        serveHistQuantiles(c, keys, valueCol, probes, where)
      case None =>
        recordRoute(RouteReport(s"cube:${(keys :+ valueCol).mkString(",")}",
          "live", "pinned-live"))
        liveQuantiles(Positional.strip(sn.plan), keys, valueCol, probes,
          where)
    }
  }

  // ---- time-travel SQL -----------------------------------------------------

  private[core] def looksLikeTimeTravel(query: String): Boolean =
    java.util.regex.Pattern
      .compile("(?i)\\b(version|timestamp)\\s+as\\s+of\\b")
      .matcher(query).find()

  /** Resolve a `TIMESTAMP AS OF <expr>` clause to an epoch: the NEWEST
    * state of `name` at-or-before the instant, among the PINNED epochs
    * (r12 verdict task #3) and — r13 verdict task #3 — this process's
    * RETAINED epochs: every session keeps up to `maxHistory` past states
    * as exact plan references in its undo history, each stamped with
    * wall-clock at creation, so an incident operator who knows WHEN the
    * bad gesture landed (but not its epoch, and without a pre-existing
    * pin) is still answered truthfully. The expression must fold to a
    * timestamp (Catalyst hands it over unresolved — usually a string
    * literal; cast in the session zone). An instant neither a pin nor
    * retained history covers (before the session existed, or trimmed)
    * fails fast with the same NoSuchElementException contract as an
    * unknown `VERSION AS OF`: a reconstructed guess would be a lie.
    * Cross-PROCESS time travel remains the pins' job — history and
    * stamps die with the process by design.
    */
  private[core] def resolvePinAt(name: String, tsMicros: Long): Long = {
    val pinned = pins.collect {
      case ((n, e), sn)
          if n == name && sn.pinnedAtMicros != Long.MinValue &&
            sn.pinnedAtMicros <= tsMicros => (sn.pinnedAtMicros, e)
    }
    // toSeq BEFORE the ++: collect on the pins map yields a Map keyed by
    // stamp, and the millisecond-resolution clocks make same-stamp
    // candidates real — a map ++ would overwrite the pin with the
    // retained epoch and resolve to the OLDER state (r14 review finding
    // #4); on a Seq, the tuple max already breaks stamp ties by the
    // higher (newer) epoch
    val covered = pinned.toSeq ++ sessionOf(name).retainedEpochAt(tsMicros)
    if (covered.isEmpty) throw new NoSuchElementException(
      s"no pinned snapshot of '$name' at or before timestamp " +
        s"${java.time.Instant.ofEpochMilli(tsMicros / 1000L)}, and this " +
        "process's retained history does not reach that instant — pins " +
        "are the only DURABLE version handles (pin before mutating to " +
        "time-travel across processes)")
    covered.max._2
  }

  /** The exact plan of (`name`, `epoch`): the pinned snapshot — with its
    * layouts, so reads route — when pinned; else the session's RETAINED
    * history plan (served live: history plans reference session lineage,
    * never layout storage, so they are vacuum-safe by construction);
    * else fail fast.
    */
  private[core] def planAtEpoch(name: String,
                                epoch: Long): (DataFrame, Option[Snapshot]) =
    pins.get((name, epoch)) match {
      case Some(sn) => (sn.plan, Some(sn))
      case None => sessionOf(name).planAt(epoch) match {
        case Some(p) => (p, None)
        case None => throw new NoSuchElementException(
          s"no pinned snapshot of '$name' at epoch $epoch, and the " +
            "session's retained history no longer holds it — pin before " +
            "mutating for durable time travel")
      }
    }

  /** Fold a parsed `TIMESTAMP AS OF` operand to epoch micros (session
    * zone for zoneless literals); None when it isn't a foldable
    * timestamp-castable expression.
    */
  private[core] def tsOperandMicros(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Option[Long] = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.TimestampType
    Try {
      val cast =
        if (e.dataType == TimestampType) e
        else Cast(e, TimestampType,
          Some(spark.sessionState.conf.sessionLocalTimeZone))
      require(cast.foldable, "non-foldable time-travel timestamp")
      cast.eval() match {
        case m: java.lang.Long => m.longValue()
        case _ => throw new IllegalArgumentException("not a timestamp")
      }
    }.toOption
  }

  /** Time-travel SQL text (r11 verdict task #6 + r12 task #3): `FROM
    * <session> VERSION AS OF <epoch>` — or `TIMESTAMP AS OF <instant>`,
    * resolved via [[resolvePinAt]] to the newest pin taken at-or-before
    * the instant — serves the PINNED snapshot — the pre-maintenance
    * answer — while the bare session name in the same statement (or any
    * other) serves the live route. Implementation: Catalyst parses the
    * suffix into its standard `RelationTimeTravel` node; each node aimed
    * at a pinned session is rewritten IN THE STATEMENT TEXT (via the
    * node's Origin span) to a per-call snapshot view over
    * [[snapshotAsOf]]'s plan, and the PIN's layouts are published as SQL
    * routes under that view name — so a range predicate on the pinned
    * epoch still prunes through the pinned skipping stats, exactly like
    * [[rangeScanAsOf]]. Returns None when no travel clause targets an
    * open session (the ordinary path then raises Spark's own error for
    * unsupported time travel, or handles a real v2 table).
    *
    * An unpinned epoch serves from the session's RETAINED history when
    * it still holds that epoch's exact plan (r13 verdict task #3 —
    * served live, no layout routes: history plans reference session
    * lineage, never layout storage, so vacuum cannot break them); an
    * epoch that is neither pinned nor retained fails fast with the same
    * NoSuchElementException the typed asOf reads throw: pins are the
    * engine's only DURABLE version handles (the VacuumSpec law — a
    * reconstructed guess would be a lie).
    *
    * Must run inside the [[Catalog.sql]] view window.
    *
    * `routed = false` substitutes the snapshot views WITHOUT publishing
    * any layout routes: the pinned read then serves from the snapshot's
    * own session plan, never from layout storage — what a LONG-LIVED
    * consumer of the resulting plan needs ([[CatalogDml]] planRead: an
    * INSERT source survives in the target session's lineage, and a
    * routed scan there would break when unpin + vacuum collects the
    * layout dir).
    */
  private[core] def runTimeTravel(query: String,
                                  routed: Boolean = true)
      : Option[DataFrame] = {
    import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
    val plan = Try(spark.sessionState.sqlParser.parsePlan(query))
      .getOrElse(return None)
    val hits = plan.collectWithSubqueries {
      // VERSION AS OF <epoch>: the literal IS the pinned epoch
      case tt @ RelationTimeTravel(r: UnresolvedRelation, None, Some(v))
          if r.multipartIdentifier.size == 1 &&
            sessions.contains(r.multipartIdentifier.head) &&
            Try(v.trim.toLong).isSuccess =>
        (tt, r.multipartIdentifier.head, v.trim.toLong)
      // TIMESTAMP AS OF <instant>: resolve to the newest pin taken
      // at-or-before it; an instant no pin covers fails fast here
      case tt @ RelationTimeTravel(r: UnresolvedRelation, Some(ts), None)
          if r.multipartIdentifier.size == 1 &&
            sessions.contains(r.multipartIdentifier.head) &&
            tsOperandMicros(ts).isDefined =>
        val name = r.multipartIdentifier.head
        (tt, name, resolvePinAt(name, tsOperandMicros(ts).get))
    }
    if (hits.isEmpty) return None
    // the statement span of each travel clause: min/max origin over the
    // node, its relation child, and the timestamp operand (the version
    // form carries its literal inside the node's own origin; the
    // timestamp form's operand is a separate expression tree), falling
    // back to a rigid regex on the version form's tokens
    def span(tt: RelationTimeTravel, name: String,
             ver: Long): Option[(Int, Int)] = {
      var lo = Int.MaxValue
      var hi = -1
      def fold(o: org.apache.spark.sql.catalyst.trees.Origin): Unit = {
        o.startIndex.foreach(i => if (i >= 0) lo = math.min(lo, i))
        o.stopIndex.foreach(i => hi = math.max(hi, i))
      }
      (tt +: tt.relation.collect { case p => p }).foreach(n => fold(n.origin))
      tt.timestamp.foreach(_.foreach(e => fold(e.origin)))
      if (lo <= hi && hi < query.length) Some((lo, hi))
      else {
        // form-specific fallback: the version form's literal is the
        // epoch itself; the timestamp form's operand is whatever
        // expression the user wrote (a quoted literal in practice) —
        // `ver` is the RESOLVED epoch there and never appears in text
        val pat =
          if (tt.timestamp.isDefined)
            s"(?i)\\b$name\\s+timestamp\\s+as\\s+of\\s+" +
              "(timestamp\\s+'[^']*'|'[^']*'|\\S+)"
          else s"(?i)\\b$name\\s+version\\s+as\\s+of\\s+'?$ver'?"
        val m = java.util.regex.Pattern.compile(pat).matcher(query)
        if (m.find()) Some((m.start, m.end - 1)) else None
      }
    }
    val subs0 = hits.flatMap { case (tt, name, ver) =>
      span(tt, name, ver).map(s => (s._1, s._2, name, ver))
    }
    if (subs0.size != hits.size) return None
    // two clauses must never claim the same statement span: the
    // fallback regex finds the FIRST textual occurrence, so two
    // origin-less travel clauses on one session would both map there
    // and the double substitution would garble the statement (r13
    // review finding #5) — decline instead (ordinary path errors)
    val subs = subs0.distinct
    if (subs.map(s => (s._1, s._2)).distinct.size != subs.size) return None
    val views = scala.collection.mutable.ArrayBuffer.empty[String]
    val pinRoutes = scala.collection.mutable.HashMap
      .empty[String, Seq[graft.plans.SqlRouting.SqlRoute]]
    try {
      var text = query
      subs.sortBy(-_._1).foreach { case (lo, hi, name, ver) =>
        // fail fast when neither pinned nor retained; a pin serves
        // ROUTED (its layouts publish under the view), retained history
        // serves its exact plan live
        val (plan, sn) = planAtEpoch(name, ver)
        val view = s"__graft_asof_${name}_$ver"
        if (!views.contains(view)) {
          Positional.strip(plan).createOrReplaceTempView(view)
          views += view
          pinRoutes(view) = sn.map(s =>
            layoutSqlRoutes(s.layouts.toSeq, ver, "sql-pinned"))
            .getOrElse(Nil)
        }
        text = text.substring(0, lo) + view + text.substring(hi + 1)
      }
      Some(
        if (routed)
          graft.plans.SqlRouting.withRoutes(spark,
            sqlRoutes() ++ pinRoutes.filter(_._2.nonEmpty)) {
            spark.sql(text)
          }
        else spark.sql(text))
    } finally views.foreach(spark.catalog.dropTempView(_))
  }
}
