package graft.core

import scala.collection.mutable
import scala.util.{Failure, Success, Try}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType
import graft.core.Positional.POS
import graft.io.Formats
import graft.ops.{CellOps, PivotOps, RowOps, SchemaOps}

/** The engine's session object: a mutable reference to an immutable
  * DataFrame + the `__pos` ordering convention + an edit log.
  *
  * Replaces the reference's single in-memory `PandasModel._data`
  * (`/root/reference/main.py:15-17`; v2 pyc@46-48) and its in-place
  * mutation. Multi-table sessions (v1's MDI windows, `main.py:126-135`)
  * are a name → session map ([[EditorSession.open]] + [[Catalog]]).
  *
  * Interactive-mutation-vs-lazy-plans (SURVEY.md §7.3.2): repeated cell
  * edits are buffered in an edit log and materialized as ONE projection per
  * edited column (`CASE WHEN __pos IN (...) THEN map[__pos] ELSE col`),
  * not a tower of per-edit projections; every `compactEvery` flushes the
  * plan with `localCheckpoint` so analysis cost stays bounded no matter how
  * many edits the session has absorbed.
  */
class EditorSession private (val spark: SparkSession, table0: DataFrame,
                             compactEvery: Int = 4096) {

  /** The session table: [[Positional.attachPos]] has already pinned the
    * sorted snapshot with a localCheckpoint, materialized by its
    * position-assignment pass (the reference's E1 also loads eagerly,
    * `main.py:195-202`), so the session view is a single cheap projection
    * over materialized blocks — re-checkpointing here would just copy the
    * table a second time. Interactive sessions are
    * human-scale by definition; the 100 TB paths (queries/, operators/)
    * never go through EditorSession.
    */
  private var table: DataFrame = table0

  /** Pending cell edits: colName -> (pos -> casted value). Inner maps are
    * *immutable* so undo snapshots share them structurally — a snapshot is
    * O(edited columns), never a deep copy of the edit log.
    */
  private val editLog = mutable.LinkedHashMap.empty[String, Map[Long, Any]]
  private var editsSinceCheckpoint = 0

  /** Row count, maintained arithmetically through gestures (-1 = unknown,
    * recomputed lazily). Knowing the size on the driver lets gestures
    * validate positions and paste avoid a count job.
    */
  private var nRows: Long = -1L

  /** The current table with all pending edits applied (lazy plan). */
  def current: DataFrame = {
    if (editLog.isEmpty) table
    else editLog.foldLeft(table) { case (df, (colName, edits)) =>
      val dt = table.schema(colName).dataType
      if (edits.size <= EditorSession.literalEditMax)
        df.withColumn(colName, compactedEditExpr(colName, dt, edits))
      else editJoin(df, colName, dt, edits)
    }
  }

  /** One projection per column for the whole edit map: membership test on
    * the edited positions + map lookup. Null values are representable
    * (membership decides, not the lookup result). Literal-map lookup is a
    * linear scan per row, so this form is for small edit sets only.
    */
  private def compactedEditExpr(colName: String, dt: DataType,
                                edits: Map[Long, Any]) = {
    val positions = edits.keys.toSeq
    if (edits.size == 1) {
      val (p, v) = edits.head
      when(col(POS) === p, lit(v).cast(dt)).otherwise(col(colName))
    } else {
      val nonNull = edits.filter(_._2 != null)
      val lookup =
        if (nonNull.isEmpty) lit(null).cast(dt)
        else element_at(
          map(nonNull.toSeq.flatMap { case (p, v) => Seq(lit(p), lit(v).cast(dt)) }: _*),
          col(POS))
      when(col(POS).isInCollection(positions), lookup).otherwise(col(colName))
    }
  }

  /** Large edit sets apply as a broadcast hash join on `__pos` instead of a
    * literal map: O(1) hash probe per row inside whole-stage codegen, versus
    * the map literal's O(edits) linear scan — the difference between an
    * edit burst costing one narrow pass and costing rows×edits comparisons.
    * This is also the 100 TB shape: an edit log is data, not plan.
    */
  private def editJoin(df: DataFrame, colName: String, dt: DataType,
                       edits: Map[Long, Any]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{BooleanType, StructField, StructType}
    val schema = StructType(Seq(
      StructField(POS, org.apache.spark.sql.types.LongType, nullable = false),
      StructField("__edit_v", dt, nullable = true),
      StructField("__edit_set", BooleanType, nullable = false)))
    val rows = edits.toSeq.map { case (p, v) => Row(p, v, true) }
    val editDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    df.join(broadcast(editDf), Seq(POS), "left")
      .withColumn(colName,
        when(col("__edit_set"), col("__edit_v")).otherwise(col(colName)))
      .drop("__edit_v", "__edit_set")
  }

  // ---- undo/redo ----------------------------------------------------------
  // The reference *advertises* undo/redo (`readme.md:12`) but implements
  // neither (SURVEY.md §0: declared-but-absent). With immutable DataFrames
  // it is nearly free: a history entry is a (plan reference, edit-log copy)
  // pair — no data is copied, lineage chains to the pinned base.

  private case class Snap(table: DataFrame, edits: Seq[(String, Map[Long, Any])],
                          rows: Long, clip: Option[DataFrame], clipRows: Long)
  private val undoStack = mutable.ArrayBuffer.empty[Snap]
  private val redoStack = mutable.ArrayBuffer.empty[Snap]
  private val maxHistory = 128

  /** O(edited columns): the immutable inner maps are shared, not copied.
    * Clipboard state is part of the snapshot: cut → undo must restore the
    * pre-cut clipboard, or a later paste would re-insert rows the undo
    * already put back (duplicating them).
    */
  private def snap(): Snap = Snap(table, editLog.toSeq, nRows, clipboard, clipboardSize)

  private def restore(s: Snap): Unit = {
    epochCounter += 1
    logMutation(Structural) // undo/redo can change anything
    table = s.table
    editLog.clear()
    s.edits.foreach { case (c, m) => editLog(c) = m }
    nRows = s.rows
    clipboard = s.clip
    clipboardSize = s.clipRows
  }

  /** Monotonic state-change counter: bumps on every mutation gesture AND
    * on undo/redo (those change visible state too). At-rest layouts
    * ([[Catalog]]) record the epoch they were built at and are routed to
    * only while the session still sits at that epoch — an edited session
    * falls back to its live plan rather than serving stale stored data.
    */
  private var epochCounter = 0L
  def epoch: Long = epochCounter

  // ---- mutation log (delta-maintenance feed) ------------------------------
  // One entry per epoch bump: which positions a cell gesture touched, a
  // counted DELETE marker (with the victim positions and the pre-delete
  // plan while the gesture is delta-sized — retraction-IVM consumers
  // read the victims' rows from it at refresh time), an INSERT marker
  // (paste/splice — brand-new rows at a known position block), or a
  // structural marker (replace/pivot/undo — no delta is recoverable).
  // Catalog layout maintenance reads this to patch stored layouts
  // instead of rebuilding them from the whole corpus.
  private sealed trait MutKind
  private case class CellEdits(pos: Seq[Long], cols: Set[String])
      extends MutKind
  /** `pos` = deleted positions in PRE-delete coordinates and `pre` = the
    * pre-delete session plan (lazy, lineage-pinned to the checkpointed
    * base — capturing it costs nothing at gesture time), BOTH dropped
    * when the gesture exceeds [[EditorSession.deltaMaxRows]] so a mass
    * delete can't pin an unbounded position list in the log; `n` is
    * always the exact count, which is what bounds the refresh path
    * (r9 verdict finding #1: an uncounted delete marker let a mass
    * delete bypass the delta guard and collect every removed id to the
    * driver).
    */
  private case class RowDeletes(pos: Seq[Long], n: Long,
                                pre: Option[DataFrame]) extends MutKind
  /** `n` rows inserted at positions `[at, at+n)` (post-gesture
    * coordinates); pre-existing rows at ≥ `at` shifted up by `n`.
    */
  private case class RowInserts(at: Long, n: Long) extends MutKind
  private case object Structural extends MutKind

  private val mutLog = mutable.ArrayBuffer.empty[(Long, MutKind)]
  private var mutLogFloor = 0L // epochs <= floor predate the retained log
  private val mutLogMax = 4096

  /** Only the newest this-many delete entries keep their pre-delete
    * plan reference: each plan pins the checkpoint blocks its lineage
    * chains to, and 4096 of them could pin many table-sized copies on
    * a long delete-heavy session. Entries trimmed past the window keep
    * their positions and count (keyed shadows still work); only the
    * retraction feed degrades, and [[deltaSince]] reports that by
    * withholding `deletedRows` (grouped layouts rebuild).
    */
  private val victimPlanMax = 256

  /** Sequence numbers of the pre-bearing delete entries still holding
    * their plan, oldest first. `mutLog(seq - mutSeqBase)` is the entry,
    * so appending trims AT MOST ONE entry past the retention window —
    * O(1) amortized per gesture instead of rescanning the whole log
    * (ADVICE r10: the rescan was O(log size) driver work per cell edit).
    */
  private val victimSeqs = new java.util.ArrayDeque[Long]()
  private var mutSeqNext = 0L // seq the next appended entry gets
  private var mutSeqBase = 0L // seq of mutLog(0)

  private def logMutation(kind: MutKind): Unit = {
    mutLog += ((epochCounter, kind))
    val seq = mutSeqNext
    mutSeqNext += 1
    kind match {
      case rd: RowDeletes if rd.pre.isDefined =>
        victimSeqs.addLast(seq)
        if (victimSeqs.size > victimPlanMax) {
          // exactly the one entry that crossed the retention threshold
          val old = victimSeqs.pollFirst()
          mutLog((old - mutSeqBase).toInt) match {
            case (e, rd0: RowDeletes) =>
              mutLog((old - mutSeqBase).toInt) = (e, rd0.copy(pre = None))
            case _ => ()
          }
        }
      case _ => ()
    }
    if (mutLog.size > mutLogMax) {
      mutLogFloor = mutLog.head._1
      mutLog.remove(0)
      mutSeqBase += 1
      // the departed entry may still be the deque's oldest (fewer than
      // victimPlanMax deletes since): its plan left the log with it
      if (!victimSeqs.isEmpty && victimSeqs.peekFirst() < mutSeqBase)
        victimSeqs.pollFirst()
      ()
    }
  }

  private def mutationsSince(sinceEpoch: Long): Option[Seq[MutKind]] =
    if (sinceEpoch < mutLogFloor) None
    else Some(mutLog.collect { case (e, k) if e > sinceEpoch => k }.toSeq)

  /** The recoverable delta between `sinceEpoch` and now, with every
    * position expressed in CURRENT coordinates (the fold composes the
    * position shifts each insert/delete gesture applied to rows tracked
    * before it). None when a structural gesture (replace, pivot,
    * undo/redo, column drop), a position-unrecoverable mass delete
    * followed by positional gestures, or log truncation makes the delta
    * unrecoverable — callers must treat None as "anything may have
    * changed". Rows edited and later deleted leave [[SessionDelta
    * .dirtyPos]] (they're gone — the delete accounting owns them); rows
    * inserted and later deleted likewise cancel out of `insertedPos`
    * while still counting as a delete.
    */
  def deltaSince(sinceEpoch: Long): Option[EditorSession.SessionDelta] =
    mutationsSince(sinceEpoch).flatMap { entries =>
      val dirty = mutable.Set.empty[Long]
      val inserted = mutable.Set.empty[Long]
      var cols = Set.empty[String]
      var deletes = 0L
      var victims = List.empty[DataFrame]
      var victimsOk = true
      var valid = true
      entries.foreach {
        case _ if !valid => ()
        case CellEdits(pos, cs) =>
          dirty ++= pos; cols ++= cs
        case RowInserts(at, n) =>
          def shiftUp(s: mutable.Set[Long]): Unit = {
            val moved = s.filter(_ >= at).toSeq
            s --= moved; s ++= moved.map(_ + n)
          }
          shiftUp(dirty); shiftUp(inserted)
          inserted ++= (at until at + n)
        case RowDeletes(dpos, n, pre) =>
          deletes += n
          if (dpos.isEmpty && n > 0) {
            // positions not retained (mass delete): victims and the
            // coordinate shift of EARLIER-tracked positions are lost.
            // With nothing tracked yet the delta survives (later
            // gestures' positions are post-delete coordinates anyway);
            // otherwise nothing positional is recoverable.
            victimsOk = false
            if (dirty.nonEmpty || inserted.nonEmpty) valid = false
          } else {
            val dset = dpos.toSet
            pre match {
              case Some(df) =>
                victims ::= df.filter(col(POS).isInCollection(dpos))
              // retention window trimmed this entry's plan: positions
              // (and shifts) survive, the retraction feed does not
              case None => victimsOk = false
            }
            dirty --= dset; inserted --= dset
            val sorted = dpos.sorted
            def shiftDown(s: mutable.Set[Long]): Unit = {
              val moved = s.toSeq
              s.clear(); s ++= moved.map(p => p - sorted.count(_ < p))
            }
            shiftDown(dirty); shiftDown(inserted)
          }
        case Structural => valid = false
      }
      if (!valid) None
      else Some(EditorSession.SessionDelta(
        dirty.toSeq.sorted, cols, inserted.toSeq.sorted, deletes,
        if (deletes > 0 && victimsOk && victims.nonEmpty)
          // a column ADD between two deletes leaves the captured plans
          // with different schemas: fill the missing columns (they are
          // never layout-relevant — the layout predates them) and fall
          // back to None if the union still can't analyze
          Try(victims.reduce(_.unionByName(_, allowMissingColumns = true)))
            .toOption
        else None))
    }

  /** Record state before a mutation gesture; clears the redo branch.
    * `kind` feeds the mutation log: position-bounded cell gestures pass
    * what they touch, row deletes the delete-only marker, everything
    * else the structural default.
    */
  private def remember(kind: MutKind = Structural): Unit = {
    epochCounter += 1
    logMutation(kind)
    undoStack += snap()
    if (undoStack.size > maxHistory) undoStack.remove(0)
    redoStack.clear()
  }

  def undo(): Boolean =
    if (undoStack.isEmpty) false
    else { redoStack += snap(); restore(undoStack.remove(undoStack.size - 1)); true }

  def redo(): Boolean =
    if (redoStack.isEmpty) false
    else { undoStack += snap(); restore(redoStack.remove(redoStack.size - 1)); true }

  /** R7: full table replace (`update_data`, v2 pyc@96-100). Discards the
    * edit log — matches the reference resetting the model.
    */
  def replace(df: DataFrame): Unit = {
    remember(); editLog.clear(); table = df; nRows = -1L
  }

  /** Rebind through a transformation of the *current* view (edits folded
    * in first so the log never refers to stale positions). Every
    * `compactEvery/64` rebinds the plan is flushed with a checkpoint: each
    * gesture stacks only narrow projections over the pinned base, so a
    * handful are free, but an unbounded session would grow analysis cost.
    */
  private var rebindsSinceCheckpoint = 0
  private def rebind(f: DataFrame => DataFrame,
                     kind: MutKind = Structural): Unit = {
    remember(kind)
    val folded = current
    editLog.clear()
    table = f(folded)
    rebindsSinceCheckpoint += 1
    if (rebindsSinceCheckpoint >= math.max(1, compactEvery / 64)) checkpoint()
  }

  // ---- R1-R3: cell edits --------------------------------------------------

  /** R1: typed cell edit. Cast failure rejects the edit, state unchanged
    * (pandas `ValueError` parity, v2 pyc@72-77). O(1) driver work.
    */
  def setCell(pos: Long, colName: String, raw: String): Boolean =
    table.schema.fields.find(_.name == colName) match {
      case None => false
      case Some(f) => CellOps.castStrict(raw, f.dataType) match {
        case Failure(_) => false
        case Success(v) => recordEdit(colName, pos, v); true
      }
    }

  /** Batch cell edit — one gesture, one undo entry. A programmatic burst
    * (paste-of-values, fill-down) through [[setCell]] costs one history
    * snapshot per call and undoes one cell at a time; a batch is the
    * gesture the user actually made. Values cast-validate up front and any
    * uncastable value rejects the WHOLE batch (state and history
    * untouched), so the gesture is atomic — no half-applied paste.
    */
  def setCells(colName: String, edits: Seq[(Long, String)]): Boolean =
    table.schema.fields.find(_.name == colName) match {
      case None => false
      case Some(f) =>
        val casted = edits.map { case (p, raw) =>
          CellOps.castStrict(raw, f.dataType).map(p -> _) }
        if (edits.isEmpty || casted.exists(_.isFailure)) false
        else {
          remember(CellEdits(edits.map(_._1), Set(colName)))
          editLog(colName) =
            editLog.getOrElse(colName, Map.empty[Long, Any]) ++ casted.map(_.get)
          editsSinceCheckpoint += edits.size
          if (editsSinceCheckpoint >= compactEvery) checkpoint()
          true
        }
    }

  /** R3: boolean toggle. */
  def setBool(pos: Long, colName: String, value: Boolean): Boolean = {
    recordEdit(colName, pos, value); true
  }

  /** Explicit null write (delete cell content). */
  def setNull(pos: Long, colName: String): Unit = recordEdit(colName, pos, null)

  /** Nested-field cell edit: replace one struct leaf (dotted `fieldPath`,
    * e.g. `"addr.city"`) at one position via `Column.withField`, leaving
    * every sibling field intact. Cast-validates against the LEAF type and
    * rejects like [[setCell]] (state unchanged). Applies as a rebind
    * gesture — one narrow projection over the pinned base — rather than
    * through the flat edit log, whose values are whole-column-typed; it
    * still participates in undo/redo through rebind's history snapshot.
    */
  def setNestedField(pos: Long, colName: String, fieldPath: String,
                     raw: String): Boolean = {
    import org.apache.spark.sql.types.StructType
    def leafType(dt: DataType, path: List[String]): Option[DataType] =
      (dt, path) match {
        case (t, Nil) => Some(t)
        case (st: StructType, h :: rest) =>
          st.fields.find(_.name == h).flatMap(f => leafType(f.dataType, rest))
        case _ => None
      }
    val parts = fieldPath.split("\\.").toList
    table.schema.fields.find(_.name == colName)
      .flatMap(f => leafType(f.dataType, parts))
      .filter(_ => parts.nonEmpty) match {
      case None => false
      case Some(dt) => CellOps.castStrict(raw, dt) match {
        case Failure(_) => false
        case Success(v) =>
          rebind(df => df.withColumn(colName,
            when(col(POS) === pos,
              col(colName).withField(fieldPath, lit(v).cast(dt)))
              .otherwise(col(colName))),
            CellEdits(Seq(pos), Set(colName)))
          true
      }
    }
  }

  private def recordEdit(colName: String, pos: Long, v: Any): Unit = {
    remember(CellEdits(Seq(pos), Set(colName)))
    editLog(colName) = editLog.getOrElse(colName, Map.empty[Long, Any]) + (pos -> v)
    editsSinceCheckpoint += 1
    if (editsSinceCheckpoint >= compactEvery) checkpoint()
  }

  /** Flush the edit log into a materialized plan cut-point. Keeps repeated
    * interactive edits amortized-O(1) instead of growing analysis time.
    */
  def checkpoint(): Unit = {
    table = current.localCheckpoint(eager = true)
    editLog.clear()
    editsSinceCheckpoint = 0
    rebindsSinceCheckpoint = 0
    posShiftsSinceCheckpoint = 0
  }

  def pendingEdits: Int = editLog.valuesIterator.map(_.size).sum

  // ---- R4-R6: row ops -----------------------------------------------------

  /** Positions actually present in the table (a GUI can only select real
    * rows; API callers may pass junk — out-of-range entries are dropped so
    * position arithmetic stays consistent with reality).
    */
  private def validPositions(positions: Seq[Long]): Seq[Long] =
    positions.distinct.filter(p => p >= 0 && p < rowCount)

  def deleteRow(position: Long): Boolean = deleteRows(Seq(position))

  /** @return whether any row was actually deleted (false = no valid
    *         positions, state untouched, nothing pushed to undo history).
    */
  def deleteRows(positions: Seq[Long]): Boolean = {
    val valid = validPositions(positions)
    if (valid.nonEmpty) {
      rebind(RowOps.deleteRows(_, valid), deleteKind(valid))
      nRows -= valid.size
      afterPosShift()
    }
    valid.nonEmpty
  }

  /** Position-SHIFTING gestures (delete/cut) compose arithmetic on
    * `__pos`, and the optimizer's project-collapse / predicate-pushdown
    * SUBSTITUTE each level's `__pos` expression into the next level's
    * references — k-position gestures stacked g deep re-evaluate
    * ~(k+1)^g expression nodes per row (a delete-heavy session hung the
    * driver around nine 30-row gestures). Checkpointing every few shift
    * gestures caps the composition depth; session tables are
    * interactive-scale by design (class doc), so the materialization is
    * cheap and amortized exactly like the edit-log flush.
    */
  private var posShiftsSinceCheckpoint = 0
  private def afterPosShift(): Unit = {
    posShiftsSinceCheckpoint += 1
    if (posShiftsSinceCheckpoint >= EditorSession.posShiftCheckpointEvery)
      checkpoint()
  }

  /** The log entry for a delete of `valid` positions: positions + the
    * pre-delete plan while delta-sized (retraction-IVM feed), count
    * alone past that — a mass delete must not pin an unbounded position
    * list, and its refresh rebuilds anyway.
    */
  private def deleteKind(valid: Seq[Long]): RowDeletes =
    if (valid.size <= EditorSession.deltaMaxRows)
      RowDeletes(valid, valid.size.toLong, Some(current))
    else RowDeletes(Seq.empty, valid.size.toLong, None)

  private var clipboard: Option[DataFrame] = None
  private var clipboardSize: Long = 0L

  /** R5: cut selected rows to the session clipboard (`main.py:107-114`).
    * The table itself is NOT re-materialized here: since [[Positional
    * .attachPos]] pins the base with a checkpoint, the remainder and
    * a later paste's three union branches are all narrow codegen'd filters
    * over already-materialized blocks — re-running them per branch is
    * cheaper than copying the table. The clipboard is a lazy plan over the
    * pre-cut lineage: immutability keeps it correct across later table
    * rebinds (they rebind `table`, never this plan), and each paste re-runs
    * its narrow filter over the pinned base rather than holding a second
    * materialized copy of the rows.
    */
  def cut(positions: Seq[Long]): Boolean = {
    val valid = validPositions(positions)
    if (valid.nonEmpty) {
      // a cut IS a delete of the session's rows (the clipboard is
      // side-state): keyed layouts may shadow the vanished ids
      rebind({ df0 =>
        val (clip, rest) = RowOps.cutRows(df0, valid)
        clipboard = Some(clip)
        clipboardSize = valid.size.toLong
        rest
      }, deleteKind(valid))
      nRows -= valid.size
      afterPosShift()
    }
    valid.nonEmpty
  }

  /** R6: paste the clipboard block at `position` (`main.py:58-65`);
    * positions past the end append (pandas `iloc[pos:]` slicing clamps).
    * Logged as a row INSERT (r9 verdict task #2): the pasted rows are
    * brand-new at known positions, so keyed layouts delta-encode exactly
    * them instead of rebuilding — append is the dominant mutation of a
    * corpus pipeline and also the easiest delta.
    */
  def paste(position: Long): Boolean = clipboard match {
    case None => false
    case Some(clip) =>
      val at = math.max(0L, math.min(position, rowCount))
      rebind(RowOps.pasteRows(_, clip, at, Some(clipboardSize)),
        RowInserts(at, clipboardSize))
      nRows += clipboardSize
      // pasteRows references the previous plan TWICE (upper/lower
      // split), so stacked pastes double evaluation work per gesture —
      // the same composition blowup the delete fix capped; count it
      // against the same checkpoint budget
      afterPosShift()
      true
  }

  /** Append EXTERNAL rows at the table tail — the dominant mutation of
    * an ingest pipeline (CDC feeds, streaming micro-batches). The new
    * rows are position-stamped in their incoming order and pinned with
    * a localCheckpoint ([[Positional.attachPos]]) because the caller's
    * plan may be transient (a `foreachBatch` frame is only valid inside
    * its batch); the gesture logs as a row INSERT, so keyed layouts
    * delta-encode exactly the appended rows on the next refresh — a
    * batch-sized patch, never a corpus rebuild, while a batch larger
    * than the delta bound degrades to rebuild like any other oversized
    * gesture. Column set and types must match the session's schema
    * exactly (any column order); returns the number of appended rows.
    *
    * Cost note: the tail position comes from [[rowCount]], which is the
    * maintained counter except when nRows is unknown (right after a
    * `replace`/pivot or on a freshly reopened session), where the FIRST
    * append pays one count() job over the session plan. That cost is
    * one-time — the counter is maintained incrementally from then on —
    * so a steady ingest loop's per-batch cost stays batch-sized; it is
    * not avoidable cheaply either, since any tail derivation (max __pos
    * included) is the same full scan.
    */
  def appendRows(rows: DataFrame): Long = {
    val base = Positional.strip(current)
    val cols = base.columns
    require(rows.columns.sorted.sameElements(cols.sorted),
      s"appendRows schema mismatch: session has ${cols.mkString(",")}, " +
        s"rows have ${rows.columns.mkString(",")}")
    val ordered = rows.select(cols.map(col): _*)
    // name+type equality only — nullability is advisory in Spark, and a
    // non-nullable batch appending into a nullable column is safe
    require(ordered.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      base.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"appendRows type mismatch: session ${base.schema.simpleString} " +
        s"vs rows ${ordered.schema.simpleString}")
    val (clip, n) = Positional.attachPosCounted(ordered)
    if (n > 0) {
      val at = rowCount
      // a TAIL append needs no upper/lower split: one union keeps the
      // plan a linear chain of pinned blocks (no existing position
      // shifts, no double reference to the previous plan), so a long
      // ingest loop's per-batch cost stays batch-sized — pasteRows here
      // would double evaluation work per batch (the delete-burst
      // blowup, in stream clothing)
      val shifted = clip.withColumn(Positional.POS,
        col(Positional.POS) + lit(at))
      rebind(_.unionByName(shifted), RowInserts(at, n))
      nRows += n
    }
    n
  }

  // ---- P1-P2: schema ops --------------------------------------------------

  def dropColumnAt(position: Int): Unit = rebind(SchemaOps.dropColumnAt(_, position))

  def insertColumnAt(position: Int, spec: String): Unit = {
    val (name, dt) = CellOps.parseNameDtype(spec)
    // a brand-new column can't be referenced by any existing layout, so
    // the delta names it with no positions: projection-keyed layouts
    // revalidate with zero IO, full-row layouts (whose stored schema no
    // longer matches) rebuild as before
    rebind(SchemaOps.insertColumnAt(_, position, name, dt),
      CellEdits(Seq.empty, Set(name)))
  }

  // ---- A1: pivot ----------------------------------------------------------

  /** Pivot replaces the current table (v2 pyc@169) — positions re-derived
    * from the new shape, ordered by the index key.
    */
  def pivot(index: String, columns: String, values: String, aggfunc: String): Unit = {
    rebind { df =>
      val piv = PivotOps.pivotTable(Positional.strip(df), index, columns, values, aggfunc)
      Positional.attachPos(piv, col(index))
    }
    nRows = -1L // aggregation changed the row count
  }

  // ---- paging / save ------------------------------------------------------

  def page(lo: Long, hi: Long): DataFrame = Positional.page(current, lo, hi)

  def rowCount: Long = {
    if (nRows < 0) nRows = current.count()
    nRows
  }

  def save(path: String, singleFile: Boolean = true): Unit = {
    val out = Positional.strip(current.orderBy(col(POS)))
    if (singleFile) Formats.writeSingleFile(out, path) else Formats.write(out, path)
  }
}

object EditorSession {
  /** Edit-set size above which [[EditorSession.current]] switches from a
    * literal-map projection (O(edits) scan per row) to a broadcast hash
    * join (O(1) probe per row).
    */
  val literalEditMax = 32

  /** Position-shifting gestures between checkpoints: caps the `__pos`
    * arithmetic composition depth the optimizer can substitute
    * multiplicatively (see EditorSession.afterPosShift).
    */
  val posShiftCheckpointEvery = 4

  /** Above this many delta rows (dirty cells, inserted rows, or deleted
    * rows — each bounded separately) a layout delta patch loses to a
    * rebuild, and the driver-side patch legs stop being broadcast-
    * trivial. Shared by the mutation log (which stops retaining victim
    * positions past it) and [[Catalog]]'s refresh routing.
    */
  val deltaMaxRows = 4096

  /** The net recoverable mutation delta between two session epochs, all
    * positions in CURRENT coordinates. `dirtyPos` = surviving rows whose
    * cells changed (columns in `dirtyCols`); `insertedPos` = rows that
    * did not exist at the since-epoch; `deleteCount` = rows removed
    * (exact, even when the rest of the delta is position-unrecoverable);
    * `deletedRows` = the removed rows' pre-delete contents (the
    * retraction-IVM feed — grouped layouts subtract or recompute exactly
    * the victims' groups), absent when any delete gesture was too large
    * to retain.
    */
  final case class SessionDelta(dirtyPos: Seq[Long], dirtyCols: Set[String],
      insertedPos: Seq[Long], deleteCount: Long,
      deletedRows: Option[DataFrame]) {
    def hasDeletes: Boolean = deleteCount > 0
    def touchedPos: Seq[Long] = dirtyPos ++ insertedPos
  }

  /** E1: load a file as a new session — lazy scan + `__pos` attach.
    * `orderCols` must give a deterministic total order for reproducible
    * positions; empty means file order (zipWithIndex over scan order).
    */
  def open(spark: SparkSession, path: String,
           orderCols: Seq[String] = Nil): EditorSession = {
    val df = Formats.read(spark, path)
    new EditorSession(spark, Positional.attachPos(df, orderCols.map(col): _*))
  }

  /** "New DataFrame" — empty session (v2 pyc@285-288). */
  def empty(spark: SparkSession): EditorSession =
    new EditorSession(spark, Positional.attachPos(Formats.emptyTable(spark)))

  def fromDataFrame(df: DataFrame, orderCols: Seq[String],
                    compactEvery: Int = 4096): EditorSession =
    new EditorSession(df.sparkSession,
      Positional.attachPos(df, orderCols.map(col): _*), compactEvery)
}

/** v1 MDI parity: multiple named tables in one process (`main.py:126-135`),
  * plus the SQL-text surface over them — every open session is queryable as
  * a temp view, so `catalog.sql("SELECT ... FROM a JOIN b ...")` runs
  * cross-table SQL the reference never could.
  *
  * With a `warehouse` root the catalog is DURABLE: file-backed layouts
  * (PQ / IVF-PQ codes, range-clustered files + skipping stats, LSH
  * index) write under the warehouse instead of JVM-temp dirs, every
  * build records a [[LayoutManifestEntry]] in `<warehouse>/_manifest`,
  * and a NEW catalog over the same warehouse re-attaches the stored
  * layouts when a session reopens — the "build once, serve many"
  * economics survive a restart, which tempdir-backed layouts never
  * could (r8 verdict task #2). Re-attachment is digest-gated, not
  * name-gated: see [[LayoutManifestEntry]]. Bucketed layouts persist
  * only as far as the metastore does (in-memory catalog = one JVM;
  * Hive metastore in production). One writer per warehouse.
  */
class Catalog(spark: SparkSession, warehouse: Option[String] = None,
              deltaMaxRowsOverride: Option[Int] = None) {
  private val sessions = mutable.LinkedHashMap.empty[String, EditorSession]
  def open(name: String, path: String, orderCols: Seq[String] = Nil): EditorSession = {
    val s = EditorSession.open(spark, path, orderCols)
    register(name, s)
  }
  def get(name: String): Option[EditorSession] = sessions.get(name)

  /** Open a session over an existing DataFrame (a filtered view, a query
    * result) rather than a file path — same positional pinning.
    */
  def openFrom(name: String, df: DataFrame,
               orderCols: Seq[String] = Nil): EditorSession = {
    register(name, EditorSession.fromDataFrame(df, orderCols))
  }

  /** (Re)bind a name: any LIVE layouts registered under it describe the
    * OLD table and must not survive — a fresh session starts at epoch 0,
    * which a stale layout's builtAtEpoch could otherwise match. Durable
    * layouts then re-attach from the manifest if (and only if) the new
    * table's content digest matches what they were built from.
    */
  private def register(name: String, s: EditorSession): EditorSession = {
    layouts.filterInPlace { case ((n, _), _) => n != name }
    sessions(name) = s
    attachFromManifest(name, s)
    s
  }

  /** Closes the session AND drops its temp view — otherwise a later
    * `sql()` would silently serve the closed session's frozen snapshot.
    * Live layouts go too: they describe a session that no longer exists
    * (re-opening the name would start at epoch 0 and must never inherit
    * stale storage). Durable layouts keep their manifest entries — a
    * reopen re-attaches them through the digest gate.
    */
  def close(name: String): Unit = {
    sessions.remove(name)
    layouts.filterInPlace { case ((n, _), _) => n != name }
    spark.catalog.dropTempView(name)
  }

  def names: Seq[String] = sessions.keys.toSeq

  /** Run SQL text over the current state of every open session (views
    * reflect pending edits — they are rebuilt from `current` per call).
    *
    * Session names own the temp-view namespace for the duration of the
    * call: a pre-existing temp view with a session's name is replaced (and
    * not restored — don't share names between ad-hoc views and sessions,
    * or between two Catalogs on one SparkSession). The views are dropped
    * before returning — safe because `spark.sql` analyzes eagerly, so the
    * returned DataFrame holds the resolved plan, not the view names.
    */
  def sql(query: String): DataFrame = Catalog.sqlLockFor(spark).synchronized {
    // serialized per SPARKSESSION, not per catalog: temp views are
    // session-global, so two Catalog instances on one session with an
    // overlapping name could otherwise have one call's finally-drop
    // remove a view the other is mid-analysis on (the exact race a
    // per-instance lock reopens — ADVICE r9). Analysis is fast; the
    // returned DataFrame holds the resolved plan and executes unlocked.
    sessions.foreach { case (n, s) =>
      Positional.strip(s.current).createOrReplaceTempView(n)
    }
    try graft.plans.SqlRouting.withRoutes(spark, sqlRoutes()) {
      spark.sql(query)
    }
    finally sessions.keys.foreach(spark.catalog.dropTempView(_))
  }

  /** The layout routes SQL text may use, published to
    * [[graft.plans.SqlRouting]] for the duration of one [[sql]] call:
    * every EPOCH-VALID ranged or bucketed layout of every open session
    * (a stale layout is simply absent, so edited sessions' SQL plans
    * against the live view — routing changes the plan, never the
    * answer). The rewrite itself is [[graft.plans.SqlLayoutRouting]],
    * injected by [[graft.plans.GraftExtensions]]; without the extensions
    * the routes are published and never read.
    */
  private def sqlRoutes(): Map[String, Seq[graft.plans.SqlRouting.SqlRoute]] = {
    import graft.plans.SqlRouting.{BucketSqlRoute, RangedSqlRoute, SqlRoute}
    def sqlRouted(slot: String): Unit = {
      recordRoute(Catalog.RouteReport(slot, "layout", "sql-routed")); ()
    }
    sessions.map { case (name, s) =>
      name -> layoutsOf(name).collect[SqlRoute] {
        case (slot, l: Catalog.RangedLayout) if l.builtAtEpoch == s.epoch =>
          RangedSqlRoute(l.column,
            (lo, hi) => {
              val files =
                graft.io.SkippingIndex.candidateFilesOpt(l.stats, lo, hi)
              val base =
                if (files.isEmpty) spark.read.parquet(l.path).limit(0)
                else spark.read.parquet(files: _*)
              // the rule keeps the original Filter on top, so composing
              // the DML patch here keeps SQL answers byte-identical too
              patchedFullRows(base, l.idCol, l.patch)
            },
            () => sqlRouted(slot))
        case (slot, b: Catalog.BucketedLayout) if b.builtAtEpoch == s.epoch =>
          BucketSqlRoute(b.key, b.buckets, () => spark.table(b.table),
            () => sqlRouted(slot))
        case (slot, c: Catalog.CubeLayout) if c.builtAtEpoch == s.epoch =>
          graft.plans.SqlRouting.CubeSqlRoute(c.groupCols, c.measures,
            () => patchedCube(c), () => sqlRouted(slot))
        case (slot, p: Catalog.PairsLayout) if p.builtAtEpoch == s.epoch =>
          graft.plans.SqlRouting.PairsSqlRoute(p.groupCols, p.col,
            () => patchedCodes(spark.read.parquet(p.path), p.patch),
            () => sqlRouted(slot))
        case (slot, z: Catalog.ZOrderedLayout) if z.builtAtEpoch == s.epoch =>
          graft.plans.SqlRouting.ZOrderSqlRoute(z.colX, z.colY,
            (loX, hiX, loY, hiY) => {
              val files = graft.io.SkippingIndex.candidateFiles2dOpt(z.stats,
                loX, hiX, loY, hiY)
              val base =
                if (files.isEmpty) spark.read.parquet(z.path).limit(0)
                else spark.read.parquet(files: _*)
              patchedFullRows(base, z.idCol, z.patch)
            },
            () => sqlRouted(slot))
      }
    }.filter(_._2.nonEmpty).toMap
  }

  // ---- at-rest layouts + routing -----------------------------------------
  // The step that turns a query library into an engine: the catalog OWNS
  // the stored layouts (PQ codes, IVF-PQ cell partitions, bucketed
  // tables) and the high-level entry points below route through one
  // automatically when a VALID one exists — the caller asks for a top-k
  // or a join, never for a layout. Validity is epoch-based: a layout
  // remembers the session epoch it was built at and is bypassed the
  // moment the session mutates (edits, splices, undo), so routing can
  // never serve stale stored data — the edited session transparently
  // falls back to its live plan until the layout is rebuilt.

  import Catalog._
  private val layouts = mutable.LinkedHashMap.empty[(String, String), TableLayout]
  private val catalogId = Catalog.nextId.getAndIncrement()

  // ---- durable warehouse -------------------------------------------------
  // The manifest is this catalog's persisted truth about stored layouts,
  // loaded once at construction; every warehouse build upserts its entry
  // and rewrites the file (layout-count-sized — control-plane IO).
  private val manifest =
    mutable.LinkedHashMap.empty[(String, String), LayoutManifestEntry]
  warehouse.foreach { wh =>
    LayoutStore.load(spark, wh)
      .foreach(e => manifest((e.session, e.slot)) = e)
  }
  private val layoutSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Root dir for a new file-backed layout build: under the warehouse
    * (durable, manifest-recorded — second element is the path relative to
    * the warehouse) or a JVM-temp dir cleaned at exit (second element
    * None).
    */
  private def layoutRoot(prefix: String): (String, Option[String]) =
    warehouse match {
      case Some(wh) =>
        val rel = s"$prefix${catalogId}_${layoutSeq.incrementAndGet()}"
        (s"$wh/$rel", Some(rel))
      case None => (layoutTempDir(prefix), None)
    }

  /** Order-free content digest `rowHashSum:rowCount` of a projection of
    * `df` (empty `cols` = every column). Sum of per-row xxhash64 values
    * in decimal(38,0), so any partitioning and any merge order produce
    * the same digits; map-typed columns hash via their JSON rendering
    * (hash functions reject maps — key order in that rendering is
    * whatever `to_json` emits, which is deterministic for a given row).
    * One column-pruned scan; computed at build time (noise next to the
    * encode) and at re-attach time (the price of never serving another
    * table's stored codes — still far cheaper than a rebuild).
    */
  /** The columns of `df` as hashable expressions: map-typed columns hash
    * via their JSON rendering (hash functions reject maps; `to_json` is
    * deterministic per row).
    */
  private def hashableCols(df: DataFrame,
      cols: Seq[String]): Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hasMap(t: DataType): Boolean = t match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val use = if (cols.isEmpty) df.columns.toSeq else cols
    use.map { c =>
      if (hasMap(df.schema(c).dataType)) to_json(col(c)) else col(c)
    }
  }

  private def contentDigest(df: DataFrame, cols: Seq[String]): String = {
    val r = df.agg(
      sum(xxhash64(hashableCols(df, cols): _*).cast("decimal(38,0)")).as("h"),
      count(lit(1)).as("n")).head()
    s"${Option(r.get(0)).getOrElse(0)}:${r.getLong(1)}"
  }

  /** One order-free signature per layout key: the decimal sum of the
    * relevant columns' per-row hashes, grouped by `key` — a multi-row
    * key (repeated id, a cube group) signs as the sum of its rows. The
    * build-time persisted form of this is what a DIVERGED reopen diffs
    * against ([[divergedAttach]], r9 task #4): key-level change
    * detection costs one narrow pass, never a re-encode.
    */
  private def rowSignature(df: DataFrame,
                           key: org.apache.spark.sql.Column,
                           cols: Seq[String]): DataFrame =
    df.groupBy(key.as("id"))
      .agg(sum(xxhash64(hashableCols(df, cols): _*)
        .cast("decimal(38,0)")).as("sig"))

  /** The (signature key, hashed columns) recipe of a manifest entry's
    * layout kind; throws for full-row kinds (range/bucket/zorder), which
    * have no key a patch could shadow by.
    */
  private def sigSpec(e: LayoutManifestEntry)
      : (org.apache.spark.sql.Column, Seq[String]) = e.kind match {
    case "pq" | "ivfpq" | "lsh" | "postings" =>
      (col(e.idCol.get), Seq(e.idCol.get, e.valueCol.get))
    case "cube" =>
      (to_json(struct(e.groupCols.get.map(col): _*)),
        e.groupCols.get ++ e.measures.get)
    case "sketch" =>
      (to_json(struct(e.groupCols.get.map(col): _*)),
        e.groupCols.get :+ e.valueCol.get)
    case "pairs" =>
      val cols = e.groupCols.get :+ e.valueCol.get
      (to_json(struct(cols.map(col): _*)), cols)
    case "range" if e.idCol.isDefined =>
      (col(e.idCol.get), Seq.empty) // full rows: hash every column
    case "zorder" if e.keyCol.isDefined =>
      (col(e.keyCol.get), Seq.empty)
    case other =>
      throw new IllegalStateException(s"no row signature for '$other'")
  }

  /** The source projection a manifest entry's digest covers. */
  private def digestColsOf(e: LayoutManifestEntry): Seq[String] =
    e.kind match {
      case "pq" | "ivfpq" | "lsh" | "postings" =>
        Seq(e.idCol.get, e.valueCol.get)
      case "cube" => e.groupCols.get ++ e.measures.get
      case "sketch" | "pairs" => e.groupCols.get :+ e.valueCol.get
      case _ => Seq.empty
    }

  /** Persist the build-time row-signature sidecar next to a durable
    * layout's files (key-count-sized, one narrow pass).
    */
  private def writeRowSig(base: DataFrame, dir: String,
                          key: org.apache.spark.sql.Column,
                          cols: Seq[String]): Unit =
    rowSignature(base, key, cols).write.parquet(dir + "/rowsig")

  private var persistsSinceVacuum = 0

  private def persistEntry(e: LayoutManifestEntry): Unit =
    warehouse.foreach { wh =>
      manifest((e.session, e.slot)) = e
      LayoutStore.save(spark, wh, manifest.values.toSeq)
      // self-cleaning maintenance loop: every few manifest writes, GC
      // what those writes superseded (grace-guarded — see [[vacuum]])
      persistsSinceVacuum += 1
      if (persistsSinceVacuum >= Catalog.autoVacuumEvery) {
        persistsSinceVacuum = 0
        vacuum()
        ()
      }
    }

  /** Re-attach persisted layouts to a freshly (re)opened session: each
    * manifest entry under this name routes again only if the new
    * session's relevant columns reproduce the digest its build recorded.
    * A mismatch (different data under a reused name, or a column gone)
    * leaves the entry dormant and logs a `digest-mismatch` decision in
    * [[recentRoutes]] — queries fall back to live plans, never to
    * another table's stored bytes.
    */
  private def attachFromManifest(name: String, s: EditorSession): Unit =
    warehouse.foreach { wh =>
      val entries = manifest.collect {
        case ((n, slot), e) if n == name => (slot, e)
      }.toSeq
      if (entries.nonEmpty) {
        val base = Positional.strip(s.current)
        entries.foreach { case (slot, e) =>
          val matches =
            Try(contentDigest(base, digestColsOf(e)) == e.digest)
              .getOrElse(false)
          val attached =
            if (matches) reconstruct(wh, e, s.epoch, base)
            else divergedAttach(wh, e, s, base)
          attached match {
            case Some(l) => layouts((name, slot)) = l
            case None => recordRoute(RouteReport(slot, "live",
              "digest-mismatch")); ()
          }
        }
      }
    }

  /** Attach a manifest entry whose digest no longer matches the
    * (re)opened session's table — the durable-delta path (r9 task #4):
    * the session mutation log died with the old process, but the
    * build-time row-signature sidecar survives, so key-level divergence
    * is recoverable by DIFFING signatures instead of replaying gestures.
    * When the diff is bounded (≤ [[deltaMaxRows]] keys changed, added,
    * or removed), exactly the changed keys re-encode into a complete
    * REPLACEMENT patch (superseding any persisted one — the diff is
    * against build state, so it subsumes it), the manifest re-records
    * the new digest, and the layout attaches patched: the corpus-sized
    * base is never re-encoded, let alone rewritten. None (dormant →
    * live fallback, exactly the old digest-mismatch behavior) when the
    * sidecar is absent (pre-r10 build), the kind stores full rows, the
    * divergence exceeds the bound, or any column vanished.
    */
  private def divergedAttach(wh: String, e: LayoutManifestEntry,
                             s: EditorSession,
                             base: DataFrame): Option[TableLayout] = Try {
    val (key, hcols) = sigSpec(e)
    val old = spark.read.parquet(s"$wh/${e.path.get}/rowsig")
    val now = rowSignature(base, key, hcols)
    val changed = old.join(now, old("id") === now("id"), "full_outer")
      .filter(!(old("sig") <=> now("sig")))
      .select(coalesce(old("id"), now("id")).as("id"),
        now("id").isNotNull.as("present"))
      .limit(deltaMaxRows + 1).collect()
    require(changed.length <= deltaMaxRows,
      s"divergence ${changed.length} keys exceeds the delta bound")
    // a NULL key can't be shadowed (the serve-side anti-join and the
    // re-encode filter both skip nulls), so a divergence touching one
    // must decline — dormant beats silently serving the stale row
    require(!changed.exists(_.isNullAt(0)), "null layout key in divergence")
    val presentIds = changed.filter(_.getBoolean(1)).map(_.get(0)).toSeq
    val rows =
      if (presentIds.isEmpty) base.limit(0)
      else base.filter(key.isInCollection(presentIds))
    def seedArr = e.seeds.get.map(v => v: scala.collection.Seq[Float]).toArray
    val add0 = e.kind match {
      case "pq" =>
        graft.operators.Similarity.pqCodes(rows, e.idCol.get,
          e.valueCol.get, seedArr, e.m.get)
      case "ivfpq" =>
        graft.operators.Similarity.ivfPqEncodeWith(rows, e.idCol.get,
          e.valueCol.get, e.cents.get.map(c => (c.cid, c.vec)), seedArr,
          e.m.get)
      case "lsh" =>
        graft.operators.Dedup.lshIndex(rows, e.idCol.get, e.valueCol.get,
          e.n.get, e.numHashes.get, e.bands.get)
      case "postings" =>
        graft.operators.Retrieval.postingsRowsFor(rows, e.idCol.get,
          e.valueCol.get, e.n.get)
      case "cube" => cubeRows(rows, e.groupCols.get, e.measures.get)
      case "sketch" =>
        sketchRows(rows, e.groupCols.get, e.valueCol.get, e.n.get)
      case "pairs" => pairsRows(rows, e.groupCols.get, e.valueCol.get)
      case "range" | "zorder" =>
        // full rows ARE the add-leg; the serve-side union needs the
        // reopened schema to equal the stored one (a drifted schema
        // would fail lazily at serve time — decline eagerly instead)
        val sub = if (e.kind == "range") "ranged" else "zordered"
        require(spark.read.parquet(s"$wh/${e.path.get}/$sub")
          .columns.toSet == base.columns.toSet, "schema drift")
        rows
    }
    val keyName = e.kind match {
      case "range" => e.idCol.get
      case "zorder" => e.keyCol.get
      case _ => "id"
    }
    val patch = mergedPatch(changed.map(_.get(0)), None, add0, keyName).get
    val scalars = e.kind match {
      // the corpus moved, so the stored BM25 scalars did too
      case "postings" =>
        val (nDocs, avgdl) = graft.operators.Retrieval.postingsStats(
          base, e.valueCol.get)
        (Some(nDocs), Some(avgdl))
      case _ => (e.nDocs, e.avgdl)
    }
    val e2 = e.copy(patch = patch.path,
      digest = contentDigest(base, digestColsOf(e)),
      nDocs = scalars._1, avgdl = scalars._2)
    // reconstruct FIRST: the manifest must never get ahead of reality
    // (ADVICE r10 — a persisted-then-failed attach would send the next
    // reopen down the fast digest path onto storage this run never
    // validated; it still degrades safely to live, but the recorded
    // state would be a lie)
    val attached = reconstruct(wh, e2, s.epoch, base)
    attached.foreach(_ => persistEntry(e2))
    attached
  }.toOption.flatten

  /** Rebuild the in-memory layout object a manifest entry describes.
    * None if its storage is unusable (e.g. a bucketed table missing from
    * this metastore, files deleted) — the caller treats that like a
    * digest mismatch.
    */
  private def reconstruct(wh: String, e: LayoutManifestEntry,
                          epoch: Long,
                          base: DataFrame): Option[TableLayout] = Try {
    def seedArr: Array[scala.collection.Seq[Float]] =
      e.seeds.get.map(s => s: scala.collection.Seq[Float]).toArray
    def patch: Option[LayoutPatch] = e.patch.map { pr =>
      LayoutPatch(spark.read.parquet(s"$wh/$pr/add"),
        spark.read.parquet(s"$wh/$pr/removed"), Some(pr))
    }
    e.kind match {
      case "pq" =>
        PqCodesLayout(e.idCol.get, e.valueCol.get,
          s"$wh/${e.path.get}/codes", seedArr, e.m.get, epoch, patch)
      case "ivfpq" =>
        IvfPqCellLayout(e.idCol.get, e.valueCol.get,
          s"$wh/${e.path.get}/codes", e.cents.get.map(c => (c.cid, c.vec)),
          seedArr, e.m.get, e.nProbe.get, epoch, patch)
      case "bucket" =>
        require(spark.catalog.tableExists(e.table.get),
          s"bucketed table ${e.table.get} not in this metastore")
        BucketedLayout(e.valueCol.get, e.table.get, e.buckets.get, epoch)
      case "range" =>
        val stats = spark.read.parquet(s"$wh/${e.path.get}/stats")
          .localCheckpoint(true)
        RangedLayout(e.valueCol.get, s"$wh/${e.path.get}/ranged", stats,
          e.files.get, epoch, idCol = e.idCol, patch = patch)
      case "lsh" =>
        // parquet-backed: the stored index is already at rest, no
        // checkpoint pin needed (that pin exists to avoid re-shingling a
        // LIVE plan)
        LshIndexLayout(e.idCol.get, e.valueCol.get, e.n.get,
          e.numHashes.get, e.bands.get,
          spark.read.parquet(s"$wh/${e.path.get}/index"), epoch, patch)
      case "postings" =>
        // a pre-r9 entry can lack the BM25 columns/scalars yet still
        // pass the digest gate (the digest covers the SOURCE columns,
        // not the stored index shape — ADVICE r9). Routing such a
        // layout would score BM25 from nDocs=0 / missing tf+dl:
        // schema drift declines the attach (live BM25 answers),
        // missing scalars backfill with one projection-agg pass.
        val storedCols =
          spark.read.parquet(s"$wh/${e.path.get}/postings").columns.toSet
        require(Set("term", "doc", "tf", "dl").subsetOf(storedCols),
          s"stored postings lack BM25 columns (${storedCols.mkString(",")})")
        val (nDocs, avgdl) = (e.nDocs, e.avgdl) match {
          case (Some(n), Some(a)) => (n, a)
          case _ =>
            val stats = graft.operators.Retrieval.postingsStats(
              base, e.valueCol.get)
            persistEntry(e.copy(nDocs = Some(stats._1),
              avgdl = Some(stats._2)))
            stats
        }
        PostingsLayout(e.idCol.get, e.valueCol.get, e.n.get,
          s"$wh/${e.path.get}/postings", epoch, patch,
          nDocs = nDocs, avgdl = avgdl)
      case "cube" =>
        CubeLayout(e.groupCols.get, e.measures.get,
          s"$wh/${e.path.get}/cube", epoch, patch)
      case "sketch" =>
        SketchLayout(e.groupCols.get, e.valueCol.get, e.n.get,
          s"$wh/${e.path.get}/sketches", epoch, patch)
      case "pairs" =>
        PairsLayout(e.groupCols.get, e.valueCol.get,
          s"$wh/${e.path.get}/pairs", epoch, patch)
      case "zorder" =>
        val stats = spark.read.parquet(s"$wh/${e.path.get}/stats")
          .localCheckpoint(true)
        // valueCol carries colX, idCol colY, keyCol the DML shadow key
        // (generic manifest fields)
        ZOrderedLayout(e.valueCol.get, e.idCol.get,
          s"$wh/${e.path.get}/zordered", stats, e.files.get, epoch,
          idCol = e.keyCol, patch = patch)
    }
  }.toOption

  private def sessionOf(name: String): EditorSession =
    sessions.getOrElse(name,
      throw new NoSuchElementException(s"no open session named '$name'"))

  /** Temp root for a file-backed layout, removed recursively at JVM exit
    * via the SHARED shutdown hook ([[Catalog.registerTempDir]] — one hook
    * draining a queue, not one hook per build, which would accumulate
    * unboundedly on a frequently edited session; ADVICE r8).
    * File.deleteOnExit cannot remove non-empty directories. Rebuilds
    * orphan the previous tree until exit; a lazily-planned reader may
    * still reference it.
    */
  private def layoutTempDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    Catalog.registerTempDir(d)
    d.toString
  }

  /** The routing decision for (session, slot): the layout to serve from,
    * if any, plus the report saying why / why not. `ok` is the entry
    * point's parameter guard — a registered, epoch-valid layout built
    * with DIFFERENT parameters than the caller's (another idCol, another
    * banding) must fall back to the live plan, because routing changes
    * the plan, never the answer.
    */
  private def decide(name: String, slot: String,
                     ok: TableLayout => Boolean):
      (Option[TableLayout], RouteReport) = {
    val (l, reason) = (sessions.get(name), layouts.get((name, slot))) match {
      case (None, _) => (None, "no-session")
      case (_, None) => (None, "no-layout")
      case (Some(s), Some(l0)) =>
        if (l0.builtAtEpoch != s.epoch) (None, "stale-epoch")
        else if (!ok(l0)) (None, "param-mismatch")
        else (Some(l0), "routed")
    }
    (l, RouteReport(slot, if (l.isDefined) "layout" else "live", reason))
  }

  // Routing decisions were silent through r8 — a caller could not tell
  // whether a query served from a layout or fell back, nor why. Every
  // routed entry point now records its report here (bounded ring,
  // oldest first), and explainRoute answers the question without
  // running anything.
  // synchronized: one catalog can serve typed and SQL entry points from
  // concurrent caller threads (the Verify pool does), and ArrayBuffer
  // mutation is not atomic
  private val routeLog = mutable.ArrayBuffer.empty[RouteReport]
  private def recordRoute(r: RouteReport): RouteReport =
    routeLog.synchronized {
      routeLog += r
      if (routeLog.size > 256) routeLog.remove(0, routeLog.size - 256)
      r
    }

  /** The most recent routing decisions of this catalog's entry points
    * (bounded to the last 256, oldest first).
    */
  def recentRoutes: Seq[RouteReport] =
    routeLog.synchronized(routeLog.toSeq)

  /** Dry-run of the routing decision for (session, slot): would a query
    * route through the registered layout, and if not, why — no-session /
    * no-layout / stale-epoch / param-mismatch. `paramsOk` is the same
    * guard the entry point would apply (e.g. [[topK]] requires the
    * layout's idCol to equal the caller's); omit it to check only
    * registration + epoch validity. Nothing is built, read, or recorded.
    */
  def explainRoute(name: String, slot: String,
                   paramsOk: TableLayout => Boolean = _ => true): RouteReport =
    decide(name, slot, paramsOk)._2

  /** Registered layouts (valid or stale) — the session's storage census. */
  def layoutsOf(name: String): Seq[(String, TableLayout)] =
    layouts.collect { case ((n, slot), l) if n == name => (slot, l) }.toSeq

  /** Refresh every STALE layout of a session at its current epoch — the
    * "after an edit burst" maintenance gesture: routing resumes on all
    * slots without the caller re-stating any build parameters. Returns
    * the refreshed slot names (valid layouts are left untouched).
    *
    * Refresh is INCREMENTAL where the session's mutation log allows it
    * ([[EditorSession.deltaSince]] — r8 verdict task #3): a keyed layout
    * (PQ / IVF-PQ / LSH) whose relevant columns were untouched simply
    * revalidates at the new epoch (zero IO); one touched by
    * position-bounded cell edits gets a DELTA PATCH — only the dirty
    * rows re-encode/re-sign, the corpus-sized base files are never
    * rewritten, and renamed-away ids are shadowed via
    * [[Catalog.LayoutPatch]]. Full rebuild remains for structural
    * gestures (splice/replace/pivot/undo — no recoverable delta), dirty
    * sets past [[deltaMaxRows]] (a patch that big loses to a rebuild),
    * and the full-row layouts (ranged, bucketed), whose stored rows have
    * no key a patch could shadow by.
    */
  def refreshStale(name: String): Seq[String] = {
    val s = sessionOf(name)
    layoutsOf(name).collect {
      case (slot, l) if l.builtAtEpoch != s.epoch => (slot, l)
    }.map { case (slot, l) => refreshSlot(name, s, slot, l); slot }
  }

  /** Above this many delta rows a patch loses to a rebuild (and the
    * serving-side anti-join stops being broadcast-trivial). Shared with
    * the session's mutation log, which stops retaining victim positions
    * past it. The override exists for specs that pin the rebuild
    * fallback without building a 4096-literal delete plan; it is
    * CLAMPED to [[EditorSession.deltaMaxRows]] (ADVICE r10) because the
    * session mutation log drops delete positions and victim plans at
    * that fixed bound — a larger override would promise a patch path
    * the log can no longer feed.
    */
  private val deltaMaxRows =
    deltaMaxRowsOverride.map(math.min(_, EditorSession.deltaMaxRows))
      .getOrElse(EditorSession.deltaMaxRows)

  /** Refresh one stale layout from the session's net mutation delta
    * ([[EditorSession.deltaSince]]). Three regimes per layout family:
    *
    *  - ID-KEYED (PQ / IVF-PQ / LSH / postings): untouched relevant
    *    columns with no row motion → revalidate (zero IO); bounded cell
    *    edits, INSERTS (paste — r9 task #2: new rows encode into the
    *    add-leg, nothing existing changes), and counted DELETES (≤
    *    [[deltaMaxRows]] — r9 finding #1: the bound keeps the
    *    `servedIds EXCEPT nowIds` shadow collect edit-sized) → delta
    *    patch; anything larger or unrecoverable → rebuild.
    *  - GROUP-KEYED (cube / sketch): edits sparing the group columns,
    *    inserts, and deletes WITH recoverable victims (the mutation log's
    *    pre-delete plan names the vanished rows' groups — r9 task #3,
    *    retraction IVM) → recompute exactly the affected groups and
    *    shadow them by key (a group emptied by deletes shadows with no
    *    add row); a group-column CELL edit still rebuilds (the rows'
    *    previous groups are unrecoverable from current state).
    *  - FULL-ROW (ranged / bucketed / z-ordered): any delta → rebuild
    *    (their stored rows have no key a patch could shadow by).
    */
  private def refreshSlot(name: String, s: EditorSession, slot: String,
                          l: TableLayout): Unit = {
    val delta = s.deltaSince(l.builtAtEpoch)

    def keyed(idCol: String, valCol: String, revalidate: () => Unit,
              patch: (Seq[Long], Boolean) => Unit): Unit = delta match {
      case None => rebuildSlot(name, l)
      case Some(d) =>
        val editsRelevant =
          d.dirtyCols.intersect(Set(idCol, valCol)).nonEmpty
        val touched =
          (if (editsRelevant) d.dirtyPos else Seq.empty) ++ d.insertedPos
        if (!editsRelevant && d.insertedPos.isEmpty && !d.hasDeletes)
          revalidate()
        else if (touched.size <= deltaMaxRows &&
            d.deleteCount <= deltaMaxRows)
          patch(touched, d.dirtyCols.contains(idCol) || d.hasDeletes)
        else rebuildSlot(name, l)
    }

    def grouped(groupCols: Set[String], valueCols: Set[String],
                revalidate: () => Unit,
                patch: (Seq[Long], Option[DataFrame]) => Unit): Unit =
      delta match {
        case None => rebuildSlot(name, l)
        case Some(d) =>
          val editsRelevant =
            d.dirtyCols.intersect(groupCols ++ valueCols).nonEmpty
          val touched =
            (if (editsRelevant) d.dirtyPos else Seq.empty) ++ d.insertedPos
          if (!editsRelevant && d.insertedPos.isEmpty && !d.hasDeletes)
            revalidate()
          else if (d.dirtyCols.intersect(groupCols).nonEmpty ||
              (d.hasDeletes && d.deletedRows.isEmpty) ||
              touched.size > deltaMaxRows || d.deleteCount > deltaMaxRows)
            rebuildSlot(name, l)
          else patch(touched, d.deletedRows)
      }

    def fullRow(idCol: Option[String], path: String,
                revalidate: () => Unit,
                patch: (Seq[Long], Boolean) => Unit): Unit =
      (idCol, delta) match {
        case (Some(id), Some(d)) =>
          val storedCols = Try(spark.read.parquet(path).columns.toSet)
            .getOrElse(Set.empty[String])
          val touched = d.dirtyPos ++ d.insertedPos
          if (!d.dirtyCols.subsetOf(storedCols)) rebuildSlot(name, l)
          else if (touched.isEmpty && !d.hasDeletes) revalidate()
          else if (touched.size <= deltaMaxRows &&
              d.deleteCount <= deltaMaxRows)
            patch(touched, d.dirtyCols.contains(id) || d.hasDeletes)
          else rebuildSlot(name, l)
        case _ => rebuildSlot(name, l)
      }

    l match {
      case p: PqCodesLayout =>
        keyed(p.idCol, p.vecCol,
          () => layouts((name, slot)) = p.copy(builtAtEpoch = s.epoch),
          (pos, ids) => patchPq(name, s, slot, p, pos, ids))
      case p: IvfPqCellLayout =>
        keyed(p.idCol, p.vecCol,
          () => layouts((name, slot)) = p.copy(builtAtEpoch = s.epoch),
          (pos, ids) => patchIvfPq(name, s, slot, p, pos, ids))
      case p: LshIndexLayout =>
        keyed(p.idCol, p.textCol,
          () => layouts((name, slot)) = p.copy(builtAtEpoch = s.epoch),
          (pos, ids) => patchLsh(name, s, slot, p, pos, ids))
      case p: PostingsLayout =>
        keyed(p.idCol, p.textCol,
          () => layouts((name, slot)) = p.copy(builtAtEpoch = s.epoch),
          (pos, ids) => patchPostings(name, s, slot, p, pos, ids,
            // a text edit, an inserted doc, or a row delete moves the
            // corpus scalars a routed BM25 reads; an id-only rename
            // (no row motion) keeps both — decided from the delta this
            // refresh already computed
            remeasure = delta.forall(d =>
              d.dirtyCols.contains(p.textCol) ||
                d.insertedPos.nonEmpty || d.hasDeletes)))
      case p: CubeLayout =>
        grouped(p.groupCols.toSet, p.measures.toSet,
          () => layouts((name, slot)) = p.copy(builtAtEpoch = s.epoch),
          (pos, victims) => patchCube(name, s, slot, p, pos, victims))
      case p: SketchLayout =>
        grouped(p.groupCols.toSet, Set(p.col),
          () => layouts((name, slot)) = p.copy(builtAtEpoch = s.epoch),
          (pos, victims) => patchSketch(name, s, slot, p, pos, victims))
      case p: PairsLayout =>
        // every stored column is a key column: cell edits rebuild (the
        // pre-edit tuple is unrecoverable), row motion delta-patches
        grouped((p.groupCols :+ p.col).toSet, Set.empty,
          () => layouts((name, slot)) = p.copy(builtAtEpoch = s.epoch),
          (pos, victims) => patchPairs(name, s, slot, p, pos, victims))
      // an id-keyed full-row layout (ranged / z-ordered) is
      // DML-patchable: every cell edit touches a stored row (all
      // columns are stored), so the only revalidation case is a
      // schema-only delta; a column ADD makes the stored schema stale
      // and rebuilds; without an id there is no shadow key
      case p: RangedLayout =>
        fullRow(p.idCol, p.path,
          () => layouts((name, slot)) = p.copy(builtAtEpoch = s.epoch),
          (pos, ids) => patchFullRow(name, s, slot, p, pos, ids))
      case p: ZOrderedLayout =>
        fullRow(p.idCol, p.path,
          () => layouts((name, slot)) = p.copy(builtAtEpoch = s.epoch),
          (pos, ids) => patchFullRow(name, s, slot, p, pos, ids))
      case _ => rebuildSlot(name, l)
    }
  }

  /** Full-row DML patch for an id-keyed clustered layout: the touched
    * ids' CURRENT full rows become the unclustered add-leg, their (and
    * any vanished) ids shadow out of the base — the clustered files and
    * their skipping stats never change, so pruning stays truthful and
    * the serve-side union is edit-count-sized. Past the merge bound the
    * accumulated legs fold into only the base files they intersect
    * ([[partialCompactFullRow]]); a full rebuild remains only when the
    * fold has no locality to exploit.
    */
  private def patchFullRow(name: String, s: EditorSession, slot: String,
                           l: TableLayout, pos: Seq[Long],
                           idsTouched: Boolean): Unit = {
    val (id, stats, oldPatch) = l match {
      case r: RangedLayout => (r.idCol.get, r.stats, r.patch)
      case z: ZOrderedLayout => (z.idCol.get, z.stats, z.patch)
      case _ => return
    }
    val changed = touchedRows(s, pos, id, Seq.empty).getOrElse {
      rebuildSlot(name, layouts((name, slot))); return // null key
    }
    val nowIds = Positional.strip(s.current).select(col(id).as("id"))
    val legs = mergeLegs(
      if (idsTouched) vanishedIds(
        patchedFullRows(fullRowBase(stats), Some(id), oldPatch)
          .select(col(id).as("id")), nowIds)
      else Array.empty[Any],
      oldPatch, changed, keyName = id)
    if (legs.removed.exists(_ == null)) {
      rebuildSlot(name, layouts((name, slot))) // null shadow key
      return
    }
    legsPatch(legs) match {
      case Some(patch) =>
        layouts((name, slot)) = l match {
          case r: RangedLayout =>
            r.copy(builtAtEpoch = s.epoch, patch = Some(patch))
          case z: ZOrderedLayout =>
            z.copy(builtAtEpoch = s.epoch, patch = Some(patch))
          case other => other
        }
        persistPatch(name, slot, patch, Seq.empty, s)
      case None =>
        if (!partialCompactFullRow(name, s, slot, l, id, legs))
          rebuildSlot(name, layouts((name, slot)))
    }
  }

  /** The full (unpatched) base of a clustered layout: the union of every
    * file its skipping stats list. After a [[partialCompactFullRow]] the
    * base spans the original dir plus merge dirs, so a path-based read
    * would miss rows — the stats ARE the file manifest.
    */
  private def fullRowBase(stats: DataFrame): DataFrame =
    spark.read.parquet(
      stats.select("file").collect().map(_.getString(0)).toIndexedSeq: _*)

  /** Total order over the driver-side stats/key values partial
    * compaction compares (numbers across widths, timestamps, dates,
    * strings); nulls first.
    */
  private def anyCmp(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => -1
    case (_, null) => 1
    case (x: java.lang.Number, y: java.lang.Number) =>
      java.lang.Double.compare(x.doubleValue(), y.doubleValue())
    case (x: Comparable[_], y: Any) =>
      x.asInstanceOf[Comparable[Any]].compareTo(y)
    case _ => 0
  }

  /** FILE-LOCAL compaction of a DML-patched clustered layout (r10
    * verdict task #3): when the accumulated patch outgrows the merge
    * bound, fold it into ONLY the base files it intersects — the files
    * holding a shadowed id (one id-column-pruned scan finds them) plus
    * the files whose key range each add row lands in (the skipping
    * stats know without IO). Those files rewrite re-clustered into a
    * fresh merge dir; EVERY OTHER base file stays byte-identical at its
    * original path, and the new stats are the untouched entries plus
    * freshly measured ones — pruning stays truthful and the layout
    * serves patch-free. At 100 TB this is a Delta/Iceberg-style minor
    * compaction: a localized edit burst rewrites the handful of files
    * it touched, never the corpus. Returns false (caller rebuilds) when
    * the fold would touch every file anyway.
    */
  private def partialCompactFullRow(name: String, s: EditorSession,
                                    slot: String, l: TableLayout,
                                    id: String,
                                    legs: MergedLegs): Boolean = {
    val stats = l match {
      case r: RangedLayout => r.stats
      case z: ZOrderedLayout => z.stats
      case _ => return false
    }
    // stable driver-side census of the base files (manifest-sized)
    val statsRows = stats.collect().sortBy(_.getAs[String]("file"))
    val allFiles = statsRows.map(_.getAs[String]("file"))
    implicit val ord: Ordering[Any] = (a, b) => anyCmp(a, b)

    // target file per add row: the file whose key range the row's
    // cluster value lands in (a gap value goes to its predecessor file;
    // a value outside every range to the first/containing-nearest).
    // Quality-only choice — the fresh stats keep pruning truthful.
    val assign: org.apache.spark.sql.Row => String = l match {
      case r: RangedLayout =>
        val vIdx = legs.schema.fieldIndex(r.column)
        val byMin = statsRows.sortBy(_.getAs[Any]("min_v"))
        row => {
          val v = row.get(vIdx)
          if (v == null) byMin.head.getAs[String]("file")
          else byMin.reverseIterator
            .find(sr => anyCmp(sr.getAs[Any]("min_v"), v) <= 0)
            .getOrElse(byMin.head).getAs[String]("file")
        }
      case z: ZOrderedLayout =>
        val xIdx = legs.schema.fieldIndex(z.colX)
        val yIdx = legs.schema.fieldIndex(z.colY)
        row => {
          val (x, y) = (row.get(xIdx), row.get(yIdx))
          statsRows.find(sr =>
            x != null && y != null &&
              anyCmp(sr.getAs[Any]("min_x"), x) <= 0 &&
              anyCmp(x, sr.getAs[Any]("max_x")) <= 0 &&
              anyCmp(sr.getAs[Any]("min_y"), y) <= 0 &&
              anyCmp(y, sr.getAs[Any]("max_y")) <= 0)
            .getOrElse(statsRows.head).getAs[String]("file")
        }
      case _ => return false
    }
    require(!legs.removed.contains(null),
      "null shadow key reached partialCompactFullRow: caller must rebuild")
    val targets: Set[String] = legs.add.map(assign).toSet
    val removedVals = legs.removed.toIndexedSeq
    val withRemoved: Set[String] =
      if (removedVals.isEmpty) Set.empty
      else fullRowBase(stats)
        .select(col(id), input_file_name().as("__f"))
        .filter(col(id).isInCollection(removedVals))
        .select("__f").distinct().collect().map(_.getString(0)).toSet
    val rewrite = targets ++ withRemoved
    if (rewrite.isEmpty) {
      // degenerate: the legs shadow nothing present and add nothing —
      // the layout is already base-exact, just drop the patch
      layouts((name, slot)) = l match {
        case r: RangedLayout => r.copy(builtAtEpoch = s.epoch, patch = None)
        case z: ZOrderedLayout =>
          z.copy(builtAtEpoch = s.epoch, patch = None)
        case other => other
      }
      manifest.get((name, slot)).foreach(e =>
        persistEntry(e.copy(patch = None, digest =
          contentDigest(Positional.strip(s.current), Seq.empty))))
      return true
    }
    if (rewrite.size >= allFiles.length) return false // no locality

    // the fold job: shadowed rows out, add rows in, re-clustered into a
    // fresh merge dir sized like the region it replaces
    val keep = spark.read.parquet(rewrite.toIndexedSeq: _*)
      .filter(col(id).isNull || !col(id).isInCollection(removedVals))
    val addDf = spark.createDataFrame(
      java.util.Arrays.asList(legs.add: _*), legs.schema)
    val merged = keep.unionByName(addDf)
    // a pure-delete fold can empty the merged region (every row of the
    // rewrite files shadowed, nothing added): the clustered writes can't
    // derive bucket bounds from zero rows, so write the schema-only
    // empty parquet plainly — its stats are zero rows, pruning exact
    val mergedEmpty = legs.add.isEmpty && merged.isEmpty
    val (dir, rel, dataDir, fresh) = l match {
      case r: RangedLayout =>
        val (d, rl) = layoutRoot("catalog_ranged_pc_")
        val dd = d + "/ranged"
        if (mergedEmpty) merged.coalesce(1).write.parquet(dd)
        else writeRangedData(merged, r.column, math.max(1, rewrite.size), dd)
        (d, rl, dd, graft.io.SkippingIndex.build(spark, dd, r.column))
      case z: ZOrderedLayout =>
        val (d, rl) = layoutRoot("catalog_zorder_pc_")
        val dd = d + "/zordered"
        if (mergedEmpty) merged.coalesce(1).write.parquet(dd)
        else writeZOrderedData(merged, z.colX, z.colY,
          math.max(1, rewrite.size), dd)
        (d, rl, dd,
          graft.io.SkippingIndex.build2d(spark, dd, z.colX, z.colY))
      case _ => return false
    }
    val newStats = stats
      .filter(!col("file").isInCollection(rewrite.toIndexedSeq))
      .unionByName(fresh)
      .localCheckpoint(true)
    layouts((name, slot)) = l match {
      case r: RangedLayout =>
        r.copy(builtAtEpoch = s.epoch, path = dataDir, stats = newStats,
          patch = None)
      case z: ZOrderedLayout =>
        z.copy(builtAtEpoch = s.epoch, path = dataDir, stats = newStats,
          patch = None)
      case other => other
    }
    rel.foreach { r =>
      newStats.write.parquet(dir + "/stats")
      val base = Positional.strip(s.current)
      // the base CHANGED, so the build-time signature sidecar must too —
      // a later diverged reopen diffs against what the files now hold
      writeRowSig(base, dir, col(id), Seq.empty)
      manifest.get((name, slot)).foreach(e => persistEntry(e.copy(
        path = Some(r), patch = None,
        digest = contentDigest(base, Seq.empty))))
    }
    true
  }

  private def rebuildSlot(name: String, l: TableLayout): Unit = l match {
    case l: PqCodesLayout =>
      buildPqLayout(name, l.idCol, l.vecCol, l.m); ()
    case l: IvfPqCellLayout =>
      buildIvfPqLayout(name, l.idCol, l.vecCol, l.cents.size, l.m,
        l.nProbe); ()
    case l: BucketedLayout =>
      buildBucketedLayout(name, l.key, l.buckets); ()
    case l: RangedLayout =>
      buildRangedLayout(name, l.column, l.files, l.idCol); ()
    case l: LshIndexLayout =>
      buildLshLayout(name, l.idCol, l.textCol, l.n, l.numHashes, l.bands)
    case l: PostingsLayout =>
      buildPostingsLayout(name, l.idCol, l.textCol, l.buckets); ()
    case l: CubeLayout =>
      buildCubeLayout(name, l.groupCols, l.measures); ()
    case l: SketchLayout =>
      buildSketchLayout(name, l.groupCols, l.col, l.lgK); ()
    case l: PairsLayout =>
      buildPairsLayout(name, l.groupCols, l.col); ()
    case l: ZOrderedLayout =>
      buildZOrderedLayout(name, l.colX, l.colY, l.files, l.idCol); ()
  }

  /** Every current row sharing an id with a touched position, as the
    * layout's column projection — the only data-sized input a delta
    * refresh touches. Two bounded jobs: the touched positions' ids
    * collect (≤ [[deltaMaxRows]], column-pruned), then an id-filtered
    * scan. Filtering by ID rather than by position keeps the patch
    * rebuild-equivalent even when an id repeats (every sibling row of a
    * touched id lands in the add-leg, so the by-id shadow can't drop
    * one) — and it's what lets INSERTED rows and edited rows share one
    * path.
    *
    * None when a touched row's id is NULL: a null key can't be shadowed
    * (the serve-side anti-join and the id filter here both skip nulls —
    * the same reason [[divergedAttach]] declines null keys), so the
    * caller must REBUILD rather than silently serve the stale row.
    */
  private def touchedRows(s: EditorSession, pos: Seq[Long], idCol: String,
                          cols: Seq[String]): Option[DataFrame] = {
    val base = Positional.strip(s.current)
    def proj(df: DataFrame) =
      if (cols.isEmpty) df else df.select(cols.map(col): _*) // empty = all
    if (pos.isEmpty) Some(proj(base).limit(0))
    else {
      val ids = s.current.filter(col(Positional.POS).isInCollection(pos))
        .select(col(idCol)).distinct().collect().map(_.get(0)).toSeq
      if (ids.contains(null)) None
      else Some(proj(base.filter(col(idCol).isInCollection(ids))))
    }
  }

  /** `servedIds EXCEPT nowIds` collected — the ids a patch must shadow
    * because they vanished from the session (deleted rows, renamed-away
    * ids). An id-only column-pruned pass; its result is bounded by the
    * caller's delete/edit counts (≤ 2×[[deltaMaxRows]]), which
    * [[refreshSlot]] guarantees before taking a patch path (r9 finding
    * #1: an unbounded delete used to collect every removed id here).
    */
  private def vanishedIds(servedIds: DataFrame,
                          nowIds: DataFrame): Array[Any] =
    servedIds.except(nowIds).collect().map(_.get(0))

  /** Merge the previous patch (if any) with this refresh's delta.
    * `add0` = freshly encoded rows of the touched ids; `removedNew0` =
    * extra keys to shadow beyond the add rows' own (vanished ids,
    * emptied groups) — evaluated once, only here.
    *
    * The merge itself happens DRIVER-side: both patch legs are
    * edit-count-sized (the caller's [[deltaMaxRows]] guard), so they
    * collect once and become LocalRelations — no job ever re-derives
    * them, serving broadcasts them for free, and the old patch folds in
    * as a hash-set filter, not a join.
    */
  /** Accumulated patch legs above this many rows lose to a compaction:
    * each refresh is delta-bounded, but the MERGE accumulates across
    * refresh cycles, and an ever-growing leg would eventually dominate
    * the serve-side broadcast. Callers treat a None from [[mergedPatch]]
    * as "compact now": keyed layouts MERGE-COMPACT ([[compactKeyed]] —
    * an IO-bound stored-size rewrite, never a corpus re-encode),
    * clustered layouts fold file-locally ([[partialCompactFullRow]]);
    * a full rebuild remains only where no cheaper fold exists.
    */
  private val compactionRows = 8 * deltaMaxRows

  /** MERGE-COMPACT a keyed layout past the patch bound (r11): fold the
    * accumulated legs into a rewritten copy of the STORED relation —
    * shadowed keys filtered out, the already-encoded add rows appended —
    * so compaction costs an IO-bound rewrite of the stored-size data.
    * The corpus is never re-read: a PQ compaction copies codes instead
    * of re-running the encoder, an LSH compaction copies signatures
    * instead of re-shingling, a cube/pairs compaction copies
    * group-count-sized rows instead of re-aggregating the fact table.
    * Build parameters (codebook seeds, banding, lgK) are preserved, so
    * the folded relation equals base-plus-patch serving exactly.
    *
    * @return the folded relation read back at rest, and its storage path
    */
  private def compactKeyed(name: String, slot: String, s: EditorSession,
      base: DataFrame, legs: MergedLegs, keyName: String,
      prefix: String, subdir: String, digestCols: Seq[String],
      sig: Option[(org.apache.spark.sql.Column, Seq[String])],
      write: (DataFrame, String) => Unit = (df, p) => df.write.parquet(p),
      entry: LayoutManifestEntry => LayoutManifestEntry = identity)
      : (DataFrame, String) = {
    require(!legs.removed.contains(null),
      "null shadow key reached compactKeyed: the caller must rebuild")
    val removed = legs.removed.toIndexedSeq
    val addDf = spark.createDataFrame(
        java.util.Arrays.asList(legs.add: _*), legs.schema)
      .withColumnRenamed(legs.schema(legs.idIdx).name, keyName)
    val folded =
      (if (removed.isEmpty) base
       else base.filter(col(keyName).isNull ||
         !col(keyName).isInCollection(removed)))
        .unionByName(addDf)
    val (dir, rel) = layoutRoot(prefix)
    val path = s"$dir/$subdir"
    write(folded, path)
    rel.foreach { r =>
      val cur = Positional.strip(s.current)
      // the stored base changed: re-sign and re-digest the folded state
      // so diverged reopens diff against what the files now hold. The
      // caller's `entry` transform folds its kind-specific fields
      // (postings scalars) into the SAME persist — one manifest write.
      sig.foreach { case (k, cols) => writeRowSig(cur, dir, k, cols) }
      manifest.get((name, slot)).foreach(e => persistEntry(entry(e.copy(
        path = Some(r), patch = None,
        digest = contentDigest(cur, digestCols)))))
    }
    (spark.read.parquet(path), path)
  }

  /** The shared patch-or-compact dispatch of the keyed layouts: a NULL
    * shadow key (a vanished null-id row — the anti-join could never
    * apply it, and a fold would bake the stale row in permanently)
    * REBUILDS; bounded legs persist as a patch; past the bound the
    * layout merge-compacts via `compact`.
    */
  private def applyLegs(name: String, slot: String, s: EditorSession,
                        legs: MergedLegs, digestCols: Seq[String])(
      compact: MergedLegs => TableLayout)(
      patched: LayoutPatch => TableLayout): Unit =
    if (legs.removed.exists(_ == null))
      rebuildSlot(name, layouts((name, slot)))
    else legsPatch(legs) match {
      case Some(p) =>
        layouts((name, slot)) = patched(p)
        persistPatch(name, slot, p, digestCols, s)
      case None =>
        layouts((name, slot)) = compact(legs)
    }

  /** The driver-side merged patch state: every add row (old legs minus
    * superseded keys, plus this refresh's), every key to shadow, and the
    * add rows' schema + key index — enough for [[legsPatch]] to persist
    * OR for [[partialCompactFullRow]] to fold into base files.
    */
  private case class MergedLegs(add: Array[org.apache.spark.sql.Row],
                                removed: Array[Any],
                                schema: org.apache.spark.sql.types.StructType,
                                idIdx: Int)

  private def mergeLegs(removedNew0: => Array[Any],
                        oldPatch: Option[LayoutPatch],
                        add0: DataFrame,
                        keyName: String = "id"): MergedLegs = {
    import org.apache.spark.sql.Row
    val addSchema = add0.schema
    val idIdx = addSchema.fieldIndex(keyName)
    val addNew = add0.collect()
    val removedNew: Array[Any] = removedNew0
    val newKeys: Set[Any] =
      (addNew.map(_.get(idIdx)) ++ removedNew).toSet
    val oldAdd = oldPatch.map(_.add.collect()).getOrElse(Array.empty[Row])
      .filterNot(r => newKeys.contains(r.get(idIdx)))
    val oldRemoved = oldPatch
      .map(_.removed.collect().map(_.get(0))).getOrElse(Array.empty[Any])
    MergedLegs(oldAdd ++ addNew,
      (oldRemoved ++ removedNew ++ addNew.map(_.get(idIdx))).distinct,
      addSchema, idIdx)
  }

  /** Persist merged legs as a patch, or None past the compaction bound.
    * A null shadow key is a PROGRAMMING error here — no anti-join can
    * apply it — so it fails loudly; callers must route null-key deltas
    * to a rebuild first (the [[applyLegs]] / call-site guards).
    */
  private def legsPatch(legs: MergedLegs): Option[LayoutPatch] = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StructType
    require(!legs.removed.contains(null),
      "null shadow key reached legsPatch: the caller must rebuild")
    if (legs.add.length > compactionRows ||
        legs.removed.length > compactionRows) return None
    val idSchema = StructType(Seq(legs.schema(legs.idIdx).copy(name = "id")))
    val addDf = spark.createDataFrame(
      java.util.Arrays.asList(legs.add: _*), legs.schema)
    val removedDf = spark.createDataFrame(
      java.util.Arrays.asList(legs.removed.map(Row(_)): _*), idSchema)
    Some(warehouse match {
      case Some(_) =>
        val (dir, rel) = layoutRoot("catalog_patch_")
        addDf.write.parquet(dir + "/add")
        removedDf.write.parquet(dir + "/removed")
        LayoutPatch(spark.read.parquet(dir + "/add"),
          spark.read.parquet(dir + "/removed"), rel)
      case None => LayoutPatch(addDf, removedDf, None)
    })
  }

  private def mergedPatch(removedNew0: => Array[Any],
                          oldPatch: Option[LayoutPatch],
                          add0: DataFrame,
                          keyName: String = "id"): Option[LayoutPatch] =
    legsPatch(mergeLegs(removedNew0, oldPatch, add0, keyName))

  private def patchPq(name: String, s: EditorSession, slot: String,
                      p: PqCodesLayout, pos: Seq[Long],
                      idsTouched: Boolean): Unit = {
    val changed = touchedRows(s, pos, p.idCol, Seq(p.idCol, p.vecCol))
      .getOrElse { rebuildSlot(name, p); return } // null key: no shadow
    val add0 = graft.operators.Similarity.pqCodes(changed, p.idCol,
      p.vecCol, p.seeds, p.m)
    val nowIds = Positional.strip(s.current).select(col(p.idCol).as("id"))
    val legs = mergeLegs(
      if (idsTouched) vanishedIds(
        patchedCodes(spark.read.parquet(p.path), p.patch).select("id"),
        nowIds)
      else Array.empty[Any],
      p.patch, add0)
    applyLegs(name, slot, s, legs, Seq(p.idCol, p.vecCol)) { lg =>
      // merge-compact: codes copy, no re-encode
      val (_, path) = compactKeyed(name, slot, s,
        spark.read.parquet(p.path), lg, "id", "catalog_pq_", "codes",
        Seq(p.idCol, p.vecCol),
        Some((col(p.idCol), Seq(p.idCol, p.vecCol))))
      p.copy(builtAtEpoch = s.epoch, path = path, patch = None)
    }(patch => p.copy(builtAtEpoch = s.epoch, patch = Some(patch)))
  }

  private def patchIvfPq(name: String, s: EditorSession, slot: String,
                         p: IvfPqCellLayout, pos: Seq[Long],
                         idsTouched: Boolean): Unit = {
    val changed = touchedRows(s, pos, p.idCol, Seq(p.idCol, p.vecCol))
      .getOrElse { rebuildSlot(name, p); return } // null key: no shadow
    val add0 = graft.operators.Similarity.ivfPqEncodeWith(changed, p.idCol,
      p.vecCol, p.cents, p.seeds, p.m)
    val nowIds = Positional.strip(s.current).select(col(p.idCol).as("id"))
    val legs = mergeLegs(
      if (idsTouched) vanishedIds(
        patchedCodes(spark.read.parquet(p.path), p.patch).select("id"),
        nowIds)
      else Array.empty[Any],
      p.patch, add0)
    applyLegs(name, slot, s, legs, Seq(p.idCol, p.vecCol)) { lg =>
      // merge-compact: cell-partitioned codes copy
      val (_, path) = compactKeyed(name, slot, s,
        spark.read.parquet(p.path), lg, "id", "catalog_ivfpq_",
        "codes", Seq(p.idCol, p.vecCol),
        Some((col(p.idCol), Seq(p.idCol, p.vecCol))),
        write = (df, out) =>
          graft.io.Formats.writePartitioned(df, out, Seq("__ivf_cid")))
      p.copy(builtAtEpoch = s.epoch, path = path, patch = None)
    }(patch => p.copy(builtAtEpoch = s.epoch, patch = Some(patch)))
  }

  /** LSH delta: re-sign only the dirty docs and shadow their (and any
    * renamed-away) ids out of the stored index — the corpus is never
    * re-shingled. `index` stays the immutable BASE; probes serve the
    * [[patchedCodes]] composition, same as the codes layouts.
    */
  private def patchLsh(name: String, s: EditorSession, slot: String,
                       p: LshIndexLayout, pos: Seq[Long],
                       idsTouched: Boolean): Unit = {
    val changed = touchedRows(s, pos, p.idCol, Seq(p.idCol, p.textCol))
      .getOrElse { rebuildSlot(name, p); return } // null key: no shadow
    val add0 = graft.operators.Dedup.lshIndex(changed, p.idCol, p.textCol,
      p.n, p.numHashes, p.bands)
    val nowIds = Positional.strip(s.current).select(col(p.idCol).as("id"))
    val legs = mergeLegs(
      if (idsTouched)
        vanishedIds(patchedCodes(p.index, p.patch).select("id"), nowIds)
      else Array.empty[Any],
      p.patch, add0)
    applyLegs(name, slot, s, legs, Seq(p.idCol, p.textCol)) { lg =>
      // merge-compact: index copy, corpus never re-shingled
      val (folded, _) = compactKeyed(name, slot, s, p.index, lg, "id",
        "catalog_lsh_", "index", Seq(p.idCol, p.textCol),
        Some((col(p.idCol), Seq(p.idCol, p.textCol))))
      p.copy(builtAtEpoch = s.epoch, index = folded, patch = None)
    }(patch => p.copy(builtAtEpoch = s.epoch, patch = Some(patch)))
  }

  /** Postings delta: re-tokenize only the dirty docs; their (and any
    * renamed-away) doc ids are shadowed out of the stored (term, doc)
    * base — doc-keyed where the codes patches are id-keyed one-row-per-
    * id, but [[mergedPatch]]'s key set handles the multi-row-per-doc
    * shape unchanged (every row of a re-edited doc is in `add`, the doc
    * id is in `removed`). The bucketed base files are never rewritten.
    */
  private def patchPostings(name: String, s: EditorSession, slot: String,
                            p: PostingsLayout, pos: Seq[Long],
                            idsTouched: Boolean,
                            remeasure: Boolean): Unit = {
    val changed = touchedRows(s, pos, p.idCol, Seq(p.idCol, p.textCol))
      .getOrElse { rebuildSlot(name, p); return } // null key: no shadow
    val add0 = graft.operators.Retrieval.postingsRowsFor(changed, p.idCol,
      p.textCol, p.buckets)
    val nowIds = Positional.strip(s.current).select(col(p.idCol).as("id"))
    val legs = mergeLegs(
      if (idsTouched) vanishedIds(
        patchedPostings(p).select(col("doc").as("id")), nowIds)
      else Array.empty[Any],
      p.patch, add0)
    // the re-measure is one projection-agg pass, no explode, no
    // index rewrite — the exact-stats cost of the delta
    def scalars(): (Long, Double) =
      if (remeasure)
        graft.operators.Retrieval.postingsStats(
          Positional.strip(s.current), p.textCol)
      else (p.nDocs, p.avgdl)
    if (legs.removed.exists(_ == null)) {
      rebuildSlot(name, p) // null shadow key: see [[applyLegs]]
      return
    }
    legsPatch(legs) match {
      case None => // merge-compact: bucketed copy, never re-tokenized
        val (nDocs, avgdl) = scalars()
        val (_, path) = compactKeyed(name, slot, s,
          spark.read.parquet(p.path), legs, "doc", "catalog_postings_",
          "postings", Seq(p.idCol, p.textCol),
          Some((col(p.idCol), Seq(p.idCol, p.textCol))),
          write = (df, out) => df.repartition(p.buckets, col("__tb"))
            .write.partitionBy("__tb").parquet(out),
          // the scalars ride the compaction's own manifest write
          entry = e => e.copy(nDocs = Some(nDocs), avgdl = Some(avgdl)))
        layouts((name, slot)) = p.copy(builtAtEpoch = s.epoch,
          path = path, patch = None, nDocs = nDocs, avgdl = avgdl)
      case Some(patch) =>
        val (nDocs, avgdl) = scalars()
        layouts((name, slot)) = p.copy(builtAtEpoch = s.epoch,
          patch = Some(patch), nDocs = nDocs, avgdl = avgdl)
        persistPatch(name, slot, patch, Seq(p.idCol, p.textCol), s)
        // the manifest must carry the re-measured scalars too, or a
        // reopened catalog would score BM25 with the pre-edit avgdl
        patch.path.foreach { _ =>
          manifest.get((name, slot)).foreach(e =>
            persistEntry(e.copy(nDocs = Some(nDocs), avgdl = Some(avgdl))))
        }
    }
  }

  /** Serving view of a (possibly patched) postings layout: the patch is
    * doc-keyed while the stored rows are (term, doc), so the shadow is
    * an anti-join on `doc` and the add rows rename their patch key back.
    */
  private def patchedPostings(p: PostingsLayout): DataFrame = {
    val base = spark.read.parquet(p.path)
    p.patch.fold(base) { pt =>
      base.join(broadcast(pt.removed), base("doc") === pt.removed("id"),
          "left_anti")
        .unionByName(pt.add.withColumnRenamed("id", "doc"))
    }
  }

  /** Serving view of a (possibly patched) codes layout: base minus
    * shadowed ids, plus the patch rows — a broadcast anti-join over an
    * edit-count-sized relation, never a base rewrite.
    */
  private def patchedCodes(base: DataFrame,
                           patch: Option[LayoutPatch]): DataFrame =
    patch.fold(base) { pt =>
      base.join(broadcast(pt.removed), Seq("id"), "left_anti")
        .unionByName(pt.add)
    }

  /** Update the manifest after a delta refresh: the entry keeps its
    * build parameters but points at the merged patch dir, and its digest
    * re-records the EDITED table so a reopen re-attaches the patched
    * layout (one column-pruned scan — still no corpus re-encode).
    */
  private def persistPatch(name: String, slot: String, patch: LayoutPatch,
                           digestCols: Seq[String],
                           s: EditorSession): Unit =
    patch.path.foreach { rel =>
      manifest.get((name, slot)).foreach { e =>
        persistEntry(e.copy(patch = Some(rel),
          digest = contentDigest(Positional.strip(s.current), digestCols)))
      }
    }

  /** Encode `vecCol` ONCE into an at-rest PQ codes parquet (8 small ints
    * where 64 floats were) and register it; [[topK]] on this session then
    * searches stored codes — m table lookups per row, no re-encode, no
    * raw vector touched — until the session mutates.
    */
  def buildPqLayout(name: String, idCol: String, vecCol: String,
                    m: Int = 8): String = {
    val s = sessionOf(name)
    val base = Positional.strip(s.current)
    val seeds = graft.operators.Similarity.pqCodebook(base, idCol, vecCol)
    val (dir, rel) = layoutRoot("catalog_pq_")
    val path = dir + "/codes"
    graft.operators.Similarity.pqCodes(base, idCol, vecCol, seeds, m)
      .write.parquet(path)
    layouts((name, s"ann:$vecCol")) =
      PqCodesLayout(idCol, vecCol, path, seeds, m, s.epoch)
    rel.foreach { r =>
      writeRowSig(base, dir, col(idCol), Seq(idCol, vecCol))
      persistEntry(LayoutManifestEntry(
        session = name, slot = s"ann:$vecCol", kind = "pq",
        digest = contentDigest(base, Seq(idCol, vecCol)), path = Some(r),
        idCol = Some(idCol), valueCol = Some(vecCol), m = Some(m),
        seeds = Some(seeds.map(_.toSeq).toSeq)))
    }
    path
  }

  /** IVF-PQ at-rest layout: codes written once PARTITIONED BY coarse cell,
    * so a routed [[topK]] probe prunes cell partitions at plan time and
    * ranks survivors from stored codes (the FAISS inverted-file shape).
    * Registers over the same `ann:vecCol` slot — last build wins.
    */
  def buildIvfPqLayout(name: String, idCol: String, vecCol: String,
                       nCentroids: Int = 8, m: Int = 8,
                       nProbe: Int = 4): String = {
    val s = sessionOf(name)
    val base = Positional.strip(s.current)
    val (codes, cents, seeds) = graft.operators.Similarity.ivfPqCodes(
      base, idCol, vecCol, nCentroids, m)
    val (dir, rel) = layoutRoot("catalog_ivfpq_")
    val path = dir + "/codes"
    graft.io.Formats.writePartitioned(codes, path, Seq("__ivf_cid"))
    layouts((name, s"ann:$vecCol")) =
      IvfPqCellLayout(idCol, vecCol, path, cents, seeds, m, nProbe, s.epoch)
    rel.foreach { r =>
      writeRowSig(base, dir, col(idCol), Seq(idCol, vecCol))
      persistEntry(LayoutManifestEntry(
        session = name, slot = s"ann:$vecCol", kind = "ivfpq",
        digest = contentDigest(base, Seq(idCol, vecCol)), path = Some(r),
        idCol = Some(idCol), valueCol = Some(vecCol), m = Some(m),
        nProbe = Some(nProbe),
        seeds = Some(seeds.map(_.toSeq).toSeq),
        cents = Some(cents.map { case (cid, v) => CentEntry(cid, v) })))
    }
    path
  }

  /** Write the session bucketed+sorted on `key` as a managed table and
    * register it; [[join]] on this key then plans exchange-free while the
    * session stays unedited.
    */
  def buildBucketedLayout(name: String, key: String, buckets: Int): String = {
    val s = sessionOf(name)
    // the managed-table name carries this Catalog's instance id: two
    // catalogs in one JVM (e.g. per-sfDir memoized ones) reusing the same
    // session names must not clobber each other's bucketed tables — the
    // first catalog's layout would stay epoch-valid and silently route
    // the second catalog's data
    val tbl = s"graft_c${catalogId}_${name}_by_$key".toLowerCase
    val base = Positional.strip(s.current)
    graft.io.Bucketing.writeBucketed(base, tbl, key, buckets)
    layouts((name, s"bucket:$key")) = BucketedLayout(key, tbl, buckets, s.epoch)
    persistEntry(LayoutManifestEntry(
      session = name, slot = s"bucket:$key", kind = "bucket",
      digest = contentDigest(base, Seq.empty), table = Some(tbl),
      valueCol = Some(key), buckets = Some(buckets)))
    tbl
  }

  /** MinHash-LSH index the session's text column once
    * ([[graft.operators.Dedup.lshIndex]]: per-doc signatures + banded
    * buckets, localCheckpoint-pinned so probes never re-shingle the
    * corpus) and register it; [[nearDups]] then probes arriving batches
    * against the stored index — the nightly-ingest dedup hop.
    */
  def buildLshLayout(name: String, idCol: String, textCol: String,
                     n: Int = 3, numHashes: Int = 128,
                     bands: Int = 64): Unit = {
    val s = sessionOf(name)
    val base = Positional.strip(s.current)
    val idx0 = graft.operators.Dedup.lshIndex(base, idCol, textCol, n,
      numHashes, bands)
    // durable: the index parquet IS the at-rest pin (probes read files,
    // never re-shingle); process-local: localCheckpoint pins the blocks
    val idx =
      if (warehouse.isDefined) {
        val (dir, rel) = layoutRoot("catalog_lsh_")
        idx0.write.parquet(dir + "/index")
        rel.foreach { r =>
          writeRowSig(base, dir, col(idCol), Seq(idCol, textCol))
          persistEntry(LayoutManifestEntry(
            session = name, slot = s"lsh:$textCol", kind = "lsh",
            digest = contentDigest(base, Seq(idCol, textCol)), path = Some(r),
            idCol = Some(idCol), valueCol = Some(textCol), n = Some(n),
            numHashes = Some(numHashes), bands = Some(bands)))
        }
        spark.read.parquet(dir + "/index")
      } else idx0.localCheckpoint(true)
    layouts((name, s"lsh:$textCol")) =
      LshIndexLayout(idCol, textCol, n, numHashes, bands, idx, s.epoch)
  }

  /** Near-duplicate probe of `batch` against an open session,
    * layout-routed: a valid LSH layout serves the probe from the stored
    * index (batch-sized signature work + band equi-join — the corpus is
    * never re-shingled); without one, the index is built from the live
    * session plan for this call (same answer, corpus-sized work). The
    * batch must carry the same id/text column names the layout indexed.
    * The layout is used only when the caller's (idCol, n, numHashes,
    * bands) MATCH what it was built with — routing changes the plan,
    * never the answer, so a parameter mismatch falls back to a live
    * index built with the caller's parameters rather than silently
    * serving a differently-banded pair set.
    */
  def nearDups(name: String, batch: DataFrame, idCol: String,
               textCol: String, threshold: Double = 0.4,
               n: Int = 3, numHashes: Int = 128,
               bands: Int = 64): DataFrame = {
    val (lay, rep) = decide(name, s"lsh:$textCol", {
      case l: LshIndexLayout => l.idCol == idCol && l.n == n &&
        l.numHashes == numHashes && l.bands == bands
      case _ => false
    })
    recordRoute(rep)
    lay match {
      case Some(l: LshIndexLayout) =>
        graft.operators.Dedup.incrementalLshMatches(
          patchedCodes(l.index, l.patch), batch,
          l.idCol, l.textCol, l.n, threshold, l.numHashes, l.bands)
      case _ =>
        val idx = graft.operators.Dedup.lshIndex(
          Positional.strip(sessionOf(name).current), idCol, textCol, n,
          numHashes, bands)
        graft.operators.Dedup.incrementalLshMatches(idx, batch, idCol,
          textCol, n, threshold, numHashes, bands)
    }
  }

  /** Write the session's inverted index bucketed by term hash
    * ([[graft.operators.Retrieval.writePostingsBucketed]]: one (term,
    * doc) row per distinct per-doc term, directory-partitioned on the
    * term's hash bucket) and register it; [[termPostings]] then serves a
    * term lookup from a partition-pruned read of ~|terms|/buckets of the
    * index — the at-scale retrieval side of BM25, replacing the
    * O(corpus) posting-list string a stop-word-grade term costs in the
    * report-shaped [[graft.operators.Retrieval.postings]].
    */
  def buildPostingsLayout(name: String, idCol: String, textCol: String,
                          buckets: Int = 64): String = {
    val s = sessionOf(name)
    val base = Positional.strip(s.current)
    val (dir, rel) = layoutRoot("catalog_postings_")
    val path = dir + "/postings"
    graft.operators.Retrieval.writePostingsBucketed(base, idCol, textCol,
      path, buckets)
    val (nDocs, avgdl) =
      graft.operators.Retrieval.postingsStats(base, textCol)
    layouts((name, s"postings:$textCol")) =
      PostingsLayout(idCol, textCol, buckets, path, s.epoch,
        nDocs = nDocs, avgdl = avgdl)
    rel.foreach { r =>
      writeRowSig(base, dir, col(idCol), Seq(idCol, textCol))
      persistEntry(LayoutManifestEntry(
        session = name, slot = s"postings:$textCol", kind = "postings",
        digest = contentDigest(base, Seq(idCol, textCol)), path = Some(r),
        idCol = Some(idCol), valueCol = Some(textCol), n = Some(buckets),
        nDocs = Some(nDocs), avgdl = Some(avgdl)))
    }
    path
  }

  /** Lexical BM25 retrieval, layout-routed: a valid postings layout on
    * (session, textCol) built with the caller's idCol scores the query
    * terms from stored (tf, dl) rows in the terms' pruned hash buckets
    * plus the layout's two corpus scalars — the corpus is never
    * re-tokenized, and the digits equal the live
    * [[graft.operators.Retrieval.bm25]] (shared scoring tail, exact
    * global df from the term-complete buckets). Without a valid layout
    * the live corpus-pass BM25 runs. Output: (idCol, score).
    */
  def searchBm25(name: String, idCol: String, textCol: String,
                 terms: Seq[String], k1: Double = 1.2,
                 b: Double = 0.75): DataFrame = {
    val (lay, rep) = decide(name, s"postings:$textCol", {
      case l: PostingsLayout => l.idCol == idCol
      case _ => false
    })
    recordRoute(rep)
    lay match {
      case Some(l: PostingsLayout) =>
        graft.operators.Retrieval.bm25FromPostings(spark,
          patchedPostings(l), l.buckets, l.nDocs, l.avgdl, idCol, terms,
          k1, b)
      case _ =>
        graft.operators.Retrieval.bm25(
          Positional.strip(sessionOf(name).current), idCol, textCol,
          terms, k1, b)
    }
  }

  /** Posting lists for a probe term set, layout-routed: a valid postings
    * layout on (session, textCol) built with the caller's idCol serves
    * the lookup from the bucketed index (plan-time directory pruning —
    * non-probed buckets never open); otherwise the corpus re-tokenizes
    * under the live session plan. Output (term, df, plist) either way.
    */
  def termPostings(name: String, idCol: String, textCol: String,
                   terms: Seq[String]): DataFrame = {
    val (lay, rep) = decide(name, s"postings:$textCol", {
      case l: PostingsLayout => l.idCol == idCol
      case _ => false
    })
    recordRoute(rep)
    lay match {
      case Some(l: PostingsLayout) =>
        graft.operators.Retrieval.termLookupFrom(spark, patchedPostings(l),
          terms, l.buckets)
      case _ =>
        graft.operators.Retrieval.postingsFor(
          Positional.strip(sessionOf(name).current), idCol, textCol, terms)
    }
  }

  /** Range-cluster the session on a numeric column (range repartition →
    * sorted part files) with a min/max file-skipping index
    * ([[graft.io.SkippingIndex]] — the Delta/Iceberg data-skipping shape)
    * and register it; [[rangeScan]] on this column then opens only the
    * part files whose value range intersects the predicate. Passing an
    * `idCol` makes the layout DML-PATCHABLE (see [[Catalog
    * .RangedLayout]]): bounded edits/inserts/deletes refresh without
    * re-clustering.
    */
  /** Range-cluster `df` on `column` into `files` sorted part files. */
  private def writeRangedData(df: DataFrame, column: String, files: Int,
                              path: String): Unit =
    df.repartitionByRange(files, col(column))
      .sortWithinPartitions(column)
      .write.parquet(path)

  def buildRangedLayout(name: String, column: String, files: Int = 8,
                        idCol: Option[String] = None): String = {
    val s = sessionOf(name)
    val base = Positional.strip(s.current)
    val (dir, rel) = layoutRoot("catalog_ranged_")
    val path = dir + "/ranged"
    writeRangedData(base, column, files, path)
    val stats = graft.io.SkippingIndex.build(spark, path, column)
      .localCheckpoint(true) // manifest-sized; pin so probes don't rescan
    layouts((name, s"range:$column")) = RangedLayout(column, path, stats,
      files, s.epoch, idCol = idCol)
    rel.foreach { r =>
      stats.write.parquet(dir + "/stats") // file-count-sized sidecar
      idCol.foreach(id => writeRowSig(base, dir, col(id), Seq.empty))
      persistEntry(LayoutManifestEntry(
        session = name, slot = s"range:$column", kind = "range",
        digest = contentDigest(base, Seq.empty), path = Some(r),
        valueCol = Some(column), files = Some(files), idCol = idCol))
    }
    path
  }

  /** Serving view of a full-row layout's (possibly patched) pruned
    * read: base files minus the shadowed ids (broadcast anti-join on
    * the layout's OWN id column) plus the unclustered add-leg — the
    * caller's exact predicate on top keeps answers byte-identical, and
    * the skipping stats stay truthful because base files never change.
    */
  private def patchedFullRows(base: DataFrame, idCol: Option[String],
                              patch: Option[LayoutPatch]): DataFrame =
    (idCol, patch) match {
      case (Some(id), Some(pt)) =>
        base.join(broadcast(pt.removed), base(id) === pt.removed("id"),
            "left_anti")
          .unionByName(pt.add)
      case _ => base
    }

  /** Z-order the session on two numeric columns: each is min/max-scaled
    * to a 16-bit bucket, the Morton interleave becomes the range-
    * partitioning key, and a per-file min/max index over BOTH columns is
    * built in one scan ([[graft.io.SkippingIndex.build2d]]); a routed
    * [[rangeScan2d]] then opens only the part files whose (x, y)
    * rectangle intersects the predicate — pruning on EITHER dimension,
    * which a single-column clustering cannot give.
    */
  /** Morton-cluster `df` on (colX, colY) into `files` part files. Each
    * dimension bucketizes in ITS OWN type's monotone double image (r10
    * verdict task #7: the events-table time × numeric rectangle needs a
    * timestamp dimension) — the image only orders rows for the
    * interleave; stats and predicates stay in the column's type.
    */
  private def writeZOrderedData(df: DataFrame, colX: String, colY: String,
                                files: Int, path: String): Unit = {
    def dimd(c: String): org.apache.spark.sql.Column = {
      import org.apache.spark.sql.types._
      df.schema(c).dataType match {
        case _: NumericType => col(c).cast("double")
        case TimestampType | TimestampNTZType | DateType =>
          col(c).cast("timestamp").cast("double") // epoch seconds
        case other => throw new IllegalArgumentException(
          s"z-order needs numeric/timestamp/date columns; '$c' is $other")
      }
    }
    val b = df.agg(min(dimd(colX)), max(dimd(colX)),
      min(dimd(colY)), max(dimd(colY))).head()
    def bucket(c: String, lo: Double, hi: Double) = {
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      ((dimd(c) - lo) / span * ((1 << 16) - 1)).cast("long")
    }
    val z = graft.operators.ZOrder.zValue(
      bucket(colX, b.getDouble(0), b.getDouble(1)),
      bucket(colY, b.getDouble(2), b.getDouble(3)), bitsPer = 16)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.parquet(path)
  }

  def buildZOrderedLayout(name: String, colX: String, colY: String,
                          files: Int = 16,
                          idCol: Option[String] = None): String = {
    val s = sessionOf(name)
    val base = Positional.strip(s.current)
    val (dir, rel) = layoutRoot("catalog_zorder_")
    val path = dir + "/zordered"
    writeZOrderedData(base, colX, colY, files, path)
    val stats = graft.io.SkippingIndex.build2d(spark, path, colX, colY)
      .localCheckpoint(true) // manifest-sized; pin so probes don't rescan
    layouts((name, s"zorder:$colX,$colY")) =
      ZOrderedLayout(colX, colY, path, stats, files, s.epoch,
        idCol = idCol)
    rel.foreach { r =>
      stats.write.parquet(dir + "/stats") // file-count-sized sidecar
      idCol.foreach(id => writeRowSig(base, dir, col(id), Seq.empty))
      persistEntry(LayoutManifestEntry(
        session = name, slot = s"zorder:$colX,$colY", kind = "zorder",
        digest = contentDigest(base, Seq.empty), path = Some(r),
        valueCol = Some(colX), idCol = Some(colY), files = Some(files),
        keyCol = idCol))
    }
    path
  }

  /** Rectangle predicate scan, layout-routed: a valid z-ordered layout
    * on (session, colX, colY) serves `colX ∈ [loX, hiX] ∧ colY ∈ [loY,
    * hiY]` from the Morton-clustered files via the 2-D skipping index
    * (the exact predicate re-applies after pruning — byte-identical
    * answers); otherwise a plain conjunctive filter over the live
    * session plan. Column ORDER is routing-irrelevant: (x, y) and
    * (y, x) requests serve from the same layout.
    */
  def rangeScan2d(name: String, colX: String, loX: Any, hiX: Any,
                  colY: String, loY: Any, hiY: Any): DataFrame = {
    val (lay, rep) = decide(name, s"zorder:$colX,$colY", {
      case l: ZOrderedLayout => l.colX == colX && l.colY == colY
      case _ => false
    })
    // the transposed slot serves the same rectangle — try it on a miss
    val (lay2, rep2) =
      if (lay.isDefined) (lay, rep)
      else decide(name, s"zorder:$colY,$colX", {
        case l: ZOrderedLayout => l.colX == colY && l.colY == colX
        case _ => false
      })
    recordRoute(if (lay2.isDefined || rep2.reason != "no-layout") rep2
      else rep)
    def servePatched(l: ZOrderedLayout, lX: Any, hX: Any,
                     lY: Any, hY: Any): DataFrame = {
      val files = graft.io.SkippingIndex.candidateFiles2d(l.stats,
        lX, hX, lY, hY)
      val base =
        if (files.isEmpty) spark.read.parquet(l.path).limit(0)
        else spark.read.parquet(files: _*)
      // DML patch composes before the exact rectangle predicate: the
      // add-leg is never pruned, shadowed base rows never serve
      patchedFullRows(base, l.idCol, l.patch)
        .filter(col(l.colX) >= lit(lX) && col(l.colX) <= lit(hX) &&
          col(l.colY) >= lit(lY) && col(l.colY) <= lit(hY))
    }
    lay2 match {
      case Some(l: ZOrderedLayout) if l.colX == colX =>
        servePatched(l, loX, hiX, loY, hiY)
      case Some(l: ZOrderedLayout) =>
        servePatched(l, loY, hiY, loX, hiX)
      case _ =>
        Positional.strip(sessionOf(name).current)
          .filter(col(colX) >= lit(loX) && col(colX) <= lit(hiX) &&
            col(colY) >= lit(loY) && col(colY) <= lit(hiY))
    }
  }

  /** Range predicate scan, layout-routed: a valid ranged layout on
    * (session, column) serves `column ∈ [lo, hi]` from the clustered
    * files via the skipping index (most part files never open — the
    * exact predicate re-applies after pruning, so the answer is
    * byte-identical); otherwise a plain filter over the live session
    * plan. The catalog picks — callers state the predicate, never the
    * layout.
    */
  def rangeScan(name: String, column: String, lo: Any,
                hi: Any): DataFrame = {
    val (lay, rep) = decide(name, s"range:$column",
      _.isInstanceOf[RangedLayout])
    recordRoute(rep)
    lay match {
      case Some(l: RangedLayout) => serveRangedScan(l, column, lo, hi)
      case _ =>
        val c = org.apache.spark.sql.functions.col(column)
        Positional.strip(sessionOf(name).current)
          .filter(c >= lit(lo) && c <= lit(hi))
    }
  }

  /** The routed range-scan plan over a (possibly patched) ranged layout:
    * skipping-pruned base files, the DML patch composed BEFORE the exact
    * predicate (the add-leg is never pruned, shadowed base rows never
    * serve), the caller's exact predicate on top. Shared by [[rangeScan]]
    * and the pinned [[rangeScanAsOf]].
    */
  private def serveRangedScan(l: RangedLayout, column: String, lo: Any,
                              hi: Any): DataFrame = {
    val files = graft.io.SkippingIndex.candidateFiles(l.stats, lo, hi)
    val base =
      if (files.isEmpty) spark.read.parquet(l.path).limit(0)
      else spark.read.parquet(files: _*)
    patchedFullRows(base, l.idCol, l.patch)
      .filter(col(column) >= lit(lo) && col(column) <= lit(hi))
  }

  /** ANN top-k, layout-routed: a valid stored ANN layout on (session,
    * vecCol) serves the search from codes at rest (PQ: compressed-domain
    * scan; IVF-PQ: plan-time cell pruning first); otherwise the exact
    * brute-force cosine over the live session plan. Same output shape
    * (id, sim) either way — the caller never names a layout. The layout
    * routes only when its idCol equals the caller's (the [[nearDups]]
    * guard, ADVICE r8): stored codes are keyed by the ids the layout was
    * built with, and serving those under a different caller-named id
    * column would change the answer, not just the plan.
    */
  def topK(name: String, idCol: String, vecCol: String, query: Seq[Float],
           k: Int): DataFrame = {
    val (lay, rep) = decide(name, s"ann:$vecCol", {
      case l: PqCodesLayout => l.idCol == idCol
      case l: IvfPqCellLayout => l.idCol == idCol
      case _ => false
    })
    recordRoute(rep)
    lay.flatMap(serveAnnTopK(_, idCol, query, k)).getOrElse(
      graft.operators.Similarity.topK(
        Positional.strip(sessionOf(name).current), idCol, vecCol, query, k))
  }

  /** The routed ANN serving plan of a stored-codes layout built with the
    * caller's idCol (None otherwise) — shared by [[topK]] and
    * [[topKAsOf]] so the two can never drift.
    */
  private def serveAnnTopK(l: TableLayout, idCol: String,
                           query: Seq[Float], k: Int): Option[DataFrame] =
    l match {
      case pq: PqCodesLayout if pq.idCol == idCol =>
        Some(graft.operators.Similarity.pqTopKFromCodes(
          patchedCodes(spark.read.parquet(pq.path), pq.patch), pq.seeds,
          query, k, pq.m))
      case iv: IvfPqCellLayout if iv.idCol == idCol =>
        Some(graft.operators.Similarity.ivfPqTopKFromCodes(
          patchedCodes(spark.read.parquet(iv.path), iv.patch), iv.cents,
          iv.seeds, query, k, iv.nProbe, iv.m))
      case _ => None
    }

  /** Equi-join of two open sessions, layout-routed: when BOTH sides hold
    * valid bucketed layouts on their join keys with matching bucket
    * counts, the join reads the bucketed tables and plans with NO
    * exchange (co-located by storage); otherwise the live session plans
    * join and Catalyst shuffles as usual. The catalog picks — callers
    * never mention buckets.
    */
  def join(left: String, leftKey: String, right: String,
           rightKey: String): DataFrame = {
    val (ld, lrep) = decide(left, s"bucket:$leftKey",
      _.isInstanceOf[BucketedLayout])
    val (rd, rrep) = decide(right, s"bucket:$rightKey",
      _.isInstanceOf[BucketedLayout])
    val routed = for {
      ll <- ld.collect { case b: BucketedLayout => b }
      rl <- rd.collect { case b: BucketedLayout => b }
      if ll.buckets == rl.buckets
    } yield (spark.table(ll.table), spark.table(rl.table))
    // both sides valid but bucket counts differ = a parameter mismatch
    // of the PAIR: each side alone would route, the join cannot
    if (ld.isDefined && rd.isDefined && routed.isEmpty) {
      recordRoute(lrep.copy(decision = "live", reason = "param-mismatch"))
      recordRoute(rrep.copy(decision = "live", reason = "param-mismatch"))
    } else { recordRoute(lrep); recordRoute(rrep) }
    val (lf, rf) = routed.getOrElse(
      (Positional.strip(sessionOf(left).current),
        Positional.strip(sessionOf(right).current)))
    lf.join(rf, lf(leftKey) === rf(rightKey))
  }

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

  private val pins = mutable.LinkedHashMap.empty[(String, Long), Snapshot]

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
        layoutsOf(name).filter(_._2.builtAtEpoch == s.epoch).toMap)
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
  private def pinLeasePath(wh: String, name: String,
                           epoch: Long): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$wh/_pins/${name}_$epoch")

  def pinnedEpochs(name: String): Seq[Long] =
    pins.keys.collect { case (n, e) if n == name => e }.toSeq

  /** The pinned session plan itself (every column, pre-maintenance). */
  def snapshotAsOf(name: String, epoch: Long): DataFrame =
    Positional.strip(pinOf(name, epoch).plan)

  private def pinOf(name: String, epoch: Long): Snapshot =
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

  // ---- warehouse vacuum ------------------------------------------------------

  /** Garbage-collect the warehouse by MANIFEST DIFF (r10 verdict task
    * #1 — superseded layout dirs used to strand forever: every delta
    * refresh left the previous `catalog_patch_*` dir behind, every
    * compaction rebuild a corpus-scale layout dir). A top-level
    * warehouse dir survives iff something still references it: a
    * current manifest entry's `path`/`patch`, a registered in-memory
    * layout, a pinned snapshot ([[pin]]), or — for clustered layouts
    * whose base spans dirs after a partial compaction — a skipping-stats
    * file list. Partially referenced dirs are swept FILE-level: data
    * files no stats list names are deleted, referenced ones stay
    * byte-untouched.
    *
    * `graceMs` is the in-flight-reader guard: nothing younger than the
    * grace window is deleted, so a lazily-planned DataFrame handed out
    * just before the superseding refresh can still run. Production
    * callers keep the default; specs pass 0 for determinism.
    *
    * Runs automatically every [[Catalog.autoVacuumEvery]] manifest
    * writes (with the default grace), so a long-lived maintenance loop
    * self-cleans without an operator gesture.
    *
    * @return warehouse-relative paths deleted, dirs and files.
    */
  def vacuum(graceMs: Long = Catalog.vacuumGraceMs): Seq[String] =
    warehouse.toSeq.flatMap { wh =>
      import org.apache.hadoop.fs.Path
      val whPath = new Path(wh)
      val fs = whPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(whPath)) Seq.empty
      else vacuumIn(wh, whPath, fs, graceMs)
    }

  /** First time each candidate path was OBSERVED unreferenced: the grace
    * window measures time-since-supersession, not file age — a dir built
    * hours ago but superseded seconds ago must survive the window for
    * the in-flight readers the guard exists for (a modification-time
    * check would delete it immediately). Entries clear when a path
    * becomes referenced again (a dormant entry's dir, a new pin).
    */
  private val unreferencedSince = mutable.HashMap.empty[String, Long]

  /** Dormant clustered entries' stats file lists, read once per process
    * per layout dir — the dir is write-once, so entries never go stale.
    */
  private val dormantStatsCache = mutable.HashMap.empty[String, Seq[String]]

  private def vacuumIn(wh: String, whPath: org.apache.hadoop.fs.Path,
                       fs: org.apache.hadoop.fs.FileSystem,
                       graceMs: Long): Seq[String] = try {
      import org.apache.hadoop.fs.Path
      val now = System.currentTimeMillis()
      def norm(p: String): String = new Path(p).toUri.getPath
      val whAbs = norm(wh)
      def relTop(abs: String): Option[String] = {
        val p = norm(abs)
        if (p.startsWith(whAbs + "/"))
          p.stripPrefix(whAbs + "/").split("/").headOption
        else None
      }
      // diff against the UNION of this catalog's manifest and the one on
      // disk: the warehouse is documented single-writer, but a reopened
      // or concurrent catalog's freshly persisted layouts must read as
      // referenced, not as garbage. A manifest that EXISTS but cannot be
      // read (observed mid-overwrite) ABORTS the pass — treating it as
      // empty would unreference everything it names.
      val diskEntries = LayoutStore.loadOpt(spark, wh) match {
        case Some(es) => es
        case None => return Seq.empty
      }
      // an ABSENT manifest over a warehouse that already holds layout
      // dirs is a writer's delete+rename window (or a crashed writer) —
      // abort; a genuinely fresh warehouse has nothing to collect anyway
      if (diskEntries.isEmpty &&
          fs.listStatus(whPath).exists(st =>
            !st.getPath.getName.startsWith("_"))) return Seq.empty
      val allEntries: Seq[LayoutManifestEntry] =
        (manifest.values.toSeq ++ diskEntries).distinct
      // observation clocks survive restarts via the _vacuum sidecar —
      // loaded LAZILY on the first unreferenced candidate, so the
      // steady state (everything referenced) costs zero extra jobs
      var marksLoaded = false
      def ensureMarks(): Unit = if (!marksLoaded) {
        marksLoaded = true
        LayoutStore.loadMarks(spark, wh).foreach { case (k, t) =>
          unreferencedSince(k) =
            math.min(unreferencedSince.getOrElse(k, t), t)
        }
      }
      val live = layouts.values.toSeq ++ pins.values.flatMap(_.layouts.values)
      // OTHER processes' pins, via their persisted leases: every path a
      // lease names keeps its whole top-level dir
      val leaseRefs: Set[String] = Try {
        val pinsDir = new Path(s"$wh/_pins")
        if (!fs.exists(pinsDir)) Set.empty[String]
        else fs.listStatus(pinsDir).toSet.flatMap {
          st: org.apache.hadoop.fs.FileStatus =>
            val in = fs.open(st.getPath)
            try scala.io.Source.fromInputStream(in, "UTF-8")
              .getLines().flatMap(relTop).toSet
            finally in.close()
        }
      }.getOrElse(Set.empty)
      // dirs referenced by name: manifest entries + live/pinned layouts
      val dirRefs: Set[String] =
        allEntries.flatMap(e => e.path.toSeq ++ e.patch.toSeq)
          .map(_.split("/").head).toSet ++
          live.flatMap(l => layoutPathsOf(l).flatMap(relTop) ++
            patchOf(l).flatMap(_.path).map(_.split("/").head)) ++
          leaseRefs
      // data files referenced through skipping-stats lists (a partially
      // compacted clustered layout's base spans dirs) — live/pinned stats
      // plus dormant manifest entries' stats sidecars. LAZY and cached:
      // in the steady state every top-level dir is name-referenced and
      // the sweep below never consults these, so the auto-vacuum riding
      // persistEntry on the ingest hot path pays no stats jobs; when a
      // candidate does appear, each dormant sidecar is read ONCE per
      // process (a layout dir is write-once — fresh dir per build — so
      // the cache never needs invalidation). Only SUCCESSFUL reads are
      // cached: memoizing a failed read would make one transient FS
      // hiccup outlive the grace window (every file the sidecar names
      // reading as unreferenced on all future passes). An unreadable
      // sidecar instead ABORTS the pass — the same policy the manifest
      // gets above, for the same reason: treating it as empty would
      // unreference everything it names.
      val liveKeys = layouts.keySet
      lazy val dormantStats = allEntries.collect {
        case e if (e.kind == "range" || e.kind == "zorder") &&
              e.path.isDefined && !liveKeys.contains((e.session, e.slot)) =>
          dormantStatsCache.getOrElse(e.path.get,
            Try(spark.read.parquet(s"$wh/${e.path.get}/stats")
              .select("file").collect().map(_.getString(0)).toSeq) match {
              case scala.util.Success(files) =>
                dormantStatsCache.update(e.path.get, files); files
              case scala.util.Failure(_) => throw Catalog.VacuumAbort
            })
      }.flatten
      lazy val fileRefs: Set[String] =
        (live.flatMap(statsFilesOf) ++ dormantStats).map(norm).toSet
      lazy val fileRefDirs: Set[String] = fileRefs.flatMap(relTop)
      val deleted = mutable.ArrayBuffer.empty[String]
      // grace by OBSERVATION: a path deletes only after sitting
      // unreferenced for a full window across vacuum passes (grace 0 =
      // delete now, the spec/operator-forced form). `observed` collects
      // the keys still awaiting their window, so the map — and the
      // persisted sidecar — never grows past the live candidate set.
      val observed = mutable.Set.empty[String]
      def expired(key: String): Boolean =
        graceMs <= 0 || {
          ensureMarks()
          val since = unreferencedSince.getOrElseUpdate(key, now)
          if (now - since >= graceMs) true
          else { observed += key; false }
        }
      def sweepFiles(dir: Path, rel: String): Unit =
        fs.listStatus(dir).foreach { st =>
          if (st.isDirectory) sweepFiles(st.getPath, s"$rel/${st.getPath.getName}")
          else {
            val abs = norm(st.getPath.toString)
            if (fileRefs.contains(abs)) unreferencedSince.remove(abs)
            else if (expired(abs)) {
              fs.delete(st.getPath, false)
              unreferencedSince.remove(abs)
              deleted += s"$rel/${st.getPath.getName}"
            }
          }
        }
      fs.listStatus(whPath).foreach { st =>
        val name = st.getPath.getName
        if (!name.startsWith("_")) { // _manifest / _vacuum control plane
          if (dirRefs.contains(name)) { unreferencedSince.remove(name); () }
          else if (fileRefDirs.contains(name)) {
            // partially referenced (stats-listed files only): file sweep
            unreferencedSince.remove(name)
            sweepFiles(st.getPath, name)
          } else if (expired(name)) {
            fs.delete(st.getPath, true)
            unreferencedSince.remove(name)
            deleted += name
          }
        }
      }
      // persist the merged clocks only when they were consulted: a save
      // without the disk merge would clobber other processes' marks, and
      // the no-candidate steady state should cost no write at all
      if (marksLoaded) {
        unreferencedSince.filterInPlace((k, _) => observed.contains(k))
        LayoutStore.saveMarks(spark, wh, unreferencedSince.toMap)
      }
      deleted.toSeq
  } catch {
    // an unreadable dormant stats sidecar: abort with nothing deleted.
    // The abort is provably pre-delete — the sweep forces the lazy
    // fileRefs before the FIRST candidate's delete, and a lazy val that
    // throws re-throws on every later force.
    case Catalog.VacuumAbort => Seq.empty
  }

  /** The warehouse paths a layout's serving plan reads (base dirs).
    * The LSH layout holds its base as a DataFrame rather than a path, so
    * its storage resolves through the plan's input files — a PINNED LSH
    * index must keep its dir even after the manifest has moved on.
    */
  private def layoutPathsOf(l: TableLayout): Seq[String] = l match {
    case p: PqCodesLayout => Seq(p.path)
    case p: IvfPqCellLayout => Seq(p.path)
    case p: RangedLayout => Seq(p.path)
    case p: ZOrderedLayout => Seq(p.path)
    case p: PostingsLayout => Seq(p.path)
    case p: CubeLayout => Seq(p.path)
    case p: SketchLayout => Seq(p.path)
    case p: PairsLayout => Seq(p.path)
    case p: LshIndexLayout =>
      Try(p.index.inputFiles.toSeq).getOrElse(Seq.empty)
    case _ => Seq.empty // bucketed lives in the metastore
  }

  private def patchOf(l: TableLayout): Option[LayoutPatch] = l match {
    case p: PqCodesLayout => p.patch
    case p: IvfPqCellLayout => p.patch
    case p: RangedLayout => p.patch
    case p: ZOrderedLayout => p.patch
    case p: LshIndexLayout => p.patch
    case p: PostingsLayout => p.patch
    case p: CubeLayout => p.patch
    case p: SketchLayout => p.patch
    case p: PairsLayout => p.patch
    case _ => None
  }

  /** The absolute data files a clustered layout's stats list names. */
  private def statsFilesOf(l: TableLayout): Seq[String] = l match {
    case p: RangedLayout =>
      Try(p.stats.select("file").collect().map(_.getString(0)).toSeq)
        .getOrElse(Seq.empty)
    case p: ZOrderedLayout =>
      Try(p.stats.select("file").collect().map(_.getString(0)).toSeq)
        .getOrElse(Seq.empty)
    case _ => Seq.empty
  }

  // ---- materialized aggregate cube ----------------------------------------

  /** The cube's stored rows for `base`: one row per distinct group tuple
    * with `__cnt` = count(*), and per measure the order-free decimal
    * partial sum `__sum_<m>` (round-to-6dp fixed point — the engine's
    * standard exact-and-mergeable idiom) plus the non-null count
    * `__cntm_<m>`. `id` renders the group tuple as JSON: injective per
    * tuple (null fields are omitted, which cannot collide across
    * distinct tuples over a fixed field set), so the delta patch shadows
    * by one key like every other keyed layout.
    */
  private def cubeRows(base: DataFrame, groupCols: Seq[String],
                       measures: Seq[String]): DataFrame =
    Catalog.cubePartials(base, groupCols, measures)
      .withColumn("id", to_json(struct(groupCols.map(col): _*)))

  /** Serving view of a (possibly patched) cube — group-count-sized. */
  private def patchedCube(c: CubeLayout): DataFrame =
    patchedCodes(spark.read.parquet(c.path), c.patch)

  /** Materialize the session's aggregate cube on `groupCols` ×
    * `measures` and register it; [[aggregate]] over these (or any SUBSET
    * of them — partial sums re-merge exactly) then reads group-count-
    * sized stored rows instead of scanning the fact table.
    */
  def buildCubeLayout(name: String, groupCols: Seq[String],
                      measures: Seq[String]): String = {
    val s = sessionOf(name)
    val base = Positional.strip(s.current)
    val (dir, rel) = layoutRoot("catalog_cube_")
    val path = dir + "/cube"
    cubeRows(base, groupCols, measures).write.parquet(path)
    val slot = s"cube:${groupCols.mkString(",")}"
    layouts((name, slot)) = CubeLayout(groupCols, measures, path, s.epoch)
    rel.foreach { r =>
      writeRowSig(base, dir, to_json(struct(groupCols.map(col): _*)),
        groupCols ++ measures)
      persistEntry(LayoutManifestEntry(
        session = name, slot = slot, kind = "cube",
        digest = contentDigest(base, groupCols ++ measures), path = Some(r),
        groupCols = Some(groupCols), measures = Some(measures)))
    }
    path
  }

  /** Grouped count/sum/avg, layout-routed: a valid cube layout COVERING
    * the request (caller's groupCols ⊆ the cube's, measures ⊆ the
    * cube's) answers from stored partials — `count(*)` is a sum of
    * `__cnt`, each sum a sum of decimal partial sums, each avg their
    * quotient — so a rollup re-aggregates group-count-sized data and
    * never touches the fact table. Without a covering valid layout the
    * same aggregate runs over the live session plan; the output
    * (groupCols…, `n`, `sum_<m>` double, `avg_<m>` double) is identical
    * either way because the decimal partials are exact and order-free.
    */
  /** The covering-layout decision shared by the cube and sketch entry
    * points (and their [[explainAggregate]]/[[explainDistinct]] dry
    * runs): pick the first VALID candidate that `covers` the request;
    * report param-mismatch when candidates of the kind exist but none
    * covers, stale-epoch when one covers but the session has moved on.
    */
  private def decideCovering[L <: TableLayout](
      name: String, fallbackSlot: String, cands: Seq[(String, L)],
      covers: L => Boolean): (Option[L], RouteReport) = {
    val covering = cands.filter { case (_, l) => covers(l) }
    val valid = sessions.get(name).flatMap(s =>
      covering.find(_._2.builtAtEpoch == s.epoch))
    val slotName = valid.orElse(covering.headOption)
      .orElse(cands.headOption).map(_._1).getOrElse(fallbackSlot)
    val reason =
      if (!sessions.contains(name)) "no-session"
      else if (valid.isDefined) "routed"
      else if (covering.nonEmpty) "stale-epoch"
      else if (cands.nonEmpty) "param-mismatch"
      else "no-layout"
    (valid.map(_._2), RouteReport(slotName,
      if (valid.isDefined) "layout" else "live", reason))
  }

  /** Group-column equality filters, shared by every routed aggregate. */
  private def whereFilter(where: Seq[(String, Any)])(
      df: DataFrame): DataFrame =
    where.foldLeft(df) { case (d, (c, v)) => d.filter(col(c) === v) }

  /** ONE covering rule for cube requests, used by the live routing
    * decision AND the pinned twin — the two must never drift.
    */
  private def cubeCovers(c: CubeLayout, groupCols: Seq[String],
                         measures: Seq[String],
                         whereCols: Set[String]): Boolean =
    (groupCols.toSet ++ whereCols).subsetOf(c.groupCols.toSet) &&
      measures.toSet.subsetOf(c.measures.toSet)

  /** The routed cube-serving plan, shared by [[aggregate]] and
    * [[aggregateAsOf]]: filter the stored rows, re-merge, finish.
    */
  private def serveCubeAggregate(c: CubeLayout, groupCols: Seq[String],
                                 measures: Seq[String],
                                 where: Seq[(String, Any)]): DataFrame =
    Catalog.cubeFinish(
      Catalog.cubeMergePartials(whereFilter(where)(patchedCube(c)),
        groupCols, measures),
      groupCols, measures)

  private def liveCubeAggregate(plan: DataFrame, groupCols: Seq[String],
                                measures: Seq[String],
                                where: Seq[(String, Any)]): DataFrame =
    Catalog.cubeFinish(
      Catalog.cubePartials(whereFilter(where)(plan), groupCols, measures),
      groupCols, measures)

  private def decideCube(name: String, groupCols: Seq[String],
                         measures: Seq[String],
                         whereCols: Set[String] = Set.empty)
      : (Option[CubeLayout], RouteReport) =
    decideCovering[CubeLayout](name, s"cube:${groupCols.mkString(",")}",
      layoutsOf(name).collect { case (slot, c: CubeLayout) => (slot, c) },
      c => cubeCovers(c, groupCols, measures, whereCols))

  /** Dry-run of [[aggregate]]'s routing decision — which cube would
    * serve this grouping/measure/filter set, or why none would. Nothing
    * runs.
    */
  def explainAggregate(name: String, groupCols: Seq[String],
                       measures: Seq[String],
                       where: Seq[(String, Any)] = Nil): RouteReport =
    decideCube(name, groupCols, measures, where.map(_._1).toSet)._2

  /** Grouped count/sum/avg/min/max, optionally under group-column
    * EQUALITY filters (`where`): a predicate on group columns is
    * constant within each group, so a covering cube serves the filtered
    * aggregate by filtering its stored rows — the typed twin of the SQL
    * rewrite's filtered-MV form. A filter on any non-group column makes
    * the cube non-covering (param-mismatch) and the live plan answers.
    */
  def aggregate(name: String, groupCols: Seq[String],
                measures: Seq[String],
                where: Seq[(String, Any)] = Nil): DataFrame = {
    val s = sessionOf(name)
    val (valid, rep) =
      decideCube(name, groupCols, measures, where.map(_._1).toSet)
    recordRoute(rep)
    valid match {
      // every stored statistic is a commutative merge: sums of sums,
      // sums of counts, min of mins, max of maxes — rollup is exact
      case Some(c) => serveCubeAggregate(c, groupCols, measures, where)
      case None =>
        liveCubeAggregate(Positional.strip(s.current), groupCols,
          measures, where)
    }
  }

  /** A cube whose GROUP columns include the value column is a value-level
    * histogram of that column — `__cnt` per distinct (keys…, value) cell —
    * which serves ORDER STATISTICS exactly, not just re-mergeable sums.
    */
  private def quantileCovers(c: CubeLayout, keys: Seq[String],
                             valueCol: String,
                             whereCols: Set[String]): Boolean =
    (keys.toSet ++ whereCols + valueCol).subsetOf(c.groupCols.toSet)

  private def decideQuantile(name: String, keys: Seq[String],
                             valueCol: String,
                             whereCols: Set[String] = Set.empty)
      : (Option[CubeLayout], RouteReport) =
    decideCovering[CubeLayout](name,
      s"cube:${(keys :+ valueCol).mkString(",")}",
      layoutsOf(name).collect { case (slot, c: CubeLayout) => (slot, c) },
      c => quantileCovers(c, keys, valueCol, whereCols))

  /** Dry-run of [[quantiles]]'s routing decision — which cube (as a
    * value histogram) would serve these probes, or why none would.
    */
  def explainQuantile(name: String, keys: Seq[String], valueCol: String,
                      where: Seq[(String, Any)] = Nil): RouteReport =
    decideQuantile(name, keys, valueCol, where.map(_._1).toSet)._2

  /** Exact per-key percentiles of `valueCol` (linear interpolation at
    * rank p·(n−1) — the built-in `percentile` semantics), served from a
    * covering cube layout when one is epoch-valid: the stored rows
    * re-aggregate to a (keys…, value, count) histogram — value-domain-
    * sized, never fact-sized — and [[graft.operators.RankStats
    * .percentilesOfHist]] walks it. The data-sized pass happened once at
    * build time; at 100 TB a median probe reads kilobytes of stored
    * cells instead of sorting the fact table. Without a covering valid
    * layout the identical walk runs over the live rows (the histogram is
    * just built first), so routing changes the plan, never the answer.
    * `where` accepts equality filters on the cube's group columns — a
    * stored (keys, value) cell survives such a filter wholesale, so the
    * filtered order statistics stay exact.
    */
  def quantiles(name: String, keys: Seq[String], valueCol: String,
                probes: Seq[(String, Double)],
                where: Seq[(String, Any)] = Nil): DataFrame = {
    val s = sessionOf(name)
    val (valid, rep) =
      decideQuantile(name, keys, valueCol, where.map(_._1).toSet)
    recordRoute(rep)
    valid match {
      case Some(c) => serveHistQuantiles(c, keys, valueCol, probes, where)
      case None =>
        liveQuantiles(Positional.strip(s.current), keys, valueCol, probes,
          where)
    }
  }

  /** The routed quantile-serving plan, shared by [[quantiles]] and
    * [[quantilesAsOf]]: re-aggregate the stored cells to the requested
    * (keys, value) histogram and walk it. Rollup of counted cells is
    * exact — finer tuples sum into the requested cell, and the walk
    * never needs the dropped dimensions.
    */
  private def serveHistQuantiles(c: CubeLayout, keys: Seq[String],
                                 valueCol: String,
                                 probes: Seq[(String, Double)],
                                 where: Seq[(String, Any)]): DataFrame = {
    val hist = whereFilter(where)(patchedCube(c))
      .groupBy(keys.map(col) :+ col(valueCol).as("__v"): _*)
      .agg(sum(col("__cnt")).as("__m"))
    graft.operators.RankStats.percentilesOfHist(hist, keys, probes)
  }

  private def liveQuantiles(plan: DataFrame, keys: Seq[String],
                            valueCol: String,
                            probes: Seq[(String, Double)],
                            where: Seq[(String, Any)]): DataFrame =
    graft.operators.RankStats.exactPercentiles(
      whereFilter(where)(plan), col(valueCol), keys, probes)

  /** The sketch layout's stored rows: one HLL sketch of `sketchCol` per
    * group tuple, plus the JSON group key the delta patch shadows by.
    */
  private def sketchRows(base: DataFrame, groupCols: Seq[String],
                         sketchCol: String, lgK: Int): DataFrame =
    base.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(sketchCol), lit(lgK)).as("__hll"))
      .withColumn("id", to_json(struct(groupCols.map(col): _*)))

  /** Sketch `sketchCol`'s distinct count per `groupCols` tuple ONCE into
    * an at-rest layout; [[approxDistinct]] over these (or any SUBSET —
    * HLL register unions are exact merges of register state) then reads
    * group-count-sized sketches instead of shuffling distinct keys.
    */
  def buildSketchLayout(name: String, groupCols: Seq[String],
                        sketchCol: String, lgK: Int = 12): String = {
    val s = sessionOf(name)
    val base = Positional.strip(s.current)
    val (dir, rel) = layoutRoot("catalog_sketch_")
    val path = dir + "/sketches"
    sketchRows(base, groupCols, sketchCol, lgK).write.parquet(path)
    val slot = s"sketch:${groupCols.mkString(",")}:$sketchCol"
    layouts((name, slot)) =
      SketchLayout(groupCols, sketchCol, lgK, path, s.epoch)
    rel.foreach { r =>
      writeRowSig(base, dir, to_json(struct(groupCols.map(col): _*)),
        groupCols :+ sketchCol)
      persistEntry(LayoutManifestEntry(
        session = name, slot = slot, kind = "sketch",
        digest = contentDigest(base, groupCols :+ sketchCol), path = Some(r),
        valueCol = Some(sketchCol), n = Some(lgK),
        groupCols = Some(groupCols)))
    }
    path
  }

  /** Approximate distinct count of `sketchCol` per `groupCols` tuple,
    * layout-routed: a valid sketch layout COVERING the request (caller's
    * groupCols ⊆ the layout's, same column, same lgK) answers by
    * unioning stored sketches; otherwise a live `hll_sketch_agg` runs.
    * Output: (groupCols…, `nd_<col>` long).
    *
    * The routing contract here is the SKETCH's contract, stated
    * precisely: routed and live answers agree within the configured
    * relative standard error, not digit-for-digit. Digit equality is
    * unattainable for ANY HLL implementation across merge topologies —
    * Datasketches estimates a directly-updated sketch with the HIP
    * accumulator but a union of sketches with the composite estimator,
    * and Spark's own live aggregation goes through per-partition
    * partials, so even two live runs can differ in the last digits when
    * the partitioning differs. The routed estimate is the BETTER-
    * behaved of the two: it derives from at-rest register state, so it
    * is bit-stable across partitioning, arrival order, and rollup
    * grouping (register max is associative) — SketchLayoutSpec pins the
    * error bound against exact counts, the determinism of the routed
    * path, and that untouched groups' estimates never move under IVM.
    */
  private def decideSketch(name: String, groupCols: Seq[String],
                           sketchCol: String, lgK: Int,
                           whereCols: Set[String])
      : (Option[SketchLayout], RouteReport) =
    // same-lgK guard: a different register width is a different sketch —
    // routing it would change the estimate, not just the plan
    decideCovering[SketchLayout](name,
      s"sketch:${groupCols.mkString(",")}:$sketchCol",
      layoutsOf(name).collect { case (slot, l: SketchLayout) => (slot, l) },
      l => (groupCols.toSet ++ whereCols).subsetOf(l.groupCols.toSet) &&
        l.col == sketchCol && l.lgK == lgK)

  /** Dry-run of [[approxDistinct]]'s routing decision. Nothing runs. */
  def explainDistinct(name: String, groupCols: Seq[String],
                      sketchCol: String, lgK: Int = 12,
                      where: Seq[(String, Any)] = Nil): RouteReport =
    decideSketch(name, groupCols, sketchCol, lgK,
      where.map(_._1).toSet)._2

  /** See the class-level routing contract; `where` takes group-column
    * equality filters, which (being constant within each group) select
    * whole stored sketches — the filtered rollup unions exactly the
    * surviving groups' register state.
    */
  def approxDistinct(name: String, groupCols: Seq[String],
                     sketchCol: String, lgK: Int = 12,
                     where: Seq[(String, Any)] = Nil): DataFrame = {
    val s = sessionOf(name)
    val (valid, rep) =
      decideSketch(name, groupCols, sketchCol, lgK, where.map(_._1).toSet)
    recordRoute(rep)
    val out = s"nd_$sketchCol"
    valid match {
      case Some(l) =>
        whereFilter(where)(patchedCodes(spark.read.parquet(l.path),
            l.patch))
          .groupBy(groupCols.map(col): _*)
          .agg(hll_sketch_estimate(
            hll_union_agg(col("__hll"), lit(false))).as(out))
      case None =>
        whereFilter(where)(Positional.strip(s.current))
          .groupBy(groupCols.map(col): _*)
          .agg(hll_sketch_estimate(
            hll_sketch_agg(col(sketchCol), lit(lgK))).as(out))
    }
  }

  /** The distinct group keys a delta touches: the touched (edited +
    * inserted) rows' CURRENT groups plus the deleted rows' PRE-DELETE
    * groups (`victims` — the mutation log's captured plans, r9 task #3).
    * Two bounded collects (each ≤ delta-sized by [[refreshSlot]]'s
    * guards).
    */
  private def affectedGroupKeys(s: EditorSession, groupCols: Seq[String],
                                pos: Seq[Long],
                                victims: Option[DataFrame]): Seq[String] = {
    val keyExpr = to_json(struct(groupCols.map(col): _*))
    val fromTouched =
      if (pos.isEmpty) Array.empty[String]
      else s.current.filter(col(Positional.POS).isInCollection(pos))
        .select(keyExpr.as("id")).distinct()
        .collect().map(_.getString(0))
    val fromVictims = victims.fold(Array.empty[String])(v =>
      v.select(keyExpr.as("id")).distinct()
        .collect().map(_.getString(0)))
    (fromTouched ++ fromVictims).distinct.toSeq
  }

  // ---- exact distinct-pairs layout -----------------------------------------

  /** The pairs layout's stored rows: the distinct (groupCols…, col)
    * tuples plus the JSON tuple key the delta patch shadows by.
    */
  private def pairsRows(base: DataFrame, groupCols: Seq[String],
                        pairCol: String): DataFrame = {
    val cols = groupCols :+ pairCol
    base.select(cols.map(col): _*).distinct()
      .withColumn("id", to_json(struct(cols.map(col): _*)))
  }

  /** Materialize the distinct (groupCols…, col) projection ONCE;
    * [[distinctCount]] over these group columns (or any SUBSET) then
    * answers `COUNT(DISTINCT col)` EXACTLY from pairs-count-sized
    * stored rows — and SQL text routes too ([[graft.plans
    * .SqlLayoutRouting]] rewrites a distinct-count aggregate over the
    * session view onto the stored pairs; r9 verdict task #5, the routed
    * alternative to the rewrite's conservative DISTINCT refusal).
    */
  def buildPairsLayout(name: String, groupCols: Seq[String],
                       pairCol: String): String = {
    val s = sessionOf(name)
    val base = Positional.strip(s.current)
    val (dir, rel) = layoutRoot("catalog_pairs_")
    val path = dir + "/pairs"
    pairsRows(base, groupCols, pairCol).write.parquet(path)
    val slot = s"pairs:${groupCols.mkString(",")}:$pairCol"
    layouts((name, slot)) = PairsLayout(groupCols, pairCol, path, s.epoch)
    rel.foreach { r =>
      writeRowSig(base, dir,
        to_json(struct((groupCols :+ pairCol).map(col): _*)),
        groupCols :+ pairCol)
      persistEntry(LayoutManifestEntry(
        session = name, slot = slot, kind = "pairs",
        digest = contentDigest(base, groupCols :+ pairCol), path = Some(r),
        valueCol = Some(pairCol), groupCols = Some(groupCols)))
    }
    path
  }

  /** ONE covering rule for pairs requests, shared live/pinned. */
  private def pairsCovers(l: PairsLayout, groupCols: Seq[String],
                          pairCol: String,
                          whereCols: Set[String]): Boolean =
    (groupCols.toSet ++ whereCols).subsetOf(l.groupCols.toSet) &&
      l.col == pairCol

  /** The exact distinct over either source — the shared serving tail. */
  private def pairsDistinctOver(src: DataFrame, groupCols: Seq[String],
                                pairCol: String): DataFrame =
    src.groupBy(groupCols.map(col): _*)
      .agg(count_distinct(col(pairCol)).as(s"cd_$pairCol"))

  private def decidePairs(name: String, groupCols: Seq[String],
                          pairCol: String, whereCols: Set[String])
      : (Option[PairsLayout], RouteReport) =
    decideCovering[PairsLayout](name,
      s"pairs:${groupCols.mkString(",")}:$pairCol",
      layoutsOf(name).collect { case (slot, l: PairsLayout) => (slot, l) },
      l => pairsCovers(l, groupCols, pairCol, whereCols))

  /** The exact-distinct routing decision: a covering pairs layout is the
    * purpose-built source, but a CUBE whose group columns include the
    * counted column serves the same answer (its stored rows are one per
    * distinct tuple — the SQL rewrite already exploits this), so when no
    * valid pairs layout covers, a covering histogram cube routes instead
    * of falling to the fact scan. When neither serves, the report is the
    * pairs decision — the primary layout kind for this request.
    */
  private def decideDistinct(name: String, groupCols: Seq[String],
                             pairCol: String, whereCols: Set[String])
      : (Option[Either[PairsLayout, CubeLayout]], RouteReport) =
    decidePairs(name, groupCols, pairCol, whereCols) match {
      case (Some(l), rep) => (Some(Left(l)), rep)
      case (None, prep) =>
        decideCovering[CubeLayout](name, prep.slot,
          layoutsOf(name).collect { case (slot, c: CubeLayout) =>
            (slot, c) },
          (c: CubeLayout) =>
            quantileCovers(c, groupCols, pairCol, whereCols)) match {
          case (Some(c), crep) => (Some(Right(c)), crep)
          case (None, _) => (None, prep)
        }
    }

  /** Dry-run of [[distinctCount]]'s routing decision — which pairs
    * layout (or fallback histogram cube) would serve this
    * grouping/column/filter set, or why none would. Nothing runs.
    */
  def explainDistinctExact(name: String, groupCols: Seq[String],
                           pairCol: String,
                           where: Seq[(String, Any)] = Nil): RouteReport =
    decideDistinct(name, groupCols, pairCol, where.map(_._1).toSet)._2

  /** EXACT distinct count of `pairCol` per `groupCols` tuple,
    * layout-routed: a valid pairs layout COVERING the request (caller's
    * groupCols ⊆ the layout's, same counted column, filters on layout
    * group columns only) re-distincts pairs-count-sized stored rows; a
    * cube whose group columns include `pairCol` serves the same exact
    * answer when no pairs layout covers ([[decideDistinct]]); otherwise
    * the live distinct aggregate runs over the session plan. Output
    * (groupCols…, `cd_<col>` long) — digit-equal every way, this is the
    * exact sibling of [[approxDistinct]].
    */
  def distinctCount(name: String, groupCols: Seq[String], pairCol: String,
                    where: Seq[(String, Any)] = Nil): DataFrame = {
    val s = sessionOf(name)
    val (valid, rep) =
      decideDistinct(name, groupCols, pairCol, where.map(_._1).toSet)
    recordRoute(rep)
    val src = valid match {
      case Some(Left(l)) =>
        whereFilter(where)(patchedCodes(spark.read.parquet(l.path),
          l.patch))
      case Some(Right(c)) => whereFilter(where)(patchedCube(c))
      case None => whereFilter(where)(Positional.strip(s.current))
    }
    pairsDistinctOver(src, groupCols, pairCol)
  }

  /** EXACT distinct counts of SEVERAL columns per `groupCols` tuple in
    * one call — the typed twin of the SQL N-way split: each column
    * serves from its own covering source (pairs layout preferred,
    * histogram-cube fallback, live otherwise — [[decideDistinct]] per
    * column) and the per-column group-count-sized results join back on
    * the group key, null-safe (null is a group). Every side derives
    * from the same table, so the group sets are identical and the inner
    * join loses nothing. Output (groupCols…, `cd_<col>`… longs).
    */
  def distinctCounts(name: String, groupCols: Seq[String],
                     pairCols: Seq[String],
                     where: Seq[(String, Any)] = Nil): DataFrame = {
    require(pairCols.nonEmpty, "distinctCounts needs at least one column")
    require(pairCols.distinct == pairCols,
      s"distinctCounts columns must be distinct: $pairCols")
    pairCols.map(c => distinctCount(name, groupCols, c, where))
      .reduce { (a, b) =>
        if (groupCols.isEmpty) a.crossJoin(b)
        else {
          val cond = groupCols.map(g => a(g) <=> b(g)).reduce(_ && _)
          groupCols.foldLeft(a.join(b, cond))((df, g) => df.drop(b(g)))
        }
      }
  }

  /** Pairs delta: every touched or retracted tuple's EXISTENCE
    * recomputes from the live plan (a tuple stays iff any current row
    * still carries it) and shadows by tuple key — same recompute-the-
    * affected-keys shape as [[patchCube]], with the full tuple as the
    * key. A cell edit to any stored column rebuilds instead (the
    * pre-edit tuple is unrecoverable), handled by [[refreshSlot]].
    */
  private def patchPairs(name: String, s: EditorSession, slot: String,
                         l: PairsLayout, pos: Seq[Long],
                         victims: Option[DataFrame]): Unit = {
    val cols = l.groupCols :+ l.col
    val keyExpr = to_json(struct(cols.map(col): _*))
    val dirtyKeys = affectedGroupKeys(s, cols, pos, victims)
    val affected = Positional.strip(s.current)
      .filter(keyExpr.isin(dirtyKeys: _*))
    val add0 = pairsRows(affected, l.groupCols, l.col)
    val legs = mergeLegs(dirtyKeys.toArray[Any], l.patch, add0)
    applyLegs(name, slot, s, legs, cols) { lg =>
      // merge-compact: pairs-count-sized copy, no fact scan
      val (_, path) = compactKeyed(name, slot, s,
        spark.read.parquet(l.path), lg, "id", "catalog_pairs_",
        "pairs", cols,
        Some((to_json(struct(cols.map(col): _*)), cols)))
      l.copy(builtAtEpoch = s.epoch, path = path, patch = None)
    }(patch => l.copy(builtAtEpoch = s.epoch, patch = Some(patch)))
  }

  /** Sketch delta for gestures that spare the group columns (cell edits
    * of the sketched column, inserts, deletes with recoverable
    * victims): HLL supports no deletion, so the affected groups
    * RE-SKETCH wholesale from the live plan (one group-key-filtered
    * pass) and shadow the stored rows by key — a group emptied by
    * deletes shadows with no replacement row (retraction, r9 task #3).
    */
  private def patchSketch(name: String, s: EditorSession, slot: String,
                          l: SketchLayout, pos: Seq[Long],
                          victims: Option[DataFrame]): Unit = {
    val keyExpr = to_json(struct(l.groupCols.map(col): _*))
    val dirtyKeys = affectedGroupKeys(s, l.groupCols, pos, victims)
    val affected = Positional.strip(s.current)
      .filter(keyExpr.isin(dirtyKeys: _*))
    val add0 = sketchRows(affected, l.groupCols, l.col, l.lgK)
    val legs = mergeLegs(dirtyKeys.toArray[Any], l.patch, add0)
    applyLegs(name, slot, s, legs, l.groupCols :+ l.col) { lg =>
      // merge-compact: sketch-row copy, no fact re-sketch
      val (_, path) = compactKeyed(name, slot, s,
        spark.read.parquet(l.path), lg, "id", "catalog_sketch_",
        "sketches", l.groupCols :+ l.col,
        Some((to_json(struct(l.groupCols.map(col): _*)),
          l.groupCols :+ l.col)))
      l.copy(builtAtEpoch = s.epoch, path = path, patch = None)
    }(patch => l.copy(builtAtEpoch = s.epoch, patch = Some(patch)))
  }

  /** Cube delta for gestures that spare the group columns: the affected
    * groups are the touched rows' CURRENT group tuples plus (for
    * deletes) the victims' pre-delete tuples — recompute those groups'
    * rows with one group-key-filtered pass over the live plan and
    * shadow the stored rows by key. Every affected key shadows
    * EXPLICITLY (not just the keys the add rows mention), so a group
    * whose last row was deleted vanishes from the served cube — the
    * retraction case that used to force a rebuild (r9 task #3). A
    * group-column CELL edit still cannot delta-patch (the rows'
    * previous groups are unrecoverable from current state) and falls to
    * rebuild in [[refreshSlot]].
    */
  private def patchCube(name: String, s: EditorSession, slot: String,
                        c: CubeLayout, pos: Seq[Long],
                        victims: Option[DataFrame]): Unit = {
    val keyExpr = to_json(struct(c.groupCols.map(col): _*))
    val dirtyKeys = affectedGroupKeys(s, c.groupCols, pos, victims)
    val affected = Positional.strip(s.current)
      .filter(keyExpr.isin(dirtyKeys: _*))
    val add0 = cubeRows(affected, c.groupCols, c.measures)
    val legs = mergeLegs(dirtyKeys.toArray[Any], c.patch, add0)
    applyLegs(name, slot, s, legs, c.groupCols ++ c.measures) { lg =>
      // merge-compact: group-count-sized copy, no fact scan
      val (_, path) = compactKeyed(name, slot, s,
        spark.read.parquet(c.path), lg, "id", "catalog_cube_",
        "cube", c.groupCols ++ c.measures,
        Some((to_json(struct(c.groupCols.map(col): _*)),
          c.groupCols ++ c.measures)))
      c.copy(builtAtEpoch = s.epoch, path = path, patch = None)
    }(patch => c.copy(builtAtEpoch = s.epoch, patch = Some(patch)))
  }
}

object Catalog {
  private val nextId = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Control signal: a vacuum pass that cannot read a referenced-file
    * sidecar aborts (deleting nothing) rather than guess. Stackless —
    * it only ever unwinds from the sweep to vacuumIn's catch.
    */
  private[core] object VacuumAbort
      extends RuntimeException("vacuum pass aborted", null, false, false)

  // One SQL-planning lock per SparkSession (weakly held, dies with it):
  // temp views live in the session, so the serialization scope must too.
  private val sqlLocks = new java.util.WeakHashMap[SparkSession, Object]()
  private[graft] def sqlLockFor(spark: SparkSession): Object =
    sqlLocks.synchronized {
      Option(sqlLocks.get(spark)).getOrElse {
        val o = new Object
        sqlLocks.put(spark, o)
        o
      }
    }

  // One JVM-wide shutdown hook draining a queue of temp layout roots.
  // Registering a fresh hook per layout build leaked one thread object
  // per rebuild for the life of the JVM (ADVICE r8).
  private val tempDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  private lazy val tempDirHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      var f = tempDirs.poll()
      while (f != null) { rm(f); f = tempDirs.poll() }
    }))
  }
  private[graft] def registerTempDir(d: java.nio.file.Path): Unit = {
    tempDirHook
    tempDirs.add(d.toFile)
    ()
  }

  /** One routing decision: which slot was consulted, whether the query
    * serves from the stored layout (`decision` = "layout") or the live
    * session plan ("live"), and why — `reason` ∈ routed / no-session /
    * no-layout / stale-epoch / param-mismatch. Returned by
    * [[Catalog.explainRoute]] and recorded by every routed entry point
    * in [[Catalog.recentRoutes]], so a caller can always tell whether a
    * query hit storage and, if not, what to fix (rebuild vs re-state
    * parameters).
    */
  final case class RouteReport(slot: String, decision: String,
                               reason: String)

  /** An epoch-pinned serving snapshot ([[Catalog.pin]]): the session
    * plan at `epoch` (an immutable lineage reference — capturing it
    * copies nothing) plus the layouts that were epoch-valid then.
    * [[Catalog.vacuum]] keeps every dir the snapshot references until
    * the pin is released.
    */
  final case class Snapshot(epoch: Long, plan: DataFrame,
                            layouts: Map[String, TableLayout])

  /** Default in-flight-reader guard for [[Catalog.vacuum]]: nothing
    * younger than this is deleted, so a plan handed out just before the
    * superseding refresh can still run its scan.
    */
  val vacuumGraceMs: Long = 20 * 60 * 1000L

  /** Manifest writes between automatic [[Catalog.vacuum]] passes. */
  val autoVacuumEvery: Int = 16

  /** Delta state of a keyed at-rest layout: `add` rows supersede the
    * base (re-encoded edits, renamed ids), `removed` is the id relation
    * to shadow OUT of the base (every superseded id — including ids
    * renamed away, which no add row mentions). Both are pinned at
    * refresh time (checkpointed or parquet-backed), edit-count-sized,
    * and served as `base ⟕̸ removed ∪ add` — a broadcast anti-join, not
    * a rewrite of the base files. `path` is the warehouse-relative patch
    * dir when durable.
    */
  final case class LayoutPatch(add: DataFrame, removed: DataFrame,
                               path: Option[String])

  /** An at-rest layout registered in a [[Catalog]]: what is stored, where,
    * and the session epoch it reflects (stale layouts are never routed).
    */
  sealed trait TableLayout { def builtAtEpoch: Long }
  final case class PqCodesLayout(idCol: String, vecCol: String, path: String,
      seeds: Array[scala.collection.Seq[Float]], m: Int,
      builtAtEpoch: Long,
      patch: Option[LayoutPatch] = None) extends TableLayout
  final case class IvfPqCellLayout(idCol: String, vecCol: String,
      path: String, cents: Seq[(Int, Seq[Float])],
      seeds: Array[scala.collection.Seq[Float]], m: Int, nProbe: Int,
      builtAtEpoch: Long,
      patch: Option[LayoutPatch] = None) extends TableLayout
  final case class BucketedLayout(key: String, table: String, buckets: Int,
      builtAtEpoch: Long) extends TableLayout

  /** A range-clustered full-row layout with a min/max skipping index.
    * With an `idCol` it is also DML-PATCHABLE — the Delta-Lake shape
    * (deletion vectors + an append log over clustered files): bounded
    * edits/inserts/deletes refresh as an id-shadow plus an UNCLUSTERED
    * add-leg that every serve unions in unpruned, so the stats stay
    * truthful about the base files and the exact predicate on top keeps
    * answers byte-identical. Without an id the layout has no key a
    * patch could shadow by and any delta rebuilds (the pre-r10
    * behavior).
    */
  final case class RangedLayout(column: String, path: String,
      stats: DataFrame, files: Int, builtAtEpoch: Long,
      idCol: Option[String] = None,
      patch: Option[LayoutPatch] = None) extends TableLayout

  /** A Z-ORDERED layout: the session's rows written range-partitioned on
    * the Morton interleave of two bucketized numeric columns, with a
    * per-file min/max index over BOTH columns. Every part file covers a
    * small rectangle of (x, y) space, so a rectangle predicate prunes on
    * both dimensions — the Delta/Iceberg `OPTIMIZE ZORDER BY` shape,
    * where a single-column range clustering only serves its own column.
    */
  final case class ZOrderedLayout(colX: String, colY: String, path: String,
      stats: DataFrame, files: Int, builtAtEpoch: Long,
      idCol: Option[String] = None,
      patch: Option[LayoutPatch] = None) extends TableLayout
  final case class LshIndexLayout(idCol: String, textCol: String, n: Int,
      numHashes: Int, bands: Int, index: DataFrame,
      builtAtEpoch: Long,
      patch: Option[LayoutPatch] = None) extends TableLayout
  /** `nDocs`/`avgdl` are the two corpus scalars a routed BM25 needs —
    * captured at build time and kept exact across delta refreshes (a
    * text edit re-measures them in one projection-agg pass; the index
    * files still never rewrite).
    */
  final case class PostingsLayout(idCol: String, textCol: String,
      buckets: Int, path: String, builtAtEpoch: Long,
      patch: Option[LayoutPatch] = None,
      nDocs: Long = 0L, avgdl: Double = 0.0) extends TableLayout

  /** One row per distinct `groupCols` tuple of `base` with `__cnt` =
    * count(*), and per measure the order-free decimal partial sum
    * `__sum_<m>` (round-to-6dp fixed point — the engine's standard
    * exact-and-mergeable idiom), non-null count `__cntm_<m>`, and
    * `__min_<m>` / `__max_<m>`. Every statistic is a commutative merge,
    * so partials from any partitioning of the data — batches of a
    * stream, partitions of a table — re-merge via [[cubeMergePartials]]
    * without changing a digit.
    */
  private[graft] def cubePartials(base: DataFrame, groupCols: Seq[String],
                                  measures: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val aggs = count(lit(1)).as("__cnt") +: measures.flatMap(m => Seq(
      sum(round(col(m), 6).cast("decimal(38,6)")).as(s"__sum_$m"),
      count(col(m)).as(s"__cntm_$m"),
      min(col(m)).as(s"__min_$m"),
      max(col(m)).as(s"__max_$m")))
    base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge a union of cube partials back to one row per group: sums of
    * sums, sums of counts, min of mins, max of maxes — exact. The count
    * merges coalesce to 0: with no group columns (a global aggregate)
    * over an empty partial set, a live `count(*)` answers 0, and the
    * routed merge must too (ADVICE r9 — the SQL rewrite already did;
    * per-group rows always exist, so grouped results are unaffected).
    */
  private[graft] def cubeMergePartials(partials: DataFrame,
                                       groupCols: Seq[String],
                                       measures: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val aggs = coalesce(sum(col("__cnt")), lit(0L)).as("__cnt") +:
      measures.flatMap(m => Seq(
        sum(col(s"__sum_$m")).as(s"__sum_$m"),
        coalesce(sum(col(s"__cntm_$m")), lit(0L)).as(s"__cntm_$m"),
        min(col(s"__min_$m")).as(s"__min_$m"),
        max(col(s"__max_$m")).as(s"__max_$m")))
    partials.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Project cube partials to the user-facing aggregate shape:
    * (groupCols…, n, per measure sum/avg/min/max) — the same output
    * [[Catalog.aggregate]] serves.
    */
  private[graft] def cubeFinish(partials: DataFrame, groupCols: Seq[String],
                                measures: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    partials.select(groupCols.map(col) ++
      (col("__cnt").as("n") +: measures.flatMap(m =>
        Seq(col(s"__sum_$m").cast("double").as(s"sum_$m"),
          (col(s"__sum_$m").cast("double") / col(s"__cntm_$m"))
            .as(s"avg_$m"),
          col(s"__min_$m").as(s"min_$m"),
          col(s"__max_$m").as(s"max_$m")))): _*)
  }

  /** A per-group DISTINCT-COUNT SKETCH layout: one stored row per
    * `groupCols` tuple carrying a Datasketches HLL sketch of `col`
    * (`hll_sketch_agg`). HLL register state is a max over hashed
    * values — order-free and associative — so a union of finer-group
    * sketches has EXACTLY the registers a direct build over the merged
    * rows would, and a rollup to any subset of the group columns
    * estimates from kilobytes of stored sketch instead of a fact scan.
    * At 100 TB this is the only affordable shape for interactive
    * distinct-count dashboards: the exact answer needs a full shuffle
    * of the distinct keys; the sketch needs a group-count-sized read.
    */
  final case class SketchLayout(groupCols: Seq[String], col: String,
      lgK: Int, path: String, builtAtEpoch: Long,
      patch: Option[LayoutPatch] = None) extends TableLayout

  /** An exact DISTINCT-PAIRS layout: the stored rows are `SELECT
    * DISTINCT groupCols…, col` — the minimal projection that answers
    * `COUNT(DISTINCT col) GROUP BY any-subset-of-groupCols` EXACTLY
    * (unlike the HLL [[SketchLayout]], which trades digits for size).
    * Distinctness survives rollup: a subset grouping re-distincts the
    * stored pairs, which is pairs-count-sized work — at 100 TB the
    * difference between shuffling every fact row's key and shuffling
    * one row per distinct (group, value) combination. `id` is the JSON
    * rendering of the FULL tuple, giving the delta patch its shadow key.
    */
  final case class PairsLayout(groupCols: Seq[String], col: String,
      path: String, builtAtEpoch: Long,
      patch: Option[LayoutPatch] = None) extends TableLayout

  /** A materialized aggregate cube: one stored row per distinct
    * `groupCols` tuple carrying `__cnt` (row count) and, per measure,
    * an order-free decimal partial sum `__sum_<m>` plus non-null count
    * `__cntm_<m>`. Because the stored statistics are all COMMUTATIVE
    * MERGEABLE partials, any rollup to a SUBSET of the group columns is
    * exact re-aggregation of group-count-sized data — the classic
    * materialized-view rewrite, at 100 TB the difference between a
    * full fact scan and a read measured in kilobytes. `id` is the JSON
    * rendering of the group tuple (injective per tuple), giving the
    * delta patch a single shadow key like every other keyed layout.
    */
  final case class CubeLayout(groupCols: Seq[String], measures: Seq[String],
      path: String, builtAtEpoch: Long,
      patch: Option[LayoutPatch] = None) extends TableLayout
}
