package graft.core

import scala.collection.mutable
import scala.util.{Failure, Success, Try}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Catalog._

/** Warehouse garbage collection: manifest-diff vacuum with grace-by-observation clocks, cross-process pin leases, and file-wise sweeps of partially-referenced dirs through skipping-stats lists.
  *
  * An internal implementation seam of [[Catalog]] (split out of the
  * single-file class, r11 verdict task #7): every member here is
  * Catalog implementation detail with zero behavior change — the trait
  * exists so the file stays navigable, not as user API.
  */
trait CatalogVacuum { self: Catalog =>

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

  /** Drop one layout outright: the in-memory route and (on a durable
    * catalog) its manifest entry, so the next [[vacuum]] collects its
    * storage once the grace window passes — the operator gesture that
    * completes the layout lifecycle (build → refresh → retire/drop →
    * vacuum). Queries fall back to the live plan immediately. The
    * manifest removal is a WRITE and the drop is an explicit
    * administrative gesture, so it TAKES the writer token if this
    * catalog holds none (the same rule divergedAttach applies) — a
    * superseded catalog still drops its own in-memory route, never
    * another writer's manifest entry.
    *
    * @return true if anything (route or manifest entry) was removed.
    */
  def dropLayout(name: String, slot: String): Boolean = {
    val hadMem = layouts.remove((name, slot)).isDefined
    val hadMan = removeManifestEntries(Seq((name, slot)), seize = true)
    if (hadMem || hadMan)
      recordRoute(Catalog.RouteReport(slot, "retired", "dropped"))
    hadMem || hadMan
  }

  /** Remove (and re-persist, ONCE) a batch of manifest entries; false
    * when none were present or the write is not permitted. `seize`
    * decides what happens when this catalog holds no writer token yet:
    * an explicit operator gesture ([[dropLayout]]) takes the token like
    * any other write; an IMPLICIT retirement (refresh retire law, DDL
    * drop/rename) must NOT — seizing the single-writer role as a side
    * effect of a read-mostly catalog's gesture would fence the actual
    * ingest writer mid-loop. An un-removed entry degrades safely: the
    * reopen digest gate declines it, only its storage stays pinned.
    */
  private[core] def removeManifestEntries(keys: Seq[(String, String)],
                                          seize: Boolean): Boolean =
    warehouse.exists { wh =>
      val present = keys.filter(manifest.contains)
      present.nonEmpty && (seize || writerToken.isDefined) && Try {
        fenceWriter(wh)
        present.foreach(manifest.remove)
        LayoutStore.save(spark, wh, manifest.values.toSeq)
        true
      }.getOrElse(false)
    }

  /** First time each candidate path was OBSERVED unreferenced: the grace
    * window measures time-since-supersession, not file age — a dir built
    * hours ago but superseded seconds ago must survive the window for
    * the in-flight readers the guard exists for (a modification-time
    * check would delete it immediately). Entries clear when a path
    * becomes referenced again (a dormant entry's dir, a new pin).
    */
  private[core] val unreferencedSince = mutable.HashMap.empty[String, Long]

  /** Dormant clustered entries' stats file lists, read once per process
    * per layout dir — the dir is write-once, so entries never go stale.
    */
  private[core] val dormantStatsCache = mutable.HashMap.empty[String, Seq[String]]

  private[core] def vacuumIn(wh: String, whPath: org.apache.hadoop.fs.Path,
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
      // the existence probe runs BEFORE the load: probing after could
      // see a manifest another writer committed in between, misreading
      // its commit window as "legitimately empty" and unreferencing the
      // dirs it just recorded (r13 review — TOCTOU)
      val manifestExisted = fs.exists(new Path(s"$wh/_manifest"))
      val diskEntries = LayoutStore.loadOpt(spark, wh) match {
        case Some(es) => es
        case None => return Seq.empty
      }
      // an ABSENT manifest FILE over a warehouse that already holds
      // layout dirs is a writer's delete+rename window (or a crashed
      // writer) — abort; a genuinely fresh warehouse has nothing to
      // collect anyway. A manifest that EXISTED with ZERO entries is a
      // different thing entirely: every layout was legitimately dropped
      // or retired (r13 dropLayout), and its strands must collect —
      // aborting here would pin a fully-emptied warehouse forever.
      if (diskEntries.isEmpty && !manifestExisted &&
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
  private[core] def layoutPathsOf(l: TableLayout): Seq[String] = l match {
    case p: PqCodesLayout => Seq(p.path)
    case p: IvfPqCellLayout => Seq(p.path)
    case p: RangedLayout => Seq(p.path)
    case p: ZOrderedLayout => Seq(p.path)
    case p: ZOrdered3Layout => Seq(p.path)
    case p: PostingsLayout => Seq(p.path)
    case p: CubeLayout => Seq(p.path)
    case p: SketchLayout => Seq(p.path)
    case p: PairsLayout => Seq(p.path)
    case p: LshIndexLayout =>
      Try(p.index.inputFiles.toSeq).getOrElse(Seq.empty)
    case _ => Seq.empty // bucketed lives in the metastore
  }

  private[core] def patchOf(l: TableLayout): Option[LayoutPatch] = l match {
    case p: PqCodesLayout => p.patch
    case p: IvfPqCellLayout => p.patch
    case p: RangedLayout => p.patch
    case p: ZOrderedLayout => p.patch
    case p: ZOrdered3Layout => p.patch
    case p: LshIndexLayout => p.patch
    case p: PostingsLayout => p.patch
    case p: CubeLayout => p.patch
    case p: SketchLayout => p.patch
    case p: PairsLayout => p.patch
    case _ => None
  }

  /** The absolute data files a clustered layout's stats list names. */
  private[core] def statsFilesOf(l: TableLayout): Seq[String] = l match {
    case p: RangedLayout =>
      Try(p.stats.select("file").collect().map(_.getString(0)).toSeq)
        .getOrElse(Seq.empty)
    case p: ZOrderedLayout =>
      Try(p.stats.select("file").collect().map(_.getString(0)).toSeq)
        .getOrElse(Seq.empty)
    case p: ZOrdered3Layout =>
      Try(p.stats.select("file").collect().map(_.getString(0)).toSeq)
        .getOrElse(Seq.empty)
    case _ => Seq.empty
  }
}
