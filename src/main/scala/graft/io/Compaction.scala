package graft.io

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-files compaction — the unglamorous operator every long-lived
  * 100 TB dataset needs. Streaming sinks and incremental appends leave
  * thousands of KB-sized part files; each costs a task, a footer read and a
  * namenode entry, so scan latency degrades until someone rewrites the
  * layout.
  *
  * `compact` rewrites a parquet directory to ~`targetFileMB` files:
  * byte-sized (from the real on-disk footprint, not row counts), optionally
  * range-clustered on sort columns so every output file carries tight
  * min/max column stats — later predicate scans then prune whole files.
  * The rewrite goes to a sibling temp dir first and swaps in via two
  * renames, so readers never see a *half-written* dataset; they can,
  * however, hit a path-missing error in the brief window between the two
  * renames (plain filesystems have no atomic directory swap — a table
  * format's metadata layer is the real fix at scale), and a crash inside
  * the window leaves the data parked at the `.<name>_compact_old` sibling.
  *
  * Hive-partitioned layouts (subdirectories per partition value) are
  * refused: flattening one into plain files would silently destroy
  * plan-time partition pruning for every downstream reader — compact each
  * partition directory instead.
  */
object Compaction {

  case class Stats(filesBefore: Int, filesAfter: Int, bytes: Long)

  /** Thrown when a multi-partition compaction fails partway: `done` lists
    * the partitions whose swap already completed (they stay compacted —
    * per-partition swaps are independent), `failedPartition` the one whose
    * rewrite raised `cause`; partitions after it were not touched.
    */
  class PartialCompactionException(val done: Map[String, Stats],
                                   val failedPartition: String,
                                   cause: Throwable)
    extends RuntimeException(
      s"compactPartitioned failed at partition '$failedPartition' after " +
        s"${done.size} partition(s) were already compacted " +
        s"(${done.keys.take(5).mkString(", ")}${if (done.size > 5) "…" else ""})",
      cause)

  private def dataFiles(fs: FileSystem, dir: HPath) =
    fs.listStatus(dir).filter(f => f.isFile &&
      !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))

  /** Compact every partition directory of a hive-partitioned dataset
    * (`key=value` subdirs) independently — partition values stay intact,
    * so downstream plan-time pruning is preserved; each partition gets its
    * own atomic-ish swap. Returns per-partition stats.
    */
  def compactPartitioned(spark: SparkSession, path: String,
                         targetFileMB: Int = 512,
                         clusterBy: Seq[String] = Nil): Map[String, Stats] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new HPath(path)
    val fs = dir.getFileSystem(conf)
    val parts = fs.listStatus(dir).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.contains("=")) // hive-style only
    require(parts.nonEmpty, s"$path has no key=value partition directories")
    // Refuse nested (key1=/key2=) layouts BEFORE rewriting anything: compact
    // would reject the nested dir only when the loop reached it, leaving the
    // dataset half-rewritten. Leaf-level compaction of a multi-level layout
    // means calling this on each second-level directory.
    val nested = parts.filter { p =>
      fs.listStatus(new HPath(dir, p)).exists(s =>
        s.isDirectory && s.getPath.getName.contains("="))
    }
    require(nested.isEmpty,
      s"$path has nested partition directories under ${nested.take(3).mkString(", ")}" +
        s"${if (nested.length > 3) "…" else ""}; compact each leaf level instead")
    val done = scala.collection.mutable.LinkedHashMap.empty[String, Stats]
    parts.foreach { p =>
      // NonFatal only: VM errors, interrupts and linkage errors propagate
      // as themselves instead of being wrapped in a partial-failure report
      try done(p) = compact(spark, s"$path/$p", targetFileMB, clusterBy)
      catch { case scala.util.control.NonFatal(e) =>
        throw new PartialCompactionException(done.toMap, p, e)
      }
    }
    done.toMap
  }

  /** Rewrite `path` (a parquet dataset dir) to ~targetFileMB files.
    * `clusterBy` non-empty → repartitionByRange + sortWithinPartitions on
    * those columns (file-skipping layout); empty → plain repartition.
    */
  def compact(spark: SparkSession, path: String, targetFileMB: Int = 512,
              clusterBy: Seq[String] = Nil): Stats = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new HPath(path)
    // Path.getFileSystem, not URI.create: partition values may contain
    // characters (spaces) that are invalid in a raw URI string
    val fs = dir.getFileSystem(conf)
    val subdirs = fs.listStatus(dir).filter(_.isDirectory)
      .map(_.getPath.getName).filterNot(n => n.startsWith("_") || n.startsWith("."))
    if (subdirs.nonEmpty)
      throw new IllegalArgumentException(
        s"$path contains partition subdirectories (${subdirs.take(3).mkString(", ")}…); " +
          "compact each partition directory instead of flattening the layout")
    val before = dataFiles(fs, dir)
    val bytes = before.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / (targetFileMB.toLong << 20)).toInt)

    val df = spark.read.parquet(path)
    val shaped =
      if (clusterBy.nonEmpty) {
        val cols = clusterBy.map(col)
        df.repartitionByRange(nFiles, cols: _*).sortWithinPartitions(cols: _*)
      } else df.repartition(nFiles)

    val tmp = new HPath(dir.getParent, s".${dir.getName}_compact_tmp")
    val bak = new HPath(dir.getParent, s".${dir.getName}_compact_old")
    fs.delete(tmp, true); fs.delete(bak, true)
    shaped.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // atomic-ish swap: old dir aside, tmp in, old dropped
    if (!fs.rename(dir, bak))
      throw new IllegalStateException(s"compact: could not move $dir aside")
    if (!fs.rename(tmp, dir)) {
      fs.rename(bak, dir) // restore
      throw new IllegalStateException(s"compact: could not move $tmp into place")
    }
    fs.delete(bak, true)
    Stats(before.length, dataFiles(fs, dir).length, bytes)
  }
}
