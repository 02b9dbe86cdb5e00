package graft.io

import java.net.URI
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
  * The rewrite goes to a sibling temp dir first and swaps in atomically
  * (rename), so readers never observe a half-written dataset.
  */
object Compaction {

  case class Stats(filesBefore: Int, filesAfter: Int, bytes: Long)

  private def dataFiles(fs: FileSystem, dir: HPath) =
    fs.listStatus(dir).filter(f => f.isFile &&
      !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))

  /** Rewrite `path` (a parquet dataset dir) to ~targetFileMB files.
    * `clusterBy` non-empty → repartitionByRange + sortWithinPartitions on
    * those columns (file-skipping layout); empty → plain repartition.
    */
  def compact(spark: SparkSession, path: String, targetFileMB: Int = 512,
              clusterBy: Seq[String] = Nil): Stats = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new HPath(path)
    val fs = FileSystem.get(URI.create(path), conf)
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
