package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions.col

/** pandas' default `to_json` orientation — columnar `{"col":{"row":v}}` —
  * as read and written by the reference's save-as-JSON path
  * (`/root/reference/main.py:72-73,83-84`: bare `pd.read_json(file_name)` /
  * `df.to_json(file_name)`, i.e. `orient="columns"`).
  *
  * This closes the one interchange gap with the reference's own JSON output:
  * a file the reference GUI saved now loads here, and a file saved here
  * loads in the reference. The codec is driver-side by design — a
  * columns-orient file is a single JSON document, not splittable, and only
  * ever produced by the reference's in-memory pandas table (bounded,
  * interactive-scale). The 100 TB JSON path stays Spark-native JSON-lines
  * ([[Formats.write]]); this shim exists for interchange, not throughput.
  *
  * Dialect notes:
  *  - Row index keys are written as `"0".."n-1"` in the DataFrame's current
  *    row order (pandas default RangeIndex). On read, keys that all parse as
  *    integers are ordered numerically; anything else falls back to
  *    first-seen order. The index itself is not surfaced as a column (same
  *    policy as the CSV index delta, [[Formats]] scaladoc).
  *  - Dates/timestamps are written as their ISO string rendering, not
  *    pandas' epoch-millis default — lossless for this engine's round-trip
  *    and human-readable, but a pandas `read_json` of such a file yields
  *    strings (documented delta).
  */
object PandasJson {

  private def mapper = new ObjectMapper()

  /** Heuristic sniff used by [[Formats.read]] when a `.json` file starts
    * with `{`: pandas columns-orient iff the first line parses as an object
    * whose every value is itself an object, all sharing one identical key
    * set of integer-looking row labels. A JSON-lines record whose fields
    * are all structs keyed by identical all-integer field names would be
    * misrouted — call [[Formats.readJsonLines]] to bypass the sniff.
    */
  def looksColumnar(path: String): Boolean = {
    val p = Paths.get(path)
    if (!Files.isRegularFile(p)) return false
    val firstLine = {
      val in = Files.newBufferedReader(p, StandardCharsets.UTF_8)
      try Option(in.readLine()).getOrElse("") finally in.close()
    }
    try {
      val root = mapper.readTree(firstLine)
      if (root == null || !root.isObject) return false
      val cols = root.asInstanceOf[ObjectNode].properties().asScala.toSeq
      if (cols.isEmpty) return true // pandas writes `{}` for an empty frame
      val keySets = cols.map { e =>
        if (!e.getValue.isObject) return false
        e.getValue.asInstanceOf[ObjectNode].properties().asScala
          .map(_.getKey).toVector
      }
      keySets.forall(_ == keySets.head) &&
        keySets.head.forall(k => k.nonEmpty && k.forall(_.isDigit))
    } catch { case _: Exception => false }
  }

  /** Load a columns-orient file: driver-side transpose to one record line
    * per row, then Spark's JSON reader for schema inference (longs,
    * doubles, booleans, strings, null — same inference as the JSON-lines
    * path, so downstream code sees no dialect difference).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val root = mapper.readTree(Files.readAllBytes(Paths.get(path)))
    require(root.isObject, s"not a pandas columns-orient JSON object: $path")
    val cols = root.asInstanceOf[ObjectNode].properties().asScala.toSeq
      .map(e => e.getKey -> e.getValue.asInstanceOf[ObjectNode])
    if (cols.isEmpty) return Formats.emptyTable(spark)

    val keys0 = cols.head._2.properties().asScala.map(_.getKey).toVector
    val keys =
      if (keys0.forall(k => k.nonEmpty && k.forall(_.isDigit)))
        keys0.sortBy(_.toLong)
      else keys0

    val m = mapper
    val lines = keys.map { k =>
      val rec = m.createObjectNode()
      cols.foreach { case (name, byRow) =>
        rec.set[JsonNode](name, byRow.get(k))
      }
      m.writeValueAsString(rec)
    }
    spark.read.json(spark.createDataset(lines)(Encoders.STRING))
      .select(cols.map(c => col(c._1)): _*) // restore the file's column order
  }

  /** Driver-side row cap for [[write]]. The xlsx sheet limit
    * ([[ExcelIO.MaxRows]]) is borrowed as the definition of "interactive
    * scale": both codecs are single-document interchange formats that
    * materialize the whole table on the driver, and a columns-orient file
    * bigger than a spreadsheet has no consumer — pandas itself would
    * struggle to re-read it.
    */
  val MaxRows: Int = ExcelIO.MaxRows

  /** Save as columns-orient: one JSON object, columns in schema order, row
    * keys `"0".."n-1"` in the DataFrame's current row order. Collects to
    * the driver (interactive-scale, same bound as the reference's own
    * in-memory table), refusing above `maxRows` BEFORE materializing the
    * table — the probe collects at most `maxRows + 1` rows, so an
    * over-limit table costs one bounded scan, not a driver OOM.
    */
  def write(df: DataFrame, path: String, maxRows: Int = MaxRows): Unit = {
    require(maxRows >= 0 && maxRows < Int.MaxValue, s"bad maxRows: $maxRows")
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"pandas columns-orient JSON is a driver-side interchange codec " +
        s"capped at $maxRows rows; this table exceeds it — use the " +
        s"records-orient JSON-lines sink (Formats.write to a .json path), " +
        s"which writes distributed and has no row cap")
    val m = mapper
    val root = m.createObjectNode()
    val colNodes = df.schema.fieldNames.map(n => n -> root.putObject(n))
    rows.zipWithIndex.foreach { case (row, i) =>
      val key = i.toString
      colNodes.zipWithIndex.foreach { case ((_, node), c) =>
        row.get(c) match {
          case null                 => node.putNull(key)
          case b: Boolean           => node.put(key, b)
          case v: Int               => node.put(key, v)
          case v: Long              => node.put(key, v)
          case v: Float             => node.put(key, v)
          case v: Double            => node.put(key, v)
          case v: java.math.BigDecimal => node.put(key, v)
          case v: Short             => node.put(key, v.toInt)
          case v: Byte              => node.put(key, v.toInt)
          case other                => node.put(key, other.toString)
        }
      }
    }
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, m.writeValueAsBytes(root))
  }
}
