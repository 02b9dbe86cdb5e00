package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S3/S7: minimal, dependency-free XLSX source/sink (JDK zip + StAX only).
  *
  * The reference reads/writes Excel through pandas (`pd.read_excel` /
  * `to_excel`, `/root/reference/main.py:70-71,81-82`). Spark has no native
  * Excel source and this environment forbids external deps, so the engine
  * ships a hand-rolled OOXML subset:
  *  - writer emits one worksheet, header row from column names, numbers /
  *    booleans / inline strings;
  *  - reader handles shared strings, inline strings, booleans, numbers and
  *    formula-string cells, sparse cells by A1 reference, and infers
  *    long → double → boolean → string column types like the pandas load.
  *
  * Scale posture: XLSX is a single-machine interchange format (hard format
  * cap of 1,048,576 rows), so the codec deliberately runs on the driver —
  * `read` parallelizes the parsed rows into a distributed DataFrame,
  * `write` collects (guarded by the format's own row cap). Large-data
  * ingest/egress belongs to parquet/csv/json; this exists for capability
  * parity with the reference.
  */
object ExcelIO {

  val MaxRows = 1048576 // the xlsx format's hard sheet limit

  // ---- writer -------------------------------------------------------------

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  private def colRef(i: Int): String = {
    var n = i; val sb = new StringBuilder
    while (n >= 0) { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
    sb.toString
  }

  def write(df: DataFrame, path: String): Unit = {
    val rows = df.collect()
    require(rows.length + 1 <= MaxRows,
      s"xlsx sheet cap is $MaxRows rows; got ${rows.length} (write parquet/csv instead)")
    val schema = df.schema
    val out = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def entry(name: String, content: String): Unit = {
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes(StandardCharsets.UTF_8))
      out.closeEntry()
    }
    try {
      entry("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin)
      entry("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      entry("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin)
      entry("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)

      val sheet = new StringBuilder
      sheet.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sheet.append("\n<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
      // header row
      sheet.append("<row r=\"1\">")
      schema.fieldNames.zipWithIndex.foreach { case (name, c) =>
        sheet.append(s"""<c r="${colRef(c)}1" t="inlineStr"><is><t>${xmlEscape(name)}</t></is></c>""")
      }
      sheet.append("</row>")
      rows.zipWithIndex.foreach { case (row, r0) =>
        val r = r0 + 2
        sheet.append(s"""<row r="$r">""")
        schema.fields.zipWithIndex.foreach { case (f, c) =>
          if (!row.isNullAt(c)) {
            val ref = s"${colRef(c)}$r"
            f.dataType match {
              case _: NumericType =>
                sheet.append(s"""<c r="$ref"><v>${row.get(c)}</v></c>""")
              case BooleanType =>
                val v = if (row.getBoolean(c)) 1 else 0
                sheet.append(s"""<c r="$ref" t="b"><v>$v</v></c>""")
              case _ =>
                sheet.append(s"""<c r="$ref" t="inlineStr"><is><t>${
                  xmlEscape(String.valueOf(row.get(c)))}</t></is></c>""")
            }
          }
        }
        sheet.append("</row>")
      }
      sheet.append("</sheetData></worksheet>")
      entry("xl/worksheets/sheet1.xml", sheet.toString)
    } finally out.close()
  }

  // ---- reader -------------------------------------------------------------

  private def cellColIndex(ref: String): Int = {
    var i = 0; var n = 0
    while (i < ref.length && ref(i).isLetter) { n = n * 26 + (ref(i) - 'A' + 1); i += 1 }
    n - 1
  }

  private def readSharedStrings(zf: ZipFile): IndexedSeq[String] = {
    val e = zf.getEntry("xl/sharedStrings.xml")
    if (e == null) return IndexedSeq.empty
    val in = new BufferedInputStream(zf.getInputStream(e))
    val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inSi = false; var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; cur.clear()
              case "t" if inSi => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "si" => inSi = false; out += cur.toString
              case _ =>
            }
          case _ =>
        }
      }
    } finally { r.close(); in.close() }
    out.toIndexedSeq
  }

  /** Raw sheet parse: rows of (colIdx -> raw cell string), strings already
    * resolved through sharedStrings/inlineStr.
    */
  private def readSheet(path: String): Seq[Map[Int, String]] = {
    val zf = new ZipFile(path)
    try {
      val shared = readSharedStrings(zf)
      val sheetEntry = Option(zf.getEntry("xl/worksheets/sheet1.xml")).getOrElse {
        import scala.jdk.CollectionConverters._
        zf.entries().asScala.find(_.getName.matches("xl/worksheets/.*\\.xml"))
          .getOrElse(throw new IllegalArgumentException(s"no worksheet in $path"))
      }
      val in = new BufferedInputStream(zf.getInputStream(sheetEntry))
      val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
      val rows = mutable.ArrayBuffer.empty[Map[Int, String]]
      var cells = mutable.Map.empty[Int, String]
      var cellRef = ""; var cellType = ""; var inV = false; var inIsT = false
      val v = new StringBuilder
      try {
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
              case "row" => cells = mutable.Map.empty
              case "c" =>
                cellRef = Option(r.getAttributeValue(null, "r")).getOrElse("")
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              case "v" => inV = true; v.clear()
              case "t" => inIsT = true; v.clear()
              case _ =>
            }
            case XMLStreamConstants.CHARACTERS if inV || inIsT => v.append(r.getText)
            case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
              case "v" =>
                inV = false
                val raw = cellType match {
                  case "s" => shared(v.toString.trim.toInt)
                  case "b" => if (v.toString.trim == "1") "true" else "false"
                  case _ => v.toString
                }
                cells(cellColIndex(cellRef)) = raw
              case "t" =>
                if (inIsT) { inIsT = false; cells(cellColIndex(cellRef)) = v.toString }
              case "row" => rows += cells.toMap
              case _ =>
            }
            case _ =>
          }
        }
      } finally { r.close(); in.close() }
      rows.toSeq
    } finally zf.close()
  }

  /** pandas-like load: first row is the header, column types inferred as
    * long → double → boolean → string over the observed values.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = readSheet(path)
    if (raw.isEmpty) return spark.emptyDataFrame
    val header = raw.head.toSeq.sortBy(_._1).map(_._2)
    val ncols = header.length
    val body = raw.tail.map(m => (0 until ncols).map(m.get))

    def infers(idx: Int): DataType = {
      val vs = body.flatMap(_(idx))
      if (vs.isEmpty) StringType
      else if (vs.forall(s => scala.util.Try(s.trim.toLong).isSuccess)) LongType
      else if (vs.forall(s => scala.util.Try(s.trim.toDouble).isSuccess)) DoubleType
      else if (vs.forall(s => s == "true" || s == "false")) BooleanType
      else StringType
    }
    val types = (0 until ncols).map(infers)
    val schema = StructType(header.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true)
    })
    val rows = body.map { cells =>
      Row.fromSeq(cells.zip(types).map {
        case (None, _) => null
        case (Some(s), LongType) => s.trim.toLong
        case (Some(s), DoubleType) => s.trim.toDouble
        case (Some(s), BooleanType) => s == "true"
        case (Some(s), _) => s
      })
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), schema)
  }
}
