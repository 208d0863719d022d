package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.parsers.DocumentBuilderFactory
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.w3c.dom.Element
import scala.collection.mutable

/** Excel (.xlsx) ingestion (S4): the reference accepts base64-encoded
  * workbooks over HTTP and reads them with openpyxl/pandas
  * (reference: jobs/shipments_etl.py:24-31,40-57 — `read_excel(usecols,
  * skiprows=4)` plus direct header-cell reads).
  *
  * This is a dependency-free reader for the SpreadsheetML subset those
  * uploads use (inline sheet1 + shared strings): xlsx is a zip of XML, so
  * `java.util.zip` + the JDK DOM parser cover it. Driver-side by design —
  * uploaded workbooks are small bounded documents; the result is a DataFrame
  * immediately after parse (all-string columns, like the reference's
  * astype(str) pass; numeric casts are explicit downstream).
  */
object ExcelSource {

  /** Parse the first worksheet into rows of cell strings (empty string for
    * gaps), resolving shared strings. */
  def parseSheet(xlsx: Array[Byte]): Seq[Seq[String]] = {
    var shared = Vector.empty[String]
    var sheetXml: Array[Byte] = null
    val zin = new ZipInputStream(new ByteArrayInputStream(xlsx))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName == "xl/sharedStrings.xml") shared = parseShared(zin.readAllBytes())
        else if (e.getName.matches("xl/worksheets/sheet1\\.xml"))
          sheetXml = zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    require(sheetXml != null, "xlsx has no xl/worksheets/sheet1.xml")
    parseCells(sheetXml, shared)
  }

  private def dom(bytes: Array[Byte]) = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  private def parseShared(bytes: Array[Byte]): Vector[String] = {
    val doc = dom(bytes)
    val sis = doc.getElementsByTagName("si")
    (0 until sis.getLength).map(i => sis.item(i).getTextContent).toVector
  }

  private def parseCells(bytes: Array[Byte], shared: Vector[String]): Seq[Seq[String]] = {
    val doc = dom(bytes)
    val rowNodes = doc.getElementsByTagName("row")
    val out = mutable.ArrayBuffer.empty[Seq[String]]
    var maxCols = 0
    val parsed = (0 until rowNodes.getLength).map { i =>
      val rowEl = rowNodes.item(i).asInstanceOf[Element]
      val cells = rowEl.getElementsByTagName("c")
      val byCol = mutable.Map.empty[Int, String]
      (0 until cells.getLength).foreach { j =>
        val c = cells.item(j).asInstanceOf[Element]
        val ref = c.getAttribute("r") // e.g. "B3"
        val colIdx = ref.takeWhile(_.isLetter)
          .foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
        val vNodes = c.getElementsByTagName("v")
        val raw = if (vNodes.getLength > 0) vNodes.item(0).getTextContent else ""
        val value =
          if (c.getAttribute("t") == "s" && raw.nonEmpty) shared(raw.toInt)
          else raw
        byCol(colIdx) = value
      }
      if (byCol.nonEmpty) maxCols = math.max(maxCols, byCol.keys.max + 1)
      byCol
    }
    parsed.foreach { byCol =>
      out += (0 until maxCols).map(c => byCol.getOrElse(c, ""))
    }
    out.toSeq
  }

  /** DataFrame view of a worksheet, mirroring the reference's
    * `read_excel(skiprows=N, usecols=...)`: skip leading rows, take the next
    * row as the header, project the named columns. */
  def read(spark: SparkSession, xlsx: Array[Byte], skipRows: Int = 0,
           useCols: Option[Seq[String]] = None): DataFrame = {
    val rows = parseSheet(xlsx).drop(skipRows)
    require(rows.nonEmpty, "no header row after skipRows")
    val header = rows.head.map(_.trim)
    val data = rows.tail
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val rdd = spark.sparkContext.parallelize(
      data.map(r => Row.fromSeq(header.indices.map(i => r.lift(i).getOrElse("")))))
    val df = spark.createDataFrame(rdd, schema)
    useCols.map(cs => df.select(cs.map(org.apache.spark.sql.functions.col): _*))
      .getOrElse(df)
  }
}
