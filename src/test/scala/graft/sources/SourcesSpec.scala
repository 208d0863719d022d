package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.SparkSpec

class SourcesSpec extends SparkSpec {

  test("RestSource zips parallel JSON arrays into rows via the Http seam") {
    val fake = new RestSource.Http {
      override def get(url: String): String =
        """{"datetime": ["2026-01", "2026-02"],
           "actual": [10.5, 11.0], "target": [12.0, 12.5]}"""
    }
    val df = RestSource.solarMonthly(spark, fake, "http://unused")
    val got = df.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got == Set(("2026-01", 10.5, 12.0), ("2026-02", 11.0, 12.5)))
  }

  private def buildXlsx(shared: Seq[String],
                        sheetRows: Seq[(Int, Seq[(String, String, String)])]): Array[Byte] = {
    // cells: (ref, t-attr, v)
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("xl/sharedStrings.xml"))
    z.write(("<?xml version=\"1.0\"?><sst>" +
      shared.map(s => s"<si><t>$s</t></si>").mkString + "</sst>").getBytes)
    z.closeEntry()
    z.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    val rowsXml = sheetRows.map { case (rn, cells) =>
      s"""<row r="$rn">""" + cells.map { case (ref, t, v) =>
        val tAttr = if (t.nonEmpty) s""" t="$t"""" else ""
        s"""<c r="$ref"$tAttr><v>$v</v></c>"""
      }.mkString + "</row>"
    }.mkString
    z.write(s"""<?xml version="1.0"?><worksheet><sheetData>$rowsXml</sheetData></worksheet>""".getBytes)
    z.closeEntry()
    z.close()
    bos.toByteArray
  }

  test("ExcelSource reads header + rows with shared strings and skipRows") {
    // shared strings: 0=site 1=amount 2=WZS 3=WKS ; row1 is a title to skip
    val xlsx = buildXlsx(
      shared = Seq("site", "amount", "WZS", "WKS", "title"),
      sheetRows = Seq(
        1 -> Seq(("A1", "s", "4")),
        2 -> Seq(("A2", "s", "0"), ("B2", "s", "1")),
        3 -> Seq(("A3", "s", "2"), ("B3", "", "123.5")),
        4 -> Seq(("A4", "s", "3"), ("B4", "", "7"))))
    val df = ExcelSource.read(spark, xlsx, skipRows = 1)
    assert(df.columns.toSeq == Seq("site", "amount"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("WZS", "123.5"), ("WKS", "7")))

    val projected = ExcelSource.read(spark, xlsx, skipRows = 1, useCols = Some(Seq("amount")))
    assert(projected.columns.toSeq == Seq("amount"))
  }

  test("ExcelSource fills gap cells with empty strings") {
    val xlsx = buildXlsx(
      shared = Seq("a", "b", "c"),
      sheetRows = Seq(
        1 -> Seq(("A1", "s", "0"), ("B1", "s", "1"), ("C1", "s", "2")),
        2 -> Seq(("A2", "", "1"), ("C2", "", "3")))) // B2 missing
    val df = ExcelSource.read(spark, xlsx)
    val got = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(("1", "", "3")))
  }
}
