package graft.jobs

import graft.SparkSpec

class ElecTransferSpec extends SparkSpec {
  import spark.implicits._

  test("nextYearTransferSuggest lifts meters to the target green rate") {
    val account = Seq(
      // meter M1: 20/100 green -> suggest 30 at 30% target
      ("S1", "P1", "M1", "Prov", "green_elect_vol", "elect_total", 20.0, 2026, 1),
      ("S1", "P1", "M1", "Prov", "grey_elect", "elect_total", 100.0, 2026, 1),
      // meter M2 already over target: keep its 50
      ("S1", "P1", "M2", "Prov", "green_elect_vol", "elect_total", 50.0, 2026, 1),
      ("S1", "P1", "M2", "Prov", "grey_elect", "elect_total", 100.0, 2026, 1),
      // rollup grains and other categories are excluded
      ("ALL", "P1", "M1", "Prov", "green_elect_vol", "elect_total", 9.0, 2026, 1),
      ("S1", "ALL", "M1", "Prov", "grey_elect", "elect_total", 9.0, 2026, 1),
      ("S1", "P1", "M1", "Prov", "green_elect_vol", "elect_bill", 9.0, 2026, 1),
      ("S1", "P1", "M1", "Prov", "green_elect_vol", "elect_total", 9.0, 2025, 1)
    ).toDF("site", "plant", "meter_code", "provider_name", "category1",
      "category2", "amount", "year", "month")

    val got = ElecTransfer.nextYearTransferSuggest(account, 2026, 0.3)
      .select("meter_code", "year", "suggest_vol", "current_rate")
      .as[(String, Int, Double, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("M1") == (("M1", 2027, 30.0, Some(0.2))))
    assert(got("M2") == (("M2", 2027, 50.0, Some(0.5))))
  }

  test("uploadReconciliation parses the upload sheet with null-safe casts") {
    val clock = graft.core.FixedClock(java.time.LocalDate.of(2026, 8, 1))
    // reuse the xlsx-builder approach inline: header + two data rows
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("xl/sharedStrings.xml"))
    val shared = Seq("provider_name", "meter_code", "month", "amount", "Prov", "M1")
    z.write(("<?xml version=\"1.0\"?><sst>" +
      shared.map(s => s"<si><t>$s</t></si>").mkString + "</sst>")
      .getBytes("UTF-8"))
    z.closeEntry()
    z.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
    z.write(("""<?xml version="1.0"?><worksheet><sheetData>""" +
      """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>""" +
      """<c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c></row>""" +
      """<row r="2"><c r="A2" t="s"><v>4</v></c><c r="B2" t="s"><v>5</v></c>""" +
      """<c r="C2"><v>1</v></c><c r="D2"><v>12.5</v></c></row>""" +
      """<row r="3"><c r="A3" t="s"><v>4</v></c><c r="B3" t="s"><v>5</v></c>""" +
      """<c r="C3"><v>2</v></c><c r="D3"><v></v></c></row>""" +
      """</sheetData></worksheet>""").getBytes("UTF-8"))
    z.closeEntry()
    z.close()
    val got = ElecTransfer.uploadReconciliation(spark, bos.toByteArray, clock)
      .select("provider_name", "meter_code", "month", "amount")
      .as[(String, String, Int, Double)].collect().toSet
    assert(got == Set(("Prov", "M1", 1, 12.5), ("Prov", "M1", 2, 0.0)))
  }
}
