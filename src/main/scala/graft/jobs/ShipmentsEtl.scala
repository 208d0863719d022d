package graft.jobs

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.core.Clock
import graft.sources.ExcelSource

/** The shipments Excel upload job (reference: jobs/shipments_etl.py:24-124):
  * a base64 workbook carries four 13-column year blocks (site + months 1-12,
  * starting every 14 columns) on one sheet, plus the uploader (B1) and the
  * base year / version (B2) as header cells. Each block melts long, gets
  * year = version + block index, null amounts become 0, and the 總計 grand
  * total row drops.
  */
object ShipmentsEtl {

  /** `clean_excel` (reference :24-31): the 13-column block at `firstCol`,
    * rows after the four header rows, melted to (site, month, amount). The
    * parse is driver-side (a bounded uploaded document); the melt is an
    * in-plan unpivot. */
  def cleanExcel(spark: SparkSession, xlsx: Array[Byte],
                 firstCol: Int): DataFrame = {
    val months = (1 to 12).map(_.toString)
    val header = "site" +: months
    val rows = ExcelSource.parseSheet(xlsx).drop(4)
      .map(r => (0 until 13).map(i => r.lift(firstCol + i).getOrElse("")))
      .filter(_.exists(_.nonEmpty))
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val wide = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq(_))), schema)
    wide.unpivot(Array(col("site")), months.map(col).toArray, "month", "amount")
      .withColumn("month", col("month").cast("int"))
      // empty cells -> null (pandas' NaN), not an ANSI cast error
      .withColumn("amount", expr("try_cast(amount AS double)"))
  }

  /** The full upload transform (reference :40-124): four year blocks,
    * version/pic stamping, zero-fill, 總計 filter. */
  def shipments(spark: SparkSession, xlsx: Array[Byte],
                clock: Clock): DataFrame = {
    val sheet = ExcelSource.parseSheet(xlsx)
    val pic = sheet(0)(1) // B1
    val version = sheet(1)(1) // B2
    val baseYear = version.trim.toDouble.toInt
    (0 to 3)
      .map(i => cleanExcel(spark, xlsx, i * 14)
        .withColumn("year", lit(baseYear + i)))
      .reduce(_ unionByName _)
      .na.fill(0.0, Seq("amount"))
      .filter(col("site") =!= "總計")
      .withColumn("version", lit(version))
      .withColumn("pic", lit(pic))
      .withColumn("last_update_time",
        lit(java.sql.Timestamp.valueOf(clock.today.atStartOfDay())))
  }
}
