package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Corrupt-record quarantine for semi-structured ingest.
  *
  * The reference trusts its REST/Excel payloads completely — one malformed
  * row aborts the whole job (`pd.read_excel` / `.json()` raise, the Celery
  * task fails, the mail goes out; reference: jobs/shipments_etl.py:24-31,
  * jobs/source_to_raw/solar.py:93-108). At 100 TB a feed WILL contain bad
  * rows, and the pipeline contract becomes: load everything parseable,
  * quarantine everything else — with a count, not an exception.
  *
  * Spark-first shape: PERMISSIVE mode with `columnNameOfCorruptRecord`
  * keeps the raw text of every unparseable row in a side column in the SAME
  * single pass as the parse (no second scan, no driver loop). `split` then
  * routes rows to the clean frame and the quarantine frame; both are plain
  * DataFrames the caller writes wherever the medallion layout wants them
  * (`raw.<table>` vs `raw.<table>_quarantine`).
  *
  * The one Spark trap this wraps: a cached/pruned plan may read ONLY the
  * corrupt column, in which a row is never corrupt (nothing else was asked
  * to parse) — so `split` materializes the full row before filtering.
  */
object Quarantine {

  val CorruptCol = "_corrupt_record"

  /** Read JSON-lines with an enforced schema; unparseable or
    * schema-violating rows keep their raw text in [[CorruptCol]]. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Route a permissive parse into (clean, quarantined). Clean rows drop the
    * corrupt column; quarantined rows carry ONLY the raw text plus the
    * ingest-time columns the caller adds (source name, load timestamp). */
  def split(parsed: DataFrame): (DataFrame, DataFrame) = {
    // force row-wide parsing before the corrupt test (see class doc)
    val full = parsed.cache()
    val clean = full.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = full.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_record"))
    (clean, bad)
  }

  /** One-call ingest: parse, split, return clean rows + quarantine count.
    * The caller persists the quarantine frame next to the clean table. */
  def ingestJson(spark: SparkSession, path: String, schema: StructType)
  : (DataFrame, DataFrame) =
    split(readJson(spark, path, schema))
}
