package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared LSM fold under the index family's `compact` methods
  * (AnnIndex, SemDeDupIndex, NearDupIndex): every batch-partitioned
  * table (`<root>/ingest_batch=<b>/…`) folds back into batch 0, with the
  * same crash contract everywhere — batch 0 is WRITTEN before the higher
  * batches are deleted, so a crash between the two leaves transient
  * duplicate copies; those copies are byte-identical rows, so the
  * `dropDuplicates(keyCol)` inside the fold makes a re-run heal exactly.
  * Run compaction with ingest paused: an append racing the delete step
  * could land a batch id the delete then removes. */
private[jobs] object LsmCompact {

  /** Fold `root`'s ingest_batch partitions into batch 0. `write` lands
    * the folded frame at `<root>/ingest_batch=0` (caller chooses
    * partitioning/layout within it). Returns the folded-away batch ids
    * (empty = already compact, nothing written). */
  def fold(spark: SparkSession, root: String, keyCol: String,
           write: DataFrame => Unit): Seq[Long] = {
    val all = spark.read.parquet(root)
    val batches = all.select(col("ingest_batch").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
    if (batches.length <= 1) return Seq.empty
    val folded = all.drop("ingest_batch")
      .dropDuplicates(keyCol) // heals a crashed prior compact's leftovers
      .localCheckpoint() // materialize BEFORE overwriting what we read
    write(folded)
    val gone = batches.filter(_ > 0L)
    gone.foreach { b =>
      val dir = java.nio.file.Paths.get(s"$root/ingest_batch=$b")
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq
          .sortBy(-_.getNameCount).foreach(java.nio.file.Files.delete)
      }
    }
    gone
  }
}
