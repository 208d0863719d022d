package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** MinHash-LSH near-duplicate detection AT INGEST — the streaming twin of
  * the batch t07 query (reference has no streaming at all; this extends the
  * corpus-ingest family the way EventStream extends the event rollups).
  * Documents flag against everything PREVIOUSLY admitted the moment they
  * arrive, instead of waiting for the nightly batch near-dup job — the
  * dedup-at-ingest shape a continuously-growing 100 TB corpus actually
  * needs.
  *
  * Design notes:
  *  - the signature is computed PER ROW (`array_min` over a `transform` of
  *    the distinct tokens), not as a streaming aggregation — byte-identical
  *    to t07's `min(substring(md5(seed:tok),1,16))` (same md5 hex, same
  *    lexicographic min) while keeping the plan legal: Structured Streaming
  *    refuses a stateful agg feeding flatMapGroupsWithState, a per-row
  *    expression adds no state at all;
  *  - candidate state is keyed by LSH band bucket (`flatMapGroupsWithState`),
  *    holding only doc ids — one small list per OCCUPIED bucket, never a
  *    corpus-wide structure. Each arriving doc pairs against its bucket's
  *    existing members and joins the bucket, so every qualifying pair is
  *    emitted exactly when its LATER member arrives: the emitted set is
  *    arrival-order-free (proven in NearDupStreamSpec by batch parity);
  *  - within a microbatch, a bucket's new docs are processed in doc_id
  *    order, so intra-batch pairs are identical to the batch query's;
  *  - state per bucket is CAPPED (`maxPerBucket`): a pathological bucket
  *    (mass-duplicated template) stops absorbing new members but keeps
  *    flagging against the members it has — later arrivals still pair with
  *    the first `maxPerBucket` docs, which for dedup purposes is what
  *    matters (the doc IS flagged as a near-dup). Production rotation of
  *    the dictionary (periodic batch rebuild, as NearDup's frozen-dictionary
  *    t29 contract documents) bounds long-run drift.
  */
object NearDupStream {

  /** One LSH collision: documents a_id < b_id shared band bucket `band`. */
  case class Hit(band: String, a_id: Long, b_id: Long)

  /** (doc_id, b1..bN) band keys from (doc_id, text, ...) — the t07 scheme:
    * `bands` bands of `rowsPerBand` md5 minhashes, each truncated to 16 hex
    * chars, concatenated per band. Pure per-row column algebra (works
    * identically on batch and streaming frames — the parity spec runs THIS
    * function on both sides). */
  def bandKeys(docs: DataFrame, bands: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    val sigs = (1 to bands * rowsPerBand).map { i =>
      expr(s"array_min(transform(array_distinct(split(text, ' ')), " +
        s"t -> substring(md5(concat('$i:', t)), 1, 16)))").as(s"h$i")
    }
    val sig = docs.filter(col("text").isNotNull)
      .select(col("doc_id") +: sigs: _*)
    val bandCols = (0 until bands).map { b =>
      val parts = (1 to rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      concat(lit(s"${b + 1}:") +: parts: _*).as(s"b${b + 1}")
    }
    sig.select(col("doc_id") +: bandCols: _*)
  }

  /** Streaming near-dup hits over a (doc_id, text, …) stream. Emits one Hit
    * per (band, pair) — the same pair surfacing through two bands emits
    * twice (bands are independent state groups); consumers `distinct` on
    * (a_id, b_id), exactly as the batch t07 does across its band union. */
  def hits(docs: DataFrame, bands: Int = 4, rowsPerBand: Int = 2,
           maxPerBucket: Int = 64): Dataset[Hit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = bandKeys(docs, bands, rowsPerBand)
      .select(col("doc_id"),
        explode(array((1 to bands).map(i => col(s"b$i")): _*)).as("bkey"))
      .as[(Long, String)]
    keyed.groupByKey(_._2)
      .flatMapGroupsWithState[List[Long], Hit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bkey: String, rows: Iterator[(Long, String)],
         state: GroupState[List[Long]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val batch = rows.map(_._1).toArray.distinct.sorted
          val out = Seq.newBuilder[Hit]
          for (d <- batch) {
            for (p <- seen if p != d)
              out += (if (p < d) Hit(bkey, p, d) else Hit(bkey, d, p))
            // membership check, not just the cap: the upstream corpus dir
            // is written at-least-once (foreachBatch replays on crash), and
            // a replayed doc re-inserted here would burn a bucket slot per
            // replay until copies of a few ids crowd out real members
            if (seen.size < maxPerBucket && !seen.contains(d)) seen = d :: seen
          }
          state.update(seen)
          out.result().iterator
      }
  }

  /** The batch reference semantics for parity testing: all within-bucket
    * pairs (a < b), distinct across bands — t07's shape computed through
    * the SAME bandKeys code. */
  def batchPairs(docs: DataFrame, bands: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    val keyed = bandKeys(docs, bands, rowsPerBand)
      .select(col("doc_id"),
        explode(array((1 to bands).map(i => col(s"b$i")): _*)).as("bkey"))
    keyed.select(col("doc_id").as("a_id"), col("bkey"))
      .join(keyed.select(col("doc_id").as("b_id"), col("bkey")), "bkey")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
  }

  /** Test/local harness: drive the stream over whatever files exist
    * (one file per microbatch, so cross-batch state is actually exercised)
    * and return the distinct flagged pairs. */
  def runOnce(spark: SparkSession, dir: String, tableName: String,
              maxPerBucket: Int = 64): DataFrame = {
    val stream = spark.readStream.schema(CorpusStream.docSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = hits(stream, maxPerBucket = maxPerBucket).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(tableName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(tableName).select(col("a_id"), col("b_id")).distinct()
  }
}
