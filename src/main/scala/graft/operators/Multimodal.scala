package graft.operators

import org.apache.spark.sql.{Dataset, Encoders}

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media travel as opaque `binary` columns with typed metadata, and
  * decode/feature-extraction runs partition-at-a-time so codec state is
  * initialized once per task, not once per row.
  *
  * The actual codecs are NOT in this container, so [[FakeDecoder]] is a
  * clearly-marked deterministic stand-in — the Spark-side contract (schema,
  * encoders, batch shape, partition-local init, feature output) is the real,
  * tested part, and swapping in a JNI/FFI decoder changes only the
  * [[Decoder]] binding.
  *
  * Scale notes: binary payloads are the widest column by 1000×, so (a) never
  * shuffle them — featurize first, shuffle the small feature rows; (b) size
  * input partitions by bytes (`spark.sql.files.maxPartitionBytes`), not row
  * count; (c) frame sampling happens inside the decoder so only sampled
  * frames ever materialize.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      mime: String,
      payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      mime: String,
      n_bytes: Long,
      mean_byte: Double,
      byte_hist: Array[Long], // 16 buckets
      frames_sampled: Int)

  /** Decoder contract: one instance per partition (expensive init amortized),
    * one call per media row. */
  trait Decoder extends Serializable {
    def decode(row: MediaRow, frameStride: Int): MediaFeatures
  }

  /** Deterministic fake decoder: byte statistics instead of pixel decode.
    * Replace with a real codec binding in production. */
  object FakeDecoder extends Decoder {
    override def decode(row: MediaRow, frameStride: Int): MediaFeatures = {
      val bytes = row.payload
      val hist = new Array[Long](16)
      var sum = 0L
      var i = 0
      while (i < bytes.length) {
        val v = bytes(i) & 0xff
        hist(v >> 4) += 1
        sum += v
        i += 1
      }
      val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
      // "frame sampling": one pseudo-frame per frameStride KiB of payload
      val frames = if (frameStride <= 0) 0 else (bytes.length / (frameStride * 1024)) + 1
      MediaFeatures(row.media_id, row.mime, bytes.length.toLong, mean, hist, frames)
    }
  }

  /** Partition-at-a-time featurization: the distributed shape a real decode
    * pipeline needs (per-partition decoder init, streaming iterator, no
    * per-row driver involvement). */
  def featurize(ds: Dataset[MediaRow], decoder: Decoder = FakeDecoder,
                frameStride: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    ds.mapPartitions { it =>
      // per-partition decoder initialization happens here
      it.map(row => decoder.decode(row, frameStride))
    }
  }
}
