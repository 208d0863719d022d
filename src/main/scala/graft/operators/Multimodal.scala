package graft.operators

import org.apache.spark.sql.{Dataset, Encoders}

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media travel as opaque `binary` columns with typed metadata, and
  * decode/feature-extraction runs partition-at-a-time so codec state is
  * initialized once per task, not once per row.
  *
  * Image decode is real: [[ImageIoDecoder]] uses the JDK's `javax.imageio`
  * readers (PNG/JPEG/BMP/GIF) and is exercised on real encoded bytes in
  * MultimodalSpec. Audio/video codecs are NOT in this container, so
  * [[FakeDecoder]] remains the clearly-marked deterministic stand-in for
  * those — swapping in a JNI/FFI decoder changes only the [[Decoder]]
  * binding; the Spark-side contract (schema, encoders, batch shape,
  * partition-local init, feature output) is shared and tested.
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

  /** Real JVM image decode via `javax.imageio` (PNG/JPEG/BMP/GIF readers
    * ship in the JDK — no external codec needed): decodes the payload to
    * pixels and emits luminance statistics in the same [[MediaFeatures]]
    * shape (byte_hist = 16-bucket luminance histogram, mean_byte = mean
    * luminance). The frame-sampling analogue for stills is row striding:
    * only every `frameStride`-th scanline is read, the way a video decoder
    * samples every N-th frame. Payloads ImageIO cannot decode fall back to
    * [[FakeDecoder]] byte statistics instead of failing the task. */
  object ImageIoDecoder extends Decoder {
    override def decode(row: MediaRow, frameStride: Int): MediaFeatures = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.payload))
        catch { case _: java.io.IOException => null }
      if (img == null) FakeDecoder.decode(row, frameStride)
      else {
        val w = img.getWidth
        val h = img.getHeight
        val stride = math.max(1, frameStride)
        val hist = new Array[Long](16)
        var sum = 0L
        var n = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            hist(lum >> 4) += 1
            sum += lum
            n += 1
            x += 1
          }
          y += stride
        }
        val mean = if (n == 0) 0.0 else sum.toDouble / n
        MediaFeatures(row.media_id, row.mime, row.payload.length.toLong, mean,
          hist, (h + stride - 1) / stride)
      }
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
