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

  /** Real JVM audio decode via `javax.sound.sampled` (WAV/AIFF/AU PCM
    * readers ship in the JDK): decodes the payload to samples and emits
    * amplitude statistics in the [[MediaFeatures]] shape (byte_hist =
    * 16-bucket |amplitude| histogram over a 0..255 scale, mean_byte = mean
    * scaled |amplitude|). Frame sampling is literal here: only every
    * `frameStride`-th PCM frame is read (first channel). Non-PCM16 or
    * undecodable payloads fall back to [[FakeDecoder]] byte statistics
    * instead of failing the task, same contract as [[ImageIoDecoder]]. */
  object WavDecoder extends Decoder {
    override def decode(row: MediaRow, frameStride: Int): MediaFeatures = {
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(row.payload))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case _: java.io.IOException => null
        }
      val fmt = if (in == null) null else in.getFormat
      if (fmt == null || fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
        fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        FakeDecoder.decode(row, frameStride)
      else {
        val frameSize = fmt.getFrameSize
        val buf = in.readAllBytes()
        val stride = math.max(1, frameStride)
        val nFrames = buf.length / frameSize
        val hist = new Array[Long](16)
        var sum = 0L
        var n = 0L
        var f = 0
        while (f < nFrames) {
          val off = f * frameSize
          // first channel, 16-bit little-endian signed PCM
          val amp = math.abs(((buf(off + 1) << 8) | (buf(off) & 0xff)).toInt)
          val v = math.min(255, amp >> 7) // 0..32768 -> 0..255
          hist(v >> 4) += 1
          sum += v
          n += 1
          f += stride
        }
        val mean = if (n == 0) 0.0 else sum.toDouble / n
        MediaFeatures(row.media_id, row.mime, row.payload.length.toLong, mean,
          hist, n.toInt)
      }
    }
  }

  /** Real multi-frame ("video") decode + frame sampling via the JDK's
    * `javax.imageio` SEQUENCE API: any container ImageIO can enumerate
    * (multi-page TIFF ships a JDK reader since Java 9; animated GIF too)
    * is read frame-at-a-time and only every `frameStride`-th frame is
    * decoded — `reader.read(i)` seeks without materializing skipped frames,
    * which is the property that matters at scale (decode cost ∝ sampled
    * frames, not container length). Features are luminance statistics
    * pooled over the sampled frames; `frames_sampled` counts decoded
    * frames. Single-frame images degrade gracefully (1 frame sampled);
    * undecodable payloads fall back to [[FakeDecoder]]. */
  object FrameSampleDecoder extends Decoder {
    override def decode(row: MediaRow, frameStride: Int): MediaFeatures = {
      val iis =
        try javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(row.payload))
        catch { case _: java.io.IOException => null }
      val readers =
        if (iis == null) java.util.Collections.emptyIterator[javax.imageio.ImageReader]()
        else javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) {
        // no reader claims the payload: close the stream (it may hold a
        // temp-file handle) before falling back, or undecodable corpora
        // leak one fd per row
        if (iis != null) iis.close()
        FakeDecoder.decode(row, frameStride)
      } else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val nFrames = reader.getNumImages(true)
          val stride = math.max(1, frameStride)
          val hist = new Array[Long](16)
          var sum = 0L
          var n = 0L
          var sampled = 0
          var f = 0
          while (f < nFrames) {
            val img = reader.read(f)
            sampled += 1
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                  (rgb & 0xff) * 114) / 1000
                hist(lum >> 4) += 1
                sum += lum
                n += 1
                x += 1
              }
              y += 1
            }
            f += stride
          }
          val mean = if (n == 0) 0.0 else sum.toDouble / n
          MediaFeatures(row.media_id, row.mime, row.payload.length.toLong, mean,
            hist, sampled)
        } catch {
          // ImageIO throws unchecked exceptions on corrupt-but-recognized
          // payloads (malformed headers) — a bad row must fall back, not
          // kill the task
          case scala.util.control.NonFatal(_) => FakeDecoder.decode(row, frameStride)
        } finally {
          reader.dispose()
          iis.close()
        }
      }
    }
  }

  /** Resize output: fixed-size grayscale thumbnail plus its 64-bit
    * average-hash (aHash) — the perceptual fingerprint that puts IMAGES on
    * the same near-dup machinery as text (hamming-close ahash = candidate
    * pair, bucketable by 16-bit bands exactly like SimHash). */
  final case class Thumb(
      media_id: Long,
      w: Int,
      h: Int,
      gray: Array[Byte],
      ahash: Long)

  /** The aHash step shared by [[thumbnails]] (post-resize) and
    * [[thumbnailsRaw]] (pre-decoded pixels): bit i is 1 iff gray pixel i
    * is strictly above the thumbnail mean. Integer bytes against an exact
    * power-of-two-divided mean, so the threshold is bit-reproducible in
    * any engine (the v03 gate re-derives it in SQL). */
  private def grayThumb(mediaId: Long, w: Int, h: Int,
                        gray: Array[Byte]): Thumb = {
    var sum = 0L
    var i = 0
    while (i < gray.length) { sum += gray(i) & 0xff; i += 1 }
    val mean = sum.toDouble / gray.length
    var hash = 0L
    i = 0
    while (i < gray.length) {
      if ((gray(i) & 0xff) > mean) hash |= (1L << i)
      i += 1
    }
    Thumb(mediaId, w, h, gray, hash)
  }

  /** Real resize via `java.awt` bilinear scaling to a `w`×`h` grayscale
    * thumbnail (the standard decode→resize→featurize step of an image
    * training pipeline), partition-at-a-time like [[featurize]]. The aHash
    * bit i is 1 iff pixel i is above the thumbnail mean; undecodable
    * payloads yield a null-free all-zero thumbnail so the pipeline never
    * drops rows mid-shuffle. */
  def thumbnails(ds: Dataset[MediaRow], w: Int = 8, h: Int = 8): Dataset[Thumb] = {
    require(w * h <= 64, s"ahash needs w*h <= 64, got ${w * h}")
    implicit val enc = Encoders.product[Thumb]
    ds.mapPartitions { it =>
      it.map { row =>
        // NonFatal, not just IOException: ImageIO can throw unchecked
        // exceptions on corrupt-but-recognized payloads
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) Thumb(row.media_id, w, h, new Array[Byte](w * h), 0L)
        else {
          val small = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val g = small.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val gray = new Array[Byte](w * h)
          small.getRaster.getDataElements(0, 0, w, h, gray)
          grayThumb(row.media_id, w, h, gray)
        }
      }
    }
  }

  /** [[thumbnails]] for payloads that are ALREADY decoded `w`×`h` 8-bit
    * grayscale pixels (row-major, one byte per pixel) — the ingest seam
    * for pipelines whose upstream stage decodes/resizes once and ships
    * raw thumbnails downstream, so the aHash/banding machinery runs
    * without re-touching a codec. Same aHash as [[thumbnails]] (shared
    * [[grayThumb]]); a payload of the wrong length yields the all-zero
    * thumbnail, the same never-drop-rows contract as an undecodable
    * image. The v03/v04 gates hash-prove this path (hash bits, band
    * values, candidate pairs) cross-engine — pixel math is plain byte
    * arithmetic a SQL oracle can re-derive, which the codec path can't. */
  def thumbnailsRaw(ds: Dataset[MediaRow], w: Int = 8, h: Int = 8): Dataset[Thumb] = {
    require(w * h <= 64, s"ahash needs w*h <= 64, got ${w * h}")
    implicit val enc = Encoders.product[Thumb]
    ds.mapPartitions { it =>
      it.map { row =>
        if (row.payload == null || row.payload.length != w * h)
          Thumb(row.media_id, w, h, new Array[Byte](w * h), 0L)
        else grayThumb(row.media_id, w, h, row.payload)
      }
    }
  }

  /** 64-bit audio fingerprint — the audio analogue of [[Thumb]]'s aHash,
    * completing the image/video/audio near-dup triad. */
  final case class AudioPrint(
      media_id: Long,
      fp: Long,
      n_samples: Long,
      decoded: Boolean)

  /** Fingerprint PCM16 WAV payloads: the |amplitude| envelope is pooled
    * into 65 equal-duration windows and bit i is set when window i+1's
    * mean energy exceeds window i's — sign-of-delta coding, the shape of
    * chromaprint-style audio fingerprints without an FFT dependency.
    * Volume-invariant (a scaled signal keeps every > relation) and stable
    * under small noise, so hamming distance over the 64 bits drops
    * straight onto the SimHash band-bucket machinery. Undecodable or
    * non-PCM16 payloads yield `decoded = false` with fp 0 — rows survive,
    * same contract as [[thumbnails]]. A VALID clip too short to
    * fingerprint (< 65 samples) keeps `decoded = true` with fp 0 so
    * decode-failure metrics never count it. */
  def audioFingerprints(ds: Dataset[MediaRow]): Dataset[AudioPrint] = {
    implicit val enc = Encoders.product[AudioPrint]
    ds.mapPartitions { it =>
      it.map { row =>
        val amps = pcmAmplitudes(row.payload)
        if (amps == null) AudioPrint(row.media_id, 0L, 0L, false)
        else if (amps.length < 65)
          AudioPrint(row.media_id, 0L, amps.length.toLong, true)
        else {
          val windows = new Array[Double](65)
          val n = amps.length
          var wi = 0
          while (wi < 65) {
            val from = (wi.toLong * n / 65).toInt
            val until = ((wi + 1).toLong * n / 65).toInt
            var s = 0L
            var i = from
            while (i < until) { s += amps(i); i += 1 }
            windows(wi) = s.toDouble / math.max(1, until - from)
            wi += 1
          }
          var fp = 0L
          var b = 0
          while (b < 64) {
            if (windows(b + 1) > windows(b)) fp |= (1L << b)
            b += 1
          }
          AudioPrint(row.media_id, fp, n.toLong, true)
        }
      }
    }
  }

  /** First-channel |amplitude| series of a PCM16 little-endian WAV payload,
    * or null if the payload is not one (shared decode contract with
    * [[WavDecoder]]).
    *
    * Two tiers, same answer (equality spec-pinned in MultimodalSpec):
    * the CANONICAL header layout (RIFF/WAVE, 16-byte fmt chunk, PCM16-LE,
    * `data` immediately at offset 36 — what every minimal PCM writer
    * emits) is parsed directly, a branch-few pure function; anything else
    * falls back to the real javax.sound decoder. The split exists because
    * `AudioSystem.getAudioInputStream` does a provider-SPI lookup and
    * stream setup PER CALL (~150–200 µs/row measured, with cross-thread
    * contention) — at sf10's 500 k rows that lookup alone was 75 s of the
    * v05 stage, ~40× the arithmetic it guarded. */
  private[operators] def pcmAmplitudes(payload: Array[Byte]): Array[Int] = {
    val fast = pcmAmplitudesCanonical(payload)
    if (fast != null) fast else pcmAmplitudesJavax(payload)
  }

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], off: Int, s: String): Boolean =
    b(off) == s.charAt(0).toByte && b(off + 1) == s.charAt(1).toByte &&
      b(off + 2) == s.charAt(2).toByte && b(off + 3) == s.charAt(3).toByte

  /** Canonical-layout parse, or null when the payload deviates in ANY way
    * (wrong magic, non-PCM, non-16-bit, extra chunks before `data`,
    * inconsistent block align) — deviation means the javax.sound tier
    * decides, so this tier can never WIDEN what counts as decodable. */
  private def pcmAmplitudesCanonical(payload: Array[Byte]): Array[Int] = {
    if (payload == null || payload.length < 44) return null
    if (!tag(payload, 0, "RIFF") || !tag(payload, 8, "WAVE") ||
      !tag(payload, 12, "fmt ") || le32(payload, 16) != 16L ||
      le16(payload, 20) != 1 || le16(payload, 34) != 16 ||
      !tag(payload, 36, "data")) return null
    val channels = le16(payload, 22)
    val blockAlign = le16(payload, 32)
    if (channels < 1 || blockAlign != channels * 2) return null
    // the stream is bounded by BOTH the declared data length and the
    // actual bytes present (javax.sound stops at EOF the same way)
    val dataLen = math.min(le32(payload, 40), (payload.length - 44).toLong)
    val nFrames = (dataLen / blockAlign).toInt
    val out = new Array[Int](nFrames)
    var f = 0
    while (f < nFrames) {
      val off = 44 + f * blockAlign
      out(f) = math.abs((payload(off + 1) << 8) | (payload(off) & 0xff))
      f += 1
    }
    out
  }

  private def pcmAmplitudesJavax(payload: Array[Byte]): Array[Int] =
    // NonFatal, not just the checked audio exceptions: a null payload or a
    // corrupt header with frameSize 0 must yield "not decodable", never a
    // task failure (the same hazard thumbnails() guards against)
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = in.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
        fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
        fmt.getFrameSize <= 0) null
      else {
        val frameSize = fmt.getFrameSize
        val buf = in.readAllBytes()
        val nFrames = buf.length / frameSize
        val out = new Array[Int](nFrames)
        var f = 0
        while (f < nFrames) {
          val off = f * frameSize
          out(f) = math.abs(((buf(off + 1) << 8) | (buf(off) & 0xff)).toInt)
          f += 1
        }
        out
      }
    } catch { case scala.util.control.NonFatal(_) => null }

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
