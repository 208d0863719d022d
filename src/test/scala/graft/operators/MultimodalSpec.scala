package graft.operators

import graft.SparkSpec
import Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("featurize computes exact byte stats partition-at-a-time") {
    val rows = Seq(
      MediaRow(1L, "image/fake", Array[Byte](0, 16, 32, -1)), // 0x00,0x10,0x20,0xff
      MediaRow(2L, "audio/fake", Array[Byte]()))
    val got = featurize(rows.toDS().repartition(2)).collect()
      .map(f => f.media_id -> f).toMap

    val f1 = got(1L)
    assert(f1.n_bytes == 4L)
    assert(approx(f1.mean_byte, (0 + 16 + 32 + 255) / 4.0))
    assert(f1.byte_hist(0) == 1L && f1.byte_hist(1) == 1L &&
      f1.byte_hist(2) == 1L && f1.byte_hist(15) == 1L)
    assert(f1.byte_hist.sum == 4L)
    assert(f1.frames_sampled == 1)

    val f2 = got(2L)
    assert(f2.n_bytes == 0L && f2.mean_byte == 0.0 && f2.byte_hist.sum == 0L)
  }

  test("ImageIoDecoder decodes real PNG bytes to exact luminance stats") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // 4x2 image: left half pure white (lum 255), right half pure black (0)
    def png(): Array[Byte] = {
      val img = new BufferedImage(4, 2, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 2; x <- 0 until 4)
        img.setRGB(x, y, if (x < 2) 0xffffff else 0x000000)
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val bytes = png()
    val rows = Seq(
      MediaRow(1L, "image/png", bytes),
      MediaRow(2L, "image/png", Array[Byte](1, 2, 3))) // undecodable payload
    val got = featurize(rows.toDS().repartition(2), decoder = ImageIoDecoder,
        frameStride = 1).collect()
      .map(f => f.media_id -> f).toMap

    val f1 = got(1L)
    assert(f1.n_bytes == bytes.length.toLong)
    assert(approx(f1.mean_byte, (255.0 * 4 + 0.0 * 4) / 8))
    assert(f1.byte_hist(15) == 4L && f1.byte_hist(0) == 4L && f1.byte_hist.sum == 8L)
    assert(f1.frames_sampled == 2) // both scanlines at stride 1

    // stride 2 samples only the first scanline
    val strided = featurize(rows.take(1).toDS(), decoder = ImageIoDecoder,
      frameStride = 2).collect().head
    assert(strided.frames_sampled == 1 && strided.byte_hist.sum == 4L)

    // undecodable bytes fall back to byte stats, not a task failure
    val f2 = got(2L)
    assert(f2.n_bytes == 3L && approx(f2.mean_byte, 2.0))
  }

  test("WavDecoder decodes real PCM16 WAV bytes to exact amplitude stats") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    // 8 mono frames alternating +16384 / 0 -> scaled |amp| alternates 128, 0
    def wav(): Array[Byte] = {
      val samples = Array[Short](16384, 0, 16384, 0, 16384, 0, 16384, 0)
      val pcm = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s0, i) =>
        pcm(2 * i) = (s0 & 0xff).toByte
        pcm(2 * i + 1) = ((s0 >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val stream = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
        samples.length.toLong)
      val out = new ByteArrayOutputStream()
      AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val bytes = wav()
    val rows = Seq(
      MediaRow(1L, "audio/wav", bytes),
      MediaRow(2L, "audio/wav", Array[Byte](9, 9, 9))) // undecodable payload
    val got = featurize(rows.toDS().repartition(2), decoder = WavDecoder,
        frameStride = 1).collect()
      .map(f => f.media_id -> f).toMap

    val f1 = got(1L)
    assert(f1.n_bytes == bytes.length.toLong)
    assert(f1.frames_sampled == 8)
    assert(approx(f1.mean_byte, (128.0 * 4 + 0.0 * 4) / 8))
    assert(f1.byte_hist(0) == 4L && f1.byte_hist(8) == 4L && f1.byte_hist.sum == 8L)

    // stride 2 reads only the +16384 frames
    val strided = featurize(rows.take(1).toDS(), decoder = WavDecoder,
      frameStride = 2).collect().head
    assert(strided.frames_sampled == 4 && approx(strided.mean_byte, 128.0))

    // undecodable bytes fall back to byte stats, not a task failure
    val f2 = got(2L)
    assert(f2.n_bytes == 3L && approx(f2.mean_byte, 9.0))
  }

  test("canonical PCM fast path equals the javax.sound decoder byte-for-byte") {
    // pcmAmplitudes' canonical-header tier (the v05 hot path — the
    // per-row AudioSystem SPI lookup was 150-200 µs/row at sf10) must be
    // indistinguishable from the real decoder: same amplitudes on every
    // canonical payload, and every deviation must FALL BACK, never widen
    // decodability. The adversarial shapes: stereo, odd trailing byte,
    // data length over-claiming the payload, v05's exact synthetic
    // payload, and an AudioSystem-written file.
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    def canonical(channels: Int, dataBytes: Array[Byte],
                  claimLen: Int): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      def le16(v: Int) = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      def le32(v: Int) = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
      out.write("RIFF".getBytes); le32(36 + claimLen)
      out.write("WAVE".getBytes); out.write("fmt ".getBytes); le32(16)
      le16(1); le16(channels); le32(8000); le32(8000 * channels * 2)
      le16(channels * 2); le16(16)
      out.write("data".getBytes); le32(claimLen)
      out.write(dataBytes)
      out.toByteArray
    }
    val rnd = new scala.util.Random(7)
    def noise(n: Int) = Array.fill[Byte](n)(rnd.nextInt(256).toByte)
    val cases = Seq(
      canonical(1, noise(260), 260),              // v05's mono shape
      canonical(2, noise(260), 260),              // stereo: first channel
      canonical(1, noise(261), 261),              // odd trailing byte
      canonical(1, noise(100), 260),              // truncated vs claim
      canonical(1, Array.emptyByteArray, 0)) :+ { // AudioSystem-written
      val samples = Array[Short](16384, -32768, 0, 733)
      val pcm = new Array[Byte](8)
      samples.zipWithIndex.foreach { case (s0, i) =>
        pcm(2 * i) = (s0 & 0xff).toByte; pcm(2 * i + 1) = ((s0 >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val o = new ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(new ByteArrayInputStream(pcm),
        fmt, 4L), AudioFileFormat.Type.WAVE, o)
      o.toByteArray
    }
    // the javax tier is the oracle: reconstruct it via AudioSystem here
    def viaJavax(payload: Array[Byte]): Array[Int] =
      try {
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
          fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getFrameSize <= 0) null
        else {
          val buf = in.readAllBytes()
          Array.tabulate(buf.length / fmt.getFrameSize) { f =>
            val off = f * fmt.getFrameSize
            math.abs(((buf(off + 1) << 8) | (buf(off) & 0xff)).toInt)
          }
        }
      } catch { case scala.util.control.NonFatal(_) => null }
    cases.zipWithIndex.foreach { case (p, i) =>
      val fast = Multimodal.pcmAmplitudes(p)
      val slow = viaJavax(p)
      assert((fast == null) == (slow == null) &&
        (fast == null || fast.sameElements(slow)),
        s"case $i: fast ${Option(fast).map(_.toSeq)} vs javax ${Option(slow).map(_.toSeq)}")
    }
    // non-canonical deviations still decode through the fallback or
    // reject identically: junk, and a WAV with an extra chunk before data
    val extraChunk = {
      val base = canonical(1, noise(4), 4)
      // splice a 4-byte "LIST" chunk between fmt and data
      val pre = base.take(36)
      val post = base.drop(36)
      val o = new ByteArrayOutputStream()
      o.write(pre); o.write("LIST".getBytes)
      o.write(Array[Byte](4, 0, 0, 0)); o.write(Array[Byte](1, 2, 3, 4)); o.write(post)
      val riffFix = o.toByteArray
      riffFix
    }
    val fastE = Multimodal.pcmAmplitudes(extraChunk)
    val slowE = viaJavax(extraChunk)
    assert((fastE == null) == (slowE == null) &&
      (fastE == null || fastE.sameElements(slowE)),
      "non-canonical chunk layout diverged from the javax decoder")
    assert(Multimodal.pcmAmplitudes(Array[Byte](1, 2, 3)) == null)
  }

  test("FrameSampleDecoder samples every Nth frame of a real multi-frame TIFF") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // 5-frame multi-page TIFF; frame f is a 2x2 solid gray level f*60
    def tiff(nFrames: Int): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(out)
      val writer = ImageIO.getImageWritersByFormatName("tiff").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for (f <- 0 until nFrames) {
        val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
        val v = f * 60
        for (y <- 0 until 2; x <- 0 until 2)
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
      writer.dispose()
      ios.close()
      out.toByteArray
    }
    val bytes = tiff(5)
    val all = featurize(Seq(MediaRow(1L, "image/tiff", bytes)).toDS(),
      decoder = FrameSampleDecoder, frameStride = 1).collect().head
    assert(all.frames_sampled == 5)
    // gray level v has luminance v; frames 0,60,120,180,240 -> mean 120
    assert(approx(all.mean_byte, (0 + 60 + 120 + 180 + 240) / 5.0))

    val strided = featurize(Seq(MediaRow(1L, "image/tiff", bytes)).toDS(),
      decoder = FrameSampleDecoder, frameStride = 2).collect().head
    assert(strided.frames_sampled == 3) // frames 0, 2, 4
    assert(approx(strided.mean_byte, (0 + 120 + 240) / 3.0))

    // single-frame PNG degrades to 1 sampled frame; junk falls back
    val png = {
      val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
      val o = new ByteArrayOutputStream(); ImageIO.write(img, "png", o); o.toByteArray
    }
    val one = featurize(Seq(MediaRow(2L, "image/png", png)).toDS(),
      decoder = FrameSampleDecoder, frameStride = 4).collect().head
    assert(one.frames_sampled == 1)
    val junk = featurize(Seq(MediaRow(3L, "video/x", Array[Byte](5, 5))).toDS(),
      decoder = FrameSampleDecoder, frameStride = 1).collect().head
    assert(junk.n_bytes == 2L && approx(junk.mean_byte, 5.0))
  }

  test("thumbnails resize to fixed grayscale and aHash separates halves") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // 32x32: left half black, right half white
    def png(): Array[Byte] = {
      val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32)
        img.setRGB(x, y, if (x < 16) 0x000000 else 0xffffff)
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val rows = Seq(
      MediaRow(1L, "image/png", png()),
      MediaRow(2L, "image/png", Array[Byte](1))) // undecodable
    val got = thumbnails(rows.toDS().repartition(2), 8, 8).collect()
      .map(t => t.media_id -> t).toMap

    val t1 = got(1L)
    assert(t1.w == 8 && t1.h == 8 && t1.gray.length == 64)
    // every row of the thumbnail: 4 dark then 4 light pixels
    for (y <- 0 until 8) {
      assert((t1.gray(y * 8) & 0xff) < 64, s"row $y left should be dark")
      assert((t1.gray(y * 8 + 7) & 0xff) > 192, s"row $y right should be light")
    }
    // aHash: bit set exactly on the light right half of each row
    for (y <- 0 until 8; x <- 0 until 8) {
      val bit = (t1.ahash >> (y * 8 + x)) & 1L
      assert(bit == (if (x >= 4) 1L else 0L), s"ahash bit ($x,$y)")
    }
    // identical images have hamming distance 0 by construction (determinism)
    val again = thumbnails(rows.take(1).toDS(), 8, 8).collect().head
    assert(again.ahash == t1.ahash && again.gray.sameElements(t1.gray))

    val t2 = got(2L)
    assert(t2.ahash == 0L && t2.gray.forall(_ == 0))
  }

  test("thumbnailsRaw equals the decoded path's aHash on identical pixels") {
    // a pre-decoded gray payload and a PNG whose decode+resize produces
    // exactly those pixels must hash identically — the raw ingest seam and
    // the codec path share grayThumb, and this pins that they stay shared.
    // 8x8 source so the "resize" is identity and the pixels comparable.
    import java.awt.image.BufferedImage
    val gray = Array.tabulate[Byte](64)(i => (i * 4).toByte)
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, 8, 8, gray)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)

    val viaCodec = thumbnails(
      Seq(MediaRow(1L, "image/png", out.toByteArray)).toDS(), 8, 8)
      .collect().head
    val viaRaw = thumbnailsRaw(
      Seq(MediaRow(1L, "image/gray8", gray)).toDS(), 8, 8)
      .collect().head
    assert(viaRaw.gray.sameElements(gray))
    assert(viaCodec.gray.sameElements(viaRaw.gray),
      "PNG decode of raw gray pixels drifted")
    assert(viaCodec.ahash == viaRaw.ahash && viaRaw.ahash != 0L)

    // wrong-length or null payloads keep the never-drop-rows contract
    val bad = thumbnailsRaw(Seq(
      MediaRow(2L, "image/gray8", Array[Byte](1, 2, 3)),
      MediaRow(3L, "image/gray8", null)).toDS(), 8, 8)
      .collect().map(t => t.media_id -> t).toMap
    assert(bad(2L).ahash == 0L && bad(2L).gray.forall(_ == 0))
    assert(bad(3L).ahash == 0L && bad(3L).gray.length == 64)
  }

  test("gate payload construction is byte-exact for multi-byte text") {
    // the v03/v04/v05 construction pads/truncates at the BYTE level
    // (binary substring + binary rpad): a char-based rpad of multi-byte
    // text encodes to MORE than the target bytes, which would make
    // thumbnailsRaw emit its all-zero fallback while the oracle hashes
    // the first N encoded bytes. Pin: any text — CJK, Cyrillic, accents,
    // empty — yields exactly N payload bytes, matching what the hex
    // oracle reconstructs.
    import org.apache.spark.sql.functions._
    val texts = Seq("这是一个测试文档" * 20, "привет мир " * 30,
      "café naïve déjà-vu", "plain ascii", "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (n <- Seq(64, 260)) {
      val pay = df.select(expr(
        s"rpad(substring(CAST(coalesce(text, '') AS BINARY), 1, $n), $n, X'20')")
        .as("payload"))
      assert(pay.filter(length(col("payload")) =!= n).count() == 0,
        s"payload not exactly $n bytes for some text")
      // the truncation boundary is a raw byte cut — identical to taking
      // the first 2n hex chars, which is what the DuckDB oracle does
      val zh = pay.select(upper(hex(col("payload"))).as("hx")).head().getString(0)
      val fullHex = java.lang.String.format("%0" + (2 * n) + "X",
        new java.math.BigInteger(1,
          java.util.Arrays.copyOf(texts.head.getBytes("UTF-8"), n)))
      assert(zh == fullHex, "byte-cut hex differs from oracle construction")
    }
  }

  test("media payloads stay distributed (no driver collect in the plan)") {
    // build media rows from the documents table's text bytes — the binary
    // column plumbing a real image/audio ingest would use
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val media = docs.selectExpr("doc_id as media_id",
        "'text/plain' as mime", "cast(text as binary) as payload")
      .as[MediaRow]
    val feats = featurize(media, frameStride = 1)
    assert(feats.rdd.getNumPartitions >= 1)
    val n = feats.count()
    assert(n == docs.count())
    // deterministic: mean byte of ASCII text is within (32, 127)
    val m = feats.head()
    assert(m.mean_byte > 32.0 && m.mean_byte < 127.0)
  }

  test("audio fingerprints: volume-invariant, noise-stable, discriminative") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    def wavOf(samples: Array[Short]): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s0, i) =>
        pcm(2 * i) = (s0 & 0xff).toByte
        pcm(2 * i + 1) = ((s0 >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val stream = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
        samples.length.toLong)
      val out = new ByteArrayOutputStream()
      AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val rnd = new scala.util.Random(5)
    val n = 65 * 32
    val base = Array.tabulate(n)(i =>
      (1000 + 800 * math.sin(i * 2 * math.Pi / 300)).toShort)
    val scaled = base.map(s => (s * 2).toShort)          // 2x volume
    val noisy = base.map(s => (s + rnd.nextInt(21) - 10).toShort)
    val other = Array.tabulate(n)(i =>
      (1000 + 800 * math.cos(i * 2 * math.Pi / 97)).toShort)
    val rows = Seq(
      MediaRow(1L, "audio/wav", wavOf(base)),
      MediaRow(2L, "audio/wav", wavOf(scaled)),
      MediaRow(3L, "audio/wav", wavOf(noisy)),
      MediaRow(4L, "audio/wav", wavOf(other)),
      MediaRow(5L, "audio/wav", Array[Byte](1, 2, 3)), // not a WAV
      MediaRow(6L, "audio/wav", wavOf(Array.fill(10)(500.toShort)))) // too short
    val got = audioFingerprints(rows.toDS().repartition(2)).collect()
      .map(p => p.media_id -> p).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

    assert(got(1L).decoded && got(1L).n_samples == n.toLong)
    // volume scaling preserves every window comparison exactly
    assert(got(1L).fp == got(2L).fp)
    // small noise flips at most a few bits near envelope extremes
    assert(hamming(got(1L).fp, got(3L).fp) <= 10,
      s"noise moved the print too far: ${hamming(got(1L).fp, got(3L).fp)}")
    // a different modulation pattern is far away
    assert(hamming(got(1L).fp, got(4L).fp) > 16,
      s"distinct signals too close: ${hamming(got(1L).fp, got(4L).fp)}")
    // undecodable payloads survive with decoded = false
    assert(!got(5L).decoded && got(5L).fp == 0L)
    // a VALID clip too short to fingerprint decodes fine (fp 0) — it must
    // never count as a decode failure
    assert(got(6L).decoded && got(6L).fp == 0L && got(6L).n_samples == 10L)
  }
}
