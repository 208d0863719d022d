package graft.operators

import graft.SparkSpec
import Multimodal._
import org.apache.spark.sql.functions._

/** End-to-end image near-dup over REAL encoded bytes: decode → resize →
  * aHash (Multimodal.thumbnails), then LSH-style 16-bit band buckets over
  * the 64-bit hash (the SimHash pattern) generate candidate pairs, verified
  * by exact hamming distance — never an all-pairs comparison. The corpus
  * plants exact duplicates, a near-duplicate (few pixels flipped), and
  * distinct images; the pipeline must pair the dupes and not the rest. */
class ImageNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def png(seed: Int, flip: Int = 0): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    // deterministic blocky texture from an LCG; `flip` inverts a few pixels
    for (y <- 0 until 32; x <- 0 until 32) {
      val h = (seed * 2654435761L + (x / 4) * 40503L + (y / 4) * 9973L) & 0xff
      val v = if (h < 128) 0x000000 else 0xffffff
      img.setRGB(x, y, v)
    }
    for (i <- 0 until flip) img.setRGB(i % 32, i / 32, 0x808080)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("band-bucketed aHash pairs exact and near dupes, skips distinct") {
    val rows = Seq(
      MediaRow(1L, "image/png", png(7)),
      MediaRow(2L, "image/png", png(7)), // exact dup of 1
      MediaRow(3L, "image/png", png(7, flip = 8)), // near dup of 1
      MediaRow(4L, "image/png", png(99)), // distinct
      MediaRow(5L, "image/png", png(1234))) // distinct
    val t = thumbnails(rows.toDS().repartition(3), 8, 8)
      .select(col("media_id"), col("ahash"))

    // 4 bands of 16 bits: candidates share at least one full band
    val bands = t.select(col("media_id"), col("ahash"),
      explode(expr("transform(sequence(0, 3)," +
        " b -> struct(b AS band, shiftright(ahash, b*16) % 65536 AS bv))"))
        .as("bb"))
      .select(col("media_id"), col("ahash"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("a_id"), col("b.media_id").as("b_id"),
        col("a.ahash").as("a_hash"), col("b.ahash").as("b_hash"))
      .distinct()
    // exact verify: hamming distance over the full 64 bits
    val pairs = cand
      .withColumn("hamming", expr("bit_count(a_hash ^ b_hash)"))
      .filter(col("hamming") <= 6)
      .select(col("a_id"), col("b_id"))
      .as[(Long, Long)].collect().toSet

    assert(pairs.contains((1L, 2L)), "exact duplicate pair missed")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)),
      "near duplicate pair missed")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }
}
