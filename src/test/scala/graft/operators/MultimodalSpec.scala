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
}
