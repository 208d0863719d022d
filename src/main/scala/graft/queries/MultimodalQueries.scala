package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders
import graft.operators.Multimodal
import Q._

/** Oracle-gated coverage for the multimodal column plumbing
  * (operators/Multimodal): media as opaque `binary` + typed metadata,
  * featurized partition-at-a-time. The real codecs (ImageIO / javax.sound)
  * are value-tested on real encoded payloads in MultimodalSpec — DuckDB
  * cannot decode pixels — but the PIPELINE (binary column construction, the
  * Dataset[MediaRow] contract, per-partition decoder dispatch, the
  * MediaFeatures schema) is hash-gated here by running the deterministic
  * byte-statistics decoder over payloads both engines can construct
  * identically: the documents' UTF-8 bytes (`cast(text AS BINARY)` ==
  * DuckDB `encode(text)`).
  */
object MultimodalQueries {

  val all: Seq[Q] = Seq(

    // ---- byte-level media featurization on the hash gate: n_bytes, exact
    // mean byte, the 16-bucket byte histogram (signature string so the
    // compare is order-pinned), and the pseudo-frame count — FakeDecoder's
    // exact contract. The oracle re-derives every byte through hex()
    // unnesting, so payload construction AND the feature math are proven
    // cross-engine, not just row counts. ----
    Q("v01_media_bytestats",
      (s, dir) => {
        val media = T(s, dir, "documents")
          .select(col("doc_id").as("media_id"), lit("text/plain").as("mime"),
            coalesce(col("text"), lit("")).cast("binary").as("payload"))
          .as[Multimodal.MediaRow](Encoders.product[Multimodal.MediaRow])
        Multimodal.featurize(media, Multimodal.FakeDecoder, frameStride = 64)
          .toDF()
          .select(col("media_id"), col("n_bytes"), col("mean_byte"),
            array_join(transform(col("byte_hist"), x => x.cast("string")), ",")
              .as("hist_sig"),
            col("frames_sampled").cast("long").as("frames_sampled"))
      },
      Some("""WITH src AS (
          SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
            octet_length(encode(coalesce(text, ''))) AS n
          FROM documents),
        bytes AS (
          SELECT doc_id,
            ('0x' || substr(hx, 2*CAST(i AS INT)+1, 2))::INT AS v
          FROM (SELECT doc_id, hx, unnest(range(n)) AS i FROM src) u),
        hist AS (
          SELECT doc_id, v // 16 AS bucket, count(*) AS c
          FROM bytes GROUP BY 1, 2),
        grid AS (
          SELECT s.doc_id, g.bucket, coalesce(h.c, 0) AS c
          FROM src s
          CROSS JOIN (SELECT unnest(range(16)) AS bucket) g
          LEFT JOIN hist h ON h.doc_id = s.doc_id AND h.bucket = g.bucket),
        sig AS (
          SELECT doc_id,
            string_agg(CAST(c AS VARCHAR), ',' ORDER BY bucket) AS hist_sig
          FROM grid GROUP BY 1),
        agg AS (
          SELECT doc_id, CAST(sum(v) AS BIGINT) AS sumv FROM bytes GROUP BY 1)
        SELECT s.doc_id AS media_id, CAST(s.n AS BIGINT) AS n_bytes,
          CASE WHEN s.n = 0 THEN 0.0
               ELSE CAST(a.sumv AS DOUBLE) / CAST(s.n AS DOUBLE) END AS mean_byte,
          g.hist_sig,
          CAST(s.n // 65536 + 1 AS BIGINT) AS frames_sampled
        FROM src s
        JOIN sig g USING (doc_id)
        LEFT JOIN agg a USING (doc_id)"""))
  )
}
