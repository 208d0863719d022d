package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.SparkSpec
import graft.operators.NearDup
import org.apache.spark.sql.functions._

/** Decontamination-at-ingest must (a) equal the BATCH operator on the full
  * corpus under any arrival slicing — train×eval flagging is per-train-doc
  * independent, so streaming and batch cannot legitimately differ — and
  * (b) split every arriving doc into exactly one of admitted/quarantined,
  * with leak evidence on the quarantine side. */
class DecontamStreamSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = (1 to 30).map(i => s"tok$i")
  private def doc(seed: Int, len: Int): String = {
    val rnd = new scala.util.Random(seed)
    (1 to len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
  }

  private def addBatch(dir: java.nio.file.Path, name: String,
                       rows: Seq[(Long, String)]): Unit = {
    val stage = Files.createTempDirectory(s"decontam_stage_$name")
    rows.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = Files.list(stage).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    Files.copy(Paths.get(part), dir.resolve(s"$name.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
  }

  test("streaming flags equal the batch operator under a 2-batch arrival split") {
    val dir = Files.createTempDirectory("decontam_stream")
    val corpus = Files.createTempDirectory("decontam_corpus").toString + "/c"
    val quar = Files.createTempDirectory("decontam_quar").toString + "/q"
    val ckpt = Files.createTempDirectory("decontam_ckpt").toString

    val e1 = doc(101, 30); val e2 = doc(102, 30); val e3 = doc(103, 30)
    val evalDocs = Seq((900L, e1), (901L, e2), (902L, e3))
      .toDF("doc_id", "text")
    // batch 1: one verbatim leak of e1 + clean docs
    val b1 = Seq((1L, e1), (2L, doc(1, 25)), (3L, doc(2, 25)))
    // batch 2: a light paraphrase of e2 (one swapped token: shingle
    // J ≈ 0.81, comfortably above the 1/2 verify threshold and with
    // ~0.99 LSH band recall at these parameters) + clean docs
    val para = { val a = e2.split(" "); a(5) = "zzz"; a.mkString(" ") }
    val b2 = Seq((4L, para), (5L, doc(3, 25)), (6L, doc(4, 25)))

    addBatch(dir, "b1", b1)
    val q = DecontamStream.ingestDecontaminated(spark, dir.toString, evalDocs,
      corpus, quar, ckpt)
    try {
      q.processAllAvailable()
      addBatch(dir, "b2", b2)
      q.processAllAvailable()
    } finally q.stop()

    val admitted = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().toSet
    val quarantined = spark.read.parquet(quar)
      .select(col("doc_id"), col("max_jaccard"), col("best_eval_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet

    // batch reference: the SAME operator over the full train corpus at
    // once, evidence = the argmax (jaccard, eval_id) pair
    val batchFlags = NearDup.crossMinHashPairs(
        (b1 ++ b2).toDF("doc_id", "text"), evalDocs)
      .groupBy(col("train_id"))
      .agg(max(struct(col("jaccard"), col("eval_id"))).as("best"))
      .select(col("train_id"), col("best.jaccard"), col("best.eval_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet

    assert(quarantined == batchFlags,
      s"streaming $quarantined != batch $batchFlags")
    // the verbatim leak is flagged at exactly 1.0 against e1
    assert(quarantined.exists { case (id, j, e) => id == 1L && j == 1.0 && e == 900L })
    // the paraphrase is flagged too (the whole point of FUZZY decontam)
    assert(quarantined.exists(_._1 == 4L), s"paraphrase not caught: $quarantined")
    // disjoint cover of all arrivals
    val flaggedIds = quarantined.map(_._1)
    assert((admitted intersect flaggedIds).isEmpty)
    assert((admitted union flaggedIds) == (b1 ++ b2).map(_._1).toSet)
  }
}
