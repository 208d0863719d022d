package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the plain join result under heavy skew") {
    // 90% of fact rows share one key — the pathological shape
    val fact = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i.toDouble))
      .toDF("k", "v")
    val dim = Seq(("hot", "H"), ("k901", "A"), ("k950", "B")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).select("k", "v", "name")
      .as[(String, Double, String)].collect().toSet
    val salted = Scale.saltedJoin(fact, dim, "k", saltFactor = 8)
      .select("k", "v", "name").as[(String, Double, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == "hot") == 900)
  }

  test("bucketed tables join without a shuffle exchange") {
    // default warehouse (./spark-warehouse, gitignored) — warehouse.dir is a
    // static conf that cannot move after session start
    val n = 16
    val a = (1L to 500L).map(i => (i, s"a$i")).toDF("id", "av")
    val b = (1L to 500L).map(i => (i, i * 2.0)).toDF("id", "bv")
    Scale.writeBucketed(a, "bucketed_a", "id", n)
    Scale.writeBucketed(b, "bucketed_b", "id", n)
    // disable broadcast so the join would otherwise shuffle both sides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bucketed_a").join(spark.table("bucketed_b"), "id")
      assert(joined.count() == 500)
      assert(Scale.isExchangeFree(joined),
        s"expected exchange-free bucketed join, got:\n${joined.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }

  test("period-partitioned layout prunes to one directory on a period filter") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // the Sink/medallion layout: one directory per period. A period filter
    // must become a PartitionFilter (pruned at listing time — zero I/O for
    // other periods), not a data filter that reads every file.
    val dir = java.nio.file.Files.createTempDirectory("part_prune").toString
    val df = Seq(("2024-01", 1L, 10.0), ("2024-02", 2L, 20.0),
      ("2024-03", 3L, 30.0)).toDF("period", "k", "v")
    df.repartition(1).write.partitionBy("period").mode("overwrite").parquet(dir)

    val rd = spark.read.parquet(dir).filter(col("period") === "2024-02")
    // execute THIS dataset so its own scan node carries the metrics
    val rows = rd.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L))
    val scan = rd.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    val pf = scan.metadata.getOrElse("PartitionFilters", "")
    assert(pf.contains("period"), s"no partition filter: ${scan.metadata}")
    // executed metric: exactly the matching partition's single file was read
    assert(scan.metrics("numFiles").value == 1L,
      s"expected 1 file read, got ${scan.metrics("numFiles").value}")
  }

  test("sorted writes enable parquet row-group skipping on selective filters") {
    // the data-layout lever beyond directory partitioning: sorting within
    // files clusters each key range into few row groups, so the reader's
    // min/max stats skip the rest — scan output rows collapse from |file|
    // to ~|row group| on a selective predicate
    val dir = java.nio.file.Files.createTempDirectory("rg_skip").toString
    val n = 200000L
    spark.range(n).select(col("id").as("k"), (col("id") % 997).as("v"))
      .orderBy(col("k")) // sorted -> tight per-row-group min/max on k
      .coalesce(1)
      .write.option("parquet.block.size", 128 * 1024) // many small row groups
      .mode("overwrite").parquet(dir)
    val res = spark.read.parquet(dir).filter(col("k") === 123456L)
    // execute THIS dataset so its own scan node carries the metrics
    assert(res.collect().length == 1)
    val scan = res.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val rowsRead = scan.metrics("numOutputRows").value
    // without skipping this is 200k; with stats it is one row group's worth
    assert(rowsRead > 0, "scan metric not populated — assertion would be vacuous")
    assert(rowsRead < n / 4, s"row groups not skipped: read $rowsRead of $n")
  }

  test("bucketed range join hash-joins even when neither side can broadcast") {
    // q39's technique beyond the broadcast regime: with broadcasting off
    // (the 100 TB case of a large interval side), the month-bucket equi-key
    // still gives Catalyst a hash/sort-merge join — the naive interval
    // predicate alone would degenerate to a cartesian nested loop
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val rows = (0 until 2000)
        .map(i => (i.toLong, java.sql.Date.valueOf(s"1995-0${i % 9 + 1}-15")))
        .toDF("id", "d")
        .withColumn("bucket", trunc(col("d"), "MM"))
      val intervals = (0 until 500)
        .map { i =>
          val s = java.sql.Date.valueOf(s"1995-0${i % 9 + 1}-01")
          (i.toLong, s, java.sql.Date.valueOf(s"1995-0${i % 9 + 1}-20"))
        }.toDF("iv_id", "start", "end")
        .withColumn("bucket",
          explode(expr("sequence(trunc(start,'MM'), trunc(end,'MM'), interval 1 month)")))
      val joined = rows.join(intervals, Seq("bucket"))
        .filter(col("d").between(col("start"), col("end")))
        .groupBy(col("iv_id")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.sparkPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"degenerated to a nested loop:\n$plan")
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
        s"expected a keyed join on bucket:\n$plan")
      // sanity: day 15 falls inside every [1st, 20th] window of its month
      assert(joined.agg(sum(col("n"))).head().getLong(0) > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("bloomPrune cuts the fact side pre-shuffle and composes to the exact join") {
    val fact = spark.range(20000L).select(col("id").as("k"), (col("id") * 3L).as("v"))
    // selective dim: 200 of 20000 keys
    val dim = spark.range(200L).select((col("id") * 100L).as("dk"))
    val pruned = Scale.bloomPrune(fact, dim, "k", "dk",
      expectedItems = 200L, numBits = 4096L)
    // no false negatives: composed result is exactly the plain join
    val plain = fact.join(dim, col("k") === col("dk")).select("k", "v")
      .as[(Long, Long)].collect().toSet
    val composed = pruned.join(dim, col("k") === col("dk")).select("k", "v")
      .as[(Long, Long)].collect().toSet
    assert(composed == plain && plain.size == 200)
    // the filter actually prunes: survivors ≈ matches + fpp·|fact|, far
    // below the full fact side that a plain join would shuffle
    val survivors = pruned.count()
    assert(survivors >= 200L, "bloom dropped true matches")
    assert(survivors < 2000L, s"bloom pruned nothing: $survivors of 20000")
    // and it is the native codegen'd expression, sitting before the join
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
  }

  test("bloomPrune on an empty dim yields the (empty) inner-join result") {
    val fact = spark.range(100L).select(col("id").as("k"))
    val dim = spark.range(0L).select(col("id").as("dk"))
    assert(Scale.bloomPrune(fact, dim, "k", "dk", 10L, 64L).count() == 0L)
  }

  test("bloomAntiJoin is exactly the plain left_anti under forced false positives") {
    // deliberately undersized bloom (64 bits for 300 keys → high fpp): many
    // non-members probe positive, so exactness here proves the verify
    // anti-join removes every false positive
    val fact = spark.range(2000L)
      .select((col("id") * 7L % 4001L).as("k"), col("id").as("v"))
    val dim = spark.range(300L).select((col("id") * 13L % 4001L).as("dk"))
    val got = Scale.bloomAntiJoin(fact, dim, "k", "dk",
      expectedItems = 300L, numBits = 64L)
      .select("k", "v").as[(Long, Long)].collect().toSet
    val plain = fact.join(dim, col("k") === col("dk"), "left_anti")
      .select("k", "v").as[(Long, Long)].collect().toSet
    assert(got == plain && plain.nonEmpty && plain.size < 2000)
  }

  test("bloomAntiJoin keeps null fact keys and tolerates null dim keys") {
    // xxhash64 hashes SQL NULL to a real value, so an unguarded bloom probe
    // could let a null key "match"; anti-join equality semantics say a null
    // key matches nothing and must survive
    val fact = Seq((Some(1L), "a"), (None, "b"), (Some(2L), "c"),
      (None, "d")).toDF("k", "v")
    val dim = Seq(Some(1L), None, Some(99L)).toDF("dk")
    val got = Scale.bloomAntiJoin(fact, dim, "k", "dk", 10L, 1024L)
      .select("v").as[String].collect().toSet
    val plain = fact.join(dim, col("k") === col("dk"), "left_anti")
      .select("v").as[String].collect().toSet
    assert(got == plain && got == Set("b", "c", "d"))
  }

  test("bloomAntiJoin on an empty dim keeps the whole fact side") {
    val fact = spark.range(50L).select(col("id").as("k"))
    val dim = spark.range(0L).select(col("id").as("dk"))
    assert(Scale.bloomAntiJoin(fact, dim, "k", "dk", 10L, 64L).count() == 50L)
  }

  test("bloomAntiJoin prunes both sides: probes on fact and on dim branches") {
    val fact = spark.range(5000L).select(col("id").as("k"))
    val dim = spark.range(100L).select((col("id") * 50L).as("dk"))
    val out = Scale.bloomAntiJoin(fact, dim, "k", "dk",
      expectedItems = 100L, numBits = 2048L)
    assert(out.count() == 4900L)
    // one might_contain filter on the fact (candidate split) and one on the
    // dim (verify-side prune) — both blooms engaged in the executed plan
    val plan = out.queryExecution.executedPlan.toString
    assert("might_contain".r.findAllIn(plan).size >= 2,
      s"expected bloom probes on both sides:\n$plan")
  }

  test("globalRowNumber matches the window numbering with no single-partition stage") {
    val df = spark.range(10000L)
      .select((col("id") * 37L % 10007L).as("k"), col("id").as("payload"))
    val got = Scale.globalRowNumber(df, "rid", 8, col("k"))
    // ids are exactly the window's numbering (k is unique: 37 coprime 10007)
    val win = org.apache.spark.sql.expressions.Window.orderBy(col("k"))
    val expected = df.withColumn("rid", row_number().over(win).cast("long"))
    assert(got.as[(Long, Long, Long)].collect().toSet ==
      expected.as[(Long, Long, Long)].collect().toSet)
    // partition count does not change the answer (total order ⇒ deterministic)
    val got2 = Scale.globalRowNumber(df, "rid", 3, col("k"))
    assert(got2.as[(Long, Long, Long)].collect().toSet ==
      got.as[(Long, Long, Long)].collect().toSet)
    // the window version is the trap this avoids: it plans a single partition
    val winPlan = expected.queryExecution.executedPlan.toString
    assert(winPlan.contains("SinglePartition"),
      "premise broken: global window no longer single-partition")
    val ourPlan = got.queryExecution.executedPlan.toString
    assert(!ourPlan.contains("SinglePartition"),
      s"globalRowNumber introduced a single-partition stage:\n$ourPlan")
  }

  test("zorderKey interleaves bits exactly") {
    // (x=0b101, y=0b011) -> z = y2 x2 y1 x1 y0 x0 = 0b011011 = 27
    val out = Seq((5L, 3L)).toDF("x", "y")
      .select(Scale.zorderKey(3, col("x"), col("y")).as("z"))
      .head().getLong(0)
    assert(out == 27L)
  }

  private def rowsRead(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head.metrics("numOutputRows").value
  }

  test("z-ordered layout skips row groups on BOTH dimensions; linear sort only on one") {
    // two independent uniform dims; the linear layout clusters x only, so a
    // selective predicate on y reads every row group — the z-order layout
    // keeps row groups as small (x, y) rectangles and skips on either dim
    val n = 200000L
    val data = spark.range(n).select(
      (col("id") % 1021).as("x"),
      ((col("id") * 7919L) % 1021).as("y"),
      col("id").as("payload"))
    val linDir = java.nio.file.Files.createTempDirectory("lin_sort").toString
    val zDir = java.nio.file.Files.createTempDirectory("z_sort").toString
    data.orderBy(col("x")).coalesce(1)
      .write.option("parquet.block.size", 128 * 1024)
      .mode("overwrite").parquet(linDir)
    Scale.writeZordered(data, zDir, Seq("x", "y"), bits = 10,
      rowGroupBytes = 128 * 1024)
    def box(dir: String) = spark.read.parquet(dir)
      .filter(col("y") >= 100 && col("y") < 120)
    // same answer from both layouts
    assert(box(linDir).count() == box(zDir).count())
    val linRead = rowsRead(box(linDir))
    val zRead = rowsRead(box(zDir))
    assert(linRead > n / 2, s"x-sorted layout unexpectedly skipped on y: $linRead")
    assert(zRead < linRead / 4,
      s"z-order did not skip on the off-axis dim: read $zRead vs linear $linRead")
    // and the x predicate must still skip too (clustering is multi-dim).
    // z-order trades the linear sort's perfect 1-dim clustering for
    // rectangles: each row group spans ~sqrt(area) in each dim, so a thin
    // slice reads ~(slice + side)/extent of the groups — substantial
    // skipping on BOTH dims, not total on either
    val zReadX = rowsRead(spark.read.parquet(zDir)
      .filter(col("x") >= 100 && col("x") < 120))
    assert(zReadX < n / 2, s"z-order lost x clustering: read $zReadX of $n")
  }
}
