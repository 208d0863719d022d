package graft.queries

import java.time.LocalDate
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{DecarbDate, FixedClock}
import graft.functions.Money.cents
import graft.jobs.{ElectTargetEtl, MaccSummary, RawToStaging, RenewGreenEnergy, StagingToApp}
import Q._

/** End-to-end job transforms on the oracle surface: the three structurally
  * novel raw→staging tables (reference: jobs/raw_to_staging.py:351 solar_remain,
  * :670 elect_total, :845 provider_plant_list) driven through the REAL
  * [[RawToStaging]] code over frames derived from the testdata tables, with
  * the full semantics (ratio splits, version selection, YTM windows,
  * mapping joins) replicated independently in the DuckDB oracle.
  *
  * Determinism: amounts are exact cents/100 doubles; ratios are exact binary
  * fractions (0.25/0.5/0.75) so the products are IEEE-identical cross-engine;
  * YTM running sums order by (period_start, amount) with unique keys, so the
  * sequential additions happen in the same order in both engines.
  */
object JobQueries {

  private val clock = FixedClock(LocalDate.of(2026, 1, 1))
  private val sqlStamp = "TIMESTAMP '2026-01-01 00:00:00'"

  /** months 1..12 of 1995 × (plant, ratio) literal rows */
  private def ratioTable(s: SparkSession, plants: Seq[(String, Double)]): DataFrame = {
    import s.implicits._
    s.range(1).select(explode(sequence(lit(1), lit(12))).as("m"))
      .crossJoin(plants.toDF("plant", "ratio"))
      .select(col("ratio"), col("plant"),
        make_date(lit(1995), col("m"), lit(1)).as("period_start"))
  }

  private def sqlRatio(plants: Seq[(String, Double)]): String = {
    val vals = plants.map { case (p, r) => s"('$p', CAST($r AS DOUBLE))" }.mkString(", ")
    s"""SELECT CAST(r.ratio AS DOUBLE) AS ratio, r.plant,
        make_date(1995, m.m, 1) AS period_start
        FROM (SELECT CAST(unnest(range(1, 13)) AS INTEGER) AS m) m
        CROSS JOIN (VALUES $vals) r(plant, ratio)"""
  }

  private val sqlYtm =
    """sum(amount) OVER (PARTITION BY year(period_start), plant, category
       ORDER BY period_start, amount
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""

  // ---- j07 fixture dims, shared by the engine frames and the oracle
  // VALUES so the two sides cannot drift. Amounts are exact binary
  // fractions (k/2^n) purely for tidiness — every dim value crosses the
  // chain row-wise, so determinism only needs identical literals. ----

  /** demand sites by o_custkey % 12 — covers every MaccSummary special
    * case: the WKS:XTRKS split, the WIH coefficient fan-out targets
    * (N2/WKH/WTN/竹北AI), the renamed spellings' targets (WIHK-1, WMY),
    * a PPA-zero site (WCD), and a plain site (WHC). */
  private val maccSites = Seq("WKS", "XTRKS", "WZS", "WIH", "N2", "竹北AI",
    "WKH", "WTN", "WIHK-1", "WMY", "WCD", "WHC")

  /** solar plants by l_suppkey % 6 — includes the shared WKS/XTRKS plant
    * and deliberately NO plain WKS/XTRKS plant (the reference corpus
    * shape: the split and the 2025+ rollup rename never collide). */
  private val maccPlants = Seq("WKS/XTRKS", "WZS", "WIH", "N2", "WCD", "WHC")

  /** staging.decarb_carbon_coef — the PRE-decode spellings (WIHK1/WMYP1),
    * so the gate exercises the rename onto the demand sites. */
  private val maccCoef: Seq[(String, Int, Double)] = for {
    (site, i) <- Seq("WIH", "WZS", "WKS", "XTRKS", "WIHK1", "WMYP1", "WCD",
      "WHC").zipWithIndex
    year <- 2024 to 2026
  } yield (site, year, 0.25 + i * 0.125 + (year - 2024) * 0.0625)

  /** green certificate cost — WHC deliberately absent (null cost path) */
  private val maccCerCost: Seq[(String, Int, Double)] = for {
    (site, i) <- Seq("WIH", "WZS", "WKS", "XTRKS", "WIHK-1", "WMY", "WCD",
      "WKH", "WTN").zipWithIndex
    year <- 2024 to 2026
  } yield (site, year, 1.5 + i * 0.25 + (year - 2024) * 0.125)

  /** green electricity price diff — only WIH/WZS/WKS/XTRKS/WIHK-1/WMY/WCD;
    * N2 and 竹北AI receive WIH's rows via the job's copy step */
  private val maccElecCost: Seq[(String, Int, Double)] = for {
    (site, i) <- Seq("WIH", "WZS", "WKS", "XTRKS", "WIHK-1", "WMY", "WCD")
      .zipWithIndex
    year <- 2024 to 2026
  } yield (site, year, 0.75 + i * 0.125 + (year - 2024) * 0.0625)

  /** PPA share by year (null propagation is exercised via the WHC cost
    * gap instead of a missing year — a missing PPA year nulls EVERY
    * measure of that year, which would just shrink the gate); the REC row
    * checks the category filter */
  private val maccPpa: Seq[(Int, String, Double)] =
    Seq((2024, "PPA", 22.0), (2025, "PPA", 24.0), (2026, "PPA", 26.0),
      (2024, "REC", 50.0))

  private val maccFx: Seq[(Int, Double)] =
    Seq(2024 -> 0.140625, 2025 -> 0.1376953125, 2026 -> 0.134765625)

  private val maccWacc = 5.637

  /** discount factors (1 + wacc/100)^n as literals on the oracle side:
    * Spark's Pow evaluates via java.lang.StrictMath.pow, so computing the
    * same call here and printing the round-trip decimal gives DuckDB the
    * bit-identical double the engine divides by (the m02 trick, extended
    * to a runtime pow) */
  private val maccFactors: Seq[(Int, Double)] = (1 to 3).map(n =>
    (2023 + n, StrictMath.pow(maccWacc * 0.01 + 1.0, n.toDouble)))

  private def sqlValues3(rows: Seq[(String, Int, Double)],
                         cols: (String, String, String)): String =
    s"""(VALUES ${rows.map { case (s, y, a) =>
      s"('$s', $y, CAST($a AS DOUBLE))" }.mkString(", ")})
      t(${cols._1}, ${cols._2}, ${cols._3})"""

  val all: Seq[Q] = Seq(

    // ---- staging.solar_remain end-to-end (reference :351-458) ----
    Q("j01_solar_remain",
      (s, dir) => {
        import s.implicits._
        val remain = T(s, dir, "orders")
          .filter(year(col("o_orderdate")) === 1995)
          .groupBy(
            when(col("o_custkey") % 4 === 0, "WZS")
              .when(col("o_custkey") % 4 === 1, "WKS/XTRKS")
              .when(col("o_custkey") % 4 === 2, "WMI")
              .otherwise("WHC").as("site"),
            trunc(col("o_orderdate"), "MM").as("period_start"))
          .agg((sum(cents(col("o_totalprice"))) / 100.0).as("amount"))
          // r15: solarRemain fans its input into three branches (wks/wzs/
          // other union) — lazy lineage re-ran the orders scan + rollup
          // once per branch. The rollup is site×month-bounded (~48 rows),
          // so materialize it once and let the branches read the copy.
          .localCheckpoint()
        val wksRatio = ratioTable(s, Seq("XTRKS" -> 0.25, "WK-1" -> 0.75))
        val wzsRatio = ratioTable(s, Seq("WZ-1" -> 0.5, "WZ-2" -> 0.5))
        val mapping = Seq(("SX", "XTRKS"), ("SK", "WK-1"), ("SZ", "WZ-1"),
          ("SZ", "WZ-2"), ("SM", "WMI-2"), ("SH", "WHC")).toDF("site", "plant")
        RawToStaging.solarRemain(remain, wksRatio, wzsRatio, mapping, clock)
          .withColumn("period_start", col("period_start").cast("timestamp"))
      },
      Some(s"""WITH remain AS (
          SELECT CASE CAST(o_custkey % 4 AS INTEGER)
              WHEN 0 THEN 'WZS' WHEN 1 THEN 'WKS/XTRKS'
              WHEN 2 THEN 'WMI' ELSE 'WHC' END AS site,
            CAST(date_trunc('month', o_orderdate) AS DATE) AS period_start,
            ${sqlSumC("o_totalprice")}/100.0 AS amount
          FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1, 2),
        wks_ratio AS (${sqlRatio(Seq("XTRKS" -> 0.25, "WK-1" -> 0.75))}),
        wzs_ratio AS (${sqlRatio(Seq("WZ-1" -> 0.5, "WZ-2" -> 0.5))}),
        wks AS (SELECT r.plant, x.period_start, x.amount * r.ratio AS amount
                FROM remain x LEFT JOIN wks_ratio r ON r.period_start = x.period_start
                WHERE x.site = 'WKS/XTRKS'),
        wzs AS (SELECT r.plant, x.period_start, x.amount * r.ratio AS amount
                FROM remain x LEFT JOIN wzs_ratio r ON r.period_start = x.period_start
                WHERE x.site = 'WZS'),
        other AS (SELECT CASE site WHEN 'WMI' THEN 'WMI-2' ELSE site END AS plant,
                  period_start, amount
                  FROM remain WHERE site NOT IN ('WZS', 'WKS/XTRKS')),
        unioned AS (SELECT * FROM other UNION ALL SELECT * FROM wzs
                    UNION ALL SELECT * FROM wks),
        ytm AS (SELECT plant, period_start, amount,
            sum(amount) OVER (PARTITION BY year(period_start), plant
              ORDER BY period_start, amount
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ytm_amount
          FROM unioned)
        SELECT m.site, y.plant, y.amount, y.ytm_amount,
          CAST(y.period_start AS TIMESTAMP) AS period_start,
          $sqlStamp AS last_update_time
        FROM ytm y
        LEFT JOIN (VALUES ('SX','XTRKS'), ('SK','WK-1'), ('SZ','WZ-1'),
          ('SZ','WZ-2'), ('SM','WMI-2'), ('SH','WHC')) m(site, plant)
          ON m.plant = y.plant"""),
      bench = true),

    // ---- staging.elect_total end-to-end (reference :670-843), including
    // the latest-validated-version scalar selection ----
    Q("j02_elect_total",
      (s, dir) => {
        import s.implicits._
        val base = T(s, dir, "orders")
          .filter(year(col("o_orderdate")) === 1995)
          .groupBy(
            when(col("o_custkey") % 4 === 0, "S1")
              .when(col("o_custkey") % 4 === 1, "S2")
              .when(col("o_custkey") % 4 === 2, "WKS")
              .otherwise("WZS").as("site"),
            month(col("o_orderdate")).as("month"),
            when(col("o_orderstatus") === "F", "actual")
              .otherwise("predict").as("category"))
          .agg((sum(cents(col("o_totalprice"))) / 100.0).as("base_amount"))
          // r15: electTotal's latest-version selection + two category
          // slices × three ratio branches re-derive this frame ~6× —
          // materialize the site×month×category-bounded rollup once
          // (the j01 pattern)
          .localCheckpoint()
        val versions = Seq((1, true), (2, true), (3, false))
          .toDF("version", "validate")
        val target = base.crossJoin(versions)
          .select(col("site"), col("month"),
            (col("base_amount") * col("version")).as("amount"),
            lit(1995).as("year"), col("category"), col("version"), col("validate"))
        val femRatio = ratioTable(s, Seq("WK-A" -> 0.5, "WK-B" -> 0.5))
        val wzsRatio = ratioTable(s, Seq("WZ-1" -> 0.25, "WZ-2" -> 0.75))
        val mapping = Seq(("MS1", "S1"), ("MS2", "S2"), ("MA", "WK-A"),
          ("MB", "WK-B"), ("MZ1", "WZ-1"), ("MZ2", "WZ-2")).toDF("site", "plant")
        RawToStaging.electTotal(target, femRatio, wzsRatio, mapping, clock)
          .withColumn("period_start", col("period_start").cast("timestamp"))
      },
      Some(s"""WITH base AS (
          SELECT CASE CAST(o_custkey % 4 AS INTEGER)
              WHEN 0 THEN 'S1' WHEN 1 THEN 'S2'
              WHEN 2 THEN 'WKS' ELSE 'WZS' END AS site,
            CAST(month(o_orderdate) AS INTEGER) AS month,
            CASE WHEN o_orderstatus = 'F' THEN 'actual' ELSE 'predict' END AS category,
            ${sqlSumC("o_totalprice")}/100.0 AS base_amount
          FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1, 2, 3),
        tgt AS (SELECT site, month, base_amount * version AS amount, category,
            version, validate
          FROM base CROSS JOIN (VALUES (1, true), (2, true), (3, false))
            v(version, validate)),
        latest AS (SELECT site, make_date(1995, month, 1) AS period_start,
            amount, category
          FROM tgt
          WHERE version = (SELECT max(version) FROM tgt WHERE validate)
            AND site <> 'All'),
        fem_ratio AS (${sqlRatio(Seq("WK-A" -> 0.5, "WK-B" -> 0.5))}),
        wzs_ratio AS (${sqlRatio(Seq("WZ-1" -> 0.25, "WZ-2" -> 0.75))}),
        split AS (
          SELECT CASE category WHEN 'predict' THEN 'target' ELSE 'actual' END
              AS category, plant, period_start, amount
          FROM (
            SELECT l.category, r.plant, l.period_start, l.amount * r.ratio AS amount
            FROM latest l LEFT JOIN fem_ratio r ON r.period_start = l.period_start
            WHERE l.site = 'WKS'
            UNION ALL
            SELECT l.category, r.plant, l.period_start, l.amount * r.ratio AS amount
            FROM latest l LEFT JOIN wzs_ratio r ON r.period_start = l.period_start
            WHERE l.site = 'WZS'
            UNION ALL
            SELECT category, site AS plant, period_start, amount
            FROM latest WHERE site NOT IN ('WZS', 'WKS')) u),
        ytm AS (SELECT plant, category, period_start, amount,
            $sqlYtm AS ytm_amount
          FROM split)
        SELECT m.site, y.plant, y.category, y.amount, y.ytm_amount,
          CAST(y.period_start AS TIMESTAMP) AS period_start,
          $sqlStamp AS last_update_time
        FROM ytm y
        LEFT JOIN (VALUES ('MS1','S1'), ('MS2','S2'), ('MA','WK-A'),
          ('MB','WK-B'), ('MZ1','WZ-1'), ('MZ2','WZ-2')) m(site, plant)
          ON m.plant = y.plant""")),

    // ---- staging.provider_plant_list end-to-end (reference :845-919) ----
    Q("j03_provider_plant_list",
      (s, dir) => {
        val rows = T(s, dir, "orders")
          .filter(year(col("o_orderdate")) === 1995)
          .groupBy(col("o_orderpriority").as("area"),
            when(col("o_custkey") % 3 === 0, "ProvA")
              .when(col("o_custkey") % 3 === 1, "ProvB")
              .otherwise("ProvC").as("provider"),
            when(col("o_custkey") % 2 === 0, "SiteX").otherwise("SiteY").as("site"),
            month(col("o_orderdate")).as("month"))
          .agg((sum(cents(col("o_totalprice"))) / 100.0).as("amount"))
          .withColumn("year", lit(1995))
        RawToStaging.providerPlantList(rows, clock)
          .withColumn("period_start", col("period_start").cast("timestamp"))
      },
      Some(s"""WITH rows_ AS (
          SELECT o_orderpriority AS area,
            CASE CAST(o_custkey % 3 AS INTEGER) WHEN 0 THEN 'ProvA'
              WHEN 1 THEN 'ProvB' ELSE 'ProvC' END AS provider,
            CASE CAST(o_custkey % 2 AS INTEGER) WHEN 0 THEN 'SiteX'
              ELSE 'SiteY' END AS site,
            CAST(month(o_orderdate) AS INTEGER) AS month,
            ${sqlSumC("o_totalprice")}/100.0 AS amount
          FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1, 2, 3, 4)
        SELECT area, provider, site, amount,
          CAST(make_date(1995, month, 1) AS TIMESTAMP) AS period_start,
          sum(amount) OVER (PARTITION BY area, site, provider
            ORDER BY make_date(1995, month, 1), amount
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ytm_amount,
          $sqlStamp AS last_update_time
        FROM rows_""")),

    // ---- app.solar_energy_overview end-to-end (reference
    // jobs/staging_to_app.py:399-587): the serving rollup over five staging
    // families with per-plant and WZS/WKS-site ratio rows. Staging inputs
    // are derived from one monthly orders aggregate scaled by exact binary
    // factors (×0.25/0.5/0.125/4), so every sum/ratio is IEEE-identical
    // cross-engine; site rollups have exactly two plant addends
    // (commutative, order-free). ----
    Q("j04_solar_overview",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("site"), col("plant"), col("category"))
          .orderBy(col("period_start"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val base = T(s, dir, "orders")
          .filter(year(col("o_orderdate")) === 1995)
          .groupBy(
            when(col("o_custkey") % 3 === 0, "S1")
              .when(col("o_custkey") % 3 === 1, "WKS")
              .otherwise("WZS").as("site"),
            concat(lit("P"), (col("o_custkey") % 2).cast("int")).as("plant"),
            when(col("o_orderstatus") === "F", "actual")
              .otherwise("target").as("category"),
            trunc(col("o_orderdate"), "MM").as("period_start"))
          .agg((sum(cents(col("o_totalprice"))) / 100.0).as("amount"))
          .withColumn("ytm_amount", sum(col("amount")).over(w))
          // r15: the five staging families below (and the overview/ratio
          // branches inside solarEnergyOverview) re-derive this frame
          // ~8× — materialize the bounded rollup+YTM once
          .localCheckpoint()
        def scaled(factor: Double, cat: Column) = base
          .filter(col("category") === "actual")
          .select(col("site"), col("plant"), cat.as("category"),
            (col("amount") * factor).as("amount"),
            (col("ytm_amount") * factor).as("ytm_amount"), col("period_start"))
        val stgCols = Seq("site", "plant", "category", "amount",
          "ytm_amount", "period_start").map(col)
        val solarStg = base.select(stgCols: _*)
        val remainStg = base.filter(col("category") === "actual")
          .select(col("site"), col("plant"), (col("amount") * 0.25).as("amount"),
            (col("ytm_amount") * 0.25).as("ytm_amount"), col("period_start"))
        val infoStg = scaled(0.5, lit("cap"))
        val otherStg = scaled(0.125, lit("tree"))
        val electStg = base.select(col("site"), col("plant"), col("category"),
          (col("amount") * 4.0).as("amount"),
          (col("ytm_amount") * 4.0).as("ytm_amount"), col("period_start"))
        StagingToApp.solarEnergyOverview(solarStg, remainStg, infoStg,
            otherStg, electStg, clock)
          .withColumn("period_start", col("period_start").cast("timestamp"))
      },
      Some(s"""WITH base0 AS (
          SELECT CASE CAST(o_custkey % 3 AS INTEGER)
              WHEN 0 THEN 'S1' WHEN 1 THEN 'WKS' ELSE 'WZS' END AS site,
            'P' || CAST(CAST(o_custkey % 2 AS INTEGER) AS VARCHAR) AS plant,
            CASE WHEN o_orderstatus = 'F' THEN 'actual' ELSE 'target' END AS category,
            CAST(date_trunc('month', o_orderdate) AS DATE) AS period_start,
            ${sqlSumC("o_totalprice")}/100.0 AS amount
          FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1, 2, 3, 4),
        base AS (SELECT *, sum(amount) OVER (PARTITION BY site, plant, category
            ORDER BY period_start
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ytm_amount
          FROM base0),
        remain0 AS (SELECT site, plant, period_start, amount*0.25 AS amount,
            ytm_amount*0.25 AS ytm_amount FROM base WHERE category = 'actual'),
        info AS (SELECT site, plant, 'cap' AS category, amount*0.5 AS amount,
            ytm_amount*0.5 AS ytm_amount, period_start FROM base
          WHERE category = 'actual'),
        other AS (SELECT site, plant, 'tree' AS category, amount*0.125 AS amount,
            ytm_amount*0.125 AS ytm_amount, period_start FROM base
          WHERE category = 'actual'),
        elect AS (SELECT site, plant, category, amount*4.0 AS amount,
            ytm_amount*4.0 AS ytm_amount, period_start FROM base),
        actual_use AS (SELECT site, plant, 'actual_use' AS category, amount,
            ytm_amount, period_start FROM base WHERE category = 'actual'),
        target_ AS (SELECT site, plant, category, amount, ytm_amount,
            period_start FROM base WHERE category = 'target'),
        remain_c AS (SELECT site, plant, 'remain' AS category, amount,
            ytm_amount, period_start FROM remain0),
        actual AS (SELECT a.site, a.plant, 'actual' AS category,
            a.amount + r.amount AS amount,
            a.ytm_amount + r.ytm_amount AS ytm_amount, a.period_start
          FROM base a LEFT JOIN remain0 r ON r.site = a.site
            AND r.plant = a.plant AND r.period_start = a.period_start
          WHERE a.category = 'actual'),
        overview AS (SELECT * FROM actual UNION ALL SELECT * FROM target_
          UNION ALL SELECT * FROM remain_c UNION ALL SELECT * FROM actual_use
          UNION ALL SELECT * FROM info UNION ALL SELECT * FROM other),
        elect_rest AS (SELECT * FROM elect WHERE site NOT IN ('WZS','WKS','WIHK')),
        elect_wzks AS (SELECT * FROM elect WHERE site IN ('WZS','WKS')),
        ratio AS (SELECT l.site, l.plant,
            CASE l.category WHEN 'actual' THEN 'solar_ratio_actual'
              ELSE 'solar_ratio_target' END AS category,
            l.amount / r.amount * 100 AS amount,
            l.ytm_amount / r.ytm_amount * 100 AS ytm_amount, l.period_start
          FROM overview l LEFT JOIN elect_rest r ON r.site = l.site
            AND r.plant = l.plant AND r.period_start = l.period_start
            AND r.category = l.category
          WHERE l.category IN ('actual','target')
            AND l.site NOT IN ('WKS','WZS')),
        swz AS (SELECT site, category, period_start, sum(amount) AS amount,
            sum(ytm_amount) AS ytm_amount
          FROM overview WHERE category IN ('actual','target')
            AND site IN ('WKS','WZS') GROUP BY 1, 2, 3),
        ewz AS (SELECT site, category, period_start, sum(amount) AS amount,
            sum(ytm_amount) AS ytm_amount
          FROM elect_wzks GROUP BY 1, 2, 3),
        ratio_wzks AS (SELECT l.site, 'ALL' AS plant,
            CASE l.category WHEN 'actual' THEN 'solar_ratio_actual'
              ELSE 'solar_ratio_target' END AS category,
            l.amount / r.amount * 100 AS amount,
            l.ytm_amount / r.ytm_amount * 100 AS ytm_amount, l.period_start
          FROM swz l LEFT JOIN ewz r ON r.site = l.site
            AND r.period_start = l.period_start AND r.category = l.category),
        elect_rest_dec AS (SELECT site, plant,
            CASE category WHEN 'actual' THEN 'elect_total_actual'
              ELSE 'elect_total_target' END AS category,
            amount, ytm_amount, period_start FROM elect_rest),
        ewz_dec AS (SELECT site, 'ALL' AS plant,
            CASE category WHEN 'actual' THEN 'elect_total_actual'
              ELSE 'elect_total_target' END AS category,
            amount, ytm_amount, period_start FROM ewz),
        final AS (SELECT * FROM overview UNION ALL SELECT * FROM elect_rest_dec
          UNION ALL SELECT * FROM ratio UNION ALL SELECT * FROM ewz_dec
          UNION ALL SELECT * FROM ratio_wzks)
        SELECT site, plant, category, amount, ytm_amount,
          CAST(period_start AS TIMESTAMP) AS period_start,
          $sqlStamp AS last_update_time
        FROM final
        WHERE plant IN (SELECT DISTINCT plant FROM overview)""")),

    // ---- the scope-projection year-range plan end-to-end (reference
    // jobs/elect_target_etl.py:16-69,178-295): latest-version selection,
    // grid ratios, coefficient tonnage, base/previous-year decarb
    // percentages including the collapsed loop's year-1 self-join.
    // Determinism: amounts are integer-valued doubles (raw cents), ratios
    // and coefficients are exact binary fractions, and every per-year sum
    // has exactly two site addends (commutative => order-free). ----
    Q("j05_scope_projection",
      (s, dir) => {
        import s.implicits._
        val sim0 = T(s, dir, "orders")
          .filter(year(col("o_orderdate")).between(1995, 1997))
          .groupBy(
            when(col("o_custkey") % 2 === 0, "S1").otherwise("S2").as("site"),
            year(col("o_orderdate")).as("year"))
          .agg(sum(cents(col("o_totalprice"))).cast("double").as("base_amount"))
          // r15: the latest-version scalar subqueries + projection
          // branches re-derive sim (and so this rollup) several times —
          // materialize the site×year-bounded frame once
          .localCheckpoint()
        val versions = Seq((1, 2026), (2, 2026), (2, 2025))
          .toDF("version", "version_year")
        val sim = sim0.crossJoin(versions)
          .select(col("site"), col("year"),
            (col("base_amount") * col("version")).as("amount"),
            col("version"), col("version_year"))
        val coef = Seq((1995, "S1", 0.5), (1995, "S2", 0.25),
          (1996, "S1", 0.5), (1996, "S2", 0.25),
          (1997, "S1", 0.5), (1997, "S2", 0.25)).toDF("year", "site", "coef")
        val setting = (1995 to 1997).flatMap(y =>
          Seq((y, "PPA", 25.0), (y, "solar", 25.0), (y, "REC", 25.0)))
          .toDF("year", "category", "amount")
        val overview = Seq(
          (2022, 12, "scope1", "actual", 2.0),
          (2022, 12, "scope2_location", "actual", 3.0),
          (2022, 12, "scope2_market", "actual", 4.0)
        ).toDF("year", "month", "category", "type", "ytm_amount")
        val prior = Seq((1994, 5.0)).toDF("year", "amount")
        ElectTargetEtl.decarbRenewSetting(coef, sim,
          setting, ElectTargetEtl.baseScopeFromOverview(overview), prior,
          Seq(1995, 1996, 1997))
      },
      Some(s"""WITH sim0 AS (
          SELECT CASE WHEN CAST(o_custkey % 2 AS INTEGER) = 0
              THEN 'S1' ELSE 'S2' END AS site,
            CAST(year(o_orderdate) AS INTEGER) AS year,
            CAST(${sqlSumC("o_totalprice")} AS DOUBLE) AS base_amount
          FROM orders WHERE year(o_orderdate) BETWEEN 1995 AND 1997
          GROUP BY 1, 2),
        sim AS (SELECT site, year, base_amount * version AS amount,
            version, version_year
          FROM sim0 CROSS JOIN (VALUES (1, 2026), (2, 2026), (2, 2025))
            v(version, version_year)),
        latest AS (SELECT site, year, amount FROM sim
          WHERE version = (SELECT max(version) FROM sim)
            AND version_year = (SELECT max(version_year) FROM sim)),
        ratios AS (
          SELECT year, CAST(1 - (25.0+25.0)/100 AS DOUBLE) AS ratio,
            'location' AS category
          FROM (SELECT CAST(unnest(range(1995, 1998)) AS INTEGER) AS year)
          UNION ALL
          SELECT year, CAST(1 - (25.0+25.0+25.0)/100 AS DOUBLE), 'market'
          FROM (SELECT CAST(unnest(range(1995, 1998)) AS INTEGER) AS year)),
        coef AS (SELECT * FROM (VALUES
          (1995, 'S1', CAST(0.5 AS DOUBLE)), (1995, 'S2', CAST(0.25 AS DOUBLE)),
          (1996, 'S1', CAST(0.5 AS DOUBLE)), (1996, 'S2', CAST(0.25 AS DOUBLE)),
          (1997, 'S1', CAST(0.5 AS DOUBLE)), (1997, 'S2', CAST(0.25 AS DOUBLE)))
          c(year, site, coef)),
        t AS (SELECT l.year, r.category,
            l.amount * r.ratio * c.coef / 1000 AS amount
          FROM latest l
          LEFT JOIN ratios r ON r.year = l.year
          LEFT JOIN coef c ON c.year = l.year AND c.site = l.site),
        loc AS (SELECT year, sum(amount) AS amount FROM t
          WHERE category = 'location' GROUP BY 1),
        mkt AS (SELECT year, sum(amount) AS amount FROM t
          WHERE category = 'market' GROUP BY 1),
        s1 AS (SELECT year, amount * (0.06/(1-0.06)) AS amount FROM loc),
        s12 AS (SELECT year, sum(amount) AS amount FROM
          (SELECT * FROM s1 UNION ALL SELECT * FROM mkt) u GROUP BY 1),
        prev AS (SELECT year + 1 AS year, amount AS amount_y FROM
          (SELECT * FROM s12 UNION ALL SELECT 1994, CAST(5.0 AS DOUBLE)) u)
        SELECT year, amount, 'scope2_location' AS category FROM loc
        UNION ALL SELECT year, amount, 'scope2_market' FROM mkt
        UNION ALL SELECT year, amount, 'scope1' FROM s1
        UNION ALL SELECT year, (amount / 4.0 - 1) * 100,
          'scope2_decarb_simulate' FROM mkt
        UNION ALL SELECT year, (amount / 6.0 - 1) * 100,
          'scope1n2_decarb_simulate' FROM s12
        UNION ALL SELECT s12.year, (s12.amount / prev.amount_y - 1) * 100,
          'scope1n2_decarb_simulate_sbti'
        FROM s12 LEFT JOIN prev ON prev.year = s12.year""")),

    // ---- the quarterly green-energy overview end-to-end (reference
    // jobs/renew_green_energy.py:21-57,193-348): staging aggregates at the
    // quarter close, customer netting, target-rate demand with the zero
    // clip, purchase pricing, area mapping (unmapped → 其他) and the
    // site='ALL'/customer='ALL' area rollup. Every amount is an exact
    // binary-scaled integer (cents × 2^-k), so all sums are EXACT in
    // double — order-free across any partitioning. ----
    Q("j06_green_energy_quarter",
      (s, dir) => {
        import s.implicits._
        val qw = DecarbDate.QuarterWindow(1995, "Q4", 4,
          LocalDate.of(1995, 1, 1), LocalDate.of(1995, 12, 1))
        val dec = java.sql.Date.valueOf("1995-12-01")
        val base = T(s, dir, "orders")
          .filter(year(col("o_orderdate")) === 1995)
          .groupBy(when(col("o_custkey") % 2 === 0, "S1")
            .otherwise("S2").as("site"))
          .agg(sum(cents(col("o_totalprice"))).cast("double").as("b"))
          // r15: electStg + three renewStg categories re-scan this
          // 2-row rollup's whole orders subtree 4× — materialize once
          .localCheckpoint()
        val electStg = base.select(col("site"),
            col("b").as("amount"), col("b").as("ytm_amount"))
          .withColumn("bo", lit("ALL"))
          .withColumn("period_start", lit(dec))
        val renewStg = Seq(("solar_energy", 0.25),
            ("green_electricity", 0.125), ("green_energy", 0.0625))
          .map { case (cat, f) =>
            base.select(col("site"), (col("b") * f).as("amount"),
                (col("b") * f).as("ytm_amount"))
              .withColumn("category", lit(cat))
              .withColumn("bo", lit("ALL"))
              .withColumn("period_start", lit(dec))
          }.reduce(_ unionByName _)
        val setting = Seq((1995, "solar", 25.0), (1995, "PPA", 25.0),
          (1995, "REC", 25.0)).toDF("year", "category", "amount")
        val cust = Seq((1995, 4, "A1", "S1", "CustX", 1000.0, 100.0, 50.0,
          5.0, 60.0, 140.0, 7.0, 3.0, 2.0, "note"))
          .toDF("year", "quarter", "area", "site", "customer", "total_elect",
            "solar", "green_elect", "green_energy", "target_renew",
            "grey_elect", "predict_price", "green_energy_request",
            "actual_amount", "remark")
        val purchase = Seq((1995, "S1", "Q4", "-", 0.5, 7.0))
          .toDF("year", "site", "quarter", "customer", "unit_price", "amount")
        val areaMap = Seq((1995, "S1", "A1")).toDF("year", "site", "area")
        RenewGreenEnergy.summarizeQuarter(setting, electStg, renewStg, cust,
          purchase, areaMap, qw)
      },
      Some(s"""WITH base AS (
          SELECT CASE WHEN CAST(o_custkey % 2 AS INTEGER) = 0
              THEN 'S1' ELSE 'S2' END AS site,
            CAST(${sqlSumC("o_totalprice")} AS DOUBLE) AS b
          FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
        cust AS (SELECT 'S1' AS site, 'CustX' AS customer, 'A1' AS area,
          CAST(1000.0 AS DOUBLE) AS total_elect, CAST(100.0 AS DOUBLE) AS solar,
          CAST(50.0 AS DOUBLE) AS green_elect,
          CAST(5.0 AS DOUBLE) AS green_energy,
          CAST(60.0 AS DOUBLE) AS target_renew,
          CAST(140.0 AS DOUBLE) AS grey_elect,
          CAST(7.0 AS DOUBLE) AS predict_price,
          CAST(3.0 AS DOUBLE) AS green_energy_request,
          CAST(2.0 AS DOUBLE) AS actual_amount),
        elect AS (SELECT base.site, b - COALESCE(c.total_elect, 0) AS total_elect
          FROM base LEFT JOIN cust c ON c.site = base.site),
        solar AS (SELECT base.site, b*0.25 - COALESCE(c.solar, 0) AS solar
          FROM base LEFT JOIN cust c ON c.site = base.site),
        grel AS (SELECT base.site, b*0.125 - COALESCE(c.green_elect, 0) AS green_elect
          FROM base LEFT JOIN cust c ON c.site = base.site),
        gren AS (SELECT site, b*0.0625 AS green_energy FROM base),
        rt AS (SELECT e.site, e.total_elect, s.solar, g.green_elect,
            n.green_energy,
            e.total_elect * ((25.0+25.0+25.0)/100) AS target_renew,
            e.total_elect - s.solar - g.green_elect AS grey_elect
          FROM elect e JOIN solar s ON s.site = e.site
          JOIN grel g ON g.site = e.site JOIN gren n ON n.site = e.site),
        demand AS (SELECT *, greatest(
            target_renew - solar - green_elect - green_energy, 0.0)
            AS green_energy_request FROM rt),
        priced AS (SELECT d.*,
            COALESCE(p.unit_price, 0.0) AS unit_price,
            COALESCE(p.actual_amount, 0.0) AS actual_amount,
            COALESCE(p.unit_price, 0.0) * d.green_energy_request AS predict_price,
            d.green_energy / d.total_elect * 100 AS ratio
          FROM demand d LEFT JOIN (SELECT 'S1' AS site,
            CAST(0.5 AS DOUBLE) AS unit_price,
            CAST(7.0 AS DOUBLE) AS actual_amount) p ON p.site = d.site),
        sites AS (SELECT site,
            CASE site WHEN 'S1' THEN 'A1' ELSE N'其他' END AS area,
            1995 AS year, 4 AS quarter, '' AS customer,
            total_elect, grey_elect, target_renew, solar, green_elect,
            green_energy, green_energy_request, unit_price, predict_price,
            actual_amount, ratio
          FROM priced),
        pool AS (SELECT area, total_elect, grey_elect, target_renew, solar,
            green_elect, green_energy, green_energy_request, unit_price,
            predict_price, actual_amount FROM sites
          UNION ALL
          SELECT area, total_elect, grey_elect, target_renew, solar,
            green_elect, green_energy, CAST(3.0 AS DOUBLE),
            CAST(0.0 AS DOUBLE), predict_price, actual_amount FROM cust),
        rolled AS (SELECT 1995 AS year, 4 AS quarter, area, 'ALL' AS site,
            'ALL' AS customer,
            sum(total_elect) AS total_elect, sum(grey_elect) AS grey_elect,
            sum(target_renew) AS target_renew, sum(solar) AS solar,
            sum(green_elect) AS green_elect, sum(green_energy) AS green_energy,
            sum(green_energy_request) AS green_energy_request,
            sum(unit_price) AS unit_price, sum(predict_price) AS predict_price,
            sum(actual_amount) AS actual_amount,
            sum(green_energy) / sum(total_elect) * 100 AS ratio
          FROM pool GROUP BY 3)
        SELECT year, quarter, site, area, customer, total_elect, grey_elect,
          target_renew, solar, green_elect, green_energy,
          green_energy_request, unit_price, predict_price, actual_amount,
          ratio, CAST(NULL AS VARCHAR) AS remark
        FROM (SELECT * FROM rolled UNION ALL
          SELECT year, quarter, area, site, customer, total_elect,
            grey_elect, target_renew, solar, green_elect, green_energy,
            green_energy_request, unit_price, predict_price, actual_amount,
            ratio FROM sites) u""")),

    // ---- the FULL MACC chain end-to-end (reference: macc_summary/
    // macc_input_to_summary.py:12-283): assembleDemand (version argmax,
    // WKS:XTRKS demand-ratio split, 2025+ rollup quirk, PPA/REC share
    // algebra with the REC clip, carbon-coefficient fan-out + respellings)
    // → joinGreenCosts (WIH price copies, dedup) → summarize (FX convert,
    // yearly cost, WACC discount, marginal cost with the zero-abatement
    // null, 6-measure unpivot). Only m02 (the discount step alone) was
    // gated before; this row hash-proves every formula of the reference's
    // densest job against an independent SQL reconstruction. Determinism:
    // the only re-aggregated doubles (solar) are exact integers (cents as
    // doubles), everything downstream is row-wise; the runtime pow() is
    // matched by oracle-side literals from the same StrictMath.pow. ----
    Q("j07_macc_chain",
      (s, dir) => {
        import s.implicits._
        def idxCase(idx: Column, names: Seq[String]): Column =
          names.zipWithIndex.tail.foldLeft(
            when(idx === 0, names.head)) { case (acc, (n, i)) =>
            acc.when(idx === i, n) }
        val demandRaw = T(s, dir, "orders")
          .filter(year(col("o_orderdate")).between(1994, 1996))
          .groupBy(
            idxCase((col("o_custkey") % 12).cast("int"), maccSites).as("site"),
            (year(col("o_orderdate")) + 30).as("year"),
            when(col("o_orderkey") % 3 === 0, "V10").otherwise("V2").as("version"))
          .agg(sum(cents(col("o_totalprice"))).cast("double").as("amount"))
          .select(col("site"), col("year"), col("amount"), col("version"))
          // r15: assembleDemand's max-version scalar + the WKS/XTRKS
          // ratio pulls re-derive this frame — materialize the bounded
          // site×year×version rollup once
          .localCheckpoint()
        val rawSolar = T(s, dir, "lineitem")
          .filter(year(col("l_shipdate")).between(1994, 1996))
          .groupBy(
            idxCase((col("l_suppkey") % 6).cast("int"), maccPlants).as("plant"),
            when(col("l_linenumber") % 2 === 0, "target").otherwise("actual")
              .as("category"),
            make_date(year(col("l_shipdate")) + 30, month(col("l_shipdate")),
              lit(1)).as("period_start"))
          .agg(sum(cents(col("l_extendedprice"))).cast("double").as("amount"))
          // r15: same — the plant×category×month-bounded lineitem rollup
          // feeds several assembleDemand branches
          .localCheckpoint()
        val demand = MaccSummary.assembleDemand(demandRaw, rawSolar,
          maccPpa.toDF("year", "category", "amount"),
          maccCoef.toDF("site", "year", "amount"))
        val withCosts = MaccSummary.joinGreenCosts(demand,
          maccCerCost.toDF("site", "year", "amount"),
          maccElecCost.toDF("site", "year", "amount"))
        MaccSummary.summarize(withCosts, maccFx.toDF("year", "rate"), maccWacc)
      },
      Some {
        def idxCase(e: String, names: Seq[String]): String =
          s"CASE $e " + names.zipWithIndex
            .map { case (n, i) => s"WHEN $i THEN '$n'" }.mkString(" ") + " END"
        val fxVals = maccFx.map { case (y, r) =>
          s"($y, CAST($r AS DOUBLE))" }.mkString(", ")
        val facVals = maccFactors.map { case (y, f) =>
          s"($y, CAST($f AS DOUBLE))" }.mkString(", ")
        val ppaVals = maccPpa.map { case (y, c, a) =>
          s"($y, '$c', CAST($a AS DOUBLE))" }.mkString(", ")
        s"""WITH demand_raw AS (
            SELECT ${idxCase("CAST(o_custkey % 12 AS INTEGER)", maccSites)} AS site,
              CAST(year(o_orderdate) + 30 AS INTEGER) AS year,
              CAST(${sqlSumC("o_totalprice")} AS DOUBLE) AS amount,
              CASE WHEN o_orderkey % 3 = 0 THEN 'V10' ELSE 'V2' END AS version
            FROM orders WHERE year(o_orderdate) BETWEEN 1994 AND 1996
            GROUP BY 1, 2, 4),
          maxv AS (SELECT max(TRY_CAST(substr(version, 2) AS INTEGER)) AS mv
            FROM demand_raw),
          demand AS (SELECT site, year, amount FROM demand_raw, maxv
            WHERE TRY_CAST(substr(version, 2) AS INTEGER) = mv),
          ratio AS (SELECT w.amount / (w.amount + x.amount) AS r
            FROM (SELECT amount FROM demand WHERE site = 'WKS' AND year = 2024) w,
                 (SELECT amount FROM demand WHERE site = 'XTRKS' AND year = 2024) x),
          solar_raw AS (
            SELECT ${idxCase("CAST(l_suppkey % 6 AS INTEGER)", maccPlants)} AS plant,
              CASE WHEN l_linenumber % 2 = 0 THEN 'target' ELSE 'actual' END
                AS category,
              make_date(CAST(year(l_shipdate) + 30 AS INTEGER),
                CAST(month(l_shipdate) AS INTEGER), 1) AS period_start,
              CAST(${sqlSumC("l_extendedprice")} AS DOUBLE) AS amount
            FROM lineitem WHERE year(l_shipdate) BETWEEN 1994 AND 1996
            GROUP BY 1, 2, 3),
          solar2024 AS (SELECT plant, CAST(2024 AS INTEGER) AS year,
              sum(amount) AS amount
            FROM solar_raw WHERE category = 'target' AND year(period_start) = 2024
            GROUP BY 1),
          shared AS (SELECT amount FROM solar2024 WHERE plant = 'WKS/XTRKS'),
          solar_later AS (SELECT
              CASE WHEN plant = 'WKS/XTRKS' THEN 'XTRKS' ELSE plant END AS plant,
              year, amount
            FROM (SELECT plant, CAST(year(period_start) AS INTEGER) AS year,
                sum(amount) AS amount
              FROM solar_raw WHERE year(period_start) >= 2025 GROUP BY 1, 2) g),
          solar_all AS (
            SELECT plant AS site, year, amount AS solar_demand FROM solar2024
            UNION ALL SELECT 'WKS', CAST(2024 AS INTEGER), s.amount * r.r
              FROM shared s, ratio r
            UNION ALL SELECT 'XTRKS', CAST(2024 AS INTEGER), s.amount * (1 - r.r)
              FROM shared s, ratio r
            UNION ALL SELECT plant, year, amount FROM solar_later),
          with_solar AS (SELECT d.site, d.year, d.amount,
              COALESCE(sa.solar_demand, CAST(0.0 AS DOUBLE)) AS solar_demand
            FROM demand d LEFT JOIN solar_all sa
              ON sa.site = d.site AND sa.year = d.year),
          ws2 AS (SELECT *, solar_demand / amount * 100 AS solar_rate
            FROM with_solar),
          ppa AS (SELECT year, amount AS ppa_in
            FROM (VALUES $ppaVals) s(year, category, amount)
            WHERE category = 'PPA'),
          r1 AS (SELECT w.*, CASE WHEN w.site IN ('WCD','WCQ','WCZ','WMX','WVN')
                THEN CAST(0.0 AS DOUBLE) ELSE p.ppa_in END AS ppa0
            FROM ws2 w LEFT JOIN ppa p ON p.year = w.year),
          r2 AS (SELECT *, CASE WHEN (100 - solar_rate - ppa0) < 0
                THEN CAST(0.0 AS DOUBLE) ELSE (100 - solar_rate - ppa0) END
                AS rec_rate
            FROM r1),
          r3 AS (SELECT *, 100 - solar_rate - rec_rate AS ppa_rate FROM r2),
          r4 AS (SELECT *, amount * ppa_rate / 100 AS ppa_demand,
              amount * rec_rate / 100 AS rec_demand FROM r3),
          coef_src AS (SELECT * FROM
            ${sqlValues3(maccCoef, ("site", "year", "amount"))}),
          coef AS (SELECT CASE site WHEN 'WIHK1' THEN 'WIHK-1'
                WHEN 'WIHK2' THEN 'WIHK-2' WHEN 'WMYP1' THEN 'WMY'
                ELSE site END AS site,
              year, amount AS ccoef
            FROM (SELECT site, year, amount FROM coef_src
              UNION ALL SELECT 'N2', year, amount FROM coef_src WHERE site = 'WIH'
              UNION ALL SELECT 'WKH', year, amount FROM coef_src WHERE site = 'WIH'
              UNION ALL SELECT 'WTN', year, amount FROM coef_src WHERE site = 'WIH'
              UNION ALL SELECT '竹北AI', year, amount FROM coef_src
                WHERE site = 'WIH') u),
          d2 AS (SELECT r.*, c.ccoef,
              r.ppa_demand * c.ccoef / 1000 AS ppa_abatement,
              r.rec_demand * c.ccoef / 1000 AS rec_abatement
            FROM r4 r LEFT JOIN coef c ON c.site = r.site AND c.year = r.year),
          certs AS (SELECT site, year, amount AS cer_cost FROM
            ${sqlValues3(maccCerCost, ("site", "year", "amount"))}),
          elec_src AS (SELECT * FROM
            ${sqlValues3(maccElecCost, ("site", "year", "amount"))}),
          elec AS (SELECT DISTINCT site, year, amount AS elec_diff
            FROM (SELECT site, year, amount FROM elec_src
              UNION ALL SELECT 'N2', year, amount FROM elec_src WHERE site = 'WIH'
              UNION ALL SELECT '竹北AI', year, amount FROM elec_src
                WHERE site = 'WIH') u),
          d3 AS (SELECT d.*, ct.cer_cost, el.elec_diff
            FROM d2 d
            LEFT JOIN certs ct ON ct.site = d.site AND ct.year = d.year
            LEFT JOIN elec el ON el.site = d.site AND el.year = d.year),
          fx AS (SELECT * FROM (VALUES $fxVals) f(year, rate)),
          fac AS (SELECT * FROM (VALUES $facVals) f(year, factor)),
          enr AS (SELECT d.site, d.year, d.ppa_abatement, d.rec_abatement,
              d.rec_demand * (d.cer_cost * f.rate / 1000.0) AS rec_year_cost,
              d.ppa_demand * (d.elec_diff * f.rate / 1000.0) AS ppa_year_cost,
              fc.factor
            FROM d3 d LEFT JOIN fx f ON f.year = d.year
            LEFT JOIN fac fc ON fc.year = d.year),
          enr2 AS (SELECT site, year, ppa_abatement, rec_abatement,
              rec_year_cost / factor AS wacc_cer_cost,
              ppa_year_cost / factor AS wacc_cost
            FROM enr),
          enr3 AS (SELECT *,
              CASE WHEN rec_abatement <> 0 THEN wacc_cer_cost / rec_abatement
                END AS wacc_cer_margin,
              CASE WHEN ppa_abatement <> 0 THEN wacc_cost / ppa_abatement
                END AS wacc_margin
            FROM enr2),
          m AS (
            SELECT site, year, wacc_cost AS amount,
              '2.2 PPA' AS lever, '減碳成本' AS item FROM enr3
            UNION ALL SELECT site, year, wacc_cer_cost,
              '2.3 Unbundled EAC', '減碳成本' FROM enr3
            UNION ALL SELECT site, year, ppa_abatement,
              '2.2 PPA', '碳排減排量' FROM enr3
            UNION ALL SELECT site, year, rec_abatement,
              '2.3 Unbundled EAC', '碳排減排量' FROM enr3
            UNION ALL SELECT site, year, wacc_margin,
              '2.2 PPA', '邊際減排成本' FROM enr3
            UNION ALL SELECT site, year, wacc_cer_margin,
              '2.3 Unbundled EAC', '邊際減排成本' FROM enr3)
          SELECT site, year, amount, 'Scope 2' AS category, lever, item
          FROM m WHERE year > 2023 AND amount IS NOT NULL"""
      })
  )
}
