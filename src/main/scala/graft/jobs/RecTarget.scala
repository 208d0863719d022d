package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quarterly REC (renewable-energy-certificate) target adjustment — the
  * month-branch table the reference applies because certificates settle
  * quarterly while the overview is monthly
  * (reference: jobs/staging_cal.py:794-874 + the `green_energy_target_adjust`
  * helper at :13-25):
  *
  *   month 3            → amount := ytm (first quarter settles whole YTM)
  *   months 4,5         → amount := 0, ytm := published March ytm
  *   month 6            → amount := ytm − March amount
  *   months 7,8         → amount := 0, ytm := published June ytm
  *   month 9            → amount := ytm − (March+June amounts)
  *   months 10,11       → amount := 0, ytm := published September ytm
  *   month 12           → amount := ytm − (March+June+September amounts)
  *   months 1,2         → amount := 0, ytm := 0
  *
  * `prior` is the already-published overview for the year
  * ((month, amount, ytm_amount) rows) — the reference re-reads
  * app.decarb_elec_overview for each branch; here the needed scalars come
  * from one broadcast aggregate.
  */
object RecTarget {

  def quarterlyRecTarget(current: DataFrame, month: Int,
                         prior: DataFrame): DataFrame = {
    def priorSumAmount(months: Seq[Int]) =
      prior.filter(col("month").isin(months: _*))
        .agg(coalesce(sum(col("amount")), lit(0.0)).as("__prior_amt"))
    def priorYtm(m: Int) =
      prior.filter(col("month") === m)
        .agg(coalesce(sum(col("ytm_amount")), lit(0.0)).as("__prior_ytm"))

    val out = month match {
      case 3 =>
        current.withColumn("amount", col("ytm_amount"))
      case 4 | 5 =>
        current.crossJoin(broadcast(priorYtm(3)))
          .withColumn("amount", lit(0.0))
          .withColumn("ytm_amount", col("__prior_ytm"))
      case 6 =>
        current.crossJoin(broadcast(priorSumAmount(Seq(3))))
          .withColumn("amount", col("ytm_amount") - col("__prior_amt"))
      case 7 | 8 =>
        current.crossJoin(broadcast(priorYtm(6)))
          .withColumn("amount", lit(0.0))
          .withColumn("ytm_amount", col("__prior_ytm"))
      case 9 =>
        current.crossJoin(broadcast(priorSumAmount(Seq(3, 6))))
          .withColumn("amount", col("ytm_amount") - col("__prior_amt"))
      case 10 | 11 =>
        current.crossJoin(broadcast(priorYtm(9)))
          .withColumn("amount", lit(0.0))
          .withColumn("ytm_amount", col("__prior_ytm"))
      case 12 =>
        current.crossJoin(broadcast(priorSumAmount(Seq(3, 6, 9))))
          .withColumn("amount", col("ytm_amount") - col("__prior_amt"))
      case 1 | 2 =>
        current.withColumn("amount", lit(0.0)).withColumn("ytm_amount", lit(0.0))
      case _ =>
        current.withColumn("amount", lit(0.0))
    }
    out.select(col("period_start"), col("amount"), col("ytm_amount"))
      .withColumn("category", lit("REC"))
  }
}
