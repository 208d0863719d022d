package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Versioned, sign-off-gated dataset workflow (SURVEY.md §1.1): simulation
  * outputs append under a new version with `validate = false`; a sign-off
  * record ties the version to a submitter and reviewer
  * (reference: app/sign_off/blueprint.py:39-90 — ORM transaction + nanoid id);
  * approval flips `validate`, and consumers read "the latest validated
  * version" (reference: jobs/raw_to_staging.py:697 MAX(version) scalar
  * subquery — here a window, [[Relational.latest]]).
  *
  * The id generator is injectable (the reference's nanoid), keeping the
  * workflow deterministic under test.
  */
object SignOff {

  final case class Record(signOffId: String, version: Int, versionYear: Int,
                          pic: String, reviewer: String, status: String)

  trait IdGen extends Serializable { def next(): String }
  object RandomIdGen extends IdGen {
    override def next(): String = java.util.UUID.randomUUID().toString.take(21)
  }

  /** Next version number for an append: max existing + 1 (reference:
    * Model/Factory_elect_simulator_update.py:938-947). */
  def nextVersion(existing: DataFrame): Int =
    existing.agg(coalesce(max(col("version")), lit(0)).as("v"))
      .head().getInt(0) + 1

  /** Stamp a result set as a new unvalidated version. */
  def stage(df: DataFrame, version: Int, versionYear: Int): DataFrame =
    df.withColumn("version", lit(version))
      .withColumn("version_year", lit(versionYear))
      .withColumn("validate", lit(false))

  /** Create the sign-off record for a staged version. */
  def create(version: Int, versionYear: Int, pic: String, reviewer: String,
             idGen: IdGen = RandomIdGen): Record =
    Record(idGen.next(), version, versionYear, pic, reviewer, "pending")

  /** Approval: flip `validate` for the signed-off version. */
  def approve(df: DataFrame, version: Int): DataFrame =
    df.withColumn("validate",
      when(col("version") === version, lit(true)).otherwise(col("validate")))

  /** Consumer view: rows of the highest validated version per version_year —
    * the MAX(version) WHERE validate scalar-subquery as one window pass. */
  def latestValidated(df: DataFrame): DataFrame =
    Relational.latest(df.filter(col("validate")), Seq("version_year"),
      Seq("version"))
}
