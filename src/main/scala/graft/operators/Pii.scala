package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora — the redaction pass every public
  * LLM data pipeline runs before tokenization (emails, phone numbers,
  * IP addresses → typed placeholder tokens, so the model never memorizes
  * the literals and downstream dedup treats redacted variants as equal).
  *
  * Pure columnar `regexp_replace` chain: codegen'd, no UDF, linear scans.
  * The patterns deliberately stay in the RE2-compatible subset (no
  * backreferences/lookahead) so the SAME regexes run on any engine this
  * corpus is later processed with. Counting uses `regexp_count` so a
  * pipeline can gate on residual-PII = 0 after redaction (PiiSpec pins
  * idempotence and that exact gate).
  */
object Pii {

  /** ordered (pattern, placeholder); email first so its digits are gone
    * before the phone pattern scans */
  val patterns: Seq[(String, String)] = Seq(
    // local@domain.tld — the pragmatic form, not full RFC 5322
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    // IPv4 dotted quad (before phones: a quad is 4 digit runs)
    ("\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    // international-ish phone: optional +, 8-18 total positions incl.
    // (), -, ., space separators, ending on a digit at a word boundary
    ("\\+?[0-9][0-9()\\-. ]{6,16}[0-9]\\b", "<PHONE>"))

  /** redacted copy of `text` */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (c, (re, token)) =>
      regexp_replace(c, re, token)
    }

  /** count of PII literals still present (0 after [[redact]]) */
  def piiCount(text: Column): Column =
    patterns.map { case (re, _) => regexp_count(text, lit(re)) }
      .reduce(_ + _)
}
