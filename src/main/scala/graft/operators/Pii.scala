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
    * before the phone patterns scan.
    *
    * The phone patterns deliberately REQUIRE a phone marker — a leading
    * `+` country code or a parenthesized area code — rather than matching
    * any long digit/separator run: a bare-run pattern also matches ISO
    * dates, timestamps, and numeric ids, which are everywhere in real
    * corpora, and silently destroying those is worse than missing some
    * unmarked phone numbers (precision over recall — the trade every
    * public pipeline's PII pass makes). */
  val patterns: Seq[(String, String)] = Seq(
    // local@domain.tld — the pragmatic form, not full RFC 5322
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    // IPv4 dotted quad (before phones: a quad is 4 digit runs)
    ("\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    // +<country> … — international form with explicit plus (before the
    // paren form, which would otherwise eat the tail of "+1 (415) …")
    ("\\+\\d{1,3}[\\s.-]?\\(?\\d{1,4}\\)?(?:[\\s.-]?\\d{2,4}){2,4}\\b", "<PHONE>"),
    // (415) 555-0173 — parenthesized area code
    ("\\(\\d{3}\\)[\\s.-]?\\d{3}[\\s.-]\\d{4}\\b", "<PHONE>"))

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
