package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction — regex-based scrubbing of emails, IPv4
  * addresses, and phone numbers, the minimum a corpus pipeline runs
  * before training or release.
  *
  * Pure column expressions (codegen'd, narrow, zero shuffle): the whole
  * stage is a linear scan that scales with executors. Patterns are
  * deliberately restricted to syntax shared by Java regex and RE2 so
  * any engine (and the DuckDB oracle) reproduces matches exactly —
  * no lookbehind, no backreferences.
  *
  * Redaction order matters and is fixed: emails first (an email's
  * domain may contain a dotted quad), then IPv4, then phones.
  */
object Pii {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"

  /** Match counts per category, pre-redaction. */
  def piiCounts(text: Column): Seq[Column] = Seq(
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long")
      .as("n_emails"),
    size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0))).cast("long")
      .as("n_ipv4"),
    size(regexp_extract_all(text, lit(PhonePattern), lit(0))).cast("long")
      .as("n_phones"))

  /** Redacted text: every match replaced by its category token. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")
}
