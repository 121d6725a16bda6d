package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training-data pipelines: emails, phone numbers
  * and IPv4 addresses replaced with typed placeholders, plus
  * per-document match counts for filtering/reporting.
  *
  * All column expressions (regexp_replace / regexp_extract_all are
  * codegen'd — the scrub runs at scan speed as a narrow map, no
  * shuffle, linear at 100 TB). The patterns stay inside the regex
  * subset RE2-class engines also support (no backrefs/lookarounds),
  * so the same strings work in DuckDB/Trino for cross-engine checks.
  *
  * Scrub order matters and is fixed: emails first (their local part
  * can contain digits a phone pattern would clip), then IPv4 (dotted
  * quads are not valid phone matches but share digit runs), then
  * phones (by then every remaining long digit run is phone-shaped;
  * the placeholders themselves contain no digits, so earlier
  * replacements cannot be re-matched).
  */
object PiiScrub {
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** International-ish: optional +, then 7+ DIGITS with at most two
    * filler chars (space/()/-) between consecutive digits. Requiring
    * the digits themselves — not just 8 chars of the digit-or-filler
    * class — keeps year ranges ("2020 - 2024") and other spaced
    * numerics out of the redaction. */
  val PhoneRe = "\\+?\\d(?:[() -]{0,2}\\d){6,}"

  /** The scrubbed text column. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  /** (n_emails, n_ips, n_phones) counts as three columns. Counts
    * follow the same cascade as scrub() so a value is only counted
    * under its FIRST matching category (an email's digits never also
    * count as a phone). */
  def counts(text: Column): Seq[Column] = {
    val afterEmail = regexp_replace(text, EmailRe, "[EMAIL]")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "[IP]")
    Seq(
      size(regexp_extract_all(text, lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(Ipv4Re), lit(0))).as("n_ips"),
      size(regexp_extract_all(afterIp, lit(PhoneRe), lit(0))).as("n_phones"))
  }
}
