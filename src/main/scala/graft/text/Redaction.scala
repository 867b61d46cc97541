package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: regex redaction of the
  * machine-recognizable identifier classes every public data pipeline
  * masks before training (emails, IPv4 addresses, long digit runs
  * that look like phone/card numbers).
  *
  * Design constraints:
  *  - Pure `regexp_replace` chains — codegen'd, row-local, no
  *    shuffle, and linear per row.
  *  - Patterns stay inside the RE2-compatible subset of Java regex
  *    (no backreferences, no lookaround), so the DuckDB oracle runs
  *    the IDENTICAL pattern and the redaction is oracle-checkable.
  *  - Replacement tokens are angle-bracket sentinels the downstream
  *    tokenizer can keep as single pieces.
  */
object Redaction {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad with 1-3 digit octets. Deliberately permissive
    * (320.1.1.1 matches): at corpus scale false positives on
    * number-dot runs are preferable to leaked addresses, and the
    * permissive form needs no lookaround (RE2-safe). */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** 9+ digit runs, allowing common phone/card separators. */
  val LongNumberPattern = "\\b\\d[\\d \\-()]{7,}\\d\\b"

  def redactEmails(text: Column): Column =
    regexp_replace(text, EmailPattern, "<EMAIL>")

  def redactIps(text: Column): Column =
    regexp_replace(text, Ipv4Pattern, "<IP>")

  def redactLongNumbers(text: Column): Column =
    regexp_replace(text, LongNumberPattern, "<NUMBER>")

  /** The full scrub, applied most-specific first (emails before
    * number runs so an address's digits never half-match). */
  def redactPii(text: Column): Column =
    redactLongNumbers(redactIps(redactEmails(text)))
}
