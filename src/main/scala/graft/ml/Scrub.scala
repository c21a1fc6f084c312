package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text scrubbing: detect and redact sensitive spans (PII, banned terms)
  * from a string column. The curation-pipeline counterpart of the
  * reference's text-cleaning nodes (SURVEY §2.A nlp: Trim/LowerCase),
  * extended to the redaction pass every LLM training-data pipeline runs
  * before tokenization.
  *
  * All patterns are RE2-compatible (no backrefs, no lookaround) so the
  * DuckDB oracle can run the exact same regex; on the Spark side they
  * compile to codegen'd `RegExpReplace`/`RegExpCount` — an embarrassingly
  * parallel map at any scale, with no shuffle carrying document text.
  */
object Scrub {

  /** Replacement token spliced where a match was removed. */
  val Redacted = "▮"

  /** Email addresses (pragmatic RFC-lite shape). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American phone numbers in SEPARATED forms only: optional +1,
    * then area code / exchange / line separated by -, . or space (the
    * area-code separator is mandatory). Unseparated 10-digit runs like
    * 5551234567 are deliberately OUT OF SCOPE: \d{10} is
    * indistinguishable from order ids / timestamps and would redact them
    * wholesale — the standard precision-over-recall call for a corpus
    * scrubber. */
  val PhonePattern = "\\+?1?[-. ]?\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}"

  /** Dotted-quad IPv4 (coarse: does not range-check octets). */
  val Ipv4Pattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** US SSN, dashed form only (undashed is too collision-prone). */
  val SsnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** Union of all PII patterns, for a one-pass scrub. */
  val PiiPattern: String =
    s"(?:$EmailPattern)|(?:$PhonePattern)|(?:$SsnPattern)|(?:$Ipv4Pattern)"

  /** Term blocklist used by the gated `q_blocklist_scrub` query — terms
    * chosen to occur in the synthetic corpus so the gate exercises real
    * matches (the corpus is digit-free, so the PII patterns above are
    * exercised by unit tests instead). */
  val BlockPattern = "\\b(customer|spark|merge)\\b"

  /** Adds `redacted` (the scrubbed text) and `n_matches` (occurrences
    * removed) columns. One pass of each codegen'd regexp op per row. */
  def redact(df: DataFrame, col: Column, pattern: String): DataFrame =
    df.withColumn("redacted", regexp_replace(col, pattern, Redacted))
      .withColumn("n_matches", regexp_count(col, lit(pattern)))
}
