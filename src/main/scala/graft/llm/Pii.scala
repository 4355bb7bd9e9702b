package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text column — the scrub stage every
  * training-data pipeline runs before anything else sees the corpus.
  *
  * Pure per-row projection built from codegen'd native regexp expressions
  * (`regexp_extract_all` / `regexp_replace`, java.util.regex under
  * whole-stage codegen): zero shuffles, zero UDFs, trivially
  * embarrassingly parallel at any scale — the only 100 TB concern is scan
  * locality, which the parquet reader owns.
  *
  * The patterns deliberately stay inside the regex subset with identical
  * semantics in java.util.regex and RE2 (character classes, bounded
  * repetition, `\b`) so the same patterns run in the DuckDB oracle and in
  * any RE2-based scrubber a downstream pipeline might cross-check with.
  * Counts are detected-match counts BEFORE redaction; redaction replaces
  * emails, then phones, then IPs (the patterns cannot overlap, so the
  * order only fixes determinism of the byte stream, not the result set).
  */
object Pii {

  /** Regexes shared with the oracle — keep in sync with `Oracles.textPii`. */
  val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val phoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"
  val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  private def countOf(c: Column, re: String): Column =
    // regexp_count, not size(regexp_extract_all): identical non-overlapping
    // match count without materializing an array of match strings per row —
    // this projection runs over every arriving document in the admission
    // gate, so the allocation is the measurable part. coalesce to -1 keeps
    // the null-text contract of the historical size(regexp_extract_all(..))
    // form (legacy sizeOfNull): a null text counts -1 per class, so the
    // admission gate's `piiCount === 0` stays FALSE for null input instead
    // of flipping to null (pass_pii/admitted would otherwise go null).
    coalesce(regexp_count(c, lit(re)), lit(-1))

  /** Total PII matches across all three classes — the per-row count an
    * admission policy thresholds on ([[Corpus.admissionGate]]). */
  def piiCount(c: Column): Column =
    countOf(c, emailRe) + countOf(c, phoneRe) + countOf(c, ipRe)

  /** Per-row scrub report: match counts per PII class, the redacted text's
    * md5 (byte-exact check of the full replacement stream without shipping
    * the text), and the redacted length.
    *
    * @param df      input frame
    * @param idCol   row identity column, passed through
    * @param textCol text column to scrub
    */
  def scrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>"),
        ipRe, "<IP>")
    df.select(
      col(idCol),
      countOf(col(textCol), emailRe).as("n_emails"),
      countOf(col(textCol), phoneRe).as("n_phones"),
      countOf(col(textCol), ipRe).as("n_ips"),
      md5(redacted).as("redacted_md5"),
      length(redacted).as("redacted_len"))
  }
}
