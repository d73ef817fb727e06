package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII / deny-term redaction over the `documents` table — the scrubbing
  * pass every LLM training-data pipeline runs before anything else touches
  * the text. Emails, phone numbers, and IPv4 literals are masked by
  * pattern; a configurable deny-term list is masked by word-boundary match.
  *
  * Scale design: the whole operator is a chain of codegen'd
  * `regexp_replace` projections — zero shuffles, zero UDFs; it streams
  * through the corpus once and fuses into whatever scan feeds it (the
  * harness query's plan is one WholeStageCodegen over the parquet scan).
  * At 100 TB this is the ideal shape: per-row, embarrassingly parallel,
  * no state. The regexes are RE2-compatible (no backrefs / lookarounds)
  * so the DuckDB oracle replays the identical chain with the 'g' flag and
  * the redacted text is hash-checked byte for byte.
  *
  * The reference has no text surface (SURVEY §2.8 — its strings are CSV
  * fields, `CollabFilterCassandraDriver.java:131`); this extends the text
  * family (TextAnalysis / TermScoring) per the north-star brief.
  */
object Redaction {

  /** RE2 ∩ java.util.regex — keep to character classes, bounded repeats,
    * alternation, and \b word boundaries so both engines agree. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Deny terms for the harness query — tokens that actually occur in the
    * synthetic corpus, so the masking provably fires at sf scale. */
  val DenyTerms: Seq[String] = Seq("spark", "customer")

  /** Case-insensitive: a deny list that misses "SPARK" is not a deny
    * list. (?i) is an inline flag in both java.util.regex and RE2. */
  private def termRe(t: String): String = s"(?i)\\b$t\\b"

  /** PII stage alone: email → phone → IPv4. Order matters (a phone inside
    * an email is already masked) and is identical in the oracle. */
  def piiMasked(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      Ipv4Re, "[IP]")

  /** The full masking chain as a single nested column expression: email →
    * phone → IPv4 → deny terms, replacement tags in square brackets. */
  def redacted(text: Column, denyTerms: Seq[String] = DenyTerms): Column =
    denyTerms.foldLeft(piiMasked(text))((c, t) =>
      regexp_replace(c, termRe(t), "[TERM]"))

  /** Canonical content fingerprint AFTER redaction — the digest the
    * curation front door triages against, shared by the in-query standing
    * side, the persisted [[graft.sources.IndexStore]] curation index, and
    * the streaming probe, so the three can never drift. Redact-then-
    * canonicalize means a near-copy whose only difference is maskable PII
    * still triages as a duplicate. */
  def curationFp(text: Column): Column =
    md5(Dedup.canonicalText(redacted(text)))

  /** Count of deny-term hits per document (split-based so no regex-count
    * builtin is needed on either engine): Σ (elements(split on term) − 1).
    * Callers pass the PII-masked intermediate so every counted hit is one
    * that actually produces a [TERM] tag (a deny term hiding inside an
    * email/phone/IP span is masked by the PII stage and never tagged). */
  def termHits(text: Column, denyTerms: Seq[String] = DenyTerms): Column =
    denyTerms.map(t => size(split(text, termRe(t), -1)) - 1)
      .reduce(_ + _)

  /** Harness query: per-document redacted text + deny-term hit count +
    * a changed flag; ordered by doc_id for the hash compare.
    *
    * `n_term_hits` is counted on the PII-masked intermediate (so it equals
    * the number of [TERM] tags emitted) and `changed` is the real thing —
    * "did any mask fire" — i.e. red_text differs from the original, so
    * PII-only edits count too. Both definitions are mirrored byte-for-byte
    * in the q_pii_redact oracle. */
  def redactDocuments(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.select(
        col("doc_id"),
        col("text"),
        piiMasked(col("text")).as("pii_text"))
      .select(
        col("doc_id"),
        DenyTerms.foldLeft(col("pii_text"))((c, t) =>
          regexp_replace(c, termRe(t), "[TERM]")).as("red_text"),
        termHits(col("pii_text")).cast("int").as("n_term_hits"),
        col("text"))
      .withColumn("changed", (col("red_text") =!= col("text")).cast("boolean"))
      .drop("text")
      .orderBy(col("doc_id"))
  }
}
