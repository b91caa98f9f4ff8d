package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: regex-based detection and
  * redaction of emails, phone numbers, and IPv4 addresses — the standard
  * pre-training hygiene pass.
  *
  * Pure map-side projections (codegen'd regexp ops): at 100 TB this runs
  * at scan speed with no shuffle. The patterns deliberately use only
  * syntax with identical semantics in Java regex and RE2 (no lookarounds,
  * no possessive quantifiers, no backrefs) so the redaction is replayable
  * by any RE2-based engine — the DuckDB oracle (q_pii) proves the exact
  * output text byte-for-byte.
  */
object Pii {

  /** Shared Java/RE2 subset patterns. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\d{3}[-. ]\\d{3}[-. ]\\d{4}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  private def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** (doc_id, text_redacted, n_emails, n_phones, n_ips).
    * Replacement order matters and is part of the contract: emails first
    * (their domains contain dots an IPv4 pattern could partially claim),
    * then IPs, then phones.
    */
  def redact(docs: DataFrame): DataFrame = {
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>")
    docs.select(
      col("doc_id"),
      redacted.as("text_redacted"),
      countMatches(col("text"), EmailRe).as("n_emails"),
      countMatches(col("text"), PhoneRe).as("n_phones"),
      countMatches(col("text"), Ipv4Re).as("n_ips"))
  }

  /** k-anonymity audit over a set of quasi-identifier columns: one row
    * per equivalence class (the distinct quasi-identifier combination)
    * with its population, the re-identification risk 1/n (the
    * prosecutor-model worst case, 6dp), and whether the class violates
    * k-anonymity (n < k). The release-gate companion to [[redact]]:
    * redaction removes DIRECT identifiers; this measures whether the
    * remaining attribute combinations still single people out
    * (Sweeney '02).
    *
    * One hash aggregate keyed on the quasi-identifier tuple — map-side
    * partials shrink each partition to its distinct classes, so the
    * shuffle carries classes, not rows; no window, no driver collect.
    * Returning ALL classes (violations flagged, not filtered) is
    * deliberate: the same scan answers "is this release safe" and "how
    * far from safe is it", and the caller's filter on `violates` is
    * free.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select(quasiCols.map(col) ++ Seq(
        col("n"),
        round(lit(1.0) / col("n"), 6).as("risk"),
        (col("n") < k).as("violates")): _*)
  }

  /** Distinct l-diversity per quasi-identifier class — the companion
    * check [[kAnonymity]] misses: a class can hold k rows yet leak the
    * sensitive attribute completely when all k share one value
    * (homogeneity attack). A class is l-diverse when the sensitive
    * column takes ≥ l distinct non-null values inside it.
    *
    * Scale shape: one exact grouped count-distinct (Spark's two-phase
    * expansion — map-side combine on (quasi…, sensitive), then the
    * class rollup) plus the class row count in the same pass via the
    * expansion; no windows, no driver state. Output: (quasiCols…, n,
    * n_sensitive, violates).
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .select(quasiCols.map(col) ++ Seq(
        col("n"), col("n_sensitive"),
        (col("n_sensitive") < l).as("violates")): _*)
  }
}
