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

  /** t-closeness audit [Li, Li, Venkatasubramanian, ICDE'07] — the
    * attack [[lDiversity]] misses: a class can hold l distinct
    * sensitive values yet still leak when its DISTRIBUTION over them
    * diverges from the table's (a class that is 95% "cancer" in a
    * table that is 5% "cancer" reveals plenty). Reports, per
    * quasi-identifier class, the total-variation distance between the
    * class's sensitive-value distribution and the global one —
    * TVD = ½ Σ_v |p_class(v) − p_global(v)| (the categorical EMD the
    * paper uses for nominal attributes) — and flags classes above `t`.
    *
    * Exactness: both distributions are ratios of integer counts, so
    * each |…| term is ONE pinned double expression |c_vc·N − c_v·n_c| /
    * (n_c·N) on exact integer cross-products (the
    * [[graft.operators.Stats.ksDrift]] comparison trick), 6dp-rounded
    * AFTER the decimal term sum — partition-order invariant, oracle-
    * replayable. Scale shape: one grouped count per (class, value), one
    * per value, one per class, a values-sized broadcast join — classes
    * × values rows total, never corpus-shaped pairs. Absent values
    * contribute p_global(v)/2 each; the closed form keeps them OUT of
    * the join: Σ_{v absent} p_g(v) = 1 − Σ_{v present} p_g(v) (the
    * [[graft.operators.TextAnalysis.vocabDrift]] absent-term identity).
    * Output: (quasi cols…, n, tvd 6dp, violates).
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, t: Double): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(t > 0 && t < 1, s"t must be in (0,1), got $t")
    val qc = quasiCols.map(col)
    val rows = df.filter(col(sensitiveCol).isNotNull)
    val byCv = rows.groupBy(qc :+ col(sensitiveCol).as("__v"): _*)
      .agg(count(lit(1)).as("__cvc"))
    val byV = rows.groupBy(col(sensitiveCol).as("__v"))
      .agg(count(lit(1)).as("__cv"))
    val byC = rows.groupBy(qc: _*).agg(count(lit(1)).as("n"))
    val totals = rows.agg(count(lit(1)).as("__nn"))
    // per-(class, value) |p_c − p_g| term: exact decimal(38,0) integer
    // cross-products meet ONE double division, 9dp-quantized before the
    // decimal term sum (the chiSquare chi_term discipline)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val present = byCv.join(broadcast(byV), "__v")
      .join(byC, quasiCols)
      .crossJoin(broadcast(totals))
      .withColumn("__term",
        round(abs(dec(col("__cvc")) * dec(col("__nn"))
            - dec(col("__cv")) * dec(col("n"))).cast("double")
          / (col("n").cast("double") * col("__nn").cast("double")), 9)
          .cast("decimal(19,9)"))
      // Σ_{v present} p_g(v), same quantized-decimal discipline, so the
      // absent-mass closed form below replays engine-for-engine
      .withColumn("__pg",
        round(col("__cv").cast("double") / col("__nn"), 9)
          .cast("decimal(19,9)"))
    present.groupBy(qc :+ col("n"): _*)
      .agg(sum(col("__term")).as("__s"),
        sum(col("__pg")).as("__pgs"))
      .select(qc ++ Seq(col("n"),
        round((col("__s").cast("double")
          + (lit(1.0) - col("__pgs").cast("double"))) / 2.0, 6).as("tvd")): _*)
      .withColumn("violates", col("tvd") > t)
  }
}
