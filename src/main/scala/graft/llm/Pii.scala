package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** PII detection and redaction for training-data curation — the scrub
  * pass every LLM corpus runs before tokenization (emails, phone
  * numbers, IP addresses replaced by typed placeholder tokens, a la
  * the C4/Dolma/FineWeb pipelines).
  *
  * Everything is a row-local codegen'd Column expression over the
  * built-in regexp functions — no UDFs, no shuffles: at 100 TB this is
  * a map-only scan that fuses into whatever projection/filter the
  * curation plan already does. Patterns deliberately use only the
  * regex-dialect intersection of Java (`java.util.regex`, Spark's
  * engine) and RE2 (DuckDB's), so the DuckDB oracle replays the exact
  * same matches: no lookaround, no possessive quantifiers, ASCII
  * classes and `\b` only.
  */
object Pii {

  /** RFC-5322-ish practical email matcher (the common-case form every
    * published scrubber uses; exotic quoted local-parts are out of
    * scope on purpose — over-matching text is worse than missing a
    * degenerate address). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4. `\b` guards stop partial matches inside longer
    * digit runs; range validation (≤255 per octet) is intentionally
    * omitted — scrubbing 999.0.0.1 is harmless, and the simpler
    * pattern stays engine-portable. */
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** NANP-style phone: optional +, then 3-3-4 digit groups separated
    * by '-' or ' '. The trailing `\b` stops a 5-digit tail from
    * half-matching. */
  val PhoneRe = "\\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b"

  private def countMatches(text: Column, re: String): Column =
    F.size(F.call_function("regexp_extract_all", text, F.lit(re), F.lit(0)))

  def emailCount(text: Column): Column = countMatches(text, EmailRe)
  def ipCount(text: Column): Column = countMatches(text, Ipv4Re)
  def phoneCount(text: Column): Column = countMatches(text, PhoneRe)

  /** Redacted text: each PII hit replaced by its typed placeholder.
    * Order matters and is part of the contract — emails first (an
    * address can embed digit runs a later pass might chew on), then
    * phones, then IPs; the oracle replays the same order. */
  def redact(text: Column): Column =
    F.regexp_replace(
      F.regexp_replace(
        F.regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Per-document scrub frame: hit counts by type, a `has_pii` gate
    * flag, and the redacted text. One map-only projection. */
  def scrub(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.select(
      idCol.as("doc_id"),
      emailCount(textCol).as("n_email"),
      phoneCount(textCol).as("n_phone"),
      ipCount(textCol).as("n_ip"),
      redact(textCol).as("text_redacted"))
      .withColumn("has_pii",
        F.col("n_email") + F.col("n_phone") + F.col("n_ip") > 0)
}
