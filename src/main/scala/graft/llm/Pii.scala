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
    * by '-' or ' '. Boundaries on BOTH sides: the trailing `\b` stops a
    * 5-digit tail from half-matching, and the leading `\b` stops the
    * match from starting mid-digit-run ('1234567-890-1234' must not
    * redact its tail). `\b` cannot fire between ' ' and '+' (both
    * non-word), so on a '+'-prefixed number `\+?` matches empty and the
    * match anchors at the first digit — the '+' survives redaction, a
    * cosmetic residue both engines reproduce identically.
    *
    * KNOWN TRADEOFF of the leading `\b` inside the Java∩RE2 dialect
    * (no lookbehind): a number glued to a preceding LETTER
    * ('tel555-123-4567') has no word boundary before its first digit
    * and is not matched. Blocking the mid-digit-run false positive was
    * judged worth that rare under-redaction; a `(?<![0-9-])` lookbehind
    * would thread the needle but RE2 — the oracle's engine — has none. */
  val PhoneRe = "\\b\\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b"

  /** International phone: '+' country code (1–3 digits), a separator,
    * then 7–13 digits with '-'/' ' group separators, ending on a digit
    * at a word boundary. The trailing `[0-9]\b` keeps the greedy body
    * from eating into a following word ('… 0958 5pm' backtracks to the
    * number); a lone digit one space after a number is still absorbed —
    * the over-redaction side every published scrubber accepts. */
  val IntlPhoneRe = "\\+[0-9]{1,3}[- ][0-9][0-9 -]{5,11}[0-9]\\b"

  /** US SSN, strict 3-2-4 hyphenated form. Disjoint from both phone
    * shapes (3-3-4), so chain order does not matter between them. */
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** IBAN: 2 uppercase country letters, 2 check digits, 11–30 BBAN
    * alphanumerics (15-char minimum = the shortest real IBAN, Norway).
    * `\b` guards keep it off the tail of longer alphanumeric runs. */
  val IbanRe = "\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\\b"

  private def countMatches(text: Column, re: String): Column =
    F.size(F.call_function("regexp_extract_all", text, F.lit(re), F.lit(0)))

  def emailCount(text: Column): Column = countMatches(text, EmailRe)
  def ipCount(text: Column): Column = countMatches(text, Ipv4Re)
  def phoneCount(text: Column): Column = countMatches(text, PhoneRe)
  def intlPhoneCount(text: Column): Column = countMatches(text, IntlPhoneRe)
  def ssnCount(text: Column): Column = countMatches(text, SsnRe)
  def ibanCount(text: Column): Column = countMatches(text, IbanRe)

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

  /** Widened redaction chain: emails, then phones (international form
    * FIRST so a '+'-code number is taken whole before the NANP pass
    * could take its 3-3-4 tail), then SSNs, IBANs, IPs. Same ordered-
    * chain contract as [[redact]]; the q183 oracle replays the chain
    * step for step. Placeholders contain no digits or uppercase
    * letter+digit runs, so the chain is idempotent by construction. */
  def redactAll(text: Column): Column =
    F.regexp_replace(
      F.regexp_replace(
        F.regexp_replace(
          F.regexp_replace(
            F.regexp_replace(
              F.regexp_replace(text, EmailRe, "<EMAIL>"),
              IntlPhoneRe, "<PHONE>"),
            PhoneRe, "<PHONE>"),
          SsnRe, "<SSN>"),
        IbanRe, "<IBAN>"),
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

  /** [[scrub]] over the widened pattern set — counts for every type in
    * the [[redactAll]] chain. Each count is taken on the text AS THAT
    * STAGE SEES IT (after the earlier stages' replacements), so a US
    * number written with its country code counts ONCE as international
    * instead of once per overlapping pattern, and Σcounts equals the
    * number of placeholders actually inserted. Still one map-only
    * projection: the staged strings are shared subexpressions of the
    * same codegen stage. */
  def scrubAll(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val t1 = F.regexp_replace(textCol, EmailRe, "<EMAIL>")
    val t2 = F.regexp_replace(t1, IntlPhoneRe, "<PHONE>")
    val t3 = F.regexp_replace(t2, PhoneRe, "<PHONE>")
    val t4 = F.regexp_replace(t3, SsnRe, "<SSN>")
    val t5 = F.regexp_replace(t4, IbanRe, "<IBAN>")
    val t6 = F.regexp_replace(t5, Ipv4Re, "<IP>")
    df.select(
      idCol.as("doc_id"),
      emailCount(textCol).as("n_email"),
      intlPhoneCount(t1).as("n_phone_intl"),
      phoneCount(t2).as("n_phone"),
      ssnCount(t3).as("n_ssn"),
      ibanCount(t4).as("n_iban"),
      ipCount(t5).as("n_ip"),
      t6.as("text_redacted"))
      .withColumn("has_pii",
        F.col("n_email") + F.col("n_phone_intl") + F.col("n_phone") +
          F.col("n_ssn") + F.col("n_iban") + F.col("n_ip") > 0)
  }
}
