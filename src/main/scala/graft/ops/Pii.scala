package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction over a text column — a standard early stage of any
  * LLM training-data pipeline (emails / IP addresses / national-id-shaped
  * tokens are scrubbed before dedup and packing so the redacted form is
  * what everything downstream hashes and ships).
  *
  * Pure codegen'd `regexp_replace` / `regexp_extract_all` projections —
  * no UDF, no shuffle, embarrassingly parallel per input split: exactly
  * the shape that rides along for free in a 100 TB scan. Patterns stick
  * to the regex subset Java and RE2 agree on (character classes, bounded
  * repetition, `\b`, `\d`) so one pattern string serves both the engine
  * and the DuckDB oracle.
  */
object Pii {

  /** Conservative match-what-you're-sure-of patterns; over-matching is
    * worse than under-matching here because redaction destroys signal.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val SsnRe   = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  private def countMatches(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("int")

  /** Replace every email / IPv4 / SSN-shaped token with a typed tag and
    * report per-document match counts (counted on the ORIGINAL text —
    * redaction order can't hide a pattern from its own counter).
    * Email runs first: its local part may contain dots and digits that
    * the later, narrower patterns must not see half-redacted.
    */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "[EMAIL]"),
          Ipv4Re, "[IP]"),
        SsnRe, "[SSN]").as("clean_text"),
      countMatches(t, EmailRe).as("n_emails"),
      countMatches(t, Ipv4Re).as("n_ips"),
      countMatches(t, SsnRe).as("n_ssns"))
  }
}
