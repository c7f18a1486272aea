package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PII redaction: scrub e-mail addresses and phone numbers from document
 * text and report per-document match counts. A standard pre-training
 * hygiene pass (the reference engine has no such operator — extension).
 *
 * 100 TB shape: a pure per-row projection — no shuffle, no state; Spark's
 * `RegExpReplace`/`RegExpCount` are codegen'd, so the whole pass stays
 * inside one WholeStageCodegen over the scan. The patterns are kept to
 * syntax valid in BOTH Java regex and RE2 (no backreferences, no
 * lookaround) so the DuckDB oracle runs the identical pattern text.
 */
object Redaction {

  /** RFC-ish e-mail matcher (ASCII local/domain, 2+ letter TLD). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dashed phone numbers with optional country code: `+1-555-0123`,
    * `44-555-0123`. Deliberately conservative — a corpus-specific deploy
    * would extend the pattern set, not the mechanism. */
  val PhonePattern = "\\+?\\d{1,3}-\\d{3}-\\d{4}"

  /** k-anonymity audit over quasi-identifier columns — the
    * re-identification risk check run before releasing (or training on)
    * structured/metadata columns: any combination of quasi-identifier
    * values shared by FEWER than `k` rows singles its members out.
    * Emits one row per at-risk group — the quasi-id values plus its
    * size `n` (< k) — ordered by the quasi-ids (NULLS FIRST on every
    * key, pinned cross-engine; NULL quasi-id values group together, the
    * SQL GROUP BY convention both engines share). An empty result IS
    * the pass condition.
    *
    * 100 TB shape: one partial→final hash aggregate on the
    * quasi-identifier key — the shuffle carries distinct value
    * combinations, not rows; the `n < k` filter prunes before the
    * (tiny) result sorts. */
  def kAnonymityAudit(df: DataFrame, quasiIds: Seq[String],
      k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "kAnonymityAudit needs at least one column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
      .orderBy(quasiIds.map(c => col(c).asc_nulls_first): _*)
  }

  /** Per-document redaction: `(doc_id, n_emails, n_phones, clean)` where
    * `clean` is `text` with e-mails replaced by `<EMAIL>` (first, so a
    * digit-bearing local part can never half-match the phone pattern
    * afterwards) and phones by `<PHONE>`. Counts are of the ORIGINAL
    * text. Rows with no PII pass through with counts 0 and `clean`
    * byte-identical to the input. */
  def redactPii(docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    docs.select(
      idCol.as("doc_id"),
      regexp_count(textCol, lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(textCol, lit(PhonePattern)).cast("long").as("n_phones"),
      regexp_replace(regexp_replace(textCol, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>").as("clean"))
}
