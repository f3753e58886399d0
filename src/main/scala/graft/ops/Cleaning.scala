package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Raw-crawl text cleanup — the C4/Dolma normalization stage that runs
  * BEFORE tokenization, dedup or scoring: strip markup, unescape the
  * common entities, drop control characters, collapse whitespace.
  * Same engine contract as [[Pii]]: pure codegen'd
  * `regexp_replace`/`replace` projections restricted to the
  * java.util.regex ∩ RE2 subset — map-only, zero shuffle, stateless,
  * so the identical calls run on a stream.
  *
  * Two cross-engine traps are dodged explicitly:
  *  - `\s` DIFFERS between Java (includes \x0B) and RE2 (does not) —
  *    whitespace is always the explicit class [ \t\n\r\f\x0B].
  *  - The stage order is load-bearing: entities unescape AFTER tag
  *    stripping, so escaped markup ("&lt;b&gt;") stays literal text
  *    instead of becoming a strippable tag.
  *
  * [[normalize]] is a SINGLE-pass decoder (like any entity decoder,
  * applying it twice decodes twice: "&amp;lt;" → "&lt;" → "<");
  * idempotent on entity-free output — both spec-pinned.
  */
object Cleaning {

  /** Entity table, applied in order (amp LAST: "&amp;lt;" must become
    * "&lt;", not "<"). */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** HTML/XML tags → one space (a space, not empty: "a<br>b" are
    * separate words). */
  def stripHtml(text: Column): Column =
    regexp_replace(text, "<[^>]*>", " ")

  /** The six ubiquitous entities, LITERAL replaces in table order
    * (`replace`, not regex — mirrors the oracle's `replace` exactly). */
  def unescapeEntities(text: Column): Column =
    Entities.foldLeft(text) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }

  /** Drop C0 controls + DEL, EXCEPT the whitespace ones
    * (\t\n\x0B\f\r) — those are [[collapseWhitespace]]'s job. */
  def stripControl(text: Column): Column =
    regexp_replace(text, "[\\x00-\\x08\\x0E-\\x1F\\x7F]", "")

  /** Runs of whitespace (explicit class — see the \s trap above) → one
    * space, then trim. */
  def collapseWhitespace(text: Column): Column =
    trim(regexp_replace(text, "[ \\t\\n\\r\\f\\x0B]+", " "))

  /** The full pipeline in contract order. */
  def normalize(text: Column): Column =
    collapseWhitespace(stripControl(unescapeEntities(stripHtml(text))))
}
