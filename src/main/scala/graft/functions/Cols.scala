package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column helpers shared across operators.
  *
  * Float discipline: any double that crosses the correctness oracle is
  * discretized with `fixed` — floor(x * scale + 0.5) as BIGINT — instead
  * of engine `round()`. Spark's `round` re-interprets doubles through
  * their shortest decimal string (BigDecimal.valueOf) while DuckDB rounds
  * the binary value, so the two disagree on exact-looking halves like
  * 2.675. Pure floor/multiply arithmetic is bit-identical across engines
  * given the same input double.
  */
object Cols {
  /** floor(c * scale + 0.5) as long — cross-engine-stable fixed-point. */
  def fixed(c: Column, scale: Long): Column =
    floor(c * lit(scale.toDouble) + lit(0.5)).cast("long")

  /** Money in cents (2 implied decimals). */
  def cents(c: Column): Column = fixed(c, 100L)

  /** 4-decimal fixed point (ratios, similarities). */
  def bp(c: Column): Column = fixed(c, 10000L)

  /** Event-time as exact integer microseconds (cross-engine-safe). */
  def micros(c: Column): Column = unix_micros(c)

  /** SQL fragment mirrors for DuckDB oracles. */
  def sqlFixed(expr: String, scale: Long): String =
    s"CAST(floor(($expr) * $scale + 0.5) AS BIGINT)"
  def sqlCents(expr: String): String = sqlFixed(expr, 100L)
  def sqlBp(expr: String): String    = sqlFixed(expr, 10000L)

  /** Codepoint class of the space-FREE scripts (Han ideographs, kana,
    * Thai — scripts written without word separators; Korean keeps its
    * native spaces and stays on whitespace tokenization). Java regex
    * syntax; the RE2 mirror for DuckDB oracles is [[SegScriptSql]]. */
  val SegScript = "[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsThai}]"
  /** RE2 spelling of [[SegScript]] for DuckDB oracle SQL. */
  val SegScriptSql = "[\\p{Han}\\p{Hiragana}\\p{Katakana}\\p{Thai}]"

  /** THE shared tokenizer: whitespace split, with a codepoint-class
    * segmentation fallback for space-free scripts — each Han/kana/Thai
    * codepoint becomes its own token (the standard character-level
    * convention for unsegmented text; a CJK document would otherwise
    * collapse into one giant "token" and silently gut token stats,
    * TF-IDF, dedup shingles and surprisal for those languages).
    *
    * The fallback is CONDITIONAL on the document containing such a
    * codepoint, probed in TWO stages so the common case stays cheap:
    * a plain char-RANGE regex first (any non-ASCII at all — near
    * memchr speed; script codepoints are never ASCII), and only then
    * the Unicode-script class (whose per-char property lookups cost
    * real time — a single-stage script rlike measured ~2× on
    * tokenize-bound operators at sf0.1). The And short-circuits in
    * codegen, so pure-ASCII corpora pay one cheap scan per document
    * and tokenize byte-identically to a plain space split — no
    * behavior change for corpora without these scripts. When the
    * fallback fires, each script codepoint is space-padded and runs
    * of spaces collapse to one (whitespace in such documents is
    * normalized by construction). Map-side, no UDF.
    *
    * Oracle contract: the segmentation is DuckDB-mirrorable (RE2
    * script classes — q169's oracle mirrors it verbatim, one-stage
    * test, same predicate value). The PRE-EXISTING text-operator
    * oracles pin the whitespace branch with a plain string_split —
    * exact for any corpus without space-free-script codepoints (the
    * driver corpus is pure ASCII, asserted in spec); verifying those
    * operators on a CJK-bearing corpus requires swapping their
    * oracles' string_split for q169's segmentation CTE. */
  def tokens(text: Column): Column = {
    val padded = regexp_replace(text, s"(${SegScript})", " $1 ")
    val seg = trim(regexp_replace(padded, " {2,}", " "))
    split(when(text.rlike("[^\\x00-\\x7f]") && text.rlike(SegScript), seg)
      .otherwise(text), " ")
  }
}
