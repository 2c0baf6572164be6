package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Text-analysis column functions for training-data pipelines: tokenization,
  * quality scoring, language-ID heuristics, fingerprints. All are built from
  * codegen'd `org.apache.spark.sql.functions` (no UDFs), so they pushdown,
  * prune, and stay inside whole-stage codegen at any scale.
  *
  * Every arithmetic result here is either integer-valued or a SINGLE IEEE
  * operation on exact inputs, so DuckDB-oracle comparisons stay bit-exact.
  */
object TextFunctions {

  /** English stopword core used by the heuristics (deliberately small and
    * frozen: it is part of the operator contract). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Whitespace tokens (the corpus contract is single-space separation;
    * see TESTDATA documents). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** ~4 chars/token BPE-style estimate: ceil(len/4) as long. */
  def bpeTokenEstimate(text: Column): Column =
    ceil(length(text) / lit(4.0)).cast("long")

  /** GPT-2-style pre-tokenizer pattern: contractions, letter runs, digit
    * runs, punctuation runs (each optionally space-prefixed), whitespace. */
  val BpePretokenPattern: String =
    "('s|'t|'re|'ve|'m|'ll|'d| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+)"

  /** BPE-ish pre-tokenization (regex, codegen'd): the token array a byte-
    * pair encoder would merge within. Oracle-gated via token-stream md5
    * (the pattern avoids constructs where Java and RE2 dialects diverge). */
  def bpePretokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePretokenPattern), lit(1))

  def bpePretokenCount(text: Column): Column = size(bpePretokens(text))

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), w => w.isInCollection(Stopwords)))

  /** stopword_count / token_count as double (exact single division). */
  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast("double") / tokenCount(text).cast("double")

  /** Mean token length: (chars - separators) / tokens, exact division. */
  def avgWordLen(text: Column): Column =
    (length(text) - (tokenCount(text) - lit(1))).cast("double") /
      tokenCount(text).cast("double")

  /** Composite quality score in [0,1]:
    * 0.5 * stopword_ratio + 0.5 * min(avg_word_len / 8, 1). */
  def qualityScore(text: Column): Column =
    lit(0.5) * stopwordRatio(text) +
      lit(0.5) * least(avgWordLen(text) / lit(8.0), lit(1.0))

  /** Stopword-ratio language-ID heuristic: 'en' iff ratio >= 0.05. */
  def langId(text: Column): Column =
    when(stopwordRatio(text) >= 0.05, lit("en")).otherwise(lit("und"))

  /** Content fingerprint (hex md5 — identical in Spark and DuckDB). */
  def fingerprintMd5(text: Column): Column = md5(text.cast("binary"))

  /** Distinct word n-gram shingles of a document, in order of first
    * occurrence. Documents shorter than n words shingle to []; null text
    * also shingles to [] (the behavior of the original size/when
    * formulation). Both variants are one codegen'd kernel call
    * ([[graft.functions.WordShingles]]) sharing a single shingle
    * definition — the former per-element slice/concat_ws lambda chain
    * re-derived the token array per shingle (~30 s CPU at sf0.1, the
    * dominant cost of every shingle-consuming gate). */
  def wordShingles(text: Column, n: Int): Column =
    coalesce(graft.functions.word_shingles(text, n),
      array().cast(ArrayType(StringType)))

  /** All word n-gram occurrences WITH multiplicity (unlike [[wordShingles]],
    * which is the distinct set) — the adjacent-pair frequency input of a
    * BPE merge step, where a pair's count across the corpus decides the
    * next merge. */
  def wordShinglesAll(text: Column, n: Int): Column =
    coalesce(graft.functions.word_shingles_all(text, n),
      array().cast(ArrayType(StringType)))

  // ------------------------------------------- repetition (Gopher/C4 class)

  /** Newline-split lines (empty lines kept — both engines agree). */
  def lines(text: Column): Column = split(text, "\n")

  def lineCount(text: Column): Column = size(lines(text))

  /** Lines minus distinct lines: how many lines are repeats of an earlier
    * line — the numerator of the duplicate-line-fraction repetition filter. */
  def dupLineCount(text: Column): Column =
    size(lines(text)) - size(array_distinct(lines(text)))

  /** Duplicate-line fraction (0 for single-line docs): ints + one division,
    * FP-exact for the oracle. */
  def dupLineFrac(text: Column): Column =
    dupLineCount(text).cast("double") / lineCount(text).cast("double")

  // ---------------------------------------------------- PII redaction

  /** Redaction patterns, applied in this order. Deliberately alternation-
    * free and backreference-free so Java regex (Spark) and RE2 (DuckDB)
    * agree on every match: character classes + greedy bounded quantifiers
    * have identical leftmost semantics in both engines. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** PII-scrubbed text: emails, then IPv4 literals, then NNN-NNN-NNNN
    * phone numbers replaced with typed placeholder tokens. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** How many spans `redactPii` would replace (emails counted before the
    * other patterns can see their digits — same order as the rewrite). */
  def piiCount(text: Column): Column = {
    val afterEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Pattern, "<IP>")
    regexp_count(text, lit(EmailPattern)) +
      regexp_count(afterEmail, lit(Ipv4Pattern)) +
      regexp_count(afterIp, lit(PhonePattern))
  }

  /** 16-digit payment-card shapes with optional `-`/space group separators
    * (alternation-free — Java regex and RE2 agree match-for-match, the
    * redaction-pattern contract above). */
  val CcPattern = "\\b\\d{4}[- ]?\\d{4}[- ]?\\d{4}[- ]?\\d{4}\\b"

  /** Luhn checksum validity of the digits in `s` (separators stripped) —
    * pure built-in HOF arithmetic (`aggregate` over `sequence`), so the
    * check replays exactly in SQL: digit at 0-based position p from the
    * RIGHT doubles when p is odd, doubled values > 9 subtract 9, the sum
    * must be ≡ 0 (mod 10). */
  def luhnValid(s: Column): Column = {
    val digits = regexp_replace(s, "[- ]", "")
    val n = length(digits)
    val total = aggregate(
      sequence(lit(1), n),
      lit(0),
      (acc: Column, i: Column) => {
        val d = ascii(digits.substr(i, lit(1))) - 48
        val doubled = when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
        acc + when((n - i) % 2 === 1, doubled).otherwise(d)
      })
    total % 10 === 0
  }

  /** Count of LUHN-VERIFIED card numbers in `text` — the detection signal
    * a curation policy thresholds on. Pattern-only counting flags every
    * 16-digit id (order numbers, hashes-as-digits); the checksum filters
    * those false positives exactly. */
  def ccCount(text: Column): Column =
    size(filter(regexp_extract_all(text, lit(CcPattern), lit(0)),
      s => luhnValid(s)))

  /** Conservative card redaction: every pattern match is rewritten (a
    * non-Luhn 16-digit id over-redacts — the safe direction for
    * training-data scrubbing; [[ccCount]] stays the exact signal). */
  def redactCc(text: Column): Column =
    regexp_replace(text, CcPattern, "<CARD>")
}
