package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping window chunking — the context-window layout step for
  * retrieval corpora and long-document training: each document becomes
  * ⌈(n − overlap) / stride⌉ windows of `size` units starting every
  * `stride = size − overlap` units (the last window may be short; every
  * non-empty document yields at least one chunk). Units are whitespace
  * tokens ([[chunkByTokens]]) or pinned-boundary sentences
  * ([[chunkBySentences]]).
  *
  * Entirely built-in codegen expressions (split/sequence/transform/slice/
  * explode) — a scan-local projection with zero shuffle at any corpus
  * scale, and exactly replayable in SQL (integer arithmetic only: the
  * chunk-count ceiling is integer division, not an FP ceil, so engines
  * that round casts differently still agree). */
object TextChunk {

  /** One overlapped-window pass over a pre-split unit array; both public
    * chunkers differ only in the split rule and the count column name. */
  private def windowed(df: DataFrame, idCol: String, units: Column,
                       size: Int, overlap: Int, nName: String): DataFrame = {
    require(size > 0, s"TextChunk: size must be positive, got $size")
    require(overlap >= 0 && overlap < size,
      s"TextChunk: need 0 <= overlap < size, got $overlap/$size")
    val stride = size - overlap
    val n = org.apache.spark.sql.functions.size(units)
    // chunk count: max(1, ceil((n - overlap) / stride)), computed as
    // floor((n - overlap + stride - 1) / stride) — floor() of the double
    // division in BOTH engines (a bare double->int cast would truncate in
    // Spark but round in DuckDB)
    val nChunks = greatest(lit(1),
      floor((n - lit(overlap) + lit(stride - 1)) / lit(stride)).cast("long"))
    val win = slice(col("__t"),
      (col("chunk_idx") * stride + 1).cast("int"), lit(size))
    df.select(col(idCol), units.as("__t"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        org.apache.spark.sql.functions.size(win).as(nName),
        array_join(win, " ").as("chunk_text"))
  }

  /** `(idCol, chunk_idx, n_tokens, chunk_text)` — whitespace-token
    * windows. `overlap` tokens of each window repeat from the previous
    * one. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    size: Int, overlap: Int): DataFrame =
    windowed(df, idCol, split(col(textCol), " "), size, overlap, "n_tokens")

  /** `(idCol, chunk_idx, n_sentences, chunk_text)` — sentence windows
    * for RAG layouts where a chunk must not cut mid-sentence.
    *
    * Pinned boundary rule: terminal punctuation `[.!?]` followed by
    * whitespace ends a sentence (the punctuation stays with its
    * sentence; the boundary whitespace is consumed). The whitespace
    * class is the explicit `[ \t\n\f\r]` — Java's `\s` additionally
    * matches vertical tab where RE2's (the oracle's engine) does not,
    * so the shorthand would silently diverge. Because RE2 has no
    * lookbehind, the rule is expressed as replace-then-split in both
    * engines — boundary -> a U+0001 marker → split — rather than a
    * lookbehind split. Chunks re-join with single spaces. */
  def chunkBySentences(df: DataFrame, idCol: String, textCol: String,
                       size: Int, overlap: Int): DataFrame =
    windowed(df, idCol,
      split(regexp_replace(col(textCol), "([.!?])[ \\t\\n\\f\\r]+", "$1\u0001"), "\u0001"),
      size, overlap, "n_sentences")
}
