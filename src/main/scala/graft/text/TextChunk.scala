package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the context-window layout step for
  * retrieval corpora and long-document training: each document becomes
  * ⌈(n − overlap) / stride⌉ windows of `size` tokens starting every
  * `stride = size − overlap` tokens (the last window may be short; every
  * non-empty document yields at least one chunk).
  *
  * Entirely built-in codegen expressions (split/sequence/transform/slice/
  * explode) — a scan-local projection with zero shuffle at any corpus
  * scale, and exactly replayable in SQL (integer arithmetic only: the
  * chunk-count ceiling is integer division, not an FP ceil, so engines
  * that round casts differently still agree). */
object TextChunk {

  /** `(idCol, chunk_idx, n_tokens, chunk_text)` — whitespace-token
    * windows. `overlap` tokens of each window repeat from the previous
    * one. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    size: Int, overlap: Int): DataFrame = {
    require(size > 0, s"chunkByTokens: size must be positive, got $size")
    require(overlap >= 0 && overlap < size,
      s"chunkByTokens: need 0 <= overlap < size, got $overlap/$size")
    val stride = size - overlap
    val toks = split(col(textCol), " ")
    val n = org.apache.spark.sql.functions.size(toks)
    // chunk count: max(1, ceil((n - overlap) / stride)), computed as
    // floor((n - overlap + stride - 1) / stride) — floor() of the double
    // division in BOTH engines (a bare double->int cast would truncate in
    // Spark but round in DuckDB)
    val nChunks = greatest(lit(1),
      floor((n - lit(overlap) + lit(stride - 1)) / lit(stride)).cast("long"))
    df.select(col(idCol), toks.as("__t"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        org.apache.spark.sql.functions.size(
          slice(col("__t"), (col("chunk_idx") * stride + 1).cast("int"), lit(size)))
          .as("n_tokens"),
        array_join(
          slice(col("__t"), (col("chunk_idx") * stride + 1).cast("int"), lit(size)),
          " ").as("chunk_text"))
  }
}
