package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binary-blob near-duplicate detection via content-defined chunking
  * ([[graft.functions.CdcChunks]]) — the file/blob lane of the dedup
  * family: blobs are cut at content-determined boundaries (so an inserted
  * prefix only perturbs one chunk and every later boundary re-syncs),
  * each chunk becomes an 8-byte id, and near-duplicates are pairs whose
  * distinct chunk SETS overlap above a Jaccard threshold — mined by the
  * same shared-key engine as the text n-gram form
  * ([[TextDedup.keyJaccardPairs]]).
  *
  * Scale shape: the chunking is a scan-local kernel (blob bytes never
  * leave the scan — only chunk ids flow), per-blob set dedup is
  * `array_distinct` inside the scan (no extra shuffle), and the pair join
  * shuffles 16-byte rows. A ubiquitous chunk (an all-zeros block, a
  * shared file header) is the hot-key hazard; cap it with
  * `maxChunkDocFreq` exactly as shingle dedup caps stop-phrases. */
object BinaryDedup {

  /** Distinct (idCol, chash) chunk relation of a binary column. */
  def chunkTable(df: DataFrame, idCol: String, binCol: String,
                 minSize: Int = 256, avgBits: Int = 12,
                 maxSize: Int = 8192): DataFrame =
    df.select(col(idCol),
      explode(array_distinct(graft.functions.cdc_chunks(
        col(binCol), minSize, avgBits, maxSize))).as("chash"))

  /** Near-duplicate blob pairs `(ida, idb, jaccard)` with
    * `jaccard >= threshold` over distinct chunk sets. */
  def nearDupPairs(df: DataFrame, idCol: String, binCol: String,
                   threshold: Double,
                   minSize: Int = 256, avgBits: Int = 12,
                   maxSize: Int = 8192,
                   maxChunkDocFreq: Option[Int] = None): DataFrame =
    TextDedup.keyJaccardPairs(
      chunkTable(df, idCol, binCol, minSize, avgBits, maxSize),
      idCol, "chash", threshold, maxChunkDocFreq)
}
