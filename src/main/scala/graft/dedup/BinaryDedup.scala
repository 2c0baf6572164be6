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

  /** INCREMENTAL blob near-dup (corpus refresh — the binary twin of
    * [[TextDedup.dedupLinesIncremental]]): match a NEW batch's chunk sets
    * against a STORED `(id, chash)` chunk relation. The stored BLOBS are
    * never re-read or re-chunked — the chunk relation IS the store, and a
    * refresh appends the survivors' chunks ([[chunkTable]] over the kept
    * blobs) for the next batch.
    *
    * Returns `(newIdCol, store_id, jaccard)` matches at
    * `jaccard >= threshold` — set sizes on the store side come from the
    * store itself (a per-id count aggregate, no blob access). Callers
    * anti-join their batch against the matches for survivors.
    *
    * Scale shape: the store shuffles once per refresh keyed on the 8-byte
    * chunk id (that is the point of incremental — the alternative re-pairs
    * the whole corpus), the new batch is the small probe side, and both
    * count relations are id-sized. */
  def matchesAgainstStore(newDf: DataFrame, idCol: String, binCol: String,
                          storedChunks: DataFrame,
                          threshold: Double,
                          minSize: Int = 256, avgBits: Int = 12,
                          maxSize: Int = 8192): DataFrame = {
    val newChunks = chunkTable(newDf, idCol, binCol, minSize, avgBits, maxSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    newChunks.count() // materialize before its two consumers (see keyJaccardPairs)
    val out = matchChunkTables(newChunks, idCol, storedChunks, threshold)
    graft.core.CacheHygiene.unpersistAfterUse(out, Seq(newChunks))
  }

  /** Chunk-relation-level core of [[matchesAgainstStore]]: both sides are
    * already `(id, chash)` relations (e.g. checkpointed stores).
    * `storeCounts` optionally supplies a maintained `(id, nb)` relation —
    * a refresh loop that appends survivors can keep it incrementally and
    * skip the per-id recount scan entirely; when absent it is derived
    * here (partial aggregation: only (id, count) buffers shuffle). */
  def matchChunkTables(newChunks: DataFrame, idCol: String,
                       storedChunks: DataFrame,
                       threshold: Double,
                       storeCounts: Option[DataFrame] = None): DataFrame = {
    val kc = storedChunks.columns
    val store = storedChunks.select(
      col(kc(0)).as("store_id"), col(kc(1)).as("chash"))
    val newCnt = newChunks.groupBy(col(idCol)).agg(count(lit(1)).as("na"))
    val storeCnt = storeCounts match {
      case Some(c) =>
        val cc = c.columns
        c.select(col(cc(0)).as("store_id"), col(cc(1)).cast("long").as("nb"))
      case None =>
        store.groupBy(col("store_id")).agg(count(lit(1)).as("nb"))
    }
    val shared = newChunks.join(store.hint("shuffle_hash"), "chash")
      .groupBy(col(idCol), col("store_id")).agg(count(lit(1)).as("shared"))
    shared
      .join(newCnt, idCol).join(storeCnt, "store_id")
      .withColumn("jaccard", col("shared").cast("double") /
        (col("na") + col("nb") - col("shared")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col(idCol), col("store_id"), col("jaccard"))
  }

  /** Write the chunk store as a BUCKETED catalog table (bucketBy on the
    * chunk id, sorted within buckets): every future refresh join then
    * reads the store WITHOUT ANY SHUFFLE — not even of its 8-byte keys —
    * because the on-disk bucket layout already satisfies the join's
    * distribution; only the (small) new batch exchanges to the bucket
    * count. At a 100 TB blob corpus the store is the big side by orders
    * of magnitude, so this moves the refresh's shuffle cost from
    * O(corpus) to O(batch). Append refreshes with
    * [[appendToBucketedStore]] (same bucket spec — Spark enforces it). */
  def writeBucketedStore(chunks: DataFrame, table: String,
                         buckets: Int): Unit =
    chunks.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "chash").sortBy("chash")
      .saveAsTable(table)

  /** Append a refresh's survivor chunks into the bucketed store. */
  def appendToBucketedStore(chunks: DataFrame, table: String,
                            buckets: Int): Unit =
    chunks.write.mode("append").format("parquet")
      .bucketBy(buckets, "chash").sortBy("chash")
      .saveAsTable(table)

  /** [[matchesAgainstStore]] against a bucketed store table: identical
    * semantics, store side scan-joins in place. */
  def matchesAgainstBucketedStore(newDf: DataFrame, idCol: String,
                                  binCol: String, storeTable: String,
                                  threshold: Double,
                                  minSize: Int = 256, avgBits: Int = 12,
                                  maxSize: Int = 8192): DataFrame =
    matchesAgainstStore(newDf, idCol, binCol,
      newDf.sparkSession.table(storeTable), threshold,
      minSize, avgBits, maxSize)

  /** New-batch blobs with no stored near-dup (the rows a refresh keeps and
    * whose chunks it appends to the store). Original projection preserved. */
  def dedupAgainstStore(newDf: DataFrame, idCol: String, binCol: String,
                        storedChunks: DataFrame, threshold: Double,
                        minSize: Int = 256, avgBits: Int = 12,
                        maxSize: Int = 8192): DataFrame =
    newDf.join(
        matchesAgainstStore(newDf, idCol, binCol, storedChunks, threshold,
          minSize, avgBits, maxSize).select(col(idCol)).distinct(),
        Seq(idCol), "left_anti")
      .select(newDf.columns.map(col).toIndexedSeq: _*)
}
