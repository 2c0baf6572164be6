package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.dedup.BinaryDedup

/** Streaming incremental BLOB dedup — the binary twin of [[DedupIngest]]:
  * every microbatch of new blobs CDC-chunks once and probes the
  * accumulated chunk-relation store ([[BinaryDedup.dedupAgainstStore]]);
  * near-dup-free survivors append to the output corpus and exactly their
  * chunks append to the store for the next batch. Stored blobs are never
  * re-read — only the (id, chash) relation cycles, so a refresh over a
  * 100 TB blob corpus reads the new batch plus an 8-bytes-per-chunk
  * store.
  *
  * Batch-internal twins: survivors are additionally pair-mined within the
  * batch ([[BinaryDedup.nearDupPairs]]) and any blob with a near-dup of
  * SMALLER id drops (keep-first greedy — the same rule the incremental
  * line dedup applies within a batch); without this, two copies arriving
  * in ONE microbatch would both pass the store check. For full
  * transitive-cluster collapse compose [[graft.dedup.Components]]
  * downstream instead.
  *
  * Same at-least-once caveat as [[DedupIngest]] (foreachBatch replay
  * double-appends); production points the paths at transactional
  * tables. */
object BlobIngest {

  def keySchema(idField: StructField): StructType =
    StructType(Seq(idField, StructField("chash", LongType)))

  /** The accumulated chunk store, or an empty relation before the first
    * batch lands. */
  def loadChunks(spark: SparkSession, chunkPath: String,
                 idField: StructField): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(chunkPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty)
      spark.read.schema(keySchema(idField)).parquet(chunkPath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], keySchema(idField))
  }

  /** One refresh step — also the batch twin the spec pins the stream
    * against. */
  def processBatch(batch: DataFrame, idCol: String, binCol: String,
                   outPath: String, chunkPath: String,
                   threshold: Double,
                   minSize: Int = 256, avgBits: Int = 12,
                   maxSize: Int = 8192): Unit = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    val idField = batch.schema(idCol)
    val store = loadChunks(spark, chunkPath, idField)
    // stage 1: drop batch blobs near-dup to the STORE
    val vsStore = BinaryDedup.dedupAgainstStore(
      batch, idCol, binCol, store, threshold, minSize, avgBits, maxSize)
    // stage 2: batch-internal dedup — keep-first greedy (drop any blob
    // with a smaller-id near-dup in the same batch)
    val pairs = BinaryDedup.nearDupPairs(vsStore, idCol, binCol, threshold,
      minSize, avgBits, maxSize)
    val losers = pairs.select(col("idb").as(idCol)).distinct()
    val out = vsStore.join(losers, Seq(idCol), "left_anti")
      .select(batch.columns.map(col).toIndexedSeq: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      out.write.mode("append").parquet(outPath)
      BinaryDedup.chunkTable(out, idCol, binCol, minSize, avgBits, maxSize)
        .write.mode("append").parquet(chunkPath)
    } finally out.unpersist(false)
  }

  /** Start the foreachBatch refresh loop over a blob stream. */
  def start(stream: DataFrame, idCol: String, binCol: String,
            outPath: String, chunkPath: String, checkpoint: String,
            threshold: Double,
            minSize: Int = 256, avgBits: Int = 12,
            maxSize: Int = 8192): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        processBatch(batch.toDF(), idCol, binCol, outPath, chunkPath,
          threshold, minSize, avgBits, maxSize)
      }
      .start()
}
