package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.dedup.TextDedup

/** Streaming incremental line dedup — the corpus-refresh loop of
  * [[TextDedup.dedupLinesIncremental]] wired into Structured Streaming
  * ([[SpatialIngest]] is the template): every microbatch of new documents
  * line-dedups against the ACCUMULATED 128-bit line-key store plus itself,
  * survivors append to the output corpus, and exactly the survivors' line
  * keys append to the key store for the next batch.
  *
  * The operator keeps the incremental contract end-to-end: the stored
  * CORPUS is never re-read — only its 16-byte-per-distinct-line key
  * relation cycles through the loop, so a refresh over a 100 TB corpus
  * reads the new batch plus a key table orders of magnitude smaller. A
  * surviving line's key can never be re-appended (its next occurrence
  * loses to the store), so the key table stays distinct without a
  * compaction pass.
  *
  * Exactly-once caveat: foreachBatch gives at-least-once side effects — a
  * microbatch REPLAYED after a crash would double-append. Production runs
  * point `outPath`/`keyPath` at a transactional table (or write per-batchId
  * subdirs and reconcile); the streaming-lifecycle gate and spec run
  * crash-free loops where append is exact.
  */
object DedupIngest {

  val KeySchema: StructType = StructType(Seq(
    StructField("lkey", LongType), StructField("lkey2", LongType)))

  /** The accumulated key store, or an empty 2-column relation before the
    * first batch lands (Hadoop FS probe, so object stores work). */
  def loadKeys(spark: SparkSession, keyPath: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(keyPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty)
      spark.read.schema(KeySchema).parquet(keyPath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], KeySchema)
  }

  /** One refresh step — also the batch twin the spec pins the stream
    * against. Persisted across its two consumers (corpus append + key
    * append), then released. */
  def processBatch(batch: DataFrame, idCol: String, textCol: String,
                   outPath: String, keyPath: String): Unit = {
    val out = TextDedup.dedupLinesIncremental(batch, idCol, textCol,
        loadKeys(batch.sparkSession, keyPath))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      out.write.mode("append").parquet(outPath)
      TextDedup.lineKeys(out, textCol).write.mode("append").parquet(keyPath)
    } finally out.unpersist(false)
  }

  /** Start the foreachBatch refresh loop over a document stream. */
  def start(stream: DataFrame, idCol: String, textCol: String,
            outPath: String, keyPath: String,
            checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        processBatch(batch.toDF(), idCol, textCol, outPath, keyPath)
      }
      .start()
}
