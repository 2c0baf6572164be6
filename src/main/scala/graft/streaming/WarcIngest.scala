package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.sources.WarcSource
import graft.text.{Robots, UrlCurate}

/** Streaming crawl ingestion — the Structured Streaming twin of the
  * batch crawl front door (WARC → URL canonicalize/dedup → HTML strip,
  * the q_crawl_e2e composition).
  *
  * The input stream is a MANIFEST stream: each streamed line names one
  * newly landed `.warc`/`.warc.gz` file (the standard crawl-drop
  * pattern — a text file listing the drop's members). The WARC bytes
  * themselves never enter a streaming source, so gigabyte crawl files
  * don't constrain microbatch memory; each batch collects only its new
  * PATHS (bounded), then streams those files record-by-record through
  * [[WarcSource.readFiles]].
  *
  * Per microbatch: parse response records, canonicalize + dedup URLs
  * within the batch (survivor = lexicographically-first (raw URL, body
  * hash) per canonical — a deterministic TOTAL order that needs no
  * global id and stays stable when one page is crawled twice per drop),
  * drop pages whose canonical URL the accumulated seen-store already
  * holds, strip the survivors' HTML, append their text to the corpus
  * and exactly their canonical keys to the store. Stored pages are
  * never re-read — only the canon-key relation cycles, so a refresh
  * over a 100 TB crawl reads the new drop plus a key-sized store.
  *
  * Same at-least-once caveat as [[DedupIngest]]/[[BlobIngest]]
  * (foreachBatch replay double-appends); production points the paths at
  * transactional tables. */
object WarcIngest {

  val seenSchema: StructType =
    StructType(Seq(StructField("url_canon", StringType)))

  /** The accumulated canonical-URL store, or an empty relation before
    * the first batch lands. */
  def loadSeen(spark: SparkSession, seenPath: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(seenPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty)
      spark.read.schema(seenSchema).parquet(seenPath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], seenSchema)
  }

  /** One ingest step over a batch of WARC file paths — also the batch
    * twin the spec pins the stream against. Output rows:
    * (url, url_canon, text). */
  def processBatch(spark: SparkSession, warcPaths: Seq[String],
                   outPath: String, seenPath: String,
                   lenient: Boolean = true,
                   robotsRules: Option[DataFrame] = None): Unit = {
    if (warcPaths.isEmpty) return
    val pages = WarcSource.readFiles(spark, warcPaths, lenient).toDF()
      .where(col("record_type") === "response" && col("http_status") === 200)
      .select(col("target_uri").as("url"),
        col("body").cast("string").as("html"))
      // survivor order: raw url, body hash as tiebreak — a page crawled
      // twice in one drop (same url, different fetch) would otherwise tie
      // and make the kept body nondeterministic across replays. The
      // U+0001 separator sorts below every URL-legal character, so the
      // concatenation orders exactly like the (url, hash) tuple even
      // when one url is a prefix of another
      .withColumn("__ord",
        concat(col("url"), lit("\u0001"), md5(col("html").cast("binary"))))
    val deduped = UrlCurate.dedupByUrl(pages, "url", "__ord")
      .where(col("url_canon").isNotNull) // junk URLs don't enter a corpus
      .drop("__ord")
    // politeness: robots verdicts on the CANONICAL url (host sans port,
    // path+query), before the seen-store join pays for doomed rows; a
    // disallowed page never reaches the corpus OR the seen store, so a
    // later robots relaxation lets a re-crawl ingest it
    val polite = robotsRules match {
      case Some(rules) =>
        Robots.filterAllowed(
          deduped.withColumn("__rh", Robots.hostOf(col("url_canon")))
            .withColumn("__rp", Robots.pathOf(col("url_canon"))),
          "__rh", "__rp", rules).drop("__rh", "__rp")
      case None => deduped
    }
    // vs the accumulated store: canonical key anti-join (key-sized side)
    val fresh = polite.join(loadSeen(spark, seenPath),
        Seq("url_canon"), "left_anti")
      .select(col("url"), col("url_canon"),
        graft.functions.strip_html(col("html")).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      fresh.write.mode("append").parquet(outPath)
      fresh.select("url_canon").write.mode("append").parquet(seenPath)
    } finally fresh.unpersist(false)
  }

  /** Start the foreachBatch ingest loop over a manifest stream (one
    * WARC path per streamed `value`; production:
    * `spark.readStream.text(manifestDir)`). */
  def start(manifest: DataFrame, outPath: String, seenPath: String,
            checkpoint: String, lenient: Boolean = true,
            robotsRules: Option[DataFrame] = None): StreamingQuery =
    manifest.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        // bounded collect: the batch's newly landed file paths
        val paths = batch.select(col("value").cast("string"))
          .collect().map(_.getString(0)).toSeq
          .map(_.trim).filter(_.nonEmpty)
        processBatch(batch.sparkSession, paths, outPath, seenPath, lenient,
          robotsRules)
      }
      .start()
}
