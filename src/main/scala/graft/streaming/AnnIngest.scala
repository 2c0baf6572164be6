package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ann.IvfIndex
import graft.functions.cosine_similarity

/** Streaming incremental vector-index maintenance — the embedding-store
  * refresh loop: an IVF codebook is trained ONCE (frozen, the
  * [[CurateIngest]] frozen-model discipline — retraining per batch would
  * silently shift every existing assignment), then each microbatch of new
  * embeddings assigns to its nearest centroid list via the broadcast model
  * and APPENDS to a `list=`-partitioned parquet store. Stored vectors are
  * never re-read or re-assigned: a refresh over a billion-vector store
  * costs one scan of the new batch.
  *
  * The read path mirrors the write layout: queries probe `nprobe` centroid
  * lists, the probed list ids (bounded by nlist — driver-trivial) become a
  * LITERAL `list IN (...)` filter, so Catalyst's partition pruning lists
  * only the probed `list=` directories — at 100 TB the search scans
  * nprobe/nlist of the store, the directory-layout twin of
  * [[graft.sources.ZoneMap]]'s manifest pruning. Downstream of the pruned
  * scan it is the exact-cosine + window-top-k tail of
  * [[IvfIndex.topKFromAssignments]], so a checkpointed store oracles in
  * SQL.
  *
  * Exactly-once caveat: foreachBatch appends are at-least-once under crash
  * replay — same contract note as [[DedupIngest]].
  */
object AnnIngest {

  /** Assign one batch to the frozen codebook and append to the store.
    * Null/non-finite vectors land in the `list=-1` quarantine directory
    * (probed by no query) — the [[IvfIndex.withAssignment]] convention. */
  def processBatch(batch: DataFrame, idCol: String, vecCol: String,
                   model: IvfIndex.Model, storePath: String): Unit =
    IvfIndex.withAssignment(batch, vecCol, model, "list")
      .select(col(idCol), col(vecCol), col("list"))
      .write.mode("append").partitionBy("list").parquet(storePath)

  /** The accumulated store: (idCol, vecCol, list). */
  def loadStore(spark: SparkSession, storePath: String,
                idCol: String, vecCol: String): DataFrame =
    spark.read.parquet(storePath)
      .select(col(idCol), col(vecCol), col("list").cast("int").as("list"))

  /** Store scan restricted to `lists` as LITERALS so partition pruning
    * lists only those `list=` directories. */
  def prunedStore(spark: SparkSession, storePath: String,
                  idCol: String, vecCol: String, lists: Seq[Int]): DataFrame =
    if (lists.isEmpty)
      loadStore(spark, storePath, idCol, vecCol).where(lit(false))
    else
      spark.read.parquet(storePath)
        .where(col("list").isin(lists: _*))
        .select(col(idCol), col(vecCol), col("list").cast("int").as("list"))

  /** Approximate top-k over the accumulated store. The probed-list set is
    * bounded by nlist, so the collect is planning metadata, not data.
    * `precomputedProbes` (a (queryId, list) relation, e.g. a checkpointed
    * [[IvfIndex.probeLists]]) skips recomputing the per-query centroid
    * ranking when the caller already materialized it — same rows by
    * construction (exact long/int columns roundtrip parquet bit-for-bit). */
  def topKFromStore(spark: SparkSession, storePath: String,
                    idCol: String, vecCol: String,
                    queries: DataFrame, queryId: String, queryVec: String,
                    k: Int, model: IvfIndex.Model, nprobe: Int = 4,
                    precomputedProbes: Option[DataFrame] = None): DataFrame = {
    val probes = precomputedProbes.getOrElse(
      IvfIndex.probeLists(queries, queryId, queryVec, model, nprobe))
    val probed = probes.select("list").distinct()
      .collect().map(_.getInt(0)).toSeq
    val items = prunedStore(spark, storePath, idCol, vecCol, probed)
    // salted list join — see IvfIndex.listSalt (scoring work ∝ join output)
    IvfIndex.listJoin(queries.join(probes, Seq(queryId)), items, "list",
        idCol, IvfIndex.listSalt(spark, model.centroids.length))
      .where(col(queryId) =!= col(idCol))
      .withColumn("similarity", cosine_similarity(col(queryVec), col(vecCol)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryId))
          .orderBy(col("similarity").desc, col(idCol).asc)))
      .where(col("rank") <= k)
      .select(col(queryId), col(idCol), col("similarity"), col("rank"))
  }

  /** Start the foreachBatch refresh loop over an embedding stream. */
  def start(stream: DataFrame, idCol: String, vecCol: String,
            model: IvfIndex.Model, storePath: String,
            checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        processBatch(batch.toDF(), idCol, vecCol, model, storePath)
      }
      .start()
}
