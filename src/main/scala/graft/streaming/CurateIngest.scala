package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.text.QualityClassifier

/** Streaming curation scoring — the Structured Streaming twin of the
  * model-based quality filter (q_quality_clf): documents arrive in
  * microbatches, each batch is scored under a FROZEN
  * [[QualityClassifier]] model and split into the kept corpus and the
  * full score/decision audit trail. Because the model is broadcast state
  * fixed for the life of the query and scoring aggregates only within a
  * document, every per-doc row is independent of batch boundaries — the
  * streamed stores are bit-identical to one batch pass over the same
  * rows (spec-pinned, and q_stream_curate gates it: the oracle reads the
  * BATCH scorer's checkpoint while the gate output reads the STREAMED
  * store, so any stream/batch divergence hash-fails).
  *
  * Model refresh = stop the query, retrain, restart with the new model
  * (the fastText-deployment pattern); scoring state never accumulates,
  * so restarts are cheap. Same at-least-once caveat as the other ingest
  * loops (foreachBatch replay double-appends); production points the
  * paths at transactional tables. */
object CurateIngest {

  /** One scoring step over a document batch — also the batch twin the
    * spec pins the stream against. Appends `(id, n_feats, margin, keep)`
    * to `scoresPath` and the kept documents' `(id, text)` to
    * `keptPath`. */
  def processBatch(docs: DataFrame, idCol: String, textCol: String,
                   model: DataFrame, buckets: Int, threshold: Double,
                   keptPath: String, scoresPath: String): Unit = {
    val scored = QualityClassifier.score(docs, idCol, textCol, model, buckets)
      .withColumn("keep", col("margin") > threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      scored.write.mode("append").parquet(scoresPath)
      // batch-sized decision relation joins back for the kept text
      docs.select(col(idCol), col(textCol))
        .join(scored.where(col("keep")).select(col(idCol)), Seq(idCol))
        .write.mode("append").parquet(keptPath)
    } finally scored.unpersist(false)
  }

  /** Start the foreachBatch scoring loop over a document stream. */
  def start(docs: DataFrame, idCol: String, textCol: String,
            model: DataFrame, buckets: Int, threshold: Double,
            keptPath: String, scoresPath: String,
            checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        processBatch(batch.toDF(), idCol, textCol, model, buckets, threshold,
          keptPath, scoresPath)
      }
      .start()
}
