package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.text.QualityClassifier

/** foreachBatch model-scoring loop == one batch pass, bit-for-bit. */
class CurateIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(n: Int) = (0 until n).map { i =>
    val good = i % 2 == 0
    val text =
      if (good) s"measured technical writing with context ${i % 7}"
      else s"free casino pills winner now ${i % 7}"
    (i.toLong, text)
  }

  test("streamed scores and kept corpus are bit-identical to the batch pass") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-curate")
    val (keptP, scoresP, ckpt) = (s"$dir/kept", s"$dir/scores", s"$dir/ckpt")
    val b = 512
    val labeled = corpus(60).toDF("doc_id", "text")
      .withColumn("label", (col("doc_id") % 2 === 0).cast("int"))
    val model = QualityClassifier.train(labeled, "text", "label", b)

    val rows = corpus(100)
    val stream = MemoryStream[(Long, String)]
    val q = CurateIngest.start(stream.toDF().toDF("doc_id", "text"),
      "doc_id", "text", model, b, threshold = 0.0, keptP, scoresP, ckpt)
    try {
      stream.addData(rows.take(40)); q.processAllAvailable()
      stream.addData(rows.drop(40)); q.processAllAvailable()
    } finally q.stop()

    val streamedScores = spark.read.parquet(scoresP)
      .select(col("doc_id"), col("n_feats"), col("margin"), col("keep"))
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    val batchScores = QualityClassifier.score(
        rows.toDF("doc_id", "text"), "doc_id", "text", model, b)
      .withColumn("keep", col("margin") > 0.0)
      .select(col("doc_id"), col("n_feats"), col("margin"), col("keep"))
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(streamedScores == batchScores,
      "streamed scores must equal the batch pass bit-for-bit")

    val kept = spark.read.parquet(keptP).as[(Long, String)].collect().toMap
    val expectKept = batchScores.filter(_._4).map(_._1).toSet
    assert(kept.keySet == expectKept, "kept corpus = positive-margin docs")
    val texts = rows.toMap
    assert(kept.forall { case (id, t) => texts(id) == t },
      "kept text must round-trip unchanged")
    // the frozen model separates the stream like the batch gate does
    assert(expectKept == (0 until 100).filter(_ % 2 == 0).map(_.toLong).toSet)
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }
}
