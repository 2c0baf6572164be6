package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.TextDedup

/** foreachBatch incremental line-dedup loop == its batch twins. */
class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming refresh loop == dedupLinesAcross then dedupLinesIncremental") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-dedup")
    val (outP, keyP, ckpt) =
      (s"$dir/out", s"$dir/keys", s"$dir/ckpt")
    val batch1 = Seq(
      (1L, "alpha\nbeta"), (2L, "beta\ngamma"))
    val batch2 = Seq(
      (10L, "gamma\ndelta"),     // gamma stored -> only delta survives
      (11L, "alpha"),            // fully stored -> doc vanishes
      (12L, "epsilon\nepsilon")) // in-batch repeat -> one line
    val stream = MemoryStream[(Long, String)]
    val q = DedupIngest.start(stream.toDF().toDF("doc_id", "text"),
      "doc_id", "text", outP, keyP, ckpt)
    try {
      stream.addData(batch1); q.processAllAvailable()
      stream.addData(batch2); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(outP)
      .as[(Long, String)].collect().toMap
    // batch twins: refresh 1 over an empty store IS dedupLinesAcross;
    // refresh 2 is dedupLinesIncremental against refresh 1's keys
    val out1 = TextDedup.dedupLinesAcross(batch1.toDF("doc_id", "text"),
      "doc_id", "text")
    val out2 = TextDedup.dedupLinesIncremental(batch2.toDF("doc_id", "text"),
      "doc_id", "text", TextDedup.lineKeys(out1, "text"))
    val batchTwin = (out1.as[(Long, String)].collect() ++
      out2.as[(Long, String)].collect()).toMap
    assert(streamed == batchTwin)
    assert(streamed == Map(1L -> "alpha\nbeta", 2L -> "gamma",
      10L -> "delta", 12L -> "epsilon"))
    // the key store holds exactly the survivors' distinct lines (128-bit
    // keys, one row per line, never re-appended)
    val keys = spark.read.parquet(keyP)
    assert(keys.count() == keys.distinct().count())
    assert(keys.count() == 5) // alpha beta gamma delta epsilon
    assert(keys.columns.toSeq == Seq("lkey", "lkey2"))
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("a replayed line never survives twice across many refreshes") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-dedup2")
    val stream = MemoryStream[(Long, String)]
    val q = DedupIngest.start(stream.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/out", s"$dir/keys", s"$dir/ckpt")
    try {
      (0 until 4).foreach { i =>
        stream.addData(Seq((i.toLong, "same\nbatch" + i)))
        q.processAllAvailable()
      }
    } finally q.stop()
    val lines = spark.read.parquet(s"$dir/out")
      .select(explode(split(col("text"), "\n")).as("l"))
      .as[String].collect().toSeq
    assert(lines.count(_ == "same") == 1, "the shared line survives once")
    assert(lines.count(_.startsWith("batch")) == 4, "fresh lines all survive")
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }
}
