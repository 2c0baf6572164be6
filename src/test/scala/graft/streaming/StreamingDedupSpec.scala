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

  test("streaming blob refresh == dedupAgainstStore twin; twins drop across and within batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.dedup.BinaryDedup
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-blob")
    def blob(seed: Long): Array[Byte] = {
      val r = new scala.util.Random(seed)
      val b = new Array[Byte](8000); r.nextBytes(b); b
    }
    val a = blob(1); val b = blob(2); val c = blob(3)
    val batch1 = Seq((1L, a), (2L, b))
    val batch2 = Seq(
      (10L, "P::".getBytes("UTF-8") ++ a), // twin of stored 1 -> drops
      (11L, c),                            // fresh -> survives
      (12L, "Q::".getBytes("UTF-8") ++ c)) // in-batch twin of 11 -> drops
    val stream = MemoryStream[(Long, Array[Byte])]
    val q = BlobIngest.start(stream.toDF().toDF("bid", "content"),
      "bid", "content", s"$dir/out", s"$dir/chunks", s"$dir/ckpt",
      threshold = 0.5, minSize = 64, avgBits = 8, maxSize = 1024)
    try {
      stream.addData(batch1); q.processAllAvailable()
      stream.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    val survivors = spark.read.parquet(s"$dir/out")
      .select("bid").as[Long].collect().toSet
    assert(survivors == Set(1L, 2L, 11L))
    // the chunk store is exactly the survivors' chunk relation
    val store = spark.read.parquet(s"$dir/chunks")
    val twin = BinaryDedup.chunkTable(
      Seq((1L, a), (2L, b), (11L, c)).toDF("bid", "content"),
      "bid", "content", 64, 8, 1024)
    assert(store.as[(Long, Long)].collect().toSet ==
      twin.as[(Long, Long)].collect().toSet)
    // a later twin of an epoch-2 survivor is suppressed by the grown store
    stream2Check(dir.toString, c)
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("store compaction preserves the key set and the loop's decisions") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-compact")
    val keyP = s"$dir/keys"
    // simulate many small appends
    for (i <- 0 until 6)
      Seq((i.toLong, i.toLong * 7), (i.toLong, i.toLong * 7)) // dup rows too
        .toDF("lkey", "lkey2").coalesce(1).write.mode("append").parquet(keyP)
    val before = spark.read.parquet(keyP).distinct()
      .as[(Long, Long)].collect().toSet
    val filesBefore = new java.io.File(keyP).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(filesBefore >= 6)
    StoreMaintenance.compact(spark, keyP, numFiles = 2)
    val after = spark.read.parquet(keyP)
    assert(after.as[(Long, Long)].collect().toSet == before)
    assert(after.count() == before.size, "compaction must dedup")
    val filesAfter = new java.io.File(keyP).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(filesAfter == 2)
    // recover() on a healthy store is a no-op; on a stale tmp it cleans up
    assert(!StoreMaintenance.recover(spark, keyP))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(keyP + ".compacting"))
    assert(!StoreMaintenance.recover(spark, keyP))
    assert(!new java.io.File(keyP + ".compacting").exists())
    // crashed-swap shape: store missing, tmp present -> recover completes
    val fs = new java.io.File(keyP)
    val tmp = new java.io.File(keyP + ".compacting")
    assert(fs.renameTo(tmp))
    assert(StoreMaintenance.recover(spark, keyP))
    assert(spark.read.parquet(keyP).as[(Long, Long)].collect().toSet == before)
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  private def stream2Check(dir: String, c: Array[Byte]): Unit = {
    import graft.dedup.BinaryDedup
    val batch3 = Seq((20L, "R::".getBytes("UTF-8") ++ c))
      .toDF("bid", "content")
    val store = spark.read.parquet(s"$dir/chunks")
    val kept = BinaryDedup.dedupAgainstStore(batch3, "bid", "content",
      store, 0.5, 64, 8, 1024)
    assert(kept.count() == 0)
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
