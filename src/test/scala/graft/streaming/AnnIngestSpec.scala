package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.ann.IvfIndex
import java.nio.file.Files

class AnnIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def vec(i: Long): Array[Float] =
    Array.tabulate(8)(d => (((i * 31 + d * 17) % 97) / 97.0f) - 0.5f)

  private lazy val all =
    (0L until 200L).map(i => (i, vec(i))).toDF("vid", "emb").cache()

  private lazy val model = IvfIndex.train(
    all.select(col("vid"), col("emb")), "emb", nlist = 8)

  private def tmp(n: String): String =
    Files.createTempDirectory(s"annIngest_$n").toString

  test("streamed store equals the one-shot assignment relation") {
    val base = tmp("stream")
    val (storeP, ckpt) = (s"$base/store", s"$base/ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Array[Float])]
    val q = AnnIngest.start(stream.toDF().toDF("vid", "emb"),
      "vid", "emb", model, storeP, ckpt)
    try {
      stream.addData((0L until 100L).map(i => (i, vec(i))))
      q.processAllAvailable()
      stream.addData((100L until 200L).map(i => (i, vec(i))))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = AnnIngest.loadStore(spark, storeP, "vid", "emb")
      .select($"vid", $"emb", $"list")
      .as[(Long, Array[Float], Int)].collect()
      .map(t => (t._1, t._2.toSeq, t._3)).toSet
    val oneShot = IvfIndex.withAssignment(all, "emb", model, "list")
      .select($"vid", $"emb", $"list")
      .as[(Long, Array[Float], Int)].collect()
      .map(t => (t._1, t._2.toSeq, t._3)).toSet
    assert(streamed == oneShot && streamed.size == 200)
  }

  test("probed read scans only the probed list= directories") {
    val storeP = tmp("prune") + "/store"
    AnnIngest.processBatch(all, "vid", "emb", model, storeP)
    // scan-node numFiles metric: inputFiles does not reflect partition
    // pruning (same assertion style as SpatialStoreSpec's tile pruning)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      val plan = df.queryExecution.executedPlan
      plan.execute().count()
      plan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.get
    }
    val probed = Seq(0, 3)
    val allFiles = scannedFiles(
      AnnIngest.loadStore(spark, storeP, "vid", "emb"))
    val prunedFiles = scannedFiles(
      AnnIngest.prunedStore(spark, storeP, "vid", "emb", probed))
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"pruned $prunedFiles vs all $allFiles")
    // and content parity with the unpruned filter
    val got = AnnIngest.prunedStore(spark, storeP, "vid", "emb", probed)
      .select($"vid").as[Long].collect().toSet
    val want = AnnIngest.loadStore(spark, storeP, "vid", "emb")
      .where($"list".isin(probed: _*)).select($"vid").as[Long].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("topKFromStore matches IvfIndex.topK over the accumulated data") {
    val storeP = tmp("topk") + "/store"
    // two refreshes, then query
    AnnIngest.processBatch(all.where($"vid" < 120), "vid", "emb", model, storeP)
    AnnIngest.processBatch(all.where($"vid" >= 120), "vid", "emb", model, storeP)
    val queries = all.where($"vid" % 40 === 0)
      .select($"vid".as("qid"), $"emb".as("qvec"))
    val fromStore = AnnIngest.topKFromStore(spark, storeP, "vid", "emb",
        queries, "qid", "qvec", k = 5, model, nprobe = 3)
      .select($"qid", $"vid", $"rank").as[(Long, Long, Int)].collect().toSet
    val direct = IvfIndex.topK(all.select($"vid", $"emb"), "vid", "emb",
        queries, "qid", "qvec", k = 5, model, nprobe = 3)
      .select($"qid", $"vid", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(fromStore == direct && fromStore.nonEmpty)
  }

  test("compactPartitioned bounds files per list and preserves the store exactly") {
    val storeP = tmp("compact") + "/store"
    // three refreshes -> up to three files per list directory
    Seq(0L -> 70L, 70L -> 140L, 140L -> 200L).foreach { case (lo, hi) =>
      AnnIngest.processBatch(all.where($"vid" >= lo && $"vid" < hi),
        "vid", "emb", model, storeP)
    }
    def content() = AnnIngest.loadStore(spark, storeP, "vid", "emb")
      .select($"vid", $"emb", $"list").as[(Long, Array[Float], Int)]
      .collect().map(t => (t._1, t._2.toSeq, t._3)).toSet
    def filesPerList(): Map[String, Int] = {
      val root = new java.io.File(storeP)
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("list="))
        .map(d => d.getName ->
          d.listFiles().count(f => f.getName.endsWith(".parquet"))).toMap
    }
    val before = content()
    assert(filesPerList().values.max > 1, "refreshes should fragment the store")
    StoreMaintenance.compactPartitioned(spark, storeP, "list")
    assert(content() == before)
    assert(filesPerList().values.max == 1,
      s"compaction should leave one file per list: ${filesPerList()}")
  }

  test("null vectors quarantine to list=-1 and are probed by no query") {
    val storeP = tmp("nulls") + "/store"
    val withNull = all.select($"vid",
      when($"vid" === 7, lit(null)).otherwise($"emb").as("emb"))
    AnnIngest.processBatch(withNull, "vid", "emb", model, storeP)
    val store = AnnIngest.loadStore(spark, storeP, "vid", "emb")
    assert(store.where($"vid" === 7).select($"list").as[Int].head() == -1)
    val queries = all.where($"vid" % 40 === 0)
      .select($"vid".as("qid"), $"emb".as("qvec"))
    val res = AnnIngest.topKFromStore(spark, storeP, "vid", "emb",
      queries, "qid", "qvec", k = 5, model, nprobe = 8)
    assert(res.where($"vid" === 7).count() == 0)
  }
}
