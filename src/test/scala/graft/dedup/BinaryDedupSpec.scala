package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.CdcChunker

class BinaryDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def blob(seed: Long, n: Int): Array[Byte] = {
    val r = new scala.util.Random(seed)
    val b = new Array[Byte](n)
    r.nextBytes(b)
    b
  }

  test("CDC boundaries: cover the input, respect min/max, deterministic") {
    val data = blob(1, 20000)
    val ends = CdcChunker.boundaries(data, 64, 8, 1024)
    assert(ends.last == data.length)
    assert(ends.toSeq == ends.sorted.toSeq && ends.distinct.length == ends.length)
    val sizes = ends.zip(0 +: ends.dropRight(1).toSeq).map { case (e, s) => e - s }
    // every chunk but possibly the LAST respects the min bound; all respect max
    sizes.dropRight(1).foreach(sz => assert(sz >= 64, s"chunk $sz < min"))
    sizes.foreach(sz => assert(sz <= 1024, s"chunk $sz > max"))
    // avg near 2^8 (loose band: mask hits are geometric)
    val avg = sizes.sum.toDouble / sizes.length
    assert(avg > 100 && avg < 700, s"avg chunk $avg far from 256")
    assert(CdcChunker.chunkHashes(data, 64, 8, 1024).toSeq ==
      CdcChunker.chunkHashes(data.clone(), 64, 8, 1024).toSeq)
  }

  test("the defining CDC property: boundaries re-sync after a prefix insertion") {
    val data = blob(2, 16000)
    val shifted = "INSERTED".getBytes("UTF-8") ++ data
    val a = CdcChunker.chunkHashes(data, 64, 8, 1024).toSet
    val b = CdcChunker.chunkHashes(shifted, 64, 8, 1024).toSet
    val shared = (a intersect b).size
    // all but the first chunk (or two, if the insertion bridges a cut)
    // must re-sync; fixed-size blocking would share ZERO blocks
    assert(shared >= a.size - 2,
      s"only $shared of ${a.size} chunks re-synced after insertion")
    val jac = shared.toDouble / (a.size + b.size - shared)
    assert(jac > 0.7, s"jaccard $jac")
  }

  test("empty input yields no chunks; sub-min blob yields one whole chunk") {
    assert(CdcChunker.chunkHashes(Array.emptyByteArray, 64, 8, 1024).isEmpty)
    val tiny = blob(3, 40) // < minSize
    val hs = CdcChunker.chunkHashes(tiny, 64, 8, 1024)
    assert(hs.length == 1)
  }

  test("cdc_chunks expression: codegen bit-matches interpreted; null-safe") {
    val df = Seq((1L, blob(4, 5000)), (2L, Array.emptyByteArray),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "content")
    def run(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(col("id"),
          graft.functions.cdc_chunks(col("content"), 64, 8, 1024).as("c"))
        .orderBy("id").collect().toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val gen = run("CODEGEN_ONLY")
    assert(gen == run("NO_CODEGEN"))
    assert(gen(0).getSeq[Long](1).nonEmpty)
    assert(gen(1).getSeq[Long](1).isEmpty)
    assert(gen(2).isNullAt(1))
    // SQL registration agrees with the Column form
    df.createOrReplaceTempView("cdc_blobs")
    graft.functions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT id, cdc_chunks(content, 64, 8, 1024) AS c FROM cdc_blobs")
      .orderBy("id").collect().toSeq
    assert(viaSql == gen)
  }

  test("incremental refresh loop: store suppresses twins, survivors extend the store") {
    val a = blob(20, 8000)
    val b = blob(21, 8000)
    val c = blob(22, 8000)
    val batch1 = Seq((1L, a), (2L, b)).toDF("id", "content")
    // the store IS the chunk relation; blobs never re-chunked
    val store1 = BinaryDedup.chunkTable(batch1, "id", "content", 64, 8, 1024)
    // refresh: a mutated twin of a stored blob + a genuinely new blob
    val batch2 = Seq(
      (10L, "PRE::".getBytes("UTF-8") ++ a),
      (11L, c)
    ).toDF("id", "content")
    val matches = BinaryDedup.matchesAgainstStore(
        batch2, "id", "content", store1, 0.5, 64, 8, 1024)
      .select("id", "store_id").as[(Long, Long)].collect().toSet
    assert(matches == Set((10L, 1L)))
    val kept = BinaryDedup.dedupAgainstStore(
      batch2, "id", "content", store1, 0.5, 64, 8, 1024)
    assert(kept.columns.toSeq == Seq("id", "content"))
    assert(kept.select("id").as[Long].collect().toSeq == Seq(11L))
    // second refresh against the grown store: twins of BOTH epochs suppress
    val store2 = store1.unionByName(
      BinaryDedup.chunkTable(kept, "id", "content", 64, 8, 1024))
    val batch3 = Seq(
      (20L, "X".getBytes("UTF-8") ++ c), // twin of the epoch-2 survivor
      (21L, blob(23, 8000))
    ).toDF("id", "content")
    val m3 = BinaryDedup.matchesAgainstStore(
        batch3, "id", "content", store2, 0.5, 64, 8, 1024)
      .select("id", "store_id").as[(Long, Long)].collect().toSet
    assert(m3 == Set((20L, 11L)))
  }

  test("bucketed chunk store: identical matches, store side joins without a shuffle") {
    val a = blob(30, 8000)
    val b = blob(31, 8000)
    val batch1 = Seq((1L, a), (2L, b)).toDF("id", "content")
    val chunks = BinaryDedup.chunkTable(batch1, "id", "content", 64, 8, 1024)
    spark.sql("DROP TABLE IF EXISTS graft_test_chunk_store")
    BinaryDedup.writeBucketedStore(chunks, "graft_test_chunk_store", 4)
    val batch2 = Seq((10L, "P::".getBytes("UTF-8") ++ a), (11L, blob(32, 8000)))
      .toDF("id", "content")
    val viaBucketed = BinaryDedup.matchesAgainstBucketedStore(
      batch2, "id", "content", "graft_test_chunk_store", 0.5, 64, 8, 1024)
    val viaPlain = BinaryDedup.matchesAgainstStore(
      batch2, "id", "content", chunks, 0.5, 64, 8, 1024)
    assert(viaBucketed.select("id", "store_id").as[(Long, Long)].collect().toSet ==
      viaPlain.select("id", "store_id").as[(Long, Long)].collect().toSet)
    assert(viaBucketed.select("id", "store_id").as[(Long, Long)].collect().toSet ==
      Set((10L, 1L)))
    // append keeps the bucket spec and the grown store still suppresses
    BinaryDedup.appendToBucketedStore(
      BinaryDedup.chunkTable(
        Seq((11L, blob(32, 8000))).toDF("id", "content"),
        "id", "content", 64, 8, 1024),
      "graft_test_chunk_store", 4)
    val m2 = BinaryDedup.matchesAgainstBucketedStore(
        Seq((20L, "Q::".getBytes("UTF-8") ++ blob(32, 8000)))
          .toDF("id", "content"),
        "id", "content", "graft_test_chunk_store", 0.5, 64, 8, 1024)
      .select("id", "store_id").as[(Long, Long)].collect().toSet
    assert(m2 == Set((20L, 11L)))
    // plan: the chash join's store side reads the bucket layout in place —
    // no ShuffleExchange anywhere above the store table scan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = BinaryDedup.matchChunkTables(
      BinaryDedup.chunkTable(batch2, "id", "content", 64, 8, 1024),
      "id", spark.table("graft_test_chunk_store"), 0.5)
    df.count()
    val root = df.queryExecution.executedPlan
    val plans = root +: root.collect { case p: AdaptiveSparkPlanExec => p.executedPlan }
    val storeShuffles = plans.flatMap(_.collect {
      case s: ShuffleExchangeExec
        if s.child.toString.contains("graft_test_chunk_store") &&
          !s.child.toString.contains("HashAggregate") => s
    })
    assert(storeShuffles.isEmpty,
      s"store-side chash join must be exchange-free:\n$root")
    spark.sql("DROP TABLE IF EXISTS graft_test_chunk_store")
  }

  test("nearDupPairs finds the mutated twin and not unrelated blobs") {
    val a = blob(10, 8000)
    val aMut = "PREFIX::".getBytes("UTF-8") ++ a
    val b = blob(11, 8000)
    val df = Seq((1L, a), (2L, aMut), (3L, b)).toDF("id", "content")
    val pairs = BinaryDedup.nearDupPairs(df, "id", "content", 0.5,
        minSize = 64, avgBits = 8, maxSize = 1024)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}
