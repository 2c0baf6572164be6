package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ann.{IvfIndex => IvfIndexTestAccess, PqIndex, Similarity}
import graft.text.TextFunctions

class TextPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("wordShingles: count, distinctness, short-doc guard") {
    val r = Seq("a b c d", "a b", "x x x x x").toDF("text")
      .select(TextFunctions.wordShingles(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(r(0) == Seq("a b c", "b c d"))
    assert(r(1) == Seq.empty)
    assert(r(2) == Seq("x x x")) // distinct
  }

  test("text stats are exact and consistent") {
    val r = Seq("the cat sat on a mat").toDF("text").select(
      TextFunctions.tokenCount(col("text")),
      TextFunctions.stopwordCount(col("text")),
      TextFunctions.stopwordRatio(col("text")),
      TextFunctions.avgWordLen(col("text"))).head()
    assert(r.getInt(0) == 6)
    assert(r.getInt(1) == 3) // the, on, a
    assert(r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == (20 - 5) / 6.0)
  }

  test("ngramJaccardPairs finds identical docs with jaccard 1.0") {
    val df = Seq((1L, "w1 w2 w3 w4 w5"), (2L, "w1 w2 w3 w4 w5"),
                 (3L, "z1 z2 z3 z4 z5")).toDF("id", "text")
    val pairs = TextDedup.ngramJaccardPairs(df, "id", "text", 3, 0.5)
      .as[(Long, Long, Double)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("minHash LSH recall vs exact ngram pairs on real documents") {
    val exact = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.6)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    val lsh = TextDedup.minHashLshPairs(docs, "doc_id", "text",
        n = 3, numHashes = 64, bands = 16, estThreshold = 0.0)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test corpus has no near-dups at 0.6 — weak test")
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall over ${exact.size} true pairs")
  }

  test("minhash est_jaccard approximates true jaccard") {
    val df = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g x")).toDF("id", "text")
    val est = TextDedup.minHashLshPairs(df, "id", "text", 3, 64, 16, 0.0)
      .select("est_jaccard").as[Double].collect()
    if (est.nonEmpty) assert(est.head > 0.2 && est.head < 0.95)
  }

  test("simhash: identical text -> hamming 0; pairs found on real docs") {
    val df = Seq((1L, "the quick brown fox jumps"), (2L, "the quick brown fox jumps"))
      .toDF("id", "text")
    val p = TextDedup.simHashPairs(df, "id", "text", 0)
      .as[(Long, Long, Int)].collect()
    assert(p.toSeq == Seq((1L, 2L, 0)))
    // near-identical docs in the corpus must surface
    val real = TextDedup.simHashPairs(docs, "doc_id", "text", 6).count()
    assert(real > 0)
  }

  test("topKBrute: bounded-heap path == cross-join window formulation") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.cosine_similarity
    val items = emb.select(col("vec_id").as("nid"), col("embedding").as("ivec"))
    val queries = emb.where(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val got = Similarity.topKBrute(items.repartition(7), "nid", "ivec",
        queries, "qid", "qvec", 5)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
    // the naive plan the heap path replaces: full scored cross product
    // through a window — identical results required
    val want = items.crossJoin(broadcast(queries))
      .where(col("qid") =!= col("nid"))
      .withColumn("similarity", cosine_similarity(col("qvec"), col("ivec")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("similarity").desc, col("nid").asc)))
      .where(col("rank") <= 5)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
    assert(got == want)
  }

  test("topKBrute: oversized query side fails fast with a diagnostic, not an OOM") {
    val items = emb.select(col("vec_id").as("nid"), col("embedding").as("ivec"))
    val queries = emb.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val ex = intercept[IllegalArgumentException] {
      Similarity.topKBrute(items, "nid", "ivec", queries, "qid", "qvec",
        k = 5, maxQueries = 3).count()
    }
    assert(ex.getMessage.contains("topKLsh"))
  }

  test("ANN: LSH top-k recall vs brute force on real embeddings") {
    val items = emb.select(col("vec_id").as("nid"), col("embedding").as("ivec"))
    val queries = emb.where(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val brute = Similarity.topKBrute(items, "nid", "ivec", queries, "qid", "qvec", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    // random 64-dim vectors are near-orthogonal (cos ~0.3 for top neighbors):
    // per-bit collision p ~ 1 - theta/pi ~ 0.6, so short signatures + many
    // tables are needed for recall: 4 bits x 16 tables -> ~0.9 expected.
    val lsh = Similarity.topKLsh(items, "nid", "ivec", queries, "qid", "qvec", 5,
        bits = 4, tables = 16)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    val recall = brute.count(lsh.contains).toDouble / brute.size
    assert(recall >= 0.6, s"LSH ANN recall $recall (want >= 0.6 at 4 bits x 16 tables)")
  }

  test("radius search: brute is exact on crafted vectors; LSH recalls brute on real ones") {
    // crafted: identical vector -> cos 1 (in radius), orthogonal -> cos 0 (out)
    val items = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.8f, 0.6f, 0.0f))).toDF("vec_id", "embedding")
    val qs = Seq((100L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "qvec")
    val got = Similarity.radiusSearchBrute(items, "vec_id", "embedding",
        qs, "qid", "qvec", 0.5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 1L), (100L, 3L))) // cos = 1.0 and 0.8
    // LSH variant against brute on the real embeddings
    val it2 = emb.select(col("vec_id"), col("embedding"))
    val qs2 = emb.where(col("vec_id") % 25 === 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val brute = Similarity.radiusSearchBrute(it2, "vec_id", "embedding",
        qs2, "qid", "qvec", 0.3)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.radiusSearchLsh(it2, "vec_id", "embedding",
        qs2, "qid", "qvec", 0.3, bits = 4, tables = 16)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    assert(lsh.subsetOf(brute), "LSH verifies exactly - no false positives")
    val recall = brute.count(lsh.contains).toDouble / brute.size
    assert(recall >= 0.6, s"LSH radius recall $recall")
  }

  test("embedding near-dup pair mining: exact dups always found, no false positives") {
    val rnd = new scala.util.Random(19)
    def vec(): Array[Float] = Array.fill(32)(rnd.nextGaussian().toFloat)
    val base = (0 until 50).map(i => (i.toLong, vec()))
    val dups = (0 until 20).map(i => (100L + i, base(i)._2.clone()))
    val near = (0 until 10).map { i =>
      val v = base(i)._2.clone(); v(0) = v(0) + 0.01f
      (200L + i, v)
    }
    val all = base ++ dups ++ near
    val df = all.toDF("vid", "v")
    val got = Similarity.nearDupPairs(df, "vid", "v", threshold = 0.99,
        bits = 8, tables = 8)
      .select("ida", "idb").as[(Long, Long)].collect().toSet

    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = (for { (i, va) <- all; (j, vb) <- all if i < j && cos(va, vb) >= 0.99 }
      yield (i, j)).toSet
    assert(got.subsetOf(want), "false positives survived exact verification")
    val exactDupPairs = want.filter { case (i, j) => j == i + 100 }
    assert(exactDupPairs.subsetOf(got), "identical vectors must always collide")
    val recall = want.count(got.contains).toDouble / want.size
    assert(recall >= 0.9, s"near-dup recall $recall over ${want.size} true pairs")
  }

  test("bpe pre-tokenizer: splits letter/digit/punct runs with space prefixes") {
    val r = Seq("hello world42, don't stop").toDF("text")
      .select(TextFunctions.bpePretokens(col("text"))).head().getSeq[String](0)
    assert(r == Seq("hello", " world", "42", ",", " don", "'t", " stop"))
  }

  test("IVF top-k: trains centroids, probes few lists, high recall") {
    val items = emb.select(col("vec_id").as("nid"), col("embedding").as("ivec"))
    val queries = emb.where(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val model = IvfIndexTestAccess.train(items, "ivec", nlist = 8)
    assert(model.centroids.length == 8)
    val ivf = IvfIndexTestAccess.topK(items, "nid", "ivec",
        queries, "qid", "qvec", k = 5, model, nprobe = 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val brute = Similarity.topKBrute(items, "nid", "ivec", queries, "qid", "qvec", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall at nprobe=4/8 lists")
  }

  test("IVF k-means|| init: full-corpus oversampling beats the sample-bound trainer on clustered data") {
    // 16 well-separated Gaussian clusters in 16-dim: the regime where
    // init quality decides coverage — random init from a (tiny) sample
    // routinely seeds two centroids in one cluster and zero in another,
    // while d^2-proportional oversampling touches every cluster
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(16)(Array.fill(16)(rnd.nextGaussian() * 50.0))
    val pts = (0 until 1600).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => (x + rnd.nextGaussian()).toFloat))
    }
    val items = pts.toDF("nid", "ivec")
    def cost(m: IvfIndexTestAccess.Model): Double =
      pts.map { case (_, v) =>
        m.centroids.map { c =>
          c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum
        }.min
      }.sum
    val par = IvfIndexTestAccess.trainKMeansPar(items, "ivec", nlist = 16, seed = 5L)
    assert(par.centroids.length == 16)
    // sample-bound trainer: 64-vector budget (the 100 TB analog, where the
    // sample sees a vanishing corpus fraction)
    val sampled = IvfIndexTestAccess.train(items, "ivec", nlist = 16,
      sampleTarget = 64, seed = 5L)
    assert(cost(par) <= cost(sampled),
      s"k-means|| potential ${cost(par)} vs sample-trained ${cost(sampled)}")
    // absolute quality: with matched cluster count the quantization
    // potential must approach the true per-point noise (dim * sigma^2 = 16)
    assert(cost(par) / pts.length < 32.0,
      s"k-means|| per-point potential ${cost(par) / pts.length} (true noise ~16)")
    // the IVF search path is unchanged: recall vs brute stays high
    val queries = items.where(col("nid") % 20 === 0)
      .select(col("nid").as("qid"), col("ivec").as("qvec"))
    val ivf = IvfIndexTestAccess.topK(items, "nid", "ivec",
        queries, "qid", "qvec", k = 5, par, nprobe = 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val brute = Similarity.topKBrute(items, "nid", "ivec", queries, "qid", "qvec", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.9,
      s"IVF recall $recall with k-means|| centroids at nprobe=4/16 on clustered data")
  }

  test("incremental LSH: new batch collides with stored corpus and itself, tagged correctly") {
    val mk = (ids: Seq[Long], texts: Seq[String]) =>
      TextDedup.minHashSignatures(
        ids.zip(texts).toDF("doc_id", "text"), "doc_id", "text", 3, 64)
    val t = "the quick brown fox jumps over the lazy dog again and again today"
    val stored = mk(Seq(10L, 11L), Seq(t, "completely different content about spark engines and parquet files"))
    val fresh = mk(Seq(1L, 2L, 3L), Seq(t, t, "unrelated new document text with nothing shared at all here"))
    val got = TextDedup.lshPairsIncremental(fresh, stored, "doc_id", 64, 16, 0.5)
      .select("new_id", "other_id", "other_is_new")
      .as[(Long, Long, Boolean)].collect().toSet
    // doc 1 and 2 are copies of stored doc 10: both collide with it
    // (other_is_new=false) and with each other (other_is_new=true)
    assert(got == Set((1L, 10L, false), (2L, 10L, false), (1L, 2L, true)))
  }

  test("PQ top-k: ADC shortlist + exact re-rank recalls brute force") {
    val items = emb.select(col("vec_id").as("nid"), col("embedding").as("ivec"))
    val queries = emb.where(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val model = PqIndex.train(items, "ivec", m = 16, codes = 64)
    assert(model.m == 16 && model.subDim == 4)
    assert(model.codebooks.forall(_.length == 64))
    val brute = Similarity.topKBrute(items, "nid", "ivec", queries, "qid", "qvec", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    // ADC-only ranking: quantization-limited (measured ~0.5 on these
    // unclustered embeddings — PQ's worst case)
    val adc = PqIndex.topK(items, "nid", "ivec", queries, "qid", "qvec", k = 5, model)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val adcRecall = brute.count(adc.contains).toDouble / brute.size
    assert(adcRecall >= 0.4, s"PQ ADC-only recall $adcRecall at m=16, 64 codes")
    // production shape: ADC top-50 shortlist + exact cosine re-rank
    val reranked = PqIndex.topKRerank(items, "nid", "ivec",
        queries, "qid", "qvec", k = 5, model, shortlist = 50)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = brute.count(reranked.contains).toDouble / brute.size
    assert(recall >= 0.9, s"PQ rerank recall $recall at shortlist=50")
  }

  test("PQ: every item encodes m codes; LUTs are complete; IVF-PQ restriction is a subset") {
    val items = emb.select(col("vec_id").as("nid"), col("embedding").as("ivec"))
    val queries = emb.where(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val model = PqIndex.train(items, "ivec", m = 8, codes = 16)
    val codes = PqIndex.encode(items, "nid", "ivec", model)
    assert(codes.count() == items.count() * 8)
    assert(codes.agg(max("code"), min("code")).as[(Int, Int)].head()._1 < 16)
    val luts = PqIndex.lookupTables(queries, "qid", "qvec", model)
    assert(luts.count() == queries.count() * 8 * 16)
    // IVF-PQ: coarse probe lists bound the scan; result must be a subset of
    // the exhaustive ADC scan restricted to probed candidates
    val ivf = IvfIndexTestAccess.train(items, "ivec", nlist = 8)
    val assign = IvfIndexTestAccess.assignments(items, "nid", "ivec", ivf)
    val probes = IvfIndexTestAccess.probeLists(queries, "qid", "qvec", ivf, nprobe = 4)
    val cand = probes.join(assign, Seq("list")).select(col("qid"), col("nid"))
    val ivfPq = PqIndex.topKFromCodes(codes, "nid", luts, "qid", k = 5, Some(cand))
    assert(ivfPq.count() > 0)
    val perQuery = ivfPq.groupBy("qid").count().agg(max("count")).as[Long].head()
    assert(perQuery <= 5)
  }

  test("residual IVF-PQ: list-keyed codes/LUTs, probed-list scoring, rerank recall") {
    val items = emb.select(col("vec_id").as("nid"), col("embedding").as("ivec"))
    val queries = emb.where(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val ivf = IvfIndexTestAccess.train(items, "ivec", nlist = 8)
    val model = PqIndex.trainResidual(items, "ivec", ivf, m = 8, codes = 16)
    val codes = PqIndex.encodeResidual(items, "nid", "ivec", model, ivf)
    // one owner list and m codes per item, consistent with assignments
    assert(codes.count() == items.count() * 8)
    val assign = IvfIndexTestAccess.assignments(items, "nid", "ivec", ivf)
    assert(codes.select(col("nid"), col("list").as("clist")).distinct()
      .join(assign, Seq("nid"))
      .where(col("clist") =!= col("list")).count() == 0)
    val luts = PqIndex.lookupTablesResidual(queries, "qid", "qvec", model, ivf, nprobe = 4)
    assert(luts.count() == queries.count() * 4 * 8 * 16)
    // scored items ⊆ items whose owner list is probed
    val adc = PqIndex.topKFromCodesResidual(codes, "nid", luts, "qid", k = 5)
    val probes = IvfIndexTestAccess.probeLists(queries, "qid", "qvec", ivf, nprobe = 4)
    val cand = probes.join(assign, Seq("list")).select(col("qid"), col("nid"))
    assert(adc.join(cand, Seq("qid", "nid"), "left_anti").count() == 0)
    // full-probe residual rerank == brute force (every list probed, the
    // shortlist covers the table, so the exact re-rank must be exact)
    val brute = Similarity.topKBrute(items, "nid", "ivec", queries, "qid", "qvec", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val full = PqIndex.topKRerankResidual(items, "nid", "ivec",
        queries, "qid", "qvec", k = 5, model, ivf,
        nprobe = 8, shortlist = items.count().toInt)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(full == brute, "full-probe full-shortlist residual rerank must equal brute force")
    // production shape keeps useful recall on these embeddings
    val reranked = PqIndex.topKRerankResidual(items, "nid", "ivec",
        queries, "qid", "qvec", k = 5, model, ivf, nprobe = 4, shortlist = 50)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = brute.count(reranked.contains).toDouble / brute.size
    assert(recall >= 0.5, s"residual IVF-PQ recall $recall at nprobe=4, shortlist=50")
  }

  test("compact residual ADC == exploded residual ADC, row for row") {
    val items = emb.select(col("vec_id").as("nid"), col("embedding").as("ivec"))
    val queries = emb.where(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val ivf = IvfIndexTestAccess.train(items, "ivec", nlist = 8)
    val model = PqIndex.trainResidual(items, "ivec", ivf, m = 8, codes = 16)
    val exploded = PqIndex.topKFromCodesResidual(
        PqIndex.encodeResidual(items, "nid", "ivec", model, ivf), "nid",
        PqIndex.lookupTablesResidual(queries, "qid", "qvec", model, ivf, 4),
        "qid", k = 5)
      .select("qid", "nid", "adc_dist", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    val compact = PqIndex.topKFromCompact(
        PqIndex.encodeResidualCompact(items, "nid", "ivec", model, ivf), "nid",
        PqIndex.lookupTablesResidualCompact(queries, "qid", "qvec", model, ivf, 4),
        "qid", k = 5)
      .select("qid", "nid", "adc_dist", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(compact == exploded,
      "compact layout must reproduce the exploded ADC exactly (same integer sums)")
  }

  test("exhaustive compact ADC == exploded full-index ADC, row for row") {
    val items = emb.select(col("vec_id").as("nid"), col("embedding").as("ivec"))
    val queries = emb.where(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val model = PqIndex.train(items, "ivec", m = 8, codes = 16)
    // the exploded (sub, code)-join scan — oracle-shaped, explodes at scale
    val exploded = PqIndex.topKFromCodes(
        PqIndex.encode(items, "nid", "ivec", model), "nid",
        PqIndex.lookupTables(queries, "qid", "qvec", model), "qid", k = 5)
      .select("qid", "nid", "adc_dist", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    // the production scan (broadcast queries + bounded per-partition heap)
    // must reproduce it bit-for-bit: same integer partials, same tie order.
    // queryBlock = 3 forces multiple LUT blocks per partition so the
    // blocking itself is exercised, not just the degenerate one-block case
    val compact = PqIndex.topKExhaustive(
        PqIndex.encodeCompact(items, "nid", "ivec", model), "nid",
        queries, "qid", "qvec", k = 5, model, queryBlock = 3)
      .select("qid", "nid", "adc_dist", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(compact == exploded,
      "exhaustive compact scan must reproduce the exploded full-index ADC exactly")
  }

  test("exhaustive ADC heap keeps the rank-preferred ids when adc ties straddle k") {
    // 20 byte-identical item vectors => a 20-way integer-ADC tie; with k = 5
    // the global rank (adc asc, item asc) must keep ids 1..5. All rows in ONE
    // partition so the per-partition heap (not the final window) decides which
    // tied ids survive — this is exactly the eviction path a tie-break
    // inversion corrupts.
    val base = Array.tabulate(8)(j => 0.1f * (j + 1))
    val items = (1L to 20L).map(id => (id, base.toSeq)).toDF("nid", "ivec")
      .coalesce(1)
    val queries = Seq((100L, Array.fill(8)(0.5f).toSeq)).toDF("qid", "qvec")
    val model = PqIndex.train(items, "ivec", m = 4, codes = 4)
    val got = PqIndex.topKExhaustive(
        PqIndex.encodeCompact(items, "nid", "ivec", model), "nid",
        queries, "qid", "qvec", k = 5, model)
      .select("qid", "nid", "rank")
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(got.map(_._2).toSeq == Seq(1L, 2L, 3L, 4L, 5L),
      s"adc-tied ids must survive in (adc asc, item asc) order, got ${got.toSeq}")
  }

  test("cosine_similarity: exact on unit axes, null on mismatched dims") {
    import graft.functions.cosine_similarity
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(3.0f, 4.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val r = df.select(cosine_similarity(col("a"), col("b"))).collect()
    assert(r(0).getDouble(0) == 0.0)
    assert(r(1).getDouble(0) == 1.0)
    assert(r(2).getDouble(0) == 1.0)
  }

  test("int8 quantization: per-element error <= scale/2, zero vectors safe, top-k recall holds") {
    import graft.ann.{Quantize, Similarity}
    val rnd = new scala.util.Random(23)
    val dim = 16
    // 4 well-separated clusters + a zero vector
    val vecs = (0L until 200L).map { id =>
      val c = (id % 4).toInt
      id -> Array.tabulate(dim)(j =>
        (if (j % 4 == c) 2.0f else 0.0f) + rnd.nextFloat() * 0.2f)
    } :+ (999L -> Array.fill(dim)(0.0f))
    val df = vecs.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val q = Quantize.quantizeInt8(df, "embedding")
    val rows = q.select($"vec_id", $"embedding", $"q_codes", $"q_scale")
      .as[(Long, Seq[Float], Seq[Byte], Double)].collect()
    rows.foreach { case (id, v, codes, scale) =>
      assert(codes.length == dim)
      if (id == 999L) assert(scale == 0.0 && codes.forall(_ == 0))
      else {
        assert(scale > 0)
        v.zip(codes).foreach { case (x, c) =>
          assert(math.abs(x - c * scale) <= scale / 2 + 1e-9,
            s"vec $id: |$x - ${c * scale}| > ${scale / 2}")
          assert(c >= -127 && c <= 127)
        }
      }
    }
    // recall of dequantized top-5 vs exact top-5 on the cluster structure
    val dq = q.select($"vec_id",
      Quantize.dequantize($"q_codes", $"q_scale").as("dvec"))
    val queries = df.where($"vec_id" % 40 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val exact = Similarity.topKBrute(
        df.select($"vec_id".as("nid"), $"embedding".as("ivec")), "nid", "ivec",
        queries, "qid", "qvec", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val quant = Similarity.topKBrute(
        dq.select($"vec_id".as("nid"), $"dvec".as("ivec")), "nid", "ivec",
        queries, "qid", "qvec", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    // within a cluster every member is a near-tie, and quantization may
    // legitimately reorder near-ties — the semantically meaningful
    // invariant is that neighbors stay IN the query's cluster; plain
    // set-overlap is a looser secondary bound
    quant.foreach { case (qid, nid) =>
      assert(nid == 999L || nid % 4 == qid % 4,
        s"quantized neighbor $nid left query $qid's cluster")
    }
    val recall = exact.count(quant.contains).toDouble / exact.size
    assert(recall >= 0.7, s"int8 recall@5 = $recall")
  }
}
