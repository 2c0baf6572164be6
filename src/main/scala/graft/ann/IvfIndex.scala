package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.cosine_similarity

/** IVF (inverted-file) similarity search — the centroid-bucketed scale path
  * next to [[Similarity.topKLsh]]: k-means centroids partition the items;
  * a query scans only its `nprobe` nearest centroid lists instead of the
  * whole table. Centroids train with a driver-side Lloyd's loop on a seeded
  * bounded sample — the same plan-on-a-sample architecture as the spatial
  * partitioners (one distributed pass to sample, milliseconds to cluster;
  * a distributed trainer would pay ~2 Spark jobs PER ITERATION for a
  * <=100k-row input). Deterministic: seeded sample + seeded init + fixed
  * iteration count/tolerance.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]])

  /** Train `nlist` centroids on (a bounded sample of) the item vectors.
    * Driver cost model: the collect holds sampleTarget x dim doubles
    * (default 20k x 768-dim = ~123 MB) and each Lloyd iteration costs
    * sample x nlist x dim multiply-adds, with the assignment step fanned
    * across driver cores in fixed chunks (deterministic merge order).
    * Raise sampleTarget only with driver memory to match — centroid
    * quality saturates well below 20k samples for nlist <= a few hundred. */
  def train(items: DataFrame, vecCol: String, nlist: Int,
            sampleTarget: Int = 20000, seed: Long = 42L,
            maxIter: Int = 20, tol: Double = 1e-4): Model = {
    // Deliberate extra pass: the sample fraction needs n, and train has no
    // stats scan to piggyback on (unlike planTiles). count() prunes to zero
    // columns — parquet row counts come from footers, no vector bytes are
    // read — and train runs once per index, so a representative sample is
    // worth the metadata scan (limit() alone would bias to the first
    // partitions).
    val n = items.count()
    val fraction = math.min(1.0, sampleTarget.toDouble / math.max(1, n))
    val sample: Array[Array[Double]] = items
      .select(col(vecCol)).where(col(vecCol).isNotNull)
      .sample(withReplacement = false, fraction, seed)
      .limit(sampleTarget)
      .collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(sample.nonEmpty, "no vectors to train on")
    // ragged inputs would otherwise fail deep inside the update loop with
    // an index error (assignment tolerates mismatches, the centroid update
    // does not) — reject up front with the actual dimensions
    val dims = sample.iterator.map(_.length).toSet
    require(dims.size == 1,
      s"IVF training requires equal-dimension vectors, sample contains dims $dims")
    Model(KMeans.lloyd(sample, nlist, seed, maxIter, tol))
  }

  /** k-means|| training (Bahmani et al., "Scalable K-Means++", VLDB'12) —
    * the 100 TB option next to the sample-bound default: candidate
    * centroids are drawn DISTRIBUTED over the FULL corpus, each point kept
    * with probability ∝ its squared distance to the current candidate set,
    * so coverage is not limited by what fits in a driver sample; a
    * weighted driver Lloyd then reduces the ~rounds×oversample candidates
    * to `nlist`. Cost: 2 jobs per round (potential sum + draw) for a FIXED
    * `rounds` (5 covers k up to ~10^5 per the paper), plus one weighting
    * scan — independent of corpus size, vs 2 jobs per Lloyd ITERATION for
    * a fully distributed trainer. Deterministic for a fixed partitioning:
    * per-partition seeded RNGs, candidates kept in (round, partition,
    * arrival) order, seeded weighted reduce. Falls back to [[train]] for
    * corpora the default already covers ([[train]] stays the default —
    * quality is sample-bound only when the corpus is both huge and highly
    * clustered). */
  def trainKMeansPar(items: DataFrame, vecCol: String, nlist: Int,
                     seed: Long = 42L, rounds: Int = 5,
                     oversamplePerRound: Int = 0,
                     maxIter: Int = 20, tol: Double = 1e-4): Model = {
    val l = if (oversamplePerRound > 0) oversamplePerRound else math.max(2 * nlist, 8)
    val sc = items.sparkSession.sparkContext
    val vecs = items.select(col(vecCol)).where(col(vecCol).isNotNull)
      .rdd.map { r =>
        val s = r.getSeq[Float](0)
        val a = new Array[Double](s.length)
        var i = 0
        while (i < a.length) { a(i) = s(i); i += 1 }
        a
      }
      // consumed 2×rounds + 2 times; released in the finally below
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val firstOpt = vecs.take(1)
      require(firstOpt.nonEmpty, "no vectors to train on")
      val cands = scala.collection.mutable.ArrayBuffer[Array[Double]](firstOpt(0))
      var r = 1
      var saturated = false
      while (r <= rounds && !saturated) {
        val bc = sc.broadcast(cands.toArray)
        val phi = vecs.map(v => KMeans.minDist2(bc.value, v)).sum()
        if (phi <= 0.0) saturated = true // every point IS a candidate
        else {
          val seedBase = seed * 7919L + r * 131L
          val picked = vecs.mapPartitionsWithIndex { (pi, it) =>
            val rng = new java.util.Random(seedBase + pi)
            it.filter(v => rng.nextDouble() < l * KMeans.minDist2(bc.value, v) / phi)
          }.collect()
          cands ++= picked
        }
        bc.destroy()
        r += 1
      }
      // same ragged-input guard as train(): reject mixed dimensions with
      // the actual values rather than failing deep in the weighted reduce
      val dims = cands.iterator.map(_.length).toSet
      require(dims.size == 1,
        s"IVF training requires equal-dimension vectors, candidates contain dims $dims")
      // weight each candidate by the population it attracts (one scan)
      val bcAll = sc.broadcast(cands.toArray)
      val counts = vecs.map(v => KMeans.nearestIndex(bcAll.value, v))
        .countByValue()
      bcAll.destroy()
      val w = Array.tabulate(cands.length)(i => counts.getOrElse(i, 0L).toDouble)
      Model(KMeans.lloydWeighted(cands.toArray, w, nlist, maxIter, tol))
    } finally vecs.unpersist(blocking = false)
  }

  /** Top-n nearest centroids by L2, allocation-free: a fixed-size
    * insertion list instead of sorting nlist boxed (distance, id) tuples —
    * the tuple sort cost ~40x the arithmetic at 2M items x 256 centroids
    * (measured in the 100x rehearsal: 230 s -> single-digit seconds).
    * Ties keep the lower centroid id, matching the old sortBy order. */
  private[ann] def nearestCentroidsRaw(model: Model, v: Array[Double], n: Int): Array[Int] = {
    val m = model.centroids.length
    val keep = math.min(n, m)
    val bestD = Array.fill(keep)(Double.MaxValue)
    val bestI = Array.fill(keep)(-1)
    var ci = 0
    while (ci < m) {
      val c = model.centroids(ci)
      val len = math.min(c.length, v.length)
      var d = 0.0; var i = 0
      while (i < len) { val diff = c(i) - v(i); d += diff * diff; i += 1 }
      if (d < bestD(keep - 1)) {
        var j = keep - 1
        while (j > 0 && bestD(j - 1) > d) {
          bestD(j) = bestD(j - 1); bestI(j) = bestI(j - 1); j -= 1
        }
        bestD(j) = d; bestI(j) = ci
      }
      ci += 1
    }
    bestI.filter(_ >= 0)
  }

  private[ann] def nearestCentroids(model: Model, v: Seq[Float], n: Int): Array[Int] = {
    val x = new Array[Double](v.length)
    var i = 0
    while (i < v.length) { x(i) = v(i); i += 1 }
    nearestCentroidsRaw(model, x, n)
  }

  /** `(itemId, list)` nearest-centroid assignment — the engine-internal
    * (trained-centroid) half of [[topK]] as a standalone, checkpointable
    * inverted-file table. Null vectors assign to list -1 (probed by no
    * query). */
  /** `items` + nearest-centroid column (null vectors → -1; so do vectors
    * with non-finite components, whose NaN distances beat no centroid —
    * degenerate geometry joins the null quarantine list instead of
    * crashing the scan). The single
    * assignment path — [[assignments]] and
    * [[graft.ann.ClusterSample.withCluster]] both route here so the
    * null/tie conventions live in one place. */
  def withAssignment(items: DataFrame, itemVec: String, model: Model,
                     outCol: String): DataFrame = {
    val bc = items.sparkSession.sparkContext.broadcast(model)
    val assign = udf { (v: Seq[Float]) =>
      if (v == null) -1
      else {
        val a = nearestCentroids(bc.value, v, 1)
        if (a.isEmpty) -1 else a.head
      }
    }
    items.withColumn(outCol, assign(col(itemVec)))
  }

  def assignments(items: DataFrame, itemId: String, itemVec: String,
                  model: Model): DataFrame =
    withAssignment(items, itemVec, model, "list")
      .select(col(itemId), col("list"))

  /** Explode each row to its `nprobe` nearest centroid lists (`outCol`),
    * KEEPING every other column — the payload-preserving sibling of
    * [[probeLists]], for callers that would otherwise pay a corpus-sized
    * id join to re-attach their columns. Null vectors probe nothing and
    * drop. */
  def withProbes(df: DataFrame, vecCol: String, model: Model, nprobe: Int,
                 outCol: String): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val probes = udf { (v: Seq[Float]) =>
      if (v == null) Array.empty[Int] else nearestCentroids(bc.value, v, nprobe)
    }
    df.withColumn(outCol, explode(probes(col(vecCol))))
  }

  /** `(queryId, list)` probe relation: each query's `nprobe` nearest
    * centroid lists, one row per probed list. */
  def probeLists(queries: DataFrame, queryId: String, queryVec: String,
                 model: Model, nprobe: Int): DataFrame =
    withProbes(queries.select(col(queryId), col(queryVec)), queryVec,
      model, nprobe, "list").select(col(queryId), col("list"))

  /** Scale-adaptive salt factor for the list-keyed scoring joins: with
    * few lists relative to the cluster (the local-bench / small-nlist shape),
    * the join's parallelism is bounded by DISTINCT LIST COUNT, and AQE
    * coalesces the tiny-input partitions further — but the exact-cosine
    * work is proportional to the join OUTPUT, which AQE cannot see
    * (guide §2.5: compute-exploding join under-parallelized by
    * input-byte-driven coalescing). Salting the item side `s` ways splits
    * each list's scoring across `s` tasks; each (query, item) pair still
    * meets exactly once (an item carries ONE salt; queries replicate to
    * all salts), so the result set is bit-identical. At production nlist
    * (≥ cores, the IVF sizing rule) `s` = 1 and the plan is unchanged —
    * the salt only engages when the list count under-fills the cluster. */
  private[graft] def listSalt(spark: org.apache.spark.sql.SparkSession,
                            nlist: Int): Int = {
    val conf = spark.conf.getOption("spark.graft.ann.listSalt").map { v =>
      try v.trim.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"spark.graft.ann.listSalt must be an integer (salt factor; " +
            s"1 disables salting), got '$v'")
      }
    }
    val par = spark.sparkContext.defaultParallelism
    val s = conf.getOrElse(
      math.max(1, math.min(64, (2 * par + nlist - 1) / math.max(1, nlist))))
    // the derived default varies with host core count — log the chosen
    // factor once per (nlist, s) so dumped plans/bench records are
    // attributable to their machine shape (round-16 advice)
    if (s > 1 && loggedSalts.add((nlist, s)))
      System.err.println(s"[ivf] listSalt: nlist=$nlist parallelism=$par salt=$s")
    s
  }

  private val loggedSalts =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, Int)]()

  /** Salted list-keyed scoring join: `q JOIN i ON (list, salt)` with the
    * shuffled-hash hint — shared by [[topK]], [[topKFromAssignments]] and
    * [[HardNegatives.candidates]]. `s` == 1 degenerates to the unsalted
    * single-key join. */
  private[graft] def listJoin(bq: DataFrame, bi: DataFrame, listCol: String,
                            itemId: String, s: Int): DataFrame =
    if (s <= 1) bq.join(bi.hint("shuffle_hash"), Seq(listCol))
    else {
      val bi2 = bi.withColumn("__salt",
        pmod(xxhash64(col(itemId)), lit(s.toLong)).cast("int"))
      val bq2 = bq.withColumn("__salt",
        explode(sequence(lit(0), lit(s - 1))))
      bq2.join(bi2.hint("shuffle_hash"), Seq(listCol, "__salt"))
        .drop("__salt")
    }

  /** [[topK]] over precomputed [[assignments]] + [[probeLists]] relations —
    * the persisted-index read path (items/queries join their lists by id
    * instead of recomputing centroid distances), then the identical
    * list-join → exact-cosine → window-top-k tail. Same rows as [[topK]]
    * for matching model/nprobe; downstream of the centroid tables it is
    * pure relational algebra, so a checkpointed index oracles in SQL.
    * `nlist` (when the caller knows it) sizes the [[listSalt]] factor;
    * 0 disables salting. */
  def topKFromAssignments(items: DataFrame, itemId: String, itemVec: String,
                          queries: DataFrame, queryId: String, queryVec: String,
                          k: Int, assign: DataFrame, probes: DataFrame,
                          nlist: Int = 0): DataFrame = {
    val bi = items.join(assign, Seq(itemId))
    val bq = queries.join(probes, Seq(queryId))
    val s = if (nlist > 0) listSalt(items.sparkSession, nlist) else 1
    listJoin(bq, bi, "list", itemId, s)
      .where(col(queryId) =!= col(itemId))
      .withColumn("similarity", cosine_similarity(col(queryVec), col(itemVec)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryId))
          .orderBy(col("similarity").desc, col(itemId).asc)))
      .where(col("rank") <= k)
      .select(col(queryId), col(itemId), col("similarity"), col("rank"))
  }

  /** Approximate top-k: items bucketed by nearest centroid; each query
    * probes its `nprobe` nearest centroid lists, scores exactly, windows to
    * top-k. Output schema matches [[Similarity.topKBrute]]. */
  def topK(items: DataFrame, itemId: String, itemVec: String,
           queries: DataFrame, queryId: String, queryVec: String,
           k: Int, model: Model, nprobe: Int = 4): DataFrame = {
    val spark = items.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val assign = udf { (v: Seq[Float]) =>
      if (v == null) -1 else nearestCentroids(bc.value, v, 1).head
    }
    val probes = udf { (v: Seq[Float]) =>
      if (v == null) Array.empty[Int] else nearestCentroids(bc.value, v, nprobe)
    }
    val bi = items.withColumn("__list", assign(col(itemVec)))
    val bq = queries.withColumn("__list", explode(probes(col(queryVec))))
    listJoin(bq, bi, "__list", itemId,
      listSalt(spark, model.centroids.length))
      .where(col(queryId) =!= col(itemId))
      .withColumn("similarity", cosine_similarity(col(queryVec), col(itemVec)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryId))
          .orderBy(col("similarity").desc, col(itemId).asc)))
      .where(col("rank") <= k)
      .select(col(queryId), col(itemId), col("similarity"), col("rank"))
  }
}
