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
    * cluster actually runs. WITHOUT candidates the (sub, code) join fans
    * every code row out to every query — |queries| x |items| x m
    * intermediate rows (a disk-filling 1.3e12 at the sf10 lane's 40k
    * queries x 2M items): fine for oracle-sized relations, wrong for an
    * exhaustive scan at scale. Production full-index scans use
    * [[topKExhaustive]] over the compact layout instead. */
  def topKFromCodes(codes: DataFrame, itemId: String,
                    luts: DataFrame, queryId: String, k: Int,
                    candidates: Option[DataFrame] = None): DataFrame = {
    val scored = candidates match {
      // candidates restrict FIRST: the (sub, code) join fans every code
      // row out to every query, so joining luts before the candidate
      // filter explodes to |queries| x |code rows| intermediates
      // (measured 6.4B rows at the 100x rehearsal's 2M items x 200
      // queries) — restricted, the volume is |candidates| x m
      case Some(cand) =>
        cand.join(codes.hint("shuffle_hash"), Seq(itemId))
          .join(luts, Seq(queryId, "sub", "code"))
      case None => luts.join(codes.hint("shuffle_hash"), Seq("sub", "code"))
    }
    scored
      .where(col(queryId) =!= col(itemId))
      .groupBy(col(queryId), col(itemId))
      .agg(sum(col("dq")).as("adc_dist"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryId))
          .orderBy(col("adc_dist").asc, col(itemId).asc)))
      .where(col("rank") <= k)
      .select(col(queryId), col(itemId), col("adc_dist"), col("rank"))
  }

  /** Flat compact code table: ONE row per item `(itemId, codes:
    * Array[Byte])` — the same codes [[encode]] explodes, packed. The
    * layout for [[topKExhaustive]]'s full-index scan (16 B per item at
    * m=16 instead of m rows). Requires `codes <= 256` (1 B each). */
  def encodeCompact(items: DataFrame, itemId: String, itemVec: String,
                    model: Model): DataFrame = {
    require(model.codebooks.head.length <= 256,
      "compact codes are 1 B each: train with codes <= 256")
    val bc = items.sparkSession.sparkContext.broadcast(model)
    val codesOf = udf { (v: Seq[Float]) =>
      val mdl = bc.value
      val x = normalize(v.toArray.map(_.toDouble))
      val out = new Array[Byte](mdl.m)
      var j = 0
      while (j < mdl.m) {
        out(j) = nearestCode(mdl.codebooks(j), x, j * mdl.subDim).toByte
        j += 1
      }
      out
    }
    items.where(col(itemVec).isNotNull)
      .select(col(itemId), codesOf(col(itemVec)).as("codes"))
  }

  /** Exhaustive ADC top-k over the FULL index — the scan shape that
    * survives scale, replacing the exploded `(sub, code)` join of
    * [[topKFromCodes]]-without-candidates (whose join fans every code row
    * out to every query: |queries| x |items| x m intermediate rows —
    * measured as a disk-filling 1.3e12-row shuffle at the sf10 lane's
    * 40k queries x 2M items). Here nothing data-sized ever shuffles:
    * queries broadcast under [[Similarity.topKBrute]]'s bounded-collect
    * contract, each partition buffers its own compact code rows (16 B per
    * item), builds the per-query LUTs block-by-block (`queryBlock` bounds
    * LUT memory to ~8 MB), and keeps a bounded (query x k) heap; at most
    * |queries| x k rows per partition reach the final exact rank.
    *
    * Integer sums and tie order are IDENTICAL to [[topKFromCodes]] (same
    * normalize, same per-(sub, code) `round(d * QuantScale)` partials,
    * order-independent long sum, rank by (adc asc, item asc)), so results
    * oracle against the exploded tables' SQL — pinned by PqIndexSpec. */
  def topKExhaustive(codes: DataFrame, itemId: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int, model: Model,
                     maxQueries: Int = 100000, queryBlock: Int = 1024): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import Similarity.{cmpAny, sameId}
    val spark = codes.sparkSession
    val qRows = queries.select(col(queryId), col(queryVec))
      .limit(maxQueries + 1).collect()
    require(qRows.length <= maxQueries,
      s"topKExhaustive broadcasts the query side; it has more than " +
        s"$maxQueries rows — use the IVF-restricted ADC paths for large " +
        "query sets (or raise maxQueries explicitly)")
    val qCollected = qRows.flatMap { r =>
      val v = r.getSeq[Float](1)
      if (v == null || r.isNullAt(0)) None
      else Some((r.get(0), normalize(v.toArray.map(_.toDouble))))
    }
    val bcQ = spark.sparkContext.broadcast(qCollected)
    val bcM = spark.sparkContext.broadcast(model)
    val candSchema = StructType(Seq(
      queries.schema(queryId).copy(name = queryId),
      codes.schema(itemId).copy(name = itemId),
      StructField("adc_dist", LongType, nullable = false)))
    // worst-retained-first: PriorityQueue.head is the LARGEST (adc, item),
    // i.e. the candidate the next better one evicts. Both components are
    // natural order: the global rank is (adc asc, item asc), so among
    // adc-equal candidates the LARGEST item is the worst retained.
    val ord = new Ordering[(Long, Any)] {
      override def compare(x: (Long, Any), y: (Long, Any)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c else cmpAny(x._2, y._2)
      }
    }
    implicit val enc = org.apache.spark.sql.Encoders.row(candSchema)
    val codesIdx = codes.schema.fieldIndex("codes")
    val idIdx = codes.schema.fieldIndex(itemId)
    codes.mapPartitions { rows =>
      val qs = bcQ.value
      val mdl = bcM.value
      val m = mdl.m
      val codesN = mdl.codebooks.head.length
      // buffer this partition's packed rows — bounded by partition size
      // (16 B codes + id per item), the premise of the compact layout
      val ids = scala.collection.mutable.ArrayBuffer.empty[Any]
      val cs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      rows.foreach { r =>
        val id = r.get(idIdx)
        val c = r.getAs[Array[Byte]](codesIdx)
        if (id != null && c != null) { ids += id; cs += c }
      }
      val heaps = Array.fill(qs.length)(
        new scala.collection.mutable.PriorityQueue[(Long, Any)]()(ord))
      var qb = 0
      while (qb < qs.length) {
        val qe = math.min(qb + queryBlock, qs.length)
        // per-query LUTs for this block: lut(j * codesN + c) =
        // round(|cent - q_sub|^2 * QuantScale) — the exact integer
        // partials lookupTables emits (same i-ascending summation)
        val luts = new Array[Array[Long]](qe - qb)
        var qi = qb
        while (qi < qe) {
          val x = qs(qi)._2
          val lut = new Array[Long](m * codesN)
          var j = 0
          while (j < m) {
            val cb = mdl.codebooks(j)
            var c = 0
            while (c < codesN) {
              val cent = cb(c)
              var d = 0.0; var i = 0
              while (i < cent.length) {
                val diff = cent(i) - x(j * mdl.subDim + i); d += diff * diff; i += 1
              }
              lut(j * codesN + c) = math.round(d * QuantScale)
              c += 1
            }
            j += 1
          }
          luts(qi - qb) = lut
          qi += 1
        }
        var ii = 0
        while (ii < ids.length) {
          val iid = ids(ii)
          val code = cs(ii)
          qi = qb
          while (qi < qe) {
            if (!sameId(qs(qi)._1, iid)) {
              val lut = luts(qi - qb)
              var s = 0L; var j = 0
              while (j < m) { s += lut(j * codesN + (code(j) & 0xff)); j += 1 }
              val cand = (s, iid)
              val h = heaps(qi)
              if (h.size < k) h.enqueue(cand)
              else if (ord.compare(cand, h.head) < 0) {
                h.dequeue(); h.enqueue(cand)
              }
            }
            qi += 1
          }
          ii += 1
        }
        qb = qe
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, i) =>
        val qid = qs(i)._1
        h.iterator.map { case (s, iid) => Row(qid, iid, s) }
      }
    }.toDF()
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
    *
    * CAVEAT, measured at the 100x rehearsal (SCALE.md): on heavily
    * CLUSTERED corpora (2M vectors in 256 tight clusters), raw-vector
    * codebooks spend their capacity separating clusters, every same-
    * cluster item collapses to the same code word, the ADC shortlist
    * degenerates to id-order and recall@10 collapses to ~0.05. That
    * regime needs [[topKRerankResidual]], which encodes coarse-centroid
    * residuals so codebook capacity covers the within-cluster signal
    * (0.94+ recall on the same data). Output schema matches
    * [[Similarity.topKBrute]]. */
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

  // ------------------------------------------------------ residual IVF-PQ
  //
  // The canonical composition for clustered data: codebooks are trained on
  // COARSE-CENTROID RESIDUALS (v − centroid(owner list), raw space — the
  // same space the IVF quantizer assigns in), the encoded table carries
  // each item's owner list, and lookup tables are per-(query, probed
  // list). The ADC join key (list, sub, code) then restricts scoring to
  // the probed lists BY CONSTRUCTION — no separate candidate relation —
  // and the summed partials approximate the full raw L2:
  // ||q − v||² ≈ ||(q − c_list) − reconstructed_residual||². The exact
  // cosine re-rank at the end absorbs any residual L2/cosine divergence.

  /** Train residual codebooks against an [[IvfIndex.Model]] coarse
    * quantizer — same sample protocol as [[train]], minus normalization
    * (residuals must live in the quantizer's raw space). */
  def trainResidual(items: DataFrame, vecCol: String, ivf: IvfIndex.Model,
                    m: Int = 8, codes: Int = 16,
                    sampleTarget: Int = 20000, seed: Long = 42L,
                    maxIter: Int = 20, tol: Double = 1e-4): Model = {
    val n = items.count()
    val fraction = math.min(1.0, sampleTarget.toDouble / math.max(1, n))
    val sample: Array[Array[Double]] = items
      .select(col(vecCol)).where(col(vecCol).isNotNull)
      .sample(withReplacement = false, fraction, seed)
      .limit(sampleTarget)
      .collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(sample.nonEmpty, "no vectors to train on")
    val dims = sample.iterator.map(_.length).toSet
    require(dims.size == 1,
      s"PQ training requires equal-dimension vectors, sample contains dims $dims")
    val dim = dims.head
    require(dim % m == 0, s"vector dim $dim is not divisible by m=$m subspaces")
    val resid = sample.map { v =>
      val c = ivf.centroids(IvfIndex.nearestCentroidsRaw(ivf, v, 1).head)
      val r = new Array[Double](v.length)
      var i = 0
      while (i < v.length) { r(i) = v(i) - (if (i < c.length) c(i) else 0.0); i += 1 }
      r
    }
    val sub = dim / m
    val books = (0 until m).map { j =>
      val slice = resid.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      KMeans.lloyd(slice, codes, seed + 31L * j, maxIter, tol)
    }.toArray
    Model(books)
  }

  /** `(itemId, list, sub, code)` residual-encoded database: each item's
    * IVF owner list plus its residual's code per subspace. */
  def encodeResidual(items: DataFrame, itemId: String, itemVec: String,
                     model: Model, ivf: IvfIndex.Model): DataFrame = {
    val spark = items.sparkSession
    val bcPq = spark.sparkContext.broadcast(model)
    val bcIvf = spark.sparkContext.broadcast(ivf)
    val enc = udf { (v: Seq[Float]) =>
      val mdl = bcPq.value
      val x = v.toArray.map(_.toDouble)
      val li = IvfIndex.nearestCentroidsRaw(bcIvf.value, x, 1).head
      val c = bcIvf.value.centroids(li)
      val r = new Array[Double](x.length)
      var i = 0
      while (i < x.length) { r(i) = x(i) - (if (i < c.length) c(i) else 0.0); i += 1 }
      (li, Array.tabulate(mdl.m)(j => nearestCode(mdl.codebooks(j), r, j * mdl.subDim)))
    }
    items.where(col(itemVec).isNotNull)
      .select(col(itemId), enc(col(itemVec)).as("e"))
      .select(col(itemId), col("e._1").as("list"),
        posexplode(col("e._2")).as(Seq("sub", "code")))
  }

  /** `(queryId, list, sub, code, dq)` per-probed-list ADC tables: for each
    * of the query's `nprobe` nearest lists, the quantized partial squared
    * distances from its residual AGAINST THAT LIST to every codebook entry
    * (complete per (list, sub), so a code join always finds its partial —
    * nprobe x m x codes rows per query). */
  def lookupTablesResidual(queries: DataFrame, queryId: String, queryVec: String,
                           model: Model, ivf: IvfIndex.Model,
                           nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    val bcPq = spark.sparkContext.broadcast(model)
    val bcIvf = spark.sparkContext.broadcast(ivf)
    val lut = udf { (v: Seq[Float]) =>
      val mdl = bcPq.value
      val q = v.toArray.map(_.toDouble)
      val lists = IvfIndex.nearestCentroidsRaw(bcIvf.value, q, nprobe)
      val codesN = mdl.codebooks.head.length
      val out = new Array[(Int, Int, Int, Long)](lists.length * mdl.m * codesN)
      var k = 0
      lists.foreach { li =>
        val cen = bcIvf.value.centroids(li)
        val rq = new Array[Double](q.length)
        var i = 0
        while (i < q.length) { rq(i) = q(i) - (if (i < cen.length) cen(i) else 0.0); i += 1 }
        var j = 0
        while (j < mdl.m) {
          val cb = mdl.codebooks(j)
          var c = 0
          while (c < cb.length) {
            val cent = cb(c)
            var d = 0.0; var x = 0
            while (x < cent.length) {
              val diff = cent(x) - rq(j * mdl.subDim + x); d += diff * diff; x += 1
            }
            out(k) = (li, j, c, math.round(d * QuantScale))
            k += 1; c += 1
          }
          j += 1
        }
      }
      out
    }
    queries.where(col(queryVec).isNotNull)
      .select(col(queryId), explode(lut(col(queryVec))).as("e"))
      .select(col(queryId), col("e._1").as("list"), col("e._2").as("sub"),
        col("e._3").as("code"), col("e._4").as("dq"))
  }

  /** Residual ADC top-k over [[encodeResidual]] + [[lookupTablesResidual]]
    * relations: the (list, sub, code) join IS the IVF probe restriction —
    * an item scores against a query iff its owner list is probed, with
    * exactly m integer partials per surviving pair. Pure relational
    * algebra, so a persisted residual index oracles in SQL. */
  def topKFromCodesResidual(codes: DataFrame, itemId: String,
                            luts: DataFrame, queryId: String, k: Int): DataFrame =
    luts.join(codes.hint("shuffle_hash"), Seq("list", "sub", "code"))
      .where(col(queryId) =!= col(itemId))
      .groupBy(col(queryId), col(itemId))
      .agg(sum(col("dq")).as("adc_dist"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryId))
          .orderBy(col("adc_dist").asc, col(itemId).asc)))
      .where(col("rank") <= k)
      .select(col(queryId), col(itemId), col("adc_dist"), col("rank"))

  /** Compact residual code table: ONE row per item `(itemId, list,
    * codes: binary)` — m bytes per vector, the production residency
    * layout (16 B at m=16). Code values must fit a byte, i.e. codebooks
    * of ≤ 256 entries — the standard 8-bit PQ. */
  def encodeResidualCompact(items: DataFrame, itemId: String, itemVec: String,
                            model: Model, ivf: IvfIndex.Model): DataFrame = {
    require(model.codebooks.head.length <= 256,
      "compact codes are 1 B each: train with codes <= 256")
    val spark = items.sparkSession
    val bcPq = spark.sparkContext.broadcast(model)
    val bcIvf = spark.sparkContext.broadcast(ivf)
    val enc = udf { (v: Seq[Float]) =>
      val mdl = bcPq.value
      val x = v.toArray.map(_.toDouble)
      val li = IvfIndex.nearestCentroidsRaw(bcIvf.value, x, 1).head
      val c = bcIvf.value.centroids(li)
      val r = new Array[Double](x.length)
      var i = 0
      while (i < x.length) { r(i) = x(i) - (if (i < c.length) c(i) else 0.0); i += 1 }
      val out = new Array[Byte](mdl.m)
      var j = 0
      while (j < mdl.m) {
        out(j) = nearestCode(mdl.codebooks(j), r, j * mdl.subDim).toByte
        j += 1
      }
      (li, out)
    }
    items.where(col(itemVec).isNotNull)
      .select(col(itemId), enc(col(itemVec)).as("e"))
      .select(col(itemId), col("e._1").as("list"), col("e._2").as("codes"))
  }

  /** Compact per-(query, probed list) ADC tables: ONE row per probe,
    * `(queryId, list, lut: array<long>)` with the m × codes quantized
    * partials flattened as `lut(sub * codes + code)`. */
  def lookupTablesResidualCompact(queries: DataFrame, queryId: String,
                                  queryVec: String, model: Model,
                                  ivf: IvfIndex.Model, nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    val bcPq = spark.sparkContext.broadcast(model)
    val bcIvf = spark.sparkContext.broadcast(ivf)
    val lut = udf { (v: Seq[Float]) =>
      val mdl = bcPq.value
      val q = v.toArray.map(_.toDouble)
      val codesN = mdl.codebooks.head.length
      IvfIndex.nearestCentroidsRaw(bcIvf.value, q, nprobe).map { li =>
        val cen = bcIvf.value.centroids(li)
        val rq = new Array[Double](q.length)
        var i = 0
        while (i < q.length) { rq(i) = q(i) - (if (i < cen.length) cen(i) else 0.0); i += 1 }
        val t = new Array[Long](mdl.m * codesN)
        var j = 0
        while (j < mdl.m) {
          val cb = mdl.codebooks(j)
          var c = 0
          while (c < cb.length) {
            val cent = cb(c)
            var d = 0.0; var x = 0
            while (x < cent.length) {
              val diff = cent(x) - rq(j * mdl.subDim + x); d += diff * diff; x += 1
            }
            t(j * codesN + c) = math.round(d * QuantScale)
            c += 1
          }
          j += 1
        }
        (li, t)
      }
    }
    queries.where(col(queryVec).isNotNull)
      .select(col(queryId), explode(lut(col(queryVec))).as("e"))
      .select(col(queryId), col("e._1").as("list"), col("e._2").as("lut"))
  }

  /** Residual ADC top-k over the COMPACT layout — the production ADC
    * scan: the bounded per-(query, probed list) LUT set broadcasts to
    * every task (a query batch is small by contract — same bounded-collect
    * discipline as [[Similarity.topKBrute]]'s query side), and ONE
    * mapPartitions pass over the code table emits a narrow
    * (query, item, adc) row per candidate, summing the m byte-indexed
    * partials in place. No m-per-pair row explosion (the exploded
    * layout's cost, SCALE.md round 7) and no LUT-array copying through a
    * join (a first compact attempt joined the 32 KB LUT onto every
    * candidate row — 7× SLOWER than exploded at the rehearsal despite 8×
    * less shuffle). Identical integer sums and tie order to
    * [[topKFromCodesResidual]], so it oracles against the EXPLODED
    * tables' SQL. `queryId` values must be integral (cast to long). */
  def topKFromCompact(codes: DataFrame, itemId: String,
                      luts: DataFrame, queryId: String, k: Int,
                      maxQueryProbes: Int = 100000): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = codes.sparkSession
    val lutRows = luts.select(col(queryId).cast("long"), col("list"), col("lut"))
      .limit(maxQueryProbes + 1).collect()
    require(lutRows.length <= maxQueryProbes,
      s"topKFromCompact broadcasts the LUT set; it has more than " +
        s"$maxQueryProbes (query, probe) rows — shrink the query batch")
    val byList: Map[Int, Array[(Long, Array[Long])]] = lutRows
      .map(r => (r.getInt(1), (r.getLong(0), r.getSeq[Long](2).toArray)))
      .groupBy(_._1).map { case (l, a) => l -> a.map(_._2) }
    val bc = spark.sparkContext.broadcast(byList)
    val cSchema = codes.schema
    val itemIdx = cSchema.fieldIndex(itemId)
    val listIdx = cSchema.fieldIndex("list")
    val codesIdx = cSchema.fieldIndex("codes")
    val midSchema = StructType(Seq(
      StructField(queryId, LongType, nullable = false),
      cSchema(itemId).copy(nullable = true),
      StructField("adc_dist", LongType, nullable = false)))
    implicit val enc = org.apache.spark.sql.Encoders.row(midSchema)
    codes.mapPartitions { it =>
      val m = bc.value
      it.flatMap { row =>
        val probes = m.getOrElse(row.getInt(listIdx), null)
        if (probes == null) Iterator.empty
        else {
          val cs = row.getAs[Array[Byte]](codesIdx)
          val item = row.get(itemIdx)
          probes.iterator.map { case (qid, lut) =>
            val cn = lut.length / cs.length
            var s = 0L
            var j = 0
            while (j < cs.length) { s += lut(j * cn + (cs(j) & 0xff)); j += 1 }
            Row(qid, item, s)
          }
        }
      }
    }.toDF()
      .where(col(queryId) =!= col(itemId))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryId))
          .orderBy(col("adc_dist").asc, col(itemId).asc)))
      .where(col("rank") <= k)
      .select(col(queryId), col(itemId), col("adc_dist"), col("rank"))
  }

  /** [[topKRerankResidual]] over the compact layout end-to-end. */
  def topKRerankResidualCompact(items: DataFrame, itemId: String, itemVec: String,
                                queries: DataFrame, queryId: String, queryVec: String,
                                k: Int, model: Model, ivf: IvfIndex.Model,
                                nprobe: Int = 8, shortlist: Int = 50): DataFrame = {
    val short = topKFromCompact(
        encodeResidualCompact(items, itemId, itemVec, model, ivf), itemId,
        lookupTablesResidualCompact(queries, queryId, queryVec, model, ivf, nprobe),
        queryId, shortlist)
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

  /** Residual IVF-PQ read path: residual-ADC shortlist over the probed
    * lists, exact cosine re-rank to top-k. The clustered-corpus
    * counterpart of [[topKRerank]] — see the caveat there and the measured
    * contrast in SCALE.md. */
  def topKRerankResidual(items: DataFrame, itemId: String, itemVec: String,
                         queries: DataFrame, queryId: String, queryVec: String,
                         k: Int, model: Model, ivf: IvfIndex.Model,
                         nprobe: Int = 8, shortlist: Int = 50): DataFrame = {
    val short = topKFromCodesResidual(
        encodeResidual(items, itemId, itemVec, model, ivf), itemId,
        lookupTablesResidual(queries, queryId, queryVec, model, ivf, nprobe),
        queryId, shortlist)
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
