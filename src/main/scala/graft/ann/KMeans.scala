package graft.ann

/** Driver-side Lloyd's k-means core shared by [[IvfIndex]] (full-vector
  * centroids) and [[PqIndex]] (per-subspace codebooks). Deterministic for a
  * fixed machine: seeded init, fixed iteration count/tolerance, and the
  * assignment step fanned across driver cores in FIXED index chunks with
  * partials merged in chunk order, so FP sums are scheduling-independent.
  * Extracted verbatim from the IVF trainer (round 3) — IVF centroids are
  * bit-identical to the pre-extraction ones. */
private[ann] object KMeans {

  /** `sample` must be non-empty with uniform dimension (callers validate
    * with their own error messages). Returns min(k, sample.length)
    * centroids. Empty clusters keep their previous centroid. */
  def lloyd(sample: Array[Array[Double]], nlist: Int, seed: Long,
            maxIter: Int, tol: Double): Array[Array[Double]] = {
    val k = math.min(nlist, sample.length)
    val rnd = new scala.util.Random(seed)
    val centroids = rnd.shuffle(sample.indices.toList).take(k)
      .map(i => sample(i).clone()).toArray

    def nearest(v: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var ci = 0
      while (ci < centroids.length) {
        val c = centroids(ci)
        var d = 0.0; var i = 0
        while (i < c.length && i < v.length) {
          val diff = c(i) - v(i); d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; best = ci }
        ci += 1
      }
      best
    }

    val dim = sample.head.length
    val nChunks = math.min(math.max(1, Runtime.getRuntime.availableProcessors),
      math.max(1, sample.length / 256))
    val bounds = (0 to nChunks).map(c => c.toLong * sample.length / nChunks)
      .map(_.toInt)

    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIter && moved > tol) {
      // assignment fanned across cores in FIXED chunks; partials merged in
      // chunk-index order so FP sums are scheduling-independent
      val partials = java.util.stream.IntStream.range(0, nChunks).parallel()
        .mapToObj[(Array[Array[Double]], Array[Int])] { c =>
          val ps = Array.fill(k)(new Array[Double](dim))
          val pc = new Array[Int](k)
          var j = bounds(c)
          while (j < bounds(c + 1)) {
            val v = sample(j)
            val ci = nearest(v)
            val s = ps(ci)
            var i = 0
            while (i < s.length && i < v.length) { s(i) += v(i); i += 1 }
            pc(ci) += 1
            j += 1
          }
          (ps, pc)
        }
        .collect(java.util.stream.Collectors.toList[(Array[Array[Double]], Array[Int])])
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      partials.forEach { case (ps, pc) =>
        var ci = 0
        while (ci < k) {
          val s = sums(ci); val p = ps(ci)
          var i = 0
          while (i < dim) { s(i) += p(i); i += 1 }
          counts(ci) += pc(ci)
          ci += 1
        }
      }
      moved = 0.0
      var ci = 0
      while (ci < k) {
        if (counts(ci) > 0) { // empty cluster keeps its old centroid
          val c = centroids(ci)
          var i = 0
          while (i < c.length) {
            val nv = sums(ci)(i) / counts(ci)
            val d = nv - c(i); moved += d * d
            c(i) = nv; i += 1
          }
        }
        ci += 1
      }
      iter += 1
    }
    centroids
  }

  /** Index of the nearest center by squared L2 (ties keep the lower
    * index — the same order every assignment loop here uses). */
  def nearestIndex(centers: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var ci = 0
    while (ci < centers.length) {
      val c = centers(ci)
      val len = math.min(c.length, v.length)
      var d = 0.0; var i = 0
      while (i < len) { val diff = c(i) - v(i); d += diff * diff; i += 1 }
      if (d < bestD) { bestD = d; best = ci }
      ci += 1
    }
    best
  }

  /** Squared L2 distance to the nearest center (the k-means|| sampling
    * potential). */
  def minDist2(centers: Array[Array[Double]], v: Array[Double]): Double = {
    var bestD = Double.MaxValue
    var ci = 0
    while (ci < centers.length) {
      val c = centers(ci)
      val len = math.min(c.length, v.length)
      var d = 0.0; var i = 0
      while (i < len) { val diff = c(i) - v(i); d += diff * diff; i += 1 }
      if (d < bestD) bestD = d
      ci += 1
    }
    bestD
  }

  /** WEIGHTED Lloyd — the k-means|| reduce step (Bahmani et al., VLDB'12):
    * the oversampled candidates, weighted by the corpus population each
    * attracts, collapse to k centroids. Candidates are few (~rounds ×
    * oversample), so a single-threaded deterministic loop suffices. Init =
    * the k heaviest candidates (deterministic, population-guided — a
    * random draw could seed on a zero-weight duplicate). */
  def lloydWeighted(points: Array[Array[Double]], w: Array[Double], k0: Int,
                    maxIter: Int, tol: Double): Array[Array[Double]] = {
    require(points.nonEmpty && points.length == w.length)
    val k = math.min(k0, points.length)
    // k-means++-style init, deterministic greedy form: heaviest candidate
    // first, then repeatedly the candidate with the largest w·d² to the
    // chosen set (weighted farthest-point). Top-k-by-weight seeds two
    // centroids in one heavy cluster and none in a light one — the classic
    // local minimum Lloyd cannot escape on well-separated clusters.
    val chosen = new Array[Int](k)
    val d2 = Array.fill(points.length)(Double.MaxValue)
    chosen(0) = w.indices.maxBy(i => (w(i), -i))
    var m = 1
    while (m < k) {
      val last = points(chosen(m - 1))
      var i = 0
      while (i < points.length) {
        val p = points(i)
        val len = math.min(p.length, last.length)
        var d = 0.0; var j = 0
        while (j < len) { val diff = p(j) - last(j); d += diff * diff; j += 1 }
        if (d < d2(i)) d2(i) = d
        i += 1
      }
      chosen(m) = points.indices.maxBy(i => (w(i) * d2(i), -i))
      m += 1
    }
    val centroids = chosen.map(i => points(i).clone())
    val dim = points.head.length
    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIter && moved > tol) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val cw = new Array[Double](k)
      var j = 0
      while (j < points.length) {
        val ci = nearestIndex(centroids, points(j))
        val s = sums(ci); val v = points(j)
        var i = 0
        while (i < dim && i < v.length) { s(i) += w(j) * v(i); i += 1 }
        cw(ci) += w(j)
        j += 1
      }
      moved = 0.0
      var ci = 0
      while (ci < k) {
        if (cw(ci) > 0) { // weightless cluster keeps its old centroid
          val c = centroids(ci)
          // min(c.length, dim): a chosen candidate longer than points.head
          // must not index past the dim-sized sum buffers (the assignment
          // loops tolerate ragged lengths the same way)
          val len = math.min(c.length, dim)
          var i = 0
          while (i < len) {
            val nv = sums(ci)(i) / cw(ci)
            val d = nv - c(i); moved += d * d
            c(i) = nv; i += 1
          }
        }
        ci += 1
      }
      iter += 1
    }
    centroids
  }
}
