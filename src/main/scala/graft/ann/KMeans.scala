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
}
