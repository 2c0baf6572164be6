package graft.operators

/** Dimension-generic kNN prefix planner — the ONE algorithm behind the
  * per-cell search plans of every tiled kNN engine here (round-13 verdict
  * #5: the 2-D/3-D twins had re-implemented it three times, and twin code
  * had already drifted once on the store side).
  *
  * Given the tiling's cell boxes and exact right-center counts per cell,
  * the plan for cell `c` is the smallest PREFIX of occupied cells — in
  * increasing max box-to-box distance from `c`, ties by cell id — whose
  * counts sum to ≥ k. Any left row owned by `c` then has ≥ k real
  * candidates inside the prefix, so the prefix's last max-distance is an
  * upper bound on the row's k-th-NN gap distance, and probing exactly
  * those cells yields a per-row bound that is tighter still.
  *
  * Boxes are `Array[Double]` of length 2·dim: lo_0..lo_{dim-1},
  * hi_0..hi_{dim-1} (the 3-D store/join layout; 2-D Mbb maps to
  * [xmin,ymin,xmax,ymax]).
  *
  * This quadratic form (every cell sorts all occupied cells) is budgeted:
  * past `quadBudget` pairs the caller must use a spatially-indexed variant
  * — [[SpatialJoin.tileRingPlans]] is the 2-D STRtree-accelerated
  * implementation of the same rule, pinned to this one by
  * KnnPlannerSpec's equivalence property so the twins cannot drift.
  */
object KnnPlanner {

  /** Max point-to-point distance between two boxes (2·dim layout). */
  def maxDist(a: Array[Double], b: Array[Double], dim: Int): Double = {
    var s = 0.0
    var ax = 0
    while (ax < dim) {
      val m = math.max(a(ax + dim) - b(ax), b(ax + dim) - a(ax))
      s += m * m
      ax += 1
    }
    math.sqrt(s)
  }

  /** Per-cell (fallback radius, probe set) tables. Cells whose occupied
    * prefix never reaches k (right side smaller than k) keep radius
    * `diag` and an empty probe set; probe sets longer than `probeCap`
    * are dropped (radius kept) — the caller's relational fallback path.
    * Returns (radii, probeSets), both indexed by cell id. Empty result
    * (all `diag`, all empty) when the quadratic budget is exceeded. */
  def prefixPlans(boxes: Array[Array[Double]], dim: Int,
                  counts: Map[Int, Long], k: Int, diag: Double,
                  probeCap: Int = 64,
                  quadBudget: Long = 4L * 1000 * 1000)
      : (Array[Double], Array[Array[Int]]) = {
    val cells = boxes.length
    val radii = Array.fill(cells)(diag)
    val probes = Array.fill(cells)(Array.empty[Int])
    val occ = counts.toArray
      .filter { case (o, c) => c > 0 && o >= 0 && o < cells }
      .sortBy(_._1)
    if (k <= 0 || occ.isEmpty || occ.length.toLong * cells > quadBudget)
      return (radii, probes)
    var c = 0
    while (c < cells) {
      val ds = occ.map { case (o, cnt) => (maxDist(boxes(c), boxes(o), dim), o, cnt) }
      scala.util.Sorting.stableSort(ds,
        (x: (Double, Int, Long), y: (Double, Int, Long)) =>
          x._1 < y._1 || (x._1 == y._1 && x._2 < y._2))
      var acc = 0L; var i = 0
      while (i < ds.length && acc < k) { acc += ds(i)._3; i += 1 }
      if (acc >= k) {
        radii(c) = math.min(ds(i - 1)._1, diag)
        if (i <= probeCap) probes(c) = ds.take(i).map(_._2)
      }
      c += 1
    }
    (radii, probes)
  }
}
