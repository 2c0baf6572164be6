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

  /** Smallest [[maxDist]] any point of box `b` can have from box `a` —
    * per axis, the point of `b` closest to `a`'s midpoint minimizes the
    * max-distance term (V-shaped in q with the minimum at the midpoint).
    * Monotone under box nesting (a child's value ≥ its parent's), so it
    * is a sound best-first key AND termination bound for prefix search:
    * every leaf under a node with minMaxDist > r has maxDist > r. The
    * plain box min-gap is NOT usable here — for a large query cell the
    * prefix radius is at least the cell's own half-diagonal, and a
    * min-gap-ordered search then pops every node within that radius
    * (measured: ~400 s of driver stall planning the sf10 area tree's
    * big empty gap cells) while minMaxDist stops almost immediately. */
  def minMaxDist(a: Array[Double], b: Array[Double], dim: Int): Double = {
    var s = 0.0
    var ax = 0
    while (ax < dim) {
      val mid = (a(ax) + a(ax + dim)) / 2
      val q = math.max(b(ax), math.min(b(ax + dim), mid))
      val m = math.max(q - a(ax), a(ax + dim) - q)
      s += m * m
      ax += 1
    }
    math.sqrt(s)
  }

  /** [[prefixPlans]] over a TREE tiling, spatially indexed — the variant
    * the quadratic budget demands at large leaf counts (the 3-D analog of
    * SpatialJoin.tileRingPlans). Same plan per cell, bit-identical radii
    * and probe sets (KnnPlannerSpec pins the equivalence): the smallest
    * (maxDist asc, leaf ordinal asc) prefix of occupied leaves whose
    * counts reach k. Found best-first instead of by sorting all occupied
    * cells per cell: subtree occupancy (one bottom-up pass) skips empty
    * subtrees, a min-heap on [[minMaxDist]] pops the most promising
    * nodes first, and the search stops once every unvisited node's
    * minMaxDist exceeds the current prefix radius — any leaf in the
    * true prefix has minMaxDist ≤ maxDist ≤ that radius, so none is
    * missed, and a large cell (whose prefix radius is at least its own
    * half-diagonal) terminates without sweeping everything inside that
    * radius. Cost per cell
    * tracks the k-ball's leaf count, not the tree size: the r15 sf10
    * octree (49k leaves, ~20k occupied) blew the quadratic budget and
    * silently fell back to diagonal radii — every probe then replicated
    * to the whole space and the bound join disk-filled. Arrays are the
    * flat [[Octree3d.Tree]] layout (node boxes, first-child offsets,
    * leaf ordinals); results are indexed by LEAF ordinal. */
  def treePlans(nodeBoxes: Array[Array[Double]], childBase: Array[Int],
                leafOrd: Array[Int], leafBoxes: Array[Array[Double]],
                dim: Int, counts: Map[Int, Long], k: Int, diag: Double,
                probeCap: Int = 64): (Array[Double], Array[Array[Int]]) = {
    val nLeaves = leafBoxes.length
    val radii = Array.fill(nLeaves)(diag)
    val probes = Array.fill(nLeaves)(Array.empty[Int])
    if (k <= 0 || nodeBoxes.isEmpty) return (radii, probes)
    // bottom-up subtree occupancy: children are appended after their
    // parent during the BFS build, so a reverse pass sees children first
    val subCount = new Array[Long](nodeBoxes.length)
    var i = nodeBoxes.length - 1
    while (i >= 0) {
      val cb = childBase(i)
      if (cb < 0) subCount(i) = counts.getOrElse(leafOrd(i), 0L)
      else {
        var s = 0L; var c = 0
        while (c < 8) { s += subCount(cb + c); c += 1 }
        subCount(i) = s
      }
      i -= 1
    }
    if (subCount(0) == 0L) return (radii, probes)
    val ordAsc = Ordering.by[(Double, Int), Double](_._1).reverse
    // the retained set is the MINIMAL (maxDist asc, ord asc) prefix whose
    // counts reach k, maintained incrementally: a max-heap on (maxDist,
    // ord) trims any leaf whose strictly-preceding counts already reach k
    // (the naive resort-per-leaf refresh was O(m² log m) and took 204 s
    // at the sf10 tree — this form is O(m log p) with p = prefix size)
    val ordPfx = new Ordering[(Double, Int, Long)] {
      def compare(a: (Double, Int, Long), b: (Double, Int, Long)): Int = {
        val d = java.lang.Double.compare(a._1, b._1)
        if (d != 0) d else Integer.compare(a._2, b._2)
      }
    }
    var cell = 0
    while (cell < nLeaves) {
      val cbox = leafBoxes(cell)
      val pq = scala.collection.mutable.PriorityQueue((0.0, 0))(ordAsc)
      val pfx = new scala.collection.mutable.PriorityQueue[(Double, Int, Long)]()(ordPfx)
      var acc = 0L
      var rHat = diag
      while (pq.nonEmpty && pq.head._1 <= rHat) {
        val (_, node) = pq.dequeue()
        val cb = childBase(node)
        if (cb < 0) {
          pfx.enqueue((maxDist(cbox, nodeBoxes(node), dim), leafOrd(node),
            subCount(node)))
          acc += subCount(node)
          while (acc - pfx.head._3 >= k) acc -= pfx.dequeue()._3
          if (acc >= k) rHat = math.min(rHat, pfx.head._1)
        } else {
          var c = 0
          while (c < 8) {
            val ch = cb + c
            if (subCount(ch) > 0) {
              val d = minMaxDist(cbox, nodeBoxes(ch), dim)
              if (d <= rHat) pq.enqueue((d, ch))
            }
            c += 1
          }
        }
      }
      if (acc >= k) {
        // dequeueAll pops max-first; reversed = ascending (maxDist, ord),
        // so the prefix radius is the last element's maxDist
        val s = pfx.dequeueAll.reverse
        radii(cell) = math.min(s.last._1, diag)
        if (s.length <= probeCap) probes(cell) = s.map(_._2).toArray
      }
      cell += 1
    }
    (radii, probes)
  }
}
