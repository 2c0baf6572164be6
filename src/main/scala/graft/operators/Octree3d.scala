package graft.operators

import scala.collection.mutable.{ArrayBuffer, Queue}

/** Octree tiling of a 3-D space — the reconstructed form of the
  * reference's `oc` 3-D partitioner, which ships only as a prebuilt binary
  * (/root/reference/src/README.md:5-15, .MISSING_LARGE_BLOBS:1); the split
  * rule is the 8-way analog of the shipped quadtree's 4-way recursion
  * (QuadtreeNode.hpp:46-133): split any node holding more than `leafCap`
  * sample points at its box midpoints, to a depth cap.
  *
  * Built on the driver from a bounded sample (the spatial partitioners'
  * plan-on-a-sample architecture) and broadcast as three flat arrays —
  * node boxes, first-child offsets, leaf ordinals — so task-side lookups
  * are allocation-light array walks:
  *
  *   - [[Tree.owner]]: midpoint descent (`>= mid` → high child), giving
  *     every point a deterministic owning leaf even outside the root box;
  *   - [[Tree.leavesFor]]: stack walk collecting leaves whose boxes
  *     CLOSED-intersect a query box. Closed tests over-include on shared
  *     faces, which is exactly what replication needs: any point of the
  *     box — in particular a refpoint — has its owner leaf in the set.
  *
  * Adaptive cell sizes are the point: a uniform grid over skewed data
  * leaves most cells empty and kNN search radii cell-diagonal-coarse,
  * while octree leaves track the data density, so every leaf holds ~
  * leafCap rights and probe plans stay tight everywhere.
  */
object Octree3d {

  /** Flat serialized octree. `boxes(i)` = 6 doubles (x0,y0,z0,x1,y1,z1);
    * `childBase(i)` = index of the first of 8 contiguous children, or -1
    * for a leaf; `leafOrd(i)` = dense leaf ordinal, or -1 for inner. */
  final class Tree(val boxes: Array[Array[Double]],
                   val childBase: Array[Int],
                   val leafOrd: Array[Int],
                   val leafBoxes: Array[Array[Double]]) extends Serializable {

    def numLeaves: Int = leafBoxes.length

    /** The leaf owning a point: midpoint descent, `>= mid` takes the high
      * child. Deterministic for every point, including points on split
      * planes and outside the root box (clamping is implicit — the descent
      * follows the nearest children all the way down). */
    def owner(x: Double, y: Double, z: Double): Int = {
      var node = 0
      while (childBase(node) >= 0) {
        val b = boxes(node)
        val ix = if (x >= (b(0) + b(3)) / 2) 4 else 0
        val iy = if (y >= (b(1) + b(4)) / 2) 2 else 0
        val iz = if (z >= (b(2) + b(5)) / 2) 1 else 0
        node = childBase(node) + ix + iy + iz
      }
      leafOrd(node)
    }

    /** All leaves whose boxes closed-intersect the query box. */
    def leavesFor(x0: Double, y0: Double, z0: Double,
                  x1: Double, y1: Double, z1: Double): Array[Int] = {
      val out = new ArrayBuffer[Int]
      val stack = new ArrayBuffer[Int]
      stack += 0
      while (stack.nonEmpty) {
        val node = stack.remove(stack.length - 1)
        val b = boxes(node)
        if (b(0) <= x1 && x0 <= b(3) && b(1) <= y1 && y0 <= b(4) &&
            b(2) <= z1 && z0 <= b(5)) {
          val cb = childBase(node)
          if (cb < 0) out += leafOrd(node)
          else { var c = 0; while (c < 8) { stack += cb + c; c += 1 } }
        }
      }
      out.toArray
    }

    /** All leaves within EUCLIDEAN distance `rad` (+1e-9 rounding slack)
      * of the query box — branch-and-bound on the node-box envelope gap,
      * so whole subtrees outside the ball prune without visiting their
      * leaves. A superset-of-ball / subset-of-[[leavesFor]]-over-the-
      * expanded-box relation holds: every leaf with gap ≤ rad is
      * returned; leaves at gap ∈ (rad, rad+1e-9] may be. */
    def leavesWithinBall(x0: Double, y0: Double, z0: Double,
                         x1: Double, y1: Double, z1: Double,
                         rad: Double): Array[Int] = {
      val rr = rad + 1e-9; val rr2 = rr * rr
      val out = new ArrayBuffer[Int]
      val stack = new ArrayBuffer[Int]
      stack += 0
      while (stack.nonEmpty) {
        val node = stack.remove(stack.length - 1)
        val b = boxes(node)
        val dx = math.max(0.0, math.max(b(0) - x1, x0 - b(3)))
        val dy = math.max(0.0, math.max(b(1) - y1, y0 - b(4)))
        val dz = math.max(0.0, math.max(b(2) - z1, z0 - b(5)))
        if (dx * dx + dy * dy + dz * dz <= rr2) {
          val cb = childBase(node)
          if (cb < 0) out += leafOrd(node)
          else { var c = 0; while (c < 8) { stack += cb + c; c += 1 } }
        }
      }
      out.toArray
    }
  }

  /** Build from sample points (each an (x,y,z) triple) over `rootBox`
    * (6 doubles). Splits while a node holds more than `leafCap` points and
    * depth < `maxDepth` — leaf count is thus bounded by
    * ~8·samples/leafCap, keeping the broadcast and the per-leaf plan
    * tables driver-sized. */
  def build(pts: Array[Array[Double]], rootBox: Array[Double],
            leafCap: Int, maxDepth: Int = 12): Tree = {
    val cap = math.max(1, leafCap)
    val boxes = new ArrayBuffer[Array[Double]]
    val childBase = new ArrayBuffer[Int]
    val leafOrd = new ArrayBuffer[Int]
    val leafBoxes = new ArrayBuffer[Array[Double]]
    boxes += rootBox; childBase += -1; leafOrd += -1
    val queue = Queue((0, rootBox, pts, 0))
    // splitting a node whose points are ALL IDENTICAL can never make
    // progress — every copy lands in the same child forever, so the
    // build recurses straight to maxDepth and mints a chain of ~8·depth
    // useless nodes around every duplicated sample point. Stacked data
    // makes this the COMMON case, not a corner: the sf10 lattice put
    // ~2.5 identical sample copies at each of 8k positions, and with a
    // budget-scaled cap of 1 the tree degenerated to ~10^5 chain leaves
    // whose per-probe ball walks cost ~25 ms and whose replication
    // fan-out disk-filled the bound join. Inseparable point sets stop
    // splitting — the leaf keeps the multiplicity, exactly like a leaf
    // at cap.
    def separable(ps: Array[Array[Double]]): Boolean = {
      val h = ps(0)
      ps.exists(p => p(0) != h(0) || p(1) != h(1) || p(2) != h(2))
    }
    while (queue.nonEmpty) {
      val (node, box, ps, depth) = queue.dequeue()
      if (ps.length > cap && depth < maxDepth && separable(ps)) {
        val mx = (box(0) + box(3)) / 2
        val my = (box(1) + box(4)) / 2
        val mz = (box(2) + box(5)) / 2
        val groups = Array.fill(8)(new ArrayBuffer[Array[Double]])
        ps.foreach { p =>
          val i = (if (p(0) >= mx) 4 else 0) +
            (if (p(1) >= my) 2 else 0) + (if (p(2) >= mz) 1 else 0)
          groups(i) += p
        }
        val base = boxes.length
        childBase(node) = base
        var c = 0
        while (c < 8) {
          val cb = Array(
            if ((c & 4) == 0) box(0) else mx, if ((c & 2) == 0) box(1) else my,
            if ((c & 1) == 0) box(2) else mz,
            if ((c & 4) == 0) mx else box(3), if ((c & 2) == 0) my else box(4),
            if ((c & 1) == 0) mz else box(5))
          boxes += cb; childBase += -1; leafOrd += -1
          queue.enqueue((base + c, cb, groups(c).toArray, depth + 1))
          c += 1
        }
      } else {
        leafOrd(node) = leafBoxes.length
        leafBoxes += box
      }
    }
    new Tree(boxes.toArray, childBase.toArray, leafOrd.toArray, leafBoxes.toArray)
  }
}
