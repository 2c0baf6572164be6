package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Mbb, TileBoundary}

/** The shared prefix planner, plus the equivalence property that pins the
  * 2-D STRtree-accelerated implementation ([[SpatialJoin.tileRingPlans]])
  * to it — the round-13 verdict's twin-core drift concern, addressed by a
  * mechanical check instead of merging engines with deliberately
  * different representations (JTS cogroup vs codegen'd box algebra). */
class KnnPlannerSpec extends AnyFunSuite {

  test("prefix plans: radius bounds the prefix, counts reach k, starved cells keep diag") {
    // 4 unit cells on a line at x = 0,1,2,3; counts 2,0,1,5
    val boxes = Array.tabulate(4)(i => Array(i.toDouble, 0.0, i + 1.0, 1.0))
    val counts = Map(0 -> 2L, 2 -> 1L, 3 -> 5L)
    val (radii, probes) = KnnPlanner.prefixPlans(boxes, 2, counts, k = 3, diag = 100.0)
    (0 until 4).foreach { c =>
      assert(probes(c).nonEmpty)
      assert(probes(c).map(counts(_)).sum >= 3, s"cell $c prefix must hold >= k")
      // radius = max box distance over the chosen prefix
      val m = probes(c).map(o => KnnPlanner.maxDist(boxes(c), boxes(o), 2)).max
      assert(radii(c) == m)
    }
    // cell 3 alone holds 5 >= 3: its prefix is itself
    assert(probes(3).toSeq == Seq(3))
    // unreachable k: all diag, no probes
    val (r2, p2) = KnnPlanner.prefixPlans(boxes, 2, counts, k = 9, diag = 100.0)
    assert(r2.forall(_ == 100.0) && p2.forall(_.isEmpty))
    // k <= 0 is degenerate, not an exception
    val (r3, p3) = KnnPlanner.prefixPlans(boxes, 2, counts, k = 0, diag = 100.0)
    assert(r3.forall(_ == 100.0) && p3.forall(_.isEmpty))
  }

  test("probeCap drops the set but keeps the radius") {
    val boxes = Array.tabulate(6)(i => Array(i.toDouble, 0.0, i + 1.0, 1.0))
    val counts = (0 until 6).map(_ -> 1L).toMap
    val (radii, probes) = KnnPlanner.prefixPlans(boxes, 2, counts, k = 4,
      diag = 100.0, probeCap = 2)
    assert(probes.forall(_.isEmpty), "4-cell prefixes exceed cap 2")
    assert(radii.forall(_ < 100.0), "radii survive the cap")
  }

  test("2-D tileRingPlans == generic prefix plans on random tilings (drift pin)") {
    val rnd = new scala.util.Random(1234)
    (1 to 40).foreach { trial =>
      val nT = 1 + rnd.nextInt(40)
      val tiles = Array.tabulate(nT) { i =>
        val x = rnd.nextDouble() * 100; val y = rnd.nextDouble() * 100
        val w = 0.5 + rnd.nextDouble() * 10; val h = 0.5 + rnd.nextDouble() * 10
        TileBoundary(i, Mbb(x, y, x + w, y + h))
      }
      // random occupancy incl. zero-count and out-of-range entries the
      // planners must ignore
      val stats: Map[Int, (Long, Double)] = (0 until nT)
        .filter(_ => rnd.nextBoolean())
        .map(t => t -> (rnd.nextInt(8).toLong, rnd.nextDouble()))
        .toMap + (nT + 5 -> (3L, 0.1)) + (-1 -> (3L, 0.1))
      val k = 1 + rnd.nextInt(10)
      val (sets, mhds) = SpatialJoin.tileRingPlans(tiles, stats, k)
      val boxes = tiles.map(t =>
        Array(t.mbb.xmin, t.mbb.ymin, t.mbb.xmax, t.mbb.ymax))
      val counts = stats.map { case (t, (c, _)) => t -> c }
      val (_, probes) = KnnPlanner.prefixPlans(boxes, 2, counts, k,
        diag = 1e9, probeCap = Int.MaxValue)
      (0 until nT).foreach { c =>
        assert(sets(c).toSeq == probes(c).toSeq,
          s"trial $trial tile $c: STRtree prefix ${sets(c).toSeq} != " +
            s"generic ${probes(c).toSeq} (k=$k)")
        // and the ring max-half-diagonal is the max over the same prefix
        if (sets(c).nonEmpty) {
          val want = sets(c).map(t => stats(t)._2).max
          assert(mhds(c) == want)
        }
      }
    }
  }

  test("3-D treePlans == generic prefix plans on random octrees (drift pin)") {
    // the tree-indexed variant the quadratic budget demands at sf10 leaf
    // counts: bit-identical radii AND probe sets on random point sets —
    // including duplicated points (stacked data), empty subtrees, and
    // counts that never reach k
    val rnd = new scala.util.Random(99)
    (1 to 30).foreach { trial =>
      val nPts = 1 + rnd.nextInt(300)
      val pts = Array.fill(nPts) {
        val p = Array(rnd.nextDouble() * 100, rnd.nextDouble() * 100,
          rnd.nextDouble() * 100)
        p
      }
      // duplicate a fifth of the points to exercise the stacked shape
      val stacked = pts ++ pts.take(nPts / 5) ++ pts.take(nPts / 5)
      val root = Array(0.0, 0.0, 0.0, 100.0, 100.0, 100.0)
      val tree = Octree3d.build(stacked, root,
        leafCap = 1 + rnd.nextInt(8), maxDepth = 6)
      // occupancy by owner leaf — some leaves zero, counts vary
      val counts = stacked.groupBy(p => tree.owner(p(0), p(1), p(2)))
        .map { case (o, ps) => o -> ps.length.toLong }
      val k = 1 + rnd.nextInt(12)
      val diag = math.sqrt(3.0) * 100
      val (rq, pq) = KnnPlanner.prefixPlans(tree.leafBoxes, 3, counts, k,
        diag, probeCap = 64, quadBudget = Long.MaxValue)
      val (rt, pt) = KnnPlanner.treePlans(tree.boxes, tree.childBase,
        tree.leafOrd, tree.leafBoxes, 3, counts, k, diag, probeCap = 64)
      (0 until tree.numLeaves).foreach { c =>
        assert(rq(c) == rt(c),
          s"trial $trial leaf $c: radius ${rt(c)} != quadratic ${rq(c)} (k=$k)")
        assert(pq(c).toSeq == pt(c).toSeq,
          s"trial $trial leaf $c: probe set ${pt(c).toSeq} != " +
            s"quadratic ${pq(c).toSeq} (k=$k)")
      }
    }
  }
}
