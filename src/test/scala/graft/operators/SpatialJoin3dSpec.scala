package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.SpatialJoin3d.Mbb3Cols

/** 3-D MBB join: exactness vs brute force, dedup (each pair once),
  * malformed tolerance, degenerate space, normalization. */
class SpatialJoin3dSpec extends SparkTestBase {
  import spark.implicits._

  private val lc = Mbb3Cols("ax0", "ay0", "az0", "ax1", "ay1", "az1")
  private val rc = Mbb3Cols("bx0", "by0", "bz0", "bx1", "by1", "bz1")

  private def cubes(n: Int, seed: Int, side: Double) = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      val x = rnd.nextDouble() * 100; val y = rnd.nextDouble() * 80
      val z = rnd.nextDouble() * 60; val w = rnd.nextDouble() * side
      (i.toLong, x, y, z, x + w, y + w, z + w)
    }
  }

  test("joinMbb == brute-force cross filter, each pair exactly once") {
    val data = cubes(400, 7, 8.0)
    val a = data.toDF("aid", "ax0", "ay0", "az0", "ax1", "ay1", "az1")
    val b = data.toDF("bid", "bx0", "by0", "bz0", "bx1", "by1", "bz1")
    Seq(1, 4, 16).foreach { cells =>
      val got = SpatialJoin3d.joinMbb(a, lc, b, rc, cellsPerAxis = cells)
        .select("aid", "bid").as[(Long, Long)].collect()
      val want = data.flatMap { p =>
        data.filter(q =>
          p._2 <= q._5 && q._2 <= p._5 &&
          p._3 <= q._6 && q._3 <= p._6 &&
          p._4 <= q._7 && q._4 <= p._7).map(q => (p._1, q._1))
      }
      assert(got.length == got.distinct.length, s"dup pairs at cells=$cells")
      assert(got.toSet == want.toSet, s"cells=$cells")
    }
  }

  test("malformed (min>max) and null rows are dropped, not fatal") {
    val a = Seq((1L, 0.0, 0.0, 0.0, 5.0, 5.0, 5.0),
                (2L, 9.0, 0.0, 0.0, 1.0, 5.0, 5.0)) // xmin > xmax
      .toDF("aid", "ax0", "ay0", "az0", "ax1", "ay1", "az1")
    val b = Seq((10L, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0)).toDF(
      "bid", "bx0", "by0", "bz0", "bx1", "by1", "bz1")
    val got = SpatialJoin3d.joinMbb(a, lc, b, rc, cellsPerAxis = 4)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
  }

  test("degenerate space (all MBBs identical) doesn't divide by zero") {
    val a = Seq((1L, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0),
                (2L, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0))
      .toDF("aid", "ax0", "ay0", "az0", "ax1", "ay1", "az1")
    val b = a.toDF("bid", "bx0", "by0", "bz0", "bx1", "by1", "bz1")
    val got = SpatialJoin3d.joinMbb(a, lc, b, rc, cellsPerAxis = 8).count()
    assert(got == 4)
  }

  test("knnJoinMbb == brute-force global kNN at several grid resolutions") {
    val items = cubes(300, 11, 6.0)
    val probes = cubes(120, 23, 0.0).map(p => (p._1, p._2, p._3, p._4))
    val a = probes.toDF("aid", "ax0", "ay0", "az0")
      .withColumn("ax1", col("ax0")).withColumn("ay1", col("ay0"))
      .withColumn("az1", col("az0"))
    val b = items.toDF("bid", "bx0", "by0", "bz0", "bx1", "by1", "bz1")
    def gap(lo1: Double, hi1: Double, lo2: Double, hi2: Double) =
      math.max(math.max(lo1 - hi2, lo2 - hi1), 0.0)
    val want = probes.flatMap { p =>
      items.map { q =>
        val dx = gap(p._2, p._2, q._2, q._5)
        val dy = gap(p._3, p._3, q._3, q._6)
        val dz = gap(p._4, p._4, q._4, q._7)
        (p._1, q._1, math.sqrt(dx * dx + dy * dy + dz * dz))
      }.sortBy { case (_, bid, d) => (d, bid) }.take(3)
        .zipWithIndex.map { case ((aid, bid, _), i) => (aid, bid, i + 1) }
    }.toSet
    // bruteRightMax = 0 pins the cell machinery: spec-sized rights would
    // otherwise take the tiny-right broadcast nested-loop shortcut
    Seq(1, 4, 8).foreach { cells =>
      val got = SpatialJoin3d.knnJoinMbb(a, lc, "aid", b, rc, "bid", k = 3,
          cellsPerAxis = cells, bruteRightMax = 0)
        .select("aid", "bid", "knn_rank").as[(Long, Long, Int)].collect()
      assert(got.length == want.size, s"row count at cells=$cells")
      assert(got.toSet == want, s"kNN mismatch at cells=$cells")
    }
    // the tiny-right brute branch (default bruteRightMax admits 300
    // rights) answers identically
    val gotBr = SpatialJoin3d.knnJoinMbb(a, lc, "aid", b, rc, "bid", k = 3)
      .select("aid", "bid", "knn_rank").as[(Long, Long, Int)].collect()
    assert(gotBr.toSet == want, "brute branch kNN mismatch")
    // octree tiling: same exact answer at several leaf capacities,
    // including a cap so small the tree bottoms out at maxDepth and a cap
    // so large the tree is a single root leaf
    Seq(4, 64, 100000).foreach { cap =>
      val got = SpatialJoin3d.knnJoinMbbOc(a, lc, "aid", b, rc, "bid", k = 3,
          leafCap = cap, sampleTarget = 200)
        .select("aid", "bid", "knn_rank").as[(Long, Long, Int)].collect()
      assert(got.length == want.size, s"row count at leafCap=$cap")
      assert(got.toSet == want, s"octree kNN mismatch at leafCap=$cap")
    }
    // both join strategies answer identically: broadcastRightMax = 0
    // forces the cell-partitioned shuffle-hash path (the 100 TB branch
    // the default broadcast threshold would skip on spec-sized rights)
    val gotSh = SpatialJoin3d.knnJoinMbb(a, lc, "aid", b, rc, "bid", k = 3,
        cellsPerAxis = 4, broadcastRightMax = 0L, bruteRightMax = 0)
      .select("aid", "bid", "knn_rank").as[(Long, Long, Int)].collect()
    assert(gotSh.toSet == want, "shuffle-hash branch kNN mismatch")
    // both PROBE forms answer identically: probeCollectMax = 0 forces the
    // relational giant-tiling probe (plan/probe joins + kth_smallest
    // aggregate) that the collected-map default skips at spec scale
    val gotRel = SpatialJoin3d.knnJoinMbb(a, lc, "aid", b, rc, "bid", k = 3,
        cellsPerAxis = 4, bruteRightMax = 0, probeCollectMax = 0L)
      .select("aid", "bid", "knn_rank").as[(Long, Long, Int)].collect()
    assert(gotRel.toSet == want, "relational probe branch kNN mismatch")
    val gotRelOc = SpatialJoin3d.knnJoinMbbOc(a, lc, "aid", b, rc, "bid",
        k = 3, leafCap = 64, sampleTarget = 200, probeCollectMax = 0L)
      .select("aid", "bid", "knn_rank").as[(Long, Long, Int)].collect()
    assert(gotRelOc.toSet == want, "octree relational probe kNN mismatch")
  }

  test("knnJoinMbb: multiplicity collapse == uncollapsed on stacked duplicates") {
    // stacked-lattice shape: every right geometry appears 5x with distinct
    // ids (the sf10 pathology in miniature). k = 7 deliberately cuts
    // THROUGH a duplicate group (7 = 5 + 2), so correctness depends on the
    // weighted rank arithmetic keeping boundary tie groups and the
    // re-expansion re-ranking by (dist, id) exactly.
    val base = cubes(60, 31, 6.0)
    val stacked = base.flatMap { c =>
      (0 until 5).map(cp => (c._1 + cp * 1000L, c._2, c._3, c._4, c._5, c._6, c._7))
    }
    val probes = cubes(40, 41, 0.0).map(p => (p._1, p._2, p._3, p._4))
    val a = probes.toDF("aid", "ax0", "ay0", "az0")
      .withColumn("ax1", col("ax0")).withColumn("ay1", col("ay0"))
      .withColumn("az1", col("az0"))
    val b = stacked.toDF("bid", "bx0", "by0", "bz0", "bx1", "by1", "bz1")
    def gap(lo1: Double, hi1: Double, lo2: Double, hi2: Double) =
      math.max(math.max(lo1 - hi2, lo2 - hi1), 0.0)
    val want = probes.flatMap { p =>
      stacked.map { q =>
        val dx = gap(p._2, p._2, q._2, q._5)
        val dy = gap(p._3, p._3, q._3, q._6)
        val dz = gap(p._4, p._4, q._4, q._7)
        (p._1, q._1, math.sqrt(dx * dx + dy * dy + dz * dz))
      }.sortBy { case (_, bid, d) => (d, bid) }.take(7)
        .zipWithIndex.map { case ((aid, bid, _), i) => (aid, bid, i + 1) }
    }.toSet
    def run(dupMin: Long, bMax: Long = SpatialJoin3d.BroadcastRightMax) =
      SpatialJoin3d.knnJoinMbb(a, lc, "aid", b, rc, "bid", k = 7,
          cellsPerAxis = 4, bruteRightMax = 0, broadcastRightMax = bMax,
          dupCollapseMin = dupMin)
        .select("aid", "bid", "knn_rank").as[(Long, Long, Int)].collect().toSet
    val uncollapsed = run(Long.MaxValue)
    assert(uncollapsed == want, "uncollapsed baseline mismatch vs brute force")
    assert(run(0L) == want, "collapsed (broadcast bound join) mismatch")
    assert(run(0L, bMax = 0L) == want, "collapsed (shuffle-hash bound join) mismatch")
    val oc = SpatialJoin3d.knnJoinMbbOc(a, lc, "aid", b, rc, "bid", k = 7,
        leafCap = 16, sampleTarget = 200, dupCollapseMin = 0L)
      .select("aid", "bid", "knn_rank").as[(Long, Long, Int)].collect().toSet
    assert(oc == want, "collapsed octree mismatch")

    // the sf10 shape proper: multiplicity (9) ≫ k (3), so the collapsed
    // path's per-envelope top-k cut must discard the 6 larger ids of each
    // group WITHOUT ever losing a row the global (dist, id) rank needs —
    // including when the top-k straddles two equidistant groups
    val stacked9 = base.flatMap { c =>
      (0 until 9).map(cp => (c._1 + cp * 1000L, c._2, c._3, c._4, c._5, c._6, c._7))
    }
    val b9 = stacked9.toDF("bid", "bx0", "by0", "bz0", "bx1", "by1", "bz1")
    val want9 = probes.flatMap { p =>
      stacked9.map { q =>
        val dx = gap(p._2, p._2, q._2, q._5)
        val dy = gap(p._3, p._3, q._3, q._6)
        val dz = gap(p._4, p._4, q._4, q._7)
        (p._1, q._1, math.sqrt(dx * dx + dy * dy + dz * dz))
      }.sortBy { case (_, bid, d) => (d, bid) }.take(3)
        .zipWithIndex.map { case ((aid, bid, _), i) => (aid, bid, i + 1) }
    }.toSet
    def run9(bMax: Long) =
      SpatialJoin3d.knnJoinMbb(a, lc, "aid", b9, rc, "bid", k = 3,
          cellsPerAxis = 4, bruteRightMax = 0, broadcastRightMax = bMax,
          dupCollapseMin = 0L)
        .select("aid", "bid", "knn_rank").as[(Long, Long, Int)].collect().toSet
    assert(run9(SpatialJoin3d.BroadcastRightMax) == want9,
      "collapsed mult>k (broadcast) mismatch")
    assert(run9(0L) == want9, "collapsed mult>k (shuffle-hash) mismatch")
  }

  test("Octree3d.build: inseparable duplicate points stop splitting") {
    // 100 positions x 25 identical copies, cap 1 (the sf10 budget-scaled
    // shape): without the separability guard every position recurses to
    // the depth cap and the tree mints ~8*12 chain nodes per position;
    // with it, splitting stops once a node holds one distinct point.
    val pts = (0 until 100).flatMap { i =>
      val x = (i % 10) * 10.0; val y = (i / 10) * 10.0
      Array.fill(25)(Array(x, y, 50.0))
    }.toArray
    val tree = graft.operators.Octree3d.build(
      pts, Array(0.0, 0.0, 0.0, 100.0, 100.0, 100.0), leafCap = 1)
    // isolation needs ~log8(100) ~ 3 levels; give slack to 2k nodes —
    // the degenerate build mints ~10k+
    assert(tree.boxes.length < 2000,
      s"duplicate chains in the octree build: ${tree.boxes.length} nodes")
    // lookups still partition correctly: every point owns a leaf whose
    // box contains it, and the ball walk finds that leaf
    val o = tree.owner(55.0, 55.0, 50.0)
    assert(o >= 0 && o < tree.numLeaves)
    assert(tree.leavesWithinBall(55.0, 55.0, 50.0, 55.0, 55.0, 50.0, 0.1)
      .contains(o))
  }

  test("knnJoinMbb: k larger than the right side returns all, ranked") {
    val a = Seq((1L, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0))
      .toDF("aid", "ax0", "ay0", "az0", "ax1", "ay1", "az1")
    val b = Seq((10L, 5.0, 0.0, 0.0, 6.0, 1.0, 1.0),
                (11L, 9.0, 0.0, 0.0, 9.5, 1.0, 1.0))
      .toDF("bid", "bx0", "by0", "bz0", "bx1", "by1", "bz1")
    // default params: the tiny-right brute branch handles rights < k
    val got = SpatialJoin3d.knnJoinMbb(a, lc, "aid", b, rc, "bid", k = 5,
        cellsPerAxis = 4)
      .select("bid", "knn_rank").as[(Long, Int)].collect().toSet
    assert(got == Set((10L, 1), (11L, 2)))
    // the cell machinery's rights-smaller-than-k behavior is identical
    val gotCell = SpatialJoin3d.knnJoinMbb(a, lc, "aid", b, rc, "bid", k = 5,
        cellsPerAxis = 4, bruteRightMax = 0)
      .select("bid", "knn_rank").as[(Long, Int)].collect().toSet
    assert(gotCell == Set((10L, 1), (11L, 2)))
  }

  test("normalized maps the space envelope to the unit cube") {
    val df = Seq((1L, 10.0, 20.0, 30.0, 20.0, 40.0, 50.0),
                 (2L, 20.0, 40.0, 50.0, 30.0, 60.0, 70.0))
      .toDF("id", "x0", "y0", "z0", "x1", "y1", "z1")
    val n = SpatialJoin3d.normalized(df,
        Mbb3Cols("x0", "y0", "z0", "x1", "y1", "z1"), s => s"n$s")
      .select("id", "nxmin", "nymin", "nzmin", "nxmax", "nymax", "nzmax")
      .as[(Long, Double, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(n(0) == ((1L, 0.0, 0.0, 0.0, 0.5, 0.5, 0.5)))
    assert(n(1) == ((2L, 0.5, 0.5, 0.5, 1.0, 1.0, 1.0)))
  }
}
