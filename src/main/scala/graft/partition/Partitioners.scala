package graft.partition

import scala.collection.mutable.ArrayBuffer
import graft.core.{Mbb, TileBoundary}
import graft.functions.HilbertValue

/** Spatial partitioning algorithms. Each consumes a (sampled) set of object
  * MBBs plus the exact global space envelope and emits tile boundaries
  * targeting ~`bucket` objects per tile — the Spark-side equivalent of the
  * reference's seven partitioner binaries
  * (/root/reference/src/partitionalgo/{fg,bsp,qt,str,hc,slc,bos}).
  *
  * These run on the DRIVER over a bounded sample (the reference does the
  * same: single-reducer partitioning over a sampled MBB stream,
  * queryprocessor_2d.cpp:286-293), and the resulting tile list is broadcast.
  * fg/bsp/qt/slc/bos subdivide the exact space envelope, so their tiles
  * exactly cover the space (refpoint dedup is then exact); str/hc emit
  * sample-derived union MBBs that may not cover the space (the tile index
  * falls back to nearest-tile assignment, and joins fall back to global
  * dedup).
  */
trait SpatialPartitioner extends Serializable {
  def name: String
  /** True if emitted tiles are disjoint and exactly cover `space`. */
  def coversSpace: Boolean
  def partition(mbbs: Array[Mbb], space: Mbb, bucket: Int): Array[TileBoundary]
}

object SpatialPartitioner {
  val all: Map[String, SpatialPartitioner] = Map(
    "fg" -> FixedGridPartitioner, "bsp" -> BspPartitioner,
    "qt" -> QuadtreePartitioner, "str" -> StrPartitioner,
    "hc" -> HilbertPartitioner, "slc" -> SlcPartitioner,
    "bos" -> BosPartitioner)
  def apply(name: String): SpatialPartitioner =
    all.getOrElse(name, throw new IllegalArgumentException(
      s"unknown partitioner '$name' (expected one of ${all.keys.mkString(",")}," +
        " or a distributed form: hc_dist, str_dist, slc_dist, qt_dist, bsp_dist, bos_dist)"))
}

/** Uniform grid with square-ish tiles (reference fg_2d.cpp:29-84). */
object FixedGridPartitioner extends SpatialPartitioner {
  val name = "fg"; val coversSpace = true
  def partition(mbbs: Array[Mbb], space: Mbb, bucket: Int): Array[TileBoundary] =
    partitionCount(mbbs.length.toLong, space, bucket)

  /** Grid dimensions (columns × rows) for a given input size — the only
    * thing the fg split derives from the data besides its envelope. */
  def gridDims(rows: Long, space: Mbb, bucket: Int): (Int, Int) = {
    val n = math.max(rows, 1L)
    val tiles = math.max(1, math.ceil(n.toDouble / math.max(bucket, 1)).toInt)
    val w = math.max(space.width, 1e-12); val h = math.max(space.height, 1e-12)
    val sx = math.max(1, math.round(math.sqrt(tiles * w / h)).toInt)
    val sy = math.max(1, math.ceil(tiles.toDouble / sx).toInt)
    (sx, sy)
  }

  /** The fg grid depends on the input only through its ROW COUNT — no
    * sample contents needed. Planners that already know the exact n call
    * this directly and skip the sample collect entirely (it also removes
    * the sampled-count jitter: tiles = ceil(n/bucket) exactly, which is
    * the arithmetic the SQL oracle re-derives). */
  def partitionCount(rows: Long, space: Mbb, bucket: Int): Array[TileBoundary] = {
    val (sx, sy) = gridDims(rows, space, bucket)
    val w = math.max(space.width, 1e-12); val h = math.max(space.height, 1e-12)
    val out = new ArrayBuffer[TileBoundary](sx * sy)
    var id = 0
    for (j <- 0 until sy; i <- 0 until sx) {
      out += TileBoundary(id, Mbb(
        space.xmin + w * i / sx, space.ymin + h * j / sy,
        if (i == sx - 1) space.xmax else space.xmin + w * (i + 1) / sx,
        if (j == sy - 1) space.ymax else space.ymin + h * (j + 1) / sy))
      id += 1
    }
    out.toArray
  }
}

/** Recursive median split along the longer axis until <= bucket objects
  * (reference BinarySplitNode.hpp:42-229). Splits by object centers; leaf
  * boxes exactly tile the space. */
object BspPartitioner extends SpatialPartitioner {
  val name = "bsp"; val coversSpace = true
  private val MaxDepth = 48
  def partition(mbbs: Array[Mbb], space: Mbb, bucket: Int): Array[TileBoundary] = {
    val out = new ArrayBuffer[Mbb]
    def split(box: Mbb, xs: Array[Double], ys: Array[Double], depth: Int): Unit = {
      if (xs.length <= bucket || depth >= MaxDepth) { out += box; return }
      val vertical = box.width >= box.height
      val keys = if (vertical) xs else ys
      val sorted = keys.sorted
      var cut = sorted(sorted.length / 2)
      val lo = if (vertical) box.xmin else box.ymin
      val hi = if (vertical) box.xmax else box.ymax
      // degenerate median (all keys equal at an edge): nudge to midpoint
      if (cut <= lo || cut >= hi) cut = (lo + hi) / 2
      val leftIdx = keys.indices.filter(i => keys(i) < cut)
      val rightIdx = keys.indices.filter(i => keys(i) >= cut)
      if (leftIdx.isEmpty || rightIdx.isEmpty) { out += box; return }
      val (b1, b2) =
        if (vertical) (box.copy(xmax = cut), box.copy(xmin = cut))
        else (box.copy(ymax = cut), box.copy(ymin = cut))
      split(b1, leftIdx.map(xs).toArray, leftIdx.map(ys).toArray, depth + 1)
      split(b2, rightIdx.map(xs).toArray, rightIdx.map(ys).toArray, depth + 1)
    }
    split(space, mbbs.map(_.centerX), mbbs.map(_.centerY), 0)
    out.iterator.zipWithIndex.map { case (m, i) => TileBoundary(i, m) }.toArray
  }
}

/** Recursive 4-way midpoint split until <= bucket objects (reference
  * QuadtreeNode.hpp:46-133). */
object QuadtreePartitioner extends SpatialPartitioner {
  val name = "qt"; val coversSpace = true
  private val MaxDepth = 24
  def partition(mbbs: Array[Mbb], space: Mbb, bucket: Int): Array[TileBoundary] = {
    val out = new ArrayBuffer[Mbb]
    def split(box: Mbb, pts: Array[(Double, Double)], depth: Int): Unit = {
      if (pts.length <= bucket || depth >= MaxDepth) { out += box; return }
      val cx = box.centerX; val cy = box.centerY
      val quads = Array(
        Mbb(box.xmin, box.ymin, cx, cy), Mbb(cx, box.ymin, box.xmax, cy),
        Mbb(box.xmin, cy, cx, box.ymax), Mbb(cx, cy, box.xmax, box.ymax))
      val groups = Array.fill(4)(new ArrayBuffer[(Double, Double)])
      pts.foreach { case p @ (x, y) =>
        val qi = (if (x >= cx) 1 else 0) + (if (y >= cy) 2 else 0)
        groups(qi) += p
      }
      if (groups.count(_.nonEmpty) <= 1 && depth > 0 && pts.length > bucket &&
          groups.exists(_.length == pts.length)) { out += box; return }
      var i = 0
      while (i < 4) { split(quads(i), groups(i).toArray, depth + 1); i += 1 }
    }
    split(space, mbbs.map(m => (m.centerX, m.centerY)), 0)
    out.iterator.zipWithIndex.map { case (m, i) => TileBoundary(i, m) }.toArray
  }
}

/** Sort-Tile-Recursive packing: sort by center x, slice, sort slices by
  * center y, chop into runs of `bucket`; tile = union MBB of its members
  * (reference str_2d.cpp:139-189 harvests R*-tree leaves — STR packing is
  * the same layout without the tree). */
object StrPartitioner extends SpatialPartitioner {
  val name = "str"; val coversSpace = false
  def partition(mbbs: Array[Mbb], space: Mbb, bucket: Int): Array[TileBoundary] = {
    if (mbbs.isEmpty) return Array(TileBoundary(0, space))
    val b = math.max(bucket, 1)
    val p = math.ceil(mbbs.length.toDouble / b).toInt
    val s = math.max(1, math.ceil(math.sqrt(p)).toInt)
    val sliceSize = math.max(1, math.ceil(mbbs.length.toDouble / s).toInt)
    val byX = mbbs.sortBy(_.centerX)
    val out = new ArrayBuffer[TileBoundary]
    var id = 0
    byX.grouped(sliceSize).foreach { slice =>
      slice.sortBy(_.centerY).grouped(b).foreach { run =>
        out += TileBoundary(id, run.reduce(_ union _)); id += 1
      }
    }
    out.toArray
  }
}

/** Hilbert-curve packing: order objects by the Hilbert value of their
  * normalized center, chop into runs of `bucket`; tile = union MBB of the
  * run (reference hc_2d.cpp:112-207). Admits a fully distributed form
  * (orderBy(hilbert) + row_number) for the 100 TB path. */
object HilbertPartitioner extends SpatialPartitioner {
  val name = "hc"; val coversSpace = false
  val Order = 16
  def partition(mbbs: Array[Mbb], space: Mbb, bucket: Int): Array[TileBoundary] = {
    if (mbbs.isEmpty) return Array(TileBoundary(0, space))
    val w = math.max(space.width, 1e-12); val h = math.max(space.height, 1e-12)
    val n = 1L << Order
    def cell(v: Double): Long = math.min(n - 1, math.max(0L, (v * n).toLong))
    val sorted = mbbs.sortBy { m =>
      HilbertValue.xy2d(Order,
        cell((m.centerX - space.xmin) / w), cell((m.centerY - space.ymin) / h))
    }
    sorted.grouped(math.max(bucket, 1)).zipWithIndex.map { case (run, i) =>
      TileBoundary(i, run.reduce(_ union _))
    }.toArray
  }
}

/** Strip-line chop: sort by center x, cut vertical strips of `bucket`
  * objects spanning the full space height (reference slc_2d.cpp:11-120,
  * fixed x orientation per slc_2d.hpp:83). */
object SlcPartitioner extends SpatialPartitioner {
  val name = "slc"; val coversSpace = true
  def partition(mbbs: Array[Mbb], space: Mbb, bucket: Int): Array[TileBoundary] = {
    if (mbbs.isEmpty) return Array(TileBoundary(0, space))
    val xs = mbbs.map(_.centerX).sorted
    val b = math.max(bucket, 1)
    val cuts = new ArrayBuffer[Double]
    var i = b
    while (i < xs.length) { cuts += xs(i); i += b }
    val edges = (space.xmin +: cuts.distinct.filter(c => c > space.xmin && c < space.xmax)) :+ space.xmax
    edges.toArray.sliding(2).zipWithIndex.map { case (Array(lo, hi), id) =>
      TileBoundary(id, Mbb(lo, space.ymin, hi, space.ymax))
    }.toArray
  }
}

/** Boundary-optimized strips: carve off `bucket` objects per step, choosing
  * an x- or y-cut by which crosses fewer object MBBs (reference
  * bos_2d.cpp:4-170, cost functions bos_2d.hpp:36-90). */
object BosPartitioner extends SpatialPartitioner {
  val name = "bos"; val coversSpace = true
  def partition(mbbs: Array[Mbb], space: Mbb, bucket: Int): Array[TileBoundary] = {
    val b = math.max(bucket, 1)
    val out = new ArrayBuffer[TileBoundary]
    var remainingBox = space
    var remaining = mbbs
    var id = 0
    while (remaining.length > b) {
      val byX = remaining.sortBy(_.centerX)
      val byY = remaining.sortBy(_.centerY)
      val cutX = byX(b - 1).centerX
      val cutY = byY(b - 1).centerY
      val costX = remaining.count(m => m.xmin < cutX && m.xmax > cutX)
      val costY = remaining.count(m => m.ymin < cutY && m.ymax > cutY)
      val useX = costX <= costY
      if (useX && cutX > remainingBox.xmin && cutX < remainingBox.xmax) {
        out += TileBoundary(id, remainingBox.copy(xmax = cutX)); id += 1
        remainingBox = remainingBox.copy(xmin = cutX)
        remaining = byX.drop(b)
      } else if (!useX && cutY > remainingBox.ymin && cutY < remainingBox.ymax) {
        out += TileBoundary(id, remainingBox.copy(ymax = cutY)); id += 1
        remainingBox = remainingBox.copy(ymin = cutY)
        remaining = byY.drop(b)
      } else {
        // degenerate cut (all centers at the strip edge): stop carving
        out += TileBoundary(id, remainingBox)
        return out.toArray
      }
    }
    out += TileBoundary(id, remainingBox)
    out.toArray
  }
}
