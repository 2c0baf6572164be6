package graft.partition

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Mbb, TileBoundary}

/** Distributed quadtree, BSP and BOS tilings driven by EXACT count
  * histograms instead of a driver sample — the 100 TB forms of qt (SURVEY
  * G3, QuadtreeNode.hpp:46-133), bsp (SURVEY G2,
  * BinarySplitNode.hpp:42-229) and bos (SURVEY G7, bos_2d.cpp:4-170). One
  * distributed aggregate buckets every envelope center into a fixed
  * 2^depth × 2^depth grid (≤ 262k cells at depth 9 — a few MB of driver
  * state no matter the relation size); the recursive split logic then
  * runs on the histogram's prefix sums:
  *
  *   - QT: 4-way midpoint splits align exactly with the power-of-two grid,
  *     so every node's count is an O(1) rectangle sum — the same splits
  *     the sampled partitioner makes, but on exact counts;
  *   - BSP: the median cut along the longer axis snaps to the nearest
  *     histogram cell boundary (cell-granular median of the exact
  *     distribution, vs exact median of a sample);
  *   - BOS: strips carve off `bucket` centers from the low side of the
  *     remaining box; the x-vs-y choice compares exact cell-granular
  *     crossing counts from four marginal tables (see [[crossHistogram]]).
  *
  * Trade vs the sampled forms: splits stop at histogram granularity
  * (depth 9 = 2^-9 of each axis; bos strips are bounded by ~2·2^9 per
  * carve axis) instead of sample exhaustion, so extreme point-mass
  * hotspots get coarser leaves — which the join layer's salting /
  * two-level paths already absorb (SCALE.md round-5 measurements). */
object DistributedHisto {

  val Depth = 9
  private val N = 1 << Depth

  /** One-pass exact center histogram over the `2^Depth`-per-axis grid. */
  def histogram(env: DataFrame, space: Mbb): Map[Int, Long] = {
    val w = math.max(space.width, java.lang.Double.MIN_NORMAL) / N
    val h = math.max(space.height, java.lang.Double.MIN_NORMAL) / N
    val cx = (col("xmin") + col("xmax")) / 2
    val cy = (col("ymin") + col("ymax")) / 2
    def ax(v: org.apache.spark.sql.Column, lo: Double, wd: Double) =
      greatest(lit(0), least(lit(N - 1), floor((v - lit(lo)) / lit(wd)).cast("int")))
    env.toDF("xmin", "ymin", "xmax", "ymax")
      .groupBy((ax(cx, space.xmin, w) * N + ax(cy, space.ymin, h)).as("__cell"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  /** P(x)(y) = count in cells [0,x) × [0,y): O(1) rectangle sums. */
  private def prefix(counts: Map[Int, Long]): Array[Array[Long]] = {
    val p = Array.ofDim[Long](N + 1, N + 1)
    var x = 0
    while (x < N) {
      var y = 0
      while (y < N) {
        p(x + 1)(y + 1) = counts.getOrElse(x * N + y, 0L) +
          p(x)(y + 1) + p(x + 1)(y) - p(x)(y)
        y += 1
      }
      x += 1
    }
    p
  }

  private def rect(p: Array[Array[Long]], x0: Int, x1: Int, y0: Int, y1: Int): Long =
    p(x1)(y1) - p(x0)(y1) - p(x1)(y0) + p(x0)(y0)

  /** Distributed qt: midpoint 4-way splits on exact counts. Cell-block
    * coordinates [x0,x1)×[y0,y1) are halved until ≤ bucket or a single
    * histogram cell. */
  def qtTiles(counts: Map[Int, Long], space: Mbb, bucket: Int): Array[TileBoundary] = {
    val p = prefix(counts)
    val b = math.max(bucket, 1)
    val out = new ArrayBuffer[Mbb]
    def boxOf(x0: Int, x1: Int, y0: Int, y1: Int): Mbb = {
      val w = space.width / N; val h = space.height / N
      Mbb(space.xmin + x0 * w, space.ymin + y0 * h,
        if (x1 == N) space.xmax else space.xmin + x1 * w,
        if (y1 == N) space.ymax else space.ymin + y1 * h)
    }
    def split(x0: Int, x1: Int, y0: Int, y1: Int): Unit = {
      if (rect(p, x0, x1, y0, y1) <= b || x1 - x0 <= 1) {
        out += boxOf(x0, x1, y0, y1); return
      }
      val mx = (x0 + x1) / 2; val my = (y0 + y1) / 2
      split(x0, mx, y0, my); split(mx, x1, y0, my)
      split(x0, mx, my, y1); split(mx, x1, my, y1)
    }
    split(0, N, 0, N)
    out.iterator.zipWithIndex.map { case (m, i) => TileBoundary(i, m) }.toArray
  }

  /** Distributed bsp: recursive cell-granular median split along the
    * longer axis on exact counts. */
  def bspTiles(counts: Map[Int, Long], space: Mbb, bucket: Int): Array[TileBoundary] = {
    val p = prefix(counts)
    val b = math.max(bucket, 1)
    val out = new ArrayBuffer[Mbb]
    def boxOf(x0: Int, x1: Int, y0: Int, y1: Int): Mbb = {
      val w = space.width / N; val h = space.height / N
      Mbb(space.xmin + x0 * w, space.ymin + y0 * h,
        if (x1 == N) space.xmax else space.xmin + x1 * w,
        if (y1 == N) space.ymax else space.ymin + y1 * h)
    }
    def split(x0: Int, x1: Int, y0: Int, y1: Int): Unit = {
      val total = rect(p, x0, x1, y0, y1)
      if (total <= b || (x1 - x0 <= 1 && y1 - y0 <= 1)) {
        out += boxOf(x0, x1, y0, y1); return
      }
      val box = boxOf(x0, x1, y0, y1)
      val vertical = if (x1 - x0 <= 1) false
        else if (y1 - y0 <= 1) true
        else box.width >= box.height
      // first cell boundary where the cumulative count reaches half
      var cut = -1
      if (vertical) {
        var x = x0 + 1; var found = false
        while (x < x1 && !found) {
          if (rect(p, x0, x, y0, y1) * 2 >= total) { cut = x; found = true }
          x += 1
        }
        if (cut < 0) cut = (x0 + x1) / 2
        split(x0, cut, y0, y1); split(cut, x1, y0, y1)
      } else {
        var y = y0 + 1; var found = false
        while (y < y1 && !found) {
          if (rect(p, x0, x1, y0, y) * 2 >= total) { cut = y; found = true }
          y += 1
        }
        if (cut < 0) cut = (y0 + y1) / 2
        split(x0, x1, y0, cut); split(x0, x1, cut, y1)
      }
    }
    split(0, N, 0, N)
    out.iterator.zipWithIndex.map { case (m, i) => TileBoundary(i, m) }.toArray
  }

  /** Marginal crossing tables for bos_dist: per axis, counts keyed by
    * (center cell along that axis, min-edge cell) and (center cell,
    * max-edge cell). Four tables of ≤ N² longs each — bounded driver
    * state. They make the strip-cut cost exact at cell granularity in the
    * carve axis: objects not yet carved along x have centerXCell ≥ x0, so
    *
    *   crossers(line X | x0) = #{cx ≥ x0, xminCell < X}
    *                         − #{cx ≥ x0, xmaxCell < X}
    *
    * (xmaxCell < X implies xminCell < X, so the difference counts exactly
    * the spanners). The restriction along the OTHER axis is marginalized
    * out — already-carved strips of the other orientation still
    * contribute — the same kind of estimate the sampled bos makes from
    * its 1-reducer sample (queryprocessor_2d.cpp:286-293); it only
    * influences the x-vs-y choice, never tile disjointness/coverage. */
  final case class CrossTables(xs: Array[Array[Long]], xe: Array[Array[Long]],
                               ys: Array[Array[Long]], ye: Array[Array[Long]])

  /** The center histogram AND all four crossing marginals in ONE
    * distributed aggregate: each row explodes into five (lane, key)
    * pairs — lane 0 the 2-D center cell, lanes 1-4 the (center cell,
    * edge cell) marginals — and a single groupBy counts them all. One
    * scan + one shuffle where the per-table form paid five of each
    * (measured: the five separate planning jobs were bos_dist's entire
    * gap vs bsp_dist). Collected state stays bounded by 5·N² entries. */
  def allHistograms(env: DataFrame, space: Mbb): (Map[Int, Long], CrossTables) = {
    val w = math.max(space.width, java.lang.Double.MIN_NORMAL) / N
    val h = math.max(space.height, java.lang.Double.MIN_NORMAL) / N
    def ax(v: org.apache.spark.sql.Column, lo: Double, wd: Double) =
      greatest(lit(0), least(lit(N - 1), floor((v - lit(lo)) / lit(wd)).cast("int")))
    val df = env.toDF("xmin", "ymin", "xmax", "ymax")
    val cx = ax((col("xmin") + col("xmax")) / 2, space.xmin, w)
    val cy = ax((col("ymin") + col("ymax")) / 2, space.ymin, h)
    def lane(l: Int, c: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
      struct(lit(l).as("l"), (c * N + e).as("k"))
    val rows = df.select(explode(array(
        lane(0, cx, cy),
        lane(1, cx, ax(col("xmin"), space.xmin, w)),
        lane(2, cx, ax(col("xmax"), space.xmin, w)),
        lane(3, cy, ax(col("ymin"), space.ymin, h)),
        lane(4, cy, ax(col("ymax"), space.ymin, h)))).as("s"))
      .groupBy(col("s.l").as("l"), col("s.k").as("k"))
      .agg(count(lit(1)).as("n"))
      .collect()
    val counts = Map.newBuilder[Int, Long]
    val tabs = Array.fill(4)(Array.ofDim[Long](N, N))
    rows.foreach { r =>
      val l = r.getInt(0); val k = r.getInt(1); val n = r.getLong(2)
      if (l == 0) counts += (k -> n)
      else tabs(l - 1)(k / N)(k % N) = n
    }
    (counts.result(), CrossTables(tabs(0), tabs(1), tabs(2), tabs(3)))
  }

  /** Distributed bos: boundary-optimized strips on exact histograms. Each
    * step carves `bucket` centers off the low-x or low-y side of the
    * remaining box — the cut snapping to the first cell boundary holding
    * ≥ bucket centers, the axis chosen by which cut crosses fewer MBBs
    * (cost from [[CrossTables]]). Mirrors the sampled BosPartitioner
    * (bos_2d.cpp:4-170, cost functions bos_2d.hpp:36-90). */
  def bosTiles(counts: Map[Int, Long], cross: CrossTables, space: Mbb,
               bucket: Int): Array[TileBoundary] = {
    val p = prefix(counts)
    val b = math.max(bucket, 1)
    // prefix over (center cell, edge cell) so any #{c ≥ c0, e < E} is O(1)
    def pref(t: Array[Array[Long]]): Array[Array[Long]] = {
      val q = Array.ofDim[Long](N + 1, N + 1)
      var i = 0
      while (i < N) {
        var j = 0
        while (j < N) {
          q(i + 1)(j + 1) = t(i)(j) + q(i)(j + 1) + q(i + 1)(j) - q(i)(j)
          j += 1
        }
        i += 1
      }
      q
    }
    val pxs = pref(cross.xs); val pxe = pref(cross.xe)
    val pys = pref(cross.ys); val pye = pref(cross.ye)
    // #{center cell in [c0,N), edge cell in [0,e)}
    def tail(q: Array[Array[Long]], c0: Int, e: Int): Long =
      q(N)(e) - q(c0)(e)
    val out = new ArrayBuffer[Mbb]
    def boxOf(x0: Int, x1: Int, y0: Int, y1: Int): Mbb = {
      val w = space.width / N; val h = space.height / N
      Mbb(space.xmin + x0 * w, space.ymin + y0 * h,
        if (x1 == N) space.xmax else space.xmin + x1 * w,
        if (y1 == N) space.ymax else space.ymin + y1 * h)
    }
    var x0 = 0; var y0 = 0
    var done = false
    while (!done && rect(p, x0, N, y0, N) > b) {
      // first cell boundary carving ≥ b centers off the remaining box
      def cutAt(vertical: Boolean): Int = {
        if (vertical) {
          var x = x0 + 1
          while (x < N && rect(p, x0, x, y0, N) < b) x += 1
          x
        } else {
          var y = y0 + 1
          while (y < N && rect(p, x0, N, y0, y) < b) y += 1
          y
        }
      }
      val cutX = cutAt(vertical = true)
      val cutY = cutAt(vertical = false)
      val canX = cutX < N; val canY = cutY < N
      if (!canX && !canY) {
        // cell-granularity floor: remaining centers all sit in the last
        // row/column — emit the remainder as one tile (same stop as the
        // sampled form's degenerate-cut branch)
        done = true
      } else {
        val costX = if (canX) tail(pxs, x0, cutX) - tail(pxe, x0, cutX) else Long.MaxValue
        val costY = if (canY) tail(pys, y0, cutY) - tail(pye, y0, cutY) else Long.MaxValue
        if (costX <= costY) {
          out += boxOf(x0, cutX, y0, N); x0 = cutX
        } else {
          out += boxOf(x0, N, y0, cutY); y0 = cutY
        }
      }
    }
    out += boxOf(x0, N, y0, N)
    out.iterator.zipWithIndex.map { case (m, i) => TileBoundary(i, m) }.toArray
  }
}
