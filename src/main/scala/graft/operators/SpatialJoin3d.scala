package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 3-D MBB spatial join — the Spark counterpart of the reference's 3-D
  * lifecycle (`queryproc3d` / `resque3d` / `map_obj_to_tile_3d` /
  * `get_space_dimension_3d` / `fg3d`, /root/reference/src/README.md:5-15).
  * The reference's shipped 3-D sources are MBB-level (`mbb_3d` R-tree
  * streams, extensions/rtree3d/rtree_traversal3d.h:54-117; the mesh refine
  * stage ships only as prebuilt binaries), so the Spark surface is the MBB
  * join: fixed 3-D grid tiling, object→tile replication, tile-local
  * envelope-intersects refine, reference-point dedup.
  *
  * Everything is COLUMN ARITHMETIC — tiling uses `sequence` + `explode`
  * over per-axis integer cell ranges (whole-stage codegen, no UDF, no
  * broadcast index), the refine is six comparisons, and refpoint dedup is
  * "emit in the cell that owns the intersection's min corner". One shuffle
  * per side (the tile exchange), then a shuffle-hash join per tile — the
  * same plan shape that survives 100 TB in the 2-D engine, minus the JTS
  * stage 3-D never needs.
  */
object SpatialJoin3d {

  /** Column bundle naming the six MBB sides of a relation. */
  final case class Mbb3Cols(xmin: String, ymin: String, zmin: String,
                            xmax: String, ymax: String, zmax: String) {
    def cols: Seq[Column] = Seq(col(xmin), col(ymin), col(zmin),
      col(xmax), col(ymax), col(zmax))
  }

  /** get_space_dimension_3d: global envelope of both sides (one tiny agg). */
  private def space(l: DataFrame, lc: Mbb3Cols, r: DataFrame, rc: Mbb3Cols): Array[Double] = {
    def env(df: DataFrame, c: Mbb3Cols) = df.agg(
      min(col(c.xmin)), min(col(c.ymin)), min(col(c.zmin)),
      max(col(c.xmax)), max(col(c.ymax)), max(col(c.zmax))).head()
    val a = env(l, lc); val b = env(r, rc)
    def mn(i: Int) = math.min(
      if (a.isNullAt(i)) Double.MaxValue else a.getDouble(i),
      if (b.isNullAt(i)) Double.MaxValue else b.getDouble(i))
    def mx(i: Int) = math.max(
      if (a.isNullAt(i)) Double.MinValue else a.getDouble(i),
      if (b.isNullAt(i)) Double.MinValue else b.getDouble(i))
    Array(mn(0), mn(1), mn(2), mx(3), mx(4), mx(5))
  }

  /** fg3d cell id stream for an MBB: per-axis inclusive cell ranges,
    * cross-producted via nested sequence/explode-free arithmetic — we
    * explode ONE flattened sequence of composite ids. Cells are closed on
    * the low edge; max-edge objects clamp into the last cell. */
  private def cellIds(c: Mbb3Cols, sp: Array[Double], n: Int): Column = {
    def axis(lo: Column, hi: Column, smin: Double, smax: Double): (Column, Column) = {
      // span guard: a degenerate (single-point) axis must not divide by
      // zero — ANSI mode would throw casting the resulting Infinity
      val w = lit(math.max(smax - smin, java.lang.Double.MIN_NORMAL) / n)
      val i0 = greatest(lit(0), least(lit(n - 1),
        floor((lo - lit(smin)) / w).cast("int")))
      val i1 = greatest(lit(0), least(lit(n - 1),
        floor((hi - lit(smin)) / w).cast("int")))
      (i0, i1)
    }
    val (x0, x1) = axis(col(c.xmin), col(c.xmax), sp(0), sp(3))
    val (y0, y1) = axis(col(c.ymin), col(c.ymax), sp(1), sp(4))
    val (z0, z1) = axis(col(c.zmin), col(c.zmax), sp(2), sp(5))
    // flatten the 3-D cell range into composite ids: ((x*n)+y)*n+z
    flatten(transform(sequence(x0, x1), ix =>
      flatten(transform(sequence(y0, y1), iy =>
        transform(sequence(z0, z1), iz =>
          (ix * n + iy) * n + iz)))))
  }

  /** The cell owning a point (for reference-point dedup). */
  private def cellOf(x: Column, y: Column, z: Column,
                     sp: Array[Double], n: Int): Column = {
    def ax(v: Column, smin: Double, smax: Double): Column = {
      val w = lit(math.max(smax - smin, java.lang.Double.MIN_NORMAL) / n)
      greatest(lit(0), least(lit(n - 1), floor((v - lit(smin)) / w).cast("int")))
    }
    (ax(x, sp(0), sp(3)) * n + ax(y, sp(1), sp(4))) * n + ax(z, sp(2), sp(5))
  }

  /** 3-D MBB intersects join (closed envelopes, the reference's R-tree
    * `Region` overlap semantics). Output: all left columns ++ all right
    * columns for every intersecting pair, each pair exactly once.
    *
    * @param cellsPerAxis fg3d grid resolution per axis (total tiles =
    *        cellsPerAxis³); size so expected rows/tile fits a task.
    */
  def joinMbb(left: DataFrame, lc: Mbb3Cols,
              right: DataFrame, rc: Mbb3Cols,
              cellsPerAxis: Int = 16): DataFrame = {
    require(cellsPerAxis >= 1 && cellsPerAxis <= 1290,
      "cellsPerAxis^3 must fit an Int tile id")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"column name collision between join sides: $dup")
    val n = cellsPerAxis
    val sp = space(left, lc, right, rc)
    // malformed tolerance (2-D P4 parity): min>max or null rows are dropped
    // here rather than blowing up sequence() mid-tiling
    def wellFormed(c: Mbb3Cols) =
      col(c.xmin) <= col(c.xmax) && col(c.ymin) <= col(c.ymax) &&
        col(c.zmin) <= col(c.zmax)
    val lt = left.where(wellFormed(lc))
      .withColumn("__cell3", explode(cellIds(lc, sp, n)))
    val rt = right.where(wellFormed(rc))
      .withColumn("__cell3", explode(cellIds(rc, sp, n)))
    // refine: closed-interval overlap on all three axes; dedup: the pair is
    // emitted only where the intersection's min corner lives — exactly one
    // cell, columns only (the 2-D engine's TileIndex.refTile, relationally)
    lt.join(rt.hint("shuffle_hash"), Seq("__cell3"))
      .where(col(lc.xmin) <= col(rc.xmax) && col(rc.xmin) <= col(lc.xmax) &&
             col(lc.ymin) <= col(rc.ymax) && col(rc.ymin) <= col(lc.ymax) &&
             col(lc.zmin) <= col(rc.zmax) && col(rc.zmin) <= col(lc.zmax))
      .where(col("__cell3") === cellOf(
        greatest(col(lc.xmin), col(rc.xmin)),
        greatest(col(lc.ymin), col(rc.ymin)),
        greatest(col(lc.zmin), col(rc.zmin)), sp, n))
      .drop("__cell3")
  }

  /** mbb_normalizer_3d: affine map of an MBB into the unit cube of `sp`
    * (reference mbb_normalizer_3d, src/README.md:9). */
  def normalized(df: DataFrame, c: Mbb3Cols, out: String => String): DataFrame = {
    val sp = space(df, c, df.limit(0), c)
    def nx(v: Column, lo: Double, hi: Double) =
      if (hi > lo) (v - lit(lo)) / lit(hi - lo) else lit(0.0)
    df.withColumn(out("xmin"), nx(col(c.xmin), sp(0), sp(3)))
      .withColumn(out("ymin"), nx(col(c.ymin), sp(1), sp(4)))
      .withColumn(out("zmin"), nx(col(c.zmin), sp(2), sp(5)))
      .withColumn(out("xmax"), nx(col(c.xmax), sp(0), sp(3)))
      .withColumn(out("ymax"), nx(col(c.ymax), sp(1), sp(4)))
      .withColumn(out("zmax"), nx(col(c.zmax), sp(2), sp(5)))
  }
}
