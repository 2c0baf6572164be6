package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** fg3d cell id stream for an MBB given as six Column expressions:
    * per-axis inclusive cell ranges, cross-producted via nested
    * sequence/explode-free arithmetic — we explode ONE flattened sequence
    * of composite ids. Cells are closed on the low edge; max-edge objects
    * clamp into the last cell. */
  private def cellIdsExpr(lox: Column, loy: Column, loz: Column,
                          hix: Column, hiy: Column, hiz: Column,
                          sp: Array[Double], n: Int): Column = {
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
    val (x0, x1) = axis(lox, hix, sp(0), sp(3))
    val (y0, y1) = axis(loy, hiy, sp(1), sp(4))
    val (z0, z1) = axis(loz, hiz, sp(2), sp(5))
    // flatten the 3-D cell range into composite ids: ((x*n)+y)*n+z
    flatten(transform(sequence(x0, x1), ix =>
      flatten(transform(sequence(y0, y1), iy =>
        transform(sequence(z0, z1), iz =>
          (ix * n + iy) * n + iz)))))
  }

  private def cellIds(c: Mbb3Cols, sp: Array[Double], n: Int): Column =
    cellIdsExpr(col(c.xmin), col(c.ymin), col(c.zmin),
      col(c.xmax), col(c.ymax), col(c.zmax), sp, n)

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

  /** Exact 3-D kNN join over MBBs (the 3-D analog of the reference's
    * st_nearest; the shipped 3-D surface is MBB-level R-tree traversal,
    * extensions/rtree3d/rtree_traversal3d.h:54-214). Same two-pass
    * owner-cell architecture as the 2-D [[SpatialJoin.knnJoinExact]], but —
    * like [[joinMbb]] — fully relational: MBB gap distance, cell ownership,
    * safety classification and refpoint dedup are all column arithmetic
    * (whole-stage codegen; no JTS, no broadcast index, no cogroup).
    *
    *   1. every left row is assigned its envelope-center owner cell and
    *      joined with the right rows replicated there; a window ranks the
    *      local candidates. A left row is SAFE — local top-k provably
    *      global — when it found k candidates and its k-th distance is
    *      smaller than the gap from its envelope to the owner cell's
    *      boundary (every unseen right row is strictly farther).
    *   2. the unsafe remainder expands its envelope by a per-row radius
    *      (k-th local distance; the space diagonal when the owner cell was
    *      starved), replicates to the covered cells, refpoint-dedups on the
    *      intersection min-corner cell, and re-ranks.
    *
    * `leftId` must uniquely key left rows; `rightId` orders distance ties
    * deterministically (must be unique — it is the tie-break that makes
    * pass-1 ranks globally valid). Output = left cols ++ right cols ++
    * `knn_dist` ++ `knn_rank`. */
  def knnJoinMbb(left: DataFrame, lc: Mbb3Cols, leftId: String,
                 right: DataFrame, rc: Mbb3Cols, rightId: String, k: Int,
                 cellsPerAxis: Int = 8): DataFrame = {
    require(cellsPerAxis >= 1 && cellsPerAxis <= 1290,
      "cellsPerAxis^3 must fit an Int tile id")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"column name collision between join sides: $dup")
    val n = cellsPerAxis
    val sp = space(left, lc, right, rc)
    val spans = Array(sp(3) - sp(0), sp(4) - sp(1), sp(5) - sp(2))
    val diag = math.sqrt(spans.map(s => s * s).sum)
    def wellFormed(c: Mbb3Cols) =
      col(c.xmin) <= col(c.xmax) && col(c.ymin) <= col(c.ymax) &&
        col(c.zmin) <= col(c.zmax)

    // owner cell of the left envelope center + the envelope's gap to that
    // cell's boundary (negative when the envelope out-spans its cell —
    // such rows are never safe and fall through to pass 2)
    def axisIdx(v: Column, smin: Double, smax: Double): Column = {
      val w = lit(math.max(smax - smin, java.lang.Double.MIN_NORMAL) / n)
      greatest(lit(0), least(lit(n - 1), floor((v - lit(smin)) / w).cast("int")))
    }
    def axisEdge(lo: Column, hi: Column, i: Column,
                 smin: Double, smax: Double): Column = {
      val w = math.max(smax - smin, java.lang.Double.MIN_NORMAL) / n
      val cellLo = lit(smin) + i.cast("double") * lit(w)
      val cellHi = when(i === n - 1, lit(smax))
        .otherwise(lit(smin) + (i.cast("double") + 1d) * lit(w))
      least(lo - cellLo, cellHi - hi)
    }
    val cx = (col(lc.xmin) + col(lc.xmax)) / 2
    val cy = (col(lc.ymin) + col(lc.ymax)) / 2
    val cz = (col(lc.zmin) + col(lc.zmax)) / 2
    val ix = axisIdx(cx, sp(0), sp(3))
    val iy = axisIdx(cy, sp(1), sp(4))
    val iz = axisIdx(cz, sp(2), sp(5))
    val edge = least(
      axisEdge(col(lc.xmin), col(lc.xmax), ix, sp(0), sp(3)),
      axisEdge(col(lc.ymin), col(lc.ymax), iy, sp(1), sp(4)),
      axisEdge(col(lc.zmin), col(lc.zmax), iz, sp(2), sp(5)))
    val owner = (ix * n + iy) * n + iz

    // MBB gap distance (0 when intersecting) — column arithmetic
    def gap(lo1: String, hi1: String, lo2: String, hi2: String): Column =
      greatest(col(lo1) - col(hi2), col(lo2) - col(hi1), lit(0.0))
    val dx = gap(lc.xmin, lc.xmax, rc.xmin, rc.xmax)
    val dy = gap(lc.ymin, lc.ymax, rc.ymin, rc.ymax)
    val dz = gap(lc.zmin, lc.zmax, rc.zmin, rc.zmax)
    val dist = sqrt(dx * dx + dy * dy + dz * dz)

    val lBase = left.where(wellFormed(lc))
    val rt = right.where(wellFormed(rc))
      .withColumn("__cell3", explode(cellIds(rc, sp, n)))

    // ---------------- pass 1: owner-cell candidates + safety classification
    val lt1 = lBase.withColumn("__cell3", owner).withColumn("__edge", edge)
    val p1 = lt1.join(rt.hint("shuffle_hash"), Seq("__cell3"))
      .withColumn("__d", dist)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(leftId))
          .orderBy(col("__d").asc, col(rightId).asc)))
      .where(col("__rk") <= k)
      // consumed by three plans (stats, safe rows, pass-2 radii): persist
      // the small top-k relation, released after the consuming action
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = p1.groupBy(col(leftId)).agg(
      count(lit(1)).as("__cnt"), max(col("__d")).as("__dk"),
      first(col("__edge")).as("__edge1"))
    val safeIds = stats
      .where(col("__cnt") === k && col("__dk") < col("__edge1"))
      .select(col(leftId))

    val outCols = (left.columns ++ right.columns).map(col).toIndexedSeq
    val safePart = p1.join(safeIds, Seq(leftId))
      .select(outCols :+ col("__d").as("knn_dist") :+ col("__rk").as("knn_rank"): _*)

    // ---------------- pass 2: radius-bounded re-join of the unsafe remainder
    val l2 = lBase
      .join(safeIds, Seq(leftId), "left_anti")
      .join(stats.select(col(leftId), col("__cnt"), col("__dk")), Seq(leftId), "left")
      .withColumn("__rad",
        when(col("__cnt").isNull || col("__cnt") < k, lit(diag))
          .otherwise(least(col("__dk"), lit(diag))))
      .withColumn("__ex0", col(lc.xmin) - col("__rad"))
      .withColumn("__ey0", col(lc.ymin) - col("__rad"))
      .withColumn("__ez0", col(lc.zmin) - col("__rad"))
      .withColumn("__ex1", col(lc.xmax) + col("__rad"))
      .withColumn("__ey1", col(lc.ymax) + col("__rad"))
      .withColumn("__ez1", col(lc.zmax) + col("__rad"))
    val lt2 = l2.withColumn("__cell3", explode(cellIdsExpr(
      col("__ex0"), col("__ey0"), col("__ez0"),
      col("__ex1"), col("__ey1"), col("__ez1"), sp, n)))
    val pass2 = lt2.join(rt.hint("shuffle_hash"), Seq("__cell3"))
      .withColumn("__d", dist)
      .where(col("__d") <= col("__rad"))
      // refpoint dedup: emit only in the cell owning the min corner of
      // (expanded left env ∩ right env) — both sides replicate there
      .where(col("__cell3") === cellOf(
        greatest(col("__ex0"), col(rc.xmin)),
        greatest(col("__ey0"), col(rc.ymin)),
        greatest(col("__ez0"), col(rc.zmin)), sp, n))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(leftId))
          .orderBy(col("__d").asc, col(rightId).asc)))
      .where(col("__rk") <= k)
      .select(outCols :+ col("__d").as("knn_dist") :+ col("__rk").as("knn_rank"): _*)

    graft.core.CacheHygiene.unpersistAfterUse(
      safePart.unionByName(pass2), Seq(p1))
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
