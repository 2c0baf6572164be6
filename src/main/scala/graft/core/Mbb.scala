package graft.core

/** Minimum bounding box (envelope) of a 2-D geometry.
  *
  * Mirrors the reference's MBB record `id x1 y1 x2 y2` (see
  * /root/reference/src/transform/manipulate_2d.cpp:132-135) but as a typed
  * value instead of a TSV line.
  */
final case class Mbb(xmin: Double, ymin: Double, xmax: Double, ymax: Double) {
  def intersects(o: Mbb): Boolean =
    xmin <= o.xmax && o.xmin <= xmax && ymin <= o.ymax && o.ymin <= ymax
  def contains(o: Mbb): Boolean =
    xmin <= o.xmin && o.xmax <= xmax && ymin <= o.ymin && o.ymax <= ymax
  def containsPoint(x: Double, y: Double): Boolean =
    xmin <= x && x <= xmax && ymin <= y && y <= ymax
  def expand(d: Double): Mbb = Mbb(xmin - d, ymin - d, xmax + d, ymax + d)
  def union(o: Mbb): Mbb =
    Mbb(math.min(xmin, o.xmin), math.min(ymin, o.ymin),
        math.max(xmax, o.xmax), math.max(ymax, o.ymax))
  def width: Double = xmax - xmin
  def height: Double = ymax - ymin
  def area: Double = width * height
  def centerX: Double = (xmin + xmax) / 2
  def centerY: Double = (ymin + ymax) / 2
  /** Squared distance from this box's center to another box's center. */
  def centerDist2(o: Mbb): Double = {
    val dx = centerX - o.centerX; val dy = centerY - o.centerY
    dx * dx + dy * dy
  }
  def toWkt: String =
    s"POLYGON(($xmin $ymin,$xmax $ymin,$xmax $ymax,$xmin $ymax,$xmin $ymin))"
}

object Mbb {
  val empty: Mbb = Mbb(Double.PositiveInfinity, Double.PositiveInfinity,
                       Double.NegativeInfinity, Double.NegativeInfinity)
  def of(g: org.locationtech.jts.geom.Geometry): Mbb = {
    val e = g.getEnvelopeInternal
    Mbb(e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)
  }
}

/** A spatial partition tile: id + boundary. Mirrors the reference's
  * partition.idx rows `tile_id x1 y1 x2 y2`
  * (/root/reference/src/partitionalgo/fg/fg_2d.cpp:72-83). */
final case class TileBoundary(tileId: Int, mbb: Mbb)
