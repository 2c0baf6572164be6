package graft.core

import org.locationtech.jts.geom.{Geometry, GeometryFactory, PrecisionModel, Coordinate}
import org.locationtech.jts.io.{WKTReader, WKTWriter, WKBReader, WKBWriter}

/** WKT <-> JTS <-> WKB codecs. JTS readers/writers are not thread-safe, so
  * each executor thread gets its own via ThreadLocal.
  *
  * On-wire geometry representation inside DataFrames is WKB in a
  * BinaryType column: parse WKT once at the scan boundary
  * (the reference re-parses WKT at every stage — e.g.
  * /root/reference/src/resque/resque_2d.cpp:333 and
  * src/transform/manipulate_2d.cpp:117 — which we deliberately avoid).
  */
object GeometryCodec {
  // SRID 4326 for parity with the reference (resque_datastructs_2d.hpp:17).
  val Srid = 4326
  val factory = new GeometryFactory(new PrecisionModel(), Srid)

  private val wktReader = ThreadLocal.withInitial[WKTReader](() => new WKTReader(factory))
  private val wktWriter = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter())
  private val wkbReader = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))
  private val wkbWriter = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter())

  /** Permissive parse: malformed WKT -> null (reference mapper skips bad rows,
    * manipulate_2d.cpp:182-189). */
  def fromWkt(wkt: String): Geometry =
    if (wkt == null || wkt.length < 2) null
    else try wktReader.get.read(wkt) catch { case _: Exception => null }

  def toWkt(g: Geometry): String = wktWriter.get.write(g)

  def fromWkb(bytes: Array[Byte]): Geometry =
    if (bytes == null) null
    else try wkbReader.get.read(bytes) catch { case _: Exception => null }

  def toWkb(g: Geometry): Array[Byte] = wkbWriter.get.write(g)

  def point(x: Double, y: Double): Geometry =
    factory.createPoint(new Coordinate(x, y))

  def box(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Geometry =
    factory.createPolygon(Array(
      new Coordinate(xmin, ymin), new Coordinate(xmax, ymin),
      new Coordinate(xmax, ymax), new Coordinate(xmin, ymax),
      new Coordinate(xmin, ymin)))

  def segment(x1: Double, y1: Double, x2: Double, y2: Double): Geometry =
    factory.createLineString(Array(
      new Coordinate(x1, y1), new Coordinate(x2, y2)))
}
