package graft.core

import org.locationtech.jts.geom.Geometry
import org.scalatest.funsuite.AnyFunSuite

/** The envelope-arithmetic fast paths must be bit-identical to the plain JTS
  * predicates on every shape mix: rect-rect, rect-point, point-point, and
  * mixed with non-rectangular polygons (which must fall through to JTS).
  * Coordinates come from a small integer lattice so boundary-touching,
  * nesting, corner-sharing and coincidence all occur with high frequency —
  * exactly the edge cases where a strict-vs-inclusive inequality slip would
  * show. */
class GeomPredicatesSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(4242)

  private def box(): Geometry = {
    val x = rnd.nextInt(8).toDouble; val y = rnd.nextInt(8).toDouble
    GeometryCodec.box(x, y, x + 1 + rnd.nextInt(3), y + 1 + rnd.nextInt(3))
  }
  private def point(): Geometry =
    GeometryCodec.point(rnd.nextInt(10).toDouble, rnd.nextInt(10).toDouble)
  private def triangle(): Geometry = {
    val x = rnd.nextInt(8).toDouble; val y = rnd.nextInt(8).toDouble
    GeometryCodec.fromWkt(
      s"POLYGON(($x $y,${x + 3} $y,$x ${y + 3},$x $y))")
  }
  private def segment(): Geometry = {
    val x = rnd.nextInt(8).toDouble; val y = rnd.nextInt(8).toDouble
    // short integer-lattice segments: collinear overlaps, shared endpoints
    // and proper crossings all occur
    GeometryCodec.segment(x, y,
      x + rnd.nextInt(5) - 2, y + rnd.nextInt(5) - 2)
  }
  private def shape(): Geometry = rnd.nextInt(5) match {
    case 0 | 1 => box()
    case 2     => point()
    case 3     => segment()
    case _     => triangle()
  }

  test("fast-path predicates agree with plain JTS on 4000 lattice pairs") {
    var checked = 0
    (1 to 4000).foreach { _ =>
      val g1 = shape(); val g2 = shape()
      assert(GeomPredicates.intersects(g1, g2) == g1.intersects(g2), s"intersects $g1 $g2")
      assert(GeomPredicates.touches(g1, g2) == g1.touches(g2), s"touches $g1 $g2")
      assert(GeomPredicates.crosses(g1, g2) == g1.crosses(g2), s"crosses $g1 $g2")
      assert(GeomPredicates.contains(g1, g2) == g1.contains(g2), s"contains $g1 $g2")
      assert(GeomPredicates.within(g1, g2) == g1.within(g2), s"within $g1 $g2")
      assert(GeomPredicates.overlaps(g1, g2) == g1.overlaps(g2), s"overlaps $g1 $g2")
      assert(GeomPredicates.equalsTopo(g1, g2) == g1.equalsTopo(g2), s"equals $g1 $g2")
      assert(GeomPredicates.disjoint(g1, g2) == g1.disjoint(g2), s"disjoint $g1 $g2")
      val d = rnd.nextInt(4) * 0.5
      assert(GeomPredicates.dwithinPlanar(g1, g2, d) == g1.isWithinDistance(g2, d),
        s"dwithin($d) $g1 $g2")
      checked += 1
    }
    assert(checked == 4000)
  }

  test("identical boxes: equal/contains/within true, overlaps/touches false") {
    val a = GeometryCodec.box(1, 1, 4, 4)
    val b = GeometryCodec.box(1, 1, 4, 4)
    assert(GeomPredicates.equalsTopo(a, b))
    assert(GeomPredicates.contains(a, b) && GeomPredicates.within(a, b))
    assert(!GeomPredicates.overlaps(a, b))
    assert(!GeomPredicates.touches(a, b))
  }

  test("point on box boundary: intersects but NOT contained (OGC interior)") {
    val bx = GeometryCodec.box(0, 0, 10, 10)
    val edge = GeometryCodec.point(0, 5)
    val corner = GeometryCodec.point(10, 10)
    val inside = GeometryCodec.point(5, 5)
    Seq(edge, corner).foreach { p =>
      assert(GeomPredicates.intersects(bx, p))
      assert(!GeomPredicates.contains(bx, p), s"boundary point $p not contained")
      assert(GeomPredicates.contains(bx, p) == bx.contains(p))
    }
    assert(GeomPredicates.contains(bx, inside))
  }

  test("degenerate zero-extent rectangle falls back to JTS") {
    val line = GeometryCodec.fromWkt("POLYGON((5 0,5 10,5 10,5 0,5 0))")
    val bx = GeometryCodec.box(0, 0, 10, 10)
    if (line != null) {
      assert(GeomPredicates.touches(bx, line) == bx.touches(line))
      assert(GeomPredicates.contains(bx, line) == bx.contains(line))
      assert(GeomPredicates.overlaps(bx, line) == bx.overlaps(line))
    }
  }
}
