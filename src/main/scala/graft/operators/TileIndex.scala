package graft.operators

import org.locationtech.jts.geom.Envelope
import org.locationtech.jts.index.strtree.STRtree

import graft.core.{Mbb, TileBoundary}

/** Broadcast-able spatial index over tile boundaries — the Spark replacement
  * for the reference's cache-file partition index + per-task R-tree
  * (/root/reference/src/transform/manipulate_2d.cpp:218-234).
  *
  * `tilesFor` maps an object MBB to every intersecting tile (the 1->N
  * replication of manipulate_2d.cpp:159-178); objects that intersect no tile
  * (possible for sample-derived str/hc tiles) fall back to the tile with the
  * nearest center, so no object is ever dropped.
  *
  * `refTile` implements reference-point deduplication: a joined pair is
  * emitted only in the unique tile owning the bottom-left corner of the two
  * envelopes' intersection, removing the reference's global sort+uniq dedup
  * job (queryprocessor_2d.cpp:393-445).
  */
final class TileIndex(val tiles: Array[TileBoundary], val space: Mbb)
    extends Serializable {

  @transient private lazy val tree: STRtree = {
    val t = new STRtree()
    tiles.foreach { tb =>
      t.insert(new Envelope(tb.mbb.xmin, tb.mbb.xmax, tb.mbb.ymin, tb.mbb.ymax), tb)
    }
    t.build()
    t
  }

  def tilesFor(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Array[Int] = {
    val env = new Envelope(xmin, xmax, ymin, ymax)
    val hits = tree.query(env)
    if (!hits.isEmpty) {
      val out = new Array[Int](hits.size())
      var i = 0
      while (i < hits.size()) {
        out(i) = hits.get(i).asInstanceOf[TileBoundary].tileId; i += 1
      }
      out
    } else {
      // fallback: nearest tile center, deterministic tie-break on tileId
      val m = Mbb(xmin, ymin, xmax, ymax)
      var best = tiles(0); var bestD = Double.PositiveInfinity
      tiles.foreach { tb =>
        val d = tb.mbb.centerDist2(m)
        if (d < bestD || (d == bestD && tb.tileId < best.tileId)) { best = tb; bestD = d }
      }
      Array(best.tileId)
    }
  }

  /** The unique tile owning point (x,y) under half-open tile semantics
    * ([xmin,xmax) except at the space's right/top edge). -1 if none. */
  def refTile(x: Double, y: Double): Int = {
    val hits = tree.query(new Envelope(x, x, y, y))
    var i = 0
    while (i < hits.size()) {
      val tb = hits.get(i).asInstanceOf[TileBoundary]
      val m = tb.mbb
      val inX = x >= m.xmin && (x < m.xmax || (x == m.xmax && m.xmax == space.xmax))
      val inY = y >= m.ymin && (y < m.ymax || (y == m.ymax && m.ymax == space.ymax))
      if (inX && inY) return tb.tileId
      i += 1
    }
    -1
  }
}
