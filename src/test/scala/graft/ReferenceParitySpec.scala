package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.core.GeometryCodec
import graft.functions._
import graft.operators.SpatialJoin

/** Seeded re-creation of the reference's two end-to-end shell tests
  * (/root/reference/test/testPolygonJoins.sh, testPolygonNN.sh): random
  * triangles, bsp partitioning, st_intersects join with projected mindist,
  * and st_nearest2-style kNN (k=3). The reference generator is unseeded
  * (generatePolygons.py:20-21) — these fixtures fix the seed so results are
  * reproducible (SURVEY §5.3).
  */
class ReferenceParitySpec extends SparkTestBase {
  import spark.implicits._

  /** Triangles in [0,120]x[0,60] like generatePolygons.py:22-66 (without its
    * max_y-for-max_x bug). */
  private def triangles(n: Int, seed: Long): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      val x = rnd.nextDouble() * 120; val y = rnd.nextDouble() * 60
      val pts = Seq.fill(2)((x + rnd.nextDouble() * 3, y + rnd.nextDouble() * 3))
      val wkt = s"POLYGON(($x $y,${pts(0)._1} ${pts(0)._2},${pts(1)._1} ${pts(1)._2},$x $y))"
      (i.toLong, wkt)
    }
  }

  test("testPolygonJoins parity: bsp-partitioned st_intersects join + mindist projection") {
    val ta = triangles(1500, seed = 101)
    val tb = triangles(2000, seed = 202)
    val a = ta.toDF("id1", "w1").withColumn("g1", st_geomfromwkt(col("w1"))).drop("w1")
    val b = tb.toDF("id2", "w2").withColumn("g2", st_geomfromwkt(col("w2"))).drop("w2")

    // full pipeline: extract -> bsp partition -> tile map -> RESQUE-style
    // join -> dedup -> projection (reference -f 1:1,2:1,mindist)
    val got = SpatialJoin.join(a, "g1", b, "g2",
        SpatialJoin.Config(predicate = "intersects", partitioner = "bsp", bucket = 120))
      .select(col("id1"), col("id2"), st_distance(col("g1"), col("g2")).as("mindist"))
      .as[(Long, Long, Double)].collect()

    val ga = ta.map { case (i, w) => (i, GeometryCodec.fromWkt(w)) }
    val gb = tb.map { case (i, w) => (i, GeometryCodec.fromWkt(w)) }
    val want = (for { (i, g1) <- ga; (j, g2) <- gb if g1.intersects(g2) }
      yield (i, j)).toSet
    assert(got.length == got.map(r => (r._1, r._2)).toSet.size, "dup pairs")
    assert(got.map(r => (r._1, r._2)).toSet == want)
    assert(got.forall(_._3 == 0.0), "intersecting pairs must project mindist 0")
  }

  test("testPolygonNN parity: st_nearest2-style tile-local kNN, k=3") {
    val ta = triangles(800, seed = 303)
    val tb = triangles(1200, seed = 404)
    val a = ta.toDF("id1", "w1").withColumn("g1", st_geomfromwkt(col("w1"))).drop("w1")
    val b = tb.toDF("id2", "w2").withColumn("g2", st_geomfromwkt(col("w2"))).drop("w2")

    val got = SpatialJoin.knnJoin(a, "g1", b, "g2", k = 3,
        SpatialJoin.Config(partitioner = "bsp", bucket = 150))
      .select("id1", "id2", "knn_dist").as[(Long, Long, Double)].collect()

    val perLeft = got.groupBy(_._1)
    assert(perLeft.values.forall(_.length <= 3))
    assert(perLeft.size >= 780, "nearly every left row finds tile-local neighbors")

    // distances are genuine pairwise distances
    val gb = tb.map { case (i, w) => (i, GeometryCodec.fromWkt(w)) }.toMap
    val ga = ta.map { case (i, w) => (i, GeometryCodec.fromWkt(w)) }.toMap
    got.foreach { case (i, j, d) => assert(ga(i).distance(gb(j)) == d) }

    // tile-local == global top-k for the large majority (boundary rows may
    // legitimately differ — the reference's documented caveat, knn_2d.hpp)
    val wantGlobal = ta.map { case (i, w) =>
      val g1 = GeometryCodec.fromWkt(w)
      i -> gb.toSeq.map { case (j, g2) => (g1.distance(g2), j) }
        .sortBy(identity).take(3).map(_._2).toSet
    }.toMap
    val agree = perLeft.count { case (i, rows) =>
      rows.map(_._2).toSet == wantGlobal(i)
    }
    assert(agree.toDouble / perLeft.size >= 0.8,
      s"tile-local kNN agreed with global for only $agree/${perLeft.size}")
  }
}
