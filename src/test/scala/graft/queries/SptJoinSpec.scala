package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions._

/** q_spjoin_spt: the tiled spatio-temporal join must equal the brute-force
  * cross-join + spatial-and-temporal filter (reference *_spt semantics:
  * spatial predicate AND multi-interval temporal refinement). */
class SptJoinSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("spt join equals brute force, and temporal refinement prunes pairs") {
    val tiled = Queries.qSpjoinSpt(spark, dir)
      .select("pid", "cid", "md").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    def iv(s: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
      struct(s.cast("long").as("start"), e.cast("long").as("end"))
    val parts = Queries.partBoxes(spark, dir).select(
      col("id").as("pid"), col("geom").as("g1"),
      array(
        iv((col("id") % 97) * 10, (col("id") % 97) * 10 + 4 + col("id") % 11),
        iv((col("id") % 97) * 10 + 200, (col("id") % 97) * 10 + 209)).as("ia"))
    val custs = Queries.custPoints(spark, dir).select(
      col("id").as("cid"), col("geom").as("g2"),
      array(
        iv((col("id") % 89) * 10, (col("id") % 89) * 10 + 6),
        iv((col("id") % 89) * 10 + 150, (col("id") % 89) * 10 + 153)).as("ib"))
    val brute = parts.crossJoin(custs)
      .where(st_dwithin(col("g1"), col("g2"), lit(4.0)))
      .where(intervals_mindist(col("ia"), col("ib")) <= 20)
      .select(col("pid"), col("cid"),
        intervals_mindist(col("ia"), col("ib")).as("md"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(tiled == brute)
    assert(tiled.nonEmpty)
    // the temporal refinement must actually prune spatially-joined pairs
    val spatialOnly = parts.crossJoin(custs)
      .where(st_dwithin(col("g1"), col("g2"), lit(4.0))).count()
    assert(spatialOnly > tiled.size)
    // and some surviving pairs are temporally co-occurring, some gapped
    assert(tiled.exists(_._3 == 0L) && tiled.exists(_._3 > 0L))
  }
}
