package graft.partition

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Mbb, TileBoundary}

/** Fully distributed strip-line-chop tiling — the 100 TB form of the slc
  * partitioner (SURVEY G6; reference slc_2d.cpp:11-120 sorts a driver-side
  * sample and cuts vertical strips of `bucket` objects). One distributed
  * range-sort by center x; a count-per-partition pass (`zipWithIndex`)
  * finds the run boundaries, and only the n/bucket cut abscissas reach the
  * driver — the strips span the full space height exactly like the
  * sampled [[SlcPartitioner]]'s. */
object DistributedSlc {

  /** @param env DataFrame with exactly 4 double columns xmin,ymin,xmax,ymax
    * @param n   relation row count (from the caller's planning stats) */
  def tiles(env: DataFrame, space: Mbb, n: Long, bucket: Int): Array[TileBoundary] = {
    if (n == 0) return Array(TileBoundary(0, space))
    val b = math.max(bucket, 1).toLong
    DistributedStr.requireBounded("slc_dist", n, b)
    val cx = (col("xmin") + col("xmax")) / 2
    val cuts = env.toDF("xmin", "ymin", "xmax", "ymax")
      .select(cx.as("__cx"))
      .orderBy("__cx")
      .rdd.zipWithIndex()
      .flatMap { case (row, i) => if (i > 0 && i % b == 0) Some(row.getDouble(0)) else None }
      .collect().sorted
    val edges = (space.xmin +:
      cuts.distinct.filter(c => c > space.xmin && c < space.xmax).toSeq) :+ space.xmax
    edges.toArray.sliding(2).zipWithIndex.map { case (Array(lo, hi), id) =>
      TileBoundary(id, Mbb(lo, space.ymin, hi, space.ymax))
    }.toArray
  }
}
