package graft.partition

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Mbb, TileBoundary}
import graft.functions.hilbert

/** Fully distributed Hilbert-run tiling — the 100 TB form of the hc
  * partitioner (SURVEY G5): instead of collecting a driver-side sample, the
  * WHOLE envelope relation is range-sorted by the Hilbert value of its
  * normalized center (a distributed sort), indexed with one
  * count-per-partition pass (`zipWithIndex`, no single-partition window),
  * and chopped into runs of `bucket` rows whose union MBBs become tiles.
  * Only the final tile list (n/bucket rows) reaches the driver.
  */
object DistributedHilbert {
  val Order = 16

  /** @param env DataFrame with exactly 4 double columns xmin,ymin,xmax,ymax
    * @param n   relation row count (from the caller's planning stats) */
  def tiles(env: DataFrame, space: Mbb, n: Long, bucket: Int): Array[TileBoundary] = {
    DistributedStr.requireBounded("hc_dist", n, math.max(bucket, 1).toLong)
    val w = math.max(space.width, 1e-12); val h = math.max(space.height, 1e-12)
    val cx = (col("xmin") + col("xmax")) / 2
    val cy = (col("ymin") + col("ymax")) / 2
    val sorted = env.toDF("xmin", "ymin", "xmax", "ymax")
      .withColumn("__h",
        hilbert((cx - space.xmin) / w, (cy - space.ymin) / h, lit(Order)))
      .orderBy("__h")
      .select("xmin", "ymin", "xmax", "ymax")
    val b = math.max(bucket, 1).toLong
    val runs = sorted.rdd.zipWithIndex()
      .map { case (row, i) =>
        (i / b, Mbb(row.getDouble(0), row.getDouble(1), row.getDouble(2), row.getDouble(3)))
      }
      .reduceByKey(_ union _)
      .collect()
    runs.sortBy(_._1).zipWithIndex.map { case ((_, m), i) => TileBoundary(i, m) }
  }
}
