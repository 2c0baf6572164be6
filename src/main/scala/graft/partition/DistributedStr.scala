package graft.partition

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Mbb, TileBoundary}

/** Fully distributed Sort-Tile-Recursive tiling — the 100 TB form of the
  * str partitioner (SURVEY G4; reference str_2d.cpp:139-189 packs a
  * driver-side sample). Instead of collecting a sample, the WHOLE envelope
  * relation is packed with two distributed sorts:
  *
  *   1. range-sort by center x; one count-per-partition pass
  *      (`zipWithIndex`, no single-partition window) assigns each row its
  *      x-rank, and `rank / sliceSize` its vertical slice (`sliceSize` =
  *      n / √(n/bucket), the classic STR slice count);
  *   2. range-sort by (slice, center y); because every slice except the
  *      last holds exactly `sliceSize` rows, the second global rank
  *      recovers the slice (`rank / sliceSize`) and the y-run within it
  *      (`(rank % sliceSize) / bucket`) without carrying state between
  *      passes.
  *
  * Runs union-reduce into tile MBBs map-side (`reduceByKey`), so only the
  * final tile list (n/bucket rows) ever reaches the driver — the same
  * bounded-driver discipline as [[DistributedHilbert]]. Tile layout is
  * identical in shape to the sampled StrPartitioner's: x-sorted slices,
  * y-sorted runs of `bucket`, tile = union MBB of its members.
  */
object DistributedStr {

  /** Cap on the planned tile count across the sort-based distributed
    * partitioners (str/hc/slc): the tile list is the ONLY planning state
    * that reaches the driver (n/bucket union-MBBs or cut abscissas), and
    * it is also broadcast to every task as the TileIndex — past a few
    * million entries both sides degrade long before anything crashes.
    * The check runs BEFORE the planning sort from the caller's exact row
    * count, so an undersized bucket fails in milliseconds with the knob
    * to turn, not after a full-relation sort (TileIndex.MaxShards-style
    * guard discipline). */
  val MaxTiles: Long = 4000000L

  private[partition] def requireBounded(name: String, n: Long, bucket: Long): Unit = {
    val planned = n / math.max(bucket, 1) + 1
    require(planned <= MaxTiles,
      s"$name would plan ~$planned tiles from $n rows at bucket=$bucket " +
      s"(cap $MaxTiles): the tile list is driver-collected and " +
      s"task-broadcast planning state. Raise Config.bucket so rows/bucket " +
      s"<= $MaxTiles — at 100 TB that means bucket sized in rows, not MBs.")
  }

  /** @param env DataFrame with exactly 4 double columns xmin,ymin,xmax,ymax
    * @param n   relation row count (the caller's planning stats already
    *            paid for it — recounting would re-scan the relation) */
  def tiles(env: DataFrame, n: Long, bucket: Int): Array[TileBoundary] = {
    if (n == 0) return Array.empty
    val b = math.max(bucket, 1).toLong
    requireBounded("str_dist", n, b)
    val cx = (col("xmin") + col("xmax")) / 2
    val cy = (col("ymin") + col("ymax")) / 2
    val byX = env.toDF("xmin", "ymin", "xmax", "ymax")
      .select(col("xmin"), col("ymin"), col("xmax"), col("ymax"),
        cx.as("__cx"), cy.as("__cy"))
      .orderBy("__cx")
    val slices = math.max(1L, math.ceil(math.sqrt(
      math.ceil(n.toDouble / b))).toLong)
    val sliceSize = math.max(1L, math.ceil(n.toDouble / slices).toLong)
    val runs = byX.rdd.zipWithIndex()
      .map { case (row, i) =>
        ((i / sliceSize, row.getDouble(5)),
          Mbb(row.getDouble(0), row.getDouble(1), row.getDouble(2), row.getDouble(3)))
      }
      .sortByKey()
      .zipWithIndex()
      .map { case (((_, _), m), i2) =>
        ((i2 / sliceSize, (i2 % sliceSize) / b), m)
      }
      .reduceByKey(_ union _)
      .collect()
    runs.sortBy(_._1).zipWithIndex.map { case ((_, m), i) => TileBoundary(i, m) }
  }
}
