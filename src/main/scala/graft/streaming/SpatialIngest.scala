package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.{Mbb, TileBoundary}
import graft.functions.{st_envelope, st_geomfromwkt}
import graft.operators.TileIndex
import graft.sources.SpatialStore

/** Streaming spatial ingest — the incremental form of the `partition`
  * lifecycle ([[graft.sources.SpatialStore.write]], reference
  * query_partition.hpp:77-293): a stream of WKT records is parsed once at
  * the scan boundary, tile-tagged against a FIXED tile index, and appended
  * `partitionBy(tile_id)`. The index is planned ahead of time (on a
  * historical batch or a sample) and broadcast once — tiles MUST be stable
  * across microbatches, or the physical layout would drift and the
  * metadata/global index would lie about old files.
  *
  * The tagged stream carries the same `__row_id` content hash as the batch
  * writer, so [[SpatialStore.read]]/[[SpatialStore.containmentRead]] work
  * identically on a streamed store: replicas collapse, tile pruning
  * applies. `tileTag` itself is mode-agnostic — the SAME transform runs on
  * a batch frame (tested equal) per Structured Streaming's contract.
  */
object SpatialIngest {

  /** One tile id past the planned set: records the planner never saw
    * (outside the historical space) land here instead of being mis-routed
    * to a "nearest" in-space tile whose MBB would hide them from
    * containment pruning. */
  def overflowTileId(index: TileIndex): Int = index.tiles.map(_.tileId).max + 1

  /** The overflow tile's advertised boundary: everything — a containment
    * window always intersects it, so the (normally tiny or absent)
    * overflow partition is always scanned and out-of-space records stay
    * visible. */
  def overflowBoundary(index: TileIndex): TileBoundary =
    TileBoundary(overflowTileId(index),
      Mbb(-Double.MaxValue, -Double.MaxValue, Double.MaxValue, Double.MaxValue))

  /** Parse + envelope + replicate to every intersecting tile (reference
    * manipulate_2d -m). Malformed WKT rows drop silently (P4). A streaming
    * input, unlike the batch writer, can carry records OUTSIDE the
    * pre-planned space: any envelope not fully inside it also (or only)
    * tags the overflow tile, keeping reads exact. Output = input columns
    * ++ geom (WKB) ++ __row_id/__row_id2 ++ tile_id. */
  def tileTag(df: DataFrame, wktCol: String, index: TileIndex): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(index)
    val space = index.space
    val overflow = overflowTileId(index)
    val tileIds = udf { (x1: Double, y1: Double, x2: Double, y2: Double) =>
      val intersects = x1 <= space.xmax && space.xmin <= x2 &&
        y1 <= space.ymax && space.ymin <= y2
      val contained = x1 >= space.xmin && y1 >= space.ymin &&
        x2 <= space.xmax && y2 <= space.ymax
      if (!intersects) Array(overflow)
      else if (contained) bc.value.tilesFor(x1, y1, x2, y2)
      else bc.value.tilesFor(x1, y1, x2, y2) :+ overflow
    }
    SpatialStore.withRowIds(df)
      .withColumn("geom", st_geomfromwkt(col(wktCol)))
      .where(col("geom").isNotNull)
      .withColumn("__env", st_envelope(col("geom")))
      .withColumn(SpatialStore.TileCol, explode(tileIds(
        col("__env.xmin"), col("__env.ymin"), col("__env.xmax"), col("__env.ymax"))))
      .drop("__env")
  }

  /** Start the append sink: tile-partitioned parquet + the same
    * `_graft_meta.json` the batch writer produces (written up front — the
    * tiling is fixed), so batch readers can open the store while the
    * stream runs. */
  def start(stream: DataFrame, wktCol: String, index: TileIndex,
            path: String, checkpoint: String): StreamingQuery = {
    // streaming append is a DIR-layout operation (each microbatch adds
    // tile_id=N/ files). Appending onto a COMPACT store (the batch
    // writer's default since round 14) would be silent data loss: the
    // committed manifest wins layout detection, so every read serves only
    // data/ and the streamed rows are invisible. Refuse loudly — rebuild
    // the store with writeDirs (the append-able layout) first.
    // NOTE for the rebuild: writeDirs(SpatialStore.read(spark, path), ...,
    // path) is NOT a valid migration — the dir write clears the compact
    // data/ before its lazy scan runs (writeDirs itself refuses that
    // self-overwrite). Materialize a copy (or write to a fresh path), then
    // writeDirs from the copy.
    require(!SpatialStore.isCompact(stream.sparkSession, path),
      s"SpatialIngest.start: $path holds a manifest-committed compact " +
        "store; streamed tile_id= appends would be invisible to its " +
        "readers. Rebuild it with SpatialStore.writeDirs — from a " +
        "MATERIALIZED copy or to a fresh path (an in-place " +
        "writeDirs(read(path), ..., path) destroys the store and is " +
        "refused) — then ingest.")
    SpatialStore.writeMeta(stream.sparkSession, path,
      SpatialStore.Meta("geom", index.space,
        index.tiles :+ overflowBoundary(index)))
    // cluster by tile before the sink, mirroring the batch writer: without
    // it a microbatch writes from its source tasks (one task for a
    // single-file batch — measured as the dominant 1.7 s single-task stage
    // of the ingest gate) and every task writes a fragment into EVERY tile
    // directory; with it writers parallelize across tiles and each tile
    // gets one file per microbatch
    val parts = stream.sparkSession.sessionState.conf.numShufflePartitions
    tileTag(stream, wktCol, index)
      .repartition(parts, col(SpatialStore.TileCol))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy(SpatialStore.TileCol)
      .outputMode("append")
      .start()
  }
}
