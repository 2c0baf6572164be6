package graft.viz

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Mbb, TileBoundary}
import graft.functions.st_envelope
import graft.operators.SpatialJoin

/** Spark-native partition visualizer (reference
  * src/visualizer/partition_vis.cpp:20-211).
  *
  * The reference reads a partition-index file plus an optional object-MBB
  * file and pipes a gnuplot script — one `set object N rect` per rectangle,
  * then a global-space `plot` line — straight into gnuplot. Split here along
  * the Spark seam: everything data-sized (planning the tiling, counting
  * objects per tile, sampling object MBBs) is a DataFrame, and only the
  * script emit — which is bounded by the number of TILES, a driver-planned
  * quantity — runs on the driver. gnuplot itself is not bundled in this
  * environment; the emitted script is the reference's exact intermediate
  * artifact (partition_vis.cpp:137-171) and renders with any stock gnuplot.
  */
object PartitionVis {

  /** One row per planned tile: `tile_id, xmin, ymin, xmax, ymax, n_objects`
    * (empty tiles kept with n_objects = 0 — the reference plots every tile
    * in the partition index, populated or not). Uses the same
    * envelope→planTiles→1-to-N replication pipeline as the join planner, so
    * what gets visualized is exactly what a join on this config would use. */
  def tileFrame(df: DataFrame, geomCol: String = "geom",
                partitioner: String = "fg", bucket: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val env = df.withColumn("__env", st_envelope(col(geomCol)))
      .where(col("__env").isNotNull)
      .select(col("__env.xmin").as("__xmin"), col("__env.ymin").as("__ymin"),
        col("__env.xmax").as("__xmax"), col("__env.ymax").as("__ymax"))
    val index = SpatialJoin.planTiles(env, env.limit(0),
      SpatialJoin.Config(partitioner = partitioner, bucket = bucket))
    val bc = spark.sparkContext.broadcast(index)
    val tileIds = udf { (x1: Double, y1: Double, x2: Double, y2: Double) =>
      bc.value.tilesFor(x1, y1, x2, y2)
    }
    val perTile = env
      .withColumn("tile_id", explode(tileIds(
        col("__xmin"), col("__ymin"), col("__xmax"), col("__ymax"))))
      .groupBy("tile_id").agg(count(lit(1)).as("__n"))
    val bounds = spark.createDataFrame(index.tiles.toIndexedSeq.map(t =>
        (t.tileId, t.mbb.xmin, t.mbb.ymin, t.mbb.xmax, t.mbb.ymax)))
      .toDF("tile_id", "xmin", "ymin", "xmax", "ymax")
    bounds.join(perTile, Seq("tile_id"), "left")
      .select(col("tile_id"), col("xmin"), col("ymin"), col("xmax"), col("ymax"),
        coalesce(col("__n"), lit(0L)).as("n_objects"))
  }

  /** The gnuplot script the reference pipes to gnuplot
    * (partition_vis.cpp:137-171): header, one rect per tile (`fs empty
    * border C lw 2`), one black rect per object (`border 1 lw 1`), then
    * `plot [x0:x1] [y0:y1] NaN notitle` over the global space. The
    * reference colors tiles with `rand() % 5 + 2` under `srand(time)`;
    * here the color is `tile_id % 5 + 2` — same palette, reproducible. */
  def gnuplotScript(tiles: Seq[TileBoundary], space: Mbb, outputPng: String,
                    objects: Seq[Mbb] = Seq.empty): String = {
    val sb = new StringBuilder
    sb ++= "reset\nunset tics\nset term png\n"
    sb ++= s"""set output "$outputPng"\n"""
    var n = 1
    tiles.foreach { t =>
      val m = t.mbb
      val color = math.floorMod(t.tileId, 5) + 2
      sb ++= s"set object $n rect from ${m.xmin},${m.ymin} to ${m.xmax},${m.ymax}" +
        s" fs empty border $color lw 2\n"
      n += 1
    }
    objects.foreach { m =>
      sb ++= s"set object $n rect from ${m.xmin},${m.ymin} to ${m.xmax},${m.ymax}" +
        s" fs empty border 1 lw 1\n"
      n += 1
    }
    sb ++= s"plot [${space.xmin}:${space.xmax}] [${space.ymin}:${space.ymax}] NaN notitle\n"
    sb.toString
  }

  /** Plan the tiling for `df`, then write the gnuplot script to local
    * `path`. The tile list is bounded (driver-planned); object rectangles
    * are capped at `maxObjects` via a seeded sample so the script — a
    * plotting artifact, not a data sink — stays driver-sized at any input
    * scale. Returns the number of rectangles written. */
  def writeScript(df: DataFrame, path: String, outputPng: String,
                  geomCol: String = "geom", partitioner: String = "fg",
                  bucket: Int = 0, maxObjects: Int = 0,
                  seed: Long = 42L): Int = {
    val tf = tileFrame(df, geomCol, partitioner, bucket)
    val tiles = tf.orderBy("tile_id").collect().map { r =>
      TileBoundary(r.getInt(0), Mbb(r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    }.toIndexedSeq
    // TileIndex.covering pads every tiling to the space envelope, so the
    // tile-bound union IS the global space — every sampled object rect
    // lands inside the reference-parity plot range below
    val space = Mbb(tiles.map(_.mbb.xmin).min, tiles.map(_.mbb.ymin).min,
      tiles.map(_.mbb.xmax).max, tiles.map(_.mbb.ymax).max)
    val objects =
      if (maxObjects <= 0) Seq.empty[Mbb]
      else {
        val env = df.withColumn("__env", st_envelope(col(geomCol)))
          .where(col("__env").isNotNull).select("__env.*")
          .persist() // consumed twice: count, then sample
        val n = env.count()
        val fraction = math.min(1.0, maxObjects.toDouble / math.max(1, n))
        val rects = env.sample(withReplacement = false, fraction, seed)
          .limit(maxObjects).collect()
          .map(r => Mbb(r.getDouble(0), r.getDouble(1),
            r.getDouble(2), r.getDouble(3))).toIndexedSeq
        env.unpersist(blocking = false)
        rects
      }
    val script = gnuplotScript(tiles, space, outputPng, objects)
    Files.write(Paths.get(path), script.getBytes(StandardCharsets.UTF_8))
    tiles.length + objects.length
  }
}
