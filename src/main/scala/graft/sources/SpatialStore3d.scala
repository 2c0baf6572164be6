package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Octree3d
import graft.operators.SpatialJoin3d.Mbb3Cols

/** 3-D spatially partitioned table layout — [[SpatialStore]]'s lifecycle
  * (the reference's `partition` + `containment`,
  * /root/reference/src/framework/query_partition.hpp:77-293,
  * query_containment.hpp:112-139) in three dimensions, over the 3-D data
  * model the reference's `queryproc3d` binaries consume
  * (/root/reference/src/README.md:5-13): six MBB columns per row, no WKB.
  *
  * Tiles are OCTREE LEAVES ([[graft.operators.Octree3d]], the
  * reconstructed `oc` partitioner) planned from a seeded sample of
  * envelope centers, so leaf sizes track data density — a uniform 3-D
  * grid over skewed data leaves most partition dirs empty and the hot
  * ones unsplit. Boundary-spanning objects replicate to every
  * closed-intersecting leaf at write (query_partition.hpp:34-38), carry
  * the same content-hash row-id lanes as the 2-D store, and collapse on
  * read.
  *
  * Containment reads prune twice: the driver walks the broadcast-free
  * leaf table against the window box (the reference's global-index scan)
  * and hands Catalyst a `tile_id IN (...)` predicate that skips every
  * non-matching partition directory; the six-comparison exact refine then
  * runs only over surviving files. At 100 TB the read touches the files
  * of window-intersecting leaves, nothing else.
  */
object SpatialStore3d {

  private val MetaFile = "_graft_meta3d.json"
  val TileCol: String = SpatialStore.TileCol

  final case class Meta(cols: Seq[String], leafBoxes: Array[Array[Double]])

  /** Write `df` partitioned by octree leaf over its six MBB columns.
    * Rows with any null envelope side are dropped (the 2-D store's P3/P4
    * behavior). `leafCap` is the target object count per leaf at full
    * scale; the octree is built over a seeded `sampleTarget` sample with
    * the cap scaled by the sample fraction (the planTiles discipline).
    * Value-identical rows collapse on read unless `preserveDuplicates`
    * (see [[SpatialStore.withRowIds]]).
    *
    * DEFAULT LAYOUT (since round 14): manifest-committed compact
    * ([[writeCompact]] — commit renames ∝ writer tasks, measured 1.00× at
    * 10× leaves where the dir layout was 7.4×). [[writeDirs]] keeps the
    * Hive `tile_id=` dir layout for external partition-pruning interop;
    * the read side detects the layout. */
  def write(df: DataFrame, c: Mbb3Cols, path: String,
            leafCap: Int = 4096, sampleTarget: Int = 100000,
            maxDepth: Int = 12, seed: Long = 42L,
            preserveDuplicates: Boolean = false): Unit =
    writeCompact(df, c, path, leafCap, sampleTarget, maxDepth, seed,
      preserveDuplicates)

  /** Leaf count past which [[writeDirs]] warns: the dir layout's commit
    * cost is one dir + temp + rename PER LEAF, measured 13.1× per 10×
    * data at the sf10 lane (SCALE.md round-15) where the compact layout
    * was 4.3× — above ~10k leaves the commit, not the data, is the
    * write. */
  val DirLayoutLeafWarn = 10000

  /** The scale warning a dir-layout write of `nLeaves` leaves deserves,
    * if any (separate from [[writeDirs]] so the threshold is testable
    * without building a 10k-leaf store). */
  def dirLayoutWarning(nLeaves: Int): Option[String] =
    if (nLeaves <= DirLayoutLeafWarn) None
    else Some(
      s"[spatialstore3d] writeDirs: $nLeaves leaves > $DirLayoutLeafWarn — " +
      "the Hive dir layout commits one rename per leaf (measured 13.1x " +
      "per 10x data, SCALE.md); use write/writeCompact unless an " +
      "external consumer needs tile_id= dirs")

  /** Hive-partitioned per-leaf dir layout (see [[write]]'s layout note).
    * LEGACY/INTEROP ONLY at scale: kept for external `tile_id=`
    * partition-pruning consumers; warns past [[DirLayoutLeafWarn]] leaves
    * (commit renames ∝ leaves — use [[writeCompact]], renames ∝ tasks). */
  def writeDirs(df: DataFrame, c: Mbb3Cols, path: String,
                leafCap: Int = 4096, sampleTarget: Int = 100000,
                maxDepth: Int = 12, seed: Long = 42L,
                preserveDuplicates: Boolean = false): Unit = {
    val spark = df.sparkSession
    SpatialStore.refuseSelfOverwrite(df, path, "writeDirs")
    val (tagged, tree, names) =
      leafTagged(df, c, leafCap, sampleTarget, maxDepth, seed, preserveDuplicates)
    dirLayoutWarning(tree.leafBoxes.length).foreach(System.err.println)
    // see SpatialStore.clearCompactArtifacts: a dir write over a compact
    // store must not leave a manifest that wins layout detection
    SpatialStore.clearCompactArtifacts(spark, path)
    tagged
      // explicit partition count: a bare repartition(col) would be AQE-
      // coalesced to one task on small inputs, serializing the write
      .repartition(spark.sessionState.conf.numShufflePartitions, col(TileCol))
      .write.partitionBy(TileCol).mode("overwrite").parquet(path)
    writeMeta(spark, path, Meta(names, tree.leafBoxes))
  }

  /** Shared planning: row-id lanes, null-envelope drop, sampled octree,
    * leaf replication — everything up to (and including) the tile tag. */
  private def leafTagged(df: DataFrame, c: Mbb3Cols, leafCap: Int,
                         sampleTarget: Int, maxDepth: Int, seed: Long,
                         preserveDuplicates: Boolean)
      : (DataFrame, Octree3d.Tree, Seq[String]) = {
    val spark = df.sparkSession
    val names = Seq(c.xmin, c.ymin, c.zmin, c.xmax, c.ymax, c.zmax)
    val withId = SpatialStore.withRowIds(df, preserveDuplicates)
      .where(names.map(col(_).isNotNull).reduce(_ && _))
      // non-finite bounds drop like incomplete envelopes (a NaN would
      // poison the global min/max envelope and every octree split after)
      .where(names.map { f =>
        !isnan(col(f)) && col(f) > lit(Double.NegativeInfinity) &&
          col(f) < lit(Double.PositiveInfinity)
      }.reduce(_ && _))
    // one pass: global envelope + row count
    val a = withId.agg(
      min(col(c.xmin)), min(col(c.ymin)), min(col(c.zmin)),
      max(col(c.xmax)), max(col(c.ymax)), max(col(c.zmax)),
      count(lit(1))).head()
    val n = a.getLong(6)
    require(n > 0, s"SpatialStore3d.write: no rows with a complete 3-D envelope")
    val space = Array(a.getDouble(0), a.getDouble(1), a.getDouble(2),
      a.getDouble(3), a.getDouble(4), a.getDouble(5))
    val fraction = math.min(1.0, sampleTarget.toDouble / n)
    val centers = {
      val cdf = withId.select(
        ((col(c.xmin) + col(c.xmax)) / 2).as("_x"),
        ((col(c.ymin) + col(c.ymax)) / 2).as("_y"),
        ((col(c.zmin) + col(c.zmax)) / 2).as("_z"))
      (if (fraction >= 1.0) cdf else cdf.sample(withReplacement = false, fraction, seed))
        .collect().map(r => Array(r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    }
    val scaledCap = math.max(1, math.floor(leafCap * fraction).toInt)
    val tree = Octree3d.build(centers, space, scaledCap, maxDepth)
    val bc = spark.sparkContext.broadcast(tree)
    val leaves = udf { (x0: Double, y0: Double, z0: Double,
                        x1: Double, y1: Double, z1: Double) =>
      bc.value.leavesFor(x0, y0, z0, x1, y1, z1)
    }
    val tagged = withId
      .withColumn(TileCol, explode(leaves(
        col(c.xmin), col(c.ymin), col(c.zmin),
        col(c.xmax), col(c.ymax), col(c.zmax))))
    (tagged, tree, names)
  }

  /** Manifest-committed layout (round-12 verdict #6): [[write]]'s commit
    * cost is one directory + temp file + rename PER LEAF (Spark dynamic
    * partitioning) — measured as the store's entire super-linear term in
    * the sf1b rehearsal (wall ∝ leaf count, cap∝N lanes near-flat). This
    * variant writes the SAME rows (identical planning, replication and
    * row-id lanes) as PLAIN parquet range-partitioned on the leaf id —
    * one file per TASK covering a contiguous leaf range, so renames ∝
    * tasks, not leaves — then commits one per-file (min_tile, max_tile)
    * manifest built from a single column-pruned scan of what was just
    * written (the ZoneMap discipline). Reads prune the manifest instead
    * of partition dirs: leaf ids are range-clustered and sorted within
    * files, so a window touches only the files whose tile range
    * intersects its leaf set, with parquet row-group stats finishing the
    * job inside each file. At 100 TB: LIST = one manifest read; file
    * count ∝ writer count, not leaf count. */
  def writeCompact(df: DataFrame, c: Mbb3Cols, path: String,
                   leafCap: Int = 4096, sampleTarget: Int = 100000,
                   maxDepth: Int = 12, seed: Long = 42L,
                   preserveDuplicates: Boolean = false): Unit = {
    val spark = df.sparkSession
    val (tagged, tree, names) =
      leafTagged(df, c, leafCap, sampleTarget, maxDepth, seed, preserveDuplicates)
    // contiguous leaf ranges per file + in-file ordering: manifest ranges
    // stay tight and row-group stats on tile_id prune inside surviving
    // files (shared write half, [[SpatialStore.writeRangeClustered]])
    SpatialStore.writeRangeClustered(tagged, path)
    writeMeta(spark, path, Meta(names, tree.leafBoxes))
  }

  /** Containment read over the [[writeCompact]] layout — an alias of
    * [[containmentRead]], which detects the layout itself. */
  def containmentReadCompact(spark: SparkSession, path: String,
                             window: Array[Double]): DataFrame =
    containmentRead(spark, path, window)

  /** Containment/window read: driver prunes octree leaves against the
    * window box (closed intersection — the replication test's twin, so a
    * replica on a shared face is never orphaned from its window), the
    * layout-detected selective scan ([[SpatialStore.selectTiles]]) reads
    * only matching files or partition dirs, the six-comparison exact
    * refine applies, and replicas collapse on the row-id lanes. `window`
    * is six doubles (x0, y0, z0, x1, y1, z1). */
  def containmentRead(spark: SparkSession, path: String,
                      window: Array[Double]): DataFrame = {
    require(window.length == 6, "window must be (x0, y0, z0, x1, y1, z1)")
    val meta = readMeta(spark, path)
    val Seq(x0, y0, z0, x1, y1, z1) = window.toSeq
    val wanted = meta.leafBoxes.iterator.zipWithIndex
      .filter { case (b, _) =>
        b(0) <= x1 && x0 <= b(3) && b(1) <= y1 && y0 <= b(4) &&
          b(2) <= z1 && z0 <= b(5) }
      .map(_._2).toSeq
    val Seq(cx0, cy0, cz0, cx1, cy1, cz1) = meta.cols.map(col)
    SpatialStore.selectTiles(spark, path, wanted)
      .where(col(TileCol).isin(wanted: _*))
      .where(cx0 <= lit(x1) && lit(x0) <= cx1 &&
             cy0 <= lit(y1) && lit(y0) <= cy1 &&
             cz0 <= lit(z1) && lit(z0) <= cz1)
      .dropDuplicates(SpatialStore.RowIdCol, SpatialStore.RowId2Col)
      .drop(SpatialStore.RowIdCol, SpatialStore.RowId2Col, TileCol)
  }

  /** Full-table read with replicas collapsed (layout-detecting; compact
    * reads share [[SpatialStore.compactDataScan]]'s torn-write guard). */
  def read(spark: SparkSession, path: String): DataFrame =
    (if (SpatialStore.isCompact(spark, path))
       SpatialStore.compactDataScan(spark, path)
     else spark.read.parquet(path))
      .dropDuplicates(SpatialStore.RowIdCol, SpatialStore.RowId2Col)
      .drop(SpatialStore.RowIdCol, SpatialStore.RowId2Col, TileCol)

  // ---- metadata (partition.idx + info.cfg equivalent, 3-D form) ----

  def writeMeta(spark: SparkSession, path: String, meta: Meta): Unit = {
    val leaves = meta.leafBoxes.map(b => b.mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    val json =
      s"""{"format_version":${SpatialStore.FormatVersion},"cols":[${meta.cols.map(c => s""""$c"""").mkString(",")}],"leaves":$leaves}"""
    val p = new Path(path, MetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  def readMeta(spark: SparkSession, path: String): Meta = {
    val p = new Path(path, MetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val json = try new String(
      in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
    SpatialStore.checkFormatVersion(json, path)
    val cols = """"cols":\[([^\]]+)\]""".r.findFirstMatchIn(json).get.group(1)
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
    val leaves = """\[([^\[\]]+)\]""".r
      .findAllMatchIn(json.substring(json.indexOf("\"leaves\":")))
      .map(m => m.group(1).split(",").map(_.toDouble))
      .filter(_.length == 6).toArray
    Meta(cols, leaves)
  }
}
