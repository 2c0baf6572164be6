package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zone-map clustered parquet layout with file-level range pruning — the
  * Iceberg/Delta "OPTIMIZE + file skipping" class, and the attribute-range
  * generalization of [[SpatialStore]]'s tile-directory pruning: SpatialStore
  * prunes on SPATIAL containment through partition directories; ZoneMap
  * prunes on arbitrary numeric/temporal column ranges through a per-file
  * min/max manifest.
  *
  * Write path: one `repartitionByRange` (Spark samples range boundaries —
  * one extra pass over the clustering keys) + `sortWithinPartitions`, one
  * parquet file per output partition, then ONE column-pruned scan of the
  * written files builds the manifest (file, row count, min/max per
  * clustered column), stored under `path/_zonemap` — the underscore prefix
  * keeps it invisible to plain `spark.read.parquet(path)` (Spark's default
  * path filter hides `_`/`.`-prefixed entries).
  *
  * Read path: the manifest (ONE row per data file — ~100k rows for 100 TB
  * at 1 GB files, trivially driver-bounded) is filtered by interval
  * intersection against the query ranges and only surviving files are
  * listed to the scan; the residual BETWEEN filter still applies (and is
  * pushed into parquet row-group pruning within the kept files), so the
  * result is bit-identical to the unpruned filter. Rows with a NULL
  * clustering key never match a range (SQL BETWEEN semantics) and a file
  * that is entirely NULL on a clustered column carries NULL min/max and is
  * skipped — consistent.
  *
  * Clustering shapes:
  *  - `cols` with `hilbertPair = false`: lexicographic range clustering —
  *    only the LEADING column gets pruning power (the classic sort-key
  *    limitation).
  *  - `hilbertPair = true` (exactly 2 numeric columns): keys are normalized
  *    to [0,1] by the global min/max (one 1-row aggregate) and clustered by
  *    their [[graft.functions.HilbertValue]] — multi-dimensional locality,
  *    so BOTH columns prune, the same property the reference's hc
  *    partitioner (hc_2d.cpp) exploits for spatial tiles.
  *
  * 100 TB shape: the clustered write is one shuffle amortized over every
  * subsequent range query; each query's driver work is O(files) manifest
  * arithmetic; executors touch only intersecting files. No Delta/Iceberg
  * dependency — plain parquet + a parquet manifest.
  */
object ZoneMap {

  /** Inclusive range predicate on a clustered column; `lo`/`hi` are plain
    * Scala literals comparable to the column type (Long, Double,
    * java.sql.Timestamp, String, ...). */
  final case class ZoneRange(column: String, lo: Any, hi: Any)

  final case class PruneStats(selectedFiles: Int, totalFiles: Int)

  private val ManifestDir = "_zonemap"
  private val GenRe = "_zonemap_g([0-9]+)".r
  private def mn(c: String) = s"min_$c"
  private def mx(c: String) = s"max_$c"

  /** Manifest GENERATIONS: `_zonemap` is generation 0 (the writeClustered
    * layout), `optimize` commits `_zonemap_g<N+1>` COMPLETE (with
    * `_SUCCESS`) before anything of the old generation is deleted, and
    * readers pin to the highest committed generation. Generations are
    * never renamed in place, so there is no instant at which a reader can
    * observe zero manifests or a half-swapped one — the flaw of the old
    * `_zonemap_new` delete-then-rename protocol. */
  private def genName(n: Int) = if (n == 0) ManifestDir else s"_zonemap_g$n"
  private def genOf(name: String): Option[Int] = name match {
    case ManifestDir => Some(0)
    case GenRe(n) => Some(n.toInt)
    case _ => None
  }

  /** (gen, dir) pairs for every manifest dir under the root, committed
    * (has `_SUCCESS`) or not, ascending by generation. */
  private def manifestDirs(fs: org.apache.hadoop.fs.FileSystem,
                           p: org.apache.hadoop.fs.Path)
      : Seq[(Int, org.apache.hadoop.fs.Path, Boolean)] = {
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .flatMap(s => genOf(s.getPath.getName).map(n => (n, s.getPath,
        fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))))
      .sortBy(_._1)
  }

  /** Highest committed generation — the one reads pin to. */
  private def currentManifest(fs: org.apache.hadoop.fs.FileSystem,
                              p: org.apache.hadoop.fs.Path)
      : Option[(Int, org.apache.hadoop.fs.Path)] =
    manifestDirs(fs, p).filter(_._3).lastOption.map(t => (t._1, t._2))

  /** Hilbert grid order: 2^16 cells per axis — finer than any realistic
    * file count, so cell quantization never limits pruning. */
  private val HilbertOrder = 16

  /** The clustering shuffle shared by write and append. */
  private def clustered(df: DataFrame, cols: Seq[String], numFiles: Int,
                        hilbertPair: Boolean): DataFrame = {
    require(cols.nonEmpty, "ZoneMap: no clustering columns")
    require(!hilbertPair || cols.length == 2,
      s"hilbertPair clustering needs exactly 2 columns, got ${cols.length}")
    val outCols = df.columns.map(col).toSeq
    if (!hilbertPair) {
      df.repartitionByRange(numFiles, cols.map(col): _*)
        .sortWithinPartitions(cols.map(col): _*)
    } else {
      // one 1-row aggregate for the normalization bounds
      val Seq(a, b) = cols
      val r = df.agg(
        min(col(a).cast("double")), max(col(a).cast("double")),
        min(col(b).cast("double")), max(col(b).cast("double"))).head()
      def norm(c: String, lo: Double, hi: Double): Column = {
        val span = if (hi > lo) hi - lo else 1.0
        (col(c).cast("double") - lit(lo)) / lit(span)
      }
      val (aLo, aHi) = (r.getDouble(0), r.getDouble(1))
      val (bLo, bHi) = (r.getDouble(2), r.getDouble(3))
      val hkey = graft.functions.hilbert(
        norm(a, aLo, aHi), norm(b, bLo, bHi), lit(HilbertOrder))
      df.withColumn("__zm_hkey", hkey)
        .repartitionByRange(numFiles, col("__zm_hkey"))
        .sortWithinPartitions(col("__zm_hkey"))
        .select(outCols: _*) // projection keeps the distribution
    }
  }

  /** Manifest rows (file, cnt, min/max per col) for the given data files. */
  private def manifestRows(spark: SparkSession, files: Seq[String],
                           cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("cnt") +:
      cols.flatMap(c => Seq(min(col(c)).as(mn(c)), max(col(c)).as(mx(c))))
    spark.read.parquet(files: _*)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Data files currently in the store root (manifest dir + hidden files
    * excluded). */
  private def dataFiles(spark: SparkSession, path: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString).toSet
  }

  /** Write `df` clustered on `cols` into ~`numFiles` files plus the
    * `_zonemap` manifest. Caller owns `path` (overwritten). */
  def writeClustered(df: DataFrame, path: String, cols: Seq[String],
                     numFiles: Int, hilbertPair: Boolean = false): Unit = {
    // empty writes produce no part files (nothing for the manifest scan to
    // read) and the Hilbert bounds aggregate returns nulls — fail loudly;
    // the one limit-1 probe is noise next to the layout shuffle
    require(!df.isEmpty, "ZoneMap.writeClustered: empty input " +
      "(appendClustered treats an empty batch as a no-op)")
    clustered(df, cols, numFiles, hilbertPair)
      .write.mode("overwrite").parquet(path)
    // manifest: one column-pruned scan of what was just written
    val spark = df.sparkSession
    manifestRows(spark, Seq(path), cols)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/$ManifestDir")
  }

  /** Append a new batch to an existing clustered store: the batch is
    * clustered INDEPENDENTLY (its own range/Hilbert bounds), its files
    * append to the store, and manifest rows for exactly the new files
    * append to the manifest — existing data and manifest rows are never
    * rewritten, the ZoneMap twin of [[graft.streaming.AnnIngest]]'s
    * refresh discipline (wire `foreachBatch { appendClustered(...) }` for
    * the streaming loop). Query pruning is unchanged: the manifest stays
    * one row per file, whichever append produced it. Batches whose key
    * ranges overlap earlier batches dilute pruning (each covers its own
    * span); a periodic [[writeClustered]] re-layout restores global
    * clustering — the OPTIMIZE-after-ingest pattern. Not crash-atomic:
    * a failure between the two appends leaves data files unmanifested
    * (over-read, never wrong results — unmanifested files are invisible
    * to pruned reads; re-run [[writeClustered]] to heal). */
  def appendClustered(df: DataFrame, path: String, cols: Seq[String],
                      numFiles: Int, hilbertPair: Boolean = false): Unit = {
    if (df.isEmpty) return // idle microbatch: nothing to append
    val spark = df.sparkSession
    val (mfs, mp) = hfs(spark, path)
    // appending into a half-optimized store would hand recovery files it
    // cannot classify (new data vs orphan generation) — refuse loudly
    require(!mfs.exists(new org.apache.hadoop.fs.Path(mp, OptMarker)),
      s"appendClustered: a crashed optimize is pending under $path — " +
        "run ZoneMap.recoverOptimize first")
    val before = dataFiles(spark, path)
    if (before.isEmpty) return writeClustered(df, path, cols, numFiles, hilbertPair)
    // the append's manifest rows extend the CURRENT generation (optimize
    // commits later generations; an append to a superseded one would be
    // invisible)
    val cur = currentManifest(mfs, mp).getOrElse(throw new IllegalArgumentException(
      s"appendClustered: no committed manifest under $path — rebuild with writeClustered"))
    clustered(df, cols, numFiles, hilbertPair)
      .write.mode("append").parquet(path)
    val fresh = (dataFiles(spark, path) -- before).toSeq
    if (fresh.nonEmpty)
      manifestRows(spark, fresh, cols)
        .coalesce(1)
        .write.mode("append").parquet(cur._2.toString)
  }

  final case class OptimizeStats(filesBefore: Int, filesAfter: Int)

  private val OptMarker = "_zm_opt_inflight"
  private val OptTmp = "_zm_opt_tmp"

  private def hfs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** URI-normalized local path, so manifest `file` strings
    * (input_file_name, `file:///...`) compare equal to FileSystem
    * listings (`file:/...`). */
  private def normPath(s: String): String =
    new org.apache.hadoop.fs.Path(s).toUri.getPath

  /** Re-cluster the whole store back into ~`numFiles` globally-clustered
    * files — the OPTIMIZE half of the append lifecycle: appended batches
    * each cover their own key span, so pruning dilutes as batches
    * accumulate; a periodic optimize restores one global clustering.
    * Reads EVERY data file in the root (manifested or not — a crashed
    * append's unmanifested files are absorbed, healing the documented
    * appendClustered crash window), writes the new layout beside the
    * store, then swaps under a crash protocol that keeps pruned reads
    * correct at every step and re-runs duplicate-free:
    *
    *   marker up → cluster to a hidden tmp → new files rename into the
    *   root → new manifest COMMITS COMPLETE at `_zonemap_g<N+1>`
    *   (`_SUCCESS` last) → older manifest generations delete → old data
    *   files delete → marker down.
    *
    * Readers pin to the highest COMMITTED generation, and generations are
    * never renamed or overwritten in place, so a read started at ANY
    * protocol state sees exactly one complete generation: before the
    * commit the old manifest governs (the moved-in new files are
    * unreferenced, hence invisible); from the commit on, the new one does
    * (the not-yet-deleted old files are unreferenced in it). The old
    * delete-`_zonemap`-then-rename-`_zonemap_new` swap had a no-manifest
    * window between its two steps; the generation scheme has none.
    *
    * A crash anywhere leaves the marker, and [[recoverOptimize]] (run
    * automatically at the next optimize; [[appendClustered]] refuses
    * while the marker is up) rolls the store to exactly one generation:
    * the highest committed one (forward when `_zonemap_g<N+1>` committed,
    * back otherwise), then deletes every other manifest generation and
    * every data file the survivor does not reference — which is what
    * makes a re-run after a crash duplicate-free (without the marker
    * protocol, re-reading root files would absorb BOTH generations and
    * double every row). Offline maintenance — not safe concurrent with
    * APPENDS (readers are safe per the above; an in-flight scan that
    * already selected old-generation files can still lose them to the
    * final delete, the usual vacuum caveat), the
    * [[graft.streaming.StoreMaintenance]] discipline. */
  def optimize(spark: SparkSession, path: String, cols: Seq[String],
               numFiles: Int, hilbertPair: Boolean = false): OptimizeStats = {
    recoverOptimize(spark, path)
    val before = dataFiles(spark, path)
    require(before.nonEmpty, s"ZoneMap.optimize: no data files under $path")
    val (fs, p) = hfs(spark, path)
    val marker = new org.apache.hadoop.fs.Path(p, OptMarker)
    fs.create(marker, true).close()
    val tmp = new org.apache.hadoop.fs.Path(p, OptTmp)
    fs.delete(tmp, true)
    clustered(spark.read.parquet(before.toSeq: _*), cols, numFiles, hilbertPair)
      .write.mode("overwrite").parquet(tmp.toString)
    // move the new part files into the root (names are UUID-fresh — no
    // collision with the old generation)
    val parts = fs.listStatus(tmp).toSeq.filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    val moved = parts.map { s =>
      val dst = new org.apache.hadoop.fs.Path(p, s.getPath.getName)
      require(fs.rename(s.getPath, dst),
        s"ZoneMap.optimize: rename failed for ${s.getPath}")
      dst.toString
    }
    fs.delete(tmp, true)
    // the new manifest COMMITS COMPLETE at the next generation name
    // (parquet write ends with `_SUCCESS`) before anything of the old
    // generation is touched — readers pin to the highest committed
    // generation, so there is no no-manifest window and no mixed state
    val gens = manifestDirs(fs, p)
    val nextGen = gens.map(_._1).foldLeft(-1)(math.max) + 1
    manifestRows(spark, moved, cols)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/${genName(nextGen)}")
    gens.foreach { case (_, dir, _) => fs.delete(dir, true) }
    before.foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f), false))
    fs.delete(marker, false)
    OptimizeStats(before.size, moved.size)
  }

  /** Roll a crashed [[optimize]] to exactly one consistent generation.
    * No-op (false) unless the in-flight marker is present. With the
    * marker up: the highest COMMITTED manifest generation governs —
    * forward when the new generation's `_SUCCESS` landed before the
    * crash, back otherwise. Every other manifest generation (older
    * committed ones, partial uncommitted ones) deletes, then every data
    * file the survivor does not reference (the orphan generation —
    * partial-new on roll-back, old on roll-forward) and the marker drop.
    * Append crash-window files are NOT touched when no marker is up —
    * their heal path stays [[optimize]]'s absorb. */
  def recoverOptimize(spark: SparkSession, path: String): Boolean = {
    val (fs, p) = hfs(spark, path)
    val marker = new org.apache.hadoop.fs.Path(p, OptMarker)
    if (!fs.exists(marker)) return false
    val survivor = currentManifest(fs, p).getOrElse(throw new IllegalArgumentException(
      s"ZoneMap.recoverOptimize: no committed manifest under $path — the " +
        "store predates the crash protocol or was externally mutilated; " +
        "rebuild with writeClustered"))
    manifestDirs(fs, p)
      .filterNot(_._2 == survivor._2)
      .foreach { case (_, dir, _) => fs.delete(dir, true) }
    fs.delete(new org.apache.hadoop.fs.Path(p, OptTmp), true)
    val referenced = spark.read.parquet(survivor._2.toString)
      .select("file").collect().map(r => normPath(r.getString(0))).toSet
    dataFiles(spark, path)
      .filterNot(f => referenced.contains(normPath(f)))
      .foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f), false))
    fs.delete(marker, false)
    true
  }

  /** Files whose zone ranges intersect EVERY query range (conjunctive),
    * plus the total file count. The manifest is one row per file — the
    * collect is bounded by file count, never by data volume.
    *
    * Generation pinning: the read resolves the highest committed
    * generation ONCE and takes everything it needs from it in a single
    * collect, so it can never mix two generations. If a concurrent
    * [[optimize]]'s final cleanup deletes that generation between resolve
    * and collect (it was superseded), the read re-resolves — the retry
    * always lands on a complete, newer generation. */
  /** Retry budget for a read racing concurrent [[optimize]] cleanups.
    * Each consumed retry requires a FULL optimize cycle (rewrite + commit
    * + cleanup) to land entirely inside the read's resolve→collect window
    * — one racing optimize costs at most one retry, so the budget bounds
    * the number of back-to-back optimizes a single read can absorb. Four
    * full rewrite cycles inside one manifest collect means the store is
    * being optimized in a tight loop; failing loudly beats unbounded
    * spinning under that pathology. */
  private[sources] val ReadRetries = 3

  /** Test seam: invoked after a read pins its generation, before the
    * manifest collect — the only window a concurrent optimize cleanup can
    * invalidate the pin. Lets specs interleave real optimize cycles
    * deterministically. No-op in production. */
  private[sources] var testAfterResolve: () => Unit = () => ()

  private def selectFiles(spark: SparkSession, path: String,
                          ranges: Seq[ZoneRange]): (Seq[String], Int) = {
    val (fs, p) = hfs(spark, path)
    val keep = ranges
      .map(r => !(col(mx(r.column)) < lit(r.lo) || col(mn(r.column)) > lit(r.hi)))
      .reduceOption(_ && _).getOrElse(lit(true))
    var attempt = 0
    while (true) {
      val cur = currentManifest(fs, p).getOrElse(throw new IllegalArgumentException(
        s"ZoneMap: no committed manifest under $path — not a clustered " +
          "store (build one with writeClustered)"))
      try {
        testAfterResolve()
        val rows = spark.read.parquet(cur._2.toString)
          .select(col("file"), keep.as("__keep"))
          .collect()
        val files = rows.toSeq
          .filter(r => !r.isNullAt(1) && r.getBoolean(1))
          .map(_.getString(0))
        return (files, rows.length)
      } catch {
        // the pinned generation was deleted under us by an optimize
        // cleanup: re-resolve — the retry always lands on a complete,
        // newer generation (commit-before-delete), and each retry is only
        // consumed by another full optimize cycle
        case e: Exception if !fs.exists(cur._2) =>
          if (attempt < ReadRetries) attempt += 1
          else throw new IllegalStateException(
            s"ZoneMap read lost its pinned manifest generation to " +
              s"${ReadRetries + 1} concurrent optimize cleanups in a row " +
              s"under $path — the store is being optimized in a tight " +
              "loop; pause the optimizer or retry the read", e)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Range query over the clustered store touching only intersecting files.
    * Bit-identical to `read(path).where(ranges)` — the residual filter is
    * always applied (and pushed down into the kept files' row groups). */
  def readPruned(spark: SparkSession, path: String,
                 ranges: Seq[ZoneRange]): DataFrame = {
    require(ranges.nonEmpty, "ZoneMap.readPruned: no ranges (use a plain read)")
    val (files, _) = selectFiles(spark, path, ranges)
    val residual = ranges
      .map(r => col(r.column).between(lit(r.lo), lit(r.hi)))
      .reduce(_ && _)
    if (files.isEmpty)
      // zero intersecting files: schema-preserving empty frame, no scan work
      spark.read.parquet(path).where(lit(false)).where(residual)
    else spark.read.parquet(files: _*).where(residual)
  }

  /** Pruning effectiveness for reports/specs: (files selected, files total). */
  def pruneStats(spark: SparkSession, path: String,
                 ranges: Seq[ZoneRange]): PruneStats = {
    val (files, total) = selectFiles(spark, path, ranges)
    PruneStats(files.length, total)
  }
}
