package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Compaction for the append-only key/chunk stores the incremental dedup
  * loops grow ([[DedupIngest]] line keys, [[BlobIngest]] chunk
  * relations): every microbatch appends a few small files, and after
  * thousands of refreshes the store's file count — not its size — starts
  * to tax the scan planner. Compaction rewrites the store as `numFiles`
  * parquet files, deduplicated, preserving the relation exactly (both
  * loops' semantics depend only on the SET of stored keys; DedupIngest
  * never re-appends a stored line key, so distinct() is an invariant
  * repair, not a semantic change).
  *
  * Crash window: the swap (delete + rename) is not atomic on plain
  * filesystems — a crash between the two leaves the store at
  * `<path>.compacting`, and [[recover]] completes the swap on the next
  * run. Production deployments point the loops at transactional tables
  * and don't need this utility; it serves the plain-directory layout the
  * loops write out of the box. Run it BETWEEN refreshes (the loops read
  * the store at each batch start). */
object StoreMaintenance {

  /** Rewrite `path` as `numFiles` distinct-row parquet files. */
  def compact(spark: SparkSession, path: String, numFiles: Int = 16): Unit = {
    require(numFiles > 0, "compact: numFiles must be positive")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".compacting")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    spark.read.parquet(path).distinct()
      .repartition(numFiles)
      .write.parquet(tmp.toString)
    fs.delete(new Path(path), true)
    if (!fs.rename(tmp, new Path(path)))
      throw new java.io.IOException(
        s"compact: rename $tmp -> $path failed; store remains at $tmp " +
          "(run recover() to complete the swap)")
  }

  /** Compact a `list=`-partitioned store ([[AnnIngest]]'s vector store:
    * every refresh adds up to one file per list, so after thousands of
    * refreshes each partition directory holds thousands of small files).
    * Rewrites the store partitioned by `partCol` with ~`filesPerPart`
    * files per partition (`repartition(partCol, hash-salt)` keeps one
    * partition's rows from landing in one writer task without a global
    * sort), preserving rows EXACTLY — vector stores are multisets keyed
    * by id, so no distinct() here, unlike [[compact]]'s key-set stores.
    * Same non-atomic swap + [[recover]] contract. */
  def compactPartitioned(spark: SparkSession, path: String, partCol: String,
                         filesPerPart: Int = 1): Unit = {
    require(filesPerPart > 0, "compactPartitioned: filesPerPart must be positive")
    import org.apache.spark.sql.functions._
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".compacting")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val df = spark.read.parquet(path)
    df.repartition(col(partCol),
        pmod(xxhash64(df.columns.map(col): _*), lit(filesPerPart)))
      .write.partitionBy(partCol).parquet(tmp.toString)
    fs.delete(new Path(path), true)
    if (!fs.rename(tmp, new Path(path)))
      throw new java.io.IOException(
        s"compactPartitioned: rename $tmp -> $path failed; store remains " +
          s"at $tmp (run recover() to complete the swap)")
  }

  /** Complete an interrupted [[compact]] swap if one is pending. */
  def recover(spark: SparkSession, path: String): Boolean = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".compacting")
    val dst = new Path(path)
    if (fs.exists(tmp) && !fs.exists(dst)) fs.rename(tmp, dst)
    else {
      // a tmp next to an intact store is a crashed WRITE, not a crashed
      // swap: the store is authoritative, drop the partial rewrite
      if (fs.exists(tmp)) fs.delete(tmp, true)
      false
    }
  }
}
