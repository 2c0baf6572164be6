package graft.core

import org.apache.spark.sql.DataFrame

/** Source-parallelism guard for CPU-heavy scans. Currently used by the
  * text-dedup shingle pipelines, where per-row CPU dwarfs the repartition
  * cost; the spatial-join tag path was A/B-probed with it and measured
  * break-even at sf0.1 (the extra shuffle cancels the serial-scan saving),
  * so spatial scans deliberately do NOT use this guard. */
object Parallelism {

  /** Small files arrive as one input split; parsing/shingling/tagging is
    * the CPU hotspot of the scan stage, so fan the rows across the cluster
    * first. No-op when the source is already parallel (the 100 TB case) or
    * not file-backed (mid-pipeline frames are already distributed). Split
    * count is estimated from the leaf files (count + size /
    * maxPartitionBytes) — never via `df.rdd`, which would force a second
    * physical plan just to read a partition count. */
  def fanOut(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val target = sc.defaultParallelism
    val files = df.inputFiles
    if (files.isEmpty || files.length >= target) return df
    val maxSplit = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    val fs = new org.apache.hadoop.fs.Path(files.head)
      .getFileSystem(sc.hadoopConfiguration)
    val splits = files.iterator.map { f =>
      val len = try fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen
                catch { case _: java.io.IOException => 0L }
      math.max(1L, (len + maxSplit - 1) / maxSplit)
    }.sum
    if (splits < target) df.repartition(target) else df
  }
}
