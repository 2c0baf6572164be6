package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-then-chunk sequence packing — the GPT-style pre-training layout:
  * documents are concatenated in a deterministic order (`idCol`) into one
  * token stream, which is cut into fixed-`chunkTokens` training sequences;
  * each document then spans chunks [first_chunk, last_chunk]. The whole
  * assignment is a function of the exclusive running token total, i.e. a
  * distributed prefix sum.
  *
  * A plain `Window.orderBy(id)` cumsum has NO partition key — Spark plans
  * it as a single task, the textbook 100 TB non-starter. And
  * `repartitionByRange` cannot carry the prefix offsets between jobs: its
  * range bounds are re-SAMPLED per action, so two executions of the same
  * plan can split rows differently (measured: a 3-partition run
  * double-counted a boundary run of rows). This implementation therefore
  * keys everything on a DETERMINISTIC bucket COLUMN, independent of
  * physical partitioning:
  *
  *   1. one quantile sketch over `idCol` (bounded driver state) fixes the
  *      bucket bounds, embedded as literals — every downstream use shares
  *      the exact same bucketing;
  *   2. one bounded aggregate computes per-bucket token totals
  *      (≤ buckets rows), prefix-summed into per-bucket offsets;
  *   3. a PER-BUCKET window cumsum (parallel — each bucket is its own
  *      window group) plus the broadcast offset.
  *
  * All arithmetic is int64 — exact, and invariant to partitioning
  * (asserted by the spec against a single-window reference).
  */
object SequencePack {

  /** Adds `start_tok`, `first_chunk`, `last_chunk`, `n_chunks` computed
    * from `tokCol` (int64 token count per row) in `idCol` (numeric,
    * unique) order. `numBuckets` <= 0 defaults to the cluster
    * parallelism. */
  def packChunks(df: DataFrame, idCol: String, tokCol: String,
                 chunkTokens: Long, numBuckets: Int = 0): DataFrame = {
    require(chunkTokens >= 1, "chunkTokens must be >= 1")
    val spark = df.sparkSession
    val buckets = math.max(1,
      if (numBuckets > 0) numBuckets else spark.sparkContext.defaultParallelism)
    // bucket bounds from one quantile sketch; collected once and embedded
    // as literals, so the bucketing is identical in every job that uses it
    val bounds: Array[Double] =
      if (buckets == 1) Array.empty
      else df.stat.approxQuantile(idCol,
        (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
    val bucketCol: Column =
      if (bounds.isEmpty) lit(0)
      else size(filter(lit(bounds),
        b => b <= col(idCol).cast("double"))).cast("int")
    val withB = df.withColumn("__pb", bucketCol)
    // bounded collect: one row per bucket — the per-bucket token totals
    // that seed the cross-bucket offsets
    val totals = withB.groupBy(col("__pb"))
      .agg(sum(col(tokCol)).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = new Array[Long](buckets + 1)
    var acc = 0L
    for (p <- 0 until buckets) {
      offsets(p) = acc
      acc += totals.getOrElse(p, 0L)
    }
    val offBc = spark.sparkContext.broadcast(offsets)
    val offUdf = udf { (p: Int) => offBc.value(p) }
    // per-bucket window: parallel (one window group per bucket), and the
    // quantile bucketing makes global id order = (bucket, id) order
    val w = Window.partitionBy(col("__pb")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val chunkOf: Column => Column = t => floor(t / lit(chunkTokens.toDouble)).cast("long")
    withB
      .withColumn("__cum", sum(col(tokCol)).over(w) + offUdf(col("__pb")))
      .withColumn("start_tok", col("__cum") - col(tokCol))
      .withColumn("first_chunk", chunkOf(col("start_tok")))
      // empty documents (0 tokens) sit AT their start offset: they span
      // the chunk containing start_tok and nothing else
      .withColumn("last_chunk",
        chunkOf(greatest(col("__cum") - 1, col("start_tok"))))
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1)
      .drop("__pb", "__cum")
  }
}
