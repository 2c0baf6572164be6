package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
  * 2023, arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
  * distribution resembles a small trusted target corpus. Per document,
  * `log w = Σ_f c_f · (log p_target(f) − log p_raw(f))` over hashed word
  * uni+bigram features with multiplicity, then select k documents by
  * Gumbel top-k over `log w` — equivalent to sampling without replacement
  * with probability ∝ w, which is the paper's resampling step.
  *
  * Spark shape: a model is a BUCKET-SIZED relation `(bucket, cnt)` — at
  * most `buckets` rows regardless of corpus size (the hash fixes the
  * feature domain), so the per-bucket log-ratio table is always
  * broadcastable. Scoring is explode → codegen hash → one broadcast join →
  * partial-aggregated per-document sum: the raw corpus never shuffles its
  * grams, only `(doc, sum, count)` aggregation buffers cross the network,
  * and the final top-k is TakeOrderedAndProject (per-partition partial
  * top-k, one merge — no global sort). At 100 TB the cost is one scan of
  * the raw corpus per stage (one to fit `raw`, one to score), each
  * absorbed map-side.
  *
  * Features that never occur in EITHER corpus still have defined mass
  * (add-alpha over the fixed `buckets`-sized domain), so a document using
  * them gets the constant ratio `log((Nr+αB)/(Nt+αB))` per occurrence —
  * handled by the `coalesce` fallback, not by dropping the gram.
  */
object Dsir {

  /** One document's hashed feature-bucket array (with multiplicity):
    * word uni+bigrams under the engine's pinned tokenizer semantics
    * (split on ' ' keeping empty tokens) MINUS zero-length grams — an
    * empty document or a run of spaces contributes no evidence rather
    * than an "empty-token" feature. The shared featurization of [[Dsir]]
    * and [[QualityClassifier]], so a model trained by either is
    * consistent with any scorer. */
  private[text] def featureBuckets(textCol: String, buckets: Int) =
    transform(filter(concat(
      graft.functions.word_shingles_all(col(textCol), 1),
      graft.functions.word_shingles_all(col(textCol), 2)),
      g => length(g) > 0),
      g => pmod(xxhash64(g), lit(buckets.toLong)))

  /** Hashed bag-of-features model: `(bucket, cnt)` counts of word
    * uni+bigrams (with multiplicity) hashed by xxhash64 into `buckets`
    * buckets. One kernel scan + one partial-aggregated groupBy whose
    * result is at most `buckets` rows. */
  def fitFeatures(docs: DataFrame, textCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, "dsir.fitFeatures: buckets must be > 0")
    docs
      .select(explode(featureBuckets(textCol, buckets)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Per-document log importance weight under add-alpha smoothing:
    * `(idCol, n_feats, logw)`. `target`/`raw` are [[fitFeatures]]-shaped
    * `(bucket, cnt)` relations; both are reduced to one broadcast
    * log-ratio table before the corpus-side scan. Documents with no words
    * have no features and produce no row (no evidence, no weight —
    * mirrors [[NgramLm.score]]). */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        target: DataFrame, raw: DataFrame,
                        buckets: Int, alpha: Double = 0.1): DataFrame = {
    require(alpha > 0, "dsir.importanceWeights: alpha must be > 0")
    require(buckets > 0, "dsir.importanceWeights: buckets must be > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val tc = target.columns; val rc = raw.columns
    // bounded planning collects (each ≤ `buckets` rows by the hash-domain
    // contract, enforced below): ONE action per model, so an unpersisted
    // fitFeatures lineage is scanned exactly once — totals, smoothing and
    // the per-bucket log ratio all derive driver-side from these bits,
    // and the ratio table enters the plan as a broadcast local relation
    val tCnt = target.select(col(tc(0)).cast("long"), col(tc(1)).cast("long"))
      .as[(Long, Long)].collect().toMap
    val rCnt = raw.select(col(rc(0)).cast("long"), col(rc(1)).cast("long"))
      .as[(Long, Long)].collect().toMap
    require(tCnt.size <= buckets && rCnt.size <= buckets,
      "dsir.importanceWeights: model exceeds the bucket domain — not a fitFeatures relation?")
    val dt = tCnt.valuesIterator.sum + alpha * buckets
    val dr = rCnt.valuesIterator.sum + alpha * buckets
    require(dt > 0 && dr > 0, "dsir.importanceWeights: empty feature domain")
    // math.log == Catalyst's Log (both java.lang.Math): bit-identical to
    // the previous in-plan formulation
    val ratio = (tCnt.keySet ++ rCnt.keySet).toSeq.sorted.map { bk =>
      (bk, math.log((tCnt.getOrElse(bk, 0L) + alpha) / dt) -
           math.log((rCnt.getOrElse(bk, 0L) + alpha) / dr))
    }.toDF("bucket", "lr")
    // a gram in neither model: both counts 0 over the same fixed domain
    val lrMissing = math.log(alpha / dt) - math.log(alpha / dr)
    docs
      .select(col(idCol), explode(featureBuckets(textCol, buckets)).as("bucket"))
      .join(broadcast(ratio), Seq("bucket"), "left")
      .select(col(idCol), coalesce(col("lr"), lit(lrMissing)).as("__lr"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("__lr")).as("logw"))
  }

  /** Gumbel top-k resampling over a [[importanceWeights]] result: returns
    * the k selected rows `(idCol, n_feats, logw, sel_key)` where
    * `sel_key = logw + Gumbel(0,1)` and the noise is a deterministic pure
    * function of (id, seed) — `u = (xxhash64(id, seed) mod 2^40 + 0.5) /
    * 2^40`, `g = −ln(−ln u)` — so re-execution (and partial-stage
    * recomputation, SPARK-23207 class) reproduces the same sample.
    * Equivalent to weighted sampling without replacement ∝ exp(logw).
    * `orderBy.limit` plans as TakeOrderedAndProject: per-partition
    * bounded top-k, single merge — no global sort at any scale. */
  def resample(weights: DataFrame, idCol: String, k: Int,
               seed: Long = 42L): DataFrame = {
    require(k > 0, "dsir.resample: k must be > 0")
    val u = (pmod(xxhash64(col(idCol), lit(seed)), lit(1L << 40))
      .cast("double") + lit(0.5)) / lit((1L << 40).toDouble)
    weights
      .withColumn("sel_key", col("logw") + (-log(-log(u))))
      .orderBy(col("sel_key").desc, col(idCol).asc)
      .limit(k)
  }
}
