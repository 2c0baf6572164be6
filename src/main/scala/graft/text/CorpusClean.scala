package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.{Components, TextDedup}

/** End-to-end corpus cleaning — the composition a training-data pipeline
  * actually runs over raw documents, built entirely from this engine's
  * gated primitives so each stage keeps its individually-verified
  * semantics:
  *
  *   1. language filter   (TextFunctions.langId)
  *   2. quality floor     (TextFunctions.qualityScore)
  *   3. exact dedup       (min-id per md5 fingerprint)
  *   4. near-dup removal  (pair mining → connected components → min-id
  *                         survivor per cluster)
  *
  * Stage order is the cheap-first production order: each stage shrinks the
  * input of the strictly more expensive next stage; the only shuffles are
  * the fingerprint groupBy and the near-dup pipeline's own joins. Every
  * stage is all-column-preserving, so the result is a cleaned subset of
  * the input rows (no projection surprises).
  */
object CorpusClean {

  /** Near-dup mining strategy for stage 4. `Exact` compares every
    * shingle-sharing pair (oracle-able, quadratic in per-shingle doc
    * frequency); `Lsh` goes through MinHash band buckets (the 100 TB
    * path: candidate count bounded by the S-curve, recall ScalaTest-gated). */
  sealed trait NearDup
  final case class Exact(n: Int = 3, threshold: Double = 0.5) extends NearDup
  final case class Lsh(n: Int = 3, numHashes: Int = 64, bands: Int = 16,
                       estThreshold: Double = 0.5) extends NearDup
  case object NoNearDup extends NearDup

  /** Stages 1–2 standalone (also the `quality_filter` SQL TVF): language
    * id + quality floor, all columns preserved, scan-local. */
  def qualityFilter(docs: DataFrame, textCol: String,
                    lang: String, minQuality: Double): DataFrame =
    docs
      .where(TextFunctions.langId(col(textCol)) === lang)
      .where(TextFunctions.qualityScore(col(textCol)) >= minQuality)

  /** Stage 3 standalone (also the `dedup_exact` SQL TVF): one survivor
    * (min id) per byte-identical text. One hash shuffle on the md5
    * fingerprint; text bytes ride the shuffle only as the window key's
    * partition input — at scale prefer fingerprint-grouping over raw text
    * grouping, which this does. */
  def dedupExact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("__fp", TextFunctions.fingerprintMd5(col(textCol)))
      .withColumn("__keep",
        col(idCol) === min(col(idCol)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))))
      .where(col("__keep")).drop("__fp", "__keep")

  def clean(docs: DataFrame, idCol: String, textCol: String,
            lang: String = "en", minQuality: Double = 0.0,
            nearDup: NearDup = Exact()): DataFrame = {
    val kept = qualityFilter(docs, textCol, lang, minQuality)

    // exact dedup: one survivor (min id) per byte-identical text
    val exact0 = dedupExact(kept, idCol, textCol)

    // the near-dup path consumes the exact stage three times (pair mining,
    // component nodes, the survivor join) — persist so the filter +
    // fingerprint-window pipeline runs once, released after the first
    // consuming action
    def survivors(mine: DataFrame => DataFrame): DataFrame = {
      val exact = exact0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = Components.dedupByComponents(exact, idCol,
        mine(exact).select("ida", "idb"), "ida", "idb")
      graft.core.CacheHygiene.unpersistAfterUse(out, Seq(exact))
    }
    nearDup match {
      case NoNearDup => exact0
      case Exact(n, t) =>
        survivors(TextDedup.ngramJaccardPairs(_, idCol, textCol, n, t))
      case Lsh(n, h, b, t) =>
        survivors(TextDedup.minHashLshPairs(_, idCol, textCol, n, h, b, t))
    }
  }
}
