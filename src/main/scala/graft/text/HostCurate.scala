package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Host/source-level corpus curation (RefinedWeb/CCNet class): web-scale
  * corpora are dominated by a few hosts, and the standard controls are a
  * host BLOCKLIST and a PER-HOST DOCUMENT CAP (keep at most k documents
  * per host, chosen deterministically, so no single host floods the mix).
  *
  * The cap's selection order is the [[CorpusSplit.keyHash]] of the doc id
  * (ties broken by id): a pseudorandom-but-reproducible "first k" that is
  * stable across reruns and independent of file layout — NOT head-of-file
  * order, which would bias toward crawl order.
  */
object HostCurate {

  /** Drop documents from blocked hosts — literal list form (the common
    * case: curated blocklists are thousands of entries, a scan predicate).
    * For blocklists too large to inline, use [[dropHostsRelation]]. */
  def dropHosts(df: DataFrame, hostCol: String, blocked: Seq[String]): DataFrame =
    df.where(!col(hostCol).isInCollection(blocked))

  /** Relation-form blocklist: left-anti join. At scale the blocklist is
    * tiny next to the corpus — AQE broadcasts it; the corpus never
    * shuffles. */
  def dropHostsRelation(df: DataFrame, hostCol: String,
                        blocked: DataFrame, blockedCol: String): DataFrame =
    df.join(broadcast(blocked.select(col(blockedCol).as(hostCol)).distinct()),
        Seq(hostCol), "left_anti")
      // USING-join surfaces the key first; restore the caller's projection
      .select(df.columns.map(col).toIndexedSeq: _*)

  /** Keep at most `k` documents per host, by ascending
    * (keyHash(id), id); adds `host_rank` (1..k). Exact and deterministic.
    *
    * Two-stage top-k so a hot host never serializes onto one task: stage 1
    * ranks within (host, salt-of-id) — `salts` bounded partitions per host,
    * each keeping its k smallest — stage 2 ranks the ≤ k·salts survivors
    * per host. Stage-2 partitions are bounded by k·salts rows regardless
    * of host skew, which is what makes the cap safe when one host owns
    * 10^9 documents. Semantically identical to the single-window form
    * (spec-pinned): every global top-k row is a top-k row of its salt. */
  def capPerHost(df: DataFrame, hostCol: String, idCol: String, k: Int,
                 salts: Int = 32): DataFrame = {
    require(k > 0 && salts > 0, "capPerHost: k and salts must be positive")
    val hk = CorpusSplit.keyHash(col(idCol))
    val staged = df
      .withColumn("__hk", hk)
      .withColumn("__salt", pmod(col(idCol), lit(salts.toLong)))
    val w1 = Window.partitionBy(col(hostCol), col("__salt"))
      .orderBy(col("__hk"), col(idCol))
    val w2 = Window.partitionBy(col(hostCol)).orderBy(col("__hk"), col(idCol))
    staged
      .withColumn("__r1", row_number().over(w1)).where(col("__r1") <= k)
      .withColumn("host_rank", row_number().over(w2))
      .where(col("host_rank") <= k)
      .drop("__hk", "__salt", "__r1")
  }

  /** Single-window reference form of [[capPerHost]] — the spec's
    * equivalence baseline and the honest SQL twin. */
  def capPerHostReference(df: DataFrame, hostCol: String, idCol: String,
                          k: Int): DataFrame = {
    val w = Window.partitionBy(col(hostCol))
      .orderBy(CorpusSplit.keyHash(col(idCol)), col(idCol))
    df.withColumn("host_rank", row_number().over(w))
      .where(col("host_rank") <= k)
  }
}
