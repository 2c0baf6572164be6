package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-over-snapshot corpus delta — the Common-Crawl-refresh front
  * door: given last month's snapshot and this month's, label every id
  * `added` / `removed` / `changed` / `unchanged` so downstream incremental
  * operators (dedup stores, vector indexes, shard builds) process ONLY the
  * delta instead of re-running over 100 TB.
  *
  * Two shapes:
  *  - [[diff]]: both snapshots in hand — one full-outer id-keyed join;
  *    content comparison is md5-per-side (cross-engine exact, and the
  *    texts themselves never need to be co-shuffled when the caller
  *    pre-hashes).
  *  - [[diffAgainstKeys]]: the 100 TB shape — the OLD corpus is never
  *    re-read; only its (id, content-md5) key relation (32 B + id per doc,
  *    ~3 orders smaller than the corpus) persists between refreshes, the
  *    [[graft.streaming.DedupIngest]] store discipline. [[snapshotKeys]]
  *    emits exactly that relation for the next cycle.
  *
  * Output: (idCol, status). `removed` rows exist only in the old side, so
  * `diffAgainstKeys` reports them from the key relation alone. Null text
  * hashes to null; two null texts compare `unchanged` (null-safe equality),
  * a null-vs-present flip is `changed` — pinned in CurationSpec. */
object CorpusDiff {

  val Statuses = Seq("added", "removed", "changed", "unchanged")

  /** (idCol, h) key relation of a snapshot — carry THIS forward, not the
    * corpus. */
  def snapshotKeys(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("h"))

  /** Full-outer delta between two in-hand snapshots. */
  def diff(oldDf: DataFrame, newDf: DataFrame,
           idCol: String, textCol: String): DataFrame =
    diffAgainstKeys(newDf, idCol, textCol, snapshotKeys(oldDf, idCol, textCol))

  /** Delta of `newDf` against a stored key relation (`(idCol, h)`). */
  def diffAgainstKeys(newDf: DataFrame, idCol: String, textCol: String,
                      oldKeys: DataFrame): DataFrame = {
    val n = snapshotKeys(newDf, idCol, textCol)
      .select(col(idCol), col("h").as("__hn"))
    val o = oldKeys.select(col(idCol), col("h").as("__ho"))
      .withColumn("__in_old", lit(true))
    n.withColumn("__in_new", lit(true))
      .join(o, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("__hn") <=> col("__ho"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** The refresh input for downstream incremental operators: new-snapshot
    * rows whose content is new or different (added + changed). One
    * left-semi-shaped pass — removed/unchanged never materialize. */
  def changedOrNew(newDf: DataFrame, idCol: String, textCol: String,
                   oldKeys: DataFrame): DataFrame = {
    val d = diffAgainstKeys(newDf, idCol, textCol, oldKeys)
      .where(col("status").isin("added", "changed"))
      .select(col(idCol))
    newDf.join(d, Seq(idCol), "left_semi")
  }
}
