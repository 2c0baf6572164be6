package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Train-vs-eval overlap AUDIT — the report beside [[Decontaminate]]'s
  * filter. Decontaminate answers "which training docs must go"; this
  * answers the questions a data audit asks BEFORE choosing a threshold:
  * how much of each training document's content is covered by the eval
  * corpus, and which eval document is responsible. (Lee et al. 2022 and
  * the GPT-3 appendix both report these distributions; the filter alone
  * can't produce them.)
  *
  * Inputs are per-doc DISTINCT key relations — word-n-gram hashes in the
  * gate ([[TextFunctions.wordShingles]] + xxhash64, the q_decontaminate
  * checkpoint shape), but any key works (CDC chunk hashes for binary
  * corpora, line keys for line-level audits).
  *
  * 100 TB shape: the eval side is benchmark-sized, so it BROADCASTS and
  * the training corpus never shuffles — the scan emits only hit rows
  * (gram ∈ eval), and the two downstream aggregates (per-pair counts,
  * per-doc distinct hits) shuffle hits, not the corpus. The per-doc gram
  * counts are one map-side-combinable aggregate over the training
  * relation. Everything output is exact integers plus single divisions
  * of exact integers (micro-fractions), so the whole report replays
  * bit-for-bit in SQL.
  */
object CorpusOverlap {

  /** Per-training-doc overlap report against an eval corpus.
    *
    * `aSh`: (aId, keyCol) DISTINCT per-doc keys of the training side;
    * `bSh`: (bId, keyCol) DISTINCT per-doc keys of the eval side.
    * Returns one row per A doc that has at least one key:
    * (aId, na, n_hit_keys, hit_micro, top_bid, top_shared, top_micro):
    *   na          — A doc's distinct-key count
    *   n_hit_keys  — how many of them appear in ANY eval doc
    *   hit_micro   — floor(1e6 × n_hit_keys / na), the audit's headline
    *   top_bid     — the most-overlapping eval doc (max shared, then min
    *                 bid — deterministic), null when no overlap
    *   top_shared  — keys shared with top_bid (0 when no overlap)
    *   top_micro   — floor(1e6 × top_shared / na)
    * `minShared` drops pairs below the floor BEFORE top-1 selection (a
    * 1-gram accident is rarely a finding worth attributing). */
  def report(aSh: DataFrame, aId: String, bSh: DataFrame, bId: String,
             keyCol: String, minShared: Int = 1): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    // the documented DISTINCT precondition is made irrelevant rather than
    // trusted: EVERY count below is a countDistinct over keys, so duplicate
    // (id, key) rows cannot skew hit_micro/top_micro. This keeps the scale
    // shape — no distinct() pre-shuffle of the training side; dedup folds
    // into the per-id aggregates that shuffle anyway (na on __aid) or touch
    // hit rows only (perDoc/topPair).
    val a = aSh.select(col(aId).as("__aid"), col(keyCol).as("__k"))
    val b = bSh.select(col(bId).as("__bid"), col(keyCol).as("__k")).distinct()
    val na = a.groupBy(col("__aid")).agg(countDistinct(col("__k")).as("na"))
    // broadcast the eval side: the training scan emits hit rows only
    val hits = a.join(broadcast(b), Seq("__k"))
    val perDoc = hits.groupBy(col("__aid"))
      .agg(countDistinct(col("__k")).as("n_hit_keys"))
    val topPair = hits.groupBy(col("__aid"), col("__bid"))
      .agg(countDistinct(col("__k")).as("top_shared"))
      .where(col("top_shared") >= minShared)
      .withColumn("__rk", row_number().over(Window.partitionBy(col("__aid"))
        .orderBy(col("top_shared").desc, col("__bid").asc)))
      .where(col("__rk") === 1)
      .select(col("__aid"), col("__bid").as("top_bid"), col("top_shared"))
    na.join(perDoc, Seq("__aid"), "left")
      .join(topPair, Seq("__aid"), "left")
      .select(col("__aid").as(aId), col("na"),
        coalesce(col("n_hit_keys"), lit(0L)).as("n_hit_keys"),
        floor(coalesce(col("n_hit_keys"), lit(0L)) * 1000000L / col("na"))
          .as("hit_micro"),
        col("top_bid"),
        coalesce(col("top_shared"), lit(0L)).as("top_shared"),
        floor(coalesce(col("top_shared"), lit(0L)) * 1000000L / col("na"))
          .as("top_micro"))
  }
}
