package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation over result/judgment RELATIONS — the
  * harness that turns the ANN/BM25/passage operators' outputs into
  * quality numbers at corpus scale: results are (query, item, rank) rows,
  * judgments are (query, item) rows, and every metric is one join + one
  * partial-aggregated groupBy — no per-query collect, so a million-query
  * eval runs like any other aggregation.
  *
  * FP discipline (the oracle contract): hits/judged counts are exact
  * integers; recall@k and reciprocal rank are SINGLE divisions of exact
  * integers — bit-identical across engines — and no metric is an
  * accumulated double sum. Corpus-level means stay downstream (average
  * the per-query relation however the report needs). */
object RetrievalEval {

  /** Per-query metrics of `results` (queryCol, itemCol, rankCol — ranks
    * 1-based, ≤ k) against `truth` (queryCol, itemCol):
    * `hits` = retrieved ∩ relevant, `judged` = |relevant|,
    * `recall_at_k` = hits/judged, `rr` = 1/rank of the first relevant
    * result (0 when none). Queries with judgments but no results count
    * (recall 0), queries with results but no judgments drop — standard
    * IR-eval semantics. */
  def perQuery(results: DataFrame, truth: DataFrame,
               queryCol: String, itemCol: String, rankCol: String): DataFrame = {
    val judged = truth.groupBy(col(queryCol))
      .agg(count(lit(1)).as("judged"))
    val hits = results.join(truth, Seq(queryCol, itemCol))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("hits"),
        min(col(rankCol)).as("first_rank"))
    judged.join(hits, Seq(queryCol), "left_outer")
      .select(col(queryCol),
        coalesce(col("hits"), lit(0L)).as("hits"),
        col("judged"),
        (coalesce(col("hits"), lit(0L)).cast("double") /
          col("judged").cast("double")).as("recall_at_k"),
        coalesce(lit(1.0) / col("first_rank").cast("double"), lit(0.0))
          .as("rr"))
  }
}
