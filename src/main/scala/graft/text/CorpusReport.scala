package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source corpus datasheet — the rollup a dataset release ships and a
  * curation run monitors between stages: document and character volume,
  * token volume, quality-rule pass rate, and exact-duplicate count, one
  * row per source. One pass over the corpus: all signals are scalar
  * expressions folded into a single partial-aggregated groupBy (the
  * dup count joins a groupBy(text) winner relation — the only extra
  * shuffle, and the one the semantics require).
  *
  * Counts and sums are exact integers — cross-engine replayable; rates
  * are left to the consumer (one division away) so the relation itself
  * stays hash-comparable. */
object CorpusReport {

  def perSource(df: DataFrame, srcCol: String, idCol: String,
                textCol: String,
                rules: QualityFilter.Rules = QualityFilter.Rules()): DataFrame = {
    val annotated = QualityFilter.annotate(df, textCol, rules)
    // exact-dup losers: every row whose text appeared under a smaller id
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(textCol)).orderBy(col(idCol))
    val withDup = annotated.withColumn("__rn", row_number().over(w))
    withDup.groupBy(col(srcCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col(textCol))).as("n_chars"),
        sum(col("n_words")).as("n_tokens"),
        sum(col("keep")).as("n_quality_pass"),
        sum(when(col("__rn") > 1, 1L).otherwise(0L)).as("n_exact_dup"))
  }
}
