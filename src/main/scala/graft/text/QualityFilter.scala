package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-class rule-based document quality filter: word-count bounds,
  * mean-word-length bounds, and a stopword-ratio floor, each surfaced as a
  * 0/1 rule column plus the conjunction `keep`.
  *
  * This is the heuristic-filter stage of a pre-training data pipeline
  * (Rae et al., "Scaling Language Models: ... Gopher", §A1.1 filtering
  * heuristics — public paper). Every rule is a scalar expression over the
  * text column, so the whole annotation stays inside whole-stage codegen:
  * one scan, no shuffle, no UDFs. At 100 TB the filter runs as a mapper
  * fused into whatever consumes it; rows are dropped before any shuffle
  * pays for them.
  *
  * All features are integer counts or single IEEE divisions of integers,
  * so threshold comparisons are bit-deterministic and a plain-SQL oracle
  * reproduces them exactly.
  */
object QualityFilter {

  /** Rule thresholds. Defaults are sized for the synthetic `documents`
    * corpus (10-99 words, mean word length ~4.5, stopword ratio ~0.06) so
    * each rule genuinely splits it; production corpora tune these. */
  final case class Rules(
      minWords: Int = 25,
      maxWords: Int = 80,
      minAvgWordLen: Double = 4.3,
      maxAvgWordLen: Double = 4.7,
      minStopRatio: Double = 0.02)

  /** Adds `n_words`, `avg_wlen`, `stop_ratio`, the per-rule 0/1 columns
    * `pass_len` / `pass_wlen` / `pass_stop`, and their conjunction `keep`. */
  def annotate(df: DataFrame, textCol: String, rules: Rules = Rules()): DataFrame = {
    import TextFunctions._
    val t = col(textCol)
    val passLen = tokenCount(t).between(rules.minWords, rules.maxWords)
    val passWlen = avgWordLen(t) >= rules.minAvgWordLen &&
      avgWordLen(t) <= rules.maxAvgWordLen
    val passStop = stopwordRatio(t) >= rules.minStopRatio
    df.withColumn("n_words", tokenCount(t))
      .withColumn("avg_wlen", avgWordLen(t))
      .withColumn("stop_ratio", stopwordRatio(t))
      .withColumn("pass_len", passLen.cast("int"))
      .withColumn("pass_wlen", passWlen.cast("int"))
      .withColumn("pass_stop", passStop.cast("int"))
      .withColumn("keep", (passLen && passWlen && passStop).cast("int"))
  }

  /** The filtering form: rows that pass every rule, original columns only. */
  def filter(df: DataFrame, textCol: String, rules: Rules = Rules()): DataFrame = {
    val cols = df.columns.map(col).toIndexedSeq
    annotate(df, textCol, rules).where(col("keep") === 1).select(cols: _*)
  }

  /** Calibrate rule thresholds FROM the corpus: word-count bounds at the
    * (pTail, 1−pTail) quantiles, mean-word-length bounds likewise, and
    * the stopword floor at pTail — the "trim the distribution tails"
    * recipe a new corpus needs before anyone hand-tunes. approxQuantile
    * is one distributed pass with a driver-bounded sketch (relativeError
    * 0.001); calibration is approximate BY DESIGN (thresholds are policy,
    * not semantics), while the resulting filter stays exact and
    * oracle-replayable since Rules are plain constants once derived. */
  def calibrate(df: DataFrame, textCol: String,
                pTail: Double = 0.1): Rules = {
    require(pTail > 0 && pTail < 0.5, s"calibrate: pTail in (0, 0.5), got $pTail")
    import TextFunctions._
    val t = col(textCol)
    val feats = df.select(tokenCount(t).cast("double").as("nw"),
      avgWordLen(t).as("awl"), stopwordRatio(t).as("sr"))
    val qs = Array(pTail, 1.0 - pTail)
    // multi-column form: ONE pass builds all three sketches (the
    // single-column overload would scan the corpus three times)
    val Array(nwQ, awlQ, srQ) =
      feats.stat.approxQuantile(Array("nw", "awl", "sr"), qs, 0.001)
    Rules(
      minWords = nwQ(0).toInt, maxWords = nwQ(1).toInt,
      minAvgWordLen = awlQ(0), maxAvgWordLen = awlQ(1),
      minStopRatio = srQ(0))
  }
}
