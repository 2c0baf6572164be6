package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column hygiene — the quarantine pass every ANN/semantic-dedup
  * pipeline needs before indexing: a corrupt encoder batch ships NaN/Inf
  * components, zero vectors (cosine undefined), wrong dimensionality after
  * a model swap, or norm outliers (truncated writes, fp16 overflow). One
  * codegen scan classifies every vector; downstream indexes train on
  * `clean` only, and the quarantine reasons aggregate into a monitoring
  * relation.
  *
  * All rules are built-in higher-order-function expressions over the
  * array column — scan-local, zero shuffle, SQL-replayable. The norm
  * bounds compare SQUARED norms so the oracle needs no sqrt. */
object VectorHygiene {

  /** Per-row annotation: `dim`, `has_bad` (NaN/Inf component), `is_zero`,
    * `norm2` (squared L2, double), the first-match `reason` label, and the
    * conjunction `clean` given the expected dimension and inclusive
    * squared-norm bounds. */
  def annotate(df: DataFrame, vecCol: String, expectDim: Int,
               minNorm2: Double, maxNorm2: Double): DataFrame = {
    val v = col(vecCol)
    // isnan() is false for Inf: catch both via (x - x != 0) which is
    // NaN-or-Inf exactly, and NaN for nothing finite
    val bad = exists(v, x => x - x =!= 0.0f || isnan(x))
    val norm2 = aggregate(v, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    df.withColumn("dim", size(v))
      .withColumn("has_bad", bad)
      .withColumn("is_zero", !bad && norm2 === 0.0)
      .withColumn("norm2", norm2)
      .withColumn("reason",
        // null vector first: every other rule evaluates to NULL on a null
        // array and a three-valued-logic fall-through would label it clean
        when(v.isNull, "null_vector")
          .when(col("dim") =!= expectDim, "wrong_dim")
          .when(col("has_bad"), "nan_or_inf")
          .when(col("is_zero"), "zero_vector")
          .when(col("norm2") < minNorm2, "norm_low")
          .when(col("norm2") > maxNorm2, "norm_high")
          .otherwise("clean"))
      .withColumn("clean", col("reason") === "clean")
  }

  /** The vectors an index may train on. */
  def clean(df: DataFrame, vecCol: String, expectDim: Int,
            minNorm2: Double, maxNorm2: Double): DataFrame =
    annotate(df, vecCol, expectDim, minNorm2, maxNorm2)
      .where(col("clean"))
      .select(df.columns.map(col).toIndexedSeq: _*)

  /** Monitoring rollup: one row per quarantine reason with counts —
    * the relation a pipeline alerts on. */
  def quarantineStats(df: DataFrame, vecCol: String, expectDim: Int,
                      minNorm2: Double, maxNorm2: Double): DataFrame =
    annotate(df, vecCol, expectDim, minNorm2, maxNorm2)
      .groupBy(col("reason")).agg(count(lit(1)).as("n"))
}
