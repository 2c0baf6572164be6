package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 scale quantization for embedding storage —
  * the 4× memory cut (64 B codes + one scale vs 256 B float32 at dim 64)
  * that decides whether a 100 TB vector corpus's scan working set fits the
  * cluster. codes_i = round(x_i / scale), scale = max|x| / 127 — the
  * standard symmetric scheme; reconstruction error is bounded by scale/2
  * per element. Zero vectors quantize to all-zero codes with scale 0.
  *
  * Column-only (per-element HOFs over dim-sized arrays — a storage
  * transform that runs once per corpus, not a per-candidate hot path; the
  * hot path scans the CODES via [[dequantize]] + the codegen cosine
  * kernel). Composes with every ANN path: quantize → store codes →
  * dequantize at scan time → brute/IVF/LSH scoring unchanged. */
object Quantize {

  /** Adds (q_codes: array<tinyint>, q_scale: double) next to `vecCol`. */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val scale = aggregate(col(vecCol), lit(0.0),
      (m, x) => greatest(m, abs(x.cast("double")))) / 127.0
    df.withColumn("q_scale", scale)
      .withColumn("q_codes",
        when(col("q_scale") === 0.0,
          transform(col(vecCol), _ => lit(0).cast("tinyint")))
        .otherwise(transform(col(vecCol),
          x => round(x.cast("double") / col("q_scale")).cast("tinyint"))))
  }

  /** Reconstruct a float vector from codes + scale (code_i · scale). */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => (c.cast("double") * scale).cast("float"))
}
