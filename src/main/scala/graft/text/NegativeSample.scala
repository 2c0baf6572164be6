package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic negative sampling — the contrastive-pair builder: for
  * each (anchor, positive) row, draw `k` pseudo-random negatives from a
  * dense id space `[0, n)`, never equal to the positive. Sampling is
  * pure key-hash arithmetic with the classic skip construction — draw
  * uniformly from the n−1 non-positive ids (`h mod (n−1)`, shifted up
  * past the positive) — so a positive can NEVER leak in as its own
  * negative, and the dataset is reproducible across reruns,
  * partitionings and engines: the property that makes a contrastive
  * train set auditable.
  *
  * Scale shape: a scan-local explode of k rows per anchor — no shuffle,
  * no join against the corpus (the id space is dense 0..n−1 by
  * contract; remap ids first if sparse). Duplicate negatives within an
  * anchor are possible at tiny n and acceptable for contrastive loss
  * (documented, not joined away). */
object NegativeSample {

  /** `(anchorCol, posCol, neg_idx, neg_id)` with `neg_idx` 0..k−1 and
    * `neg_id` in `[0, n) \ {positive}`. Caller contract: ids and the
    * positive are in `[0, n)` and the anchor id is non-negative (pmod/%
    * parity — same note as [[CorpusSplit.keyHash]]). */
  def draw(pairs: DataFrame, anchorCol: String, posCol: String,
           n: Long, k: Int, salt: Long = 0L): DataFrame = {
    require(n > 1, s"negativeSample: id space must have > 1 ids, got $n")
    require(k > 0, s"negativeSample: k must be positive")
    val base = pairs.select(col(anchorCol), col(posCol),
      explode(sequence(lit(0), lit(k - 1))).as("neg_idx"))
    // seed pre-reduces mod SeedCap before the Knuth multiply — without it
    // `anchor * k` crosses 2^63 / KnuthA at anchor ~ 3.4e9/k and the
    // multiply throws ANSI ARITHMETIC_OVERFLOW (hit by the sf10 lane's
    // stacked ids); seeds below SeedCap hash exactly as before
    val h = pmod(
      pmod(col(anchorCol) * k + col("neg_idx") + lit(salt),
        lit(CorpusSplit.SeedCap)) * lit(CorpusSplit.KnuthA),
      lit(n - 1))
    base.withColumn("neg_id",
      when(h >= col(posCol), h + 1).otherwise(h))
  }

  /** The SQL replay of [[draw]] over a pairs relation — kept beside the
    * Scala so the arithmetic can't drift. */
  def drawSql(anchorCol: String, posCol: String, n: Long, k: Int,
              salt: Long = 0L): String = {
    val h = s"((($anchorCol * $k + neg_idx + $salt) % ${CorpusSplit.SeedCap})" +
      s" * ${CorpusSplit.KnuthA}) % ${n - 1}"
    s"CASE WHEN $h >= $posCol THEN $h + 1 ELSE $h END"
  }
}
