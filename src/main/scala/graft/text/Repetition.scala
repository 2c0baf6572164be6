package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher's duplicate-n-gram repetition signals — the document-level
  * companions to the duplicate-line and top-word fractions
  * ([[TextFunctions]]): machine-generated and template text repeats
  * PHRASES, which line-level signals miss when the wrapper varies.
  *
  * Per document and n: `dup_ngram_char_frac` = characters inside word
  * n-grams occurring ≥ 2 times, as the standard
  * `sum(count × len(gram)) / len(text)` estimate (overlapping
  * occurrences count fully — the RedPajama/Dolma convention, exact
  * integers so the single division is FP-replayable); and
  * `top_ngram_char_frac` = the largest `count × len(gram)` over all
  * grams (the product convention makes the tie deterministic).
  *
  * Shape: one shingle-kernel scan, explode, and a two-level keyed
  * aggregation — partial aggregation absorbs hot grams map-side and
  * nothing quadratic touches a row. Documents with fewer than n words
  * have no n-grams and yield NO row (compose with a left join when
  * every doc needs a row). */
object Repetition {

  def dupNgramStats(df: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame = {
    require(n >= 1, s"dupNgramStats: n must be >= 1, got $n")
    val grams = df.select(col(idCol), length(col(textCol)).as("__len"),
      explode(graft.functions.word_shingles_all(col(textCol), n)).as("g"))
    grams.groupBy(col(idCol), col("__len"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol), col("__len"))
      .agg(
        sum(when(col("c") >= 2, col("c") * length(col("g")))
          .otherwise(lit(0L))).as("__dup"),
        max(col("c") * length(col("g"))).as("__top"))
      .select(col(idCol),
        (col("__dup").cast("double") /
          greatest(col("__len"), lit(1)).cast("double"))
          .as(s"dup_${n}gram_char_frac"),
        (col("__top").cast("double") /
          greatest(col("__len"), lit(1)).cast("double"))
          .as(s"top_${n}gram_char_frac"))
  }
}
