package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting over a document table — corpus vocabulary
  * analysis, keyword extraction, and the classic retrieval score.
  *
  * Scale shape: term frequencies are one explode + hash aggregate on
  * (id, word) — partial aggregation absorbs within-partition repeats;
  * document frequencies reduce THAT relation (already one row per
  * (doc, word)) by word; the tf⋈df join is word-keyed — the df side is
  * vocabulary-sized, so AQE broadcasts it when it fits and shuffles
  * otherwise (both sides carry partial-agg'd rows, never raw tokens).
  * The corpus size N is one count() planning action.
  *
  * idf = ln((N + 1) / (df + 1)) + 1 (the smoothed form — no
  * division-by-zero, unseen-term safe). tfidf is a Double; rank-based
  * consumers ([[topTerms]]) order by the INTEGER (tf desc, df asc, word)
  * key instead, which is FP-free and therefore cross-engine exact. */
object TfIdf {

  /** (idCol, word, tf, dfreq, tfidf) — one row per (document, term). */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = docs.count()
    val tf = docs.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("dfreq"))
    tf.join(dfreq, Seq("word"))
      .withColumn("tfidf", col("tf") *
        (log((lit(n) + 1.0) / (col("dfreq") + 1.0)) + 1.0))
      .select(col(idCol), col("word"), col("tf"), col("dfreq"), col("tfidf"))
  }

  /** Top-k terms per document under the deterministic integer ordering
    * (tf desc, then rarer-first dfreq asc, then word asc) — the FP-free
    * twin of ranking by tfidf: for fixed tf, smaller df ⇔ larger idf ⇔
    * larger tfidf, so the orders agree wherever tfidf has no ties. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("dfreq").asc, col("word").asc)
    tfIdf(docs, idCol, textCol)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("word"), col("tf"), col("dfreq"))
  }
}
