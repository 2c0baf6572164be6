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

  /** BM25 document scoring for a term-query workload (Robertson et al.,
    * Okapi BM25): for queries given as (qidCol, termCol) rows, score every
    * document sharing at least one term with a query:
    *
    *   score(d, q) = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
    *
    * with the same smoothed idf as [[tfIdf]]. Scale shape: the corpus
    * reduces to the (doc, term, tf) + (doc, len) relations once (partial
    * aggregation); the query workload is workload-sized — broadcast — so
    * the corpus never shuffles per query; per-(doc, query) partial scores
    * sum in one hash aggregate. avgdl and N are two scalar planning
    * aggregates. FP accumulation order is Spark's partial-sum order —
    * scores are floats for RANKING, not for cross-engine bit-compare
    * (the driver gate is rows-only; correctness is spec-pinned against a
    * driver-computed reference). */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queries: DataFrame, qidCol: String, termCol: String,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // NOTE: the (doc, term, tf) pipeline below is evaluated once per
    // consumer (query join + document-frequency reduction) — exchange
    // reuse does not fire across the two shapes. Persisting it instead
    // was A/B-probed at sf0.1 and measured 1.6x SLOWER (materialization +
    // extra exchange dwarf the recompute of a reduced relation); callers
    // at corpus scale who want single-pass tf can persist their docs
    // upstream.
    val tf = docs.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("__t"))
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__tf"))
    val lens = docs.select(col(idCol),
      TextFunctions.tokenCount(col(textCol)).cast("double").as("__len"))
    // N and avgdl in ONE planning aggregate (separate count() + avg()
    // jobs each re-scanned the corpus). avg over zero/all-null rows is
    // null — such a corpus scores nothing (and must not NPE unboxing the
    // scalar).
    val statsRow = lens.agg(count(lit(1)), avg(col("__len"))).head()
    if (statsRow.isNullAt(1))
      return queries.where(lit(false)).select(col(qidCol))
        .withColumn(idCol, lit(null).cast(docs.schema(idCol).dataType))
        .withColumn("score", lit(0.0))
    val n = statsRow.getLong(0)
    val avgdl = statsRow.getDouble(1)
    val dfreq = tf.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    val q = queries.select(col(qidCol), col(termCol).as("__t"))
    tf.join(broadcast(q), Seq("__t"))
      .join(dfreq, Seq("__t"))
      .join(lens, Seq(idCol))
      .withColumn("__part",
        (log((lit(n) + 1.0) / (col("__df") + 1.0)) + 1.0) *
          (col("__tf") * (k1 + 1.0)) /
          (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__len") / avgdl)))
      .groupBy(col(qidCol), col(idCol))
      .agg(sum(col("__part")).as("score"))
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
