package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Character-n-gram language-model scoring — the dependency-free stand-in
  * for CCNet-style KenLM perplexity filtering: train gram counts on a
  * trusted reference slice (e.g. the target-language wiki), score every
  * candidate document by its mean per-gram log-probability under add-alpha
  * smoothing, then keep/bucket by score (head/middle/tail). Documents that
  * look like the reference distribution score high; boilerplate, noise and
  * wrong-language text score low.
  *
  * The MODEL IS A RELATION (gram, cnt) — vocabulary-bounded (`topV` rows,
  * deterministic count-desc/gram-asc cut), so scoring is one explode +
  * one broadcast join + one partial-aggregated average: the corpus side
  * never shuffles raw grams, only (doc, sum, count) buffers move. No
  * driver-side model state beyond the 1-row (N, V) stats collect.
  *
  * Scores are a RANKING signal, not normalized probabilities: counts
  * dropped by the `topV` cap stay in N, and unseen grams get the flat
  * alpha mass `alpha / (N + alpha*V)`. That is exactly what
  * quality-bucketing needs and what keeps the model broadcastable at any
  * corpus scale. */
object NgramLm {

  /** Train: (gram, cnt) — the `topV` most frequent character n-grams of
    * the reference corpus. One explode + one aggregate + one bounded
    * window over the aggregated (vocabulary-sized) relation. */
  def train(docs: DataFrame, textCol: String, n: Int = 3,
            topV: Int = 10000): DataFrame = {
    val cnt = docs
      .select(explode(graft.functions.char_shingles_all(col(textCol), n)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
    // global top-V via orderBy+limit = TakeOrderedAndProject: per-partition
    // partial top-V then one merge — never a single-partition window over
    // the full vocabulary relation
    cnt.orderBy(col("cnt").desc, col("gram").asc).limit(topV)
      .select(col("gram"), col("cnt"))
  }

  /** Per-LANGUAGE models in one pass (the CCNet shape: each document is
    * scored under its own language's reference distribution): one keyed
    * relation (langCol, gram, cnt), top `topVPerLang` grams per language
    * via a window over the aggregated vocabulary relation (per-language
    * partitions — bounded by the per-lang vocab, not the corpus). */
  def trainByLang(docs: DataFrame, langCol: String, textCol: String,
                  n: Int = 3, topVPerLang: Int = 10000): DataFrame = {
    val cnt = docs.select(col(langCol),
        explode(graft.functions.char_shingles_all(col(textCol), n)).as("gram"))
      .groupBy(col(langCol), col("gram")).agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(langCol))
      .orderBy(col("cnt").desc, col("gram").asc)
    cnt.withColumn("__r", row_number().over(w)).where(col("__r") <= topVPerLang)
      .select(col(langCol), col("gram"), col("cnt"))
  }

  /** Score each document under ITS OWN language's model: join on
    * (lang, gram) against the broadcast keyed model; per-language (N, V)
    * smoothing stats come from a languages-sized aggregate joined in.
    * Documents in a language absent from the model produce no row. */
  def scoreByLang(docs: DataFrame, idCol: String, langCol: String,
                  textCol: String, model: DataFrame,
                  n: Int = 3, alpha: Double = 0.1): DataFrame = {
    require(alpha > 0, "ngramLm.scoreByLang: alpha must be > 0")
    val mc = model.columns
    val m = model.select(col(mc(0)).as(langCol), col(mc(1)).as("gram"),
      col(mc(2)).as("cnt"))
    val stats = m.groupBy(col(langCol)).agg(
      sum(col("cnt")).as("__N"), count(lit(1)).as("__V"))
    val grams = docs.select(col(idCol), col(langCol),
      explode(graft.functions.char_shingles_all(col(textCol), n)).as("gram"))
    grams
      .join(broadcast(stats), Seq(langCol)) // inner: unknown langs drop
      .join(broadcast(m), Seq(langCol, "gram"), "left")
      .select(col(idCol), col(langCol),
        log((coalesce(col("cnt"), lit(0L)) + lit(alpha)) /
          (col("__N") + lit(alpha) * col("__V"))).as("__lp"))
      .groupBy(col(idCol), col(langCol))
      .agg(count(lit(1)).as("n_grams"), avg(col("__lp")).as("logp"))
  }

  /** Score each document: `(idCol, n_grams, logp)` where logp is the mean
    * of ln((c_g + alpha) / (N + alpha*V)) over the document's character
    * n-grams (with multiplicity). Documents shorter than `n` characters
    * have no grams and produce no row (no evidence, no score). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: DataFrame, n: Int = 3, alpha: Double = 0.1): DataFrame = {
    require(alpha > 0, "ngramLm.score: alpha must be > 0 (unseen grams need mass)")
    val stats = model.agg(
      sum(col("cnt")).as("N"), count(lit(1)).as("V")).head()
    val bigN = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val v = stats.getLong(1)
    val denom = bigN + alpha * v
    require(denom > 0, "ngramLm.score: empty model")
    val grams = docs.select(col(idCol),
      explode(graft.functions.char_shingles_all(col(textCol), n)).as("gram"))
    grams.join(broadcast(model), Seq("gram"), "left")
      .select(col(idCol),
        log((coalesce(col("cnt"), lit(0L)) + lit(alpha)) / lit(denom)).as("__lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), avg(col("__lp")).as("logp"))
  }
}
