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
