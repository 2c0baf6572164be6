package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FastText-class document quality classifier — the supervised filter of
  * the GPT-3/LLaMA curation recipe ("does this page look like the trusted
  * corpus?"): logistic regression over hashed word uni+bigram
  * frequencies. Complements [[Dsir]] (generative importance ratio) with a
  * discriminative margin trained on explicit positive/negative labels.
  *
  * Split of labor, mirroring the engine's partitioner/k-means precedent:
  * TRAINING runs on the driver over a collected, bounded labeled sample —
  * curation classifiers train on 1e4..1e6 labeled docs (fastText itself
  * is single-node), and driver-side fixed-order gradient descent is
  * bit-deterministic where a distributed FP gradient reduce is
  * merge-order-dependent. The sample size is hard-capped (`maxSample`,
  * enforced with limit(n+1)) so the collect can never become a
  * corpus-scale driver sink. INFERENCE is where corpus scale lives and is
  * pure DataFrame ops: the model is a `(bucket, w)` relation of at most
  * B+1 rows, so scoring any corpus is explode → codegen hash → one
  * broadcast join → a partial-aggregated per-doc sum — identical shuffle
  * shape to [[Dsir.importanceWeights]]: only (doc, sum, count) buffers
  * move.
  *
  * Features are L1-normalized hashed counts (`tf = cnt_b / n_feats`), so
  * the margin is `bias + Σ_g w[bucket(g)] / n_feats` — computable from
  * the gram stream without materializing per-doc vectors.
  */
object QualityClassifier {

  /** Hard determinism note: grams per doc are collected in engine order
    * and re-sorted by (bucket) on the driver, so the GD accumulation
    * order is a pure function of the data, not of task scheduling. */
  private case class Sample(label: Double, buckets: Array[Long])

  @annotation.tailrec
  private def gcd(a: Int, b: Int): Int = if (b == 0) a else gcd(b, a % b)

  /** Train by per-sample Adagrad SGD (the Vowpal-Wabbit update for
    * hashed sparse features: per-weight adaptive steps, so rare
    * "contamination" n-grams reach decisive magnitude where plain SGD and
    * full-batch descent measurably underfit — both plateaued at ~80%
    * train accuracy on the diluted-suffix gate corpus, Adagrad fits it
    * fully); `epochs` passes in a FIXED data-derived order make the
    * result bit-deterministic. Returns
    * the model as a `(bucket, w)` relation with the bias at bucket -1.
    * `labeled` needs `textCol` and a 0/1 `labelCol`. Throws if the
    * labeled relation exceeds `maxSample` rows — label more selectively
    * or raise the cap consciously; silently truncating a training set
    * would be a correctness trap. */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
            buckets: Int, epochs: Int = 50, lr: Double = 0.5,
            l2: Double = 1e-7, maxSample: Int = 200000): DataFrame = {
    require(buckets > 0 && epochs > 0 && lr > 0 && l2 >= 0,
      "qualityClassifier.train: invalid hyperparameters")
    val spark = labeled.sparkSession
    import spark.implicits._
    val rows = labeled
      .select(col(labelCol).cast("double").as("label"),
        Dsir.featureBuckets(textCol, buckets).as("bks"))
      .limit(maxSample + 1)
      .as[(Double, Array[Long])].collect()
    require(rows.length <= maxSample,
      s"qualityClassifier.train: labeled sample exceeds maxSample=$maxSample")
    val samples = rows.iterator
      .filter(_._2.nonEmpty) // no features, no evidence
      .map { case (y, bks) =>
        require(y == 0.0 || y == 1.0,
          s"qualityClassifier.train: label must be 0/1, got $y")
        java.util.Arrays.sort(bks)
        Sample(y, bks)
      }.toArray.sortWith { (a, b) =>
        // full lexicographic order (label, length, elements): a pure
        // function of the data with no hash-collision hole — two distinct
        // samples can never compare equal and inherit collect() order
        if (a.label != b.label) a.label < b.label
        else if (a.buckets.length != b.buckets.length)
          a.buckets.length < b.buckets.length
        else {
          val c = java.util.Arrays.compare(a.buckets, b.buckets)
          c < 0
        }
      }
    require(samples.nonEmpty, "qualityClassifier.train: empty labeled sample")

    val w = new Array[Double](buckets)
    var bias = 0.0
    // interleave classes deterministically so no epoch suffix is
    // single-class (samples is label-sorted); the stride walks the array
    // in a fixed coprime order
    val order = {
      val n = samples.length
      var stride = math.max(1, (n * 0.618).toInt)
      while (gcd(stride, n) != 1) stride += 1
      Array.tabulate(n)(i => (i.toLong * stride % n).toInt)
    }
    val g2 = new Array[Double](buckets) // Adagrad accumulators
    var g2Bias = 0.0
    val eps = 1e-8
    var ep = 0
    while (ep < epochs) {
      var oi = 0
      while (oi < order.length) {
        val s = samples(order(oi))
        val n = s.buckets.length.toDouble
        var m = bias
        var i = 0
        while (i < s.buckets.length) { m += w(s.buckets(i).toInt) / n; i += 1 }
        val err = 1.0 / (1.0 + math.exp(-m)) - s.label
        i = 0
        while (i < s.buckets.length) {
          val b = s.buckets(i).toInt
          val g = err / n + l2 * w(b)
          g2(b) += g * g
          w(b) -= lr / math.sqrt(g2(b) + eps) * g
          i += 1
        }
        g2Bias += err * err
        bias -= lr / math.sqrt(g2Bias + eps) * err
        oi += 1
      }
      ep += 1
    }
    ((-1L, bias) +: w.iterator.zipWithIndex.collect {
      case (wb, b) if wb != 0.0 => (b.toLong, wb)
    }.toSeq).toDF("bucket", "w")
  }

  /** Score a corpus under a [[train]]ed model: `(idCol, n_feats, margin,
    * prob)` where `margin = bias + Σ w[bucket]/n_feats` and `prob =
    * sigmoid(margin)`. Documents with no features produce no row. One
    * corpus scan, broadcast-joined against the ≤B+1-row model. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: DataFrame, buckets: Int): DataFrame = {
    val mc = model.columns
    val m = model.select(col(mc(0)).as("bucket"), col(mc(1)).as("w"))
    // 1-row collect of the bias term
    val biasRows = m.where(col("bucket") === -1L).select(col("w")).collect()
    val bias = if (biasRows.isEmpty) 0.0 else biasRows(0).getDouble(0)
    docs
      .select(col(idCol), explode(Dsir.featureBuckets(textCol, buckets)).as("bucket"))
      .join(broadcast(m.where(col("bucket") >= 0)), Seq("bucket"), "left")
      .select(col(idCol), coalesce(col("w"), lit(0.0)).as("__w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("__w")).as("__sw"))
      .select(col(idCol), col("n_feats"),
        (lit(bias) + col("__sw") / col("n_feats")).as("margin"))
      .withColumn("prob", lit(1.0) / (lit(1.0) + exp(-col("margin"))))
  }
}
