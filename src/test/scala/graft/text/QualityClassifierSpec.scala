package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(n: Int) = (0 until n).map { i =>
    val good = i % 2 == 0
    val text =
      if (good) s"thoughtful encyclopedic prose section ${i % 5} with careful citations"
      else s"click buy casino pills now deal ${i % 5} free winner jackpot"
    (i.toLong, text, if (good) 1 else 0)
  }.toDF("doc_id", "text", "label")

  test("separable corpus trains to full accuracy and generalizes") {
    val train = corpus(200)
    val model = QualityClassifier.train(train, "text", "label", buckets = 1024)
    // held-out docs reuse the vocabularies but in unseen index combinations
    val holdout = Seq(
      (1000L, "encyclopedic prose with careful citations", 1),
      (1001L, "thoughtful section with citations", 1),
      (1002L, "casino jackpot free pills", 0),
      (1003L, "click now winner deal", 0)).toDF("doc_id", "text", "label")
    def acc(df: org.apache.spark.sql.DataFrame): Double = {
      val s = QualityClassifier.score(df, "doc_id", "text", model, 1024)
        .join(df.select(col("doc_id"), col("label")), "doc_id")
      val (hit, tot) = s.select(
          sum(when((col("prob") > 0.5) === (col("label") === 1), 1).otherwise(0)),
          count(lit(1)))
        .as[(Long, Long)].head()
      hit.toDouble / tot
    }
    assert(acc(train) == 1.0, "training set must separate fully")
    assert(acc(holdout) == 1.0, "held-out recombinations must classify correctly")
  }

  test("training is bit-deterministic across runs and input order") {
    val a = QualityClassifier.train(corpus(100), "text", "label", 256)
      .as[(Long, Double)].collect().toMap
    val b = QualityClassifier.train(
        corpus(100).orderBy(col("doc_id").desc).repartition(7),
        "text", "label", 256)
      .as[(Long, Double)].collect().toMap
    assert(a == b, "model must not depend on row order or partitioning")
  }

  test("probabilities are calibrated-ordered: good > mixed > bad") {
    val model = QualityClassifier.train(corpus(200), "text", "label", 1024)
    val cand = Seq(
      (1L, "encyclopedic prose with careful citations"),
      (2L, "encyclopedic prose casino pills"),
      (3L, "casino pills free jackpot")).toDF("doc_id", "text")
    val p = QualityClassifier.score(cand, "doc_id", "text", model, 1024)
      .select("doc_id", "prob").as[(Long, Double)].collect().toMap
    assert(p(1L) > p(2L) && p(2L) > p(3L),
      s"expected monotone quality ordering, got $p")
  }

  test("guards: oversized sample, bad labels, empty docs") {
    val small = corpus(50)
    intercept[IllegalArgumentException] {
      QualityClassifier.train(small, "text", "label", 64, maxSample = 10)
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.train(
        small.withColumn("label", col("label") + 1), "text", "label", 64)
    }
    val model = QualityClassifier.train(small, "text", "label", 256)
    val scored = QualityClassifier.score(
      Seq((1L, "prose"), (2L, "")).toDF("doc_id", "text"),
      "doc_id", "text", model, 256)
    assert(scored.select("doc_id").as[Long].collect().toSet == Set(1L),
      "empty doc must produce no score row")
  }
}
