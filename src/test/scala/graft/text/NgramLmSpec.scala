package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class NgramLmSpec extends SparkTestBase {
  import spark.implicits._

  test("score matches an independent driver reference to 1e-12") {
    val ref = Seq((1L, "ababab"), (2L, "abcabc"), (3L, "xyzzyx"))
      .toDF("doc_id", "text")
    val cand = Seq((10L, "ababa"), (11L, "zzzzz"), (12L, "ab"))
      .toDF("doc_id", "text")
    val n = 2
    val alpha = 0.5
    val model = NgramLm.train(ref, "text", n, topV = 1000)
    // driver reference: counts with multiplicity over all 2-grams
    val counts = Seq("ababab", "abcabc", "xyzzyx")
      .flatMap(t => t.sliding(n).toSeq)
      .groupBy(identity).map { case (g, o) => g -> o.size.toLong }
    val bigN = counts.values.sum
    val v = counts.size
    val denom = bigN + alpha * v
    def expected(t: String): (Long, Double) = {
      val grams = t.sliding(n).toSeq.filter(_.length == n)
      val lps = grams.map(g => math.log((counts.getOrElse(g, 0L) + alpha) / denom))
      (grams.size.toLong, lps.sum / lps.size)
    }
    val got = NgramLm.score(cand, "doc_id", "text", model, n, alpha)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    for ((id, t) <- Seq(10L -> "ababa", 11L -> "zzzzz", 12L -> "ab")) {
      val (en, elp) = expected(t)
      assert(got(id)._1 == en, s"doc $id gram count")
      assert(math.abs(got(id)._2 - elp) < 1e-12, s"doc $id logp")
    }
  }

  test("in-distribution text outscores noise; sub-n docs yield no row") {
    val ref = (0 until 50).map(i => (i.toLong, "the quick brown fox jumps " * 3))
      .toDF("doc_id", "text")
    val model = NgramLm.train(ref, "text", 3, topV = 500)
    val cand = Seq(
      (1L, "the quick brown fox"),
      (2L, "qqq zzz kkk vvv www"),
      (3L, "ab") // shorter than n=3: no grams, no row
    ).toDF("doc_id", "text")
    val got = NgramLm.score(cand, "doc_id", "text", model, 3, alpha = 0.5)
      .select("doc_id", "logp").as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) > got(2L),
      s"in-distribution ${got(1L)} must beat noise ${got(2L)}")
  }

  test("per-language models: own-language text outscores cross-language; unknown langs drop") {
    val ref = (0 until 40).flatMap { i =>
      Seq((i.toLong * 2, "aa", "the quick brown fox jumps over"),
        (i.toLong * 2 + 1, "bb", "revo spmuj xof nworb kciuq eht"))
    }.toDF("doc_id", "lang", "text")
    val model = NgramLm.trainByLang(ref, "lang", "text", 3, topVPerLang = 500)
    assert(model.select("lang").distinct().as[String].collect().toSet ==
      Set("aa", "bb"))
    // the same sentence labeled with each language, plus an unknown lang
    val cand = Seq(
      (1L, "aa", "the quick brown fox"),
      (2L, "bb", "the quick brown fox"),
      (3L, "zz", "the quick brown fox")
    ).toDF("doc_id", "lang", "text")
    val got = NgramLm.scoreByLang(cand, "doc_id", "lang", "text", model, 3, 0.5)
      .select("doc_id", "logp").as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(1L, 2L), "unknown language must produce no row")
    assert(got(1L) > got(2L),
      s"own-language model ${got(1L)} must beat cross-language ${got(2L)}")
  }

  test("topV cap bounds the model; dropped grams score as unseen") {
    val ref = Seq((1L, "aaaa bbbb aaaa bbbb aaaa cc")).toDF("doc_id", "text")
    val full = NgramLm.train(ref, "text", 2, topV = 1000)
    val capped = NgramLm.train(ref, "text", 2, topV = 3)
    assert(capped.count() == 3 && full.count() > 3)
    // the cap keeps the most frequent grams (count desc, gram asc)
    val keptSet = capped.select("gram").as[String].collect().toSet
    val top3 = full.orderBy(col("cnt").desc, col("gram").asc).limit(3)
      .select("gram").as[String].collect().toSet
    assert(keptSet == top3)
    // a doc made of a dropped gram scores strictly below one made of a kept gram
    val cand = Seq((1L, "aaa"), (2L, "ccc")).toDF("doc_id", "text")
    val s = NgramLm.score(cand, "doc_id", "text", capped, 2, alpha = 0.5)
      .select("doc_id", "logp").as[(Long, Double)].collect().toMap
    assert(s(1L) > s(2L))
  }
}
