package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DsirSpec extends SparkTestBase {
  import spark.implicits._

  test("importanceWeights matches an independent driver reference to 1e-12") {
    val target = Seq((1L, "the cat sat"), (2L, "the cat ran")).toDF("doc_id", "text")
    val raw = Seq((1L, "the cat sat"), (2L, "dogs bark loud"),
      (3L, "zz qq pp")).toDF("doc_id", "text")
    val cand = Seq((10L, "the cat"), (11L, "dogs bark"), (12L, "zz unseen"))
      .toDF("doc_id", "text")
    val b = 64
    val alpha = 0.5
    val tm = Dsir.fitFeatures(target, "text", b)
    val rm = Dsir.fitFeatures(raw, "text", b)

    // driver reference: reuse the engine's (pinned-elsewhere) shingle+hash
    // kernel to recover each doc's bucket multiset, then do the smoothing
    // arithmetic independently in exact driver doubles
    def buckets(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.select(col("doc_id"), explode(filter(concat(
          graft.functions.word_shingles_all(col("text"), 1),
          graft.functions.word_shingles_all(col("text"), 2)),
          g => length(g) > 0)).as("g"))
        .select(col("doc_id"), pmod(xxhash64(col("g")), lit(b.toLong)).as("bk"))
        .as[(Long, Long)].collect().toSeq.groupBy(_._1).map {
          case (k, v) => k -> v.map(_._2)
        }
    val tCnt = buckets(target).values.flatten
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rCnt = buckets(raw).values.flatten
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val dt = tCnt.values.sum + alpha * b
    val dr = rCnt.values.sum + alpha * b
    val expected = buckets(cand).map { case (id, bks) =>
      id -> ((bks.size.toLong, bks.map(bk =>
        math.log((tCnt.getOrElse(bk, 0L) + alpha) / dt) -
        math.log((rCnt.getOrElse(bk, 0L) + alpha) / dr)).sum))
    }

    val got = Dsir.importanceWeights(cand, "doc_id", "text", tm, rm, b, alpha)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == expected.keySet)
    for ((id, (en, elw)) <- expected) {
      assert(got(id)._1 == en, s"doc $id feature count")
      assert(math.abs(got(id)._2 - elw) < 1e-12,
        s"doc $id logw: got ${got(id)._2}, expected $elw")
    }
  }

  test("target-like documents outweigh off-target; empty docs yield no row") {
    val target = (0 until 40).map(i =>
      (i.toLong, "high quality encyclopedic prose about science " * 2))
      .toDF("doc_id", "text")
    val raw = (0 until 40).flatMap(i => Seq(
      (i.toLong * 2, "high quality encyclopedic prose about science " * 2),
      (i.toLong * 2 + 1, "click here buy now spam casino pills " * 2)))
      .toDF("doc_id", "text")
    val tm = Dsir.fitFeatures(target, "text", 4096)
    val rm = Dsir.fitFeatures(raw, "text", 4096)
    val cand = Seq(
      (1L, "encyclopedic prose about science"),
      (2L, "buy now spam casino"),
      (3L, "")).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(cand, "doc_id", "text", tm, rm, 4096, 0.5)
      .select("doc_id", "logw").as[(Long, Double)].collect().toMap
    assert(w.keySet == Set(1L, 2L), "empty doc must produce no row")
    assert(w(1L) > w(2L),
      s"target-like ${w(1L)} must outweigh off-target ${w(2L)}")
  }

  test("resample is deterministic, k-bounded, and weight-respecting") {
    val target = (0 until 30).map(i => (i.toLong, "alpha beta gamma delta " * 3))
      .toDF("doc_id", "text")
    val raw = (0 until 200).map { i =>
      val t = if (i % 10 == 0) "alpha beta gamma delta " * 3
              else s"noise${i} junk${i * 7} filler${i * 13} " * 3
      (i.toLong, t)
    }.toDF("doc_id", "text")
    val tm = Dsir.fitFeatures(target, "text", 4096)
    val rm = Dsir.fitFeatures(raw, "text", 4096)
    val w = Dsir.importanceWeights(raw, "doc_id", "text", tm, rm, 4096, 0.5)

    val s1 = Dsir.resample(w, "doc_id", 20, seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Dsir.resample(w, "doc_id", 20, seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "same seed must reproduce the same sample")
    assert(s1.size == 20)
    // the 20 target-like docs dominate the weight distribution: Gumbel noise
    // is O(1) while their logw margin is tens of nats — all must be selected
    val targetLike = (0 until 200).filter(_ % 10 == 0).map(_.toLong).toSet
    assert(targetLike.subsetOf(s1),
      s"all target-like docs must be selected; missing ${targetLike -- s1}")
  }

  test("grams absent from both corpora get the constant domain-fallback ratio") {
    val target = Seq((1L, "aa bb")).toDF("doc_id", "text")
    val raw = Seq((1L, "aa bb")).toDF("doc_id", "text")
    val b = 32; val alpha = 0.5
    val tm = Dsir.fitFeatures(target, "text", b)
    val rm = Dsir.fitFeatures(raw, "text", b)
    // single word, unseen anywhere: 1 unigram feature, 0 bigrams
    val cand = Seq((9L, "unseenword")).toDF("doc_id", "text")
    val got = Dsir.importanceWeights(cand, "doc_id", "text", tm, rm, b, alpha)
      .as[(Long, Long, Double)].collect()
    // both corpora identical => Nt == Nr => the fallback ratio is exactly 0
    // UNLESS the unseen word hash-collides with a seen bucket (b=32 makes
    // collision plausible) — in either case target and raw counts are equal
    // per bucket, so logw is exactly 0
    assert(got.length == 1 && got(0)._2 == 1L)
    assert(got(0)._3 == 0.0,
      s"identical corpora must give zero log-ratio, got ${got(0)._3}")
  }
}
