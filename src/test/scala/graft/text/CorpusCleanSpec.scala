package graft.text

import graft.SparkTestBase

/** End-to-end corpus cleaning composition. */
class CorpusCleanSpec extends SparkTestBase {
  import spark.implicits._

  // the/and/of/to/in are stopwords -> 'en'; ratio also drives quality
  private val en = "the cat sat on the mat and the dog sat in the yard"
  private val enDup = en // byte-identical duplicate
  private val enNear = "the cat sat on the mat and the dog sat in the barn"
  private val und = "lorem ipsum dolor sit amet consectetur adipiscing elit"

  test("stages: language, quality, exact dedup, near-dup survivors") {
    val docs = Seq(
      (1L, en), (2L, enDup), (3L, enNear), (4L, und),
      (5L, "the and of to in") // all stopwords: en, high ratio
    ).toDF("doc_id", "text")

    // language filter only
    val langOnly = CorpusClean.clean(docs, "doc_id", "text",
      nearDup = CorpusClean.NoNearDup)
    assert(!langOnly.select("doc_id").as[Long].collect().contains(4L))

    // exact dedup: doc 2 (byte-identical to 1) dropped, min id kept
    assert(langOnly.select("doc_id").as[Long].collect().toSet == Set(1L, 3L, 5L))

    // near-dup: 3 is one-word-off 1 (high Jaccard) -> only 1 survives
    val cleaned = CorpusClean.clean(docs, "doc_id", "text",
      nearDup = CorpusClean.Exact(n = 3, threshold = 0.5))
    assert(cleaned.select("doc_id").as[Long].collect().toSet == Set(1L, 5L))
    // all columns preserved
    assert(cleaned.columns.toSeq == Seq("doc_id", "text"))

    // quality floor can drop everything
    val strict = CorpusClean.clean(docs, "doc_id", "text", minQuality = 0.99,
      nearDup = CorpusClean.NoNearDup)
    assert(strict.count() == 0)
  }

  test("LSH strategy returns a subset of the exact-strategy survivors' complement decisions") {
    val docs = (0L until 40L).map { i =>
      val base = "the cat sat on the mat and the dog ran in the yard again"
      val text = if (i % 4 == 0) base else base + s" tail$i word$i extra$i"
      (i, text)
    }.toDF("doc_id", "text")
    val exact = CorpusClean.clean(docs, "doc_id", "text",
      nearDup = CorpusClean.Exact(n = 3, threshold = 0.9))
      .select("doc_id").as[Long].collect().toSet
    val lsh = CorpusClean.clean(docs, "doc_id", "text",
      nearDup = CorpusClean.Lsh(n = 3, estThreshold = 0.9))
      .select("doc_id").as[Long].collect().toSet
    // LSH may miss pairs (recall < 1) but never invents them: its survivor
    // set is a superset of exact's
    assert(exact.subsetOf(lsh))
  }
}
