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

  test("empty corpus flows through every stage") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(CorpusClean.clean(empty, "doc_id", "text").count() == 0)
    assert(CorpusClean.clean(empty, "doc_id", "text",
      nearDup = CorpusClean.Lsh()).count() == 0)
  }

  test("LSH strategy survivors = union-find over its own mined pairs") {
    val docs = (0L until 40L).map { i =>
      val base = "the cat sat on the mat and the dog ran in the yard again"
      val text = if (i % 4 == 0) base else base + s" tail$i word$i extra$i"
      (i, text)
    }.toDF("doc_id", "text")
    // exact dedup collapses the 10 identical docs to doc 0 first
    val afterExact = CorpusClean.clean(docs, "doc_id", "text",
      nearDup = CorpusClean.NoNearDup).select("doc_id").as[Long].collect().toSet
    assert(afterExact == (0L until 40L).toSet -- (4L until 40L by 4))
    // the sound invariant: LSH survivors are exactly the min-id per
    // component of the pair graph LSH itself mined (est-Jaccard has both
    // false negatives AND false positives vs exact, so exact-vs-LSH
    // survivor sets are not subset-ordered in either direction)
    val pairs = graft.dedup.TextDedup.minHashLshPairs(
        docs.where($"doc_id".isin(afterExact.toSeq: _*)), "doc_id", "text",
        n = 3, estThreshold = 0.9)
      .select("ida", "idb").as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map(afterExact.map(i => i -> i).toSeq: _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = afterExact.filter(i => find(i) == i)
    val lsh = CorpusClean.clean(docs, "doc_id", "text",
      nearDup = CorpusClean.Lsh(n = 3, estThreshold = 0.9))
      .select("doc_id").as[Long].collect().toSet
    assert(lsh == want)
  }
}
