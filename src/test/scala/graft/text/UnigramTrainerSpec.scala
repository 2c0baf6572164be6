package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UnigramTrainerSpec extends SparkTestBase {
  import spark.implicits._
  import UnigramTrainer._

  // exhaustive-enumeration reference: all segmentations, probability-
  // weighted piece counts (the independent check on forward-backward)
  private def enumCounts(word: String, m: Model): Map[String, Double] = {
    def segs(s: Int): Seq[List[String]] =
      if (s == word.length) Seq(Nil)
      else (s + 1 to math.min(word.length, s + m.maxLen)).flatMap { e =>
        segs(e).map(word.substring(s, e) :: _)
      }
    def w(seg: List[String]): Double = seg.map { p =>
      m.logp.get(p) match {
        case Some(l) => math.exp(l)
        case None => if (p.length == 1) math.exp(UnkLogp) else 0.0
      }
    }.product
    val all = segs(0).map(s => (s, w(s))).filter(_._2 > 0)
    val z = all.map(_._2).sum
    if (z == 0) Map.empty
    else all.flatMap { case (seg, wt) => seg.map(p => (p, wt / z)) }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
  }

  private val toyModel = Model(Map(
    "a" -> math.log(0.3), "b" -> math.log(0.2), "ab" -> math.log(0.25),
    "ba" -> math.log(0.15), "abab" -> math.log(0.1)), maxLen = 4)

  test("forward-backward expected counts equal exhaustive enumeration") {
    for (word <- Seq("abab", "aab", "ba", "abba")) {
      val got = expectedCounts(word, toyModel).toMap
      val want = enumCounts(word, toyModel)
      assert(got.keySet == want.keySet, s"$word: ${got.keySet} vs ${want.keySet}")
      got.foreach { case (p, e) =>
        assert(math.abs(e - want(p)) < 1e-9, s"$word/$p: $e vs ${want(p)}") }
    }
  }

  test("viterbi finds the max-probability segmentation; unknown chars segment") {
    def bestEnum(word: String): Double = {
      def segs(s: Int): Seq[List[String]] =
        if (s == word.length) Seq(Nil)
        else (s + 1 to math.min(word.length, s + toyModel.maxLen)).flatMap { e =>
          segs(e).map(word.substring(s, e) :: _)
        }
      segs(word.length * 0).map(_.map(p => toyModel.logp.getOrElse(p,
        if (p.length == 1) UnkLogp else Double.NegativeInfinity)).sum).max
    }
    for (word <- Seq("abab", "aab", "abba", "bab")) {
      val v = viterbi(word, toyModel)
      assert(v.mkString("") == word, s"tokens must tile: $v")
      val score = v.map(p => toyModel.logp.getOrElse(p,
        if (p.length == 1) UnkLogp else Double.NegativeInfinity)).sum
      assert(math.abs(score - bestEnum(word)) < 1e-12,
        s"$word: viterbi $score vs enum ${bestEnum(word)}")
    }
    // never-seen characters fall back to single-char UNK pieces
    assert(viterbi("axb", toyModel) == Seq("a", "x", "b"))
  }

  private lazy val corpus = {
    // compositional vocabulary: shared morphemes across distinct words,
    // so EM has real structure to concentrate on
    val morphs = Seq("walk", "talk", "jump", "read")
    val sufs = Seq("ing", "ed", "er", "s")
    val words = for (m <- morphs; s <- sufs; _ <- 0 until 3) yield s"$m$s"
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  test("training concentrates mass on shared morphemes; encode uses them") {
    val vocab = UnigramTrainer.train(corpus, "text", vocabSize = 40,
      maxPieceLen = 5)
    val pieces = vocab.select("piece").as[String].collect().toSet
    assert(Seq("walk", "talk", "ing", "ed").forall(pieces.contains),
      s"morphemes should survive pruning: $pieces")
    val model = modelFromCounts(vocab)
    val enc = UnigramTrainer.encode(corpus.limit(0).unionByName(
        Seq((1000L, "walking reading")).toDF("doc_id", "text")),
      "doc_id", "text", model)
    val toks = enc.select("tokens").as[Seq[String]].head()
    // GPT-2-style pretokens carry their leading space, so the token
    // stream tiles the ORIGINAL text losslessly (spaces included)
    assert(toks.mkString("") == "walking reading", s"tiling broke: $toks")
    assert(toks.contains("ing") || toks.contains("walking"),
      s"encode should use learned pieces, got $toks")
  }

  test("training is bit-deterministic under repartitioning") {
    val a = UnigramTrainer.train(corpus, "text", vocabSize = 40,
        maxPieceLen = 5)
      .as[(String, Long)].collect().toSet
    val b = UnigramTrainer.train(corpus.repartition(13), "text",
        vocabSize = 40, maxPieceLen = 5)
      .as[(String, Long)].collect().toSet
    assert(a == b, "integer micro-count EM must not depend on partitioning")
  }

  test("encode reassembles multi-word documents in pretoken order") {
    val vocab = UnigramTrainer.train(corpus, "text", vocabSize = 40,
      maxPieceLen = 5)
    val model = modelFromCounts(vocab)
    val docs = Seq((1L, "walked jumps talking"), (2L, ""))
      .toDF("doc_id", "text")
    val out = UnigramTrainer.encode(docs, "doc_id", "text", model)
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect().toMap
    assert(out(1L).mkString("") == "walked jumps talking",
      s"order or tiling broke: ${out(1L)}")
    assert(!out.contains(2L), "empty docs produce no row (documented)")
  }

  test("prune keeps every single character; guards a too-small vocab") {
    val words = wordTable(corpus, "text")
    val seed = seedVocab(words, seedSize = 60, maxPieceLen = 5)
    val chars = seed.where(length($"piece") === 1)
      .select("piece").as[String].collect().toSet
    val pruned = UnigramTrainer.prune(seed, vocabSize = chars.size + 3)
    val kept = pruned.select("piece").as[String].collect().toSet
    assert(chars.subsetOf(kept), "chars are the coverage floor")
    assert(kept.size == chars.size + 3)
    intercept[IllegalArgumentException] {
      UnigramTrainer.prune(seed, vocabSize = chars.size)
    }
  }
}
