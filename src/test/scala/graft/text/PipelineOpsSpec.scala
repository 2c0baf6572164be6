package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.TextDedup

class PipelineOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("calibrate derives tail-trimming rules from the corpus itself") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rules = QualityFilter.calibrate(docs, "text", pTail = 0.1)
    // bounds land inside the corpus's range and in order
    assert(rules.minWords >= 1 && rules.minWords < rules.maxWords)
    assert(rules.minAvgWordLen < rules.maxAvgWordLen)
    assert(rules.minStopRatio >= 0.0)
    // trimming both 10% tails on three axes keeps a real middle band:
    // more than half the corpus, less than all of it
    val kept = QualityFilter.filter(docs, "text", rules).count()
    val n = docs.count()
    assert(kept > n / 2 && kept < n, s"kept $kept of $n")
    // deterministic: same corpus, same rules
    assert(rules == QualityFilter.calibrate(docs, "text", pTail = 0.1))
  }

  test("QualityFilter rules split on each axis independently") {
    val rules = QualityFilter.Rules(
      minWords = 3, maxWords = 5,
      minAvgWordLen = 2.0, maxAvgWordLen = 4.0,
      minStopRatio = 0.2)
    val docs = Seq(
      (1L, "the cat sat on"),        // 4 words, awl 2.75, stop 0.5 -> keep
      (2L, "cat sat"),               // too few words
      (3L, "the cat sat on a mat x"),// too many words
      (4L, "xx yy zz"),              // no stopwords
      (5L, "the extraordinarily magnificent contraption") // awl too high
    ).toDF("doc_id", "text")
    val got = QualityFilter.annotate(docs, "text", rules)
      .select($"doc_id", $"pass_len", $"pass_wlen", $"pass_stop", $"keep")
      .as[(Long, Int, Int, Int, Int)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(got(1L) == ((1, 1, 1, 1)))
    assert(got(2L)._1 == 0 && got(2L)._4 == 0)
    assert(got(3L)._1 == 0 && got(3L)._4 == 0)
    assert(got(4L)._3 == 0 && got(4L)._4 == 0)
    assert(got(5L)._2 == 0 && got(5L)._4 == 0)
    val kept = QualityFilter.filter(docs, "text", rules)
    assert(kept.columns.toSeq == Seq("doc_id", "text"),
      "filter form must restore the original projection")
    assert(kept.as[(Long, String)].collect().map(_._1).toSeq == Seq(1L))
  }

  test("ShardBuild concat is id-ordered and partitioning-invariant") {
    val rnd = new scala.util.Random(7)
    val docs = rnd.shuffle((0L until 200L).toList)
      .map(id => (id, s"g${id % 3}", s"text body number $id"))
      .toDF("doc_id", "grp", "text")
    // reference md5 computed driver-side in explicit ascending-id order
    val byShard = docs.as[(Long, String, String)].collect()
      .groupBy { case (id, g, _) => (g, id % 5) }
      .map { case (k, rows) =>
        val joined = rows.sortBy(_._1).map(_._3).mkString("\n")
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(joined.getBytes("UTF-8")).map("%02x".format(_)).mkString
        (k._1, k._2, rows.length.toLong, rows.map(_._3.length.toLong).sum, md)
      }.toSet
    for (parts <- Seq(1, 7)) {
      val got = ShardBuild.buildShards(
        docs.repartition(parts), Seq("grp"), "doc_id", "text", slots = 5)
        .as[(String, Long, Long, Long, String)].collect().toSet
      assert(got == byShard, s"shards diverged at numPartitions=$parts")
    }
  }

  test("writeShards: one file per shard, file bytes = contract bytes + newline") {
    val docs = (0L until 60L)
      .map(id => (id, s"g${id % 2}", s"doc body $id"))
      .toDF("doc_id", "grp", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_shardw").toString
    ShardBuild.writeShards(docs.repartition(5), Seq("grp"), "doc_id", "text", 3, path)
    val files = spark.read.format("binaryFile").load(path)
      .select($"grp", $"slot".cast("long"), $"path", $"content").collect()
    assert(files.length == 6, "2 groups x 3 slots = 6 shard files")
    assert(files.map(r => (r.getString(0), r.getLong(1))).toSet ==
      (for (g <- 0 until 2; s <- 0 until 3) yield (s"g$g", s.toLong)).toSet)
    val want = ShardBuild.buildShards(docs, Seq("grp"), "doc_id", "text", 3)
      .select($"grp", $"slot", $"shard_md5")
      .as[(String, Long, String)].collect()
      .map { case (g, s, m) => (g, s) -> m }.toMap
    files.foreach { r =>
      val bytes = r.getAs[Array[Byte]](3)
      assert(bytes.last == '\n'.toByte, "text sink terminates the shard line")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes.dropRight(1)).map("%02x".format(_)).mkString
      assert(md == want((r.getString(0), r.getLong(1))),
        s"file bytes diverge from the shard_md5 contract at ${r.getString(2)}")
    }
  }

  test("dedupLinesAcross: first (doc,pos) occurrence wins, docs reassemble in order, empty-line docs can vanish") {
    import graft.dedup.TextDedup
    val docs = Seq(
      (1L, "alpha\nbeta\ngamma"),
      (2L, "beta\ndelta"),        // beta loses to doc 1
      (3L, "alpha\nbeta"),        // both lines lose -> doc 3 drops
      (4L, "eps\neps\nzeta"),     // within-doc dup: second eps drops
      (5L, ""),                   // the empty line's first occurrence
      (6L, "")                    // loses the empty line -> drops
    ).toDF("doc_id", "text")
    val got = TextDedup.dedupLinesAcross(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "alpha\nbeta\ngamma",
      2L -> "delta",
      4L -> "eps\nzeta",
      5L -> ""))
    // partition-invariant (the shuffle keys carry the semantics)
    val got7 = TextDedup.dedupLinesAcross(docs.repartition(7), "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got7 == got)
  }

  test("BpeTrainer: merges match a driver reference on a known corpus; apply is non-overlapping") {
    // hand-checkable corpus: "low lower lowest" style — first merge must
    // be the most frequent adjacent char pair, weighted by word counts
    val docs = Seq(
      (1L, "low low low lower lower lowest"),
      (2L, "new newer newest low")).toDF("doc_id", "text")
    val got = BpeTrainer.train(docs, "text", numMerges = 6, minCount = 2)

    // driver reference: same deterministic rule ((count desc, pair asc))
    def pretokens(t: String): Seq[String] =
      TextFunctions.BpePretokenPattern.r.findAllMatchIn(t).map(_.group(1)).toSeq
    var words: Map[Seq[String], Long] = Seq(1L -> "low low low lower lower lowest",
        2L -> "new newer newest low")
      .flatMap { case (_, t) => pretokens(t) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, n) => (w.map(_.toString): Seq[String], n) }
    val expect = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 0 until 6) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + n
        }
      }
      val eligible = counts.filter(_._2 >= 2)
      if (eligible.nonEmpty) {
        val ((a, b), c) = eligible.minBy { case ((x, y), n) => (-n, x, y) }
        expect += ((a, b, c))
        words = words.map { case (syms, n) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toSeq, n)
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    assert(got.map(m => (m.left, m.right, m.count)) == expect.toSeq,
      s"got=${got}")
    assert(got.map(_.rank) == got.indices)

    // non-overlapping apply: "aaaa" + merge (a,a) -> ["aa","aa"]
    val syms = Seq("aaaa").toDF("w").select(split($"w", "").as("s"))
    val applied = syms.select(
        BpeTrainer.applyMerges($"s", Seq(BpeTrainer.Merge(0, "a", "a", 9L))).as("m"))
      .head().getSeq[String](0)
    assert(applied == Seq("aa", "aa"))
  }

  test("WordShingles kernel is bit-identical to the relational formulation on adversarial inputs") {
    // differential test vs the pre-round-9 slice/concat_ws/array_distinct
    // chain it replaced — identical semantics is the kernel's contract
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.types.{ArrayType, StringType}
    def relational(text: Column, n: Int, distinct: Boolean): Column = {
      val ws = split(text, " ")
      val all = transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + 1, lit(n))))
      when(size(ws) >= n, if (distinct) array_distinct(all) else all)
        .otherwise(array().cast(ArrayType(StringType)))
    }
    val rnd = new scala.util.Random(41)
    val alphabet = "ab x"
    val fixtures = Seq("", " ", "  ", "a", "a b", " a", "a ", "a  b",
      "a b a b a", "one\ttab inside", "nl\ninside token") ++
      (0 until 300).map(_ =>
        (0 until rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = fixtures.toDF("t")
    for (n <- Seq(1, 2, 3); distinct <- Seq(true, false)) {
      val kernel = if (distinct) graft.functions.word_shingles($"t", n)
                   else graft.functions.word_shingles_all($"t", n)
      val rows = df.select(coalesce(kernel, array().cast(ArrayType(StringType))).as("k"),
          relational($"t", n, distinct).as("r"), $"t").collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n distinct=$distinct text=${r.getString(2).replace("\n","\\n")}: " +
            s"kernel=${r.getSeq[String](0)} relational=${r.getSeq[String](1)}")
      }
    }
  }

  test("wordShinglesAll keeps multiplicity; wordShingles stays distinct") {
    val d = Seq((1L, "a b a b a"), (2L, "x")).toDF("id", "text")
    val all = d.select($"id",
        TextFunctions.wordShinglesAll($"text", 2).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(all(1L) == Seq("a b", "b a", "a b", "b a"))
    assert(all(2L) == Seq())
    val dist = d.select($"id",
        TextFunctions.wordShingles($"text", 2).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(dist(1L) == Seq("a b", "b a"))
  }

  /** Driver reference for dedupSpansAcross' exact semantics: duplicated
    * k-gram (count >= 2 over ALL occurrences), first (id, pos) occurrence
    * wins, every losing occurrence covers tokens [pos, pos+k-1], documents
    * reassemble from uncovered tokens, empty survivors drop. */
  private def spanDedupReference(docs: Seq[(Long, String)], k: Int): Map[Long, String] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val occ = docs.flatMap { case (id, t) =>
      val ts = toks(id)
      (0 to ts.length - k).map(i => (ts.slice(i, i + k).mkString(" "), id, i))
    }
    val losers = occ.groupBy(_._1).values.flatMap { os =>
      if (os.size < 2) Nil
      else os.sortBy(o => (o._2, o._3)).tail
    }
    val covered = losers.flatMap { case (_, id, p) =>
      (p until p + k).map(id -> _)
    }.toSet
    docs.flatMap { case (id, _) =>
      val surv = toks(id).zipWithIndex.collect {
        case (t, i) if !covered(id -> i) => t
      }
      if (surv.isEmpty) None else Some(id -> surv.mkString(" "))
    }.toMap
  }

  test("dedupSpansAcross: first occurrence wins, losing spans cut, exact duplicates vanish") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      // shares the 4-gram "quick brown fox jumps" -> those 4 tokens cut
      (2L, "a quick brown fox jumps again and again and again"),
      // exact copy of doc 1: every gram loses -> fully covered -> drops
      (3L, "the quick brown fox jumps over the lazy dog"),
      // shorter than k tokens: no grams, unconditionally survives
      (4L, "tiny doc"),
      // in-document repetition: "x y z w" occurs twice in one doc
      (5L, "x y z w q x y z w")).toDF("doc_id", "text")
    val got = TextDedup.dedupSpansAcross(docs, "doc_id", "text", k = 4)
      .as[(Long, String)].collect().toMap
    val want = spanDedupReference(Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "a quick brown fox jumps again and again and again",
      3L -> "the quick brown fox jumps over the lazy dog",
      4L -> "tiny doc",
      5L -> "x y z w q x y z w"), 4)
    assert(got == want)
    assert(got(1L) == "the quick brown fox jumps over the lazy dog",
      "first occurrence keeps its span")
    assert(got(2L) == "a again and again and again")
    assert(!got.contains(3L), "an exact duplicate document must vanish")
    assert(got(4L) == "tiny doc")
    assert(got(5L) == "x y z w q", "in-document repeat loses its second span")
  }

  test("dedupSpansAcross matches the driver reference on random corpora and is partition-invariant") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    val base = (0L until 40L).map { id =>
      id -> Seq.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val want = spanDedupReference(base, 3)
    for (parts <- Seq(1, 13)) {
      val got = TextDedup.dedupSpansAcross(
          base.toDF("doc_id", "text").repartition(parts), "doc_id", "text", k = 3)
        .as[(Long, String)].collect().toMap
      assert(got == want, s"diverged from reference at numPartitions=$parts")
    }
  }

  test("dedupSpansAcross keepFirst=false scrubs every occurrence, winner included") {
    val docs = Seq(
      (1L, "alpha beta gamma delta tail"),
      (2L, "head alpha beta gamma delta")).toDF("doc_id", "text")
    val got = TextDedup.dedupSpansAcross(docs, "doc_id", "text", k = 4,
        keepFirst = false)
      .as[(Long, String)].collect().toMap
    // the shared 4-gram "alpha beta gamma delta" is cut from BOTH docs
    assert(got == Map(1L -> "tail", 2L -> "head"))
  }

  test("BpeEncode kernel == sequential applyMerges fold on a trained list") {
    val docs = Seq(
      (1L, "the theme then anthem"),
      (2L, "the theme of the anthem"),
      (3L, "then the theme 123 456!! ok"),
      (4L, "aaaa aaa aa a")).toDF("doc_id", "text")
    val merges = BpeTrainer.train(docs, "text", numMerges = 12, minCount = 2)
    assert(merges.nonEmpty)
    // reference path: pretokenize -> char split -> one fold pass per merge
    // in rank order (the trainer's own apply semantics)
    val ref = docs.select($"doc_id",
        flatten(transform(TextFunctions.bpePretokens($"text"),
          w => BpeTrainer.applyMerges(split(w, ""), merges))).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    val got = docs.select($"doc_id",
        BpeTrainer.encode($"text", merges).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got == ref, s"kernel diverged from the fold reference\nmerges=$merges")
    // a merged multi-char token must actually appear (the list is useful)
    assert(got.values.flatten.exists(_.length > 1))
    // encode of empty pretoken stream is an empty array, null text is null
    val edge = Seq((1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .select($"doc_id", BpeTrainer.encode($"text", merges).as("toks"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[String](1)))
      .toMap
    assert(edge(1L) == Seq.empty[String])
    assert(edge(2L) == null)
  }

  test("BpeEncode handles space-bearing symbols and in-word repeats") {
    // hand-built well-formed list over space-prefixed pretokens: GPT-2
    // pretokens keep their leading space, so merge symbols contain spaces
    val merges = Seq(
      BpeTrainer.Merge(0, " ", "a", 9),   // ' a'
      BpeTrainer.Merge(1, " a", " a", 5), // impossible pair (never adjacent within one pretoken after split) — must be inert
      BpeTrainer.Merge(2, "a", "a", 4),   // 'aa'
      BpeTrainer.Merge(3, "b", "b", 3))
    val got = Seq((1L, "b aaab bb"))
      .toDF("doc_id", "text")
      .select(BpeTrainer.encode($"text", merges).as("toks"))
      .as[Seq[String]].collect().head
    // pretokens: ["b", " aaab", " bb"]; " aaab": ' a'+"aab" -> greedy rank0
    // gives [' a','a','a','b'] then rank2 merges aa -> [' a','aa','b'];
    // " bb": [' ','b','b'] -> rank3 [' ','bb'] (no ' b' merge in list)
    assert(got == Seq("b", " a", "aa", "b", " ", "bb"), got.toString)
  }

  test("Bloom decontamination is exact: equals the broadcast semi-join path, prefilter is a superset") {
    val rnd = new scala.util.Random(11)
    // 400 train docs, 20 bench docs; ~10% of train docs share a phrase
    // with a bench doc
    val benchPhrases = (0 until 20).map(i => s"bench phrase number $i shared")
    val docs = (0L until 400L).map { id =>
      val base = Seq.fill(8)(s"w${rnd.nextInt(500)}").mkString(" ")
      if (id % 10 == 0) base + " " + benchPhrases(rnd.nextInt(20)) else base
    }
    val trainSh = docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .select($"doc_id", explode(TextFunctions.wordShingles($"text", 3)).as("s0"))
      .select($"doc_id", xxhash64($"s0").as("s"))
    val benchSh = benchPhrases.toDF("text")
      .select(explode(TextFunctions.wordShingles($"text", 3)).as("s0"))
      .select(xxhash64($"s0").as("s")).distinct()
    val exact = trainSh.join(broadcast(benchSh), Seq("s"))
      .groupBy($"doc_id").agg(countDistinct($"s").as("n_hits"))
      .as[(Long, Long)].collect().toMap
    assert(exact.nonEmpty)
    val got = Decontaminate.flagBloom(trainSh, "doc_id", "s", benchSh, fpp = 0.03)
      .as[(Long, Long)].collect().toMap
    assert(got == exact, "Bloom path must be bit-identical to the semi-join path")
    // the prefilter alone passes every true hit (no false negatives) and
    // stays near the fpp budget on the rest
    val n = benchSh.count()
    val bf = benchSh.stat.bloomFilter("s", n, 0.03)
    val pre = trainSh.where(graft.functions.bloom_contains_long($"s", bf))
    val trueHits = trainSh.join(broadcast(benchSh), Seq("s"))
    assert(pre.count() >= trueHits.count())
    val nonHit = trainSh.count() - trueHits.count()
    val fpRows = pre.count() - trueHits.count()
    assert(fpRows.toDouble / nonHit.toDouble < 0.10,
      s"prefilter pass rate on non-hits: $fpRows/$nonHit")
  }

  test("CMS heavy hitters == plain groupBy-having, including under a tiny (collision-heavy) sketch") {
    val rnd = new scala.util.Random(3)
    // zipf-ish: key k appears ~ 2000/k times
    val rows = (1 to 60).flatMap(k => Seq.fill(2000 / k)(s"key$k")) ++
      (0 until 3000).map(i => s"tail${rnd.nextInt(2000)}")
    val df = rnd.shuffle(rows).toDF("word").repartition(9)
    val exact = df.groupBy($"word").count().where($"count" >= 100)
      .as[(String, Long)].collect().toMap
    assert(exact.nonEmpty && exact.size < 25)
    for (eps <- Seq(1e-4, 0.05)) { // 0.05 -> ~55 counters: collisions certain
      val got = FrequentItems.heavyHitters(df, "word", minCount = 100L, eps = eps)
        .as[(String, Long)].collect().toMap
      assert(got == exact, s"diverged from exact at eps=$eps")
    }
  }

  test("TfIdf: hand-computed tf/df/idf on a tiny corpus; topTerms breaks tf ties by rarity") {
    val docs = Seq(
      (1L, "cat dog cat"),
      (2L, "dog bird"),
      (3L, "cat fish fish fish")).toDF("doc_id", "text")
    val got = TfIdf.tfIdf(docs, "doc_id", "text")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got.size == 6)
    assert(got((1L, "cat"))._1 == 2 && got((1L, "cat"))._2 == 2)
    assert(got((3L, "fish"))._1 == 3 && got((3L, "fish"))._2 == 1)
    // idf = ln((N+1)/(df+1)) + 1 with N=3
    assert(math.abs(got((3L, "fish"))._3 - 3 * (math.log(4.0 / 2.0) + 1)) < 1e-12)
    assert(math.abs(got((1L, "cat"))._3 - 2 * (math.log(4.0 / 3.0) + 1)) < 1e-12)
    val top = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .as[(Long, Int, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(top((1L, 1)) == "cat" && top((1L, 2)) == "dog")
    assert(top((3L, 1)) == "fish" && top((3L, 2)) == "cat")
    // doc 2: tf tie between dog and bird -> rarer (df=1) bird ranks first
    assert(top((2L, 1)) == "bird" && top((2L, 2)) == "dog")
  }

  test("LangProfile: trains relational profiles and classifies held-out docs by alphabet") {
    val rnd = new scala.util.Random(19)
    def doc(alphabet: String): String =
      Seq.fill(12)(Seq.fill(4)(alphabet(rnd.nextInt(alphabet.size))).mkString).mkString(" ")
    val train = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, "aa", doc("abcde")) else (i, "zz", doc("vwxyz"))
    }.toDF("doc_id", "lang", "text")
    val prof = LangProfile.train(train, "lang", "text", n = 3, profileSize = 50)
    val langs = prof.select("lang").distinct().as[String].collect().toSet
    assert(langs == Set("aa", "zz"))
    assert(prof.count() <= 100)
    val test = Seq(
      (100L, doc("abcde")), (101L, doc("vwxyz")), (102L, doc("abcde")))
      .toDF("doc_id", "text")
    val got = LangProfile.classify(test, "doc_id", "text", prof, n = 3)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got == Map(100L -> "aa", 101L -> "zz", 102L -> "aa"))
    // a doc sharing no grams with any profile gets no prediction row
    val none = LangProfile.classify(
      Seq((200L, "0123 45678 9!!!")).toDF("doc_id", "text"), "doc_id", "text", prof)
    assert(none.count() == 0)
  }

  test("bm25 matches a driver-computed reference and ranks exact term matches sensibly") {
    val docs = Seq(
      (1L, "spark spatial join engine"),
      (2L, "spark streaming engine"),
      (3L, "cooking with cast iron"),
      (4L, "spark spark spark tuning")).toDF("doc_id", "text")
    val queries = Seq((10L, "spark"), (10L, "engine"), (20L, "iron"))
      .toDF("qid", "term")
    val got = TfIdf.bm25(docs, "doc_id", "text", queries, "qid", "term")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // driver reference with identical formula
    val corpus = Map(1L -> "spark spatial join engine",
      2L -> "spark streaming engine", 3L -> "cooking with cast iron",
      4L -> "spark spark spark tuning")
    val toks = corpus.map { case (k, v) => k -> v.split(" ").toSeq }
    val nDocs = corpus.size
    val avgdl = toks.values.map(_.size).sum.toDouble / nDocs
    val dfOf = toks.values.flatMap(_.distinct).groupBy(identity).map {
      case (t, o) => t -> o.size }
    def ref(doc: Long, terms: Seq[String]): Double = {
      val (k1, b) = (1.2, 0.75)
      terms.map { t =>
        val tf = toks(doc).count(_ == t).toDouble
        if (tf == 0) 0.0
        else {
          val idf = math.log((nDocs + 1.0) / (dfOf(t) + 1.0)) + 1.0
          idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * toks(doc).size / avgdl))
        }
      }.sum
    }
    assert(got.keySet == Set((10L, 1L), (10L, 2L), (10L, 4L), (20L, 3L)))
    got.foreach { case ((q, d), s) =>
      val terms = if (q == 10L) Seq("spark", "engine") else Seq("iron")
      assert(math.abs(s - ref(d, terms)) < 1e-9, s"q$q d$d: $s vs ${ref(d, terms)}")
    }
    // doc 2 (both terms, shorter) outranks doc 4 (one term, high tf)
    assert(got((10L, 2L)) > got((10L, 4L)))
  }

  test("dedupLinesIncremental: store suppresses, batch dedups itself, key append closes the loop") {
    val batch1 = Seq(
      (1L, "alpha\nbeta"),
      (2L, "beta\ngamma")).toDF("doc_id", "text")
    val emptyStore = Seq.empty[(Long, Long)].toDF("lkey", "lkey2")
    val out1 = TextDedup.dedupLinesIncremental(batch1, "doc_id", "text", emptyStore)
      .as[(Long, String)].collect().toMap
    // with an empty store this IS dedupLinesAcross on the batch
    val across = TextDedup.dedupLinesAcross(batch1, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out1 == across && out1 == Map(1L -> "alpha\nbeta", 2L -> "gamma"))
    // legacy single-column (64-bit) store still accepted
    val legacy = TextDedup.dedupLinesIncremental(batch1, "doc_id", "text",
      Seq.empty[Tuple1[Long]].toDF("lkey")).as[(Long, String)].collect().toMap
    assert(legacy == out1)
    // refresh: append batch-1 SURVIVOR keys, feed batch 2
    val store2 = emptyStore.unionByName(
      TextDedup.lineKeys(out1.toSeq.toDF("doc_id", "text"), "text"))
    val batch2 = Seq(
      (10L, "gamma\ndelta"),    // gamma stored -> only delta survives
      (11L, "alpha"),           // fully stored -> doc vanishes
      (12L, "epsilon\nepsilon") // in-batch repeat -> one line
    ).toDF("doc_id", "text")
    val out2 = TextDedup.dedupLinesIncremental(batch2, "doc_id", "text", store2)
      .as[(Long, String)].collect().toMap
    assert(out2 == Map(10L -> "delta", 12L -> "epsilon"))
  }

  test("compression_ratio: repetition compresses below natural text, noise above; codegen parity") {
    val rnd = new scala.util.Random(31)
    val noise = Seq.fill(800)(((rnd.nextInt(94)) + 33).toChar).mkString
    val docs = Seq(
      (1L, "the boilerplate line repeats\n" * 40),
      (2L, "A moderately varied natural sentence with assorted words, " +
        "clauses, and punctuation that resists naive repetition." * 3),
      (3L, noise),
      (4L, "")).toDF("doc_id", "text")
    def ratios(mode: String): Map[Long, Option[Double]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try docs.select($"doc_id",
          graft.functions.compression_ratio($"text").as("r"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val gen = ratios("CODEGEN_ONLY")
    assert(gen == ratios("NO_CODEGEN"), "generated != interpreted")
    assert(gen(4L).isEmpty, "empty text has no ratio")
    val (rep, nat, rnd3) = (gen(1L).get, gen(2L).get, gen(3L).get)
    assert(rep < 0.1, s"heavy repetition should crush: $rep")
    assert(rep < nat && nat < rnd3, s"ordering violated: $rep, $nat, $rnd3")
    assert(rnd3 > 0.8, s"incompressible noise stays near 1: $rnd3")
    // determinism across evaluations (same deflater level, same input)
    assert(ratios("CODEGEN_ONLY") == gen)
  }

  test("BPE merge top pair on a known corpus") {
    // "b c" occurs 4 times, "a b" 3, others fewer: the merge pick is "b c"
    val docs = Seq(
      (1L, "a b c b c"),
      (2L, "a b c d"),
      (3L, "a b c z z")).toDF("doc_id", "text")
    val top = docs
      .select(explode(TextFunctions.wordShinglesAll($"text", 2)).as("pair"))
      .groupBy($"pair").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"pair".asc).limit(2)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("b c", 4L), ("a b", 3L)))
  }
}
