package graft.text

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType,
  StructField, StructType}

/** Unigram-LM subword tokenizer (the SentencePiece unigram class — Kudo,
  * "Subword Regularization", ACL'18): the OTHER standard tokenizer family
  * next to [[BpeTrainer]]'s merge loop. A piece vocabulary with unigram
  * probabilities is fit by EM over the corpus' word table, pruned to the
  * target size, and text encodes by Viterbi (most-probable segmentation).
  *
  * Scale shape — the same collapse BpeTrainer exploits: the corpus is
  * scanned ONCE into the distinct-pretoken frequency table (vocabulary-
  * sized, not corpus-sized), and every EM pass is one mapPartitions scan
  * of THAT table under a broadcast model plus a partial-aggregated
  * groupBy over (piece, count) — a few-hundred-thousand-row relation at
  * any corpus size. Encoding tokenizes each DISTINCT word once (Viterbi
  * under the broadcast model), then one hash join + per-doc reassembly
  * puts token streams back in document order; the corpus text crosses
  * the pretoken explode once.
  *
  * Per-word forward-backward/Viterbi is inherently sequential in the
  * word's characters, so it runs as a JVM kernel over the word table
  * (the [[graft.ann.Similarity.topKBrute]] precedent: an imperative
  * per-partition kernel where per-row DP cannot be expressed
  * relationally) — never over the corpus.
  *
  * Determinism, pinned: expected counts are emitted as 1e6-scaled LONGS
  * (order-independent integer sums — bit-identical across partitionings,
  * the PageRank micro-rank discipline; at 1e6 scaling the corpus-wide
  * sum stays inside Long past 10^12 tokens); model probabilities derive
  * from that integer relation only, so every EM round and the final
  * vocabulary are bit-deterministic. Viterbi breaks exact score ties
  * toward the SHORTEST candidate piece (first strict improvement wins).
  *
  * Simplification vs full SentencePiece, documented: pruning keeps the
  * top-count pieces (single characters always survive as the coverage
  * floor) instead of the likelihood-loss ranking, and there is no
  * subword-regularization sampling — train/encode are deterministic. */
object UnigramTrainer {

  private val Micro = 1e6

  /** Piece log-probabilities + the longest piece, broadcastable. Unknown
    * single characters score [[UnkLogp]] so every word stays segmentable. */
  final case class Model(logp: Map[String, Double], maxLen: Int)

  /** Constant penalty for characters never seen in training. */
  val UnkLogp: Double = -30.0

  /** Distinct-pretoken frequency table `(word, n)` — the relation every
    * EM pass runs over (same pretokenization as [[BpeTrainer]], so the
    * two tokenizers train on identical word streams). */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.bpePretokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Seed vocabulary `(piece, cnt_micro)`: every substring (length ≤
    * `maxPieceLen`) of the word table weighted by word count, kept to the
    * `seedSize` largest by (count desc, piece asc) — plus every single
    * character regardless of rank, the segmentation-coverage floor. */
  def seedVocab(words: DataFrame, seedSize: Int, maxPieceLen: Int): DataFrame = {
    require(seedSize > 0 && maxPieceLen > 0, "seedVocab: positive sizes")
    val w = col("word")
    val subs = flatten(transform(sequence(lit(0), length(w) - 1), s =>
      transform(sequence(lit(1), least(lit(maxPieceLen), length(w) - s)),
        l => w.substr(s + 1, l))))
    val counted = words.select(explode(subs).as("piece"), col("n"))
      .groupBy("piece").agg((sum(col("n")) * lit(Micro.toLong)).as("cnt_micro"))
    val top = counted.orderBy(col("cnt_micro").desc, col("piece").asc)
      .limit(seedSize)
    // chars may rank below the seed cut — union them back, dedup by piece
    val chars = counted.where(length(col("piece")) === 1)
    top.unionByName(chars).groupBy("piece")
      .agg(max(col("cnt_micro")).as("cnt_micro"))
  }

  /** Broadcastable model from a `(piece, cnt_micro)` relation (bounded —
    * seed/vocab sized; the collect is the LangProfile convention). */
  def modelFromCounts(counts: DataFrame): Model = {
    val rows = counts.select(col("piece"), col("cnt_micro").cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(rows.nonEmpty, "UnigramTrainer: empty vocabulary")
    val total = rows.map(_._2.max(1L)).sum.toDouble
    Model(rows.map { case (p, c) =>
      p -> (math.log(c.max(1L).toDouble) - math.log(total)) }.toMap,
      rows.map(_._1.length).max)
  }

  private val countSchema = StructType(Seq(
    StructField("piece", StringType), StructField("cnt_micro", LongType)))

  /** One EM expectation pass: per-word forward-backward posteriors under
    * the broadcast model, emitted as integer micro-counts and summed —
    * `(piece, cnt_micro)`, order-independent. */
  def emCounts(words: DataFrame, model: Model): DataFrame = {
    val spark = words.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    implicit val enc = Encoders.row(countSchema)
    words.select(col("word"), col("n").cast("long")).mapPartitions { rows =>
      val m = bc.value
      val acc = new scala.collection.mutable.HashMap[String, Long]()
      rows.foreach { r =>
        val word = r.getString(0); val n = r.getLong(1)
        if (word != null && word.nonEmpty && n > 0)
          expectedCounts(word, m).foreach { case (p, e) =>
            val add = math.round(e * n * Micro)
            if (add > 0) acc.update(p, acc.getOrElse(p, 0L) + add)
          }
      }
      acc.iterator.map { case (p, c) => Row(p, c) }
    }.groupBy("piece").agg(sum(col("cnt_micro")).as("cnt_micro"))
  }

  /** Forward-backward expected piece counts for one word (probability-
    * space posteriors, sequential in the word — the kernel's core). */
  private[text] def expectedCounts(word: String,
                                   m: Model): Iterator[(String, Double)] = {
    val L = word.length
    def lp(s: Int, e: Int): Double = {
      val piece = word.substring(s, e)
      m.logp.getOrElse(piece, if (e - s == 1) UnkLogp
      else Double.NegativeInfinity)
    }
    def lse(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else { val hi = math.max(a, b); hi + math.log1p(math.exp(math.min(a, b) - hi)) }
    val alpha = Array.fill(L + 1)(Double.NegativeInfinity); alpha(0) = 0.0
    for (e <- 1 to L; s <- math.max(0, e - m.maxLen) until e)
      alpha(e) = lse(alpha(e), alpha(s) + lp(s, e))
    val beta = Array.fill(L + 1)(Double.NegativeInfinity); beta(L) = 0.0
    for (s <- L - 1 to 0 by -1; e <- s + 1 to math.min(L, s + m.maxLen))
      beta(s) = lse(beta(s), lp(s, e) + beta(e))
    val z = alpha(L)
    if (z == Double.NegativeInfinity) Iterator.empty
    else {
      val acc = new scala.collection.mutable.HashMap[String, Double]()
      for (s <- 0 until L; e <- s + 1 to math.min(L, s + m.maxLen)) {
        val l = lp(s, e)
        if (l != Double.NegativeInfinity) {
          val post = math.exp(alpha(s) + l + beta(e) - z)
          if (post > 0) {
            val p = word.substring(s, e)
            acc.update(p, acc.getOrElse(p, 0.0) + post)
          }
        }
      }
      acc.iterator
    }
  }

  /** Shrink a count relation to `vocabSize`: single characters always
    * survive; remaining slots go to the largest multi-character pieces by
    * (count desc, piece asc). */
  def prune(counts: DataFrame, vocabSize: Int): DataFrame = {
    val chars = counts.where(length(col("piece")) === 1)
    val nChars = chars.count().toInt
    require(vocabSize > nChars,
      s"UnigramTrainer: vocabSize=$vocabSize must exceed the $nChars " +
        "single characters (the coverage floor)")
    chars.unionByName(
      counts.where(length(col("piece")) > 1)
        .orderBy(col("cnt_micro").desc, col("piece").asc)
        .limit(vocabSize - nChars))
  }

  /** Train to a `vocabSize`-piece vocabulary: seed (4× the target by
    * default) → `emIters` EM passes → prune → one consolidating EM pass.
    * Returns the final `(piece, cnt_micro)` relation — integer,
    * bit-deterministic, checkpointable. */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
            maxPieceLen: Int = 8, seedSize: Int = 0,
            emIters: Int = 2): DataFrame = {
    val spark = df.sparkSession
    val words = wordTable(df, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    words.count() // materialize once; every EM pass re-reads this table
    try {
      val seed = if (seedSize > 0) seedSize else vocabSize * 4
      // bounded-model driver fast path — see [[TrainerLocal]]: the word
      // table is the only corpus-derived relation every stage below scans;
      // when it fits the driver, seed + EM + prune run as local loops with
      // zero scheduled jobs (the distributed path pays ~3 jobs per EM pass
      // plus the seed/prune sort-limit jobs). limit(T+1) bounds the
      // decision collect; oversized tables fall through unchanged.
      val thr = TrainerLocal.threshold(df)
      val head = words.select(col("word"), col("n").cast("long"))
        .limit(thr + 1).collect()
      if (head.length <= thr) {
        val w = head.map(r => (r.getString(0), r.getLong(1)))
          .filter { case (word, n) => word != null && word.nonEmpty && n > 0 }
        return trainLocal(spark, w, vocabSize, maxPieceLen, seed, emIters)
      }
      var counts = seedVocab(words, seed, maxPieceLen)
      for (_ <- 1 to emIters)
        counts = emCounts(words, modelFromCounts(counts))
      counts = prune(counts, vocabSize)
      emCounts(words, modelFromCounts(counts))
    } finally words.unpersist(false)
  }

  /** The driver twin of seed → EM → prune → consolidating EM. Stage-exact
    * replication of the distributed semantics:
    *  - seed substrings use CODEPOINT offsets/lengths (Spark's
    *    `substr`/`length` operate on characters, not UTF-16 units);
    *  - EM reuses [[expectedCounts]] — the very kernel the distributed
    *    mapPartitions runs — with the same per-word `round(e·n·1e6)`
    *    integer emission, so Long sums match bit-for-bit in any order;
    *  - ranked cuts (seed top-N, prune) order by (count desc, piece asc)
    *    in Spark's binary UTF-8 string order ([[TrainerLocal.utf8Lt]]);
    *  - the char coverage floor keys on codepoint-length-1 pieces, like
    *    the distributed `length(piece) === 1`.
    * TrainerParitySpec pins local == distributed. */
  private def trainLocal(spark: SparkSession, words: Array[(String, Long)],
                         vocabSize: Int, maxPieceLen: Int, seedSize: Int,
                         emIters: Int): DataFrame = {
    require(seedSize > 0 && maxPieceLen > 0, "seedVocab: positive sizes")
    def isOneChar(p: String): Boolean =
      p.codePointCount(0, p.length) == 1
    def byCountDescPieceAsc(a: (String, Long), b: (String, Long)): Boolean =
      a._2 > b._2 || (a._2 == b._2 && TrainerLocal.utf8Lt(a._1, b._1))

    // seed: every codepoint substring (length <= maxPieceLen) weighted by
    // word count; top seedSize by (count desc, piece asc) + all single
    // characters (the coverage floor)
    val seedAcc = new java.util.HashMap[String, Long]()
    words.foreach { case (word, n) =>
      // codepoint offsets, mirroring substr(s+1, l) on character positions
      val cps = word.codePoints().toArray
      val L = cps.length
      var s = 0
      while (s < L) {
        var l = 1
        val maxL = math.min(maxPieceLen, L - s)
        while (l <= maxL) {
          seedAcc.merge(new String(cps, s, l), n, _ + _)
          l += 1
        }
        s += 1
      }
    }
    val seedCounts = {
      val all = new scala.collection.mutable.ArrayBuffer[(String, Long)](seedAcc.size)
      seedAcc.forEach { (p, c) => all += ((p, c * Micro.toLong)) }
      val sorted = all.sortWith(byCountDescPieceAsc)
      val top = sorted.take(seedSize)
      val chars = sorted.filter(pc => isOneChar(pc._1))
      (top ++ chars).distinct
    }

    def localModel(counts: Seq[(String, Long)]): Model = {
      require(counts.nonEmpty, "UnigramTrainer: empty vocabulary")
      val total = counts.map(_._2.max(1L)).sum.toDouble
      Model(counts.map { case (p, c) =>
        p -> (math.log(c.max(1L).toDouble) - math.log(total)) }.toMap,
        counts.map(_._1.length).max)
    }

    def emLocal(model: Model): Seq[(String, Long)] = {
      val acc = new java.util.HashMap[String, Long]()
      words.foreach { case (word, n) =>
        expectedCounts(word, model).foreach { case (p, e) =>
          val add = math.round(e * n * Micro)
          if (add > 0) acc.merge(p, add, _ + _)
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[(String, Long)](acc.size)
      acc.forEach { (p, c) => out += ((p, c)) }
      out.toSeq
    }

    var counts: Seq[(String, Long)] = seedCounts.toSeq
    for (_ <- 1 to emIters) counts = emLocal(localModel(counts))
    // prune: single characters always survive; remaining slots to the
    // largest multi-character pieces by (count desc, piece asc)
    val (chars, multi) = counts.partition(pc => isOneChar(pc._1))
    val nChars = chars.length
    require(vocabSize > nChars,
      s"UnigramTrainer: vocabSize=$vocabSize must exceed the $nChars " +
        "single characters (the coverage floor)")
    counts = chars ++ multi.sortWith(byCountDescPieceAsc)
      .take(vocabSize - nChars)
    val fin = emLocal(localModel(counts))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        fin.sortWith(byCountDescPieceAsc).map { case (p, c) => Row(p, c) },
        numSlices = 1),
      countSchema)
  }

  private val tokSchema = StructType(Seq(
    StructField("word", StringType),
    StructField("toks", ArrayType(StringType, containsNull = false))))

  /** Viterbi segmentation of each distinct word — `(word, toks)`. Exact
    * score ties resolve to the shortest candidate piece (first strict
    * improvement wins), so the segmentation is deterministic. */
  def wordTokens(words: DataFrame, model: Model): DataFrame = {
    val spark = words.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    implicit val enc = Encoders.row(tokSchema)
    words.select(col("word")).distinct().mapPartitions { rows =>
      val m = bc.value
      rows.flatMap { r =>
        val word = r.getString(0)
        if (word == null || word.isEmpty) None
        else Some(Row(word, viterbi(word, m)))
      }
    }.toDF("word", "toks")
  }

  private[text] def viterbi(word: String, m: Model): Seq[String] = {
    val L = word.length
    val best = Array.fill(L + 1)(Double.NegativeInfinity); best(0) = 0.0
    val back = Array.fill(L + 1)(-1)
    for (e <- 1 to L; s <- math.max(0, e - m.maxLen) until e) {
      val piece = word.substring(s, e)
      val lp = m.logp.getOrElse(piece,
        if (e - s == 1) UnkLogp else Double.NegativeInfinity)
      val cand = best(s) + lp
      if (cand > best(e)) { best(e) = cand; back(e) = s }
    }
    val out = scala.collection.mutable.ListBuffer[String]()
    var e = L
    while (e > 0) { val s = back(e); out.prepend(word.substring(s, e)); e = s }
    out.toSeq
  }

  /** Full corpus encode: pretokenize, Viterbi each DISTINCT word once,
    * hash-join the word→tokens table back, reassemble per document in
    * pretoken order — `(idCol, tokens)`. Documents with no pretokens
    * produce no row (the pretoken explode's natural semantics). */
  def encode(df: DataFrame, idCol: String, textCol: String,
             model: Model): DataFrame = {
    val pre = df.select(col(idCol),
      posexplode(TextFunctions.bpePretokens(col(textCol)))
        .as(Seq("widx", "word")))
    assemble(pre, wordTokens(pre.select("word"), model), idCol)
  }

  /** The join + per-doc reassembly half of [[encode]] over a PRECOMPUTED
    * `(word, toks)` relation — lets a caller that already materialized the
    * word→tokens table (e.g. for an oracle checkpoint) reuse it instead of
    * paying a second pretoken scan + Viterbi pass. */
  def assemble(pre: DataFrame, wordToks: DataFrame, idCol: String): DataFrame =
    pre.join(wordToks, Seq("word"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("widx"), col("toks")))),
        s => s.getField("toks"))).as("tokens"))
}
