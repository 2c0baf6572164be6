package graft.text

import scala.util.Random

import graft.SparkTestBase

/** [[WordPieceTrainer]] vs an independent in-memory reference: same
  * pretokenization (the published GPT-2-style pattern, applied here with
  * plain java.util.regex), likelihood scoring done with exact BigInt
  * rationals, left-to-right non-overlapping fold. Seeded random corpora
  * plus targeted cases: a score tie (lexicographic tie-break) and a corpus
  * where the max-COUNT pair is not the max-SCORE pair (the property that
  * separates WordPiece from BPE). */
class WordPieceTrainerSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent reference trainer over raw texts. */
  private def naive(texts: Seq[String], numMerges: Int,
                    minCount: Long = 2L): Seq[(Int, String, String, Long, Long, Long)] = {
    val pat = java.util.regex.Pattern.compile(TextFunctions.BpePretokenPattern)
    val words = texts.flatMap { t =>
      val m = pat.matcher(t)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) out += m.group(1)
      out
    }
    var table: Map[List[String], Long] = words
      .groupBy(identity).map { case (w, ws) =>
        val cs = w.map(_.toString)
        (cs.head :: cs.tail.map("##" + _).toList) -> ws.size.toLong
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val symCount = scala.collection.mutable.Map.empty[String, Long]
      val pairCount = scala.collection.mutable.Map.empty[(String, String), Long]
      table.foreach { case (syms, n) =>
        syms.foreach(s => symCount(s) = symCount.getOrElse(s, 0L) + n)
        syms.zip(syms.tail).foreach(p =>
          pairCount(p) = pairCount.getOrElse(p, 0L) + n)
      }
      val cand = pairCount.toSeq.filter(_._2 >= minCount)
      if (cand.isEmpty) done = true
      else {
        val best = cand.map { case ((a, b), cp) =>
          (a, b, cp, symCount(a), symCount(b))
        }.reduceLeft { (x, y) =>
          val c = (BigInt(x._3) * y._4 * y._5).compare(BigInt(y._3) * x._4 * x._5)
          if (c > 0) x else if (c < 0) y
          else {
            val t = if (x._1 != y._1) x._1.compareTo(y._1) else x._2.compareTo(y._2)
            if (t <= 0) x else y
          }
        }
        val (a, b, cp, ca, cb) = best
        out += ((rank, a, b, cp, ca, cb))
        val ab = a + b.stripPrefix("##")
        def fold(syms: List[String]): List[String] = syms match {
          case x :: y :: rest if x == a && y == b => ab :: fold(rest)
          case x :: rest => x :: fold(rest)
          case Nil => Nil
        }
        table = table.toSeq.map { case (s, n) => (fold(s), n) }
          .groupMapReduce(_._1)(_._2)(_ + _)
        rank += 1
      }
    }
    out.toSeq
  }

  private def trained(texts: Seq[String], numMerges: Int) =
    WordPieceTrainer.train(texts.toDF("text"), "text", numMerges)
      .map(m => (m.rank, m.left, m.right, m.pairCount, m.leftCount, m.rightCount))

  test("matches the independent reference on seeded random corpora") {
    val rnd = new Random(131)
    val vocab = Seq("spark", "scala", "shuffle", "scan", "sort", "split",
      "aaaa", "abab", "ba", "a")
    for (trial <- 0 until 4) {
      val texts = (0 until 60).map(_ =>
        (0 until 1 + rnd.nextInt(8)).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      val want = naive(texts, 10)
      val got = trained(texts, 10)
      assert(got == want, s"trial $trial")
    }
  }

  test("score tie breaks to the lexicographically smallest pair") {
    // "xy" and "xz" each appear 3 times; all of x, y, z have equal counts
    // only if balanced — craft counts so the two pair scores are equal:
    // words: "xy" *3, "xz" *3 -> cp=3 both; c(x)=6, c(##y)=3, c(##z)=3
    // -> equal scores; winner must be (x, ##y)
    val texts = Seq.fill(3)("xy").++(Seq.fill(3)("xz"))
    val got = trained(texts, 1)
    assert(got.head._2 == "x" && got.head._3 == "##y")
    assert(got == naive(texts, 1))
  }

  test("max-score pair differs from max-count pair (WordPiece vs BPE)") {
    // "th" occurs 8x but t and h are common (also apart); "qu" occurs 3x
    // with q and u occurring nowhere else -> qu's score 3/(3*3) beats
    // th's 8/(12*12)
    val texts = Seq.fill(8)("th") ++ Seq.fill(3)("qu") ++
      Seq.fill(4)("t h")
    val want = naive(texts, 1)
    val got = trained(texts, 1)
    assert(got == want)
    assert(got.head._2 == "q" && got.head._3 == "##u",
      s"expected likelihood winner (q, ##u), got ${got.head}")
  }

  test("overlapping runs fold left-to-right non-overlapping") {
    // 'aaaa' -> [a, ##a, ##a, ##a]; winning pair (##a, ##a) folds to
    // [a, ##aa, ##a] — the second ##a must not re-merge with the third
    val texts = Seq.fill(4)("aaaa")
    val want = naive(texts, 3)
    val got = trained(texts, 3)
    assert(got == want)
  }
}
