package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck pin for the WordPieceEncode kernel against an independent
  * straight-line reference of BERT's greedy longest-match-first semantics
  * (whole-word UNK on any unmatched position, `##` continuation lane).
  * The kernel bounds its inner scan by the longest vocab entry per lane
  * (maxBare/maxCont); the reference scans from the full remainder down —
  * agreement over random vocabularies proves the cap is semantics-free. */
class WordPiecePropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  /** Independent reference: no shared code with the kernel. */
  private def ref(text: String, vocab: Set[String], unk: String): Seq[String] =
    text.split(' ').toSeq.filter(_.nonEmpty).flatMap { w =>
      val toks = scala.collection.mutable.Buffer[String]()
      var start = 0
      var fail = false
      while (start < w.length && !fail) {
        var end = w.length
        var found: String = null
        while (end > start && found == null) {
          val sub = w.substring(start, end)
          val cand = if (start > 0) "##" + sub else sub
          if (vocab.contains(cand)) found = cand else end -= 1
        }
        if (found == null) fail = true
        else { toks += found; start = end }
      }
      if (fail) Seq(unk) else toks.toSeq
    }

  private def kernel(text: String, vocab: Seq[String], unk: String): Seq[String] = {
    val ad = WordPieceEncode(Literal(text), vocab, unk)
      .encode(UTF8String.fromString(text))
    (0 until ad.numElements()).map(i => ad.getUTF8String(i).toString)
  }

  private val pieceGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 4)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val vocabGen: Gen[Seq[String]] = for {
    n <- Gen.chooseNum(1, 40)
    pieces <- Gen.listOfN(n, pieceGen)
    lanes <- Gen.listOfN(n, Gen.oneOf(true, false))
  } yield pieces.zip(lanes)
    .map { case (p, cont) => if (cont) "##" + p else p }.distinct

  // 'd' appears in words but never in vocab — guaranteed UNK positions
  private val wordGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 10)
    cs <- Gen.listOfN(n, Gen.frequency(5 -> Gen.oneOf('a', 'b', 'c'), 1 -> Gen.const('d')))
  } yield cs.mkString

  private val textGen: Gen[String] = for {
    k <- Gen.chooseNum(0, 8)
    ws <- Gen.listOfN(k, wordGen)
  } yield ws.mkString(" ") // empty words yield double spaces — skipped lane

  test("kernel == independent greedy reference over random vocab/text") {
    check("wordpiece", Prop.forAll(vocabGen, textGen) { (vocab, text) =>
      kernel(text, vocab, "[UNK]") == ref(text, vocab.toSet, "[UNK]")
    })
  }

  test("tokens reassemble the word exactly when no UNK was emitted") {
    check("reassembly", Prop.forAll(vocabGen, wordGen) { (vocab, w) =>
      val toks = kernel(w, vocab, "[UNK]")
      w.isEmpty || toks == Seq("[UNK]") ||
        toks.map(_.stripPrefix("##")).mkString == w
    })
  }
}
