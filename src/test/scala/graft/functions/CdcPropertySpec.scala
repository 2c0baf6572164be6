package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck invariants for the CDC chunker — the properties every
  * downstream dedup result rests on, checked over random blobs, random
  * parameters, and random edits. */
class CdcPropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(150), prop)
    assert(res.passed, s"$name: $res")
  }

  private val blobGen: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(0, 30000)
    seed <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
  } yield {
    val r = new scala.util.Random(seed)
    val b = new Array[Byte](n)
    r.nextBytes(b)
    b
  }

  private val paramGen: Gen[(Int, Int, Int)] = for {
    min <- Gen.chooseNum(1, 256)
    bits <- Gen.chooseNum(4, 12)
    max <- Gen.chooseNum(min, min + 4096)
  } yield (min, bits, max)

  test("boundaries partition the blob: ascending, within bounds, covering") {
    check("partition", Prop.forAll(blobGen, paramGen) { case (b, (min, bits, max)) =>
      val ends = CdcChunker.boundaries(b, min, bits, max)
      val starts = 0 +: ends.dropRight(1).toSeq
      val sizes = ends.zip(starts).map { case (e, s) => e - s }
      (b.isEmpty && ends.isEmpty) || (
        ends.last == b.length &&
        ends.toSeq == ends.toSeq.sorted &&
        ends.toSeq.distinct == ends.toSeq &&
        sizes.forall(_ <= max) &&
        sizes.dropRight(1).forall(_ >= min))
    })
  }

  test("hashes are a pure function of content: clone-identical, edit-sensitive") {
    check("deterministic", Prop.forAll(blobGen) { b =>
      CdcChunker.chunkHashes(b, 64, 8, 1024).toSeq ==
        CdcChunker.chunkHashes(b.clone(), 64, 8, 1024).toSeq
    })
    check("edit-sensitive", Prop.forAll(blobGen.suchThat(_.length > 0)) { b =>
      val i = (b.length / 2).max(0).min(b.length - 1)
      val m = b.clone(); m(i) = (m(i) ^ 0x5a).toByte
      CdcChunker.chunkHashes(b, 64, 8, 1024).toSeq !=
        CdcChunker.chunkHashes(m, 64, 8, 1024).toSeq
    })
  }

  test("strip_html invariants over random tag-soup") {
    val frag = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.const("<p class=\"x\">"), Gen.const("</p>"), Gen.const("<br/>"),
      Gen.const("<script>"), Gen.const("</script>"), Gen.const("<style>"),
      Gen.const("</style>"), Gen.const("&amp;"), Gen.const("&lt;"),
      Gen.const("&bogus;"), Gen.const("&"), Gen.const("<"), Gen.const(">"),
      Gen.const(" "), Gen.const("\t"), Gen.const("\n"), Gen.const("  "))
    val soup = Gen.listOf(frag).map(_.mkString)
    def strip(s: String): String =
      HtmlStrip.strip(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .toString
    check("ws-normalized", Prop.forAll(soup) { s =>
      val out = strip(s)
      // collapsed + trimmed: no control whitespace, no runs, no edges
      !out.exists(c => c == '\t' || c == '\n' || c == '\r') &&
        !out.contains("  ") && out == out.trim
    })
    check("deterministic", Prop.forAll(soup) { s => strip(s) == strip(s) })
    check("plain-text identity", Prop.forAll(Gen.alphaNumStr) { s =>
      strip(s) == s
    })
    // NOT idempotent by design: decode happens exactly once ("&lt;b&gt;"
    // -> "<b>" -> "" on a second pass) — pin the example so the contract
    // stays documented
    assert(strip("&lt;b&gt;") == "<b>" && strip(strip("&lt;b&gt;")) == "")
  }

  test("prefix insertion resynchronizes: shared suffix chunks survive") {
    val insGen = for {
      k <- Gen.chooseNum(1, 64)
      seed <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    } yield {
      val r = new scala.util.Random(seed)
      val b = new Array[Byte](k)
      r.nextBytes(b)
      b
    }
    check("resync", Prop.forAll(blobGen.suchThat(_.length >= 8192), insGen) {
      (b, ins) =>
        val a = CdcChunker.chunkHashes(b, 64, 8, 1024).toSet
        val c = CdcChunker.chunkHashes(ins ++ b, 64, 8, 1024).toSet
        // the insertion can only perturb chunks up to the first boundary
        // AFTER it re-syncs; everything later is byte-identical content cut
        // at identical boundaries. Require: at most 3 of a's chunks lost.
        (a intersect c).size >= a.size - 3
    })
  }
}
