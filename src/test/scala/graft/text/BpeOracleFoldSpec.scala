package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the q_bpe_train / q_bpe_encode oracle's string-replace merge fold to
  * [[BpeTrainer.mergeSyms]] (the engine's fold): symbols ride as
  * chr(1)||sym||chr(1) wrapped strings, and DuckDB `replace(w,
  * \x01a\x01\x01b\x01, \x01ab\x01)` — same left-to-right non-overlapping
  * scan as java.lang.String.replace, which this spec uses as the stand-in —
  * must produce exactly mergeSyms' symbol list.
  *
  * The adversarial cases are the ADVICE-round-11 finding: under the OLD flat
  * single-separator encoding, a pattern `a\x01b` could match INSIDE a
  * multi-char symbol ending in `a` (symbols [th, e] + pair (h,e) fused to
  * [the]) or starting with `b` — the full-wrapper encoding makes that match
  * impossible because a match must consume both symbols' own boundaries. */
class BpeOracleFoldSpec extends SparkTestBase {

  private val SEP = "\u0001"

  /** The oracle's fold: wrapped encoding + one String.replace per merge. */
  private def oracleFold(syms: Seq[String], merges: Seq[(String, String)]): Seq[String] = {
    val enc0 = syms.map(s => SEP + s + SEP).mkString
    val enc = merges.foldLeft(enc0) { case (w, (a, b)) =>
      w.replace(SEP + a + SEP + SEP + b + SEP, SEP + a + b + SEP)
    }
    if (enc.isEmpty) Seq.empty
    else enc.substring(1, enc.length - 1).split(SEP + SEP, -1).toSeq
  }

  /** The engine's fold, evaluated through the real Column pipeline. */
  private def engineFold(syms: Seq[String], merges: Seq[(String, String)]): Seq[String] = {
    import spark.implicits._
    val df = Seq(Tuple1(syms)).toDF("s")
    val folded = merges.foldLeft(col("s")) { case (c, (a, b)) =>
      BpeTrainer.mergeSyms(c, a, b)
    }
    df.select(folded).collect()(0).getSeq[String](0)
  }

  private def check(syms: Seq[String], merges: Seq[(String, String)]): Unit = {
    val e = engineFold(syms, merges)
    val o = oracleFold(syms, merges)
    assert(o == e, s"syms=$syms merges=$merges: oracle=$o engine=$e")
  }

  test("suffix collision: symbol ending in `a` must not fuse (ADVICE case)") {
    // merge (t,h) then (h,e): after round 1 'the' = [th, e] — round 2's
    // (h,e) must NOT merge (whole-symbol compare: last symbol is 'th', not
    // 'h'), while 'she' = [s,h,e] -> [s, he] must
    check("the".split(""), Seq(("t", "h"), ("h", "e")))
    check("she".split(""), Seq(("t", "h"), ("h", "e")))
    assert(oracleFold(Seq("t", "h", "e"), Seq(("t", "h"), ("h", "e"))) ==
      Seq("th", "e")) // NOT Seq("the")
    assert(oracleFold(Seq("s", "h", "e"), Seq(("t", "h"), ("h", "e"))) ==
      Seq("s", "he"))
  }

  test("prefix collision: symbol starting with `b` must not fuse") {
    // merge (e,t) gives [h, et]; then (h,e) must NOT merge into 'he'+'t'
    check("het".split(""), Seq(("e", "t"), ("h", "e")))
    assert(oracleFold(Seq("h", "e", "t"), Seq(("e", "t"), ("h", "e"))) ==
      Seq("h", "et"))
  }

  test("a=b runs fold left-to-right non-overlapping") {
    for (n <- 1 to 7)
      check(Seq.fill(n)("a"), Seq(("a", "a")))
    // and a second round over the merged symbols
    check(Seq.fill(6)("a"), Seq(("a", "a"), ("aa", "aa")))
    check(Seq.fill(5)("a"), Seq(("a", "a"), ("aa", "a")))
  }

  test("adjacent disjoint occurrences all merge") {
    check(Seq("x", "a", "b", "a", "b", "a", "b"), Seq(("a", "b")))
    check(Seq("a", "b", "a", "b"), Seq(("a", "b"), ("ab", "ab")))
  }

  test("property: oracle fold == engine fold on random symbol streams") {
    import spark.implicits._
    // seeded exhaustive-ish sweep: collision-rich alphabet (every symbol a
    // prefix/suffix of another), 3-deep merge chains, 200 random streams
    // per chain — all streams of one chain fold in ONE Spark job
    val alphabet = Vector("a", "b", "ab", "ba", "aa", "bb", "aab")
    val chains = Seq(
      Seq(("a", "b"), ("ab", "a"), ("a", "ab")),
      Seq(("a", "a"), ("aa", "a"), ("aa", "aa")),
      Seq(("b", "a"), ("a", "ba"), ("ba", "b")),
      Seq(("a", "ab"), ("aab", "b"), ("b", "b")),
      Seq(("ab", "ba"), ("a", "bb"), ("abba", "abba")))
    val rnd = new scala.util.Random(41)
    chains.foreach { ms =>
      val streams = (1 to 200).map { _ =>
        Seq.fill(1 + rnd.nextInt(8))(alphabet(rnd.nextInt(alphabet.size)))
      }
      val df = streams.map(Tuple1(_)).toDF("s")
      val folded = ms.foldLeft(col("s")) { case (c, (a, b)) =>
        BpeTrainer.mergeSyms(c, a, b)
      }
      val engine = df.select(folded).collect().map(_.getSeq[String](0))
      streams.zip(engine).foreach { case (s, e) =>
        assert(oracleFold(s, ms) == e.toSeq, s"syms=$s merges=$ms")
      }
    }
  }
}
