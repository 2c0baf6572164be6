package graft.text

import graft.SparkTestBase

class TextChunkSpec extends SparkTestBase {
  import spark.implicits._

  test("chunks tile the document with the requested overlap") {
    val text = (1 to 25).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val got = TextChunk.chunkByTokens(df, "doc_id", "text", size = 10, overlap = 3)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_tokens", "chunk_text")
      .as[(Long, Int, String)].collect()
    // stride 7: starts 1, 8, 15, 22 -> ceil((25-3)/7) = 4 chunks
    assert(got.length == 4)
    assert(got(0)._3.startsWith("w1 ") && got(0)._2 == 10)
    assert(got(1)._3.startsWith("w8 ") && got(1)._2 == 10)
    // overlap: chunk 1 repeats the last 3 tokens of chunk 0
    assert(got(0)._3.split(" ").takeRight(3).toSeq ==
      got(1)._3.split(" ").take(3).toSeq)
    // final short window: tokens 22-25
    assert(got(3)._2 == 4 && got(3)._3 == "w22 w23 w24 w25")
    // reassembly: dropping each chunk's overlap prefix rebuilds the doc
    val rebuilt = got(0)._3 +: got.tail.map(_._3.split(" ").drop(3).mkString(" "))
    assert(rebuilt.mkString(" ") == text)
  }

  test("sentence windows: boundary rule, overlap, and no mid-sentence cuts") {
    val text = "One two. Three four! Five six? Seven eight. Nine ten."
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val got = TextChunk.chunkBySentences(df, "doc_id", "text",
        size = 2, overlap = 1)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_sentences", "chunk_text")
      .as[(Long, Int, String)].collect()
    // 5 sentences, stride 1 -> max(1, ceil((5-1)/1)) = 4 windows
    assert(got.length == 4)
    assert(got(0)._3 == "One two. Three four!")
    assert(got(1)._3 == "Three four! Five six?")
    assert(got(2)._3 == "Five six? Seven eight.")
    assert(got(3)._3 == "Seven eight. Nine ten.")
    assert(got.forall(_._2 == 2))
    // punctuation NOT followed by whitespace is not a boundary (e.g. "3.5")
    val dec = Seq((1L, "Pi is 3.14 roughly. Yes.")).toDF("doc_id", "text")
    val d = TextChunk.chunkBySentences(dec, "doc_id", "text", 1, 0)
      .orderBy("chunk_idx").select("chunk_text").as[String].collect()
    assert(d.toSeq == Seq("Pi is 3.14 roughly.", "Yes."))
  }

  test("short and empty docs yield exactly one chunk; guards reject bad params") {
    val df = Seq((1L, "a b c"), (2L, "")).toDF("doc_id", "text")
    val got = TextChunk.chunkByTokens(df, "doc_id", "text", 40, 8)
      .select("doc_id", "chunk_idx", "n_tokens")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 0L, 3), (2L, 0L, 1))) // "" splits to one empty token
    intercept[IllegalArgumentException] {
      TextChunk.chunkByTokens(df, "doc_id", "text", 10, 10)
    }
    intercept[IllegalArgumentException] {
      TextChunk.chunkByTokens(df, "doc_id", "text", 0, 0)
    }
  }
}
