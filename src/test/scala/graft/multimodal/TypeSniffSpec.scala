package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TypeSniffSpec extends SparkTestBase {
  import spark.implicits._

  private def sniff(bytes: Array[Byte]): String =
    Seq(Tuple1(bytes)).toDF("b")
      .select(TypeSniff.sniffMediaType(col("b"))).as[String].head()

  test("the engine's own encoders classify into their lanes") {
    assert(sniff(ImageCodec.encodePng(4, 4, 0x336699)) == "png")
    assert(sniff(AudioCodec.encodeWavPcm16(8000, Array[Short](1, 2, 3))) == "wav")
    assert(sniff(VideoCodec.encodeMp4Meta(1000, 5000)) == "mp4")
  }

  test("magic-byte literals for the remaining classes") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    assert(sniff(b(0xFF, 0xD8, 0xFF, 0xE0, 0, 0, 0, 0, 0, 0, 0, 0)) == "jpeg")
    assert(sniff("GIF89a-data-here".getBytes("ASCII")) == "gif")
    assert(sniff(b(0x1F, 0x8B, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0)) == "gzip")
    assert(sniff(("PKrest-of-zip").getBytes("ISO-8859-1")) == "zip")
    assert(sniff("%PDF-1.7 stream".getBytes("ASCII")) == "pdf")
    assert(sniff("WARC/1.0\r\nWARC-Type: response".getBytes("ASCII")) == "warc")
    assert(sniff("<html><body>x</body></html>".getBytes("ASCII")) == "markup")
    assert(sniff("<?xml version=\"1.0\"?><svg/>".getBytes("ASCII")) == "markup")
    assert(sniff("plain text no markers".getBytes("ASCII")) == "unknown")
    assert(sniff(Array.emptyByteArray) == "unknown")
    assert(sniff(null) == "unknown")
    // RIFF container that is NOT wav (e.g. AVI) must not hit the wav lane
    assert(sniff("RIFFxxxxAVI LIST".getBytes("ASCII")) == "unknown")
    // truncated prefixes shorter than their pattern stay unknown
    assert(sniff(b(0x89, 0x50)) == "unknown")
  }

  test("the SQL replay cannot drift: same rule list, same order") {
    // both rule lists mention the same hex markers in the same order
    val hexes = Seq("89504E47", "FFD8FF", "47494638", "52494646", "57415645",
      "66747970", "1F8B", "504B0304", "25504446", "574152432F", "3C")
    val sqlText = TypeSniff.sql("b")
    var at = -1
    for (m <- hexes) {
      val i = sqlText.indexOf(s"'$m'")
      assert(i > at, s"marker $m missing or out of order in the SQL replay")
      at = i
    }
  }
}
