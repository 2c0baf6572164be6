package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.Hash64

class VideoDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def sample(seed: Int, n: Int): Array[Byte] =
    Array.tabulate(n)(j => ((seed * 17 + j * 3) % 251).toByte)

  test("sample hashes round-trip the actual encoded payloads") {
    val samples = Array(sample(1, 64), sample(2, 100), sample(3, 7))
    val mp4 = VideoCodec.encodeMp4WithSamples(1000, 3000, samples)
    val got = VideoCodec.parseSampleHashes(mp4)
    assert(got.isDefined)
    val expected = samples.map(s => Hash64.hashByteRange(s, 0, s.length)).toSeq
    assert(got.get.toSeq == expected)
    // mvhd stays parseable from the sample-bearing writer
    val info = VideoCodec.parseMvhd(mp4)
    assert(info.contains(VideoCodec.Mp4Info(1000, 3000)))
  }

  test("quarantine: null, truncated, and size-inconsistent containers") {
    assert(VideoCodec.parseSampleHashes(null).isEmpty)
    val mp4 = VideoCodec.encodeMp4WithSamples(1000, 3000,
      Array(sample(1, 64), sample(2, 64)))
    // truncating mdat makes stsz claim more bytes than mdat holds
    assert(VideoCodec.parseSampleHashes(
      java.util.Arrays.copyOfRange(mp4, 0, mp4.length - 80)).isEmpty)
    assert(VideoCodec.parseSampleHashes(Array[Byte](1, 2, 3)).isEmpty)
    // meta-only file (no trak/stsz): quarantined, not a throw
    assert(VideoCodec.parseSampleHashes(
      VideoCodec.encodeMp4Meta(1000, 3000)).isEmpty)
  }

  test("nearDupPairs: re-muxed copies and one-sample swaps found, unrelated not") {
    val shared = Array.tabulate(8)(s => sample(100 + s, 80))
    val a = VideoCodec.encodeMp4WithSamples(1000, 800, shared)
    // identical payloads, different timing metadata (a re-mux)
    val b = VideoCodec.encodeMp4WithSamples(600, 4800, shared)
    // one sample swapped
    val c = VideoCodec.encodeMp4WithSamples(1000, 800,
      shared.updated(3, sample(999, 80)))
    // unrelated
    val d = VideoCodec.encodeMp4WithSamples(1000, 800,
      Array.tabulate(8)(s => sample(500 + s, 80)))
    // undecodable
    val e = Array[Byte](0, 1, 2)
    val df = Seq((1L, a), (2L, b), (3L, c), (4L, d), (5L, e))
      .toDF("id", "content")
    val pairs = VideoDedup.nearDupPairs(df, "id", "content", 0.6)
      .select("ida", "idb", "jaccard")
      .as[(Long, Long, Double)].collect()
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(byPair((1L, 2L)) == 1.0) // re-mux: identical sample sets
    assert(math.abs(byPair((1L, 3L)) - 7.0 / 9.0) < 1e-12)
  }
}
