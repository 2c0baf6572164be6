package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SequencePackSpec extends SparkTestBase {
  import spark.implicits._

  test("packChunks == single-window reference, invariant to partition count") {
    val rnd = new scala.util.Random(13)
    // shuffled ids, varied token counts including zeros and chunk-sized docs
    val rows = rnd.shuffle((0L until 1000L).toList).map { id =>
      (id, (id % 7) * 31 + (if (id % 13 == 0) 0 else id % 97))
    }
    val df = rows.toDF("doc_id", "n_tokens")

    // reference: the global-order window (fine at spec scale)
    val wRef = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df
      .withColumn("cum", sum("n_tokens").over(wRef))
      .withColumn("start_tok", col("cum") - col("n_tokens"))
      .withColumn("first_chunk", floor(col("start_tok") / 64.0).cast("long"))
      .withColumn("last_chunk",
        floor(greatest(col("cum") - 1, col("start_tok")) / 64.0).cast("long"))
      .select("doc_id", "start_tok", "first_chunk", "last_chunk")
      .as[(Long, Long, Long, Long)].collect().toSet

    for (parts <- Seq(1, 3, 32)) {
      val got = SequencePack.packChunks(df, "doc_id", "n_tokens", 64L, parts)
        .select("doc_id", "start_tok", "first_chunk", "last_chunk")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == ref, s"packing diverged at numPartitions=$parts")
    }
    // n_chunks consistency + totals: chunks tile the stream
    val packed = SequencePack.packChunks(df, "doc_id", "n_tokens", 64L, 8)
    assert(packed.where(col("n_chunks") =!=
      col("last_chunk") - col("first_chunk") + 1).count() == 0)
    val totalTok = rows.map(_._2).sum
    val maxChunk = packed.agg(max("last_chunk")).head().getLong(0)
    assert(maxChunk == (totalTok - 1) / 64, "last chunk must cover the stream end")
  }

  test("repetition + redaction column functions behave on edge shapes") {
    val d = Seq(
      (1L, "a\nb\na\nb\na"),      // 5 lines, 3 repeats of earlier lines
      (2L, "solo"),                // 1 line, 0 dups
      (3L, "x\nx")                 // 2 lines, 1 dup
    ).toDF("id", "t")
    val got = d.select(col("id"),
        TextFunctions.lineCount(col("t")).as("n"),
        TextFunctions.dupLineCount(col("t")).as("d"))
      .as[(Long, Int, Int)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(1L) == ((5, 3)) && got(2L) == ((1, 0)) && got(3L) == ((2, 1)))

    val r = Seq(("mail a.b@x.co then 10.0.3.7 call 555-123-4567 not 99-9-9", 3))
      .toDF("t", "want")
      .select(TextFunctions.piiCount(col("t")).as("n"),
        TextFunctions.redactPii(col("t")).as("red"))
      .as[(Long, String)].head()
    assert(r._1 == 3L)
    assert(r._2 == "mail <EMAIL> then <IP> call <PHONE> not 99-9-9")
  }

  test("Luhn card detection: checksum separates real cards from 16-digit ids") {
    val d = Seq(
      // 4111111111111111 and 5500005555555559 are Luhn-valid test numbers
      (1L, "pay 4111-1111-1111-1111 now"),
      (2L, "ref 4111 1111 1111 1112 is an order id"), // checksum fails
      (3L, "two: 4111111111111111 and 5500 0055 5555 5559"),
      (4L, "no digits here"),
      (5L, "short 4111-1111 run")).toDF("id", "t")
    val got = d.select(col("id"), TextFunctions.ccCount(col("t")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 0, 3L -> 2, 4L -> 0, 5L -> 0))
    // redaction is conservative: the non-Luhn shape is also rewritten
    val red = d.where(col("id") === 2)
      .select(TextFunctions.redactCc(col("t"))).as[String].head()
    assert(red == "ref <CARD> is an order id")
  }
}
