package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the [[TrainerLocal]] driver fast path == the distributed round
  * loops for all three tokenizer trainers, on the real sf0.001 documents
  * slice plus targeted shapes. The fast path triggers whenever the
  * distinct-pretoken table fits `spark.graft.trainer.driverWords`; setting
  * that conf to 0 forces the distributed path, so both paths run on the
  * SAME input in one session and must agree bit-for-bit (merge lists are
  * compared as values; unigram count relations as sorted row sets). */
class TrainerParitySpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select(col("text"))

  private def forced[A](f: => A): A = {
    spark.conf.set("spark.graft.trainer.driverWords", "0")
    try f finally spark.conf.unset("spark.graft.trainer.driverWords")
  }

  test("BPE: driver fast path == distributed rounds on sf0.001") {
    val local = BpeTrainer.train(docs, "text", numMerges = 8)
    val dist = forced(BpeTrainer.train(docs, "text", numMerges = 8))
    assert(local == dist)
    assert(local.nonEmpty)
  }

  test("WordPiece: driver fast path == distributed rounds on sf0.001") {
    val local = WordPieceTrainer.train(docs, "text", numMerges = 8)
    val dist = forced(WordPieceTrainer.train(docs, "text", numMerges = 8))
    assert(local == dist)
    assert(local.nonEmpty)
  }

  test("Unigram: driver fast path == distributed EM on sf0.001") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("piece"), col("cnt_micro").cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(identity)
    val local = rows(UnigramTrainer.train(docs, "text", vocabSize = 400,
      maxPieceLen = 4, emIters = 1))
    val dist = rows(forced(UnigramTrainer.train(docs, "text", vocabSize = 400,
      maxPieceLen = 4, emIters = 1)))
    assert(local.sameElements(dist))
    assert(local.nonEmpty)
  }

  test("BPE fast path: count ties break by UTF-8 binary order") {
    // 'Z' (0x5a) < 'a' (0x61) in UTF-8 binary order (compareTo agrees for
    // ASCII; the case exercises the tie branch either way): both pairs
    // occur exactly twice, so the winner must be the lexicographically
    // smaller pair under binary order.
    val texts = Seq("Zq Zq", "ar ar").toDF("text")
    val local = BpeTrainer.train(texts, "text", numMerges = 1)
    val dist = forced(BpeTrainer.train(texts, "text", numMerges = 1))
    assert(local == dist)
    assert(local.head.left == "Z" && local.head.right == "q")
  }

  test("WordPiece fast path: exact-rational score ties break like the " +
    "distributed reduceLeft") {
    // two pairs with identical (cp, ca, cb) — the BigInt compare ties and
    // the (a, b) compareTo branch decides
    val texts = Seq("xy xy", "uv uv").toDF("text")
    val local = WordPieceTrainer.train(texts, "text", numMerges = 1)
    val dist = forced(WordPieceTrainer.train(texts, "text", numMerges = 1))
    assert(local == dist)
  }
}
