package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RepetitionSpec extends SparkTestBase {
  import spark.implicits._

  test("dup-2gram fractions: hand-computed on a templated document") {
    // "a b a b c": 2-grams = ["a b", "b a", "a b", "b c"] -> "a b" x2
    val df = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val got = Repetition.dupNgramStats(df, "doc_id", "text", 2)
      .select("dup_2gram_char_frac", "top_2gram_char_frac")
      .as[(Double, Double)].head()
    // dup chars = 2 occurrences x len("a b")=3 = 6; len(text)=9
    assert(got._1 == 6.0 / 9.0)
    // top = max(c*len): "a b" 2x3=6 beats singles (3 each)
    assert(got._2 == 6.0 / 9.0)
  }

  test("no duplicated grams -> dup fraction 0; top still positive") {
    val df = Seq((1L, "w1 w2 w3 w4")).toDF("doc_id", "text")
    val got = Repetition.dupNgramStats(df, "doc_id", "text", 2)
      .select("dup_2gram_char_frac", "top_2gram_char_frac")
      .as[(Double, Double)].head()
    assert(got._1 == 0.0)
    assert(got._2 == 5.0 / 11.0) // every 2-gram once, len "w1 w2" = 5
  }

  test("docs shorter than n words yield no row (documented contract)") {
    val df = Seq((1L, "solo"), (2L, "two words here")).toDF("doc_id", "text")
    val got = Repetition.dupNgramStats(df, "doc_id", "text", 2)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(2L))
  }
}
