package graft.ann

import graft.SparkTestBase

class RetrievalEvalSpec extends SparkTestBase {
  import spark.implicits._

  test("per-query metrics match hand-computed values") {
    // q1: judged {10,11,12}; retrieved hits 10@rank1, 12@rank3 -> recall 2/3, rr 1
    // q2: judged {20};      retrieved hit 20@rank2            -> recall 1,   rr 1/2
    // q3: judged {30,31};   nothing relevant retrieved         -> recall 0,   rr 0
    // q4: no judgments -> absent from output even with results
    val results = Seq(
      (1L, 10L, 1), (1L, 99L, 2), (1L, 12L, 3),
      (2L, 98L, 1), (2L, 20L, 2),
      (3L, 97L, 1),
      (4L, 96L, 1)).toDF("qid", "nid", "rk")
    val truth = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 20L),
      (3L, 30L), (3L, 31L)).toDF("qid", "nid")
    val got = RetrievalEval.perQuery(results, truth, "qid", "nid", "rk")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((2L, 3L, 2.0 / 3.0, 1.0)))
    assert(got(2L) == ((1L, 1L, 1.0, 0.5)))
    assert(got(3L) == ((0L, 2L, 0.0, 0.0)))
  }
}
