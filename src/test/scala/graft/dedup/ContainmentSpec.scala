package graft.dedup

import graft.SparkTestBase

class ContainmentSpec extends SparkTestBase {
  import spark.implicits._

  test("containment catches an excerpt Jaccard misses") {
    val long = (1 to 40).map(i => s"t$i").mkString(" ")
    val excerpt = (1 to 10).map(i => s"t$i").mkString(" ")
    val other = (100 to 139).map(i => s"u$i").mkString(" ")
    val df = Seq((1L, long), (2L, excerpt), (3L, other))
      .toDF("doc_id", "text")
    val cont = TextDedup.ngramContainmentPairs(df, "doc_id", "text", 3, 0.9)
      .select("ida", "idb", "containment")
      .as[(Long, Long, Double)].collect()
    assert(cont.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(cont.head._3 == 1.0, "full excerpt must score containment 1.0")
    // the same pair under Jaccard: 8 shared / 38 union ~ 0.21 — invisible
    val jac = TextDedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.9)
    assert(jac.count() == 0)
  }

  test("containment is symmetric in min(): direction of the subset doesn't matter") {
    val a = (1 to 30).map(i => s"x$i").mkString(" ")
    val sub = (11 to 20).map(i => s"x$i").mkString(" ")
    // subset doc carries the LOWER id this time
    val df = Seq((5L, sub), (9L, a)).toDF("doc_id", "text")
    val got = TextDedup.ngramContainmentPairs(df, "doc_id", "text", 3, 0.99)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(got == Set((5L, 9L)))
  }
}
