package graft.ann

import graft.SparkTestBase

class MmrSpec extends SparkTestBase {
  import spark.implicits._

  test("MMR prefers the diverse candidate over the redundant one") {
    // candidates: a(0.9), its near-dup b(0.85, cos(a,b)=0.95), far c(0.5)
    val qc = Seq((1L, 10L, 0.9), (1L, 11L, 0.85), (1L, 12L, 0.5))
      .toDF("qid", "cid", "qcos")
    val cc = Seq((1L, 10L, 11L, 0.95), (1L, 10L, 12L, 0.1), (1L, 11L, 12L, 0.1))
      .toDF("qid", "a", "b", "ccos")
    val got = Mmr.selectFromRelations(qc, cc, k = 2, lambda = 0.7)
      .as[(Long, Int, Long)].collect().sortBy(_._2).toSeq
    // rank 1 = pure relevance (a); rank 2 = c beats b:
    // 0.7*0.5 - 0.3*0.1 = 0.32 > 0.7*0.85 - 0.3*0.95 = 0.31
    assert(got == Seq((1L, 1, 10L), (1L, 2, 12L)))
    // lambda = 1 degenerates to pure relevance order
    val rel = Mmr.selectFromRelations(qc, cc, k = 3, lambda = 1.0)
      .as[(Long, Int, Long)].collect().sortBy(_._2).map(_._3).toSeq
    assert(rel == Seq(10L, 11L, 12L))
  }

  test("matches an independent driver greedy on random relations; per-query isolation") {
    val rnd = new scala.util.Random(11)
    val qs = (1L to 5L)
    val cands = qs.flatMap(q => (0 until 8).map(i =>
      (q, q * 100 + i, rnd.nextDouble())))
    val pairs = qs.flatMap { q =>
      val ids = (0 until 8).map(q * 100 + _)
      for (i <- ids.indices; j <- i + 1 until ids.length)
        yield (q, ids(i), ids(j), rnd.nextDouble())
    }
    val k = 4
    val lambda = 0.6
    val got = Mmr.selectFromRelations(
        cands.toDF("qid", "cid", "qcos"),
        pairs.toDF("qid", "a", "b", "ccos"), k, lambda)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toSeq }
    // independent driver reference
    val byQ = cands.groupBy(_._1)
    val simByQ = pairs.groupBy(_._1)
    qs.foreach { q =>
      val cs = byQ(q).map(c => (c._2, c._3)).sortBy(_._1)
      val sim = simByQ(q).flatMap(p =>
        Seq((p._2, p._3) -> p._4, (p._3, p._2) -> p._4)).toMap
      var selected = List.empty[Long]
      val expect = (1 to k).map { _ =>
        val best = cs.filterNot(c => selected.contains(c._1)).maxBy { case (cid, qcos) =>
          val worst = if (selected.isEmpty) 0.0
            else selected.map(s => sim.getOrElse((cid, s), 0.0)).max
          (lambda * qcos - (1 - lambda) * worst, -cid)
        }
        selected = selected :+ best._1
        best._1
      }
      assert(got(q) == expect, s"query $q")
    }
  }
}
