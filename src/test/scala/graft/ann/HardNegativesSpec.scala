package graft.ann

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HardNegativesSpec extends SparkTestBase {
  import spark.implicits._

  // 40 vectors in 4 well-separated direction clusters (label = cluster),
  // plus in-cluster jitter strong enough to order neighbors distinctly
  private lazy val vecs = {
    val rows = (0 until 40).map { i =>
      val c = i % 4
      val base = Array.fill(8)(0.05f)
      base(c * 2) = 1.0f
      base(c * 2 + 1) = 0.2f + 0.01f * i
      (i.toLong, base.toSeq, c)
    }
    rows.toDF("id", "vec", "label")
      .select($"id", $"vec".cast("array<float>").as("vec"), $"label")
      .cache()
  }

  private def bruteExpected(k: Int): Set[(Long, Long, Int)] = {
    val data = vecs.select("id", "vec", "label")
      .as[(Long, Seq[Float], Int)].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    data.flatMap { case (qid, qv, ql) =>
      data.filter { case (nid, _, nl) => nid != qid && nl != ql }
        .map { case (nid, nv, _) => (nid, cos(qv, nv)) }
        .sortBy { case (nid, s) => (-s, nid) }
        .take(k).zipWithIndex
        .map { case ((nid, _), r) => (qid, nid, r + 1) }
    }.toSet
  }

  test("nlist=1 mine equals the exact all-pairs top-k; labels always differ") {
    val model = IvfIndex.train(vecs, "vec", nlist = 1)
    val got = HardNegatives.mine(vecs, "id", "vec", "label", k = 3, model,
        nprobe = 1)
      .select($"qid", $"nid", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(got == bruteExpected(3), "single-list mining must be exact")
    // every mined negative crosses the label boundary
    val labels = vecs.select("id", "label").as[(Long, Int)].collect().toMap
    assert(got.forall { case (q, n, _) => labels(q) != labels(n) })
    // dense ranks 1..3 per anchor
    val byQ = got.groupBy(_._1)
    assert(byQ.values.forall(_.map(_._3).toSeq.sorted == Seq(1, 2, 3)))
  }

  test("probing every list of a multi-list index is exact too") {
    val model = IvfIndex.train(vecs, "vec", nlist = 4)
    val got = HardNegatives.mine(vecs, "id", "vec", "label", k = 3, model,
        nprobe = 4)
      .select($"qid", $"nid", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(got == bruteExpected(3),
      "nprobe == nlist reaches every item; result must equal brute")
  }

  test("null labels and null vectors mine and serve nothing") {
    val withNulls = vecs
      .unionByName(Seq((100L, null.asInstanceOf[Seq[Float]], 0))
        .toDF("id", "vec", "label")
        .select($"id", $"vec".cast("array<float>").as("vec"), $"label"))
      .unionByName(vecs.where($"id" === 0).select($"id" + 200 as "id",
        $"vec", lit(null).cast("int").as("label")))
    val model = IvfIndex.train(vecs, "vec", nlist = 1)
    val got = HardNegatives.mine(withNulls, "id", "vec", "label", k = 3,
      model, nprobe = 1)
    val ids = got.select($"qid").as[Long].collect().toSet ++
      got.select($"nid").as[Long].collect().toSet
    assert(!ids.contains(100L) && !ids.contains(200L))
    intercept[IllegalArgumentException] {
      HardNegatives.fromCandidates(got, 0)
    }
  }
}
