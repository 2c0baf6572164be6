package graft.ann

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ClusterSampleSpec extends SparkTestBase {
  import spark.implicits._

  // two well-separated blobs around (±10, 0...) so any 2-center k-means
  // finds them; sizes 40 vs 8 (the imbalanced case the cap exists for)
  private def corpus = (0L until 48L).map { i =>
    val sign = if (i < 40) 1.0f else -1.0f
    val jx = (i % 7).toFloat / 100f
    (i, Seq(sign * 10f + jx, (i % 5).toFloat / 100f, 0f, 0f))
  }.toDF("vec_id", "embedding")

  test("capPerCluster keeps <= k per cluster and covers every cluster") {
    val model = IvfIndex.train(corpus, "embedding", nlist = 2, seed = 1)
    val got = ClusterSample.capPerCluster(corpus, "vec_id", "embedding",
      model, k = 6).select("vec_id", "cluster", "cluster_rank")
      .as[(Long, Int, Int)].collect()
    val byCluster = got.groupBy(_._2)
    assert(byCluster.size == 2) // both blobs represented
    assert(byCluster.values.forall(g => g.length <= 6 && g.length >= 1))
    // the big blob is capped at 6; the small one keeps <= its 8 members
    assert(byCluster.values.map(_.length).toSeq.sorted == Seq(6, 6))
    // selection matches the single-window reference (same keyHash order)
    val ref = graft.text.HostCurate.capPerHostReference(
        ClusterSample.withCluster(corpus, "embedding", model),
        "cluster", "vec_id", 6)
      .select("vec_id").as[Long].collect().toSet
    assert(got.map(_._1).toSet == ref)
  }

  test("null embeddings land in cluster -1, never steal real-cluster slots") {
    val withNull = corpus.unionByName(
      Seq((99L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
    val model = IvfIndex.train(corpus, "embedding", nlist = 2, seed = 1)
    val got = ClusterSample.capPerCluster(withNull, "vec_id", "embedding",
      model, k = 50)
    assert(got.where(col("cluster") === -1).select("vec_id")
      .as[Long].collect().toSeq == Seq(99L))
  }
}
