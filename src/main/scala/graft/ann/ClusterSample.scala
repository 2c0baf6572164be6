package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diversity-preserving corpus subsample (SemDeDup / SSL-prototypes
  * class): assign every embedding to its nearest k-means centroid and
  * keep at most `k` items per cluster — volume drops by the cap while
  * every region of embedding space stays represented, unlike a uniform
  * sample which thins sparse regions first.
  *
  * Composition, not new machinery: the broadcast centroid assignment is
  * one scan (the [[IvfIndex]] model the corpus likely already trains for
  * ANN), and the per-cluster cap is [[graft.text.HostCurate.capPerHost]]
  * with the cluster id as the "host" — so the selection order is the
  * same deterministic pseudorandom keyHash, and the two-stage salted
  * top-k bounds every task even when one centroid captures half the
  * corpus (the hot-cluster case mirror of the viral URL / mega-host). */
object ClusterSample {

  /** `items` + `cluster` (nearest-centroid id; -1 for null vectors) —
    * one shared assignment path with [[IvfIndex.assignments]], so the
    * null/tie conventions cannot diverge. */
  def withCluster(items: DataFrame, vecCol: String,
                  model: IvfIndex.Model, outCol: String = "cluster"): DataFrame =
    IvfIndex.withAssignment(items, vecCol, model, outCol)

  /** Keep ≤ `k` items per cluster; adds `cluster` and `cluster_rank`
    * (1..k in the deterministic keyHash-of-id order). */
  def capPerCluster(items: DataFrame, idCol: String, vecCol: String,
                    model: IvfIndex.Model, k: Int): DataFrame =
    graft.text.HostCurate.capPerHost(
        withCluster(items, vecCol, model), "cluster", idCol, k)
      .withColumnRenamed("host_rank", "cluster_rank")
}
