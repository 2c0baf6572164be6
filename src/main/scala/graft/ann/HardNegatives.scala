package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.cosine_similarity

/** Hard-negative mining for contrastive training: for every anchor, the
  * k most-similar documents whose LABEL differs (the "hard" negatives —
  * random negatives, [[graft.text.NegativeSample]], are trivially easy
  * for a half-trained encoder; the informative ones sit just across the
  * decision boundary). Labels are whatever partitions positives from
  * negatives for the task: a cluster id, a source, a query-relevance
  * group.
  *
  * Scale shape: every document mines its own negatives, so the query
  * side is corpus-sized — the broadcast-queries brute path is structurally
  * wrong here. Mining runs over probed IVF lists instead: anchors explode
  * to `nprobe` rows, items carry their single assigned list, and ONE
  * list-keyed shuffle joins them — per-anchor candidate count is bounded
  * by its probed lists' sizes, never the corpus. The relational tail
  * (label-mismatch filter + per-anchor window top-k) is exposed
  * separately ([[fromCandidates]]) so the FP candidate relation can be
  * checkpointed and the tail replayed in SQL (the Mmr/ANN gate
  * discipline).
  *
  * Null semantics, pinned: a null/invalid vector scores no candidates
  * (cosine null drops); a NULL label never differs from anything under
  * three-valued logic, so null-label rows neither mine nor serve
  * negatives — identical to the SQL replay.
  */
object HardNegatives {

  /** Label-blind candidate relation over probed IVF lists:
    * `(qid, qlabel, nid, nlabel, similarity)`, self-pairs excluded. Each
    * item holds ONE assigned list, so a pair appears at most once. */
  def candidates(df: DataFrame, idCol: String, vecCol: String,
                 labelCol: String, model: IvfIndex.Model,
                 nprobe: Int): DataFrame = {
    val anchors = IvfIndex.withProbes(
      df.select(col(idCol).as("qid"), col(vecCol).as("__qv"),
        col(labelCol).as("qlabel")),
      "__qv", model, nprobe, "list")
    val items = IvfIndex.withAssignment(
        df.select(col(idCol).as("nid"), col(vecCol).as("__nv"),
          col(labelCol).as("nlabel")), "__nv", model, "list")
    // salted list join (IvfIndex.listSalt): the exact-cosine work is
    // proportional to the join OUTPUT; with few lists the unsalted join's
    // parallelism is key-bounded and AQE coalesces it further (measured:
    // the scoring stage ran on 2 tasks at sf0.1)
    IvfIndex.listJoin(anchors, items, "list", "nid",
        IvfIndex.listSalt(df.sparkSession, model.centroids.length))
      .where(col("qid") =!= col("nid"))
      .withColumn("similarity", cosine_similarity(col("__qv"), col("__nv")))
      .where(col("similarity").isNotNull)
      .select(col("qid"), col("qlabel"), col("nid"), col("nlabel"),
        col("similarity"))
  }

  /** The relational tail: label-mismatch filter + per-anchor exact top-k
    * (similarity desc, id asc — deterministic). Adds `rank` (1..k). */
  def fromCandidates(cand: DataFrame, k: Int): DataFrame = {
    require(k > 0, "HardNegatives: k must be positive")
    cand.where(col("qlabel") =!= col("nlabel"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("similarity").desc, col("nid").asc)))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("similarity"))
  }

  /** The composed operator. Approximate like any IVF read (recall grows
    * with `nprobe`); `nlist = 1` degenerates to the exact all-pairs mine
    * — the spec equivalence. */
  def mine(df: DataFrame, idCol: String, vecCol: String, labelCol: String,
           k: Int, model: IvfIndex.Model, nprobe: Int = 4): DataFrame =
    fromCandidates(candidates(df, idCol, vecCol, labelCol, model, nprobe), k)
}
