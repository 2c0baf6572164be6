package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance (Carbonell & Goldstein '98) — diversified
  * retrieval: greedily select k of a query's top-N candidates maximizing
  * `lambda·cos(q,d) − (1−lambda)·max_{s∈selected} cos(d,s)`, so the
  * result set trades pure relevance for coverage (the dedup-adjacent
  * retrieval op: without it a near-duplicate cluster fills the whole
  * result list).
  *
  * Scale shape: candidate generation is the existing top-k machinery
  * (bounded N per query); the greedy runs per query over its OWN N
  * candidates inside `mapGroups` — O(k·N²) work on ≤ N rows per group,
  * never a cross-query structure. Selection is deterministic: ties break
  * by ascending candidate id, and all arithmetic is plain doubles over
  * the candidate/pair cosine relations, so a SQL engine replays the
  * greedy exactly from those relations. */
object Mmr {

  /** Greedy selection from precomputed relations: `qc (qid, cid, qcos)`
    * candidates per query, `cc (qid, a, b, ccos)` pairwise candidate
    * cosines per query (either orientation; missing pairs count 0 —
    * callers built them from the same candidate set, so only identical
    * ids are legitimately absent). Returns `(qid, rank, cid)`,
    * rank 1..k. */
  def selectFromRelations(qc: DataFrame, cc: DataFrame, k: Int,
                          lambda: Double): DataFrame = {
    require(k > 0, "mmr: k must be positive")
    require(lambda >= 0 && lambda <= 1, s"mmr: lambda in [0,1], got $lambda")
    val spark = qc.sparkSession
    import spark.implicits._
    val cands = qc.select(col("qid").cast("long"), col("cid").cast("long"),
      col("qcos").cast("double")).as[(Long, Long, Double)]
    val pairs = cc.select(col("qid").cast("long"), col("a").cast("long"),
      col("b").cast("long"), col("ccos").cast("double"))
      .as[(Long, Long, Long, Double)]
    val grouped = cands.groupByKey(_._1).cogroup(pairs.groupByKey(_._1)) {
      (qid, cs, ps) =>
        val cand = cs.map(c => (c._2, c._3)).toArray.sortBy(_._1)
        val sim = new scala.collection.mutable.HashMap[(Long, Long), Double]()
        ps.foreach { p =>
          sim((p._2, p._3)) = p._4
          sim((p._3, p._2)) = p._4
        }
        val selected = scala.collection.mutable.ArrayBuffer[Long]()
        val out = scala.collection.mutable.ArrayBuffer[(Long, Int, Long)]()
        var rank = 1
        while (rank <= k && selected.size < cand.length) {
          var bestId = -1L
          var bestScore = Double.NegativeInfinity
          cand.foreach { case (cid, qcos) =>
            if (!selected.contains(cid)) {
              val worst =
                if (selected.isEmpty) 0.0
                else selected.map(s => sim.getOrElse((cid, s), 0.0)).max
              val score = lambda * qcos - (1 - lambda) * worst
              // ascending-id iteration + strict > = ties break by min id
              if (score > bestScore) { bestScore = score; bestId = cid }
            }
          }
          selected += bestId
          out += ((qid, rank, bestId))
          rank += 1
        }
        out.iterator
    }
    grouped.toDF("qid", "rank", "cid")
  }

  /** Full operator: brute top-N candidates per query, per-query pairwise
    * candidate cosines, then the greedy. `(qid, rank, cid)`. */
  def diversify(items: DataFrame, itemId: String, itemVec: String,
                queries: DataFrame, queryId: String, queryVec: String,
                topN: Int, k: Int, lambda: Double): DataFrame = {
    val (qc, cc) = relations(items, itemId, itemVec,
      queries, queryId, queryVec, topN)
    selectFromRelations(qc, cc, k, lambda)
  }

  /** The two relations the greedy consumes — exposed so a gate can
    * checkpoint them and a SQL oracle can replay the selection. */
  def relations(items: DataFrame, itemId: String, itemVec: String,
                queries: DataFrame, queryId: String, queryVec: String,
                topN: Int): (DataFrame, DataFrame) = {
    import graft.functions.cosine_similarity
    val qc = Similarity.topKBrute(items, itemId, itemVec,
        queries, queryId, queryVec, topN)
      .select(col(queryId).as("qid"), col(itemId).as("cid"),
        col("similarity").as("qcos"))
    val withVec = qc.join(
      items.select(col(itemId).as("cid"), col(itemVec).as("__v")), "cid")
    val a = withVec.select(col("qid"), col("cid").as("a"), col("__v").as("__va"))
    val b = withVec.select(col("qid"), col("cid").as("b"), col("__v").as("__vb"))
    val cc = a.join(b, Seq("qid"))
      .where(col("a") < col("b"))
      .select(col("qid"), col("a"), col("b"),
        cosine_similarity(col("__va"), col("__vb")).as("ccos"))
    (qc, cc)
  }
}
