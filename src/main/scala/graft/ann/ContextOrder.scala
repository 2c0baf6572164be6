package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-context pretraining layout (Shi et al. 2023, arXiv:2310.10638):
  * order the corpus so semantically related documents become ADJACENT in
  * the training stream, instead of i.i.d.-shuffled — the published remedy
  * for long-context windows full of unrelated documents. The paper
  * traverses an approximate-kNN document graph; the equivalent
  * partition-parallel formulation here: assign every embedding to its
  * nearest k-means centroid (the [[IvfIndex]] model the corpus likely
  * already trains for ANN), then inside each cell walk a greedy
  * max-cosine nearest-neighbor chain. Output `(id, cell, chain_pos)` —
  * writing ordered by `(cell, chain_pos)` (e.g. via
  * [[graft.text.CorpusSplit.writeShuffled]]'s range layout with this key)
  * yields the similarity-contiguous training order.
  *
  * Scale shape: the assignment is one broadcast-model scan; each cell
  * chains independently inside `flatMapGroups` (one shuffle on the cell
  * key). Greedy chaining is O(m²·dim) per cell, so oversized cells are
  * split into deterministic id-ordered blocks of `maxChain` — positions
  * stay globally consecutive per cell, coherence degrades only at block
  * seams (the paper's kNN-graph traversal makes the same locality
  * trade inside graph shards). At 100 TB the knob is nlist: size it so
  * corpus/nlist ≈ maxChain and every task stays bounded; the chain step
  * never materializes more than one cell.
  *
  * Determinism: chain start is the cell's smallest id; each step picks
  * max cosine (double-accumulated in fixed vector order) with ties to
  * the smaller id; null vectors collect in cell -1 ordered by id. */
object ContextOrder {

  /** `(idCol, cell, chain_pos)` for every row of `items`; `chain_pos` is
    * 1-based within the cell. `idCol` must be integral (the id is the
    * deterministic tiebreak). */
  def orderByContext(items: DataFrame, idCol: String, vecCol: String,
                     model: IvfIndex.Model,
                     maxChain: Int = 4096): DataFrame = {
    require(maxChain > 1, "contextOrder: maxChain must be > 1")
    val spark = items.sparkSession
    import spark.implicits._
    val assigned = IvfIndex.withAssignment(items, vecCol, model, "__cell")
      .select(col("__cell").cast("int"), col(idCol).cast("long"), col(vecCol))
      .as[(Int, Long, Array[Float])]
    assigned.groupByKey(_._1).flatMapGroups { (cell, it) =>
      // one cell per task: bounded by the nlist sizing contract above
      val rows = it.map(r => (r._2, r._3)).toArray.sortBy(_._1)
      if (cell == -1) {
        // null vectors: no geometry to chain, keep id order
        rows.iterator.zipWithIndex.map { case ((id, _), i) => (id, cell, i + 1) }
      } else {
        val out = new Array[(Long, Int, Int)](rows.length)
        var pos = 0
        var lo = 0
        while (lo < rows.length) {
          val hi = math.min(lo.toLong + maxChain, rows.length.toLong).toInt
          val block = rows.slice(lo, hi)
          val taken = new Array[Boolean](block.length)
          var cur = 0 // smallest id: block is id-sorted
          var k = 0
          while (k < block.length) {
            taken(cur) = true
            out(pos) = (block(cur)._1, cell, pos + 1)
            pos += 1
            var best = -1
            var bestCos = Double.NegativeInfinity
            var j = 0
            while (j < block.length) {
              if (!taken(j)) {
                val c = cosine(block(cur)._2, block(j)._2)
                // strict > with ascending j = ties keep the smaller id;
                // a NaN/degenerate cosine never wins here
                if (c > bestCos) { bestCos = c; best = j }
              }
              j += 1
            }
            if (best < 0) {
              // every remaining candidate scored NaN/-Inf (NaN components,
              // zero norms): fall back to the smallest untaken id so the
              // 1..m permutation contract holds — degenerate vectors
              // append in id order instead of silently duplicating `cur`
              var f = 0
              while (f < block.length && taken(f)) f += 1
              best = f
            }
            if (best < block.length) cur = best
            k += 1
          }
          lo = hi
        }
        out.iterator
      }
    }.toDF(idCol, "cell", "chain_pos")
  }

  /** The engine's ONE cosine kernel
    * ([[graft.functions.CosineSimilarity.cosine]] — double accumulation
    * in fixed index order, the accumulation the SQL oracle's
    * list_sum-over-doubles performs, so rank decisions agree across
    * engines), with its null (mismatched/zero/empty) mapped to -Inf so a
    * degenerate candidate sorts behind every real one and the chain's
    * fallback picks it up in id order. */
  private[ann] def cosine(a: Array[Float], b: Array[Float]): Double = {
    val c = graft.functions.CosineSimilarity.cosine(a, b)
    if (c == null) Double.NegativeInfinity else c.doubleValue()
  }
}
