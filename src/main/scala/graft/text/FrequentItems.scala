package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact heavy hitters (frequent items) with a Count-Min-Sketch prefilter.
  *
  * A plain `groupBy(key).count().where(n >= min)` shuffles EVERY distinct
  * key — on a heavy-tailed key space (corpus n-grams: trillions distinct,
  * almost all singletons) the shuffle is dominated by the long tail that
  * the HAVING clause then throws away. The CMS path spends one extra scan
  * to avoid that: (1) a Count-Min sketch of the key column (Spark's
  * `stat.countMinSketch` — per-partition sketches, driver tree-merge, no
  * shuffle), (2) a scan-predicate prefilter `estimate(key) >= min` (CMS
  * only ever OVERestimates, so every true heavy hitter's rows pass — no
  * false negatives), (3) the exact groupBy over surviving rows only. A
  * true heavy hitter keeps ALL its rows (same key ⇒ same passing
  * estimate), so its exact count is intact; collision-inflated tail keys
  * that sneak through are killed by the final exact HAVING. Output is
  * therefore EXACTLY the plain groupBy-having result — the sketch only
  * bounds how much of the tail pays shuffle cost.
  *
  * Keys hash to 64-bit before sketching (16-byte sketch updates, and the
  * scan predicate is a long probe); a hash collision merges two keys'
  * estimates — still an overestimate, still a superset, still exact
  * output. Sketch size = O(1/eps * ln(1/(1-confidence))) counters on the
  * driver — eps 1e-4 is ~2.7 MB of longs, independent of corpus size.
  *
  * APPLICABILITY (measured, SCALE.md round-9b): the prefilter only drops
  * rows when `minCount >> eps * N` (N = total stream length) — the
  * phi-frequent-items regime. Below that the sketch SATURATES (its error
  * bound eps*N exceeds the threshold, every key's estimate passes) and
  * the operator degrades to plain-groupBy cost plus a wasted sketch pass
  * — still exact, never faster. For low-support HAVING queries use the
  * plain aggregate. */
object FrequentItems {

  /** Build a CountMinSketch over a long key column with ZERO per-row
    * boxing: the child plan's whole-stage-codegen output is consumed as
    * raw UnsafeRows (`queryExecution.toRdd` + `getLong`), one sketch per
    * partition, tree-merged — no driver single-reducer bottleneck, no
    * shuffle of row data (only partition-count × sketch-size merge
    * traffic). This replaces the SQL `count_min_sketch` aggregate build
    * (a TypedImperativeAggregate whose per-row `child.eval` boxes every
    * key through ObjectHashAggregate), and the older
    * DataFrameStatFunctions RDD path that boxed whole Rows. Same sketch
    * semantics either way: same impl class, seed, and dimensions, so
    * estimates are identical. Build-pass cost measured at the 170M-key
    * rehearsal in SCALE.md (round 10). */
  def buildSketchLong(keys: DataFrame, keyCol: String, eps: Double,
                      confidence: Double, seed: Int = 42)
      : org.apache.spark.util.sketch.CountMinSketch = {
    import org.apache.spark.util.sketch.CountMinSketch
    val rdd = keys.select(col(keyCol).cast("long")).queryExecution.toRdd
    if (rdd.getNumPartitions == 0) return CountMinSketch.create(eps, confidence, seed)
    rdd.mapPartitions { it =>
      val cms = CountMinSketch.create(eps, confidence, seed)
      while (it.hasNext) {
        val r = it.next()
        if (!r.isNullAt(0)) cms.addLong(r.getLong(0))
      }
      Iterator.single(cms)
    }.treeReduce({ (a, b) => a.mergeInPlace(b); a }, depth = 2)
  }

  /** (keyCol, n) for every key with exact count >= minCount. */
  def heavyHitters(items: DataFrame, keyCol: String, minCount: Long,
                   eps: Double = 1e-4, confidence: Double = 0.99): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val keyed = items.select(col(keyCol),
      xxhash64(col(keyCol)).as("__k"))
    val cms = buildSketchLong(keyed, "__k", eps, confidence)
    keyed.where(graft.functions.cms_at_least(col("__k"), cms, minCount))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
  }
}
