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
  * plain aggregate. Note also that Spark's `stat.countMinSketch` builds
  * through a boxed-row RDD aggregate; at true 100 TB scale the build pass
  * would want a codegen sketch aggregate (the probe side here already is
  * codegen). */
object FrequentItems {

  /** (keyCol, n) for every key with exact count >= minCount. */
  def heavyHitters(items: DataFrame, keyCol: String, minCount: Long,
                   eps: Double = 1e-4, confidence: Double = 0.99): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val keyed = items.select(col(keyCol),
      xxhash64(col(keyCol)).as("__k"))
    // build through the SQL count_min_sketch AGGREGATE (ObjectHashAggregate
    // over unsafe rows), not DataFrameStatFunctions.countMinSketch — the
    // latter is an RDD aggregate that boxes every row (measured ~10x the
    // scan cost at 170M rows, SCALE.md round-9b); same sketch bytes either
    // way (CountMinSketch.writeTo layout)
    val bytes = keyed.select(expr(
        s"count_min_sketch(__k, CAST($eps AS DOUBLE), " +
          s"CAST($confidence AS DOUBLE), 42)").as("s"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    keyed.where(graft.functions.cms_at_least(col("__k"), cms, minCount))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
  }
}
