package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget mixture sampling — the data-mixing step stated the way
  * mixes are actually specified: "N tokens of source X", not a keep-rate.
  * Documents are taken per source in deterministic key-hash order until
  * the source's token budget is reached; the document that CROSSES the
  * budget is kept (budgets are floors, not ceilings — the standard
  * epoch-building convention, and the choice that makes tiny budgets
  * still yield data). A rate-based sampler ([[graft.queries.Queries]]
  * q_mix_sample) needs a cardinality estimate to hit a token target;
  * this hits it exactly, deterministically, and retry-stably.
  *
  * Shape: one running-sum window per source over (hash, id) order. The
  * same hot-source bound as any per-group window applies; unlike top-k
  * the running sum cannot two-stage exactly, but the window carries only
  * (id, source, n_tokens) — at 100 TB the window input is the metadata
  * relation (~10 bytes/doc), not the corpus, and a 10^9-doc source is a
  * few GB in one sort — partition the epoch build per source beyond
  * that. */
object TokenBudget {

  /** Keep documents of each source, in [[CorpusSplit.keyHash]] order,
    * while the EXCLUSIVE running token sum is below that source's budget
    * (so the crossing document is kept; later ones drop). Sources absent
    * from `budgets` are dropped entirely. Adds `tokens_before` (the
    * exclusive prefix sum) for audit. */
  def sampleToBudget(df: DataFrame, srcCol: String, idCol: String,
                     tokenCol: String,
                     budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty, "sampleToBudget: no budgets")
    require(budgets.values.forall(_ > 0), "sampleToBudget: budgets must be > 0")
    val budget = budgets.foldLeft(lit(null).cast("long")) {
      case (acc, (s, b)) => when(col(srcCol) === s, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(col(srcCol))
      .orderBy(CorpusSplit.keyHash(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__budget", budget)
      .where(col("__budget").isNotNull)
      .withColumn("tokens_before",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .where(col("tokens_before") < col("__budget"))
      .drop("__budget")
  }

  /** Build a mixture epoch where budgets may EXCEED a source's token
    * total — the low-resource half of temperature mixing ([[
    * temperatureBudgets]] with the cap lifted): each source repeats
    * whole-corpus epochs `budget div total` times, then the remainder
    * fills from a partial epoch in the same key-hash order (crossing
    * document kept — [[sampleToBudget]] floors semantics). Adds `epoch`
    * (0-based; the partial epoch is the last index). Deterministic,
    * retry-stable, exact integer arithmetic end to end.
    *
    * Shape: the per-source totals are ONE partial-aggregated pass
    * collected as #sources rows (the calibrate convention); whole epochs
    * are a scan-local `explode(sequence(...))` — no shuffle, replication
    * bounded by `maxEpochs`; only the remainder pays the running-sum
    * window, over the metadata relation like [[sampleToBudget]]. */
  def upsampleToBudget(df: DataFrame, srcCol: String, idCol: String,
                       tokenCol: String, budgets: Map[String, Long],
                       maxEpochs: Int = 100): DataFrame = {
    require(budgets.nonEmpty, "upsampleToBudget: no budgets")
    require(budgets.values.forall(_ > 0), "upsampleToBudget: budgets must be > 0")
    val totals = df.where(col(srcCol).isInCollection(budgets.keys.toSeq))
      .groupBy(col(srcCol)).agg(sum(col(tokenCol)).cast("long").as("t"))
      .collect()
      // an all-NULL token column sums to NULL — surface the no-tokens
      // diagnostic below instead of an NPE on getLong
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .toMap
    totals.foreach { case (s, t) =>
      require(t > 0, s"upsampleToBudget: source '$s' has no tokens") }
    // budgeted sources absent from the corpus contribute nothing
    val present = budgets.filter { case (s, _) => totals.contains(s) }
    val epochsOf = present.map { case (s, b) => s -> b / totals(s) }
    epochsOf.foreach { case (s, e) =>
      require(e <= maxEpochs, s"upsampleToBudget: source '$s' needs $e " +
        s"epochs (> maxEpochs=$maxEpochs) — a budget this far past the " +
        "source's volume is usually a unit mistake") }
    val remOf = present.map { case (s, b) => s -> b % totals(s) }
      .filter(_._2 > 0)
    def litMap(m: Map[String, Long]) = m.foldLeft(lit(null).cast("long")) {
      case (acc, (s, v)) => when(col(srcCol) === s, lit(v)).otherwise(acc)
    }
    val whole = df.withColumn("__e", litMap(epochsOf.filter(_._2 > 0)))
      .where(col("__e").isNotNull)
      .withColumn("epoch", explode(sequence(lit(0L), col("__e") - 1)))
      .drop("__e")
    if (remOf.isEmpty) whole
    else {
      val partial = sampleToBudget(df, srcCol, idCol, tokenCol, remOf)
        .drop("tokens_before")
        .withColumn("epoch", litMap(epochsOf))
      whole.unionByName(partial)
    }
  }

  /** Temperature-flattened per-source budgets (the multilingual-mixture
    * policy: share_i ∝ count_i^alpha, alpha = 1/T ∈ (0, 1]): alpha = 1
    * keeps natural proportions, alpha → 0 approaches uniform, the standard
    * knob for keeping low-resource sources represented. A derived budget
    * is capped at the source's actual token count (can't sample what isn't
    * there) with the shortfall NOT redistributed — deterministic and
    * predictable beats squeezing out the last token; callers wanting
    * redistribution iterate. Policy derivation (driver arithmetic over
    * #sources entries, like QualityFilter.calibrate) — feed the result to
    * [[sampleToBudget]], which stays the gated operator. */
  def temperatureBudgets(counts: Map[String, Long], totalBudget: Long,
                         alpha: Double): Map[String, Long] = {
    require(counts.nonEmpty, "temperatureBudgets: no sources")
    require(counts.values.forall(_ > 0), "temperatureBudgets: counts must be > 0")
    require(alpha > 0 && alpha <= 1, s"temperatureBudgets: alpha in (0,1], got $alpha")
    require(totalBudget > 0, "temperatureBudgets: totalBudget must be > 0")
    val weights = counts.map { case (s, c) => s -> math.pow(c.toDouble, alpha) }
    val z = weights.values.sum
    counts.map { case (s, c) =>
      s -> math.min(math.floor(weights(s) / z * totalBudget).toLong max 1L, c)
    }
  }
}
