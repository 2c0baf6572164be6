package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus organization for training runs: reproducible
  * train/validation/test SPLIT assignment and a pseudorandom SHUFFLE key
  * that fixes the global training order without a global sort.
  *
  * Both are pure integer arithmetic over the record id (Knuth's 32-bit
  * multiplicative hash), so they are exactly replayable in any SQL engine,
  * stable under retries/re-partitioning, and free of driver state. At
  * 100 TB this matters more than randomness quality: a split that depends
  * on row order or an RNG seed-per-partition silently reshuffles when the
  * file layout changes; a key-hash split never does.
  *
  * Scale shape: split assignment is a scan-local projection (no shuffle).
  * Materializing the shuffled ORDER is one range-partitioned sort by
  * `shuffle_key` (`repartitionByRange(...).sortWithinPartitions(...)` at
  * write time) — the only shuffle, and exactly the one the semantics
  * require. Re-shuffling per epoch = a different `salt`, nothing re-read.
  */
object CorpusSplit {

  /** Knuth multiplicative constant (2^32 · golden-ratio conjugate). */
  val KnuthA = 2654435761L
  val Mod = 4294967296L

  /** Largest prime with `(SeedCap - 1) * KnuthA < 2^63` (= the prime
    * floor(2^63 / KnuthA) = 3474701543): seeds pre-reduce mod this before
    * the Knuth multiply so the product can NEVER overflow a signed 64-bit
    * long — the sf10 lane's stacked ids (~1e9, and any real corpus keyed
    * above ~3.47e9) hit ANSI ARITHMETIC_OVERFLOW on the raw multiply in
    * [[NegativeSample.draw]]'s `anchor * k` seed. Because the cap sits AT
    * the overflow boundary, every seed the unguarded hash could compute at
    * all (seed * KnuthA < 2^63) reduces to itself — pre-guard hashes are
    * unchanged for the entire previously-computable range, with no band of
    * silently reassigned splits. (An earlier guard used 3037000493, the
    * largest prime <= isqrt(2^63), which needlessly re-hashed seeds in
    * [3.037e9, 3.474e9).) */
  val SeedCap = 3474701543L

  /** 32-bit multiplicative key hash in [0, 2^32) — cross-engine exact.
    * `salt` shifts the hash (epoch re-shuffle / independent draws); the
    * multiply happens AFTER the salt add so a salt change avalanches.
    * The seed pre-reduces mod [[SeedCap]] (overflow guard, above).
    *
    * Precondition (same as ShardBuild's slot key): `id + salt >= 0`.
    * Spark's pmod and plain SQL `%` agree only on non-negative operands —
    * a negative id would silently land in a different split than the SQL
    * twin assigns. */
  def keyHash(id: Column, salt: Long = 0L): Column =
    pmod(pmod(id + lit(salt), lit(SeedCap)) * lit(KnuthA), lit(Mod))

  /** Assign each row to the first split whose cumulative weight bucket
    * contains `keyHash(id)`. Weights are relative (need not sum to 1);
    * the boundary arithmetic floors to integers of 2^32 so the SQL twin
    * is bit-exact. Adds `split` (string). Deterministic in the id alone —
    * a document keeps its split across reruns, epochs and repartitions,
    * which is what keeps eval sets uncontaminated over a corpus's life. */
  def assignSplits(df: DataFrame, idCol: String,
                   splits: Seq[(String, Double)],
                   salt: Long = 0L): DataFrame = {
    require(splits.nonEmpty, "assignSplits: at least one split")
    val total = splits.map(_._2).sum
    require(total > 0, "assignSplits: weights must sum > 0")
    // cumulative integer thresholds out of 2^32 (last pinned to 2^32 so
    // FP accumulation can never leave a hash unassigned)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.floor(c / total * Mod).toLong)
    val bounds = cum.dropRight(1) :+ Mod
    val h = keyHash(col(idCol), salt)
    val expr = splits.zip(bounds).reverse.foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), hi)) => when(h < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** SQL fragment (DuckDB/ANSI) computing the same split column — the
    * oracle twin of [[assignSplits]]; kept next to the Scala so a boundary
    * change breaks both together. */
  def assignSplitsSql(idCol: String, splits: Seq[(String, Double)],
                      salt: Long = 0L): String = {
    val total = splits.map(_._2).sum
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.floor(c / total * Mod).toLong)
    val bounds = cum.dropRight(1) :+ Mod
    val h = s"((($idCol + $salt) % $SeedCap) * $KnuthA) % $Mod"
    val cases = splits.zip(bounds).map { case ((name, _), hi) =>
      s"WHEN $h < $hi THEN '${name.replace("'", "''")}'"
    }.mkString(" ")
    s"CASE $cases END"
  }

  /** Leakage-safe split assignment: documents connected by a near-duplicate
    * edge land in the SAME split. Splitting per-document leaks eval content
    * into training through near-dup pairs (the classic benchmark-inflation
    * bug: a test doc's 0.9-Jaccard twin trains); splitting per-CLUSTER
    * closes it — [[graft.dedup.Components.connectedComponents]] labels each
    * doc with its cluster representative and [[assignSplits]] hashes THAT,
    * so a whole near-dup cluster rides one hash. Edges come from any pair
    * miner (MinHash/LSH, SimHash, n-gram Jaccard, embedding cosine).
    *
    * Scale shape: components is the existing O(log n)-round star machinery;
    * the label join is one id-keyed shuffle; the split itself stays
    * scan-local arithmetic. Determinism: the component label is the cluster
    * min id — stable under retries and repartitioning — so the assignment
    * inherits [[assignSplits]]'s replayability. */
  def assignSplitsByCluster(df: DataFrame, idCol: String,
                            edges: DataFrame, srcCol: String, dstCol: String,
                            splits: Seq[(String, Double)],
                            salt: Long = 0L): DataFrame = {
    val comps = graft.dedup.Components.connectedComponents(
      df.select(col(idCol)), idCol, edges, srcCol, dstCol)
    assignSplits(df.join(comps, Seq(idCol)), "comp", splits, salt)
  }

  /** Add a deterministic `shuffle_key` column: ORDER BY it (or
    * `repartitionByRange` on it at write time) is the reproducible global
    * shuffle of the corpus. One key hash — no RNG, no zipWithIndex. */
  def withShuffleKey(df: DataFrame, idCol: String, salt: Long = 0L): DataFrame =
    df.withColumn("shuffle_key", keyHash(col(idCol), salt))

  /** Materialize the shuffled training order: range-partition on the
    * shuffle key (so file f's keys all precede file f+1's — reading files
    * in name order IS the global shuffled order) and sort within each
    * partition. One range shuffle; numFiles controls parallelism and file
    * granularity, independent of cluster size. */
  def writeShuffled(df: DataFrame, idCol: String, path: String,
                    numFiles: Int, salt: Long = 0L): Unit = {
    require(numFiles > 0, "writeShuffled: numFiles must be positive")
    withShuffleKey(df, idCol, salt)
      .repartitionByRange(numFiles, col("shuffle_key"), col(idCol))
      .sortWithinPartitions(col("shuffle_key"), col(idCol))
      .write.mode("overwrite").parquet(path)
  }
}
