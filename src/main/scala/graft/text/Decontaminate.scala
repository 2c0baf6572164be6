package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination over shingle-hash relations.
  *
  * The broadcast semi-join form (q_decontaminate) is right while the
  * benchmark side is eval-set-sized. This operator is the next scale regime:
  * when the union of benchmark suites is itself too large to broadcast as a
  * hash relation, a Bloom filter over the benchmark shingle keys keeps the
  * TRAINING side scan-only — the filter is a scan predicate (no join, no
  * shuffle of the corpus), and only the surviving candidate rows (true hits
  * + the fpp sliver of false positives) proceed to an exact verification
  * join. The output is therefore EXACT — bit-identical to the semi-join
  * form; the Bloom filter only bounds how much of the corpus pays join
  * cost. A 1e9-shingle benchmark set at 3% fpp is a ~0.9 GB filter —
  * shippable where a 16-byte-per-key hash relation (~16 GB + build) is not.
  */
object Decontaminate {

  /** Exact benchmark-contamination flags over RAW TEXT relations — the
    * packaged broadcast semi-join form (the q_decontaminate shape, for
    * eval-set-sized benchmark suites; [[flagBloom]] is the next scale
    * regime). Both sides shingle to hashed word n-gram keys (xxhash64 —
    * hash-equality is shingle-equality at ~1e-12 collision odds, and the
    * key relation ships 8-byte rows, never n-word strings); the DISTINCT
    * benchmark keys broadcast, so the training corpus never shuffles —
    * only hit rows reach the aggregate. Returns one row per training doc:
    * `(idCol, n_hits, contaminated)` with n_hits = distinct benchmark
    * shingles present (0 for clean docs, exact).
    *
    * Pure lazy transformations — safe to hand to the SQL TVF surface
    * (job-free at analysis, TableFunctionsSpec contract). */
  def flag(train: DataFrame, idCol: String, textCol: String,
           bench: DataFrame, benchTextCol: String, n: Int = 3): DataFrame = {
    require(n > 0, s"decontaminate: shingle n must be positive, got $n")
    val sh = train.select(col(idCol),
        explode(TextFunctions.wordShingles(col(textCol), n)).as("__s0"))
      .select(col(idCol), xxhash64(col("__s0")).as("__s"))
    val bsh = bench.select(
        explode(TextFunctions.wordShingles(col(benchTextCol), n)).as("__s0"))
      .select(xxhash64(col("__s0")).as("__s")).distinct()
    val hits = sh.join(broadcast(bsh), Seq("__s"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("__s")).as("n_hits"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).cast("int").as("contaminated"))
  }

  /** Exact per-document benchmark-hit counts via Bloom prefilter.
    *
    * `trainSh`: (idCol, sCol) training shingle hashes (long);
    * `benchSh`: (sCol) benchmark shingle hashes, DISTINCT.
    * Returns (idCol, n_hits) for documents with >= 1 exact hit — identical
    * to `trainSh join benchSh groupBy id countDistinct` (false-positive
    * rows die in the verification join; Bloom filters have no false
    * negatives, so no true row is lost).
    *
    * Scale notes: the filter is built by Spark's distributed
    * `stat.bloomFilter` aggregate (one pass over the bench side, tree-
    * reduced) and rides the candidate scan as a codegen reference object —
    * the task binary is torrent-broadcast once per executor, the same
    * transport as an explicit broadcast variable. The verification join
    * shuffles only candidate rows; at fpp=0.03 that is ~3% of non-hit
    * corpus shingles plus the true hits. */
  def flagBloom(trainSh: DataFrame, idCol: String, sCol: String,
                benchSh: DataFrame, fpp: Double = 0.03): DataFrame = {
    // expectedNumItems wants the true cardinality: an undersized filter
    // blows past fpp and the verification join pays for it (correctness
    // unaffected). The bench side feeds THREE consumers (cardinality
    // count, filter build, verification join) — in the operator's
    // motivating regime it is large, so persist it for the duration
    // instead of recomputing its lineage per action. The count also
    // guards the empty benchmark: stat.bloomFilter over ZERO rows returns
    // null filter bytes and NPEs inside Spark's readFrom.
    val bench = benchSh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = bench.count()
    if (n == 0L) {
      bench.unpersist()
      return trainSh.select(col(idCol), lit(0L).as("n_hits")).where(lit(false))
    }
    val bf = bench.stat.bloomFilter(sCol, n, fpp)
    val cand = trainSh.where(graft.functions.bloom_contains_long(col(sCol), bf))
    val out = cand.join(bench.select(col(sCol)), Seq(sCol))
      .groupBy(col(idCol))
      .agg(countDistinct(col(sCol)).as("n_hits"))
    graft.core.CacheHygiene.unpersistAfterUse(out, Seq(bench))
  }
}
