package graft.text

import org.apache.spark.sql.DataFrame

/** Bounded-model driver fast path shared by the tokenizer trainers
  * ([[BpeTrainer]], [[WordPieceTrainer]], [[UnigramTrainer]]).
  *
  * Every trainer's iterative state is the DISTINCT-PRETOKEN frequency
  * table — vocabulary-sized, not corpus-sized (the scale collapse each
  * trainer's scaladoc documents). When that table is small enough to hold
  * on the driver, running the merge/EM rounds as local loops replaces
  * ~4 scheduled jobs PER ROUND (pair count + winner collect + checkpoint +
  * block frees) with zero, the same bounded-collect trade as
  * [[graft.dedup.Components.DriverEdgeThreshold]] and SpatialJoin's
  * knnBroadcastThreshold. Corpora whose word tables exceed the threshold
  * take the distributed rounds automatically — the fast path is guarded by
  * a `limit(threshold+1).collect()` so the decision itself is
  * bounded-memory. Local loops replicate the distributed semantics
  * bit-for-bit (integer count sums are order-independent; winner
  * tie-breaks use the same string order as the Spark plan they replace —
  * see each call site); TrainerParitySpec pins local == distributed on
  * corpus slices for all three trainers.
  */
private[text] object TrainerLocal {

  /** Word-table rows at or below this collect to the driver, for
    * STRING-shaped rows ((word, count) — ~100-300 B collected, so 1 M
    * rows ≈ 100-300 MB of driver heap, the [[graft.dedup.Components]]
    * sizing argument). Overridable per session for A/B and scale tests. */
  val DriverWordThreshold: Int = 1000000

  /** BPE/WordPiece rows are symbol ARRAYS — one boxed String PER
    * CHARACTER plus array overhead, so a 10-char word collects at
    * ~500-700 B (10 × ~48 B boxed 1-char strings + the array + count),
    * 2-4× the string-shaped row (round-16 advice: the flat 1 M-row cap
    * could overshoot the documented budget several-fold). Array-shaped
    * tables therefore use threshold/4: ~250 k rows ≈ 125-175 MB at the
    * default, the same byte budget as the string shape. */
  val ArrayRowDivisor: Int = 4

  private def confThreshold(df: DataFrame): Int =
    df.sparkSession.conf.getOption("spark.graft.trainer.driverWords")
      .map(_.toInt).getOrElse(DriverWordThreshold)

  /** Fast-path row cap for (word: String, count) tables (Unigram). */
  def threshold(df: DataFrame): Int = confThreshold(df)

  /** Fast-path row cap for (symbols: Array[String], count) tables
    * (BPE/WordPiece) — the conf value scaled down to the same byte
    * budget. */
  def arrayThreshold(df: DataFrame): Int = confThreshold(df) / ArrayRowDivisor

  /** Spark SQL's binary string order (UTF8String comparison = unsigned
    * UTF-8 byte order) — the order `orderBy(col.asc)` applies. Java's
    * String.compareTo orders UTF-16 units instead, which disagrees for
    * supplementary-plane characters (same pitfall
    * [[graft.dedup.Components]] documents for its union-find labels). */
  def utf8Lt(a: String, b: String): Boolean = {
    val xb = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val yb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(xb.length, yb.length)
    var i = 0
    while (i < n) {
      val d = (xb(i) & 0xff) - (yb(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    xb.length < yb.length
  }

  /** The local twin of [[BpeTrainer.foldMerge]]: left-to-right
    * non-overlapping rebuild combining each adjacent (a, b) into `ab`.
    * Same no-retrigger premise as the Column fold (callers guarantee
    * `ab != a`). */
  def foldMergeLocal(syms: Array[String], a: String, b: String,
                     ab: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      val x = syms(i)
      if (out.nonEmpty && out.last == a && x == b) out(out.length - 1) = ab
      else out += x
      i += 1
    }
    out.toArray
  }
}
