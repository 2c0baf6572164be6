package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece vocabulary training — BPE's merge loop with the
  * likelihood-scored pair selection (Schuster & Nakajima, "Japanese and
  * Korean voice search", ICASSP'12; the scoring used by BERT's tokenizer):
  * each round merges the adjacent symbol pair maximizing
  * `score(a,b) = count(ab) / (count(a) * count(b))` — the pair whose
  * merge most increases the unigram-LM corpus likelihood — instead of
  * BPE's raw max-count. Continuation symbols carry the standard `##`
  * prefix; merging (a, ##b) yields `a##b`-stripped = `ab`, merging
  * (##a, ##b) yields `##ab`.
  *
  * Scale shape (same as [[BpeTrainer]]): one corpus scan builds the
  * distinct-pretoken frequency table; every round then runs over that
  * shrinking table — one weighted pair count, one weighted symbol count,
  * and a winner selection that is TWO bounded aggregates, never a sort of
  * the pair table by a floating-point score: a double-precision max
  * preselects the pairs within 1e-9 relative of the top score (a provable
  * superset of the true argmax — FP division error is ~1 ulp), and the
  * handful of survivors is compared EXACTLY on the driver by cross-
  * multiplied integer rationals (cp1·ca2·cb2 vs cp2·ca1·cb1, BigInt).
  * Deterministic: ties by lexicographically smallest (a, b). The DuckDB
  * oracle replays the same selection with HUGEINT floor-scaled scores —
  * floor(cp·2^100/(ca·cb)) preserves the strict order of any two distinct
  * rationals whose denominators are each < 2^50 (proof in qWordpieceTrainSql's
  * comment), so both engines pick identical winners.
  */
object WordPieceTrainer {

  /** One learned merge with the counts that scored it. */
  final case class WpMerge(rank: Int, left: String, right: String,
                           pairCount: Long, leftCount: Long, rightCount: Long)

  /** Continuation marker. The corpus contract (asserted by the caller's
    * pretokenizer, checked in WordPieceTrainerSpec): pretokens never start
    * with '#', so a leading `##` unambiguously marks a continuation. */
  val Cont = "##"

  /** Distinct-pretoken frequency table with WordPiece initial symbols:
    * first character bare, every later character `##`-prefixed. */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.bpePretokens(col(textCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .select(
        transform(split(col("__w"), ""),
          (c, i) => when(i === 0, c).otherwise(concat(lit(Cont), c))).as("__sym"),
        col("__n"))

  private[text] def merged(a: String, b: String): String =
    a + b.stripPrefix(Cont)

  /** Left-to-right non-overlapping fold-merge of adjacent (a, b) into
    * `merged(a, b)` — [[BpeTrainer.mergeSyms]] generalized to a merged
    * symbol that is not the plain concatenation. The no-retrigger argument
    * holds unchanged: `merged` is strictly longer than `a` (stripPrefix of
    * a non-`##` remainder is non-empty — symbols are chars or merges of
    * chars under the `##` convention), so a just-produced merge can never
    * equal `a` and re-match overlapping occurrences. */
  private[text] def mergeSyms(sym: Column, a: String, b: String): Column = {
    require(a.nonEmpty && b.stripPrefix(Cont).nonEmpty,
      "WordPiece symbols are non-empty beyond the continuation marker")
    BpeTrainer.foldMerge(sym, a, b, merged(a, b))
  }

  /** Train `numMerges` merges. Stops early when no adjacent pair occurs at
    * least `minCount` times. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 2L): Seq[WpMerge] = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    var (cur, curIds) = graft.core.CacheHygiene.trackNewRdds(sc)(
      wordTable(df, textCol).localCheckpoint(true))
    // bounded-model driver fast path — see [[TrainerLocal]] and the
    // identical guard in BpeTrainer.train
    val thr = TrainerLocal.arrayThreshold(df) // symbol-array rows: scaled cap
    val head = cur.limit(thr + 1).collect()
    if (head.length <= thr) {
      graft.core.CacheHygiene.freeRdds(sc, curIds)
      return trainLocal(
        head.map(r => (r.getSeq[String](0).toArray, r.getLong(1))),
        numMerges, minCount)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[WpMerge]
    var done = false
    var rank = 0
    while (rank < numMerges && !done) {
      // weighted symbol counts (denominators) + weighted pair counts, both
      // over the frequency table — the pair table joins its endpoints'
      // counts so scoring is a projection, not another shuffle per side
      val symCounts = cur
        .select(explode(col("__sym")).as("__s"), col("__n"))
        .groupBy("__s").agg(sum(col("__n")).as("__sc"))
      val pairs = cur
        .where(size(col("__sym")) >= 2)
        .select(col("__n"), col("__sym"),
          explode(sequence(lit(0), size(col("__sym")) - 2)).as("__i"))
        .select(col("__n"),
          element_at(col("__sym"), col("__i") + 1).as("__a"),
          element_at(col("__sym"), col("__i") + 2).as("__b"))
        .groupBy("__a", "__b").agg(sum(col("__n")).as("__c"))
        .where(col("__c") >= minCount)
        .join(symCounts.select(col("__s").as("__a"), col("__sc").as("__ca")), "__a")
        .join(symCounts.select(col("__s").as("__b"), col("__sc").as("__cb")), "__b")
        .select(col("__a"), col("__b"), col("__c"), col("__ca"), col("__cb"),
          (col("__c").cast("double") /
            (col("__ca").cast("double") * col("__cb").cast("double")))
            .as("__score"))
      val (scored, scoredIds) = graft.core.CacheHygiene.trackNewRdds(sc)(
        pairs.localCheckpoint(true)) // two consumers below; count once
      val mx = scored.agg(max(col("__score"))).head()
      if (mx.isNullAt(0)) { done = true
        graft.core.CacheHygiene.freeRdds(sc, scoredIds) }
      else {
        // FP preselect (superset of the exact argmax), exact pick on driver
        val cand = scored
          .where(col("__score") >= mx.getDouble(0) * (1.0 - 1e-9))
          .select("__a", "__b", "__c", "__ca", "__cb")
          .collect() // bounded: pairs within 1e-9 of the top score
          .map(r => (r.getString(0), r.getString(1), r.getLong(2),
            r.getLong(3), r.getLong(4)))
        graft.core.CacheHygiene.freeRdds(sc, scoredIds)
        val best = cand.reduceLeft { (x, y) =>
          val lhs = BigInt(x._3) * BigInt(y._4) * BigInt(y._5)
          val rhs = BigInt(y._3) * BigInt(x._4) * BigInt(x._5)
          val c = lhs.compare(rhs)
          if (c > 0) x else if (c < 0) y
          else {
            val t = if (x._1 != y._1) x._1.compareTo(y._1)
                    else x._2.compareTo(y._2)
            if (t <= 0) x else y
          }
        }
        val (a, b, cp, ca, cb) = best
        merges += WpMerge(rank, a, b, cp, ca, cb)
        val lastIds = curIds
        val (next, nextIds) = graft.core.CacheHygiene.trackNewRdds(sc)(
          cur.select(mergeSyms(col("__sym"), a, b).as("__sym"), col("__n"))
            .localCheckpoint(true))
        cur = next
        curIds = nextIds
        graft.core.CacheHygiene.freeRdds(sc, lastIds)
        rank += 1
      }
    }
    graft.core.CacheHygiene.freeRdds(sc, curIds)
    merges.toSeq
  }

  /** The driver twin of the distributed round loop: the winner is the
    * exact-rational argmax of cp/(ca·cb) over every pair with cp >=
    * minCount (cross-multiplied BigInt compare — the same arithmetic the
    * distributed path applies to its FP-preselected superset, so the pick
    * is identical), ties by Java compareTo on (a, b) — matching the
    * distributed `reduceLeft`'s tie branch exactly. Long count sums are
    * order-independent in both paths (TrainerParitySpec pins parity). */
  private def trainLocal(words0: Array[(Array[String], Long)], numMerges: Int,
                         minCount: Long): Seq[WpMerge] = {
    var words = words0
    val merges = scala.collection.mutable.ArrayBuffer.empty[WpMerge]
    var done = false
    var rank = 0
    while (rank < numMerges && !done) {
      val sc = new java.util.HashMap[String, Long]()
      val pc = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length) {
          sc.merge(syms(i), n, _ + _)
          if (i < syms.length - 1) pc.merge((syms(i), syms(i + 1)), n, _ + _)
          i += 1
        }
      }
      var best: (String, String, Long, Long, Long) = null
      pc.forEach { (k, cp) =>
        if (cp >= minCount) {
          val cand = (k._1, k._2, cp, sc.get(k._1), sc.get(k._2))
          if (best == null) best = cand
          else {
            val lhs = BigInt(cand._3) * BigInt(best._4) * BigInt(best._5)
            val rhs = BigInt(best._3) * BigInt(cand._4) * BigInt(cand._5)
            val c = lhs.compare(rhs)
            if (c > 0 || (c == 0 && {
              val t = if (cand._1 != best._1) cand._1.compareTo(best._1)
                      else cand._2.compareTo(best._2)
              t < 0
            })) best = cand
          }
        }
      }
      if (best == null) done = true
      else {
        val (a, b, cp, ca, cb) = best
        merges += WpMerge(rank, a, b, cp, ca, cb)
        words = words.map { case (syms, n) =>
          (TrainerLocal.foldMergeLocal(syms, a, b, merged(a, b)), n)
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** The vocab a trained merge list induces over an alphabet — feed to
    * [[graft.functions.wordpiece_encode]] to close the train→encode loop. */
  def vocab(alphabet: Seq[String], merges: Seq[WpMerge]): Seq[String] =
    (alphabet ++ merges.sortBy(_.rank).map(m => merged(m.left, m.right))).distinct
}
