package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE vocabulary training — the iterative merge loop (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL'16)
  * the single-round q_bpe_merge gate is one step of.
  *
  * Scale shape: the corpus is scanned ONCE to build the distinct-pretoken
  * frequency table (size = vocabulary, not corpus — the 100 TB corpus
  * collapses to ~10^6-10^8 rows before any iteration); every merge round
  * then runs over that shrinking table: one weighted adjacent-pair count
  * (hash shuffle with map-side partial sum), a bounded `limit(1).collect()`
  * for the deterministic winner (count desc, pair asc), and a NARROW
  * fold-merge projection. The fold is a Spark `aggregate` higher-order
  * function — per-element array rebuild is fine here because it runs over
  * the short symbol arrays of the frequency table, never over the corpus;
  * no UDF anywhere. Rounds localCheckpoint with explicitly-freed block ids
  * (same lifecycle as Components' star rounds) so the plan doesn't grow
  * per merge and a long training run doesn't accumulate storage blocks.
  */
object BpeTrainer {

  /** One learned merge: adjacent symbol pair -> merged symbol, with the
    * weighted count that won its round. */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** The word-frequency table: distinct pretoken -> corpus count,
    * symbols = initial character split. */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.bpePretokens(col(textCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .select(split(col("__w"), "").as("__sym"), col("__n"))

  /** Fold-merge: rebuild the symbol array combining each adjacent
    * (a, b) into ab, left-to-right non-overlapping (standard BPE apply:
    * "aaa" with merge (a,a) -> ["aa", "a"]). Pure columns: an `aggregate`
    * fold over the array. Last-element comparison alone decides a combine
    * — symbols are non-empty (char splits of non-empty pretokens, and
    * merges of non-empty symbols), so a just-produced `ab` can never equal
    * `a` and re-trigger overlapping merges. */
  private[text] def mergeSyms(sym: Column, a: String, b: String): Column = {
    require(a.nonEmpty && b.nonEmpty, "BPE symbols are non-empty")
    foldMerge(sym, a, b, a + b)
  }

  /** The left-to-right non-overlapping fold shared by BPE and WordPiece
    * ([[WordPieceTrainer.mergeSyms]] passes a merged symbol that is not
    * the plain concatenation). Callers own the no-retrigger argument:
    * `ab` must never equal `a`. */
  private[text] def foldMerge(sym: Column, a: String, b: String,
                              ab: String): Column =
    aggregate(
      sym,
      array().cast("array<string>"),
      (out, x) => {
        val canMerge = size(out) > 0 && element_at(out, -1) === lit(a) &&
          x === lit(b)
        when(canMerge,
          concat(slice(out, lit(1), size(out) - 1), array(lit(ab))))
          .otherwise(concat(out, array(x)))
      })

  /** Train `numMerges` merges. Deterministic: winner = max by
    * (weighted count, then lexicographically smallest pair). Stops early
    * when no adjacent pair occurs at least `minCount` times. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 2L): Seq[Merge] = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    var (cur, curIds) = graft.core.CacheHygiene.trackNewRdds(sc)(
      wordTable(df, textCol).localCheckpoint(true))
    // bounded-model driver fast path (TrainerLocal): when the distinct-
    // pretoken table fits the driver, run every merge round locally —
    // zero scheduled jobs per round instead of ~4. limit(T+1) keeps the
    // decision collect bounded; oversized tables fall through to the
    // distributed loop below with only this one cheap job (a limit scan
    // of already-checkpointed blocks) added.
    val thr = TrainerLocal.arrayThreshold(df) // symbol-array rows: scaled cap
    val head = cur.limit(thr + 1).collect()
    if (head.length <= thr) {
      graft.core.CacheHygiene.freeRdds(sc, curIds)
      return trainLocal(
        head.map(r => (r.getSeq[String](0).toArray, r.getLong(1))),
        numMerges, minCount)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    var rank = 0
    while (rank < numMerges && !done) {
      // weighted adjacent-pair counts over the frequency table
      val top = cur
        // single-symbol words carry no pair (and sequence(0,-1) DESCENDS)
        .where(size(col("__sym")) >= 2)
        .select(col("__n"), col("__sym"),
          explode(sequence(lit(0), size(col("__sym")) - 2)).as("__i"))
        .select(col("__n"),
          element_at(col("__sym"), col("__i") + 1).as("__a"),
          element_at(col("__sym"), col("__i") + 2).as("__b"))
        .groupBy("__a", "__b").agg(sum(col("__n")).as("__c"))
        .where(col("__c") >= minCount)
        .orderBy(col("__c").desc, col("__a").asc, col("__b").asc)
        .limit(1).collect() // bounded: exactly one row
      if (top.isEmpty) done = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, a, b, c)
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

  /** The driver twin of the distributed merge loop: winner = max weighted
    * adjacent-pair count, ties by lexicographically smallest (a, b) in the
    * SAME order the distributed `orderBy(__c desc, __a asc, __b asc)`
    * applies — Spark's binary UTF-8 string order ([[TrainerLocal.utf8Lt]]),
    * not Java's UTF-16 compareTo. Count sums are exact Long adds in both
    * paths, so results are bit-identical (TrainerParitySpec). */
  private def trainLocal(words0: Array[(Array[String], Long)], numMerges: Int,
                         minCount: Long): Seq[Merge] = {
    var words = words0
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    var rank = 0
    while (rank < numMerges && !done) {
      val pc = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          pc.merge((syms(i), syms(i + 1)), n, _ + _)
          i += 1
        }
      }
      var bestK: (String, String) = null
      var bestC = 0L
      pc.forEach { (k, c) =>
        if (c >= minCount && (bestK == null || c > bestC || (c == bestC && {
          if (k._1 != bestK._1) TrainerLocal.utf8Lt(k._1, bestK._1)
          else TrainerLocal.utf8Lt(k._2, bestK._2)
        }))) { bestK = k; bestC = c }
      }
      if (bestK == null) done = true
      else {
        val (a, b) = bestK
        merges += Merge(rank, a, b, bestC)
        words = words.map { case (syms, n) =>
          (TrainerLocal.foldMergeLocal(syms, a, b, a + b), n)
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Apply a trained merge list to a symbol-array column in rank order
    * (how a tokenizer consumes the vocabulary). Column-only; intended for
    * bounded merge lists (each merge adds one fold pass to the plan).
    * For production vocabularies use [[encode]] — one codegen kernel
    * evaluating the whole list, plan size independent of vocab. */
  def applyMerges(sym: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(sym)((c, m) => mergeSyms(c, m.left, m.right))

  /** Full tokenizer application: text -> BPE token array under a trained
    * merge list ([[graft.functions.BpeEncode]] — pretokenize + greedy
    * lowest-rank merges in one codegen kernel; the merge table rides the
    * expression, so plan size and per-row cost are independent of
    * vocabulary size). */
  def encode(text: Column, merges: Seq[Merge]): Column =
    graft.functions.bpe_encode(text,
      merges.sortBy(_.rank).map(m => (m.left, m.right)))
}
