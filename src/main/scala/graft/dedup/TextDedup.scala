package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.simhash64
import graft.text.TextFunctions

/** Near-duplicate detection over a document table — the training-data-
  * pipeline operators (exact n-gram Jaccard, MinHash+LSH, SimHash).
  *
  * Scale design: every stage is a shuffle on a key with bounded fan-out
  * (shingle, band bucket, pair), with map-side partial aggregation; no
  * driver-side collection anywhere. At 100 TB the shingle join is the
  * hotspot — `maxShingleDocFreq` drops degenerate high-frequency shingles
  * (stopword runs) the way production dedup pipelines do; the gated oracle
  * query runs uncapped for bit-parity with SQL.
  */
object TextDedup {

  /** (id, shingle) pairs, distinct per document. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol),
      explode(TextFunctions.wordShingles(col(textCol), n)).as("shingle"))

  /** See [[graft.core.Parallelism.fanOut]]. */
  private def fanOut(df: DataFrame): DataFrame =
    graft.core.Parallelism.fanOut(df)

  /** Exact word-n-gram Jaccard similar pairs (idA < idB, jaccard >= t).
    * jaccard = |A∩B| / (|A| + |B| - |A∩B|) over distinct shingle sets —
    * integer counts, single division: FP-exact.
    *
    * Shingles are hashed to 64-bit keys immediately (xxhash64): the pair
    * join shuffles 16-byte rows instead of n-word strings, and the equality
    * probe is a long compare. Collisions (~1e-12 at 1e6 distinct shingles)
    * would only matter if two shingles of one document collide. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        maxShingleDocFreq: Option[Int] = None): DataFrame = {
    val sh0 = fanOut(df).select(col(idCol),
      explode(transform(TextFunctions.wordShingles(col(textCol), n),
        s => xxhash64(s))).as("shash"))
    keyJaccardPairs(sh0, idCol, "shash", threshold, maxShingleDocFreq)
  }

  /** Word-n-gram near-containment pairs (the quotation/excerpt detector —
    * see [[keyContainmentPairs]]). */
  def ngramContainmentPairs(df: DataFrame, idCol: String, textCol: String,
                            n: Int, threshold: Double,
                            maxShingleDocFreq: Option[Int] = None): DataFrame = {
    val sh0 = fanOut(df).select(col(idCol),
      explode(transform(TextFunctions.wordShingles(col(textCol), n),
        s => xxhash64(s))).as("shash"))
    keyContainmentPairs(sh0, idCol, "shash", threshold, maxShingleDocFreq)
  }

  /** Exact Jaccard similar pairs over an arbitrary per-id KEY-SET relation
    * (idA < idB, jaccard >= t) — the engine under [[ngramJaccardPairs]],
    * shared by binary chunk dedup ([[BinaryDedup]]) and container-level
    * video dedup. Caller contract: (id, key) rows are DISTINCT (the counts
    * below are set sizes). Same scale shape as the shingle form: one
    * persist of the 16-byte key rows feeding three consumers, optional
    * hot-key cap, pinned shuffled hash join. */
  def keyJaccardPairs(keys0: DataFrame, idCol: String, keyCol: String,
                      threshold: Double,
                      maxKeyDocFreq: Option[Int] = None): DataFrame =
    keyOverlapPairs(keys0, idCol, keyCol, threshold, maxKeyDocFreq,
      containment = false)

  /** Near-CONTAINMENT pairs: shared / min(|A|, |B|) >= t — the quotation/
    * subset relation Jaccard structurally misses (a short document fully
    * embedded in a long one has jaccard ≈ |A|/|B| but containment 1.0).
    * Output column is `containment`; same engine, same scale shape. */
  def keyContainmentPairs(keys0: DataFrame, idCol: String, keyCol: String,
                          threshold: Double,
                          maxKeyDocFreq: Option[Int] = None): DataFrame =
    keyOverlapPairs(keys0, idCol, keyCol, threshold, maxKeyDocFreq,
      containment = true)

  private def keyOverlapPairs(keys0: DataFrame, idCol: String, keyCol: String,
                              threshold: Double, maxKeyDocFreq: Option[Int],
                              containment: Boolean): DataFrame = {
    val sh0 = keys0.select(col(idCol), col(keyCol).as("shash"))
    val sh = (maxKeyDocFreq match {
      case Some(cap) =>
        val hot = sh0.groupBy("shash").count().where(col("count") > cap)
          .select("shash")
        sh0.join(hot, Seq("shash"), "left_anti")
      case None => sh0
      // consumed 3x (per-doc counts + both pair-join sides): persist the
      // 16-byte rows once instead of re-shingling the corpus three times
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize BEFORE wiring the consumers: a lazy persist read by
    // concurrent stages of one job races its own cache population — all
    // four consumer stages re-shingled the corpus in parallel (measured:
    // 4 full scans at sf0.1, none hitting cache). One count() barrier
    // makes every consumer a cache read.
    sh.count()
    val cnt = sh.groupBy(col(idCol)).agg(count(lit(1)).as("nsh"))
    val a = sh.select(col(idCol).as("ida"), col("shash"))
    val b = sh.select(col(idCol).as("idb"), col("shash"))
    // both sides are the same relation: broadcasting one (AQE's pick at
    // small SF) rebuilds the shingle pipeline on the driver and is wrong at
    // scale anyway — pin a shuffled hash join
    val shared = a.join(b.hint("shuffle_hash"), "shash")
      .where(col("ida") < col("idb"))
      .groupBy("ida", "idb").agg(count(lit(1)).as("shared"))
    val measureName = if (containment) "containment" else "jaccard"
    // both measures are one division of exact integer counts — FP-exact
    // and replayable bit-for-bit by any SQL engine
    val measure =
      if (containment)
        col("shared").cast("double") / least(col("na"), col("nb")).cast("double")
      else
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")).cast("double")
    val out = shared
      .join(cnt.select(col(idCol).as("ida"), col("nsh").as("na")), "ida")
      .join(cnt.select(col(idCol).as("idb"), col("nsh").as("nb")), "idb")
      .withColumn(measureName, measure)
      .where(col(measureName) >= threshold)
      .select(col("ida"), col("idb"), col(measureName))
    // the shingle cache pays for its three consumers within one action,
    // then frees — no block accumulation across a long-lived session
    graft.core.CacheHygiene.unpersistAfterUse(out, Seq(sh))
  }

  /** splitmix64 — deterministic, dependency-free constant derivation for
    * the affine hash family (public-domain construction). */
  private def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature: for each of `numHashes` hash functions, the min
    * hash over the document's shingles. Formulated as explode +
    * hash-aggregate: one row per shingle, 64 codegen'd min buffers per id.
    * The explode never crosses the network — groupBy does map-side partial
    * aggregation, so only one 64-long buffer per id per partition is
    * shuffled; the exploded rows themselves stay pipelined inside the scan
    * stage. The family is affine over the xxhash64'd shingle key:
    * h_i(x) = a_i*x + b_i (64-bit wrap, a_i odd — a bijection on Z/2^64),
    * one mul+add per seed instead of a full seeded-hash avalanche — the
    * seeded-xxhash64 formulation burned 26.6 s of CPU at sf0.1 (64
    * avalanches per shingle row), the affine family does the same
    * min-wise job for the price of the aggregation itself. A
    * higher-order-function formulation (array_min over transform per seed)
    * looks shuffle-free but allocates a boxed array per seed per row —
    * measured 22-44 s vs ~2 s at sf0.1 — HOF lambdas don't participate in
    * whole-stage codegen's primitive loops, the aggregate does. Duplicate
    * ids combine by element-wise min (MinHash distributes over set union);
    * documents with no shingles produce no row (explode of an empty
    * array). */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int, numHashes: Int): DataFrame = {
    val hashed = fanOut(df)
      .select(col(idCol),
        explode(TextFunctions.wordShingles(col(textCol), n)).as("__s"))
      .select(col(idCol), xxhash64(col("__s")).as("__sh"))
    val mins = (0 until numHashes).map { i =>
      val a = splitmix64(2L * i) | 1L
      val b = splitmix64(2L * i + 1)
      min(graft.functions.affine_hash(col("__sh"), a, b)).as(s"__m$i")
    }
    hashed.groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(i => col(s"__m$i")): _*).as("minhash"))
  }

  /** MinHash + banded LSH candidate pairs with the signature-estimated
    * Jaccard (fraction of agreeing minhashes). `bands` must divide
    * `numHashes`; two documents collide iff some band of their signatures
    * is identical — the standard S-curve candidate generator. */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 64, bands: Int = 16,
                      estThreshold: Double = 0.0): DataFrame = {
    // signatures are ~#docs x numHashes longs — tiny next to the corpus;
    // persist so the self-join's two sides don't recompute the shingle+agg
    // pipeline (MLlib's MinHashLSH caches the same way)
    val sig = minHashSignatures(df, idCol, textCol, n, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialization barrier — same race as keyOverlapPairs documents:
    // the banded self-join's two sides are CONCURRENT stages of one job,
    // and a lazy persist read by both makes each recompute the full
    // shingle+64-minhash aggregation instead of hitting cache (measured:
    // the two band-explode stages burned 8.9s + 4.0s of CPU at sf0.1 —
    // the signature pipeline run twice)
    sig.count()
    val out = lshPairsFromSignatures(sig, idCol, numHashes, bands, estThreshold)
    graft.core.CacheHygiene.unpersistAfterUse(out, Seq(sig))
  }

  /** The banding/join/filter stage downstream of [[minHashSignatures]] —
    * pure relational algebra over a `(idCol, minhash: array<long>)` relation,
    * so a checkpointed signature table can be oracled in plain SQL (band =
    * signature slice equality; est = agreeing-position count / numHashes,
    * an exact power-of-two division). */
  def lshPairsFromSignatures(sig: DataFrame, idCol: String, numHashes: Int,
                             bands: Int, estThreshold: Double): DataFrame = {
    val banded = bandKeys(sig, idCol, numHashes, bands)
    val a = banded.select(col(idCol).as("ida"), col("minhash").as("ma"),
      col("band"), col("key"))
    val b = banded.select(col(idCol).as("idb"), col("minhash").as("mb"),
      col("band"), col("key"))
    // estimate BEFORE the pair dedup so the dedup shuffle carries 3 scalars
    // per row instead of two 64-long signatures
    a.join(b.hint("shuffle_hash"), Seq("band", "key"))
      .where(col("ida") < col("idb"))
      .withColumn("est_jaccard",
        graft.functions.sig_agreement(col("ma"), col("mb"))
          .cast("double") / lit(numHashes.toDouble))
      .where(col("est_jaccard") >= estThreshold)
      .select(col("ida"), col("idb"), col("est_jaccard"))
      .dropDuplicates("ida", "idb")
  }

  /** INCREMENTAL near-dup: candidates between a NEW batch's signatures and
    * a STORED corpus signature table (plus the new batch against itself) —
    * the corpus-refresh shape: the stored side is banded once per refresh
    * and joined by band bucket, so the check scales with |new| × collision
    * rate, never with |corpus|; the corpus itself is NEVER re-shingled
    * (signatures persist across refreshes — that is the point of storing
    * them). Output: (new_id, other_id, est_jaccard, other_is_new). */
  def lshPairsIncremental(newSig: DataFrame, storedSig: DataFrame,
                          idCol: String, numHashes: Int, bands: Int,
                          estThreshold: Double): DataFrame = {
    // the banded new batch feeds THREE join sides (vs stored once, vs
    // itself twice) — persist so a caller handing in raw signature plans
    // doesn't recompute the shingle+aggregate pipeline per side (the same
    // rationale as minHashLshPairs' signature persist), with the same
    // materialization barrier so concurrent consumer stages of one action
    // don't race the cache population
    val n = bandKeys(newSig, idCol, numHashes, bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    n.count()
    val s = bandKeys(storedSig, idCol, numHashes, bands)
    val newVsStored = n
      .select(col(idCol).as("new_id"), col("minhash").as("ma"), col("band"), col("key"))
      .join(s.select(col(idCol).as("other_id"), col("minhash").as("mb"),
        col("band"), col("key")).hint("shuffle_hash"), Seq("band", "key"))
      .withColumn("other_is_new", lit(false))
    val newVsNew = n
      .select(col(idCol).as("new_id"), col("minhash").as("ma"), col("band"), col("key"))
      .join(n.select(col(idCol).as("other_id"), col("minhash").as("mb"),
        col("band"), col("key")).hint("shuffle_hash"), Seq("band", "key"))
      .where(col("new_id") < col("other_id"))
      .withColumn("other_is_new", lit(true))
    val out = newVsStored.unionByName(newVsNew)
      .withColumn("est_jaccard",
        graft.functions.sig_agreement(col("ma"), col("mb"))
          .cast("double") / lit(numHashes.toDouble))
      .where(col("est_jaccard") >= estThreshold)
      .select(col("new_id"), col("other_id"), col("est_jaccard"), col("other_is_new"))
      .dropDuplicates("new_id", "other_id", "other_is_new")
    graft.core.CacheHygiene.unpersistAfterUse(out, Seq(n))
  }

  /** Shared banding: one row per (id, band) with the band's slice-hash
    * key — THE band-bucket definition for both the batch self-join and the
    * incremental path (one derivation, one place to change). */
  private def bandKeys(sig: DataFrame, idCol: String, numHashes: Int,
                       bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val bandStructs = array((0 until bands).map { bnd =>
      struct(lit(bnd).as("band"),
        xxhash64(slice(col("minhash"), bnd * rows + 1, rows)).as("key"))
    }: _*)
    sig.select(col(idCol), col("minhash"), explode(bandStructs).as("b"))
      .select(col(idCol), col("minhash"),
        col("b.band").as("band"), col("b.key").as("key"))
  }

  /** C4-style cross-corpus LINE-level dedup: every distinct line keeps
    * exactly its FIRST occurrence — (id, position) lexicographic minimum,
    * the reference's keep-the-first uniq semantics
    * (duplicate_remover.cpp:45-63) at line granularity — and documents
    * reassemble from their surviving lines in original order. Documents
    * whose every line loses (including single-empty-line docs beaten to
    * the empty line) drop from the output, as C4 does.
    *
    * Scale shape: explode → one hash shuffle on the line (the partial
    * min(struct) aggregate absorbs hot lines map-side — the empty line is
    * the hottest key in any web corpus) → one shuffle back on the id for
    * reassembly. No driver state, no windows over a global order. */
  def dedupLinesAcross(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val keep = lines
      .groupBy(col("__line"))
      .agg(min(struct(col(idCol), col("__pos"))).as("__k"))
      .select(col("__k").getField(idCol).as(idCol),
        col("__k.__pos").as("__pos"), col("__line"))
    keep.groupBy(col(idCol))
      .agg(concat_ws("\n", transform(
        array_sort(collect_list(struct(col("__pos"), col("__line")))),
        s => s.getField("__line"))).as(textCol))
  }

  /** Duplicated-SPAN removal (exact substring dedup at word-k-gram
    * granularity — the Lee et al. 2022 "Deduplicating Training Data Makes
    * Language Models Better" dedup family, anchored on k-grams instead of a
    * suffix array, which is the standard distributed approximation): any
    * k-token span whose exact text occurs more than once in the corpus
    * (across documents OR repeated inside one document) keeps only its
    * FIRST occurrence — lexicographic minimum (id, token position), the
    * same keep-the-first rule as [[dedupLinesAcross]] — and every other
    * occurrence's tokens are cut from their documents. Documents reassemble
    * from surviving tokens in original order; documents whose every token
    * is covered by losing spans drop from the output. Tokenization is the
    * pinned single-space split (empty tokens kept), so spans and token
    * positions agree exactly with `split(text, ' ')` and the SQL oracle.
    * `keepFirst = false` switches to the scrub-entirely policy: every
    * occurrence of a duplicated span is cut, first included.
    *
    * Scale shape — every stage is linear in the token stream with bounded
    * fan-out: (1) one hash shuffle on the gram key for the winner/count
    * aggregate (min(struct) and count both partial-aggregate, so hot grams
    * — stop-phrase runs — are absorbed map-side); (2) one gram-keyed hash
    * join of occurrences against the per-gram winner row (1-row build side
    * per key: data volume, never a cross product; AQE splits skewed
    * buckets); (3) a k-wide positional explode of losing occurrences (fan
    * out exactly k, distinct-ed by (id, pos)); (4) an anti-join on the
    * doc-unique (id, pos) key; (5) per-document reassembly bounded by
    * document length. The gram relation feeds two consumers (the aggregate
    * and the join probe), so it persists for the duration of one action —
    * same lifecycle as [[ngramJaccardPairs]]'s shingle cache. */
  def dedupSpansAcross(df: DataFrame, idCol: String, textCol: String,
                       k: Int, keepFirst: Boolean = true): DataFrame = {
    require(k >= 1, s"span gram width must be >= 1, got $k")
    // gram index i = start token position of tokens[i..i+k-1] (the kernel
    // emits one shingle per start position, in order)
    // 128-bit effective gram key (two independently-seeded xxhash64's —
    // prepending a constant re-chains the hash): at the operator's target
    // scale (~1e12 grams) a SINGLE 64-bit key would see thousands of
    // birthday collisions, each silently cutting an unrelated span;
    // 128 bits puts the expected count at ~1e-14.
    val grams = fanOut(df).select(col(idCol),
        posexplode(TextFunctions.wordShinglesAll(col(textCol), k))
          .as(Seq("__pos", "__g")))
      .select(col(idCol), col("__pos"), xxhash64(col("__g")).as("__gh"),
        xxhash64(lit(1), col("__g")).as("__gh2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    grams.count() // materialization barrier — see ngramJaccardPairs
    val winners = grams.groupBy(col("__gh"), col("__gh2"))
      .agg(min(struct(col(idCol), col("__pos"))).as("__w"),
        count(lit(1)).as("__c"))
      .where(col("__c") >= 2)
    // per-document LOSER START lists (bounded by the doc's own token
    // count): reassembly never explodes the corpus into token rows — the
    // RemoveCoveredTokens kernel cuts spans in one pass over the text. The
    // first formulation (posexplode all tokens, anti-join covered (id,pos),
    // collect_list back) moved the whole token stream through three
    // shuffles: 113 s / 1.4 GB shuffle at the 500k-doc rehearsal.
    // keepFirst=false removes EVERY occurrence of a duplicated span (the
    // scrub-entirely policy some pipelines prefer over keep-one)
    val losing = grams.join(winners.hint("shuffle_hash"), Seq("__gh", "__gh2"))
    val spans = (if (keepFirst)
        losing.where(!(col(idCol) === col("__w").getField(idCol) &&
          col("__pos") === col("__w.__pos")))
      else losing)
      .groupBy(col(idCol))
      .agg(collect_list(col("__pos").cast("int")).as("__starts"))
    val out = df.select(col(idCol), col(textCol))
      .join(spans, Seq(idCol), "left")
      .select(col(idCol), graft.functions.remove_covered_tokens(
        col(textCol),
        coalesce(col("__starts"), array().cast("array<int>")), k).as(textCol))
      .where(col(textCol).isNotNull)
    graft.core.CacheHygiene.unpersistAfterUse(out, Seq(grams))
  }

  /** INCREMENTAL line-level dedup (corpus refresh — the line-dedup twin of
    * [[lshPairsIncremental]]): dedup a NEW document batch against a STORED
    * line-key table (xxhash64 of every line that already won first
    * occurrence in prior batches) plus itself. A new line survives iff it
    * wins first occurrence within the batch AND its key is absent from the
    * store; documents reassemble from surviving lines; docs whose every
    * line loses drop. The stored corpus is NEVER re-read — that is the
    * operator's contract; callers append the returned survivors' keys
    * ([[lineKeys]] over the output) to the store for the next refresh.
    *
    * Scale shape: one hash shuffle on the line for the batch-internal
    * winner aggregate (hot lines absorbed map-side), one key-shuffled
    * anti-join against the store (batch-sized probe side — the store
    * shuffles once per refresh, which is the point), one shuffle back on
    * the id for reassembly. */
  def dedupLinesIncremental(newDf: DataFrame, idCol: String, textCol: String,
                            storedKeys: DataFrame): DataFrame = {
    // the store is the [[lineKeys]] 128-bit (lkey, lkey2) relation — a
    // 64-bit key alone would silently DROP a distinct new line on any
    // collision with a stored key (unrecoverable: the stored corpus is
    // never re-read). Single-column stores from older runs still work,
    // at the documented 64-bit collision-loss bound.
    val lines = newDf.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val kc = storedKeys.columns
    val store =
      if (kc.length >= 2)
        storedKeys.select(col(kc(0)).as("__lk"), col(kc(1)).as("__lk2"))
      else storedKeys.select(col(kc(0)).as("__lk"),
        lit(null).cast("long").as("__lk2"))
    val joinCond =
      if (kc.length >= 2)
        xxhash64(col("__line")) === col("__lk") &&
          xxhash64(lit(1), col("__line")) === col("__lk2")
      else xxhash64(col("__line")) === col("__lk")
    val keep = lines
      .groupBy(col("__line"))
      .agg(min(struct(col(idCol), col("__pos"))).as("__k"))
      .select(col("__k").getField(idCol).as(idCol),
        col("__k.__pos").as("__pos"), col("__line"))
      .join(store, joinCond, "left_anti")
    keep.groupBy(col(idCol))
      .agg(concat_ws("\n", transform(
        array_sort(collect_list(struct(col("__pos"), col("__line")))),
        s => s.getField("__line"))).as(textCol))
  }

  /** (lkey, lkey2) relation of a document batch's 128-bit line keys — what
    * a refresh appends to the stored table after
    * [[dedupLinesIncremental]]. */
  def lineKeys(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), "\n")).as("__line"))
      .select(xxhash64(col("__line")).as("lkey"),
        xxhash64(lit(1), col("__line")).as("lkey2")).distinct()

  /** SimHash near-duplicate pairs: 16-bit band blocking over the 64-bit
    * fingerprint (any identical quarter => candidate; catches all pairs with
    * Hamming distance <= 3 exactly, most below ~16), then exact Hamming
    * filter via bit_count(xor). */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame =
    simHashPairsFromFingerprints(
      simHashFingerprints(df, idCol, textCol), idCol, maxHamming)

  /** `(idCol, sh: long)` SimHash fingerprint relation. */
  def simHashFingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    fanOut(df).select(col(idCol), simhash64(col(textCol)).as("sh"))

  /** Band-block + exact-Hamming stage downstream of the fingerprints —
    * pure integer relational algebra (shift/mask band keys, bit_count(xor)
    * Hamming), so a checkpointed fingerprint table oracles in plain SQL. */
  def simHashPairsFromFingerprints(sig: DataFrame, idCol: String,
                                   maxHamming: Int): DataFrame = {
    val bandStructs = array((0 until 4).map { bnd =>
      struct(lit(bnd).as("band"),
        shiftrightunsigned(col("sh"), bnd * 16).bitwiseAND(lit(0xffffL)).as("key"))
    }: _*)
    val banded = sig.select(col(idCol), col("sh"), explode(bandStructs).as("b"))
      .select(col(idCol), col("sh"), col("b.band").as("band"), col("b.key").as("key"))
    val a = banded.select(col(idCol).as("ida"), col("sh").as("sha"), col("band"), col("key"))
    val b = banded.select(col(idCol).as("idb"), col("sh").as("shb"), col("band"), col("key"))
    a.join(b.hint("shuffle_hash"), Seq("band", "key"))
      .where(col("ida") < col("idb"))
      .dropDuplicates("ida", "idb")
      .withColumn("hamming", bit_count(col("sha").bitwiseXOR(col("shb"))))
      .where(col("hamming") <= maxHamming)
      .select(col("ida"), col("idb"), col("hamming"))
  }
}
