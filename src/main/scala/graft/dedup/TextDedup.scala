package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{seeded_hash64, simhash64}
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

  /** Exact word-n-gram Jaccard similar pairs (idA < idB, jaccard >= t).
    * jaccard = |A∩B| / (|A| + |B| - |A∩B|) over distinct shingle sets —
    * integer counts, single division: FP-exact. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        maxShingleDocFreq: Option[Int] = None): DataFrame = {
    val sh0 = shingles(df, idCol, textCol, n)
    val sh = maxShingleDocFreq match {
      case Some(cap) =>
        val hot = sh0.groupBy("shingle").count().where(col("count") > cap)
          .select("shingle")
        sh0.join(hot, Seq("shingle"), "left_anti")
      case None => sh0
    }
    val cnt = sh.groupBy(col(idCol)).agg(count(lit(1)).as("nsh"))
    val a = sh.select(col(idCol).as("ida"), col("shingle"))
    val b = sh.select(col(idCol).as("idb"), col("shingle"))
    val shared = a.join(b, "shingle")
      .where(col("ida") < col("idb"))
      .groupBy("ida", "idb").agg(count(lit(1)).as("shared"))
    shared
      .join(cnt.select(col(idCol).as("ida"), col("nsh").as("na")), "ida")
      .join(cnt.select(col(idCol).as("idb"), col("nsh").as("nb")), "idb")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("ida"), col("idb"), col("jaccard"))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * min hash over the document's shingles. One aggregation, map-side
    * combined. */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int, numHashes: Int): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
    val mins = (0 until numHashes).map(i =>
      min(seeded_hash64(col("shingle"), lit(i.toLong))).as(s"h$i"))
    sh.groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(i => col(s"h$i")): _*).as("minhash"))
  }

  /** MinHash + banded LSH candidate pairs with the signature-estimated
    * Jaccard (fraction of agreeing minhashes). `bands` must divide
    * `numHashes`; two documents collide iff some band of their signatures
    * is identical — the standard S-curve candidate generator. */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 64, bands: Int = 16,
                      estThreshold: Double = 0.0): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = minHashSignatures(df, idCol, textCol, n, numHashes)
    val bandStructs = array((0 until bands).map { bnd =>
      struct(lit(bnd).as("band"),
        concat_ws(",", slice(col("minhash"), bnd * rows + 1, rows)).as("key"))
    }: _*)
    val banded = sig.select(col(idCol), col("minhash"), explode(bandStructs).as("b"))
      .select(col(idCol), col("minhash"), col("b.band").as("band"), col("b.key").as("key"))
    val a = banded.select(col(idCol).as("ida"), col("minhash").as("ma"),
      col("band"), col("key"))
    val b = banded.select(col(idCol).as("idb"), col("minhash").as("mb"),
      col("band"), col("key"))
    val cand = a.join(b, Seq("band", "key"))
      .where(col("ida") < col("idb"))
      .select("ida", "idb", "ma", "mb")
      .dropDuplicates("ida", "idb")
    cand
      .withColumn("est_jaccard",
        size(filter(zip_with(col("ma"), col("mb"), (x, y) => x === y), b => b))
          .cast("double") / lit(numHashes.toDouble))
      .where(col("est_jaccard") >= estThreshold)
      .select(col("ida"), col("idb"), col("est_jaccard"))
  }

  /** SimHash near-duplicate pairs: 16-bit band blocking over the 64-bit
    * fingerprint (any identical quarter => candidate; catches all pairs with
    * Hamming distance <= 3 exactly, most below ~16), then exact Hamming
    * filter via bit_count(xor). */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    val sig = df.select(col(idCol), simhash64(col(textCol)).as("sh"))
    val bandStructs = array((0 until 4).map { bnd =>
      struct(lit(bnd).as("band"),
        shiftrightunsigned(col("sh"), bnd * 16).bitwiseAND(lit(0xffffL)).as("key"))
    }: _*)
    val banded = sig.select(col(idCol), col("sh"), explode(bandStructs).as("b"))
      .select(col(idCol), col("sh"), col("b.band").as("band"), col("b.key").as("key"))
    val a = banded.select(col(idCol).as("ida"), col("sh").as("sha"), col("band"), col("key"))
    val b = banded.select(col(idCol).as("idb"), col("sh").as("shb"), col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .where(col("ida") < col("idb"))
      .dropDuplicates("ida", "idb")
      .withColumn("hamming", bit_count(col("sha").bitwiseXOR(col("shb"))))
      .where(col("hamming") <= maxHamming)
      .select(col("ida"), col("idb"), col("hamming"))
  }
}
