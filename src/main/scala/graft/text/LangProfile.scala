package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Character-n-gram-profile language identification (the Cavnar & Trenkle
  * '94 n-gram category-profile method, relationalized): train a per-language
  * profile — the top-M character n-grams by corpus frequency — from a
  * labeled split, then classify documents by profile overlap. The whole
  * model IS a relation (lang, gram), so training and inference are plain
  * aggregates and joins: no driver-side model state, cross-engine exact,
  * and the profile side is vocabulary-bounded (langs × M rows — always
  * broadcastable).
  *
  * This replaces nothing: the stopword-ratio heuristic
  * ([[TextFunctions.langId]]) stays as the cheap scan-only filter; the
  * profile model is the trainable multi-language form. */
object LangProfile {

  /** Train per-language profiles: (langCol, gram) — the top `profileSize`
    * character n-grams of each language by frequency (count desc, gram asc
    * — deterministic). One explode + two aggregates. */
  def train(docs: DataFrame, langCol: String, textCol: String,
            n: Int = 3, profileSize: Int = 200): DataFrame = {
    val cnt = docs.select(col(langCol),
        explode(graft.functions.char_shingles_all(col(textCol), n)).as("gram"))
      .groupBy(col(langCol), col("gram")).agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col(langCol))
      .orderBy(col("__c").desc, col("gram").asc)
    cnt.withColumn("__r", row_number().over(w))
      .where(col("__r") <= profileSize)
      .select(col(langCol), col("gram"))
  }

  /** Classify: score(doc, lang) = |distinct doc n-grams ∩ profile(lang)|,
    * prediction = argmax score (ties -> lexicographically first language).
    * Documents sharing no gram with any profile produce no row (no
    * evidence, no prediction). The profiles relation is langs×profileSize
    * rows — broadcast it so the document side never shuffles raw grams;
    * only the bounded (doc, lang) score pairs move. */
  def classify(docs: DataFrame, idCol: String, textCol: String,
               profiles: DataFrame, n: Int = 3): DataFrame = {
    val langCol = profiles.columns.head
    val grams = docs.select(col(idCol),
      explode(graft.functions.char_shingles(col(textCol), n)).as("gram"))
    val scores = grams.join(broadcast(profiles), Seq("gram"))
      .groupBy(col(idCol), col(langCol)).agg(count(lit(1)).as("score"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col(langCol).asc)
    scores.withColumn("__r", row_number().over(w))
      .where(col("__r") === 1)
      .select(col(idCol), col(langCol).as("pred_lang"), col("score"))
  }
}
