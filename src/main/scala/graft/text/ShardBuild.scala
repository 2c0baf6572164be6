package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-shard assembly: documents grouped into shards, concatenated in
  * a deterministic document order with a separator, fingerprinted.
  *
  * This is the "write the training files" step of a pre-training pipeline:
  * after filtering/dedup, documents are packed into shard-sized units whose
  * CONTENT must be byte-deterministic (so a re-run, a task retry, or a
  * second engine produces identical shards — the md5 column is the
  * contract). Shard key = (group columns, id mod `slots`).
  *
  * 100 TB shape: one hash shuffle on the shard key, then a per-shard
  * sort-and-concatenate. The per-shard `collect_list` is NOT a scale
  * hazard: a shard is by definition a unit that must fit in one writer
  * task (it becomes one output file); `slots` is chosen as
  * corpus_size / shard_budget to bound it. Skewed groups split across
  * `slots` shards automatically since the slot is derived from the
  * uniformly-distributed document id, not from content.
  */
object ShardBuild {

  /** PRECONDITION (both functions): document ids are NON-NEGATIVE — slot
    * uses pmod, which diverges from SQL `%` on negative ids — and UNIQUE
    * within a group; with duplicate ids the struct sort tie-breaks by
    * text, which a plain `ORDER BY id` SQL re-derivation leaves
    * unspecified (the oracle orders by id, text to match). Training
    * corpora satisfy both by construction. */
  private def slotCol(idCol: String, slots: Int): Column =
    pmod(col(idCol), lit(slots.toLong))

  /** Deterministic shard text: docs joined by '\n' in ascending id order. */
  private def orderedConcat(idCol: String, textCol: String): Column =
    concat_ws("\n", transform(
      // array_sort on struct(id, text) orders by id (struct comparison is
      // field-order lexicographic); collect_list's arrival order is
      // non-deterministic, the sort makes the concat retry-stable
      array_sort(collect_list(struct(col(idCol), col(textCol)))),
      s => s.getField(textCol)))

  /** One row per shard: group columns, `slot`, `n_docs`, `sum_chars`,
    * `shard_md5` (md5 of the docs joined by '\n' in ascending id order). */
  def buildShards(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      textCol: String,
      slots: Int): DataFrame = {
    require(slots > 0, s"slots must be positive, got $slots")
    val keys: Seq[Column] = groupCols.map(col) :+ col("slot")
    df.withColumn("slot", slotCol(idCol, slots))
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col(textCol)).cast("long")).as("sum_chars"),
        md5(orderedConcat(idCol, textCol).cast("binary")).as("shard_md5"))
  }

  /** Write the ACTUAL shard files: one text file per shard at
    * `path/<group>=…/slot=K/part-*.txt`, file bytes = the exact
    * [[buildShards]] concatenation + one trailing '\n' (the text sink's
    * POSIX line terminator — strip the final byte to recover the hashed
    * content, which the q_shard_files gate does from a raw binaryFile
    * read-back). One shuffle on the shard key; each shard is ONE row after
    * the aggregation, so every partition directory gets exactly one file
    * from the one task that owns the row — the per-shard analog of the
    * reference's per-tile multi-file sink (CustomMultiOutputFormat.java:
    * 7-15). */
  def writeShards(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      textCol: String,
      slots: Int,
      path: String): Unit = {
    require(slots > 0, s"slots must be positive, got $slots")
    val keys: Seq[Column] = groupCols.map(col) :+ col("slot")
    df.withColumn("slot", slotCol(idCol, slots))
      .groupBy(keys: _*)
      .agg(orderedConcat(idCol, textCol).as("content"))
      .write.partitionBy(groupCols :+ "slot": _*)
      .mode("overwrite").text(path)
  }
}
