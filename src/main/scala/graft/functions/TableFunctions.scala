package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL TABLE functions for the highest-traffic LLM-pipeline operators
  * (round-13 verdict #7): the spatial side is fully SQL-planned via
  * SpatialJoinStrategy; these give `spark.sql()` users the dedup/ANN entry
  * points without touching the Scala API.
  *
  *   SELECT * FROM minhash_lsh_pairs('docs_view', 'doc_id', 'text',
  *                                   3, 64, 16, 0.5)
  *   SELECT * FROM ann_topk('items_view', 'id', 'vec',
  *                          'queries_view', 'qid', 'qvec', 5)
  *   SELECT * FROM dedup_by_components('docs_view', 'doc_id',
  *                                     'edges_view', 'ida', 'idb')
  *
  * Relations are named by VIEW/TABLE NAME (string literal, resolved
  * against the active session's catalog) — Spark's injected table
  * functions receive scalar expressions only; TABLE() arguments are a
  * Python-UDTF-only surface. The builder hands back the operator's own
  * logical plan, so the SQL form plans IDENTICALLY to the Scala API call
  * (asserted by TableFunctionsSpec): banded shuffle-hash self-join for
  * LSH, broadcast + bounded per-partition heap for ANN.
  *
  * Eagerness caveat, documented contract: `dedup_by_components` runs the
  * large/small-star convergence loop (several bounded Spark jobs) while
  * the OUTER query is being analyzed — same work the Scala call does, just
  * earlier than a purely-lazy TVF would. The other two only collect what
  * their Scala forms collect (ann_topk's bounded query side).
  */
object TableFunctions {

  private def fold(e: Expression, what: String): Any = {
    require(e.foldable, s"$what must be a literal")
    e.eval()
  }
  private def str(e: Expression, what: String): String =
    fold(e, what) match {
      case null => throw new IllegalArgumentException(s"$what must not be null")
      case v => v.toString
    }
  private def int(e: Expression, what: String): Int =
    fold(e, what) match {
      case i: Int => i
      case l: Long => l.toInt
      case v => throw new IllegalArgumentException(s"$what must be an integer, got $v")
    }
  private def dbl(e: Expression, what: String): Double =
    fold(e, what) match {
      case d: Double => d
      case f: Float => f.toDouble
      case i: Int => i.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case v => throw new IllegalArgumentException(s"$what must be numeric, got $v")
    }
  private def active: SparkSession = SparkSession.active

  /** minhash_lsh_pairs(table, idCol, textCol, shingleN, numHashes, bands,
    * estThreshold) → (ida, idb, est_jaccard). */
  def minhashLshPairs(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 7,
      "minhash_lsh_pairs(table, idCol, textCol, shingleN, numHashes, bands, estThreshold)")
    val spark = active
    graft.dedup.TextDedup.minHashLshPairs(
      spark.table(str(args(0), "table")),
      str(args(1), "idCol"), str(args(2), "textCol"),
      int(args(3), "shingleN"), int(args(4), "numHashes"),
      int(args(5), "bands"), dbl(args(6), "estThreshold"))
      .queryExecution.logical
  }

  /** ann_topk(itemsTable, itemId, itemVec, queriesTable, queryId,
    * queryVec, k) → (queryId, itemId, similarity, rank). */
  def annTopk(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 7,
      "ann_topk(itemsTable, itemId, itemVec, queriesTable, queryId, queryVec, k)")
    val spark = active
    graft.ann.Similarity.topKBrute(
      spark.table(str(args(0), "itemsTable")),
      str(args(1), "itemId"), str(args(2), "itemVec"),
      spark.table(str(args(3), "queriesTable")),
      str(args(4), "queryId"), str(args(5), "queryVec"),
      int(args(6), "k"))
      .queryExecution.logical
  }

  /** dedup_by_components(table, idCol, edgesTable, srcCol, dstCol) → the
    * input table's rows with one survivor (min id) per connected
    * component of the edge relation. */
  def dedupByComponents(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 5,
      "dedup_by_components(table, idCol, edgesTable, srcCol, dstCol)")
    val spark = active
    graft.dedup.Components.dedupByComponents(
      spark.table(str(args(0), "table")), str(args(1), "idCol"),
      spark.table(str(args(2), "edgesTable")),
      str(args(3), "srcCol"), str(args(4), "dstCol"))
      .queryExecution.logical
  }

  val all: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "minhash_lsh_pairs" -> (minhashLshPairs _),
    "ann_topk" -> (annTopk _),
    "dedup_by_components" -> (dedupByComponents _))

  /** Register into an existing session (the [[graft.functions.registerAll]]
    * analog for table functions). Idempotent. */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.tableFunctionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  /** The descriptions [[graft.GraftExtensions]] injects at session build. */
  def descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] =
    all.map { case (name, builder) =>
      (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder)
    }
}
