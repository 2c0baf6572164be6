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
  * Laziness contract (round-14 verdict #3): every TVF here is job-free at
  * analysis time. The pure-transformation TVFs hand back lazy plans by
  * construction; `dedup_by_components` — whose Scala form runs the
  * large/small-star convergence loop eagerly — wraps the loop in a
  * [[graft.plans.DeferredRelation]] leaf, so `EXPLAIN` launches zero jobs
  * and the TVF composes with caching; the loop runs when the outer query
  * executes (TableFunctionsSpec pins the zero-jobs-at-explain property).
  * ann_topk still collects its bounded query side at execution, exactly
  * as the Scala form does.
  *
  * The curation pipeline is SQL-complete (round-14 verdict #5): with
  * `quality_filter` / `dedup_exact` / `dedup_lines` / `assign_splits` a
  * pure-SQL user chains temp views into the C4-style clean end-to-end
  * (gate q_pipeline_sql runs exactly that, oracle-verified).
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
    * component of the edge relation.
    *
    * LAZY: the connected-components convergence loop runs Spark jobs, so
    * the plan returned here is a [[graft.plans.DeferredRelation]] whose
    * builder fires at execution — analysis/EXPLAIN stay job-free. Column
    * existence is still validated eagerly (analysis-time error, no jobs),
    * and the input relations are captured NOW, so a temp view replaced
    * between analysis and execution does not change the result. */
  def dedupByComponents(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 5,
      "dedup_by_components(table, idCol, edgesTable, srcCol, dstCol)")
    val spark = active
    val input = spark.table(str(args(0), "table"))
    val idCol = str(args(1), "idCol")
    val edges = spark.table(str(args(2), "edgesTable"))
    val srcCol = str(args(3), "srcCol")
    val dstCol = str(args(4), "dstCol")
    input.col(idCol); edges.col(srcCol); edges.col(dstCol) // eager validation
    graft.plans.DeferredRelation(
      input.queryExecution.analyzed.output.map(_.newInstance()),
      s"dedup_by_components(${str(args(0), "table")})",
      () => graft.dedup.Components.dedupByComponents(
        input, idCol, edges, srcCol, dstCol))
  }

  /** quality_filter(table, textCol, lang, minQuality) → the table's rows
    * whose language id matches `lang` and quality score clears
    * `minQuality` ([[graft.text.CorpusClean]] stages 1–2). All columns
    * preserved; scan-local arithmetic, no shuffle. */
  def qualityFilter(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 4,
      "quality_filter(table, textCol, lang, minQuality)")
    val spark = active
    graft.text.CorpusClean.qualityFilter(
      spark.table(str(args(0), "table")), str(args(1), "textCol"),
      str(args(2), "lang"), dbl(args(3), "minQuality"))
      .queryExecution.logical
  }

  /** dedup_exact(table, idCol, textCol) → one survivor (min id) per
    * byte-identical text ([[graft.text.CorpusClean]] stage 3). */
  def dedupExact(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3, "dedup_exact(table, idCol, textCol)")
    val spark = active
    graft.text.CorpusClean.dedupExact(
      spark.table(str(args(0), "table")),
      str(args(1), "idCol"), str(args(2), "textCol"))
      .queryExecution.logical
  }

  /** dedup_lines(table, idCol, textCol) → documents reassembled from the
    * first (id, pos) occurrence of every distinct line
    * ([[graft.dedup.TextDedup.dedupLinesAcross]], C4-style). Output
    * columns: (idCol, textCol). */
  def dedupLines(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3, "dedup_lines(table, idCol, textCol)")
    val spark = active
    graft.dedup.TextDedup.dedupLinesAcross(
      spark.table(str(args(0), "table")),
      str(args(1), "idCol"), str(args(2), "textCol"))
      .queryExecution.logical
  }

  /** assign_splits(table, idCol, spec, salt) → the table + a
    * deterministic `split` column ([[graft.text.CorpusSplit
    * .assignSplits]]). `spec` is `'name:weight,name:weight,...'`, e.g.
    * `'train:0.9,val:0.05,test:0.05'`. */
  def assignSplits(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 4, "assign_splits(table, idCol, spec, salt)")
    val spark = active
    val spec = str(args(2), "spec").split(',').toSeq.map { part =>
      part.split(':') match {
        case Array(name, w) => (name.trim, w.trim.toDouble)
        case _ => throw new IllegalArgumentException(
          s"assign_splits spec entry '$part' is not name:weight")
      }
    }
    graft.text.CorpusSplit.assignSplits(
      spark.table(str(args(0), "table")), str(args(1), "idCol"),
      spec, int(args(3), "salt").toLong)
      .queryExecution.logical
  }

  /** decontaminate(trainTable, idCol, textCol, benchTable, benchTextCol,
    * shingleN) → (idCol, n_hits, contaminated): exact benchmark-overlap
    * flags per training doc ([[graft.text.Decontaminate.flag]] — the
    * broadcast semi-join form; the benchmark side must be broadcast-sized,
    * use the Bloom operator beyond that). */
  def decontaminate(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 6,
      "decontaminate(trainTable, idCol, textCol, benchTable, benchTextCol, shingleN)")
    val spark = active
    graft.text.Decontaminate.flag(
      spark.table(str(args(0), "trainTable")),
      str(args(1), "idCol"), str(args(2), "textCol"),
      spark.table(str(args(3), "benchTable")), str(args(4), "benchTextCol"),
      int(args(5), "shingleN"))
      .queryExecution.logical
  }

  val all: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "minhash_lsh_pairs" -> (minhashLshPairs _),
    "decontaminate" -> (decontaminate _),
    "ann_topk" -> (annTopk _),
    "dedup_by_components" -> (dedupByComponents _),
    "quality_filter" -> (qualityFilter _),
    "dedup_exact" -> (dedupExact _),
    "dedup_lines" -> (dedupLines _),
    "assign_splits" -> (assignSplits _))

  /** Register into an existing session (the [[graft.functions.registerAll]]
    * analog for table functions). Idempotent. Also appends
    * [[graft.plans.DeferredStrategy]] so the lazy TVF plans: a session
    * that can parse `dedup_by_components` must be able to plan its
    * deferred leaf. */
  def registerAll(spark: SparkSession): Unit = {
    all.foreach { case (name, builder) =>
      spark.sessionState.tableFunctionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    if (!spark.experimental.extraStrategies.contains(graft.plans.DeferredStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.DeferredStrategy
  }

  /** The descriptions [[graft.GraftExtensions]] injects at session build. */
  def descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] =
    all.map { case (name, builder) =>
      (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder)
    }
}
