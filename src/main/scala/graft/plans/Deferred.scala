package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}

/** A logical leaf whose relation is COMPUTED AT EXECUTION TIME by `build`
  * — the laziness shim for operators whose construction itself runs Spark
  * jobs (e.g. [[graft.dedup.Components.dedupByComponents]]'s large/small-
  * star convergence loop). Returning such an operator's plan directly from
  * a SQL table function would run those jobs during ANALYSIS of the outer
  * query (round-14 verdict #2: `EXPLAIN SELECT ... FROM
  * dedup_by_components(...)` launched the loop); wrapping them in this
  * node keeps analysis and EXPLAIN job-free — the loop runs when (and only
  * when) the outer query executes, and the node composes with caching like
  * any other leaf.
  *
  * `output` must be declared up front (schema-only, no jobs): the builder
  * derives it from the input relation's analyzed schema. [[DeferredExec]]
  * checks at run time that `build()`'s schema agrees, so a drift between
  * the declared and computed relation fails loudly instead of mis-binding
  * columns. */
case class DeferredRelation(
    output: Seq[Attribute], label: String,
    @transient build: () => DataFrame)
  extends LeafNode with MultiInstanceRelation {

  // size unknown until built: the default (large) estimate keeps Catalyst
  // from auto-broadcasting a relation whose true size nobody has measured
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = conf.defaultSizeInBytes)

  override def newInstance(): DeferredRelation =
    copy(output = output.map(_.newInstance()))

  override def simpleString(maxFields: Int): String =
    s"DeferredRelation [$label]"
}

/** Physical side of [[DeferredRelation]]: `doExecute` (driver-side, at job
  * submission) invokes the builder and hands back the built plan's
  * execution RDD. Nested job launches from here are the same pattern as
  * broadcast-exchange materialization. */
case class DeferredExec(
    output: Seq[Attribute], label: String,
    @transient build: () => DataFrame)
  extends LeafExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    val df = build()
    val got = df.queryExecution.analyzed.output
    require(got.length == output.length &&
        got.zip(output).forall { case (g, d) => g.dataType == d.dataType },
      s"DeferredExec[$label]: built relation schema " +
        s"${got.map(a => s"${a.name}:${a.dataType.simpleString}")} does not " +
        s"match the declared output " +
        s"${output.map(a => s"${a.name}:${a.dataType.simpleString}")}")
    df.queryExecution.toRdd
  }

  override def simpleString(maxFields: Int): String =
    s"DeferredExec [$label]"
}

/** Plans [[DeferredRelation]] → [[DeferredExec]]. Injected by
  * [[graft.GraftExtensions]] and by
  * [[graft.functions.TableFunctions.registerAll]] (idempotently), so every
  * session that can parse the TVFs can also plan them. */
object DeferredStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case DeferredRelation(out, label, build) =>
      DeferredExec(out, label, build) :: Nil
    case _ => Nil
  }
}
