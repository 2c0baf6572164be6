package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.queries.Queries

/** Plan-shape regression tests: the properties that make these operators
  * viable at 100 TB — column pruning reaching the parquet scan, no
  * nested-loop/cartesian fallbacks in spatial joins, zero shuffles on the
  * broadcast kNN path. Failures here are perf bugs even when results stay
  * correct. */
class PlanHealthSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val root = df.queryExecution.executedPlan
    val plans = root +: root.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
    plans.flatMap(_.collect { case s: FileSourceScanExec => s })
  }

  private def scanColumns(df: DataFrame, table: String): Set[String] =
    scans(df).filter(_.relation.location.inputFiles.exists(_.contains(table)))
      .flatMap(_.schema.fieldNames).toSet

  test("column pruning reaches the parquet scans") {
    assert(scanColumns(Queries.q1Agg(spark, dir), "lineitem") ==
      Set("l_returnflag", "l_linestatus", "l_quantity"))
    assert(scanColumns(Queries.qTextStats(spark, dir), "documents") ==
      Set("doc_id", "text"))
    assert(scanColumns(Queries.qWindowTopk(spark, dir), "orders") ==
      Set("o_custkey", "o_orderkey", "o_totalprice"))
    assert(scanColumns(Queries.qMbbStats(spark, dir), "part") ==
      Set("p_partkey", "p_size"))
  }

  test("spatial join plans avoid cartesian/nested-loop fallbacks") {
    val plan = Queries.qSpjoinIntersects(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian product in spatial join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "BNLJ in spatial join")
    assert(plan.contains("MapGroups") || plan.contains("CoGroup"),
      "expected the cogroup tile join")
  }

  test("broadcast kNN path runs with zero shuffles") {
    val df = Queries.qKnn(spark, dir)
    val shuffles = df.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty,
      s"broadcast kNN should not shuffle:\n${df.queryExecution.executedPlan}")
  }

  test("ANN brute top-k never shuffles the scored cross product") {
    val df = Queries.qAnnTopk(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "items x queries cross product materialized in the ANN plan")
    assert(plan.contains("MapPartitions"),
      "expected the bounded-heap mapPartitions stage")
    // the only exchange feeds the final window over per-partition top-k
    // candidates — a relation bounded by partitions x |queries| x k rows
    val shuffles = df.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.size <= 1, s"ANN plan should have at most the rank shuffle:\n$plan")
  }

  test("LSH band joins stay equi-joins — no cartesian/nested-loop fallback") {
    Seq(Queries.qAnnLsh(spark, dir), Queries.qMinhashLsh(spark, dir))
      .foreach { df =>
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct") &&
          !plan.contains("BroadcastNestedLoopJoin"),
          s"all-pairs fallback in an LSH bucket join:\n$plan")
      }
  }

  test("corpus-clean and dedup-cluster gates prune the documents scan") {
    // the component edges are mined in EAGER jobs before the returned plan,
    // so the final plan's scan can prune all the way down to doc_id
    assert(scanColumns(Queries.qCorpusClean(spark, dir), "documents")
      .subsetOf(Set("doc_id", "text")))
    assert(scanColumns(Queries.qDedupCluster(spark, dir), "documents")
      .subsetOf(Set("doc_id", "text")))
  }

  test("predicate pushdown reaches dim-table scans in q3") {
    val q3 = Queries.q3Join(spark, dir)
    val custScan = scans(q3)
      .filter(_.relation.location.inputFiles.exists(_.contains("customer")))
    assert(custScan.nonEmpty)
    val pushed = custScan.head.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("c_mktsegment"),
      s"mktsegment filter not pushed: $pushed")
  }
}
