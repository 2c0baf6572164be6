package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The SQL TABLE-function surface for the LLM operators (round-13 verdict
  * #7): each TVF must return exactly the Scala API's rows AND plan the
  * same physical shape (no cartesian/nested-loop fallback). */
class TableFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = {
    val base = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "a completely different document about spark catalyst planning"),
      (3L, "a completely different document about spark catalyst planning today"),
      (4L, "unrelated text with no overlap whatsoever in any shingle"))
    base.toDF("doc_id", "text")
  }

  test("minhash_lsh_pairs TVF == TextDedup.minHashLshPairs, no cartesian") {
    TableFunctions.registerAll(spark)
    docs.createOrReplaceTempView("tvf_docs")
    val sql = spark.sql(
      "SELECT * FROM minhash_lsh_pairs('tvf_docs', 'doc_id', 'text', 3, 64, 16, 0.5D)")
    val api = graft.dedup.TextDedup.minHashLshPairs(
      docs, "doc_id", "text", n = 3, numHashes = 64, bands = 16,
      estThreshold = 0.5)
    val got = sql.as[(Long, Long, Double)].collect().toSet
    assert(got == api.as[(Long, Long, Double)].collect().toSet)
    assert(got.exists { case (a, b, _) => a == 0L && b == 1L },
      "identical docs must collide")
    val plan = sql.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "TVF must plan the banded equi-join, not a cross product")
  }

  test("ann_topk TVF == Similarity.topKBrute, items never shuffle") {
    TableFunctions.registerAll(spark)
    val rnd = new scala.util.Random(7)
    val emb = (0L until 200L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat()))).toDF("id", "vec")
    val items = emb.select(col("id").as("nid"), col("vec").as("ivec"))
    val queries = emb.where(col("id") % 40 === 0)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    items.createOrReplaceTempView("tvf_items")
    queries.createOrReplaceTempView("tvf_queries")
    val sql = spark.sql(
      "SELECT * FROM ann_topk('tvf_items', 'nid', 'ivec', 'tvf_queries', 'qid', 'qvec', 3)")
    val api = graft.ann.Similarity.topKBrute(
      items, "nid", "ivec", queries, "qid", "qvec", k = 3)
    assert(sql.columns.toSeq == api.columns.toSeq)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(df.columns.head, df.columns(1), "rank")
        .as[(Long, Long, Int)].collect().toSet
    assert(key(sql) == key(api))
    val plan = sql.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("dedup_by_components TVF == Components.dedupByComponents") {
    TableFunctions.registerAll(spark)
    docs.createOrReplaceTempView("tvf_cc_docs")
    Seq((0L, 1L), (2L, 3L)).toDF("ida", "idb")
      .createOrReplaceTempView("tvf_cc_edges")
    val sql = spark.sql(
      "SELECT * FROM dedup_by_components('tvf_cc_docs', 'doc_id', 'tvf_cc_edges', 'ida', 'idb')")
    val got = sql.select("doc_id").as[Long].collect().toSet
    assert(got == Set(0L, 2L, 4L), "min-id survivor per component + singleton")
    assert(sql.columns.toSet == docs.columns.toSet)
  }

  /** Round-14 verdict #3: analysis/EXPLAIN of the components TVF must not
    * run the convergence loop. Probe: run explain inside a dedicated job
    * group, then a sentinel job in the SAME group — the listener bus is
    * FIFO, so once the sentinel is visible, any job explain had launched
    * would be visible too; the group must then hold ONLY the sentinel. */
  test("dedup_by_components TVF is lazy: explain launches zero jobs") {
    TableFunctions.registerAll(spark)
    docs.createOrReplaceTempView("tvf_lazy_docs")
    Seq((0L, 1L), (2L, 3L)).toDF("ida", "idb")
      .createOrReplaceTempView("tvf_lazy_edges")
    val sc = spark.sparkContext
    val group = s"tvf-lazy-probe-${System.nanoTime()}"
    sc.setJobGroup(group, "laziness probe", interruptOnCancel = false)
    val df = try {
      val d = spark.sql("SELECT * FROM dedup_by_components(" +
        "'tvf_lazy_docs', 'doc_id', 'tvf_lazy_edges', 'ida', 'idb')")
      d.queryExecution.executedPlan // analysis + planning, no execution
      d.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sc.parallelize(Seq(1)).count() // sentinel: an RDD action is exactly ONE job (AQE would split a SQL count into stage jobs)
      d
    } finally sc.clearJobGroup()
    var ids = Array.empty[Int]
    val deadline = System.nanoTime() + 30e9.toLong
    while (ids.isEmpty && System.nanoTime() < deadline) {
      ids = sc.statusTracker.getJobIdsForGroup(group)
      if (ids.isEmpty) Thread.sleep(50)
    }
    assert(ids.length == 1,
      s"explain must launch zero jobs (expected only the sentinel, got " +
        s"${ids.length} jobs in group $group)")
    assert(df.queryExecution.executedPlan.toString.contains("DeferredExec"),
      "the TVF must plan as the deferred leaf")
    // execution still yields the Scala API's exact survivors
    assert(df.select("doc_id").as[Long].collect().toSet == Set(0L, 2L, 4L))
  }

  test("curation TVFs == their Scala APIs (quality_filter/dedup_exact/" +
      "dedup_lines/assign_splits)") {
    TableFunctions.registerAll(spark)
    val corpus = Seq(
      (0L, "the quick brown fox and the lazy dog were here\nshared line"),
      (1L, "the quick brown fox and the lazy dog were here\nshared line"),
      (2L, "a completely different document with its own text\nshared line"),
      (3L, "zzz qqq xxx"), // no stopwords -> fails the language filter
      (4L, "this is another document that should pass with these words"))
      .toDF("doc_id", "text")
    corpus.createOrReplaceTempView("tvf_cur_docs")

    val qf = spark.sql(
      "SELECT * FROM quality_filter('tvf_cur_docs', 'text', 'en', 0.1D)")
    val qfApi = graft.text.CorpusClean.qualityFilter(corpus, "text", "en", 0.1)
    assert(qf.as[(Long, String)].collect().toSet ==
      qfApi.as[(Long, String)].collect().toSet)
    assert(!qf.select("doc_id").as[Long].collect().contains(3L))

    val de = spark.sql(
      "SELECT * FROM dedup_exact('tvf_cur_docs', 'doc_id', 'text')")
    val deApi = graft.text.CorpusClean.dedupExact(corpus, "doc_id", "text")
    assert(de.as[(Long, String)].collect().toSet ==
      deApi.as[(Long, String)].collect().toSet)
    assert(!de.select("doc_id").as[Long].collect().contains(1L),
      "doc 1 is a byte-identical dup of doc 0")

    val dl = spark.sql(
      "SELECT * FROM dedup_lines('tvf_cur_docs', 'doc_id', 'text')")
    val dlApi = graft.dedup.TextDedup.dedupLinesAcross(corpus, "doc_id", "text")
    assert(dl.as[(Long, String)].collect().toSet ==
      dlApi.as[(Long, String)].collect().toSet)

    val as = spark.sql("SELECT * FROM assign_splits('tvf_cur_docs', " +
      "'doc_id', 'train:0.8,val:0.1,test:0.1', 7)")
    val asApi = graft.text.CorpusSplit.assignSplits(corpus, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = 7L)
    assert(as.as[(Long, String, String)].collect().toSet ==
      asApi.as[(Long, String, String)].collect().toSet)
    assert(as.columns.toSeq == Seq("doc_id", "text", "split"))
  }

  test("decontaminate TVF == Decontaminate.flag, bench side broadcasts") {
    TableFunctions.registerAll(spark)
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),   // hits: contains bench trigram
      (11L, "one two three four five six seven"),     // clean
      (12L, "alpha beta gamma nine ten eleven"))      // 1 shared trigram
      .toDF("doc_id", "text")
    val bench = Seq((0L, "alpha beta gamma delta epsilon"))
      .toDF("bid", "btext")
    train.createOrReplaceTempView("tvf_decon_train")
    bench.createOrReplaceTempView("tvf_decon_bench")
    val sql = spark.sql("SELECT * FROM decontaminate('tvf_decon_train', " +
      "'doc_id', 'text', 'tvf_decon_bench', 'btext', 3)")
    val api = graft.text.Decontaminate.flag(
      train, "doc_id", "text", bench, "btext", n = 3)
    assert(sql.columns.toSeq == Seq("doc_id", "n_hits", "contaminated"))
    val rows = sql.as[(Long, Long, Int)].collect().toSet
    assert(rows == api.as[(Long, Long, Int)].collect().toSet)
    // doc 10 shares 3 trigrams, doc 12 exactly 1, doc 11 none — and the
    // clean doc is PRESENT with zeros (per-doc report, not a semi join)
    assert(rows == Set((10L, 3L, 1), (11L, 0L, 0), (12L, 1L, 1)))
    // the benchmark side broadcasts; the training corpus never shuffles
    // into the hit join
    val plan = sql.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bench-side hit join must broadcast:\n$plan")
  }

  test("TVFs are registered by GraftExtensions at session build") {
    // simulate the injection against a fresh session (the
    // GraftExtensionsSpec convention for scalar functions)
    val s2 = spark.newSession()
    new graft.GraftExtensions().apply(
      new org.apache.spark.sql.SparkSessionExtensions {
        override def injectFunction(
            fn: (org.apache.spark.sql.catalyst.FunctionIdentifier,
                 org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                 Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
                   org.apache.spark.sql.catalyst.expressions.Expression)): Unit =
          s2.sessionState.functionRegistry.registerFunction(fn._1, fn._2, fn._3)
        override def injectTableFunction(
            fn: (org.apache.spark.sql.catalyst.FunctionIdentifier,
                 org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                 Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
                   org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)): Unit =
          s2.sessionState.tableFunctionRegistry.registerFunction(fn._1, fn._2, fn._3)
      })
    docs.createOrReplaceTempView("tvf_docs2") // registered in parent session
    // temp views are session-scoped: re-register in s2
    import s2.implicits._
    Seq((0L, "aa bb cc dd ee"), (1L, "aa bb cc dd ee")).toDF("doc_id", "text")
      .createOrReplaceTempView("tvf_docs_s2")
    val out = s2.sql(
      "SELECT * FROM minhash_lsh_pairs('tvf_docs_s2', 'doc_id', 'text', 3, 64, 16, 0.5D)")
    assert(out.count() == 1)
  }
}
