package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(n: Int) =
    (0L until n.toLong).map(id => (id, s"h${id % 7}", s"doc $id"))
      .toDF("doc_id", "host", "text")

  test("assignSplits partitions the corpus, near the requested weights") {
    val splits = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val out = CorpusSplit.assignSplits(docs(2000), "doc_id", splits)
    assert(out.where($"split".isNull).count() == 0, "every row assigned")
    val counts = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "valid", "test"))
    assert(counts("train") > 1500 && counts("train") < 1700,
      s"train ~0.8 of 2000, got ${counts("train")}")
    assert(counts("valid") > 120 && counts("valid") < 280)
  }

  test("split assignment is a pure function of id: stable under reorder and repartition") {
    val splits = Seq("a" -> 0.5, "b" -> 0.5)
    val base = CorpusSplit.assignSplits(docs(500), "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val shuffled = CorpusSplit.assignSplits(
      docs(500).orderBy(rand(42)).repartition(13), "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(base == shuffled)
  }

  test("a different salt reshuffles; the same salt is identical; SQL twin stays in sync") {
    val s0 = CorpusSplit.withShuffleKey(docs(300), "doc_id", salt = 0)
    val s0b = CorpusSplit.withShuffleKey(docs(300), "doc_id", salt = 0)
    val s1 = CorpusSplit.withShuffleKey(docs(300), "doc_id", salt = 1)
    val k0 = s0.select("doc_id", "shuffle_key").as[(Long, Long)].collect().toMap
    val k0b = s0b.select("doc_id", "shuffle_key").as[(Long, Long)].collect().toMap
    val k1 = s1.select("doc_id", "shuffle_key").as[(Long, Long)].collect().toMap
    assert(k0 == k0b)
    assert(k0 != k1, "salt must change the order")
    // the emitted SQL twin evaluates to the same assignment via Spark SQL
    val sqlExpr = CorpusSplit.assignSplitsSql(
      "doc_id", Seq("x" -> 0.3, "y" -> 0.7), salt = 5)
    val viaSql = docs(300).selectExpr("doc_id", s"$sqlExpr AS split")
      .as[(Long, String)].collect().toMap
    val viaScala = CorpusSplit.assignSplits(
        docs(300), "doc_id", Seq("x" -> 0.3, "y" -> 0.7), salt = 5)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(viaSql == viaScala)
  }

  test("writeShuffled: files in name order ARE the global shuffled order") {
    val path = "target/graft_test_shuffled"
    CorpusSplit.writeShuffled(docs(500), "doc_id", path, numFiles = 5)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length == 5)
    val perFile = files.map(f => spark.read.parquet(f)
      .select("doc_id", "shuffle_key").as[(Long, Long)].collect().toSeq)
    // within each file the keys are sorted; across files in NAME order the
    // ranges are disjoint and ascending — concatenation is the global order
    perFile.foreach(rows =>
      assert(rows.map(_._2).toSeq == rows.map(_._2).sorted))
    val flat = perFile.flatten.map(_._2)
    assert(flat.toSeq == flat.sorted.toSeq, "file-name order must be global key order")
    assert(perFile.flatten.map(_._1).toSet == (0L until 500L).toSet, "no row lost")
    // and the order is the hash order, not id order (it IS a shuffle)
    assert(perFile.flatten.map(_._1).take(20).toSeq != (0L until 20L).toSeq)
  }

  test("capPerHost equals the single-window reference, including under host skew") {
    // host h0 gets 400 extra docs — the skew case the two-stage form exists for
    val skewed = docs(200).unionByName(
      (1000L until 1400L).map(id => (id, "h0", s"doc $id"))
        .toDF("doc_id", "host", "text"))
    for (k <- Seq(1, 5, 17); salts <- Seq(1, 4, 32)) {
      val fast = HostCurate.capPerHost(skewed, "host", "doc_id", k, salts)
        .select("doc_id", "host", "host_rank")
        .as[(Long, String, Int)].collect().toSet
      val ref = HostCurate.capPerHostReference(skewed, "host", "doc_id", k)
        .select("doc_id", "host", "host_rank")
        .as[(Long, String, Int)].collect().toSet
      assert(fast == ref, s"k=$k salts=$salts")
    }
  }

  test("capPerHost keeps at most k per host and ranks 1..k densely") {
    val out = HostCurate.capPerHost(docs(300), "host", "doc_id", k = 9)
      .groupBy("host").agg(count(lit(1)).as("n"), max("host_rank").as("mx"),
        min("host_rank").as("mn"))
      .as[(String, Long, Int, Int)].collect()
    assert(out.nonEmpty)
    out.foreach { case (h, n, mx, mn) =>
      assert(n <= 9 && mx == n && mn == 1, s"host $h: n=$n mx=$mx mn=$mn")
    }
  }

  test("token budget: floors semantics, hash order, unknown sources dropped") {
    val d = (0L until 100L).map(id =>
        (id, if (id % 2 == 0) "a" else "b", 10L))
      .toDF("doc_id", "src", "n_tok")
    val got = TokenBudget.sampleToBudget(d, "src", "doc_id", "n_tok",
        Map("a" -> 35L))
      .select("doc_id", "src", "tokens_before")
      .as[(Long, String, Long)].collect()
    // budget 35, docs of 10 tokens: prefix sums 0,10,20,30 < 35 -> exactly
    // 4 docs kept (the 4th CROSSES the budget and is kept); source b gone
    assert(got.length == 4)
    assert(got.forall(_._2 == "a"))
    assert(got.map(_._3).sorted.toSeq == Seq(0L, 10L, 20L, 30L))
    // selection = the 4 smallest key hashes among source a's docs
    val expectIds = (0L until 100L).filter(_ % 2 == 0)
      .sortBy(id => (((id * 2654435761L) % 4294967296L + 4294967296L) % 4294967296L, id))
      .take(4).toSet
    assert(got.map(_._1).toSet == expectIds)
    // determinism under repartition
    val again = TokenBudget.sampleToBudget(d.repartition(7), "src", "doc_id",
        "n_tok", Map("a" -> 35L))
      .select("doc_id").as[Long].collect().toSet
    assert(again == expectIds)
    intercept[IllegalArgumentException] {
      TokenBudget.sampleToBudget(d, "src", "doc_id", "n_tok", Map("a" -> 0L))
    }
  }

  test("negative sampling: positives never leak, ids stay in range, deterministic") {
    val n = 100L
    val pairs = (0L until 50L).map(a => (a, (a * 7 + 1) % n))
      .toDF("anchor", "pos")
    val out = NegativeSample.draw(pairs, "anchor", "pos", n, k = 5, salt = 1)
      .select("anchor", "pos", "neg_idx", "neg_id")
      .as[(Long, Long, Int, Long)].collect()
    assert(out.length == 250)
    out.foreach { case (a, p, _, neg) =>
      assert(neg != p, s"anchor $a drew its positive $p")
      assert(neg >= 0 && neg < n, s"out of range: $neg")
    }
    // a different salt draws a different set; same salt identical
    val again = NegativeSample.draw(pairs, "anchor", "pos", n, 5, salt = 1)
      .select("neg_id").as[Long].collect().toSeq
    assert(again == out.map(_._4).toSeq)
    val other = NegativeSample.draw(pairs, "anchor", "pos", n, 5, salt = 2)
      .select("neg_id").as[Long].collect().toSeq
    assert(other != again)
    // the SQL twin evaluates identically via Spark SQL
    val expr = NegativeSample.drawSql("anchor", "pos", n, 5, salt = 1)
    val viaSql = pairs
      .select(col("anchor"), col("pos"),
        explode(sequence(lit(0), lit(4))).as("neg_idx"))
      .selectExpr("anchor", "pos", "neg_idx", s"$expr AS neg_id")
      .select("neg_id").as[Long].collect().toSeq
    assert(viaSql == again)
    intercept[IllegalArgumentException] {
      NegativeSample.draw(pairs, "anchor", "pos", 1L, 5)
    }
  }

  test("blocklist drops exactly the blocked hosts, both forms") {
    val d = docs(140)
    val lit = HostCurate.dropHosts(d, "host", Seq("h1", "h3"))
    assert(lit.select("host").distinct().as[String].collect().toSet ==
      Set("h0", "h2", "h4", "h5", "h6"))
    val rel = HostCurate.dropHostsRelation(d, "host",
      Seq("h1", "h3").toDF("bad"), "bad")
    assert(rel.select("doc_id").as[Long].collect().toSet ==
      lit.select("doc_id").as[Long].collect().toSet)
    assert(rel.columns.toSeq == d.columns.toSeq,
      "anti-join must preserve the original projection")
  }

  test("upsample to budget: whole epochs + floors-semantics partial epoch") {
    import spark.implicits._
    // source A: 3 docs of 10 tokens (total 30); B: 2 docs of 5 (total 10)
    val df = Seq((1L, "A", 10L), (2L, "A", 10L), (3L, "A", 10L),
      (10L, "B", 5L), (11L, "B", 5L), (20L, "C", 7L))
      .toDF("id", "src", "tok")
    // A: 75 = 2 full epochs + 15-token partial; B: 10 = exactly 1 epoch
    val out = TokenBudget.upsampleToBudget(df, "src", "id", "tok",
      Map("A" -> 75L, "B" -> 10L))
    val a = out.where($"src" === "A").select("id", "epoch")
      .as[(Long, Long)].collect()
    assert(a.count(_._2 == 0L) == 3 && a.count(_._2 == 1L) == 3,
      s"two full A epochs expected: ${a.toSeq.sorted}")
    // partial epoch: 15-token budget over 10-token docs keeps the first
    // two in key-hash order (crossing doc kept)
    val partialIds = a.filter(_._2 == 2L).map(_._1).toSeq.sorted
    val expect = TokenBudget.sampleToBudget(df, "src", "id", "tok",
        Map("A" -> 15L)).select("id").as[Long].collect().sorted.toSeq
    assert(partialIds == expect && partialIds.length == 2)
    // B: exact multiple — one full epoch, no partial
    val b = out.where($"src" === "B").select("epoch").as[Long].collect()
    assert(b.toSeq == Seq(0L, 0L))
    // unbudgeted source dropped entirely
    assert(out.where($"src" === "C").isEmpty)
    // deterministic under repartition
    val again = TokenBudget.upsampleToBudget(df.repartition(7), "src", "id",
      "tok", Map("A" -> 75L, "B" -> 10L))
    assert(again.select("id", "src", "epoch").collect().toSet ==
      out.select("id", "src", "epoch").collect().toSet)
    // budget below one epoch degenerates to sampleToBudget at epoch 0
    val small = TokenBudget.upsampleToBudget(df, "src", "id", "tok",
      Map("A" -> 15L))
    assert(small.select("id").as[Long].collect().sorted.toSeq == expect)
    assert(small.select("epoch").as[Long].collect().toSet == Set(0L))
    // runaway-epoch guard
    intercept[IllegalArgumentException] {
      TokenBudget.upsampleToBudget(df, "src", "id", "tok",
        Map("A" -> 100000L), maxEpochs = 100)
    }
    // an all-NULL token column diagnoses cleanly, not with an NPE
    val nulls = Seq((1L, "N", null.asInstanceOf[java.lang.Long]))
      .toDF("id", "src", "tok")
    val e = intercept[IllegalArgumentException] {
      TokenBudget.upsampleToBudget(nulls, "src", "id", "tok", Map("N" -> 5L))
    }
    assert(e.getMessage.contains("has no tokens"))
  }

  test("temperature budgets: alpha=1 is proportional, alpha->0 flattens, caps bind") {
    val counts = Map("big" -> 900L, "mid" -> 90L, "small" -> 10L)
    val prop = TokenBudget.temperatureBudgets(counts, 1000L, alpha = 1.0)
    assert(prop("big") == 900L && prop("mid") == 90L && prop("small") == 10L)
    val flat = TokenBudget.temperatureBudgets(counts, 300L, alpha = 0.3)
    // flattening: small's share grows, big's shrinks, order preserved
    assert(flat("small").toDouble / counts("small") >
           flat("big").toDouble / counts("big"),
      s"alpha<1 should over-sample the small source: $flat")
    assert(flat("big") > flat("mid") && flat("mid") > flat("small"))
    // a budget can never exceed the source's own token count
    val capped = TokenBudget.temperatureBudgets(counts, 100000L, alpha = 0.5)
    assert(capped.forall { case (s, b) => b <= counts(s) })
    // every source keeps at least one token (floor-to-1)
    val tiny = TokenBudget.temperatureBudgets(counts, 3L, alpha = 1.0)
    assert(tiny.values.forall(_ >= 1L))
    intercept[IllegalArgumentException] {
      TokenBudget.temperatureBudgets(counts, 1000L, alpha = 1.5)
    }
  }
}
