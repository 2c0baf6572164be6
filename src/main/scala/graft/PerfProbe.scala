package graft

import org.apache.spark.sql.SparkSession
import graft.queries.Queries

object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    args.headOption.getOrElse("dedup") match {
      case "dedup" =>
        time("warmup")(Queries.qDedupNgram(spark, "/root/testdata/sf0.001").count())
        time("dedup_ngram")(Queries.qDedupNgram(spark, dir).count())
        time("dedup_ngram_2nd")(Queries.qDedupNgram(spark, dir).count())
      case "knn" =>
        time("warmup")(Queries.qKnn(spark, "/root/testdata/sf0.001").count())
        time("knn")(Queries.qKnn(spark, dir).count())
        time("knn_2nd")(Queries.qKnn(spark, dir).count())
      case "knn3d" =>
        time("warmup")(Queries.qKnn3d(spark, "/root/testdata/sf0.001").count())
        time("knn3d_sf0.001")(Queries.qKnn3d(spark, "/root/testdata/sf0.001").count())
        time("knn3d_sf0.01")(Queries.qKnn3d(spark, "/root/testdata/sf0.01").count())
        time("knn3d_sf0.1")(Queries.qKnn3d(spark, dir).count())
        time("knn3d_sf0.1_2nd")(Queries.qKnn3d(spark, dir).count())
      case "knn3doc" =>
        time("warmup_grid")(Queries.qKnn3d(spark, "/root/testdata/sf0.001").count())
        time("warmup_oc")(Queries.qKnn3dOc(spark, "/root/testdata/sf0.001").count())
        time("grid_sf0.001")(Queries.qKnn3d(spark, "/root/testdata/sf0.001").count())
        time("oc_sf0.001")(Queries.qKnn3dOc(spark, "/root/testdata/sf0.001").count())
        time("grid_sf0.1")(Queries.qKnn3d(spark, dir).count())
        time("oc_sf0.1")(Queries.qKnn3dOc(spark, dir).count())
        time("grid_sf0.1_2nd")(Queries.qKnn3d(spark, dir).count())
        time("oc_sf0.1_2nd")(Queries.qKnn3dOc(spark, dir).count())
      case "knn3dskew" =>
        // extreme skew: rights fill 0.0001% of the space volume — a
        // uniform 8-grid puts every right in ONE cell, so grid probe sets
        // degenerate to |rights| candidates per starved left; the octree
        // subdivides the cluster adaptively
        import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
        import graft.operators.SpatialJoin3d
        val L = 15000; val R = 20000
        val lefts = spark.range(L).select(col("id").as("aid"),
          (pmod(xxhash64(col("id"), lit(1)), lit(100000L)).cast("double") / 100.0).as("ax0"),
          (pmod(xxhash64(col("id"), lit(2)), lit(100000L)).cast("double") / 100.0).as("ay0"),
          (pmod(xxhash64(col("id"), lit(3)), lit(100000L)).cast("double") / 100.0).as("az0"))
          .withColumn("ax1", col("ax0")).withColumn("ay1", col("ay0")).withColumn("az1", col("az0"))
        val rights = spark.range(R).select(col("id").as("bid"),
          (pmod(xxhash64(col("id"), lit(4)), lit(1000L)).cast("double") / 100.0).as("bx0"),
          (pmod(xxhash64(col("id"), lit(5)), lit(1000L)).cast("double") / 100.0).as("by0"),
          (pmod(xxhash64(col("id"), lit(6)), lit(1000L)).cast("double") / 100.0).as("bz0"))
          .withColumn("bx1", col("bx0") + 0.1).withColumn("by1", col("by0") + 0.1).withColumn("bz1", col("bz0") + 0.1)
        val lc = SpatialJoin3d.Mbb3Cols("ax0", "ay0", "az0", "ax1", "ay1", "az1")
        val rc = SpatialJoin3d.Mbb3Cols("bx0", "by0", "bz0", "bx1", "by1", "bz1")
        lefts.cache().count(); rights.cache().count()
        time("warmup_grid")(SpatialJoin3d.knnJoinMbb(lefts.limit(100), lc, "aid", rights, rc, "bid", 3).count())
        time("skew_grid")(SpatialJoin3d.knnJoinMbb(lefts, lc, "aid", rights, rc, "bid", 3).count())
        time("skew_oc")(SpatialJoin3d.knnJoinMbbOc(lefts, lc, "aid", rights, rc, "bid", 3).count())
        time("skew_grid_2nd")(SpatialJoin3d.knnJoinMbb(lefts, lc, "aid", rights, rc, "bid", 3).count())
        time("skew_oc_2nd")(SpatialJoin3d.knnJoinMbbOc(lefts, lc, "aid", rights, rc, "bid", 3).count())
      case "knn3dstages" =>
        time("warmup")(Queries.qKnn3d(spark, "/root/testdata/sf0.001").count())
        val l3 = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val ms = si.completionTime.get - si.submissionTime.get
            if (ms > 100)
              println(f"[probe] stage ${si.stageId}%4d ${ms}%6d ms  tasks=${si.numTasks}%4d  shufW=${si.taskMetrics.shuffleWriteMetrics.recordsWritten}%9d  ${si.name.take(70)}")
          }
        }
        spark.sparkContext.addSparkListener(l3)
        time("knn3d_sf0.1")(Queries.qKnn3d(spark, dir).count())
        Thread.sleep(1000)
      case "knnstages" =>
        time("warmup")(Queries.qKnn(spark, "/root/testdata/sf0.001").count())
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val ms = si.completionTime.get - si.submissionTime.get
            if (ms > 200)
              println(f"[probe] stage ${si.stageId}%4d ${ms}%6d ms  tasks=${si.numTasks}%4d  ${si.name.take(90)}")
          }
        }
        spark.sparkContext.addSparkListener(listener)
        time("knn")(Queries.qKnn(spark, dir).count())
        Thread.sleep(1000)
      case "pm" =>
        time("warmup")(Queries.qPairMeasures(spark, "/root/testdata/sf0.001").count())
        time("pm1")(Queries.qPairMeasures(spark, dir).count())
        time("pm2")(Queries.qPairMeasures(spark, dir).count())
        time("touches1")(Queries.qSpjoinTouches(spark, dir).count())
        time("touches2")(Queries.qSpjoinTouches(spark, dir).count())
      case "unigram10x" =>
        // SCALE.md sf1b watch item: unigram_encode's x10 lane swung
        // 4.1 -> 16.7 s between two records. Reproduce the lane standalone
        // (frozen model trained on sf0.1, encode the 10-copy corpus from
        // the sf1b run's /tmp dataset) with a stage breakdown, min-of-4.
        import org.apache.spark.sql.functions.{col, size, sum}
        val docs10 = spark.read.parquet("/tmp/graft_scale/sf1_docs_10")
        val model = graft.text.UnigramTrainer.modelFromCounts(
          graft.text.UnigramTrainer.train(
            spark.read.parquet("/root/testdata/sf0.1/documents.parquet"),
            "text", vocabSize = 400, maxPieceLen = 4, emIters = 1))
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val ms = si.completionTime.get - si.submissionTime.get
            if (ms > 400)
              println(f"[probe] stage ${si.stageId}%4d ${ms}%6d ms  tasks=${si.numTasks}%4d  ${si.name.take(80)}")
          }
        }
        spark.sparkContext.addSparkListener(listener)
        def enc(): Long = graft.text.UnigramTrainer.encode(
            docs10, "doc_id", "text", model)
          .agg(sum(size(col("tokens")))).first().getLong(0)
        (1 to 4).foreach { i => System.gc(); time(s"unigram10x_$i")(enc()) }
      case "dedupplan" =>
        time("warmup")(Queries.qDedupNgram(spark, "/root/testdata/sf0.001").count())
        println(Queries.qDedupNgram(spark, dir).queryExecution.executedPlan.toString.take(4000))
        time("dedup_aqe_on")(Queries.qDedupNgram(spark, dir).count())
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        time("dedup_aqe_off")(Queries.qDedupNgram(spark, dir).count())
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      case "dedupstages" =>
        time("warmup")(Queries.qDedupNgram(spark, "/root/testdata/sf0.001").count())
        time("warmup2")(Queries.qMinhashLsh(spark, "/root/testdata/sf0.001").count())
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val ms = si.completionTime.get - si.submissionTime.get
            if (ms > 300)
              println(f"[probe] stage ${si.stageId}%4d ${ms}%6d ms  tasks=${si.numTasks}%4d  ${si.name.take(80)}")
          }
        }
        spark.sparkContext.addSparkListener(listener)
        time("dedup_ngram")(Queries.qDedupNgram(spark, dir).count())
        println("[probe] ---- minhash ----")
        time("minhash")(Queries.qMinhashLsh(spark, dir).count())
        Thread.sleep(1000)
      case "store" =>
        time("warmup")(Queries.qStoreContainment(spark, "/root/testdata/sf0.001").count())
        time("store1")(Queries.qStoreContainment(spark, dir).count())
        time("store2")(Queries.qStoreContainment(spark, dir).count())
      case "storeparts" =>
        import graft.sources.SpatialStore
        import graft.operators.SpatialJoin
        time("warmup")(Queries.qStoreContainment(spark, "/root/testdata/sf0.001").count())
        val path = "/tmp/graft_probe_store"
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val ms = si.completionTime.get - si.submissionTime.get
            if (ms > 100)
              println(f"[probe] stage ${si.stageId}%4d ${ms}%6d ms  tasks=${si.numTasks}%4d  ${si.name.take(80)}")
          }
        }
        spark.sparkContext.addSparkListener(listener)
        time("write") {
          SpatialStore.writeDirs(Queries.partBoxes(spark, dir), "geom", path,
            SpatialJoin.Config(partitioner = "fg", bucket = 300)); 0L
        }
        val window = graft.core.GeometryCodec.toWkb(
          graft.core.GeometryCodec.box(50, 40, 170, 180))
        time("read")(SpatialStore.containmentRead(spark, path, window).count())
        time("read2")(SpatialStore.containmentRead(spark, path, window).count())
      case "store3dparts" =>
        import graft.sources.SpatialStore3d
        import graft.operators.SpatialJoin3d.Mbb3Cols
        import org.apache.spark.sql.functions.col
        time("warmup")(Queries.qStoreContainment3d(spark, "/root/testdata/sf0.001").count())
        val path = "/tmp/graft_probe_store3d"
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val ms = si.completionTime.get - si.submissionTime.get
            if (ms > 100)
              println(f"[probe] stage ${si.stageId}%4d ${ms}%6d ms  tasks=${si.numTasks}%4d  ${si.name.take(80)}")
          }
        }
        spark.sparkContext.addSparkListener(listener)
        def cubes = Queries.partCubes(spark, dir).select(col("id"),
          col("x0"), col("y0"), col("z0"),
          (col("x0") + col("w")).as("x1"), (col("y0") + col("w")).as("y1"),
          (col("z0") + col("w")).as("z1"))
        (1 to 2).foreach { i =>
          time(s"write$i") {
            SpatialStore3d.writeDirs(cubes,
              Mbb3Cols("x0", "y0", "z0", "x1", "y1", "z1"), path, leafCap = 64); 0L
          }
        }
        val window = Array(50.0, 40.0, 30.0, 170.0, 180.0, 160.0)
        time("read")(SpatialStore3d.containmentRead(spark, path, window).count())
        time("read2")(SpatialStore3d.containmentRead(spark, path, window).count())
      case "equals" =>
        time("warmup")(Queries.qSpjoinEquals(spark, "/root/testdata/sf0.001").count())
        time("equals1")(Queries.qSpjoinEquals(spark, dir).count())
        time("equals2")(Queries.qSpjoinEquals(spark, dir).count())
      case "slow3" =>
        // the round-3 killers: JTS relate()-bound refine, now envelope math
        time("warmup")(Queries.qSpjoinOverlaps(spark, "/root/testdata/sf0.001").count())
        time("overlaps")(Queries.qSpjoinOverlaps(spark, dir).count())
        time("within")(Queries.qSpjoinWithin(spark, dir).count())
        time("fields")(Queries.qFields(spark, dir).count())
        time("dwithin")(Queries.qSpjoinDwithin(spark, dir).count())
        time("knn_after")(Queries.qKnn(spark, dir).count())
        time("knn_bounded")(Queries.qKnnBounded(spark, dir).count())
        time("ann_topk")(Queries.qAnnTopk(spark, dir).count())
      case "ivf" =>
        time("warmup")(Queries.qAnnIvf(spark, "/root/testdata/sf0.001").count())
        time("ivf1")(Queries.qAnnIvf(spark, dir).count())
        time("ivf2")(Queries.qAnnIvf(spark, dir).count())
        time("ann_lsh1")(Queries.qAnnLsh(spark, dir).count())
        time("ann_lsh2")(Queries.qAnnLsh(spark, dir).count())
      case "roundtrips" =>
        time("warmup")(Queries.qWktRoundtrip(spark, "/root/testdata/sf0.001").count())
        time("wkt_roundtrip")(Queries.qWktRoundtrip(spark, dir).count())
        time("mbb_roundtrip")(Queries.qMbbRoundtrip(spark, dir).count())
        time("hcdist")(Queries.qSpjoinHcdist(spark, dir).count())
        time("partition_quality")(Queries.qPartitionQuality(spark, dir).count())
        time("wholefile")(Queries.qWholeFile(spark, dir).count())
      case "crosses" =>
        time("warmup")(Queries.qSpjoinCrosses(spark, "/root/testdata/sf0.001").count())
        time("crosses1")(Queries.qSpjoinCrosses(spark, dir).count())
        time("crosses2")(Queries.qSpjoinCrosses(spark, dir).count())
        time("touches1")(Queries.qSpjoinTouches(spark, dir).count())
        time("touches2")(Queries.qSpjoinTouches(spark, dir).count())
      case "hygiene" =>
        // within-session degradation probe (verdict r8 #2): five gates, two
        // passes in ONE session, no System.gc between — run2/run1 per gate
        // should stay <= 1.3. Telemetry between gates: persistent-RDD block
        // count (localCheckpoint / persist leak signal) and the latency of a
        // trivial action (leaked QueryExecutionListeners tax every action).
        val gates: Seq[(String, String => Long)] = Seq(
          "minhash_lsh" -> ((d: String) => Queries.qMinhashLsh(spark, d).count()),
          "dedup_ngram" -> ((d: String) => Queries.qDedupNgram(spark, d).count()),
          "dedup_cluster" -> ((d: String) => Queries.qDedupCluster(spark, d).count()),
          "corpus_clean" -> ((d: String) => Queries.qCorpusClean(spark, d).count()),
          "decontaminate" -> ((d: String) => Queries.qDecontaminate(spark, d).count()),
          // round-9b additions: span dedup persists the gram relation
          // (CacheHygiene lifecycle), bpe_encode trains + checkpoints
          // per call — both must leave no blocks behind
          "dedup_spans" -> ((d: String) => Queries.qDedupSpans(spark, d).count()),
          "bpe_encode" -> ((d: String) => Queries.qBpeEncode(spark, d).count()),
          // round-10 additions: the keyJaccard persist users outside the
          // text lane (CDC chunks, video samples, containment shingles) —
          // each persists a key relation per call and must release it
          "cdc_dedup" -> ((d: String) => Queries.qCdcDedup(spark, d).count()),
          "video_neardup" -> ((d: String) => Queries.qVideoNeardup(spark, d).count()),
          "text_containment" -> ((d: String) => Queries.qTextContainment(spark, d).count()))
        // JIT/codegen warmup at the smallest SF so pass-1 at sf0.1 is
        // steady-state and the pass ratio isolates SESSION aging, not JIT
        gates.foreach { case (_, f) =>
          try { f("/root/testdata/sf0.001") } catch { case _: Throwable => () }
        }
        def telemetry(): String = {
          val rdds = spark.sparkContext.getPersistentRDDs
          val blocks = rdds.values.map(_.partitions.length).sum
          val t0 = System.nanoTime()
          spark.range(100).count()
          val triv = (System.nanoTime() - t0) / 1e6
          f"persistentRdds=${rdds.size}%3d parts=$blocks%5d trivialAction=${triv}%7.1f ms"
        }
        val r = Array.ofDim[Double](2, gates.length)
        for (pass <- 0 until 2; i <- gates.indices) {
          val (name, f) = gates(i)
          val t0 = System.nanoTime()
          f(dir)
          r(pass)(i) = (System.nanoTime() - t0) / 1e9
          println(f"[probe] pass${pass + 1} $name%-15s ${r(pass)(i)}%6.2f s  ${telemetry()}")
        }
        var worst = 0.0
        gates.indices.foreach { i =>
          val ratio = r(1)(i) / r(0)(i)
          worst = math.max(worst, ratio)
          println(f"[probe] ratio ${gates(i)._1}%-15s run2/run1 = $ratio%5.2f")
        }
        println(f"[probe] worst run2/run1 = $worst%5.2f (bar: 1.30)")
      case "bpetrain" =>
        // trainer wall-time on real corpora (no gate — merges aren't
        // SQL-oracle-able; spec pins correctness vs a driver reference)
        for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", dir)) {
          val t0 = System.nanoTime()
          val m = graft.text.BpeTrainer.train(
            Queries.table(spark, sf, "documents"), "text", numMerges = 20)
          println(f"[probe] bpetrain $sf%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
            s"merges=${m.size} top=${m.take(3).map(x => x.left + "+" + x.right).mkString(",")}")
        }
      case "minhashcpu" =>
        // attribute stage-25's ~30 s CPU: shingle+explode alone, +string
        // xxhash, +64-min aggregate, full signatures, full gate
        import org.apache.spark.sql.functions._
        import graft.text.TextFunctions
        val docs = Queries.table(spark, dir, "documents")
        def shing = docs.select(col("doc_id"),
          explode(TextFunctions.wordShingles(col("text"), 3)).as("__s"))
        time("warmup")(shing.count())
        time("explode_only")(shing.count())
        time("explode_hash")(shing.select(col("doc_id"), xxhash64(col("__s")).as("h")).count())
        time("tokens_only")(docs.select(size(split(col("text"), " "))).agg(sum("size(split(text,  , -1))")).count())
        time("signatures")(graft.dedup.TextDedup.minHashSignatures(docs, "doc_id", "text", 3, 64).count())
        time("signatures_2nd")(graft.dedup.TextDedup.minHashSignatures(docs, "doc_id", "text", 3, 64).count())
        time("gate")(Queries.qMinhashLsh(spark, dir).count())
        time("gate_2nd")(Queries.qMinhashLsh(spark, dir).count())
      case "minhash" =>
        time("warmup")(Queries.qMinhashLsh(spark, "/root/testdata/sf0.001").count())
        time("minhash1")(Queries.qMinhashLsh(spark, dir).count())
        time("minhash2")(Queries.qMinhashLsh(spark, dir).count())
        time("partition_viz1")(Queries.qPartitionViz(spark, dir).count())
        time("partition_viz2")(Queries.qPartitionViz(spark, dir).count())
        time("dedup_cluster1")(Queries.qDedupCluster(spark, dir).count())
        time("dedup_cluster2")(Queries.qDedupCluster(spark, dir).count())
        time("corpus_clean1")(Queries.qCorpusClean(spark, dir).count())
        time("corpus_clean2")(Queries.qCorpusClean(spark, dir).count())
      case "contains" =>
        time("warmup")(Queries.qSpjoinContains(spark, "/root/testdata/sf0.001").count())
        time("contains")(Queries.qSpjoinContains(spark, dir).count())
        time("intersects")(Queries.qSpjoinIntersects(spark, dir).count())
        time("simhash")(Queries.qSimhash(spark, dir).count())
        time("minhash")(Queries.qMinhashLsh(spark, dir).count())
      case "minhashvariants" =>
        // verdict r4 #4: is the sig_agreement estimate-before-dedup plan the
        // floor for q_minhash_lsh, or did the reformulation lose time vs the
        // r3 HOF-free variant? Three estimate formulations over the SAME
        // banded candidate join, plus the gate query (which adds the
        // signature checkpoint write the oracle needs).
        import org.apache.spark.sql.{Column, DataFrame}
        import org.apache.spark.sql.functions._
        import graft.dedup.TextDedup
        def pairs(dir: String)(finish: (DataFrame, String) => DataFrame): Long = {
          val sig = TextDedup.minHashSignatures(
            Queries.table(spark, dir, "documents"), "doc_id", "text", 3, 64)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val bandStructs = array((0 until 16).map { bnd =>
            struct(lit(bnd).as("band"),
              xxhash64(slice(col("minhash"), bnd * 4 + 1, 4)).as("key"))
          }: _*)
          val banded = sig.select(col("doc_id"), col("minhash"),
            explode(bandStructs).as("b"))
            .select(col("doc_id"), col("minhash"),
              col("b.band").as("band"), col("b.key").as("key"))
          val n = finish(banded, "doc_id").count()
          sig.unpersist()
          n
        }
        def joined(banded: DataFrame, id: String): DataFrame = {
          val a = banded.select(col(id).as("ida"), col("minhash").as("ma"),
            col("band"), col("key"))
          val b = banded.select(col(id).as("idb"), col("minhash").as("mb"),
            col("band"), col("key"))
          a.join(b.hint("shuffle_hash"), Seq("band", "key"))
            .where(col("ida") < col("idb"))
        }
        def estPlan(est: (Column, Column) => Column)(banded: DataFrame, id: String): DataFrame =
          joined(banded, id)
            .withColumn("est_jaccard", est(col("ma"), col("mb")).cast("double") / lit(64.0))
            .where(col("est_jaccard") >= 0.5)
            .select(col("ida"), col("idb"), col("est_jaccard"))
            .dropDuplicates("ida", "idb")
        val sigAgree = estPlan(graft.functions.sig_agreement(_, _)) _
        val zipWith = estPlan((a, b) =>
          size(filter(zip_with(a, b, (x, y) => x === y), v => v))) _
        // band-count estimate: never touches the signatures after banding —
        // candidate strength = #matching bands (lighter shuffle, coarser
        // estimate: 16 levels vs 64; NOT gate-equivalent, plan-cost probe only)
        def bandCount(banded: DataFrame, id: String): DataFrame = {
          val a = banded.select(col(id).as("ida"), col("band"), col("key"))
          val b = banded.select(col(id).as("idb"), col("band"), col("key"))
          a.join(b.hint("shuffle_hash"), Seq("band", "key"))
            .where(col("ida") < col("idb"))
            .groupBy("ida", "idb").agg(count(lit(1)).as("bands_matched"))
            .where(col("bands_matched") >= 8)
        }
        time("warmup")(pairs(dir)(sigAgree))
        for (i <- 1 to 2) {
          time(s"sig_agreement_$i")(pairs(dir)(sigAgree))
          time(s"zip_with_$i")(pairs(dir)(zipWith))
          time(s"band_count_$i")(pairs(dir)(bandCount))
          time(s"gate_with_aux_$i")(Queries.qMinhashLsh(spark, dir).count())
        }
      case "gate" =>
        // generic min-of-N for ONE gate: `runMain graft.PerfProbe gate
        // <name> [reps]` — dedicated JVM, sf0.001 warmup, N timed runs,
        // min printed last. The clean-room twin of one driver-bench entry,
        // for regression attribution without the 167-gate JVM pressure.
        val name = args(1)
        val reps = if (args.length > 2) args(2).toInt else 5
        val fn = SparkEntry.queries(name)
        time("warmup")(fn(spark, "/root/testdata/sf0.001").count())
        val times = (1 to reps).map { i =>
          System.gc()
          val t0 = System.nanoTime()
          val n = fn(spark, dir).count()
          val s = (System.nanoTime() - t0) / 1e9
          println(f"[probe] $name%-20s run$i ${s}%8.2f s  rows=$n")
          s
        }
        println(f"[probe] $name%-20s min  ${times.min}%8.2f s  (n=$reps)")
    }
    spark.stop()
  }
}
