package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.functions.st_makebox
import graft.operators.SpatialJoin

/** 100x scale rehearsal (round-4 verdict #6): generates inputs ~100x the
  * bench SF in /tmp and runs the heaviest operator families once, printing
  * wall time, shuffle volume, tile balance, and whether the skew paths
  * (hot-tile salting, two-level tiling) actually engage. Results are
  * recorded in SCALE.md. Deliberately NOT a driver gate — this is the
  * measurement harness behind the "plans survive 100x" claim, so the data
  * is synthetic-at-scale: constant spatial density (like TPC-H SF scaling)
  * plus an unsplittable hotspot, and a salted 100-copy corpus whose
  * near-dup structure repeats per copy but never across copies.
  */
object ScaleRehearsal {
  private val dir = "/tmp/graft_scale"

  /** Sums shuffle bytes across completed stages between resets. */
  private final class ShuffleMeter extends SparkListener {
    @volatile var write = 0L
    @volatile var read = 0L
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        write += m.shuffleWriteMetrics.bytesWritten
        read += m.shuffleReadMetrics.totalBytesRead
      }
    }
    def reset(): Unit = { write = 0L; read = 0L }
  }

  def main(args: Array[String]): Unit = {
    val nBoxes = args.headOption.map(_.toLong).getOrElse(2000000L)
    val copies = if (args.length > 1) args(1).toInt else 100
    // section selector: all | spatial+text (legacy sections) | ann
    val mode = if (args.length > 2) args(2) else "all"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    def timed[T](name: String)(f: => T): T = {
      meter.reset()
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give completed-stage events a beat to land
      // AFTER the clock is read — a sleep inside the timed window would add
      // a constant 0.3 s to every measurement and flatten growth ratios
      Thread.sleep(300)
      println(f"[scale] $name%-26s $sec%8.1f s" +
        f"  shuffleW=${meter.write / 1e9}%8.3f GB  shuffleR=${meter.read / 1e9}%8.3f GB")
      r
    }

    // ------------------------------------------------------- ANN at 100x
    // 2M 64-dim vectors (100x the sf0.1 embeddings table): a 256-center
    // mixture (center signal + 25% noise, all xxhash-derived and
    // deterministic) so centroid/codebook training has real structure to
    // find — uniform random vectors would make ANY index's recall
    // meaningless. 200 queries drawn from the items.
    if (mode == "all" || mode == "ann") {
      val nVec = 2000000L
      val dim = 64
      timed("gen_vecs") {
        def u(salt: Int, key: Column) =
          pmod(xxhash64(key, lit(salt)), lit(1000L)).cast("double") / 500.0 - 1.0
        spark.range(nVec).select(col("id").as("vec_id"),
            transform(sequence(lit(0), lit(dim - 1)), j =>
              (u(1, concat(col("id") % 256, lit(":"), j)) +
               u(2, concat(col("id"), lit(":"), j)) * 0.25).cast("float"))
              .as("embedding"))
          .write.mode("overwrite").parquet(s"$dir/vecs")
      }
      val vecs = spark.read.parquet(s"$dir/vecs")
      val items = vecs.select(col("vec_id").as("nid"), col("embedding").as("ivec"))
      val queries = vecs.where(col("vec_id") % 10000 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val k = 10
      val brute = timed("ann_brute_topk") {
        graft.ann.Similarity.topKBrute(items, "nid", "ivec",
            queries, "qid", "qvec", k)
          .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1)))
      }
      val bruteSet = brute.toSet
      def recall(got: Array[(Long, Long)]): Double =
        bruteSet.count(got.toSet.contains).toDouble / bruteSet.size
      val ivf = timed("ivf_train[nlist=256]") {
        graft.ann.IvfIndex.train(items, "ivec", nlist = 256)
      }
      // index BUILD (one-time, amortized across every future query batch)
      // vs QUERY path, measured separately: a deployment materializes the
      // assignment table once and serves queries from it — timing them
      // together would charge every query batch the 2M-item build
      val assignTbl = timed("ivf_assign_build[2M]") {
        val a = graft.ann.IvfIndex.assignments(items, "nid", "ivec", ivf)
        a.write.mode("overwrite").parquet(s"$dir/ivf_assign")
        spark.read.parquet(s"$dir/ivf_assign")
      }
      for (nprobe <- Seq(1, 4, 8)) {
        val got = timed(s"ivf_topk[nprobe=$nprobe]") {
          graft.ann.IvfIndex.topK(items, "nid", "ivec",
              queries, "qid", "qvec", k, ivf, nprobe)
            .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1)))
        }
        println(f"[scale]   -> ${got.length} rows recall@$k=${recall(got)}%.3f")
        val gotIdx = timed(s"ivf_topk_indexed[nprobe=$nprobe]") {
          val probes = graft.ann.IvfIndex.probeLists(queries, "qid", "qvec", ivf, nprobe)
          graft.ann.IvfIndex.topKFromAssignments(items, "nid", "ivec",
              queries, "qid", "qvec", k, assignTbl, probes)
            .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1)))
        }
        println(f"[scale]   -> ${gotIdx.length} rows recall@$k=${recall(gotIdx)}%.3f")
      }
      val lsh = timed("lsh_topk[bits=12,tables=4]") {
        graft.ann.Similarity.topKLsh(items, "nid", "ivec",
            queries, "qid", "qvec", k)
          .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1)))
      }
      println(f"[scale]   -> ${lsh.length} rows recall@$k=${recall(lsh)}%.3f")
      // IVF-PQ: coarse lists bound the scan, PQ codes bound the memory —
      // the composition a 100 TB deployment runs (codes are 16 B/vector vs
      // 256 B raw), with the ADC shortlist re-ranked exactly
      val pq = timed("pq_train[m=16,codes=64]") {
        graft.ann.PqIndex.train(items, "ivec", m = 16, codes = 64)
      }
      val ivfPq = timed("ivfpq_rerank[nprobe=8,short=50]") {
        val probes = graft.ann.IvfIndex.probeLists(queries, "qid", "qvec", ivf, 8)
        val cand = probes.join(assignTbl, Seq("list")).select(col("qid"), col("nid"))
        graft.ann.PqIndex.topKRerank(items, "nid", "ivec",
            queries, "qid", "qvec", k, pq, shortlist = 50, Some(cand))
          .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1)))
      }
      println(f"[scale]   -> ${ivfPq.length} rows recall@$k=${recall(ivfPq)}%.3f")
      // residual IVF-PQ: codebooks on coarse-centroid residuals — the
      // clustered-corpus fix for the raw-PQ code-collapse measured above.
      // codes=256 = the standard 8-bit codebook (m=16 x 1 B = 16 B/vector);
      // the shortlist sweep shows the recall/cost knob
      val pqR = timed("pq_train_residual[m=16,codes=256]") {
        graft.ann.PqIndex.trainResidual(items, "ivec", ivf, m = 16, codes = 256)
      }
      for (short <- Seq(50, 200)) {
        val ivfPqR = timed(s"ivfpq_residual_rerank[nprobe=8,short=$short]") {
          graft.ann.PqIndex.topKRerankResidual(items, "nid", "ivec",
              queries, "qid", "qvec", k, pqR, ivf, nprobe = 8, shortlist = short)
            .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1)))
        }
        println(f"[scale]   -> ${ivfPqR.length} rows recall@$k=${recall(ivfPqR)}%.3f")
        // compact layout: same integer ADC, |candidates| rows instead of
        // |candidates| x m — the production read path
        val ivfPqC = timed(s"ivfpq_residual_compact[nprobe=8,short=$short]") {
          graft.ann.PqIndex.topKRerankResidualCompact(items, "nid", "ivec",
              queries, "qid", "qvec", k, pqR, ivf, nprobe = 8, shortlist = short)
            .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1)))
        }
        println(f"[scale]   -> ${ivfPqC.length} rows recall@$k=${recall(ivfPqC)}%.3f")
      }
      if (mode == "ann") { spark.stop(); return }
    }

    // -------------------- round-8 pipeline operators at 100x (500k docs)
    // repetition stats, sequence packing, decontamination over the salted
    // 100-copy corpus: the three shapes are a scan+explode aggregate, a
    // distributed prefix sum, and a broadcast semi-join — none should
    // shuffle the corpus more than once.
    if (mode == "pipeline") {
      import graft.text.{SequencePack, TextFunctions}
      timed("gen_docs") {
        val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
          .select("doc_id", "text")
        docs0.crossJoin(spark.range(copies).select(col("id").as("copy")))
          .repartition(64) // the crossJoin writes ONE giant file otherwise
          .select((col("doc_id") + col("copy") * 10000000L).as("doc_id"),
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("c"), col("copy"), lit("$1"))).as("text"))
          .write.mode("overwrite").parquet(s"$dir/docs")
      }
      val docs = spark.read.parquet(s"$dir/docs")
      println(s"[scale] docs=${docs.count()}")
      val nRep = timed("repetition[500k docs]") {
        val base = docs.select(col("doc_id"),
          TextFunctions.dupLineFrac(col("text")).as("dlf"),
          TextFunctions.tokenCount(col("text")).as("n_words"))
        val top = docs.select(col("doc_id"),
            explode(TextFunctions.tokens(col("text"))).as("w"))
          .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id")).agg(max(col("c")).as("top_word_n"))
        base.join(top, Seq("doc_id")).count()
      }
      println(s"[scale]   -> $nRep rows")
      val nPack = timed("seq_pack[500k docs]") {
        SequencePack.packChunks(
          docs.select(col("doc_id"),
            TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens")),
          "doc_id", "n_tokens", 2048L)
          .agg(max(col("last_chunk"))).head().getLong(0)
      }
      println(s"[scale]   -> last_chunk=$nPack")
      val nCon = timed("decontaminate[500k docs]") {
        val sh = docs.select(col("doc_id"),
          explode(TextFunctions.wordShingles(col("text"), 3)).as("s0"))
          .select(col("doc_id"), xxhash64(col("s0")).as("s"))
        val bench = sh.where(col("doc_id") % 5000 === 0).select(col("s")).distinct()
        sh.where(col("doc_id") % 5000 =!= 0)
          .join(org.apache.spark.sql.functions.broadcast(bench), Seq("s"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
          .count()
      }
      println(s"[scale]   -> $nCon contaminated docs")
      // line-level dedup at 500k docs: the per-copy token salt makes most
      // lines distinct ACROSS copies but duplicated WITHIN a copy's shared
      // phrasing; the empty/short lines are the hot keys the partial
      // min(struct) must absorb map-side
      val nLd = timed("dedup_lines[500k docs]") {
        graft.dedup.TextDedup.dedupLinesAcross(docs, "doc_id", "text").count()
      }
      println(s"[scale]   -> $nLd docs with surviving lines")
      // span dedup at 500k docs: the gram stream is one 16-byte row per
      // token position (same order as the corpus itself); the per-copy
      // token salt makes spans duplicate only WITHIN a copy, so loser
      // volume stays bounded while the winner aggregate's partial
      // min(struct)/count still absorb the corpus-wide hot grams map-side
      val nSd = timed("dedup_spans[500k docs]") {
        graft.dedup.TextDedup.dedupSpansAcross(docs, "doc_id", "text", k = 5)
          .count()
      }
      println(s"[scale]   -> $nSd docs with surviving tokens")
      // BPE trainer at 500k docs: cost must track the VOCAB (distinct
      // pretokens), not the corpus — the salt multiplies the vocab ~100x
      // vs the gate corpus, the corpus 100x; 10 merges end-to-end
      val bpeMerges = timed("bpe_train_10[500k docs]") {
        graft.text.BpeTrainer.train(docs, "text", numMerges = 10)
      }
      println(s"[scale]   -> ${bpeMerges.size} merges")
      // full encode under the trained list: one kernel scan, no shuffle
      // (the aggregate is a scalar sum)
      val nEnc = timed("bpe_encode[500k docs]") {
        docs.select(sum(size(
          graft.text.BpeTrainer.encode(col("text"), bpeMerges))))
          .head().getLong(0)
      }
      println(s"[scale]   -> $nEnc tokens")
      spark.stop(); return
    }

    // -------------------- sf1: the sf0.1 -> sf1.0 scale step (round-10
    // verdict #8). The six headline gate families at sf0.1-equivalent
    // volume and 10x that, with the scale-up done the way TPC-H scales —
    // constant spatial density (space side grows by sqrt(10)) and
    // content-independent document copies — so LINEAR wall growth is the
    // pass bar. Spatial runs at 10x get bucket scaled with N (the knob a
    // user retunes per SF; the fixed-bucket 10x run is also measured to
    // show what NOT retuning costs). ANN uses a FIXED 200-query batch at
    // both scales: at 100 TB the query batch is independent of corpus
    // size (the gate's own query set scales with vec_id%50 — that growth
    // is the gate construction, not the operator).
    // Shared sf1/sf1b machinery: generators are defs (no data until a mode
    // branch materializes what it needs), the step helper is the min-of-2
    // growth-ratio protocol, and printRatios renders the pass-bar summary.
    if (mode == "sf1" || mode == "sf1b") {
      import graft.functions.st_point
      def writeRead(df: DataFrame, path: String): DataFrame = {
        df.write.mode("overwrite").parquet(s"$dir/$path")
        spark.read.parquet(s"$dir/$path")
      }
      def u(salt: Int, key: Column): Column =
        pmod(xxhash64(key, lit(salt)), lit(1000000L)).cast("double") / 1000000.0
      // constant density 0.5 boxes/unit^2 (the round-5 rehearsal's), side
      // 1-10 — 20k boxes over 200x200 at 1x, 200k over 632x632 at 10x
      def boxes(n: Long, space: Double, salt: Int, path: String): DataFrame =
        writeRead(spark.range(n).select(col("id"),
            (u(salt, col("id")) * space).as("x0"),
            (u(salt + 1, col("id")) * space).as("y0"),
            (lit(1.0) + u(salt + 2, col("id")) * 9.0).as("w"))
          .withColumn("geom", st_makebox(col("x0"), col("y0"),
            col("x0") + col("w"), col("y0") + col("w")))
          .repartition(32), path)
      def points(n: Long, space: Double, salt: Int, path: String): DataFrame =
        writeRead(spark.range(n).select(col("id"),
            (u(salt, col("id")) * space).as("px"),
            (u(salt + 1, col("id")) * space).as("py"))
          .withColumn("geom", st_point(col("px"), col("py")))
          .repartition(32), path)
      // 10 content-independent copies of the sf0.1 corpus (per-copy word
      // prefix — the round-5 technique: per-copy shingle doc-frequencies
      // match the corpus's, cross-copy similarity 0)
      def docsAt(copies: Int, path: String): DataFrame =
        writeRead(spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
          .select("doc_id", "text")
          .crossJoin(spark.range(copies).select(col("id").as("copy")))
          .repartition(32)
          .select((col("doc_id") + col("copy") * 10000000L).as("doc_id"),
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("c"), col("copy"), lit("$1"))).as("text")), path)
      // corpus_clean's language/quality filters read STOPWORD ratios, so
      // its copies must salt only non-stopword tokens: stopword ratio (and
      // hence every filter decision) is bit-identical to the raw corpus,
      // while cross-copy shingles stay distinct (all-stopword 3-shingles
      // are the only shared ones) — content-independent copies for a
      // content-SENSITIVE operator. The all-prefixed corpus above fed to
      // corpus_clean classifies every doc "und" and measures nothing.
      def docsStopSafe(copies: Int, path: String): DataFrame = {
        val stopAlt = graft.text.TextFunctions.Stopwords.mkString("|")
        writeRead(spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
          .select("doc_id", "text")
          .crossJoin(spark.range(copies).select(col("id").as("copy")))
          .repartition(32)
          .select((col("doc_id") + col("copy") * 10000000L).as("doc_id"),
            regexp_replace(col("text"),
              lit(s"(^| )(?!(?:$stopAlt)( |$$))(\\S+)"),
              concat(lit("$1c"), col("copy"), lit("$3"))).as("text")), path)
      }
      // 64-dim 16-center mixture (the ann rehearsal's shape at gate nlist)
      def vecs(n: Long, path: String): DataFrame =
        writeRead(spark.range(n).select(col("id").as("vec_id"),
            transform(sequence(lit(0), lit(63)), j =>
              (u(1, concat(col("id") % 16, lit(":"), j)) - 0.5 +
               (u(2, concat(col("id"), lit(":"), j)) - 0.5) * 0.5)
                .cast("float")).as("embedding"))
          .repartition(32), path)

      val results = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
      // GRAFT_SCALE_ONLY=a,b,c runs only the named steps — for A/B reruns
      // of one family (e.g. old-vs-new engine in a worktree) without
      // paying the whole sf1 suite
      val onlySteps = sys.env.get("GRAFT_SCALE_ONLY")
        .map(_.split(",").map(_.trim).toSet)
      def step(name: String, scales: Seq[String])(run: String => Long): Unit = {
        if (onlySteps.exists(!_.contains(name))) return
        val times = scales.map { s =>
          // min-of-2: the first execution of a family JIT-compiles its
          // kernels, and x1 runs first — without this the x1 number
          // carries the warmup and every ratio reads falsely sub-linear
          val runs = (1 to 2).map { _ =>
            meter.reset(); System.gc()
            val t0 = System.nanoTime()
            val n = run(s)
            // read the clock BEFORE the listener-bus settle sleep: a sleep
            // inside the window adds a constant +0.3 s that biases x10/x1
            // growth ratios toward sub-linear
            val sec = (System.nanoTime() - t0) / 1e9
            Thread.sleep(300)
            (sec, n, meter.write)
          }
          val (sec, n, sw) = runs.minBy(_._1)
          println(f"[scale] $name%-22s $s%-8s ${sec}%7.1f s  rows=$n%,12d" +
            f"  shuffleW=${sw / 1e9}%7.3f GB")
          sec
        }
        results(name) = times
      }
      def printRatios(): Unit = {
        println("[scale] ---- growth ratios (linear bar = 10.0) ----")
        results.foreach { case (k, ts) =>
          println(f"[scale] ratio $k%-22s x10/x1 = ${ts(1) / ts(0)}%5.2f" +
            (if (ts.length > 2) f"  (fixed-bucket x10/x1 = ${ts(2) / ts(0)}%5.2f)" else ""))
        }
      }
      // like printRatios but labels every extra scale by its own name —
      // for steps whose third lane is not the sf1 "fixed-bucket" semantics
      def printRatiosNamed(stepScales: Map[String, Seq[String]]): Unit = {
        println("[scale] ---- growth ratios (linear bar = 10.0) ----")
        results.foreach { case (k, ts) =>
          val names = stepScales(k)
          val extras = names.zip(ts).drop(1)
            .map { case (n, t) => f"$n/x1 = ${t / ts.head}%5.2f" }
          println(f"[scale] ratio $k%-22s ${extras.mkString("  ")}")
        }
      }

      // ---- sf1b: the lifecycle families the six-family sf1 step skips —
      // store write/read (2-D + 3-D), span dedup, frozen-model tokenizer
      // encodes, hard-negative mining, and the streaming dedup ingest.
      // Same protocol: content-independent 10x inputs, min-of-2, linear
      // wall growth is the pass bar. Per-SF knobs are retuned the way a
      // 100 TB operator would be: store tiling ∝ N (fixed leaf/tile
      // capacity => 10x leaves), IVF nlist ∝ N (fixed per-list size =>
      // constant per-query probe work), while model sizes (BPE merges,
      // unigram vocab, dedup gram width) stay FIXED — they are corpus-
      // independent hyperparameters.
      if (mode == "sf1b") {
        import graft.sources.{SpatialStore, SpatialStore3d}
        import graft.operators.SpatialJoin3d.Mbb3Cols
        import graft.core.GeometryCodec

        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
          f.delete()
        }
        def leafCount(path: String): Long = {
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.listStatus(p).count(s =>
            s.isDirectory && s.getPath.getName.startsWith(SpatialStore.TileCol + "="))
        }
        // constant density in 3-D: volume x10 => side x 10^(1/3)
        def cubes3(n: Long, space: Double, salt: Int, path: String): DataFrame =
          writeRead(spark.range(n).select(col("id"),
              (u(salt, col("id")) * space).as("x0"),
              (u(salt + 1, col("id")) * space).as("y0"),
              (u(salt + 2, col("id")) * space).as("z0"),
              (lit(1.0) + u(salt + 3, col("id")) * 9.0).as("w"))
            .select(col("id"), col("x0"), col("y0"), col("z0"),
              (col("x0") + col("w")).as("x1"), (col("y0") + col("w")).as("y1"),
              (col("z0") + col("w")).as("z1"))
            .repartition(32), path)

        val b1 = boxes(20000L, 200.0, 11, "sf1_boxes_1")
        val b10 = boxes(200000L, 632.456, 17, "sf1_boxes_10")
        val q1 = cubes3(20000L, 200.0, 43, "sf1_cubes_1")
        val q10 = cubes3(200000L, 430.887, 47, "sf1_cubes_10")
        val d1 = docsAt(1, "sf1_docs_1")
        val d10 = docsAt(10, "sf1_docs_10")
        val v1 = vecs(5000L, "sf1_vecs_1")
        val v10 = vecs(50000L, "sf1_vecs_10")

        // ---- 2-D store lifecycle, TWO x10 lanes: `x10` keeps the
        // per-tile object cap FIXED (500) so leaf COUNT grows 10x — the
        // store-realistic layout (bounded file sizes; at 100 TB files
        // cannot grow with the corpus) — and `x10_cap5000` scales the cap
        // with N (constant leaf count, growing files) to separate the
        // per-leaf file-creation cost from everything else. write = full
        // plan+cluster+partitionBy, read = pruned containment over the
        // central 25%-area window (constant selectivity).
        def st2 = (s: String) => s"$dir/sf1_store2d_$s"
        step("store2d_write", Seq("x1", "x10", "x10_cap5000")) { s =>
          val (b, cap) = s match {
            case "x1" => (b1, 500)
            case "x10" => (b10, 500)
            case _ => (b10, 5000)
          }
          rm(new java.io.File(st2(s)))
          SpatialStore.writeDirs(b.select(col("id"), col("geom")), "geom",
            st2(s), SpatialJoin.Config(bucket = cap))
          leafCount(st2(s))
        }
        step("store2d_read", Seq("x1", "x10", "x10_cap5000")) { s =>
          val space = if (s == "x1") 200.0 else 632.456
          SpatialStore.containmentRead(spark, st2(s),
            GeometryCodec.toWkb(GeometryCodec.box(
              space * 0.25, space * 0.25, space * 0.75, space * 0.75))).count()
        }
        // ---- manifest-committed 2-D store (the 3-D compact lane's
        // discipline mirrored down): SAME fixed cap 500 as store2d_write's
        // x10 lane (tiles ∝ N) — files ∝ write tasks and one manifest
        // commit. Planning identical, so (x10 compact) vs (x10 dirs)
        // isolates the commit protocol.
        def st2c = (s: String) => s"$dir/sf1_store2dc_$s"
        step("store2d_write_compact", Seq("x1", "x10")) { s =>
          val b = if (s == "x1") b1 else b10
          rm(new java.io.File(st2c(s)))
          SpatialStore.writeCompact(b.select(col("id"), col("geom")), "geom",
            st2c(s), SpatialJoin.Config(bucket = 500))
          SpatialStore.readMeta(spark, st2c(s)).tiles.length.toLong
        }
        step("store2d_read_compact", Seq("x1", "x10")) { s =>
          val space = if (s == "x1") 200.0 else 632.456
          SpatialStore.containmentReadCompact(spark, st2c(s),
            GeometryCodec.toWkb(GeometryCodec.box(
              space * 0.25, space * 0.25, space * 0.75, space * 0.75))).count()
        }
        // ---- 3-D store lifecycle, same two x10 lanes: fixed leafCap 300
        // (leaves ∝ N, octree deepens) vs `x10_cap3000` (cap ∝ N,
        // constant leaf count); read = triple-pruned containment over the
        // central window per axis
        def st3 = (s: String) => s"$dir/sf1_store3d_$s"
        step("store3d_write", Seq("x1", "x10", "x10_cap3000")) { s =>
          val (q, cap) = s match {
            case "x1" => (q1, 300)
            case "x10" => (q10, 300)
            case _ => (q10, 3000)
          }
          rm(new java.io.File(st3(s)))
          SpatialStore3d.writeDirs(q,
            Mbb3Cols("x0", "y0", "z0", "x1", "y1", "z1"), st3(s), leafCap = cap)
          leafCount(st3(s))
        }
        step("store3d_read", Seq("x1", "x10", "x10_cap3000")) { s =>
          val space = if (s == "x1") 200.0 else 430.887
          SpatialStore3d.containmentRead(spark, st3(s), Array(
            space * 0.25, space * 0.25, space * 0.25,
            space * 0.75, space * 0.75, space * 0.75)).count()
        }
        // ---- manifest-committed 3-D store (writeCompact, round-12
        // verdict #6): SAME fixed leafCap 300 as store3d_write's x10 lane
        // (leaves ∝ N — the lane whose 7.4× was attributed to per-leaf
        // dir+temp+rename), but files ∝ write tasks and one manifest
        // commit. The octree planning is identical, so (x10 compact) vs
        // (x10 dirs) isolates the commit protocol.
        def st3c = (s: String) => s"$dir/sf1_store3dc_$s"
        step("store3d_write_compact", Seq("x1", "x10")) { s =>
          val q = if (s == "x1") q1 else q10
          rm(new java.io.File(st3c(s)))
          SpatialStore3d.writeCompact(q,
            Mbb3Cols("x0", "y0", "z0", "x1", "y1", "z1"), st3c(s), leafCap = 300)
          SpatialStore3d.readMeta(spark, st3c(s)).leafBoxes.length.toLong
        }
        step("store3d_read_compact", Seq("x1", "x10")) { s =>
          val space = if (s == "x1") 200.0 else 430.887
          SpatialStore3d.containmentReadCompact(spark, st3c(s), Array(
            space * 0.25, space * 0.25, space * 0.25,
            space * 0.75, space * 0.75, space * 0.75)).count()
        }
        // ---- span dedup: gram width fixed (k=5); prefix-salted copies
        // keep per-copy span structure, cross-copy spans distinct. The
        // count(text) aggregate forces the reassembled text, not just rows.
        step("dedup_spans", Seq("x1", "x10")) { s =>
          graft.dedup.TextDedup.dedupSpansAcross(
              if (s == "x1") d1 else d10, "doc_id", "text", k = 5)
            .agg(count(col("text"))).first().getLong(0)
        }
        // ---- tokenizer ENCODE at 10x under a FROZEN model (the 100 TB
        // shape: train once on a sample, encode the corpus) — the sum
        // forces every token array
        val bpeMerges = graft.text.BpeTrainer.train(
          spark.read.parquet("/root/testdata/sf0.1/documents.parquet"),
          "text", numMerges = 8, minCount = 2)
        step("bpe_encode", Seq("x1", "x10")) { s =>
          (if (s == "x1") d1 else d10)
            .select(graft.text.BpeTrainer.encode(col("text"), bpeMerges).as("t"))
            .agg(sum(size(col("t")))).first().getLong(0)
        }
        val ugModel = graft.text.UnigramTrainer.modelFromCounts(
          graft.text.UnigramTrainer.train(
            spark.read.parquet("/root/testdata/sf0.1/documents.parquet"),
            "text", vocabSize = 400, maxPieceLen = 4, emIters = 1))
        step("unigram_encode", Seq("x1", "x10")) { s =>
          graft.text.UnigramTrainer.encode(
              if (s == "x1") d1 else d10, "doc_id", "text", ugModel)
            .agg(sum(size(col("tokens")))).first().getLong(0)
        }
        // ---- hard negatives: corpus-sized query side (every vector mines
        // its own negatives — the query batch GROWS with the corpus, unlike
        // ann_ivf's fixed 200). nlist ∝ N keeps per-anchor candidate work
        // constant; labels decorrelated from the mixture centers (vec_id%7)
        // so negatives survive the label-mismatch filter everywhere.
        step("hard_negatives", Seq("x1", "x10")) { s =>
          val (v, nlist) = if (s == "x1") (v1, 16) else (v10, 160)
          val emb = v.select(col("vec_id"), col("embedding"),
            (col("vec_id") % 7).as("label"))
          val model = graft.ann.IvfIndex.train(emb, "embedding", nlist = nlist)
          graft.ann.HardNegatives.mine(emb, "vec_id", "embedding", "label",
            k = 5, model, nprobe = 3).count()
        }
        // ---- streaming dedup ingest: full lifecycle per run (fresh
        // checkpoint/keys/out), two file-source batches, 10x rows through
        // the same stream graph
        step("stream_dedup", Seq("x1", "x10")) { s =>
          val d = if (s == "x1") d1 else d10
          val base = s"$dir/sf1_stream_$s"
          rm(new java.io.File(base))
          d.where(col("doc_id") % 3 === 1)
            .repartition(8).write.parquet(s"$base/src")
          val stream = spark.readStream
            .schema("doc_id BIGINT, text STRING").parquet(s"$base/src")
          val q = graft.streaming.DedupIngest.start(stream, "doc_id", "text",
            s"$base/out", s"$base/keys", s"$base/ckpt")
          try {
            q.processAllAvailable()
            d.where(col("doc_id") % 3 === 2)
              .repartition(8).write.mode("append").parquet(s"$base/src")
            q.processAllAvailable()
          } finally q.stop()
          spark.read.parquet(s"$base/out").count()
        }

        printRatiosNamed(Map(
          "store2d_write" -> Seq("x1", "x10", "x10_cap5000"),
          "store2d_read" -> Seq("x1", "x10", "x10_cap5000"),
          "store3d_write" -> Seq("x1", "x10", "x10_cap3000"),
          "store3d_read" -> Seq("x1", "x10", "x10_cap3000"),
        ).withDefaultValue(Seq("x1", "x10")))
        spark.stop(); return
      }

      val b1 = boxes(20000L, 200.0, 11, "sf1_boxes_1")
      val b10 = boxes(200000L, 632.456, 17, "sf1_boxes_10")
      val p1 = points(30000L, 200.0, 23, "sf1_pts_1")
      val p10 = points(300000L, 632.456, 29, "sf1_pts_10")
      val s1 = points(2000L, 200.0, 37, "sf1_supp_1")
      val s10 = points(20000L, 632.456, 41, "sf1_supp_10")
      val d1 = docsAt(1, "sf1_docs_1")
      val d10 = docsAt(10, "sf1_docs_10")
      val c1 = docsStopSafe(1, "sf1_cdocs_1")
      val c10 = docsStopSafe(10, "sf1_cdocs_10")
      val v1 = vecs(5000L, "sf1_vecs_1")
      val v10 = vecs(50000L, "sf1_vecs_10")

      def spj(b: DataFrame, bucket: Int): Long = {
        val a = b.select(col("id").as("id1"), col("geom").as("g1"))
        val c = b.select(col("id").as("id2"), col("geom").as("g2"))
        SpatialJoin.join(a, "g1", c, "g2", SpatialJoin.Config(
            predicate = "intersects", partitioner = "fg", bucket = bucket))
          .where(col("id1") < col("id2")).count()
      }
      step("spjoin_intersects", Seq("x1", "x10", "x10_b500")) {
        case "x1"       => spj(b1, 500)
        case "x10"      => spj(b10, 5000)
        case "x10_b500" => spj(b10, 500)
      }
      def dwj(b: DataFrame, p: DataFrame, bucket: Int): Long =
        SpatialJoin.join(
            b.select(col("id").as("pid"), col("geom").as("g1")), "g1",
            p.select(col("id").as("cid"), col("geom").as("g2")), "g2",
            SpatialJoin.Config(predicate = "dwithin", distance = 4.0,
              bucket = bucket)).count()
      step("spjoin_dwithin", Seq("x1", "x10")) {
        case "x1"  => dwj(b1, p1, 500)
        case "x10" => dwj(b10, p10, 5000)
      }
      // the right side crosses knnBroadcastThreshold (10k) between 2k and
      // 20k rights, so the DEFAULT config switches algorithms mid-step and
      // the naive ratio compares broadcast-scan against the tile engine.
      // Measure each path against itself: bcast pins the broadcast plan at
      // both scales (the sub-10k-rights shape), dist pins the distributed
      // two-pass ring plan (the 100 TB shape; its 100x record is SCALE.md
      // "knn2d re-measure").
      def knn(c: DataFrame, s: DataFrame, bucket: Int, bcastThresh: Int): Long =
        SpatialJoin.knnJoinExact(
            c.select(col("id").as("cid"), col("geom").as("g1")), "g1", "cid",
            s.select(col("id").as("sid"), col("geom").as("g2")), "g2", k = 3,
            tieBreak = Seq("sid"),
            cfg = SpatialJoin.Config(bucket = bucket,
              knnBroadcastThreshold = bcastThresh)).count()
      step("knn_exact_bcast", Seq("x1", "x10")) {
        case "x1"  => knn(p1, s1, 500, 30000)
        case "x10" => knn(p10, s10, 5000, 30000)
      }
      step("knn_exact_dist", Seq("x1", "x10")) {
        case "x1"  => knn(p1, s1, 500, 0)
        case "x10" => knn(p10, s10, 5000, 0)
      }
      // tile-local kNN (st_nearest2, q_knn_tile's engine) — its OWN lane
      // instead of inheriting via knnJoinExact (round-12 verdict: the
      // inheritance cited the wrong engine). Right side is the box corpus
      // (dense tiles). x10 at bucket 5000 keeps tile COUNT constant and
      // grows per-tile rows 10x — the auto-bucket shape where the former
      // per-left full scan was bucket^2 per tile; x10_b500 is the 10x-tiles
      // constant-per-tile retune.
      def knnTile(l: DataFrame, r: DataFrame, bucket: Int): Long =
        SpatialJoin.knnJoin(
            l.select(col("id").as("cid"), col("geom").as("g1")), "g1",
            r.select(col("id").as("bid"), col("geom").as("g2")), "g2", k = 3,
            cfg = SpatialJoin.Config(bucket = bucket)).count()
      step("knn_tile", Seq("x1", "x10", "x10_b500")) {
        case "x1"       => knnTile(p1, b1, 500)
        case "x10"      => knnTile(p10, b10, 5000)
        case "x10_b500" => knnTile(p10, b10, 500)
      }
      def mh(docs: DataFrame): Long = {
        val sig = graft.dedup.TextDedup.minHashSignatures(
          docs, "doc_id", "text", n = 3, numHashes = 64)
        graft.dedup.TextDedup.lshPairsFromSignatures(
          sig, "doc_id", numHashes = 64, bands = 16, estThreshold = 0.5).count()
      }
      step("minhash_lsh", Seq("x1", "x10")) {
        case "x1" => mh(d1); case "x10" => mh(d10)
      }
      step("corpus_clean", Seq("x1", "x10")) {
        case "x1"  => graft.text.CorpusClean.clean(c1, "doc_id", "text",
          lang = "en", minQuality = 0.3).count()
        case "x10" => graft.text.CorpusClean.clean(c10, "doc_id", "text",
          lang = "en", minQuality = 0.3).count()
      }
      def ivf(v: DataFrame): Long = {
        val items = v.select(col("vec_id").as("nid"), col("embedding").as("ivec"))
        val queries = v.orderBy(col("vec_id")).limit(200)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val model = graft.ann.IvfIndex.train(items, "ivec", nlist = 16)
        val assign = graft.ann.IvfIndex.assignments(items, "nid", "ivec", model)
        val probes = graft.ann.IvfIndex.probeLists(queries, "qid", "qvec", model, nprobe = 4)
        graft.ann.IvfIndex.topKFromAssignments(items, "nid", "ivec",
          queries, "qid", "qvec", 5, assign, probes).count()
      }
      step("ann_ivf", Seq("x1", "x10")) {
        case "x1" => ivf(v1); case "x10" => ivf(v10)
      }

      printRatios()
      spark.stop(); return
    }

    // ---------------- compact 3-D store at x100 LEAVES (the sf1b lanes
    // stop at x10; this one-off probes whether the manifest-committed
    // write stays leaf-count-flat two orders past the dir layout's
    // super-linear regime). Constant density: volume x100 => side
    // x 100^(1/3); fixed leafCap 300 => ~x100 octree leaves vs the x1
    // lane's 323. The dir layout is NOT run here — at ~40k leaves its
    // per-leaf rename cost alone extrapolates to minutes (3.4 ms/leaf
    // measured at x10), which is the point being avoided.
    if (mode == "store100") {
      import graft.sources.SpatialStore3d
      import graft.operators.SpatialJoin3d.Mbb3Cols
      def u100(salt: Int, key: Column): Column =
        pmod(xxhash64(key, lit(salt)), lit(1000000L)).cast("double") / 1000000.0
      val space = 928.318 // 200 * 100^(1/3)
      val q100 = spark.range(2000000L).select(col("id"),
          (u100(43, col("id")) * space).as("x0"),
          (u100(44, col("id")) * space).as("y0"),
          (u100(45, col("id")) * space).as("z0"),
          (lit(1.0) + u100(46, col("id")) * 9.0).as("w"))
        .select(col("id"), col("x0"), col("y0"), col("z0"),
          (col("x0") + col("w")).as("x1"), (col("y0") + col("w")).as("y1"),
          (col("z0") + col("w")).as("z1"))
        .repartition(32)
      q100.write.mode("overwrite").parquet(s"$dir/sf1_cubes_100")
      val src = spark.read.parquet(s"$dir/sf1_cubes_100")
      val path = s"$dir/sf1_store3dc_100"
      val leaves = timed("store3d_write_compact_x100") {
        SpatialStore3d.writeCompact(src,
          Mbb3Cols("x0", "y0", "z0", "x1", "y1", "z1"), path, leafCap = 300)
        SpatialStore3d.readMeta(spark, path).leafBoxes.length.toLong
      }
      println(s"[scale]   -> $leaves octree leaves")
      val n = timed("store3d_read_compact_x100") {
        SpatialStore3d.containmentReadCompact(spark, path, Array(
          space * 0.25, space * 0.25, space * 0.25,
          space * 0.75, space * 0.75, space * 0.75)).count()
      }
      println(s"[scale]   -> $n rows in the central window")
      spark.stop(); return
    }

    // ---------------- dedup_ranked at the components-record scale
    // (round-12 verdict #7: q_dedup_ranked INHERITED the components
    // family's 100x record by argument; this lane measures the actual
    // dedupByComponentsRanked shape — components + id-keyed score join +
    // per-component window — on the SAME synthetic 10M-node / 5M-edge
    // graph as the round-5 components_distributed record, so the delta IS
    // the ranked-selection overhead).
    if (mode == "rankedcomp") {
      val nodes = spark.range(10000000L).select(col("id").as("doc_id"),
        pmod(xxhash64(col("id"), lit(3)), lit(1000000L)).as("score"))
      val edges = spark.range(5000000L).select(
        pmod(xxhash64(col("id"), lit(7)), lit(10000000L)).as("a"),
        pmod(xxhash64(col("id"), lit(8)), lit(10000000L)).as("b"))
      val base = timed("components_only_10m") {
        graft.dedup.Components.connectedComponents(
            nodes.select(col("doc_id")), "doc_id", edges, "a", "b")
          .where(col("doc_id") =!= col("comp")).count()
      }
      println(s"[scale]   -> $base non-root nodes labeled")
      val n = timed("dedup_ranked_10m") {
        graft.dedup.Components.dedupByComponentsRanked(
          nodes, "doc_id", "score", edges, "a", "b").count()
      }
      println(s"[scale]   -> $n survivors of 10,000,000")
      spark.stop(); return
    }

    // -------------------- Bloom decontamination at 100x (round-10 item:
    // flagBloom was previously only upper-bounded by the exact-join proxy).
    // Same salted 500k-doc corpus and 1-in-5000 benchmark split as the
    // `pipeline` decontaminate measurement, so the broadcast-semi-join
    // number is directly comparable; Bloom path = distributed filter build
    // over the bench shingles + codegen scan predicate + verification join
    // over candidates only.
    if (mode == "bloom") {
      import graft.text.TextFunctions
      val docs = spark.read.parquet(s"$dir/docs")
      println(s"[scale] docs=${docs.count()}")
      val sh = docs.select(col("doc_id"),
          explode(TextFunctions.wordShingles(col("text"), 3)).as("s0"))
        .select(col("doc_id"), xxhash64(col("s0")).as("s"))
      val bench = sh.where(col("doc_id") % 5000 === 0).select(col("s")).distinct()
      val train = sh.where(col("doc_id") % 5000 =!= 0)
      val nBloom = timed("decontaminate_bloom[500k]") {
        graft.text.Decontaminate.flagBloom(train, "doc_id", "s", bench).count()
      }
      println(s"[scale]   -> $nBloom contaminated docs (bloom)")
      val nJoin = timed("decontaminate_join[500k]") {
        train.join(org.apache.spark.sql.functions.broadcast(bench), Seq("s"))
          .groupBy(col("doc_id")).agg(countDistinct(col("s")).as("n_hits"))
          .count()
      }
      println(s"[scale]   -> $nJoin contaminated docs (broadcast join, must equal)")
      spark.stop(); return
    }

    // --------------- Unigram-LM tokenizer at 100x (500k docs, ~100x vocab)
    // Train cost must track the DISTINCT-pretoken table (the per-copy salt
    // multiplies it ~100x vs the gate corpus), never the corpus: the corpus
    // is scanned once into the word table, and every EM pass is a kernel
    // scan of that table under a broadcast model + one partial-aggregated
    // groupBy over (piece, cnt). Encode Viterbi-tokenizes each distinct
    // word once, then one hash join + per-doc reassembly.
    if (mode == "unigram") {
      // regenerate the salted corpus if a prior `pipeline` run's output
      // was cleaned up (same generator, same salt convention)
      if (!new java.io.File(s"$dir/docs").exists()) timed("gen_docs") {
        val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
          .select("doc_id", "text")
        docs0.crossJoin(spark.range(copies).select(col("id").as("copy")))
          .repartition(64)
          .select((col("doc_id") + col("copy") * 10000000L).as("doc_id"),
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("c"), col("copy"), lit("$1"))).as("text"))
          .write.mode("overwrite").parquet(s"$dir/docs")
      }
      val docs = spark.read.parquet(s"$dir/docs")
      println(s"[scale] docs=${docs.count()}")
      val words = timed("unigram_wordtable[500k]") {
        val w = graft.text.UnigramTrainer.wordTable(docs, "text")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"[scale]   -> ${w.count()} distinct pretokens")
        w
      }
      val vocab = timed("unigram_train[500k]") {
        val seed = graft.text.UnigramTrainer.seedVocab(words, 8000, 6)
        var counts = seed
        for (_ <- 1 to 2)
          counts = graft.text.UnigramTrainer.emCounts(words,
            graft.text.UnigramTrainer.modelFromCounts(counts))
        counts = graft.text.UnigramTrainer.prune(counts, 2000)
        graft.text.UnigramTrainer.emCounts(words,
          graft.text.UnigramTrainer.modelFromCounts(counts))
      }
      val model = graft.text.UnigramTrainer.modelFromCounts(vocab)
      println(s"[scale]   -> ${model.logp.size} pieces, maxLen=${model.maxLen}")
      val nTok = timed("unigram_encode[500k]") {
        graft.text.UnigramTrainer.encode(docs, "doc_id", "text", model)
          .select(sum(size(col("tokens")))).head().getLong(0)
      }
      println(s"[scale]   -> $nTok tokens")
      words.unpersist(false)
      spark.stop(); return
    }

    // ------------- TF-IDF + n-gram-profile language ID at 100x (500k docs)
    // Both reduce the exploded stream to vocabulary-sized relations via
    // partial aggregation; the profile join is a broadcast. Uses the
    // salted corpus from a prior `pipeline` run (vocab ~100x the gate's).
    if (mode == "textrank") {
      val docs = spark.read.parquet(s"$dir/docs")
      val nTf = timed("tfidf_top3[500k docs]") {
        graft.text.TfIdf.topTerms(docs, "doc_id", "text", 3).count()
      }
      println(s"[scale]   -> $nTf (doc, rank) rows")
      // labels: synthetic 4-way split (the salted corpus has no lang col)
      val labeled = docs.withColumn("lang",
        concat(lit("l"), pmod(col("doc_id"), lit(4L))))
      val prof = timed("langprofile_train[500k]") {
        // persist so the classify timing measures inference, not re-train
        val p = graft.text.LangProfile.train(labeled, "lang", "text",
          n = 3, profileSize = 200).persist()
        p.count(); p
      }
      val nCl = timed("langprofile_classify[500k]") {
        graft.text.LangProfile.classify(docs, "doc_id", "text", prof).count()
      }
      println(s"[scale]   -> $nCl classified")
      spark.stop(); return
    }

    // -------------- static range join at 100x: 20M lookup points against
    // 2M intervals over a 1e9 domain — mostly short intervals (bucket
    // lane), 0.01% domain-spanning outliers (broadcast lane). The naive
    // plan Spark would pick for a bare BETWEEN join is a nested loop over
    // 4e13 pairs; the bucketed plan is one equi-join.
    if (mode == "range") {
      import graft.operators.RangeJoin
      val domain = 1000000000L
      timed("gen_intervals[2M]") {
        spark.range(2000000).select(col("id").as("iid"),
            pmod(xxhash64(col("id"), lit(1)), lit(domain)).as("lo"),
            when(pmod(xxhash64(col("id"), lit(2)), lit(10000L)) === 0,
              lit(1000000L))
              .otherwise(pmod(xxhash64(col("id"), lit(3)), lit(64L)) + 1)
              .as("len"))
          .select(col("iid"), col("lo"), (col("lo") + col("len")).as("hi"))
          .write.mode("overwrite").parquet(s"$dir/intervals")
      }
      timed("gen_points[20M]") {
        spark.range(20000000).select(col("id").as("pid"),
            pmod(xxhash64(col("id"), lit(4)), lit(domain)).as("v"))
          .write.mode("overwrite").parquet(s"$dir/points")
      }
      val ivs = spark.read.parquet(s"$dir/intervals")
      val pts = spark.read.parquet(s"$dir/points")
      val n = timed("range_join[20M x 2M]") {
        RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi").count()
      }
      println(s"[scale]   -> $n matches")
      // interval×interval: the 20M points widen into short reservations
      val res = pts.select(col("pid"), col("v").as("lo2"),
        (col("v") + pmod(xxhash64(col("pid"), lit(5)), lit(32L)) + 1).as("hi2"))
      val n2 = timed("interval_overlap[20M x 2M]") {
        RangeJoin.intervalOverlap(ivs, "lo", "hi", res, "lo2", "hi2").count()
      }
      println(s"[scale]   -> $n2 overlapping pairs")
      spark.stop(); return
    }

    // -------- zone-map layout + streaming ANN store refresh at 100x:
    // 20M rows clustered into 256 files; a 1%-of-keys range should read
    // ~1% of files. Then a 2M-vector IVF store built once and refreshed
    // with a 200k batch — the refresh must cost ~batch/corpus of the
    // build, and the probed top-k must scan only probed list= dirs.
    if (mode == "layout") {
      import graft.sources.ZoneMap, ZoneMap.ZoneRange
      import graft.streaming.AnnIngest
      val n = 20000000L
      timed("gen_rows[20M]") {
        spark.range(n).select(col("id"),
            pmod(xxhash64(col("id"), lit(1)), lit(100000L)).as("k"),
            pmod(xxhash64(col("id"), lit(2)), lit(1000000L))
              .cast("double").as("v"),
            concat(lit("payload "), col("id")).as("payload"))
          .write.mode("overwrite").parquet(s"$dir/zm_raw")
      }
      val raw = spark.read.parquet(s"$dir/zm_raw")
      timed("zm_write_range[256f]") {
        ZoneMap.writeClustered(raw, s"$dir/zm_store", Seq("k"), numFiles = 256)
      }
      val ranges = Seq(ZoneRange("k", 40000L, 40999L)) // 1% of the key domain
      val st = ZoneMap.pruneStats(spark, s"$dir/zm_store", ranges)
      println(s"[scale]   -> range-clustered: pruned to ${st.selectedFiles}/${st.totalFiles} files")
      val c1 = timed("zm_pruned_read[1%]") {
        ZoneMap.readPruned(spark, s"$dir/zm_store", ranges).count()
      }
      val c2 = timed("zm_full_filter[1%]") {
        spark.read.parquet(s"$dir/zm_store")
          .where(col("k").between(40000L, 40999L)).count()
      }
      require(c1 == c2, s"pruned read diverged: $c1 vs $c2")
      timed("zm_write_hilbert[256f]") {
        ZoneMap.writeClustered(raw, s"$dir/zm_store2", Seq("k", "v"),
          numFiles = 256, hilbertPair = true)
      }
      Seq("k" -> Seq(ZoneRange("k", 0L, 9999L)),
          "v" -> Seq(ZoneRange("v", 0.0, 99999.0))).foreach { case (nm, r) =>
        val s2 = ZoneMap.pruneStats(spark, s"$dir/zm_store2", r)
        println(s"[scale]   -> hilbert $nm-range (10%): ${s2.selectedFiles}/${s2.totalFiles} files")
      }

      // ANN store: 2M base + 200k refresh (same mixture family as `ann`)
      val dim = 64
      def u(salt: Int, key: Column) =
        pmod(xxhash64(key, lit(salt)), lit(1000L)).cast("double") / 500.0 - 1.0
      def vecsOf(ids: DataFrame): DataFrame =
        ids.select(col("id").as("vid"),
          transform(sequence(lit(0), lit(dim - 1)), j =>
            (u(1, concat(col("id") % 256, lit(":"), j)) +
             u(2, concat(col("id"), lit(":"), j)) * 0.25).cast("float"))
            .as("emb"))
      timed("gen_vecs[2.2M]") {
        vecsOf(spark.range(2200000).toDF("id"))
          .write.mode("overwrite").parquet(s"$dir/ing_vecs")
      }
      val vecs = spark.read.parquet(s"$dir/ing_vecs")
      val base = vecs.where(col("vid") < 2000000L)
      val batch = vecs.where(col("vid") >= 2000000L)
      val model = timed("ing_train[nlist=256]") {
        graft.ann.IvfIndex.train(base, "emb", nlist = 256)
      }
      val store = s"$dir/ing_store"
      val fsP = new org.apache.hadoop.fs.Path(store)
      fsP.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(fsP, true)
      timed("ing_store_build[2M]") {
        AnnIngest.processBatch(base, "vid", "emb", model, store)
      }
      timed("ing_store_refresh[200k]") {
        AnnIngest.processBatch(batch, "vid", "emb", model, store)
      }
      val queries = vecs.where(col("vid") % 10000 === 0)
        .select(col("vid").as("qid"), col("emb").as("qvec"))
      val topk = timed("ing_topk[nprobe=8]") {
        AnnIngest.topKFromStore(spark, store, "vid", "emb",
          queries, "qid", "qvec", k = 10, model, nprobe = 8).count()
      }
      println(s"[scale]   -> $topk result rows over the refreshed store")
      spark.stop(); return
    }

    // -------------- link graph at web scale: 2M hosts, 20M links, with a
    // hub skew (20% of links land on the top-1000 hosts — ~80x the uniform
    // in-degree) so the contribution aggregation's map-side partial sums
    // are genuinely exercised, not just the happy path. PageRank's static
    // edge relation is shuffled ONCE (the out-weight window leaves it
    // hash-partitioned by src and persisted); each iteration should move
    // only the 2M-row rank relation plus the contribution aggregation.
    if (mode == "graph") {
      import graft.graph.LinkGraph
      val nHosts = 2000000L
      val nLinks = 20000000L
      timed("gen_links[20M]") {
        spark.range(nLinks).select(
          concat(lit("h"), pmod(xxhash64(col("id"), lit(1)), lit(nHosts))
            .cast("string")).as("src"),
          concat(lit("h"),
            when(pmod(xxhash64(col("id"), lit(2)), lit(5L)) === 0,
              pmod(xxhash64(col("id"), lit(3)), lit(1000L)))
            .otherwise(pmod(xxhash64(col("id"), lit(4)), lit(nHosts)))
            .cast("string")).as("dst"),
          concat(lit("anchor "), pmod(xxhash64(col("id"), lit(5)),
            lit(50000L)).cast("string")).as("anchor"))
          .write.mode("overwrite").parquet(s"$dir/links")
      }
      val links = spark.read.parquet(s"$dir/links")
      val edges = timed("host_graph[20M links]") {
        val e = LinkGraph.hostGraph(links, "src", "dst").persist()
        println(s"[scale]   -> ${e.count()} weighted edges")
        e
      }
      val nodes = spark.range(nHosts)
        .select(concat(lit("h"), col("id").cast("string")).as("host"))
      val pr = timed("pagerank[3 iters, 2M hosts]") {
        LinkGraph.pageRank(nodes, "host", edges, iterations = 3)
      }
      val top = pr.orderBy(col("rank").desc, col("host")).limit(5).collect()
      println(s"[scale]   -> top hosts: " +
        top.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", "))
      val nHubTop = top.count(_.getString(0).stripPrefix("h").toLong < 1000L)
      println(s"[scale]   -> $nHubTop/5 top ranks are designed hubs (want 5)")
      val nAnchor = timed("anchor_text[20M links]") {
        LinkGraph.anchorText(links, "dst", "anchor").count()
      }
      println(s"[scale]   -> $nAnchor anchor rows")
      edges.unpersist()
      spark.stop(); return
    }

    // -------------- DSIR importance resampling at 100x (500k docs)
    // target = the ~20k doc_id%25==0 slice, raw = all 500k. Three corpus
    // scans total (target fit is slice-pruned), each map-side absorbed to
    // a 4096-bucket model / (doc,sum,cnt) buffers; selection is
    // TakeOrdered. Uses the salted corpus from a prior `pipeline` run.
    if (mode == "dsir") {
      import graft.text.Dsir
      val docs = spark.read.parquet(s"$dir/docs")
      println(s"[scale] docs=${docs.count()}")
      val b = 4096
      val target = timed("dsir_fit_target[20k slice]") {
        val t = Dsir.fitFeatures(docs.where(col("doc_id") % 25 === 0),
          "text", b).persist()
        t.count(); t
      }
      val raw = timed("dsir_fit_raw[500k]") {
        val r = Dsir.fitFeatures(docs, "text", b).persist()
        r.count(); r
      }
      val nSel = timed("dsir_weight+resample[500k]") {
        Dsir.resample(
          Dsir.importanceWeights(docs, "doc_id", "text", target, raw, b, 0.5),
          "doc_id", 50000).count()
      }
      println(s"[scale]   -> $nSel selected")
      // quality classifier: 10k-pair labeled sample (driver train), then
      // the corpus-scale scoring pass — same broadcast-join shape as the
      // DSIR weight stage
      import graft.text.QualityClassifier
      val spamTxt = lit(" click buy casino pills now free winner jackpot deal" * 3)
      val sample = docs.where(col("doc_id") % 100 === 0)
      val labeled = sample.select(col("text"), lit(1).as("label"))
        .unionByName(sample.select(concat(col("text"), spamTxt).as("text"),
          lit(0).as("label")))
      val model = timed("qclf_train[10k pairs, driver]") {
        val m = QualityClassifier.train(labeled, "text", "label", 16384,
          epochs = 40, maxSample = 50000).persist()
        m.count(); m
      }
      val nScored = timed("qclf_score[500k]") {
        QualityClassifier.score(docs, "doc_id", "text", model, 16384).count()
      }
      println(s"[scale]   -> $nScored scored")
      spark.stop(); return
    }

    // -------------- round-10 curation operators at 100x (500k docs)
    // corpus split (scan-local), host cap under a 30%-of-corpus mega-host
    // (the skew case the two-stage top-k exists for), html strip kernel
    // throughput, LM scoring with a 50k-gram model, and CDC blob dedup
    // over 500k ~1.4KB blobs. Uses the salted corpus from a prior
    // `pipeline` run ($dir/docs).
    if (mode == "curate") {
      import graft.text.{CorpusSplit, HostCurate, NgramLm}
      val docs = spark.read.parquet(s"$dir/docs")
      println(s"[scale] docs=${docs.count()}")
      val nSplit = timed("corpus_split[500k]") {
        CorpusSplit.assignSplits(docs, "doc_id",
            Seq("train" -> 0.98, "valid" -> 0.01, "test" -> 0.01))
          .groupBy("split").count().collect().toSeq
      }
      println(s"[scale]   -> $nSplit")
      // host skew: 30% of the corpus lands on one mega-host
      val hosted = docs.withColumn("host",
        when(col("doc_id") % 10 < 3, lit("mega"))
          .otherwise(concat(lit("h"), pmod(col("doc_id"), lit(997L)))))
      val nCap = timed("host_cap[500k, k=100]") {
        HostCurate.capPerHost(hosted.select("doc_id", "host"),
          "host", "doc_id", k = 100).count()
      }
      println(s"[scale]   -> $nCap kept (<= 998*100)")
      val nStrip = timed("html_strip[500k]") {
        docs.select(sum(length(graft.functions.strip_html(concat(
            lit("<html><head><style>p{}</style></head><body><p>"),
            col("text"), lit(" &amp; tail</p></body></html>"))))))
          .head().getLong(0)
      }
      println(s"[scale]   -> $nStrip stripped chars")
      val model = timed("lm_train[100k ref docs, topV=50k]") {
        val m = NgramLm.train(docs.where(col("doc_id") % 5 === 0), "text",
          n = 3, topV = 50000).persist()
        m.count(); m
      }
      val nLm = timed("lm_score[500k]") {
        NgramLm.score(docs, "doc_id", "text", model, n = 3).count()
      }
      println(s"[scale]   -> $nLm docs scored")
      timed("gen_blobs[500k]") {
        docs.select(col("doc_id").as("bid"),
            encode(repeat(col("text"), 4), "UTF-8").as("content"))
          .write.mode("overwrite").parquet(s"$dir/blobs")
      }
      val blobs = spark.read.parquet(s"$dir/blobs")
      val nPairs = timed("cdc_neardup[500k blobs]") {
        graft.dedup.BinaryDedup.nearDupPairs(blobs, "bid", "content", 0.6,
          minSize = 64, avgBits = 8, maxSize = 1024,
          maxChunkDocFreq = Some(1000)).count()
      }
      println(s"[scale]   -> $nPairs near-dup blob pairs")
      // incremental refresh: 500k-blob store vs a 5k-blob new batch (the
      // realistic refresh ratio) — the store is a materialized chunk
      // relation, the new batch chunks once and probes it
      timed("gen_chunk_store[500k]") {
        graft.dedup.BinaryDedup.chunkTable(blobs, "bid", "content",
            64, 8, 1024)
          .write.mode("overwrite").parquet(s"$dir/chunk_store")
      }
      val store = spark.read.parquet(s"$dir/chunk_store")
      val newBatch = blobs.where(col("bid") % 100 === 7)
        .select((col("bid") + 100000000L).as("bid"), col("content"))
      val nInc = timed("cdc_incremental[5k vs 500k]") {
        graft.dedup.BinaryDedup.matchesAgainstStore(
          newBatch, "bid", "content", store, 0.6, 64, 8, 1024).count()
      }
      println(s"[scale]   -> $nInc stored matches for the refresh batch")
      spark.stop(); return
    }

    // -------------- robots politeness filter at 100x (5M URLs, 10k hosts)
    // parse is explode + one per-file window (10k files x ~12 lines);
    // the match is ONE broadcast of the folded rule sets + a scan-local
    // pass over the URL corpus — shuffleR/W for the annotate step should
    // be ~zero. One mega-host carries 1000 rules to bound the worst-case
    // per-row array walk.
    if (mode == "robots") {
      import graft.text.Robots
      val nUrls = 5000000L
      val nHosts = 10000L
      val robots = timed("robots_gen[10k hosts]") {
        val body = concat(
          lit("# rules\nUser-agent: graftbot\nDisallow: /beta/\n" +
            "Allow: /beta/open/\nUser-agent: *\nDisallow: /private/\n" +
            "Allow: /private/pub\nDisallow: /*.tmp$\nDisallow: /cgi-bin/\n" +
            "Crawl-delay: 2\nDisallow: /x"),
          col("id").cast("string"), lit("/\n"))
        val mega = concat_ws("", lit("User-agent: *\n"),
          concat_ws("\n", transform(sequence(lit(0), lit(999)),
            i => concat(lit("Disallow: /deep/"), i, lit("/")))), lit("\n"))
        // only every third host defines the graftbot record, so the star
        // rules genuinely engage on the rest (named records shadow them)
        val starOnly = lit("User-agent: *\nDisallow: /private/\n" +
          "Allow: /private/pub\nDisallow: /*.tmp$\nDisallow: /cgi-bin/\n")
        val r = spark.range(nHosts).select(
          concat(lit("h"), col("id")).as("host"),
          when(col("id") === 0, mega)
            .when(col("id") % 3 === 0, body)
            .otherwise(starOnly).as("text"))
        r.write.mode("overwrite").parquet(s"$dir/robots")
        spark.read.parquet(s"$dir/robots")
      }
      val rules = timed("robots_parse[10k hosts]") {
        val r = Robots.parseRules(robots, "host", "text", "graftbot").persist()
        println(s"[scale]   -> ${r.count()} compiled rules")
        r
      }
      val urls = spark.range(nUrls).select(col("id"),
        concat(lit("h"), pmod(col("id") * 31L, lit(nHosts))).as("host"),
        when(col("id") % 5 === 0, concat(lit("/private/doc"), col("id")))
          .when(col("id") % 5 === 1, concat(lit("/beta/doc"), col("id")))
          .when(col("id") % 5 === 2, concat(lit("/deep/"),
            pmod(col("id"), lit(1500L)), lit("/f")))
          .when(col("id") % 5 === 3, concat(lit("/tmp/f"), col("id"),
            lit(".tmp")))
          .otherwise(concat(lit("/docs/doc"), col("id"))).as("path"))
      val verdictCounts = timed("robots_annotate[5M urls]") {
        Robots.annotateAllowed(urls, "host", "path", rules)
          .groupBy("robots_allowed").count().collect().toSeq
      }
      println(s"[scale]   -> $verdictCounts")
      spark.stop(); return
    }

    // -------------- in-context pretraining layout at 100x (2M vectors)
    // centroid assignment (one broadcast scan) + per-cell greedy chains;
    // nlist sized so cells ≈ maxChain (the 100 TB knob). Uses the 2M-vec
    // mixture from a prior `retrieval`/`ann` run ($dir/vecs).
    if (mode == "ctxorder") {
      import graft.ann.{ContextOrder, IvfIndex}
      val vecs = spark.read.parquet(s"$dir/vecs")
      println(s"[scale] vecs=${vecs.count()}")
      val model = timed("ivf_train[nlist=1024]") {
        IvfIndex.train(vecs, "embedding", nlist = 1024)
      }
      val n = timed("ctx_order[2M, maxChain=4096]") {
        ContextOrder.orderByContext(vecs, "vec_id", "embedding", model)
          .count() // count() runs every chain: flatMapGroups can't prune
      }
      println(s"[scale]   -> $n ordered rows")
      spark.stop(); return
    }

    // -------------- retrieval operators at 100x (2M vectors, this session)
    // radius search (brute + LSH), MMR over bounded candidates, and
    // negative sampling — the session's retrieval additions under the
    // same 2M-vector mixture the ANN suite rehearses on (regenerated
    // here if the ann mode's table is absent).
    if (mode == "retrieval") {
      val nVec = 2000000L
      val dim = 64
      val vecsPath = s"$dir/vecs"
      val fsP = new org.apache.hadoop.fs.Path(vecsPath)
      val fs = fsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(fsP)) timed("gen_vecs") {
        def u(salt: Int, key: Column) =
          pmod(xxhash64(key, lit(salt)), lit(1000L)).cast("double") / 500.0 - 1.0
        spark.range(nVec).select(col("id").as("vec_id"),
            transform(sequence(lit(0), lit(dim - 1)), j =>
              (u(1, concat(col("id") % 256, lit(":"), j)) +
               u(2, concat(col("id"), lit(":"), j)) * 0.25).cast("float"))
              .as("embedding"))
          .write.mode("overwrite").parquet(vecsPath)
      }
      val vecs = spark.read.parquet(vecsPath)
      val items = vecs.select(col("vec_id"), col("embedding"))
      val queries = vecs.where(col("vec_id") % 10000 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val nBrute = timed("radius_brute[2M x 200]") {
        graft.ann.Similarity.radiusSearchBrute(items, "vec_id", "embedding",
          queries, "qid", "qvec", 0.85).count()
      }
      println(s"[scale]   -> $nBrute in-radius pairs (brute)")
      val nLsh = timed("radius_lsh[2M x 200]") {
        graft.ann.Similarity.radiusSearchLsh(items, "vec_id", "embedding",
          queries, "qid", "qvec", 0.85, bits = 8, tables = 8).count()
      }
      println(s"[scale]   -> $nLsh in-radius pairs (lsh; recall = lsh/brute)")
      val nMmr = timed("mmr[2M items, 200 queries, N=32 k=8]") {
        graft.ann.Mmr.diversify(items, "vec_id", "embedding",
          queries, "qid", "qvec", topN = 32, k = 8, lambda = 0.7).count()
      }
      println(s"[scale]   -> $nMmr (query, rank) selections")
      val nNeg = timed("neg_sample[200k anchors, k=8]") {
        graft.text.NegativeSample.draw(
          vecs.where(col("vec_id") % 10 === 0)
            .select(col("vec_id").as("anchor"),
              pmod(col("vec_id") + 1, lit(nVec)).as("pos")),
          "anchor", "pos", nVec, k = 8).count()
      }
      println(s"[scale]   -> $nNeg negatives drawn")
      spark.stop(); return
    }

    // ------------------- crawl front door at 100x (round-10 session)
    // URL canonicalize+dedup over 5M messy URLs with a viral URL owning
    // 10% of the rows (the hot-key case dedupByUrl's salted top-1 exists
    // for), then WARC sink+source throughput over 500k ~1 KB HTML pages.
    if (mode == "crawl") {
      import graft.text.UrlCurate
      val nUrl = 5000000L
      val urls = spark.range(nUrl).select(col("id").as("doc_id"),
        when(col("id") % 10 === 0,
          // viral page: ONE canonical target under many tracking spellings
          concat(lit("HTTPS://WWW.Viral.Example.COM:443/hot/page/?utm_source=s"),
            pmod(col("id"), lit(17L)).cast("string"),
            lit("&gclid=g"), col("id").cast("string"), lit("#f")))
        .otherwise(concat(
          lit("https://h"), pmod(col("id"), lit(100000L)).cast("string"),
          lit(".example.com/p/"), pmod(col("id"), lit(1000L)).cast("string"),
          lit("/?b="), pmod(col("id"), lit(3L)).cast("string"),
          lit("&a="), pmod(col("id"), lit(7L)).cast("string"),
          lit("&fbclid=f"), col("id").cast("string"))).as("url"))
        .persist()
      println(s"[scale] urls=${urls.count()}")
      val nCanon = timed("url_canon[5M scan]") {
        urls.select(UrlCurate.canonicalizeUrl(col("url")).as("c"))
          .agg(sum(length(col("c")))).head().getLong(0)
      }
      println(s"[scale]   -> $nCanon canonical chars")
      val nDedup = timed("url_dedup[5M, 10% viral]") {
        UrlCurate.dedupByUrl(urls, "url", "doc_id").count()
      }
      println(s"[scale]   -> $nDedup survivors (viral 500k rows -> 1)")
      urls.unpersist()
      val nDoc = 500000L
      val pages = spark.range(nDoc).select(
        concat(lit("https://h"), pmod(col("id"), lit(997L)).cast("string"),
          lit(".example.com/doc/"), col("id").cast("string")).as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        lit(200).as("http_status"),
        lit("text/html; charset=utf-8").as("http_content_type"),
        encode(concat(lit("<html><body><p>"),
          repeat(concat(lit("word"), pmod(col("id"), lit(1000L)).cast("string"),
            lit(" ")), 100),
          lit("</p></body></html>")), "UTF-8").as("body"))
      timed("warc_write[500k pages]") {
        graft.sources.WarcSource.write(pages.repartition(32), s"$dir/warc")
      }
      val nRec = timed("warc_read[500k pages]") {
        graft.sources.WarcSource.read(spark, s"$dir/warc")
          .filter(_.record_type == "response").count()
      }
      println(s"[scale]   -> $nRec response records")
      // boilerplate removal over the same pages (nav/footer link farms
      // planted around the body) vs flat strip — same kernel class, the
      // block segmentation + policy must stay scan-bound
      val boiler = spark.range(nDoc).select(col("id"),
        concat(lit("<body><nav><a>Home</a> <a>About this site</a> " +
            "<a>Contact page</a></nav><p>"),
          repeat(concat(lit("word"), pmod(col("id"), lit(1000L)).cast("string"),
            lit(" ")), 100),
          lit("</p><footer><a>Terms of service</a> " +
            "<a>Privacy policy</a></footer></body>")).as("html"))
      val nMain = timed("boilerplate[500k pages]") {
        graft.text.Boilerplate.extractMain(boiler, "html")
          .agg(sum(length(col("main_text")))).head().getLong(0)
      }
      println(s"[scale]   -> $nMain main-content chars (link farms dropped)")
      // dup-2-gram repetition over the same 100-word pages: ~50M grams
      // through the shingle kernel + two-level keyed aggregation
      val texts = boiler.select(col("id").as("doc_id"),
        regexp_replace(col("html"), "<[^>]*>", "").as("text"))
      val nRep = timed("dup_ngram[500k docs]") {
        graft.text.Repetition.dupNgramStats(texts, "doc_id", "text", 2)
          .where(col("dup_2gram_char_frac") > 0.5).count()
      }
      println(s"[scale]   -> $nRep docs over the 0.5 dup-2gram threshold")
      // license detection over the same pages (every 5th page carries a
      // CC badge) and media-type sniffing over the raw page bytes — both
      // scan-local codegen compositions, throughput must stay scan-bound
      val licensed = boiler.select(col("id"),
        concat(col("html"), when(col("id") % 5 === 0,
          lit("""<a rel="license" href="https://creativecommons.org/licenses/by-sa/4.0/">cc</a>"""))
          .otherwise(lit(""))).as("html"))
      val nLic = timed("license_detect[500k pages]") {
        licensed.select(graft.text.LicenseDetect.detectLicense(col("html")).as("l"))
          .where(col("l") =!= "none").count()
      }
      println(s"[scale]   -> $nLic licensed pages (expect 100k)")
      val nSniff = timed("type_sniff[500k pages]") {
        licensed.select(graft.multimodal.TypeSniff.sniffMediaType(
            encode(col("html"), "UTF-8")).as("t"))
          .where(col("t") === "markup").count()
      }
      println(s"[scale]   -> $nSniff markup-routed pages (expect 500k)")
      spark.stop(); return
    }

    // ---------------------- heavy hitters on a heavy-tailed key space
    // Measured FIRST on the salted 3-gram stream with minCount=100: the
    // CMS path was 5x SLOWER with identical shuffle — the sketch
    // SATURATES (error bound eps*N = 1e-4 * 170M = 17000 >> minCount), so
    // the prefilter passes everything, and stat.countMinSketch's build is
    // an RDD-boxed pass over every row. The operator's applicability
    // condition is minCount >> eps*N — phi-frequent items, not
    // low-support HAVING. This mode measures the regime where that holds:
    // a distinct-heavy synthesized tail plus hot keys with a 50000
    // threshold (vs eps*N ~ 17000).
    if (mode == "hh") {
      // The regime where BOTH conditions hold: (a) a huge DISTINCT tail
      // that partial aggregation cannot compress (xxhash-salted grams,
      // ~100M distinct singletons) and (b) hot keys far above eps*N
      // (1000 injected phrase ids repeated ~86k times each; minCount
      // 50000 >> eps*N ~ 17000). The key stream is synthesized directly
      // (long keys) so the two paths differ only in the aggregation
      // strategy, not in text parsing.
      val n = 170000000L
      val keys = spark.range(n).select(
        when(col("id") % 2 === 0, pmod(xxhash64(col("id")), lit(1000L)))
          .otherwise(xxhash64(col("id"), lit(7)))
          .as("g"))
      val nPlain = timed("hh_plain_groupby[170M keys]") {
        keys.groupBy(col("g")).count()
          .where(col("count") >= 50000).count()
      }
      val nCms = timed("hh_cms_prefilter[170M keys]") {
        graft.text.FrequentItems.heavyHitters(keys, "g",
          minCount = 50000L, eps = 1e-4).count()
      }
      println(s"[scale]   -> plain=$nPlain cms=$nCms (must be equal)")
      // build-pass isolation (round-10): the old SQL count_min_sketch
      // aggregate (ObjectHashAggregate, child.eval boxes every key) vs the
      // primitive UnsafeRow build — identical sketch dimensions/seed
      val sqlBytes = timed("cms_build_sql_agg[170M]") {
        keys.select(expr(
            "count_min_sketch(g, CAST(1e-4 AS DOUBLE), " +
              "CAST(0.99 AS DOUBLE), 42)").as("s"))
          .head().getAs[Array[Byte]](0)
      }
      val prim = timed("cms_build_primitive[170M]") {
        graft.text.FrequentItems.buildSketchLong(keys, "g", 1e-4, 0.99)
      }
      val sqlCms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(sqlBytes))
      val probes = Seq(0L, 1L, 42L, 999L).map(k =>
        (sqlCms.estimateCount(k), prim.estimateCount(k)))
      println(s"[scale]   -> estimate parity (sql vs primitive): $probes")
      spark.stop(); return
    }

    // ------------------------------------------------------------ data gen
    // Boxes: constant density vs the sf0.1 gate (0.5 boxes/unit^2, w 1-10)
    // over a sqrt(scale)-larger space, so the scale-up raises VOLUME, not
    // degenerate overlap. 5% of rows form a hotspot: small boxes packed in
    // [0,20]^2 — a region far smaller than one first-level tile, i.e.
    // spatially unsplittable without the two-level / salting paths.
    val side = 2000.0 * math.sqrt(nBoxes / 2000000.0)
    timed("gen_boxes") {
      val u = (salt: Int) =>
        pmod(xxhash64(col("id"), lit(salt)), lit(1000000L)).cast("double") / 1e6
      spark.range(nBoxes).select(col("id"),
          when(col("id") % 20 === 0,
            struct((u(1) * 20.0).as("x0"), (u(2) * 20.0).as("y0"),
              (u(3) * 0.3 + 0.01).as("w")))
          .otherwise(
            struct((u(1) * side).as("x0"), (u(2) * side).as("y0"),
              (u(3) * 9.0 + 1.0).as("w"))).as("b"))
        .select(col("id"), col("b.x0").as("x0"), col("b.y0").as("y0"), col("b.w").as("w"))
        .write.mode("overwrite").parquet(s"$dir/boxes")
    }
    // ------------------------------------- 2-D exact kNN rings at 100x
    // The round-7 tileRingRadii path at scale: lefts spread 100x wider
    // than the clustered rights (99% of owner tiles right-empty — the
    // sparse-region class whose pass-2 radius used to be the space
    // diagonal). knnBroadcastThreshold=0 forces the tiled two-pass path.
    if (mode == "knn2d" || mode == "knn2dqt" || mode == "knn2dfg") {
      import graft.operators.SpatialJoin
      // nBoxes scales the shape (6000000 = the canonical 100x run: 1.5M
      // lefts / 360k rights); an optional 4th arg "stages" prints per-stage
      // wall times >1 s for hot-stage attribution at reduced scale
      val nL = nBoxes / 4
      val nR = nBoxes * 3 / 50
      if (args.length > 3 && args(3) == "stages")
        spark.sparkContext.addSparkListener(new SparkListener {
          override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
            val si = s.stageInfo
            val ms = (for { a <- si.submissionTime; b <- si.completionTime }
              yield b - a).getOrElse(-1L)
            if (ms > 1000) {
              val run = si.taskMetrics.executorRunTime
              val site = si.details.linesIterator.toSeq.headOption.getOrElse("")
              println(f"[stage] ${si.stageId}%4d ${ms / 1e3}%7.1f s  cpuSum=${run / 1e3}%8.1f s  tasks=${si.numTasks}%4d  $site")
            }
          }
        })
      def u(salt: Int, m: Long) =
        pmod(xxhash64(col("id"), lit(salt)), lit(m)).cast("double")
      val lefts = spark.range(nL)
        .select(col("id").as("id1"),
          (u(11, 300000) / 100.0).as("x"), (u(12, 300000) / 100.0).as("y"))
        .select(col("id1"), st_makebox(col("x"), col("y"), col("x"), col("y")).as("g1"))
      val rights = spark.range(nR)
        .select(col("id").as("id2"),
          (u(13, 30000) / 100.0).as("x"), (u(14, 30000) / 100.0).as("y"))
        .select(col("id2"), st_makebox(col("x"), col("y"), col("x"), col("y")).as("g2"))
      // fg with the auto bucket is the degenerate case at this shape: ALL
      // rights land in 1-2 uniform tiles (~180k rows each), every starved
      // left pairs with the whole tile — killed at 17 min. The adaptive
      // forms below are the supported configurations for clustered rights.
      val configs = Seq(
        ("qt_b2000", SpatialJoin.Config(partitioner = "qt", bucket = 2000,
          knnBroadcastThreshold = 0)),
        ("fg_twoLevel_b2000", SpatialJoin.Config(bucket = 2000, twoLevel = true,
          knnBroadcastThreshold = 0)))
      val picked =
        if (mode == "knn2dqt") configs.take(1)
        else if (mode == "knn2dfg") configs.drop(1)
        else configs
      for ((label, cfg) <- picked) {
        val n = timed(s"knn2d_ring[$label]") {
          SpatialJoin.knnJoinExact(lefts, "g1", "id1", rights, "g2", k = 3,
            tieBreak = Seq("id2"), cfg = cfg).count()
        }
        println(s"[scale]   -> $n rows")
      }
      spark.stop(); return
    }

    // ----------------------------------- 3-D kNN probe-then-bound at 100x
    // The gate's shape at 100x sf0.1: left points spread over a volume
    // ~44% of which holds NO rights (the starved-cell class that made the
    // old diagonal fallback near-cartesian), rights clustered in [0,200]^3.
    // 360k rights > BroadcastRightMax, so this exercises the
    // cell-partitioned shuffle-hash branch — the 100 TB path.
    if (mode == "knn3d") {
      import graft.operators.SpatialJoin3d
      val nL = 1500000L; val nR = 360000L
      def u(salt: Int, m: Long) =
        pmod(xxhash64(col("id"), lit(salt)), lit(m)).cast("double")
      val lefts = spark.range(nL).select(col("id").as("aid"),
        (u(1, 30000) / 100.0).as("ax0"), (u(2, 30000) / 100.0).as("ay0"),
        (u(3, 20000) / 100.0).as("az0"))
        .withColumn("ax1", col("ax0")).withColumn("ay1", col("ay0"))
        .withColumn("az1", col("az0"))
      val rights = spark.range(nR).select(col("id").as("bid"),
          (u(4, 19000) / 100.0).as("bx0"), (u(5, 19000) / 100.0).as("by0"),
          (u(6, 19000) / 100.0).as("bz0"), (u(7, 900) / 100.0 + 1.0).as("w"))
        .select(col("bid"), col("bx0"), col("by0"), col("bz0"),
          (col("bx0") + col("w")).as("bx1"), (col("by0") + col("w")).as("by1"),
          (col("bz0") + col("w")).as("bz1"))
      val lc = SpatialJoin3d.Mbb3Cols("ax0", "ay0", "az0", "ax1", "ay1", "az1")
      val rc = SpatialJoin3d.Mbb3Cols("bx0", "by0", "bz0", "bx1", "by1", "bz1")
      val n1 = timed("knn3d_grid[1.5Mx360k]") {
        SpatialJoin3d.knnJoinMbb(lefts, lc, "aid", rights, rc, "bid", k = 3).count()
      }
      println(s"[scale]   -> $n1 rows")
      val n2 = timed("knn3d_oc[1.5Mx360k]") {
        SpatialJoin3d.knnJoinMbbOc(lefts, lc, "aid", rights, rc, "bid", k = 3).count()
      }
      println(s"[scale]   -> $n2 rows")
      spark.stop(); return
    }

    // ------------------- distributed partitioner planning at 100x
    // Times ONLY the tile-planning step (the driver-sample replacement):
    // each *_dist form plans over ALL nBoxes envelopes — sorts are
    // distributed range-exchanges, histograms one bounded partial-agg —
    // vs the seeded-sample baseline forms. Skew: 5% of rows in the
    // [0,20]^2 hotspot (gen above) stresses the cut/split logic.
    if (mode == "all" || mode == "partition") {
      val envP = spark.read.parquet(s"$dir/boxes")
        .select(col("x0").as("__xmin"), col("y0").as("__ymin"),
          (col("x0") + col("w")).as("__xmax"), (col("y0") + col("w")).as("__ymax"))
      val bucketP = math.max(500, (nBoxes / 1000).toInt)
      for (form <- Seq("hc_dist", "str_dist", "slc_dist", "qt_dist",
          "bsp_dist", "bos_dist", "str", "qt", "bos")) {
        val idx = timed(s"plan[$form]") {
          SpatialJoin.planTiles(envP, envP.limit(0),
            SpatialJoin.Config(partitioner = form, bucket = bucketP))
        }
        println(s"[scale]   -> ${idx.tiles.length} tiles")
      }
      if (mode == "partition") { spark.stop(); return }
    }

    // Documents: 100 copies of the sf0.1 corpus; every WORD is prefixed with
    // the copy id, so the shingle multiset of each copy is isomorphic to the
    // original corpus's (identical trigram doc-frequencies — no degenerate
    // hot shingles invented by the salt) while cross-copy similarity is 0.
    timed("gen_docs") {
      val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select("doc_id", "text")
      docs.crossJoin(spark.range(copies).select(col("id").as("copy")))
        .repartition(64) // the crossJoin writes ONE giant file otherwise
        .select((col("doc_id") + col("copy") * 10000000L).as("doc_id"),
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("c"), col("copy"), lit("$1"))).as("text"))
        .write.mode("overwrite").parquet(s"$dir/docs")
    }
    val boxes = spark.read.parquet(s"$dir/boxes")
      .withColumn("geom", st_makebox(col("x0"), col("y0"),
        col("x0") + col("w"), col("y0") + col("w")))
    val docs = spark.read.parquet(s"$dir/docs")
    println(s"[scale] boxes=${boxes.count()} docs=${docs.count()} space=${side.toInt}")

    // ------------------------------------------- tile plan + skew evidence
    val bucket = math.max(500, (nBoxes / 1000).toInt)
    def tileStats(cfg: SpatialJoin.Config, label: String): Unit = {
      val env = boxes.select(col("x0").as("__xmin"), col("y0").as("__ymin"),
        (col("x0") + col("w")).as("__xmax"), (col("y0") + col("w")).as("__ymax"))
      val index = SpatialJoin.planTiles(env, env.limit(0), cfg)
      val bc = spark.sparkContext.broadcast(index)
      val tileOf = udf { (x1: Double, y1: Double, x2: Double, y2: Double) =>
        bc.value.tilesFor(x1, y1, x2, y2)
      }
      val r = env.withColumn("t", explode(tileOf(col("__xmin"), col("__ymin"),
          col("__xmax"), col("__ymax"))))
        .groupBy("t").count()
        .agg(count(lit(1)), avg("count"), stddev_pop("count"), max("count"))
        .head()
      val shards = index.shardCounts
      println(f"[scale] tiles[$label] planned=${index.tiles.length} occupied=${r.getLong(0)}" +
        f" avg=${r.getDouble(1)}%.0f stddev=${r.getDouble(2)}%.0f max=${r.getLong(3)}" +
        s" saltedTiles=${shards.size}" +
        (if (shards.nonEmpty) s" maxShards=${shards.values.max}" else ""))
    }
    tileStats(SpatialJoin.Config(partitioner = "fg", bucket = bucket), "fg")
    tileStats(SpatialJoin.Config(partitioner = "fg", bucket = bucket, twoLevel = true),
      "fg+twoLevel")

    // -------------------------------------------------- spjoin_intersects
    def spjoin(cfg: SpatialJoin.Config, label: String): Unit = {
      val a = boxes.select(col("id").as("id1"), col("geom").as("g1"))
      val c = boxes.select(col("id").as("id2"), col("geom").as("g2"))
      val n = timed(s"spjoin_intersects[$label]") {
        SpatialJoin.join(a, "g1", c, "g2", cfg)
          .where(col("id1") < col("id2")).count()
      }
      println(s"[scale]   -> $n pairs")
    }
    spjoin(SpatialJoin.Config(predicate = "intersects", partitioner = "fg",
      bucket = bucket), "fg")
    spjoin(SpatialJoin.Config(predicate = "intersects", partitioner = "fg",
      bucket = bucket, twoLevel = true), "fg+twoLevel")

    // ------------------------------------------------- text dedup family
    val nMinhash = timed("minhash_lsh_pairs") {
      graft.dedup.TextDedup.minHashLshPairs(docs, "doc_id", "text",
        n = 3, numHashes = 64, bands = 16, estThreshold = 0.5).count()
    }
    println(s"[scale]   -> $nMinhash candidate pairs")
    val nNgram = timed("ngram_jaccard_capped") {
      graft.dedup.TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, maxShingleDocFreq = Some(100)).count()
    }
    println(s"[scale]   -> $nNgram exact pairs (hot-shingle cap engaged)")

    // ------------------------------------------------ components at scale
    // Synthetic 5M-edge graph over 10M nodes forces the DISTRIBUTED star
    // rounds (driverThreshold=0); the mined-pairs path then runs end-to-end
    // dedup the way a real pipeline would (driver fast path, graph is tiny).
    val nodes = spark.range(10000000L).select(col("id"))
    val edges = spark.range(5000000L).select(
      pmod(xxhash64(col("id"), lit(7)), lit(10000000L)).as("a"),
      pmod(xxhash64(col("id"), lit(8)), lit(10000000L)).as("b"))
    val nComp = timed("components_distributed") {
      graft.dedup.Components.connectedComponents(nodes, "id", edges, "a", "b",
          driverThreshold = 0)
        .where(col("id") =!= col("comp")).count()
    }
    println(s"[scale]   -> $nComp non-root nodes labeled")
    val nSurv = timed("dedup_survivors_e2e") {
      val pairs = graft.dedup.TextDedup.minHashLshPairs(docs, "doc_id", "text",
        n = 3, numHashes = 64, bands = 16, estThreshold = 0.5)
      graft.dedup.Components.dedupByComponents(docs, "doc_id", pairs, "ida", "idb")
        .count()
    }
    println(s"[scale]   -> $nSurv survivors of ${docs.count()}")

    spark.stop()
  }
}
