package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Similarity, TextOps}

/** Round-16 optimization profiler: per-arm STRUCTURAL metrics (jobs,
  * stages, tasks, shuffle bytes, input bytes) via a SparkListener, plus
  * wall time. Unlike wall-clock, the structural counts are deterministic
  * on a noisy shared host — a removed exchange or fused job shows up as
  * a hard count delta that no steal burst can fake (guide §1: measure
  * first; §2.4: remove shuffles outright).
  *
  * Mirrors the Bench arms' frames exactly (same data, same parameters)
  * so the counts correspond 1:1 to the timed arms.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ProfR16b [armPrefix...]
  */
object ProfR16b {
  private final class Counts extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val shufW = new java.util.concurrent.atomic.AtomicLong
    val shufR = new java.util.concurrent.atomic.AtomicLong
    val input = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobs.incrementAndGet()
      if (sys.env.contains("PROF16B_JOBLOG"))
        System.err.println(s"[joblog] job=${j.jobId} stages=${j.stageInfos.size} " +
          s"site=${j.stageInfos.lastOption.map(_.name).getOrElse("?")}")
      ()
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(s.stageInfo.numTasks)
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufR.addAndGet(m.shuffleReadMetrics.remoteBytesRead +
          m.shuffleReadMetrics.localBytesRead)
        input.addAndGet(m.inputMetrics.bytesRead)
      }
      ()
    }
    def snap(): Seq[Long] = Seq(jobs.get, stages.get, tasks.get,
      shufW.get, shufR.get, input.get)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = new Counts
    spark.sparkContext.addSparkListener(counts)

    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def docsWide = graft.sources.ScaleOps.normalizeParallelism(docs, cpus.toInt)
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.sources.ScaleOps
    val tok = TextOps.tokenCount(col("text"))
    lazy val corpus = docsWide.filter(col("doc_id") % 10 =!= 0)
    lazy val shard = docsWide.filter(col("doc_id") % 10 === 0)
    lazy val langTotals: Seq[(String, Long)] =
      docs.groupBy("lang").agg(sum(tok.cast("long")).as("t"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    lazy val cutBudgets = langTotals.map { case (l, t) =>
      l -> math.max(1L, (t * 0.3).toLong) }
    lazy val repeatBudgets = langTotals.map { case (l, t) =>
      l -> math.max(1L, (t * 2.4).toLong) }
    lazy val mhState = {
      val st = Dedup.minhashDedupState(corpus, "doc_id", "text")
      Dedup.MinhashDedupState(st.reps.cache(), st.buckets.cache())
    }
    lazy val tbPrepared = ScaleOps.PreparedTokenBudgetState(
      ScaleOps.tokenBudgetState(docs, "lang", "doc_id", tok, cutBudgets,
        salt = "bench").cache())
    def docsML = docsWide.select(col("doc_id"),
      TextOps.tokenChunkLines(col("text"), 5).as("mltext"))
    lazy val maintDir = java.nio.file.Files
      .createTempDirectory("graft-prof16b").toString
    lazy val mhStateDirs: String = {
      val st = Dedup.minhashDedupState(corpus, "doc_id", "text")
      st.reps.write.mode("overwrite").parquet(s"$maintDir/mh/reps")
      st.buckets.write.mode("overwrite").parquet(s"$maintDir/mh/buckets")
      s"$maintDir/mh"
    }
    lazy val mhParquetState = Dedup.MinhashDedupState(
      spark.read.parquet(s"$mhStateDirs/reps"),
      spark.read.parquet(s"$mhStateDirs/buckets"))
    lazy val refreshShard = shard.select(
      (col("doc_id") + 10000000L).as("doc_id"), col("text"))
    lazy val embCorpus = emb.filter(col("vec_id") % 10 =!= 0)
    lazy val embShard = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
    lazy val sdStateDir: String = {
      val st = Similarity.semDedupState(embCorpus, "vec_id", "embedding",
        k = 16, iters = 1, dim = 64)
      st.centroids.write.mode("overwrite").parquet(s"$maintDir/sd/centroids")
      st.members.write.mode("overwrite").parquet(s"$maintDir/sd/members")
      s"$maintDir/sd"
    }
    lazy val sdParquetState = Similarity.SemDedupState(
      spark.read.parquet(s"$sdStateDir/centroids"),
      spark.read.parquet(s"$sdStateDir/members"))
    lazy val vindexDir: String = {
      val d = s"$maintDir/vindex"
      graft.pipeline.VectorIndex.build(embCorpus, "vec_id", "embedding", d,
        k = 16, iters = 1, dim = 64)
      d
    }
    lazy val zorderDir: String = {
      val d = s"$maintDir/zorder"
      ScaleOps.zorderWrite(
        li.filter(col("l_orderkey") % 10 =!= 0)
          .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"),
        d, Seq("l_extendedprice", "l_quantity"), bits = 8, numFiles = 16)
      d
    }
    lazy val zorderBatch = li.filter(col("l_orderkey") % 10 === 0)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
    lazy val ctStateDir: String = {
      val st = Dedup.contaminationState(
        docs.filter(col("doc_id") % 37 === 0), "doc_id", "text", n = 2,
        suite = "s37")
      st.shingles.write.mode("overwrite").parquet(s"$maintDir/ct")
      s"$maintDir/ct"
    }
    lazy val ctState = Dedup.ContaminationState(spark.read.parquet(ctStateDir))
    lazy val dcStateDir: String = {
      val pairs = Dedup.minhashPairs(docsWide, "doc_id", "text",
        n = 2, threshold = 0.5)
      Dedup.dupClusterState(pairs).clusters
        .write.mode("overwrite").parquet(s"$maintDir/dc")
      s"$maintDir/dc"
    }
    lazy val dcState = Dedup.DupClusterState(spark.read.parquet(dcStateDir))
    lazy val dcCorpusStateDir: String = {
      val pairs = Dedup.minhashPairs(corpus, "doc_id", "text",
        n = 2, threshold = 0.5)
      Dedup.dupClusterState(pairs).clusters
        .write.mode("overwrite").parquet(s"$maintDir/dcc")
      s"$maintDir/dcc"
    }
    lazy val dcCorpusState = Dedup.DupClusterState(
      spark.read.parquet(dcCorpusStateDir))

    val arms: Seq[(String, () => Unit)] = Seq(
      "fit_twfe_compress" -> (() => {
        graft.reg.Dbreg.fit(
          "l_extendedprice ~ l_quantity + l_discount | l_returnflag + l_linestatus",
          li, strategy = "compress"); ()
      }),
      "fit_twfe_auto" -> (() => {
        graft.reg.Dbreg.fit(
          "l_extendedprice ~ l_quantity + l_discount | l_returnflag + l_linestatus",
          li, strategy = "auto"); ()
      }),
      "fit_demean_hc1" -> (() => {
        graft.reg.Dbreg.fit(
          "l_extendedprice ~ l_quantity + l_discount | l_returnflag",
          li, vcov = "hc1", strategy = "demean"); ()
      }),
      "fit_mundlak" -> (() => {
        graft.reg.Dbreg.fit(
          "l_extendedprice ~ l_quantity + l_discount | l_returnflag",
          li, strategy = "mundlak"); ()
      }),
      "fit_moments_cluster" -> (() => {
        graft.reg.Dbreg.fit("l_extendedprice ~ l_quantity + l_discount", li,
          vcov = "~l_returnflag", strategy = "moments"); ()
      }),
      "binsreg_canonical" -> (() => {
        graft.binsreg.Dbbinsreg.fit("l_extendedprice ~ l_quantity", li,
          nbins = 10, degree = 0); ()
      }),
      "binsreg_spline_fe" -> (() => {
        graft.binsreg.Dbbinsreg.fit(
          "l_extendedprice ~ l_quantity | l_returnflag", li,
          nbins = 8, degree = 1, smoothness = 1); ()
      }),
      "dedup_exact" -> (() => sink(Dedup.exactGroups(docs, "doc_id", "text"))),
      "dedup_minhash_lsh" -> (() =>
        sink(Dedup.minhashPairs(docs, "doc_id", "text", n = 2, threshold = 0.5))),
      "dedup_simhash" -> (() => sink(Dedup.simhash(docs, "doc_id", "text"))),
      "knn_brute" -> (() =>
        sink(Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          Seq(0L, 1L, 2L, 3L, 4L), 10))),
      "knn_lsh" -> (() =>
        sink(Similarity.lshTopK(emb, "vec_id", "embedding",
          Seq(0L, 1L, 2L, 3L, 4L), 10, dim = 64))),
      "text_analysis" -> (() =>
        sink(docsWide
          .withColumn("__t", TextOps.tokens(col("text")))
          .select(col("doc_id"),
            TextOps.langIdT(col("text"), col("__t")).as("lang"),
            TextOps.qualityScoreT(col("text"), col("__t")).as("q"),
            TextOps.fingerprint(col("text")).as("fp")))),
      "cur_minhash_state_build" -> (() => {
        val st = Dedup.minhashDedupState(corpus, "doc_id", "text")
        sink(st.reps); sink(st.buckets)
      }),
      "cur_minhash_state_apply" -> (() =>
        sink(Dedup.dedupAgainstState(mhState, shard, "doc_id", "text"))),
      "cur_token_budget_build" -> (() =>
        sink(ScaleOps.tokenBudgetState(docs, "lang", "doc_id", tok,
          cutBudgets, salt = "bench"))),
      "cur_token_budget_apply" -> (() =>
        sink(ScaleOps.sampleToTokenBudgetAgainst(tbPrepared, shard,
          "lang", "doc_id", tok))),
      "cur_line_dedup" -> (() =>
        sink(Dedup.removeDupLines(docsML, "doc_id", "mltext"))),
      "cur_repeat_budget" -> (() =>
        sink(ScaleOps.repeatToTokenBudget(docsWide, "lang", "doc_id", tok,
          repeatBudgets, salt = "bench"))),
      "cur_pack_global" -> (() =>
        sink(TextOps.packSequences(docsWide, "doc_id", "text",
          window = 2048, salt = "bench"))),
      "mnt_minhash_refresh" -> (() => {
        val st = Dedup.minhashDedupStateRefresh(mhParquetState,
          refreshShard, "doc_id", "text")
        sink(st.reps); sink(st.buckets)
      }),
      "mnt_semdedup_apply" -> (() =>
        sink(Similarity.semDedupAgainst(sdParquetState, embShard,
          "vec_id", "embedding", threshold = 0.45))),
      "mnt_vindex_append" -> (() =>
        graft.pipeline.VectorIndex.append(embShard, "vec_id", "embedding",
          vindexDir)),
      "mnt_vindex_topk" -> (() =>
        sink(graft.pipeline.VectorIndex.topK(spark, vindexDir,
          emb.filter(col("vec_id").isin(0L, 1L, 2L, 3L, 4L)),
          "vec_id", "embedding", k = 10, nprobe = 4))),
      "mnt_zorder_append" -> (() =>
        ScaleOps.zorderAppend(zorderBatch, zorderDir,
          Seq("l_extendedprice", "l_quantity"), bits = 8, numFiles = 4)),
      "mnt_zorder_scan" -> (() =>
        sink(ScaleOps.zorderScan(spark, zorderDir,
          Seq(("l_extendedprice", 10000.0, 30000.0), ("l_quantity", 5.0, 25.0))))),
      "mnt_semdedup_append" -> (() => {
        val st = Similarity.semDedupStateAppend(sdParquetState, embShard,
          "vec_id", "embedding")
        sink(st.members)
      }),
      "mnt_contamination" -> (() =>
        sink(Dedup.contaminationAgainst(ctState, docsWide,
          "doc_id", "text", n = 2))),
      "mnt_leakage_split" -> (() => {
        val pairs = Dedup.minhashPairs(docsWide, "doc_id", "text",
          n = 2, threshold = 0.5)
        sink(ScaleOps.leakageSafeSplit(docsWide, "doc_id",
          pairs, Seq("train" -> 0.98, "eval" -> 0.02), salt = "bench"))
      }),
      "mnt_leakage_split_state" -> (() =>
        sink(ScaleOps.leakageSafeSplitAgainst(dcState,
          docsWide, "doc_id", Seq("train" -> 0.98, "eval" -> 0.02),
          salt = "bench"))),
      "mnt_cluster_ingest" -> (() =>
        sink(Dedup.dupClusterStateIngest(dcCorpusState, mhParquetState,
          refreshShard, "doc_id", "text", n = 2, threshold = 0.5)
          .clusters)),
      // sub-component arms (not bench arms — decomposition of the heavy ones)
      "sub_tokens_only" -> (() =>
        sink(docsWide.select(col("doc_id"), TextOps.tokens(col("text")).as("t")))),
      "sub_shingles_only" -> (() =>
        sink(docsWide
          .select(col("doc_id"), TextOps.tokens(col("text")).as("__toks"))
          .select(col("doc_id"),
            array_distinct(TextOps.wordShingles(col("__toks"), 2)).as("sh")))),
      "sub_sig_only" -> (() =>
        sink(Dedup.minhashSignatures(docsWide, "doc_id", "text", n = 2))),
      "sub_minhash_pairs_docsWide" -> (() =>
        sink(Dedup.minhashPairs(docsWide, "doc_id", "text",
          n = 2, threshold = 0.5))),
      "sub_cc_only_docsWide" -> (() => {
        val pairs = Dedup.minhashPairs(docsWide, "doc_id", "text",
          n = 2, threshold = 0.5)
        sink(Dedup.duplicateClusters(pairs))
      }),
      "sub_shard_pairs_only" -> (() =>
        sink(Dedup.minhashPairs(refreshShard, "doc_id", "text",
          n = 2, threshold = 0.5))),
      "sub_cross_pairs_only" -> (() =>
        sink(Dedup.dedupAgainstStateAll(mhParquetState, refreshShard,
          "doc_id", "text", n = 2, threshold = 0.5))),
      "sub_merge_only" -> (() => {
        val shardPairs = Dedup.minhashPairs(refreshShard, "doc_id", "text",
          n = 2, threshold = 0.5).select(col("id1"), col("id2"))
        val crossPairs = Dedup.dedupAgainstStateAll(mhParquetState,
          refreshShard, "doc_id", "text", n = 2, threshold = 0.5)
          .select(col("id").as("id1"), col("dup_of").as("id2"))
        sink(Dedup.dupClusterStateMerge(dcCorpusState,
          shardPairs.unionByName(crossPairs)).clusters)
      })
    )

    val only = args.toSet
    val selected = arms.filter { case (n, _) =>
      only.isEmpty || only.exists(n.startsWith) }

    // setup (untimed): force the lazies the selected arms need (partial
    // replica dirs may lack some tables — a missing one only matters if a
    // selected arm touches it)
    Seq(() => li.count(), () => docs.count(), () => emb.count()).foreach { f =>
      try { f(); () } catch { case _: Throwable => () }
    }
    selected.foreach { case (name, fn) =>
      try fn()
      catch { case e: Throwable => System.err.println(s"[prof16b] warmup $name: $e") }
    }

    println(f"${"arm"}%-34s ${"sec"}%8s ${"jobs"}%6s ${"stages"}%7s ${"tasks"}%7s ${"shufW_MB"}%9s ${"input_MB"}%9s")
    selected.foreach { case (name, fn) =>
      // min-of-3 wall; counts from the LAST run (identical across runs)
      var best = Double.MaxValue
      var delta: Seq[Long] = Nil
      (1 to 3).foreach { _ =>
        val before = counts.snap()
        val t0 = System.nanoTime()
        try fn()
        catch { case e: Throwable => System.err.println(s"[prof16b] $name: $e") }
        val dt = (System.nanoTime() - t0) / 1e9
        delta = counts.snap().zip(before).map { case (a, b) => a - b }
        if (dt < best) best = dt
      }
      println(f"$name%-34s $best%8.3f ${delta(0)}%6d ${delta(1)}%7d ${delta(2)}%7d ${delta(3) / 1e6}%9.2f ${delta(5) / 1e6}%9.2f")
    }
    spark.stop()
  }
}
