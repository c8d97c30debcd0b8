package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, TextOps}
import graft.sources.ScaleOps

/** Round-13 scale profiler — the measurements this round's claims rest on:
  *
  *   1. `minhashDedupStateRefresh` vs full rebuild on a grown corpus
  *      (the verdict's refresh-vs-rebuild point): state frozen from a 90%
  *      base, a 10% growth shard folded in — refresh must beat rebuilding
  *      both tables from the union, and the gap is the steady-state
  *      ingest dividend. Run with `SPARK_GRAFT_SF_DIR` at the ×100
  *      documents replica (500k docs).
  *   2. `repeatToTokenBudgetAgainst` COMPOSED end-to-end (epoch explode +
  *      frozen remainder cut per shard) — the r12 verdict measured its
  *      components but not the composition; run at the ×1000 replica
  *      (5M docs).
  *
  * `PROF_ITERS` iterations, min-statistic (BENCH_NOTES methodology —
  * bursty host steal). `PROF_ONLY` filters by name prefix.
  */
object ProfR13 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("PROF_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Long =
      df.queryExecution.toRdd
        .mapPartitions(it => Iterator.single(it.size.toLong)).sum().toLong

    val only = sys.env.get("PROF_ONLY").map(_.split(",").map(_.trim).toSeq)
    def time(name: String)(f: => Long): Unit = {
      if (only.exists(ps => !ps.exists(name.startsWith))) return
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[prof] $name: $dt%.2f s (rows=$n)")
        dt
      }
      println(f"[prof] $name MIN: ${times.min}%.2f s")
    }

    lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // an arm runs when some PROF_ONLY prefix matches it (or no filter)
    def runs(arm: String) = !only.exists(ps => !ps.exists(arm.startsWith))
    val docArms =
      Seq("mh_refresh", "mh_rebuild", "repeat_against_composed")
    if (docArms.exists(runs))
      println(s"[prof] dir=$sfDir docs=${docs.count()}")

    // 1. refresh vs rebuild: base = 90% of the corpus (state frozen and
    // cached — the persisted-lake steady state), growth shard = the
    // remaining 10%. Both arms materialize BOTH output tables.
    lazy val base = docs.filter(col("doc_id") % 10 =!= 9)
    lazy val grow = docs.filter(col("doc_id") % 10 === 9)
    // the TRUE steady-state shape: the frozen state lives on the lake as
    // parquet, not cached (reps carry the shingle arrays — caching 4.5M
    // of them deserialized is exactly what a production ingest would
    // never do; the ×1000 run OOMs if you try)
    lazy val frozenState = {
      val st = Dedup.minhashDedupState(base, "doc_id", "text")
      val dir = s"/tmp/graft_prof13_mhstate"
      st.reps.write.mode("overwrite").parquet(s"$dir/reps")
      st.buckets.write.mode("overwrite").parquet(s"$dir/buckets")
      Dedup.MinhashDedupState(
        spark.read.parquet(s"$dir/reps"),
        spark.read.parquet(s"$dir/buckets"))
    }
    if (runs("mh_refresh"))
      frozenState // force the setup OUTSIDE the timed arm
    time("mh_refresh")({
      val st = Dedup.minhashDedupStateRefresh(frozenState, grow,
        "doc_id", "text")
      noop(st.reps) + noop(st.buckets)
    })
    time("mh_rebuild")({
      val st = Dedup.minhashDedupState(docs, "doc_id", "text")
      noop(st.reps) + noop(st.buckets)
    })

    // 2. composed repeat-budget ingest: frozen state (setup, cached),
    // then the full shard application — epoch explode UNION remainder
    // cut — in one timed plan. Budgets at 240% of each lang's inventory:
    // 2 full epochs + a 40% remainder pass, the upsampling shape.
    val tok = TextOps.tokenCount(col("text"))
    lazy val repeatBudgets = docs.groupBy("lang")
      .agg(sum(tok.cast("long")).as("t")).collect()
      .map(r => r.getString(0) -> math.max(1L, (r.getLong(1) * 2.4).toLong))
      .toSeq.sortBy(_._1)
    lazy val repeatState = {
      val st = ScaleOps.repeatBudgetState(docs, "lang", "doc_id", tok,
        repeatBudgets, salt = "p13").cache()
      st.count()
      st
    }
    if (runs("repeat_against_composed"))
      repeatState // force the setup OUTSIDE the timed arm
    time("repeat_against_composed")({
      val shard = docs.filter(col("doc_id") % 10 === 0)
      noop(ScaleOps.repeatToTokenBudgetAgainst(repeatState, shard,
        "lang", "doc_id", tok))
    })

    // 3. SemDeDup frozen-state ingest at scale: corpus = 90% of the
    // embeddings replica, k scaled to ~n/1000 cells (the SemDeDup
    // regime), 10% shard applied against the cached state. Run with
    // SPARK_GRAFT_SF_DIR at the ×100 embeddings replica (200k vecs).
    import graft.pipeline.Similarity
    lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    lazy val sdK = math.max(8, (emb.count() / 1000L).toInt)
    lazy val sdState = {
      val st = Similarity.semDedupState(
        emb.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding",
        k = sdK, iters = 2, dim = 64)
      val c = Similarity.SemDedupState(st.centroids, st.members.cache())
      c.members.count(); c.centroidArray
      c
    }
    time("semdedup_state_build")({
      val st = Similarity.semDedupState(
        emb.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding",
        k = sdK, iters = 2, dim = 64)
      noop(st.members) + noop(st.centroids)
    })
    if (runs("semdedup_against"))
      sdState // force the setup OUTSIDE the timed arm
    time("semdedup_against")({
      val shard = emb.filter(col("vec_id") % 10 === 0)
        .withColumn("vec_id", col("vec_id") + 10000000L)
      noop(Similarity.semDedupAgainst(sdState, shard, "vec_id",
        "embedding", threshold = 0.6))
    })

    // 3b. persisted-index append vs rebuild at ×100 embeddings: the
    // vector modality's growth dividend (run with SPARK_GRAFT_SF_DIR at
    // the ×100 embeddings replica)
    lazy val vidxDir = {
      val d = "/tmp/graft_prof13_vindex"
      graft.pipeline.VectorIndex.build(
        emb.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding", d,
        k = sdK, iters = 2)
      d
    }
    if (runs("vindex_append")) vidxDir
    // NOTE: iterations append cumulatively into the same layout — the
    // per-append cost is independent of resident files, so the timing is
    // valid and duplicate ids are irrelevant to it
    time("vindex_append")({
      graft.pipeline.VectorIndex.append(
        emb.filter(col("vec_id") % 10 === 0),
        "vec_id", "embedding", vidxDir)
      0L
    })
    time("vindex_rebuild")({
      graft.pipeline.VectorIndex.build(emb, "vec_id", "embedding",
        "/tmp/graft_prof13_vindex_rebuild", k = sdK, iters = 2)
      0L
    })

    // 4. the COMPOSED daily-ingest path — the whole point of the frozen
    // -state family in one number: a 10% shard arrives and, against
    // nothing but persisted state, is (a) line-scrubbed against corpus
    // fingerprints, (b) near-dup-flagged against the MinHash state and
    // filtered to unique docs, (c) cut to the frozen token budget, and
    // (d) packed into training sequences. No stage recomputes anything
    // corpus-sized; state is parquet, as on a lake. Run at ×100 docs.
    lazy val ingestSetup = {
      val d = s"/tmp/graft_prof13_ingest"
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      Dedup.lineFingerprints(
          corpus.select(col("doc_id"),
            TextOps.tokenChunkLines(col("text"), 10).as("text")),
          "doc_id", "text")
        .write.mode("overwrite").parquet(s"$d/linefps")
      val mh = Dedup.minhashDedupState(corpus, "doc_id", "text")
      mh.reps.write.mode("overwrite").parquet(s"$d/reps")
      mh.buckets.write.mode("overwrite").parquet(s"$d/buckets")
      val budgets = corpus.groupBy("lang")
        .agg(sum(tok.cast("long")).as("t")).collect()
        .map(r => r.getString(0) -> math.max(1L, (r.getLong(1) * 3) / 10))
        .toSeq.sortBy(_._1)
      ScaleOps.tokenBudgetState(corpus, "lang", "doc_id", tok, budgets,
          salt = "p13i")
        .write.mode("overwrite").parquet(s"$d/tbstate")
      (Dedup.MinhashDedupState(
          spark.read.parquet(s"$d/reps"),
          spark.read.parquet(s"$d/buckets")),
        spark.read.parquet(s"$d/linefps"),
        ScaleOps.PreparedTokenBudgetState(spark.read.parquet(s"$d/tbstate")))
    }
    if (runs("daily_ingest_composed")) ingestSetup
    time("daily_ingest_composed")({
      val (mh, linefps, tb) = ingestSetup
      val shard = docs.filter(col("doc_id") % 10 === 0)
      // (a) boilerplate/line scrub against the corpus line fingerprints
      // shard-sized intermediate consumed by three branches (dedup flag,
      // semi-join, budget cut) — staged, the narrow-frame rule
      import graft.Staging.StagedFrame
      val scrubbed = Dedup.removeDupLinesAgainst(linefps,
          shard.select(col("doc_id"), col("lang"),
            TextOps.tokenChunkLines(col("text"), 10).as("text")),
          "doc_id", "text")
        .select(col("id").as("doc_id"), col("text_clean").as("text"))
        .join(shard.select(col("doc_id"), col("lang")), "doc_id")
        .staged
      // (b) near-dup flag against the frozen MinHash state; keep uniques
      val uniq = scrubbed.join(
        Dedup.dedupAgainstState(mh, scrubbed, "doc_id", "text")
          .filter(col("dup_of").isNull).select(col("id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      // (c) frozen token-budget cut, (d) sequence packing
      val kept = ScaleOps.sampleToTokenBudgetAgainst(tb, uniq, "lang",
        "doc_id", TextOps.tokenCount(col("text")))
      noop(TextOps.packSequences(kept, "doc_id", "text", window = 2048,
        salt = "p13i"))
    })

    spark.stop()
  }
}
