package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, TextOps}
import graft.sources.ScaleOps

/** Round-12 scale profiler — the measured A/Bs this round's decisions
  * rest on:
  *
  *   1. span-removal tokenized-corpus staging (staged vs unstaged, w=5/8)
  *      on `SPARK_GRAFT_SF_DIR` documents (point at ×100 / ×1000
  *      replicas) — the round-11 verdict's open multiplier;
  *   2. incremental span removal, both staging arms, same dirs;
  *   3. takeTopTokenBudget with an EXPENSIVE priority: in-scan vs
  *      materializePriority=true vs caller-side stored column;
  *   4. tokenBudgetState build + sampleToTokenBudgetAgainst shard
  *      application (the exact cut's ingest/streaming path);
  *   5. `PROF_LI_DIR`: the 180M-row point under REAL 90/9/1 domain skew —
  *      exact cut at B ∈ {1024, 16384, 131072} (the `buckets` sizing
  *      rule), plus the ×1000-class minima re-runs (approx, exact B=64).
  *
  * `PROF_ITERS` iterations, min-statistic (BENCH_NOTES methodology —
  * bursty host steal). `PROF_ONLY` filters by name prefix.
  */
object ProfR12 {
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
    val liOnly = only.exists(_.forall(_.startsWith("li_")))
    if (!liOnly) println(s"[prof] dir=$sfDir docs=${docs.count()}")

    // 1. staging A/B: the tokenized corpus is a pure codegen'd projection
    // consumed by three branches — the exact pattern two prior A/Bs
    // flipped (rank-1 MF 178.8->16.9 s, token-budget base 69.6->16.4 s)
    for (w <- Seq(5, 8)) {
      time(s"span_removal_w${w}_staged")(noop(
        Dedup.removeDupSpansImpl(docs, "doc_id", "text", width = w,
          stageTokens = true)))
      time(s"span_removal_w${w}_unstaged")(noop(
        Dedup.removeDupSpansImpl(docs, "doc_id", "text", width = w,
          stageTokens = false)))
    }

    // 2. ingest mode, both arms (shard = 10% of docs, corpus = the rest)
    for (staged <- Seq(true, false)) {
      time(s"span_incremental_${if (staged) "staged" else "unstaged"}")({
        val corpus = docs.filter(col("doc_id") % 10 =!= 0)
        val fresh = docs.filter(col("doc_id") % 10 === 0)
        val fps = Dedup.spanFingerprints(corpus, "doc_id", "text", width = 5)
        noop(Dedup.removeDupSpansAgainstImpl(fps, fresh, "doc_id", "text",
          width = 5, stageTokens = staged))
      })
    }

    // 3. expensive-priority A/B at the q237 point (quality over text)
    lazy val tok = TextOps.tokenCount(col("text"))
    lazy val budgets = docs.filter(col("lang").isNotNull)
      .groupBy("lang").agg(sum(tok.cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> math.max(1L, r.getLong(1) / 3))
      .toSeq.sortBy(_._1)
    time("top_budget_inscan")(noop(
      ScaleOps.takeTopTokenBudget(docs, "lang", "doc_id", tok,
        TextOps.qualityScore(col("text")), budgets)))
    time("top_budget_materialized")(noop(
      ScaleOps.takeTopTokenBudget(docs, "lang", "doc_id", tok,
        TextOps.qualityScore(col("text")), budgets,
        materializePriority = true)))
    time("top_budget_caller_staged")({
      // the documented caller-side remedy: store the priority, pass a col
      import graft.Staging.StagedFrame
      val scored = docs
        .withColumn("__q", TextOps.qualityScore(col("text"))).staged
      noop(ScaleOps.takeTopTokenBudget(scored, "lang", "doc_id", tok,
        col("__q"), budgets))
    })

    // 4. frozen-state exact cut: state build + one-shard application
    time("budget_state_build")(noop(
      ScaleOps.tokenBudgetState(docs, "lang", "doc_id", tok, budgets,
        salt = "p12")))
    time("budget_state_apply_shard")({
      val state = ScaleOps.tokenBudgetState(docs, "lang", "doc_id", tok,
        budgets, salt = "p12").cache()
      state.count()
      val shard = docs.filter(col("doc_id") % 10 === 0)
      val n = noop(ScaleOps.sampleToTokenBudgetAgainst(state, shard,
        "lang", "doc_id", tok))
      state.unpersist()
      n
    })

    // 4b. priority-cut frozen state (the takeTopTokenBudget twin)
    time("top_budget_state_build")(noop(
      ScaleOps.topTokenBudgetState(docs, "lang", "doc_id", tok,
        TextOps.qualityScore(col("text")), budgets)))
    time("top_budget_state_apply_shard")({
      val state = ScaleOps.topTokenBudgetState(docs, "lang", "doc_id", tok,
        TextOps.qualityScore(col("text")), budgets).cache()
      state.count()
      val shard = docs.filter(col("doc_id") % 10 === 0)
      val n = noop(ScaleOps.takeTopTokenBudgetAgainst(state, shard,
        "lang", "doc_id", tok, TextOps.qualityScore(col("text"))))
      state.unpersist()
      n
    })

    // 4c. the saturating-score tie-break pattern from the scaladoc: a
    // deterministic epsilon below score resolution thins the sliver from
    // the tied class back to ~n/buckets
    // epsilon BELOW the probe's cell width (span·relErr ≈ 1e-3): the tied
    // class lands in one histogram cell and cannot split — sliver stays fat
    time("top_budget_state_build_tiebroken_1e9")(noop(
      ScaleOps.topTokenBudgetState(docs, "lang", "doc_id", tok,
        TextOps.qualityScore(col("text")) +
          TextOps.hash32(col("doc_id").cast("string")).cast("double") /
            lit(4294967296.0) * lit(1e-9),
        budgets)))
    // epsilon ABOVE the probe resolution (1e-5 with relErr = 1e-6 → cell
    // width 1e-6): ties spread across ~10 cells, interpolation is valid
    // again, sliver thins back to ≈ n/buckets
    time("top_budget_state_build_tiebroken_1e5")(noop(
      ScaleOps.topTokenBudgetState(docs, "lang", "doc_id", tok,
        TextOps.qualityScore(col("text")) +
          TextOps.hash32(col("doc_id").cast("string")).cast("double") /
            lit(4294967296.0) * lit(1e-5),
        budgets, relErr = 1e-6)))

    // 6. round-12 second batch: line dedup (removal + ingest) and the
    // epoch-repeat budget, on the same corpora. Line structure is
    // synthesized from the flat text (~10-token chunk "lines") — the
    // operator's cost is in the explode/agg/rebuild, not the chunking.
    lazy val mlText = docs.select(col("doc_id"), col("lang"),
      TextOps.tokenChunkLines(col("text"), 10).as("text"))
    time("line_dedup_removal")(noop(
      Dedup.removeDupLines(mlText, "doc_id", "text")))
    time("line_dedup_incremental")({
      val corpus = mlText.filter(col("doc_id") % 10 =!= 0)
      val fresh = mlText.filter(col("doc_id") % 10 === 0)
      val fps = Dedup.lineFingerprints(corpus, "doc_id", "text")
      noop(Dedup.removeDupLinesAgainst(fps, fresh, "doc_id", "text"))
    })
    // epoch-repeat budget: 7·(T/3) ≈ 2.33 epochs per domain — 2 full
    // passes (pure projection + explode) + one remainder cut
    time("repeat_token_budget")(noop(
      ScaleOps.repeatToTokenBudget(docs, "lang", "doc_id", tok,
        budgets.map { case (d, b) => d -> b * 7 })))
    // global sequence packing after the two-phase rewrite (the global
    // cumsum no longer runs on one reducer — driver-seeded per-bucket
    // windows; old single-partition-window numbers in the r4 table) —
    // both staging arms of the slim (id, n_tokens, u) frame
    for (st <- Seq(false, true)) {
      val tag = if (st) "staged" else "unstaged"
      time(s"pack_global_$tag")(noop(
        TextOps.packSequencesImpl(docs, "doc_id", "text", 512, "p",
          None, 1024, stageSlim = st)))
      time(s"pack_sharded_$tag")(noop(
        TextOps.packSequencesImpl(docs, "doc_id", "text", 512, "p",
          Some("lang"), 1024, stageSlim = st)))
    }

    // 6b. MinHash ingest: per-shard cost with corpus tables rebuilt per
    // call (convenience form) vs applied from frozen cached state
    time("mh_dedup_convenience")({
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val fresh = docs.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      noop(Dedup.dedupAgainst(corpus, fresh, "doc_id", "text"))
    })
    time("mh_dedup_state_build")({
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val state = Dedup.minhashDedupState(corpus, "doc_id", "text")
      noop(state.reps) + noop(state.buckets)
    })
    if (!only.exists(ps => !ps.exists("mh_dedup_state_apply".startsWith))) {
      // steady state: the corpus tables are built ONCE (cached here, the
      // lake in production) — the timed loop is the per-shard apply alone
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val state = Dedup.minhashDedupState(corpus, "doc_id", "text")
      state.reps.cache().count(); state.buckets.cache().count()
      val fresh = docs.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      time("mh_dedup_state_apply")(noop(
        Dedup.dedupAgainstState(state, fresh, "doc_id", "text")))
      state.reps.unpersist(); state.buckets.unpersist()
    }

    // 5. 180M-row point: real 90/9/1 domain skew + B sweep + minima re-runs
    sys.env.get("PROF_LI_DIR").foreach { liDir =>
      val li = spark.read.parquet(s"$liDir/lineitem.parquet")
        .withColumn("lid",
          col("l_orderkey") * lit(10L) + col("l_linenumber").cast("long"))
      println(s"[prof] lineitem=${li.count()}")
      val ltok = col("l_quantity")
      // synthetic 90/9/1 skew: 'web' owns ~90% of rows — the crawl shape
      val h = pmod(xxhash64(col("lid")), lit(100L))
      val skewed = li.withColumn("dom",
        when(h < 90, "web").when(h < 99, "books").otherwise("code"))
      val sb = skewed.groupBy("dom").agg(sum(ltok.cast("long")).as("t"))
        .collect().map(r => r.getString(0) -> math.max(1L, r.getLong(1) / 3))
        .toSeq.sortBy(_._1)
      println(s"[prof] skew budgets=$sb")
      for (b <- Seq(1024, 16384, 131072)) {
        time(s"li_skew_budget_exact_b$b")(noop(
          ScaleOps.sampleToTokenBudget(skewed, "dom", "lid", ltok, sb,
            salt = "p12", buckets = b)))
      }
      // the minima re-runs the r11 notes left unrecorded (steal burst)
      val lb = li.groupBy("l_returnflag")
        .agg(sum(ltok.cast("long")).as("t"))
        .collect().map(r => r.getString(0) -> math.max(1L, r.getLong(1) / 3))
        .toSeq.sortBy(_._1)
      time("li_token_budget_approx")(noop(
        ScaleOps.sampleToTokenBudgetApprox(li, "l_returnflag", "lid", ltok,
          lb, salt = "p11")))
      time("li_token_budget_exact_b64")(noop(
        ScaleOps.sampleToTokenBudget(li, "l_returnflag", "lid", ltok, lb,
          salt = "p11", buckets = 64)))
      // epoch-repeat budget at 180M: 2 full epochs + remainder per domain
      time("li_repeat_token_budget")(noop(
        ScaleOps.repeatToTokenBudget(li, "l_returnflag", "lid", ltok,
          lb.map { case (d, b) => d -> b * 7 }, salt = "p12")))
    }
    spark.stop()
  }
}
