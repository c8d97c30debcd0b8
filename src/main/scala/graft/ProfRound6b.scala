package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{BloomJoin, Events, Graphs, Linkage, SetSimJoin}
import graft.pipeline.{Dedup, TextOps}

/** Scratch profiler for the second round-6 operator batch (Bloom semi
  * join, prefix-filter set-similarity join, streaks/OHLC/trend/session
  * stats, connected components, record linkage): each op `PROF_ITERS`
  * times on `SPARK_GRAFT_SF_DIR`, per-iteration and minimum wall times
  * (BENCH_NOTES.md methodology — compare minima under bursty steal). */
object ProfRound6b {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("PROF_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // lazy so a PROF_ONLY run against a partial replica dir (e.g. a
    // documents-only ×100 ScaleUp output) never touches absent tables
    lazy val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    lazy val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    lazy val part = spark.read.parquet(s"$sfDir/part.parquet")
    lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    lazy val ev = graft.sources.EventTime.withEpochMicros(
      spark.read.parquet(s"$sfDir/events.parquet"))
    println(s"[prof] dir=$sfDir iters=$iters")

    def noop(df: DataFrame): Long =
      df.queryExecution.toRdd.mapPartitions(it => Iterator.single(it.size.toLong)).sum().toLong

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

    // size the filter to the SF (the operator doc's m ≈ 10n rule): a
    // fixed 2^20 saturates at x100's ~2.4M keys (FP → 1, all overhead,
    // no pruning — measured 24.8 s before this knob existed)
    val bloomBits = sys.env.getOrElse("PROF_BLOOM_BITS", (1 << 20).toString).toInt
    time("bloom_build")(noop(
      li.filter(col("l_quantity") >= 49)
        .select(xxhash64(col("l_orderkey")).as("__h"))
        .agg(graft.functions.BloomAgg(col("__h"), bloomBits, 5).as("__bloom"))))
    time("bloom_probe")(noop {
      val bloomBytes = li.filter(col("l_quantity") >= 49)
        .select(xxhash64(col("l_orderkey")).as("__h"))
        .agg(graft.functions.BloomAgg(col("__h"), bloomBits, 5).as("__bloom"))
        .collect()(0).getAs[Array[Byte]](0)
      ord.filter(graft.functions.PinnedPredicate(
        graft.functions.BloomMightContain(
          xxhash64(col("o_orderkey")), bloomBytes, bloomBits, 5)))
    })
    time("bloom_semijoin")(noop(
      BloomJoin.semiJoin(ord, col("o_orderkey"),
        li.filter(col("l_quantity") >= 49), col("l_orderkey"),
        numBits = bloomBits, numHashes = 5)))
    time("plain_semijoin")(noop( // reference point: no bloom prefilter
      ord.join(li.filter(col("l_quantity") >= 49)
        .select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"), "left_semi")))
    time("setsim_join")(noop(
      SetSimJoin.jaccardJoin(
        docs.select(col("doc_id"), TextOps.tokens(col("text")).as("__toks")),
        "doc_id", TextOps.wordShingles(col("__toks"), 3), 0.5)))
    time("setsim_join_nopos")(noop( // r7 shape: no positional prune
      SetSimJoin.jaccardJoin(
        docs.select(col("doc_id"), TextOps.tokens(col("text")).as("__toks")),
        "doc_id", TextOps.wordShingles(col("__toks"), 3), 0.5,
        positionalFilter = false)))
    time("setsim_candidates") { // candidate-count reduction, pos on/off
      val bound = docs.select(col("doc_id"),
        TextOps.tokens(col("text")).as("__toks"))
      val on = SetSimJoin.stagedCandidates(bound, "doc_id",
        TextOps.wordShingles(col("__toks"), 3), 0.5, true)._2.count()
      val off = SetSimJoin.stagedCandidates(bound, "doc_id",
        TextOps.wordShingles(col("__toks"), 3), 0.5, false)._2.count()
      println(f"[prof] setsim candidates: pos-filter ON=$on OFF=$off " +
        f"(${100.0 * (off - on) / math.max(1L, off)}%.1f%% pruned)")
      on
    }
    time("streaks")(noop(
      Events.activityStreaks(ev, "user_id", "tus", 86400000000L)))
    time("ohlc")(noop(
      Events.ohlcDownsample(ev, "event_type", "tus", "event_id", "value",
        3600000000L)))
    time("rolling_trend")(noop(
      Events.rollingTrend(ev, "event_type", "tus", "value",
        86400000000L, 7)))
    time("session_stats")(noop(
      Events.sessionStats(ev, "user_id", "tus", "event_id",
        1800L * 1000000L)))
    time("record_linkage")(noop(
      Linkage.nearestInBlock(part, "p_partkey", "p_name",
        Seq("p_brand", "p_size"))))
    time("connected_components")(noop(
      Graphs.connectedComponents(
        Dedup.jaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.3),
        "id1", "id2")))
    time("cube_totals")(noop(
      li.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"),
          grouping_id().as("gid"))))
    time("latest_per_key")(noop(
      Events.latestPerKey(ev, Seq("user_id", "event_type"), "tus",
        "event_id", "value")))
    time("stratified_sample")(noop(
      graft.sources.ScaleOps.prioritySampleByGroup(docs, "doc_id", "lang",
        col("n_chars").cast("double"), 20, "ps")))
    time("cohen_kappa")(noop(
      graft.reg.Eval.cohenKappa(docs, col("lang"),
        when(col("doc_id") % 7 === 0, lit("zz")).otherwise(col("lang")))))
    time("lift_curve")(noop(
      graft.reg.Eval.liftCurve(docs, col("n_chars").cast("double"),
        col("lang") === "en", col("doc_id"), 10)))
    time("resample_fill")(noop(
      Events.resampleFill(ev, "user_id", "tus", "event_id", "value",
        86400000000L)))
    time("prop_ztest")(noop(
      graft.reg.Eval.propZTestGrouped(
        ev.withColumn("dow", expr("(tus DIV 86400000000) % 7")),
        Seq("event_type", "dow"),
        col("user_id") % 2 === 0, col("value") > 50)))
    time("bh_adjust")(noop {
      val tests = graft.reg.Eval.propZTestGrouped(
          ev.withColumn("dow", expr("(tus DIV 86400000000) % 7")),
          Seq("event_type", "dow"),
          col("user_id") % 2 === 0, col("value") > 50)
        .select(concat_ws("|", col("event_type"), col("dow")).as("test_id"), col("p"))
      graft.reg.Eval.bhAdjust(tests, "test_id", "p")
    })
    time("skew_join")(noop(
      graft.sources.ScaleOps.saltedJoin(
          li, "l_partkey", part.select("p_partkey", "p_brand"), "p_partkey",
          xxhash64(col("l_orderkey"), col("l_linenumber")), 8)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))))
    time("plain_join")(noop( // reference point for skew_join
      li.join(part.select("p_partkey", "p_brand"),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))))
    time("debounce")(noop(
      Events.debounce(ev, Seq("user_id"), "tus", "event_id", 1800000000L)))
    time("woe_bins")(noop(
      graft.operators.Features.woeBins(docs, col("n_chars").cast("double"),
        col("lang") === "en", col("doc_id"), 10)))
    time("expectations")(noop(
      graft.operators.Quality.expectations(li, Seq(
        "qty_in_range" -> col("l_quantity").between(1, 50),
        "price_positive" -> (col("l_extendedprice") > 0),
        "discount_low" -> (col("l_discount") <= 0.05),
        "flag_known" -> col("l_returnflag").isin("A", "N", "R"),
        "tax_nonneg" -> (col("l_tax") >= 0)))))
    time("pivot")(noop(
      ev.groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))))
    time("cdc_merge")(noop {
      val base = Events.latestPerKey(ev.filter(col("event_id") % 2 === 0),
          Seq("user_id"), "tus", "event_id", "value")
        .select(col("user_id"), col("last_value").as("value"))
      val changes = ev.filter(col("event_id") % 2 === 1)
        .withColumn("op", when(col("event_type") === "error", "D")
          .when(col("event_type") === "signup", "I").otherwise("U"))
      graft.operators.Cdc.merge(base, "user_id", "value", changes, "op",
        "tus", "event_id")
    })
    time("scd2")(noop(
      graft.operators.Cdc.scd2(ev.filter(col("event_type") === "purchase"),
        "user_id", "tus", "event_id", "value")))
    time("corr_matrix")(noop(
      graft.reg.Eval.corrMatrix(li,
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))))
    time("seasonal_residuals")(noop(
      Events.seasonalResiduals(ev, "event_type", "tus", 3600000000L, 24)))
    time("mann_whitney")(noop(
      graft.reg.Eval.mannWhitney(ev, col("user_id") % 2 === 0, col("value"))))
    time("chisq_gof")(noop(
      graft.reg.Eval.chiSquareGof(ev, col("event_type"),
        Seq("view" -> 0.2, "click" -> 0.2, "purchase" -> 0.2,
          "signup" -> 0.2, "error" -> 0.2))))
    time("pq_mse")(noop {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val books = graft.pipeline.Similarity
        .pqTrain(e, "vec_id", "embedding", m = 2, k = 4, iters = 1, dim = 64)
      graft.pipeline.Similarity.pqBlockMse(e, "vec_id", "embedding", books)
    })
    time("canonical_docs")(noop {
      val clusters = Dedup.duplicateClusters(
        Dedup.jaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.4))
      clusters
        .join(docs.select(col("doc_id").as("id"), col("n_chars")), Seq("id"))
        .select(col("cluster"),
          struct((-col("n_chars")).as("neg_len"), col("id")).as("__cand"))
        .groupBy("cluster").agg(min(col("__cand")).as("__best"))
    })

    spark.stop()
  }
}
