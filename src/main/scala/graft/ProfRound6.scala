package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Baskets, Events, Features, Graphs}
import graft.pipeline.{Dsir, Phrase, TextOps}

/** Scratch profiler for the round-6 operators (events analytics, basket
  * rules, sketches, PageRank, DSIR, phrase search, percentile rank): runs
  * each op `PROF_ITERS` times on `SPARK_GRAFT_SF_DIR` and prints
  * per-iteration and minimum wall times (BENCH_NOTES.md methodology —
  * compare minima; the host has bursty steal). */
object ProfRound6 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("PROF_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val ev = graft.sources.EventTime.withEpochMicros(
      spark.read.parquet(s"$sfDir/events.parquet"))
    println(s"[prof] dir=$sfDir li=${li.count()} docs=${docs.count()} ev=${ev.count()}")

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

    time("transitions")(noop(
      Events.transitions(ev, "user_id", "tus", "event_type", "event_id")))
    time("anomaly_hours")(noop(
      Events.anomalousPeriods(ev, "tus", 3600000000L)))
    time("cusum")(noop(Events.cusumShifts(ev, "tus", 3600000000L)))
    time("rolling")(noop(
      Events.rollingActivity(ev, "event_type", "tus", 86400000000L, 7)))
    time("decay")(noop(
      Features.decayScores(ev, "user_id", "tus", 604800000000L)))
    time("basket_rules")(noop(
      Baskets.associationRules(li, "l_orderkey", "l_partkey", 3L, 20)))
    time("quantile_sketch")(noop(
      li.groupBy("l_returnflag").agg(graft.functions.QuantileSketchAgg(
        col("l_quantity"), Seq(0.25, 0.5, 0.75, 0.95), 64))))
    time("count_min")(noop(
      docs.agg(graft.functions.CountMinAgg(TextOps.tokens(col("text")),
        Seq("join", "hash", "scan", "vector"), 4, 1024))))
    time("dsir")(noop(Dsir.importanceScoresFlagged(docs,
      "doc_id", "text", col("lang") === "en", buckets = 4096)))
    time("dsir_2frame")(noop(Dsir.importanceScores(docs,
      docs.filter(col("lang") === "en"), "doc_id", "text", buckets = 4096)))
    time("phrase")(noop(Phrase.phraseSearch(docs, "doc_id", "text",
      Seq("row", "column", "sort"))))
    time("percentile_rank")(noop(Features.percentileRank(
      li.select("l_orderkey", "l_linenumber", "l_quantity"), "l_quantity")))
    time("funnel_windowed")(noop(
      Events.funnel(ev, "user_id", "tus", "event_type",
        Seq("view", "click", "purchase"), maxGapUs = Some(86400000000L))))
    time("sequence_patterns")(noop(
      Events.sequencePatterns(ev, "user_id", "tus", "event_type", "event_id", 3, 20)))
    time("source_overlap")(noop(
      graft.pipeline.Dedup.sourceOverlap(docs, "source", "text", n = 2)))
    time("image_ahash") {
      import spark.implicits._
      val ids = docs.select(col("doc_id").cast("long")).as[Long]
      noop(graft.pipeline.Multimodal.bmpAHashes(ids.map(id =>
        graft.pipeline.Multimodal.BinaryDoc(id,
          graft.pipeline.Multimodal.syntheticBmp(id), "image/bmp", 0))).toDF())
    }
    time("image_neardup") {
      import spark.implicits._
      val ids = docs.select(col("doc_id").cast("long")).as[Long]
      val hashes = graft.pipeline.Multimodal.bmpAHashes(ids.map(id =>
        graft.pipeline.Multimodal.BinaryDoc(id,
          graft.pipeline.Multimodal.syntheticBmp(id), "image/bmp", 0))).toDF()
      noop(graft.pipeline.Dedup.hammingPairs(hashes, "doc_id", "ahash", 20, 3))
    }
    time("kmv_distinct")(noop(
      docs.agg(graft.functions.KmvAgg(TextOps.tokens(col("text")), 64))))
    time("snapshot_diff")(noop(
      graft.pipeline.Dedup.snapshotDiff(docs,
        docs.filter(col("doc_id") % 97 =!= 0), "doc_id", "text")))
    time("priority_sample")(noop(
      graft.sources.ScaleOps.prioritySample(docs, "doc_id",
        col("n_chars").cast("double"), k = 200, salt = "ps")))
    time("weighted_quantiles")(noop(
      Features.weightedQuantiles(docs, "n_chars", col("n_chars"),
        Seq(0.25, 0.5, 0.9))))
    time("zipf_fit") {
      val ranked = docs
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("freq").desc, col("w").asc)))
        .select(log(col("rank").cast("double")).as("lx"),
          log(col("freq").cast("double")).as("ly"))
      graft.reg.Dbreg.fit("ly ~ lx", ranked, strategy = "moments")
        .toDF(spark).count()
    }
    time("survival_curve")(noop(
      Events.survivalCurve(ev, "user_id", "tus", "event_type",
        "view", "purchase", quantizeUs = 86400000000L)))
    time("rolling_actives")(noop(
      Events.rollingActiveUsers(ev, "user_id", "tus", 86400000000L, Seq(1, 7))))
    time("pagerank") {
      val dom = TextOps.extractUrls(docs.select(col("doc_id"),
        concat(col("text"), lit(" https://site"), (col("doc_id") % 7).cast("string"),
          lit(".example.org/p x http://cdn.example.net/y")).as("text")),
        "doc_id", "text")
        .select(col("doc_id"), col("domain")).distinct()
      val edges = dom.select(col("doc_id"), col("domain").as("src"))
        .join(dom.select(col("doc_id"), col("domain").as("dst")), Seq("doc_id"))
        .filter(col("src") =!= col("dst"))
      noop(Graphs.pageRank(edges, "src", "dst", iters = 5))
    }
    spark.stop()
  }
}
