package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, TextOps}

/** Round-17 A/B profiler: INTERLEAVED pairs in one JVM (min AND mean per
  * arm, ≥5 pairs — the VERDICT r16 item-6 protocol), plus structural
  * counters per run. Arms:
  *
  *   - `lsh`: minhashPairs bucket-valve staging ON vs OFF at ×`mult` docs
  *     (toggled live via the graft.lsh.stageBuckets system property)
  *   - `pack`: packSequences stageSlim(repartitioned) vs unstaged
  *   - `tokens`: native WhitespaceTokens vs the HOF split+filter spelling
  *   - `repeat`: the fused-histogram repeatToTokenBudget (counts only —
  *     the before shape lives at the r16 commit)
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ProfR17 [arm...] [xN]
  */
object ProfR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val pairs = sys.env.get("PROF17_PAIRS").map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val mult = args.find(_.startsWith("x")).map(_.drop(1).toInt).getOrElse(1)
    val only = args.filterNot(_.startsWith("x")).toSet

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def docsWide = {
      val d = graft.sources.ScaleOps.normalizeParallelism(docs, cpus.toInt)
      if (mult == 1) d
      else (1 to mult).map(i => d.withColumn("doc_id",
        col("doc_id") + lit(i.toLong * 10000000L))).reduce(_ unionAll _)
    }
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the pre-r17 HOF tokens spelling, verbatim
    def hofTokens(text: org.apache.spark.sql.Column) =
      filter(split(lower(text), "\\s+"), t => length(t) > 0)

    val tok = TextOps.tokenCount(col("text"))
    lazy val repeatBudgets = docs.groupBy("lang")
      .agg(sum(tok.cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> math.max(1L, (r.getLong(1) * 2.4).toLong))
      .toSeq.sortBy(_._1)

    val abArms: Seq[(String, () => Unit, () => Unit)] = Seq(
      ("lsh",
        () => { // A: staged (default)
          System.clearProperty("graft.lsh.stageBuckets")
          sink(Dedup.minhashPairs(docsWide, "doc_id", "text", n = 2, threshold = 0.5))
        },
        () => { // B: unstaged
          System.setProperty("graft.lsh.stageBuckets", "false")
          sink(Dedup.minhashPairs(docsWide, "doc_id", "text", n = 2, threshold = 0.5))
          System.clearProperty("graft.lsh.stageBuckets")
        }),
      ("pack",
        () => sink(TextOps.packSequencesImpl(docsWide, "doc_id", "text",
          window = 2048, salt = "bench", shardCol = None, buckets = 1024,
          stageSlim = true)),
        () => sink(TextOps.packSequencesImpl(docsWide, "doc_id", "text",
          window = 2048, salt = "bench", shardCol = None, buckets = 1024,
          stageSlim = false))),
      ("tokens",
        () => sink(docsWide.select(col("doc_id"),
          TextOps.tokens(col("text")).as("t"))),
        () => sink(docsWide.select(col("doc_id"),
          hofTokens(col("text")).as("t")))),
      ("text_analysis",
        () => sink(docsWide
          .withColumn("__t", TextOps.tokens(col("text")))
          .select(col("doc_id"),
            TextOps.langIdT(col("text"), col("__t")).as("lang"),
            TextOps.qualityScoreT(col("text"), col("__t")).as("q"),
            TextOps.fingerprint(col("text")).as("fp"))),
        () => sink(docsWide
          .withColumn("__t", hofTokens(col("text")))
          .select(col("doc_id"),
            TextOps.langIdT(col("text"), col("__t")).as("lang"),
            TextOps.qualityScoreT(col("text"), col("__t")).as("q"),
            TextOps.fingerprint(col("text")).as("fp")))),
      ("repeat",
        () => sink(graft.sources.ScaleOps.repeatToTokenBudget(docsWide,
          "lang", "doc_id", tok, repeatBudgets, salt = "bench")),
        () => ())
    )

    val selected = abArms.filter { case (n, _, _) =>
      only.isEmpty || only.exists(n.startsWith) }

    // warmup both forms
    selected.foreach { case (name, a, b) =>
      try { a(); b() }
      catch { case e: Throwable => System.err.println(s"[prof17] warmup $name: $e") }
    }

    def stats(xs: Seq[Double]): String =
      f"min ${xs.min}%7.3f  mean ${xs.sum / xs.size}%7.3f  " +
        xs.map(x => f"$x%.2f").mkString("[", " ", "]")

    selected.foreach { case (name, a, b) =>
      val ta = scala.collection.mutable.ArrayBuffer.empty[Double]
      val tb = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to pairs).foreach { _ =>
        var t0 = System.nanoTime()
        try a() catch { case e: Throwable => System.err.println(s"[prof17] $name/A: $e") }
        ta += (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        try b() catch { case e: Throwable => System.err.println(s"[prof17] $name/B: $e") }
        tb += (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-14s A ${stats(ta.toSeq)}")
      println(f"$name%-14s B ${stats(tb.toSeq)}")
    }
    spark.stop()
  }
}
