package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Similarity, TextOps}
import graft.sources.ScaleOps

/** Scratch profiler for the round-4 corpus operators (dupSpans, semDedup,
  * weightedSample, sampleToMix, int8 quantization): runs each op
  * `PROF_ITERS` times on `SPARK_GRAFT_SF_DIR` and prints per-iteration and
  * minimum wall times (the host has bursty steal — BENCH_NOTES.md
  * methodology says compare minima across samples).
  */
object ProfCorpusOps {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("PROF_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.DataFrame

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"[prof] dir=$sfDir docs=${docs.count()} emb=${emb.count()}")

    def noop(df: DataFrame): Long =
      df.queryExecution.toRdd.mapPartitions(it => Iterator.single(it.size.toLong)).sum().toLong

    // PROF_ONLY: comma list of name prefixes to run (default: all)
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

    time("dup_spans")(noop(Dedup.dupSpans(docs, "doc_id", "text", width = 5)))
    time("weighted_sample")(noop(
      ScaleOps.weightedSample(docs, "doc_id", TextOps.qualityScore(col("text")), "p")))
    time("sample_mix")(noop(
      ScaleOps.sampleToMix(docs, "lang", "doc_id",
        Seq("en" -> 0.5, "zh" -> 0.25, "de" -> 0.25), "p")))
    time("int8_quantize") {
      noop(emb
        .select(col("vec_id"), col("embedding"),
          Similarity.int8Scale(col("embedding")).as("scale"))
        .select(col("vec_id"),
          Similarity.int8Quantize(col("embedding"), col("scale")).as("q"),
          col("scale")))
    }
    time("containment_pairs")(noop(
      Dedup.containmentPairs(docs, "doc_id", "text", k = 16, w = 8,
        threshold = 0.5, maxFpDocFreq = Some(50L))))
    // valve scaled to the corpus: the synthetic ~50-word vocabulary makes
    // nearly every bigram hot (36M candidate pairs/5k docs under the
    // default 1000 cap — OOM at ×100); real Zipfian text does not need this
    time("edit_distance_pairs")(noop(
      Dedup.editDistancePairs(docs, "doc_id", "text", maxDist = 6,
        maxShingleDocFreq = Some(100L))))
    time("pack_sequences")(noop(
      TextOps.packSequences(docs, "doc_id", "text", 512, "p")))
    time("pack_sequences_sharded")(noop(
      TextOps.packSequences(docs, "doc_id", "text", 512, "p", Some("lang"))))
    time("token_entropy")(noop(TextOps.tokenEntropy(docs, "doc_id", "text")))
    time("strip_markup")(noop(docs.select(col("doc_id"),
      TextOps.stripMarkup(col("text")).as("v"),
      TextOps.markupRatio(col("text")).as("r"))))
    // incremental dedup: 90% corpus / 10% incoming shard
    time("dedup_against")(noop(Dedup.dedupAgainst(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 100000000L),
      "doc_id", "text", n = 2, threshold = 0.4)))
    // k tracks corpus size (SemDeDup contract): ~ n/250 cells
    val k = math.max(8, (emb.count() / 250).toInt)
    time(s"semdedup_k$k")(noop(
      Similarity.semDedup(emb, "vec_id", "embedding", threshold = 0.45, k = k, iters = 2, dim = 64)))
    spark.stop()
  }
}
