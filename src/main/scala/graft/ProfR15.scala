package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Round-15 profiler: the frozen duplicate-cluster state's growth
  * dividend at the ×100 documents replica (500k docs) — the r14 verdict
  * measured `leakageSafeSplit` at 20.2 s/500k with the cost dominated by
  * the per-call pairs+CC; the state freezes that once. Three arms:
  *
  *   1. `leakageSafeSplit` (per-call minhashPairs + CC — the r14 point)
  *   2. `dupClusterState` build + persist (the once-per-pair-batch cost)
  *   3. `leakageSafeSplitAgainst` from the parquet state (steady state)
  *   4. `dupClusterStateMerge` folding a 10 % shard's new pairs in (the
  *      daily refresh — CC over state+shard pairs, never corpus pairs)
  *
  * Also times the round's other new ops on the same replica:
  * `contaminationBySuite` (two-suite state) vs aggregate apply, and the
  * `decontaminate` scrub vs the flag-only measure.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<x100-docs replica> runMain graft.ProfR15
  */
object ProfR15 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/x100d")
    val iters = sys.env.get("SPARK_GRAFT_BENCH_ITERS").map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.DataFrame
    def docs = graft.sources.ScaleOps.normalizeParallelism(
      spark.read.parquet(s"$dir/documents.parquet"), 32)
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def timed(name: String)(f: => Unit): Unit = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profr15] $name%-52s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val tmp = java.nio.file.Files.createTempDirectory("profr15").toString
    val weights = Seq("train" -> 0.98, "eval" -> 0.02)
    val ctOnly = sys.env.contains("PROF_R15_CT_ONLY")

    docs.count() // warmup footers

    if (!ctOnly) {
    // -- arm 1: the per-call shape (pairs + CC every split) --
    timed("leakage_split per-call (pairs+CC, r14 shape)") {
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        n = 2, threshold = 0.5)
      sink(graft.sources.ScaleOps.leakageSafeSplit(docs, "doc_id", pairs,
        weights, salt = "p15"))
    }

    // -- arm 2: freeze once (build + persist) --
    timed("dupClusterState build+persist (once per pair batch)") {
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        n = 2, threshold = 0.5)
      Dedup.dupClusterState(pairs).clusters
        .write.mode("overwrite").parquet(s"$tmp/dc")
    }
    val state = Dedup.DupClusterState(spark.read.parquet(s"$tmp/dc"))
    println(s"[profr15] state rows = ${state.clusters.count()}")

    // -- arm 3: steady-state split from the parquet state --
    timed("leakageSafeSplitAgainst (parquet state)") {
      sink(graft.sources.ScaleOps.leakageSafeSplitAgainst(state, docs,
        "doc_id", weights, salt = "p15"))
    }

    // -- arm 4: daily refresh — fold a 10% shard's new pairs in --
    // NOTE (r16): this arm folds shard-INTERNAL pairs only and is kept
    // as the historical r15 measurement. It is NOT the complete refresh
    // recipe — a new doc near-dupping a RESIDENT doc contributes no
    // edge here and could straddle a later split. The complete recipe
    // (internal + cross-corpus all-matches edges) is
    // Dedup.dupClusterStateIngest, priced in ProfR16.
    val shard = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 10000000L)
    timed("dupClusterStateMerge (10% shard's pairs folded in)") {
      val newPairs = Dedup.minhashPairs(shard, "doc_id", "text",
        n = 2, threshold = 0.5)
      sink(Dedup.dupClusterStateMerge(state, newPairs).clusters)
    }
    }

    // -- contamination family: aggregate vs per-suite vs scrub --
    // PROF_R15_SLIVER restricts the suites to the replica's BASE slice
    // (doc_id < 5000): on a ×N replica the plain %37 "suite" spans every
    // copy and its shingle set saturates toward the whole corpus's — an
    // adversarial stress, not the steady-state eval-suite-vs-corpus
    // ratio; the sliver mode measures the realistic sliver-state shape
    val sliver = sys.env.contains("PROF_R15_SLIVER")
    def suiteOf(m: Int) = {
      val f = col("doc_id") % m === 0
      docs.filter(if (sliver) f && col("doc_id") < 5000L else f)
    }
    val stA = Dedup.contaminationState(
      suiteOf(37), "doc_id", "text", n = 2, suite = "s37")
    val stB = Dedup.contaminationState(
      suiteOf(41), "doc_id", "text", n = 2, suite = "s41")
    Dedup.contaminationStateMerge(stA, stB).shingles
      .write.mode("overwrite").parquet(s"$tmp/ct")
    val ct = Dedup.ContaminationState(spark.read.parquet(s"$tmp/ct"))
    timed("contaminationAgainst (aggregate flag, 2-suite state)") {
      sink(Dedup.contaminationAgainst(ct, docs, "doc_id", "text", n = 2))
    }
    timed("contaminationBySuite (attribution, same state)") {
      sink(Dedup.contaminationBySuite(ct, docs, "doc_id", "text", n = 2))
    }
    timed("decontaminate (span scrub, same state)") {
      sink(Dedup.decontaminate(ct, docs, "doc_id", "text"))
    }
    spark.stop()
  }
}
