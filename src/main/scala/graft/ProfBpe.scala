package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.TextOps

/** Scratch profiler for the BPE merge loop: per-merge wall time vs corpus
  * size and merge count (`SPARK_GRAFT_SF_DIR`, `PROF_MERGES`). Each merge
  * is one keyed pair-count aggregate over the frequency-weighted distinct
  * WORD vocabulary plus a 1-row collect, so the loop's ceiling is
  * jobs-per-second on the driver, not corpus bytes — quantified here for
  * BENCH_NOTES (a production 32k-merge train would be bounded by
  * merges / (jobs/sec), independent of corpus size once the vocab table
  * is staged). */
object ProfBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nMerges = sys.env.getOrElse("PROF_MERGES", "64").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[prof] dir=$sfDir docs=${docs.count()} merges=$nMerges")

    for (m <- Seq(8, nMerges); frac <- Seq(1.0, 0.1)) {
      val t0 = System.nanoTime()
      val merges = TextOps.bpeTrain(docs, "text", numMerges = m,
        sampleFraction = frac)
      val n = merges.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[prof] bpeTrain merges=$m sample=$frac: $dt%.2f s total, " +
        f"${dt / m}%.3f s/merge, ${m / dt}%.2f merges/s (rows=$n)")
    }
    spark.stop()
  }
}
