package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.TextOps

/** Scratch profiler for the BPE merge loop, before/after the round-8
  * driver-local rewrite (`SPARK_GRAFT_SF_DIR`, `PROF_MERGES`).
  *
  * The job-per-merge loop's ceiling is driver jobs-per-second (7–13
  * merges/s on this host, independent of corpus size once the vocab
  * table is staged) — a production 32k-merge train would be 40–80 min of
  * serial dispatch. The driver-local loop collects the bounded
  * distinct-word vocab once and runs the greedy loop in memory with
  * incremental pair counts + a lazy max-heap; this profiler quantifies
  * both paths for BENCH_NOTES, including a real 32k-merge-shape train. */
object ProfBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nMerges = sys.env.getOrElse("PROF_MERGES", "32000").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[prof] dir=$sfDir docs=${docs.count()} merges=$nMerges")

    // dispatch-bound baseline at a feasible merge count
    for (m <- Seq(64)) {
      val t0 = System.nanoTime()
      val n = TextOps.bpeTrain(docs, "text", numMerges = m,
        driverVocabMax = 0L).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[prof] job-per-merge merges=$m: $dt%.2f s total, " +
        f"${m / dt}%.2f merges/s (rows=$n)")
    }
    // driver-local path: full corpus and the sampled production recipe,
    // at the true 32k production shape
    for (frac <- Seq(1.0, 0.1); m <- Seq(64, nMerges)) {
      val t0 = System.nanoTime()
      val merges = TextOps.bpeTrain(docs, "text", numMerges = m,
        sampleFraction = frac)
      val n = merges.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[prof] driver-local merges=$m sample=$frac: $dt%.2f s " +
        f"total, ${m / dt}%.2f merges/s (rows=$n)")
    }

    // the synthetic corpus vocabulary exhausts in <100 merges, so the
    // true 32k-merge production shape needs a production-sized vocab:
    // 250k distinct words (Zipf-ish freqs, 3-12 chars over a 26-letter
    // alphabet — enough pair mass for >32k distinct merges), driven
    // straight through the collected-vocab loop
    val rnd = new scala.util.Random(42)
    val vocab = Array.tabulate(250000) { i =>
      val len = 3 + rnd.nextInt(10)
      val w = (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val f = math.max(1.0, math.floor(1e6 / (i + 1.0)))
      (" " + w.toCharArray.mkString(" ") + " ", f)
    }
    val t0 = System.nanoTime()
    val got = TextOps.localBpeMerges(vocab, nMerges, maxPasses = 12)
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[prof] driver-local SYNTHETIC vocab=250k merges=$nMerges: " +
      f"$dt%.2f s, ${got.length / dt}%.2f merges/s (rows=${got.length})")
    spark.stop()
  }
}
