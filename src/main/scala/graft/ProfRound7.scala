package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the round-7 scale fixes: bucketed (histogram-CDF)
  * lift curve and WoE bins vs their exact-NTILE mode. Produces the
  * BENCH_NOTES scaling points proving the bucketed default scales like a
  * pair of narrow scans, not like a single-partition total-order sort.
  * Not part of the driver contract. `SPARK_GRAFT_SF_DIR` points at a
  * testdata dir or a ScaleUp replica dir (lineitem only is enough);
  * `PROF_EXACT=1` additionally times the NTILE mode (avoid at big SF —
  * it is the hazard being measured). */
object ProfRound7 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("PROF_ITERS", "2").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // lazy: a PROF_CC_ONLY run against a documents-only replica dir
    // never touches lineitem
    lazy val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    println(s"[prof] dir=$sfDir")

    def noop(df: DataFrame): Long =
      df.queryExecution.toRdd
        .mapPartitions(it => Iterator.single(it.size.toLong)).sum().toLong
    def time(name: String)(f: => Long): Unit = {
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[prof] $name: $dt%.2f s (rows=$n)")
        dt
      }
      println(f"[prof] $name MIN: ${times.min}%.2f s")
    }

    if (!sys.env.contains("PROF_CC_ONLY")) {
      val score = col("l_extendedprice").cast("double")
      val label = col("l_quantity") > 25
      println(s"[prof] rows=${li.count()}")
      time("lift_bucketed")(noop(
        graft.reg.Eval.liftCurve(li, score, label, col("l_orderkey"), buckets = 10)))
      time("woe_bucketed")(noop(
        graft.operators.Features.woeBins(li, score, label, col("l_orderkey"), bins = 10)))
      if (sys.env.contains("PROF_EXACT")) {
        time("lift_exact_ntile")(noop(
          graft.reg.Eval.liftCurve(li, score, label, col("l_orderkey"),
            buckets = 10, exact = true)))
        time("woe_exact_ntile")(noop(
          graft.operators.Features.woeBins(li, score, label, col("l_orderkey"),
            bins = 10, exact = true)))
      }
    }
    // PROF_CC=1 (needs documents.parquet in the dir): connected
    // components over MinHash-LSH verified pairs (q201) — the loose-τ
    // scale composition vs q172's exact all-pairs generation
    if (sys.env.contains("PROF_CC") || sys.env.contains("PROF_CC_ONLY")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      println(s"[prof] docs=${docs.count()}")
      time("cc_lsh_pairs")(noop(
        graft.operators.Graphs.connectedComponents(
          graft.pipeline.Dedup.minhashPairs(docs, "doc_id", "text",
            n = 2, threshold = 0.5),
          "id1", "id2")))
    }
    spark.stop()
  }
}
