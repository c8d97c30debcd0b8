package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.reg.Eval

/** Scratch profiler for the round-9 bounded Eval rank metrics (AUC / KS /
  * Spearman / Mann-Whitney): the auto-bucketed default vs the forced-exact
  * path on a CONTINUOUS score whose distinct-value table is row-scale —
  * the regime the round-8 verdict flagged (the NTILE cliff in new clothes).
  * Produces the BENCH_NOTES before/after points. Not part of the driver
  * contract. SPARK_GRAFT_SF_DIR points at a dir with lineitem.parquet
  * (a ScaleUp replica for the big point).
  *
  * The score is l_extendedprice plus a DETERMINISTIC sub-cent jitter
  * (xxhash64 of the row key, mapped to [0, 1e-3)): replicated rows get
  * distinct scores, so the distinct table is ~|rows| — exactly the shape a
  * model-scored corpus has. PROF_SKIP_EXACT=1 skips the exact "before"
  * runs (they are the cliff being demonstrated). */
object ProfEval {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("PROF_ITERS", "2").toInt
    val skipExact = sys.env.contains("PROF_SKIP_EXACT")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
    // deterministic row-unique jitter: replicas differ in (orderkey,
    // linenumber, suppkey) triples after ScaleUp's key-shifting
    val jitter = pmod(xxhash64(col("l_orderkey"), col("l_linenumber"),
      col("l_suppkey"), col("l_partkey")), lit(1000000L)).cast("double") / 1e9
    val li = li0.select(
      (col("l_extendedprice") + jitter).as("score"),
      (col("l_quantity").cast("double") + jitter * 7.0).as("score2"),
      (col("l_returnflag") === "R").as("label"),
      (col("l_orderkey") % 2 === 0).as("arm"))
    println(s"[prof] dir=$sfDir rows=${li.count()}")

    def time(name: String, n: Int = iters)(f: => Any): Unit = {
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[prof] $name: $dt%.2f s")
        dt
      }
      println(f"[prof] $name MIN: ${times.min}%.2f s")
    }

    time("auc_auto (probe->bucketed)")(
      Eval.auc(li, col("score"), col("label")))
    time("auc_bucketed_forced")(
      Eval.auc(li, col("score"), col("label"), exact = Some(false)))
    if (!skipExact) time("auc_exact_BEFORE", 1)(
      Eval.auc(li, col("score"), col("label"), exact = Some(true)))

    time("ks_auto")(
      Eval.ksTest(li.filter(col("arm")), li.filter(!col("arm")),
        col("score")).collect())
    if (!skipExact) time("ks_exact_BEFORE", 1)(
      Eval.ksTest(li.filter(col("arm")), li.filter(!col("arm")),
        col("score"), exact = Some(true)).collect())

    time("spearman_auto")(
      Eval.spearman(li, col("score"), col("score2")).collect())
    if (!skipExact) time("spearman_exact_BEFORE", 1)(
      Eval.spearman(li, col("score"), col("score2"),
        exact = Some(true)).collect())

    time("mann_whitney_auto")(
      Eval.mannWhitney(li, col("arm"), col("score")).collect())
    if (!skipExact) time("mann_whitney_exact_BEFORE", 1)(
      Eval.mannWhitney(li, col("arm"), col("score"),
        exact = Some(true)).collect())

    spark.stop()
  }
}
