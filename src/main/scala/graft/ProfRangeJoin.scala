package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Scratch profiler for the bucketized range joins: the q89/q90 workload
  * shapes (purchase→signup-window attribution; click/error overlap) on
  * `SPARK_GRAFT_SF_DIR` events, `PROF_ITERS` iterations, per-iteration and
  * minimum wall times (bursty-steal host — BENCH_NOTES.md methodology:
  * compare minima). `ts` is decoded to epoch-µs via the schema probe
  * (EventTime), so the driver's timestamp parquet and ScaleUp replicas
  * profile identically. */
object ProfRangeJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("PROF_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = graft.sources.EventTime.withEpochMicros(
      spark.read.parquet(s"$sfDir/events.parquet"))
    println(s"[prof] dir=$sfDir events=${e.count()}")

    def noop(df: DataFrame): Long =
      df.queryExecution.toRdd.mapPartitions(it => Iterator.single(it.size.toLong)).sum().toLong

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

    val tenMinUs = 600000000L
    val fiveMinUs = 300000000L
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("tus").as("p_tus"))
    val w = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("w_id"), col("tus").as("lo"),
        (col("tus") + tenMinUs).as("hi"))
    time("range_join_attrib")(noop(
      RangeJoin.pointInInterval(p, "p_tus", w, "lo", "hi", bucketWidth = tenMinUs)))

    def win(tpe: String, pfx: String) = e.filter(col("event_type") === tpe)
      .select(col("event_id").as(s"${pfx}_id"), col("tus").as(s"${pfx}_lo"),
        (col("tus") + fiveMinUs).as(s"${pfx}_hi"))
    time("interval_overlap")(noop(
      RangeJoin.intervalOverlap(win("click", "c"), "c_lo", "c_hi",
        win("error", "x"), "x_lo", "x_hi", bucketWidth = fiveMinUs)))

    spark.stop()
  }
}
