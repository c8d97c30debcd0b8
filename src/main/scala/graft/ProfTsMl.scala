package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the round-8 time-series/ML-primitives family:
  * one-way ANOVA, mutual information, decision-stump split search and
  * rank-1 matrix factorization over a ×300 lineitem replica (180M rows);
  * SES forecast + ACF over a ×100 events replica (10M rows); TextRank
  * over a ×100 documents replica (500k docs). Produces the BENCH_NOTES
  * scaling points. Not part of the driver contract.
  *
  * `SPARK_GRAFT_LI_DIR` / `SPARK_GRAFT_EV_DIR` / `SPARK_GRAFT_DOC_DIR`
  * each point at a dir holding the matching parquet (defaults are the
  * sf0.1 testdata); set `PROF_TSML_ONLY` to a comma list of section
  * names (anova, mi, stump, mf, ses, acf, textrank) to run a subset.
  */
object ProfTsMl {
  def main(args: Array[String]): Unit = {
    val liDir = sys.env.getOrElse("SPARK_GRAFT_LI_DIR", "/root/testdata/sf0.1")
    val evDir = sys.env.getOrElse("SPARK_GRAFT_EV_DIR", "/root/testdata/sf0.1")
    val docDir = sys.env.getOrElse("SPARK_GRAFT_DOC_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("PROF_ITERS", "2").toInt
    val only = sys.env.get("PROF_TSML_ONLY").map(_.split(",").toSet)
    def enabled(s: String): Boolean = only.forall(_.contains(s))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Long =
      df.queryExecution.toRdd
        .mapPartitions(it => Iterator.single(it.size.toLong)).sum().toLong
    def time(name: String)(f: => Long): Unit = {
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val got = f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[prof] $name: $dt%.2f s (rows=$got)")
        dt
      }
      println(f"[prof] $name MIN: ${times.min}%.2f s")
    }

    if (enabled("anova") || enabled("mi") || enabled("stump") || enabled("mf")) {
      val li = spark.read.parquet(s"$liDir/lineitem.parquet")
      println(s"[prof] lineitem=$liDir rows=${li.count()}")

      if (enabled("anova")) time("anova_oneway_3grp") {
        noop(graft.reg.Eval.anovaOneWay(li,
          col("l_returnflag"), col("l_extendedprice")))
      }
      if (enabled("mi")) time("mutual_info_flag_status") {
        noop(graft.reg.Eval.mutualInfo(li,
          col("l_returnflag"), col("l_linestatus")))
      }
      if (enabled("stump")) time("stump_3feat_16bins") {
        noop(graft.reg.Trees.bestStumpSplits(li,
          (col("l_returnflag") === "R").cast("int"),
          Seq("l_quantity" -> col("l_quantity"),
            "l_extendedprice" -> col("l_extendedprice"),
            "l_discount" -> col("l_discount")),
          bins = 16))
      }
      if (enabled("mf")) time("rank1_mf_2iter") {
        noop(graft.operators.Recommend.rank1Factors(li,
          "l_suppkey", "l_partkey", "l_quantity", iters = 2))
      }
    }

    if (enabled("ses") || enabled("acf")) {
      val ev = graft.sources.EventTime.withEpochMicros(
        spark.read.parquet(s"$evDir/events.parquet"))
      println(s"[prof] events=$evDir rows=${ev.count()}")
      if (enabled("ses")) time("ses_forecast_hourly") {
        noop(graft.operators.Events.sesForecast(ev,
          "event_type", "tus", "value", periodUs = 3600000000L, alpha = 0.3))
      }
      if (enabled("acf")) time("acf_hourly_lag6") {
        noop(graft.operators.Events.acf(ev,
          "event_type", "tus", periodUs = 3600000000L, maxLag = 6))
      }
    }

    if (enabled("textrank")) {
      val docs = spark.read.parquet(s"$docDir/documents.parquet")
      println(s"[prof] documents=$docDir rows=${docs.count()}")
      time("textrank_5iter_top100") {
        noop(graft.pipeline.Phrase.textRank(docs, "text", k = 100, iters = 5))
      }
    }

    spark.stop()
  }
}
