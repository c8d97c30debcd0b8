package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, TextOps}
import graft.sources.ScaleOps

/** Round-11 scale profiler: exact-substring span removal
  * ([[Dedup.removeDupSpans]]) and the token-budget mixture cut
  * ([[ScaleOps.sampleToTokenBudget]] exact/approx) on
  * `SPARK_GRAFT_SF_DIR` (point it at the ×100 documents replica for the
  * 500k-doc scale row). `PROF_ITERS` iterations, min-statistic
  * (BENCH_NOTES methodology — bursty host steal). `PROF_ONLY` filters by
  * name prefix. Budgets scale with the corpus: ~1/3 of each domain's
  * token mass, derived from one inventory agg so the boundary bucket is
  * always exercised.
  */
object ProfR11 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("PROF_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[prof] dir=$sfDir docs=${docs.count()}")

    def noop(df: DataFrame): Long =
      df.queryExecution.toRdd
        .mapPartitions(it => Iterator.single(it.size.toLong)).sum().toLong

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

    val tok = TextOps.tokenCount(col("text"))
    // budgets at ~1/3 of each domain's token mass (inventory agg once)
    val budgets = docs.filter(col("lang").isNotNull)
      .groupBy("lang").agg(sum(tok.cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> math.max(1L, r.getLong(1) / 3))
      .toSeq.sortBy(_._1)
    println(s"[prof] budgets=$budgets")

    time("span_removal_w5")(noop(
      Dedup.removeDupSpans(docs, "doc_id", "text", width = 5)))
    time("span_removal_w8")(noop(
      Dedup.removeDupSpans(docs, "doc_id", "text", width = 8)))
    time("span_removal_incremental")({
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val fresh = docs.filter(col("doc_id") % 10 === 0)
      val fps = Dedup.spanFingerprints(corpus, "doc_id", "text", width = 5)
      noop(Dedup.removeDupSpansAgainst(fps, fresh, "doc_id", "text",
        width = 5))
    })
    time("token_budget_exact")(noop(
      ScaleOps.sampleToTokenBudget(docs, "lang", "doc_id", tok, budgets,
        salt = "p11")))
    time("token_budget_exact_b64")(noop(
      ScaleOps.sampleToTokenBudget(docs, "lang", "doc_id", tok, budgets,
        salt = "p11", buckets = 64)))
    time("token_budget_approx")(noop(
      ScaleOps.sampleToTokenBudgetApprox(docs, "lang", "doc_id", tok,
        budgets, salt = "p11")))
    time("top_token_budget")(noop(
      ScaleOps.takeTopTokenBudget(docs, "lang", "doc_id", tok,
        TextOps.qualityScore(col("text")), budgets)))
    // the naive window form, for the measured A/B the design claim rests on
    time("token_budget_naive_window")(noop {
      val u = TextOps.hash32(concat(lit("p11"), col("doc_id").cast("string")))
        .cast("double") / lit(4294967296.0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(u.asc, col("doc_id").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val budgetCase = budgets.tail.foldLeft(
        when(col("lang") === budgets.head._1, lit(budgets.head._2))) {
        case (acc, (d, b)) => acc.when(col("lang") === d, lit(b))
      }
      docs
        .withColumn("__cum", coalesce(sum(tok.cast("long")).over(w), lit(0L)))
        .withColumn("__b", budgetCase)
        .filter(col("__b").isNotNull && col("__cum") < col("__b"))
        .drop("__cum", "__b")
    })
    // PROF_ZORDER_DIR: z-order write + manifest-pruned scan vs full scan
    sys.env.get("PROF_ZORDER_DIR").foreach { zdir =>
      val zd = docs.select(col("doc_id"), col("lang"), col("n_chars"),
        tok.cast("long").as("nt"), col("text"))
      time("zorder_write")({
        ScaleOps.zorderWrite(zd, zdir, Seq("n_chars", "nt"),
          bits = 8, numFiles = 64)
        spark.read.parquet(s"$zdir/_zmanifest").count()
      })
      val bounds = Seq(("n_chars", 200.0, 400.0), ("nt", 30.0, 60.0))
      time("zorder_pruned_scan")(noop(ScaleOps.zorderScan(spark, zdir, bounds)))
      time("zorder_full_filter")(noop(
        spark.read.parquet(zdir)
          .filter(col("n_chars").between(200, 400) && col("nt").between(30, 60))))
      val nFiles = spark.read.parquet(s"$zdir/_zmanifest").count()
      val nRead = ScaleOps.zorderScan(spark, zdir, bounds)
        .select(input_file_name()).distinct().count()
      println(s"[prof] zorder files read $nRead / $nFiles")
    }

    // PROF_LI_DIR: the 180M-row point — token budgets over lineitem,
    // domain = l_returnflag (3 domains → 60M-row per-domain sorts for
    // the naive window; the scale where the two-phase filter should win)
    sys.env.get("PROF_LI_DIR").foreach { liDir =>
      val li = spark.read.parquet(s"$liDir/lineitem.parquet")
        .withColumn("lid",
          col("l_orderkey") * lit(10L) + col("l_linenumber").cast("long"))
      println(s"[prof] lineitem=${li.count()}")
      val ltok = col("l_quantity")
      val lb = li.groupBy("l_returnflag")
        .agg(sum(ltok.cast("long")).as("t"))
        .collect().map(r => r.getString(0) -> math.max(1L, r.getLong(1) / 3))
        .toSeq.sortBy(_._1)
      println(s"[prof] li budgets=$lb")
      time("li_token_budget_exact")(noop(
        ScaleOps.sampleToTokenBudget(li, "l_returnflag", "lid", ltok, lb,
          salt = "p11")))
      time("li_token_budget_approx")(noop(
        ScaleOps.sampleToTokenBudgetApprox(li, "l_returnflag", "lid", ltok,
          lb, salt = "p11")))
      time("li_top_token_budget")(noop(
        ScaleOps.takeTopTokenBudget(li, "l_returnflag", "lid", ltok,
          col("l_extendedprice"), lb)))
      time("li_token_budget_naive_window")(noop {
        val u = TextOps.hash32(concat(lit("p11"), col("lid").cast("string")))
          .cast("double") / lit(4294967296.0)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_returnflag")).orderBy(u.asc, col("lid").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val budgetCase = lb.tail.foldLeft(
          when(col("l_returnflag") === lb.head._1, lit(lb.head._2))) {
          case (acc, (d, b)) => acc.when(col("l_returnflag") === d, lit(b))
        }
        li
          .withColumn("__cum", coalesce(sum(ltok.cast("long")).over(w), lit(0L)))
          .withColumn("__b", budgetCase)
          .filter(col("__b").isNotNull && col("__cum") < col("__b"))
          .drop("__cum", "__b")
      })
    }
    spark.stop()
  }
}
