package graft

import org.apache.spark.sql.SparkSession
import graft.reg.Dbreg

/** Scratch profiler for the FE-fit bench entries (not part of the driver
  * contract; used to locate the sf10 hotspot in demean/mundlak). */
object ProfFits {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    // PROF_GROUPED_ONLY=1: time just the grouped fits (plain + 1 FE) and
    // exit — used for the big-replica scaling points
    if (sys.env.contains("PROF_GROUPED_ONLY")) {
      if (sys.env.contains("PROF_GROUPED_EXPLAIN")) {
        val fe = Dbreg.fitGrouped("l_extendedprice ~ l_quantity | l_suppkey",
          li, "l_returnflag", maxGroups = Long.MaxValue)
        fe.count()
        println(fe.queryExecution.executedPlan.toString.take(8000))
        spark.stop(); return
      }
      Dbreg.fitGrouped("l_extendedprice ~ l_quantity", li, "l_returnflag").count()
      (1 to 2).foreach { _ =>
        time("fit_grouped_plain")(
          Dbreg.fitGrouped("l_extendedprice ~ l_quantity", li, "l_returnflag").count())
        time("fit_grouped_fe")(
          Dbreg.fitGrouped("l_extendedprice ~ l_quantity | l_suppkey",
            li, "l_returnflag").count())
      }
      spark.stop(); return
    }

    // PROF_HDFE_ONLY=1: time the alternating-projection K-FE path —
    // a small-cardinality 3-FE fit and a high-cardinality 2-FE fit
    // (supplier × linenumber: the mean table big enough to join, the
    // case compress's dummy design cannot express) — and exit
    if (sys.env.contains("PROF_HDFE_ONLY")) {
      (1 to 2).foreach { i =>
        time(s"hdfe_3fe_smallcard (iter $i)")(
          Dbreg.fit(
            "l_extendedprice ~ l_quantity | l_returnflag + l_linestatus + l_linenumber",
            li, strategy = "hdfe"))
        time(s"hdfe_2fe_suppkey (iter $i)")(
          Dbreg.fit("l_extendedprice ~ l_quantity | l_suppkey + l_linenumber",
            li, strategy = "hdfe"))
      }
      spark.stop(); return
    }

    // PROF_AUTO_ONLY=1: the auto-chooser probe cost at scale — the bench's
    // twfe auto fit under the default EXACT distinct-tuple probe vs the
    // probeMode="approx" (HLL) no-distinct-shuffle path, against the
    // compress floor (what auto decides to run)
    if (sys.env.contains("PROF_AUTO_ONLY")) {
      val fml = "l_extendedprice ~ l_quantity + l_discount | l_returnflag + l_linestatus"
      Dbreg.fit(fml, li, strategy = "compress") // warm
      (1 to 2).foreach { i =>
        time(s"twfe_compress (iter $i)")(Dbreg.fit(fml, li, strategy = "compress"))
        time(s"twfe_auto exact-probe (iter $i)")(Dbreg.fit(fml, li, strategy = "auto"))
        time(s"twfe_auto approx-probe (iter $i)")(
          Dbreg.fit(fml, li, strategy = "auto", probeMode = "approx"))
      }
      spark.stop(); return
    }

    // PROF_QREG_ONLY=1: quantile regression at scale — 3 pinned IRLS
    // steps (the q205 shape: 1 OLS init + 3 weighted scans + 1 fused
    // sandwich scan; eps at the price scale)
    if (sys.env.contains("PROF_QREG_ONLY")) {
      (1 to 2).foreach { i =>
        time(s"qreg_tau75_3iter (iter $i)")(
          graft.reg.Qreg.fit("l_extendedprice ~ l_quantity", li,
            tau = 0.75, maxIter = 3, tol = 0.0, eps = 10.0))
      }
      spark.stop(); return
    }

    // warm all paths once
    Dbreg.fit("l_extendedprice ~ l_quantity + l_discount | l_returnflag",
      li, vcov = "hc1", strategy = "demean")
    Dbreg.fit("l_extendedprice ~ l_quantity + l_discount | l_returnflag",
      li, strategy = "mundlak")
    Dbreg.fit("l_extendedprice ~ l_quantity + l_discount", li, strategy = "moments")

    time("moments (baseline single agg)")(
      Dbreg.fit("l_extendedprice ~ l_quantity + l_discount", li, strategy = "moments"))

    // hand-rolled demean pieces to locate the cost
    {
      import org.apache.spark.sql.functions._
      val d = li.select(
        col("l_extendedprice").cast("double").as("y"),
        col("l_quantity").cast("double").as("x1"),
        col("l_discount").cast("double").as("x2"),
        col("l_returnflag").as("fe"))
        .filter(col("y").isNotNull && col("x1").isNotNull &&
          col("x2").isNotNull && col("fe").isNotNull)
      val gm = d.groupBy("fe").agg(avg("y").as("ym"), avg("x1").as("x1m"), avg("x2").as("x2m"))
      time("  piece: means agg")(gm.count())
      val j = d.join(broadcast(gm), Seq("fe"))
        .select((col("y") - col("ym")).as("y"),
          (col("x1") - col("x1m")).as("x1"), (col("x2") - col("x2m")).as("x2"))
      def tri(df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)), sum("y"), sum(col("y") * col("y")),
          sum("x1"), sum(col("x1") * col("y")), sum("x2"), sum(col("x2") * col("y")),
          sum(col("x1") * col("x1")), sum(col("x1") * col("x2")),
          sum(col("x2") * col("x2")))
      time("  piece: moments over demeaned join")(tri(j).collect())
      time("  piece: moments over demeaned join (2nd)")(tri(j).collect())
      println(tri(j).queryExecution.executedPlan.toString.take(3000))
      // variant: no join — subtract map-side via literal lookup
      val gmRows = gm.collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      val ymC = gmRows.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
        when(col("fe") === k, v._1).otherwise(acc) }
      val x1C = gmRows.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
        when(col("fe") === k, v._2).otherwise(acc) }
      val x2C = gmRows.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
        when(col("fe") === k, v._3).otherwise(acc) }
      val jLit = d.select((col("y") - ymC).as("y"),
        (col("x1") - x1C).as("x1"), (col("x2") - x2C).as("x2"))
      time("  piece: moments demean via CASE literals")(tri(jLit).collect())
      // int-key BHJ: same join, key hashed to int
      val dI = d.withColumn("feI", crc32(col("fe")))
      val gmI = gm.withColumn("feI", crc32(col("fe"))).drop("fe")
      val jI = dI.join(broadcast(gmI), Seq("feI"))
        .select((col("y") - col("ym")).as("y"),
          (col("x1") - col("x1m")).as("x1"), (col("x2") - col("x2m")).as("x2"))
      time("  piece: moments over int-key BHJ")(tri(jI).collect())
      // string-key BHJ with whole-stage codegen off
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      time("  piece: moments over BHJ (codegen off)")(tri(j).collect())
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      // persisted broadcast side (no rebuild inside the exchange)
      val gmP = gm.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      gmP.count()
      val jP = d.join(broadcast(gmP), Seq("fe"))
        .select((col("y") - col("ym")).as("y"),
          (col("x1") - col("x1m")).as("x1"), (col("x2") - col("x2m")).as("x2"))
      time("  piece: moments over BHJ (cached build side)")(tri(jP).collect())
      time("  piece: moments over BHJ (cached, 2nd)")(tri(jP).collect())
      gmP.unpersist()
    }
    // per-job accounting for the real demean path
    val jobs = new scala.collection.mutable.ArrayBuffer[(Int, Long, String)]
    val listener = new org.apache.spark.scheduler.SparkListener {
      private val t0s = new scala.collection.concurrent.TrieMap[Int, (Long, String)]
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        t0s(js.jobId) = (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse("?").take(80))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        t0s.remove(je.jobId).foreach { case (t0, d) =>
          jobs += ((je.jobId, System.nanoTime() - t0, d)) }
    }
    spark.sparkContext.addSparkListener(listener)
    time("demean iid")(
      Dbreg.fit("l_extendedprice ~ l_quantity + l_discount | l_returnflag",
        li, strategy = "demean"))
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    jobs.foreach { case (id, ns, d) =>
      println(f"[prof]   job $id%3d ${ns / 1e9}%7.3f s  $d") }
    time("demean hc1")(
      Dbreg.fit("l_extendedprice ~ l_quantity + l_discount | l_returnflag",
        li, vcov = "hc1", strategy = "demean"))
    time("mundlak")(
      Dbreg.fit("l_extendedprice ~ l_quantity + l_discount | l_returnflag",
        li, strategy = "mundlak"))
    time("twfe compress")(
      Dbreg.fit("l_extendedprice ~ l_quantity + l_discount | l_returnflag + l_linestatus",
        li, strategy = "compress"))
    spark.stop()
  }
}
