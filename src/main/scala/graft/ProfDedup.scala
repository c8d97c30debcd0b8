package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.Dedup

/** Scratch profiler for the minhashPairs bench bimodality (10 s vs 55 s
  * across JVMs at the same scale): runs the pipeline N times in one JVM,
  * printing per-iteration wall times. AQE toggled via PROF_AQE=false. */
object ProfDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-gen/x10")
    val aqe = sys.env.getOrElse("PROF_AQE", "true")
    val iters = sys.env.getOrElse("PROF_ITERS", "5").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    import scala.jdk.CollectionConverters._
    def gcMillis: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

    // PROF_MODE=pipeline: time each sub-stage of minhashPairs separately
    // (mirrors Dedup.minhashPairs internals; keep in sync when it changes)
    if (sys.env.get("PROF_MODE").contains("pipeline")) {
      import org.apache.spark.sql.functions._
      def time[T](name: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      (1 to 2).foreach { round =>
        println(s"--- pipeline round $round ---")
        val sh = Dedup.shingleArrays(docs, "doc_id", "text", 2)
        val keyed = sh
          .withColumn("__fp", md5(concat_ws("", array_sort(col("sharr")))))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        time("1 keyed (shingle+md5+persist)")(keyed.count())
        val memb = keyed.select(col("__fp"), col("id"))
        val repSh = keyed.groupBy("__fp")
          .agg(min(col("id")).as("id"), min_by(col("sharr"), col("id")).as("sharr"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        time("2 repSh (class collapse)")(repSh.count())
        val sigs = repSh
          .select(col("id"),
            transform(col("sharr"),
              s => graft.pipeline.TextOps.hash32(s) % Dedup.MinhashP).as("__xs"))
          .select(col("id"), array((0 until Dedup.NumHashes).map { i =>
            array_min(transform(col("__xs"),
              x => (x * Dedup.minhashA(i) + Dedup.minhashB(i)) % Dedup.MinhashP))
          }: _*).as("sig"))
        val bk0 = Dedup.lshBuckets(sigs)
        time("3 sigs+buckets")(bk0.write.format("noop").mode("overwrite").save())
        val ok = bk0.groupBy("band", "bucket").agg(count(lit(1)).as("__bsz"))
          .filter(col("__bsz") <= 1000L).select("band", "bucket")
        val bk = bk0.join(ok, Seq("band", "bucket"), "left_semi")
        val cand = bk.as("a").join(bk.as("b"), Seq("band", "bucket"))
          .filter(col("a.id") < col("b.id"))
          .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
        time("4 valve+selfjoin+distinct")(println(s"  cand=${cand.count()}"))
        val full = Dedup.minhashPairs(docs, "doc_id", "text", 2, 0.5)
        time("5 full pipeline")(full.write.format("noop").mode("overwrite").save())
        keyed.unpersist(); repSh.unpersist()
      }
      spark.stop(); return
    }

    // stage-level tracing: (stageId, name, wall ms, task count, max task ms)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Int, Long)]()
    val taskMax = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = t.taskInfo.duration
        taskMax.merge(t.stageId, d, (a, b) => math.max(a, b))
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b).getOrElse(-1L)
        stages.add((i.stageId, i.name.takeWhile(_ != '\n').take(60), wall,
          i.numTasks, Option(taskMax.get(i.stageId)).map(_.toLong).getOrElse(-1L)))
      }
    })
    (1 to iters).foreach { i =>
      val g0 = gcMillis
      val t0 = System.nanoTime()
      Dedup.minhashPairs(docs, "doc_id", "text", n = 2, threshold = 0.5)
        .write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[prof] iter $i: $secs%.2f s  " +
        f"gc=${(gcMillis - g0) / 1000.0}%.2f s " +
        f"(aqe=$aqe, storage=${spark.sparkContext.getRDDStorageInfo.length} rdds)")
      val snap = stages.asScala.toVector.sortBy(-_._3).take(6)
      stages.clear()
      if (secs > 8.0) snap.foreach { case (id, nm, wall, nt, mx) =>
        println(f"[prof]    stage $id '$nm' wall=${wall / 1000.0}%.2f s tasks=$nt maxTask=${mx / 1000.0}%.2f s")
      }
    }
    spark.stop()
  }
}
