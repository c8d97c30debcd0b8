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
