package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Scratch profiler for the q208 composition (kNN graph → connected
  * components): isolates the pair-materialization cost from the CC loop.
  * Not part of the driver contract. */
object ProfQ208 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val knn = Similarity.knnJoin(emb, "vec_id", "embedding", 3,
      nCentroids = 16, nprobe = 2)
      .filter(col("cos") >= 0.3)
      .select(least(col("query_id"), col("neighbor_id")).as("id1"),
        greatest(col("query_id"), col("neighbor_id")).as("id2"))
      .distinct()
    val np = t("pairs count")(knn.count())
    println(s"[prof] pairs=$np")

    val staged = t("pairs staged") { import graft.Staging.StagedFrame; knn.staged }
    for (ce <- Seq(1, 2, 3, 5)) {
      t(s"cc staged checkpointEvery=$ce") {
        graft.operators.Graphs.connectedComponents(staged, "id1", "id2",
          checkpointEvery = ce).count()
      }
    }
    t("cc over RAW pairs plan ce=2") {
      graft.operators.Graphs.connectedComponents(knn, "id1", "id2",
        checkpointEvery = 2).count()
    }
    spark.stop()
  }
}
