package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Scratch profiler for the round-8 graph compositions: the q208 kNN
  * graph → connected components (isolating pair-materialization cost from
  * the CC loop — the plan-growth-cliff measurement), and
  * `PROF_TRI=1`: triangle counts over the ×100-doc MinHash pair graph
  * (`SPARK_GRAFT_SF_DIR` pointing at a documents replica).
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

    if (sys.env.contains("PROF_TRI")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val n = docs.count()
      println(s"[prof] PROF_TRI docs=$n")
      val pairs = t("minhash pairs staged") {
        import graft.Staging.StagedFrame
        val p = graft.pipeline.Dedup
          .minhashPairs(docs, "doc_id", "text", n = 2, threshold = 0.5).staged
        println(s"[prof] pairs=${p.count()}")
        p
      }
      for (i <- 1 to 2) t(s"triangleCounts iter$i") {
        val r = graft.operators.Graphs.triangleCounts(pairs, "id1", "id2")
          .agg(sum(col("triangles")), count(lit(1))).collect()(0)
        println(s"[prof] sum_tri=${r.getLong(0)} nodes=${r.getLong(1)}")
      }
      for (i <- 1 to 2) t(s"labelPropagation(3) iter$i") {
        val r = graft.operators.Graphs
          .labelPropagation(pairs, "id1", "id2", iters = 3)
          .agg(countDistinct(col("label")), count(lit(1))).collect()(0)
        println(s"[prof] communities=${r.getLong(0)} nodes=${r.getLong(1)}")
      }
      spark.stop(); return
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
