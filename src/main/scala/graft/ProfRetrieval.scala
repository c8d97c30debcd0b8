package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Retrieval, Similarity}

/** Scratch profiler for the round-8 retrieval family: hybrid RRF search
  * over a ×100 documents replica, centroid silhouette + ranking metrics
  * over a ×100 embeddings replica. Produces the BENCH_NOTES scaling
  * points. Not part of the driver contract. `SPARK_GRAFT_SF_DIR` points
  * at a dir with `documents.parquet` + `embeddings.parquet` (a ScaleUp
  * replica for the big points). */
object ProfRetrieval {
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

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"[prof] dir=$sfDir docs=${docs.count()} vectors=${emb.count()}")

    val qv = emb.orderBy("vec_id").limit(1).select(col("embedding"))
      .collect()(0).getSeq[Number](0).toArray.map(_.doubleValue)

    // 1. hybrid RRF: both branches TakeOrdered over the corpus
    time("hybrid_rrf_top20") {
      noop(Retrieval.hybridTopK(docs, "doc_id", "text",
        Seq("hash", "join", "stream", "vector"),
        emb, "vec_id", "embedding", qv, k = 20, candidateK = 60))
    }

    // 2. silhouette with 16 trained kmeans centroids (train timed apart)
    val t0 = System.nanoTime()
    val (_, cents) = Similarity.kmeans(emb, "vec_id", "embedding",
      k = 16, iters = 2, dim = qv.length)
    println(f"[prof] kmeans_16x2: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    time("silhouette_16cells") {
      noop(Similarity.silhouette(emb, "vec_id", "embedding", cents))
    }

    // 3. ranking metrics over the IVF-blocked kNN graph (k=10, label rel)
    time("ranking_metrics_knn10") {
      val ranked = Similarity.knnJoin(emb, "vec_id", "embedding", 10,
        nCentroids = 256, nprobe = 2)
      val lab = emb.select(col("vec_id"), col("label"))
      val withRel = ranked
        .join(lab.select(col("vec_id").as("query_id"),
          col("label").as("__ql")), "query_id")
        .join(lab.select(col("vec_id").as("neighbor_id"),
          col("label").as("__nl")), "neighbor_id")
        .select(col("query_id"), col("rank"),
          (col("__ql") === col("__nl")).cast("int").as("rel"))
      noop(graft.reg.Eval.rankingMetrics(withRel, "query_id", "rank", "rel", 5))
    }

    // 4. MMR over a 64-candidate shortlist from the corpus
    time("mmr_rerank_64to10") {
      val qvc = array(qv.toIndexedSeq.map(lit(_)): _*)
      val cand = emb
        .filter(graft.functions.VectorExprs
          .dotProduct(col("embedding"), col("embedding")) > 0)
        .select(col("vec_id"),
          Similarity.cosine(col("embedding"), qvc).as("rel"), col("embedding"))
        .orderBy(col("rel").desc, col("vec_id")).limit(64)
      noop(Retrieval.mmrRerank(cand, "vec_id", "rel", "embedding",
        k = 10, lambda = 0.5))
    }

    spark.stop()
  }
}
