package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Pca, TextOps}
import graft.reg.{ElasticNet, Ridge, Rlm}

/** Scratch profiler for the round-5 one-scan statistics family (ridge path,
  * elastic-net path, Huber IRLS, PCA fit/transform, Misra-Gries heavy
  * hitters) — produces the BENCH_NOTES scaling points. Not part of the
  * driver contract. SPARK_GRAFT_SF_DIR points at a testdata dir or a
  * ScaleUp replica dir. */
object ProfStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").select(
      col("l_extendedprice").as("y"),
      col("l_quantity").cast("double").as("x1"),
      col("l_discount").as("x2"),
      col("l_tax").as("x3"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"[prof] rows=${li.count()} docs=${docs.count()} emb=${emb.count()}")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    // warm the scans
    Ridge.fit("y ~ x1 + x2 + x3", li, 1.0)
    Pca.fit(emb, "embedding", 64, 4)

    (1 to 2).foreach { _ =>
      time("ridge_path_20 (one scan)")(
        Ridge.path("y ~ x1 + x2 + x3", li, (1 to 20).map(_ * 1e5)))
      time("enet_path_20 (one scan)")(
        ElasticNet.path("y ~ x1 + x2 + x3", li,
          (20 to 1 by -1).map(_ * 5e5), maxIter = 5000, tol = 1e-10))
      time("huber_3it (5 scans)")(
        Rlm.fit("y ~ x1 + x2", li, maxIter = 3, tol = 0.0))
      time("pca_fit_64d (fused scan)")(
        Pca.fit(emb, "embedding", 64, 8))
      val model = Pca.fit(emb, "embedding", 64, 8)
      time("pca_transform_count")(
        model.transform(emb, "embedding", "pc")
          .agg(sum(element_at(col("pc"), 1))).collect())
      time("heavy_hitters_cap4096")(
        TextOps.heavyHitters(docs, "text", capacity = 4096, k = 100).count())
      time("exact_topk (explode+groupBy)")(
        docs.select(explode(TextOps.tokens(col("text"))).as("t"))
          .groupBy("t").count().orderBy(col("count").desc).limit(100).count())
    }
    spark.stop()
  }
}
