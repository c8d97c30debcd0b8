package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Scratch profiler for the round-8 kNN self-join: IVF-blocked similarity
  * graph vs the O(n²) brute baseline, plus recall@k of the blocked path.
  * Produces the BENCH_NOTES scaling points. Not part of the driver
  * contract. `SPARK_GRAFT_SF_DIR` points at a dir with
  * `embeddings.parquet` (a ScaleUp replica for the big points);
  * `PROF_BRUTE=1` additionally times brute + measures recall (quadratic —
  * keep to ≤ ×10 replicas). `PROF_CELLS`/`PROF_NPROBE`/`PROF_K` override
  * the defaults (256 / 2 / 10). */
object ProfKnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("PROF_ITERS", "2").toInt
    val cells = sys.env.getOrElse("PROF_CELLS", "256").toInt
    val nprobe = sys.env.getOrElse("PROF_NPROBE", "2").toInt
    val k = sys.env.getOrElse("PROF_K", "10").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    println(s"[prof] dir=$sfDir vectors=$n cells=$cells nprobe=$nprobe k=$k")

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

    // trained coarse quantizer: the real pipeline's centroids (timed
    // separately — amortized across every graph build on the corpus)
    val t0 = System.nanoTime()
    val (_, cents) = Similarity.kmeans(emb, "vec_id", "embedding", cells,
      iters = 2, dim = 64)
    println(f"[prof] kmeans($cells, 2 iters): ${(System.nanoTime() - t0) / 1e9}%.2f s")

    time(s"knn_join_blocked")(noop(
      Similarity.knnJoin(emb, "vec_id", "embedding", k,
        nprobe = nprobe, trainedCentroids = Some(cents))))

    // PROF_RECALL_SWEEP="1,2,8,32": brute ground truth ONCE, then the
    // recall/cost frontier across nprobe at the configured cell count
    sys.env.get("PROF_RECALL_SWEEP").foreach { sweep =>
      import graft.Staging.StagedFrame
      val truth = Similarity.knnJoinBrute(emb, "vec_id", "embedding", k)
        .select(col("query_id"), col("neighbor_id")).staged
      val tot = truth.count()
      sweep.split(",").map(_.trim.toInt).foreach { np =>
        val t0 = System.nanoTime()
        val a = Similarity.knnJoin(emb, "vec_id", "embedding", k,
          nprobe = np, trainedCentroids = Some(cents))
          .select(col("query_id"), col("neighbor_id"))
        val hit = truth.join(a, Seq("query_id", "neighbor_id"), "left_semi").count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[prof] nprobe=$np: recall@$k=${hit.toDouble / tot}%.4f " +
          f"scan=${np.toDouble / cells}%.4f wall=$dt%.1f s")
      }
      spark.stop(); return
    }

    // PROF_PQ=1: IVF+PQ-ADC+rerank vs the full-vector blocked join at the
    // same cells/nprobe — the candidate-payload comparison (codes vs 4d)
    if (sys.env.contains("PROF_PQ")) {
      val m = sys.env.getOrElse("PROF_PQ_M", "8").toInt
      val kc = sys.env.getOrElse("PROF_PQ_K", "16").toInt
      val short = sys.env.getOrElse("PROF_PQ_SHORT", (4 * k).toString).toInt
      val t1 = System.nanoTime()
      val books = Similarity.pqTrain(emb, "vec_id", "embedding", m, kc,
        iters = 1, dim = 64)
      println(f"[prof] pqTrain(m=$m,k=$kc): ${(System.nanoTime() - t1) / 1e9}%.2f s")
      time("pq_rerank")(noop(
        Similarity.pqRerankTopK(emb, "vec_id", "embedding", k, books,
          nprobe = nprobe, shortlist = short,
          trainedCentroids = Some(cents))))
      import graft.Staging.StagedFrame
      val exact = Similarity.knnJoin(emb, "vec_id", "embedding", k,
        nprobe = nprobe, trainedCentroids = Some(cents))
        .select(col("query_id"), col("neighbor_id")).staged
      val tot = exact.count()
      val a = Similarity.pqRerankTopK(emb, "vec_id", "embedding", k, books,
        nprobe = nprobe, shortlist = short, trainedCentroids = Some(cents))
        .select(col("query_id"), col("neighbor_id"))
      val hit = exact.join(a, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"[prof] pq_rerank agreement@$k vs exact-cos same-probe: " +
        f"${hit.toDouble / tot}%.4f ($hit/$tot)")
      spark.stop(); return
    }

    if (sys.env.contains("PROF_BRUTE")) {
      time("knn_join_brute")(noop(
        Similarity.knnJoinBrute(emb, "vec_id", "embedding", k)))
      // recall@k of blocked vs brute (positional rank ignored — set overlap)
      val b = Similarity.knnJoinBrute(emb, "vec_id", "embedding", k)
        .select(col("query_id"), col("neighbor_id"))
      val a = Similarity.knnJoin(emb, "vec_id", "embedding", k,
        nprobe = nprobe, trainedCentroids = Some(cents))
        .select(col("query_id"), col("neighbor_id"))
      val hit = b.join(a, Seq("query_id", "neighbor_id"), "left_semi").count()
      val tot = b.count()
      println(f"[prof] recall@$k (blocked vs brute): ${hit.toDouble / tot}%.4f ($hit/$tot)")
    }
    spark.stop()
  }
}
