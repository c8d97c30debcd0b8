package graft

import org.apache.spark.sql.SparkSession

import graft.reg.Dbreg

/** Round-14 profiler: the carried `bench_vs_baseline` item —
  * fit_twfe_compress at the 180M-row ×300 lineitem replica sits at
  * ~2.2× the reference's <1 s M4 number, and the r10 floor probe
  * (ProfRawAgg) showed the fit is scan-bound (raw cell agg = ~90% of
  * the wall). This sweeps the SCAN-side knobs the verdict named, same
  * JVM, min of `iters` per cell:
  *
  *   - `spark.sql.parquet.columnarReaderBatchSize` (default 4096):
  *     bigger vectorized-reader batches amortize per-batch dispatch
  *     against the 5-column projection.
  *   - `spark.sql.files.maxPartitionBytes` (default 128m): split count
  *     vs per-task overhead at 32 cores over ~3 GB of parquet.
  *   - `spark.sql.codegen.aggregate.map.twolevel.partialOnly` /
  *     vectorized fast-map: the 2-FE cell key has 6 distinct values —
  *     the partial agg should live entirely in the codegen fast map.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<replica> runMain graft.ProfR14
  */
object ProfR14 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/x300")
    val iters = sys.env.get("SPARK_GRAFT_BENCH_ITERS").map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def li = spark.read.parquet(s"$dir/lineitem.parquet")
    val fml =
      "l_extendedprice ~ l_quantity + l_discount | l_returnflag + l_linestatus"

    def timed(name: String)(f: => Unit): Unit = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profr14] $name%-58s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // warmup
    li.count(); Dbreg.fit(fml, li, strategy = "compress")

    val grid: Seq[(String, Seq[(String, String)])] =
      if (sys.env.contains("PROF_R14_FOCUS")) Seq(
        "baseline (4096 / 128m)" -> Seq(),
        "maxPartitionBytes 256m" -> Seq("spark.sql.files.maxPartitionBytes" -> "256m"),
        "maxPartitionBytes 512m" -> Seq("spark.sql.files.maxPartitionBytes" -> "512m"),
        "batch 16384" -> Seq("spark.sql.parquet.columnarReaderBatchSize" -> "16384"),
        "batch 16384 + 256m" -> Seq(
          "spark.sql.parquet.columnarReaderBatchSize" -> "16384",
          "spark.sql.files.maxPartitionBytes" -> "256m")
      ) else Seq(
      "baseline (4096 / 128m)" -> Seq(),
      "batch 8192" -> Seq("spark.sql.parquet.columnarReaderBatchSize" -> "8192"),
      "batch 16384" -> Seq("spark.sql.parquet.columnarReaderBatchSize" -> "16384"),
      "maxPartitionBytes 64m" -> Seq("spark.sql.files.maxPartitionBytes" -> "64m"),
      "maxPartitionBytes 256m" -> Seq("spark.sql.files.maxPartitionBytes" -> "256m"),
      "batch 16384 + 64m" -> Seq(
        "spark.sql.parquet.columnarReaderBatchSize" -> "16384",
        "spark.sql.files.maxPartitionBytes" -> "64m"),
      "partialOnly twolevel off" -> Seq(
        "spark.sql.codegen.aggregate.map.twolevel.partialOnly" -> "false"),
      "offheap columnar off" -> Seq(
        "spark.sql.columnVector.offheap.enabled" -> "false")
    )
    val defaults = grid.flatMap(_._2.map(_._1)).distinct
      .map(k => k -> spark.conf.get(k)).toMap
    for ((name, confs) <- grid) {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      timed(s"fit_twfe_compress / $name") {
        Dbreg.fit(fml, li, strategy = "compress"); ()
      }
      confs.foreach { case (k, _) => spark.conf.set(k, defaults(k)) }
    }
    spark.stop()
  }
}

/** Round-14 curation ops at the ×100 documents replica (500k docs):
  * decontamination ingest (eval-suite state broadcast-probed by the full
  * replica) and the leakage-safe split (LSH pairs → CC → cluster-keyed
  * hash split over the corpus). Run with SPARK_GRAFT_SF_DIR at the
  * replica dir; the eval suite is the driver-shipped sf0.1 documents
  * (5k docs — a realistic benchmark-suite size). */
object ProfR14Curation {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/x100d")
    val iters = sys.env.get("SPARK_GRAFT_BENCH_ITERS").map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    import graft.pipeline.Dedup
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
    val suite = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
    val n = corpus.count()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(name: String)(f: => Unit): Unit = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profr14c] $name%-44s n=$n min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    // frozen suite state (setup, untimed — persists like lake state)
    val state = Dedup.contaminationState(suite, "doc_id", "text", n = 2)
    state.shingles.cache().count()
    timed("contamination_state_build (5k suite)") {
      noop(Dedup.contaminationState(suite, "doc_id", "text", n = 2).shingles)
    }
    timed("contamination_ingest (500k shard vs suite)") {
      noop(Dedup.contaminationAgainst(state, corpus, "doc_id", "text", n = 2))
    }
    timed("leakage_safe_split (LSH pairs + CC + split)") {
      val pairs = Dedup.minhashPairs(corpus, "doc_id", "text",
        n = 2, threshold = 0.5)
      noop(graft.sources.ScaleOps.leakageSafeSplit(corpus, "doc_id", pairs,
        Seq("train" -> 0.98, "eval" -> 0.02), salt = "p14"))
    }
    spark.stop()
  }
}

/** SemDeDup frozen-codebook append vs rebuild at replica scale — the
  * measured growth-dividend point for `semDedupStateAppend` (verdict
  * item 3): run with SPARK_GRAFT_SF_DIR at a ScaleUp embeddings replica
  * (×100 = 200k vectors, ×1000 = 2M). Three arms, min of iters:
  * full retrain (`semDedupState`, the Lloyd rebuild), rebuild under the
  * FROZEN codebook (`semDedupStateWithCodebook` over corpus ∪ shard —
  * what append is spec-pinned to equal), and the append itself (shard
  * assignment + k-row counts + cell-filtered union). */
object ProfR14Sd {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/x100e")
    val iters = sys.env.get("SPARK_GRAFT_BENCH_ITERS").map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    import graft.pipeline.Similarity
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val k = math.max(8, (n / 1000L).toInt) // the SemDeDup k ≈ n/1000 regime
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val union = emb // corpus ∪ shard by construction
    val shard = emb.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + 100000000L)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(name: String)(f: => Unit): Unit = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profr14sd] $name%-44s n=$n k=$k min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    // the frozen state the append folds into (setup, untimed)
    val state = Similarity.semDedupState(corpus, "vec_id", "embedding",
      k = k, iters = 2, dim = 64)
    val cached = Similarity.SemDedupState(
      state.centroids, state.members.cache())
    cached.members.count(); cached.centroidArray

    timed("sd_full_retrain (semDedupState over union)") {
      val st = Similarity.semDedupState(union, "vec_id", "embedding",
        k = k, iters = 2, dim = 64)
      noop(st.members)
    }
    timed("sd_rebuild_same_codebook (union)") {
      val st = Similarity.semDedupStateWithCodebook(union, "vec_id",
        "embedding", cached.centroidArray)
      noop(st.members)
    }
    timed("sd_state_append (10% shard)") {
      val st = Similarity.semDedupStateAppend(cached, shard, "vec_id",
        "embedding")
      noop(st.members)
    }
    spark.stop()
  }
}
