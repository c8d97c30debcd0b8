package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF index over an embedding column — the deployment shape of
  * [[Similarity.ivfTopK]]: train once, write the corpus PARTITIONED BY
  * CELL, then serve top-k queries that read only the probed cells.
  *
  * At 100 TB the win is in the LAYOUT, not the math: `assigned.parquet`
  * is hive-partitioned on the cell id, so a query's `cell IN (probes…)`
  * filter becomes a PartitionFilter — Spark prunes whole directories at
  * planning time and the scan touches `nprobe / k` of the corpus instead
  * of all of it. Build cost is one k-means (driver holds k·dim doubles,
  * never the corpus) plus one narrow assignment projection and one
  * shuffle to lay the corpus out cell-contiguous.
  *
  * Query cost: one broadcast of the (tiny) centroid table to rank probe
  * cells per query, one BOUNDED driver collect of ≤ |queries|·nprobe cell
  * ids (needed as literals — partition pruning only sees foldable
  * predicates), then a pruned scan joined to the broadcast queries.
  */
object VectorIndex {

  /** Train k-means (`iters = 0` keeps the deterministic k-lowest-id seed —
    * the [[Similarity.ivfTopK]] default), assign every vector with the
    * codegen'd NearestCentroid projection (narrow, no shuffle), and write:
    *   - `<dir>/centroids.parquet` — (cell, cvec), k rows
    *   - `<dir>/assigned.parquet`  — (id, vec), hive-partitioned by `cell`
    * Returns the trained centroids (also on disk) for callers composing
    * with ivfTopK directly. One file per cell by default — raise
    * `spark.sql.shuffle.partitions` or pre-salt for multi-file cells at
    * real corpus sizes. */
  def build(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      k: Int = 16,
      iters: Int = 2,
      dim: Int = 64
  ): Array[Array[Double]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (_, cents) = Similarity.kmeans(emb, idCol, vecCol, k, iters, dim)
    cents.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
      .toDF("cell", "cvec")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    emb
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        graft.functions.VectorExprs.nearestCentroid(col(vecCol), cents).as("cell"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/assigned.parquet")
    cents
  }

  /** Append new vectors to a built index WITHOUT retraining: assign them
    * with the PERSISTED centroids (read once, k·dim doubles) and append
    * their cell-partitioned files beside the existing ones. Sound
    * because query CORRECTNESS never depends on centroid optimality:
    * probes rank cells by the same frozen centroids that assigned every
    * vector — appended vectors are found exactly as same-cell originals
    * are, and [[topK]] over the grown index equals the in-memory
    * `ivfTopK(trainedCentroids = …)` over the grown corpus
    * (spec-pinned). What DOES decay as the corpus drifts from the
    * training distribution is recall-vs-scan-fraction (cells skew and
    * fatten), so retrain with [[build]] on the usual compaction cadence
    * — the [[graft.sources.ScaleOps.zorderAppend]] story for the vector
    * modality. Parquet append naming cannot collide; a crashed append
    * leaves only orphan files in cell directories (re-run it —
    * vector-id dedup is the caller's contract, as in [[build]]). */
  def append(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String
  ): Unit = {
    val spark = emb.sparkSession
    val cents = spark.read.parquet(s"$dir/centroids.parquet")
      .orderBy("cell").collect()
      .map(_.getSeq[Number](1).toArray.map(_.doubleValue))
    require(cents.nonEmpty, s"no centroids at $dir — build the index first")
    emb
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        graft.functions.VectorExprs.nearestCentroid(col(vecCol), cents)
          .as("cell"))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$dir/assigned.parquet")
  }

  /** Centroid-drift monitor — the "when to retrain" signal that
    * completes the [[append]] story: appended vectors are always
    * FINDABLE, but as the corpus drifts from the training distribution
    * they sit farther from every centroid and recall-per-probe decays.
    * This compares the best-cell cosine of a candidate shard against the
    * resident corpus: one row (n_corpus, n_shard, corpus_mean_cos,
    * shard_mean_cos, drift = corpus − shard). Near-zero drift → the
    * shard looks like the training distribution, append freely;
    * a persistent positive gap → schedule a [[build]] retrain (pick the
    * threshold from your recall SLO — drift is in cosine units).
    *
    * Scale shape: the resident side is one pruning-free narrow scan of
    * `assigned` joined to the BROADCAST k-row centroid table + one
    * 1-row aggregate (map-side partials); the shard side is the same
    * after the codegen'd assignment projection. Nothing collects but
    * two 1-row frames. */
  def driftCheck(
      spark: SparkSession,
      dir: String,
      shard: DataFrame,
      idCol: String,
      vecCol: String
  ): DataFrame = {
    val cdf = spark.read.parquet(s"$dir/centroids.parquet")
    val cents = cdf.orderBy("cell").collect()
      .map(_.getSeq[Number](1).toArray.map(_.doubleValue))
    require(cents.nonEmpty, s"no centroids at $dir — build the index first")
    def meanCos(assigned: DataFrame, nName: String, mName: String) =
      assigned.join(broadcast(cdf), Seq("cell"))
        .agg(count(lit(1)).as(nName),
          avg(Similarity.cosine(col("vec"), col("cvec"))).as(mName))
    val corpusSide = meanCos(
      spark.read.parquet(s"$dir/assigned.parquet").select("cell", "vec"),
      "n_corpus", "corpus_mean_cos")
    val shardSide = meanCos(
      shard.select(
        graft.functions.VectorExprs.nearestCentroid(col(vecCol), cents)
          .as("cell"),
        col(vecCol).as("vec")),
      "n_shard", "shard_mean_cos")
    corpusSide.crossJoin(shardSide)
      .select(col("n_corpus"), col("n_shard"),
        col("corpus_mean_cos"), col("shard_mean_cos"),
        (col("corpus_mean_cos") - col("shard_mean_cos")).as("drift"))
  }

  /** Top-k cosine neighbors from a built index for each query row.
    * Probe ranking, scoring, and tie order are identical to
    * [[Similarity.ivfTopK]] (cos desc, id asc; a query never matches its
    * own id), so an index roundtrip reproduces the in-memory operator
    * bit-for-bit. Returns (query_id, neighbor_id, cos, rank). */
  def topK(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      k: Int,
      nprobe: Int = 4
  ): DataFrame = {
    val cents = spark.read.parquet(s"$dir/centroids.parquet")
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("cos_c").desc, col("cell").asc)
    val probes = queries
      .select(col(qIdCol).as("query_id"), col(qVecCol).as("qvec"))
      .join(broadcast(cents))
      .select(col("query_id"), col("qvec"), col("cell"),
        Similarity.cosine(col("qvec"), col("cvec")).as("cos_c"))
      .withColumn("r", row_number().over(wProbe))
      .filter(col("r") <= nprobe)
      .select("query_id", "qvec", "cell")
    // bounded collect: <= |queries| * nprobe ints. The cells must be plan
    // LITERALS — partition pruning happens at planning time, a join can't
    // prune directories.
    val probeCells = probes.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val scan = spark.read.parquet(s"$dir/assigned.parquet")
      .filter(col("cell").isInCollection(probeCells))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scan.join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        Similarity.cosine(col("qvec"), col("vec")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }
}
