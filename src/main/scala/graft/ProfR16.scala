package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Round-16 profiler: the COMPLETE DupClusterState daily-refresh recipe
  * (shard-internal pairs + cross-corpus all-matches edges) priced
  * against both the r15 shard-internal-only demo and a full re-pair
  * rebuild, plus the non-broadcast (sort-merge) against-state split at
  * a corpus-scale synthetic state. Arms on the documents replica:
  *
  *   1. frozen-state builds (once per corpus): `dupClusterState` over
  *      resident minhashPairs + `minhashDedupState` — both persisted
  *   2. `dupClusterStateIngest` (10 % shard; internal + cross pairs +
  *      merge — the complete recipe; prices ONLY the shard)
  *   3. internal-only `dupClusterStateMerge` (the r15 demo shape — the
  *      delta vs arm 2 is the cross-pair cost that closes the leakage
  *      hole)
  *   4. full re-pair rebuild (`minhashPairs(resident ∪ shard)` + CC —
  *      what the recipe avoids)
  *   5. `leakageSafeSplitAgainst` with a corpus-sized synthetic state
  *      (one (id, cluster) row per doc — far above any broadcast
  *      threshold): default conf vs forced sort-merge vs a
  *      bucketed-by-id state table (state side pre-partitioned)
  *
  * Usage: SPARK_GRAFT_SF_DIR=<docs replica> runMain graft.ProfR16
  */
object ProfR16 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/x100d")
    val iters = sys.env.get("SPARK_GRAFT_BENCH_ITERS").map(_.toInt).getOrElse(2)
    val tmp = java.nio.file.Files.createTempDirectory("profr16").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking", "false")
      .config("spark.sql.warehouse.dir", s"$tmp/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.DataFrame
    def docs = graft.sources.ScaleOps.normalizeParallelism(
      spark.read.parquet(s"$dir/documents.parquet"), 32)
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(name: String)(f: => Unit): Unit = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profr16] $name%-56s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    docs.count() // warmup footers
    val splitOnly = sys.env.contains("PROF_R16_SPLIT_ONLY")

    if (!splitOnly) {
    // resident 90 % / shard 10 % relabeled — the daily-ingest shape
    def resident = docs.filter(col("doc_id") % 10 =!= 0)
    def shard = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + (1L << 41))

    // -- arm 1: the once-per-corpus frozen states --
    timed("state builds: dupClusterState + minhashDedupState (persist)") {
      Dedup.dupClusterState(Dedup.minhashPairs(resident, "doc_id", "text",
          n = 2, threshold = 0.5))
        .clusters.write.mode("overwrite").parquet(s"$tmp/dc")
      val mh = Dedup.minhashDedupState(resident, "doc_id", "text", n = 2)
      mh.reps.write.mode("overwrite").parquet(s"$tmp/mhr")
      mh.buckets.write.mode("overwrite").parquet(s"$tmp/mhb")
    }
    val clusterSt = Dedup.DupClusterState(spark.read.parquet(s"$tmp/dc"))
    val mhSt = Dedup.MinhashDedupState(
      spark.read.parquet(s"$tmp/mhr"), spark.read.parquet(s"$tmp/mhb"))
    println(s"[profr16] cluster-state rows = ${clusterSt.clusters.count()}")

    // -- arm 2: the complete refresh (internal + cross + merge) --
    timed("dupClusterStateIngest (internal + CROSS pairs, complete)") {
      sink(Dedup.dupClusterStateIngest(clusterSt, mhSt, shard,
        "doc_id", "text", n = 2, threshold = 0.5).clusters)
    }

    // -- arm 3: the r15 demo shape (internal only — leakage hole) --
    timed("dupClusterStateMerge (shard-INTERNAL pairs only, r15 demo)") {
      sink(Dedup.dupClusterStateMerge(clusterSt,
        Dedup.minhashPairs(shard, "doc_id", "text", n = 2, threshold = 0.5)
          .select("id1", "id2")).clusters)
    }

    // -- arm 4: what the recipe avoids (full re-pair over the union) --
    timed("full re-pair rebuild (minhashPairs(resident ∪ shard) + CC)") {
      sink(Dedup.dupClusterState(
        Dedup.minhashPairs(resident.unionByName(shard), "doc_id", "text",
          n = 2, threshold = 0.5)).clusters)
    }
    }

    // -- arm 5: corpus-sized state split: broadcast impossible --
    // synthetic worst case: EVERY doc belongs to a 2-doc cluster, so the
    // state is |corpus|-sized (the high-dup web-corpus shape the
    // leakageSafeSplitAgainst scaladoc's "bucket by id" clause is for)
    val weights = Seq("train" -> 0.98, "eval" -> 0.02)
    docs.select(col("doc_id").as("id"),
        (col("doc_id") - (col("doc_id") % 2)).as("cluster"))
      .write.mode("overwrite").parquet(s"$tmp/bigdc")
    val bigSt = Dedup.DupClusterState(spark.read.parquet(s"$tmp/bigdc"))
    println(s"[profr16] synthetic state rows = ${bigSt.clusters.count()}")
    timed("split vs corpus-sized state (default conf)") {
      sink(graft.sources.ScaleOps.leakageSafeSplitAgainst(bigSt, docs,
        "doc_id", weights, salt = "p16"))
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    timed("split vs corpus-sized state (forced sort-merge)") {
      sink(graft.sources.ScaleOps.leakageSafeSplitAgainst(bigSt, docs,
        "doc_id", weights, salt = "p16"))
    }
    // bucketed-by-id persisted state: the state side of the SMJ is read
    // pre-partitioned — only the corpus side shuffles
    graft.sources.ScaleOps.writeBucketed(
      bigSt.clusters, "profr16_bigdc", Seq("id"), 32)
    val bucketedSt = Dedup.DupClusterState(spark.table("profr16_bigdc"))
    timed("split vs corpus-sized state (bucketed state, sort-merge)") {
      sink(graft.sources.ScaleOps.leakageSafeSplitAgainst(bucketedSt, docs,
        "doc_id", weights, salt = "p16"))
    }
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.stop()
  }
}
