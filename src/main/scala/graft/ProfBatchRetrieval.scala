package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Retrieval, TextOps}

/** Scratch profiler for the round-10 batch retrieval: N queries scored in
  * ONE corpus scan (`bm25TopKBatch`) vs N single-query `bm25TopK` scans,
  * over a ×100 documents replica (500k docs). Produces the BENCH_NOTES
  * scaling point for the batch-vs-loop win. Not part of the driver
  * contract. `SPARK_GRAFT_SF_DIR` points at a dir with
  * `documents.parquet`; `PROF_NQ` sets the query count (default 32).
  *
  * Queries are synthesized from the corpus vocabulary: the 2·NQ most
  * frequent tokens longer than 3 chars, paired off — every query has two
  * real terms with real postings, the shape a retrieval eval has.
  */
object ProfBatchRetrieval {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("PROF_ITERS", "2").toInt
    val nq = sys.env.getOrElse("PROF_NQ", "32").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

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
    println(s"[prof] dir=$sfDir docs=${docs.count()} queries=$nq")

    val vocab = docs
      .select(explode(TextOps.tokens(col("text"))).as("t"))
      .filter(length(col("t")) > 3)
      .groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t").asc)
      .limit(2 * nq)
      .collect().map(_.getString(0))
    val termSets = vocab.grouped(2).take(nq).map(_.toSeq).toSeq
    val queries = termSets.zipWithIndex
      .map { case (ts, i) => (i.toLong, ts) }
      .toDF("query_id", "terms")

    time(s"bm25_batch_${nq}q_1scan") {
      noop(Retrieval.bm25TopKBatch(docs, "doc_id", "text",
        queries, "query_id", "terms", k = 10))
    }

    time(s"bm25_loop_${nq}q_${nq}scans") {
      termSets.map(ts =>
        noop(TextOps.bm25TopK(docs, "doc_id", "text", ts, 10))).sum
    }

    // PROF_HYBRID=1 (needs embeddings.parquet in the dir): the batch
    // hybrid with its BRUTE semantic branch — N cosines per corpus row —
    // vs the same N queries through per-query hybridTopK. The point at
    // which the brute batch branch should yield to the persisted IVF
    // index (semCandidates) is where this wall stops being acceptable.
    if (sys.env.contains("PROF_HYBRID")) {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      println(s"[prof] vectors=${emb.count()}")
      val qvecs = emb.orderBy("vec_id").limit(nq)
        .select("vec_id", "embedding").collect()
        .map(r => r.getSeq[Number](1).toArray.map(_.doubleValue))
      val hq = termSets.zip(qvecs).zipWithIndex
        .map { case ((ts, qv), i) => (i.toLong, ts, qv.toSeq) }
        .toDF("query_id", "terms", "qvec")
      time(s"hybrid_batch_${nq}q") {
        noop(graft.pipeline.Retrieval.hybridTopKBatch(docs, "doc_id",
          "text", hq, "query_id", "terms", "qvec",
          emb, "vec_id", "embedding", k = 10, candidateK = 30))
      }
      time(s"hybrid_loop_${nq}q") {
        termSets.zip(qvecs).map { case (ts, qv) =>
          noop(graft.pipeline.Retrieval.hybridTopK(docs, "doc_id", "text",
            ts, emb, "vec_id", "embedding", qv, k = 10, candidateK = 30))
        }.sum
      }
    }

    spark.stop()
  }
}
