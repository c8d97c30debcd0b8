package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the physical plans of the engine's load-bearing operators so the
  * shuffle/broadcast/pushdown structure can be reviewed and recorded
  * (PLANS.md). Run: sbt "runMain graft.PlanReview" */
object PlanReview {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "false") // stable plan text
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def show(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n==================== $name ====================")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }

    // 1. pushdown: filter + projection must reach the parquet scan
    show("filter+projection pushdown") {
      li.filter(col("l_quantity") > 40)
        .select(col("l_returnflag"), col("l_extendedprice"))
        .groupBy("l_returnflag").agg(sum("l_extendedprice"))
    }
    // 2. moments aggregation: single scan, partial+final hash agg
    show("moments triangle (compress cells)") {
      graft.reg.Dbreg.compressedData("l_extendedprice ~ l_quantity | l_returnflag", li)
    }
    // 3. demean join: group means must broadcast, fact side unshuffled
    show("demean group-mean join") {
      val b = li.select(col("l_returnflag"), col("l_extendedprice").cast("double").as("y"))
      val gm = b.groupBy("l_returnflag").agg(avg("y").as("ym"))
      b.join(broadcast(gm), "l_returnflag")
        .select((col("y") - col("ym")).as("yt"))
        .agg(sum(col("yt") * col("yt")))
    }
    // 4. minhash signatures: narrow (no exchange anywhere)
    show("minhash signatures (narrow)") {
      graft.pipeline.Dedup.minhashSignatures(docs, "doc_id", "text", 2)
    }
    // 5. LSH candidate join: shuffle only on (band, bucket) keys
    show("LSH near-dup pairs") {
      graft.pipeline.Dedup.minhashPairs(docs, "doc_id", "text", 2, 0.5)
    }
    // 6. brute kNN: query side broadcast, corpus never shuffled
    show("brute-force kNN") {
      graft.pipeline.Similarity.bruteForceTopK(emb, "vec_id", "embedding", Seq(0L, 1L), 5)
    }
    spark.stop()
  }
}
