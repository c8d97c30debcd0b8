package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, TextOps}

/** Scratch profiler for the minhash-LSH dedup pipeline (not part of the
  * driver contract; used to locate the bench hotspot). */
object ProfMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    println("input partitions = " + docs.rdd.getNumPartitions)
    // stage 1: shingle explosion + distinct
    val sh = Dedup.shingleSets(docs, "doc_id", "text", 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingleSets count")(println("  rows=" + sh.count()))
    val shR = Dedup.shingleSets(docs.repartition(32), "doc_id", "text", 2)
    time("shingleSets repartitioned")(println("  rows=" + shR.count()))
    val shR2 = Dedup.shingleSets(docs.repartition(32), "doc_id", "text", 2)
    time("shingleSets repartitioned again")(println("  rows=" + shR2.count()))
    // stage 2: signatures (md5 per shingle row + 16 mins)
    val sigs = Dedup.minhashSignaturesFrom(sh)
    time("signatures")(sigs.write.format("noop").mode("overwrite").save())
    // stage 3: buckets + candidate join
    val bk = Dedup.lshBuckets(sigs)
    val cand = bk.as("a").join(bk.as("b"), Seq("band", "bucket"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
    time("candidates")(println("  cand=" + cand.count()))
    // stage 4: verification joins
    val full = Dedup.minhashPairs(docs, "doc_id", "text", 2, 0.5)
    time("full minhashPairs (fresh)")(full.write.format("noop").mode("overwrite").save())
    time("full minhashPairs (again)")(
      Dedup.minhashPairs(docs, "doc_id", "text", 2, 0.5)
        .write.format("noop").mode("overwrite").save())
    // how expensive is hash32 alone over the shingle set?
    time("md5 hash32 over shingles")(
      sh.select(sum(TextOps.hash32(col("shingle")))).collect())
    time("plain xxhash64 over shingles")(
      sh.select(sum(xxhash64(col("shingle")))).collect())
    spark.stop()
  }
}
