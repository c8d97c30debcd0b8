package graft

import org.apache.spark.sql.SparkSession

/** Smoke-run of the driver contract's entry() (rows > 0 check). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[entry-smoke] rows=$n")
    assert(n > 0)
    spark.stop()
  }
}
