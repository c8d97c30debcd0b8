package graft

import org.apache.spark.sql.SparkSession
import graft.reg.Dbreg

/** Scratch end-to-end drive for manual verification (not part of the API). */
object DemoVerify {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    println("=== 1. simple OLS, iid (oracle: duckdb regr_*) ===")
    println(Dbreg.fit("l_extendedprice ~ l_quantity", li, strategy = "moments"))

    println("\n=== 2. multi-x + FE, auto strategy, hc1 ===")
    println(Dbreg.fit("l_extendedprice ~ l_quantity + l_discount | l_returnflag + l_linestatus", li, vcov = "hc1", verbose = true))

    println("\n=== 3. clustered SEs, compress ===")
    println(Dbreg.fit("l_extendedprice ~ l_quantity | l_returnflag", li, vcov = "~l_linestatus", strategy = "compress"))

    println("\n=== 4. factor + interaction, demean ===")
    println(Dbreg.fit("l_extendedprice ~ l_quantity*l_returnflag | l_linestatus", li, strategy = "demean"))

    println("\n=== probe: collinear regressor (tax = const*disc fails, use dup col) ===")
    val withDup = li.withColumn("qty2", org.apache.spark.sql.functions.col("l_quantity") * 2)
    println(Dbreg.fit("l_extendedprice ~ l_quantity + qty2", withDup, strategy = "moments"))

    println("\n=== probe: missing column error ===")
    try { Dbreg.fit("l_extendedprice ~ nope", li) }
    catch { case e: Exception => println(s"OK -> ${e.getMessage}") }

    println("\n=== probe: bad vcov spec ===")
    try { Dbreg.fit("l_extendedprice ~ l_quantity", li, vcov = "bootstrap") }
    catch { case e: Exception => println(s"OK -> ${e.getMessage}") }

    println("\n=== probe: multi-way cluster refusal (reference parity) ===")
    try { Dbreg.fit("l_extendedprice ~ l_quantity", li, vcov = "~a + b") }
    catch { case e: Exception => println(s"OK -> ${e.getMessage}") }
    spark.stop()
  }
}
