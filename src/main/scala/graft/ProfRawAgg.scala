package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: the floor under fit_twfe_compress at 180M — the raw cell
  * aggregation alone (scan + partial/final hash agg, no model matrix, no
  * solve, no probes) vs the full fit wall. Not part of the driver
  * contract. */
object ProfRawAgg {
  def main(args: Array[String]): Unit = {
    val liDir = sys.env.getOrElse("SPARK_GRAFT_LI_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$liDir/lineitem.parquet")
    println(s"[prof] rows=${li.count()}")
    def time(name: String, n: Int = 3)(f: => Unit): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name MIN: ${ts.min}%.2f s (all ${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    val keys = Seq("l_quantity", "l_discount", "l_returnflag", "l_linestatus")
    time("raw_cell_agg") {
      li.select((keys :+ "l_extendedprice").map(col): _*)
        .filter((keys :+ "l_extendedprice").map(col(_).isNotNull).reduce(_ && _))
        .groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("double")).as("sy"),
          sum(col("l_extendedprice").cast("double") *
            col("l_extendedprice").cast("double")).as("syy"))
        .queryExecution.toRdd.count()
    }
    time("full_fit_compress") {
      graft.reg.Dbreg.fit(
        "l_extendedprice ~ l_quantity + l_discount | l_returnflag + l_linestatus",
        li, strategy = "compress")
    }
    spark.stop()
  }
}
