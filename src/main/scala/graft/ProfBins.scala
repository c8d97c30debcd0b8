package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.binsreg.Dbbinsreg

/** Scratch profiler for the binsreg bench entries (not part of the driver
  * contract; used to locate the x10/x100 superlinear stage). */
object ProfBins {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-gen/x10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    val base = li.select(col("l_quantity"), col("l_extendedprice"))
      .filter(col("l_quantity").isNotNull && col("l_extendedprice").isNotNull)
    val probs = (0 to 10).map(_.toDouble / 10).toArray

    // warm the scan
    base.agg(min("l_quantity"), max("l_quantity")).collect()

    time("scan+minmax agg")(base.agg(min("l_quantity"), max("l_quantity")).collect())
    time("approxQuantile relErr=1e-2")(base.stat.approxQuantile("l_quantity", probs, 1e-2))
    time("approxQuantile relErr=1e-3")(base.stat.approxQuantile("l_quantity", probs, 1e-3))
    time("approxQuantile relErr=1e-4")(base.stat.approxQuantile("l_quantity", probs, 1e-4))
    time("percentile_approx(1e4)")(
      base.agg(percentile_approx(col("l_quantity"), array(probs.toIndexedSeq.map(lit): _*), lit(10000))).collect())

    // canonical fit stages, hand-unrolled
    val probs10 = (0 to 10).map(_.toDouble / 10).toArray
    val breaks = time("  stage: histQuantiles")(
      Dbbinsreg.histQuantiles(base, "l_quantity", probs10, 1e-4).distinct.sorted)
    val b = breaks.length - 1
    val xq = col("l_quantity").cast("double")
    val binCol = (1 until b).map(k => when(xq > breaks(k), 1).otherwise(0))
      .foldLeft(lit(0))(_ + _)
    val binned = base.withColumn("__bin", binCol)
    time("  stage: geometry agg")(
      binned.groupBy("__bin")
        .agg(min(xq), max(xq), avg(xq), count(lit(1))).orderBy("__bin").collect())
    val width = 2
    val binf = concat(lit("b"), lpad(col("__bin").cast("string"), width, "0"))
    val dfb = binned.withColumn("__binf", binf)
    time("  stage: Dbreg compress fit")(
      graft.reg.Dbreg.fit("l_extendedprice ~ 0 + __binf", dfb, strategy = "compress"))

    // full fits for reference
    time("binsreg canonical (full)")(
      Dbbinsreg.fit("l_extendedprice ~ l_quantity", li, nbins = 10, degree = 0))
    time("binsreg canonical (2nd)")(
      Dbbinsreg.fit("l_extendedprice ~ l_quantity", li, nbins = 10, degree = 0))
    time("binsreg spline_fe (full)")(
      Dbbinsreg.fit("l_extendedprice ~ l_quantity | l_returnflag", li,
        nbins = 8, degree = 1, smoothness = 1))
    time("binsreg spline_fe (2nd)")(
      Dbbinsreg.fit("l_extendedprice ~ l_quantity | l_returnflag", li,
        nbins = 8, degree = 1, smoothness = 1))

    spark.stop()
  }
}
