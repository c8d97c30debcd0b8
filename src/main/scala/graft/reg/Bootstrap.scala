package graft.reg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson bootstrap for the mean — THE distributed bootstrap: classical
  * resampling needs n draws with replacement per replicate (a shuffle per
  * replicate); the Poisson approximation gives each row an independent
  * Poisson(1) multiplicity per replicate, so ALL `reps` replicates ride ONE
  * corpus scan as two array-sum aggregates (Chamandy, Muralidharan,
  * Najmi & Naidu 2012, "Estimating uncertainty for massive data streams";
  * Kleiner et al.'s BLB is the heavier alternative).
  *
  * Weights are DETERMINISTIC: replicate b's weight for a row is the
  * Poisson(1) inverse CDF evaluated at the row's md5 uniform
  * u(salt, key, b) — reproducible across engines, partitions and reruns
  * (the [[graft.sources.ScaleOps.hashSplit]] discipline), which is what
  * makes a bit-replayable SQL oracle possible. The CDF is truncated at
  * w = 9 (P ≈ 1.1e-6, identically on both sides).
  *
  * Scale shape: one scan; per row a reps-length weight array (md5 per
  * (row, b)) and its value-scaled twin; two [[graft.functions.VectorSumAgg]]
  * ObjectHashAggregates carry ONE reps-vector per partition to the driver;
  * the percentile pick is O(reps log reps) driver work. Nothing row-sized
  * shuffles or collects.
  */
object Bootstrap {

  /** Cumulative Poisson(1) probabilities P(X <= k) for k = 0..8; a weight
    * is the count of thresholds <= u. Public so the SQL oracle renders the
    * SAME doubles (Double.toString round-trips in DuckDB). */
  val PoisCdf: IndexedSeq[Double] = {
    val e1 = math.exp(-1.0)
    var term = 1.0
    var cum = 0.0
    (0 to 8).map { k =>
      if (k > 0) term /= k
      cum += term
      cum * e1
    }
  }

  /** Percentile-bootstrap CI of mean(`value`): one row
    * (est, lo, hi, n, reps_used). `keyCol` seeds the per-row uniforms;
    * `reps_used` drops replicates whose Poisson weights summed to zero
    * (measure-zero beyond toy inputs). */
  def meanCI(
      df: DataFrame,
      value: Column,
      keyCol: String,
      reps: Int = 100,
      level: Double = 0.95,
      salt: String = ""
  ): DataFrame = {
    require(reps >= 10, s"need at least 10 replicates, got $reps")
    require(level > 0.0 && level < 1.0, s"level must be in (0,1), got $level")
    val base = df
      .filter(value.isNotNull)
      .select(col(keyCol).cast("string").as("__k"), value.cast("double").as("__x"))

    def weight(u: Column): Column =
      PoisCdf.map(c => when(u >= lit(c), 1.0).otherwise(0.0)).reduce(_ + _)
    val ws = transform(sequence(lit(1), lit(reps)), b =>
      weight(graft.pipeline.TextOps.hash32(
        concat(lit(salt), col("__k"), lit("_"), b.cast("string")))
        .cast("double") / lit(4294967296.0)))

    val row = base
      .select(col("__x"), ws.as("__w"))
      .select(col("__x"), col("__w"),
        transform(col("__w"), w => w * col("__x")).as("__wx"))
      .agg(
        graft.functions.VectorSumAgg(col("__w"), reps).as("sw"),
        graft.functions.VectorSumAgg(col("__wx"), reps).as("swx"),
        count(lit(1)).cast("double").as("n"),
        sum(col("__x")).as("sx"))
      .collect()(0)
    val n = row.getAs[Double]("n")
    require(n > 0.0, "no rows after missing-value filtering (empty input?)")
    val sw = row.getAs[org.apache.spark.sql.Row]("sw")
      .getAs[scala.collection.Seq[Double]]("sums")
    val swx = row.getAs[org.apache.spark.sql.Row]("swx")
      .getAs[scala.collection.Seq[Double]]("sums")
    val means = sw.indices.collect { case b if sw(b) > 0.0 => swx(b) / sw(b) }
      .sorted.toIndexedSeq
    val m = means.length
    require(m > 0, "every bootstrap replicate was empty (input too small)")
    val alpha = 1.0 - level
    def kth(p: Double): Double =
      means(math.max(1, math.ceil(p * m).toInt) - 1)
    val est = row.getAs[Double]("sx") / n
    val spark = df.sparkSession
    import spark.implicits._
    Seq((est, kth(alpha / 2.0), kth(1.0 - alpha / 2.0), n.toLong, m.toLong))
      .toDF("est", "lo", "hi", "n", "reps_used")
  }
}
