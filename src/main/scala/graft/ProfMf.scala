package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the rank-1 MF cliff found in round 10: times each
  * stage of [[graft.operators.Recommend.rank1Factors]] (staging the
  * ratings relation, the v init, each half-step, the final normalize) and
  * an id-native variant that skips the string casts, over the ×300
  * lineitem replica. Not part of the driver contract.
  */
object ProfMf {
  def main(args: Array[String]): Unit = {
    val liDir = sys.env.getOrElse("SPARK_GRAFT_LI_DIR", "/root/testdata/sf0.1")
    val only = sys.env.get("PROF_MF_ONLY").map(_.split(",").toSet)
    def enabled(s: String): Boolean = only.forall(_.contains(s))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Long =
      df.queryExecution.toRdd
        .mapPartitions(it => Iterator.single(it.size.toLong)).sum().toLong
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val got = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      got
    }

    val li = spark.read.parquet(s"$liDir/lineitem.parquet")
    println(s"[prof] lineitem=$liDir rows=${li.count()}")

    if (enabled("staged")) {
      // stage the STRING-cast relation (the current rank1Factors shape)
      val rStr = time("stage_string_relation") {
        Staging.stage(li
          .select(col("l_suppkey").cast("string").as("__u"),
            col("l_partkey").cast("string").as("__i"),
            col("l_quantity").cast("double").as("__r"))
          .filter(col("__u").isNotNull && col("__i").isNotNull &&
            col("__r").isNotNull))
      }
      var v = time("v_init_distinct") {
        val d = rStr.select(col("__i")).distinct().withColumn("__f", lit(1.0))
        d.count(); d
      }
      def solve(fixed: DataFrame, joinKey: String, solveKey: String) =
        Staging.stageForIteration(
          rStr.join(fixed, joinKey)
            .groupBy(col(solveKey))
            .agg(sum(col("__r") * col("__f")).as("__num"),
              sum(col("__f") * col("__f")).as("__den"))
            .select(col(solveKey),
              when(col("__den") > 0.0, col("__num") / col("__den"))
                .otherwise(lit(0.0)).as("__f")))
      var u: DataFrame = null
      for (it <- 1 to 2) {
        u = time(s"halfstep_u_$it") { val s = solve(v, "__i", "__u"); s.count(); s }
        v = time(s"halfstep_v_$it") { val s = solve(u, "__u", "__i"); s.count(); s }
      }
      time("normalize_union") {
        def normalized(side: String, t: DataFrame, id: String): DataFrame = {
          val nrm = t.agg(sqrt(sum(col("__f") * col("__f"))).as("__nrm"))
          t.crossJoin(broadcast(nrm))
            .select(lit(side).as("side"), col(id).as("id"),
              when(col("__nrm") > 0.0, col("__f") / col("__nrm")).as("factor"))
        }
        noop(normalized("user", u, "__u").unionAll(normalized("item", v, "__i")))
      }
    }

    if (enabled("native")) {
      // id-native variant: no string casts anywhere in the loop
      val rNat = time("stage_native_relation") {
        Staging.stage(li
          .select(col("l_suppkey").as("__u"), col("l_partkey").as("__i"),
            col("l_quantity").cast("double").as("__r"))
          .filter(col("__u").isNotNull && col("__i").isNotNull &&
            col("__r").isNotNull))
      }
      var v = time("nat_v_init_distinct") {
        val d = rNat.select(col("__i")).distinct().withColumn("__f", lit(1.0))
        d.count(); d
      }
      def solve(fixed: DataFrame, joinKey: String, solveKey: String) =
        Staging.stageForIteration(
          rNat.join(fixed, joinKey)
            .groupBy(col(solveKey))
            .agg(sum(col("__r") * col("__f")).as("__num"),
              sum(col("__f") * col("__f")).as("__den"))
            .select(col(solveKey),
              when(col("__den") > 0.0, col("__num") / col("__den"))
                .otherwise(lit(0.0)).as("__f")))
      var u: DataFrame = null
      for (it <- 1 to 2) {
        u = time(s"nat_halfstep_u_$it") { val s = solve(v, "__i", "__u"); s.count(); s }
        v = time(s"nat_halfstep_v_$it") { val s = solve(u, "__u", "__i"); s.count(); s }
      }
      println("[prof] native done")
    }

    if (enabled("unstaged")) {
      // no upfront staging at all: the relation is a pure projection of the
      // parquet scan — re-derive per half-step (the hdfe lesson: cheap
      // codegen'd projections beat corpus-sized block I/O)
      val rUn = li
        .select(col("l_suppkey").as("__u"), col("l_partkey").as("__i"),
          col("l_quantity").cast("double").as("__r"))
        .filter(col("__u").isNotNull && col("__i").isNotNull &&
          col("__r").isNotNull)
      var v = time("un_v_init_distinct") {
        val d = rUn.select(col("__i")).distinct().withColumn("__f", lit(1.0))
        d.count(); d
      }
      def solve(fixed: DataFrame, joinKey: String, solveKey: String) =
        Staging.stageForIteration(
          rUn.join(fixed, joinKey)
            .groupBy(col(solveKey))
            .agg(sum(col("__r") * col("__f")).as("__num"),
              sum(col("__f") * col("__f")).as("__den"))
            .select(col(solveKey),
              when(col("__den") > 0.0, col("__num") / col("__den"))
                .otherwise(lit(0.0)).as("__f")))
      var u: DataFrame = null
      for (it <- 1 to 2) {
        u = time(s"un_halfstep_u_$it") { val s = solve(v, "__i", "__u"); s.count(); s }
        v = time(s"un_halfstep_v_$it") { val s = solve(u, "__u", "__i"); s.count(); s }
      }
      println("[prof] unstaged done")
    }

    spark.stop()
  }
}
