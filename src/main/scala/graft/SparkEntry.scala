package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: 2-FE compressed regression with HC1 SEs on sf0.001 lineitem,
    * coefficient table as a DataFrame (driver smoke-checks rows > 0). */
  def entry(spark: SparkSession): DataFrame = {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    graft.reg.Dbreg
      .fit(
        "l_extendedprice ~ l_quantity + l_discount | l_returnflag + l_linestatus",
        li,
        vcov = "hc1",
        strategy = "compress")
      .toDF(spark)
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ pipeline ops). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** DuckDB-equivalent SQL per query (same tables). Queries without an
    * entry get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] = OracleSql.all
}
