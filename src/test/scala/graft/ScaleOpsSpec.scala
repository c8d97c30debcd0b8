package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.ScaleOps

class ScaleOpsSpec extends SparkTestBase {

  test("partitioned sink round-trips and prunes partitions at read") {
    val li = sf("sf0.001", "lineitem")
    val dir = Files.createTempDirectory("graft_part").toString
    ScaleOps.writePartitioned(li, dir, Seq("l_returnflag"))
    val back = ScaleOps.readPartitioned(spark, dir)
    assert(back.count() == li.count())
    val pruned = back.filter(col("l_returnflag") === "N")
    // partition pruning visible in the plan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("l_returnflag"))
    assert(pruned.count() == li.filter(col("l_returnflag") === "N").count())
  }

  test("bucketed table join avoids shuffle on the bucketed key") {
    val li = sf("sf0.001", "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    val od = sf("sf0.001", "orders").select("o_orderkey", "o_totalprice")
    // DROP TABLE leaves the managed location behind across JVM sessions —
    // clear both the catalog entry and the warehouse directory
    Seq("graft_li_b", "graft_od_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(loc)
      }
    }
    ScaleOps.writeBucketed(li, "graft_li_b", Seq("l_orderkey"), 4)
    ScaleOps.writeBucketed(od.withColumnRenamed("o_orderkey", "l_orderkey"),
      "graft_od_b", Seq("l_orderkey"), 4)
    val joined = spark.table("graft_li_b")
      .join(spark.table("graft_od_b"), "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    // sort-merge join without an Exchange on either side
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n${plan.take(800)}")
    assert(joined.count() == li.join(od, li("l_orderkey") === od("o_orderkey")).count())
  }

  test("salted aggregation equals plain aggregation") {
    val li = sf("sf0.001", "lineitem")
    val plain = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = ScaleOps.saltedAggregate(li, Seq("l_returnflag"), 8,
      partials = Seq(count(lit(1)).as("n"), sum("l_quantity").as("s")),
      finals = Seq(sum("n").as("n"), sum("s").as("s")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(plain == salted)
  }

  test("salted join equals plain join") {
    val li = sf("sf0.001", "lineitem").select("l_orderkey", "l_quantity")
    val od = sf("sf0.001", "orders").select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(od, "l_orderkey").count()
    val salted = ScaleOps.saltedJoin(li, od, "l_orderkey", 4).count()
    assert(plain == salted)
  }
}
