package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.reg.Glm

/** Scratch profiler for the GLM/IRLS paths (not part of the driver
  * contract; produces the BENCH_NOTES round-5 GLM scaling points).
  * SPARK_GRAFT_SF_DIR points at a testdata dir or a ScaleUp replica. */
object ProfGlm {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docsDir = sys.env.getOrElse("SPARK_GRAFT_DOCS_DIR", sfDir)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("ret", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
    val docs = spark.read.parquet(s"$docsDir/documents.parquet")
    println(s"[prof] rows=${li.count()} docs=${docs.count()}")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    // warm
    Glm.fit("ret ~ l_quantity", li, strategy = "compress", maxIter = 4, tol = 0.0)

    (1 to 2).foreach { _ =>
      time("glm_logit_compress (4 it)")(
        Glm.fit("ret ~ l_quantity", li, strategy = "compress", maxIter = 4, tol = 0.0))
      time("glm_logit_irls (4 it)")(
        Glm.fit("ret ~ l_quantity", li, strategy = "irls", maxIter = 4, tol = 0.0))
      time("glm_logit_compress 2x (4 it)")(
        Glm.fit("ret ~ l_quantity + l_discount", li, strategy = "compress",
          maxIter = 4, tol = 0.0))
      time("glm_poisson_compress (4 it)")(
        Glm.fit("l_quantity ~ l_discount", li, family = "poisson",
          strategy = "compress", maxIter = 4, tol = 0.0))
      time("glm_grouped_compress (3 it)")(
        Glm.fitGrouped("ret ~ l_quantity", li, "l_returnflag",
          strategy = "compress", maxIter = 3).count())
      time("glm_score_docs")(
        docs
          .withColumn("_eta",
            lit(-1.5)
              + col("n_chars").cast("double") / 1000.0 * lit(0.8)
              + graft.pipeline.TextOps.tokenCount(col("text")).cast("double") / 100.0 * lit(1.2)
              - graft.pipeline.TextOps.punctRatio(col("text")) * lit(4.0))
          .select(Glm.sigmoid(col("_eta")).as("score"))
          .agg(sum("score")).collect())
      time("gopher_rules_docs")({
        val sigs = graft.pipeline.TextOps.gopherSignals(col("text"), col("__t"))
        docs.withColumn("__t", graft.pipeline.TextOps.tokens(col("text")))
          .select(sigs.map { case (n, c) => c.as(n) }: _*)
          .agg(sum(col("keep").cast("long"))).collect()
      })
      time("curation_pipeline (q100 shape)")({
        val sigs = graft.pipeline.TextOps.gopherSignals(col("text"), col("__t")).toMap
        val eta = lit(-1.5) +
          col("n_chars").cast("double") / 1000.0 * lit(0.8) +
          size(col("__t")).cast("double") / 100.0 * lit(1.2) -
          graft.pipeline.TextOps.punctRatio(col("text")) * lit(4.0)
        val gated = docs
          .withColumn("__t", graft.pipeline.TextOps.tokens(col("text")))
          .withColumn("_score", Glm.sigmoid(eta))
          .filter(sigs("keep") && col("_score") > 0.3)
          .drop("__t")
        val keepIds = graft.pipeline.Dedup.exactGroups(gated, "doc_id", "text")
          .select(col("keep_id").as("doc_id"))
        val unique = gated.join(keepIds, Seq("doc_id"), "left_semi")
        graft.sources.ScaleOps
          .hashSplit(unique, "doc_id",
            Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05), salt = "prof")
          .groupBy("split").agg(count(lit(1))).collect()
      })
      time("calibration (q101 shape)")({
        val data = li.withColumn("hit",
          when(col("l_orderkey") % 100 < col("l_quantity"), 1.0).otherwise(0.0))
        val fit = Glm.fit("hit ~ l_quantity", data, family = "binomial",
          strategy = "compress", maxIter = 4, tol = 0.0)
        fit.predictResponse(data.filter(col("l_quantity").isNotNull), "mu")
          .withColumn("bin", least(floor(col("mu") * 20), lit(19)).cast("long"))
          .groupBy("bin")
          .agg(count(lit(1)), avg("mu"), avg("hit")).collect()
      })
    }
    spark.stop()
  }
}
