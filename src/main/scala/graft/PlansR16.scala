package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Staging.StagedFrame
import graft.pipeline.{Dedup, Similarity}

/** Round-16 plan evidence: writes `plans/r16/<name>_{before,after}.txt`
  * (`explain("formatted")`) for every operator the optimization round
  * touched. The *_before plans re-derive the pre-r16 shape INLINE (the
  * exact code the round replaced, kept here verbatim for comparison);
  * the *_after plans call the library. AQE off for stable plan text
  * (the claims are about Exchange/Sort/Window/Join structure, which AQE
  * only re-optimizes at runtime).
  *
  * Usage: sbt "runMain graft.PlansR16"  (writes under plans/r16/)
  */
object PlansR16 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r16")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    def dump(name: String)(df: DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/$name.txt"), txt)
      println(s"[plans-r16] wrote $outDir/$name.txt")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    // ------------------------------------------------------------------
    // 1. CC propagate round: before = labels⋈neighborMin join + jump +
    //    separate updated⋈labels convergence join (three plans there —
    //    concatenated as one file via a union of marker columns is NOT
    //    faithful; instead the before file holds the round's `raw` AND
    //    the convergence-join probe, the two plans a round executed);
    //    after = union-fused propagate + jump, convergence = 1-row agg
    //    on the SAME frame (no second join plan).
    // ------------------------------------------------------------------
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", 2, 0.5)
      .select(col("id1"), col("id2"))
    // shared edge staging (the after shape also pre-partitions by b)
    val edgesBefore = Staging.stageForIteration(pairs
      .select(col("id1").as("a"), col("id2").as("b"))
      .union(pairs.select(col("id2").as("a"), col("id1").as("b"))))
    val edgesAfter = Staging.stageForIteration(pairs
      .select(col("id1").as("a"), col("id2").as("b"))
      .union(pairs.select(col("id2").as("a"), col("id1").as("b")))
      .repartition(col("b")))
    val labels0 = edgesBefore.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist()

    // BEFORE (pre-r16 round body, verbatim shape)
    locally {
      val labels = labels0
      val neighborMin = edgesBefore
        .join(labels.withColumnRenamed("id", "nbr"), col("b") === col("nbr"))
        .groupBy(col("a"))
        .agg(min(col("label")).as("nlabel"))
      val prop = labels
        .join(neighborMin, labels("id") === neighborMin("a"), "left")
        .select(
          labels("id"),
          least(labels("label"), coalesce(col("nlabel"), labels("label"))).as("label"))
      val lbl2 = prop.select(col("id").as("__lid"), col("label").as("__llabel"))
      val raw = prop
        .join(lbl2, prop("label") === lbl2("__lid"), "left")
        .select(
          prop("id"),
          least(prop("label"), coalesce(col("__llabel"), prop("label"))).as("label"))
      dump("cc_propagate_round_before")(raw)
      // the separate per-round convergence JOIN the round also executed
      dump("cc_convergence_probe_before")(
        raw.as("u").join(labels.as("l"), "id")
          .filter(col("u.label") =!= col("l.label")).limit(1))
    }
    // AFTER (current round body)
    locally {
      val labels = labels0
      val prop = edgesAfter
        .join(labels.withColumnRenamed("id", "nbr"), col("b") === col("nbr"))
        .select(col("a"), col("label"))
        .unionAll(labels.select(col("id").as("a"), col("label")))
        .groupBy(col("a"))
        .agg(min(col("label")).as("label"))
        .withColumnRenamed("a", "id")
      val lbl2 = prop.select(col("id").as("__lid"), col("label").as("__llabel"))
      val raw = prop
        .join(lbl2, prop("label") === lbl2("__lid"), "left")
        .select(
          prop("id"),
          least(prop("label"), coalesce(col("__llabel"), prop("label"))).as("label"))
      dump("cc_propagate_round_after")(raw)
      // convergence probe is now a 1-row agg ON raw — no join, no second
      // pass over labels
      dump("cc_convergence_probe_after")(
        raw.agg(sum(col("label").cast("decimal(38,0)"))))
    }

    // ------------------------------------------------------------------
    // 2. dedupAgainstState: rank window → min_by argmax aggregate
    // ------------------------------------------------------------------
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val shard = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val st = Dedup.minhashDedupState(corpus, "doc_id", "text", n = 2)
    // BEFORE: the all-matches core + the pre-r16 window collapse, verbatim
    locally {
      val raw = Dedup.dedupAgainstStateAll(st, shard, "doc_id", "text",
        n = 2, threshold = 0.5)
        .select(col("id"), col("dup_of").as("cid"), col("jaccard"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("jaccard").desc, col("cid").asc)
      val best = raw
        .withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
        .select(col("id"), col("cid").as("dup_of"), col("jaccard"))
      dump("dedup_against_state_before")(
        shard.select(col("doc_id").as("id")).join(best, Seq("id"), "left"))
    }
    dump("dedup_against_state_after")(
      Dedup.dedupAgainstState(st, shard, "doc_id", "text", n = 2,
        threshold = 0.5))

    // ------------------------------------------------------------------
    // 2b. simhash: explode + 16-aggregate groupBy (one full shuffle of
    //     the token table) → narrow one-pass generator, NO exchange
    // ------------------------------------------------------------------
    locally {
      import graft.pipeline.TextOps
      val bits = Dedup.SimhashBits
      // BEFORE (verbatim pre-r16 shape)
      val tok = docs
        .select(col("doc_id").as("id"),
          explode(TextOps.tokens(col("text"))).as("tok"))
        .withColumn("x", TextOps.hash32(col("tok")))
      val bitSums = (0 until bits).map { k =>
        sum(when(shiftright(col("x"), k) % 2 === 1, 1).otherwise(-1)).as(s"b$k")
      }
      dump("simhash_before")(
        tok.groupBy("id")
          .agg(bitSums.head, bitSums.tail: _*)
          .select(col("id"),
            (0 until bits)
              .map(k => when(col(s"b$k") > 0, 1L << k).otherwise(0L))
              .reduce((a, b) => a + b).as("simhash")))
      dump("simhash_after")(Dedup.simhash(docs, "doc_id", "text"))
    }

    // ------------------------------------------------------------------
    // 3. semDedupAgainst: rank window → min_by argmax aggregate
    // ------------------------------------------------------------------
    val embCorpus = emb.filter(col("vec_id") % 10 =!= 0)
    val embShard = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val sdSt = Similarity.semDedupState(embCorpus, "vec_id", "embedding",
      k = 8, iters = 1, dim = 64)
    // BEFORE (verbatim pre-r16 tail)
    locally {
      val base = embShard.select(col("vec_id").as("id"),
        col("embedding").as("vec"))
      val cents = sdSt.centroidArray
      val asg = base.withColumn("cell",
        graft.functions.VectorExprs.nearestCentroid(col("vec"), cents))
      val cand = asg
        .join(sdSt.members.select(col("cell"), col("id").as("cid"),
          col("vec").as("cvec")), Seq("cell"))
        .withColumn("cos", Similarity.cosine(col("vec"), col("cvec")))
        .filter(col("cos") >= 0.45)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("cos").desc, col("cid").asc)
      val best = cand
        .withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
        .select(col("id"), col("cid").as("dup_of"), col("cos"))
      dump("semdedup_against_before")(
        base.select(col("id")).join(best, Seq("id"), "left"))
    }
    dump("semdedup_against_after")(
      Similarity.semDedupAgainst(sdSt, embShard, "vec_id", "embedding",
        threshold = 0.45))

    spark.stop()
  }
}
