package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Staging.StagedFrame
import graft.pipeline.{Dedup, TextOps}

/** Round-17 plan evidence: writes `plans/r17/<name>_{before,after}.txt`
  * (`explain("formatted")`) for every operator the optimization round
  * touched. The *_before plans re-derive the pre-r17 shape INLINE (the
  * exact code the round replaced, kept here verbatim for comparison);
  * the *_after plans call the library. AQE off for stable plan text.
  *
  * Usage: sbt "runMain graft.PlansR17"  (writes under plans/r17/)
  */
object PlansR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r17")
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
      println(s"[plans-r17] wrote $outDir/$name.txt")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // ------------------------------------------------------------------
    // 1. CC propagate round: before = r16 shape (prop unmaterialized —
    //    the pointer-jump self-join's two references plan the whole
    //    edges⋈labels propagate twice); after = prop eagerly staged
    //    (both sides scan the SAME materialized RDD; the jump's build
    //    side reads the kept hash(a) partitioning exchange-free).
    //    A persist alone does NOT deduplicate: the analyzer's self-join
    //    dedup clones the right subtree into a form the cache lookup no
    //    longer matches (kept below as cc_propagate_round_persist.txt —
    //    only ONE side substitutes, and task counts RISE).
    // ------------------------------------------------------------------
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", 2, 0.5)
      .select(col("id1"), col("id2"))
    val edges = Staging.stageForIteration(pairs
      .select(col("id1").as("a"), col("id2").as("b"))
      .union(pairs.select(col("id2").as("a"), col("id1").as("b")))
      .repartition(col("b")))
    val labels0 = edges.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist()
    def propOf(labels: DataFrame) = edges
      .join(labels.withColumnRenamed("id", "nbr"), col("b") === col("nbr"))
      .select(col("a"), col("label"))
      .unionAll(labels.select(col("id").as("a"), col("label")))
      .groupBy(col("a"))
      .agg(min(col("label")).as("label"))
      .withColumnRenamed("a", "id")
    def jumpOf(prop: DataFrame) = {
      val lbl2 = prop.select(col("id").as("__lid"), col("label").as("__llabel"))
      prop.join(lbl2, prop("label") === lbl2("__lid"), "left")
        .select(
          prop("id"),
          least(prop("label"), coalesce(col("__llabel"), prop("label"))).as("label"))
    }
    // BEFORE (r16 round body: prop re-planned for both self-join sides)
    dump("cc_propagate_round_before")(jumpOf(propOf(labels0)))
    // PERSIST EXPERIMENT (rejected): only one side substitutes the cache
    val propCached = propOf(labels0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    dump("cc_propagate_round_persist")(jumpOf(propCached))
    propCached.unpersist()
    // AFTER (current round body: prop eagerly staged once per round).
    // Per-round work = the propagate aggregate plan (materialized ONCE by
    // the stage's checkpoint job) + the jump plan over the staged blocks.
    dump("cc_propagate_agg_after")(propOf(labels0))
    val propStaged = Staging.stageForIteration(propOf(labels0))
    dump("cc_propagate_round_after")(jumpOf(propStaged))
    propStaged.unpersist()

    // ------------------------------------------------------------------
    // 2. tokens(): split+filter HOF (ArrayFilter = CodegenFallback) →
    //    native one-pass WhitespaceTokens, on the text_analysis pipeline
    // ------------------------------------------------------------------
    def hofTokens(text: org.apache.spark.sql.Column) =
      filter(split(lower(text), "\\s+"), t => length(t) > 0)
    // verbatim pre-r17 consumer spellings (interpreted set-membership
    // filters, replaced by CountInSet this round)
    def hofRatio(t: org.apache.spark.sql.Column, words: Seq[String]) =
      when(size(t) === 0, 0.0).otherwise(
        size(filter(t, x => x.isInCollection(words))).cast("double") /
          size(t).cast("double"))
    def hofLangId(text: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column) = {
      val hasCjk = regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]")) > 0
      val scored = TextOps.LangMarkers.map { case (l, m) => (l, hofRatio(t, m)) }
      val best = scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
        case ((bl, bs), (l, s)) =>
          (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
      }
      when(hasCjk, "zh").otherwise(when(best._2 > 0.0, best._1).otherwise("und"))
    }
    def hofQuality(text: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column) = {
      val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
      val punctPenalty = least(TextOps.punctRatio(text) * 4.0, lit(1.0))
      val stopScore = least(hofRatio(t, TextOps.EnglishStopwords) * 5.0, lit(1.0))
      lenScore * 0.5 + stopScore * 0.3 + (lit(1.0) - punctPenalty) * 0.2
    }
    dump("text_tokens_before")(
      docs.withColumn("__t", hofTokens(col("text")))
        .select(col("doc_id"),
          hofLangId(col("text"), col("__t")).as("lang"),
          hofQuality(col("text"), col("__t")).as("q"),
          TextOps.fingerprint(col("text")).as("fp")))
    dump("text_tokens_after")(
      docs.withColumn("__t", TextOps.tokens(col("text")))
        .select(col("doc_id"),
          TextOps.langIdT(col("text"), col("__t")).as("lang"),
          TextOps.qualityScoreT(col("text"), col("__t")).as("q"),
          TextOps.fingerprint(col("text")).as("fp")))

    // ------------------------------------------------------------------
    // 3. repeatToTokenBudget driver phases: before = TWO full corpus
    //    tokenize+aggregate passes (the inventory agg, then the remainder
    //    cut's per-(domain,bucket) phase-1 agg); after = ONE fused
    //    per-(domain,bucket) histogram serving both.
    // ------------------------------------------------------------------
    val tok = TextOps.tokenCount(col("text"))
    val tokL = coalesce(tok.cast("long"), lit(0L))
    val budgetOf = when(col("lang") === "en", lit(1000000L)) // shape-only literal
    val u = TextOps.hash32(concat(lit("bench"), col("doc_id").cast("string")))
      .cast("double") / lit(4294967296.0)
    // BEFORE phase 0: the repeatPlan inventory aggregate
    dump("repeat_inventory_before")(
      docs.filter(budgetOf.isNotNull && col("doc_id").isNotNull)
        .groupBy(col("lang").as("__d")).agg(sum(tokL).as("__t")))
    // BEFORE phase 1: the remainder cut's per-(domain,bucket) aggregate
    // (a SECOND full tokenize pass over the corpus)
    dump("repeat_phase1_before")(
      docs.withColumn("__budget", budgetOf)
        .filter(col("__budget").isNotNull)
        .withColumn("__u", u)
        .withColumn("__tok", tokL)
        .withColumn("__bkt", floor(col("__u") * lit(1024.0)).cast("int"))
        .groupBy(col("lang").as("__d"), col("__bkt"))
        .agg(sum(col("__tok")).as("__t")))
    // AFTER: the single fused histogram (same plan shape as phase-1, but
    // it is now the ONLY corpus-wide aggregate — inventory = Σ buckets)
    dump("repeat_hist_after")(
      docs.withColumn("__budget", budgetOf)
        .filter(col("__budget").isNotNull)
        .withColumn("__u", u)
        .withColumn("__tok", tokL)
        .withColumn("__bkt", floor(col("__u") * lit(1024.0)).cast("int"))
        .filter(col("doc_id").isNotNull)
        .groupBy(col("lang").as("__d"), col("__bkt"))
        .agg(sum(col("__tok")).as("__t")))

    // ------------------------------------------------------------------
    // 4. packSequences: before = unstaged slim frame (tokenize projection
    //    planned under BOTH the phase-1 aggregate and the phase-2 window,
    //    which also pays an Exchange); after = slim frame repartitioned
    //    on __bkt and checkpointed (one tokenize pass; the window reads
    //    the staged partitioning exchange-free).
    // ------------------------------------------------------------------
    dump("pack_before")(TextOps.packSequencesImpl(docs, "doc_id", "text",
      window = 2048, salt = "bench", shardCol = None, buckets = 1024,
      stageSlim = false))
    dump("pack_after")(TextOps.packSequencesImpl(docs, "doc_id", "text",
      window = 2048, salt = "bench", shardCol = None, buckets = 1024,
      stageSlim = true))

    spark.stop()
  }
}
