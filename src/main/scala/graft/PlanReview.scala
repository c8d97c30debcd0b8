package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the physical plans of the engine's load-bearing operators so the
  * shuffle/broadcast/pushdown structure can be reviewed and recorded
  * (PLANS.md). Run: sbt "runMain graft.PlanReview" */
object PlanReview {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "false") // stable plan text
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def show(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n==================== $name ====================")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }

    // 1. pushdown: filter + projection must reach the parquet scan
    show("filter+projection pushdown") {
      li.filter(col("l_quantity") > 40)
        .select(col("l_returnflag"), col("l_extendedprice"))
        .groupBy("l_returnflag").agg(sum("l_extendedprice"))
    }
    // 2. moments aggregation: single scan, partial+final hash agg
    show("moments triangle (compress cells)") {
      graft.reg.Dbreg.compressedData("l_extendedprice ~ l_quantity | l_returnflag", li)
    }
    // 3. demean join: group means must broadcast, fact side unshuffled
    show("demean group-mean join") {
      val b = li.select(col("l_returnflag"), col("l_extendedprice").cast("double").as("y"))
      val gm = b.groupBy("l_returnflag").agg(avg("y").as("ym"))
      b.join(broadcast(gm), "l_returnflag")
        .select((col("y") - col("ym")).as("yt"))
        .agg(sum(col("yt") * col("yt")))
    }
    // 4. minhash signatures: narrow (no exchange anywhere)
    show("minhash signatures (narrow)") {
      graft.pipeline.Dedup.minhashSignatures(docs, "doc_id", "text", 2)
    }
    // 5. LSH candidate join: shuffle only on (band, bucket) keys
    show("LSH near-dup pairs") {
      graft.pipeline.Dedup.minhashPairs(docs, "doc_id", "text", 2, 0.5)
    }
    // 6. brute kNN: query side broadcast, corpus never shuffled
    show("brute-force kNN") {
      graft.pipeline.Similarity.bruteForceTopK(emb, "vec_id", "embedding", Seq(0L, 1L), 5)
    }
    // 7. histogram quantile breaks (PLANS.md §12): both scans narrow, the
    // bucket groupBy partial+final, at most `buckets` rows on the exchange
    show("histQuantiles bucket histogram") {
      val base = li.select(col("l_quantity")).filter(col("l_quantity").isNotNull)
      val x = col("l_quantity").cast("double")
      base.groupBy(least(floor((x - 1.0) / ((50.0 - 1.0) / 1024)), lit(1023))
          .cast("int").as("__b"))
        .agg(count(lit(1)).as("__c"))
    }
    // 8. inline means (PLANS.md §3 tier 1): a <=64-level demean moment
    // pass is ONE projection over the scan — no join operator in the plan
    // (the fitted plan is consumed inside fit(), so re-derive its shape)
    show("demean with inlined means (no join)") {
      val b = li.select(col("l_returnflag"),
        col("l_extendedprice").cast("double").as("y"))
      val means = b.groupBy("l_returnflag").agg(avg("y").as("ym")).collect()
      val lookup = means.foldLeft(lit(null).cast("double")) { (acc, r) =>
        when(col("l_returnflag") === lit(r.getString(0)),
          lit(r.getDouble(1))).otherwise(acc)
      }
      b.select((col("y") - lookup).as("yt")).agg(sum(col("yt") * col("yt")))
    }
    // 9. contamination probe: benchmark shingle set broadcast (BuildRight
    // of a BroadcastHashJoin), corpus side a narrow explode — the corpus
    // is shuffled only by the final partial+final agg on doc id
    show("benchmark contamination (broadcast probe)") {
      graft.pipeline.Dedup.contamination(
        docs, docs.filter(col("doc_id") % 37 === 0), "doc_id", "text", 2)
    }
    // 10. simhash pairs (PLANS.md §15): one keyed agg for signatures, one
    // for the class collapse, (band,bucket)-keyed candidate join, codegen'd
    // popcount verify — no corpus×corpus product anywhere
    show("simhash pair search (banded)") {
      graft.pipeline.Dedup.simhashPairs(docs, "doc_id", "text")
    }
    // 11. PII scrub: pure regexp projections — a single WholeStageCodegen
    // span over the scan, no exchange
    show("PII counts + redaction (narrow)") {
      docs.select(
        col("doc_id") +:
          graft.pipeline.TextOps.piiCounts(col("text")).map { case (n, c) => c.as(s"n_$n") } :+
          graft.pipeline.TextOps.redactPii(col("text")).as("red"): _*)
    }
    // 12. dup spans (PLANS.md §17): narrow window explode, ONE exchange for
    // the fingerprint count (partial+final agg), key-equi count attach —
    // no corpus×corpus step
    show("duplicated token spans") {
      graft.pipeline.Dedup.dupSpans(docs, "doc_id", "text", 5)
    }
    // 13. weighted sample (PLANS.md §18): pure filter projection — the
    // md5-uniform and the weight are both narrow; NO exchange in the plan
    show("weighted sample (pure filter)") {
      graft.sources.ScaleOps.weightedSample(
        docs, "doc_id", graft.pipeline.TextOps.qualityScore(col("text")), "p")
    }
    // 14. nearest-centroid assignment (PLANS.md §18): a single projection
    // over the scan — the centroid matrix is a plan reference, so the plan
    // is O(1) in k (this one runs k=512) and stays inside WholeStageCodegen
    show("kmeans assignment via NearestCentroid (k=512, narrow)") {
      val rng = new scala.util.Random(11)
      val cents = Array.fill(512)(Array.fill(64)(rng.nextDouble() - 0.5))
      emb.select(col("vec_id"),
        graft.functions.VectorExprs.nearestCentroid(col("embedding"), cents).as("cell"))
    }
    // 15. int8 quantization (PLANS.md §18): narrow HOF projection
    show("int8 embedding quantization (narrow)") {
      val sc = graft.pipeline.Similarity.int8Scale(col("embedding"))
      emb.select(col("vec_id"),
        graft.pipeline.Similarity.int8Quantize(col("embedding"), sc).as("q"),
        sc.as("scale"))
    }
    // 16. GLM compress cell build (PLANS.md §26): ONE partial+final hash
    // aggregate over a pruned scan — the only corpus pass of the whole fit
    show("glm compress cell build") {
      li.withColumn("ret",
          when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
        .filter(col("ret").isNotNull && col("l_quantity").isNotNull)
        .select(lit(1.0).as("__g_x0"), col("l_quantity").cast("double").as("__g_x1"),
          lit(1.0).as("_wt"), col("ret").as("_yb"))
        .groupBy("__g_x0", "__g_x1")
        .agg(sum("_wt").as("_wt"),
          (sum(col("_wt") * col("_yb")) / sum("_wt")).as("_yb"))
    }
    // 17. q100 curation pipeline: both quality gates + the fingerprint must
    // fuse into the scan projection (one pass before the dedup shuffle)
    show("curation pipeline (q100 shape)") {
      Queries.all("q100_curation_pipeline")(spark, sfDir)
    }
    // 18. ridge/lasso moments: ONE partial+final hash agg over a scan that
    // reads ONLY the formula columns (pruned ReadSchema) — the whole λ path
    // hangs off this single job
    show("ridge/lasso one-pass centered moments") {
      val b = li.select(col("l_extendedprice").cast("double").as("_y"),
        col("l_quantity").cast("double").as("_x"))
      b.agg(count(lit(1)), sum("_x"), sum("_y"), sum(col("_x") * col("_x")),
        sum(col("_x") * col("_y")), sum(col("_y") * col("_y")))
    }
    // 19. PCA transform: AffineProject is a narrow codegen'd projection —
    // no exchange, matrix rides as a plan reference (not literal columns)
    show("pca transform (AffineProject, narrow)") {
      val model = graft.pipeline.Pca.fit(emb, "embedding", 64, 8)
      model.transform(emb, "embedding", "pc")
        .select(element_at(col("pc"), 1))
    }
    // 20. heavy hitters: ObjectHashAggregate partial+final over the token
    // ARRAY column — no explode (row count through the agg = documents),
    // shuffle carries one ≤capacity summary per partition
    show("heavy hitters (Misra-Gries, no explode)") {
      docs.agg(graft.functions.FreqItemsAgg(
        graft.pipeline.TextOps.tokens(col("text")), 4096))
    }
    // 21. BM25: the isin filter must sit UNDER the (id, token) aggregate —
    // only query-term postings shuffle; top-k is TakeOrderedAndProject
    show("bm25 top-k (postings filtered pre-shuffle)") {
      graft.pipeline.TextOps.bm25TopK(docs, "doc_id", "text",
        Seq("hash", "join", "stream", "vector"), k = 25)
    }
    // 22. profile: ONE aggregate job (HLL distincts — no Expand in the
    // default mode), stack unpivot of the single result row
    show("column profile (one pass, approx distincts)") {
      graft.sources.ScaleOps.profile(li,
        Seq("l_quantity", "l_extendedprice", "l_discount"))
    }
    // 23. PSI: two keyed bin-counts + bins-row joins; both corpora stream
    // once, reference stats ride a broadcast crossJoin
    show("psi drift (keyed bin counts, broadcast edges)") {
      graft.reg.Eval.psi(li.limit(30000), li, col("l_extendedprice"), 10)
    }
    // round 6: repetition rules — every shuffle keyed on (id) or (id, gram),
    // one staged tokenize scan feeding all branches, no cartesian anywhere
    show("gopher repetition signals") {
      graft.pipeline.TextOps.repetitionSignals(docs, "doc_id", "text")
    }
    // round 6: retention — distinct + min-agg + user-keyed join + rollup
    show("retention cohorts") {
      val ev = graft.sources.EventTime.withEpochMicros(
        spark.read.parquet(s"$sfDir/events.parquet"))
      graft.operators.Events.retentionCohorts(ev, "user_id", "tus", 86400000000L)
    }
    val ev6 = graft.sources.EventTime.withEpochMicros(
      spark.read.parquet(s"$sfDir/events.parquet"))
    // round 6: transitions — ONE user-keyed window (single-row lag state),
    // pair hash agg; normalizing window over the aggregated frame only
    show("event transitions (user-keyed lag)") {
      graft.operators.Events.transitions(ev6, "user_id", "tus", "event_type", "event_id")
    }
    // round 6: anomaly — one keyed count over raw events; medians +
    // flagging ride broadcast 1-row crossJoins over the period series
    show("anomalous periods (median/MAD)") {
      graft.operators.Events.anomalousPeriods(ev6, "tus", 3600000000L)
    }
    // round 6: basket rules — pair self-join keyed on the basket (valved),
    // support filter BEFORE the item-frequency joins
    show("basket association rules") {
      graft.operators.Baskets.associationRules(li, "l_orderkey", "l_partkey",
        minPairSupport = 3L, maxBasketSize = 20)
    }
    // round 6: quantile sketch — ObjectHashAggregate partial+final,
    // shuffle carries ≤capacity centroids per partition
    show("quantile sketch (bounded-state)") {
      li.groupBy("l_returnflag").agg(graft.functions.QuantileSketchAgg(
        col("l_quantity"), Seq(0.25, 0.5, 0.75, 0.95), 64))
    }
    // round 6: pagerank — per iteration ONE src-keyed join + one
    // dst-keyed sum; dangling/N ride 1-row broadcasts (2 iters shown)
    show("pagerank (2 iterations)") {
      val dom = graft.pipeline.TextOps.extractUrls(docs.select(col("doc_id"),
        concat(col("text"), lit(" https://a.example.org/x"),
          lit(" https://b.example.net/y")).as("text")), "doc_id", "text")
        .select(col("doc_id"), col("domain")).distinct()
      val edges = dom.select(col("doc_id"), col("domain").as("src"))
        .join(dom.select(col("doc_id"), col("domain").as("dst")), Seq("doc_id"))
        .filter(col("src") =!= col("dst"))
      graft.operators.Graphs.pageRank(edges, "src", "dst", iters = 2)
    }
    // round 6: DSIR — bucket-keyed counts (≤B rows out per side), weight
    // table broadcast into the per-doc sum
    show("dsir importance scores") {
      graft.pipeline.Dsir.importanceScores(docs,
        docs.filter(col("lang") === "en"), "doc_id", "text", buckets = 4096)
    }
    // round 6: phrase search — term filter under the explode, all hops
    // keyed on (id, pos)
    show("phrase search (postings chain)") {
      graft.pipeline.Phrase.phraseSearch(docs, "doc_id", "text",
        Seq("row", "column", "sort"))
    }
    // round 6: percentile rank — ONE distinct-value window + broadcast
    // join back; the relation itself is never sorted
    show("percentile rank (broadcast CDF)") {
      graft.operators.Features.percentileRank(
        li.select("l_orderkey", "l_linenumber", "l_quantity"), "l_quantity")
    }
    // round 6b: bloom semi join — the might_contain probe must sit in a
    // Filter INSIDE WholeStageCodegen on the big side, upstream of the
    // semi join's exchange; the filter build is a 1-row broadcast
    val ordT = spark.read.parquet(s"$sfDir/orders.parquet")
    show("bloom-filtered semi join") {
      graft.operators.BloomJoin.semiJoin(
        ordT, col("o_orderkey"),
        li.filter(col("l_quantity") >= 49), col("l_orderkey"),
        numBits = 1 << 16, numHashes = 5)
    }
    // round 6b: prefix-filter set-similarity join — every exchange keyed
    // (token / id / pair), windows partitioned by id, no global sort
    show("setsim prefix join") {
      graft.operators.SetSimJoin.jaccardJoin(
        docs.select(col("doc_id"),
          graft.pipeline.TextOps.tokens(col("text")).as("__toks")),
        "doc_id", graft.pipeline.TextOps.wordShingles(col("__toks"), 3), 0.5)
    }
    // round 6b: OHLC + latest-per-key — ONE partial+final hash agg each,
    // no window/sort operator anywhere
    val ev = graft.sources.EventTime.withEpochMicros(
      spark.read.parquet(s"$sfDir/events.parquet"))
    show("ohlc downsample (single hash agg)") {
      graft.operators.Events.ohlcDownsample(
        ev, "event_type", "tus", "event_id", "value", 3600000000L)
    }
    show("latest per key (single hash agg)") {
      graft.operators.Events.latestPerKey(
        ev, Seq("user_id", "event_type"), "tus", "event_id", "value")
    }
    // pq rerank: the candidate join's probe side must carry (cell, lut)
    // and the candidate side (id, cell, codes) — NO vector column may
    // ride the approx phase; vectors re-enter only at the shortlist joins
    show("pq rerank (codes-only candidate join)") {
      val books = graft.pipeline.Similarity
        .pqTrain(emb, "vec_id", "embedding", m = 2, k = 4, iters = 1, dim = 64)
      graft.pipeline.Similarity.pqRerankTopK(
        emb, "vec_id", "embedding", 3, books,
        nCentroids = 16, nprobe = 2, shortlist = 8)
    }
    // round 8: hybrid retrieval — both candidate branches must be
    // TakeOrderedAndProject (per-partition heaps, no global corpus sort);
    // fusion joins/windows touch only candidateK-row frames
    show("hybrid RRF retrieval (TakeOrdered branches)") {
      graft.pipeline.Retrieval.hybridTopK(
        docs, "doc_id", "text", Seq("hash", "join"),
        emb, "vec_id", "embedding",
        Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0),
        k = 5, candidateK = 10)
    }
    // round 8: silhouette — ONE narrow projection (k dots per row) + one
    // cell-keyed partial+final hash agg; no window, no join
    show("centroid silhouette (single hash agg)") {
      graft.pipeline.Similarity.silhouette(emb, "vec_id", "embedding",
        Array(Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0),
          Array.tabulate(64)(i => if (i == 1) 1.0 else 0.0)))
    }
    // round 8: ranking metrics — ONE query-keyed partial+final hash agg
    // over the supplied ranked list; discounts are literal CASE chains
    show("ranking metrics (single hash agg)") {
      import spark.implicits._
      graft.reg.Eval.rankingMetrics(
        Seq((1L, 1, 1), (1L, 2, 0)).toDF("q", "rank", "rel"),
        "q", "rank", "rel", k = 5)
    }
    // round 8b: ANOVA — ONE group-keyed partial+final hash agg off the
    // scan, then a 1-row re-aggregation of the k-row group table; no
    // window, no join, no second corpus scan
    show("anova one-way (single hash agg)") {
      graft.reg.Eval.anovaOneWay(li, col("l_returnflag"),
        col("l_extendedprice"))
    }
    // round 8b: stump split search — one 1-row bounds agg broadcast back
    // (BroadcastNestedLoopJoin over a single row), one (feature, bin)
    // partial+final hash agg absorbing the explode map-side; windows run
    // over the features·bins cell table only
    show("stump splits (bounds broadcast + cell agg)") {
      graft.reg.Trees.bestStumpSplits(li,
        (col("l_returnflag") === "R").cast("int"),
        Seq("l_quantity" -> col("l_quantity"),
          "l_discount" -> col("l_discount")), bins = 16)
    }
    // round 8b: SES forecast — one (type, period) hash agg collapses the
    // corpus; the rank window and final agg run per type over the tiny
    // period series (exchange keyed on event_type, never a global sort)
    show("ses forecast (periods then keyed window)") {
      graft.operators.Events.sesForecast(ev, "event_type", "tus", "value",
        periodUs = 3600000000L, alpha = 0.3)
    }
    // round 8b: rank-1 MF half-step — ratings ⋈ fixed-side factors keyed
    // on the fixed id, then one keyed agg on the solved side; no
    // cartesian, factor frames staged per iteration
    show("rank-1 MF (keyed join + keyed agg per half-step)") {
      graft.operators.Recommend.rank1Factors(
        li.limit(100000), "l_suppkey", "l_partkey", "l_quantity", iters = 1)
    }
    // round 13: SemDeDup frozen-state ingest — shard-side narrow argmax
    // assignment (codebook is a plan reference, not literals), ONE
    // cell-keyed join against the members table, shard-sized best-match
    // window; nothing corpus-sized recomputes
    show("semDedupAgainst (assignment + cell join + shard window)") {
      val st = graft.pipeline.Similarity.semDedupState(
        emb.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding",
        k = 8, iters = 2, dim = 64)
      graft.pipeline.Similarity.semDedupAgainst(st,
        emb.filter(col("vec_id") % 10 === 0), "vec_id", "embedding", 0.45)
    }
    // round 13: MinHash state refresh — shard-sized shingle pass, one
    // fp-keyed anti join against reps, bucket-table-sized valve agg
    show("minhashDedupStateRefresh (anti join + valve agg)") {
      val st = graft.pipeline.Dedup.minhashDedupState(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
      graft.pipeline.Dedup.minhashDedupStateRefresh(st,
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text").buckets
    }
    // round 14: SemDeDup frozen-codebook append — the members plan is a
    // cell-filtered union of the resident members and a narrow shard
    // assignment; nothing corpus-sized shuffles, no join at all
    show("semDedupStateAppend members (filtered union, no join)") {
      val st = graft.pipeline.Similarity.semDedupState(
        emb.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding",
        k = 8, iters = 1, dim = 64)
      graft.pipeline.Similarity.semDedupStateAppend(st,
        emb.filter(col("vec_id") % 10 === 0)
          .withColumn("vec_id", col("vec_id") + 1000000L),
        "vec_id", "embedding").members
    }
    // round 14: state frozen FROM the persisted index — the member scan
    // carries the valve as a PartitionFilter on the hive cell layout
    show("freezeSemDedupState members (valve = partition filter)") {
      val d = java.nio.file.Files
        .createTempDirectory("graft-plan-vidx").toString
      graft.pipeline.VectorIndex.build(
        emb.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding", d,
        k = 8, iters = 1)
      graft.pipeline.VectorIndex.freezeSemDedupState(spark, d,
        maxCellSize = Some(60L)).members
    }
    // round 14: sampled drift monitor — the resident side is a narrow
    // hash-filtered scan + broadcast k-row join + 1-row aggregate
    show("driftCheck sampled (hash filter + broadcast + 1-row agg)") {
      val d = java.nio.file.Files
        .createTempDirectory("graft-plan-drift").toString
      graft.pipeline.VectorIndex.build(
        emb.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding", d,
        k = 8, iters = 1)
      graft.pipeline.VectorIndex.driftCheck(spark, d,
        emb.filter(col("vec_id") % 10 === 0), "vec_id", "embedding",
        sampleFraction = 0.25, salt = "plan")
    }
    // round 15: split against the frozen cluster state — ONE join of the
    // corpus to the dup-sized map + the narrow hash-split projection; no
    // CC iterations, no pair producer anywhere in the plan
    show("leakageSafeSplitAgainst (one join + projection, no CC)") {
      val pairs = graft.pipeline.Dedup.jaccardPairs(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
        n = 2, threshold = 0.5)
      val st = graft.pipeline.Dedup.dupClusterState(pairs)
      graft.sources.ScaleOps.leakageSafeSplitAgainst(st, docs, "doc_id",
        Seq("train" -> 0.9, "eval" -> 0.1), salt = "plan")
    }
    // round 15: decontamination scrub — suite sliver broadcasts into a
    // LEFT SEMI probe of the shard's window explode; the only shuffle is
    // the (id)-keyed mask aggregate and the rebuild join
    show("decontaminate (broadcast semi probe + mask agg)") {
      val st = graft.pipeline.Dedup.contaminationState(
        docs.filter(col("doc_id") % 37 === 0), "doc_id", "text", n = 5,
        suite = "plan")
      graft.pipeline.Dedup.decontaminate(st,
        docs.filter(col("doc_id") % 5 === 1), "doc_id", "text")
    }
    // round 16: all-matches ingest dedup — the same three key-equi
    // state probes as the top-1 form, but the collapse is an (id, cid)
    // hash-agg: NO window (no per-id sort) anywhere in the plan
    show("dedupAgainstStateAll (state probes + hash-agg, no Window)") {
      val st = graft.pipeline.Dedup.minhashDedupState(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", n = 2)
      graft.pipeline.Dedup.dedupAgainstStateAll(st,
        docs.filter(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L),
        "doc_id", "text", n = 2, threshold = 0.4)
    }
    // round 16: per-suite scrub report — (window, suite) sliver
    // broadcasts into an INNER probe, positions explode only for HITS,
    // one (id, suite)-keyed distinct + count
    show("decontaminateBySuite (broadcast inner probe + keyed distinct)") {
      val st = graft.pipeline.Dedup.contaminationState(
        docs.filter(col("doc_id") % 37 === 0), "doc_id", "text", n = 5,
        suite = "plan")
      graft.pipeline.Dedup.decontaminateBySuite(st,
        docs.filter(col("doc_id") % 5 === 1), "doc_id", "text")
    }
    spark.stop()
  }
}
