package graft.pipeline

import graft.Staging.StagedFrame
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse lexical (BM25) and semantic (embedding-cosine)
  * rankings with reciprocal-rank fusion (RRF, Cormack et al. 2009) — the
  * standard production shape for "keyword + vector" search, and the
  * retrieval half of a RAG data pipeline.
  *
  * RRF is rank-only: score(d) = Σ_lists 1/(rrfK + rank_list(d)), summed
  * over the lists that contain d. Using ranks instead of raw scores makes
  * the fusion scale-free (BM25 and cosine live on incomparable scales)
  * and exactly reproducible across engines (integer ranks ⇒ identical
  * doubles).
  *
  * Scale shape: each branch ends in an `orderBy().limit(candidateK)` =
  * TakeOrderedAndProject — per-partition heaps, NO global sort of the
  * corpus; every window below runs on ≤ candidateK rows (driver-bounded,
  * like the kmeans-centroid collects). The fusion join touches
  * ≤ 2·candidateK rows. At 100 TB the semantic branch should come from
  * the IVF index ([[Similarity.ivfTopK]] / [[graft.sources.VectorIndex]])
  * instead of the exact scan — feed any pre-ranked lists to [[rrfFuse]];
  * the plan downstream of the candidate lists is identical.
  */
object Retrieval {

  /** Fuse N ranked candidate lists by RRF. Each list must carry
    * (`idCol`, `rankCol`) with ranks starting at 1; ids absent from a
    * list simply contribute nothing for it. Returns (id, rrf, n_lists)
    * ordered by (rrf desc, id), top `k`. */
  def rrfFuse(
      lists: Seq[DataFrame],
      idCol: String,
      rankCol: String,
      k: Int,
      rrfK: Int = 60
  ): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k >= 1, s"k must be >= 1, got $k")
    require(rrfK >= 1, s"rrfK must be >= 1, got $rrfK")
    lists
      .map(_.select(col(idCol).as("id"),
        (lit(1.0) / (lit(rrfK) + col(rankCol).cast("double"))).as("__c")))
      .reduce(_ unionAll _)
      .groupBy(col("id"))
      .agg(sum(col("__c")).as("rrf"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf").desc, col("id").asc)
      .limit(k)
  }

  /** [[rrfFuse]] keyed by query: fuse N per-query ranked lists — each
    * carrying (`qidCol`, `idCol`, `rankCol`, ranks from 1) — into the
    * per-query RRF top `k`. The batch companion of [[rrfFuse]]: feed it
    * any mix of pre-ranked lists (batch BM25, a persisted-index kNN, a
    * recency ranking) and it returns (query_id, id, rrf, n_lists) per
    * query, ordered within the contract of [[hybridTopKBatch]] (rrf
    * desc, id asc). Scale shape: one union + one (query, id) hash agg
    * over ≤ Σ|lists| rows (candidate-bounded, never corpus-bounded) +
    * the group-limited rank window. */
  def rrfFuseKeyed(
      lists: Seq[DataFrame],
      qidCol: String,
      idCol: String,
      rankCol: String,
      k: Int,
      rrfK: Int = 60
  ): DataFrame = {
    require(lists.nonEmpty, "rrfFuseKeyed needs at least one ranked list")
    require(k >= 1, s"k must be >= 1, got $k")
    require(rrfK >= 1, s"rrfK must be >= 1, got $rrfK")
    val fused = lists
      .map(_.select(col(qidCol).as("query_id"), col(idCol).as("id"),
        (lit(1.0) / (lit(rrfK) + col(rankCol).cast("double"))).as("__c")))
      .reduce(_ unionAll _)
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("__c")).as("rrf"), count(lit(1)).as("n_lists"))
    perQueryTopK(fused, "query_id", "id", "rrf", k, "__r").drop("__r")
  }

  /** Pseudo-relevance-feedback query expansion (the RM3 shape, Lavrenko
    * & Croft 2001 simplified to counts): run BM25 once, take the top
    * `fbDocs` results as the feedback set, add the `fbTerms` most
    * frequent feedback-set tokens (minus the original terms; ties →
    * lexicographic) to the query, and re-run BM25 with the expanded term
    * set. The classic fix for vocabulary mismatch in lexical retrieval.
    *
    * Scale shape: two [[TextOps.bm25TopK]] passes (each one corpus scan,
    * candidates via TakeOrdered heaps) plus a token count over the
    * fbDocs-row feedback set; only the `fbTerms` expansion strings ever
    * reach the driver (model-sized, the kmeans-centroid bound — BM25
    * needs literal terms to prune the postings before the shuffle). */
  def prfExpandedTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      fbDocs: Int = 10,
      fbTerms: Int = 5
  ): DataFrame = {
    require(fbDocs >= 1, s"fbDocs must be >= 1, got $fbDocs")
    require(fbTerms >= 1, s"fbTerms must be >= 1, got $fbTerms")
    val fb = TextOps.bm25TopK(docs, idCol, textCol, terms, fbDocs)
      .select(col("id"))
    val expansion = docs
      .join(fb, col(idCol) === col("id"))
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .filter(!col("token").isInCollection(terms))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token").asc)
      .limit(fbTerms)
      .collect().map(_.getString(0)).toSeq
    TextOps.bm25TopK(docs, idCol, textCol, terms ++ expansion, k)
  }

  /** [[prfExpandedTopK]] for a QUERY TABLE (integral query ids): both BM25
    * rounds run as [[bm25TopKBatch]] (one corpus scan each for ALL
    * queries), the per-query feedback-token counts are one keyed
    * aggregate over the N·fbDocs feedback docs, and only the N·fbTerms
    * expansion strings reach the driver (the query table is model-sized
    * by contract, so collecting it to splice the expansions is the
    * BPE/centroid bound, not a row-level collect). Per-query results are
    * row-identical to [[prfExpandedTopK]] with that query's terms.
    * Returns (query_id, id, bm25, n_matched, bm25_rank). */
  def prfExpandedTopKBatch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      qidCol: String,
      termsCol: String,
      k: Int,
      fbDocs: Int = 10,
      fbTerms: Int = 5
  ): DataFrame = {
    require(fbDocs >= 1, s"fbDocs must be >= 1, got $fbDocs")
    require(fbTerms >= 1, s"fbTerms must be >= 1, got $fbTerms")
    val q = queries.select(col(qidCol).cast("long").as("query_id"),
      col(termsCol).as("__terms"))
    val fb = bm25TopKBatch(docs, idCol, textCol,
        q.select(col("query_id"), col("__terms").as("terms")),
        "query_id", "terms", fbDocs)
      .select(col("query_id"), col("id"))
    val counts = docs
      .join(broadcast(fb), col(idCol) === col("id"))
      .join(broadcast(q), "query_id")
      .select(col("query_id"),
        explode(TextOps.tokens(col(textCol))).as("token"), col("__terms"))
      .filter(!array_contains(col("__terms"), col("token")))
      .groupBy("query_id", "token").agg(count(lit(1)).as("__c"))
    val expansions = perQueryTopK(counts, "query_id", "token", "__c",
        fbTerms, "__r")
      .select("query_id", "token").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(1)).toSeq).toMap
    val expanded = {
      import docs.sparkSession.implicits._
      q.collect()
        .map(r => (r.getLong(0), r.getSeq[String](1).toSeq))
        .map { case (qid, ts) => (qid, ts ++ expansions.getOrElse(qid, Nil)) }
        .toSeq.toDF("query_id", "terms")
    }
    bm25TopKBatch(docs, idCol, textCol, expanded, "query_id", "terms", k)
  }

  /** The greedy MMR selection over a bounded, id-sorted candidate array —
    * shared by [[mmrRerank]] and [[mmrRerankBatch]]. Returns
    * (id, rank from 1, mmr, rel) in pick order. */
  private def greedyMmr(
      cand: Array[(Long, Double, Array[Double])],
      k: Int,
      lambda: Double
  ): Seq[(Long, Int, Double, Double)] = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    val picked = scala.collection.mutable.Set.empty[Long]
    while (selected.length < math.min(k, cand.length)) {
      var best: Option[(Long, Double, Double)] = None
      cand.foreach { case (id, rel, vec) =>
        if (!picked.contains(id)) {
          val maxSim =
            if (picked.isEmpty) 0.0
            else cand.iterator.filter(c => picked.contains(c._1))
              .map(c => cos(vec, c._3)).max
          val mmr = lambda * rel - (1.0 - lambda) * maxSim
          // strict > keeps the LOWEST id on ties (cand is id-sorted)
          if (best.isEmpty || mmr > best.get._2) best = Some((id, mmr, rel))
        }
      }
      val b = best.get
      picked += b._1
      selected += b
    }
    selected.toSeq.zipWithIndex
      .map { case ((id, mmr, rel), i) => (id, i + 1, mmr, rel) }
  }

  /** [[mmrRerank]] for per-query candidate shortlists (integral query and
    * doc ids): the greedy loops run driver-local per query over the
    * BOUNDED shortlists (each ≤ `maxCandidates` — the same refusal), in
    * query-id order; candidate production stays distributed. Returns
    * (query_id, id, mmr_rank, mmr, rel) — per query, exactly
    * [[mmrRerank]]'s rows on that query's shortlist. */
  def mmrRerankBatch(
      candidates: DataFrame,
      qidCol: String,
      idCol: String,
      relCol: String,
      vecCol: String,
      k: Int,
      lambda: Double,
      maxCandidates: Int = 4096
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda > 0.0 && lambda <= 1.0, s"lambda must be in (0, 1], got $lambda")
    // enforce the shortlist bound BEFORE anything reaches the driver (the
    // single-query op's limit(maxCandidates+1) guard, keyed by query): a
    // group-limited rank window caps the collect at N·(maxCandidates+1)
    // rows, so an oversized/unbounded candidate frame refuses instead of
    // OOMing the driver
    val rows = candidates
      .select(col(qidCol).cast("long").as("__qid"),
        col(idCol).cast("long").as("__id"),
        col(relCol).cast("double").as("__rel"), col(vecCol).as("__vec"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__qid")).orderBy(col("__id"))))
      .filter(col("__rn") <= lit(maxCandidates.toLong + 1L)) // long: no Int.MaxValue overflow
      .drop("__rn")
      .collect()
    val byQuery = rows.groupBy(_.getLong(0))
    byQuery.foreach { case (qid, rs) =>
      require(rs.length <= maxCandidates,
        s"mmrRerankBatch: query $qid has > maxCandidates=$maxCandidates " +
          "candidates — cut with a top-k first (the shortlist contract)")
    }
    import candidates.sparkSession.implicits._
    byQuery.toSeq.sortBy(_._1)
      .flatMap { case (qid, rs) =>
        val cand = rs.map(r => (r.getLong(1), r.getDouble(2),
          r.getSeq[Number](3).toArray.map(_.doubleValue))).sortBy(_._1)
        greedyMmr(cand, k, lambda)
          .map { case (id, rank, mmr, rel) => (qid, id, rank, mmr, rel) }
      }
      .toDF(qidCol, idCol, "mmr_rank", "mmr", relCol)
  }

  /** Maximal-Marginal-Relevance re-rank (Carbonell & Goldstein 1998):
    * greedily pick `k` results from a BOUNDED candidate shortlist,
    * trading relevance against redundancy —
    *
    *   mmr(c) = λ·rel(c) − (1−λ)·max_{s ∈ selected} cos(c, s)
    *
    * (the max term is 0 for the first pick, so the seed is the most
    * relevant candidate; ties → lowest id throughout). Returns
    * (id, mmr_rank, mmr, rel) for the k selected rows.
    *
    * Scale shape: greedy MMR is inherently sequential (pick k depends on
    * picks 1..k−1), so a distributed loop would be k driver-dispatched
    * jobs — the measured jobs/sec ceiling (the BPE-merge lesson). The
    * candidate list is shortlist-sized BY CONSTRUCTION (it is the output
    * of a top-k), so the right design is the BPE one: collect the
    * bounded list (refused above `maxCandidates`, the compressNmax
    * guard) and run the greedy loop driver-local; the expensive part —
    * producing the candidates — stays fully distributed. Pairwise
    * cosines accumulate ascending in doubles (the engine/oracle
    * bit-parity convention).
    *
    * Ids must be integral (long-compatible); `lambda` ∈ (0, 1]. */
  def mmrRerank(
      candidates: DataFrame,
      idCol: String,
      relCol: String,
      vecCol: String,
      k: Int,
      lambda: Double,
      maxCandidates: Int = 4096
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda > 0.0 && lambda <= 1.0, s"lambda must be in (0, 1], got $lambda")
    val rows = candidates
      .select(col(idCol).cast("long"), col(relCol).cast("double"), col(vecCol))
      .limit(maxCandidates + 1).collect()
    require(rows.length <= maxCandidates,
      s"mmrRerank candidate list exceeds maxCandidates=$maxCandidates — " +
        "cut it with a top-k first (the shortlist contract)")
    val cand = rows.map { r =>
      (r.getLong(0), r.getDouble(1),
        r.getSeq[Number](2).toArray.map(_.doubleValue))
    }.sortBy(_._1)
    import candidates.sparkSession.implicits._
    greedyMmr(cand, k, lambda).toDF(idCol, "mmr_rank", "mmr", relCol)
  }

  /** Exact per-query top-k via a query-partitioned rank window. The
    * NTILE-cliff rule does NOT bite here even when the per-query candidate
    * set is corpus-sized: because the rank is immediately filtered to
    * ≤ k, Spark plans a PARTIAL `WindowGroupLimit` on the map side — each
    * upstream partition keeps only its own top k per query (a bounded
    * heap-style cut) BEFORE the exchange, so the final per-query sort sees
    * ≤ k·num_upstream_partitions rows, never the corpus. The spec pins
    * this shape (`RetrievalSpec`: partial+final WindowGroupLimit, no
    * rangepartitioning). Requires k ≤
    * `spark.sql.window.group.limit.threshold` (default 1000) — above
    * that, cut candidates upstream first. Ordering: score desc, id asc
    * (the [[Similarity.knnJoinBrute]] tie rule). */
  private def perQueryTopK(
      df: DataFrame,
      qidCol: String,
      idCol: String,
      scoreCol: String,
      k: Int,
      rankName: String
  ): DataFrame = {
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    df.withColumn(rankName, row_number().over(w))
      .filter(col(rankName) <= k)
  }

  /** Batch Okapi BM25: score N queries against the corpus in ONE corpus
    * scan. `queries` is a (query-id, term-array) table — model-sized by
    * contract, like k-means centroids: the distinct term union reaches the
    * driver so postings prune BEFORE any shuffle (BM25 needs the term set
    * at plan-build time; a retrieval eval ships thousands of queries, not
    * millions). Returns (query_id, id, bm25, n_matched, bm25_rank) with
    * per-query top `k`, ties → lowest id — per-query results are
    * row-identical to [[TextOps.bm25TopK]] run with that query's terms
    * (df/idf/avgdl are per-token/corpus stats, unchanged by the union).
    * A query whose term array is empty (or whose terms match no
    * document) contributes no output rows — the batch analogue of the
    * single-query empty result, not an error.
    *
    * Scale shape: one corpus scan into the staged pruned-postings base
    * (id, dl, matched-terms — the [[TextOps.bm25TopK]] shape with an
    * `InSet` term filter); corpus stats and per-token df broadcast;
    * query fan-out happens AFTER per-(doc, token) scoring via a broadcast
    * join against the (query, token) table, so the corpus never scans or
    * shuffles per query; per-query top-k via the group-limited rank
    * window (map-side partial cut — no corpus-global sort, no
    * corpus-sized final sort partition). */
  def bm25TopKBatch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      qidCol: String,
      termsCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(k > 0, s"top-k must be positive, got $k")
    val qterms = queries
      .select(col(qidCol).as("query_id"), explode(col(termsCol)).as("token"))
      .distinct()
    // an all-empty batch (every term array empty, or an empty query
    // table) is the documented no-output case, not an error: the empty
    // termSet makes `isInCollection` a constant-false filter, the
    // postings and (query, token) tables come out empty, and the plan
    // yields zero rows with the contract schema
    val termSet = qterms.select("token").distinct()
      .collect().map(_.getString(0)).toSeq
    val base = docs
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("__t"))
      .select(
        col("id"),
        size(col("__t")).cast("double").as("dl"),
        filter(col("__t"), t => t.isInCollection(termSet)).as("qt"))
      .staged
    val lens = base.select(col("id"), col("dl"))
    val stats = base.agg(
      count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl"))
    val posts = base
      .select(col("id"), explode(col("qt")).as("token"))
      .groupBy("id", "token")
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfc = posts.groupBy("token")
      .agg(count(lit(1)).cast("double").as("df"))
    val perQuery = posts
      .join(broadcast(dfc), "token")
      .join(lens, "id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("contrib",
        col("idf") * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .join(broadcast(qterms), "token")
      .groupBy("query_id", "id")
      .agg(sum(col("contrib")).as("bm25"), count(lit(1)).as("n_matched"))
    perQueryTopK(perQuery, "query_id", "id", "bm25", k, "bm25_rank")
      .select("query_id", "id", "bm25", "n_matched", "bm25_rank")
  }

  /** Batch hybrid retrieval: BM25 ⊕ embedding-cosine for N queries in one
    * pass each. `queries` carries (query-id, term-array, query-vector);
    * returns (query_id, id, lex_rank, sem_rank, rrf) — per-query RRF top
    * `k`, null rank = absent from that branch's candidate list, the
    * [[hybridTopK]] contract keyed by query.
    *
    * Scale shape: the lexical branch is [[bm25TopKBatch]] (one corpus
    * scan for all queries); the semantic branch broadcasts the N query
    * vectors against the nonzero-norm corpus — one corpus scan computing
    * N cosines per row — with per-query candidates cut by the sharded
    * two-phase top-k (no corpus-sized window partition). Pass
    * `semCandidates` (query_id, id, sem_rank; ranks from 1) to source the
    * semantic branch from a persisted ANN index instead
    * ([[graft.pipeline.VectorIndex]] / [[Similarity.ivfTopK]] renamed to
    * the same columns) — the fusion plan downstream is identical, and the
    * exact scan never runs. */
  def hybridTopKBatch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      qidCol: String,
      termsCol: String,
      qvecCol: String,
      emb: DataFrame,
      embIdCol: String,
      vecCol: String,
      k: Int,
      candidateK: Int = 60,
      rrfK: Int = 60,
      semCandidates: Option[DataFrame] = None
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(candidateK >= k, s"candidateK ($candidateK) must be >= k ($k)")
    require(rrfK >= 1, s"rrfK must be >= 1, got $rrfK")
    val lex = bm25TopKBatch(docs, idCol, textCol,
        queries.select(col(qidCol).as("query_id"), col(termsCol).as("terms")),
        "query_id", "terms", candidateK)
      .select(col("query_id"), col("id"), col("bm25_rank").as("lex_rank"))
    val sem = semCandidates.getOrElse {
      val qv = broadcast(
        queries.select(col(qidCol).as("query_id"), col(qvecCol).as("qvec")))
      val scored = emb
        .filter(graft.functions.VectorExprs
          .dotProduct(col(vecCol), col(vecCol)) > 0)
        .select(col(embIdCol).as("id"), col(vecCol).as("vec"))
        .crossJoin(qv)
        .select(col("query_id"), col("id"),
          Similarity.cosine(col("vec"), col("qvec")).as("__cos"))
      perQueryTopK(scored, "query_id", "id", "__cos", candidateK,
        "sem_rank")
    }.select(col("query_id"), col("id"), col("sem_rank"))
    val fused = lex.join(sem, Seq("query_id", "id"), "full_outer")
      .select(col("query_id"), col("id"), col("lex_rank"), col("sem_rank"),
        (coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("sem_rank")), lit(0.0)))
          .as("rrf"))
    // fusion input is ≤ 2·candidateK rows per query already — a plain
    // per-query window is bounded; rank then cut to k
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("id").asc)
    fused.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .select("query_id", "id", "lex_rank", "sem_rank", "rrf")
  }

  /** BM25 ⊕ embedding-cosine hybrid top-k for ONE query (`terms` +
    * `queryVec` are two views of the same information need). Returns
    * (id, lex_rank, sem_rank, rrf) — null rank = absent from that
    * branch's candidate list — ordered by (rrf desc, id), top `k`.
    *
    * Ties break by id in both branch rankings and in the fusion (the
    * [[Similarity.knnJoinBrute]] rule); zero-norm corpus vectors are
    * excluded from the semantic branch (cosine undefined). */
  def hybridTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      emb: DataFrame,
      embIdCol: String,
      vecCol: String,
      queryVec: Array[Double],
      k: Int,
      candidateK: Int = 60,
      rrfK: Int = 60
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(candidateK >= k, s"candidateK ($candidateK) must be >= k ($k)")
    require(rrfK >= 1, s"rrfK must be >= 1, got $rrfK")
    require(queryVec.exists(_ != 0.0), "query vector must be nonzero")
    val lex = TextOps.bm25TopK(docs, idCol, textCol, terms, candidateK)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("bm25").desc, col("id").asc)))
      .select(col("id"), col("lex_rank"))
    val qv = array(queryVec.toIndexedSeq.map(lit(_)): _*)
    val sem = emb
      .filter(graft.functions.VectorExprs
        .dotProduct(col(vecCol), col(vecCol)) > 0)
      .select(col(embIdCol).as("id"),
        Similarity.cosine(col(vecCol), qv).as("__cos"))
      .orderBy(col("__cos").desc, col("id").asc)
      .limit(candidateK)
      .withColumn("sem_rank", row_number().over(
        Window.orderBy(col("__cos").desc, col("id").asc)))
      .select(col("id"), col("sem_rank"))
    lex.join(sem, Seq("id"), "full_outer")
      .select(col("id"), col("lex_rank"), col("sem_rank"),
        (coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("sem_rank")), lit(0.0)))
          .as("rrf"))
      .orderBy(col("rrf").desc, col("id").asc)
      .limit(k)
  }
}
