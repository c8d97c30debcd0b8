package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Retrieval, Similarity}

/** Hybrid retrieval (RRF fusion) and the centroid-silhouette eval:
  * hand-computed ranks/scores on tiny geometry, plus the scale contracts
  * (TakeOrdered branches, no corpus-sized window). */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  test("rrfFuse: hand-computed reciprocal-rank sums, absent ids contribute 0") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val b = Seq((2L, 1), (4L, 2)).toDF("id", "rank")
    val fused = Retrieval.rrfFuse(Seq(a, b), "id", "rank", k = 10, rrfK = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val byId = fused.map(t => t._1 -> t).toMap
    // id 2 is in both lists: 1/62 + 1/61
    assert(math.abs(byId(2L)._2 - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(byId(2L)._3 === 2L)
    assert(math.abs(byId(1L)._2 - 1.0 / 61) < 1e-15)
    assert(byId(1L)._3 === 1L)
    // full order: 2 (both), then 1 (1/61) > 4 (1/62) > 3 (1/63)
    assert(fused.map(_._1).toSeq === Seq(2L, 1L, 4L, 3L))
    // k truncates
    assert(Retrieval.rrfFuse(Seq(a, b), "id", "rank", k = 2).count() === 2L)
  }

  test("rrfFuseKeyed: per-query reciprocal-rank sums, queries never mix") {
    val a = Seq((0L, 1L, 1), (0L, 2L, 2), (1L, 1L, 1)).toDF("q", "id", "rank")
    val b = Seq((0L, 2L, 1), (1L, 9L, 1)).toDF("q", "id", "rank")
    val got = Retrieval.rrfFuseKeyed(Seq(a, b), "q", "id", "rank", k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    // query 0: id 2 in both lists (ranks 2 and 1); id 1 only in a
    assert(math.abs(got((0L, 2L))._1 - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(got((0L, 2L))._2 === 2L)
    assert(math.abs(got((0L, 1L))._1 - 1.0 / 61) < 1e-15)
    // query 1 sees ONLY its own rows: id 1 rank 1 from a, id 9 from b —
    // query 0's id-2 evidence must not leak in
    assert(math.abs(got((1L, 1L))._1 - 1.0 / 61) < 1e-15)
    assert(math.abs(got((1L, 9L))._1 - 1.0 / 61) < 1e-15)
    assert(!got.contains((1L, 2L)))
    // per-query k cut
    val cut = Retrieval.rrfFuseKeyed(Seq(a, b), "q", "id", "rank", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cut.length === 2 && cut.toMap.apply(0L) === 2L)
  }

  test("hybridTopK: doc in both branches outranks single-branch docs; ranks hand-checked") {
    val docs = Seq(
      (1L, "vector join stream hash vector"), // lexical hit
      (2L, "vector database search"),         // lexical hit, fewer terms
      (3L, "nothing relevant here"),
      (4L, "hash hash hash join join stream vector") // strongest lexical
    ).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),  // = query direction
      (2L, Array(0.0f, 1.0f)),  // orthogonal
      (3L, Array(0.9f, 0.1f)),  // near query
      (4L, Array(-1.0f, 0.0f))  // opposite
    ).toDF("vec_id", "embedding")
    val got = Retrieval.hybridTopK(docs, "doc_id", "text",
        Seq("hash", "join", "stream", "vector"),
        emb, "vec_id", "embedding", Array(1.0, 0.0),
        k = 4, candidateK = 4, rrfK = 60)
      .collect()
    val byId = got.map(r => r.getLong(0) ->
      (Option(r.get(1)).map(_.asInstanceOf[Int]),
        Option(r.get(2)).map(_.asInstanceOf[Int]), r.getDouble(3))).toMap
    // semantic ranks: cos(1)=1 > cos(3)=.9939 > cos(2)=0 > cos(4)=-1
    assert(byId(1L)._2 === Some(1))
    assert(byId(3L)._2 === Some(2))
    // doc 3 has no query terms -> no lexical rank
    assert(byId(3L)._1 === None)
    // doc 1 is strong in BOTH branches: it must outrank doc 4 (lexical
    // top but semantically last) and doc 3 (semantic 2nd but no lexical)
    assert(byId(1L)._3 > byId(4L)._3)
    assert(byId(1L)._3 > byId(3L)._3)
    // rrf is exactly the reciprocal-rank sum of its branch ranks
    val expect1 = 1.0 / (60 + byId(1L)._1.get) + 1.0 / (60 + byId(1L)._2.get)
    assert(math.abs(byId(1L)._3 - expect1) < 1e-15)
  }

  test("hybridTopK branches are TakeOrdered (no global sort of the corpus)") {
    val docs = sf("sf0.001", "documents")
    val emb = sf("sf0.001", "embeddings")
    val qv = Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0)
    val out = Retrieval.hybridTopK(docs, "doc_id", "text",
      Seq("hash", "join"), emb, "vec_id", "embedding", qv, k = 5,
      candidateK = 10)
    val plan = out.queryExecution.executedPlan.toString
    // both candidate cuts must be per-partition heaps, not global sorts
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(out.count() <= 5)
  }

  test("bm25TopKBatch: per-query rows identical to single-query bm25TopK") {
    val docs = sf("sf0.001", "documents")
    val queries = Seq(
      (0L, Seq("hash", "join")),
      (1L, Seq("stream", "vector")),
      (2L, Seq("hash", "vector", "stream"))).toDF("query_id", "terms")
    val batch = Retrieval.bm25TopKBatch(docs, "doc_id", "text",
        queries, "query_id", "terms", k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .groupBy(_._1)
    for ((qid, terms) <- Seq(0L -> Seq("hash", "join"),
        1L -> Seq("stream", "vector"),
        2L -> Seq("hash", "vector", "stream"))) {
      val single = graft.pipeline.TextOps
        .bm25TopK(docs, "doc_id", "text", terms, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      val got = batch(qid).sortBy(t => (-t._3, t._2))
        .map(t => (t._2, t._3, t._4)).toSeq
      assert(got.map(_._1) === single.map(_._1).toSeq, s"query $qid ids")
      got.zip(single).foreach { case (g, s) =>
        assert(math.abs(g._2 - s._2) < 1e-12, s"query $qid bm25")
        assert(g._3 === s._3, s"query $qid n_matched")
      }
    }
  }

  test("bm25TopKBatch plan: one staged corpus scan, group-limited window, no global sort") {
    val docs = sf("sf0.001", "documents")
    val queries = Seq(
      (0L, Seq("hash", "join")),
      (1L, Seq("stream", "vector"))).toDF("query_id", "terms")
    val out = Retrieval.bm25TopKBatch(docs, "doc_id", "text",
      queries, "query_id", "terms", k = 5)
    val plan = out.queryExecution.executedPlan.toString
    // corpus flows from the ONE staged pruned-postings base — the
    // documents parquet is never re-scanned downstream of it
    assert(!plan.contains("Scan parquet"), plan.take(3000))
    // no global sort anywhere: the final orderBy is absent, candidate
    // cuts are rank windows, fusion keys hash-partition
    assert(!plan.contains("rangepartitioning"), plan.take(3000))
    // the rank-filter top-k must plan as partial+final WindowGroupLimit:
    // the map side cuts each upstream partition to its own top k BEFORE
    // the exchange, so no corpus-sized partition is ever sorted (the
    // perQueryTopK contract)
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
    assert(plan.contains("Partial"), plan.take(3000))
  }

  test("hybridTopKBatch: per-query rows match hybridTopK; semCandidates override is used") {
    val docs = sf("sf0.001", "documents")
    val emb = sf("sf0.001", "embeddings")
    val qv = emb.filter(col("vec_id") < 2L)
      .select("vec_id", "embedding").orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Number](1).toArray.map(_.doubleValue)))
    val terms = Map(0L -> Seq("hash", "join"), 1L -> Seq("stream", "vector"))
    val queries = qv.toSeq
      .map { case (qid, v) => (qid, terms(qid), v.toSeq) }
      .toDF("query_id", "terms", "qvec")
    val batch = Retrieval.hybridTopKBatch(docs, "doc_id", "text",
        queries, "query_id", "terms", "qvec",
        emb, "vec_id", "embedding", k = 8, candidateK = 12)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)),
        Option(r.get(3)), r.getDouble(4)))
      .groupBy(_._1)
    for ((qid, v) <- qv) {
      val single = Retrieval.hybridTopK(docs, "doc_id", "text", terms(qid),
          emb, "vec_id", "embedding", v, k = 8, candidateK = 12)
        .collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
          r.getDouble(3)))
        .sortBy(_._1)
      val got = batch(qid).map(t => (t._2, t._3, t._4, t._5)).sortBy(_._1).toSeq
      assert(got === single.toSeq, s"query $qid")
    }
    // a pre-ranked semantic list (e.g. from the persisted IVF index)
    // replaces the exact scan: fusion must consume it verbatim
    val semPre = Seq((0L, 42L, 1), (1L, 43L, 1)).toDF("query_id", "id", "sem_rank")
    val fused = Retrieval.hybridTopKBatch(docs, "doc_id", "text",
        queries, "query_id", "terms", "qvec",
        emb, "vec_id", "embedding", k = 8, candidateK = 12,
        semCandidates = Some(semPre))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(3))))
    assert(fused.filter(_._3.isDefined).map(t => (t._1, t._2)).toSet ===
      Set((0L, 42L), (1L, 43L)))
  }

  test("hybridTopKBatch over the persisted IVF index: pruned scan serves the semantic branch") {
    val docs = sf("sf0.001", "documents")
    val emb = sf("sf0.001", "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("vindex-hybrid").toString
    graft.pipeline.VectorIndex.build(emb, "vec_id", "embedding", dir,
      k = 8, iters = 2)
    val qv = emb.filter(col("vec_id") < 2L)
      .select("vec_id", "embedding").orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Number](1).toArray.map(_.doubleValue)))
    val terms = Map(0L -> Seq("hash", "join"), 1L -> Seq("stream", "vector"))
    val queries = qv.toSeq
      .map { case (qid, v) => (qid, terms(qid), v.toSeq) }
      .toDF("query_id", "terms", "qvec")
    // semantic candidates come from the INDEX: only probed cell
    // directories are read, and the fusion consumes the index ranks
    val sem = graft.pipeline.VectorIndex.topK(spark, dir,
        emb.filter(col("vec_id") < 2L), "vec_id", "embedding",
        k = 12, nprobe = 3)
      .select(col("query_id"), col("neighbor_id").as("id"),
        col("rank").as("sem_rank"))
    val fused = Retrieval.hybridTopKBatch(docs, "doc_id", "text",
      queries, "query_id", "terms", "qvec",
      emb, "vec_id", "embedding", k = 10, candidateK = 12,
      semCandidates = Some(sem))
    // the composed plan still carries the index's partition pruning
    val plan = fused.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition filter in composed plan:\n${plan.take(2000)}")
    // sem_rank in the fused output IS the index rank, and rrf is the
    // reciprocal-rank sum of the two branch ranks
    val semRanks = sem.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val rows = fused.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val qid = r.getLong(0); val id = r.getLong(1)
      val lex = Option(r.get(2)).map(_.asInstanceOf[Int])
      val s = Option(r.get(3)).map(_.asInstanceOf[Int])
      s.foreach(sr => assert(semRanks((qid, id)) === sr, s"($qid,$id)"))
      val expect = lex.map(v => 1.0 / (60 + v)).getOrElse(0.0) +
        s.map(v => 1.0 / (60 + v)).getOrElse(0.0)
      assert(math.abs(r.getDouble(4) - expect) < 1e-15)
    }
  }

  test("prfExpandedTopKBatch: per-query rows identical to single-query PRF") {
    val docs = sf("sf0.001", "documents")
    val terms = Seq(0L -> Seq("hash", "join"), 1L -> Seq("stream", "vector"))
    val queries = terms.toDF("query_id", "terms")
    val batch = Retrieval.prfExpandedTopKBatch(docs, "doc_id", "text",
        queries, "query_id", "terms", k = 8, fbDocs = 4, fbTerms = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .groupBy(_._1)
    for ((qid, ts) <- terms) {
      val single = Retrieval.prfExpandedTopK(docs, "doc_id", "text", ts,
          k = 8, fbDocs = 4, fbTerms = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      val got = batch(qid).sortBy(t => (-t._3, t._2))
        .map(t => (t._2, t._3, t._4)).toSeq
      assert(got.map(_._1) === single.map(_._1).toSeq, s"query $qid ids")
      got.zip(single).foreach { case (g, s) =>
        assert(math.abs(g._2 - s._2) < 1e-12, s"query $qid bm25")
        assert(g._3 === s._3, s"query $qid n_matched")
      }
    }
  }

  test("mmrRerankBatch: per-query picks identical to mmrRerank; per-query bound enforced") {
    val cand = Seq(
      (0L, 1L, 1.0, Array(1.0f, 0.0f)),
      (0L, 2L, 0.990, Array(0.99f, 0.141f)),
      (0L, 3L, 0.6, Array(0.6f, 0.8f)),
      (1L, 1L, 0.5, Array(1.0f, 0.0f)),   // same ids, different query:
      (1L, 7L, 0.9, Array(0.0f, 1.0f))    // rankings must not leak
    ).toDF("q", "id", "rel", "vec")
    val batch = Retrieval.mmrRerankBatch(cand, "q", "id", "rel", "vec",
        k = 3, lambda = 0.3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .groupBy(_._1)
    for (qid <- Seq(0L, 1L)) {
      val single = Retrieval.mmrRerank(cand.filter(col("q") === qid),
          "id", "rel", "vec", k = 3, lambda = 0.3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      val got = batch(qid).sortBy(_._3).map(t => (t._2, t._3, t._4))
      assert(got.toSeq === single.sortBy(_._2).toSeq, s"query $qid")
    }
    // the near-dup demotion inside query 0 (the mmrRerank geometry)
    assert(batch(0L).sortBy(_._3).map(_._2).toSeq === Seq(1L, 3L, 2L))
    intercept[IllegalArgumentException] {
      Retrieval.mmrRerankBatch(cand, "q", "id", "rel", "vec", 2, 0.5,
        maxCandidates = 2)
    }
    // maxCandidates = Int.MaxValue disables the bound — the +1 cap must
    // not overflow Int and silently return an empty frame
    assert(Retrieval.mmrRerankBatch(cand, "q", "id", "rel", "vec",
      k = 3, lambda = 0.3, maxCandidates = Int.MaxValue).count() > 0)
  }

  test("mmrRerankBatch: oversized candidate frame refuses WITHOUT collecting it") {
    // 200k candidates on one query: the group-limited rank window must
    // cap what reaches the driver at maxCandidates+1 rows per query, so
    // the refusal fires without materializing the frame driver-side
    val big = spark.range(200000L).select(
      lit(0L).as("q"), col("id"),
      (col("id") % 97).cast("double").as("rel"),
      array(lit(1.0f), lit(0.0f)).as("vec"))
    val ex = intercept[IllegalArgumentException] {
      Retrieval.mmrRerankBatch(big, "q", "id", "rel", "vec",
        k = 2, lambda = 0.5, maxCandidates = 8)
    }
    assert(ex.getMessage.contains("maxCandidates"))
  }

  test("bm25TopKBatch: all-empty term batch yields zero rows, contract schema, no error") {
    val docs = sf("sf0.001", "documents")
    val queries = Seq(
      (0L, Seq.empty[String]),
      (1L, Seq.empty[String])).toDF("query_id", "terms")
    val out = Retrieval.bm25TopKBatch(docs, "doc_id", "text",
      queries, "query_id", "terms", k = 5)
    assert(out.columns.toSeq ===
      Seq("query_id", "id", "bm25", "n_matched", "bm25_rank"))
    assert(out.count() === 0L)
    // empty query TABLE too
    assert(Retrieval.bm25TopKBatch(docs, "doc_id", "text",
      queries.limit(0), "query_id", "terms", k = 5).count() === 0L)
  }

  test("prfExpandedTopK: feedback terms retrieve docs the raw query misses") {
    val docs = Seq(
      (1L, "apple banana banana"),
      (2L, "apple cherry banana"),
      (3L, "banana cherry date"), // no query term at all
      (4L, "unrelated words only")
    ).toDF("doc_id", "text")
    val plain = graft.pipeline.TextOps
      .bm25TopK(docs, "doc_id", "text", Seq("apple"), 4)
      .collect().map(_.getLong(0)).toSet
    assert(plain === Set(1L, 2L)) // only literal matches
    val expanded = graft.pipeline.Retrieval
      .prfExpandedTopK(docs, "doc_id", "text", Seq("apple"), k = 4,
        fbDocs = 2, fbTerms = 2)
      .collect().map(_.getLong(0)).toSet
    // feedback set {1,2} surfaces banana/cherry; doc 3 now retrieves
    assert(expanded.contains(3L))
    assert(!expanded.contains(4L))
    intercept[IllegalArgumentException] {
      graft.pipeline.Retrieval.prfExpandedTopK(docs, "doc_id", "text",
        Seq("apple"), 4, fbDocs = 0)
    }
  }

  test("mmrRerank: diversification demotes near-duplicates; lambda=1 is pure relevance") {
    // query direction (1,0): a = exact hit, b = near-duplicate of a with
    // slightly lower relevance, c = diverse mid-relevance candidate
    val cand = Seq(
      (1L, 1.0, Array(1.0f, 0.0f)),      // a: rel 1.0
      (2L, 0.990, Array(0.99f, 0.141f)), // b: rel ~.99, cos(a,b) ~.99
      (3L, 0.6, Array(0.6f, 0.8f))       // c: rel .6, cos(a,c) = .6
    ).toDF("id", "rel", "vec")
    val diverse = graft.pipeline.Retrieval
      .mmrRerank(cand, "id", "rel", "vec", k = 3, lambda = 0.3)
      .collect().map(_.getLong(0)).toSeq
    // at lambda=0.3 redundancy dominates: the near-dup b drops to last
    assert(diverse === Seq(1L, 3L, 2L))
    val pure = graft.pipeline.Retrieval
      .mmrRerank(cand, "id", "rel", "vec", k = 3, lambda = 1.0)
      .collect().map(_.getLong(0)).toSeq
    assert(pure === Seq(1L, 2L, 3L))
    // k beyond the list returns everything; ranks are 1..n
    val all = graft.pipeline.Retrieval
      .mmrRerank(cand, "id", "rel", "vec", k = 10, lambda = 0.5)
      .collect()
    assert(all.map(_.getInt(1)).toSeq === Seq(1, 2, 3))
    // validation: lambda range and the shortlist bound
    intercept[IllegalArgumentException] {
      graft.pipeline.Retrieval.mmrRerank(cand, "id", "rel", "vec", 2, 0.0)
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.Retrieval.mmrRerank(cand, "id", "rel", "vec", 2, 0.5,
        maxCandidates = 2)
    }
  }

  test("silhouette: points on centroids score 1, boundary point scores 0") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val emb = Seq(
      (0L, Array(2.0f, 0.0f)),   // exactly centroid 0's direction: s = 1
      (1L, Array(0.0f, 3.0f)),   // exactly centroid 1's direction: s = 1
      (2L, Array(1.0f, 1.0f)),   // equidistant boundary: m1 = m2 -> s = 0
      (3L, Array(0.0f, 0.0f))    // zero norm: excluded
    ).toDF("vec_id", "embedding")
    val got = Similarity.silhouette(emb, "vec_id", "embedding", cents)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // cell 0: point 0 (s=1) and point 2 (tie -> lowest index cell 0, s=0)
    assert(got(0)._1 === 2L)
    assert(math.abs(got(0)._2 - 0.5) < 1e-12)
    assert(got(1)._1 === 1L)
    assert(math.abs(got(1)._2 - 1.0) < 1e-12)
    // zero-norm vector contributed nowhere
    assert(got.values.map(_._1).sum === 3L)
  }

  test("silhouette: separated clusters score high, validation fires") {
    val cents = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    val emb = Seq(
      (0L, Array(1.0f, 0.05f, 0f, 0f)), (1L, Array(0.9f, 0.0f, 0.05f, 0f)),
      (2L, Array(0.05f, 1.0f, 0f, 0f)), (3L, Array(0.0f, 1.1f, 0f, 0.05f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.silhouette(emb, "vec_id", "embedding", cents)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(got(0) > 0.9 && got(1) > 0.9)
    intercept[IllegalArgumentException] {
      Similarity.silhouette(emb, "vec_id", "embedding", Array(Array(1.0)))
    }
    intercept[IllegalArgumentException] {
      Similarity.silhouette(emb, "vec_id", "embedding",
        Array(Array(1.0, 0.0), Array(0.0, 0.0)))
    }
  }
}
