package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExprs
import graft.pipeline.Similarity

/** kNN self-join (all-pairs top-k similarity graph): the brute baseline
  * pins exact neighbor sets on hand geometry; the IVF-blocked scale path
  * must equal brute whenever blocking is exhaustive (one cell, or
  * nprobe = nCentroids), and recover cluster-mates on separated clusters.
  * NearestCells (the corpus-side probe primitive) is pinned against the
  * window spelling it replaces. */
class KnnJoinSpec extends SparkTestBase {
  import spark.implicits._

  // three well-separated direction clusters in 4-d, 3 members each
  private def clustered = Seq(
    (0L, Array(1.0f, 0.01f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.02f, 0.0f, 0.0f)),
    (2L, Array(1.1f, 0.0f, 0.01f, 0.0f)),
    (10L, Array(0.0f, 1.0f, 0.01f, 0.0f)),
    (11L, Array(0.01f, 0.9f, 0.0f, 0.0f)),
    (12L, Array(0.0f, 1.1f, 0.0f, 0.01f)),
    (20L, Array(0.0f, 0.01f, 1.0f, 0.0f)),
    (21L, Array(0.0f, 0.0f, 0.9f, 0.01f)),
    (22L, Array(0.01f, 0.0f, 1.1f, 0.0f))
  ).toDF("id", "vec")

  test("brute self-join: every row a query, exact ranks on hand geometry") {
    // shape: every query appears exactly k times
    val byQuery = Similarity.knnJoinBrute(clustered, "id", "vec", 2).collect()
      .groupBy(_.getLong(0))
    assert(byQuery.keySet === Set(0L, 1L, 2L, 10L, 11L, 12L, 20L, 21L, 22L))
    byQuery.values.foreach(rows => assert(rows.length === 2))
    // each query's 2 neighbors are its own cluster-mates
    byQuery.foreach { case (q, rows) =>
      val mates = rows.map(_.getLong(1)).toSet
      val cluster = (q / 10) * 10
      assert(mates === Set(cluster, cluster + 1, cluster + 2) - q,
        s"query $q got $mates")
    }
  }

  test("blocked with exhaustive probing equals brute exactly") {
    val brute = Similarity.knnJoinBrute(clustered, "id", "vec", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    // nprobe = nCentroids ⇒ every cell probed ⇒ candidate set is the corpus
    val blocked = Similarity.knnJoin(clustered, "id", "vec", 3,
      nCentroids = 4, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    assert(blocked === brute)
  }

  test("blocked with trained centroids recovers within-cluster neighbors") {
    val cents = Array(
      Array(1.0, 0.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0, 0.0),
      Array(0.0, 0.0, 1.0, 0.0))
    val got = Similarity.knnJoin(clustered, "id", "vec", 2,
      nprobe = 1, trainedCentroids = Some(cents)).collect()
    val byQuery = got.groupBy(_.getLong(0))
    byQuery.foreach { case (q, rows) =>
      val cluster = (q / 10) * 10
      assert(rows.map(_.getLong(1)).toSet ===
        Set(cluster, cluster + 1, cluster + 2) - q)
    }
    assert(byQuery.size === 9)
  }

  test("maxCellSize valve drops oversized cells from the candidate side") {
    // one centroid pulls everything into cell 0 ⇒ valve at 5 excludes it;
    // no candidates anywhere, result is empty — degraded, never exploded
    val cents = Array(Array(1.0, 1.0, 1.0, 1.0))
    val valved = Similarity.knnJoin(clustered, "id", "vec", 2,
      nprobe = 1, trainedCentroids = Some(cents), maxCellSize = Some(5L))
    assert(valved.count() === 0L)
    val open = Similarity.knnJoin(clustered, "id", "vec", 2,
      nprobe = 1, trainedCentroids = Some(cents))
    assert(open.count() === 18L) // 9 queries × k=2 within the single cell
  }

  test("NearestCells matches the row_number window spelling it replaces") {
    val rng = new scala.util.Random(11)
    val cents = Array.fill(7)(Array.fill(8)(rng.nextDouble() - 0.5))
    val vecs = (0L until 40L).map(i => (i, Array.fill(8)(rng.nextFloat() - 0.5f)))
    val df = vecs.toDF("id", "vec")
    val native = df.select(col("id"),
      VectorExprs.nearestCells(col("vec"), cents, 3).as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    // window twin: n·k scored rows, rank, take 3
    val centDf = cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq.toDF("cid", "cvec")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("cos").desc, col("cid").asc)
    val twin = df.crossJoin(centDf)
      .select(col("id"), col("cid"), Similarity.cosine(col("vec"), col("cvec")).as("cos"))
      .withColumn("r", row_number().over(w)).filter(col("r") <= 3)
      .orderBy("id", "r")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.sortBy(_.getInt(3)).map(_.getInt(1)).toList }
    assert(native === twin)
  }

  test("zero-norm vectors are excluded from both sides; blocked still equals brute") {
    val withZero = clustered.unionByName(
      Seq((99L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "vec"))
    val brute = Similarity.knnJoinBrute(withZero, "id", "vec", 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    // the zero vector appears neither as query nor as neighbor, and no
    // row carries a null/NaN cosine
    assert(!brute.exists(t => t._1 == 99L || t._2 == 99L))
    assert(brute.forall(t => !t._3.isNaN))
    assert(brute.map(_._1).distinct.length === 9)
    val blocked = Similarity.knnJoin(withZero, "id", "vec", 3,
      nCentroids = 4, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    assert(blocked === brute)
  }

  // same three direction clusters but every 2-dim PQ block has mass
  // (an all-zero block slice would make a zero-norm initial codeword,
  // which kmeans refuses by contract)
  private def pqClustered = Seq(
    (0L, Array(1.0f, 0.05f, 0.04f, 0.03f)),
    (1L, Array(0.9f, 0.06f, 0.03f, 0.04f)),
    (2L, Array(1.1f, 0.04f, 0.05f, 0.02f)),
    (10L, Array(0.05f, 1.0f, 0.03f, 0.05f)),
    (11L, Array(0.06f, 0.9f, 0.04f, 0.03f)),
    (12L, Array(0.04f, 1.1f, 0.05f, 0.04f)),
    (20L, Array(0.03f, 0.05f, 1.0f, 0.9f)),
    (21L, Array(0.04f, 0.03f, 0.9f, 1.0f)),
    (22L, Array(0.05f, 0.04f, 1.1f, 0.95f))
  ).toDF("id", "vec")

  test("recall recipe rows hold on the fixture corpus (C/2 and 5C/8 scan)") {
    // the knnJoin scaladoc's recipe table, pinned on the sf0.001 driver
    // embeddings (500 × 64f, weakly clustered — the data the recipe was
    // measured on at sf0.1). Deterministic: k-means seeds from the k
    // lowest ids, ties break by id everywhere.
    val emb = sf("sf0.001", "embeddings")
    val k = 10
    val cells = 16
    val (_, cents) = Similarity.kmeans(emb, "vec_id", "embedding",
      cells, iters = 2, dim = 64)
    val truth = Similarity.knnJoinBrute(emb, "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"))
    val tot = truth.count()
    def recallAt(nprobe: Int): Double = {
      val approx = Similarity.knnJoin(emb, "vec_id", "embedding", k,
        nCentroids = cells, nprobe = nprobe, trainedCentroids = Some(cents))
        .select(col("query_id"), col("neighbor_id"))
      truth.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
        .count().toDouble / tot
    }
    // recipe: nprobe = C/2 → recall@10 ≥ 0.85; 5C/8 → ≥ 0.93 at sf0.1
    // (2k vectors, C=64). The 500-vector fixture with C=16 measures a
    // notch lower (0.877 at 62.5 % — fewer cells, coarser structure);
    // floors sit under the FIXTURE values. Everything is deterministic
    // (lowest-id k-means seed, id tie-breaks), so a drop below a floor
    // means the blocking or centroid train broke, not noise.
    assert(recallAt(cells / 2) >= 0.78, s"recall at 50% scan")
    assert(recallAt(5 * cells / 8) >= 0.85, s"recall at 62.5% scan")
  }

  test("pqRerank with exhaustive probing and corpus-wide shortlist equals brute") {
    // shortlist ≥ corpus ⇒ the ADC ordering is irrelevant — the exact
    // re-rank sees every candidate, so the result must be knnJoinBrute
    val books = Similarity.pqTrain(pqClustered, "id", "vec", m = 2, k = 3,
      iters = 1, dim = 4)
    val got = Similarity.pqRerankTopK(pqClustered, "id", "vec", 2, books,
      nCentroids = 4, nprobe = 4, shortlist = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val brute = Similarity.knnJoinBrute(pqClustered, "id", "vec", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    assert(got === brute)
  }

  test("pqRerank large-codebook (LUT-free AdcScore) path equals brute too") {
    // m·k = 2·5 = 10 > 2d = 8 flips the internal payload switch to the
    // vector-carrying AdcScore path; exhaustive probing + corpus-wide
    // shortlist again reduces the result to knnJoinBrute, so this pins the
    // direct path end-to-end (the bit-parity of AdcScore vs the LUT is
    // pinned separately in VectorExprsSpec)
    val books = Similarity.pqTrain(pqClustered, "id", "vec", m = 2, k = 5,
      iters = 1, dim = 4)
    val got = Similarity.pqRerankTopK(pqClustered, "id", "vec", 2, books,
      nCentroids = 4, nprobe = 4, shortlist = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val brute = Similarity.knnJoinBrute(pqClustered, "id", "vec", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    assert(got === brute)
  }

  test("pqRerank plan pins: one AdcLut (small codebooks) / AdcScore carrying the vector (large)") {
    // repartition keeps projections in the plan (a bare local Seq gets
    // constant-folded into a LocalTableScan, hiding the expressions)
    val corpus = pqClustered.repartition(2)
    val small = Similarity.pqTrain(corpus, "id", "vec", m = 2, k = 3,
      iters = 1, dim = 4)
    val planSmall = Similarity.pqRerankTopK(corpus, "id", "vec", 2, small,
      nCentroids = 4, nprobe = 2, shortlist = 4)
      .queryExecution.executedPlan.toString.toLowerCase
    // the LUT is ONE codegen'd expression, not m·k HOF aggregates
    assert(planSmall.contains("adclut"), s"LUT path must use AdcLut:\n$planSmall")
    assert(!planSmall.contains("zip_with"),
      s"no HOF LUT construction remains:\n$planSmall")
    val big = Similarity.pqTrain(corpus, "id", "vec", m = 2, k = 5,
      iters = 1, dim = 4)
    val planBig = Similarity.pqRerankTopK(corpus, "id", "vec", 2, big,
      nCentroids = 4, nprobe = 2, shortlist = 4)
      .queryExecution.executedPlan.toString.toLowerCase
    // past m·k > 2d the probe side ships the vector, scored by AdcScore —
    // no m·k-entry LUT array rides the candidate join
    assert(planBig.contains("adcscore"),
      s"large-codebook path must use AdcScore:\n$planBig")
    assert(!planBig.contains("adclut"),
      s"no LUT payload on the large-codebook path:\n$planBig")
  }

  test("pqRerank: tight shortlist still finds cluster-mates on separated geometry") {
    val books = Similarity.pqTrain(pqClustered, "id", "vec", m = 2, k = 3,
      iters = 1, dim = 4)
    // one coarse centroid per direction cluster (the default lowest-id
    // convention would seed all three from cluster 0 — useless blocking)
    val cents = Array(
      Array(1.0, 0.05, 0.04, 0.03),
      Array(0.05, 1.0, 0.04, 0.04),
      Array(0.04, 0.04, 1.0, 0.95))
    val byQuery = Similarity.pqRerankTopK(pqClustered, "id", "vec", 2, books,
      nCentroids = 3, nprobe = 1, shortlist = 2,
      trainedCentroids = Some(cents))
      .collect().groupBy(_.getLong(0))
    // every query returns ≤ k rows with exact cosines and valid ranks
    byQuery.foreach { case (q, rows) =>
      assert(rows.length <= 2)
      assert(rows.forall(r => !r.getDouble(2).isNaN))
      assert(rows.map(_.getInt(3)).sorted.sameElements(1 to rows.length))
      // on this geometry the top hit shares the query's direction cluster
      assert(rows.head.getLong(1) / 10 === q / 10, s"query $q")
    }
    intercept[IllegalArgumentException] {
      Similarity.pqRerankTopK(pqClustered, "id", "vec", 5, books, shortlist = 2)
    }
  }

  test("NearestCells: tie to lowest index, short centroid lists, zero vector") {
    val cents = Array(Array(1.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))
    val df = Seq(
      (1L, Array(2.0f, 0.0f)),  // cos 1 with cents 0 and 1 — tie → 0 first
      (2L, Array(0.0f, 0.0f))   // zero-norm: probes nothing
    ).toDF("id", "vec")
    val got = df.select(col("id"),
      VectorExprs.nearestCells(col("vec"), cents, 5).as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(got(1L) === List(0, 1, 2)) // nprobe capped at |cents|, tie order kept
    assert(got(2L) === Nil)
    // null vector → NULL
    val nulls = Seq((3L, null.asInstanceOf[Array[Float]])).toDF("id", "vec")
      .select(VectorExprs.nearestCells(col("vec"), cents, 2)).collect()
    assert(nulls.head.isNullAt(0))
  }
}
