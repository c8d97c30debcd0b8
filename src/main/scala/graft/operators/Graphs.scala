package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Staging

/** Iterative graph analytics over an edge relation. PageRank here is the
  * canonical "importance over a link graph" operator a web-scale curation
  * pipeline runs over its domain/citation graph (quality signals à la
  * Common Crawl domain ranks).
  *
  * Scale shape: the per-iteration work is ONE keyed equi-join
  * (edges ⋈ ranks on the source) + one keyed sum aggregate on the
  * destination — the exact shape Pregel-style systems distribute; the
  * edge table and out-degrees are staged once ([[Staging]]) so every
  * iteration re-reads executor-local (or reliably checkpointed) blocks
  * instead of re-running the upstream plan. Dangling mass and the node
  * count ride 1-row broadcast cross-joins — no driver-side collection of
  * row data anywhere, and the iteration count is a bounded parameter
  * (convergence-driven loops should compose this per-iteration step with
  * an external driver check).
  */
object Graphs {

  /** Damped PageRank over directed edges (duplicates collapse): for
    * `iters` rounds,
    *
    *   r'(v) = (1−d)/N + d · ( Σ_{u→v} r(u)/outdeg(u) + dangling/N )
    *
    * where `dangling` is the rank mass of nodes with no out-edges
    * (redistributed uniformly — the standard stochastic-matrix patch) and
    * N counts distinct nodes on either edge side. Initial rank 1/N; ranks
    * sum to 1 every round. Returns (node, rank).
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      damping: Double = 0.85,
      checkpointEvery: Int = 5
  ): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1), got $damping")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    val e = Staging.stage(edges
      .select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .filter(col("__s").isNotNull && col("__d").isNotNull)
      .distinct())
    val nodes = Staging.stage(
      e.select(col("__s").as("__n")).union(e.select(col("__d").as("__n"))).distinct())
    val outDeg = Staging.stage(e.groupBy(col("__s")).agg(count(lit(1)).as("__deg")))
    // 1-row node count, attached by broadcast everywhere a /N appears
    // (NOT named __N: analysis is case-insensitive and would collide __n)
    val nCount = nodes.agg(count(lit(1)).cast("double").as("__ntot"))
    var ranks = nodes.crossJoin(broadcast(nCount))
      .select(col("__n"), (lit(1.0) / col("__ntot")).as("__r"))
    for (i <- 1 to iters) {
      // every join below resolves by DISTINCT column names (never the
      // df("col") form): the iteration re-derives plans from the same
      // staged frames, so dataset-id references would be ambiguous
      val withDeg = ranks
        .join(outDeg, col("__n") === col("__s"), "left")
        .select(col("__n"), col("__r"), col("__deg"))
      // rank mass sitting on dangling nodes, as a 1-row frame (coalesce
      // keeps the empty-aggregation null out of the arithmetic)
      val dangling = withDeg.filter(col("__deg").isNull)
        .agg(coalesce(sum(col("__r")), lit(0.0)).as("__dang"))
      val contrib = e
        .join(withDeg.filter(col("__deg").isNotNull),
          col("__s") === col("__n"))
        .select(col("__d"), (col("__r") / col("__deg")).as("__c"))
        .groupBy(col("__d"))
        .agg(sum(col("__c")).as("__sum"))
        .withColumnRenamed("__d", "__cd")
      ranks = nodes
        .join(contrib, col("__n") === col("__cd"), "left")
        .crossJoin(broadcast(dangling))
        .crossJoin(broadcast(nCount))
        .select(col("__n"),
          (lit(1.0 - damping) / col("__ntot") +
            lit(damping) * (coalesce(col("__sum"), lit(0.0)) +
              col("__dang") / col("__ntot"))).as("__r"))
      // each round references ranks through BOTH the dangling and the
      // contribution branch, so the logical plan doubles per iteration —
      // truncate periodically or a 30-iteration production run walks an
      // exponential tree (the duplicateClusters clamp, Dedup.scala)
      if (i % checkpointEvery == 0 && i < iters) ranks = Staging.stage(ranks)
    }
    ranks.select(col("__n").as("node"), col("__r").as("rank"))
  }

  /** Connected components over an undirected edge relation: every node is
    * labeled with the minimum node id reachable from it. Returns
    * (node, component); isolated nodes (absent from `edges`) produce no
    * row — union them in with self-labels if needed.
    *
    * This is the public graph-API spelling of the label-propagation /
    * pointer-jumping loop the dedup pipeline uses to collapse near-dup
    * pair graphs ([[graft.pipeline.Dedup.duplicateClusters]] — one
    * min-label propagate join + one shortcut join per round, lineage
    * truncated every few rounds); convergence needs O(log diameter)
    * rounds thanks to the pointer jumps.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 20,
      checkpointEvery: Int = 5
  ): DataFrame =
    graft.pipeline.Dedup.duplicateClusters(
        edges.select(col(srcCol).as("id1"), col(dstCol).as("id2")),
        maxIter, checkpointEvery)
      .select(col("id").as("node"), col("cluster").as("component"))
}
