package graft

import graft.operators.Graphs

/** PageRank on hand-computable graphs: symmetric fixed points, dangling
  * redistribution, mass conservation, duplicate-edge collapse. */
class GraphsSpec extends SparkTestBase {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int) =
    Graphs.pageRank(edges.toDF("s", "t"), "s", "t", iters)
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Double]("rank")).toMap

  test("2-cycle is a fixed point at 0.5 each") {
    val r = ranks(Seq(("a", "b"), ("b", "a")), iters = 7)
    assert(math.abs(r("a") - 0.5) < 1e-12)
    assert(math.abs(r("b") - 0.5) < 1e-12)
  }

  test("dangling node redistributes its mass uniformly (hand-computed)") {
    // a→b, b dangling. N=2, r0=(.5,.5); iter1: dang=.5,
    // r(a)=.075+.85·(0+.25)=.2875, r(b)=.075+.85·(.5+.25)=.7125
    val r = ranks(Seq(("a", "b")), iters = 1)
    assert(math.abs(r("a") - 0.2875) < 1e-15)
    assert(math.abs(r("b") - 0.7125) < 1e-15)
  }

  test("rank mass is conserved across iterations") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"))
    val r = ranks(edges, iters = 6)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    // d has no in-edges: teleport + its share of nothing → minimal rank
    assert(r("d") < r.values.max)
  }

  test("duplicate edges collapse (same result as the deduped graph)") {
    val dup = Seq(("a", "b"), ("a", "b"), ("a", "b"), ("b", "a"))
    val ded = Seq(("a", "b"), ("b", "a"))
    assert(ranks(dup, 4) === ranks(ded, 4))
  }

  test("hub concentration: everyone links the hub, hub ranks highest") {
    val edges = (1 to 5).map(i => (s"n$i", "hub")) ++ Seq(("hub", "n1"))
    val r = ranks(edges, iters = 5)
    assert(r("hub") === r.values.max)
    // spokes n2..n5 are symmetric → identical ranks
    assert(Set(r("n2"), r("n3"), r("n4"), r("n5")).size === 1)
  }

  test("parameter validation") {
    val d = Seq(("a", "b")).toDF("s", "t")
    intercept[IllegalArgumentException] { Graphs.pageRank(d, "s", "t", 0) }
    intercept[IllegalArgumentException] { Graphs.pageRank(d, "s", "t", 3, damping = 1.0) }
  }

  test("connectedComponents: chains, isolates-by-omission, min labels") {
    // two components: {1,2,3,4} chained, {7,9}; node 5 appears only as
    // an isolated self-less id — absent from edges, absent from output
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (9L, 7L)).toDF("s", "t")
    val got = Graphs.connectedComponents(edges, "s", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 9L -> 7L))
  }

  test("connectedComponents: string node ids (non-integral convergence probe)") {
    // the r16 decimal-sum convergence probe would CAST_INVALID_INPUT on
    // string labels under ANSI (or null-out and false-converge without it);
    // the type gate must route these through the changed-row join probe.
    // Path a-b-c-d needs >1 propagate round, so a premature first-round
    // "convergence" would be visible as wrong clusters.
    val edges = Seq(("b", "a"), ("b", "c"), ("d", "c"), ("z", "y"))
      .toDF("s", "t")
    val got = Graphs.connectedComponents(edges, "s", "t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "y" -> "y", "z" -> "y"))
  }

  test("connectedComponents: fractional node ids (sum probe would round)") {
    // 0.25 + 0.75 == 0.5 + 0.5 under any rounding scheme that truncates to
    // integers — fractional ids must use the changed-row probe, not sums
    val edges = Seq((2.5, 1.25), (2.5, 3.75), (4.5, 3.75), (9.5, 7.25))
      .toDF("s", "t")
    val got = Graphs.connectedComponents(edges, "s", "t")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got === Map(1.25 -> 1.25, 2.5 -> 1.25, 3.75 -> 1.25,
      4.5 -> 1.25, 7.25 -> 7.25, 9.5 -> 7.25))
  }

  test("connectedComponents: long path converges via pointer jumping") {
    val edges = (1L until 40L).map(i => (i, i + 1)).toDF("s", "t")
    val got = Graphs.connectedComponents(edges, "s", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length === 40)
    assert(got.forall(_._2 === 1L))
  }

  test("triangleCounts: K4 + appendages, hand-computed (dups/reversals/self-loops collapse)") {
    // K4 on {1,2,3,4}; 5—1, 5—2 (closes triangle 1-2-5); pendant 6—3;
    // noise: duplicate edge, reversed edge, self-loop (7,7) → 7 absent
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (k4 ++ Seq((5L, 1L), (2L, 5L), (6L, 3L),
      (2L, 1L), (1L, 2L), (7L, 7L))).toDF("s", "t")
    val got = Graphs.triangleCounts(edges, "s", "t")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    // 1,2: K4's 3 triangles + (1,2,5); degree 4 → cc = 8/12
    assert(got(1L) === ((4L, 4L, 8.0 / 12.0)))
    assert(got(2L) === ((4L, 4L, 8.0 / 12.0)))
    // 3: K4's 3 triangles, degree 4 (pendant 6) → cc = 6/12
    assert(got(3L) === ((4L, 3L, 0.5)))
    // 4: pure K4 vertex — fully clustered
    assert(got(4L) === ((3L, 3L, 1.0)))
    // 5: one triangle over its single neighbor pair
    assert(got(5L) === ((2L, 1L, 1.0)))
    // 6: pendant — degree 1, cc defined as 0
    assert(got(6L) === ((1L, 0L, 0.0)))
    // global count: each triangle counted once per vertex ⇒ Σ tri = 3·T
    assert(got.values.map(_._2).sum === 15L) // 5 triangles
  }

  test("labelPropagation: hand-computed sync rounds with deterministic ties") {
    // two triangles {1,2,3}, {10,11,12} bridged 3—10, plus noise edges
    // (dup, reversal, self-loop). Sync LPA from own-id labels, tie → min
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L),
      (10L, 12L), (3L, 10L), (2L, 1L), (1L, 2L), (5L, 5L)).toDF("s", "t")
    def run(iters: Int) = Graphs.labelPropagation(edges, "s", "t", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1: every node takes the min of its neighbors' ids (all ties)
    assert(run(1) === Map(1L -> 2L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 10L, 12L -> 10L))
    // round 2 from {1→2,2→1,3→1,10→3,11→10,12→10}: majorities where they
    // exist (1 sees {1,1}; 10 sees {1,10,10}), min-label on ties
    assert(run(2) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 3L, 12L -> 3L))
    // self-loop-only node 5 is absent (no neighbors, no row)
    assert(!run(2).contains(5L))
    intercept[IllegalArgumentException] {
      Graphs.labelPropagation(edges, "s", "t", 0)
    }
  }

  test("labelPropagation separates two cliques sharing no edge (communities ≠ components)") {
    // two 4-cliques + a long path connecting them: CC merges everything,
    // LPA at 2 rounds keeps the cliques' interiors on their own labels
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k4b = for (a <- 11L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val path = Seq((4L, 100L), (100L, 101L), (101L, 11L))
    val edges = (k4a ++ k4b ++ path).toDF("s", "t")
    val lpa = Graphs.labelPropagation(edges, "s", "t", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cc = Graphs.connectedComponents(edges, "s", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one component, but clique interiors carry DIFFERENT lpa labels
    assert(cc.values.toSet.size === 1)
    val cliqueALabels = Set(1L, 2L, 3L).map(lpa)
    val cliqueBLabels = Set(12L, 13L, 14L).map(lpa)
    assert(cliqueALabels.intersect(cliqueBLabels).isEmpty,
      s"cliques should not share labels: $lpa")
  }

  test("triangleCounts equals a brute adjacency oracle on seeded random graphs") {
    // property loop (the repo's seeded-scalacheck pattern): random graphs
    // incl. a hub-heavy config that stresses the degree orientation's
    // (degree, id) tie handling; noise rows (self-loops, reversals,
    // duplicates) injected before the operator
    val rnd = new scala.util.Random(88)
    val configs = Seq((12, 0.4), (30, 0.15), (25, 0.9)) // (n, edge prob)
    configs.foreach { case (n, p) =>
      val base = for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong
        if rnd.nextDouble() < p
      } yield (a, b)
      // hub: connect node 0 to everything in the second config
      val edges0 = if (p == 0.15) (base ++ (1L until n.toLong).map((0L, _))).distinct else base
      val noisy = edges0 ++ edges0.take(5).map(_.swap) ++
        Seq((3L, 3L)) ++ edges0.take(3)
      val adj = edges0.foldLeft(Map.empty[Long, Set[Long]].withDefaultValue(Set.empty[Long])) {
        case (m, (a, b)) => m.updated(a, m(a) + b).updated(b, m(b) + a)
      }
      val expect = adj.keys.map { v =>
        val nb = adj(v).toSeq
        val t = (for {
          i <- nb.indices; j <- (i + 1) until nb.length
          if adj(nb(i)).contains(nb(j))
        } yield 1).size.toLong
        v -> ((adj(v).size.toLong, t))
      }.toMap
      val got = Graphs.triangleCounts(noisy.toDF("s", "t"), "s", "t")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      assert(got.keySet === expect.keySet, s"config ($n, $p)")
      got.foreach { case (v, (d, t, cc)) =>
        val (ed, et) = expect(v)
        assert(d === ed, s"degree of $v in ($n, $p)")
        assert(t === et, s"triangles of $v in ($n, $p)")
        val ecc = if (ed >= 2) 2.0 * et / (ed * (ed - 1.0)) else 0.0
        assert(math.abs(cc - ecc) < 1e-12, s"clustering of $v in ($n, $p)")
      }
    }
  }

  test("triangleCounts: triangle-free graphs report zero everywhere") {
    // star + path: bipartite-ish, no triangles
    val edges = (Seq((0L, 1L), (0L, 2L), (0L, 3L), (3L, 4L))).toDF("s", "t")
    val got = Graphs.triangleCounts(edges, "s", "t").collect()
    assert(got.length === 5)
    assert(got.forall(_.getLong(2) === 0L))
    assert(got.forall(_.getDouble(3) === 0.0))
  }
}
