package graft

import graft.operators.Baskets

/** Association rules on hand-built baskets with known co-occurrence
  * structure, plus the mega-basket valve and duplicate-line semantics. */
class BasketsSpec extends SparkTestBase {
  import spark.implicits._

  test("rules: support/confidence/lift from distinct basket membership") {
    // baskets: {a,b} ×2, {a,b,c}, {c} → N=4; n_a=3, n_b=3, n_c=2,
    // n_ab=3, n_ac=1, n_bc=1; duplicate (1,a) line counts once
    val d = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (3L, "c"),
      (4L, "c"))
      .toDF("bk", "it")
    val out = Baskets.associationRules(d, "bk", "it", minPairSupport = 1L)
      .orderBy("antecedent", "consequent").collect()
      .map(r => (r.getAs[String]("antecedent"), r.getAs[String]("consequent"),
        r.getAs[Long]("n_pair"), r.getAs[Double]("support"),
        r.getAs[Double]("confidence"), r.getAs[Double]("lift")))
    assert(out.map(t => (t._1, t._2, t._3)).toSeq === Seq(
      ("a", "b", 3L), ("a", "c", 1L), ("b", "a", 3L), ("b", "c", 1L),
      ("c", "a", 1L), ("c", "b", 1L)))
    val ab = out.head
    assert(ab._4 === 3.0 / 4) // support
    assert(ab._5 === 1.0) // confidence a→b = 3/3
    assert(ab._6 === (3.0 * 4) / (3.0 * 3)) // lift
    // lift is symmetric; confidence is not
    val ca = out(4)
    assert(ca._5 === 1.0 / 2)
    assert(ca._6 === (1.0 * 4) / (2.0 * 3))
  }

  test("minPairSupport prunes rare pairs in both directions") {
    val d = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"), (3L, "c"))
      .toDF("bk", "it")
    val out = Baskets.associationRules(d, "bk", "it", minPairSupport = 2L)
      .collect()
    assert(out.length === 2) // only a↔b survives
    assert(out.forall(_.getAs[Long]("n_pair") === 2L))
  }

  test("maxBasketSize valve drops mega-baskets from counts AND the N denominator") {
    // basket 9 has 5 items (> valve 4) → excluded entirely; remaining
    // N=2, pair a-b in both
    val mega = (1 to 5).map(i => (9L, s"m$i"))
    val d = (Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")) ++ mega)
      .toDF("bk", "it")
    val out = Baskets.associationRules(d, "bk", "it",
      minPairSupport = 1L, maxBasketSize = 4)
      .orderBy("antecedent").collect()
    assert(out.length === 2)
    assert(out.head.getAs[Double]("support") === 1.0) // 2/2, mega-basket gone
    assert(!out.exists(_.getAs[String]("antecedent").startsWith("m")))
  }

  test("parameter validation") {
    val d = Seq((1L, "a")).toDF("bk", "it")
    intercept[IllegalArgumentException] {
      Baskets.associationRules(d, "bk", "it", minPairSupport = 0L)
    }
    intercept[IllegalArgumentException] {
      Baskets.associationRules(d, "bk", "it", maxBasketSize = 1)
    }
  }
}
