package graft

import graft.operators.Recommend

/** Rank-1 factorization against the exact singular pair of a rank-1
  * matrix (where alternating least squares converges in one round). */
class RecommendSpec extends SparkTestBase {
  import spark.implicits._

  test("rank1Factors: recovers the singular directions of rank-1 input") {
    // r_ij = a_i * b_j with a = (1,2), b = (1,3): factors must equal
    // a/||a||, b/||b|| after any number of iterations
    val r = Seq(("u1", "i1", 1.0), ("u1", "i2", 3.0),
      ("u2", "i1", 2.0), ("u2", "i2", 6.0)).toDF("u", "i", "v")
    for (iters <- Seq(1, 3)) {
      val f = Recommend.rank1Factors(r, "u", "i", "v", iters)
        .collect().map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2))
        .toMap
      assert(math.abs(f(("user", "u1")) - 1.0 / math.sqrt(5)) < 1e-12)
      assert(math.abs(f(("user", "u2")) - 2.0 / math.sqrt(5)) < 1e-12)
      assert(math.abs(f(("item", "i1")) - 1.0 / math.sqrt(10)) < 1e-12)
      assert(math.abs(f(("item", "i2")) - 3.0 / math.sqrt(10)) < 1e-12)
    }
  }

  test("rank1Factors: general input converges toward the dominant pair") {
    // A = [[4,1],[2,3]] (dense, so the per-row denominators coincide and
    // the alternation IS power iteration on AᵀA = [[20,10],[10,10]]):
    // dominant eigenvalue 15+√125, right singular vector ∝ (10, √125−5)
    val r = Seq(("a", "p", 4.0), ("a", "q", 1.0),
      ("b", "p", 2.0), ("b", "q", 3.0)).toDF("u", "i", "v")
    val v1 = Array(10.0, math.sqrt(125.0) - 5.0)
    val nrm = math.sqrt(v1.map(x => x * x).sum)
    val f = Recommend.rank1Factors(r, "u", "i", "v", iters = 12)
      .filter("side = 'item'")
      .collect().map(x => x.getString(1) -> x.getDouble(2)).toMap
    assert(math.abs(f("p") - v1(0) / nrm) < 1e-6)
    assert(math.abs(f("q") - v1(1) / nrm) < 1e-6)
  }

  test("rank1Factors: null-valued rows are dropped, output is normalized") {
    val r = Seq(
      (Some("u1"), Some("i1"), Some(2.0)),
      (Some("u1"), None, Some(9.0)),
      (None, Some("i1"), Some(9.0)),
      (Some("u2"), Some("i1"), None),
      (Some("u2"), Some("i2"), Some(1.0))
    ).toDF("u", "i", "v")
    val rows = Recommend.rank1Factors(r, "u", "i", "v", iters = 2).collect()
    val users = rows.filter(_.getString(0) == "user").map(_.getDouble(2))
    val items = rows.filter(_.getString(0) == "item").map(_.getDouble(2))
    assert(math.abs(users.map(x => x * x).sum - 1.0) < 1e-12)
    assert(math.abs(items.map(x => x * x).sum - 1.0) < 1e-12)
  }
}
