package graft

import org.apache.spark.sql.functions._

import graft.reg.Trees

/** Decision-stump split search against hand-computed Gini gains. */
class TreesSpec extends SparkTestBase {
  import spark.implicits._

  test("bestStumpSplits: perfect separator found, gain exact") {
    // y flips at x = 3: split bin 2 (x <= 3) is pure/pure,
    // gain = gini(6 rows, 3 pos) = 0.5
    val df = Seq((0.0, 0), (1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1), (5.0, 1))
      .toDF("x", "y")
    val out = Trees.bestStumpSplits(df, col("y"),
      Seq("x" -> col("x")), bins = 5).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getString(0) === "x")
    assert(r.getInt(1) === 2)
    assert(math.abs(r.getDouble(2) - 3.0) < 1e-12)
    assert(r.getLong(3) === 3L && r.getLong(4) === 3L)
    assert(math.abs(r.getDouble(5) - 0.5) < 1e-12)
  }

  test("bestStumpSplits: per-feature complete cases, constants, ties") {
    val df = Seq(
      (0.0, Some(10.0), 0), (1.0, Some(20.0), 0),
      (2.0, None, 1), (3.0, Some(40.0), 1)
    ).toDF("a", "b", "y")
    val out = Trees.bestStumpSplits(df, col("y"),
      Seq("a" -> col("a"), "b" -> col("b"), "c" -> lit(7.0)),
      bins = 2).collect().map(r => r.getString(0) -> r).toMap
    // a: bins over [0,3]: bin0 = {0,1} (y 0,0), bin1 = {2,3} (y 1,1):
    // the bin-0 split is perfect, gain = gini(4,2) = 0.5
    val a = out("a")
    assert(a.getInt(1) === 0 && math.abs(a.getDouble(5) - 0.5) < 1e-12)
    assert(a.getLong(3) === 2L && a.getLong(4) === 2L)
    // b: its OWN complete cases {10, 20, 40} with y {0, 0, 1}; bins over
    // [10,40] w=15: bin0 = {10,20}, bin1 = {40} -> perfect split,
    // gain = gini(3,1) = 4/9
    val b = out("b")
    assert(b.getInt(1) === 0 && b.getLong(3) === 2L && b.getLong(4) === 1L)
    assert(math.abs(b.getDouble(5) - 4.0 / 9.0) < 1e-12)
    // c is constant: no candidate split exists, NULL report
    val c = out("c")
    assert(c.isNullAt(1) && c.isNullAt(2) && c.isNullAt(5))
  }

  test("bestStumpSplits: tie breaks toward the smaller bin") {
    // y constant: every split has gain 0 -> bin 0 must win
    val df = Seq((0.0, 1), (1.0, 1), (2.0, 1), (3.0, 1)).toDF("x", "y")
    val out = Trees.bestStumpSplits(df, col("y"),
      Seq("x" -> col("x")), bins = 4).collect()(0)
    assert(out.getInt(1) === 0)
    assert(math.abs(out.getDouble(5)) < 1e-12)
  }
}
