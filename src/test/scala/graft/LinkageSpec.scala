package graft

import graft.operators.Linkage

/** Blocked record linkage: nearest-in-block selection, deterministic
  * tiebreaks, the block-size valve, and cross-block isolation. */
class LinkageSpec extends SparkTestBase {
  import spark.implicits._

  private val cols = Seq("id", "name", "blk")

  private def link(rows: Seq[(Long, String, String)], maxBlock: Int = 1000) =
    Linkage.nearestInBlock(rows.toDF(cols: _*), "id", "name", Seq("blk"), maxBlock)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(_._1).toSeq

  test("picks the minimum edit distance within the block") {
    val got = link(Seq(
      (1L, "kitten", "b1"), (2L, "sitten", "b1"), (3L, "kettle", "b1")))
    // d(kitten,sitten)=1, d(kitten,kettle)=3, d(sitten,kettle)=4
    assert(got === Seq((1L, 2L, 1), (2L, 1L, 1), (3L, 1L, 3)))
  }

  test("ties break toward the smaller candidate id") {
    val got = link(Seq(
      (5L, "abcd", "b"), (7L, "abce", "b"), (9L, "abcf", "b")))
    // 9's candidates are both at distance 1 → match 5
    assert(got.find(_._1 == 9L).get._2 === 5L)
  }

  test("blocks are isolated: no cross-block matches") {
    val got = link(Seq(
      (1L, "same", "x"), (2L, "same", "y"),
      (3L, "samf", "x"), (4L, "samg", "y")))
    assert(got === Seq((1L, 3L, 1), (2L, 4L, 1), (3L, 1L, 1), (4L, 2L, 1)))
  }

  test("singleton blocks produce no rows") {
    val got = link(Seq((1L, "alone", "b1"), (2L, "pair", "b2"), (3L, "pear", "b2")))
    assert(got.map(_._1) === Seq(2L, 3L))
  }

  test("oversized blocks are dropped by the valve") {
    val rows = (1L to 10L).map(i => (i, s"name$i", "big")) :+ (99L, "a", "ok") :+ (98L, "b", "ok")
    val got = link(rows, maxBlock = 5)
    assert(got.map(_._1) === Seq(98L, 99L))
  }

  test("parameter validation") {
    val df = Seq((1L, "a", "b")).toDF(cols: _*)
    intercept[IllegalArgumentException] {
      Linkage.nearestInBlock(df, "id", "name", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Linkage.nearestInBlock(df, "id", "name", Seq("blk"), maxBlockSize = 1)
    }
  }
}
