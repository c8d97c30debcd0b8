package graft

import org.apache.spark.sql.functions._

import graft.functions.FreqItemsAgg
import graft.pipeline.TextOps

/** Misra-Gries heavy-hitters: exact regime vs groupBy on real documents,
  * and the deterministic guarantees (lower/upper count bounds, guaranteed
  * presence above N/(capacity+1)) in the restricted-capacity regime under
  * multi-partition merges.
  */
class FreqItemsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = sf("sf0.001", "documents")

  test("capacity above the vocabulary reproduces the exact top-k") {
    val hh = TextOps.heavyHitters(docs, "text", capacity = 100000, k = 25)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = docs
      .select(explode(TextOps.tokens(col("text"))).as("item"))
      .groupBy("item").count()
      .orderBy(col("count").desc, col("item"))
      .limit(25)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(hh.length == 25)
    hh.zip(exact).foreach { case ((i1, c1, m1), (i2, c2)) =>
      assert(i1 == i2, s"item order: $i1 vs $i2")
      assert(c1 == c2 && m1 == c2, s"$i1: ($c1,$m1) vs $c2") // err = 0
    }
  }

  test("restricted capacity: bounds hold and heavy items survive merges") {
    // Zipf-ish stream: item_i appears ~ 5000/i times, heavily skewed
    val rows = (1 to 60).flatMap(i => Seq.fill(5000 / i)(s"t$i"))
    val shuffled = new scala.util.Random(5).shuffle(rows)
    val n = shuffled.length.toLong
    val capacity = 20
    val df = shuffled.toDF("tok").repartition(16) // force partial+final merges
    val res = df.agg(FreqItemsAgg(col("tok"), capacity).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.item", "e.count", "e.max_count")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val truth = shuffled.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(res.length <= capacity)
    res.foreach { case (item, c, m) =>
      val t = truth(item)
      assert(c <= t, s"$item lower bound: $c > $t")
      assert(t <= m, s"$item upper bound: $t > $m")
    }
    val threshold = n.toDouble / (capacity + 1)
    truth.filter(_._2 > threshold).keys.foreach { heavy =>
      assert(res.exists(_._1 == heavy), s"guaranteed heavy item $heavy missing")
    }
  }

  test("grouped heavy hitters equal per-group exact counts (exact regime)") {
    val byLang = TextOps.heavyHittersBy(docs, "lang", "text", capacity = 100000, k = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val exact = docs
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("item"))
      .groupBy("lang", "item").count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val langs = byLang.map(_._1).distinct
    assert(langs.length > 1)
    byLang.foreach { case (lang, item, c) =>
      assert(exact((lang, item)) == c, s"$lang/$item")
    }
    // each group's 3 entries are its true top-3 counts
    langs.foreach { lang =>
      val got = byLang.filter(_._1 == lang).map(_._3).sorted.reverse.toSeq
      val want = exact.collect { case ((l, _), c) if l == lang => c }
        .toSeq.sorted.reverse.take(got.length)
      assert(got == want, s"$lang top counts")
    }
  }

  test("array input equals one-token-per-row input") {
    val tokens = Seq(Seq("a", "b", "a"), Seq("c", "a"), Seq.empty[String])
    val fromArrays = tokens.toDF("toks")
      .agg(FreqItemsAgg(col("toks"), 10).as("hh"))
      .select(explode(col("hh")).as("e")).select("e.item", "e.count")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val fromRows = tokens.flatten.toDF("tok")
      .agg(FreqItemsAgg(col("tok"), 10).as("hh"))
      .select(explode(col("hh")).as("e")).select("e.item", "e.count")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(fromArrays == fromRows)
    assert(fromArrays == Seq(("a", 3L), ("b", 1L), ("c", 1L)))
  }

  test("empty input yields an empty summary; nulls are skipped") {
    val empty = Seq.empty[String].toDF("tok")
      .agg(FreqItemsAgg(col("tok"), 5).as("hh"))
      .select(size(col("hh"))).collect()(0).getInt(0)
    assert(empty == 0)
    val withNulls = Seq(Some("x"), None, Some("x")).toDF("tok")
      .agg(FreqItemsAgg(col("tok"), 5).as("hh"))
      .select(explode(col("hh")).as("e")).select("e.item", "e.count")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(withNulls == Seq(("x", 2L)))
  }
}
