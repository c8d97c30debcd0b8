package graft

import org.apache.spark.sql.functions._
import graft.operators.Features

class FeaturesSpec extends SparkTestBase {
  import spark.implicits._

  test("target encoding: hand-computed shrinkage, m=0 gives raw means, null cat gets null") {
    val d = Seq(
      (Some("a"), Some(1.0)), (Some("a"), Some(3.0)), (Some("b"), Some(5.0)),
      (None, Some(9.0)), (Some("a"), None))
      .toDF("cat", "y")
    // prior over both-non-null rows = (1+3+5)/3 = 3
    val enc = Features.targetEncode(d, "cat", col("y"), m = 1.0)
      .select(col("cat"), col("te")).collect()
      .map(r => Option(r.getString(0)) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
    val byCat = enc.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.toSeq).toMap
    assert(byCat(Some("a")) == Seq(Some(7.0 / 3.0))) // (4 + 1*3)/(2+1)
    assert(byCat(Some("b")) == Seq(Some(4.0)))       // (5 + 3)/(1+1)
    assert(byCat(None) == Seq(None))                 // null category
    val raw = Features.targetEncode(d, "cat", col("y"), m = 0.0)
      .filter(col("cat") === "a").select(col("te")).distinct()
      .collect().map(_.getDouble(0))
    assert(raw.toSeq == Seq(2.0)) // unshrunk category mean
    // refusals
    assert(intercept[IllegalArgumentException] {
      Features.targetEncode(d, "nope", col("y"))
    }.getMessage.contains("not found"))
    assert(intercept[IllegalArgumentException] {
      Features.targetEncode(d, "cat", col("y"), outCol = "y")
    }.getMessage.contains("exists"))
  }

  test("winsorize: exact percentile bounds clip tails, nulls pass through") {
    val d = (1 to 11).map(i => Some(i.toDouble)).toDF("v")
    val w = Features.winsorize(d, col("v"), 0.1, 0.9)
      .select(col("v"), col("w")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(w(1.0) == 2.0 && w(11.0) == 10.0) // p10 = 2, p90 = 10
    assert(w(5.0) == 5.0)                     // interior untouched
    val withNull = (Seq(Some(1.0), None) ++ (2 to 11).map(i => Some(i.toDouble)))
      .toDF("v")
    val nw = Features.winsorize(withNull, col("v"), 0.1, 0.9)
      .filter(col("v").isNull).select(col("w")).collect()
    assert(nw.length == 1 && nw(0).isNullAt(0))
    assert(intercept[IllegalArgumentException] {
      Features.winsorize(d, col("v"), 0.9, 0.1)
    }.getMessage.contains("pLo"))
  }

  test("robust outliers: hand-computed median/MAD, single planted outlier flagged") {
    val d = ((1 to 9).map(_.toDouble) :+ 100.0).toDF("v")
    val r = Features.robustOutlierStats(d, col("v"), k = 3.0).head
    assert(r.getDouble(0) == 5.5)
    assert(r.getDouble(1) == 2.5) // median of |v - 5.5|
    assert(r.getLong(2) == 1L)    // only 100 beyond 3*1.4826*2.5
    assert(r.getLong(3) == 10L)
    // clean data: no outliers
    val clean = Features.robustOutlierStats(
      (1 to 9).map(_.toDouble).toDF("v"), col("v")).head
    assert(clean.getLong(2) == 0L)
  }

  test("winsorize/robustOutlierStats approx mode: sketch aggregate, no exact percentile in plan") {
    // GK sketch is exact below its accuracy bound, so small-n values match
    // the exact mode; the plan pin is the point — NO exact `percentile`
    // aggregate (which buffers every value per partition) anywhere
    val d = (1 to 11).map(i => Some(i.toDouble)).toDF("v")
    val wx = Features.winsorize(d, col("v"), 0.1, 0.9)
    val wa = Features.winsorize(d, col("v"), 0.1, 0.9, exact = false)
    val mx = wx.select(col("v"), col("w")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val ma = wa.select(col("v"), col("w")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(ma === mx)
    val waPlan = wa.queryExecution.executedPlan.toString
    assert(waPlan.contains("approx_percentile"), waPlan.take(500))
    assert(!waPlan.replace("approx_percentile", "").contains("percentile("),
      "approx mode must not carry an exact percentile aggregate")
    // odd n: the exact percentile hits an element (no interpolation), so
    // the element-returning sketch can agree exactly
    val d2 = ((1 to 10).map(_.toDouble) :+ 100.0).toDF("v")
    val rx = Features.robustOutlierStats(d2, col("v"), k = 3.0).head
    val raDf = Features.robustOutlierStats(d2, col("v"), k = 3.0, exact = false)
    val ra = raDf.head
    assert(ra.getDouble(0) === rx.getDouble(0))
    assert(ra.getDouble(1) === rx.getDouble(1))
    assert(ra.getLong(2) === rx.getLong(2))
    val raPlan = raDf.queryExecution.executedPlan.toString
    assert(!raPlan.replace("approx_percentile", "").contains("percentile("),
      "approx mode must not carry an exact percentile aggregate")
  }

  test("decay scores: now=1, one half-life back=0.5, additive per key") {
    // half-life 10: u1 events at t=20 (ref) and t=10 → 1.0 + 0.5;
    // u2 single event two half-lives back → 0.25
    val d = Seq((1L, 20L), (1L, 10L), (2L, 0L)).toDF("u", "t")
    val out = Features.decayScores(d, "u", "t", halfLifeUs = 10L)
      .orderBy("u").collect()
    assert(math.abs(out(0).getAs[Double]("score") - 1.5) < 1e-12)
    assert(math.abs(out(1).getAs[Double]("score") - 0.25) < 1e-12)
    assert(out(0).getAs[Long]("n_events") === 2L)
    assert(out(0).getAs[Long]("last_seen") === 20L)
    assert(out(1).getAs[Long]("last_seen") === 0L)
  }

  test("decay scores: explicit reference instant pins the scoring time") {
    val d = Seq((1L, 10L)).toDF("u", "t")
    val out = Features.decayScores(d, "u", "t", halfLifeUs = 10L,
      tRefUs = Some(30L)).collect().head
    assert(math.abs(out.getAs[Double]("score") - 0.25) < 1e-12)
  }

  test("weightedQuantiles: cumulative-weight threshold, weighted median") {
    // values 1(w=1), 2(w=1), 3(w=8): W=10 → q0.5 crosses at 3 (cum 10 ≥ 5),
    // q0.2 at 2 (cum 2 ≥ 2), q0.1 at 1
    val d = Seq((1.0, 1L), (2.0, 1L), (3.0, 8L)).toDF("v", "w")
    val out = Features.weightedQuantiles(d, "v", col("w"), Seq(0.1, 0.2, 0.5))
      .orderBy("q").collect()
      .map(r => r.getAs[Double]("q") -> r.getAs[Double]("value")).toMap
    assert(out === Map(0.1 -> 1.0, 0.2 -> 2.0, 0.5 -> 3.0))
    // unit weights reduce to the plain left-continuous quantile
    val u = Seq((10.0, 1L), (20.0, 1L), (30.0, 1L), (40.0, 1L)).toDF("v", "w")
    val med = Features.weightedQuantiles(u, "v", col("w"), Seq(0.5))
      .collect().head.getAs[Double]("value")
    assert(med === 20.0)
    intercept[IllegalArgumentException] {
      Features.weightedQuantiles(d, "v", col("w"), Seq(0.0))
    }
  }

  test("percentileRank: matches percent_rank semantics with min-rank ties") {
    // values 10,20,20,30: pr = lt/(n-1) = 0, 1/3, 1/3, 1
    val d = Seq((1L, 10.0), (2L, 20.0), (3L, 20.0), (4L, 30.0)).toDF("id", "v")
    val out = Features.percentileRank(d, "v").orderBy("id").collect()
    val pr = out.map(_.getAs[Double]("pr"))
    assert(pr(0) === 0.0)
    assert(math.abs(pr(1) - 1.0 / 3) < 1e-15)
    assert(pr(1) === pr(2))
    assert(pr(3) === 1.0)
  }

  test("percentileRank: nulls pass through with null rank; single row ranks 0") {
    val d = Seq((1L, Some(5.0)), (2L, None)).toDF("id", "v")
    val out = Features.percentileRank(d, "v").orderBy("id").collect()
    assert(out(0).getAs[Double]("pr") === 0.0)
    assert(out(1).isNullAt(out(1).fieldIndex("pr")))
  }

  test("decay scores: null keys/times dropped, validation") {
    val d = Seq((Some(1L), Some(10L)), (None, Some(5L)), (Some(2L), None))
      .toDF("u", "t")
    val out = Features.decayScores(d, "u", "t", halfLifeUs = 10L).collect()
    assert(out.length === 1)
    intercept[IllegalArgumentException] {
      Features.decayScores(d, "u", "t", halfLifeUs = 0L)
    }
  }

  test("histogram: dense spine, clamped max, degenerate and empty inputs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // values 0..10 over 5 bins of width 2; 10 clamps into bin 4
    val d = (0 to 10).map(_.toDouble).toDF("v")
    val out = Features.histogram(d, "v", bins = 5).orderBy("bin").collect()
    assert(out.length === 5)
    assert(out.map(_.getAs[Long]("n")).toSeq === Seq(2L, 2L, 2L, 2L, 3L))
    assert(out(0).getAs[Double]("lo") === 0.0)
    assert(out(4).getAs[Double]("hi") === 10.0)
    // all-equal values collapse into bin 0, other bins present but empty
    val const = Seq(7.0, 7.0, 7.0).toDF("v")
    val c = Features.histogram(const, "v", 4).orderBy("bin").collect()
    assert(c.map(_.getAs[Long]("n")).toSeq === Seq(3L, 0L, 0L, 0L))
    // empty input: spine present, zero counts, null edges
    val empty = spark.emptyDataset[Double].toDF("v")
    val e = Features.histogram(empty, "v", 3).orderBy("bin").collect()
    assert(e.length === 3 && e.forall(_.getAs[Long]("n") === 0L))
    intercept[IllegalArgumentException] { Features.histogram(d, "v", 0) }
  }

  test("woeBins: hand-computed smoothed log-odds on a separable score") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 4 rows, 2 bins: low scores all negative, high all positive
    // bin1: n=2 pos=0 neg=2; bin2: n=2 pos=2 neg=0; tp=tn=2
    // pr1=(0+.5)/(2+1)=1/6, nr1=(2+.5)/3=5/6 → woe1=ln(1/5)
    val d = Seq((1.0, false, 1L), (2.0, false, 2L), (3.0, true, 3L),
      (4.0, true, 4L)).toDF("s", "y", "id")
    val out = Features.woeBins(d, col("s"), col("y"), col("id"), bins = 2)
      .orderBy("bin").collect()
    assert(out.map(r => (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"))).toSeq ===
      Seq((0L, 2L), (2L, 0L)))
    assert(math.abs(out(0).getAs[Double]("woe") - math.log(1.0 / 5.0)) < 1e-12)
    assert(math.abs(out(1).getAs[Double]("woe") - math.log(5.0)) < 1e-12)
    // symmetric split → equal-magnitude IV contributions, both positive
    val iv = out.map(_.getAs[Double]("iv_contrib"))
    assert(iv.forall(_ > 0))
    assert(math.abs(iv(0) - iv(1)) < 1e-12)
  }

  test("woeBins bucketed default: matches exact NTILE on distinct scores, no sort in plan") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rng = new scala.util.Random(53)
    val d = rng.shuffle((1 to 300).toList)
      .map(i => (i.toDouble, i % 4 == 0, i.toLong)).toDF("s", "y", "id")
    val bucketed = Features.woeBins(d, col("s"), col("y"), col("id"), bins = 6)
    val b = bucketed.orderBy("bin").collect()
    val e = Features.woeBins(d, col("s"), col("y"), col("id"), bins = 6,
      exact = true).orderBy("bin").collect()
    // distinct integer scores → the histogram-CDF cuts split at the same
    // ranks NTILE does, so counts AND the woe/iv algebra agree exactly
    assert(b.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq ===
      e.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq)
    b.zip(e).foreach { case (rb, re) =>
      assert(math.abs(rb.getAs[Double]("woe") - re.getAs[Double]("woe")) < 1e-12)
    }
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("ntile"), s"bucketed plan must not NTILE:\n$plan")
  }

  test("woeBins bucketed: tie-emptied bin keeps the dense spine and finite woe") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two tied score values across 3 bins → the middle bin is empty
    val d = ((1 to 30).map(i => (1.0, i % 2 == 0, i.toLong)) ++
      (31 to 60).map(i => (9.0, i % 3 == 0, i.toLong))).toDF("s", "y", "id")
    val out = Features.woeBins(d, col("s"), col("y"), col("id"), bins = 3)
      .orderBy("bin").collect()
    assert(out.length === 3)
    assert(out.map(_.getAs[Long]("n")).sum === 60L)
    val empty = out.filter(_.getAs[Long]("n") === 0L)
    assert(empty.length === 1)
    // the 0.5 smoothing keeps the empty bin's woe finite (and 0 only if
    // the totals happen to balance — just assert finiteness)
    assert(empty.forall(r => !r.getAs[Double]("woe").isNaN &&
      !r.getAs[Double]("woe").isInfinite))
  }
}
