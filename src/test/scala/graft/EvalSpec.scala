package graft

import org.apache.spark.sql.functions._

import graft.reg.Eval

/** AUC correctness against the brute-force pairwise definition
  * P(score⁺ > score⁻) + ½P(score⁺ = score⁻). */
class EvalSpec extends SparkTestBase {
  import spark.implicits._

  private def bruteAuc(data: Seq[(Double, Boolean)]): Double = {
    val pos = data.filter(_._2).map(_._1)
    val neg = data.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    wins / (pos.length.toDouble * neg.length)
  }

  test("matches the pairwise definition, including ties") {
    val rng = new scala.util.Random(31)
    val data = (1 to 400).map { _ =>
      val label = rng.nextBoolean()
      // discrete scores force plenty of ties
      val score = (rng.nextInt(10) + (if (label) rng.nextInt(4) else 0)).toDouble
      (score, label)
    }
    val df = data.toDF("score", "label")
    val got = Eval.auc(df, col("score"), col("label"))
    val want = bruteAuc(data)
    assert(math.abs(got - want) < 1e-12, s"$got vs $want")
  }

  test("perfect separation gives 1, inverted gives 0, constant gives 0.5") {
    val sep = ((1 to 50).map(i => (i + 100.0, true)) ++
      (1 to 50).map(i => (i.toDouble, false))).toDF("score", "label")
    assert(Eval.auc(sep, col("score"), col("label")) == 1.0)
    assert(Eval.auc(sep, -col("score"), col("label")) == 0.0)
    val const = ((1 to 30).map(_ => (1.0, true)) ++
      (1 to 30).map(_ => (1.0, false))).toDF("score", "label")
    assert(Eval.auc(const, col("score"), col("label")) == 0.5)
  }

  test("quantize rounds scores before ranking (binned estimate)") {
    val data = Seq((0.1234, true), (0.1232, false), (0.9, true), (0.2, false))
    val df = data.toDF("score", "label")
    // at 3 digits the first two scores tie; exact AUC differs
    val exact = Eval.auc(df, col("score"), col("label"))
    val binned = Eval.auc(df, col("score"), col("label"), quantize = Some(3))
    val wantBinned = bruteAuc(Seq((0.123, true), (0.123, false), (0.9, true), (0.2, false)))
    assert(math.abs(exact - bruteAuc(data)) < 1e-12)
    assert(math.abs(binned - wantBinned) < 1e-12)
    assert(exact != binned)
  }

  test("bucketed regime: forced bucketing approximates exact on continuous scores") {
    // a continuous score with signal: exact vs exact=Some(false) (forced
    // 256-bin histogram-CDF path) must agree within the binned-estimate
    // error, and the KS/Spearman/Mann-Whitney siblings likewise
    val rng = new scala.util.Random(99)
    val data = (1 to 3000).map { _ =>
      val label = rng.nextBoolean()
      val score = rng.nextGaussian() + (if (label) 0.8 else 0.0)
      (score, label)
    }
    val df = data.toDF("score", "label")
    val exact = Eval.auc(df, col("score"), col("label"), exact = Some(true))
    val binned = Eval.auc(df, col("score"), col("label"), exact = Some(false))
    assert(math.abs(exact - binned) < 0.01, s"$exact vs $binned")
    // auto mode picks exact here (3000 distinct « the bound): bit-identical
    val auto = Eval.auc(df, col("score"), col("label"))
    assert(java.lang.Double.doubleToLongBits(auto) ==
      java.lang.Double.doubleToLongBits(exact))

    val xy = (1 to 3000).map { _ =>
      val x = rng.nextGaussian(); (x, 0.7 * x + 0.3 * rng.nextGaussian())
    }
    val dxy = xy.toDF("x", "y")
    val rhoE = Eval.spearman(dxy, col("x"), col("y"), exact = Some(true))
      .head.getDouble(0)
    val rhoB = Eval.spearman(dxy, col("x"), col("y"), exact = Some(false))
      .head.getDouble(0)
    assert(math.abs(rhoE - rhoB) < 0.01, s"$rhoE vs $rhoB")

    val ref = xy.map(_._1).toDF("v")
    val cur = xy.map(t => t._1 + 0.3).toDF("v")
    val dE = Eval.ksTest(ref, cur, col("v"), exact = Some(true)).head.getDouble(0)
    val dB = Eval.ksTest(ref, cur, col("v"), exact = Some(false)).head.getDouble(0)
    // binned D underestimates by at most ~one bin of pooled mass (1/256)
    assert(dB <= dE + 1e-12 && dE - dB < 0.01, s"$dE vs $dB")

    val mwd = data.map { case (s, l) => (l, s) }.toDF("f", "v")
    val zE = Eval.mannWhitney(mwd, col("f"), col("v"), exact = Some(true))
      .head.getAs[Double]("z")
    val zB = Eval.mannWhitney(mwd, col("f"), col("v"), exact = Some(false))
      .head.getAs[Double]("z")
    // z is O(sqrt(n))-scaled; compare the implied effect u/(na*nb)
    assert(math.abs(zE - zB) / math.sqrt(3000.0) < 0.02, s"$zE vs $zB")
  }

  test("shared ScoreRegime: one probe serves the whole metric family, bit-identical") {
    val rng = new scala.util.Random(7)
    val data = (1 to 2000).map { _ =>
      val label = rng.nextBoolean()
      (rng.nextGaussian() + (if (label) 0.6 else 0.0), label)
    }
    val df = data.toDF("score", "label")
    // probe ONCE; every metric with the regime must equal its own
    // auto-mode result bit-for-bit (same probe, same cuts algebra)
    for (forced <- Seq(None, Some(false))) {
      val regime = Eval.probeRegime(df, col("score"), exact = forced)
      val aucAuto = Eval.auc(df, col("score"), col("label"), exact = forced)
      val aucPre = Eval.auc(df, col("score"), col("label"),
        regime = Some(regime))
      assert(java.lang.Double.doubleToLongBits(aucAuto) ==
        java.lang.Double.doubleToLongBits(aucPre), s"forced=$forced")
      val mwAuto = Eval.mannWhitney(df, col("label"), col("score"),
        exact = forced).head.getAs[Double]("z")
      val mwPre = Eval.mannWhitney(df, col("label"), col("score"),
        regime = Some(regime)).head.getAs[Double]("z")
      assert(java.lang.Double.doubleToLongBits(mwAuto) ==
        java.lang.Double.doubleToLongBits(mwPre), s"forced=$forced")
    }
    // a supplied regime runs NO probe/cut jobs inside the metric call:
    // building the plan on an empty-but-typed frame must not throw even
    // though auto mode's probe would see zero rows
    val empty = df.filter(lit(false))
    val regime = Eval.probeRegime(df, col("score"), exact = Some(false))
    Eval.aucDF(empty, col("score"), col("label"), regime = Some(regime))
    // spearman: per-column regimes reproduce auto (both continuous-forced)
    val xy = (1 to 2000).map { _ =>
      val x = rng.nextGaussian(); (x, 0.5 * x + rng.nextGaussian())
    }.toDF("x", "y")
    val rx = Eval.probeRegime(xy, col("x"), exact = Some(false))
    val ry = Eval.probeRegime(xy, col("y"), exact = Some(false))
    val rhoAuto = Eval.spearman(xy, col("x"), col("y"), exact = Some(false))
      .head.getDouble(0)
    val rhoPre = Eval.spearman(xy, col("x"), col("y"),
      regimeX = Some(rx), regimeY = Some(ry)).head.getDouble(0)
    assert(java.lang.Double.doubleToLongBits(rhoAuto) ==
      java.lang.Double.doubleToLongBits(rhoPre))
    // supplying exactly ONE regime probes only the other column (r11);
    // maxExactDistinct=100 routes the probed column bucketed (2000
    // distincts), whose deterministic cuts equal the pre-built regime's —
    // so each mixed call must reproduce the both-regime result
    // bit-for-bit
    for (rhoMixed <- Seq(
        Eval.spearman(xy, col("x"), col("y"), maxExactDistinct = 100,
          regimeX = Some(rx)).head.getDouble(0),
        Eval.spearman(xy, col("x"), col("y"), maxExactDistinct = 100,
          regimeY = Some(ry)).head.getDouble(0)))
      assert(java.lang.Double.doubleToLongBits(rhoMixed) ==
        java.lang.Double.doubleToLongBits(rhoPre))
    // ksTest: regime probed on the POOLED sample
    val ref = xy.select(col("x").as("v"))
    val cur = xy.select((col("x") + 0.2).as("v"))
    val pooled = ref.unionAll(cur)
    val rk = Eval.probeRegime(pooled, col("v"), exact = Some(false))
    val dAuto = Eval.ksTest(ref, cur, col("v"), exact = Some(false))
      .head.getDouble(0)
    val dPre = Eval.ksTest(ref, cur, col("v"), regime = Some(rk))
      .head.getDouble(0)
    assert(java.lang.Double.doubleToLongBits(dAuto) ==
      java.lang.Double.doubleToLongBits(dPre))
  }

  test("bucketed regime plan pin: window keys on the binary-search bin, not raw scores") {
    val rng = new scala.util.Random(7)
    // repartition keeps the projection in the plan (a bare local Seq gets
    // constant-folded into a LocalTableScan, hiding the bin expression)
    val df = (1 to 500).map(_ => (rng.nextGaussian(), rng.nextBoolean()))
      .toDF("score", "label").repartition(2)
    val bucketed = Eval.aucDF(df, col("score"), col("label"),
      exact = Some(false), buckets = 256)
    val plan = bucketed.queryExecution.executedPlan.toString
    // the scale contract: the cumulative window's input is the hash
    // aggregate keyed by the codegen'd binary-search bin (≤ buckets + 1
    // rows), never the raw distinct-score table
    assert(plan.toLowerCase.contains("bucketbin"),
      s"bucketed AUC must bin via BucketBin:\n$plan")
    assert(!plan.contains("ntile"), s"no NTILE anywhere:\n$plan")
  }

  test("null scores and labels are excluded") {
    val df = Seq(
      (Some(2.0), Some(true)), (Some(1.0), Some(false)),
      (None, Some(true)), (Some(5.0), None))
      .toDF("score", "label")
    assert(Eval.auc(df, col("score"), col("label")) == 1.0)
  }

  test("Welch A/B: hand-computed moments, se, t and Satterthwaite df") {
    val d = Seq((false, 1.0), (false, 2.0), (false, 3.0),
      (true, 4.0), (true, 6.0)).toDF("t", "y")
    val r = Eval.abTest(d, col("t"), col("y")).head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-12) // mean_a
    assert(math.abs(r.getDouble(3) - 5.0) < 1e-12) // mean_b
    assert(math.abs(r.getDouble(4) - 3.0) < 1e-12) // diff
    val se = math.sqrt(1.0 / 3.0 + 2.0 / 2.0)      // va=1, vb=2
    assert(math.abs(r.getDouble(5) - se) < 1e-12)
    assert(math.abs(r.getDouble(6) - 3.0 / se) < 1e-12)
    assert(math.abs(r.getDouble(7) - 32.0 / 19.0) < 1e-9) // Satterthwaite
  }

  test("Spearman: monotone gives 1, reversal -1, hand-computed tie ranks") {
    val mono = Seq((1.0, 10.0), (2.0, 200.0), (3.0, 3000.0)).toDF("x", "y")
    assert(math.abs(Eval.spearman(mono, col("x"), col("y"))
      .head.getDouble(0) - 1.0) < 1e-12)
    val rev = Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0)).toDF("x", "y")
    assert(math.abs(Eval.spearman(rev, col("x"), col("y"))
      .head.getDouble(0) + 1.0) < 1e-12)
    // ties: rx=[1,2.5,2.5,4], ry=[1.5,1.5,3,4] -> rho = 3.75/4.5
    val ties = Seq((1.0, 5.0), (2.0, 5.0), (2.0, 6.0), (3.0, 7.0)).toDF("x", "y")
    val r = Eval.spearman(ties, col("x"), col("y")).head
    assert(math.abs(r.getDouble(0) - 3.75 / 4.5) < 1e-12)
    assert(r.getLong(1) == 4L)
  }

  test("categorical association: independence gives zeros, identity gives V=1") {
    val ind = Seq(("p", "u"), ("p", "v"), ("q", "u"), ("q", "v")).toDF("a", "b")
    val ri = Eval.categoricalAssociation(ind, col("a"), col("b")).head
    assert(math.abs(ri.getDouble(0)) < 1e-12) // chi2
    assert(math.abs(ri.getDouble(2)) < 1e-12) // mi
    // perfect association with a ZERO cell: chi2 = n (2x2... R=C=2), V = 1
    val per = Seq(("p", "x"), ("p", "x"), ("q", "y")).toDF("a", "b")
    val rp = Eval.categoricalAssociation(per, col("a"), col("b")).head
    assert(math.abs(rp.getDouble(0) - 3.0) < 1e-12)
    assert(math.abs(rp.getDouble(1) - 1.0) < 1e-12)
    // MI of a deterministic map = entropy of the marginal: H(2/3,1/3)
    val h = -(2.0 / 3.0 * math.log(2.0 / 3.0) + 1.0 / 3.0 * math.log(1.0 / 3.0))
    assert(math.abs(rp.getDouble(2) - h) < 1e-12)
    assert(rp.getLong(3) == 3L)
  }

  test("KS: hand-computed sup distance, identical samples give zero") {
    val ref = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val cur = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    val r = Eval.ksTest(ref, cur, col("v")).head
    assert(math.abs(r.getDouble(0) - 0.5) < 1e-12) // sup at v=2..4
    assert(r.getLong(1) == 4L && r.getLong(2) == 4L)
    val same = Eval.ksTest(ref, ref, col("v")).head.getDouble(0)
    assert(same == 0.0)
    // quantize collapses near-ties into one distinct value
    val q = Eval.ksTest(
      Seq(1.0001, 2.0).toDF("v"), Seq(1.0002, 2.0).toDF("v"),
      col("v"), quantize = Some(2)).head.getDouble(0)
    assert(q == 0.0)
  }

  test("PSI: hand-computed bins, empty bins smoothed, max clamps into top bin") {
    val ref = (0 to 9).map(_.toDouble).toDF("v") // one value per bin; 9.0 clamps
    val cur = Seq.fill(5)(0.0).toDF("v")         // everything in bin 0
    val out = Eval.psi(ref, cur, col("v"), bins = 10).collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(1)).toSeq == Seq.fill(10)(1L)) // n_ref
    assert(out.map(_.getLong(2)).toSeq == 5L +: Seq.fill(9)(0L)) // n_cur
    val p = 1.5 / 15.0
    val q0 = 5.5 / 10.0; val qi = 0.5 / 10.0
    assert(math.abs(out(0).getDouble(3) - (p - q0) * math.log(p / q0)) < 1e-12)
    assert(math.abs(out(3).getDouble(3) - (p - qi) * math.log(p / qi)) < 1e-12)
    // identical distributions: PSI ~ 0
    val same = Eval.psi(ref, ref, col("v"), bins = 10)
      .agg(sum(col("contrib"))).head.getDouble(0)
    assert(math.abs(same) < 1e-12)
  }

  test("Cohen's kappa: hand-computed 2x2, perfect agreement, and pe=1 guard") {
    // classic 2x2: a/b agree on 20+15 of 50; po=0.7
    // margins a: yes 25, no 25; b: yes 30, no 20 → pe = (25*30+25*20)/2500 = 0.5
    // kappa = (0.7-0.5)/0.5 = 0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val d = rows.toDF("a", "b")
    val out = Eval.cohenKappa(d, col("a"), col("b")).head
    assert(out.getAs[Long]("n") === 50L)
    assert(math.abs(out.getAs[Double]("po") - 0.7) < 1e-12)
    assert(math.abs(out.getAs[Double]("pe") - 0.5) < 1e-12)
    assert(math.abs(out.getAs[Double]("kappa") - 0.4) < 1e-12)
    // perfect agreement with 2 classes → kappa 1
    val perfect = Seq(("x", "x"), ("y", "y")).toDF("a", "b")
    assert(math.abs(Eval.cohenKappa(perfect, col("a"), col("b"))
      .head.getAs[Double]("kappa") - 1.0) < 1e-12)
    // single shared category: pe = 1 → kappa NULL, not division blowup
    val degen = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    val row = Eval.cohenKappa(degen, col("a"), col("b")).head
    assert(row.isNullAt(row.fieldIndex("kappa")))
  }

  test("propZTestGrouped: hand-computed pooled z and tail, degenerate guards") {
    // group g: arm A 2/4 success, arm B 1/4 → pool 3/8
    // z = (0.5-0.25)/sqrt(0.375*0.625*(0.5)) = 0.25/sqrt(0.1171875)
    val d = (Seq((true, 1), (true, 1), (true, 0), (true, 0),
      (false, 1), (false, 0), (false, 0), (false, 0)))
      .map { case (f, s) => ("g", f, s) }.toDF("g", "f", "s")
    val out = Eval.propZTestGrouped(d, Seq("g"), col("f"), col("s") === 1).head
    assert((out.getAs[Long]("n_a"), out.getAs[Long]("s_a"),
      out.getAs[Long]("n_b"), out.getAs[Long]("s_b")) === ((4L, 2L, 4L, 1L)))
    val zExp = 0.25 / math.sqrt(0.375 * 0.625 * 0.5)
    assert(math.abs(out.getAs[Double]("z") - zExp) < 1e-12)
    // p within the A&S 7.1.26 error bound of the exact normal tail
    val pExact = 2.0 * (1.0 - cdf(zExp))
    assert(math.abs(out.getAs[Double]("p") - pExact) < 3e-7)
    // all-success group: pool = 1 → z and p NULL
    val degen = Seq(("g", true, 1), ("g", false, 1)).toDF("g", "f", "s")
    val row = Eval.propZTestGrouped(degen, Seq("g"), col("f"), col("s") === 1).head
    assert(row.isNullAt(row.fieldIndex("z")) && row.isNullAt(row.fieldIndex("p")))
  }

  // standard normal CDF via the complementary error function series
  // (high-accuracy reference for the A&S bound check)
  private def cdf(x: Double): Double = {
    def erf(z: Double): Double = {
      // Taylor/continued series, plenty at |z| < 3
      val t = (0 to 60).map { n =>
        var term = z
        for (k <- 1 to n) term *= -z * z / k
        term / (2 * n + 1)
      }.sum
      2.0 / math.sqrt(math.Pi) * t
    }
    0.5 * (1.0 + erf(x / math.sqrt(2.0)))
  }

  test("bhAdjust: textbook step-up, monotone, capped at 1") {
    // classic example: p = .01, .02, .03, .04, .05 (m=5)
    // raw = .05, .05, .05, .05, .05 → all adjusted to .05
    val d1 = Seq(("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.04), ("e", 0.05))
      .toDF("id", "p")
    val out1 = Eval.bhAdjust(d1, "id", "p").orderBy("rank").collect()
    assert(out1.map(_.getAs[Double]("p_adj")).forall(v => math.abs(v - 0.05) < 1e-12))
    // mixed: p = .005, .011, .02, .04, .1 → raw .025,.0275,.0333,.05,.1;
    // suffix-min keeps each (already monotone)
    val d2 = Seq(("a", 0.005), ("b", 0.011), ("c", 0.02), ("d", 0.04), ("e", 0.1))
      .toDF("id", "p")
    val out2 = Eval.bhAdjust(d2, "id", "p").orderBy("rank").collect()
      .map(_.getAs[Double]("p_adj"))
    assert(math.abs(out2(0) - 0.025) < 1e-12)
    assert(math.abs(out2(1) - 0.0275) < 1e-12)
    assert(math.abs(out2(4) - 0.1) < 1e-12)
    // adjusted values are monotone in rank and capped at 1
    val d3 = Seq(("a", 0.9), ("b", 0.99), ("c", 0.5)).toDF("id", "p")
    val out3 = Eval.bhAdjust(d3, "id", "p").orderBy("rank").collect()
      .map(_.getAs[Double]("p_adj"))
    assert(out3.zip(out3.tail).forall { case (x, y) => x <= y + 1e-15 })
    assert(out3.forall(_ <= 1.0))
    // nulls dropped from m
    val d4 = Seq(("a", Some(0.02)), ("b", None)).toDF("id", "p")
    val out4 = Eval.bhAdjust(d4, "id", "p").collect()
    assert(out4.length === 1 && math.abs(out4.head.getAs[Double]("p_adj") - 0.02) < 1e-12)
  }

  test("mannWhitney: hand-computed U with ties, symmetry, degenerate NULL") {
    // A = {1, 3}, B = {2, 3}: pairs won by A: (3>2)=1, ties: (3,3)=0.5,
    // (1 vs 2)=0, (1 vs 3)=0 → U = 1.5
    val d = Seq((true, 1.0), (true, 3.0), (false, 2.0), (false, 3.0))
      .toDF("f", "v")
    val out = Eval.mannWhitney(d, col("f"), col("v")).head
    assert((out.getAs[Long]("n_a"), out.getAs[Long]("n_b")) === ((2L, 2L)))
    assert(out.getAs[Double]("u") === 1.5)
    // flipping arms mirrors U around n_a·n_b/2 and negates z
    val flip = Eval.mannWhitney(d, !col("f"), col("v")).head
    assert(flip.getAs[Double]("u") === 2.5)
    assert(math.abs(out.getAs[Double]("z") + flip.getAs[Double]("z")) < 1e-12)
    // identical samples: U = n²/2, z = 0 is degenerate only when σ>0;
    // all-equal values → σ = 0 → NULL
    val same = Seq((true, 5.0), (false, 5.0)).toDF("f", "v")
    val r = Eval.mannWhitney(same, col("f"), col("v")).head
    assert(r.isNullAt(r.fieldIndex("z")))
    // strongly separated arms → small p
    val sep = ((1 to 30).map(i => (true, i.toDouble)) ++
      (1 to 30).map(i => (false, 100.0 + i))).toDF("f", "v")
    assert(Eval.mannWhitney(sep, col("f"), col("v"))
      .head.getAs[Double]("p") < 1e-6)
  }

  test("chiSquareGof: exact chi2 under known mix, undeclared bucketed, p sane") {
    // 40 a / 60 b against 50/50: chi2 = (40-50)^2/50 + (60-50)^2/50 = 4
    val d = (Seq.fill(40)("a") ++ Seq.fill(60)("b") ++ Seq.fill(5)("zz"))
      .toDF("c")
    val out = Eval.chiSquareGof(d, col("c"), Seq("a" -> 0.5, "b" -> 0.5)).head
    assert(out.getAs[Long]("n") === 100L)
    assert(out.getAs[Long]("n_other") === 5L)
    assert(math.abs(out.getAs[Double]("chi2") - 4.0) < 1e-12)
    assert(out.getAs[Int]("df") === 1)
    // exact p for chi2=4, df=1 is erfc(sqrt(2)) ≈ 0.0455; WH approx close
    val p = out.getAs[Double]("p")
    assert(p > 0.03 && p < 0.06, s"p=$p")
    // perfect fit → chi2 = 0, p near 1
    val fit = (Seq.fill(50)("a") ++ Seq.fill(50)("b")).toDF("c")
    val f = Eval.chiSquareGof(fit, col("c"), Seq("a" -> 0.5, "b" -> 0.5)).head
    assert(f.getAs[Double]("chi2") === 0.0)
    assert(f.getAs[Double]("p") > 0.9)
    intercept[IllegalArgumentException] {
      Eval.chiSquareGof(d, col("c"), Seq("a" -> 0.7, "b" -> 0.7))
    }
  }

  test("corrMatrix: hand values, self-corr 1, zero-variance NULL, complete-case n") {
    // y = 2x exactly → corr(x, y) = 1; z anti-correlated with x
    val d = Seq(
      (1.0, 2.0, 3.0, Some(1.0)), (2.0, 4.0, 2.0, Some(1.0)),
      (3.0, 6.0, 1.0, None)).toDF("x", "y", "z", "c")
    val out = Eval.corrMatrix(d, Seq("x", "y", "z", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    // complete-case: the None row drops everywhere → n = 2 for all pairs
    assert(out.values.forall(_._1 == 2L))
    assert(math.abs(out(("x", "y"))._2.get - 1.0) < 1e-12)
    assert(math.abs(out(("x", "x"))._2.get - 1.0) < 1e-12)
    assert(math.abs(out(("x", "z"))._2.get + 1.0) < 1e-12)
    // c is constant on the surviving rows → zero variance → NULL
    assert(out(("c", "c"))._2.isEmpty)
    assert(out(("x", "c"))._2.isEmpty)
    // upper triangle only: k(k+1)/2 = 10 pairs
    assert(out.size === 10)
  }

  test("liftCurve: hand-computed gains on a perfectly ranked label") {
    // scores 10..1, positives = top 4 scores → with 5 buckets of 2:
    // bucket 1 captures 2/4, bucket 2 captures 4/4, rest flat
    val d = (1 to 10).map(i => (i.toDouble, i >= 7, i.toLong)).toDF("s", "y", "id")
    val out = Eval.liftCurve(d, col("s"), col("y"), col("id"), buckets = 5)
      .orderBy("bucket").collect()
    assert(out.map(_.getAs[Long]("n")).toSeq === Seq.fill(5)(2L))
    assert(out.map(_.getAs[Long]("cum_pos")).toSeq === Seq(2L, 4L, 4L, 4L, 4L))
    assert(math.abs(out(0).getAs[Double]("gain") - 0.5) < 1e-12)
    assert(math.abs(out(0).getAs[Double]("lift") - 2.5) < 1e-12)
    assert(math.abs(out(1).getAs[Double]("lift") - 2.5) < 1e-12)
    assert(math.abs(out(4).getAs[Double]("lift") - 1.0) < 1e-12)
  }

  test("liftCurve bucketed default: matches exact NTILE on distinct scores, no sort in plan") {
    val rng = new scala.util.Random(47)
    val d = rng.shuffle((1 to 500).toList)
      .map(i => (i.toDouble, i % 3 == 0, i.toLong)).toDF("s", "y", "id")
    val bucketed = Eval.liftCurve(d, col("s"), col("y"), col("id"), buckets = 10)
    // the 500 distinct integer scores put the histogram-CDF cuts between
    // the same ranks NTILE splits at, so the curves agree exactly
    val b = bucketed.orderBy("bucket").collect()
    val e = Eval.liftCurve(d, col("s"), col("y"), col("id"), buckets = 10,
      exact = true).orderBy("bucket").collect()
    assert(b.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))).toSeq ===
      e.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq)
    // the scale contract: the default path never total-orders the relation
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("ntile"), s"bucketed plan must not NTILE:\n$plan")
  }

  test("liftCurve bucketed: null-casting and NaN scores drop, not crash or top-bucket") {
    // a null-yielding expression (try_cast under ANSI) and a NaN double
    // must both be excluded from the cuts AND the bucketing (pre-fix:
    // driver NPE in the histogram, or NaN in bucket 1 via Spark's
    // NaN-greatest comparisons)
    val d = (Seq(("n/a", true), ("NaN", true)) ++
      (1 to 20).map(i => (i.toString, i > 10))).toDF("s", "y")
    val out = Eval.liftCurve(d, expr("try_cast(s AS double)"), col("y"),
        col("s"), buckets = 5)
      .orderBy("bucket").collect()
    assert(out.map(_.getAs[Long]("n")).sum === 20L) // both bad rows dropped
    assert(out.head.getAs[Long]("n_pos") === out.head.getAs[Long]("n"))
  }

  test("liftCurve bucketed: heavy ties share a bucket, dense spine keeps 10 rows") {
    // one massive tied score value (80% of rows) swallows several deciles;
    // the emptied buckets must still appear with n = 0
    val d = ((1 to 400).map(_ => (5.0, true, 0L)) ++
      (1 to 100).map(i => (i.toDouble / 1000, false, i.toLong))).toDF("s", "y", "id")
    val out = Eval.liftCurve(d, col("s"), col("y"), col("id"), buckets = 10)
      .orderBy("bucket").collect()
    assert(out.length === 10)
    assert(out.map(_.getAs[Long]("n")).sum === 500L)
    assert(out.exists(_.getAs[Long]("n") === 0L))
    // ties are never split: the 400-row tied value lands in ONE bucket
    assert(out.exists(_.getAs[Long]("n") === 400L))
    // cumulative capture still reaches every positive
    assert(out.last.getAs[Long]("cum_pos") === 400L)
  }

  test("liftCurve bucketed: all-tied scores land in the TOP bucket, spine intact") {
    // single-valued score column: no interior cuts exist — the whole
    // mass is the top slice (gain hits 1.0 at bucket 1), not the bottom
    // row (the pre-round-8 placement, which read as zero gain until the
    // last decile)
    val d = (1 to 50).map(i => (3.25, i % 5 == 0, i.toLong)).toDF("s", "y", "id")
    val out = Eval.liftCurve(d, col("s"), col("y"), col("id"), buckets = 10)
      .orderBy("bucket").collect()
    assert(out.length === 10)
    assert(out.head.getAs[Int]("bucket") === 1)
    assert(out.head.getAs[Long]("n") === 50L)
    assert(out.head.getAs[Long]("n_pos") === 10L)
    assert(out.head.getAs[Double]("gain") === 1.0)
    assert(out.tail.forall(_.getAs[Long]("n") === 0L))
    // zero USABLE rows still yields an empty frame, not a spine of zeros
    val empty = (1 to 5).map(i => (Double.NaN, true, i.toLong)).toDF("s", "y", "id")
    assert(Eval.liftCurve(empty, col("s"), col("y"), col("id")).count() === 0L)
  }

  test("woeBins bucketed: all-tied scores keep the dense spine, mass in bin 1") {
    import graft.operators.Features
    val d = (1 to 40).map(i => (7.0, i % 4 == 0, i.toLong)).toDF("s", "y", "id")
    val out = Features.woeBins(d, col("s"), col("y"), col("id"), bins = 5)
      .orderBy("bin").collect()
    assert(out.length === 5)
    assert(out.head.getAs[Int]("bin") === 1)
    assert(out.head.getAs[Long]("n") === 40L)
    assert(out.tail.forall(_.getAs[Long]("n") === 0L))
  }

  test("rankingMetrics: hand-computed NDCG@5 / MRR@5 / pool recall@5") {
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    // A: rel at ranks 1,3 of 4; B: rel at rank 3 of 5; C: none of 3;
    // D: rel only at rank 6 of 6 (inside the pool, outside the cutoff)
    val rows =
      Seq(("A", 1, 1), ("A", 2, 0), ("A", 3, 1), ("A", 4, 0)) ++
        Seq(("B", 1, 0), ("B", 2, 0), ("B", 3, 1), ("B", 4, 0), ("B", 5, 0)) ++
        Seq(("C", 1, 0), ("C", 2, 0), ("C", 3, 0)) ++
        (1 to 6).map(r => ("D", r, if (r == 6) 1 else 0))
    val df = rows.toDF("q", "rank", "rel")
    val got = Eval.rankingMetrics(df, "q", "rank", "rel", k = 5)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("A")
    assert(a.getLong(1) === 2L)
    val expNdcgA = (1.0 / lg2(2) + 1.0 / lg2(4)) / (1.0 / lg2(2) + 1.0 / lg2(3))
    assert(math.abs(a.getDouble(2) - expNdcgA) < 1e-12)
    assert(a.getDouble(3) === 1.0)
    assert(a.getDouble(4) === 1.0)
    val b = got("B")
    assert(math.abs(b.getDouble(2) - 0.5) < 1e-12)
    assert(math.abs(b.getDouble(3) - 1.0 / 3) < 1e-12)
    assert(b.getDouble(4) === 1.0)
    val c = got("C")
    assert(c.isNullAt(2) && c.getDouble(3) === 0.0 && c.isNullAt(4))
    val d = got("D")
    // relevant item exists in the pool but sits past the cutoff
    assert(d.getLong(1) === 1L)
    assert(d.getDouble(2) === 0.0)
    assert(d.getDouble(3) === 0.0)
    assert(d.getDouble(4) === 0.0)
    intercept[IllegalArgumentException] {
      Eval.rankingMetrics(df, "q", "rank", "rel", k = 0)
    }
  }

  test("anovaOneWay: hand-computed F and the Paulson tail") {
    // groups {1,2,3}, {4,5,6}, {7,8,9}: SSB = 54, SSW = 6, F = 27
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0),
      ("c", 7.0), ("c", 8.0), ("c", 9.0)).toDF("g", "x")
    val r = Eval.anovaOneWay(df, col("g"), col("x")).collect()(0)
    assert(r.getLong(0) === 3L && r.getLong(1) === 9L)
    assert(math.abs(r.getDouble(2) - 54.0) < 1e-9)
    assert(math.abs(r.getDouble(3) - 6.0) < 1e-9)
    assert(math.abs(r.getDouble(4) - 27.0) < 1e-9)
    assert(r.getLong(5) === 2L && r.getLong(6) === 6L)
    // independent Paulson z + A&S erfc recomputation in plain doubles
    val (df1, df2, f) = (2.0, 6.0, 27.0)
    val (a1, a2) = (2.0 / (9 * df1), 2.0 / (9 * df2))
    val f13 = math.cbrt(f)
    val z = ((1 - a2) * f13 - (1 - a1)) / math.sqrt(f13 * f13 * a2 + a1)
    val t = 1.0 / (1.0 + 0.3275911 * (z / math.sqrt(2.0)))
    val poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 +
      t * (-1.453152027 + t * 1.061405429))))
    val p = poly * math.exp(-z * z / 2.0) / 2.0
    assert(math.abs(r.getDouble(7) - p) < 1e-12)
    // identical groups: F = 0-ish numerator, but SSW > 0 keeps it defined
    val flat = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "x")
    val rf = Eval.anovaOneWay(flat, col("g"), col("x")).collect()(0)
    assert(math.abs(rf.getDouble(4)) < 1e-12)
    // no within variance: F undefined
    val degen = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0)).toDF("g", "x")
    val rd = Eval.anovaOneWay(degen, col("g"), col("x")).collect()(0)
    assert(rd.isNullAt(4) && rd.isNullAt(7))
  }

  test("mutualInfo: dependence, independence, normalization") {
    // perfect dependence over a uniform 2x2: I = H = ln 2, NMI = 1
    val dep = Seq(("a", 1), ("a", 1), ("b", 2), ("b", 2)).toDF("x", "y")
    val rd = Eval.mutualInfo(dep, col("x"), col("y")).collect()(0)
    assert(rd.getLong(0) === 4L)
    assert(math.abs(rd.getDouble(1) - math.log(2.0)) < 1e-12)
    assert(math.abs(rd.getDouble(2) - math.log(2.0)) < 1e-12)
    assert(math.abs(rd.getDouble(3) - math.log(2.0)) < 1e-12)
    assert(math.abs(rd.getDouble(4) - 1.0) < 1e-12)
    // full product support: I = 0 exactly
    val ind = Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2)).toDF("x", "y")
    val ri = Eval.mutualInfo(ind, col("x"), col("y")).collect()(0)
    assert(math.abs(ri.getDouble(3)) < 1e-12)
    assert(math.abs(ri.getDouble(4)) < 1e-12)
    // constant y: H(Y) = 0, NMI undefined, MI = 0
    val cy = Seq(("a", 1), ("b", 1)).toDF("x", "y")
    val rc = Eval.mutualInfo(cy, col("x"), col("y")).collect()(0)
    assert(math.abs(rc.getDouble(3)) < 1e-12 && rc.isNullAt(4))
  }
}
