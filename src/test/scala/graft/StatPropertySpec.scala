package graft

import org.apache.spark.sql.functions._

import graft.reg.{Eval, Isotonic, Ridge}

/** Randomized invariant tests for the statistics family (seeded — the
  * reference's seeded-sim style applied to the beyond-reference surface).
  */
class StatPropertySpec extends SparkTestBase {
  import spark.implicits._

  test("AUC is invariant under strictly monotone score transforms") {
    for (seed <- Seq(7, 8, 9)) {
      val rng = new scala.util.Random(seed)
      val df = (1 to 300).map { _ =>
        (rng.nextInt(20).toDouble, rng.nextBoolean())
      }.toDF("score", "label")
      val base = Eval.auc(df, col("score"), col("label"))
      val affine = Eval.auc(df, col("score") * 3.5 + 11.0, col("label"))
      val expT = Eval.auc(df, exp(col("score") / 5.0), col("label"))
      assert(base == affine, s"affine: $base vs $affine")
      assert(math.abs(base - expT) < 1e-12, s"exp: $base vs $expT")
      // and anti-monotone transforms flip it
      val neg = Eval.auc(df, -col("score"), col("label"))
      assert(math.abs(base + neg - 1.0) < 1e-12)
    }
  }

  test("ridge slope magnitude decreases monotonically along the lambda path") {
    for (seed <- Seq(4, 5)) {
      val rng = new scala.util.Random(seed)
      val df = (1 to 200).map { _ =>
        val x1 = rng.nextGaussian(); val x2 = 0.5 * x1 + rng.nextGaussian()
        (1.0 + x1 + 2.0 * x2 + rng.nextGaussian(), x1, x2)
      }.toDF("y", "x1", "x2")
      val lambdas = Seq(0.0, 1.0, 10.0, 100.0, 1000.0, 1e5)
      val path = Ridge.path("y ~ x1 + x2", df, lambdas)
      val norms = path.map(f =>
        math.sqrt(f.estimates.drop(1).map(b => b * b).sum))
      assert(norms.zip(norms.tail).forall { case (hi, lo) => hi >= lo - 1e-12 },
        s"seed $seed norms $norms")
    }
  }

  test("isotonic fitted values are a PAV fixed point (idempotence)") {
    for (seed <- Seq(13, 14)) {
      val rng = new scala.util.Random(seed)
      val df = (1 to 400).map { _ =>
        val s = rng.nextInt(15).toDouble
        (s, rng.nextDouble() < 0.1 + 0.04 * s)
      }.toDF("s", "y")
      val m1 = Isotonic.fit(df, col("s"), col("y"))
        .collect().map(r => (r.getDouble(0), r.getDouble(2)))
      // refit on the fitted map itself (already monotone ⇒ unchanged)
      val m2 = Isotonic.fit(m1.toSeq.toDF("s", "cal"), col("s"), col("cal"))
        .collect().map(r => (r.getDouble(0), r.getDouble(2)))
      m1.zip(m2).foreach { case ((s1, v1), (s2, v2)) =>
        assert(s1 == s2 && math.abs(v1 - v2) < 1e-12, s"score $s1: $v1 vs $v2")
      }
    }
  }

  test("Mann-Whitney U equals AUC·n₁·n₂ (two independent implementations)") {
    import org.apache.spark.sql.functions._
    // deterministic pseudo-random mixed sample with ties
    val rows = (1 to 200).map { i =>
      val f = (i * 2654435761L % 97) % 2 == 0
      val v = ((i * 40503L % 101) % 23).toDouble + (if (f) 2.0 else 0.0)
      (f, v)
    }
    val df = rows.toDF("f", "v")
    val mw = graft.reg.Eval.mannWhitney(df, col("f"), col("v")).head
    val (na, nb) = (mw.getAs[Long]("n_a"), mw.getAs[Long]("n_b"))
    // AUC of v predicting f uses the SAME tie convention (half credit):
    // U(A beats B) = AUC · n_pos · n_neg
    val auc = graft.reg.Eval.auc(df, col("v"), col("f"))
    assert(math.abs(mw.getAs[Double]("u") - auc * na * nb) < 1e-9)
  }

  test("correlation matrix is invariant under positive affine transforms") {
    import org.apache.spark.sql.functions._
    val rows = (1 to 100).map { i =>
      val x = (i * 7 % 31).toDouble
      (x, x * 0.5 + (i * 13 % 17), (i * 5 % 11).toDouble)
    }
    val df = rows.toDF("a", "b", "c")
    def corr(d: org.apache.spark.sql.DataFrame) =
      graft.reg.Eval.corrMatrix(d, Seq("a", "b", "c"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          r.getDouble(3)).toMap
    val base = corr(df)
    val scaled = corr(df.withColumn("a", col("a") * 2.0 + 100.0))
    base.foreach { case (k, v) =>
      assert(math.abs(scaled(k) - v) < 1e-9, s"pair $k moved: $v -> ${scaled(k)}")
    }
    // negative scaling flips the a-involving correlations
    val neg = corr(df.withColumn("a", col("a") * -1.0))
    assert(math.abs(neg(("a", "b")) + base(("a", "b"))) < 1e-9)
    assert(math.abs(neg(("b", "c")) - base(("b", "c"))) < 1e-9)
  }
}
