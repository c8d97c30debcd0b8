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
}
