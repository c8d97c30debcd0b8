package graft

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

import graft.formula.Formula
import graft.linalg.LinAlg

/** Randomized property tests for the pure (non-Spark) components: formula
  * parser and driver linear algebra (replacing the reference's seeded-sim
  * style, SURVEY.md §5 port plan). Seeds are fixed for reproducibility.
  */
class PropertySpec extends AnyFunSuite {

  private def idents(rng: scala.util.Random, n: Int): Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    while (out.size < n)
      out += ("v" + rng.alphanumeric.filter(_.isLetterOrDigit).take(6).mkString.toLowerCase)
    out.toSeq
  }

  test("formula: star expansion always contains mains and the full interaction") {
    val rng = new scala.util.Random(1)
    (1 to 100).foreach { _ =>
      val Seq(y, a, b) = idents(rng, 3)
      val f = Formula.parse(s"$y ~ $a*$b")
      val labels = f.terms.map(_.label)
      assert(labels.contains(a) && labels.contains(b) && labels.contains(s"$a:$b"))
      assert(f.y == y && f.intercept)
    }
  }

  test("formula: fe bar splits variables correctly for random names") {
    val rng = new scala.util.Random(2)
    (1 to 100).foreach { _ =>
      val Seq(y, x, fe) = idents(rng, 3)
      val f = Formula.parse(s"$y ~ $x | $fe")
      assert(f.xvars == List(x) && f.fe == List(fe))
      assert(f.allInputCols.toSet == Set(y, x, fe))
    }
  }

  private def spd(rng: scala.util.Random, p: Int): (DenseMatrix[Double], DenseVector[Double]) = {
    val a = DenseMatrix.tabulate(p + 2, p)((_, _) => rng.nextGaussian())
    (a.t * a + DenseMatrix.eye[Double](p) * 0.5,
      DenseVector.tabulate(p)(_ => rng.nextGaussian()))
  }

  test("linalg: solveDetecting on random SPD matches direct solve, keeps everything") {
    val rng = new scala.util.Random(3)
    (1 to 50).foreach { _ =>
      val p = 1 + rng.nextInt(8)
      val (xtx, xty) = spd(rng, p)
      val out = LinAlg.solveDetecting(xtx, xty)
      assert(out.dropIdx.isEmpty)
      val direct = xtx \ xty
      val diff = breeze.linalg.norm(out.beta - direct)
      assert(diff < 1e-6 * (1.0 + breeze.linalg.norm(direct)), s"diff $diff")
      val idErr = breeze.linalg.sum(breeze.numerics.abs(
        xtx * out.xtxInv - DenseMatrix.eye[Double](p)))
      assert(idErr < 1e-6 * p * p)
    }
  }

  test("linalg: a duplicated column is always detected and dropped") {
    val rng = new scala.util.Random(4)
    (1 to 50).foreach { _ =>
      val p = 1 + rng.nextInt(8)
      val (xtx, xty) = spd(rng, p)
      val m = DenseMatrix.zeros[Double](p + 1, p + 1)
      m(0 until p, 0 until p) := xtx
      m(p, 0 until p) := xtx(p - 1, ::)
      m(0 until p, p) := xtx(::, p - 1)
      m(p, p) = xtx(p - 1, p - 1)
      val b = DenseVector.vertcat(xty, DenseVector(xty(p - 1)))
      val out = LinAlg.solveDetecting(m, b)
      assert(out.dropIdx.nonEmpty)
      assert(out.keepIdx.length == p)
    }
  }

  test("linalg: symmetricFromUpper round-trips") {
    val rng = new scala.util.Random(5)
    (1 to 50).foreach { _ =>
      val p = 1 + rng.nextInt(10)
      val upper = Array.fill(p * (p + 1) / 2)(rng.nextGaussian())
      val m = LinAlg.symmetricFromUpper(p, upper)
      assert(m == m.t)
      var k = 0
      for (i <- 0 until p; j <- i until p) {
        assert(m(i, j) == upper(k)); k += 1
      }
    }
  }

  test("t critical values invert the p-value for random df/levels") {
    val rng = new scala.util.Random(6)
    (1 to 100).foreach { _ =>
      val df = 3.0 + rng.nextDouble() * 497.0
      val level = 0.5 + rng.nextDouble() * 0.49
      val crit = LinAlg.tCrit(level, df)
      val p = LinAlg.pValue(crit, df)
      assert(math.abs(p - (1.0 - level)) < 1e-9, s"p=$p level=$level")
    }
  }
}
