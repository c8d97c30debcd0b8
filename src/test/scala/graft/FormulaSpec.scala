package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.formula.{Formula, Term, Vcov}

class FormulaSpec extends AnyFunSuite {
  test("simple formula") {
    val f = Formula.parse("y ~ x1 + x2")
    assert(f.y == "y")
    assert(f.terms == List(Term(List("x1")), Term(List("x2"))))
    assert(f.fe.isEmpty && f.intercept)
  }

  test("fixed effects bar") {
    val f = Formula.parse("y ~ x1 + x2 | fe1 + fe2")
    assert(f.fe == List("fe1", "fe2"))
    assert(f.xvars == List("x1", "x2"))
  }

  test("interaction colon") {
    val f = Formula.parse("y ~ a:b")
    assert(f.terms == List(Term(List("a", "b"))))
    assert(f.hasInteractions)
  }

  test("star desugars to mains plus interaction") {
    val f = Formula.parse("y ~ a*b")
    assert(f.terms == List(Term(List("a")), Term(List("b")), Term(List("a", "b"))))
  }

  test("three-way star expands all subsets mains-first") {
    val f = Formula.parse("y ~ a*b*c")
    assert(f.terms.map(_.label) ==
      List("a", "b", "c", "a:b", "a:c", "b:c", "a:b:c"))
  }

  test("star dedups against explicit mains") {
    val f = Formula.parse("y ~ a + a*b")
    assert(f.terms.map(_.label) == List("a", "b", "a:b"))
  }

  test("intercept suppression") {
    assert(!Formula.parse("y ~ 0 + x").intercept)
    assert(!Formula.parse("y ~ -1 + x").intercept)
    assert(Formula.parse("y ~ 1 + x").intercept)
  }

  test("errors: no regressors, two LHS, two bars") {
    intercept[IllegalArgumentException](Formula.parse("y ~ 0"))
    intercept[IllegalArgumentException](Formula.parse("y + z ~ x"))
    intercept[IllegalArgumentException](Formula.parse("y ~ x | a | b"))
  }

  test("vcov parse") {
    assert(Vcov.parse("iid") == Vcov.Iid)
    assert(Vcov.parse("HC1") == Vcov.Hc1)
    assert(Vcov.parse("~firm") == Vcov.Cluster("firm"))
    intercept[IllegalArgumentException](Vcov.parse("~a + b"))
    intercept[IllegalArgumentException](Vcov.parse("bootstrap"))
  }
}
