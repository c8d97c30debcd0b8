package graft.formula

/** Regression formula AST + parser.
  *
  * Grammar (R-style, cf. reference utils.R:224-258):
  * {{{
  *   formula := y '~' terms ('|' fe ('+' fe)*)?
  *   terms   := term ('+' term)*
  *   term    := part ('*' part)* | part (':' part)*   // '*' desugars
  * }}}
  * `a*b` desugars to `a + b + a:b` (n-way: all non-empty subsets,
  * mains first). A leading `0` or `1` term controls the intercept
  * (`1` default; `0` suppresses, used by the binscatter path).
  */
final case class Term(parts: List[String]) {
  def isInteraction: Boolean = parts.length > 1
  /** Display name, R-style `a:b`. */
  def label: String = parts.mkString(":")
}

final case class Formula(
    y: String,
    terms: List[Term],
    fe: List[String],
    intercept: Boolean
) {
  def xvars: List[String] = terms.flatMap(_.parts).distinct
  def hasInteractions: Boolean = terms.exists(_.isInteraction)
  /** All columns the model touches (y, regressors, fixed effects). */
  def allInputCols: List[String] = (y :: xvars) ++ fe
}

object Formula {
  final case class ParseException(msg: String) extends IllegalArgumentException(msg)

  /** Parse `y ~ x1 + x2*x3 | fe1 + fe2`. */
  def parse(s: String): Formula = {
    val sides = s.split("~", -1).map(_.trim)
    if (sides.length != 2)
      throw ParseException(s"formula must have exactly one '~': $s")
    val lhsVars = splitTop(sides(0), '+').map(_.trim).filter(_.nonEmpty)
    if (lhsVars.length != 1)
      throw ParseException(s"formula must have exactly one response variable: $s")
    val y = lhsVars.head

    val rhsParts = sides(1).split("\\|", -1).map(_.trim)
    if (rhsParts.length > 2)
      throw ParseException(s"at most one '|' (fixed-effect bar) allowed: $s")
    val termSrc = rhsParts(0)
    val fe =
      if (rhsParts.length == 2)
        rhsParts(1).split("\\+").map(_.trim).filter(_.nonEmpty).toList
      else Nil

    var intercept = true
    val rawTerms = splitTop(termSrc, '+').map(_.trim).filter(_.nonEmpty)
    val expanded = scala.collection.mutable.LinkedHashSet.empty[List[String]]
    rawTerms.foreach {
      case "1" => intercept = true
      case "0" | "-1" => intercept = false
      case t => expandTerm(t).foreach(expanded += _)
    }
    if (expanded.isEmpty)
      throw ParseException(s"formula must include at least one regressor: $s")
    Formula(y, expanded.toList.map(Term(_)), fe, intercept)
  }

  /** `a*b*c` → subsets ordered mains-first; `a:b` stays one term. */
  private def expandTerm(t: String): List[List[String]] = {
    val starParts = splitTop(t, '*').map(_.trim)
    if (starParts.length == 1) {
      List(splitTop(t, ':').map(_.trim).filter(_.nonEmpty))
    } else {
      // each star part may itself be an interaction chunk like a:b
      val units = starParts.map(p => splitTop(p, ':').map(_.trim))
      val n = units.length
      // all non-empty subsets, ordered by size then appearance
      (1 to n).toList.flatMap { k =>
        units.indices.combinations(k).map { idxs =>
          idxs.toList.flatMap(units(_))
        }.toList
      }
    }
  }

  /** Split on a single-char separator (no nesting in this grammar). */
  private def splitTop(s: String, sep: Char): List[String] =
    s.split(java.util.regex.Pattern.quote(sep.toString), -1).toList
}

/** Variance estimator request (reference utils.R:276-314). */
sealed trait Vcov
object Vcov {
  case object Iid extends Vcov
  case object Hc1 extends Vcov
  final case class Cluster(col: String) extends Vcov

  /** Accepts "iid" | "hc1" | "~cluster_col". */
  def parse(s: String): Vcov = s.trim.toLowerCase match {
    case "iid" => Iid
    case "hc1" => Hc1
    case c if c.startsWith("~") =>
      val cols = c.drop(1).split("\\+").map(_.trim).filter(_.nonEmpty)
      if (cols.length != 1)
        throw Formula.ParseException(
          "only single-variable clustering is supported (as in the reference)")
      Cluster(cols.head)
    case other =>
      throw Formula.ParseException(s"unknown vcov spec: $other")
  }
}
