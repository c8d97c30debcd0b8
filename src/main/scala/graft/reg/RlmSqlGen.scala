package graft.reg

/** `sql_only` analogue for the Huber robust fit: renders the ENTIRE
  * fixed-iteration IRLS as one runnable ANSI-SQL statement — OLS init CTE
  * (β₀ and the pinned scale σ), one unrolled reweighted step per iteration
  * (each a scan of the base relation with the Huber weight spelled as a
  * CASE on the literal-β residual), and the A⁻¹BA⁻¹ sandwich from one
  * final scan. Restricted to the 2-parameter model where every solve has a
  * closed form — the same contract as [[GlmSqlGen]], and like q95/q96 the
  * driver's correctness oracle executes THIS text, so every round re-proves
  * the emitted SQL agrees with the engine (float32).
  */
object RlmSqlGen {

  def irlsSql(
      table: String,
      xCol: String,
      yCol: String,
      k: Double,
      iters: Int
  ): String = {
    require(iters >= 1)
    val base =
      s"""SELECT CAST($xCol AS DOUBLE) AS x, CAST($yCol AS DOUBLE) AS y
         |  FROM $table WHERE $xCol IS NOT NULL AND $yCol IS NOT NULL""".stripMargin
    val init =
      s"""m AS (SELECT count(*)::DOUBLE n, sum(x) sx, sum(y) sy,
         |    sum(x*x) sxx, sum(x*y) sxy, sum(y*y) syy FROM b),
         |f0 AS (SELECT n, b0, b1,
         |    sqrt((syy - 2*(b0*sy + b1*sxy)
         |          + (b0*b0*n + 2*b0*b1*sx + b1*b1*sxx)) / (n - 2)) AS sigma
         |  FROM (SELECT m.*, (n*sxy - sx*sy)/(n*sxx - sx*sx) AS b1,
         |          sy/n - (n*sxy - sx*sy)/(n*sxx - sx*sx)*sx/n AS b0 FROM m) t0)""".stripMargin
    val kap = Rlm.kappa(k)
    def res(f: String) = s"(y - ($f.b0 + $f.b1*x))"
    // each step: Huber weights + the Proposal-2 truncated-second-moment
    // scale sum in ONE scan, then the closed-form weighted solve and the
    // σ update σ² = Σmin(|r|,kσ)²/((n−2)·κ)
    def step(j: Int) = {
      val f = s"f${j - 1}"
      s"""i$j AS (SELECT max(n) n, max(sigma) sigma, sum(w) sw, sum(w*x) swx,
         |    sum(w*x*x) swxx, sum(w*y) swy, sum(w*x*y) swxy,
         |    sum(least(abs(r), $k*sigma)*least(abs(r), $k*sigma)) sc2
         |  FROM (SELECT x, y, n, sigma, r,
         |     CASE WHEN abs(r) <= $k*sigma THEN 1.0
         |          ELSE $k*sigma/abs(r) END AS w
         |   FROM (SELECT x, y, n, sigma, y - ($f.b0 + $f.b1*x) AS r
         |         FROM b CROSS JOIN $f) r$j) w$j),
         |f$j AS (SELECT n, sqrt(sc2/((n - 2)*$kap)) AS sigma,
         |    (sw*swxy - swx*swy)/(sw*swxx - swx*swx) AS b1,
         |    swy/sw - (sw*swxy - swx*swy)/(sw*swxx - swx*swx)*swx/sw AS b0
         |  FROM i$j)""".stripMargin
    }
    val f = s"f$iters"
    val sandwich =
      s"""sand AS (SELECT max(n) n,
         |    sum(CASE WHEN ins THEN 1.0 ELSE 0.0 END) a_c,
         |    sum(CASE WHEN ins THEN x ELSE 0.0 END) a_cx,
         |    sum(CASE WHEN ins THEN x*x ELSE 0.0 END) a_xx,
         |    sum(psi*psi) b_c, sum(psi*psi*x) b_cx, sum(psi*psi*x*x) b_xx
         |  FROM (SELECT x, n, abs(${res(f)}) <= $k*sigma AS ins,
         |     CASE WHEN abs(${res(f)}) <= $k*sigma THEN ${res(f)}
         |          ELSE $k*sigma*sign(${res(f)}) END AS psi
         |   FROM b CROSS JOIN $f) t),
         |se AS (SELECT n, a_c*a_xx - a_cx*a_cx AS det, a_c, a_cx, a_xx,
         |    b_c, b_cx, b_xx FROM sand)""".stripMargin
    val ctes = Seq(s"b AS ($base)", init) ++ (1 to iters).map(step) :+ sandwich
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT term, estimate::REAL AS estimate, std_error::REAL AS std_error
       |FROM (
       | SELECT '(Intercept)' AS term, f.b0 AS estimate,
       |   sqrt(s.n/(s.n - 2) * (s.a_xx*s.a_xx*s.b_c - 2*s.a_xx*s.a_cx*s.b_cx
       |     + s.a_cx*s.a_cx*s.b_xx)/(s.det*s.det)) AS std_error
       |   FROM $f f CROSS JOIN se s
       | UNION ALL
       | SELECT '$xCol', f.b1,
       |   sqrt(s.n/(s.n - 2) * (s.a_cx*s.a_cx*s.b_c - 2*s.a_c*s.a_cx*s.b_cx
       |     + s.a_c*s.a_c*s.b_xx)/(s.det*s.det))
       |   FROM $f f CROSS JOIN se s) u
       |ORDER BY term""".stripMargin
  }
}
