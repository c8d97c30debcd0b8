package graft.reg

/** `sql_only` analogue for the quantile fit: renders the ENTIRE
  * fixed-iteration IRLS as one runnable ANSI-SQL statement — OLS init CTE
  * (β₀ plus the Powell bandwidth h = σ̂₀·n^(−1/3)), one unrolled
  * reweighted step per iteration (each a scan of the base relation with
  * the check-loss weight spelled as a CASE on the literal-β residual),
  * and the Powell uniform-kernel sandwich from one final scan. Restricted
  * to the 2-parameter model where every solve has a closed form — the
  * [[RlmSqlGen]]/[[GlmSqlGen]] contract: the driver's correctness oracle
  * executes THIS text, so every round re-proves the emitted SQL agrees
  * with the engine (float32).
  */
object QregSqlGen {

  def irlsSql(
      table: String,
      xCol: String,
      yCol: String,
      tau: Double,
      iters: Int,
      eps: Double
  ): String = {
    require(iters >= 1)
    require(tau > 0 && tau < 1)
    val base =
      s"""SELECT CAST($xCol AS DOUBLE) AS x, CAST($yCol AS DOUBLE) AS y
         |  FROM $table WHERE $xCol IS NOT NULL AND $yCol IS NOT NULL""".stripMargin
    // OLS init + the Powell bandwidth from the init residual scale
    val init =
      s"""m AS (SELECT count(*)::DOUBLE n, sum(x) sx, sum(y) sy,
         |    sum(x*x) sxx, sum(x*y) sxy, sum(y*y) syy FROM b),
         |f0 AS (SELECT n, b0, b1,
         |    sqrt(greatest(syy - 2*(b0*sy + b1*sxy)
         |          + (b0*b0*n + 2*b0*b1*sx + b1*b1*sxx), 0) / greatest(n - 2, 1))
         |      * pow(n, -1.0/3.0) AS h
         |  FROM (SELECT m.*, (n*sxy - sx*sy)/(n*sxx - sx*sx) AS b1,
         |          sy/n - (n*sxy - sx*sy)/(n*sxx - sx*sx)*sx/n AS b0 FROM m) t0)""".stripMargin
    // each step: check-loss weights from the literal-β residual, then the
    // closed-form weighted solve; n and h ride along unchanged
    def step(j: Int) = {
      val f = s"f${j - 1}"
      s"""i$j AS (SELECT max(n) n, max(h) h, sum(w) sw, sum(w*x) swx,
         |    sum(w*x*x) swxx, sum(w*y) swy, sum(w*x*y) swxy
         |  FROM (SELECT x, y, n, h,
         |     (CASE WHEN r >= 0 THEN $tau ELSE ${1.0 - tau} END)
         |       / greatest(abs(r), $eps) AS w
         |   FROM (SELECT x, y, n, h, y - ($f.b0 + $f.b1*x) AS r
         |         FROM b CROSS JOIN $f) r$j) w$j),
         |f$j AS (SELECT n, h,
         |    (sw*swxy - swx*swy)/(sw*swxx - swx*swx) AS b1,
         |    swy/sw - (sw*swxy - swx*swy)/(sw*swxx - swx*swx)*swx/sw AS b0
         |  FROM i$j)""".stripMargin
    }
    val f = s"f$iters"
    def res = s"(y - ($f.b0 + $f.b1*x))"
    // Powell uniform-kernel sandwich: A = Σ1{|r|≤h}·xxᵀ/(2h), B = τ(1−τ)·Σxxᵀ
    val sandwich =
      s"""sand AS (SELECT max(n) n, max(h) h,
         |    sum(CASE WHEN abs($res) <= h THEN 1.0 ELSE 0.0 END) a_c,
         |    sum(CASE WHEN abs($res) <= h THEN x ELSE 0.0 END) a_cx,
         |    sum(CASE WHEN abs($res) <= h THEN x*x ELSE 0.0 END) a_xx,
         |    count(*)::DOUBLE s1, sum(x) s_x, sum(x*x) s_xx
         |  FROM b CROSS JOIN $f),
         |se AS (SELECT n, h, a_c*a_xx - a_cx*a_cx AS det, a_c, a_cx, a_xx,
         |    s1, s_x, s_xx FROM sand)""".stripMargin
    val tt = tau * (1.0 - tau)
    val ctes = Seq(s"b AS ($base)", init) ++ (1 to iters).map(step) :+ sandwich
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT term, estimate::REAL AS estimate, std_error::REAL AS std_error
       |FROM (
       | SELECT '(Intercept)' AS term, f.b0 AS estimate,
       |   sqrt(s.n/(s.n - 2) * 4*s.h*s.h * $tt
       |     * (s.a_xx*s.a_xx*s.s1 - 2*s.a_xx*s.a_cx*s.s_x
       |        + s.a_cx*s.a_cx*s.s_xx)/(s.det*s.det)) AS std_error
       |   FROM $f f CROSS JOIN se s
       | UNION ALL
       | SELECT '$xCol', f.b1,
       |   sqrt(s.n/(s.n - 2) * 4*s.h*s.h * $tt
       |     * (s.a_cx*s.a_cx*s.s1 - 2*s.a_c*s.a_cx*s.s_x
       |        + s.a_c*s.a_c*s.s_xx)/(s.det*s.det))
       |   FROM $f f CROSS JOIN se s) u
       |ORDER BY term""".stripMargin
  }

  /** Conformalized-quantile-regression oracle ([[Conformal.cqr]], Romano
    * et al. 2019) as one self-contained SQL statement: outer fit/test
    * hash split, inner train/cal split, TWO unrolled check-loss IRLS
    * chains (τ = α/2 and 1 − α/2 — the OLS init CTE is shared, β₀ does
    * not depend on τ), the CQR score order statistic
    * k = ⌈(1−α)(n_cal+1)⌉, and the test-split coverage/width report.
    * `ridExpr` is the SQL expression for the deterministic row key the
    * engine's `hashSplit` dealt on. */
  def cqrSql(
      table: String,
      ridExpr: String,
      xCol: String,
      yCol: String,
      alpha: Double,
      iters: Int,
      eps: Double,
      outerSalt: String,
      innerSalt: String
  ): String = {
    require(iters >= 1)
    require(alpha > 0 && alpha < 1)
    def h32(e: String) = s"('0x' || substr(md5($e),1,8))::BIGINT"
    def chain(prefix: String, tau: Double): Seq[String] = {
      def step(j: Int) = {
        val f = if (j == 1) "f0" else s"${prefix}f${j - 1}"
        s"""${prefix}i$j AS (SELECT sum(w) sw, sum(w*x) swx,
           |    sum(w*x*x) swxx, sum(w*y) swy, sum(w*x*y) swxy
           |  FROM (SELECT x, y,
           |     (CASE WHEN r >= 0 THEN $tau ELSE ${1.0 - tau} END)
           |       / greatest(abs(r), $eps) AS w
           |   FROM (SELECT x, y, y - ($f.b0 + $f.b1*x) AS r
           |         FROM tr CROSS JOIN $f) ${prefix}r$j) ${prefix}w$j),
           |${prefix}f$j AS (SELECT
           |    (sw*swxy - swx*swy)/(sw*swxx - swx*swx) AS b1,
           |    swy/sw - (sw*swxy - swx*swy)/(sw*swxx - swx*swx)*swx/sw AS b0
           |  FROM ${prefix}i$j)""".stripMargin
      }
      (1 to iters).map(step)
    }
    val fl = s"lo_f$iters"
    val fh = s"hi_f$iters"
    val k = s"CAST(ceil(${1.0 - alpha}*(nc+1)) AS BIGINT)"
    val ctes = Seq(
      s"""r0 AS (SELECT $ridExpr AS rid, CAST($xCol AS DOUBLE) AS x,
         |    CAST($yCol AS DOUBLE) AS y FROM $table)""".stripMargin,
      s"d AS (SELECT *, ${h32(s"'$outerSalt' || rid")} / 4294967296.0 AS u1 FROM r0)",
      s"""fitp AS (SELECT *, ${h32(s"'$innerSalt' || rid")} / 4294967296.0 AS u2
         |  FROM d WHERE u1 < 0.8)""".stripMargin,
      s"""tr AS (SELECT x, y FROM fitp
         |  WHERE u2 < 0.5 AND x IS NOT NULL AND y IS NOT NULL)""".stripMargin,
      s"""m AS (SELECT count(*)::DOUBLE n, sum(x) sx, sum(y) sy,
         |    sum(x*x) sxx, sum(x*y) sxy FROM tr)""".stripMargin,
      s"""f0 AS (SELECT (n*sxy - sx*sy)/(n*sxx - sx*sx) AS b1,
         |    sy/n - (n*sxy - sx*sy)/(n*sxx - sx*sx)*sx/n AS b0 FROM m)""".stripMargin) ++
      chain("lo_", alpha / 2.0) ++ chain("hi_", 1.0 - alpha / 2.0) ++ Seq(
      s"""calsc AS (SELECT greatest(($fl.b0 + $fl.b1*x) - y,
         |    y - ($fh.b0 + $fh.b1*x)) AS s
         |  FROM fitp CROSS JOIN $fl CROSS JOIN $fh
         |  WHERE u2 >= 0.5 AND x IS NOT NULL AND y IS NOT NULL)""".stripMargin,
      "ks AS (SELECT count(*)::BIGINT AS nc FROM calsc)",
      s"kk AS (SELECT nc, $k AS k FROM ks)",
      "rk AS (SELECT s, row_number() OVER (ORDER BY s) AS rn FROM calsc)",
      "qh AS (SELECT rk.s AS qhat FROM rk, kk WHERE rk.rn = kk.k)",
      "te AS (SELECT x, y FROM d WHERE u1 >= 0.8)",
      s"""cov AS (SELECT count(*)::BIGINT AS n_test,
         |    avg(CASE WHEN x IS NULL OR y IS NULL THEN NULL
         |        WHEN y >= ($fl.b0 + $fl.b1*x) - qhat
         |         AND y <= ($fh.b0 + $fh.b1*x) + qhat THEN 1.0 ELSE 0.0 END)
         |      AS coverage,
         |    avg(($fh.b0 + $fh.b1*x) - ($fl.b0 + $fl.b1*x) + 2*qhat)
         |      AS mean_width
         |  FROM te CROSS JOIN $fl CROSS JOIN $fh CROSS JOIN qh)""".stripMargin)
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT n_test, coverage::REAL AS coverage,
       |  mean_width::REAL AS mean_width,
       |  (SELECT qhat FROM qh)::REAL AS qhat,
       |  (SELECT nc FROM ks)::BIGINT AS n_cal
       |FROM cov""".stripMargin
  }

  /** Per-group variant of [[irlsSql]]: the same unrolled check-loss steps
    * with the group key `g` carried through every CTE (GROUP BY g sums,
    * per-group closed-form solve, per-group Powell bandwidth, β re-attached
    * with a USING (g) join). Mirrors [[Qreg.fitGrouped]]'s fixed-iteration
    * contract — the [[GlmSqlGen.groupedIrlsSql]] pattern. */
  def groupedIrlsSql(
      table: String,
      gCol: String,
      xCol: String,
      yCol: String,
      tau: Double,
      iters: Int,
      eps: Double
  ): String = {
    require(iters >= 1)
    require(tau > 0 && tau < 1)
    val base =
      s"""SELECT CAST($gCol AS VARCHAR) AS g, CAST($xCol AS DOUBLE) AS x,
         |    CAST($yCol AS DOUBLE) AS y
         |  FROM $table WHERE $gCol IS NOT NULL AND $xCol IS NOT NULL
         |    AND $yCol IS NOT NULL""".stripMargin
    val init =
      s"""m AS (SELECT g, count(*)::DOUBLE n, sum(x) sx, sum(y) sy,
         |    sum(x*x) sxx, sum(x*y) sxy, sum(y*y) syy FROM b GROUP BY g),
         |f0 AS (SELECT g, n, b0, b1,
         |    sqrt(greatest(syy - 2*(b0*sy + b1*sxy)
         |          + (b0*b0*n + 2*b0*b1*sx + b1*b1*sxx), 0) / greatest(n - 2, 1))
         |      * pow(n, -1.0/3.0) AS h
         |  FROM (SELECT m.*, (n*sxy - sx*sy)/(n*sxx - sx*sx) AS b1,
         |          sy/n - (n*sxy - sx*sy)/(n*sxx - sx*sx)*sx/n AS b0 FROM m) t0)""".stripMargin
    def step(j: Int) = {
      val f = s"f${j - 1}"
      s"""i$j AS (SELECT g, max(n) n, max(h) h, sum(w) sw, sum(w*x) swx,
         |    sum(w*x*x) swxx, sum(w*y) swy, sum(w*x*y) swxy
         |  FROM (SELECT g, x, y, n, h,
         |     (CASE WHEN r >= 0 THEN $tau ELSE ${1.0 - tau} END)
         |       / greatest(abs(r), $eps) AS w
         |   FROM (SELECT b.g, x, y, n, h, y - (f.b0 + f.b1*x) AS r
         |         FROM b JOIN $f f USING (g)) r$j) w$j GROUP BY g),
         |f$j AS (SELECT g, n, h,
         |    (sw*swxy - swx*swy)/(sw*swxx - swx*swx) AS b1,
         |    swy/sw - (sw*swxy - swx*swy)/(sw*swxx - swx*swx)*swx/sw AS b0
         |  FROM i$j)""".stripMargin
    }
    val f = s"f$iters"
    val res = s"(y - (f.b0 + f.b1*x))"
    val sandwich =
      s"""sand AS (SELECT g, max(n) n, max(h) h,
         |    sum(CASE WHEN abs($res) <= h THEN 1.0 ELSE 0.0 END) a_c,
         |    sum(CASE WHEN abs($res) <= h THEN x ELSE 0.0 END) a_cx,
         |    sum(CASE WHEN abs($res) <= h THEN x*x ELSE 0.0 END) a_xx,
         |    count(*)::DOUBLE s1, sum(x) s_x, sum(x*x) s_xx
         |  FROM b JOIN $f f USING (g) GROUP BY g),
         |se AS (SELECT g, n, h, a_c*a_xx - a_cx*a_cx AS det, a_c, a_cx, a_xx,
         |    s1, s_x, s_xx FROM sand)""".stripMargin
    val tt = tau * (1.0 - tau)
    val ctes = Seq(s"b AS ($base)", init) ++ (1 to iters).map(step) :+ sandwich
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT "group", term, estimate::REAL AS estimate,
       |  std_error::REAL AS std_error
       |FROM (
       | SELECT f.g AS "group", '(Intercept)' AS term, f.b0 AS estimate,
       |   sqrt(s.n/(s.n - 2) * 4*s.h*s.h * $tt
       |     * (s.a_xx*s.a_xx*s.s1 - 2*s.a_xx*s.a_cx*s.s_x
       |        + s.a_cx*s.a_cx*s.s_xx)/(s.det*s.det)) AS std_error
       |   FROM $f f JOIN se s USING (g)
       | UNION ALL
       | SELECT f.g, '$xCol', f.b1,
       |   sqrt(s.n/(s.n - 2) * 4*s.h*s.h * $tt
       |     * (s.a_cx*s.a_cx*s.s1 - 2*s.a_c*s.a_cx*s.s_x
       |        + s.a_c*s.a_c*s.s_xx)/(s.det*s.det))
       |   FROM $f f JOIN se s USING (g)) u
       |ORDER BY "group", term""".stripMargin
  }
}
