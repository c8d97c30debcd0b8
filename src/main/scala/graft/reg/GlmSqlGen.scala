package graft.reg

/** `sql_only` analogue for the GLM extension (reference dbreg.R:760-762
  * exposes the OLS aggregation SQL the same way): renders the ENTIRE
  * fixed-iteration IRLS fit as one runnable ANSI-SQL statement — cells CTE,
  * one unrolled Newton step per iteration (weighted sums + closed-form
  * solve), Wald SEs from the final step's XᵀWX.
  *
  * Restricted to the 2-parameter model (intercept + one regressor): that is
  * exactly the class where the per-step normal-equations solve has a
  * closed form a SQL engine can evaluate; wider designs need the matrix
  * solve and stay engine-side. The driver's correctness gate executes this
  * text in DuckDB as the oracle for q95/q96/q99, so every round re-proves
  * the emitted SQL is runnable and agrees with the engine bit-for-bit
  * (float32) — the same self-proving loop as SqlGen/q62-q65.
  */
object GlmSqlGen {

  /** Cells fragment: `SELECT <g,> x, n, sy FROM …` with n = COUNT(*) and
    * sy = Σy over each distinct regressor value (× group). */
  def cellsSql(
      table: String,
      xCol: String,
      ySql: String,
      groupCol: Option[String] = None,
      extraWhere: Seq[String] = Nil
  ): String = {
    val g = groupCol.map(c => s"$c AS g, ").getOrElse("")
    val gGroup = if (groupCol.isDefined) "GROUP BY 1, 2" else "GROUP BY 1"
    val notNull = (Seq(xCol) ++ groupCol).map(c => s"$c IS NOT NULL") ++ extraWhere
    s"""SELECT $g CAST($xCol AS DOUBLE) AS x, count(*)::DOUBLE AS n,
       |    sum($ySql) AS sy
       |  FROM $table WHERE ${notNull.mkString(" AND ")}
       |  $gGroup""".stripMargin
  }

  /** Unrolled compressed-IRLS SQL for a 2-parameter GLM (intercept + x):
    * `iters` Newton steps from β=0, each one scan of the `cells` relation,
    * closed-form 2×2 solve per step. Mirrors [[Glm.fit]] with
    * strategy=compress, tol=0, maxIter=iters (SEs from the final step's
    * XᵀWX — the same one-lag as the engine). */
  def irlsSql(cells: String, family: String, iters: Int, xTerm: String,
      theta: Double = 1.0): String = {
    require(Set("binomial", "poisson", "gamma", "negbin")(family),
      s"unsupported family: $family")
    require(iters >= 1)
    def sums(src: String, k: Int) =
      s"""i$k AS (SELECT sum(n*w) sw, sum(n*w*x) swx, sum(n*w*x*x) swxx,
         |    sum(n*w*z) swz, sum(n*w*x*z) swxz FROM $src t$k)""".stripMargin
    def solve(k: Int) =
      s"""b$k AS (SELECT (swxx*swz - swx*swxz)/(sw*swxx - swx*swx) AS b0,
         |    (sw*swxz - swx*swz)/(sw*swxx - swx*swx) AS b1 FROM i$k)""".stripMargin
    val first = family match {
      case "binomial" => "(SELECT x, n, 0.25 AS w, (sy/n - 0.5)/0.25 AS z FROM c)"
      case "poisson" | "gamma" => "(SELECT x, n, 1.0 AS w, sy/n - 1.0 AS z FROM c)"
      // β=0 ⇒ μ=1: working weight μθ/(μ+θ) = θ/(1+θ)
      case "negbin" =>
        s"(SELECT x, n, $theta/(1.0 + $theta) AS w, sy/n - 1.0 AS z FROM c)"
    }
    def step(k: Int) = {
      val inner =
        s"""(SELECT c.x, c.n, c.sy, b.b0 + b.b1*c.x AS eta FROM c CROSS JOIN b${k - 1} b)"""
      val wz = family match {
        case "binomial" =>
          s"""(SELECT x, n, mu*(1.0-mu) AS w, eta + (sy/n - mu)/(mu*(1.0-mu)) AS z
             |   FROM (SELECT x, n, sy, eta, 1.0/(1.0+exp(-eta)) AS mu FROM $inner m$k) e$k)""".stripMargin
        case "poisson" =>
          s"""(SELECT x, n, mu AS w, eta + (sy/n - mu)/mu AS z
             |   FROM (SELECT x, n, sy, eta, exp(eta) AS mu FROM $inner m$k) e$k)""".stripMargin
        case "gamma" => // log link, V(μ)=μ² ⇒ unit working weight
          s"""(SELECT x, n, 1.0 AS w, eta + (sy/n - mu)/mu AS z
             |   FROM (SELECT x, n, sy, eta, exp(eta) AS mu FROM $inner m$k) e$k)""".stripMargin
        case "negbin" => // log link, V(μ)=μ+μ²/θ ⇒ weight μθ/(μ+θ)
          s"""(SELECT x, n, mu*$theta/(mu + $theta) AS w, eta + (sy/n - mu)/mu AS z
             |   FROM (SELECT x, n, sy, eta, exp(eta) AS mu FROM $inner m$k) e$k)""".stripMargin
      }
      sums(wz, k)
    }
    val ctes = Seq(s"c AS ($cells)", sums(first, 1), solve(1)) ++
      (2 to iters).flatMap(k => Seq(step(k), solve(k)))
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT term, estimate::REAL AS estimate, std_error::REAL AS std_error
       |FROM (
       | SELECT '(Intercept)' AS term, b0 AS estimate,
       |   sqrt(swxx/(sw*swxx - swx*swx)) AS std_error
       |   FROM b$iters CROSS JOIN i$iters
       | UNION ALL
       | SELECT '$xTerm', b1, sqrt(sw/(sw*swxx - swx*swx))
       |   FROM b$iters CROSS JOIN i$iters) u
       |ORDER BY term""".stripMargin
  }

  /** Train-then-calibrate rendering: the [[irlsSql]] Newton steps produce
    * β, then every ROW of `table` is scored μ = g⁻¹(b0 + b1·x) and bucketed
    * into `bins` equal-width probability bins; per bin the row count, mean
    * predicted μ and empirical response rate come back — the reliability
    * diagram of the freshly-trained classifier, one statement. */
  def calibrationSql(
      table: String,
      xCol: String,
      ySql: String,
      family: String,
      iters: Int,
      bins: Int,
      extraWhere: Seq[String] = Nil
  ): String = {
    require(Set("binomial", "poisson", "gamma")(family), s"unsupported family: $family")
    val cells = cellsSql(table, xCol, ySql, None, extraWhere)
    val fitSql = irlsSql(cells, family, iters, xCol)
    // reuse everything up to the final solve CTE, then score rows
    val withPart = fitSql.substring(0, fitSql.indexOf("\nSELECT term"))
    val notNull = (s"$xCol IS NOT NULL" +: extraWhere).mkString(" AND ")
    val mu = family match {
      case "binomial" => "1.0/(1.0 + exp(-(b.b0 + b.b1*CAST(r.x AS DOUBLE))))"
      case "poisson" | "gamma" => "exp(b.b0 + b.b1*CAST(r.x AS DOUBLE))"
    }
    s"""$withPart,
       |rows_ AS (SELECT CAST($xCol AS DOUBLE) AS x, $ySql AS y FROM $table
       |  WHERE $notNull),
       |scored AS (SELECT least(floor($mu * $bins), ${bins - 1})::BIGINT AS bin,
       |    $mu AS mu, r.y FROM rows_ r CROSS JOIN b$iters b)
       |SELECT bin, count(*)::BIGINT AS n, avg(mu)::REAL AS mean_pred,
       |  avg(y)::REAL AS emp_rate
       |FROM scored GROUP BY bin ORDER BY bin""".stripMargin
  }

  /** Per-group variant of [[irlsSql]]: the same unrolled Newton steps with
    * the group key `g` carried through every CTE (GROUP BY g sums,
    * per-group closed-form solve, β re-attached with a USING (g) join).
    * Mirrors [[Glm.fitGrouped]] with strategy=compress. */
  def groupedIrlsSql(cells: String, family: String, iters: Int, xTerm: String,
      theta: Double = 1.0): String = {
    require(Set("binomial", "poisson", "gamma", "negbin")(family),
      s"unsupported family: $family")
    require(iters >= 1)
    def sums(src: String, k: Int) =
      s"""i$k AS (SELECT g, sum(n*w) sw, sum(n*w*x) swx, sum(n*w*x*x) swxx,
         |    sum(n*w*z) swz, sum(n*w*x*z) swxz FROM $src t$k GROUP BY g)""".stripMargin
    def solve(k: Int) =
      s"""b$k AS (SELECT g, (swxx*swz - swx*swxz)/(sw*swxx - swx*swx) AS b0,
         |    (sw*swxz - swx*swz)/(sw*swxx - swx*swx) AS b1 FROM i$k)""".stripMargin
    val first = family match {
      case "binomial" => "(SELECT g, x, n, 0.25 AS w, (sy/n - 0.5)/0.25 AS z FROM c)"
      case "poisson" | "gamma" => "(SELECT g, x, n, 1.0 AS w, sy/n - 1.0 AS z FROM c)"
      case "negbin" =>
        s"(SELECT g, x, n, $theta/(1.0 + $theta) AS w, sy/n - 1.0 AS z FROM c)"
    }
    def step(k: Int) = {
      val inner =
        s"""(SELECT c.g, c.x, c.n, c.sy, b.b0 + b.b1*c.x AS eta
           |   FROM c JOIN b${k - 1} b USING (g))""".stripMargin
      val wz = family match {
        case "binomial" =>
          s"""(SELECT g, x, n, mu*(1.0-mu) AS w, eta + (sy/n - mu)/(mu*(1.0-mu)) AS z
             |   FROM (SELECT g, x, n, sy, eta, 1.0/(1.0+exp(-eta)) AS mu FROM $inner m$k) e$k)""".stripMargin
        case "poisson" =>
          s"""(SELECT g, x, n, mu AS w, eta + (sy/n - mu)/mu AS z
             |   FROM (SELECT g, x, n, sy, eta, exp(eta) AS mu FROM $inner m$k) e$k)""".stripMargin
        case "gamma" =>
          s"""(SELECT g, x, n, 1.0 AS w, eta + (sy/n - mu)/mu AS z
             |   FROM (SELECT g, x, n, sy, eta, exp(eta) AS mu FROM $inner m$k) e$k)""".stripMargin
        case "negbin" =>
          s"""(SELECT g, x, n, mu*$theta/(mu + $theta) AS w, eta + (sy/n - mu)/mu AS z
             |   FROM (SELECT g, x, n, sy, eta, exp(eta) AS mu FROM $inner m$k) e$k)""".stripMargin
      }
      sums(wz, k)
    }
    val ctes = Seq(s"c AS ($cells)", sums(first, 1), solve(1)) ++
      (2 to iters).flatMap(k => Seq(step(k), solve(k)))
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT "group", term, estimate::REAL AS estimate,
       |  std_error::REAL AS std_error
       |FROM (
       | SELECT b.g AS "group", '(Intercept)' AS term, b.b0 AS estimate,
       |   sqrt(i.swxx/(i.sw*i.swxx - i.swx*i.swx)) AS std_error
       |   FROM b$iters b JOIN i$iters i USING (g)
       | UNION ALL
       | SELECT b.g, '$xTerm', b.b1, sqrt(i.sw/(i.sw*i.swxx - i.swx*i.swx))
       |   FROM b$iters b JOIN i$iters i USING (g)) u
       |ORDER BY "group", term""".stripMargin
  }
}
