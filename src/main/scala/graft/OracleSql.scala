package graft

import graft.pipeline.Dedup

/** DuckDB oracle SQL for every entry in [[Queries.all]] (same parquet
  * tables, registered as views by the driver). Column aliases match the
  * Spark side exactly; every multi-row result carries an ORDER BY over a
  * total order.
  */
object OracleSql {

  /** base relation fragment (P1/P2). */
  private val B =
    """(SELECT l_extendedprice AS y, CAST(l_quantity AS DOUBLE) AS x1,
      |        l_discount AS x2, l_returnflag AS fe1, l_linestatus AS fe2,
      |        l_quantity, l_returnflag, l_linestatus
      | FROM lineitem
      | WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
      |   AND l_discount IS NOT NULL AND l_returnflag IS NOT NULL
      |   AND l_linestatus IS NOT NULL)""".stripMargin

  /** shared CTEs for the PCA oracles (q105/q106): sample covariance of
    * (l_quantity, l_extendedprice), closed-form 2×2 eigensystem, PC1
    * eigenvector (c, λ1−a) normalized under the engine's sign rule. */
  private val PcaCtes =
    """WITH pb AS (SELECT l_orderkey, l_linenumber,
      |    CAST(l_quantity AS DOUBLE) AS x1, l_extendedprice AS x2
      |  FROM lineitem
      |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      |m AS (SELECT count(*)::DOUBLE n, sum(x1) s1, sum(x2) s2,
      |    sum(x1*x1) s11, sum(x2*x2) s22, sum(x1*x2) s12 FROM pb),
      |c AS (SELECT n, s1/n m1, s2/n m2,
      |    (s11 - s1*s1/n)/(n-1) AS a, (s22 - s2*s2/n)/(n-1) AS b,
      |    (s12 - s1*s2/n)/(n-1) AS cc FROM m),
      |e AS (SELECT *,
      |    (a+b)/2 + sqrt((a-b)*(a-b)/4 + cc*cc) AS lam1,
      |    (a+b)/2 - sqrt((a-b)*(a-b)/4 + cc*cc) AS lam2 FROM c),
      |v0 AS (SELECT *, cc AS vx, lam1 - a AS vy FROM e),
      |v AS (SELECT n, m1, m2, lam1, lam2,
      |    (CASE WHEN abs(vx) >= abs(vy) THEN sign(vx) ELSE sign(vy) END)
      |      * vx / sqrt(vx*vx + vy*vy) AS v1x,
      |    (CASE WHEN abs(vx) >= abs(vy) THEN sign(vx) ELSE sign(vy) END)
      |      * vy / sqrt(vx*vx + vy*vy) AS v1y FROM v0)""".stripMargin

  /** md5-derived 32-bit hash (mirrors TextOps.hash32). */
  private def hash32(e: String) = s"('0x' || substr(md5($e),1,8))::BIGINT"

  /** lowercased whitespace tokens, empties removed. */
  /** Shared BPE-training CTE chain (q134/q135): w0 = freq-weighted spaced
    * word table; per iteration i: pair counts p_i, top-1 t_i, fused w_i.
    * MATERIALIZED is load-bearing — inlined CTEs re-expand the chain
    * exponentially (DuckDB runs out of file handles re-opening the scan). */
  private def bpeCtes(k: Int, where: String = ""): String = {
    def pairsOf(src: String) =
      s"""(SELECT unnest(list_transform(range(1, len(t)),
         |    i -> t[i] || ' ' || t[i+1])) AS p, f
         |  FROM (SELECT string_split(trim(s), ' ') AS t, f FROM $src) q)"""
        .stripMargin
    def fuse(expr0: String, i: Int): String =
      (1 to 12).foldLeft(expr0)((e, _) =>
        s"replace($e, ' ' || (SELECT p FROM t$i) || ' ', ' ' || (SELECT m FROM t$i) || ' ')")
    val iters = (1 to k).flatMap { i =>
      Seq(
        s"""p$i AS MATERIALIZED (SELECT p, sum(f) AS c FROM ${pairsOf(s"w${i - 1}")} u
           |  GROUP BY p)""".stripMargin,
        s"""t$i AS MATERIALIZED (SELECT p, c, replace(p, ' ', '') AS m FROM p$i
           |  ORDER BY c DESC, p LIMIT 1)""".stripMargin,
        s"""w$i AS MATERIALIZED (SELECT ${fuse("s", i)} AS s, f FROM w${i - 1})""")
    }
    // NOTE: no generated line may BEGIN with "||" — the caller's
    // stripMargin would eat one pipe and leave a bitwise-or
    s"""w0 AS MATERIALIZED (SELECT ' ' ||
       |    array_to_string(regexp_extract_all(w, '.'), ' ') || ' ' AS s, f FROM (
       |  SELECT w, count(*)::DOUBLE AS f FROM
       |    (SELECT unnest(${toks("text")}) AS w FROM documents $where) tw GROUP BY w) wc),
       |${iters.mkString(",\n")}""".stripMargin
  }

  private def toks(e: String) =
    s"list_filter(string_split_regex(lower($e), '\\s+'), t -> len(t) > 0)"

  /** word-bigram shingles from a token list. */
  private def bigrams(t: String) =
    s"list_transform(range(1, len($t)), i -> $t[i] || ' ' || $t[i+1])"

  /** word-trigram shingles from a token list. */
  private def trigrams(t: String) =
    s"""list_transform(range(1, len($t) - 1),
       |  i -> $t[i] || ' ' || $t[i+1] || ' ' || $t[i+2])""".stripMargin

  /** A&S 7.1.26 erfc as inline SQL over an x ≥ 0 expression — the same
    * Horner chain (e-notation doubles) as Eval.erfcApprox; textual
    * repetition of t/x re-evaluates the identical subexpression, so the
    * value is bit-identical to binding it once. */
  private def erfcSql(x: String): String = {
    val t = s"(1e0 / (1e0 + 3.275911e-1 * $x))"
    s"""(($t * (2.54829592e-1 + $t * (-2.84496736e-1 +
       |  $t * (1.421413741e0 + $t * (-1.453152027e0 +
       |  $t * 1.061405429e0))))) * exp(-($x * $x)))""".stripMargin
  }

  /** Shared CTE chain for the q181/q182 multiple-testing family: grouped
    * two-proportion z-tests per (event_type, day-of-week) with the A&S
    * 7.1.26 erfc tail (e-notation constants = the same IEEE doubles the
    * Scala literals bind; erfc computed directly as poly·e^{−x²}, never
    * 1 − erf — see Eval.erfcApprox). Yields table `pz`. */
  private val PropZCtes =
    """e AS (SELECT event_type,
      |    (epoch_us(ts) // 86400000000) % 7 AS dow,
      |    user_id % 2 = 0 AS f, value > 50 AS s
      |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
      |g AS (SELECT event_type, dow,
      |    sum(CASE WHEN f THEN 1 ELSE 0 END)::BIGINT AS n_a,
      |    sum(CASE WHEN f AND s THEN 1 ELSE 0 END)::BIGINT AS s_a,
      |    sum(CASE WHEN NOT f THEN 1 ELSE 0 END)::BIGINT AS n_b,
      |    sum(CASE WHEN NOT f AND s THEN 1 ELSE 0 END)::BIGINT AS s_b
      |  FROM e GROUP BY 1, 2),
      |c AS (SELECT *,
      |    CASE WHEN n_a > 0 THEN s_a::DOUBLE / n_a END AS p_a,
      |    CASE WHEN n_b > 0 THEN s_b::DOUBLE / n_b END AS p_b,
      |    (s_a + s_b)::DOUBLE / (n_a + n_b) AS pool FROM g),
      |z0 AS (SELECT *,
      |    CASE WHEN n_a > 0 AND n_b > 0 AND pool > 0e0 AND pool < 1e0
      |      THEN (p_a - p_b) /
      |        sqrt(pool * (1e0 - pool) * (1e0 / n_a + 1e0 / n_b))
      |    END AS z FROM c),
      |x0 AS (SELECT *, abs(z) / sqrt(2e0) AS x FROM z0),
      |t0 AS (SELECT *, 1e0 / (1e0 + 3.275911e-1 * x) AS t FROM x0),
      |pz AS (SELECT event_type, dow, n_a, s_a, n_b, s_b, p_a, p_b, z,
      |    CASE WHEN z IS NOT NULL THEN
      |      (t * (2.54829592e-1 + t * (-2.84496736e-1 +
      |        t * (1.421413741e0 + t * (-1.453152027e0 +
      |          t * 1.061405429e0))))) * exp(-(x * x))
      |    END AS p FROM t0)""".stripMargin

  /** Shared CTE chain for q197/q198 (bucketed lift / WoE): the labelled
    * score rows `v(s, y)` over documents, then the NINE interior decile
    * cut points via the identical 1024-bucket histogram-CDF algebra the
    * engine's `Dbbinsreg.quantileCutBins` runs (the q69 pin: every step
    * is the same IEEE-double expression — w = (mx−mn)/1024, bucket =
    * least(floor((s−mn)/w), 1023), cut = mn + w·(b + (p·n − cum_below) /
    * count_b) — so the cuts are bit-identical cross-engine). Yields
    * tables `v` and `cuts(cut)`. */
  private val DecileCutCtes =
    """v AS (SELECT CAST(n_chars AS DOUBLE) AS s,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
      |qstats AS (SELECT min(s) AS mn, max(s) AS mx,
      |    CAST(count(*) AS DOUBLE) AS n FROM v),
      |qhist AS (SELECT CAST(least(floor((s - st.mn)
      |      / ((st.mx - st.mn) / 1024)), 1023) AS INT) AS b,
      |    CAST(count(*) AS DOUBLE) AS c
      |  FROM v, qstats st GROUP BY 1),
      |qcum AS (SELECT b, c, sum(c) OVER (ORDER BY b) AS cum FROM qhist),
      |qprobs AS (SELECT CAST(unnest(range(1, 10)) AS DOUBLE) / 10 AS prob),
      |qsel AS (SELECT p.prob, min(h.b) AS b
      |  FROM qprobs p JOIN qcum h ON h.cum >= p.prob * (SELECT n FROM qstats)
      |  GROUP BY p.prob),
      |cuts AS (SELECT st.mn + ((st.mx - st.mn) / 1024) * (qsel.b
      |      + (qsel.prob * st.n
      |         - COALESCE((SELECT max(c2.cum) FROM qcum c2 WHERE c2.b < qsel.b), 0))
      |        / (SELECT c3.c FROM qcum c3 WHERE c3.b = qsel.b)) AS cut
      |  FROM qsel, qstats st)""".stripMargin

  /** Parametric generalization of [[DecileCutCtes]]: the `bins − 1`
    * interior equal-frequency cut points of a caller-supplied `v(s, …)`
    * table via the identical 1024-bucket histogram-CDF algebra the
    * engine's `Dbbinsreg.quantileCutBins` runs (every step the same
    * IEEE-double expression, the q69/q197 pin). The caller prepends its
    * own `v AS (…)` CTE; this yields `cuts(cut)`. */
  /** Histogram-CDF quantile cuts over a CTE `v(s)` — the DuckDB mirror of
    * `Dbbinsreg.histQuantiles`. The histogram bucket count is derived
    * from `relErr` with the ENGINE'S formula (min(2^20, max(1024,
    * ceil(1/relErr)))) so the two stay bit-comparable for any relErr a
    * query pins — the default 1e-3 maps to exactly 1024. A query using
    * this CTE must pass the same relErr it passes the Spark call. */
  private def quantileCutCtesFromV(bins: Int, relErr: Double = 1e-3): String = {
    val hb = math.min(1L << 20, math.max(1024L, math.ceil(1.0 / relErr).toLong))
    s"""qstats AS (SELECT min(s) AS mn, max(s) AS mx,
       |    CAST(count(*) AS DOUBLE) AS n FROM v),
       |qhist AS (SELECT CAST(least(floor((s - st.mn)
       |      / ((st.mx - st.mn) / $hb)), ${hb - 1}) AS INT) AS b,
       |    CAST(count(*) AS DOUBLE) AS c
       |  FROM v, qstats st GROUP BY 1),
       |qcum AS (SELECT b, c, sum(c) OVER (ORDER BY b) AS cum FROM qhist),
       |qprobs AS (SELECT CAST(unnest(range(1, $bins)) AS DOUBLE) / $bins AS prob),
       |qsel AS (SELECT p.prob, min(h.b) AS b
       |  FROM qprobs p JOIN qcum h ON h.cum >= p.prob * (SELECT n FROM qstats)
       |  GROUP BY p.prob),
       |cuts AS (SELECT st.mn + ((st.mx - st.mn) / $hb) * (qsel.b
       |      + (qsel.prob * st.n
       |         - COALESCE((SELECT max(c2.cum) FROM qcum c2 WHERE c2.b < qsel.b), 0))
       |        / (SELECT c3.c FROM qcum c3 WHERE c3.b = qsel.b)) AS cut
       |  FROM qsel, qstats st)""".stripMargin
  }

  /** distinct (id, bigram-shingle) pairs over documents. */
  private val ShingleSets =
    s"""sh AS (SELECT DISTINCT doc_id AS id, unnest(${bigrams(toks("text"))}) AS shingle
       |       FROM documents)""".stripMargin

  /** 5-token chunk "lines" per document — the Queries.mlDocs synthesis
    * replayed (the corpus has no newlines, so the line-dedup queries
    * manufacture line structure identically on both sides). */
  private val LineChunks =
    s"""t0 AS (SELECT doc_id AS id, ${toks("text")} AS tk FROM documents),
       |t1 AS (SELECT id, list_transform(
       |    range(0, greatest(CAST(ceil(len(tk) / 5.0) AS BIGINT), 1)),
       |    i -> array_to_string(tk[(i*5+1):(i*5+5)], ' ')) AS lines
       |  FROM t0)""".stripMargin

  /** list-based cosine between two FLOAT[] columns. */
  private def cosSql(a: String, b: String): String =
    s"""(list_sum(list_transform(range(1, len($b)+1),
       |     i -> $a[i]::DOUBLE * $b[i]::DOUBLE))
       |   / (sqrt(list_sum(list_transform(range(1, len($a)+1),
       |        i -> $a[i]::DOUBLE * $a[i]::DOUBLE)))
       |    * sqrt(list_sum(list_transform(range(1, len($b)+1),
       |        i -> $b[i]::DOUBLE * $b[i]::DOUBLE)))))""".stripMargin

  private val MinhashTable: String = {
    val rows = (0 until Dedup.NumHashes)
      .map(i => s"(${i}, ${Dedup.minhashA(i)}, ${Dedup.minhashB(i)})")
      .mkString(", ")
    s"hashes(i, a, b) AS (SELECT * FROM (VALUES $rows))"
  }

  private val base: Map[String, String] = Map(
    "q01_moments_agg" ->
      s"""SELECT count(*) AS n_total,
         | sum(y) AS sum_y, sum(y*y) AS sum_y_sq,
         | sum(x1) AS sum_x1, sum(x1*y) AS sum_x1_y, sum(x1*x1) AS sum_x1_sq,
         | sum(x2) AS sum_x2, sum(x2*y) AS sum_x2_y, sum(x2*x2) AS sum_x2_sq,
         | sum(x1*x2) AS sum_x1_x2
         |FROM $B t""".stripMargin,

    "q02_compress_cells" ->
      s"""SELECT l_quantity, l_returnflag, l_linestatus,
         | count(*) AS n, sum(y) AS sum_y, sum(y*y) AS sum_y_sq,
         | sum(y)/count(*) AS mean_y, sqrt(count(*)) AS wts
         |FROM $B t
         |GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin,

    "q03_group_means" ->
      s"""SELECT l_returnflag, avg(y) AS y_mean, avg(x1) AS x1_mean, avg(x2) AS x2_mean
         |FROM $B t GROUP BY 1 ORDER BY 1""".stripMargin,

    "q04_overall_means" ->
      s"SELECT avg(y) AS y_mean, avg(x1) AS x1_mean, avg(x2) AS x2_mean FROM $B t",

    "q05_demean_moments_1fe" ->
      s"""WITH base AS (SELECT fe1, round(y*100)::BIGINT AS yc,
         |        (x1*100)::BIGINT AS xc FROM $B t),
         |gm AS (SELECT fe1, count(*) AS ng, sum(yc)::BIGINT AS sy,
         |        sum(xc)::BIGINT AS sx FROM base GROUP BY fe1),
         |d AS (SELECT b.fe1,
         |        round(b.yc::DOUBLE - g.sy::DOUBLE / g.ng::DOUBLE)::BIGINT AS dy,
         |        round(b.xc::DOUBLE - g.sx::DOUBLE / g.ng::DOUBLE)::BIGINT AS dx
         |      FROM base b JOIN gm g USING (fe1))
         |SELECT count(*) AS n_total, count(DISTINCT fe1) AS n_fe1,
         | sum(dy*dy)::DOUBLE / 10000.0 AS sum_y_sq,
         | sum(dx*dx)::DOUBLE / 10000.0 AS sum_x_sq,
         | sum(dx*dy)::DOUBLE / 10000.0 AS sum_x_y
         |FROM d""".stripMargin,

    "q06_demean_moments_2fe" ->
      s"""WITH base AS (SELECT fe1, fe2, round(y*100)::BIGINT AS yc,
         |        (x1*100)::BIGINT AS xc FROM $B t),
         |um AS (SELECT fe1, count(*) AS ngu, sum(yc)::BIGINT AS syu,
         |        sum(xc)::BIGINT AS sxu FROM base GROUP BY fe1),
         |tm AS (SELECT fe2, count(*) AS ngt, sum(yc)::BIGINT AS syt,
         |        sum(xc)::BIGINT AS sxt FROM base GROUP BY fe2),
         |om AS (SELECT count(*) AS ngo, sum(yc)::BIGINT AS syo,
         |        sum(xc)::BIGINT AS sxo FROM base),
         |d AS (SELECT
         |        round((b.yc::DOUBLE - u.syu::DOUBLE / u.ngu::DOUBLE)
         |          - t.syt::DOUBLE / t.ngt::DOUBLE
         |          + o.syo::DOUBLE / o.ngo::DOUBLE)::BIGINT AS dy,
         |        round((b.xc::DOUBLE - u.sxu::DOUBLE / u.ngu::DOUBLE)
         |          - t.sxt::DOUBLE / t.ngt::DOUBLE
         |          + o.sxo::DOUBLE / o.ngo::DOUBLE)::BIGINT AS dx
         |      FROM base b JOIN um u USING (fe1) JOIN tm t USING (fe2) CROSS JOIN om o)
         |SELECT count(*) AS n_total,
         | sum(dy*dy)::DOUBLE / 10000.0 AS sum_y_sq,
         | sum(dx*dx)::DOUBLE / 10000.0 AS sum_x_sq,
         | sum(dx*dy)::DOUBLE / 10000.0 AS sum_x_y
         |FROM d""".stripMargin,

    "q07_mundlak_moments" ->
      s"""WITH base AS (SELECT fe1, y, x1 FROM $B t),
         |gm AS (SELECT fe1, avg(x1) xbar FROM base GROUP BY fe1),
         |a AS (SELECT b.y, b.x1, g.xbar FROM base b JOIN gm g USING (fe1))
         |SELECT count(*) AS n_total, sum(x1) AS sum_x, sum(xbar) AS sum_xbar,
         | sum(x1*xbar) AS sum_x_xbar, sum(x1*x1) AS sum_x_sq,
         | sum(xbar*xbar) AS sum_xbar_sq, sum(x1*y) AS sum_x_y,
         | sum(xbar*y) AS sum_xbar_y, sum(y) AS sum_y, sum(y*y) AS sum_y_sq
         |FROM a""".stripMargin,

    "q08_hc1_meat" ->
      s"""SELECT sum(e*e) AS m_cc, sum(e*e*x1) AS m_cx, sum(e*e*x1*x1) AS m_xx
         |FROM (SELECT x1, y - 50000.0 - (-20.0)*x1 AS e FROM $B t) s""".stripMargin,

    "q09_cluster_scores" ->
      s"""SELECT l_returnflag, sum(e) AS s0, sum(e*x1) AS s1
         |FROM (SELECT l_returnflag, x1, y - 50000.0 - (-20.0)*x1 AS e FROM $B t) s
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q10_counts_distinct" ->
      s"""SELECT count(*) AS n_total, count(DISTINCT fe1) AS n_fe,
         | (SELECT count(*) FROM
         |   (SELECT DISTINCT l_quantity, l_returnflag, l_linestatus FROM $B t2) u)
         |   AS n_cells
         |FROM $B t""".stripMargin,

    "q11_balance_check" ->
      s"""SELECT count(DISTINCT cnt) AS n_distinct_counts
         |FROM (SELECT count(*) AS cnt FROM $B t GROUP BY fe1, fe2) g""".stripMargin,

    "q12_nested_fe_check" ->
      s"""SELECT count(*) AS n_nonnested
         |FROM (SELECT fe1 FROM $B t GROUP BY fe1
         |      HAVING count(DISTINCT fe2) > 1) g""".stripMargin,

    "q13_dummies_interactions" ->
      s"""SELECT
         | sum(CASE WHEN l_returnflag = 'N' THEN 1.0 ELSE 0.0 END) AS sum_dn,
         | sum(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END) AS sum_dr,
         | sum(CASE WHEN l_returnflag = 'N' THEN 1.0 ELSE 0.0 END * x1) AS sum_dn_x,
         | sum(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END * x1) AS sum_dr_x,
         | sum(CASE WHEN l_returnflag = 'N' THEN 1.0 ELSE 0.0 END * x1 * y) AS sum_dn_x_y
         |FROM $B t""".stripMargin,

    "q14_poly_spline_terms" ->
      s"""SELECT sum(power(x1, 2)) AS sum_x_p2, sum(power(x1, 3)) AS sum_x_p3,
         | sum(CASE WHEN x1 > 25.0 THEN 1.0 ELSE 0.0 END) AS sum_step,
         | sum(CASE WHEN x1 > 25.0 THEN power(x1 - 25.0, 1) ELSE 0.0 END) AS sum_tp1,
         | sum(CASE WHEN x1 > 25.0 THEN power(x1 - 25.0, 2) ELSE 0.0 END) AS sum_tp2
         |FROM $B t""".stripMargin,

    "q15_casts_filters" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        | sum(CAST(o_totalprice AS DOUBLE)) AS sum_price,
        | sum(CAST(o_custkey AS DOUBLE)) AS sum_cust
        |FROM orders
        |WHERE o_totalprice IS NOT NULL AND o_custkey IS NOT NULL""".stripMargin,

    "q16_ntile_bins" ->
      """SELECT bin, count(*) AS n, sum(l_extendedprice) AS sum_y,
        | min(l_extendedprice) AS min_y, max(l_extendedprice) AS max_y
        |FROM (SELECT l_extendedprice,
        |        ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        |          AS bin
        |      FROM lineitem) t
        |GROUP BY bin ORDER BY bin""".stripMargin,

    "q17_equal_width_bins" ->
      """WITH mm AS (SELECT min(l_extendedprice) mn, max(l_extendedprice) mx
        |            FROM lineitem)
        |SELECT CAST(least(floor((l_extendedprice - mn) / ((mx - mn)/10.0)), 9)
        |            AS INT) AS bin,
        | count(*) AS n, avg(l_extendedprice) AS avg_y
        |FROM lineitem, mm
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q18_bin_geometry" ->
      s"""SELECT bin, min(x1) AS min_x, max(x1) AS max_x,
         | (min(x1)+max(x1))/2.0 AS mid_x, avg(x1) AS avg_x, count(*) AS n
         |FROM (SELECT x1,
         |        CASE WHEN x1 <= 10 THEN 0 WHEN x1 <= 20 THEN 1
         |             WHEN x1 <= 30 THEN 2 WHEN x1 <= 40 THEN 3 ELSE 4 END AS bin
         |      FROM $B t) s
         |GROUP BY bin ORDER BY bin""".stripMargin,

    "q19_factor_levels" ->
      """SELECT DISTINCT l_returnflag FROM lineitem
        |WHERE l_returnflag IS NOT NULL ORDER BY 1""".stripMargin,

    "q20_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q21_hash_sample" ->
      s"""SELECT o_orderkey, o_totalprice FROM orders
         |WHERE ${hash32("o_orderkey::VARCHAR")} % 20 = 0
         |ORDER BY o_orderkey""".stripMargin,

    // ---- end-to-end fit oracles: independent SQL algebra ----
    "q22_ols_simple_fit" ->
      s"""WITH m AS (SELECT count(*)::DOUBLE n, sum(x1) sx, sum(y) sy,
         |   sum(x1*x1) sxx, sum(x1*y) sxy, sum(y*y) syy FROM $B t),
         |s AS (SELECT n, sx, sy, sxx, sxy, syy,
         |   (n*sxy - sx*sy)/(n*sxx - sx*sx) AS b1,
         |   sy/n - (n*sxy - sx*sy)/(n*sxx - sx*sx) * sx/n AS b0 FROM m),
         |r AS (SELECT *, syy - 2*(b0*sy + b1*sxy)
         |        + (b0*b0*n + 2*b0*b1*sx + b1*b1*sxx) AS rss,
         |        n*sxx - sx*sx AS det FROM s)
         |SELECT * FROM (
         | SELECT '(Intercept)' AS term, b0 AS estimate,
         |   sqrt(rss/(n-2) * sxx/det) AS std_error,
         |   b0 / sqrt(rss/(n-2) * sxx/det) AS statistic FROM r
         | UNION ALL
         | SELECT 'l_quantity', b1, sqrt(rss/(n-2) * n/det),
         |   b1 / sqrt(rss/(n-2) * n/det) FROM r) u
         |ORDER BY term""".stripMargin,

    "q23_ols_multi_fit" ->
      s"""WITH m AS (SELECT count(*)::DOUBLE n, sum(x1) s1, sum(x2) s2, sum(y) sy,
         |   sum(x1*x1) s11, sum(x2*x2) s22, sum(x1*x2) s12,
         |   sum(x1*y) s1y, sum(x2*y) s2y, sum(y*y) syy FROM $B t),
         |c AS (SELECT n, s1/n xb1, s2/n xb2, sy/n yb,
         |   s11 - s1*s1/n AS a, s22 - s2*s2/n AS b2c, s12 - s1*s2/n AS c,
         |   s1y - s1*sy/n AS d, s2y - s2*sy/n AS e, syy - sy*sy/n AS f FROM m),
         |sol AS (SELECT *, a*b2c - c*c AS det,
         |   (b2c*d - c*e)/(a*b2c - c*c) AS b1,
         |   (a*e - c*d)/(a*b2c - c*c) AS b2 FROM c),
         |r AS (SELECT *, yb - b1*xb1 - b2*xb2 AS b0,
         |   f - b1*d - b2*e AS rss FROM sol)
         |SELECT term, estimate::REAL AS estimate, std_error::REAL AS std_error
         |FROM (
         | SELECT '(Intercept)' AS term, b0 AS estimate,
         |   sqrt(rss/(n-3) * (1.0/n + (b2c*xb1*xb1 - 2*c*xb1*xb2 + a*xb2*xb2)/det))
         |     AS std_error FROM r
         | UNION ALL
         | SELECT 'l_discount', b2, sqrt(rss/(n-3) * a/det) FROM r
         | UNION ALL
         | SELECT 'l_quantity', b1, sqrt(rss/(n-3) * b2c/det) FROM r) u
         |ORDER BY term""".stripMargin,

    "q24_demean_fit" ->
      s"""WITH base AS (SELECT fe1, y, x1 FROM $B t),
         |gm AS (SELECT fe1, avg(y) ym, avg(x1) xm, count(*) cnt FROM base GROUP BY fe1),
         |d AS (SELECT b.y - g.ym AS yt, b.x1 - g.xm AS xt
         |      FROM base b JOIN gm g USING (fe1)),
         |m AS (SELECT count(*)::DOUBLE n,
         |        (SELECT count(*) FROM gm)::DOUBLE g,
         |        sum(xt*xt) sxx, sum(xt*yt) sxy, sum(yt*yt) syy FROM d),
         |r AS (SELECT *, sxy/sxx AS b1, syy - sxy*sxy/sxx AS rss,
         |        n - 1 - g AS df FROM m)
         |SELECT 'l_quantity' AS term, b1 AS estimate,
         |  sqrt(rss/df/sxx) AS std_error
         |FROM r""".stripMargin,

    "q25_mundlak_fit" ->
      s"""WITH base AS (SELECT (l_partkey % 20) AS fe1, l_extendedprice AS y,
         |   CAST(l_quantity AS DOUBLE) AS x1 FROM lineitem
         |   WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
         |     AND l_partkey IS NOT NULL),
         |gm AS (SELECT fe1, avg(x1) xbar FROM base GROUP BY fe1),
         |a AS (SELECT b.y, b.x1, g.xbar FROM base b JOIN gm g USING (fe1)),
         |m AS (SELECT count(*)::DOUBLE n, sum(x1) s1, sum(xbar) s2, sum(y) sy,
         |   sum(x1*x1) s11, sum(xbar*xbar) s22, sum(x1*xbar) s12,
         |   sum(x1*y) s1y, sum(xbar*y) s2y, sum(y*y) syy FROM a),
         |c AS (SELECT n, s1/n xb1, s2/n xb2, sy/n yb,
         |   s11 - s1*s1/n AS a2, s22 - s2*s2/n AS b2c, s12 - s1*s2/n AS c,
         |   s1y - s1*sy/n AS d, s2y - s2*sy/n AS e, syy - sy*sy/n AS f FROM m),
         |sol AS (SELECT *, a2*b2c - c*c AS det,
         |   (b2c*d - c*e)/(a2*b2c - c*c) AS b1,
         |   (a2*e - c*d)/(a2*b2c - c*c) AS b2 FROM c),
         |r AS (SELECT *, yb - b1*xb1 - b2*xb2 AS b0, f - b1*d - b2*e AS rss FROM sol)
         |SELECT term, estimate::REAL AS estimate, std_error::REAL AS std_error
         |FROM (
         | SELECT '(Intercept)' AS term, b0 AS estimate,
         |   sqrt(rss/(n-3) * (1.0/n + (b2c*xb1*xb1 - 2*c*xb1*xb2 + a2*xb2*xb2)/det))
         |     AS std_error FROM r
         | UNION ALL
         | SELECT 'l_quantity', b1, sqrt(rss/(n-3) * b2c/det) FROM r
         | UNION ALL
         | SELECT 'l_quantity_bar_grp20', b2, sqrt(rss/(n-3) * a2/det) FROM r) u
         |ORDER BY term""".stripMargin,

    // sql_only roundtrips: the oracle IS the generated SQL — running it in
    // DuckDB each round proves Dbreg.sqlOnly emits runnable, correct SQL
    "q62_sqlgen_moments" -> graft.reg.SqlGen.sqlOnlyWithLevels(
      "l_extendedprice ~ l_quantity + l_returnflag",
      Queries.SqlGenLevels, "lineitem", "moments"),
    "q63_sqlgen_compress" -> graft.reg.SqlGen.sqlOnlyWithLevels(
      Queries.SqlGenCompressFormula, Queries.SqlGenLevels, "lineitem", "compress"),
    "q64_sqlgen_demean" -> graft.reg.SqlGen.sqlOnlyWithLevels(
      Queries.SqlGenSmallFormula, Queries.SqlGenLevels, "lineitem", "demean"),
    "q65_sqlgen_mundlak" -> graft.reg.SqlGen.sqlOnlyWithLevels(
      Queries.SqlGenSmallFormula, Queries.SqlGenLevels, "lineitem", "mundlak"),

    // histogram-CDF quantile breaks: the oracle recomputes the same
    // 1024-bucket histogram and within-bucket linear interpolation in SQL.
    // Every step is the identical IEEE-double expression (w = (mx-mn)/1024,
    // bucket = least(floor((x-mn)/w), 1023), break = mn + w*(b + (p*n -
    // cum_below)/count_b)), so the breaks are bit-identical cross-engine.
    "q69_hist_quantile_breaks" ->
      """WITH stats AS (
        |  SELECT min(CAST(l_quantity AS DOUBLE)) AS mn,
        |         max(CAST(l_quantity AS DOUBLE)) AS mx,
        |         CAST(count(*) AS DOUBLE) AS n
        |  FROM lineitem WHERE l_quantity IS NOT NULL),
        |hist AS (
        |  SELECT CAST(least(floor((CAST(l_quantity AS DOUBLE) - s.mn)
        |           / ((s.mx - s.mn) / 1024)), 1023) AS INT) AS b,
        |         CAST(count(*) AS DOUBLE) AS c
        |  FROM lineitem, stats s WHERE l_quantity IS NOT NULL GROUP BY 1),
        |cumh AS (SELECT b, c, sum(c) OVER (ORDER BY b) AS cum FROM hist),
        |probs AS (SELECT CAST(unnest([0.1, 0.25, 0.5, 0.75, 0.9]) AS DOUBLE) AS prob),
        |sel AS (
        |  SELECT p.prob, min(h.b) AS b
        |  FROM probs p JOIN cumh h ON h.cum >= p.prob * (SELECT n FROM stats)
        |  GROUP BY p.prob)
        |SELECT sel.prob AS prob,
        |  s.mn + ((s.mx - s.mn) / 1024) * (sel.b
        |    + (sel.prob * s.n
        |       - COALESCE((SELECT max(c2.cum) FROM cumh c2 WHERE c2.b < sel.b), 0))
        |      / (SELECT c3.c FROM cumh c3 WHERE c3.b = sel.b)) AS qbreak
        |FROM sel, stats s ORDER BY prob""".stripMargin,

    // K13 Lagrange: identical expression tree (same association, constant
    // denominators) so doubles are bit-identical cross-engine
    "q66_lagrange_interp" ->
      """SELECT l_orderkey, l_linenumber,
        |  2.0 * ((x - 25.0) * (x - 50.0) / ((1.0 - 25.0) * (1.0 - 50.0)))
        |  + 5.0 * ((x - 1.0) * (x - 50.0) / ((25.0 - 1.0) * (25.0 - 50.0)))
        |  + 9.0 * ((x - 1.0) * (x - 25.0) / ((50.0 - 1.0) * (50.0 - 25.0))) AS y_interp
        |FROM (SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS x
        |      FROM lineitem WHERE l_orderkey <= 100) t
        |ORDER BY 1, 2""".stripMargin,

    // multimodal real decodes: the BMP/WAV payloads are deterministic in
    // doc_id (Multimodal.syntheticBmp/syntheticWav), so the decoded stats
    // have closed forms. BMP: 5×4 px, stride 16, pixel-area byte at file
    // offset m is (doc_id·31+m) mod 256, channels B,G,R at +0/+1/+2.
    // Sums of small ints in doubles are exact, so avg is bit-identical.
    "q67_bmp_decode" ->
      """SELECT d.doc_id, 5 AS width, 4 AS height,
        |  avg(((d.doc_id*31 + (54 + rr.r*16 + 3*xx.x)) % 256)::DOUBLE) AS mean_b,
        |  avg(((d.doc_id*31 + (54 + rr.r*16 + 3*xx.x + 1)) % 256)::DOUBLE) AS mean_g,
        |  avg(((d.doc_id*31 + (54 + rr.r*16 + 3*xx.x + 2)) % 256)::DOUBLE) AS mean_r
        |FROM documents d,
        |  (SELECT unnest(range(0,4)) AS r) rr,
        |  (SELECT unnest(range(0,5)) AS x) xx
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,

    // WAV: 64 mono 16-bit samples, sample k = (doc_id·7+k·13) mod 65536 − 32768
    "q68_wav_decode" ->
      """SELECT d.doc_id, CAST(64 AS BIGINT) AS n_samples, 8000 AS sample_rate,
        |  avg(((d.doc_id*7 + kk.k*13) % 65536 - 32768)::DOUBLE) AS mean_amp,
        |  max(abs((d.doc_id*7 + kk.k*13) % 65536 - 32768)) AS peak_amp
        |FROM documents d, (SELECT unnest(range(0,64)) AS k) kk
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,

    // compress+cluster: slope-block sandwich via block inversion — the
    // slope rows of (X'X)^-1 dotted with a cluster score equal the centered
    // 2x2 inverse dotted with the CENTERED scores, so no 3x3 algebra needed
    "q61_compress_cluster_fit" ->
      s"""WITH b AS (SELECT y, x1 AS x,
         |    CASE WHEN fe2 = 'O' THEN 1.0 ELSE 0.0 END AS dmy, fe1 AS cl
         |  FROM $B t),
         |m AS (SELECT count(*)::DOUBLE n, sum(x) sx, sum(dmy) sd, sum(y) sy,
         |   sum(x*x) sxx, sum(dmy*dmy) sdd, sum(x*dmy) sxd,
         |   sum(x*y) sxy, sum(dmy*y) sdy FROM b),
         |c AS (SELECT *, sx/n xb, sd/n db, sy/n yb,
         |   sxx - sx*sx/n AS a11, sdd - sd*sd/n AS a22, sxd - sx*sd/n AS a12,
         |   sxy - sx*sy/n AS c1, sdy - sd*sy/n AS c2 FROM m),
         |sol AS (SELECT *, a11*a22 - a12*a12 AS det,
         |   (a22*c1 - a12*c2)/(a11*a22 - a12*a12) AS b1,
         |   (a11*c2 - a12*c1)/(a11*a22 - a12*a12) AS b2 FROM c),
         |sc AS (SELECT b.cl,
         |   sum((b.y - s.yb - s.b1*(b.x - s.xb) - s.b2*(b.dmy - s.db))
         |       * (b.x - s.xb)) AS s1,
         |   sum((b.y - s.yb - s.b1*(b.x - s.xb) - s.b2*(b.dmy - s.db))
         |       * (b.dmy - s.db)) AS s2
         |  FROM b, sol s GROUP BY b.cl),
         |mt AS (SELECT sum(s1*s1) m11, sum(s1*s2) m12, sum(s2*s2) m22,
         |   count(*)::DOUBLE g FROM sc),
         |v AS (SELECT sol.*, mt.*,
         |   (mt.g/(mt.g - 1.0)) * (sol.n/(sol.n - 3.0)) AS sscale
         |  FROM sol, mt)
         |SELECT term, estimate::REAL AS estimate, std_error::REAL AS std_error
         |FROM (
         | SELECT 'l_quantity' AS term, b1 AS estimate,
         |   sqrt(sscale * (a22*a22*m11 - 2*a22*a12*m12 + a12*a12*m22)
         |     / (det*det)) AS std_error FROM v
         | UNION ALL
         | SELECT 'l_linestatusO', b2,
         |   sqrt(sscale * (a12*a12*m11 - 2*a11*a12*m12 + a11*a11*m22)
         |     / (det*det)) FROM v) u
         |ORDER BY term""".stripMargin,

    "q26_hc1_fit" ->
      s"""WITH m AS (SELECT count(*)::DOUBLE n, sum(x1) sx, sum(y) sy,
         |   sum(x1*x1) sxx, sum(x1*y) sxy, sum(y*y) syy FROM $B t),
         |s AS (SELECT n, sx, sxx, sy, sxy, syy,
         |   (n*sxy - sx*sy)/(n*sxx - sx*sx) AS b1,
         |   sy/n - (n*sxy - sx*sy)/(n*sxx - sx*sx) * sx/n AS b0 FROM m),
         |meat AS (SELECT sum(e*e) m00, sum(e*e*x1) m01, sum(e*e*x1*x1) m11
         |  FROM (SELECT x1, y - (SELECT b0 FROM s) - (SELECT b1 FROM s)*x1 AS e
         |        FROM $B t) q),
         |v AS (SELECT n, b0, b1,
         |   sxx/(n*sxx - sx*sx) AS ai00, -sx/(n*sxx - sx*sx) AS ai01,
         |   n/(n*sxx - sx*sx) AS ai11, m00, m01, m11
         |  FROM s, meat),
         |f AS (SELECT n, b0, b1,
         |   (ai00*ai00*m00 + 2*ai00*ai01*m01 + ai01*ai01*m11) * (n/(n-2)) AS v00,
         |   (ai01*ai01*m00 + 2*ai01*ai11*m01 + ai11*ai11*m11) * (n/(n-2)) AS v11
         |  FROM v)
         |SELECT * FROM (
         | SELECT '(Intercept)' AS term, b0 AS estimate, sqrt(v00) AS std_error FROM f
         | UNION ALL
         | SELECT 'l_quantity', b1, sqrt(v11) FROM f) u
         |ORDER BY term""".stripMargin,

    // K-FE alternating projections, fixed at 2 sweeps × 3 FEs: six
    // unrolled group-mean-subtract CTEs, then the 1-regressor closed
    // forms (β = Σx̃ỹ/Σx̃², rss = Σỹ² − 2βΣx̃ỹ + β²Σx̃²,
    // dfRes = n − 1 − (ΣL − 2)) over the twice-swept residuals
    "q200_hdfe_3fe" ->
      """WITH d0 AS (SELECT CAST(l_extendedprice AS DOUBLE) AS y,
        |    CAST(l_quantity AS DOUBLE) AS x,
        |    l_returnflag AS f1, l_linestatus AS f2, l_linenumber AS f3
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        |    AND l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
        |    AND l_linenumber IS NOT NULL),
        |g1 AS (SELECT f1 k, avg(y) my, avg(x) mx FROM d0 GROUP BY 1),
        |d1 AS (SELECT y - my AS y, x - mx AS x, f1, f2, f3
        |  FROM d0 JOIN g1 ON d0.f1 = g1.k),
        |g2 AS (SELECT f2 k, avg(y) my, avg(x) mx FROM d1 GROUP BY 1),
        |d2 AS (SELECT y - my AS y, x - mx AS x, f1, f2, f3
        |  FROM d1 JOIN g2 ON d1.f2 = g2.k),
        |g3 AS (SELECT f3 k, avg(y) my, avg(x) mx FROM d2 GROUP BY 1),
        |d3 AS (SELECT y - my AS y, x - mx AS x, f1, f2, f3
        |  FROM d2 JOIN g3 ON d2.f3 = g3.k),
        |g4 AS (SELECT f1 k, avg(y) my, avg(x) mx FROM d3 GROUP BY 1),
        |d4 AS (SELECT y - my AS y, x - mx AS x, f1, f2, f3
        |  FROM d3 JOIN g4 ON d3.f1 = g4.k),
        |g5 AS (SELECT f2 k, avg(y) my, avg(x) mx FROM d4 GROUP BY 1),
        |d5 AS (SELECT y - my AS y, x - mx AS x, f1, f2, f3
        |  FROM d4 JOIN g5 ON d4.f2 = g5.k),
        |g6 AS (SELECT f3 k, avg(y) my, avg(x) mx FROM d5 GROUP BY 1),
        |d6 AS (SELECT y - my AS y, x - mx AS x
        |  FROM d5 JOIN g6 ON d5.f3 = g6.k),
        |lv AS (SELECT count(DISTINCT f1) + count(DISTINCT f2)
        |    + count(DISTINCT f3) AS lsum FROM d0),
        |st AS (SELECT count(*)::DOUBLE n, sum(x*y) sxy, sum(x*x) sxx,
        |    sum(y*y) syy FROM d6),
        |b AS (SELECT n, sxx, sxy, syy, sxy / sxx AS beta, lsum FROM st, lv)
        |SELECT 'l_quantity' AS term, beta AS estimate,
        |  sqrt((syy - 2 * beta * sxy + beta * beta * sxx)
        |    / (n - 1 - (lsum - 2)) / sxx) AS std_error
        |FROM b""".stripMargin,

    "q27_cluster_fit" ->
      s"""WITH m AS (SELECT count(*)::DOUBLE n, sum(x1) sx, sum(y) sy,
         |   sum(x1*x1) sxx, sum(x1*y) sxy FROM $B t),
         |s AS (SELECT n, sx, sxx,
         |   (n*sxy - sx*sy)/(n*sxx - sx*sx) AS b1,
         |   sy/n - (n*sxy - sx*sy)/(n*sxx - sx*sx) * sx/n AS b0 FROM m),
         |sc AS (SELECT fe1, sum(y - (SELECT b0 FROM s) - (SELECT b1 FROM s)*x1) s0,
         |          sum((y - (SELECT b0 FROM s) - (SELECT b1 FROM s)*x1)*x1) s1
         |       FROM $B t GROUP BY fe1),
         |meat AS (SELECT count(*)::DOUBLE g, sum(s0*s0) m00, sum(s0*s1) m01,
         |          sum(s1*s1) m11 FROM sc),
         |v AS (SELECT n, b0, b1, g, m00, m01, m11,
         |   sxx/(n*sxx - sx*sx) AS ai00, -sx/(n*sxx - sx*sx) AS ai01,
         |   n/(n*sxx - sx*sx) AS ai11
         |  FROM s, meat),
         |f AS (SELECT n, b0, b1,
         |   (ai00*ai00*m00 + 2*ai00*ai01*m01 + ai01*ai01*m11)
         |     * (g/(g-1)) * (n/(n-2)) AS v00,
         |   (ai01*ai01*m00 + 2*ai01*ai11*m01 + ai11*ai11*m11)
         |     * (g/(g-1)) * (n/(n-2)) AS v11
         |  FROM v)
         |SELECT * FROM (
         | SELECT '(Intercept)' AS term, b0 AS estimate, sqrt(v00) AS std_error FROM f
         | UNION ALL
         | SELECT 'l_quantity', b1, sqrt(v11) FROM f) u
         |ORDER BY term""".stripMargin,

    "q28_binsreg_points" ->
      s"""WITH mm AS (SELECT min(CAST(l_quantity AS DOUBLE)) mn,
         |              max(CAST(l_quantity AS DOUBLE)) mx FROM $B t),
         |binned AS (SELECT y, x1,
         |   (CASE WHEN x1 > mn + (mx-mn)*1/5 THEN 1 ELSE 0 END +
         |    CASE WHEN x1 > mn + (mx-mn)*2/5 THEN 1 ELSE 0 END +
         |    CASE WHEN x1 > mn + (mx-mn)*3/5 THEN 1 ELSE 0 END +
         |    CASE WHEN x1 > mn + (mx-mn)*4/5 THEN 1 ELSE 0 END) AS bin
         |  FROM $B t, mm),
         |g AS (SELECT bin, avg(x1) x, avg(y) fit, count(*) n,
         |        sum(y*y) syy, sum(y) sy FROM binned GROUP BY bin),
         |tot AS (SELECT sum(syy - sy*sy/n) AS rss, sum(n) AS nn,
         |          count(*) AS b FROM g)
         |SELECT bin, x, fit, sqrt((rss/(nn - b)) / n) AS se
         |FROM g, tot ORDER BY bin""".stripMargin,

    "q29_predict_fit" ->
      s"""WITH m AS (SELECT count(*)::DOUBLE n, sum(x1) sx, sum(y) sy,
         |   sum(x1*x1) sxx, sum(x1*y) sxy FROM $B t),
         |s AS (SELECT (n*sxy - sx*sy)/(n*sxx - sx*sx) AS b1,
         |   sy/n - (n*sxy - sx*sy)/(n*sxx - sx*sx) * sx/n AS b0 FROM m)
         |SELECT l_orderkey, l_linenumber,
         |  (SELECT b0 FROM s) + (SELECT b1 FROM s) * CAST(l_quantity AS DOUBLE) AS fit
         |FROM lineitem
         |WHERE l_orderkey <= 100 AND l_extendedprice IS NOT NULL
         |  AND l_quantity IS NOT NULL AND l_discount IS NOT NULL
         |  AND l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q60_percentiles" ->
      s"""SELECT l_returnflag, quantile_cont(y, 0.25) AS p25,
         | quantile_cont(y, 0.5) AS p50, quantile_cont(y, 0.9) AS p90
         |FROM $B t GROUP BY 1 ORDER BY 1""".stripMargin,

    // grouped regression: per-group 1-regressor closed form
    "q59_grouped_fit" ->
      s"""WITH m AS (SELECT fe1 AS grp, count(*)::DOUBLE n, sum(x1) sx, sum(y) sy,
         |   sum(x1*x1) sxx, sum(x1*y) sxy, sum(y*y) syy FROM $B t GROUP BY fe1),
         |s AS (SELECT *, (sxy - sx*sy/n)/(sxx - sx*sx/n) AS b1 FROM m),
         |s2 AS (SELECT *, (sy - b1*sx)/n AS b0, n*sxx - sx*sx AS det FROM s),
         |f AS (SELECT *, (syy - b0*sy - b1*sxy)/(n-2) AS sig2 FROM s2)
         |SELECT grp AS "group", term, estimate, std_error FROM (
         | SELECT grp, '(Intercept)' AS term, b0 AS estimate,
         |   sqrt(sig2 * sxx/det) AS std_error FROM f
         | UNION ALL
         | SELECT grp, 'l_quantity', b1, sqrt(sig2 * n/det) FROM f) u
         |ORDER BY "group", term""".stripMargin,

    "q93_grouped_fe_fit" ->
      """WITH b AS (SELECT l_returnflag AS g, l_suppkey AS fe,
        |    CAST(l_quantity AS DOUBLE) AS x, l_extendedprice AS y
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |    AND l_quantity IS NOT NULL AND l_suppkey IS NOT NULL
        |    AND l_returnflag IS NOT NULL),
        |m AS (SELECT g, fe, avg(x) AS mx, avg(y) AS my FROM b GROUP BY 1, 2),
        |d AS (SELECT b.g, b.fe, b.x - m.mx AS xd, b.y - m.my AS yd
        |  FROM b JOIN m ON b.g = m.g AND b.fe = m.fe),
        |agg AS (SELECT g, count(*)::DOUBLE AS n,
        |    count(DISTINCT fe)::DOUBLE AS L, sum(xd*yd) AS sxy,
        |    sum(xd*xd) AS sxx, sum(yd*yd) AS syy FROM d GROUP BY 1),
        |s AS (SELECT g, n, L, sxx, syy, sxy/sxx AS b1,
        |    syy - (sxy/sxx)*sxy AS rss FROM agg)
        |SELECT g AS "group", 'l_quantity' AS term, b1 AS estimate,
        |  sqrt((rss / greatest(n - 1 - L, 1)) / sxx) AS std_error,
        |  n::BIGINT AS n,
        |  CASE WHEN syy > 0 THEN 1 - rss/syy ELSE 0 END AS r2
        |FROM s ORDER BY "group", term""".stripMargin,

    // GLM logistic via compressed IRLS: the engine pins exactly 4 Newton
    // steps from β=0 (tol=0), each ONE aggregate over the 50 quantity
    // cells; the oracle unrolls the same 4 steps as CTEs with the
    // closed-form 2×2 solve. SEs come from the 4th step's XᵀWX (weights at
    // β₃) — the same one-lag structure as the engine. float32 absorbs
    // summation-order noise (q23 hardening).
    // the oracle text IS the engine-emitted sql_only rendering
    // (GlmSqlGen) — every round re-proves the generated SQL runs and
    // agrees with the engine, the q62-q65 loop applied to the GLM
    "q95_glm_logit_fit" -> graft.reg.Glm.sqlOnly(
      "lineitem", "l_quantity",
      "CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END",
      family = "binomial", iters = 4),

    "q96_glm_poisson_fit" -> graft.reg.Glm.sqlOnly(
      "lineitem", "l_discount", "CAST(l_quantity AS DOUBLE)",
      family = "poisson", iters = 4,
      extraWhere = Seq("l_quantity IS NOT NULL")),

    // one-pass profile: per-column UNION ALL of the same aggregates
    "q123_profile" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_orderkey", "l_linenumber")
      cols.map { c =>
        s"""SELECT '$c' AS col_name, count(*)::BIGINT AS n_rows,
           |  sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
           |  count(DISTINCT $c)::BIGINT AS n_distinct,
           |  min(CAST($c AS DOUBLE)) AS min_val,
           |  max(CAST($c AS DOUBLE)) AS max_val,
           |  avg(CAST($c AS DOUBLE))::REAL AS mean_val FROM lineitem"""
          .stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    // PSI replay: same md5 deal, reference-anchored bins, +0.5 smoothing
    "q124_psi_drift" ->
      s"""WITH d AS (SELECT l_extendedprice AS v,
         |    ${hash32("'q124' || l_orderkey::VARCHAR || '_' || l_linenumber::VARCHAR")}
         |      / 4294967296.0 AS u
         |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
         |e AS (SELECT min(v) AS mn, max(v) AS mx FROM d WHERE u < 0.5),
         |rb AS (SELECT least(greatest(floor((v - mn)/(mx - mn) * 10), 0), 9)::BIGINT
         |    AS bin FROM d CROSS JOIN e WHERE u < 0.5),
         |cb AS (SELECT least(greatest(floor((v - mn)/(mx - mn) * 10), 0), 9)::BIGINT
         |    AS bin FROM d CROSS JOIN e WHERE u >= 0.5),
         |bins AS (SELECT unnest(range(10)) AS bin),
         |rc AS (SELECT bin, count(*)::BIGINT AS n_ref FROM rb GROUP BY 1),
         |cc2 AS (SELECT bin, count(*)::BIGINT AS n_cur FROM cb GROUP BY 1),
         |al AS (SELECT b.bin, coalesce(rc.n_ref, 0) AS n_ref,
         |    coalesce(cc2.n_cur, 0) AS n_cur
         |  FROM bins b LEFT JOIN rc USING (bin) LEFT JOIN cc2 USING (bin)),
         |t AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM al),
         |x AS (SELECT bin, n_ref, n_cur,
         |    (n_ref::DOUBLE + 0.5)/(t_ref::DOUBLE + 5.0) AS p,
         |    (n_cur::DOUBLE + 0.5)/(t_cur::DOUBLE + 5.0) AS q
         |  FROM al CROSS JOIN t)
         |SELECT bin, n_ref, n_cur, ((p - q) * ln(p/q))::REAL AS contrib
         |FROM x ORDER BY bin""".stripMargin,

    // Welch A/B: same conditional-sum moments and expression order
    "q132_ab_test" ->
      s"""WITH b AS (SELECT (l_returnflag = 'R') AS t,
         |    CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem
         |  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL),
         |m AS (SELECT sum(CASE WHEN NOT t THEN 1.0 ELSE 0.0 END) AS na,
         |    sum(CASE WHEN NOT t THEN y ELSE 0.0 END) AS sa,
         |    sum(CASE WHEN NOT t THEN y*y ELSE 0.0 END) AS ssa,
         |    sum(CASE WHEN t THEN 1.0 ELSE 0.0 END) AS nb,
         |    sum(CASE WHEN t THEN y ELSE 0.0 END) AS sb,
         |    sum(CASE WHEN t THEN y*y ELSE 0.0 END) AS ssb FROM b),
         |v AS (SELECT na, nb, sa/na AS ma, sb/nb AS mb,
         |    (ssa - sa*sa/na)/(na - 1.0) AS va,
         |    (ssb - sb*sb/nb)/(nb - 1.0) AS vb FROM m)
         |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, ma::REAL AS mean_a,
         |  mb::REAL AS mean_b, (mb - ma)::REAL AS diff,
         |  sqrt(va/na + vb/nb)::REAL AS se,
         |  ((mb - ma)/sqrt(va/na + vb/nb))::REAL AS t,
         |  (((va/na + vb/nb)*(va/na + vb/nb))
         |   /((va/na)*(va/na)/(na - 1.0)
         |     + (vb/nb)*(vb/nb)/(nb - 1.0)))::REAL AS df
         |FROM v""".stripMargin,

    // winsorize: quantile_cont bounds (q60 parity), clip as a projection
    "q133_winsorize" ->
      s"""WITH v AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
         |  WHERE l_extendedprice IS NOT NULL),
         |b AS (SELECT quantile_cont(x, 0.01) AS lo,
         |    quantile_cont(x, 0.99) AS hi FROM v),
         |w AS (SELECT l_extendedprice AS raw,
         |    CASE WHEN l_extendedprice IS NULL THEN NULL
         |         ELSE least(greatest(CAST(l_extendedprice AS DOUBLE), lo), hi)
         |    END AS w
         |  FROM lineitem CROSS JOIN b)
         |SELECT sum(CASE WHEN raw < w THEN 1 ELSE 0 END)::BIGINT AS n_lo,
         |  sum(CASE WHEN raw > w THEN 1 ELSE 0 END)::BIGINT AS n_hi,
         |  avg(w)::REAL AS mean_w, avg(raw)::REAL AS mean_raw FROM w""".stripMargin,

    // smoothed target encoding: same shrinkage algebra, left-join attach
    "q130_target_encode" ->
      s"""WITH b AS (SELECT l_returnflag AS c, CAST(l_extendedprice AS DOUBLE) AS y
         |  FROM lineitem
         |  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL),
         |pr AS (SELECT sum(y)/count(*) AS p FROM b),
         |enc AS (SELECT c, (sum(y) + 10.0 * p)/(count(*)::DOUBLE + 10.0) AS te
         |  FROM b CROSS JOIN pr GROUP BY c, p),
         |j AS (SELECT l.l_returnflag AS c2, e.te
         |  FROM lineitem l LEFT JOIN enc e ON l.l_returnflag = e.c)
         |SELECT c2 AS l_returnflag, count(*)::BIGINT AS n,
         |  min(te)::REAL AS te_min, max(te)::REAL AS te_max
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // median/MAD outliers: quantile_cont = Spark exact percentile (q60 pin)
    "q131_robust_outliers" ->
      s"""WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
         |  WHERE l_extendedprice IS NOT NULL),
         |me AS (SELECT quantile_cont(v, 0.5) AS med FROM b),
         |ma AS (SELECT quantile_cont(abs(v - med), 0.5) AS mad
         |  FROM b CROSS JOIN me)
         |SELECT (SELECT med FROM me) AS median, (SELECT mad FROM ma) AS mad,
         |  (SELECT sum(CASE WHEN abs(v - med) > 3.0 * 1.4826 * mad
         |     THEN 1 ELSE 0 END) FROM b CROSS JOIN me CROSS JOIN ma)::BIGINT
         |    AS n_outliers,
         |  (SELECT count(*) FROM b)::BIGINT AS n""".stripMargin,

    // Poisson bootstrap replay: same md5 uniforms, same truncated inverse
    // CDF (thresholds rendered from Bootstrap.PoisCdf — identical doubles)
    "q129_bootstrap_ci" -> {
      val wExpr = graft.reg.Bootstrap.PoisCdf
        .map(c => s"CASE WHEN u >= $c THEN 1.0 ELSE 0.0 END")
        .mkString(" + ")
      s"""WITH r AS (SELECT doc_id::VARCHAR AS k, CAST(n_chars AS DOUBLE) AS x
         |  FROM documents WHERE n_chars IS NOT NULL),
         |uu AS (SELECT x, b,
         |    ${hash32("'q129' || k || '_' || b::VARCHAR")} / 4294967296.0 AS u
         |  FROM r CROSS JOIN (SELECT unnest(range(1, 101)) AS b) bb),
         |w AS (SELECT x, b, ($wExpr) AS w FROM uu),
         |rep AS (SELECT b, sum(w) AS sw, sum(w*x) AS swx FROM w GROUP BY b),
         |mean AS (SELECT swx/sw AS m FROM rep WHERE sw > 0),
         |ord AS (SELECT m, row_number() OVER (ORDER BY m) AS rn,
         |    count(*) OVER () AS mm FROM mean),
         |est AS (SELECT avg(x) AS e, count(*)::BIGINT AS n FROM r)
         |SELECT (SELECT e FROM est)::REAL AS est,
         |  (SELECT m FROM ord WHERE rn = greatest(1, ceil(0.025 * mm)))::REAL AS lo,
         |  (SELECT m FROM ord WHERE rn = greatest(1, ceil(0.975 * mm)))::REAL AS hi,
         |  (SELECT n FROM est) AS n,
         |  (SELECT max(mm) FROM ord)::BIGINT AS reps_used""".stripMargin
    },

    // Spearman: average ranks from the distinct-value tables, Pearson on
    // ranks via the moments identity
    "q127_spearman" ->
      s"""WITH b AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
         |    CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem
         |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
         |gx AS (SELECT x, count(*)::DOUBLE AS n FROM b GROUP BY 1),
         |rx AS (SELECT x, coalesce(sum(n) OVER (ORDER BY x
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
         |    + (n + 1.0)/2.0 AS ra FROM gx),
         |gy AS (SELECT y, count(*)::DOUBLE AS n FROM b GROUP BY 1),
         |ry AS (SELECT y, coalesce(sum(n) OVER (ORDER BY y
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
         |    + (n + 1.0)/2.0 AS rb FROM gy),
         |j AS (SELECT ra, rb FROM b JOIN rx USING (x) JOIN ry USING (y)),
         |m AS (SELECT count(*)::DOUBLE AS n, sum(ra) AS sx, sum(rb) AS sy,
         |    sum(ra*ra) AS sxx, sum(rb*rb) AS syy, sum(ra*rb) AS sxy FROM j)
         |SELECT ((n*sxy - sx*sy)
         |  / sqrt((n*sxx - sx*sx)*(n*syy - sy*sy)))::REAL AS rho,
         |  n::BIGINT AS n FROM m""".stripMargin,

    // categorical association: observed-cell chi2 plus the zero-cell total
    // (n - sum of observed expecteds); MI over observed cells only
    "q128_categorical_assoc" ->
      s"""WITH c AS (SELECT l_returnflag AS a, l_linestatus AS b2,
         |    count(*)::DOUBLE AS n FROM lineitem
         |  WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
         |  GROUP BY 1, 2),
         |r AS (SELECT a, sum(n) AS ra FROM c GROUP BY 1),
         |cl AS (SELECT b2, sum(n) AS cb FROM c GROUP BY 1),
         |t AS (SELECT (SELECT sum(ra) FROM r) AS tt,
         |  (SELECT count(*) FROM r) AS nr, (SELECT count(*) FROM cl) AS nc),
         |x AS (SELECT c.n, r.ra, cl.cb, tt, nr, nc
         |  FROM c JOIN r USING (a) JOIN cl USING (b2) CROSS JOIN t),
         |agg AS (SELECT
         |    sum((n - ra*cb/tt)*(n - ra*cb/tt)/(ra*cb/tt)) AS chi2_obs,
         |    sum(ra*cb/tt) AS se, sum(n/tt * ln(n*tt/(ra*cb))) AS mi,
         |    max(tt) AS t2, max(nr) AS nr2, max(nc) AS nc2 FROM x)
         |SELECT (chi2_obs + (t2 - se))::REAL AS chi2,
         |  sqrt((chi2_obs + (t2 - se))
         |    /(t2*(least(nr2, nc2)::DOUBLE - 1.0)))::REAL AS cramers_v,
         |  mi::REAL AS mi, t2::BIGINT AS n FROM agg""".stripMargin,

    // two-sample KS: inclusive cumulative distribution per distinct value
    // (RANGE default frame = the engine's post-distinct ROWS frame)
    "q125_ks_test" ->
      s"""WITH d AS (SELECT l_extendedprice AS v,
         |    ${hash32("'q125' || l_orderkey::VARCHAR || '_' || l_linenumber::VARCHAR")}
         |      / 4294967296.0 AS u
         |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
         |g AS (SELECT v, sum(CASE WHEN u < 0.5 THEN 1.0 ELSE 0.0 END) AS r,
         |    sum(CASE WHEN u >= 0.5 THEN 1.0 ELSE 0.0 END) AS c
         |  FROM d GROUP BY v),
         |x AS (SELECT sum(r) OVER (ORDER BY v) AS cr,
         |    sum(c) OVER (ORDER BY v) AS cc,
         |    sum(r) OVER () AS tr, sum(c) OVER () AS tc FROM g)
         |SELECT max(abs(cr/tr - cc/tc))::REAL AS d,
         |  max(tr)::BIGINT AS n_ref, max(tc)::BIGINT AS n_cur FROM x""".stripMargin,

    // BPE replay: k unrolled iterations of pair-count -> top-1 -> 12-pass
    // replace, with the learned pair threaded as scalar subqueries
    "q134_bpe_train" -> {
      val k = 6
      val out = (1 to k)
        .map(i => s"SELECT $i AS rank, p AS pair, m AS merged, c::BIGINT AS count FROM t$i")
        .mkString("\nUNION ALL\n")
      s"""WITH ${bpeCtes(k)}
         |$out
         |ORDER BY rank""".stripMargin
    },

    // BPE sample-train (the 100 TB recipe: learn ranks on a deterministic
    // md5 document sample, segment the full corpus distributed): same
    // unrolled replay over the hash-filtered source
    "q199_bpe_train_sampled" -> {
      val k = 6
      val where =
        s"WHERE ${hash32("'bpe' || text")} / 4294967296.0 < 0.5"
      val out = (1 to k)
        .map(i => s"SELECT $i AS rank, p AS pair, m AS merged, c::BIGINT AS count FROM t$i")
        .mkString("\nUNION ALL\n")
      s"""WITH ${bpeCtes(k, where)}
         |$out
         |ORDER BY rank""".stripMargin
    },

    // BPE apply: segment the corpus under the 6 learned rules (same CTEs),
    // then weight symbol counts by word frequency
    "q135_bpe_segment" -> {
      val k = 6
      s"""WITH ${bpeCtes(k)}
         |SELECT (SELECT sum(f) FROM w0)::BIGINT AS n_words,
         |  (SELECT sum(f * len(string_split(trim(s), ' '))) FROM w0)::BIGINT
         |    AS n_syms_char,
         |  (SELECT sum(f * len(string_split(trim(s), ' '))) FROM w$k)::BIGINT
         |    AS n_syms_bpe""".stripMargin
    },

    // JSD: full-outer vocab join, zero-side terms drop from their KL half
    "q126_js_divergence" ->
      s"""WITH dd AS (SELECT text,
         |    ${hash32("'q126' || doc_id::VARCHAR")} / 4294967296.0 AS u
         |  FROM documents),
         |ca AS (SELECT w, count(*)::DOUBLE AS c FROM
         |  (SELECT unnest(${toks("text")}) AS w FROM dd WHERE u < 0.5) a GROUP BY 1),
         |cb AS (SELECT w, count(*)::DOUBLE AS c FROM
         |  (SELECT unnest(${toks("text")}) AS w FROM dd WHERE u >= 0.5) b GROUP BY 1),
         |tot AS (SELECT (SELECT sum(c) FROM ca) AS ta,
         |  (SELECT count(*) FROM ca) AS va,
         |  (SELECT sum(c) FROM cb) AS tb, (SELECT count(*) FROM cb) AS vb),
         |j AS (SELECT coalesce(ca.c, 0.0)/ta AS p, coalesce(cb.c, 0.0)/tb AS q
         |  FROM ca FULL OUTER JOIN cb USING (w) CROSS JOIN tot),
         |m AS (SELECT p, q, (p + q)/2.0 AS m FROM j),
         |x AS (SELECT CASE WHEN p > 0.0 THEN p*ln(p/m) ELSE 0.0 END*0.5
         |    + CASE WHEN q > 0.0 THEN q*ln(q/m) ELSE 0.0 END*0.5 AS term FROM m)
         |SELECT (SELECT sum(term) FROM x)::REAL AS jsd,
         |  (SELECT va FROM tot)::BIGINT AS vocab_ref,
         |  (SELECT vb FROM tot)::BIGINT AS vocab_cur""".stripMargin,

    // PMI collocations: same count algebra and operation order; B is the
    // UNfloored bigram total (probability denominator)
    "q121_pmi_collocations" ->
      s"""WITH tk AS (SELECT ${toks("text")} AS t FROM documents),
         |uni AS (SELECT w, count(*)::DOUBLE AS c
         |  FROM (SELECT unnest(t) AS w FROM tk) u GROUP BY 1),
         |bgall AS (SELECT bg, count(*)::DOUBLE AS c12
         |  FROM (SELECT unnest(${bigrams("t")}) AS bg FROM tk) b GROUP BY 1),
         |tot AS (SELECT (SELECT sum(c) FROM uni) AS t_tok,
         |  (SELECT sum(c12) FROM bgall) AS b_bg),
         |bg AS (SELECT string_split(bg, ' ')[1] AS w1,
         |    string_split(bg, ' ')[2] AS w2, c12
         |  FROM bgall WHERE c12 >= 5.0),
         |x AS (SELECT w1, w2, c12,
         |    ln(c12 / b_bg / (u1.c/t_tok * (u2.c/t_tok))) AS pmi
         |  FROM bg JOIN uni u1 ON bg.w1 = u1.w
         |  JOIN uni u2 ON bg.w2 = u2.w CROSS JOIN tot)
         |SELECT w1, w2, c12::BIGINT AS c12, pmi::REAL AS pmi
         |FROM x ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin,

    // Zipf spectrum: integer count-of-counts
    "q122_zipf_spectrum" ->
      s"""SELECT freq, count(*)::BIGINT AS n_tokens
         |FROM (SELECT w, count(*)::BIGINT AS freq
         |  FROM (SELECT unnest(${toks("text")}) AS w FROM documents) u
         |  GROUP BY w) f
         |GROUP BY freq ORDER BY freq""".stripMargin,

    // chi-squared token-label association: same contingency algebra, same
    // textual operation order (bit-identical doubles -> stable top-15 cut)
    "q119_token_chi2" ->
      s"""WITH base AS (SELECT doc_id AS id,
         |    list_contains(${toks("text")}, 'spark') AS lab,
         |    list_distinct(${toks("text")}) AS t FROM documents),
         |tot AS (SELECT count(*)::DOUBLE AS n_docs,
         |    sum(CASE WHEN lab THEN 1.0 ELSE 0.0 END) AS n_pos FROM base),
         |tk AS (SELECT lab, unnest(t) AS token FROM base),
         |cnt AS (SELECT token, count(*)::DOUBLE AS df,
         |    sum(CASE WHEN lab THEN 1.0 ELSE 0.0 END) AS df_pos
         |  FROM tk GROUP BY 1),
         |x AS (SELECT token, df,
         |    n_docs
         |    * (df_pos*(n_docs - n_pos - (df - df_pos))
         |       - (df - df_pos)*(n_pos - df_pos))
         |    * (df_pos*(n_docs - n_pos - (df - df_pos))
         |       - (df - df_pos)*(n_pos - df_pos))
         |    / (df * (n_docs - df) * n_pos * (n_docs - n_pos)) AS chi2
         |  FROM cnt CROSS JOIN tot WHERE df < n_docs)
         |SELECT token, df::BIGINT AS df, chi2::REAL AS chi2
         |FROM x ORDER BY chi2 DESC, token LIMIT 15""".stripMargin,

    // split-conformal replay: same md5 deals (outer 0.8 fit / 0.2 test,
    // inner 0.5 train / 0.5 cal), closed-form OLS on train, qhat = k-th
    // smallest cal |resid| (k = ceil(0.9(n+1))), coverage on test; the NULL
    // CASE mirrors Spark's null-boolean avg exclusion
    "q118_conformal_intervals" ->
      s"""WITH r0 AS (SELECT l_orderkey::VARCHAR || '_' || l_linenumber::VARCHAR
         |    AS rid, CAST(l_quantity AS DOUBLE) AS x,
         |    CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem),
         |d AS (SELECT *, ${hash32("'q118o' || rid")} / 4294967296.0 AS u1 FROM r0),
         |fitp AS (SELECT *, ${hash32("'q118i' || rid")} / 4294967296.0 AS u2
         |  FROM d WHERE u1 < 0.8),
         |tr AS (SELECT x, y FROM fitp
         |  WHERE u2 < 0.5 AND x IS NOT NULL AND y IS NOT NULL),
         |m AS (SELECT count(*)::DOUBLE n, sum(x) sx, sum(y) sy,
         |    sum(x*x) sxx, sum(x*y) sxy FROM tr),
         |b AS (SELECT (n*sxy - sx*sy)/(n*sxx - sx*sx) AS b1,
         |    (sy - (n*sxy - sx*sy)/(n*sxx - sx*sx)*sx)/n AS b0 FROM m),
         |calres AS (SELECT abs(y - (b.b0 + b.b1*x)) AS r
         |  FROM fitp CROSS JOIN b
         |  WHERE u2 >= 0.5 AND x IS NOT NULL AND y IS NOT NULL),
         |ks AS (SELECT count(*)::BIGINT AS nc FROM calres),
         |kk AS (SELECT nc, CAST(ceil(0.9*(nc+1)) AS BIGINT) AS k FROM ks),
         |rk AS (SELECT r, row_number() OVER (ORDER BY r) AS rn FROM calres),
         |qh AS (SELECT rk.r AS qhat FROM rk, kk WHERE rk.rn = kk.k),
         |te AS (SELECT x, y FROM d WHERE u1 >= 0.8),
         |cov AS (SELECT count(*)::BIGINT AS n_test,
         |    avg(CASE WHEN x IS NULL OR y IS NULL THEN NULL
         |             WHEN y >= (b0 + b1*x) - qhat AND y <= (b0 + b1*x) + qhat
         |             THEN 1.0 ELSE 0.0 END) AS coverage
         |  FROM te CROSS JOIN b CROSS JOIN qh)
         |SELECT n_test, coverage::REAL AS coverage,
         |  (SELECT qhat FROM qh)::REAL AS qhat,
         |  (SELECT nc FROM ks)::BIGINT AS n_cal
         |FROM cov""".stripMargin,

    // Okapi BM25 (Lucene idf form), k1=1.2 b=0.75: same postings/df/length
    // algebra as the engine; top-25 cut by (score desc, id), then id order
    "q117_bm25_topk" ->
      s"""WITH tk AS (SELECT doc_id AS id, ${toks("text")} AS t FROM documents),
         |l AS (SELECT id, len(t)::DOUBLE AS dl FROM tk),
         |st AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM l),
         |tok AS (SELECT id, unnest(t) AS token FROM tk),
         |p AS (SELECT id, token, count(*)::DOUBLE AS tf FROM tok
         |  WHERE token IN ('hash', 'join', 'stream', 'vector') GROUP BY 1, 2),
         |dfc AS (SELECT token, count(*)::DOUBLE AS df FROM p GROUP BY 1),
         |sc AS (SELECT p.id,
         |    sum(ln((st.n_docs - dfc.df + 0.5)/(dfc.df + 0.5) + 1.0)
         |        * p.tf * (1.2 + 1.0)
         |        / (p.tf + 1.2*(1.0 - 0.75 + 0.75*l.dl/st.avgdl))) AS bm25,
         |    count(*) AS n_matched
         |  FROM p JOIN dfc USING (token) JOIN l ON p.id = l.id CROSS JOIN st
         |  GROUP BY p.id),
         |top AS (SELECT * FROM sc ORDER BY bm25 DESC, id LIMIT 25)
         |SELECT id, bm25::REAL AS bm25, n_matched FROM top
         |ORDER BY id""".stripMargin,

    // k-fold CV ridge replay: md5 fold deal, per-fold sums, train = total −
    // fold, closed-form centered ridge solve (standardize ⇒ penalty λ·a/n),
    // held-out SSE from the fold's own sums; ties break to the smaller λ
    "q116_cv_ridge" ->
      s"""WITH rw AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
         |    l_extendedprice AS y,
         |    ${hash32("'q116' || l_orderkey::VARCHAR || '_' || l_linenumber::VARCHAR")} % 5 AS f
         |  FROM lineitem
         |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
         |fs AS (SELECT f, count(*)::DOUBLE AS n, sum(x) sx, sum(y) sy,
         |    sum(x*x) sxx, sum(x*y) sxy, sum(y*y) syy FROM rw GROUP BY f),
         |tot AS (SELECT sum(n) n, sum(sx) sx, sum(sy) sy, sum(sxx) sxx,
         |    sum(sxy) sxy, sum(syy) syy FROM fs),
         |lam AS (SELECT * FROM (VALUES (1, 0.0), (2, 0.1), (3, 1.0),
         |    (4, 10.0), (5, 100.0), (6, 1000.0)) l(li, lambda)),
         |fit AS (SELECT fs.f, lam.li, lam.lambda,
         |    (t.sxy - fs.sxy - (t.sx - fs.sx)*(t.sy - fs.sy)/(t.n - fs.n))
         |      / ((t.sxx - fs.sxx - (t.sx - fs.sx)*(t.sx - fs.sx)/(t.n - fs.n))
         |         * (1.0 + lam.lambda/(t.n - fs.n))) AS b1,
         |    (t.sy - fs.sy)/(t.n - fs.n) AS ybt,
         |    (t.sx - fs.sx)/(t.n - fs.n) AS xbt
         |  FROM fs CROSS JOIN lam CROSS JOIN tot t),
         |sse AS (SELECT fit.li, fit.lambda,
         |    fs.syy - 2.0*((fit.ybt - fit.b1*fit.xbt)*fs.sy + fit.b1*fs.sxy)
         |      + ((fit.ybt - fit.b1*fit.xbt)*(fit.ybt - fit.b1*fit.xbt)*fs.n
         |         + 2.0*(fit.ybt - fit.b1*fit.xbt)*fit.b1*fs.sx
         |         + fit.b1*fit.b1*fs.sxx) AS e
         |  FROM fit JOIN fs USING (f)),
         |cv AS (SELECT li, lambda, sum(e) AS cv_sse FROM sse GROUP BY 1, 2),
         |best AS (SELECT li FROM cv ORDER BY cv_sse, li LIMIT 1)
         |SELECT lambda, cv_sse::REAL AS cv_sse,
         |  li = (SELECT li FROM best) AS chosen
         |FROM cv ORDER BY lambda""".stripMargin,

    // 2SLS sql_only parity: the oracle text IS the engine-emitted SQL
    "q115_iv_2sls" -> graft.reg.Iv.sqlOnly(
      "lineitem", "l_quantity", "l_linenumber",
      "CAST(l_extendedprice AS DOUBLE)",
      extraWhere = Seq("l_extendedprice IS NOT NULL")),

    "q120_glm_negbin_fit" -> graft.reg.Glm.sqlOnly(
      "lineitem", "l_discount", "CAST(l_quantity AS DOUBLE)",
      family = "negbin", iters = 4, theta = 2.0,
      extraWhere = Seq("l_quantity IS NOT NULL")),

    "q114_glm_gamma_fit" -> graft.reg.Glm.sqlOnly(
      "lineitem", "l_discount", "CAST(l_extendedprice AS DOUBLE)",
      family = "gamma", iters = 4,
      extraWhere = Seq("l_extendedprice IS NOT NULL")),

    // capstone pipeline: gopher keep + score gate -> exact dedup -> hash
    // split -> rollup, composed from the q97/q98/q30/q76 oracle fragments
    "q100_curation_pipeline" -> {
      val stops = graft.pipeline.TextOps.EnglishStopwords
        .map(s => s"'$s'").mkString("[", ", ", "]")
      val weights = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
      val total = weights.map(_._2).sum
      val cum = weights.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
      val cases = weights.zip(cum).init
        .map { case ((n, _), c) => s"WHEN u < $c THEN '$n'" }
        .mkString(" ")
      s"""WITH tk AS (SELECT doc_id, text, n_chars, ${toks("text")} AS t,
         |    string_split(text, chr(10)) AS ls FROM documents),
         |m AS (SELECT doc_id, text,
         |  1.0/(1.0 + exp(-(-1.5 + n_chars::DOUBLE/1000.0*0.8
         |    + len(t)::DOUBLE/100.0*1.2
         |    - (len(regexp_replace(text, '[^.,;:!?''"()\\[\\]-]', '', 'g'))::DOUBLE
         |       / greatest(len(text), 1)) * 4.0))) AS s,
         |  len(t)::BIGINT AS nw,
         |  greatest(len(t), 1)::DOUBLE AS wd,
         |  greatest(len(ls), 1)::DOUBLE AS ld,
         |  coalesce(list_sum(list_transform(t, x -> len(x))), 0.0)::DOUBLE AS sumlen,
         |  len(regexp_extract_all(text, '#|\\.\\.\\.'))::DOUBLE AS nsym,
         |  len(list_filter(ls, l -> ltrim(l)[1:1] IN ('-', '*')))::DOUBLE AS nbul,
         |  len(list_filter(ls, l -> ends_with(rtrim(l), '...')))::DOUBLE AS nell,
         |  len(list_filter(t, w -> regexp_matches(w, '[a-z]')))::DOUBLE AS nalpha,
         |  len(list_distinct(list_filter(t, w -> list_contains($stops, w))))::BIGINT
         |    AS nstop
         |  FROM tk),
         |gated AS (SELECT doc_id, text, s FROM m
         |  WHERE nw >= 50 AND nw <= 100000
         |    AND sumlen/wd >= 3.0 AND sumlen/wd <= 10.0
         |    AND nsym/wd <= 0.1 AND nbul/ld <= 0.9 AND nell/ld <= 0.3
         |    AND nalpha/wd >= 0.8 AND nstop >= 2
         |    AND s > 0.3),
         |keep AS (SELECT min(doc_id) AS doc_id FROM (
         |    SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) fp
         |    FROM gated) g GROUP BY fp),
         |uni AS (SELECT g.doc_id, g.s FROM gated g JOIN keep USING (doc_id)),
         |lab AS (SELECT doc_id, s,
         |  CASE $cases ELSE '${weights.last._1}' END AS split
         |  FROM (SELECT doc_id, s,
         |    ${hash32("'q100' || doc_id::VARCHAR")} / 4294967296.0 AS u FROM uni) h)
         |SELECT split, count(*)::BIGINT AS n_docs, sum(doc_id)::BIGINT AS sum_ids,
         |  avg(s)::REAL AS avg_score
         |FROM lab GROUP BY split ORDER BY split""".stripMargin
    },

    // grouped GLM: the q95 unrolling with a GROUP BY g key carried through
    // every step
    "q99_glm_grouped_fit" -> graft.reg.Glm.sqlOnly(
      "lineitem", "l_quantity",
      "CASE WHEN l_discount > 0.05 THEN 1.0 ELSE 0.0 END",
      family = "binomial", iters = 3, groupCol = Some("l_returnflag"),
      extraWhere = Seq("l_discount IS NOT NULL")),

    // calibration: train + score + bin in one statement (engine-emitted)
    "q101_calibration" -> graft.reg.GlmSqlGen.calibrationSql(
      "lineitem", "l_quantity",
      "CASE WHEN l_orderkey % 100 < l_quantity THEN 1.0 ELSE 0.0 END",
      family = "binomial", iters = 4, bins = 20),

    // NFC normalization: both engines implement the same Unicode spec
    "q102_nfc_normalize" ->
      """SELECT doc_id, md5(nfc_normalize(text)) AS nfc_md5,
        |  nfc_normalize(text) != text AS changed,
        |  length(nfc_normalize(text)) AS nfc_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Gopher rule set: integer counts and int/int ratios — bit-exact parity
    "q98_gopher_rules" -> {
      val stops = graft.pipeline.TextOps.EnglishStopwords
        .map(s => s"'$s'").mkString("[", ", ", "]")
      s"""WITH tk AS (SELECT doc_id, text, ${toks("text")} AS t,
         |    string_split(text, chr(10)) AS ls FROM documents),
         |m AS (SELECT doc_id,
         |  len(t)::BIGINT AS n_words,
         |  greatest(len(t), 1)::DOUBLE AS wd,
         |  greatest(len(ls), 1)::DOUBLE AS ld,
         |  list_sum(list_transform(t, x -> len(x)))::DOUBLE AS sumlen,
         |  len(regexp_extract_all(text, '#|\\.\\.\\.'))::DOUBLE AS nsym,
         |  len(list_filter(ls, l -> ltrim(l)[1:1] IN ('-', '*')))::DOUBLE AS nbul,
         |  len(list_filter(ls, l -> ends_with(rtrim(l), '...')))::DOUBLE AS nell,
         |  len(list_filter(t, w -> regexp_matches(w, '[a-z]')))::DOUBLE AS nalpha,
         |  len(list_distinct(list_filter(t, w -> list_contains($stops, w))))::BIGINT
         |    AS n_stopwords
         |  FROM tk),
         |sig AS (SELECT doc_id, n_words,
         |  coalesce(sumlen, 0.0)/wd AS mean_word_len, nsym/wd AS symbol_ratio,
         |  nbul/ld AS bullet_ratio, nell/ld AS ellipsis_ratio,
         |  nalpha/wd AS alpha_word_ratio, n_stopwords FROM m)
         |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
         |  ellipsis_ratio, alpha_word_ratio, n_stopwords,
         |  (n_words >= 50 AND n_words <= 100000
         |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |   AND symbol_ratio <= 0.1 AND bullet_ratio <= 0.9
         |   AND ellipsis_ratio <= 0.3 AND alpha_word_ratio >= 0.8
         |   AND n_stopwords >= 2) AS keep
         |FROM sig ORDER BY doc_id""".stripMargin
    },

    // classifier scoring: per-row sigmoid of a fixed linear score — pure
    // projection on both sides
    "q97_glm_score" ->
      s"""WITH sc AS (SELECT doc_id,
         |  1.0/(1.0 + exp(-(-1.5 + n_chars::DOUBLE/1000.0*0.8
         |    + len(${toks("text")})::DOUBLE/100.0*1.2
         |    - (len(regexp_replace(text, '[^.,;:!?''"()\\[\\]-]', '', 'g'))::DOUBLE
         |       / greatest(len(text), 1)) * 4.0))) AS s
         |  FROM documents)
         |SELECT doc_id, s::REAL AS score, s > 0.5 AS keep
         |FROM sc ORDER BY doc_id""".stripMargin,

    // WLS: weighted centered algebra; w = 100·discount + 1 > 0 always
    "q49_wls_fit" ->
      s"""WITH b AS (SELECT l_extendedprice AS y, CAST(l_quantity AS DOUBLE) AS x,
         |    l_discount*100.0 + 1.0 AS w FROM lineitem
         |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
         |    AND l_discount IS NOT NULL AND l_discount*100.0 + 1.0 > 0.0),
         |m AS (SELECT count(*)::DOUBLE n, sum(w) sw, sum(w*x) swx, sum(w*y) swy,
         |   sum(w*x*x) swxx, sum(w*x*y) swxy, sum(w*y*y) swyy FROM b),
         |r AS (SELECT *, (swxy - swx*swy/sw) / (swxx - swx*swx/sw) AS b1 FROM m),
         |r2 AS (SELECT *, (swy - b1*swx)/sw AS b0, sw*swxx - swx*swx AS det FROM r),
         |f AS (SELECT *, swyy - b0*swy - b1*swxy AS rss FROM r2)
         |SELECT term, estimate, std_error FROM (
         | SELECT '(Intercept)' AS term, b0 AS estimate,
         |   sqrt(rss/(n-2) * swxx/det) AS std_error FROM f
         | UNION ALL
         | SELECT 'l_quantity', b1, sqrt(rss/(n-2) * sw/det) FROM f) u
         |ORDER BY term""".stripMargin,

    // prediction standard errors: se_fit² = σ²·xᵀ(XᵀX)⁻¹x closed form
    "q50_predict_se" ->
      s"""WITH b AS (SELECT l_orderkey, l_linenumber, l_extendedprice AS y,
         |    CAST(l_quantity AS DOUBLE) AS x FROM lineitem
         |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
         |grid AS (SELECT l_orderkey, l_linenumber,
         |    CAST(min(l_quantity) AS DOUBLE) AS x FROM lineitem
         |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
         |    AND l_orderkey <= 50 GROUP BY 1, 2),
         |m AS (SELECT count(*)::DOUBLE n, sum(x) sx, sum(y) sy, sum(x*x) sxx,
         |   sum(x*y) sxy, sum(y*y) syy FROM b),
         |s AS (SELECT *, (sxy - sx*sy/n)/(sxx - sx*sx/n) AS b1 FROM m),
         |s2 AS (SELECT *, (sy - b1*sx)/n AS b0, n*sxx - sx*sx AS det FROM s),
         |f AS (SELECT *, (syy - b0*sy - b1*sxy)/(n-2) AS sig2 FROM s2)
         |SELECT l_orderkey, l_linenumber, b0 + b1*x AS fit,
         |  sqrt(sig2*(sxx - 2*x*sx + x*x*n)/det) AS se_fit,
         |  sqrt(sig2*(sxx - 2*x*sx + x*x*n)/det + sig2) AS se_pred
         |FROM grid, f
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // gof: R² / adjusted R² / RMSE from the 2-regressor closed form
    "q51_gof" ->
      s"""WITH m AS (SELECT count(*)::DOUBLE n, sum(x1) s1, sum(x2) s2, sum(y) sy,
         |   sum(x1*x1) s11, sum(x2*x2) s22, sum(x1*x2) s12,
         |   sum(x1*y) s1y, sum(x2*y) s2y, sum(y*y) syy FROM $B t),
         |c AS (SELECT n, s1/n xb1, s2/n xb2, sy/n yb,
         |   s11 - s1*s1/n AS a, s22 - s2*s2/n AS b2c, s12 - s1*s2/n AS c,
         |   s1y - s1*sy/n AS d, s2y - s2*sy/n AS e, syy - sy*sy/n AS f FROM m),
         |sol AS (SELECT *, (b2c*d - c*e)/(a*b2c - c*c) AS b1,
         |   (a*e - c*d)/(a*b2c - c*c) AS b2 FROM c),
         |r AS (SELECT *, f - b1*d - b2*e AS rss FROM sol)
         |SELECT 1.0 - rss/f AS r2,
         |  1.0 - (rss/(n-3))/(f/(n-1)) AS adj_r2,
         |  sqrt(rss/n) AS rmse, n::BIGINT AS n
         |FROM r""".stripMargin,

    // TF-IDF: per-doc top term by tf·ln(N/df), token-asc tiebreak
    "q55_tfidf_top_term" ->
      s"""WITH nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
         |tok AS (SELECT doc_id AS id, unnest(${toks("text")}) AS token
         |  FROM documents),
         |tf AS (SELECT id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dfc AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         |x AS (SELECT id, token, tf,
         |   tf::DOUBLE * ln((SELECT n FROM nn) / df::DOUBLE) AS tfidf
         |  FROM tf JOIN dfc USING (token)),
         |r AS (SELECT *, row_number() OVER
         |   (PARTITION BY id ORDER BY tfidf DESC, token ASC) AS rn FROM x)
         |SELECT id, token, tf, tfidf FROM r WHERE rn = 1
         |ORDER BY id""".stripMargin,

    // winnowing fingerprints: min-hash per sliding window of 4 char-8-grams
    "q52_winnow_fingerprint" ->
      s"""WITH g AS (SELECT doc_id AS id,
         |    CASE WHEN len(text) < 8 THEN CAST([] AS BIGINT[])
         |         ELSE list_transform(range(1, len(text)-6),
         |                i -> ${hash32("substr(text, i::INT, 8)")}) END AS kg
         |  FROM documents),
         |f AS (SELECT id,
         |    CASE WHEN len(kg) = 0 THEN CAST([] AS BIGINT[])
         |         ELSE list_distinct(list_transform(
         |                range(1, greatest(len(kg)-3, 1)+1),
         |                i -> list_min(kg[i:i+3]))) END AS fps
         |  FROM g)
         |SELECT id, len(fps) AS n_fp, list_min(fps) AS min_fp
         |FROM f ORDER BY id""".stripMargin,

    // k-means, 2 Lloyd iterations unrolled: assignment = per-id argmax of
    // cosine over the flattened (cell, dim, weight) centroid table; update
    // = per-(cell, dim) averages with COALESCE fallback for empty cells
    "q56_kmeans_cells" -> {
      def assign(cf: String, out: String) =
        s"""p_$out AS (SELECT ef.id, c.cell, sum(ef.x * c.w) AS dot,
           |    sqrt(sum(c.w * c.w)) AS nc
           |  FROM ef JOIN $cf c USING (i) GROUP BY 1, 2),
           |s_$out AS (SELECT p.id, p.cell, p.dot / (en.nv * p.nc) AS cos
           |  FROM p_$out p JOIN en ON p.id = en.id),
           |$out AS (SELECT id, cell FROM (SELECT *, row_number() OVER
           |    (PARTITION BY id ORDER BY cos DESC, cell ASC) AS rn FROM s_$out)
           |  WHERE rn = 1)""".stripMargin
      def update(a: String, prev: String, out: String) =
        s"""${out}_raw AS (SELECT a.cell, ef.i, avg(ef.x) AS w
           |  FROM $a a JOIN ef ON a.id = ef.id GROUP BY 1, 2),
           |$out AS (SELECT p.cell, p.i, coalesce(r.w, p.w) AS w
           |  FROM $prev p LEFT JOIN ${out}_raw r
           |    ON p.cell = r.cell AND p.i = r.i)""".stripMargin
      s"""WITH e AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         |dims AS (SELECT unnest(range(1, 65)) AS i),
         |c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cell, vec
         |  FROM (SELECT id, vec FROM e ORDER BY id LIMIT 8) t),
         |c0f AS (SELECT cell, i, vec[i]::DOUBLE AS w FROM c0, dims),
         |ef AS (SELECT id, i, vec[i]::DOUBLE AS x FROM e, dims),
         |en AS (SELECT id, sqrt(sum(x*x)) AS nv FROM ef GROUP BY id),
         |${assign("c0f", "a1")},
         |${update("a1", "c0f", "c1f")},
         |${assign("c1f", "a2")},
         |${update("a2", "c1f", "c2f")},
         |${assign("c2f", "a3")}
         |SELECT cell::BIGINT AS cell, count(*) AS n, min(id) AS min_id
         |FROM a3 GROUP BY cell ORDER BY cell""".stripMargin
    },

    // embedding near-dup pairs via sign-LSH buckets (plane construction
    // identical to q36)
    "q53_embedding_lsh_pairs" -> {
      val planeW =
        s"(${hash32("'plane_' || pp || '_dim_' || dd")} % 1000)::DOUBLE / 1000.0 - 0.5"
      s"""WITH planes AS (SELECT pp, dd, $planeW AS w
         |  FROM (SELECT unnest(range(0, 4)) AS pp) tp,
         |       (SELECT unnest(range(0, 64)) AS dd) td),
         |proj AS (SELECT e.vec_id, pl.pp,
         |    sum(e.embedding[pl.dd + 1]::DOUBLE * pl.w) AS s
         |  FROM embeddings e, planes pl GROUP BY 1, 2),
         |sigs AS (SELECT vec_id, sum(CASE WHEN s >= 0 THEN 1 << pp ELSE 0 END)
         |    AS bucket FROM proj GROUP BY vec_id),
         |sv AS (SELECT s.vec_id, s.bucket, e.embedding
         |  FROM sigs s JOIN embeddings e USING (vec_id)),
         |pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
         |   ${cosSql("a.embedding", "b.embedding")} AS cos
         |  FROM sv a JOIN sv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT id1, id2, cos FROM pairs WHERE cos >= 0.45
         |ORDER BY id1, id2""".stripMargin
    },

    // ---- pipeline oracles ----
    "q30_dedup_exact" ->
      s"""SELECT sum(n_docs)::BIGINT AS n_docs, count(*) AS n_unique,
         | sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_groups
         |FROM (SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) fp,
         |        count(*) AS n_docs, min(doc_id) AS keep_id
         |      FROM documents GROUP BY 1) g""".stripMargin,

    "q31_jaccard_pairs" ->
      s"""WITH $ShingleSets,
         |sizes AS (SELECT id, count(*) sz FROM sh GROUP BY id),
         |common AS (SELECT a.id id1, b.id id2, count(*) AS common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
         |  GROUP BY 1, 2)
         |SELECT id1, id2,
         |  common::DOUBLE / (s1.sz + s2.sz - common) AS jaccard
         |FROM common JOIN sizes s1 ON common.id1 = s1.id
         |  JOIN sizes s2 ON common.id2 = s2.id
         |WHERE common::DOUBLE / (s1.sz + s2.sz - common) >= 0.4
         |ORDER BY id1, id2""".stripMargin,

    "q94_dedup_against" ->
      s"""WITH corpus AS (SELECT doc_id AS id, text FROM documents
         |  WHERE doc_id % 10 <> 0),
         |fresh AS (SELECT doc_id + 1000000 AS id, text FROM documents
         |  WHERE doc_id % 10 = 0),
         |shc AS (SELECT DISTINCT id, unnest(${bigrams(toks("text"))}) AS shingle
         |  FROM corpus),
         |shn AS (SELECT DISTINCT id, unnest(${bigrams(toks("text"))}) AS shingle
         |  FROM fresh),
         |szc AS (SELECT id, count(*) sz FROM shc GROUP BY id),
         |szn AS (SELECT id, count(*) sz FROM shn GROUP BY id),
         |common AS (SELECT n.id, c.id AS cid, count(*) AS c
         |  FROM shn n JOIN shc c ON n.shingle = c.shingle GROUP BY 1, 2),
         |j AS (SELECT common.id, cid,
         |    c::DOUBLE / (szn.sz + szc.sz - c) AS jaccard
         |  FROM common JOIN szn ON common.id = szn.id
         |    JOIN szc ON common.cid = szc.id
         |  WHERE c::DOUBLE / (szn.sz + szc.sz - c) >= 0.4),
         |best AS (SELECT id, cid AS dup_of, jaccard, row_number() OVER
         |    (PARTITION BY id ORDER BY jaccard DESC, cid ASC) AS r FROM j)
         |SELECT f.id, b.dup_of, b.jaccard
         |FROM fresh f LEFT JOIN (SELECT * FROM best WHERE r = 1) b
         |  ON f.id = b.id
         |ORDER BY f.id""".stripMargin,

    "q32_minhash_sigs" ->
      s"""WITH $ShingleSets,
         |$MinhashTable,
         |hx AS (SELECT id, ${hash32("shingle")} % ${Dedup.MinhashP} AS x FROM sh),
         |mh AS (SELECT id, i, min((x * a + b) % ${Dedup.MinhashP}) AS h
         |  FROM hx CROSS JOIN hashes GROUP BY id, i)
         |SELECT id, string_agg(h::VARCHAR, ',' ORDER BY i) AS sig
         |FROM mh GROUP BY id ORDER BY id""".stripMargin,

    "q33_minhash_pairs" ->
      s"""WITH $ShingleSets,
         |$MinhashTable,
         |hx AS (SELECT id, ${hash32("shingle")} % ${Dedup.MinhashP} AS x FROM sh),
         |mh AS (SELECT id, i, min((x * a + b) % ${Dedup.MinhashP}) AS h
         |  FROM hx CROSS JOIN hashes GROUP BY id, i),
         |bk AS (SELECT id, i // ${Dedup.BandRows} AS band,
         |         string_agg(h::VARCHAR, ',' ORDER BY i) AS bucket
         |       FROM mh GROUP BY id, i // ${Dedup.BandRows}),
         |cand AS (SELECT DISTINCT a.id id1, b.id id2
         |  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
         |    AND a.id < b.id),
         |sizes AS (SELECT id, count(*) sz FROM sh GROUP BY id),
         |common AS (SELECT c.id1, c.id2, count(*) AS common
         |  FROM cand c JOIN sh a ON a.id = c.id1 JOIN sh b ON b.id = c.id2
         |    AND a.shingle = b.shingle
         |  GROUP BY 1, 2)
         |SELECT id1, id2, common::DOUBLE / (s1.sz + s2.sz - common) AS jaccard
         |FROM common JOIN sizes s1 ON common.id1 = s1.id
         |  JOIN sizes s2 ON common.id2 = s2.id
         |WHERE common::DOUBLE / (s1.sz + s2.sz - common) >= 0.5
         |ORDER BY id1, id2""".stripMargin,

    "q70_contamination" ->
      s"""WITH $ShingleSets,
         |bsh AS (SELECT DISTINCT shingle FROM sh WHERE id % 37 = 0),
         |h AS (SELECT s.id, count(*) AS n_shingles,
         |             count(b.shingle) AS n_contaminated
         |      FROM sh s LEFT JOIN bsh b ON s.shingle = b.shingle
         |      GROUP BY s.id)
         |SELECT id, n_shingles, n_contaminated,
         |  n_contaminated::DOUBLE / n_shingles AS contamination
         |FROM h
         |WHERE n_contaminated::DOUBLE / n_shingles >= 0.8
         |ORDER BY id""".stripMargin,

    // decontamination ingest: merged two-suite shingle state, shard probe
    "q263_contamination_ingest" ->
      s"""WITH $ShingleSets,
         |bsh AS (SELECT DISTINCT shingle FROM sh
         |        WHERE id % 37 = 0 OR id % 41 = 0),
         |ssh AS (SELECT id, shingle FROM sh WHERE id % 5 = 1),
         |h AS (SELECT s.id, count(*) AS n_shingles,
         |             count(b.shingle) AS n_contaminated
         |      FROM ssh s LEFT JOIN bsh b ON s.shingle = b.shingle
         |      GROUP BY s.id)
         |SELECT id, n_shingles, n_contaminated,
         |  n_contaminated::DOUBLE / n_shingles AS contamination
         |FROM h
         |ORDER BY id""".stripMargin,

    // per-suite contamination attribution: each suite keeps its own
    // distinct shingle sliver (a shared shingle counts once PER SUITE);
    // one row per (doc, suite) pair with >= 1 hit
    "q266_contamination_by_suite" ->
      s"""WITH $ShingleSets,
         |bsh AS (
         |  SELECT shingle, 's37' AS suite_id FROM
         |    (SELECT DISTINCT shingle FROM sh WHERE id % 37 = 0)
         |  UNION ALL
         |  SELECT shingle, 's41' AS suite_id FROM
         |    (SELECT DISTINCT shingle FROM sh WHERE id % 41 = 0)),
         |ssh AS (SELECT id, shingle FROM sh WHERE id % 5 = 1),
         |tot AS (SELECT id, count(*) AS n_shingles FROM ssh GROUP BY id),
         |hits AS (SELECT s.id, b.suite_id, count(*) AS n_contaminated
         |         FROM ssh s JOIN bsh b ON s.shingle = b.shingle
         |         GROUP BY 1, 2)
         |SELECT h.id, h.suite_id, t.n_shingles, h.n_contaminated,
         |  h.n_contaminated::DOUBLE / t.n_shingles AS contamination
         |FROM hits h JOIN tot t ON h.id = t.id
         |ORDER BY h.id, h.suite_id""".stripMargin,

    // decontamination scrub: EVERY 5-token window of a shard doc whose
    // space-joined shingle appears anywhere in the suite is masked (no
    // first-occurrence survivor — suite text must not survive at all),
    // text rebuilt from the unmasked positions (the q233 rebuild algebra)
    "q267_decontaminate_scrub" ->
      s"""WITH fresh AS (SELECT doc_id AS id, ${toks("text")} AS toks
         |  FROM documents WHERE doc_id % 5 = 1),
         |st AS (SELECT ${toks("text")} AS toks FROM documents
         |  WHERE doc_id % 37 = 0),
         |sw0 AS (SELECT unnest(range(1, len(toks) - 3)) AS i, toks FROM st),
         |sw AS (SELECT DISTINCT array_to_string(toks[i:i+4], ' ') AS s
         |  FROM sw0),
         |w0 AS (SELECT id, unnest(range(1, len(toks) - 3)) AS i FROM fresh),
         |w AS (SELECT w0.id, (i - 1)::BIGINT AS pos,
         |    array_to_string(f.toks[i:i+4], ' ') AS s
         |  FROM w0 JOIN fresh f USING (id)),
         |m AS (SELECT w.id, w.pos FROM w JOIN sw USING (s)),
         |mp AS (SELECT id, unnest(range(pos, pos + 5)) AS p FROM m),
         |mk AS (SELECT id, list(DISTINCT p) AS mask FROM mp GROUP BY id),
         |f AS (SELECT t.id, t.toks,
         |    list_filter(range(1, len(t.toks) + 1),
         |      i -> mk.mask IS NULL OR NOT list_contains(mk.mask, i - 1)) AS kept
         |  FROM fresh t LEFT JOIN mk ON t.id = mk.id)
         |SELECT id, len(toks)::BIGINT AS n_tokens,
         |  (len(toks) - len(kept))::BIGINT AS n_removed,
         |  coalesce(array_to_string(list_transform(kept, i -> toks[i]), ' '),
         |    '') AS text_clean
         |FROM f ORDER BY id""".stripMargin,

    // leakage-safe split: q43's transitive-cluster algebra at the 0.4
    // Jaccard threshold, then the md5 hash split keyed on the cluster
    // representative (singletons key on their own id)
    "q264_leakage_safe_split" ->
      s"""WITH $ShingleSets,
         |sizes AS (SELECT id, count(*) sz FROM sh GROUP BY id),
         |common AS (SELECT a.id id1, b.id id2, count(*) AS common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
         |  GROUP BY 1, 2),
         |pairs AS (SELECT id1, id2 FROM common
         |  JOIN sizes s1 ON common.id1 = s1.id
         |  JOIN sizes s2 ON common.id2 = s2.id
         |  WHERE common::DOUBLE / (s1.sz + s2.sz - common) >= 0.4),
         |edges AS (SELECT id1 a, id2 b FROM pairs
         |  UNION ALL SELECT id2, id1 FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |comp AS (
         |  WITH RECURSIVE reach(id, label) AS (
         |    SELECT id, id FROM nodes
         |    UNION
         |    SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.id
         |  )
         |  SELECT id, min(label) AS cluster FROM reach GROUP BY id),
         |keyed AS (SELECT d.doc_id,
         |    coalesce(c.cluster, d.doc_id) AS k
         |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
         |SELECT doc_id AS id,
         |  CASE WHEN ${hash32("'q264' || k::VARCHAR")} / 4294967296.0 < 0.8
         |    THEN 'train' ELSE 'eval' END AS split
         |FROM keyed
         |ORDER BY id""".stripMargin,

    // leakage split against a merged frozen cluster state: pairs produced
    // within each PARITY subcorpus only (state = even-pairs CC, merge folds
    // in the odd pairs), so the oracle's candidate join is parity-equal —
    // CC then runs over the union pair list, split keyed on the component
    // minimum (merged ≡ rebuilt is the engine-side guarantee under test)
    "q265_leakage_split_merged_state" ->
      s"""WITH $ShingleSets,
         |sizes AS (SELECT id, count(*) sz FROM sh GROUP BY id),
         |common AS (SELECT a.id id1, b.id id2, count(*) AS common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
         |    AND a.id % 2 = b.id % 2
         |  GROUP BY 1, 2),
         |pairs AS (SELECT id1, id2 FROM common
         |  JOIN sizes s1 ON common.id1 = s1.id
         |  JOIN sizes s2 ON common.id2 = s2.id
         |  WHERE common::DOUBLE / (s1.sz + s2.sz - common) >= 0.4),
         |edges AS (SELECT id1 a, id2 b FROM pairs
         |  UNION ALL SELECT id2, id1 FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |comp AS (
         |  WITH RECURSIVE reach(id, label) AS (
         |    SELECT id, id FROM nodes
         |    UNION
         |    SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.id
         |  )
         |  SELECT id, min(label) AS cluster FROM reach GROUP BY id),
         |keyed AS (SELECT d.doc_id,
         |    coalesce(c.cluster, d.doc_id) AS k
         |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
         |SELECT doc_id AS id,
         |  CASE WHEN ${hash32("'q265' || k::VARCHAR")} / 4294967296.0 < 0.8
         |    THEN 'train' ELSE 'eval' END AS split
         |FROM keyed
         |ORDER BY id""".stripMargin,

    // composed: q265's cluster-keyed split (salt q268) -> train side ->
    // q234's exact per-domain token-budget window over the survivors
    "q268_split_then_budget" ->
      s"""WITH $ShingleSets,
         |sizes AS (SELECT id, count(*) sz FROM sh GROUP BY id),
         |common AS (SELECT a.id id1, b.id id2, count(*) AS common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
         |    AND a.id % 2 = b.id % 2
         |  GROUP BY 1, 2),
         |pairs AS (SELECT id1, id2 FROM common
         |  JOIN sizes s1 ON common.id1 = s1.id
         |  JOIN sizes s2 ON common.id2 = s2.id
         |  WHERE common::DOUBLE / (s1.sz + s2.sz - common) >= 0.4),
         |edges AS (SELECT id1 a, id2 b FROM pairs
         |  UNION ALL SELECT id2, id1 FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |comp AS (
         |  WITH RECURSIVE reach(id, label) AS (
         |    SELECT id, id FROM nodes
         |    UNION
         |    SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.id
         |  )
         |  SELECT id, min(label) AS cluster FROM reach GROUP BY id),
         |train AS (SELECT d.doc_id, d.lang, d.text
         |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
         |  WHERE ${hash32(
              "'q268' || coalesce(c.cluster, d.doc_id)::VARCHAR")}
         |    / 4294967296.0 < 0.8),
         |b(lang, budget) AS (VALUES ('en', 3000), ('de', 1200), ('zh', 700)),
         |t AS (SELECT doc_id, lang, len(${toks("text")})::BIGINT AS nt,
         |    ${hash32("'q268' || doc_id::VARCHAR")} / 4294967296.0 AS u
         |  FROM train),
         |r AS (SELECT doc_id, lang, nt,
         |    coalesce(sum(nt) OVER (PARTITION BY lang ORDER BY u, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM t)
         |SELECT r.doc_id AS id, r.lang, r.nt AS n_tokens
         |FROM r JOIN b USING (lang) WHERE cum < budget ORDER BY id""".stripMargin,

    // all-matches incremental dedup: EVERY above-threshold (fresh doc,
    // corpus representative) pair. Candidate algebra = q94's exact-class
    // fingerprints (rep = min corpus id per distinct shingle set) plus
    // q33's minhash-LSH banding (per-doc signatures are set-level
    // invariants, so per-doc collisions equal the engine's rep-bucket
    // collisions); verification is exact Jaccard vs the rep's set
    "q269_dedup_against_all" ->
      s"""WITH corpus AS (SELECT doc_id AS id, text FROM documents
         |  WHERE doc_id % 10 <> 0),
         |fresh AS (SELECT doc_id + 1000000 AS id, text FROM documents
         |  WHERE doc_id % 10 = 0),
         |$MinhashTable,
         |shc AS (SELECT DISTINCT id, unnest(${bigrams(toks("text"))}) AS shingle
         |  FROM corpus),
         |shn AS (SELECT DISTINCT id, unnest(${bigrams(toks("text"))}) AS shingle
         |  FROM fresh),
         |fpc AS (SELECT id, string_agg(shingle, chr(1) ORDER BY shingle) AS fp
         |  FROM shc GROUP BY id),
         |fpn AS (SELECT id, string_agg(shingle, chr(1) ORDER BY shingle) AS fp
         |  FROM shn GROUP BY id),
         |reps AS (SELECT fp, min(id) AS cid FROM fpc GROUP BY fp),
         |exact AS (SELECT n.id, r.cid FROM fpn n JOIN reps r USING (fp)),
         |hxc AS (SELECT id, ${hash32("shingle")} % ${Dedup.MinhashP} AS x FROM shc),
         |mhc AS (SELECT id, i, min((x * a + b) % ${Dedup.MinhashP}) AS h
         |  FROM hxc CROSS JOIN hashes GROUP BY id, i),
         |bkc AS (SELECT id, i // ${Dedup.BandRows} AS band,
         |         string_agg(h::VARCHAR, ',' ORDER BY i) AS bucket
         |       FROM mhc GROUP BY id, i // ${Dedup.BandRows}),
         |hxn AS (SELECT id, ${hash32("shingle")} % ${Dedup.MinhashP} AS x FROM shn),
         |mhn AS (SELECT id, i, min((x * a + b) % ${Dedup.MinhashP}) AS h
         |  FROM hxn CROSS JOIN hashes GROUP BY id, i),
         |bkn AS (SELECT id, i // ${Dedup.BandRows} AS band,
         |         string_agg(h::VARCHAR, ',' ORDER BY i) AS bucket
         |       FROM mhn GROUP BY id, i // ${Dedup.BandRows}),
         |nearc AS (SELECT DISTINCT n.id, r.cid
         |  FROM bkn n JOIN bkc c ON n.band = c.band AND n.bucket = c.bucket
         |  JOIN fpc fc ON fc.id = c.id JOIN reps r ON r.fp = fc.fp),
         |cand AS (SELECT id, cid FROM exact UNION SELECT id, cid FROM nearc),
         |szn AS (SELECT id, count(*) sz FROM shn GROUP BY id),
         |szc AS (SELECT id, count(*) sz FROM shc GROUP BY id),
         |common AS (SELECT cd.id, cd.cid, count(*) AS c
         |  FROM cand cd JOIN shn n ON n.id = cd.id
         |    JOIN shc c2 ON c2.id = cd.cid AND c2.shingle = n.shingle
         |  GROUP BY 1, 2)
         |SELECT common.id, cid AS dup_of,
         |  c::DOUBLE / (szn.sz + szc.sz - c) AS jaccard
         |FROM common JOIN szn ON common.id = szn.id
         |  JOIN szc ON common.cid = szc.id
         |WHERE c::DOUBLE / (szn.sz + szc.sz - c) >= 0.4
         |ORDER BY common.id, dup_of""".stripMargin,

    // complete daily-refresh recipe oracle: a FROM-SCRATCH rebuild over
    // resident ∪ relabeled shard — q201's minhash-LSH verified pair
    // algebra at the 0.4 threshold feeding the recursive-CTE connected
    // components; the engine side must reach the identical cluster map
    // from (frozen resident state + shard pairs + cross all-matches)
    "q270_cluster_refresh_cross" ->
      s"""WITH udocs AS (SELECT CASE WHEN doc_id % 10 = 0
         |    THEN doc_id + 1000000 ELSE doc_id END AS id, text
         |  FROM documents),
         |$MinhashTable,
         |sh AS (SELECT DISTINCT id, unnest(${bigrams(toks("text"))}) AS shingle
         |  FROM udocs),
         |hx AS (SELECT id, ${hash32("shingle")} % ${Dedup.MinhashP} AS x FROM sh),
         |mh AS (SELECT id, i, min((x * a + b) % ${Dedup.MinhashP}) AS h
         |  FROM hx CROSS JOIN hashes GROUP BY id, i),
         |bk AS (SELECT id, i // ${Dedup.BandRows} AS band,
         |         string_agg(h::VARCHAR, ',' ORDER BY i) AS bucket
         |       FROM mh GROUP BY id, i // ${Dedup.BandRows}),
         |cand AS (SELECT DISTINCT a.id id1, b.id id2
         |  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
         |    AND a.id < b.id),
         |sizes AS (SELECT id, count(*) sz FROM sh GROUP BY id),
         |common AS (SELECT c.id1, c.id2, count(*) AS common
         |  FROM cand c JOIN sh a ON a.id = c.id1 JOIN sh b ON b.id = c.id2
         |    AND a.shingle = b.shingle
         |  GROUP BY 1, 2),
         |pairs AS (SELECT id1, id2 FROM common
         |  JOIN sizes s1 ON common.id1 = s1.id
         |  JOIN sizes s2 ON common.id2 = s2.id
         |  WHERE common::DOUBLE / (s1.sz + s2.sz - common) >= 0.4),
         |edges AS (SELECT id1 a, id2 b FROM pairs
         |  UNION ALL SELECT id2, id1 FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |comp AS (
         |  WITH RECURSIVE reach(id, label) AS (
         |    SELECT id, id FROM nodes
         |    UNION
         |    SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.id
         |  )
         |  SELECT id, min(label) AS cluster FROM reach GROUP BY id)
         |SELECT id, cluster FROM comp ORDER BY id""".stripMargin,

    // per-suite decontamination report: each suite's own distinct
    // window set masks positions independently (q267's window algebra,
    // q266's per-suite provenance); count of distinct masked positions
    // per (doc, suite), hits-sized
    "q271_decontaminate_by_suite" ->
      s"""WITH fresh AS (SELECT doc_id AS id, ${toks("text")} AS toks
         |  FROM documents WHERE doc_id % 5 = 1),
         |stA AS (SELECT ${toks("text")} AS toks FROM documents
         |  WHERE doc_id % 37 = 0),
         |stB AS (SELECT ${toks("text")} AS toks FROM documents
         |  WHERE doc_id % 41 = 0),
         |swA AS (SELECT DISTINCT array_to_string(toks[i:i+4], ' ') AS s
         |  FROM (SELECT unnest(range(1, len(toks) - 3)) AS i, toks FROM stA)),
         |swB AS (SELECT DISTINCT array_to_string(toks[i:i+4], ' ') AS s
         |  FROM (SELECT unnest(range(1, len(toks) - 3)) AS i, toks FROM stB)),
         |sw AS (SELECT s, 's37' AS suite_id FROM swA
         |  UNION ALL SELECT s, 's41' AS suite_id FROM swB),
         |w0 AS (SELECT id, unnest(range(1, len(toks) - 3)) AS i FROM fresh),
         |w AS (SELECT w0.id, (i - 1)::BIGINT AS pos,
         |    array_to_string(f.toks[i:i+4], ' ') AS s
         |  FROM w0 JOIN fresh f USING (id)),
         |m AS (SELECT w.id, sw.suite_id, w.pos FROM w JOIN sw USING (s)),
         |mp0 AS (SELECT id, suite_id, unnest(range(pos, pos + 5)) AS p FROM m),
         |mp AS (SELECT DISTINCT id, suite_id, p FROM mp0)
         |SELECT id, suite_id, count(*) AS n_removed
         |FROM mp GROUP BY 1, 2 ORDER BY id, suite_id""".stripMargin,

    "q71_repetition" ->
      s"""WITH t AS (SELECT doc_id AS id, ${toks("text")} AS t FROM documents),
         |tok AS (SELECT id, unnest(t) AS tok FROM t),
         |tc AS (SELECT id, count(*) AS n_tokens,
         |              count(DISTINCT tok) AS nd FROM tok GROUP BY id),
         |bg AS (SELECT id, unnest(${bigrams("t")}) AS b FROM t),
         |bgc AS (SELECT id, b, count(*) AS c FROM bg GROUP BY 1, 2),
         |top AS (SELECT id, max(c)::DOUBLE / sum(c)::DOUBLE AS top_bigram_frac
         |        FROM bgc GROUP BY id)
         |SELECT tc.id, tc.n_tokens,
         |  tc.nd::DOUBLE / tc.n_tokens AS distinct_token_ratio,
         |  top.top_bigram_frac
         |FROM tc LEFT JOIN top USING (id)
         |ORDER BY tc.id""".stripMargin,

    "q72_simhash_pairs" -> {
      // brute-force all-pairs Hamming filter — the LSH banding in
      // Dedup.simhashPairs has perfect recall at maxHamming < nBands, so
      // the engine's banded result must equal this exact computation
      val bitSums = (0 until Dedup.SimhashBits)
        .map(k => s"sum(CASE WHEN (x >> $k) & 1 = 1 THEN 1 ELSE -1 END) AS b$k")
        .mkString(",\n ")
      val value = (0 until Dedup.SimhashBits)
        .map(k => s"CASE WHEN b$k > 0 THEN ${1L << k} ELSE 0 END")
        .mkString(" + ")
      s"""WITH tok AS (SELECT doc_id AS id, unnest(${toks("text")}) AS tok
         |  FROM documents),
         |hx AS (SELECT id, ${hash32("tok")} AS x FROM tok),
         |bits AS (SELECT id, $bitSums FROM hx GROUP BY id),
         |sig AS (SELECT id, ($value)::BIGINT AS simhash FROM bits)
         |SELECT a.id AS id1, b.id AS id2,
         |  bit_count(xor(a.simhash, b.simhash))::INTEGER AS hamming
         |FROM sig a JOIN sig b ON a.id < b.id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY id1, id2""".stripMargin
    },

    "q73_pii_scrub" -> {
      import graft.pipeline.TextOps
      // identical plant expression as the Spark side, rendered in SQL.
      // Single line: a leading `||` after a margin would lose one pipe to
      // the OUTER template's stripMargin.
      val plant = Seq(
        "text", "' contact user'", "doc_id::VARCHAR", "'@example.com'",
        "' ip 10.'", "(doc_id % 256)::VARCHAR", "'.0.1'",
        "' call +1 415-555-'", "lpad((doc_id % 10000)::VARCHAR, 4, '0')",
        "CASE WHEN doc_id % 3 = 0 THEN ' ssn 123-45-6789' ELSE '' END",
        "' see https://example.com/a?b=c'"
      ).mkString(" || ")
      val countCols = TextOps.PiiPatterns.map { case (name, pat, _) =>
        s"len(regexp_extract_all(text, '$pat'))::BIGINT AS n_$name"
      }.mkString(",\n  ")
      val redacted = TextOps.PiiPatterns.foldLeft("text") {
        case (acc, (_, pat, repl)) => s"regexp_replace($acc, '$pat', '$repl', 'g')"
      }
      s"""WITH planted AS (SELECT doc_id, $plant AS text FROM documents)
         |SELECT doc_id,
         |  $countCols,
         |  md5($redacted) AS redacted_md5
         |FROM planted
         |ORDER BY doc_id""".stripMargin
    },

    "q91_strip_markup" -> {
      import graft.pipeline.TextOps
      // identical plant as the Spark side; strip chain rendered from the
      // SAME TextOps pattern constants so the two can't drift. All
      // fragments single-line (outer stripMargin would eat a leading ||).
      val plant = Seq(
        "'<html><head><title>d'", "doc_id::VARCHAR",
        "'</title><style>body { color: red; }</style></head><body>'",
        "CASE WHEN doc_id % 3 = 0 THEN '<script type=\"text/javascript\">var x = 1 < 2;</script>' ELSE '' END",
        "'<!-- nav --><div class=\"nav\"><a href=\"/home\">Home</a></div><p>'",
        "text", "'</p>'",
        "CASE WHEN doc_id % 5 = 0 THEN '<p>a &amp;lt; b &nbsp;&gt; c &quot;q&quot; &#39;s&#39;</p>' ELSE '' END",
        "'</body></html>'").mkString(" || ")
      def esc(s: String) = s.replace("'", "''")
      val noBlocks = Seq(TextOps.ScriptBlockPattern, TextOps.StyleBlockPattern,
        TextOps.CommentPattern, TextOps.TagPattern)
        .foldLeft("text")((acc, pat) => s"regexp_replace($acc, '${esc(pat)}', ' ', 'g')")
      val decoded = TextOps.EntityDecodes.foldLeft(noBlocks) { case (acc, (ent, repl)) =>
        s"replace($acc, '${esc(ent)}', '${esc(repl)}')"
      }
      s"""WITH planted AS (SELECT doc_id, $plant AS text FROM documents),
         |s AS (SELECT doc_id, text,
         |  trim(regexp_replace($decoded, '\\s+', ' ', 'g')) AS vis FROM planted)
         |SELECT doc_id, md5(vis) AS visible_md5,
         |  CASE WHEN length(text) = 0 THEN 0.0
         |       ELSE 1.0 - length(vis)::DOUBLE / length(text)::DOUBLE
         |  END AS markup_ratio
         |FROM s ORDER BY doc_id""".stripMargin
    },

    "q74_chunking" ->
      s"""WITH t AS (SELECT doc_id, ${toks("text")} AS t FROM documents),
         |c AS (SELECT doc_id, t,
         |        CASE WHEN len(t) = 0 THEN 0
         |             ELSE greatest(ceil((len(t) - 4)::DOUBLE / 12)::INT, 1) END AS nc
         |      FROM t),
         |x AS (SELECT doc_id,
         |        unnest(list_transform(range(0, nc),
         |          i -> struct_pack(ci := i, ch := list_slice(t, i*12+1, i*12+16)))) AS u
         |      FROM c)
         |SELECT doc_id, (u.ci)::INTEGER AS chunk_idx,
         |  array_to_string(u.ch, ' ') AS chunk_text,
         |  len(u.ch)::INTEGER AS n_chunk_tokens
         |FROM x ORDER BY doc_id, chunk_idx""".stripMargin,

    "q75_url_domains" -> {
      import graft.pipeline.TextOps
      val plant = Seq(
        "text", "' see https://site'", "(doc_id % 7)::VARCHAR",
        "'.example.org/p/'", "doc_id::VARCHAR",
        "' and http://cdn.example.net/x?y='", "(doc_id % 3)::VARCHAR"
      ).mkString(" || ")
      s"""WITH planted AS (SELECT doc_id, $plant AS text FROM documents),
         |u AS (SELECT doc_id, unnest(regexp_extract_all(text, '${TextOps.UrlPattern}')) AS url
         |      FROM planted)
         |SELECT regexp_extract(url, '${TextOps.UrlDomainPattern}', 1) AS domain,
         |  count(*)::BIGINT AS n_urls,
         |  count(DISTINCT doc_id)::BIGINT AS n_docs
         |FROM u GROUP BY 1 ORDER BY domain""".stripMargin
    },

    "q76_hash_split" -> {
      // thresholds computed by the SAME Scala expression as
      // ScaleOps.hashSplit, so the float boundaries agree to the bit
      // (Double.toString round-trips in DuckDB)
      val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      val total = weights.map(_._2).sum
      val cum = weights.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
      val cases = weights.zip(cum).init
        .map { case ((n, _), c) => s"WHEN u < $c THEN '$n'" }
        .mkString(" ")
      s"""WITH s AS (SELECT doc_id,
         |  ${hash32("'s1' || doc_id::VARCHAR")} / 4294967296.0 AS u
         |  FROM documents),
         |lab AS (SELECT doc_id,
         |  CASE $cases ELSE '${weights.last._1}' END AS split FROM s)
         |SELECT split, count(*)::BIGINT AS n, sum(doc_id)::BIGINT AS sum_ids
         |FROM lab GROUP BY 1 ORDER BY split""".stripMargin
    },

    "q77_ccnet_buckets" ->
      s"""WITH toks AS (SELECT doc_id AS id, ${toks("text")} AS t FROM documents),
         |bg AS (SELECT id, unnest(${bigrams("t")}) AS bg FROM toks),
         |bgw AS (SELECT id, bg, string_split(bg, ' ')[1] AS w1 FROM bg),
         |bgc AS (SELECT bg, count(*) AS c_bg FROM bgw GROUP BY bg),
         |uni AS (SELECT unnest(t) AS w1 FROM toks),
         |unic AS (SELECT w1, count(*) AS c_w1 FROM uni GROUP BY w1),
         |v AS (SELECT count(*)::DOUBLE AS vocab FROM unic),
         |scores AS (SELECT id, avg(ln((c_bg + 1.0) / (c_w1 + vocab))) AS lm_score
         |  FROM bgw JOIN bgc USING (bg) JOIN unic USING (w1) CROSS JOIN v
         |  GROUP BY id),
         |b AS (SELECT id, lm_score,
         |  ntile(3) OVER (ORDER BY lm_score, id) AS bucket FROM scores)
         |SELECT bucket::INTEGER AS bucket, count(*)::BIGINT AS n,
         |  avg(lm_score) AS avg_score, max(lm_score) AS max_score
         |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,

    // SemDeDup: q56's deterministic k-means chain (same init, 2 Lloyd
    // iterations), then within-cell pairwise cosine pruning to the min-id
    // representative
    "q78_semdedup" -> {
      def assign(cf: String, out: String) =
        s"""p_$out AS (SELECT ef.id, c.cell, sum(ef.x * c.w) AS dot,
           |    sqrt(sum(c.w * c.w)) AS nc
           |  FROM ef JOIN $cf c USING (i) GROUP BY 1, 2),
           |s_$out AS (SELECT p.id, p.cell, p.dot / (en.nv * p.nc) AS cos
           |  FROM p_$out p JOIN en ON p.id = en.id),
           |$out AS (SELECT id, cell FROM (SELECT *, row_number() OVER
           |    (PARTITION BY id ORDER BY cos DESC, cell ASC) AS rn FROM s_$out)
           |  WHERE rn = 1)""".stripMargin
      def update(a: String, prev: String, out: String) =
        s"""${out}_raw AS (SELECT a.cell, ef.i, avg(ef.x) AS w
           |  FROM $a a JOIN ef ON a.id = ef.id GROUP BY 1, 2),
           |$out AS (SELECT p.cell, p.i, coalesce(r.w, p.w) AS w
           |  FROM $prev p LEFT JOIN ${out}_raw r
           |    ON p.cell = r.cell AND p.i = r.i)""".stripMargin
      s"""WITH e AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         |dims AS (SELECT unnest(range(1, 65)) AS i),
         |c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cell, vec
         |  FROM (SELECT id, vec FROM e ORDER BY id LIMIT 8) t),
         |c0f AS (SELECT cell, i, vec[i]::DOUBLE AS w FROM c0, dims),
         |ef AS (SELECT id, i, vec[i]::DOUBLE AS x FROM e, dims),
         |en AS (SELECT id, sqrt(sum(x*x)) AS nv FROM ef GROUP BY id),
         |${assign("c0f", "a1")},
         |${update("a1", "c0f", "c1f")},
         |${assign("c1f", "a2")},
         |${update("a2", "c1f", "c2f")},
         |${assign("c2f", "a3")},
         |dup AS (SELECT DISTINCT x.id
         |  FROM a3 x JOIN a3 y ON x.cell = y.cell AND y.id < x.id
         |  JOIN e ex ON ex.id = x.id JOIN e ey ON ey.id = y.id
         |  WHERE ${cosSql("ex.vec", "ey.vec")} >= 0.45)
         |SELECT a.id, a.cell::BIGINT AS cell,
         |  (CASE WHEN d.id IS NULL THEN 1 ELSE 0 END)::INTEGER AS keep
         |FROM a3 a LEFT JOIN dup d ON a.id = d.id ORDER BY a.id""".stripMargin
    },

    // frozen-state SemDeDup ingest: q78's deterministic k-means chain on
    // the CORPUS only, fresh vectors assigned to the final centroids,
    // best within-cell corpus match at cosine >= 0.45 (ties lowest id)
    "q253_semdedup_incremental" -> {
      def assign(cf: String, out: String) =
        s"""p_$out AS (SELECT ef.id, c.cell, sum(ef.x * c.w) AS dot,
           |    sqrt(sum(c.w * c.w)) AS nc
           |  FROM ef JOIN $cf c USING (i) GROUP BY 1, 2),
           |s_$out AS (SELECT p.id, p.cell, p.dot / (en.nv * p.nc) AS cos
           |  FROM p_$out p JOIN en ON p.id = en.id),
           |$out AS (SELECT id, cell FROM (SELECT *, row_number() OVER
           |    (PARTITION BY id ORDER BY cos DESC, cell ASC) AS rn FROM s_$out)
           |  WHERE rn = 1)""".stripMargin
      def update(a: String, prev: String, out: String) =
        s"""${out}_raw AS (SELECT a.cell, ef.i, avg(ef.x) AS w
           |  FROM $a a JOIN ef ON a.id = ef.id GROUP BY 1, 2),
           |$out AS (SELECT p.cell, p.i, coalesce(r.w, p.w) AS w
           |  FROM $prev p LEFT JOIN ${out}_raw r
           |    ON p.cell = r.cell AND p.i = r.i)""".stripMargin
      s"""WITH e AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
         |  WHERE vec_id % 10 <> 0),
         |fresh AS (SELECT vec_id + 1000000 AS id, embedding AS vec
         |  FROM embeddings WHERE vec_id % 10 = 0),
         |dims AS (SELECT unnest(range(1, 65)) AS i),
         |c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cell, vec
         |  FROM (SELECT id, vec FROM e ORDER BY id LIMIT 8) t),
         |c0f AS (SELECT cell, i, vec[i]::DOUBLE AS w FROM c0, dims),
         |ef AS (SELECT id, i, vec[i]::DOUBLE AS x FROM e, dims),
         |en AS (SELECT id, sqrt(sum(x*x)) AS nv FROM ef GROUP BY id),
         |${assign("c0f", "a1")},
         |${update("a1", "c0f", "c1f")},
         |${assign("c1f", "a2")},
         |${update("a2", "c1f", "c2f")},
         |${assign("c2f", "a3")},
         |eff AS (SELECT id, i, vec[i]::DOUBLE AS x FROM fresh, dims),
         |enf AS (SELECT id, sqrt(sum(x*x)) AS nv FROM eff GROUP BY id),
         |pf AS (SELECT eff.id, c.cell, sum(eff.x * c.w) AS dot,
         |    sqrt(sum(c.w * c.w)) AS nc
         |  FROM eff JOIN c2f c USING (i) GROUP BY 1, 2),
         |sfr AS (SELECT p.id, p.cell, p.dot / (enf.nv * p.nc) AS cos
         |  FROM pf p JOIN enf ON p.id = enf.id),
         |af AS (SELECT id, cell FROM (SELECT *, row_number() OVER
         |    (PARTITION BY id ORDER BY cos DESC, cell ASC) AS rn FROM sfr)
         |  WHERE rn = 1),
         |cand AS (SELECT af.id, a3.id AS cid,
         |    ${cosSql("fx.vec", "cx.vec")} AS cos
         |  FROM af JOIN a3 ON af.cell = a3.cell
         |    JOIN fresh fx ON fx.id = af.id
         |    JOIN e cx ON cx.id = a3.id
         |  WHERE ${cosSql("fx.vec", "cx.vec")} >= 0.45),
         |best AS (SELECT id, cid AS dup_of, cos, row_number() OVER
         |    (PARTITION BY id ORDER BY cos DESC, cid ASC) AS r FROM cand)
         |SELECT f.id, b.dup_of, b.cos
         |FROM fresh f LEFT JOIN (SELECT * FROM best WHERE r = 1) b
         |  ON f.id = b.id
         |ORDER BY f.id""".stripMargin
    },

    // frozen-codebook SemDeDup APPEND: the q253 k-means chain on the
    // FIRST corpus slice only (the codebook never retrains), the second
    // slice assigned under that final codebook and unioned into the
    // member set, then the q253 apply algebra against the grown members
    "q259_semdedup_append" -> {
      def assign(cf: String, out: String) =
        s"""p_$out AS (SELECT ef.id, c.cell, sum(ef.x * c.w) AS dot,
           |    sqrt(sum(c.w * c.w)) AS nc
           |  FROM ef JOIN $cf c USING (i) GROUP BY 1, 2),
           |s_$out AS (SELECT p.id, p.cell, p.dot / (en.nv * p.nc) AS cos
           |  FROM p_$out p JOIN en ON p.id = en.id),
           |$out AS (SELECT id, cell FROM (SELECT *, row_number() OVER
           |    (PARTITION BY id ORDER BY cos DESC, cell ASC) AS rn FROM s_$out)
           |  WHERE rn = 1)""".stripMargin
      def update(a: String, prev: String, out: String) =
        s"""${out}_raw AS (SELECT a.cell, ef.i, avg(ef.x) AS w
           |  FROM $a a JOIN ef ON a.id = ef.id GROUP BY 1, 2),
           |$out AS (SELECT p.cell, p.i, coalesce(r.w, p.w) AS w
           |  FROM $prev p LEFT JOIN ${out}_raw r
           |    ON p.cell = r.cell AND p.i = r.i)""".stripMargin
      s"""WITH e AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
         |  WHERE vec_id % 10 <> 0 AND vec_id % 10 <> 5),
         |appb AS (SELECT vec_id + 2000000 AS id, embedding AS vec
         |  FROM embeddings WHERE vec_id % 10 = 5),
         |fresh AS (SELECT vec_id + 1000000 AS id, embedding AS vec
         |  FROM embeddings WHERE vec_id % 10 = 0),
         |dims AS (SELECT unnest(range(1, 65)) AS i),
         |c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cell, vec
         |  FROM (SELECT id, vec FROM e ORDER BY id LIMIT 8) t),
         |c0f AS (SELECT cell, i, vec[i]::DOUBLE AS w FROM c0, dims),
         |ef AS (SELECT id, i, vec[i]::DOUBLE AS x FROM e, dims),
         |en AS (SELECT id, sqrt(sum(x*x)) AS nv FROM ef GROUP BY id),
         |${assign("c0f", "a1")},
         |${update("a1", "c0f", "c1f")},
         |${assign("c1f", "a2")},
         |${update("a2", "c1f", "c2f")},
         |${assign("c2f", "a3")},
         |ebf AS (SELECT id, i, vec[i]::DOUBLE AS x FROM appb, dims),
         |enb AS (SELECT id, sqrt(sum(x*x)) AS nv FROM ebf GROUP BY id),
         |pb AS (SELECT ebf.id, c.cell, sum(ebf.x * c.w) AS dot,
         |    sqrt(sum(c.w * c.w)) AS nc
         |  FROM ebf JOIN c2f c USING (i) GROUP BY 1, 2),
         |sb AS (SELECT p.id, p.cell, p.dot / (enb.nv * p.nc) AS cos
         |  FROM pb p JOIN enb ON p.id = enb.id),
         |ab AS (SELECT id, cell FROM (SELECT *, row_number() OVER
         |    (PARTITION BY id ORDER BY cos DESC, cell ASC) AS rn FROM sb)
         |  WHERE rn = 1),
         |mem AS (SELECT id, cell FROM a3 UNION ALL SELECT id, cell FROM ab),
         |allvec AS (SELECT id, vec FROM e UNION ALL SELECT id, vec FROM appb),
         |eff AS (SELECT id, i, vec[i]::DOUBLE AS x FROM fresh, dims),
         |enf AS (SELECT id, sqrt(sum(x*x)) AS nv FROM eff GROUP BY id),
         |pf AS (SELECT eff.id, c.cell, sum(eff.x * c.w) AS dot,
         |    sqrt(sum(c.w * c.w)) AS nc
         |  FROM eff JOIN c2f c USING (i) GROUP BY 1, 2),
         |sfr AS (SELECT p.id, p.cell, p.dot / (enf.nv * p.nc) AS cos
         |  FROM pf p JOIN enf ON p.id = enf.id),
         |af AS (SELECT id, cell FROM (SELECT *, row_number() OVER
         |    (PARTITION BY id ORDER BY cos DESC, cell ASC) AS rn FROM sfr)
         |  WHERE rn = 1),
         |cand AS (SELECT af.id, mem.id AS cid,
         |    ${cosSql("fx.vec", "cx.vec")} AS cos
         |  FROM af JOIN mem ON af.cell = mem.cell
         |    JOIN fresh fx ON fx.id = af.id
         |    JOIN allvec cx ON cx.id = mem.id
         |  WHERE ${cosSql("fx.vec", "cx.vec")} >= 0.45),
         |best AS (SELECT id, cid AS dup_of, cos, row_number() OVER
         |    (PARTITION BY id ORDER BY cos DESC, cid ASC) AS r FROM cand)
         |SELECT f.id, b.dup_of, b.cos
         |FROM fresh f LEFT JOIN (SELECT * FROM best WHERE r = 1) b
         |  ON f.id = b.id
         |ORDER BY f.id""".stripMargin
    },

    // duplicated 5-token spans: window text occurring more than once
    // corpus-wide (multiplicity preserved — within-doc repeats count)
    "q79_dup_spans" ->
      s"""WITH t AS (SELECT doc_id AS id, ${toks("text")} AS toks FROM documents),
         |w0 AS (SELECT id, unnest(list_transform(range(1, len(toks) - 3),
         |    i -> array_to_string(toks[i:i+4], ' '))) AS win FROM t),
         |w AS (SELECT id, md5(win) AS k FROM w0),
         |c AS (SELECT k, count(*) AS c FROM w GROUP BY k),
         |d AS (SELECT w.id, count(*) AS n_windows,
         |    sum(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS n_dup
         |  FROM w JOIN c USING (k) GROUP BY w.id)
         |SELECT t.id, coalesce(d.n_windows, 0)::BIGINT AS n_windows,
         |  coalesce(d.n_dup, 0)::BIGINT AS n_dup,
         |  CASE WHEN coalesce(d.n_windows, 0) > 0
         |    THEN d.n_dup::DOUBLE / d.n_windows::DOUBLE ELSE 0.0 END AS dup_frac
         |FROM t LEFT JOIN d USING (id) ORDER BY t.id""".stripMargin,

    // edit-distance pairs: q31's shingle-Jaccard chain at the candidate
    // threshold, then exact Levenshtein verify
    "q87_edit_distance_pairs" ->
      s"""WITH $ShingleSets,
         |sizes AS (SELECT id, count(*) sz FROM sh GROUP BY id),
         |common AS (SELECT a.id id1, b.id id2, count(*) AS common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
         |  GROUP BY 1, 2),
         |p AS (SELECT id1, id2 FROM common
         |  JOIN sizes s1 ON common.id1 = s1.id
         |  JOIN sizes s2 ON common.id2 = s2.id
         |  WHERE common::DOUBLE / (s1.sz + s2.sz - common) >= 0.3)
         |SELECT p.id1, p.id2, levenshtein(a.text, b.text)::INTEGER AS edit_dist
         |FROM p JOIN documents a ON p.id1 = a.doc_id
         |  JOIN documents b ON p.id2 = b.doc_id
         |WHERE levenshtein(a.text, b.text) <= 6
         |ORDER BY p.id1, p.id2""".stripMargin,

    // containment pairs: q52's winnow chain, exploded to (id, fp) sets,
    // fp-keyed self-join with the 1000-doc-freq valve, true pre-valve sizes
    "q83_containment_pairs" ->
      s"""WITH g AS (SELECT doc_id AS id,
         |    CASE WHEN len(text) < 16 THEN CAST([] AS BIGINT[])
         |         ELSE list_transform(range(1, len(text)-14),
         |                i -> ${hash32("substr(text, i::INT, 16)")}) END AS kg
         |  FROM documents),
         |f AS (SELECT id,
         |    CASE WHEN len(kg) = 0 THEN CAST([] AS BIGINT[])
         |         ELSE list_distinct(list_transform(
         |                range(1, greatest(len(kg)-7, 1)+1),
         |                i -> list_min(kg[i:i+7]))) END AS fps
         |  FROM g),
         |e AS (SELECT id, unnest(fps) AS fp FROM f),
         |sizes AS (SELECT id, count(*) AS nfp FROM e GROUP BY id),
         |ok AS (SELECT fp FROM e GROUP BY fp HAVING count(*) <= 50),
         |ek AS (SELECT e.id, e.fp FROM e JOIN ok USING (fp)),
         |p AS (SELECT a.id AS id1, b.id AS id2, count(*) AS common
         |  FROM ek a JOIN ek b ON a.fp = b.fp AND a.id < b.id GROUP BY 1, 2)
         |SELECT p.id1, p.id2, p.common,
         |  p.common::DOUBLE / least(s1.nfp, s2.nfp)::DOUBLE AS containment
         |FROM p JOIN sizes s1 ON p.id1 = s1.id JOIN sizes s2 ON p.id2 = s2.id
         |WHERE p.common::DOUBLE / least(s1.nfp, s2.nfp)::DOUBLE >= 0.5
         |ORDER BY p.id1, p.id2""".stripMargin,

    // token entropy: H = ln n - (sum c*ln c)/n over the token multiset
    "q86_token_entropy" ->
      s"""WITH t AS (SELECT doc_id AS id, ${toks("text")} AS toks FROM documents),
         |e AS (SELECT id, unnest(toks) AS tok FROM t),
         |c AS (SELECT id, tok, count(*) AS c FROM e GROUP BY 1, 2),
         |s AS (SELECT id, sum(c) AS n, sum(c * ln(c)) AS s FROM c GROUP BY id)
         |SELECT t.id, coalesce(s.n, 0)::BIGINT AS n_tokens,
         |  coalesce(ln(s.n) - s.s / s.n, 0.0) AS token_entropy
         |FROM t LEFT JOIN s USING (id) ORDER BY t.id""".stripMargin,

    // sequence packing: running token sum in md5-hash order, pack = the
    // window holding the doc's first token. `//` (floor division) — a
    // `(x / 512)::BIGINT` spelling would ROUND (DuckDB double→int casts
    // round; Spark's truncate), shifting docs near pack boundaries
    "q84_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id AS id, len(${toks("text")}) AS n_tokens,
         |    ${hash32("'q84' || doc_id::VARCHAR")} AS u
         |  FROM documents),
         |c AS (SELECT *, sum(n_tokens) OVER
         |    (ORDER BY u, id ROWS UNBOUNDED PRECEDING) AS cum FROM t)
         |SELECT id, n_tokens::BIGINT AS n_tokens,
         |  ((cum - n_tokens) // 512)::BIGINT AS pack_id,
         |  ((cum - n_tokens) % 512)::BIGINT AS offset
         |FROM c ORDER BY id""".stripMargin,

    // sharded packing: q84's cumsum algebra PARTITIONed BY the shard —
    // pack ids count from 0 within each lang
    "q232_pack_sharded" ->
      s"""WITH t AS (SELECT doc_id AS id, lang,
         |    len(${toks("text")}) AS n_tokens,
         |    ${hash32("'q232' || doc_id::VARCHAR")} AS u
         |  FROM documents),
         |c AS (SELECT *, sum(n_tokens) OVER
         |    (PARTITION BY lang ORDER BY u, id ROWS UNBOUNDED PRECEDING)
         |    AS cum FROM t)
         |SELECT id, n_tokens::BIGINT AS n_tokens,
         |  ((cum - n_tokens) // 512)::BIGINT AS pack_id,
         |  ((cum - n_tokens) % 512)::BIGINT AS offset, lang
         |FROM c ORDER BY id""".stripMargin,

    // approximate mixture: same count/target math as q81, then a pure
    // Bernoulli filter at rate take/n per domain (no rank window)
    "q85_sample_mix_approx" ->
      s"""WITH u AS (SELECT doc_id, lang,
         |    ${hash32("'q85' || doc_id::VARCHAR")} / 4294967296.0 AS u
         |  FROM documents WHERE lang IN ('en', 'zh', 'de')),
         |c AS (SELECT lang, count(*) AS n FROM u GROUP BY lang),
         |sh(lang, share) AS (VALUES ('en', 0.5), ('zh', 0.25), ('de', 0.25)),
         |no AS (SELECT floor(min(n::DOUBLE / share::DOUBLE)) AS n_out
         |  FROM c JOIN sh USING (lang)),
         |tk AS (SELECT lang, n, floor(share::DOUBLE * n_out) AS take
         |  FROM sh JOIN c USING (lang) CROSS JOIN no)
         |SELECT u.doc_id AS id, u.lang FROM u JOIN tk USING (lang)
         |WHERE u.u < tk.take / tk.n ORDER BY id""".stripMargin,

    // containment dedup action: q83's pair chain → recursive-CTE connected
    // components → drop non-representative members (q57 pattern)
    "q88_containment_dedup" ->
      s"""WITH g AS (SELECT doc_id AS id,
         |    CASE WHEN len(text) < 16 THEN CAST([] AS BIGINT[])
         |         ELSE list_transform(range(1, len(text)-14),
         |                i -> ${hash32("substr(text, i::INT, 16)")}) END AS kg
         |  FROM documents),
         |f AS (SELECT id,
         |    CASE WHEN len(kg) = 0 THEN CAST([] AS BIGINT[])
         |         ELSE list_distinct(list_transform(
         |                range(1, greatest(len(kg)-7, 1)+1),
         |                i -> list_min(kg[i:i+7]))) END AS fps
         |  FROM g),
         |e AS (SELECT id, unnest(fps) AS fp FROM f),
         |sizes AS (SELECT id, count(*) AS nfp FROM e GROUP BY id),
         |ok AS (SELECT fp FROM e GROUP BY fp HAVING count(*) <= 50),
         |ek AS (SELECT e.id, e.fp FROM e JOIN ok USING (fp)),
         |p AS (SELECT a.id AS id1, b.id AS id2, count(*) AS common
         |  FROM ek a JOIN ek b ON a.fp = b.fp AND a.id < b.id GROUP BY 1, 2),
         |pairs AS (SELECT p.id1, p.id2 FROM p
         |  JOIN sizes s1 ON p.id1 = s1.id JOIN sizes s2 ON p.id2 = s2.id
         |  WHERE p.common::DOUBLE / least(s1.nfp, s2.nfp)::DOUBLE >= 0.5),
         |edges AS (SELECT id1 a, id2 b FROM pairs
         |  UNION ALL SELECT id2, id1 FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |comp AS (
         |  WITH RECURSIVE reach(id, label) AS (
         |    SELECT id, id FROM nodes
         |    UNION
         |    SELECT e2.a, r.label FROM edges e2 JOIN reach r ON e2.b = r.id
         |  )
         |  SELECT id, min(label) AS cluster FROM reach GROUP BY id),
         |drp AS (SELECT id FROM comp WHERE id <> cluster)
         |SELECT count(*)::BIGINT AS n_docs, sum(doc_id)::BIGINT AS sum_ids
         |FROM documents WHERE doc_id NOT IN (SELECT id FROM drp)""".stripMargin,

    // deterministic quality-weighted Bernoulli sample: keep iff
    // u(salt, id) < quality(text); same term order as qualityScoreT
    "q80_weighted_sample" ->
      s"""WITH tk AS (SELECT doc_id AS id, text, ${toks("text")} AS t FROM documents),
         |q AS (SELECT id,
         |   least(len(text)::DOUBLE / 500.0, 1.0) * 0.5
         | + least((CASE WHEN len(t) = 0 THEN 0.0 ELSE
         |     len(list_filter(t, x -> list_contains(
         |       ['the','a','an','and','of','to','in','is','was','for','on',
         |        'with','that','it'], x)))::DOUBLE / len(t) END) * 5.0, 1.0) * 0.3
         | + (1.0 - least((len(regexp_replace(text,
         |     '[^.,;:!?''"()\\[\\]-]', '', 'g'))::DOUBLE
         |     / greatest(len(text), 1)) * 4.0, 1.0)) * 0.2 AS w
         |  FROM tk)
         |SELECT id, w FROM q
         |WHERE ${hash32("'q80' || id::VARCHAR")} / 4294967296.0 < w
         |ORDER BY id""".stripMargin,

    // exact-substring removal (Lee et al. 2022): every duplicated 5-token
    // window keeps its first (id, pos) occurrence; the rest mask their
    // positions; docs reconstruct from unmasked tokens
    "q233_dedup_span_removal" ->
      s"""WITH t AS (SELECT doc_id AS id, ${toks("text")} AS toks FROM documents),
         |w0 AS (SELECT id, unnest(range(1, len(toks) - 3)) AS i FROM t),
         |w AS (SELECT w0.id, (i - 1)::BIGINT AS pos,
         |    md5(array_to_string(t.toks[i:i+4], ' ')) AS k
         |  FROM w0 JOIN t USING (id)),
         |o AS (SELECT w.*, count(*) OVER (PARTITION BY k) AS c,
         |    row_number() OVER (PARTITION BY k ORDER BY id, pos) AS rn
         |  FROM w),
         |m AS (SELECT id, pos FROM o WHERE c > 1 AND rn > 1),
         |mp AS (SELECT id, unnest(range(pos, pos + 5)) AS p FROM m),
         |mk AS (SELECT id, list(DISTINCT p) AS mask FROM mp GROUP BY id),
         |f AS (SELECT t.id, t.toks,
         |    list_filter(range(1, len(t.toks) + 1),
         |      i -> mk.mask IS NULL OR NOT list_contains(mk.mask, i - 1)) AS kept
         |  FROM t LEFT JOIN mk ON t.id = mk.id)
         |SELECT id, len(toks)::BIGINT AS n_tokens,
         |  (len(toks) - len(kept))::BIGINT AS n_removed,
         |  coalesce(array_to_string(list_transform(kept, i -> toks[i]), ' '),
         |    '') AS text_clean
         |FROM f ORDER BY id""".stripMargin,

    // token-budget mixture: keep docs in (hash, id) order within the
    // domain while the EXCLUSIVE running token sum is under the budget
    "q234_token_budget_mix" ->
      s"""WITH b(lang, budget) AS (VALUES ('en', 4000), ('de', 1500), ('zh', 900)),
         |t AS (SELECT doc_id, lang, len(${toks("text")})::BIGINT AS nt,
         |    ${hash32("'q234' || doc_id::VARCHAR")} / 4294967296.0 AS u
         |  FROM documents),
         |r AS (SELECT doc_id, lang, nt,
         |    coalesce(sum(nt) OVER (PARTITION BY lang ORDER BY u, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM t)
         |SELECT r.doc_id AS id, r.lang, r.nt AS n_tokens
         |FROM r JOIN b USING (lang) WHERE cum < budget ORDER BY id""".stripMargin,

    // approx token budget: Bernoulli keep at rate min(1, budget/total_d)
    "q235_token_budget_approx" ->
      s"""WITH b(lang, budget) AS (VALUES ('en', 4000), ('de', 1500), ('zh', 900)),
         |t AS (SELECT doc_id, lang, len(${toks("text")})::BIGINT AS nt
         |  FROM documents),
         |tot AS (SELECT lang, sum(nt) AS tt FROM t GROUP BY lang),
         |r AS (SELECT t.doc_id, t.lang, t.nt,
         |    least(1.0, budget::DOUBLE / tt::DOUBLE) AS rate
         |  FROM t JOIN tot USING (lang) JOIN b USING (lang))
         |SELECT doc_id AS id, lang, nt AS n_tokens FROM r
         |WHERE ${hash32("'q235' || doc_id::VARCHAR")} / 4294967296.0 < rate
         |ORDER BY id""".stripMargin,

    // priority token budget: keep docs in (quality DESC, id) order within
    // the domain while the EXCLUSIVE running token sum is under budget
    // (same quality term order as q80)
    "q237_top_token_budget" ->
      s"""WITH b(lang, budget) AS (VALUES ('en', 4000), ('de', 1500), ('zh', 900)),
         |tk AS (SELECT doc_id AS id, lang, text, ${toks("text")} AS t
         |  FROM documents),
         |q AS (SELECT id, lang, len(t)::BIGINT AS nt,
         |   least(len(text)::DOUBLE / 500.0, 1.0) * 0.5
         | + least((CASE WHEN len(t) = 0 THEN 0.0 ELSE
         |     len(list_filter(t, x -> list_contains(
         |       ['the','a','an','and','of','to','in','is','was','for','on',
         |        'with','that','it'], x)))::DOUBLE / len(t) END) * 5.0, 1.0) * 0.3
         | + (1.0 - least((len(regexp_replace(text,
         |     '[^.,;:!?''"()\\[\\]-]', '', 'g'))::DOUBLE
         |     / greatest(len(text), 1)) * 4.0, 1.0)) * 0.2 AS w
         |  FROM tk),
         |r AS (SELECT id, lang, nt,
         |    coalesce(sum(nt) OVER (PARTITION BY lang ORDER BY w DESC, id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM q)
         |SELECT r.id, r.lang, r.nt AS n_tokens
         |FROM r JOIN b USING (lang) WHERE cum < budget ORDER BY id""".stripMargin,

    // incremental span removal: corpus fingerprints mask EVERY shard
    // occurrence; within-shard repeats keep the shard's first (id, pos)
    "q240_span_removal_incremental" ->
      s"""WITH fresh AS (SELECT doc_id AS id, ${toks("text")} AS toks
         |  FROM documents WHERE doc_id % 10 = 0),
         |ct AS (SELECT ${toks("text")} AS toks FROM documents
         |  WHERE doc_id % 10 <> 0),
         |cw0 AS (SELECT unnest(range(1, len(toks) - 3)) AS i, toks FROM ct),
         |cw AS (SELECT DISTINCT md5(array_to_string(toks[i:i+4], ' ')) AS k
         |  FROM cw0),
         |w0 AS (SELECT id, unnest(range(1, len(toks) - 3)) AS i FROM fresh),
         |w AS (SELECT w0.id, (i - 1)::BIGINT AS pos,
         |    md5(array_to_string(f.toks[i:i+4], ' ')) AS k
         |  FROM w0 JOIN fresh f USING (id)),
         |o AS (SELECT w.*, count(*) OVER (PARTITION BY k) AS c,
         |    row_number() OVER (PARTITION BY k ORDER BY id, pos) AS rn
         |  FROM w),
         |m AS (SELECT o.id, o.pos FROM o LEFT JOIN cw ON o.k = cw.k
         |  WHERE cw.k IS NOT NULL OR (o.c > 1 AND o.rn > 1)),
         |mp AS (SELECT id, unnest(range(pos, pos + 5)) AS p FROM m),
         |mk AS (SELECT id, list(DISTINCT p) AS mask FROM mp GROUP BY id),
         |f AS (SELECT t.id, t.toks,
         |    list_filter(range(1, len(t.toks) + 1),
         |      i -> mk.mask IS NULL OR NOT list_contains(mk.mask, i - 1)) AS kept
         |  FROM fresh t LEFT JOIN mk ON t.id = mk.id)
         |SELECT id, len(toks)::BIGINT AS n_tokens,
         |  (len(toks) - len(kept))::BIGINT AS n_removed,
         |  coalesce(array_to_string(list_transform(kept, i -> toks[i]), ' '),
         |    '') AS text_clean
         |FROM f ORDER BY id""".stripMargin,

    // layout → consumer pipeline: pruned zorderScan feeding the exact
    // token-budget cut ≡ plain box filter + the naive per-domain window
    "q241_zorder_budget" ->
      s"""WITH b(lang, budget) AS (VALUES ('en', 1500), ('de', 700)),
         |t AS (SELECT doc_id, lang, n_chars,
         |    len(${toks("text")})::BIGINT AS nt,
         |    ${hash32("'q241' || doc_id::VARCHAR")} / 4294967296.0 AS u
         |  FROM documents),
         |f AS (SELECT * FROM t
         |  WHERE n_chars BETWEEN 200 AND 600 AND nt BETWEEN 30 AND 90),
         |r AS (SELECT doc_id, lang, nt,
         |    coalesce(sum(nt) OVER (PARTITION BY lang ORDER BY u, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM f)
         |SELECT r.doc_id AS id, r.lang, r.nt AS n_tokens
         |FROM r JOIN b USING (lang) WHERE cum < budget ORDER BY id""".stripMargin,

    // frozen-state incremental budget: shard rows judged against the FULL
    // corpus inventory ≡ full-corpus naive window cut restricted to shard
    "q242_token_budget_incremental" ->
      s"""WITH b(lang, budget) AS (VALUES ('en', 4000), ('de', 1500), ('zh', 900)),
         |t AS (SELECT doc_id, lang, len(${toks("text")})::BIGINT AS nt,
         |    ${hash32("'q242' || doc_id::VARCHAR")} / 4294967296.0 AS u
         |  FROM documents),
         |r AS (SELECT doc_id, lang, nt,
         |    coalesce(sum(nt) OVER (PARTITION BY lang ORDER BY u, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM t)
         |SELECT r.doc_id AS id, r.lang, r.nt AS n_tokens
         |FROM r JOIN b USING (lang)
         |WHERE cum < budget AND doc_id % 10 = 0 ORDER BY id""".stripMargin,

    // frozen-state MinHash ingest dedup: q94's full-pairwise best-match
    // algebra at threshold 0.5 (the state path must not change results)
    "q250_dedup_against_state" ->
      s"""WITH corpus AS (SELECT doc_id AS id, text FROM documents
         |  WHERE doc_id % 10 <> 0),
         |fresh AS (SELECT doc_id + 1000000 AS id, text FROM documents
         |  WHERE doc_id % 10 = 0),
         |shc AS (SELECT DISTINCT id, unnest(${bigrams(toks("text"))}) AS shingle
         |  FROM corpus),
         |shn AS (SELECT DISTINCT id, unnest(${bigrams(toks("text"))}) AS shingle
         |  FROM fresh),
         |szc AS (SELECT id, count(*) sz FROM shc GROUP BY id),
         |szn AS (SELECT id, count(*) sz FROM shn GROUP BY id),
         |common AS (SELECT n.id, c.id AS cid, count(*) AS c
         |  FROM shn n JOIN shc c ON n.shingle = c.shingle GROUP BY 1, 2),
         |j AS (SELECT common.id, cid,
         |    c::DOUBLE / (szn.sz + szc.sz - c) AS jaccard
         |  FROM common JOIN szn ON common.id = szn.id
         |    JOIN szc ON common.cid = szc.id
         |  WHERE c::DOUBLE / (szn.sz + szc.sz - c) >= 0.5),
         |best AS (SELECT id, cid AS dup_of, jaccard, row_number() OVER
         |    (PARTITION BY id ORDER BY jaccard DESC, cid ASC) AS r FROM j)
         |SELECT f.id, b.dup_of, b.jaccard
         |FROM fresh f LEFT JOIN (SELECT * FROM best WHERE r = 1) b
         |  ON f.id = b.id
         |ORDER BY f.id""".stripMargin,

    // refreshed-state MinHash ingest: the state path (build on the base,
    // first-writer-wins refresh with the growth shard) must reproduce the
    // full pairwise best-match algebra over the GROWN corpus at 0.5
    "q251_dedup_refreshed_state" ->
      s"""WITH corpus AS (
         |  SELECT doc_id AS id, text FROM documents
         |    WHERE doc_id % 10 NOT IN (0, 9)
         |  UNION ALL
         |  SELECT doc_id + 10000000 AS id, text FROM documents
         |    WHERE doc_id % 10 = 9),
         |fresh AS (SELECT doc_id + 20000000 AS id, text FROM documents
         |  WHERE doc_id % 10 = 0),
         |shc AS (SELECT DISTINCT id, unnest(${bigrams(toks("text"))}) AS shingle
         |  FROM corpus),
         |shn AS (SELECT DISTINCT id, unnest(${bigrams(toks("text"))}) AS shingle
         |  FROM fresh),
         |szc AS (SELECT id, count(*) sz FROM shc GROUP BY id),
         |szn AS (SELECT id, count(*) sz FROM shn GROUP BY id),
         |common AS (SELECT n.id, c.id AS cid, count(*) AS c
         |  FROM shn n JOIN shc c ON n.shingle = c.shingle GROUP BY 1, 2),
         |j AS (SELECT common.id, cid,
         |    c::DOUBLE / (szn.sz + szc.sz - c) AS jaccard
         |  FROM common JOIN szn ON common.id = szn.id
         |    JOIN szc ON common.cid = szc.id
         |  WHERE c::DOUBLE / (szn.sz + szc.sz - c) >= 0.5),
         |best AS (SELECT id, cid AS dup_of, jaccard, row_number() OVER
         |    (PARTITION BY id ORDER BY jaccard DESC, cid ASC) AS r FROM j)
         |SELECT f.id, b.dup_of, b.jaccard
         |FROM fresh f LEFT JOIN (SELECT * FROM best WHERE r = 1) b
         |  ON f.id = b.id
         |ORDER BY f.id""".stripMargin,

    // boilerplate-mode incremental line dedup: corpus fingerprints mask
    // every shard occurrence; within-shard repeats are scrubbed ENTIRELY
    // (q248 without the keep-first rn > 1 survivor)
    "q252_line_scrub_incremental" ->
      s"""WITH $LineChunks,
         |fresh AS (SELECT * FROM t1 WHERE id % 10 = 0),
         |cl AS (SELECT unnest(lines) AS line FROM t1 WHERE id % 10 <> 0),
         |cfp AS (SELECT DISTINCT md5(line) AS k FROM cl
         |  WHERE trim(line) <> ''),
         |lx AS (SELECT id, unnest(range(1, len(lines) + 1)) AS i FROM fresh),
         |l AS (SELECT lx.id, (i - 1)::BIGINT AS pos, f.lines[i] AS line
         |  FROM lx JOIN fresh f USING (id)),
         |k AS (SELECT id, pos, md5(line) AS k FROM l WHERE trim(line) <> ''),
         |o AS (SELECT k.*, count(*) OVER (PARTITION BY k) AS c FROM k),
         |m AS (SELECT o.id, o.pos FROM o LEFT JOIN cfp ON o.k = cfp.k
         |  WHERE cfp.k IS NOT NULL OR c >= 2),
         |mk AS (SELECT id, list(DISTINCT pos) AS mask FROM m GROUP BY id),
         |f2 AS (SELECT t.id, t.lines,
         |    list_filter(range(1, len(t.lines) + 1),
         |      i -> mk.mask IS NULL OR NOT list_contains(mk.mask,
         |        (i - 1)::BIGINT)) AS kept
         |  FROM fresh t LEFT JOIN mk ON t.id = mk.id)
         |SELECT id, len(lines)::BIGINT AS n_lines,
         |  (len(lines) - len(kept))::BIGINT AS n_removed,
         |  coalesce(array_to_string(list_transform(kept, i -> lines[i]),
         |    chr(10)), '') AS text_clean
         |FROM f2 ORDER BY id""".stripMargin,

    // RefinedWeb-style line dedup with removal: the mlDocs 5-token chunk
    // synthesis replayed, then the naive-window keep-first formulation
    // (the engine uses a single counting hash agg instead)
    "q245_line_dedup_removal" ->
      s"""WITH $LineChunks,
         |lx AS (SELECT id, unnest(range(1, len(lines) + 1)) AS i FROM t1),
         |l AS (SELECT lx.id, (i - 1)::BIGINT AS pos, t1.lines[i] AS line
         |  FROM lx JOIN t1 USING (id)),
         |k AS (SELECT id, pos, md5(line) AS k FROM l WHERE trim(line) <> ''),
         |o AS (SELECT k.*, count(*) OVER (PARTITION BY k) AS c,
         |    row_number() OVER (PARTITION BY k ORDER BY id, pos) AS rn
         |  FROM k),
         |m AS (SELECT id, list(DISTINCT pos) AS mask FROM o
         |  WHERE c >= 2 AND rn > 1 GROUP BY id),
         |f AS (SELECT t1.id, t1.lines,
         |    list_filter(range(1, len(t1.lines) + 1),
         |      i -> m.mask IS NULL OR NOT list_contains(m.mask,
         |        (i - 1)::BIGINT)) AS kept
         |  FROM t1 LEFT JOIN m ON t1.id = m.id)
         |SELECT id, len(lines)::BIGINT AS n_lines,
         |  (len(lines) - len(kept))::BIGINT AS n_removed,
         |  coalesce(array_to_string(list_transform(kept, i -> lines[i]),
         |    chr(10)), '') AS text_clean
         |FROM f ORDER BY id""".stripMargin,

    // incremental line dedup: corpus fingerprints mask EVERY shard
    // occurrence; within-shard repeats keep the shard's first (id, pos)
    "q248_line_dedup_incremental" ->
      s"""WITH $LineChunks,
         |fresh AS (SELECT * FROM t1 WHERE id % 10 = 0),
         |cl AS (SELECT unnest(lines) AS line FROM t1 WHERE id % 10 <> 0),
         |cfp AS (SELECT DISTINCT md5(line) AS k FROM cl
         |  WHERE trim(line) <> ''),
         |lx AS (SELECT id, unnest(range(1, len(lines) + 1)) AS i FROM fresh),
         |l AS (SELECT lx.id, (i - 1)::BIGINT AS pos, f.lines[i] AS line
         |  FROM lx JOIN fresh f USING (id)),
         |k AS (SELECT id, pos, md5(line) AS k FROM l WHERE trim(line) <> ''),
         |o AS (SELECT k.*, count(*) OVER (PARTITION BY k) AS c,
         |    row_number() OVER (PARTITION BY k ORDER BY id, pos) AS rn
         |  FROM k),
         |m AS (SELECT o.id, o.pos FROM o LEFT JOIN cfp ON o.k = cfp.k
         |  WHERE cfp.k IS NOT NULL OR (o.c >= 2 AND o.rn > 1)),
         |mk AS (SELECT id, list(DISTINCT pos) AS mask FROM m GROUP BY id),
         |f2 AS (SELECT t.id, t.lines,
         |    list_filter(range(1, len(t.lines) + 1),
         |      i -> mk.mask IS NULL OR NOT list_contains(mk.mask,
         |        (i - 1)::BIGINT)) AS kept
         |  FROM fresh t LEFT JOIN mk ON t.id = mk.id)
         |SELECT id, len(lines)::BIGINT AS n_lines,
         |  (len(lines) - len(kept))::BIGINT AS n_removed,
         |  coalesce(array_to_string(list_transform(kept, i -> lines[i]),
         |    chr(10)), '') AS text_clean
         |FROM f2 ORDER BY id""".stripMargin,

    // epoch-repeat token budget: full epochs emit every row, the
    // remainder is the naive per-domain window at epoch = e
    "q246_repeat_token_budget" ->
      s"""WITH b(lang, budget) AS (VALUES ('en', 30000), ('de', 9000), ('zh', 2000)),
         |t AS (SELECT doc_id, lang, len(${toks("text")})::BIGINT AS nt,
         |    ${hash32("'q246' || doc_id::VARCHAR")} / 4294967296.0 AS u
         |  FROM documents),
         |tot AS (SELECT lang, sum(nt) AS tt FROM t GROUP BY lang),
         |p AS (SELECT b.lang, budget, tt, (budget // tt)::BIGINT AS e,
         |    (budget - (budget // tt) * tt)::BIGINT AS rem
         |  FROM b JOIN tot USING (lang)),
         |fp AS (SELECT t.doc_id, t.lang, t.nt, unnest(range(0, e)) AS epoch
         |  FROM t JOIN p USING (lang) WHERE e >= 1),
         |r AS (SELECT t.doc_id, t.lang, t.nt, p.e, p.rem,
         |    coalesce(sum(nt) OVER (PARTITION BY t.lang ORDER BY u, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM t JOIN p USING (lang)),
         |pp AS (SELECT doc_id, lang, nt, e AS epoch FROM r
         |  WHERE rem > 0 AND cum < rem)
         |SELECT doc_id AS id, lang, nt AS n_tokens, epoch::INT AS epoch
         |FROM (SELECT * FROM fp UNION ALL SELECT * FROM pp)
         |ORDER BY id, epoch""".stripMargin,

    // frozen-state incremental repeat budget: shard rows get every full
    // epoch of the FULL-corpus plan plus the full-corpus remainder window
    // restricted to the shard (the q242 pattern with epochs)
    "q249_repeat_budget_incremental" ->
      s"""WITH b(lang, budget) AS (VALUES ('en', 25000), ('de', 8000), ('zh', 1800)),
         |t AS (SELECT doc_id, lang, len(${toks("text")})::BIGINT AS nt,
         |    ${hash32("'q249' || doc_id::VARCHAR")} / 4294967296.0 AS u
         |  FROM documents),
         |tot AS (SELECT lang, sum(nt) AS tt FROM t GROUP BY lang),
         |p AS (SELECT b.lang, budget, tt, (budget // tt)::BIGINT AS e,
         |    (budget - (budget // tt) * tt)::BIGINT AS rem
         |  FROM b JOIN tot USING (lang)),
         |fp AS (SELECT t.doc_id, t.lang, t.nt, unnest(range(0, e)) AS epoch
         |  FROM t JOIN p USING (lang) WHERE e >= 1),
         |r AS (SELECT t.doc_id, t.lang, t.nt, p.e, p.rem,
         |    coalesce(sum(nt) OVER (PARTITION BY t.lang ORDER BY u, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM t JOIN p USING (lang)),
         |pp AS (SELECT doc_id, lang, nt, e AS epoch FROM r
         |  WHERE rem > 0 AND cum < rem)
         |SELECT doc_id AS id, lang, nt AS n_tokens, epoch::INT AS epoch
         |FROM (SELECT * FROM fp UNION ALL SELECT * FROM pp)
         |WHERE doc_id % 10 = 0
         |ORDER BY id, epoch""".stripMargin,

    // UniMax mixture: integer waterfilling over domains sorted by
    // inventory (asc, ties by name) — each takes min(3·T, rem // left) —
    // then the q246 epoch-repeat algebra under the allocation
    "q254_unimax_mixture" ->
      s"""WITH t AS (SELECT doc_id, lang, len(${toks("text")})::BIGINT AS nt,
         |    ${hash32("'q254' || doc_id::VARCHAR")} / 4294967296.0 AS u
         |  FROM documents),
         |tot AS (SELECT lang, sum(nt)::BIGINT AS tt FROM t GROUP BY lang),
         |ordd AS (SELECT lang, tt,
         |    row_number() OVER (ORDER BY tt, lang) AS i,
         |    (SELECT count(*) FROM tot WHERE tt > 0) AS n
         |  FROM tot WHERE tt > 0),
         |walk AS (
         |  WITH RECURSIVE w(i, rem, lang, a) AS (
         |    SELECT 0, 50000::BIGINT, NULL::VARCHAR, 0::BIGINT
         |    UNION ALL
         |    SELECT o.i,
         |      w.rem - least(3 * o.tt, w.rem // (o.n - w.i)),
         |      o.lang,
         |      least(3 * o.tt, w.rem // (o.n - w.i))
         |    FROM w JOIN ordd o ON o.i = w.i + 1)
         |  SELECT lang, a AS budget FROM w WHERE i >= 1 AND a > 0),
         |b AS (SELECT lang, budget FROM walk),
         |p AS (SELECT b.lang, budget, tt, (budget // tt)::BIGINT AS e,
         |    (budget - (budget // tt) * tt)::BIGINT AS rem
         |  FROM b JOIN tot USING (lang)),
         |fp AS (SELECT t.doc_id, t.lang, t.nt, unnest(range(0, e)) AS epoch
         |  FROM t JOIN p USING (lang) WHERE e >= 1),
         |r AS (SELECT t.doc_id, t.lang, t.nt, p.e, p.rem,
         |    coalesce(sum(nt) OVER (PARTITION BY t.lang ORDER BY u, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM t JOIN p USING (lang)),
         |pp AS (SELECT doc_id, lang, nt, e AS epoch FROM r
         |  WHERE rem > 0 AND cum < rem)
         |SELECT doc_id AS id, lang, nt AS n_tokens, epoch::INT AS epoch
         |FROM (SELECT * FROM fp UNION ALL SELECT * FROM pp)
         |ORDER BY id, epoch""".stripMargin,

    // UniMax allocation from the frozen inventory: the q254 waterfill
    // walk alone (budget 30000, epoch cap 2), with per-domain provenance
    "q258_unimax_allocation" ->
      s"""WITH t AS (SELECT doc_id, lang, len(${toks("text")})::BIGINT AS nt
         |  FROM documents),
         |tot AS (SELECT lang, sum(nt)::BIGINT AS tt FROM t GROUP BY lang),
         |ordd AS (SELECT lang, tt,
         |    row_number() OVER (ORDER BY tt, lang) AS i,
         |    (SELECT count(*) FROM tot WHERE tt > 0) AS n
         |  FROM tot WHERE tt > 0),
         |walk AS (
         |  WITH RECURSIVE w(i, rem, lang, a) AS (
         |    SELECT 0, 30000::BIGINT, NULL::VARCHAR, 0::BIGINT
         |    UNION ALL
         |    SELECT o.i,
         |      w.rem - least(2 * o.tt, w.rem // (o.n - w.i)),
         |      o.lang,
         |      least(2 * o.tt, w.rem // (o.n - w.i))
         |    FROM w JOIN ordd o ON o.i = w.i + 1)
         |  SELECT lang, a AS budget FROM w WHERE i >= 1 AND a > 0)
         |SELECT walk.lang AS domain, tot.tt AS tok, walk.budget,
         |  walk.budget::DOUBLE / tot.tt::DOUBLE AS epochs
         |FROM walk JOIN tot USING (lang)
         |ORDER BY domain""".stripMargin,

    // merged-inventory UniMax allocation: sums are additive, so the
    // merged-state walk IS the full-inventory walk (budget 45000, cap 3)
    "q262_unimax_merged_allocation" ->
      s"""WITH t AS (SELECT doc_id, lang, len(${toks("text")})::BIGINT AS nt
         |  FROM documents),
         |tot AS (SELECT lang, sum(nt)::BIGINT AS tt FROM t GROUP BY lang),
         |ordd AS (SELECT lang, tt,
         |    row_number() OVER (ORDER BY tt, lang) AS i,
         |    (SELECT count(*) FROM tot WHERE tt > 0) AS n
         |  FROM tot WHERE tt > 0),
         |walk AS (
         |  WITH RECURSIVE w(i, rem, lang, a) AS (
         |    SELECT 0, 45000::BIGINT, NULL::VARCHAR, 0::BIGINT
         |    UNION ALL
         |    SELECT o.i,
         |      w.rem - least(3 * o.tt, w.rem // (o.n - w.i)),
         |      o.lang,
         |      least(3 * o.tt, w.rem // (o.n - w.i))
         |    FROM w JOIN ordd o ON o.i = w.i + 1)
         |  SELECT lang, a AS budget FROM w WHERE i >= 1 AND a > 0)
         |SELECT walk.lang AS domain, tot.tt AS tok, walk.budget,
         |  walk.budget::DOUBLE / tot.tt::DOUBLE AS epochs
         |FROM walk JOIN tot USING (lang)
         |ORDER BY domain""".stripMargin,

    // keep-best dedup: q43's cluster algebra, representative = highest
    // token count (ties to lowest id), everything else dropped
    "q247_dedup_keep_best" ->
      s"""WITH $ShingleSets,
         |sizes AS (SELECT id, count(*) sz FROM sh GROUP BY id),
         |common AS (SELECT a.id id1, b.id id2, count(*) AS common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
         |  GROUP BY 1, 2),
         |pairs AS (SELECT id1, id2 FROM common
         |  JOIN sizes s1 ON common.id1 = s1.id
         |  JOIN sizes s2 ON common.id2 = s2.id
         |  WHERE common::DOUBLE / (s1.sz + s2.sz - common) >= 0.4),
         |edges AS (SELECT id1 a, id2 b FROM pairs
         |  UNION ALL SELECT id2, id1 FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |comp AS (
         |  WITH RECURSIVE reach(id, label) AS (
         |    SELECT id, id FROM nodes
         |    UNION
         |    SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.id
         |  )
         |  SELECT id, min(label) AS cluster FROM reach GROUP BY id),
         |ntab AS (SELECT doc_id AS id, lang,
         |    len(${toks("text")})::BIGINT AS nt FROM documents),
         |mem AS (SELECT comp.id, comp.cluster, ntab.nt
         |  FROM comp JOIN ntab USING (id)),
         |bp AS (SELECT cluster, max(nt) AS bp FROM mem GROUP BY cluster),
         |keep AS (SELECT cluster, min(id) AS keep_id
         |  FROM mem JOIN bp USING (cluster) WHERE nt = bp GROUP BY cluster),
         |dropx AS (SELECT mem.id FROM mem JOIN keep USING (cluster)
         |  WHERE mem.id <> keep_id)
         |SELECT n.id, n.lang, n.nt AS n_tokens FROM ntab n
         |WHERE n.id NOT IN (SELECT id FROM dropx) ORDER BY n.id""".stripMargin,

    // frozen-state incremental PRIORITY budget: shard rows judged against
    // the FULL corpus ranking ≡ full-corpus priority cut restricted to
    // the shard (same quality algebra as q237)
    "q244_top_budget_incremental" ->
      s"""WITH b(lang, budget) AS (VALUES ('en', 3500), ('de', 1100), ('zh', 800)),
         |tk AS (SELECT doc_id AS id, lang, text, ${toks("text")} AS t
         |  FROM documents),
         |q AS (SELECT id, lang, len(t)::BIGINT AS nt,
         |   least(len(text)::DOUBLE / 500.0, 1.0) * 0.5
         | + least((CASE WHEN len(t) = 0 THEN 0.0 ELSE
         |     len(list_filter(t, x -> list_contains(
         |       ['the','a','an','and','of','to','in','is','was','for','on',
         |        'with','that','it'], x)))::DOUBLE / len(t) END) * 5.0, 1.0) * 0.3
         | + (1.0 - least((len(regexp_replace(text,
         |     '[^.,;:!?''"()\\[\\]-]', '', 'g'))::DOUBLE
         |     / greatest(len(text), 1)) * 4.0, 1.0)) * 0.2 AS w
         |  FROM tk),
         |r AS (SELECT id, lang, nt,
         |    coalesce(sum(nt) OVER (PARTITION BY lang ORDER BY w DESC, id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM q)
         |SELECT r.id, r.lang, r.nt AS n_tokens
         |FROM r JOIN b USING (lang)
         |WHERE cum < budget AND id % 10 = 0 ORDER BY id""".stripMargin,

    // materialized-priority top budget: identical naive priority window as
    // q237 (the flag must not change the keep set), different budgets
    "q243_top_budget_materialized" ->
      s"""WITH b(lang, budget) AS (VALUES ('en', 3000), ('de', 1000), ('zh', 700)),
         |tk AS (SELECT doc_id AS id, lang, text, ${toks("text")} AS t
         |  FROM documents),
         |q AS (SELECT id, lang, len(t)::BIGINT AS nt,
         |   least(len(text)::DOUBLE / 500.0, 1.0) * 0.5
         | + least((CASE WHEN len(t) = 0 THEN 0.0 ELSE
         |     len(list_filter(t, x -> list_contains(
         |       ['the','a','an','and','of','to','in','is','was','for','on',
         |        'with','that','it'], x)))::DOUBLE / len(t) END) * 5.0, 1.0) * 0.3
         | + (1.0 - least((len(regexp_replace(text,
         |     '[^.,;:!?''"()\\[\\]-]', '', 'g'))::DOUBLE
         |     / greatest(len(text), 1)) * 4.0, 1.0)) * 0.2 AS w
         |  FROM tk),
         |r AS (SELECT id, lang, nt,
         |    coalesce(sum(nt) OVER (PARTITION BY lang ORDER BY w DESC, id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM q)
         |SELECT r.id, r.lang, r.nt AS n_tokens
         |FROM r JOIN b USING (lang) WHERE cum < budget ORDER BY id""".stripMargin,

    // z-order scan is semantically invisible: the pruned read equals the
    // plain box filter
    "q239_zorder_scan" ->
      s"""SELECT doc_id AS id, lang, n_chars,
         |  len(${toks("text")})::BIGINT AS n_tokens
         |FROM documents
         |WHERE n_chars BETWEEN 200 AND 600
         |  AND len(${toks("text")}) BETWEEN 30 AND 90
         |ORDER BY id""".stripMargin,

    // zorder append is semantically invisible: the grown layout's pruned
    // read equals the plain box filter over ALL documents
    "q255_zorder_append" ->
      s"""SELECT doc_id AS id, lang, n_chars,
         |  len(${toks("text")})::BIGINT AS n_tokens
         |FROM documents
         |WHERE n_chars BETWEEN 250 AND 550
         |  AND len(${toks("text")}) BETWEEN 40 AND 80
         |ORDER BY id""".stripMargin,

    // composed curation v2: q233's span-removal chain, then q237's
    // priority-window budget — quality and token counts on the CLEANED
    // text (whose tokens are exactly the kept token list)
    "q238_clean_then_budget" ->
      s"""WITH t AS (SELECT doc_id AS id, lang, ${toks("text")} AS toks
         |  FROM documents),
         |w0 AS (SELECT id, unnest(range(1, len(toks) - 3)) AS i FROM t),
         |w AS (SELECT w0.id, (i - 1)::BIGINT AS pos,
         |    md5(array_to_string(t.toks[i:i+4], ' ')) AS k
         |  FROM w0 JOIN t USING (id)),
         |o AS (SELECT w.*, count(*) OVER (PARTITION BY k) AS c,
         |    row_number() OVER (PARTITION BY k ORDER BY id, pos) AS rn
         |  FROM w),
         |m AS (SELECT id, pos FROM o WHERE c > 1 AND rn > 1),
         |mp AS (SELECT id, unnest(range(pos, pos + 5)) AS p FROM m),
         |mk AS (SELECT id, list(DISTINCT p) AS mask FROM mp GROUP BY id),
         |f AS (SELECT t.id, t.lang,
         |    list_transform(list_filter(range(1, len(t.toks) + 1),
         |      i -> mk.mask IS NULL OR NOT list_contains(mk.mask, i - 1)),
         |      i -> t.toks[i]) AS kt
         |  FROM t LEFT JOIN mk ON t.id = mk.id),
         |c AS (SELECT id, lang, array_to_string(kt, ' ') AS text, kt AS tt,
         |    len(kt)::BIGINT AS nt FROM f WHERE len(kt) > 0),
         |q AS (SELECT id, lang, nt,
         |   least(len(text)::DOUBLE / 500.0, 1.0) * 0.5
         | + least((CASE WHEN len(tt) = 0 THEN 0.0 ELSE
         |     len(list_filter(tt, x -> list_contains(
         |       ['the','a','an','and','of','to','in','is','was','for','on',
         |        'with','that','it'], x)))::DOUBLE / len(tt) END) * 5.0, 1.0) * 0.3
         | + (1.0 - least((len(regexp_replace(text,
         |     '[^.,;:!?''"()\\[\\]-]', '', 'g'))::DOUBLE
         |     / greatest(len(text), 1)) * 4.0, 1.0)) * 0.2 AS wq
         |  FROM c),
         |r AS (SELECT id, lang, nt,
         |    coalesce(sum(nt) OVER (PARTITION BY lang ORDER BY wq DESC, id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM q),
         |b(lang, budget) AS (VALUES ('en', 3000), ('de', 1200))
         |SELECT r.id, r.lang, r.nt AS n_tokens_clean
         |FROM r JOIN b USING (lang) WHERE cum < budget ORDER BY id""".stripMargin,

    // z-order key: equal-width 8-bit buckets from exact min/max, bit b of
    // bucket j interleaved to position b*2 + j (same IEEE float algebra
    // and integer bit ops as the engine)
    "q236_zorder_key" -> {
      val bitsExpr = (0 until 8).map(b =>
        s"(((bx >> $b) & 1) << ${2 * b}) | (((by >> $b) & 1) << ${2 * b + 1})")
        .mkString(" | ")
      s"""WITH t AS (SELECT doc_id AS id, n_chars::DOUBLE AS nc,
         |    len(${toks("text")})::DOUBLE AS nt FROM documents),
         |mm AS (SELECT min(nc) mnc, max(nc) mxc, min(nt) mnt, max(nt) mxt
         |  FROM t),
         |b AS (SELECT id,
         |    least(255, greatest(0,
         |      floor((nc - mnc) / (mxc - mnc) * 256.0)::BIGINT)) AS bx,
         |    least(255, greatest(0,
         |      floor((nt - mnt) / (mxt - mnt) * 256.0)::BIGINT)) AS by
         |  FROM t CROSS JOIN mm)
         |SELECT id, ($bitsExpr)::BIGINT AS zkey FROM b ORDER BY id""".stripMargin
    },

    // deterministic domain mixture: n_out = floor(min(n_d/share_d)), each
    // domain keeps its floor(share_d * n_out) lowest-hash rows
    "q81_sample_mix" ->
      s"""WITH u AS (SELECT doc_id, lang,
         |    ${hash32("'q81' || doc_id::VARCHAR")} / 4294967296.0 AS u
         |  FROM documents WHERE lang IN ('en', 'zh', 'de')),
         |c AS (SELECT lang, count(*) AS n FROM u GROUP BY lang),
         |sh(lang, share) AS (VALUES ('en', 0.5), ('zh', 0.25), ('de', 0.25)),
         |no AS (SELECT floor(min(n::DOUBLE / share::DOUBLE)) AS n_out
         |  FROM c JOIN sh USING (lang)),
         |tk AS (SELECT lang, floor(share::DOUBLE * n_out) AS take
         |  FROM sh CROSS JOIN no),
         |r AS (SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rn
         |  FROM u)
         |SELECT r.doc_id AS id, r.lang FROM r JOIN tk USING (lang)
         |WHERE rn <= take ORDER BY id""".stripMargin,

    // temperature mixture: share_d = n_d^0.5 / T (T summed in lang-sorted
    // order to mirror the engine's layout-invariant normalization), then
    // the q81 floor/row_number cut
    "q211_temperature_mix" ->
      s"""WITH u AS (SELECT doc_id, lang,
         |    ${hash32("'q211' || doc_id::VARCHAR")} / 4294967296.0 AS u
         |  FROM documents),
         |c AS (SELECT lang, count(*) AS n FROM u GROUP BY lang),
         |t AS (SELECT list_sum(list(sqrt(n::DOUBLE) ORDER BY lang))
         |    AS tot FROM c),
         |sh AS (SELECT lang, sqrt(n::DOUBLE) / tot AS share
         |  FROM c CROSS JOIN t),
         |no AS (SELECT floor(min(n::DOUBLE / share)) AS n_out
         |  FROM c JOIN sh USING (lang)),
         |tk AS (SELECT lang, floor(share * n_out) AS take
         |  FROM sh CROSS JOIN no),
         |r AS (SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rn
         |  FROM u)
         |SELECT r.doc_id AS id, r.lang FROM r JOIN tk USING (lang)
         |WHERE rn <= take ORDER BY id""".stripMargin,

    // approximate temperature mixture: q211's share/take math, then the
    // q85 Bernoulli filter at rate take/n (no rank window)
    "q213_temperature_mix_approx" ->
      s"""WITH u AS (SELECT doc_id, lang,
         |    ${hash32("'q213' || doc_id::VARCHAR")} / 4294967296.0 AS u
         |  FROM documents),
         |c AS (SELECT lang, count(*) AS n FROM u GROUP BY lang),
         |t AS (SELECT list_sum(list(sqrt(n::DOUBLE) ORDER BY lang))
         |    AS tot FROM c),
         |sh AS (SELECT lang, sqrt(n::DOUBLE) / tot AS share
         |  FROM c CROSS JOIN t),
         |no AS (SELECT floor(min(n::DOUBLE / share)) AS n_out
         |  FROM c JOIN sh USING (lang)),
         |tk AS (SELECT lang, n, floor(share * n_out) AS take
         |  FROM sh JOIN c USING (lang) CROSS JOIN no)
         |SELECT u.doc_id AS id, u.lang FROM u JOIN tk USING (lang)
         |WHERE u.u < tk.take / tk.n ORDER BY id""".stripMargin,

    // int8 scalar quantization: scale = max|x|/127, codes = round(x/scale)
    // (ties away from zero in both engines)
    "q82_int8_quantize" ->
      s"""WITH s AS (SELECT vec_id AS id, embedding AS vec,
         |    list_max(list_transform(embedding, v -> abs(v::DOUBLE))) / 127.0
         |      AS scale
         |  FROM embeddings)
         |SELECT id, scale,
         |  CASE WHEN scale = 0
         |    THEN array_to_string(list_transform(vec, v -> 0), ',')
         |    ELSE array_to_string(list_transform(vec,
         |      v -> round(v::DOUBLE / scale)::BIGINT), ',') END AS q
         |FROM s ORDER BY id""".stripMargin,

    "q57_dedup_corpus" ->
      s"""WITH $ShingleSets,
         |sizes AS (SELECT id, count(*) sz FROM sh GROUP BY id),
         |common AS (SELECT a.id id1, b.id id2, count(*) AS common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
         |  GROUP BY 1, 2),
         |pairs AS (SELECT id1, id2 FROM common
         |  JOIN sizes s1 ON common.id1 = s1.id
         |  JOIN sizes s2 ON common.id2 = s2.id
         |  WHERE common::DOUBLE / (s1.sz + s2.sz - common) >= 0.4),
         |edges AS (SELECT id1 a, id2 b FROM pairs
         |  UNION ALL SELECT id2, id1 FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |comp AS (
         |  WITH RECURSIVE reach(id, label) AS (
         |    SELECT id, id FROM nodes
         |    UNION
         |    SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.id
         |  )
         |  SELECT id, min(label) AS cluster FROM reach GROUP BY id),
         |dropped AS (SELECT id FROM comp WHERE id <> cluster)
         |SELECT count(*) AS n_kept, sum(doc_id)::BIGINT AS sum_kept_ids
         |FROM documents WHERE doc_id NOT IN (SELECT id FROM dropped)""".stripMargin,

    "q43_dup_clusters" ->
      s"""WITH $ShingleSets,
         |sizes AS (SELECT id, count(*) sz FROM sh GROUP BY id),
         |common AS (SELECT a.id id1, b.id id2, count(*) AS common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
         |  GROUP BY 1, 2),
         |pairs AS (SELECT id1, id2 FROM common
         |  JOIN sizes s1 ON common.id1 = s1.id
         |  JOIN sizes s2 ON common.id2 = s2.id
         |  WHERE common::DOUBLE / (s1.sz + s2.sz - common) >= 0.4),
         |edges AS (SELECT id1 a, id2 b FROM pairs
         |  UNION ALL SELECT id2, id1 FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |comp AS (
         |  WITH RECURSIVE reach(id, label) AS (
         |    SELECT id, id FROM nodes
         |    UNION
         |    SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.id
         |  )
         |  SELECT id, min(label) AS cluster FROM reach GROUP BY id)
         |SELECT id, cluster FROM comp ORDER BY id""".stripMargin,

    "q34_simhash" -> {
      val bitSums = (0 until Dedup.SimhashBits)
        .map(k => s"sum(CASE WHEN (x >> $k) & 1 = 1 THEN 1 ELSE -1 END) AS b$k")
        .mkString(",\n ")
      val value = (0 until Dedup.SimhashBits)
        .map(k => s"CASE WHEN b$k > 0 THEN ${1L << k} ELSE 0 END")
        .mkString(" + ")
      s"""WITH tok AS (SELECT doc_id AS id, unnest(${toks("text")}) AS tok
         |  FROM documents),
         |hx AS (SELECT id, ${hash32("tok")} % 65536 AS x FROM tok),
         |bits AS (SELECT id, $bitSums FROM hx GROUP BY id)
         |SELECT id, ($value)::BIGINT AS simhash FROM bits ORDER BY id""".stripMargin
    },

    "q35_knn_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
        |  FROM embeddings WHERE vec_id IN (0,1,2,3,4)),
        |scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
        |   list_sum(list_transform(range(1, len(e.embedding)+1),
        |     i -> q.qvec[i]::DOUBLE * e.embedding[i]::DOUBLE))
        |   / (sqrt(list_sum(list_transform(range(1, len(q.qvec)+1),
        |        i -> q.qvec[i]::DOUBLE * q.qvec[i]::DOUBLE)))
        |    * sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
        |        i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))) AS cos
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
        |ranked AS (SELECT *, row_number() OVER
        |   (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, cos, rank FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q36_knn_lsh" -> {
      val planeW =
        s"(${hash32("'plane_' || pp || '_dim_' || dd")} % 1000)::DOUBLE / 1000.0 - 0.5"
      s"""WITH planes AS (SELECT pp, dd, $planeW AS w
         |  FROM (SELECT unnest(range(0, 8)) AS pp) tp,
         |       (SELECT unnest(range(0, 64)) AS dd) td),
         |proj AS (SELECT e.vec_id, pl.pp,
         |    sum(e.embedding[pl.dd + 1]::DOUBLE * pl.w) AS s
         |  FROM embeddings e, planes pl GROUP BY 1, 2),
         |sigs AS (SELECT vec_id, sum(CASE WHEN s >= 0 THEN 1 << pp ELSE 0 END)
         |    AS bucket FROM proj GROUP BY vec_id),
         |sv AS (SELECT s.vec_id, s.bucket, e.embedding
         |  FROM sigs s JOIN embeddings e USING (vec_id)),
         |q AS (SELECT vec_id AS query_id, bucket, embedding AS qvec FROM sv
         |  WHERE vec_id IN (0,1,2,3,4)),
         |scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
         |   list_sum(list_transform(range(1, len(e.embedding)+1),
         |     i -> q.qvec[i]::DOUBLE * e.embedding[i]::DOUBLE))
         |   / (sqrt(list_sum(list_transform(range(1, len(q.qvec)+1),
         |        i -> q.qvec[i]::DOUBLE * q.qvec[i]::DOUBLE)))
         |    * sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
         |        i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))) AS cos
         |  FROM sv e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.query_id),
         |ranked AS (SELECT *, row_number() OVER
         |   (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cos, rank FROM ranked
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    },

    "q41_knn_ivf" ->
      s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings ORDER BY vec_id LIMIT 16),
         |av AS (SELECT e.vec_id AS id, e.embedding AS vec, c.cent_id,
         |    ${cosSql("e.embedding", "c.cvec")} AS cos_c
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (SELECT id, vec, cent_id AS cell FROM (
         |   SELECT *, row_number() OVER
         |     (PARTITION BY id ORDER BY cos_c DESC, cent_id ASC) AS r FROM av) t
         |  WHERE r = 1),
         |qv AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
         |  WHERE vec_id IN (0,1,2,3,4)),
         |pav AS (SELECT q.query_id, q.qvec, c.cent_id,
         |    ${cosSql("q.qvec", "c.cvec")} AS cos_c
         |  FROM qv q CROSS JOIN cents c),
         |pr AS (SELECT query_id, qvec, cent_id AS cell FROM (
         |   SELECT *, row_number() OVER
         |     (PARTITION BY query_id ORDER BY cos_c DESC, cent_id ASC) AS r
         |   FROM pav) t WHERE r <= 4),
         |scored AS (SELECT p.query_id, a.id AS neighbor_id,
         |    ${cosSql("p.qvec", "a.vec")} AS cos
         |  FROM assigned a JOIN pr p ON a.cell = p.cell AND a.id <> p.query_id),
         |ranked AS (SELECT *, row_number() OVER
         |   (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cos, rank FROM ranked
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // persisted-index append: q41's IVF algebra with centroids trained on
    // the CORPUS only (16 lowest corpus ids, iters = 0) and the grown
    // corpus (corpus + id-shifted shard) assigned under them
    "q256_vector_index_append" ->
      s"""WITH grown AS (
         |  SELECT vec_id AS id, embedding AS vec FROM embeddings
         |    WHERE vec_id % 10 <> 0
         |  UNION ALL
         |  SELECT vec_id + 1000000 AS id, embedding AS vec FROM embeddings
         |    WHERE vec_id % 10 = 0),
         |cents AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id % 10 <> 0
         |  ORDER BY vec_id LIMIT 16),
         |cr AS (SELECT cent_id, cvec,
         |    row_number() OVER (ORDER BY cent_id) - 1 AS cell FROM cents),
         |av AS (SELECT g.id, g.vec, c.cell,
         |    ${cosSql("g.vec", "c.cvec")} AS cos_c
         |  FROM grown g CROSS JOIN cr c),
         |assigned AS (SELECT id, vec, cell FROM (
         |   SELECT *, row_number() OVER
         |     (PARTITION BY id ORDER BY cos_c DESC, cell ASC) AS r FROM av) t
         |  WHERE r = 1),
         |qv AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
         |  WHERE vec_id IN (1,2,3,4,6)),
         |pav AS (SELECT q.query_id, q.qvec, c.cell,
         |    ${cosSql("q.qvec", "c.cvec")} AS cos_c
         |  FROM qv q CROSS JOIN cr c),
         |pr AS (SELECT query_id, qvec, cell FROM (
         |   SELECT *, row_number() OVER
         |     (PARTITION BY query_id ORDER BY cos_c DESC, cell ASC) AS r
         |   FROM pav) t WHERE r <= 4),
         |scored AS (SELECT p.query_id, a.id AS neighbor_id,
         |    ${cosSql("p.qvec", "a.vec")} AS cos
         |  FROM assigned a JOIN pr p ON a.cell = p.cell AND a.id <> p.query_id),
         |ranked AS (SELECT *, row_number() OVER
         |   (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cos, rank FROM ranked
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // index drift monitor: corpus-trained codebook (16 lowest corpus
    // ids, iters = 0), mean best-cell cosine per side, one row
    "q257_index_drift" ->
      s"""WITH corpus AS (SELECT vec_id AS id, embedding AS vec
         |  FROM embeddings WHERE vec_id % 10 <> 0),
         |shard AS (SELECT vec_id AS id, embedding AS vec
         |  FROM embeddings WHERE vec_id % 10 = 0),
         |cents AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id % 10 <> 0
         |  ORDER BY vec_id LIMIT 16),
         |cr AS (SELECT cent_id, cvec,
         |    row_number() OVER (ORDER BY cent_id) - 1 AS cell FROM cents),
         |avc AS (SELECT g.id, c.cell, ${cosSql("g.vec", "c.cvec")} AS cos
         |  FROM corpus g CROSS JOIN cr c),
         |bc AS (SELECT id, cos FROM (SELECT *, row_number() OVER
         |    (PARTITION BY id ORDER BY cos DESC, cell ASC) AS r FROM avc) t
         |  WHERE r = 1),
         |corp AS (SELECT count(*)::BIGINT AS n_corpus,
         |    avg(cos) AS corpus_mean_cos, var_samp(cos) AS v_c FROM bc),
         |avs AS (SELECT g.id, c.cell, ${cosSql("g.vec", "c.cvec")} AS cos
         |  FROM shard g CROSS JOIN cr c),
         |bs AS (SELECT id, cos FROM (SELECT *, row_number() OVER
         |    (PARTITION BY id ORDER BY cos DESC, cell ASC) AS r FROM avs) t
         |  WHERE r = 1),
         |shd AS (SELECT count(*)::BIGINT AS n_shard,
         |    avg(cos) AS shard_mean_cos, var_samp(cos) AS v_s FROM bs)
         |SELECT n_corpus, n_shard, corpus_mean_cos, shard_mean_cos,
         |  corpus_mean_cos - shard_mean_cos AS drift,
         |  sqrt(v_c / n_corpus + v_s / n_shard) AS se
         |FROM corp, shd""".stripMargin,

    // SemDeDup state frozen from the persisted index (iters = 0 codebook
    // = the 16 lowest-id corpus vectors): corpus assigned once, fresh
    // vectors route to their best cell, best within-cell match >= 0.45
    "q261_semdedup_from_index" ->
      s"""WITH corpus AS (SELECT vec_id AS id, embedding AS vec
         |  FROM embeddings WHERE vec_id % 10 <> 0),
         |fresh AS (SELECT vec_id + 1000000 AS id, embedding AS vec
         |  FROM embeddings WHERE vec_id % 10 = 0),
         |cents AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id % 10 <> 0
         |  ORDER BY vec_id LIMIT 16),
         |cr AS (SELECT cent_id, cvec,
         |    row_number() OVER (ORDER BY cent_id) - 1 AS cell FROM cents),
         |avc AS (SELECT g.id, c.cell, ${cosSql("g.vec", "c.cvec")} AS cos
         |  FROM corpus g CROSS JOIN cr c),
         |ac AS (SELECT id, cell FROM (SELECT *, row_number() OVER
         |    (PARTITION BY id ORDER BY cos DESC, cell ASC) AS r FROM avc) t
         |  WHERE r = 1),
         |avf AS (SELECT g.id, c.cell, ${cosSql("g.vec", "c.cvec")} AS cos
         |  FROM fresh g CROSS JOIN cr c),
         |af AS (SELECT id, cell FROM (SELECT *, row_number() OVER
         |    (PARTITION BY id ORDER BY cos DESC, cell ASC) AS r FROM avf) t
         |  WHERE r = 1),
         |cand AS (SELECT af.id, ac.id AS cid,
         |    ${cosSql("fx.vec", "cx.vec")} AS cos
         |  FROM af JOIN ac ON af.cell = ac.cell
         |    JOIN fresh fx ON fx.id = af.id
         |    JOIN corpus cx ON cx.id = ac.id
         |  WHERE ${cosSql("fx.vec", "cx.vec")} >= 0.45),
         |best AS (SELECT id, cid AS dup_of, cos, row_number() OVER
         |    (PARTITION BY id ORDER BY cos DESC, cid ASC) AS r FROM cand)
         |SELECT f.id, b.dup_of, b.cos
         |FROM fresh f LEFT JOIN (SELECT * FROM best WHERE r = 1) b
         |  ON f.id = b.id
         |ORDER BY f.id""".stripMargin,

    // sampled drift monitor: identical algebra with the RESIDENT side
    // restricted to the deterministic md5 half-sample the engine uses
    "q260_index_drift_sampled" ->
      s"""WITH corpus AS (SELECT vec_id AS id, embedding AS vec
         |  FROM embeddings WHERE vec_id % 10 <> 0
         |    AND ${hash32("'q260' || vec_id::VARCHAR")} / 4294967296.0 < 0.5),
         |shard AS (SELECT vec_id AS id, embedding AS vec
         |  FROM embeddings WHERE vec_id % 10 = 0),
         |cents AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id % 10 <> 0
         |  ORDER BY vec_id LIMIT 16),
         |cr AS (SELECT cent_id, cvec,
         |    row_number() OVER (ORDER BY cent_id) - 1 AS cell FROM cents),
         |avc AS (SELECT g.id, c.cell, ${cosSql("g.vec", "c.cvec")} AS cos
         |  FROM corpus g CROSS JOIN cr c),
         |bc AS (SELECT id, cos FROM (SELECT *, row_number() OVER
         |    (PARTITION BY id ORDER BY cos DESC, cell ASC) AS r FROM avc) t
         |  WHERE r = 1),
         |corp AS (SELECT count(*)::BIGINT AS n_corpus,
         |    avg(cos) AS corpus_mean_cos, var_samp(cos) AS v_c FROM bc),
         |avs AS (SELECT g.id, c.cell, ${cosSql("g.vec", "c.cvec")} AS cos
         |  FROM shard g CROSS JOIN cr c),
         |bs AS (SELECT id, cos FROM (SELECT *, row_number() OVER
         |    (PARTITION BY id ORDER BY cos DESC, cell ASC) AS r FROM avs) t
         |  WHERE r = 1),
         |shd AS (SELECT count(*)::BIGINT AS n_shard,
         |    avg(cos) AS shard_mean_cos, var_samp(cos) AS v_s FROM bs)
         |SELECT n_corpus, n_shard, corpus_mean_cos, shard_mean_cos,
         |  corpus_mean_cos - shard_mean_cos AS drift,
         |  sqrt(v_c / n_corpus + v_s / n_shard) AS se
         |FROM corp, shd""".stripMargin,

    "q203_knn_join_brute" ->
      s"""WITH scored AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    ${cosSql("a.embedding", "b.embedding")} AS cos
         |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
         |ranked AS (SELECT *, row_number() OVER
         |   (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cos, rank FROM ranked
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "q204_knn_join" ->
      s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings ORDER BY vec_id LIMIT 16),
         |av AS (SELECT e.vec_id AS id, e.embedding AS vec, c.cent_id,
         |    ${cosSql("e.embedding", "c.cvec")} AS cos_c
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (SELECT id, vec, cent_id AS cell FROM (
         |   SELECT *, row_number() OVER
         |     (PARTITION BY id ORDER BY cos_c DESC, cent_id ASC) AS r FROM av) t
         |  WHERE r = 1),
         |probes AS (SELECT id AS query_id, vec AS qvec, cent_id AS cell FROM (
         |   SELECT *, row_number() OVER
         |     (PARTITION BY id ORDER BY cos_c DESC, cent_id ASC) AS r FROM av) t
         |  WHERE r <= 2),
         |scored AS (SELECT p.query_id, a.id AS neighbor_id,
         |    ${cosSql("p.qvec", "a.vec")} AS cos
         |  FROM probes p JOIN assigned a ON a.cell = p.cell AND a.id <> p.query_id),
         |ranked AS (SELECT *, row_number() OVER
         |   (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cos, rank FROM ranked
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "q208_knn_graph_clusters" ->
      s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings ORDER BY vec_id LIMIT 16),
         |av AS (SELECT e.vec_id AS id, e.embedding AS vec, c.cent_id,
         |    ${cosSql("e.embedding", "c.cvec")} AS cos_c
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (SELECT id, vec, cent_id AS cell FROM (
         |   SELECT *, row_number() OVER
         |     (PARTITION BY id ORDER BY cos_c DESC, cent_id ASC) AS r FROM av) t
         |  WHERE r = 1),
         |probes AS (SELECT id AS query_id, vec AS qvec, cent_id AS cell FROM (
         |   SELECT *, row_number() OVER
         |     (PARTITION BY id ORDER BY cos_c DESC, cent_id ASC) AS r FROM av) t
         |  WHERE r <= 2),
         |scored AS (SELECT p.query_id, a.id AS neighbor_id,
         |    ${cosSql("p.qvec", "a.vec")} AS cos
         |  FROM probes p JOIN assigned a ON a.cell = p.cell AND a.id <> p.query_id),
         |ranked AS (SELECT *, row_number() OVER
         |   (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored),
         |pairs AS (SELECT DISTINCT least(query_id, neighbor_id) AS id1,
         |    greatest(query_id, neighbor_id) AS id2
         |  FROM ranked WHERE rank <= 3 AND cos >= 0.3),
         |edges AS (SELECT id1 a, id2 b FROM pairs
         |  UNION ALL SELECT id2, id1 FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |comp AS (
         |  WITH RECURSIVE reach(id, label) AS (
         |    SELECT id, id FROM nodes
         |    UNION
         |    SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.id
         |  )
         |  SELECT id, min(label) AS component FROM reach GROUP BY id)
         |SELECT id AS node, component FROM comp ORDER BY node""".stripMargin,

    "q37_text_analysis" -> {
      def score(markers: Seq[String]) = {
        val lst = markers.map(m => s"'$m'").mkString("[", ", ", "]")
        s"""CASE WHEN len(t) = 0 THEN 0.0 ELSE
           | len(list_filter(t, x -> list_contains($lst, x)))::DOUBLE / len(t) END"""
          .stripMargin.replaceAll("\n", "")
      }
      val Seq(en, es, fr, de) = graft.pipeline.TextOps.LangMarkers.map(m => score(m._2))
      s"""WITH tk AS (SELECT doc_id, text, ${toks("text")} AS t FROM documents),
         |sc AS (SELECT doc_id, text, t, $en AS s_en, $es AS s_es, $fr AS s_fr,
         |   $de AS s_de FROM tk),
         |f1 AS (SELECT *, 'en' AS b1, s_en AS v1 FROM sc),
         |f2 AS (SELECT *, CASE WHEN s_es > v1 THEN 'es' ELSE b1 END AS b2,
         |   CASE WHEN s_es > v1 THEN s_es ELSE v1 END AS v2 FROM f1),
         |f3 AS (SELECT *, CASE WHEN s_fr > v2 THEN 'fr' ELSE b2 END AS b3,
         |   CASE WHEN s_fr > v2 THEN s_fr ELSE v2 END AS v3 FROM f2),
         |f4 AS (SELECT *, CASE WHEN s_de > v3 THEN 'de' ELSE b3 END AS b4,
         |   CASE WHEN s_de > v3 THEN s_de ELSE v3 END AS v4 FROM f3),
         |lang AS (SELECT doc_id, text, t,
         |   CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
         |        WHEN v4 > 0.0 THEN b4 ELSE 'und' END AS lang_pred FROM f4),
         |quality AS (SELECT doc_id, text, t, lang_pred,
         |   least(len(text)::DOUBLE / 500.0, 1.0) AS len_score,
         |   least((len(regexp_replace(text,
         |     '[^.,;:!?''"()\\[\\]-]', '', 'g'))::DOUBLE
         |     / greatest(len(text), 1)) * 4.0, 1.0) AS punct_pen,
         |   least((CASE WHEN len(t) = 0 THEN 0.0 ELSE
         |     len(list_filter(t, x -> list_contains(
         |       ['the','a','an','and','of','to','in','is','was','for','on',
         |        'with','that','it'], x)))::DOUBLE / len(t) END) * 5.0, 1.0)
         |     AS stop_score
         |  FROM lang)
         |SELECT doc_id, lang_pred,
         | len_score * 0.5 + stop_score * 0.3 + (1.0 - punct_pen) * 0.2
         |   AS quality,
         | len(t) AS n_tokens,
         | len(regexp_extract_all(text, '[a-zA-Z0-9_]+|[^a-zA-Z0-9_\\s]'))
         |   AS n_subwords,
         | md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
         |FROM quality ORDER BY doc_id""".stripMargin
    },

    "q38_text_quality_agg" ->
      s"""SELECT source, count(*) AS n,
         | avg(len(${toks("text")})) AS avg_tokens,
         | avg(CASE WHEN len(${toks("text")}) = 0 THEN 0.0 ELSE
         |   len(list_filter(${toks("text")}, x -> list_contains(
         |     ['the','a','an','and','of','to','in','is','was','for','on',
         |      'with','that','it'], x)))::DOUBLE / len(${toks("text")}) END)
         |   AS avg_stopword_ratio,
         | avg(len(text)) AS avg_chars
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q44_stratified_topk" ->
      """SELECT source, doc_id, rn FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 3 ORDER BY source, rn""".stripMargin,

    "q47_embedding_dup_clusters" ->
      s"""WITH pairs AS (SELECT a.vec_id id1, b.vec_id id2
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.45),
         |edges AS (SELECT id1 a, id2 b FROM pairs
         |  UNION ALL SELECT id2, id1 FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |comp AS (
         |  WITH RECURSIVE reach(id, label) AS (
         |    SELECT id, id FROM nodes
         |    UNION
         |    SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.id
         |  )
         |  SELECT id, min(label) AS cluster FROM reach GROUP BY id)
         |SELECT id, cluster FROM comp ORDER BY id""".stripMargin,

    "q46_lm_score" ->
      s"""WITH toks AS (SELECT doc_id AS id, ${toks("text")} AS t FROM documents),
         |bg AS (SELECT id, unnest(${bigrams("t")}) AS bg FROM toks),
         |bgw AS (SELECT id, bg, string_split(bg, ' ')[1] AS w1 FROM bg),
         |bgc AS (SELECT bg, count(*) AS c_bg FROM bgw GROUP BY bg),
         |uni AS (SELECT unnest(t) AS w1 FROM toks),
         |unic AS (SELECT w1, count(*) AS c_w1 FROM uni GROUP BY w1),
         |v AS (SELECT count(*)::DOUBLE AS vocab FROM unic)
         |SELECT id, avg(ln((c_bg + 1.0) / (c_w1 + vocab))) AS lm_score,
         |  count(*) AS n_bigrams
         |FROM bgw JOIN bgc USING (bg) JOIN unic USING (w1) CROSS JOIN v
         |GROUP BY id ORDER BY id""".stripMargin,

    // cross-corpus CCNet split: counts/vocab from the en slice only; LEFT
    // joins + coalesce give OOV n-grams the pure add-one floor
    "q210_crosscorpus_lm" ->
      s"""WITH ttoks AS (SELECT ${toks("text")} AS t FROM documents
         |  WHERE lang = 'en'),
         |bgc AS (SELECT bg, count(*) AS c_bg FROM
         |  (SELECT unnest(${bigrams("t")}) AS bg FROM ttoks) GROUP BY bg),
         |unic AS (SELECT w1, count(*) AS c_w1 FROM
         |  (SELECT unnest(t) AS w1 FROM ttoks) GROUP BY w1),
         |v AS (SELECT count(*)::DOUBLE AS vocab FROM unic),
         |stoks AS (SELECT doc_id AS id, ${toks("text")} AS t FROM documents),
         |bgw AS (SELECT id, bg, string_split(bg, ' ')[1] AS w1 FROM
         |  (SELECT id, unnest(${bigrams("t")}) AS bg FROM stoks))
         |SELECT id,
         |  avg(ln((coalesce(c_bg, 0) + 1.0) / (coalesce(c_w1, 0) + vocab)))
         |    AS lm_score,
         |  count(*) AS n_bigrams
         |FROM bgw LEFT JOIN bgc USING (bg) LEFT JOIN unic USING (w1)
         |  CROSS JOIN v
         |GROUP BY id ORDER BY id""".stripMargin,

    "q42_vocab_topk" ->
      s"""SELECT token, count(*) AS n
         |FROM (SELECT unnest(${toks("text")}) AS token FROM documents) t
         |GROUP BY token ORDER BY n DESC, token ASC LIMIT 50""".stripMargin,

    "q39_multimodal_features" ->
      """SELECT doc_id AS id,
        | octet_length(encode(text)) AS n_bytes,
        | unicode(substr(text, 1, 1)) AS head_byte,
        | unicode(substr(text, len(text), 1)) AS tail_byte,
        | (list_sum(list_transform(regexp_extract_all(text, '.'),
        |    c -> unicode(c))) % 997)::BIGINT AS byte_sum_mod
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q45_json_extract" ->
      """SELECT event_type, count(*) AS n,
        | avg(json_extract_string(props, '$.k')::INT) AS avg_k,
        | sum(CASE WHEN json_extract_string(props, '$.k')::INT > 50
        |     THEN 1 ELSE 0 END)::BIGINT AS n_high
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q48_frame_sample" ->
      """SELECT doc_id AS id, f.frame,
        | md5(substr(text, (floor(len(text) * f.frame / 4) + 1)::INT, 16))
        |   AS frame_md5
        |FROM documents
        |CROSS JOIN (SELECT unnest(range(0, 4)) AS frame) f
        |ORDER BY id, f.frame""".stripMargin,

    "q54_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, value, epoch_us(ts) AS tus
        |  FROM events),
        |g AS (SELECT *, CASE WHEN lag(tus) OVER w IS NULL
        |         OR tus - lag(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |         ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx FROM g)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  min(event_id) AS first_event,
        |  (max(tus) - min(tus))::BIGINT AS dur_us,
        |  sum(value) AS sum_value
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    "q58_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus,
        |    event_type, value FROM events),
        |l AS (SELECT user_id, tus, 1 AS side, event_id AS tb, event_id, value,
        |    NULL::DOUBLE AS rv FROM e WHERE event_type = 'view'),
        |r AS (SELECT user_id, tus, 0 AS side, event_id AS tb,
        |    NULL::BIGINT AS event_id, NULL::DOUBLE AS value, value AS rv
        |  FROM e WHERE event_type = 'click'),
        |u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
        |c AS (SELECT *, last_value(rv IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY tus, side, tb
        |     ROWS UNBOUNDED PRECEDING) AS click_value_asof FROM u)
        |SELECT user_id, event_id, tus, value, click_value_asof
        |FROM c WHERE side = 1 ORDER BY user_id, tus, event_id""".stripMargin,

    "q40_event_windows" ->
      """SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch,
        | event_type, count(*) AS n, sum(value) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q89_range_join" ->
      """WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS tus FROM events),
        |p AS (SELECT event_id AS p_id, tus AS p_tus FROM e
        |  WHERE event_type = 'purchase'),
        |w AS (SELECT event_id AS w_id, tus AS lo, tus + 600000000 AS hi FROM e
        |  WHERE event_type = 'signup')
        |SELECT p_id, w_id, p_tus, lo
        |FROM p JOIN w ON p_tus >= lo AND p_tus <= hi
        |ORDER BY p_id, w_id""".stripMargin,

    "q90_interval_overlap" ->
      """WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS tus FROM events),
        |c AS (SELECT event_id AS c_id, tus AS c_lo, tus + 300000000 AS c_hi
        |  FROM e WHERE event_type = 'click'),
        |x AS (SELECT event_id AS x_id, tus AS x_lo, tus + 300000000 AS x_hi
        |  FROM e WHERE event_type = 'error')
        |SELECT c_id, x_id,
        |  least(c_hi, x_hi) - greatest(c_lo, x_lo) AS overlap_us
        |FROM c JOIN x ON c_lo <= x_hi AND x_lo <= c_hi
        |ORDER BY c_id, x_id""".stripMargin,

    // closed-form 2×2 centered ridge solve (λ=100 on the standardized
    // scale): penalized diagonal a(1+λ/n), effective df from the explicit
    // 2×2 inverse, GCV = n·rss/(n−df)² — q23's closed-form pattern
    "q103_ridge_fit" ->
      """WITH m AS (SELECT count(*)::DOUBLE n, sum(x1) s1, sum(x2) s2, sum(y) sy,
        |   sum(x1*x1) s11, sum(x2*x2) s22, sum(x1*x2) s12,
        |   sum(x1*y) s1y, sum(x2*y) s2y, sum(y*y) syy
        | FROM (SELECT l_extendedprice AS y, CAST(l_quantity AS DOUBLE) AS x1,
        |              l_discount AS x2 FROM lineitem
        |       WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        |         AND l_discount IS NOT NULL) t),
        |c AS (SELECT n, s1/n xb1, s2/n xb2, sy/n yb,
        |   s11 - s1*s1/n AS a, s22 - s2*s2/n AS b2c, s12 - s1*s2/n AS cc,
        |   s1y - s1*sy/n AS d, s2y - s2*sy/n AS e, syy - sy*sy/n AS f FROM m),
        |p AS (SELECT *, a + 100.0*a/n AS a_p, b2c + 100.0*b2c/n AS b_p FROM c),
        |sol AS (SELECT *, a_p*b_p - cc*cc AS det,
        |   (b_p*d - cc*e)/(a_p*b_p - cc*cc) AS b1,
        |   (a_p*e - cc*d)/(a_p*b_p - cc*cc) AS b2 FROM p),
        |r AS (SELECT *, yb - b1*xb1 - b2*xb2 AS b0,
        |   f - 2*(b1*d + b2*e) + (b1*b1*a + 2*b1*b2*cc + b2*b2*b2c) AS rss,
        |   (b_p*a + a_p*b2c - 2*cc*cc)/det + 1.0 AS df_eff FROM sol)
        |SELECT term, estimate::REAL AS estimate FROM (
        | SELECT '(Intercept)' AS term, b0 AS estimate FROM r
        | UNION ALL SELECT 'x1', b1 FROM r
        | UNION ALL SELECT 'x2', b2 FROM r
        | UNION ALL SELECT '__df_eff', df_eff FROM r
        | UNION ALL SELECT '__gcv', n*rss/((n-df_eff)*(n-df_eff)) FROM r) u
        |ORDER BY term""".stripMargin,

    // the oracle text IS the engine's own generated fixed-iteration Huber
    // SQL — executing it in DuckDB re-proves the emitted statement every
    // round (same loop as q62-q65 / q95-q96)
    "q104_huber_fit" -> graft.reg.Rlm.sqlOnly(
      "lineitem", "l_quantity", "l_extendedprice", k = 1.345, iters = 3),

    // quantile fit: the whole fixed-iteration check-loss IRLS + Powell
    // sandwich as Qreg.sqlOnly's emitted SQL — same self-proving loop
    "q205_quantile_fit" -> graft.reg.Qreg.sqlOnly(
      "lineitem", "l_quantity", "l_extendedprice", tau = 0.75, iters = 3,
      eps = 10.0),

    // grouped quantile fits: per-group unrolled check-loss CTEs
    "q206_quantile_grouped" -> graft.reg.QregSqlGen.groupedIrlsSql(
      "lineitem", "l_returnflag", "l_quantity", "l_extendedprice",
      tau = 0.75, iters = 3, eps = 10.0),

    // CQR: split + two unrolled quantile chains + score order stat +
    // test coverage/width, all one statement
    "q207_cqr_intervals" -> graft.reg.QregSqlGen.cqrSql(
      "lineitem", "l_orderkey::VARCHAR || '_' || l_linenumber::VARCHAR",
      "l_quantity", "l_extendedprice", alpha = 0.2, iters = 3, eps = 10.0,
      outerSalt = "q207o", innerSalt = "q207i"),

    // closed-form 2×2 eigensystem of the sample covariance, with the
    // engine's deterministic sign rule (largest-|loading| element positive,
    // ties → lowest index via the >= comparison)
    "q105_pca_fit" ->
      s"""$PcaCtes
         |SELECT stat, value::REAL AS value FROM (
         | SELECT 'mean_x1' AS stat, m1 AS value FROM v
         | UNION ALL SELECT 'mean_x2', m2 FROM v
         | UNION ALL SELECT 'lam1', lam1 FROM v
         | UNION ALL SELECT 'lam2', lam2 FROM v
         | UNION ALL SELECT 'v1_x1', v1x FROM v
         | UNION ALL SELECT 'v1_x2', v1y FROM v) u
         |ORDER BY stat""".stripMargin,

    "q106_pca_project" ->
      s"""$PcaCtes
         |SELECT l_orderkey, l_linenumber,
         |  ((x1 - m1)*v1x + (x2 - m2)*v1y)::REAL AS pc1
         |FROM pb CROSS JOIN v
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // 4 unrolled cyclic coordinate-descent sweeps (λ=8e6, α=1) over the
    // centered sums; per sweep x1 updates against the previous x2, then x2
    // against the FRESH x1 (the engine's cyclic order); soft threshold =
    // sign(z)·greatest(|z|−λs,0)
    "q107_lasso_fit" -> {
      val lam = 8e6
      val steps = (1 to 4).map { i =>
        s"""f$i AS (SELECT nb1 AS b1,
           |    sign(e - cc*nb1)*greatest(abs(e - cc*nb1) - $lam*s2, 0)/bb AS b2
           |  FROM (SELECT c.*, sign(d - cc*b2)
           |          *greatest(abs(d - cc*b2) - $lam*s1, 0)/aa AS nb1
           |        FROM c CROSS JOIN f${i - 1}) t$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH m AS (SELECT count(*)::DOUBLE n, sum(x1) s1x, sum(x2) s2x, sum(y) sy,
         |   sum(x1*x1) s11, sum(x2*x2) s22, sum(x1*x2) s12,
         |   sum(x1*y) s1y, sum(x2*y) s2y, sum(y*y) syy
         | FROM (SELECT l_extendedprice AS y, CAST(l_quantity AS DOUBLE) AS x1,
         |              l_discount AS x2 FROM lineitem
         |       WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
         |         AND l_discount IS NOT NULL) t),
         |c AS (SELECT n, s1x/n xb1, s2x/n xb2, sy/n yb,
         |   s11 - s1x*s1x/n AS aa, s22 - s2x*s2x/n AS bb, s12 - s1x*s2x/n AS cc,
         |   s1y - s1x*sy/n AS d, s2y - s2x*sy/n AS e, syy - sy*sy/n AS f,
         |   sqrt((s11 - s1x*s1x/n)/n) AS s1, sqrt((s22 - s2x*s2x/n)/n) AS s2 FROM m),
         |f0 AS (SELECT 0.0 AS b1, 0.0 AS b2),
         |$steps,
         |r AS (SELECT c.*, f4.b1, f4.b2,
         |   yb - f4.b1*xb1 - f4.b2*xb2 AS b0,
         |   f - 2*(f4.b1*d + f4.b2*e)
         |     + (f4.b1*f4.b1*aa + 2*f4.b1*f4.b2*cc + f4.b2*f4.b2*bb) AS rss
         | FROM c CROSS JOIN f4)
         |SELECT term, estimate::REAL AS estimate FROM (
         | SELECT '(Intercept)' AS term, b0 AS estimate FROM r
         | UNION ALL SELECT 'x1', b1 FROM r
         | UNION ALL SELECT 'x2', b2 FROM r
         | UNION ALL SELECT '__rss', rss FROM r) u
         |ORDER BY term""".stripMargin
    },

    // exact token top-40 (capacity > vocabulary ⇒ the MG summary is exact,
    // max_count = count); ties broken by item in binary order on both sides
    "q108_heavy_hitters" ->
      s"""WITH tk AS (SELECT unnest(${toks("text")}) AS item FROM documents)
         |SELECT item, count(*)::BIGINT AS count, count(*)::BIGINT AS max_count
         |FROM tk GROUP BY item
         |ORDER BY 2 DESC, 1 LIMIT 40""".stripMargin,

    "q109_grouped_heavy_hitters" ->
      s"""WITH tk AS (SELECT lang, unnest(${toks("text")}) AS item FROM documents),
         |cnt AS (SELECT lang, item, count(*)::BIGINT AS count
         |        FROM tk GROUP BY 1, 2),
         |rk AS (SELECT *, row_number()
         |         OVER (PARTITION BY lang ORDER BY count DESC, item) rn FROM cnt)
         |SELECT lang, item, count FROM rk WHERE rn <= 5
         |ORDER BY lang, count DESC, item""".stripMargin,

    // per-group closed-form 1-regressor ridge (λ=50, standardized penalty
    // λ·a/n on each group's own variance); df_eff = a/(a+pen) + 1
    "q110_grouped_ridge" ->
      """WITH g AS (SELECT l_returnflag AS grp, count(*)::DOUBLE n, sum(x1) s1,
        |    sum(y) sy, sum(x1*x1) s11, sum(x1*y) s1y
        |  FROM (SELECT l_returnflag, l_extendedprice AS y,
        |          CAST(l_quantity AS DOUBLE) AS x1 FROM lineitem
        |        WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
        |          AND l_quantity IS NOT NULL) t GROUP BY 1),
        |c AS (SELECT grp, n, s1/n xb, sy/n yb,
        |    s11 - s1*s1/n AS a, s1y - s1*sy/n AS d FROM g),
        |r AS (SELECT grp, n, xb, yb, a, d, a + 50.0*a/n AS ap FROM c),
        |s AS (SELECT grp, d/ap AS b1, yb - d/ap*xb AS b0,
        |    a/ap + 1.0 AS df_eff FROM r)
        |SELECT grp AS "group", term, estimate::REAL AS estimate,
        |  df_eff::REAL AS df_eff FROM (
        | SELECT grp, '(Intercept)' AS term, b0 AS estimate, df_eff FROM s
        | UNION ALL SELECT grp, 'x1', b1, df_eff FROM s) u
        |ORDER BY "group", term""".stripMargin,

    // Mann-Whitney AUC with tie half-credit over the distinct-score
    // aggregate (same identity as the engine plan)
    "q111_auc" ->
      """WITH sc AS (SELECT CAST(l_quantity AS DOUBLE) s,
        |    CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END y
        |  FROM lineitem WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL),
        |g AS (SELECT s, sum(y) pos, sum(1.0 - y) neg FROM sc GROUP BY s),
        |w AS (SELECT s, pos, neg,
        |    coalesce(sum(neg) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cumneg FROM g)
        |SELECT (sum(pos*(cumneg + 0.5*neg))
        |  / ((SELECT sum(pos) FROM g) * (SELECT sum(neg) FROM g)))::REAL AS auc
        |FROM w""".stripMargin,

    // bucketed AUC: the engine's forced-bucket regime on a continuous
    // score — identical 256-bin histogram-CDF cut algebra (the q197 pin),
    // count-below bin assignment, then the same tie-half-credit U over
    // the ≤257-bin aggregate
    "q227_auc_bucketed" ->
      s"""WITH v AS (SELECT CAST(l_extendedprice AS DOUBLE) s,
         |    CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END y
         |  FROM lineitem
         |  WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL),
         |${quantileCutCtesFromV(256)},
         |r AS (SELECT 1 + (SELECT count(*) FROM cuts WHERE v.s > cuts.cut)
         |    AS k, v.y FROM v),
         |g AS (SELECT k, sum(y) pos, sum(1.0 - y) neg FROM r GROUP BY k),
         |w AS (SELECT k, pos, neg,
         |    coalesce(sum(neg) OVER (ORDER BY k
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cumneg FROM g)
         |SELECT (sum(pos*(cumneg + 0.5*neg))
         |  / ((SELECT sum(pos) FROM g) * (SELECT sum(neg) FROM g)))::REAL AS auc
         |FROM w""".stripMargin,

    // batch BM25: three queries in one corpus pass — postings restricted
    // to the term UNION (per-token df/tf are unchanged by widening the
    // restriction, so per-query scores equal q117 with that term set),
    // per-(query, doc) contrib sums, per-query top-10 by (bm25 DESC, id)
    "q228_bm25_batch" ->
      s"""WITH q AS (SELECT * FROM (VALUES
         |    (0, ['hash', 'join']),
         |    (1, ['stream', 'vector']),
         |    (2, ['hash', 'vector', 'stream'])) AS t(query_id, terms)),
         |qt AS (SELECT DISTINCT query_id, unnest(terms) AS token FROM q),
         |tk AS (SELECT doc_id AS id, ${toks("text")} AS t FROM documents),
         |l AS (SELECT id, len(t)::DOUBLE AS dl FROM tk),
         |st AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM l),
         |tok AS (SELECT id, unnest(t) AS token FROM tk),
         |p AS (SELECT id, token, count(*)::DOUBLE AS tf FROM tok
         |  WHERE token IN (SELECT token FROM qt) GROUP BY 1, 2),
         |dfc AS (SELECT token, count(*)::DOUBLE AS df FROM p GROUP BY 1),
         |sc AS (SELECT qt.query_id, p.id,
         |    sum(ln((st.n_docs - dfc.df + 0.5)/(dfc.df + 0.5) + 1.0)
         |        * p.tf * (1.2 + 1.0)
         |        / (p.tf + 1.2*(1.0 - 0.75 + 0.75*l.dl/st.avgdl))) AS bm25,
         |    count(*) AS n_matched
         |  FROM p JOIN dfc USING (token) JOIN l ON p.id = l.id
         |    JOIN qt USING (token) CROSS JOIN st
         |  GROUP BY 1, 2),
         |r AS (SELECT query_id, id, bm25, n_matched, row_number() OVER
         |    (PARTITION BY query_id ORDER BY bm25 DESC, id) AS bm25_rank
         |  FROM sc)
         |SELECT query_id, id, bm25::REAL AS bm25, n_matched, bm25_rank
         |FROM r WHERE bm25_rank <= 10
         |ORDER BY query_id, id""".stripMargin,

    // batch hybrid RRF: the q215 fusion per query — lexical candidates =
    // batch BM25 top-15, semantic candidates = cosine top-15 against each
    // query vector (vec_id 0..2), reciprocal-rank fuse keyed by query
    "q229_hybrid_batch" ->
      s"""WITH q AS (SELECT * FROM (VALUES
         |    (0, ['hash', 'join']),
         |    (1, ['stream', 'vector']),
         |    (2, ['hash', 'vector', 'stream'])) AS t(query_id, terms)),
         |qt AS (SELECT DISTINCT query_id, unnest(terms) AS token FROM q),
         |tk AS (SELECT doc_id AS id, ${toks("text")} AS t FROM documents),
         |l AS (SELECT id, len(t)::DOUBLE AS dl FROM tk),
         |st AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM l),
         |tok AS (SELECT id, unnest(t) AS token FROM tk),
         |p AS (SELECT id, token, count(*)::DOUBLE AS tf FROM tok
         |  WHERE token IN (SELECT token FROM qt) GROUP BY 1, 2),
         |dfc AS (SELECT token, count(*)::DOUBLE AS df FROM p GROUP BY 1),
         |sc AS (SELECT qt.query_id, p.id,
         |    sum(ln((st.n_docs - dfc.df + 0.5)/(dfc.df + 0.5) + 1.0)
         |        * p.tf * (1.2 + 1.0)
         |        / (p.tf + 1.2*(1.0 - 0.75 + 0.75*l.dl/st.avgdl))) AS bm25
         |  FROM p JOIN dfc USING (token) JOIN l ON p.id = l.id
         |    JOIN qt USING (token) CROSS JOIN st
         |  GROUP BY 1, 2),
         |lex AS (SELECT query_id, id, row_number() OVER
         |    (PARTITION BY query_id ORDER BY bm25 DESC, id) AS lex_rank
         |  FROM sc QUALIFY lex_rank <= 15),
         |qv AS (SELECT vec_id AS query_id, embedding AS v FROM embeddings
         |  WHERE vec_id < 3),
         |cs AS (SELECT qv.query_id, e.vec_id AS id,
         |    ${cosSql("e.embedding", "qv.v")} AS cos
         |  FROM embeddings e CROSS JOIN qv
         |  WHERE list_sum(list_transform(range(1, len(e.embedding)+1),
         |    i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)) > 0),
         |sem AS (SELECT query_id, id, row_number() OVER
         |    (PARTITION BY query_id ORDER BY cos DESC, id) AS sem_rank
         |  FROM cs QUALIFY sem_rank <= 15),
         |f AS (SELECT coalesce(lex.query_id, sem.query_id) AS query_id,
         |    coalesce(lex.id, sem.id) AS id, lex_rank, sem_rank,
         |    coalesce(1.0::DOUBLE/(60 + lex_rank), 0.0)
         |      + coalesce(1.0::DOUBLE/(60 + sem_rank), 0.0) AS rrf
         |  FROM lex FULL OUTER JOIN sem
         |    ON lex.query_id = sem.query_id AND lex.id = sem.id),
         |top AS (SELECT *, row_number() OVER
         |    (PARTITION BY query_id ORDER BY rrf DESC, id) AS rr FROM f
         |  QUALIFY rr <= 10)
         |SELECT query_id, id, lex_rank, sem_rank, rrf::REAL AS rrf
         |FROM top ORDER BY query_id, id""".stripMargin,

    // batch PRF: the q219 two-round expansion keyed by query — round-1
    // batch BM25 → per-query top-5 feedback docs → per-query 2 most
    // frequent NEW feedback tokens (count DESC, token ASC) join that
    // query's terms → round-2 batch BM25, per-query top-10
    "q230_prf_batch" ->
      s"""WITH q AS (SELECT * FROM (VALUES
         |    (0, ['hash', 'join']),
         |    (1, ['stream', 'vector']),
         |    (2, ['hash', 'vector', 'stream'])) AS t(query_id, terms)),
         |qt AS (SELECT DISTINCT query_id, unnest(terms) AS token FROM q),
         |tk AS (SELECT doc_id AS id, ${toks("text")} AS t FROM documents),
         |l AS (SELECT id, len(t)::DOUBLE AS dl FROM tk),
         |st AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM l),
         |tok AS (SELECT id, unnest(t) AS token FROM tk),
         |p1 AS (SELECT id, token, count(*)::DOUBLE AS tf FROM tok
         |  WHERE token IN (SELECT token FROM qt) GROUP BY 1, 2),
         |dfc1 AS (SELECT token, count(*)::DOUBLE AS df FROM p1 GROUP BY 1),
         |sc1 AS (SELECT qt.query_id, p1.id,
         |    sum(ln((st.n_docs - dfc1.df + 0.5)/(dfc1.df + 0.5) + 1.0)
         |        * p1.tf * (1.2 + 1.0)
         |        / (p1.tf + 1.2*(1.0 - 0.75 + 0.75*l.dl/st.avgdl))) AS bm25
         |  FROM p1 JOIN dfc1 USING (token) JOIN l ON p1.id = l.id
         |    JOIN qt USING (token) CROSS JOIN st
         |  GROUP BY 1, 2),
         |fb AS (SELECT query_id, id FROM (SELECT query_id, id, row_number()
         |    OVER (PARTITION BY query_id ORDER BY bm25 DESC, id) AS r
         |  FROM sc1) WHERE r <= 5),
         |fbtok AS (SELECT fb.query_id, tok.token, count(*) AS c
         |  FROM tok JOIN fb USING (id)
         |  WHERE NOT EXISTS (SELECT 1 FROM qt
         |    WHERE qt.query_id = fb.query_id AND qt.token = tok.token)
         |  GROUP BY 1, 2),
         |ex AS (SELECT query_id, token FROM (SELECT query_id, token,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY c DESC, token ASC) AS r
         |  FROM fbtok) WHERE r <= 2),
         |qt2 AS (SELECT query_id, token FROM qt
         |  UNION ALL SELECT query_id, token FROM ex),
         |p2 AS (SELECT id, token, count(*)::DOUBLE AS tf FROM tok
         |  WHERE token IN (SELECT token FROM qt2) GROUP BY 1, 2),
         |dfc2 AS (SELECT token, count(*)::DOUBLE AS df FROM p2 GROUP BY 1),
         |sc2 AS (SELECT qt2.query_id, p2.id,
         |    sum(ln((st.n_docs - dfc2.df + 0.5)/(dfc2.df + 0.5) + 1.0)
         |        * p2.tf * (1.2 + 1.0)
         |        / (p2.tf + 1.2*(1.0 - 0.75 + 0.75*l.dl/st.avgdl))) AS bm25,
         |    count(*) AS n_matched
         |  FROM p2 JOIN dfc2 USING (token) JOIN l ON p2.id = l.id
         |    JOIN qt2 USING (token) CROSS JOIN st
         |  GROUP BY 1, 2),
         |r AS (SELECT query_id, id, bm25, n_matched, row_number() OVER
         |    (PARTITION BY query_id ORDER BY bm25 DESC, id) AS bm25_rank
         |  FROM sc2)
         |SELECT query_id, id, bm25::REAL AS bm25, n_matched, bm25_rank
         |FROM r WHERE bm25_rank <= 10
         |ORDER BY query_id, id""".stripMargin,

    // batch MMR: the q218 greedy recursive-CTE replay run once per query
    // (vec 0 and vec 1), λ=0.7, per-query top-8 shortlist, 4 picks each
    "q231_mmr_batch" -> {
      def chain(qid: Int) =
        s"""qv$qid AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $qid),
           |craw$qid AS (SELECT e.vec_id AS id,
           |    ${cosSql("e.embedding", s"q.qv")} AS rel, e.embedding AS v
           |  FROM embeddings e CROSS JOIN qv$qid q WHERE e.vec_id <> $qid),
           |cand$qid AS (SELECT * FROM craw$qid ORDER BY rel DESC, id LIMIT 8),
           |pairs$qid AS (SELECT a.id AS ia, b.id AS ib,
           |    ${cosSql("a.v", "b.v")} AS cos
           |  FROM cand$qid a JOIN cand$qid b ON a.id <> b.id),
           |sel$qid(step, id, mmr, rel, ids) AS (
           |  SELECT 1, id, 0.7::DOUBLE * rel, rel, [id]
           |  FROM (SELECT * FROM cand$qid ORDER BY rel DESC, id LIMIT 1)
           |  UNION ALL
           |  SELECT s.step + 1, t.id, t.mmr, t.rel, list_append(s.ids, t.id)
           |  FROM sel$qid s, LATERAL (
           |    SELECT c.id, 0.7::DOUBLE * c.rel
           |        - (1.0::DOUBLE - 0.7::DOUBLE) * (
           |          SELECT max(p.cos) FROM pairs$qid p
           |          WHERE p.ia = c.id AND list_contains(s.ids, p.ib)) AS mmr,
           |      c.rel
           |    FROM cand$qid c WHERE NOT list_contains(s.ids, c.id)
           |    ORDER BY mmr DESC, c.id LIMIT 1) t
           |  WHERE s.step < 4)""".stripMargin
      s"""WITH RECURSIVE
         |${chain(0)},
         |${chain(1)}
         |SELECT query_id, id AS vec_id, step AS mmr_rank, mmr::REAL AS mmr,
         |  rel::REAL AS rel
         |FROM (SELECT 0 AS query_id, * FROM sel0
         |  UNION ALL SELECT 1, * FROM sel1)
         |ORDER BY query_id, mmr_rank""".stripMargin
    },

    // weighted isotonic fit by the minimax formula
    // ŷ(s) = max_{j≤s} min_{k≥s} (Σ_{j..k} y)/(Σ_{j..k} n) — evaluated by
    // self-joins over the 50-row distinct-score table (PAV equals this by
    // the classic characterization; the engine runs PAV, the oracle this)
    "q112_isotonic" ->
      """WITH sc AS (SELECT CAST(l_quantity AS DOUBLE) s,
        |    CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END y
        |  FROM lineitem WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL),
        |g AS (SELECT s, count(*)::BIGINT n, count(*)::DOUBLE w, sum(y) sy
        |  FROM sc GROUP BY s),
        |o AS (SELECT s, n, w, sy, sum(w) OVER (ORDER BY s) cw,
        |    sum(sy) OVER (ORDER BY s) cs FROM g),
        |pairs AS (SELECT a.s js, b.s ks,
        |    (b.cs - a.cs + a.sy) / (b.cw - a.cw + a.w) AS iavg
        |  FROM o a JOIN o b ON a.s <= b.s),
        |mn AS (SELECT p.js, o.s, min(p.iavg) m
        |  FROM pairs p JOIN o ON p.js <= o.s AND o.s <= p.ks
        |  GROUP BY p.js, o.s)
        |SELECT o.s AS score, o.n AS n, max(mn.m)::REAL AS calibrated
        |FROM mn JOIN o ON mn.s = o.s
        |GROUP BY o.s, o.n
        |ORDER BY score""".stripMargin,

    // per-label element-wise mean: position × label sums via an index
    // cross join, one scalar row per (label, position) — flattened so the
    // driver's comparator can sort/hash every cell
    "q113_label_centroids" ->
      """WITH e AS (SELECT label, i,
        |    sum(CAST(embedding[i] AS DOUBLE)) sx, count(*)::BIGINT n
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i) r
        |  WHERE embedding IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT label, n, (i - 1)::INT AS pos, (sx / n)::REAL AS value
        |FROM e ORDER BY label, pos""".stripMargin,

    // funnel conversion: the same conditional-min cascade as
    // operators.Events.funnel — r2 joins step-2 events to r1's earliest
    // step-1 time, etc.; conversions are exact-int ratios
    "q137_funnel" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_type AS s
        |  FROM events),
        |r1 AS (SELECT u, min(t) AS t1 FROM e WHERE s = 'view' GROUP BY u),
        |r2 AS (SELECT e.u, min(t) AS t2 FROM e JOIN r1
        |  ON e.u = r1.u AND e.t >= r1.t1 WHERE s = 'click' GROUP BY e.u),
        |r3 AS (SELECT e.u, min(t) AS t3 FROM e JOIN r2
        |  ON e.u = r2.u AND e.t >= r2.t2 WHERE s = 'purchase' GROUP BY e.u),
        |c AS (SELECT (SELECT count(*) FROM r1) AS n1,
        |  (SELECT count(*) FROM r2) AS n2, (SELECT count(*) FROM r3) AS n3)
        |SELECT step_idx, step, n_users, conversion FROM (
        | SELECT 1 AS step_idx, 'view' AS step, n1::BIGINT AS n_users,
        |   1.0 AS conversion FROM c
        | UNION ALL SELECT 2, 'click', n2::BIGINT,
        |   CASE WHEN n1 = 0 THEN 0.0 ELSE n2::DOUBLE / n1 END FROM c
        | UNION ALL SELECT 3, 'purchase', n3::BIGINT,
        |   CASE WHEN n2 = 0 THEN 0.0 ELSE n3::DOUBLE / n2 END FROM c) z
        |ORDER BY step_idx""".stripMargin,

    // retention cohorts: distinct (user, day) activity, cohort = first
    // active day, integer floor division throughout
    "q138_retention" ->
      """WITH a AS (SELECT DISTINCT user_id AS u,
        |    epoch_us(ts) // 86400000000 AS p FROM events),
        |c AS (SELECT u, min(p) AS c FROM a GROUP BY u)
        |SELECT c.c AS cohort_period, (a.p - c.c)::BIGINT AS period_offset,
        |  count(*) AS n_users
        |FROM a JOIN c ON a.u = c.u
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Gopher repetition rules — mirrors TextOps.repetitionSignals
    // definition-for-definition (same tokenizer, same space-joined grams,
    // same exact-int coverage sums, same threshold doubles), so every
    // fraction is bit-identical
    "q136_repetition_signals" -> {
      val topNs = Seq(2, 3, 4)
      val dupNs = Seq(5, 10)
      def ngram(t: String, n: Int): String = {
        val join = (1 to n).map(k => s"$t[i+${k - 1}]").mkString(" || ' ' || ")
        s"list_transform(range(1, len($t) - ${n - 2}), i -> $join)"
      }
      val gCtes = (topNs ++ dupNs).distinct.sorted.map { n =>
        s"""g$n AS (SELECT id, g, count(*) AS c, len(g) AS l FROM
           |  (SELECT doc_id AS id, unnest(${ngram("t", n)}) AS g FROM tok) q
           |  GROUP BY id, g)""".stripMargin
      }
      val topCtes = topNs.map { n =>
        s"""t$n AS (SELECT id, (c*l)::DOUBLE AS cov FROM
           |  (SELECT id, c, l, row_number() OVER
           |     (PARTITION BY id ORDER BY c DESC, l DESC) AS rn FROM g$n) z
           |  WHERE rn = 1)""".stripMargin
      }
      val dupCtes = dupNs.map { n =>
        s"""d$n AS (SELECT id, sum(CASE WHEN c > 1 THEN c*l ELSE 0 END)::DOUBLE
           |  AS cov FROM g$n GROUP BY id)""".stripMargin
      }
      val topSel = topNs.map(n =>
        s"least(1.0, coalesce(t$n.cov, 0) / chars)::REAL AS top${n}gram_char_frac")
      val dupSel = dupNs.map(n =>
        s"least(1.0, coalesce(d$n.cov, 0) / chars)::REAL AS dup${n}gram_char_frac")
      val keepTerms =
        Seq("coalesce(dlf, 0) <= 0.30", "coalesce(dlcf, 0) <= 0.20") ++
          topNs.map(n =>
            s"least(1.0, coalesce(t$n.cov, 0) / chars) <= ${0.24 - 0.02 * n}") ++
          dupNs.map(n =>
            s"least(1.0, coalesce(d$n.cov, 0) / chars) <= ${0.20 - 0.01 * n}")
      val joins = (topNs.map(n => s"t$n") ++ dupNs.map(n => s"d$n"))
        .map(a => s"LEFT JOIN $a ON ch.id = $a.id").mkString("\n")
      s"""WITH tok AS (SELECT doc_id, ${toks("text")} AS t FROM documents),
         |ch AS (SELECT doc_id AS id, greatest(len(text), 1)::DOUBLE AS chars
         |  FROM documents),
         |ln AS (SELECT id, l, count(*) AS c, len(l) AS len FROM
         |  (SELECT doc_id AS id,
         |     unnest(list_filter(string_split(text, chr(10)), x -> len(x) > 0)) AS l
         |   FROM documents) q GROUP BY id, l),
         |ls AS (SELECT id, 1.0 - count(*)::DOUBLE / sum(c) AS dlf,
         |  sum(CASE WHEN c > 1 THEN c*len ELSE 0 END)::DOUBLE / sum(c*len) AS dlcf
         |  FROM ln GROUP BY id),
         |${gCtes.mkString(",\n")},
         |${topCtes.mkString(",\n")},
         |${dupCtes.mkString(",\n")}
         |SELECT ch.id AS doc_id,
         |  coalesce(dlf, 0)::REAL AS dup_line_frac,
         |  coalesce(dlcf, 0)::REAL AS dup_line_char_frac,
         |  ${(topSel ++ dupSel).mkString(",\n  ")},
         |  (${keepTerms.mkString(" AND ")}) AS repetition_keep
         |FROM ch LEFT JOIN ls ON ch.id = ls.id
         |$joins
         |ORDER BY doc_id""".stripMargin
    },

    // Markov transitions: LAG over (user, time, id-tiebreak) — the total
    // order makes counts engine-independent; prob is an exact-int ratio
    "q139_event_transitions" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_id AS i,
        |    event_type AS s FROM events),
        |p AS (SELECT s AS to_event,
        |    LAG(s) OVER (PARTITION BY u ORDER BY t, i) AS from_event FROM e),
        |c AS (SELECT from_event, to_event, count(*)::BIGINT AS n FROM p
        |  WHERE from_event IS NOT NULL GROUP BY 1, 2)
        |SELECT from_event, to_event, n,
        |  n::DOUBLE / (sum(n) OVER (PARTITION BY from_event))::DOUBLE AS prob
        |FROM c ORDER BY from_event, to_event""".stripMargin,

    // hourly rate anomalies: both engines interpolate the even-count
    // median identically (quantile_cont == Spark percentile), and every
    // other term is exact-integer or a deterministic double op
    "q140_anomaly_hours" ->
      """WITH c AS (SELECT epoch_us(ts) // 3600000000 AS period,
        |    count(*)::BIGINT AS n FROM events GROUP BY 1),
        |m AS (SELECT quantile_cont(n, 0.5)::DOUBLE AS med FROM c),
        |d AS (SELECT quantile_cont(abs(n - med), 0.5)::DOUBLE AS mad
        |  FROM c, m)
        |SELECT period, n, med, mad,
        |  (abs(n - med) > 3.0 * mad) AS is_anomaly
        |FROM c, m, d ORDER BY period""".stripMargin,

    // rolling activity: exact-int window sum / exact count, then the
    // same double division on both sides
    "q141_rolling_activity" ->
      """WITH c AS (SELECT event_type, epoch_us(ts) // 86400000000 AS period,
        |    count(*)::BIGINT AS n FROM events GROUP BY 1, 2)
        |SELECT event_type, period, n,
        |  (sum(n) OVER w)::DOUBLE / (count(*) OVER w) AS ma,
        |  n::DOUBLE / ((sum(n) OVER w)::DOUBLE / (count(*) OVER w)) AS ratio
        |FROM c
        |WINDOW w AS (PARTITION BY event_type ORDER BY period
        |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, period""".stripMargin,

    // quantile sketch: DuckDB's quantile_cont IS the sketch's semantics;
    // the sketch is exact here (distinct l_quantity ≤ capacity)
    "q143_quantile_sketch" ->
      """WITH g AS (SELECT l_returnflag,
        |    quantile_cont(l_quantity, [0.25, 0.5, 0.75, 0.95]) AS qs
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, p.pos, qs[p.pos + 1]::REAL AS q_value
        |FROM g, (VALUES (0), (1), (2), (3)) p(pos)
        |ORDER BY l_returnflag, pos""".stripMargin,

    // segmented funnel: first-event segment via the same (t, id) total
    // order, cascade mins carrying the segment, zero-filled spine
    "q165_funnel_by_segment" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_id AS i,
        |    event_type AS s FROM events),
        |sg AS (SELECT u, s AS segment FROM (
        |    SELECT u, s, row_number() OVER (PARTITION BY u ORDER BY t, i)
        |      AS rn FROM e) z WHERE rn = 1),
        |r1 AS (SELECT e.u, sg.segment, min(t) AS t1 FROM e
        |  JOIN sg ON e.u = sg.u WHERE s = 'view' GROUP BY 1, 2),
        |r2 AS (SELECT e.u, r1.segment, min(e.t) AS t2 FROM e
        |  JOIN r1 ON e.u = r1.u AND e.t >= r1.t1
        |  WHERE e.s = 'click' GROUP BY 1, 2),
        |r3 AS (SELECT e.u, r2.segment, min(e.t) AS t3 FROM e
        |  JOIN r2 ON e.u = r2.u AND e.t >= r2.t2
        |  WHERE e.s = 'purchase' GROUP BY 1, 2),
        |cts AS (SELECT segment, 1 AS step_idx, count(*)::BIGINT AS n
        |    FROM r1 GROUP BY 1
        |  UNION ALL SELECT segment, 2, count(*)::BIGINT FROM r2 GROUP BY 1
        |  UNION ALL SELECT segment, 3, count(*)::BIGINT FROM r3 GROUP BY 1),
        |spine AS (SELECT c.segment, st.step_idx, st.step
        |  FROM (SELECT DISTINCT segment FROM cts WHERE step_idx = 1) c,
        |    (VALUES (1, 'view'), (2, 'click'), (3, 'purchase'))
        |      st(step_idx, step)),
        |j AS (SELECT sp.segment, sp.step_idx, sp.step,
        |    coalesce(cts.n, 0)::BIGINT AS n_users
        |  FROM spine sp LEFT JOIN cts
        |    ON sp.segment = cts.segment AND sp.step_idx = cts.step_idx),
        |f AS (SELECT segment, step_idx, step, n_users,
        |    lag(n_users) OVER (PARTITION BY segment ORDER BY step_idx)
        |      AS pn FROM j)
        |SELECT segment, step_idx, step, n_users,
        |  CASE WHEN pn IS NULL THEN 1.0 WHEN pn = 0 THEN 0.0
        |    ELSE n_users::DOUBLE / pn END AS conversion
        |FROM f ORDER BY segment, step_idx""".stripMargin,

    // grouped KMV: per-group k smallest distinct hashes via a ranked
    // window, same estimator formula
    "q164_kmv_grouped" -> {
      val hv = hash32("user_id::VARCHAR")
      s"""WITH h AS (SELECT DISTINCT event_type, $hv AS hv FROM events),
         |r AS (SELECT event_type, hv,
         |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
         |  FROM h),
         |k AS (SELECT event_type, count(*)::INT AS n_kept,
         |    max(hv)::BIGINT AS kth FROM r WHERE rn <= 64 GROUP BY 1)
         |SELECT event_type,
         |  (CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
         |    ELSE (64 - 1)::DOUBLE / (kth::DOUBLE / 4294967296.0)
         |  END)::REAL AS estimate,
         |  n_kept, kth AS kth_hash, (n_kept < 64) AS exact
         |FROM k ORDER BY event_type""".stripMargin
    },

    // stickiness: q162's two windows joined on the period
    "q163_stickiness" ->
      """WITH a AS (SELECT DISTINCT user_id AS u,
        |    epoch_us(ts) // 86400000000 AS p FROM events),
        |mx AS (SELECT max(p) AS mp FROM a),
        |w AS (SELECT unnest([1, 7]) AS win),
        |e AS (SELECT DISTINCT u, win,
        |    unnest(range(p, least(p + win, mp + 1))) AS period
        |  FROM a, mx, w),
        |c AS (SELECT win, period, count(*)::BIGINT AS n FROM e
        |  GROUP BY 1, 2)
        |SELECT d.period, d.n AS dau, s.n AS wau,
        |  (d.n::DOUBLE / s.n)::REAL AS stickiness
        |FROM c d JOIN c s ON d.period = s.period
        |WHERE d.win = 1 AND s.win = 7
        |ORDER BY d.period""".stripMargin,

    // rolling actives: the same bounded expansion of distinct activity
    // to its report periods, clipped at the observed max
    "q162_rolling_actives" ->
      """WITH a AS (SELECT DISTINCT user_id AS u,
        |    epoch_us(ts) // 86400000000 AS p FROM events),
        |mx AS (SELECT max(p) AS mp FROM a),
        |w AS (SELECT unnest([1, 7]) AS win),
        |e AS (SELECT DISTINCT u, win,
        |    unnest(range(p, least(p + win, mp + 1))) AS period
        |  FROM a, mx, w)
        |SELECT win, period, count(*)::BIGINT AS n_active
        |FROM e GROUP BY 1, 2 ORDER BY win, period""".stripMargin,

    // Kaplan-Meier: same censoring, same quantization, same
    // exp∘Σlog product with the identical null-skip zero guard
    "q161_survival_curve" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_type AS s
        |  FROM events),
        |st AS (SELECT u, min(t) AS t0 FROM e WHERE s = 'view' GROUP BY u),
        |en AS (SELECT e.u, min(e.t) AS t1 FROM e JOIN st
        |  ON e.u = st.u AND e.t >= st.t0 WHERE s = 'purchase' GROUP BY e.u),
        |mx AS (SELECT max(t) AS tmax FROM e),
        |dur AS (SELECT (CASE WHEN t1 IS NOT NULL THEN t1 - t0
        |    ELSE tmax - t0 END) // 86400000000 AS t,
        |    (t1 IS NOT NULL) AS conv
        |  FROM st LEFT JOIN en ON st.u = en.u CROSS JOIN mx),
        |c AS (SELECT t, count(*) AS n_all,
        |    sum(CASE WHEN conv THEN 1 ELSE 0 END)::BIGINT AS n_events
        |  FROM dur GROUP BY t),
        |r AS (SELECT t, n_events,
        |    sum(n_all) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING)
        |      ::BIGINT AS n_risk FROM c),
        |f AS (SELECT t, n_events, n_risk,
        |    1.0 - n_events::DOUBLE / n_risk AS factor
        |  FROM r WHERE n_events > 0),
        |z AS (SELECT t, n_events, n_risk,
        |    max(CASE WHEN factor <= 0.0 THEN 1 ELSE 0 END) OVER w AS zero,
        |    sum(CASE WHEN factor > 0.0 THEN ln(factor) END) OVER w AS lsum
        |  FROM f WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING))
        |SELECT t, n_risk, n_events,
        |  (CASE WHEN zero = 1 THEN 0.0 ELSE exp(lsum) END)::REAL AS survival
        |FROM z ORDER BY t""".stripMargin,

    // weighted quantiles: same distinct-value CDF and q·W threshold,
    // exact integer weight sums
    "q159_weighted_quantiles" ->
      """WITH v AS (SELECT n_chars AS v, sum(n_chars)::BIGINT AS sw
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
        |  GROUP BY 1),
        |c AS (SELECT v, sum(sw) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |    AS cum FROM v),
        |t AS (SELECT sum(sw)::DOUBLE AS tw FROM v),
        |q AS (SELECT unnest([0.25, 0.5, 0.9]) AS q)
        |SELECT q.q, min(c.v)::BIGINT AS value
        |FROM c, t, q WHERE c.cum >= q.q * t.tw
        |GROUP BY q.q ORDER BY q""".stripMargin,

    // Zipf fit: the q22 closed-form OLS algebra over the derived
    // (log rank, log freq) vocab table; float32 pins absorb
    // summation-order and libm log ulp
    "q160_zipf_fit" -> {
      s"""WITH f AS (SELECT tok, count(*)::BIGINT AS freq FROM
         |  (SELECT unnest(${toks("text")}) AS tok FROM documents) z
         |  GROUP BY tok),
         |rk AS (SELECT ln(row_number() OVER (ORDER BY freq DESC, tok)
         |    ::DOUBLE) AS x1, ln(freq::DOUBLE) AS y FROM f),
         |m AS (SELECT count(*)::DOUBLE n, sum(x1) sx, sum(y) sy,
         |   sum(x1*x1) sxx, sum(x1*y) sxy, sum(y*y) syy FROM rk),
         |s AS (SELECT n, sx, sy, sxx, sxy, syy,
         |   (n*sxy - sx*sy)/(n*sxx - sx*sx) AS b1,
         |   sy/n - (n*sxy - sx*sy)/(n*sxx - sx*sx) * sx/n AS b0 FROM m),
         |r AS (SELECT *, syy - 2*(b0*sy + b1*sxy)
         |        + (b0*b0*n + 2*b0*b1*sx + b1*b1*sxx) AS rss,
         |        n*sxx - sx*sx AS det FROM s)
         |SELECT term, estimate::REAL AS estimate, std_error::REAL AS std_error
         |FROM (
         | SELECT '(Intercept)' AS term, b0 AS estimate,
         |   sqrt(rss / (n - 2) * sxx / det) AS std_error FROM r
         | UNION ALL
         | SELECT 'lx', b1, sqrt(rss / (n - 2) * n / det) FROM r) z
         |ORDER BY term""".stripMargin
    },

    // priority sample: the same salted-hash uniform and log-key formula;
    // the k-cut is on well-separated continuous keys (id tiebreak)
    "q158_priority_sample" -> {
      val u = s"((${hash32("'ps' || doc_id::VARCHAR")}) + 1)::DOUBLE / 4294967296.0"
      s"""SELECT doc_id, n_chars, prio FROM (
         |  SELECT doc_id, n_chars,
         |    (ln($u) / n_chars::DOUBLE)::REAL AS prio
         |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
         |  ORDER BY ln($u) / n_chars::DOUBLE DESC, doc_id LIMIT 200) z
         |ORDER BY doc_id""".stripMargin
    },

    // snapshot diff: same planted delta, same fingerprint classification
    "q157_snapshot_diff" ->
      """WITH oldc AS (SELECT doc_id AS id, md5(text) AS fp FROM documents),
        |newc AS (SELECT doc_id AS id,
        |    md5(CASE WHEN doc_id % 89 = 0 THEN text || ' EDITED'
        |      ELSE text END) AS fp
        |  FROM documents WHERE doc_id % 97 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS id, md5(text) AS fp FROM documents
        |  WHERE doc_id % 101 = 0)
        |SELECT CASE WHEN o.fp IS NULL THEN 'added'
        |    WHEN n.fp IS NULL THEN 'removed'
        |    WHEN o.fp = n.fp THEN 'unchanged' ELSE 'changed' END AS status,
        |  count(*)::BIGINT AS n_docs
        |FROM oldc o FULL OUTER JOIN newc n ON o.id = n.id
        |GROUP BY 1 ORDER BY status""".stripMargin,

    // KMV: the estimator is the same one-line formula over the same md5
    // hashes — pinned in BOTH the exact and approximation regimes
    "q156_kmv_distinct" -> {
      def side(unnestExpr: String) =
        s"""(SELECT hv FROM (SELECT DISTINCT ${hash32("v")} AS hv
           |  FROM (SELECT unnest($unnestExpr) AS v FROM tk) z)
           | ORDER BY hv LIMIT 64)""".stripMargin
      s"""WITH tk AS (SELECT ${toks("text")} AS t FROM documents),
         |ts AS (SELECT count(*)::INT AS n_kept, max(hv)::BIGINT AS kth
         |  FROM ${side("t")} q),
         |bs AS (SELECT count(*)::INT AS n_kept, max(hv)::BIGINT AS kth
         |  FROM ${side(bigrams("t"))} q)
         |SELECT granularity,
         |  (CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
         |    ELSE (64 - 1)::DOUBLE / (kth::DOUBLE / 4294967296.0)
         |  END)::REAL AS estimate,
         |  n_kept, kth AS kth_hash, (n_kept < 64) AS exact
         |FROM (SELECT 'token' AS granularity, n_kept, kth FROM ts
         |  UNION ALL SELECT 'bigram', n_kept, kth FROM bs) u
         |ORDER BY granularity""".stripMargin
    },

    // windowed funnel: q137's cascade with the 1-day gap bound on each
    // step join — exact-int times, exact-int conversion ratios
    "q153_funnel_windowed" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_type AS s
        |  FROM events),
        |r1 AS (SELECT u, min(t) AS t1 FROM e WHERE s = 'view' GROUP BY u),
        |r2 AS (SELECT e.u, min(t) AS t2 FROM e JOIN r1
        |  ON e.u = r1.u AND e.t >= r1.t1 AND e.t <= r1.t1 + 86400000000
        |  WHERE s = 'click' GROUP BY e.u),
        |r3 AS (SELECT e.u, min(t) AS t3 FROM e JOIN r2
        |  ON e.u = r2.u AND e.t >= r2.t2 AND e.t <= r2.t2 + 86400000000
        |  WHERE s = 'purchase' GROUP BY e.u),
        |c AS (SELECT (SELECT count(*) FROM r1) AS n1,
        |  (SELECT count(*) FROM r2) AS n2, (SELECT count(*) FROM r3) AS n3)
        |SELECT step_idx, step, n_users, conversion FROM (
        | SELECT 1 AS step_idx, 'view' AS step, n1::BIGINT AS n_users,
        |   1.0 AS conversion FROM c
        | UNION ALL SELECT 2, 'click', n2::BIGINT,
        |   CASE WHEN n1 = 0 THEN 0.0 ELSE n2::DOUBLE / n1 END FROM c
        | UNION ALL SELECT 3, 'purchase', n3::BIGINT,
        |   CASE WHEN n2 = 0 THEN 0.0 ELSE n3::DOUBLE / n2 END FROM c) z
        |ORDER BY step_idx""".stripMargin,

    // sequence patterns: the same two-lag window; (count desc, pattern)
    // is a total order so both engines cut the same top-20
    "q154_sequence_patterns" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_id AS i,
        |    event_type AS s FROM events),
        |p AS (SELECT LAG(s, 2) OVER w AS a, LAG(s, 1) OVER w AS b, s AS c
        |  FROM e WINDOW w AS (PARTITION BY u ORDER BY t, i))
        |SELECT a || ' > ' || b || ' > ' || c AS pattern,
        |  count(*)::BIGINT AS n
        |FROM p WHERE a IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, pattern LIMIT 20""".stripMargin,

    // source overlap: distinct (source, shingle) sets, shared counts and
    // the exact-int overlap coefficient
    "q155_source_overlap" -> {
      s"""WITH sh AS (SELECT DISTINCT source AS s,
         |    unnest(${bigrams(toks("text"))}) AS g FROM documents),
         |sz AS (SELECT s, count(*)::BIGINT AS n FROM sh GROUP BY 1),
         |pr AS (SELECT a.s AS source1, b.s AS source2,
         |    count(*)::BIGINT AS n_shared
         |  FROM sh a JOIN sh b ON a.g = b.g AND a.s < b.s GROUP BY 1, 2)
         |SELECT pr.source1, pr.source2, pr.n_shared,
         |  (pr.n_shared::DOUBLE / least(z1.n, z2.n))::REAL AS overlap
         |FROM pr JOIN sz z1 ON pr.source1 = z1.s
         |JOIN sz z2 ON pr.source2 = z2.s
         |ORDER BY source1, source2""".stripMargin
    },

    // aHash: the planted-pixel closed form (every pixel byte at file
    // offset m is (id·31+m) mod 256 — the q67 fixture), exact-integer
    // mean threshold, file-order bit index
    "q151_image_ahash" ->
      """WITH px AS (
        |  SELECT d.doc_id AS id, rr.r * 5 + xx.x AS i,
        |    ((d.doc_id*31 + (54 + rr.r*16 + 3*xx.x)) % 256
        |     + (d.doc_id*31 + (54 + rr.r*16 + 3*xx.x + 1)) % 256
        |     + (d.doc_id*31 + (54 + rr.r*16 + 3*xx.x + 2)) % 256)::BIGINT AS gray
        |  FROM documents d, (SELECT unnest(range(0, 4)) AS r) rr,
        |    (SELECT unnest(range(0, 5)) AS x) xx),
        |t AS (SELECT id, sum(gray) AS tot, count(*) AS n FROM px GROUP BY id)
        |SELECT px.id AS doc_id, 5 AS width, 4 AS height,
        |  sum(CASE WHEN px.gray * t.n > t.tot
        |    THEN (1::BIGINT << px.i) ELSE 0 END)::BIGINT AS ahash,
        |  sum(CASE WHEN px.gray * t.n > t.tot THEN 1 ELSE 0 END)::INT AS n_set
        |FROM px JOIN t ON px.id = t.id
        |GROUP BY px.id ORDER BY doc_id""".stripMargin,

    // image near-dups: brute-force XOR popcount over the same closed-form
    // hashes — the banded-LSH pigeonhole guarantee means the operator's
    // output EQUALS brute force (valve ≫ bucket sizes here)
    "q152_image_neardup_pairs" ->
      """WITH px AS (
        |  SELECT d.doc_id AS id, rr.r * 5 + xx.x AS i,
        |    ((d.doc_id*31 + (54 + rr.r*16 + 3*xx.x)) % 256
        |     + (d.doc_id*31 + (54 + rr.r*16 + 3*xx.x + 1)) % 256
        |     + (d.doc_id*31 + (54 + rr.r*16 + 3*xx.x + 2)) % 256)::BIGINT AS gray
        |  FROM documents d, (SELECT unnest(range(0, 4)) AS r) rr,
        |    (SELECT unnest(range(0, 5)) AS x) xx),
        |t AS (SELECT id, sum(gray) AS tot, count(*) AS n FROM px GROUP BY id),
        |h AS (SELECT px.id,
        |    sum(CASE WHEN px.gray * t.n > t.tot
        |      THEN (1::BIGINT << px.i) ELSE 0 END)::BIGINT AS ahash
        |  FROM px JOIN t ON px.id = t.id GROUP BY px.id),
        |p AS (SELECT a.id AS id1, b.id AS id2,
        |    bit_count(xor(a.ahash, b.ahash))::INT AS hamming
        |  FROM h a JOIN h b ON a.id < b.id)
        |SELECT hamming, count(*)::BIGINT AS n_pairs,
        |  sum(id1 + id2)::BIGINT AS id_sum
        |FROM p WHERE hamming <= 3 GROUP BY 1 ORDER BY 1""".stripMargin,

    // CUSUM: identical centered series, identical prefix-sum/running-min
    // identity, μ/σ written as the same exact-integer-sum formulas
    "q148_cusum_shifts" ->
      """WITH c AS (SELECT epoch_us(ts) // 3600000000 AS period,
        |    count(*)::BIGINT AS n FROM events GROUP BY 1),
        |st AS (SELECT count(*)::BIGINT AS m, sum(n)::BIGINT AS s1,
        |    sum(n * n)::BIGINT AS s2 FROM c),
        |sg AS (SELECT s1::DOUBLE / m AS mu,
        |    sqrt((s2::DOUBLE - s1::DOUBLE * s1 / m) / (m - 1)) AS sigma
        |  FROM st),
        |p AS (SELECT period, n, sigma,
        |    sum(n::DOUBLE - mu - 0.5 * sigma)
        |      OVER (ORDER BY period ROWS UNBOUNDED PRECEDING) AS pp
        |  FROM c, sg),
        |q AS (SELECT period, n, pp, sigma,
        |    least(min(pp) OVER (ORDER BY period ROWS UNBOUNDED PRECEDING),
        |      0.0) AS pmin FROM p)
        |SELECT period, n, (pp - pmin)::REAL AS cusum,
        |  (pp - pmin) > 5.0 * sigma AS is_shift
        |FROM q ORDER BY period""".stripMargin,

    // phrase search: the list-comprehension mirror of the positional
    // postings chain (the q136 n-gram indexing style)
    "q149_phrase_search" -> {
      s"""WITH t AS (SELECT doc_id AS id, ${toks("text")} AS tk
         |  FROM documents)
         |SELECT id, n_hits FROM (
         |  SELECT id, len(list_filter(range(1, len(tk) - 1),
         |      i -> tk[i] = 'row' AND tk[i+1] = 'column' AND
         |        tk[i+2] = 'sort'))::BIGINT AS n_hits
         |  FROM t) z
         |WHERE n_hits > 0
         |ORDER BY id""".stripMargin
    },

    // percent_rank: the window form IS the semantics the broadcast-CDF
    // operator reproduces (ties = min rank)
    "q150_percentile_rank" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  (percent_rank() OVER (ORDER BY l_quantity))::REAL AS pr
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // decay scores: the rate constant is WRITTEN as ln(2)/halfLife on
    // both sides so each engine derives the same double; float32 output
    // absorbs exp/summation ulp
    "q147_decay_scores" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
        |r AS (SELECT max(t) AS ref FROM e)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  sum(exp((t - ref)::DOUBLE * (ln(2.0) / 604800000000.0)))::REAL
        |    AS score,
        |  max(t)::BIGINT AS last_seen
        |FROM e, r GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Count-Min: in the no-saturation regime the min-estimate IS the
    // exact count (absent item → 0), so the oracle is a plain GROUP BY
    "q146_count_min" ->
      s"""WITH t AS (SELECT unnest(${toks("text")}) AS tok FROM documents),
         |c AS (SELECT tok, count(*)::BIGINT AS n FROM t GROUP BY 1),
         |q AS (SELECT * FROM (VALUES (0, 'join'), (1, 'hash'), (2, 'scan'),
         |  (3, 'vector'), (4, 'zzz_absent')) v(pos, item))
         |SELECT q.pos, q.item, coalesce(c.n, 0)::BIGINT AS est
         |FROM q LEFT JOIN c ON q.item = c.tok
         |ORDER BY q.pos""".stripMargin,

    // DSIR: same hashed-bigram buckets, same add-λ ratios and log-diff
    // order; the float32 cast on the per-doc sum absorbs libm-vs-JVM
    // log ulp and summation-order wiggle
    "q145_dsir_scores" ->
      s"""WITH tk AS (SELECT doc_id AS id, lang, ${toks("text")} AS t
         |  FROM documents),
         |bgr AS (SELECT id, lang, unnest(${bigrams("t")}) AS bg FROM tk),
         |bb AS (SELECT id, lang, ${hash32("bg")} % 4096 AS bucket FROM bgr),
         |ct AS (SELECT bucket, count(*)::BIGINT AS ct FROM bb
         |  WHERE lang = 'en' GROUP BY 1),
         |cr AS (SELECT bucket, count(*)::BIGINT AS cr FROM bb GROUP BY 1),
         |tt AS (SELECT coalesce(sum(ct), 0)::BIGINT AS tt FROM ct),
         |tr AS (SELECT coalesce(sum(cr), 0)::BIGINT AS tr FROM cr),
         |w AS (SELECT cr.bucket,
         |    ln((coalesce(ct, 0) + 1.0) / (tt + 4096.0)) -
         |      ln((cr + 1.0) / (tr + 4096.0)) AS logw
         |  FROM cr LEFT JOIN ct USING (bucket) CROSS JOIN tt CROSS JOIN tr)
         |SELECT id, count(*)::BIGINT AS n_grams, sum(logw)::REAL AS score
         |FROM bb JOIN w USING (bucket)
         |GROUP BY id ORDER BY id""".stripMargin,

    // PageRank: 5 unrolled iterations of the same formula, same
    // association order; (1.0 - 0.85) is COMPUTED on both sides so the
    // teleport constant is the identical double; float32 output cast
    // absorbs partial-vs-sequential summation ulp
    "q144_domain_pagerank" -> {
      import graft.pipeline.TextOps
      val plant = Seq(
        "text", "' see https://site'", "(doc_id % 7)::VARCHAR",
        "'.example.org/p/'", "doc_id::VARCHAR",
        "' and http://cdn.example.net/x?y='", "(doc_id % 3)::VARCHAR"
      ).mkString(" || ")
      def iter(i: Int): String = {
        val p = s"r${i - 1}"
        s"""d$i AS (SELECT coalesce(sum(r), 0) AS dang FROM $p
           |  LEFT JOIN dg ON v = ds WHERE ds IS NULL),
           |c$i AS (SELECT e.t AS t, sum(r / deg) AS c FROM e
           |  JOIN $p ON e.s = v JOIN dg ON e.s = dg.ds GROUP BY e.t),
           |r$i AS (SELECT v, (1.0 - 0.85) / N + 0.85 * (coalesce(c, 0) + dang / N) AS r
           |  FROM n LEFT JOIN c$i ON v = t CROSS JOIN d$i CROSS JOIN nc)""".stripMargin
      }
      s"""WITH planted AS (SELECT doc_id, $plant AS text FROM documents),
         |u AS (SELECT doc_id,
         |    unnest(regexp_extract_all(text, '${TextOps.UrlPattern}')) AS url
         |  FROM planted),
         |dom AS (SELECT DISTINCT doc_id,
         |    regexp_extract(url, '${TextOps.UrlDomainPattern}', 1) AS d FROM u),
         |e AS (SELECT DISTINCT a.d AS s, b.d AS t FROM dom a
         |  JOIN dom b ON a.doc_id = b.doc_id AND a.d <> b.d),
         |n AS (SELECT s AS v FROM e UNION SELECT t FROM e),
         |nc AS (SELECT count(*)::DOUBLE AS N FROM n),
         |dg AS (SELECT s AS ds, count(*)::BIGINT AS deg FROM e GROUP BY s),
         |r0 AS (SELECT v, 1.0 / N AS r FROM n, nc),
         |${(1 to 5).map(iter).mkString(",\n")}
         |SELECT v AS node, r::REAL AS rank FROM r5 ORDER BY node""".stripMargin
    },

    // association rules: same valve, same distinct-membership counts,
    // same single-division double ratios as Baskets.associationRules
    "q142_basket_rules" ->
      """WITH b0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |  FROM lineitem),
        |keep AS (SELECT bk FROM b0 GROUP BY bk HAVING count(*) <= 20),
        |b AS (SELECT b0.bk, b0.it FROM b0 JOIN keep USING (bk)),
        |nb AS (SELECT count(DISTINCT bk)::BIGINT AS n FROM b),
        |ic AS (SELECT it, count(*)::BIGINT AS ni FROM b GROUP BY it),
        |pc AS (SELECT x.it AS a, y.it AS c, count(*)::BIGINT AS n_pair
        |  FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |d AS (SELECT a AS antecedent, c AS consequent, n_pair FROM pc
        |  UNION ALL SELECT c, a, n_pair FROM pc)
        |SELECT d.antecedent, d.consequent, d.n_pair,
        |  d.n_pair::DOUBLE / nb.n AS support,
        |  d.n_pair::DOUBLE / ia.ni AS confidence,
        |  (d.n_pair::DOUBLE * nb.n) / (ia.ni::DOUBLE * ic2.ni) AS lift
        |FROM d
        |JOIN ic ia ON d.antecedent = ia.it
        |JOIN ic ic2 ON d.consequent = ic2.it
        |CROSS JOIN nb
        |ORDER BY antecedent, consequent""".stripMargin,

    // Bloom semi join: the filter is pruning-only, so the exact result
    // is the plain semi join
    "q166_bloom_semijoin" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderkey IN
        |  (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,

    // prefix filtering is lossless, so the oracle is the brute-force
    // exact Jaccard join over the same TRIGRAM-shingle sets
    "q167_setsim_join" ->
      s"""WITH sh AS (SELECT DISTINCT doc_id AS id,
         |    unnest(${trigrams(toks("text"))}) AS shingle FROM documents),
         |sizes AS (SELECT id, count(*) sz FROM sh GROUP BY id),
         |common AS (SELECT a.id id1, b.id id2, count(*) AS common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
         |  GROUP BY 1, 2)
         |SELECT id1, id2,
         |  common::DOUBLE / (s1.sz + s2.sz - common) AS jaccard
         |FROM common JOIN sizes s1 ON common.id1 = s1.id
         |  JOIN sizes s2 ON common.id2 = s2.id
         |WHERE common::DOUBLE / (s1.sz + s2.sz - common) >= 0.5
         |ORDER BY id1, id2""".stripMargin,

    // same island key (period − row_number), same distinct-day collapse
    "q168_activity_streaks" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS period FROM events),
        |i AS (SELECT user_id, period - row_number()
        |    OVER (PARTITION BY user_id ORDER BY period) AS island FROM a),
        |g AS (SELECT user_id, island, count(*)::BIGINT AS len
        |  FROM i GROUP BY 1, 2)
        |SELECT user_id, max(len) AS longest_streak,
        |  count(*)::BIGINT AS n_streaks,
        |  sum(len)::BIGINT AS n_active_periods
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    // open/close via row_number twins of min_by/max_by over (t, id)
    "q169_ohlc_downsample" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS t, event_id,
        |    value FROM events),
        |b AS (SELECT event_type, t // 3600000000 AS period, t, event_id,
        |    value FROM e),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY event_type, period
        |      ORDER BY t, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, period
        |      ORDER BY t DESC, event_id DESC) AS rn_d FROM b)
        |SELECT event_type, period,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  count(*)::BIGINT AS n_events, sum(value)::REAL AS value_sum
        |FROM r GROUP BY 1, 2 ORDER BY event_type, period""".stripMargin,

    // q43's recursive-closure clusters + keep-longest representative
    "q170_canonical_docs" ->
      s"""WITH $ShingleSets,
         |sizes AS (SELECT id, count(*) sz FROM sh GROUP BY id),
         |common AS (SELECT a.id id1, b.id id2, count(*) AS common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
         |  GROUP BY 1, 2),
         |pairs AS (SELECT id1, id2 FROM common
         |  JOIN sizes s1 ON common.id1 = s1.id
         |  JOIN sizes s2 ON common.id2 = s2.id
         |  WHERE common::DOUBLE / (s1.sz + s2.sz - common) >= 0.4),
         |edges AS (SELECT id1 a, id2 b FROM pairs
         |  UNION ALL SELECT id2, id1 FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |comp AS (
         |  WITH RECURSIVE reach(id, label) AS (
         |    SELECT id, id FROM nodes
         |    UNION
         |    SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.id
         |  )
         |  SELECT id, min(label) AS cluster FROM reach GROUP BY id),
         |mem AS (SELECT comp.id, comp.cluster, d.n_chars
         |  FROM comp JOIN documents d ON comp.id = d.doc_id),
         |best AS (SELECT cluster, id, n_chars,
         |    row_number() OVER (PARTITION BY cluster
         |      ORDER BY n_chars DESC, id ASC) AS rn,
         |    count(*) OVER (PARTITION BY cluster)::BIGINT AS n_members,
         |    max(n_chars) OVER (PARTITION BY cluster) AS max_chars
         |  FROM mem)
         |SELECT cluster, id AS canonical_id, max_chars AS n_chars,
         |  n_members
         |FROM best WHERE rn = 1 ORDER BY cluster""".stripMargin,

    // same blocking, same (distance, id) tiebreak via row_number
    "q171_record_linkage" ->
      """WITH p AS (SELECT p_partkey AS id, p_name, p_brand, p_size
        |  FROM part),
        |bs AS (SELECT p_brand, p_size FROM p GROUP BY 1, 2
        |  HAVING count(*) <= 1000),
        |v AS (SELECT p.* FROM p JOIN bs USING (p_brand, p_size)),
        |pr AS (SELECT a.id AS id, b.id AS id2,
        |    levenshtein(a.p_name, b.p_name) AS d
        |  FROM v a JOIN v b ON a.p_brand = b.p_brand
        |    AND a.p_size = b.p_size AND a.id <> b.id),
        |r AS (SELECT id, id2, d, row_number()
        |    OVER (PARTITION BY id ORDER BY d, id2) AS rn FROM pr)
        |SELECT id, id2 AS match_id, d AS distance
        |FROM r WHERE rn = 1 ORDER BY id""".stripMargin,

    // same four grouping sets, same grouping_id bit order (first col =
    // most significant bit in both engines)
    "q175_cube_totals" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*)::BIGINT AS n, sum(l_quantity) AS sum_qty,
        |  GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST,
        |  l_linestatus NULLS FIRST""".stripMargin,

    // latest version per key via row_number over (ts, id) descending
    "q176_latest_per_key" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus,
        |    event_id, value FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY tus DESC, event_id DESC) AS rn,
        |  count(*) OVER (PARTITION BY user_id, event_type)::BIGINT AS n_versions,
        |  max(tus) OVER (PARTITION BY user_id, event_type)::BIGINT AS last_ts
        |  FROM e)
        |SELECT user_id, event_type, value AS last_value,
        |  event_id AS last_id, last_ts, n_versions
        |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    // same md5 uniforms, same log(u)/w priorities, same per-stratum rank
    "q177_stratified_sample" -> {
      val u = s"((${hash32("'ps' || doc_id::VARCHAR")} + 1)::DOUBLE / 4294967296.0)"
      s"""WITH p AS (SELECT lang, doc_id, n_chars,
         |    ln($u) / CAST(n_chars AS DOUBLE) AS prio
         |  FROM documents
         |  WHERE n_chars IS NOT NULL AND n_chars > 0),
         |r AS (SELECT *, row_number() OVER (PARTITION BY lang
         |    ORDER BY prio DESC, doc_id) AS rn FROM p)
         |SELECT lang, doc_id, n_chars, prio::REAL AS prio
         |FROM r WHERE rn <= 20 ORDER BY lang, doc_id""".stripMargin
    },

    // same contingency/margin algebra, same perturbed rater
    "q178_cohen_kappa" ->
      """WITH d AS (SELECT lang AS a,
        |    CASE WHEN doc_id % 7 = 0 THEN 'zz' ELSE lang END AS b
        |  FROM documents WHERE lang IS NOT NULL),
        |cells AS (SELECT a, b, count(*)::DOUBLE AS n FROM d GROUP BY 1, 2),
        |rm AS (SELECT a, sum(n) AS ra FROM cells GROUP BY a),
        |cm AS (SELECT b, sum(n) AS cb FROM cells GROUP BY b),
        |t AS (SELECT sum(n) AS t FROM cells),
        |po AS (SELECT coalesce(sum(n), 0) AS agree FROM cells WHERE a = b),
        |pe AS (SELECT coalesce(sum(ra * cb), 0) AS pesum
        |  FROM rm JOIN cm ON rm.a = cm.b)
        |SELECT t::BIGINT AS n, (agree / t)::REAL AS po,
        |  (pesum / (t * t))::REAL AS pe,
        |  (CASE WHEN pesum / (t * t) < 1.0
        |    THEN (agree / t - pesum / (t * t)) / (1.0 - pesum / (t * t))
        |    END)::REAL AS kappa
        |FROM t CROSS JOIN po CROSS JOIN pe""".stripMargin,

    // per-block q56-style kmeans (1 iteration) on dim slices, fresh
    // encode assignment, ‖x−w‖² via the same dot identity
    "q196_pq_mse" -> {
      def assign(b: Int, cf: String, out: String) =
        s"""p_$out AS (SELECT e.id, c.cell, sum(e.x * c.w) AS dot,
           |    sqrt(sum(c.w * c.w)) AS nc
           |  FROM efb$b e JOIN $cf c USING (i) GROUP BY 1, 2),
           |s_$out AS (SELECT p.id, p.cell, p.dot / (en.nv * p.nc) AS cos
           |  FROM p_$out p JOIN en$b en ON p.id = en.id),
           |$out AS (SELECT id, cell FROM (SELECT *, row_number() OVER
           |    (PARTITION BY id ORDER BY cos DESC, cell ASC) AS rn FROM s_$out)
           |  WHERE rn = 1)""".stripMargin
      def update(b: Int, a: String, prev: String, out: String) =
        s"""${out}_raw AS (SELECT a.cell, e.i, avg(e.x) AS w
           |  FROM $a a JOIN efb$b e ON a.id = e.id GROUP BY 1, 2),
           |$out AS (SELECT p.cell, p.i, coalesce(r.w, p.w) AS w
           |  FROM $prev p LEFT JOIN ${out}_raw r
           |    ON p.cell = r.cell AND p.i = r.i)""".stripMargin
      def block(b: Int): String = {
        val lo = b * 32; val hi = (b + 1) * 32
        s"""efb$b AS (SELECT id, i, x FROM ef WHERE i > $lo AND i <= $hi),
           |c0f$b AS (SELECT cell, i, w FROM c0f WHERE i > $lo AND i <= $hi),
           |en$b AS (SELECT id, sqrt(sum(x*x)) AS nv FROM efb$b GROUP BY id),
           |${assign(b, s"c0f$b", s"a1_$b")},
           |${update(b, s"a1_$b", s"c0f$b", s"c1f$b")},
           |${assign(b, s"c1f$b", s"a2_$b")},
           |cc$b AS (SELECT cell, sum(w*w) AS cc FROM c1f$b GROUP BY cell),
           |xx$b AS (SELECT id, sum(x*x) AS xx FROM efb$b GROUP BY id),
           |err$b AS (SELECT $b AS block, a.id,
           |    xx.xx - 2e0 * p.dot + cc.cc AS err
           |  FROM a2_$b a
           |  JOIN p_a2_$b p ON a.id = p.id AND a.cell = p.cell
           |  JOIN xx$b xx ON a.id = xx.id
           |  JOIN cc$b cc ON a.cell = cc.cell)""".stripMargin
      }
      s"""WITH e AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         |dims AS (SELECT unnest(range(1, 65)) AS i),
         |c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cell, vec
         |  FROM (SELECT id, vec FROM e ORDER BY id LIMIT 4) t),
         |c0f AS (SELECT cell, i, vec[i]::DOUBLE AS w FROM c0, dims),
         |ef AS (SELECT id, i, vec[i]::DOUBLE AS x FROM e, dims),
         |${block(0)},
         |${block(1)}
         |SELECT block, count(*)::BIGINT AS n, avg(err)::REAL AS mse
         |FROM (SELECT * FROM err0 UNION ALL SELECT * FROM err1)
         |GROUP BY block ORDER BY block""".stripMargin
    },

    // IVF → PQ-ADC → exact re-rank: codebooks re-derived with the q196
    // kmeans chain (1 iter, 2 blocks of 32, k=4); a2_$b doubles as each
    // vector's PQ code; the ADC LUT dots sum in dim order (ordered list
    // arithmetic) to mirror the engine's array fold
    "q212_pq_rerank" -> {
      def assign(b: Int, cf: String, out: String) =
        s"""p_$out AS (SELECT e.id, c.cell, sum(e.x * c.w) AS dot,
           |    sqrt(sum(c.w * c.w)) AS nc
           |  FROM efb$b e JOIN $cf c USING (i) GROUP BY 1, 2),
           |s_$out AS (SELECT p.id, p.cell, p.dot / (en.nv * p.nc) AS cos
           |  FROM p_$out p JOIN en$b en ON p.id = en.id),
           |$out AS (SELECT id, cell FROM (SELECT *, row_number() OVER
           |    (PARTITION BY id ORDER BY cos DESC, cell ASC) AS rn FROM s_$out)
           |  WHERE rn = 1)""".stripMargin
      def update(b: Int, a: String, prev: String, out: String) =
        s"""${out}_raw AS (SELECT a.cell, e.i, avg(e.x) AS w
           |  FROM $a a JOIN efb$b e ON a.id = e.id GROUP BY 1, 2),
           |$out AS (SELECT p.cell, p.i, coalesce(r.w, p.w) AS w
           |  FROM $prev p LEFT JOIN ${out}_raw r
           |    ON p.cell = r.cell AND p.i = r.i)""".stripMargin
      def blockCodes(b: Int): String = {
        val lo = b * 32; val hi = (b + 1) * 32
        s"""efb$b AS (SELECT id, i, x FROM ef WHERE i > $lo AND i <= $hi),
           |c0f$b AS (SELECT cell, i, w FROM c0f WHERE i > $lo AND i <= $hi),
           |en$b AS (SELECT id, sqrt(sum(x*x)) AS nv FROM efb$b GROUP BY id),
           |${assign(b, s"c0f$b", s"a1_$b")},
           |${update(b, s"a1_$b", s"c0f$b", s"c1f$b")},
           |${assign(b, s"c1f$b", s"a2_$b")},
           |cw$b AS (SELECT cell, list(w ORDER BY i) AS warr
           |  FROM c1f$b GROUP BY cell),
           |lut$b AS (SELECT q.id AS qid, c.cell AS code,
           |    list_sum(list_transform(range(1, 33),
           |      j -> q.vec[j + $lo]::DOUBLE * c.warr[j])) AS d
           |  FROM e q CROSS JOIN cw$b c)""".stripMargin
      }
      s"""WITH e AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         |dims AS (SELECT unnest(range(1, 65)) AS i),
         |c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cell, vec
         |  FROM (SELECT id, vec FROM e ORDER BY id LIMIT 4) t),
         |c0f AS (SELECT cell, i, vec[i]::DOUBLE AS w FROM c0, dims),
         |ef AS (SELECT id, i, vec[i]::DOUBLE AS x FROM e, dims),
         |${blockCodes(0)},
         |${blockCodes(1)},
         |cents AS (SELECT id AS cent_id, vec AS cvec
         |  FROM e ORDER BY id LIMIT 16),
         |av AS (SELECT e.id, e.vec, c.cent_id,
         |    ${cosSql("e.vec", "c.cvec")} AS cos_c
         |  FROM e CROSS JOIN cents c),
         |assigned AS (SELECT id, cent_id AS cell FROM (
         |   SELECT *, row_number() OVER
         |     (PARTITION BY id ORDER BY cos_c DESC, cent_id ASC) AS r FROM av) t
         |  WHERE r = 1),
         |probes AS (SELECT id AS query_id, cent_id AS cell FROM (
         |   SELECT *, row_number() OVER
         |     (PARTITION BY id ORDER BY cos_c DESC, cent_id ASC) AS r FROM av) t
         |  WHERE r <= 2),
         |cand AS (SELECT p.query_id, a.id AS nid
         |  FROM probes p JOIN assigned a ON a.cell = p.cell
         |    AND a.id <> p.query_id),
         |scored AS (SELECT c.query_id, c.nid, l0.d + l1.d AS adc
         |  FROM cand c
         |  JOIN a2_0 k0 ON k0.id = c.nid
         |  JOIN lut0 l0 ON l0.qid = c.query_id AND l0.code = k0.cell
         |  JOIN a2_1 k1 ON k1.id = c.nid
         |  JOIN lut1 l1 ON l1.qid = c.query_id AND l1.code = k1.cell),
         |short AS (SELECT query_id, nid FROM (SELECT *, row_number() OVER
         |    (PARTITION BY query_id ORDER BY adc DESC, nid ASC) AS rs
         |  FROM scored) WHERE rs <= 8),
         |rr AS (SELECT s.query_id, s.nid AS neighbor_id,
         |    ${cosSql("qe.vec", "ne.vec")} AS cos
         |  FROM short s JOIN e qe ON qe.id = s.query_id
         |    JOIN e ne ON ne.id = s.nid),
         |ranked AS (SELECT *, row_number() OVER
         |   (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM rr)
         |SELECT query_id, neighbor_id, cos, rank FROM ranked
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
    },

    // same distinct-value rank sums, tie correction, and A&S tail
    "q194_mann_whitney" -> {
      val sig2 = "(na*nb/1.2e1) * ((na+nb+1e0) - ties/((na+nb)*(na+nb-1e0)))"
      s"""WITH v AS (SELECT user_id % 2 = 0 AS f, value AS v FROM events
         |  WHERE value IS NOT NULL AND user_id IS NOT NULL),
         |g AS (SELECT v,
         |    sum(CASE WHEN f THEN 1 ELSE 0 END)::DOUBLE AS a,
         |    sum(CASE WHEN NOT f THEN 1 ELSE 0 END)::DOUBLE AS b
         |  FROM v GROUP BY v),
         |c AS (SELECT *, coalesce(sum(b) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS cumb FROM g),
         |s AS (SELECT sum(a) AS na, sum(b) AS nb,
         |    sum(a * (cumb + 5e-1 * b)) AS u,
         |    sum((a+b)*(a+b)*(a+b) - (a+b)) AS ties FROM c),
         |z0 AS (SELECT na, nb, u,
         |    CASE WHEN na > 0 AND nb > 0 AND $sig2 > 0e0
         |      THEN (u - na*nb/2e0) / sqrt($sig2) END AS z FROM s),
         |x0 AS (SELECT *, abs(z)/sqrt(2e0) AS x FROM z0)
         |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, u::REAL AS u,
         |  z::REAL AS z,
         |  (CASE WHEN z IS NOT NULL THEN ${erfcSql("x")} END)::REAL AS p
         |FROM x0""".stripMargin
    },

    // same per-category conditional counts and Wilson-Hilferty tail
    "q195_chisq_gof" -> {
      val cats = Seq("view", "click", "purchase", "signup", "error")
      val obs = cats.zipWithIndex.map { case (c, i) =>
        s"sum(CASE WHEN event_type = '$c' THEN 1 ELSE 0 END)::DOUBLE AS o$i"
      }.mkString(",\n  ")
      val chi = cats.indices
        .map(i => s"(o$i - 2e-1*nd)*(o$i - 2e-1*nd)/(2e-1*nd)")
        .mkString(" + ")
      s"""WITH o AS (SELECT
         |  sum(CASE WHEN event_type NOT IN
         |    (${cats.map(c => s"'$c'").mkString(", ")})
         |    THEN 1 ELSE 0 END)::BIGINT AS other,
         |  $obs
         |  FROM events WHERE event_type IS NOT NULL),
         |n0 AS (SELECT *, o0+o1+o2+o3+o4 AS nd FROM o),
         |c AS (SELECT *, $chi AS chi2 FROM n0),
         |w AS (SELECT *, (pow(chi2/4e0, 1e0/3e0) -
         |    (1e0 - 2e0/(9e0*4e0))) / sqrt(2e0/(9e0*4e0)) AS wh FROM c),
         |x1 AS (SELECT *, wh/sqrt(2e0) AS xp, -wh/sqrt(2e0) AS xn FROM w)
         |SELECT nd::BIGINT AS n, other AS n_other,
         |  (CASE WHEN nd > 0 THEN chi2 END)::REAL AS chi2, 4 AS df,
         |  (CASE WHEN nd > 0 THEN
         |    CASE WHEN wh >= 0e0 THEN ${erfcSql("xp")} / 2e0
         |    ELSE 1e0 - ${erfcSql("xn")} / 2e0 END
         |  END)::REAL AS p
         |FROM x1""".stripMargin
    },

    // same union + last-ignore-nulls carry with the (ts, side, id) tie
    "q192_attribution" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
        |    event_type, value FROM events),
        |u AS (SELECT user_id, tus, 0 AS side, event_id AS tb,
        |    event_type AS touch, NULL::DOUBLE AS pv
        |  FROM e WHERE event_type <> 'purchase'
        |  UNION ALL SELECT user_id, tus, 1, event_id, NULL, value
        |  FROM e WHERE event_type = 'purchase'),
        |w AS (SELECT *, last_value(touch IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY tus, side, tb
        |    ROWS UNBOUNDED PRECEDING) AS lt FROM u)
        |SELECT coalesce(lt, '(none)') AS touch,
        |  count(*)::BIGINT AS n_conversions, sum(pv)::REAL AS value_sum
        |FROM w WHERE side = 1 GROUP BY 1 ORDER BY 1""".stripMargin,

    // same clamp-into-top-bin binning and spine
    "q193_histogram" ->
      """WITH v AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |e AS (SELECT min(v) AS mn, max(v) AS mx FROM v),
        |c AS (SELECT CAST(CASE WHEN mx > mn THEN
        |      least(greatest(floor((v - mn) / (mx - mn) * 20), 0), 19)
        |    ELSE 0 END AS BIGINT) AS bin, count(*)::BIGINT AS n
        |  FROM v CROSS JOIN e GROUP BY 1),
        |s AS (SELECT unnest(range(20)) AS bin)
        |SELECT s.bin, (mn + (mx - mn) / 20 * s.bin)::REAL AS lo,
        |  (mn + (mx - mn) / 20 * (s.bin + 1))::REAL AS hi,
        |  coalesce(n, 0)::BIGINT AS n
        |FROM s CROSS JOIN e LEFT JOIN c ON s.bin = c.bin
        |ORDER BY s.bin""".stripMargin,

    // same latest-change-wins + full outer join algebra
    "q188_cdc_merge" ->
      """WITH e AS (SELECT user_id, event_id, value, event_type,
        |    epoch_us(ts) AS tus FROM events),
        |base AS (SELECT user_id, value FROM (
        |    SELECT user_id, value, row_number() OVER (PARTITION BY user_id
        |      ORDER BY tus DESC, event_id DESC) AS rn
        |    FROM e WHERE event_id % 2 = 0) WHERE rn = 1),
        |ch AS (SELECT user_id,
        |    CASE WHEN event_type = 'error' THEN 'D'
        |         WHEN event_type = 'signup' THEN 'I' ELSE 'U' END AS op,
        |    value, tus, event_id FROM e WHERE event_id % 2 = 1),
        |latest AS (SELECT user_id, op, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY tus DESC, event_id DESC) AS rn FROM ch)
        |  WHERE rn = 1)
        |SELECT coalesce(b.user_id, l.user_id) AS user_id,
        |  CASE WHEN l.user_id IS NOT NULL THEN l.value ELSE b.value END
        |    AS value
        |FROM base b FULL OUTER JOIN latest l ON b.user_id = l.user_id
        |WHERE l.op IS NULL OR l.op <> 'D'
        |ORDER BY user_id""".stripMargin,

    // same lead()-window half-open intervals
    "q189_scd2_intervals" ->
      """WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS tus
        |  FROM events WHERE event_type = 'purchase')
        |SELECT user_id, value, tus AS valid_from,
        |  lead(tus) OVER w AS valid_to,
        |  (lead(tus) OVER w IS NULL) AS is_current
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
        |ORDER BY user_id, valid_from, valid_to NULLS LAST""".stripMargin,

    // same one-pass moment algebra per pair, complete-case filter
    "q190_corr_matrix" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for (i <- cols.indices; j <- i until cols.size) yield {
        val (a, b) = (cols(i), cols(j))
        s"""SELECT '$a' AS col1, '$b' AS col2, n,
           |  (CASE WHEN n * p_${i}_$i - s_$i * s_$i > 0e0
           |     AND n * p_${j}_$j - s_$j * s_$j > 0e0
           |   THEN (n * p_${i}_$j - s_$i * s_$j) /
           |     sqrt((n * p_${i}_$i - s_$i * s_$i) *
           |          (n * p_${j}_$j - s_$j * s_$j)) END)::REAL AS corr
           |FROM m""".stripMargin
      }
      val sums = cols.indices.map(i =>
        s"sum(CAST(${cols(i)} AS DOUBLE)) AS s_$i").mkString(",\n  ")
      val prods = (for (i <- cols.indices; j <- i until cols.size) yield
        s"sum(CAST(${cols(i)} AS DOUBLE) * CAST(${cols(j)} AS DOUBLE)) AS p_${i}_$j")
        .mkString(",\n  ")
      s"""WITH m AS (SELECT count(*)::DOUBLE AS n,
         |  $sums,
         |  $prods
         |  FROM lineitem
         |  WHERE ${cols.map(c => s"$c IS NOT NULL").mkString(" AND ")})
         |SELECT col1, col2, n::BIGINT AS n, corr FROM (
         |${pairs.mkString("\nUNION ALL\n")})
         |ORDER BY col1, col2""".stripMargin
    },

    // same hour-of-day profile algebra, double products
    "q191_seasonal_residuals" ->
      """WITH s AS (SELECT event_type,
        |    epoch_us(ts) // 3600000000 AS period, count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT *, period % 24 AS phase FROM s),
        |prof AS (SELECT event_type, phase, count(*)::BIGINT AS m,
        |    sum(n)::BIGINT AS sm, sum(n::DOUBLE * n) AS ss
        |  FROM sp GROUP BY 1, 2),
        |p2 AS (SELECT event_type, phase, m,
        |    sm::DOUBLE / m AS phase_mean,
        |    CASE WHEN m >= 2
        |      THEN (ss - sm::DOUBLE * sm / m) / (m - 1) END AS var
        |  FROM prof)
        |SELECT sp.event_type, sp.period, sp.phase, sp.n,
        |  phase_mean::REAL AS phase_mean,
        |  (CASE WHEN var > 0e0 THEN (sp.n - phase_mean) / sqrt(var) END)
        |    ::REAL AS z
        |FROM sp JOIN p2 ON sp.event_type = p2.event_type
        |  AND sp.phase = p2.phase
        |ORDER BY sp.event_type, sp.period""".stripMargin,

    // same one-pass conditional counts; violation = NOT satisfied
    // (false or null)
    "q186_expectations" ->
      """WITH n AS (SELECT count(*)::BIGINT AS n_rows FROM lineitem),
        |v AS (
        |  SELECT 'qty_in_range' AS rule, count(*) FILTER (
        |    NOT coalesce(l_quantity BETWEEN 1 AND 50, FALSE))::BIGINT AS nv
        |  FROM lineitem
        |  UNION ALL SELECT 'price_positive', count(*) FILTER (
        |    NOT coalesce(l_extendedprice > 0, FALSE)) FROM lineitem
        |  UNION ALL SELECT 'discount_low', count(*) FILTER (
        |    NOT coalesce(l_discount <= 0.05, FALSE)) FROM lineitem
        |  UNION ALL SELECT 'flag_known', count(*) FILTER (
        |    NOT coalesce(l_returnflag IN ('A', 'N', 'R'), FALSE)) FROM lineitem
        |  UNION ALL SELECT 'tax_nonneg', count(*) FILTER (
        |    NOT coalesce(l_tax >= 0, FALSE)) FROM lineitem)
        |SELECT rule, n_rows, nv AS n_violations,
        |  (CASE WHEN n_rows > 0 THEN nv::DOUBLE / n_rows ELSE 0e0 END)
        |    AS violation_rate
        |FROM v CROSS JOIN n ORDER BY rule""".stripMargin,

    // same crosstab as conditional counts
    "q187_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click')::BIGINT AS click,
        |  count(*) FILTER (event_type = 'error')::BIGINT AS error,
        |  count(*) FILTER (event_type = 'purchase')::BIGINT AS purchase,
        |  count(*) FILTER (event_type = 'signup')::BIGINT AS signup,
        |  count(*) FILTER (event_type = 'view')::BIGINT AS view,
        |  count(*) FILTER (event_type IN ('click', 'error', 'purchase',
        |    'signup', 'view'))::BIGINT AS total
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // salting is results-invariant: the oracle is the plain join
    "q183_skew_join" ->
      """SELECT p_brand, count(*)::BIGINT AS n,
        |  sum(l_extendedprice * (1e0 - l_discount))::REAL AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // debounce = q54 session heads: keep where no sub-gap predecessor
    "q184_debounce" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS tus FROM events),
        |g AS (SELECT *, lag(tus) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id) AS prev FROM e)
        |SELECT user_id, event_id, tus, event_type FROM g
        |WHERE prev IS NULL OR tus - prev > 1800000000
        |ORDER BY user_id, tus, event_id""".stripMargin,

    // same NTILE cut, same 0.5-smoothed log-odds algebra
    "q185_woe_bins" ->
      """WITH r AS (SELECT ntile(10) OVER (ORDER BY CAST(n_chars AS DOUBLE)
        |      ASC, doc_id ASC) AS bin,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
        |b AS (SELECT bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
        |    (count(*) - sum(y))::BIGINT AS n_neg
        |  FROM r GROUP BY bin),
        |t AS (SELECT sum(n_pos)::DOUBLE AS tp, sum(n_neg)::DOUBLE AS tn
        |  FROM b),
        |w AS (SELECT bin, n, n_pos, n_neg,
        |    (n_pos + 5e-1) / (tp + 5e-1 * 10) AS pr,
        |    (n_neg + 5e-1) / (tn + 5e-1 * 10) AS nr
        |  FROM b CROSS JOIN t)
        |SELECT bin, n, n_pos, n_neg, ln(pr / nr)::REAL AS woe,
        |  ((pr - nr) * ln(pr / nr))::REAL AS iv_contrib
        |FROM w ORDER BY bin""".stripMargin,

    // forward fill: same per-key grid, same (ts, id) last-observation
    "q180_resample_fill" ->
      """WITH e AS (SELECT user_id AS key, epoch_us(ts) AS tus, event_id,
        |    value FROM events),
        |b AS (SELECT key, tus // 86400000000 AS period, tus, event_id,
        |    value FROM e),
        |obs AS (SELECT key, period, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY key, period
        |      ORDER BY tus DESC, event_id DESC) AS rn FROM b)
        |  WHERE rn = 1),
        |span AS (SELECT key, min(period) AS p0, max(period) AS p1
        |  FROM b GROUP BY key),
        |grid AS (SELECT key, unnest(generate_series(p0, p1)) AS period
        |  FROM span),
        |j AS (SELECT g.key, g.period, obs.value AS v FROM grid g
        |  LEFT JOIN obs ON g.key = obs.key AND g.period = obs.period)
        |SELECT key, period,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY key
        |    ORDER BY period ROWS UNBOUNDED PRECEDING) AS value,
        |  v IS NOT NULL AS is_observed
        |FROM j ORDER BY key, period""".stripMargin,

    // grouped two-proportion z-tests; double-precision constants are
    // e-notation so both engines bind the identical IEEE doubles
    "q181_prop_ztest" ->
      s"""WITH $PropZCtes
         |SELECT event_type, dow, n_a, s_a, n_b, s_b,
         |  p_a::REAL AS p_a, p_b::REAL AS p_b, z::REAL AS z, p::REAL AS p
         |FROM pz ORDER BY event_type, dow""".stripMargin,

    // BH step-up over the same test battery: ascending-p rank, suffix
    // min via the reverse-ordered running min, capped at 1
    "q182_bh_adjust" ->
      s"""WITH $PropZCtes,
         |tests AS (SELECT event_type || '|' || dow::VARCHAR AS id, p
         |  FROM pz WHERE p IS NOT NULL),
         |r1 AS (SELECT id, p,
         |    row_number() OVER (ORDER BY p ASC, id ASC) AS rank,
         |    count(*) OVER ()::BIGINT AS m FROM tests),
         |r2 AS (SELECT *, p * m / rank AS raw FROM r1),
         |r3 AS (SELECT *, least(min(raw) OVER (ORDER BY rank DESC
         |    ROWS UNBOUNDED PRECEDING), 1e0) AS p_adj FROM r2)
         |SELECT id, p::REAL AS p, rank, p_adj::REAL AS p_adj
         |FROM r3 ORDER BY rank""".stripMargin,

    // same NTILE cut (score desc, id tiebreak), same cumulative algebra
    "q179_lift_curve" ->
      """WITH r AS (SELECT ntile(10) OVER (ORDER BY CAST(n_chars AS DOUBLE)
        |      DESC, doc_id) AS bucket,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
        |b AS (SELECT bucket, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos
        |  FROM r GROUP BY bucket),
        |c AS (SELECT *, sum(n) OVER w::BIGINT AS cum_n,
        |    sum(n_pos) OVER w::BIGINT AS cum_pos
        |  FROM b WINDOW w AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING)),
        |t AS (SELECT sum(n)::DOUBLE AS tn, sum(n_pos)::DOUBLE AS tp FROM b)
        |SELECT bucket, n, n_pos, cum_n, cum_pos,
        |  (CASE WHEN tp > 0 THEN cum_pos / tp END)::REAL AS gain,
        |  (CASE WHEN tp > 0 THEN (cum_pos / tp) / (cum_n / tn) END)::REAL
        |    AS lift
        |FROM c CROSS JOIN t ORDER BY bucket""".stripMargin,

    // bucketed lift: decile cuts from the shared histogram-CDF algebra,
    // desc bucket = 10 − |{cuts below s}|, dense spine, same cum algebra
    "q197_lift_curve_bucketed" ->
      s"""WITH $DecileCutCtes,
         |r AS (SELECT 10 - (SELECT count(*) FROM cuts WHERE v.s > cuts.cut)
         |    AS bucket, v.y FROM v),
         |b AS (SELECT bucket, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos
         |  FROM r GROUP BY bucket),
         |spine AS (SELECT unnest(range(1, 11)) AS bucket),
         |b2 AS (SELECT sp.bucket, COALESCE(b.n, 0)::BIGINT AS n,
         |    COALESCE(b.n_pos, 0)::BIGINT AS n_pos
         |  FROM spine sp LEFT JOIN b ON sp.bucket = b.bucket),
         |c AS (SELECT *, sum(n) OVER w::BIGINT AS cum_n,
         |    sum(n_pos) OVER w::BIGINT AS cum_pos
         |  FROM b2 WINDOW w AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING)),
         |t AS (SELECT sum(n)::DOUBLE AS tn, sum(n_pos)::DOUBLE AS tp FROM b2)
         |SELECT bucket::INTEGER AS bucket, n, n_pos, cum_n, cum_pos,
         |  (CASE WHEN tp > 0 THEN cum_pos / tp END)::REAL AS gain,
         |  (CASE WHEN tp > 0 AND cum_n > 0
         |    THEN (cum_pos / tp) / (cum_n / tn) END)::REAL AS lift
         |FROM c CROSS JOIN t ORDER BY bucket""".stripMargin,

    // bucketed WoE: same decile cuts, asc bin = 1 + |{cuts below s}|,
    // dense spine, same 0.5-smoothed log-odds algebra as q185
    "q198_woe_bins_bucketed" ->
      s"""WITH $DecileCutCtes,
         |r AS (SELECT 1 + (SELECT count(*) FROM cuts WHERE v.s > cuts.cut)
         |    AS bin, v.y FROM v),
         |b AS (SELECT bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos
         |  FROM r GROUP BY bin),
         |spine AS (SELECT unnest(range(1, 11)) AS bin),
         |b2 AS (SELECT sp.bin, COALESCE(b.n, 0)::BIGINT AS n,
         |    COALESCE(b.n_pos, 0)::BIGINT AS n_pos,
         |    (COALESCE(b.n, 0) - COALESCE(b.n_pos, 0))::BIGINT AS n_neg
         |  FROM spine sp LEFT JOIN b ON sp.bin = b.bin),
         |t AS (SELECT sum(n_pos)::DOUBLE AS tp, sum(n_neg)::DOUBLE AS tn
         |  FROM b2),
         |w AS (SELECT bin, n, n_pos, n_neg,
         |    (n_pos + 5e-1) / (tp + 5e-1 * 10) AS pr,
         |    (n_neg + 5e-1) / (tn + 5e-1 * 10) AS nr
         |  FROM b2 CROSS JOIN t)
         |SELECT bin::INTEGER AS bin, n, n_pos, n_neg, ln(pr / nr)::REAL AS woe,
         |  ((pr - nr) * ln(pr / nr))::REAL AS iv_contrib
         |FROM w ORDER BY bin""".stripMargin,

    // recursive transitive closure over the MINHASH-LSH verified pair
    // graph (q33's candidate algebra feeding q172's recursive CC)
    "q201_cc_lsh_pairs" ->
      s"""WITH $ShingleSets,
         |$MinhashTable,
         |hx AS (SELECT id, ${hash32("shingle")} % ${Dedup.MinhashP} AS x FROM sh),
         |mh AS (SELECT id, i, min((x * a + b) % ${Dedup.MinhashP}) AS h
         |  FROM hx CROSS JOIN hashes GROUP BY id, i),
         |bk AS (SELECT id, i // ${Dedup.BandRows} AS band,
         |         string_agg(h::VARCHAR, ',' ORDER BY i) AS bucket
         |       FROM mh GROUP BY id, i // ${Dedup.BandRows}),
         |cand AS (SELECT DISTINCT a.id id1, b.id id2
         |  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
         |    AND a.id < b.id),
         |sizes AS (SELECT id, count(*) sz FROM sh GROUP BY id),
         |common AS (SELECT c.id1, c.id2, count(*) AS common
         |  FROM cand c JOIN sh a ON a.id = c.id1 JOIN sh b ON b.id = c.id2
         |    AND a.shingle = b.shingle
         |  GROUP BY 1, 2),
         |pairs AS (SELECT id1, id2 FROM common
         |  JOIN sizes s1 ON common.id1 = s1.id
         |  JOIN sizes s2 ON common.id2 = s2.id
         |  WHERE common::DOUBLE / (s1.sz + s2.sz - common) >= 0.5),
         |edges AS (SELECT id1 a, id2 b FROM pairs
         |  UNION ALL SELECT id2, id1 FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |comp AS (
         |  WITH RECURSIVE reach(id, label) AS (
         |    SELECT id, id FROM nodes
         |    UNION
         |    SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.id
         |  )
         |  SELECT id, min(label) AS component FROM reach GROUP BY id)
         |SELECT id AS node, component FROM comp ORDER BY node""".stripMargin,

    // hybrid retrieval: q117's BM25 (same terms) and q35's cosine (query =
    // vec_id 0) each cut to 30 candidates (bm25/cos DESC, id tiebreak),
    // then reciprocal-rank fusion 1/(60+rank) over the full-outer id match
    "q215_hybrid_rrf" ->
      s"""WITH tk AS (SELECT doc_id AS id, ${toks("text")} AS t FROM documents),
         |l AS (SELECT id, len(t)::DOUBLE AS dl FROM tk),
         |st AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM l),
         |tok AS (SELECT id, unnest(t) AS token FROM tk),
         |p AS (SELECT id, token, count(*)::DOUBLE AS tf FROM tok
         |  WHERE token IN ('hash', 'join', 'stream', 'vector') GROUP BY 1, 2),
         |dfc AS (SELECT token, count(*)::DOUBLE AS df FROM p GROUP BY 1),
         |sc AS (SELECT p.id,
         |    sum(ln((st.n_docs - dfc.df + 0.5)/(dfc.df + 0.5) + 1.0)
         |        * p.tf * (1.2 + 1.0)
         |        / (p.tf + 1.2*(1.0 - 0.75 + 0.75*l.dl/st.avgdl))) AS bm25
         |  FROM p JOIN dfc USING (token) JOIN l ON p.id = l.id CROSS JOIN st
         |  GROUP BY p.id),
         |lex AS (SELECT id, row_number() OVER (ORDER BY bm25 DESC, id) AS lex_rank
         |  FROM (SELECT * FROM sc ORDER BY bm25 DESC, id LIMIT 30)),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |cs AS (SELECT e.vec_id AS id,
         |    ${cosSql("e.embedding", "q.qv")} AS cos
         |  FROM embeddings e CROSS JOIN q
         |  WHERE list_sum(list_transform(range(1, len(e.embedding)+1),
         |    i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)) > 0),
         |sem AS (SELECT id, row_number() OVER (ORDER BY cos DESC, id) AS sem_rank
         |  FROM (SELECT * FROM cs ORDER BY cos DESC, id LIMIT 30)),
         |f AS (SELECT coalesce(lex.id, sem.id) AS id, lex_rank, sem_rank,
         |    coalesce(1.0::DOUBLE/(60 + lex_rank), 0.0)
         |      + coalesce(1.0::DOUBLE/(60 + sem_rank), 0.0) AS rrf
         |  FROM lex FULL OUTER JOIN sem ON lex.id = sem.id),
         |top AS (SELECT * FROM f ORDER BY rrf DESC, id LIMIT 20)
         |SELECT id, lex_rank, sem_rank, rrf::REAL AS rrf FROM top
         |ORDER BY id""".stripMargin,

    // simplified centroid silhouette in cosine space: centroids = the 4
    // lowest-id vectors; per point the two best centroid cosines m1 >= m2
    // give s = (m1-m2)/(1-m2) (0 when m2 = 1), averaged per argmax cell
    // (cos DESC, centroid-id ASC tie rule = the engine's argmax)
    "q216_silhouette" ->
      s"""WITH c AS (SELECT vec_id AS j, embedding AS cv FROM embeddings
         |  WHERE vec_id < 4),
         |e AS (SELECT vec_id AS id, embedding AS v FROM embeddings
         |  WHERE list_sum(list_transform(range(1, len(embedding)+1),
         |    i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)) > 0),
         |cs AS (SELECT e.id, c.j, ${cosSql("e.v", "c.cv")} AS cos
         |  FROM e CROSS JOIN c),
         |r AS (SELECT id, j, cos, row_number() OVER
         |    (PARTITION BY id ORDER BY cos DESC, j ASC) AS rk FROM cs),
         |m AS (SELECT id,
         |    max(CASE WHEN rk = 1 THEN cos END) AS m1,
         |    max(CASE WHEN rk = 2 THEN cos END) AS m2,
         |    max(CASE WHEN rk = 1 THEN j END) AS cell
         |  FROM r GROUP BY id),
         |s AS (SELECT cell, CASE WHEN m2 >= 1.0 THEN 0.0
         |    ELSE (m1 - m2) / (1.0 - m2) END AS sil FROM m)
         |SELECT cell, count(*) AS n, avg(sil)::REAL AS mean_sil FROM s
         |GROUP BY cell ORDER BY cell""".stripMargin,

    // PRF expansion: q117's BM25 → 5 feedback docs → 3 most frequent new
    // feedback tokens (count DESC, token ASC) → second BM25 pass over the
    // expanded 7-term set
    "q219_prf_expansion" ->
      s"""WITH tk AS (SELECT doc_id AS id, ${toks("text")} AS t FROM documents),
         |l AS (SELECT id, len(t)::DOUBLE AS dl FROM tk),
         |st AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM l),
         |tok AS (SELECT id, unnest(t) AS token FROM tk),
         |p1 AS (SELECT id, token, count(*)::DOUBLE AS tf FROM tok
         |  WHERE token IN ('hash', 'join', 'stream', 'vector') GROUP BY 1, 2),
         |dfc1 AS (SELECT token, count(*)::DOUBLE AS df FROM p1 GROUP BY 1),
         |sc1 AS (SELECT p1.id,
         |    sum(ln((st.n_docs - dfc1.df + 0.5)/(dfc1.df + 0.5) + 1.0)
         |        * p1.tf * (1.2 + 1.0)
         |        / (p1.tf + 1.2*(1.0 - 0.75 + 0.75*l.dl/st.avgdl))) AS bm25
         |  FROM p1 JOIN dfc1 USING (token) JOIN l ON p1.id = l.id CROSS JOIN st
         |  GROUP BY p1.id),
         |fb AS (SELECT id FROM sc1 ORDER BY bm25 DESC, id LIMIT 5),
         |ex AS (SELECT token FROM (
         |  SELECT tok.token, count(*) AS c FROM tok JOIN fb USING (id)
         |  WHERE tok.token NOT IN ('hash', 'join', 'stream', 'vector')
         |  GROUP BY tok.token ORDER BY c DESC, token LIMIT 3)),
         |t2 AS (SELECT token FROM ex UNION ALL
         |  SELECT unnest(['hash', 'join', 'stream', 'vector'])),
         |p2 AS (SELECT id, token, count(*)::DOUBLE AS tf FROM tok
         |  WHERE token IN (SELECT token FROM t2) GROUP BY 1, 2),
         |dfc2 AS (SELECT token, count(*)::DOUBLE AS df FROM p2 GROUP BY 1),
         |sc2 AS (SELECT p2.id,
         |    sum(ln((st.n_docs - dfc2.df + 0.5)/(dfc2.df + 0.5) + 1.0)
         |        * p2.tf * (1.2 + 1.0)
         |        / (p2.tf + 1.2*(1.0 - 0.75 + 0.75*l.dl/st.avgdl))) AS bm25,
         |    count(*) AS n_matched
         |  FROM p2 JOIN dfc2 USING (token) JOIN l ON p2.id = l.id CROSS JOIN st
         |  GROUP BY p2.id),
         |top AS (SELECT * FROM sc2 ORDER BY bm25 DESC, id LIMIT 15)
         |SELECT id, bm25::REAL AS bm25, n_matched FROM top
         |ORDER BY id""".stripMargin,

    // greedy MMR replay as a recursive CTE: seed = argmax rel, then per
    // step the lateral argmax of 0.7·rel − 0.3·max-cos-to-selected over
    // the remaining shortlist (ties → lowest id, the engine's rule);
    // pairwise cosines precomputed over the 10-candidate shortlist
    "q218_mmr_rerank" ->
      s"""WITH RECURSIVE
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |cand0 AS (SELECT e.vec_id AS id,
         |    ${cosSql("e.embedding", "q.qv")} AS rel, e.embedding AS v
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
         |cand AS (SELECT * FROM cand0 ORDER BY rel DESC, id LIMIT 10),
         |pairs AS (SELECT a.id AS ia, b.id AS ib, ${cosSql("a.v", "b.v")} AS cos
         |  FROM cand a JOIN cand b ON a.id <> b.id),
         |sel(step, id, mmr, rel, ids) AS (
         |  SELECT 1, id, 0.7::DOUBLE * rel, rel, [id]
         |  FROM (SELECT * FROM cand ORDER BY rel DESC, id LIMIT 1)
         |  UNION ALL
         |  SELECT sel.step + 1, t.id, t.mmr, t.rel, list_append(sel.ids, t.id)
         |  FROM sel, LATERAL (
         |    SELECT c.id, 0.7::DOUBLE * c.rel
         |        - (1.0::DOUBLE - 0.7::DOUBLE) * (
         |          SELECT max(p.cos) FROM pairs p
         |          WHERE p.ia = c.id AND list_contains(sel.ids, p.ib)) AS mmr,
         |      c.rel
         |    FROM cand c WHERE NOT list_contains(sel.ids, c.id)
         |    ORDER BY mmr DESC, c.id LIMIT 1) t
         |  WHERE sel.step < 5)
         |SELECT id AS vec_id, step AS mmr_rank, mmr::REAL AS mmr,
         |  rel::REAL AS rel
         |FROM sel ORDER BY mmr_rank""".stripMargin,

    // retrieval eval over the q203 brute-kNN algebra (top 10, relevance =
    // label agreement): NDCG@5 / MRR@5 / pool recall@5 per query. The
    // log2 discount and ideal-DCG constants are the ENGINE's own
    // driver-folded doubles (Eval.ndcgTables) interpolated as literals —
    // bit parity by construction, no libm log in either plan
    "q217_ranking_metrics" -> {
      val (w, ideal) = graft.reg.Eval.ndcgTables(5)
      val disc = (1 to 5).map(i => s"WHEN $i THEN ${w(i - 1)}::DOUBLE")
        .mkString(" ")
      val idcg = (s"WHEN n_rel >= 5 THEN dcg / ${ideal(4)}::DOUBLE" +:
        (1 to 4).map(m => s"WHEN n_rel = $m THEN dcg / ${ideal(m - 1)}::DOUBLE"))
        .mkString(" ")
      s"""WITH scored AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    a.label AS ql, b.label AS nl,
         |    ${cosSql("a.embedding", "b.embedding")} AS cos
         |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
         |ranked AS (SELECT query_id,
         |    CASE WHEN ql = nl THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS rel,
         |    row_number() OVER
         |      (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored),
         |lst AS (SELECT * FROM ranked WHERE rank <= 10),
         |agg AS (SELECT query_id,
         |    sum(rel * CASE rank $disc ELSE 0.0::DOUBLE END) AS dcg,
         |    sum(rel) AS n_rel,
         |    sum(CASE WHEN rank <= 5 THEN rel ELSE 0.0::DOUBLE END) AS rk,
         |    min(CASE WHEN rel > 0 AND rank <= 5 THEN rank END) AS fr
         |  FROM lst GROUP BY query_id)
         |SELECT query_id, n_rel::BIGINT AS n_rel,
         |  (CASE $idcg END)::REAL AS ndcg,
         |  coalesce(1.0::DOUBLE / fr, 0.0)::REAL AS mrr,
         |  (CASE WHEN n_rel > 0 THEN rk / n_rel END)::REAL AS recall
         |FROM agg ORDER BY query_id""".stripMargin
    },

    // 2 synchronous LPA rounds over the q201 LSH pair graph: per round,
    // neighbor-label frequencies then the (count DESC, label ASC) mode
    "q214_label_propagation" ->
      s"""WITH $ShingleSets,
         |$MinhashTable,
         |hx AS (SELECT id, ${hash32("shingle")} % ${Dedup.MinhashP} AS x FROM sh),
         |mh AS (SELECT id, i, min((x * a + b) % ${Dedup.MinhashP}) AS h
         |  FROM hx CROSS JOIN hashes GROUP BY id, i),
         |bk AS (SELECT id, i // ${Dedup.BandRows} AS band,
         |         string_agg(h::VARCHAR, ',' ORDER BY i) AS bucket
         |       FROM mh GROUP BY id, i // ${Dedup.BandRows}),
         |cand AS (SELECT DISTINCT a.id id1, b.id id2
         |  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
         |    AND a.id < b.id),
         |sizes AS (SELECT id, count(*) sz FROM sh GROUP BY id),
         |common AS (SELECT c.id1, c.id2, count(*) AS common
         |  FROM cand c JOIN sh a ON a.id = c.id1 JOIN sh b ON b.id = c.id2
         |    AND a.shingle = b.shingle
         |  GROUP BY 1, 2),
         |pairs AS (SELECT id1, id2 FROM common
         |  JOIN sizes s1 ON common.id1 = s1.id
         |  JOIN sizes s2 ON common.id2 = s2.id
         |  WHERE common::DOUBLE / (s1.sz + s2.sz - common) >= 0.5),
         |e AS (SELECT id1 a, id2 b FROM pairs
         |  UNION SELECT id2, id1 FROM pairs),
         |l0 AS (SELECT DISTINCT a AS n, a AS lbl FROM e),
         |f1 AS (SELECT e.a, l.lbl, count(*) AS c
         |  FROM e JOIN l0 l ON l.n = e.b GROUP BY 1, 2),
         |l1 AS (SELECT a AS n, lbl FROM (SELECT *, row_number() OVER
         |    (PARTITION BY a ORDER BY c DESC, lbl ASC) AS rn FROM f1)
         |  WHERE rn = 1),
         |f2 AS (SELECT e.a, l.lbl, count(*) AS c
         |  FROM e JOIN l1 l ON l.n = e.b GROUP BY 1, 2),
         |l2 AS (SELECT a AS n, lbl FROM (SELECT *, row_number() OVER
         |    (PARTITION BY a ORDER BY c DESC, lbl ASC) AS rn FROM f2)
         |  WHERE rn = 1)
         |SELECT n AS node, lbl AS label FROM l2 ORDER BY node""".stripMargin,

    // triangle enumeration over the q201 LSH pair graph: a<b<c triads via
    // the canonical 3-way self-join, then per-vertex counts + clustering
    "q209_triangle_counts" ->
      s"""WITH $ShingleSets,
         |$MinhashTable,
         |hx AS (SELECT id, ${hash32("shingle")} % ${Dedup.MinhashP} AS x FROM sh),
         |mh AS (SELECT id, i, min((x * a + b) % ${Dedup.MinhashP}) AS h
         |  FROM hx CROSS JOIN hashes GROUP BY id, i),
         |bk AS (SELECT id, i // ${Dedup.BandRows} AS band,
         |         string_agg(h::VARCHAR, ',' ORDER BY i) AS bucket
         |       FROM mh GROUP BY id, i // ${Dedup.BandRows}),
         |cand AS (SELECT DISTINCT a.id id1, b.id id2
         |  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
         |    AND a.id < b.id),
         |sizes AS (SELECT id, count(*) sz FROM sh GROUP BY id),
         |common AS (SELECT c.id1, c.id2, count(*) AS common
         |  FROM cand c JOIN sh a ON a.id = c.id1 JOIN sh b ON b.id = c.id2
         |    AND a.shingle = b.shingle
         |  GROUP BY 1, 2),
         |e AS (SELECT id1 u, id2 v FROM common
         |  JOIN sizes s1 ON common.id1 = s1.id
         |  JOIN sizes s2 ON common.id2 = s2.id
         |  WHERE common::DOUBLE / (s1.sz + s2.sz - common) >= 0.5),
         |deg AS (SELECT n, count(*) AS d FROM
         |  (SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY n),
         |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
         |  FROM e e1 JOIN e e2 ON e2.u = e1.v
         |    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
         |pv AS (SELECT n, count(*) AS tc FROM
         |  (SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
         |   UNION ALL SELECT c FROM tri) GROUP BY n)
         |SELECT deg.n AS node, deg.d AS degree,
         |  coalesce(pv.tc, 0)::BIGINT AS triangles,
         |  CASE WHEN deg.d >= 2
         |    THEN coalesce(pv.tc, 0) * 2.0 / (deg.d * (deg.d - 1.0))
         |    ELSE 0.0 END AS clustering
         |FROM deg LEFT JOIN pv ON pv.n = deg.n ORDER BY node""".stripMargin,

    // Laplace-smoothed multinomial NB unrolled: the COALESCE(n,0) form of
    // ln((n+α)/(tot+αV)) makes the unseen-token fallback the same formula
    // as the observed one; argmax = (score DESC, label ASC) row_number —
    // the strict-improvement fold's tie rule; zero-token docs keep the
    // prior-only score via the spine left join
    "q202_nb_classify" ->
      """WITH toks AS (SELECT doc_id, lang,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> len(t) > 0)) AS token
        |  FROM documents),
        |counts AS (SELECT lang AS label, token, count(*)::DOUBLE AS n
        |  FROM toks GROUP BY 1, 2),
        |labtot AS (SELECT label, sum(n) AS tot FROM counts GROUP BY 1),
        |voc AS (SELECT count(DISTINCT token)::DOUBLE AS v FROM counts),
        |priors AS (SELECT lang AS label, count(*)::DOUBLE AS nd
        |  FROM documents GROUP BY 1),
        |ptot AS (SELECT sum(nd) AS ndt FROM priors),
        |doctf AS (SELECT doc_id, token, count(*)::DOUBLE AS tf
        |  FROM toks GROUP BY 1, 2),
        |ll AS (SELECT d.doc_id, p.label,
        |    sum(d.tf * ln((COALESCE(c.n, 0) + 1.0) / (lt.tot + voc.v))) AS s
        |  FROM doctf d
        |  CROSS JOIN priors p
        |  JOIN labtot lt ON lt.label = p.label
        |  CROSS JOIN voc
        |  LEFT JOIN counts c ON c.label = p.label AND c.token = d.token
        |  GROUP BY 1, 2),
        |spine AS (SELECT DISTINCT doc_id FROM documents),
        |sc AS (SELECT s.doc_id, p.label,
        |    ln(p.nd / pt.ndt) + COALESCE(l.s, 0.0) AS score
        |  FROM spine s CROSS JOIN priors p CROSS JOIN ptot pt
        |  LEFT JOIN ll l ON l.doc_id = s.doc_id AND l.label = p.label),
        |best AS (SELECT doc_id, label, score, row_number()
        |    OVER (PARTITION BY doc_id ORDER BY score DESC, label ASC) AS rn
        |  FROM sc)
        |SELECT doc_id AS id, label AS pred, score::REAL AS score
        |FROM best WHERE rn = 1 ORDER BY id""".stripMargin,

    // recursive transitive closure over the 0.3-Jaccard pair graph
    "q172_connected_components" ->
      s"""WITH $ShingleSets,
         |sizes AS (SELECT id, count(*) sz FROM sh GROUP BY id),
         |common AS (SELECT a.id id1, b.id id2, count(*) AS common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
         |  GROUP BY 1, 2),
         |pairs AS (SELECT id1, id2 FROM common
         |  JOIN sizes s1 ON common.id1 = s1.id
         |  JOIN sizes s2 ON common.id2 = s2.id
         |  WHERE common::DOUBLE / (s1.sz + s2.sz - common) >= 0.3),
         |edges AS (SELECT id1 a, id2 b FROM pairs
         |  UNION ALL SELECT id2, id1 FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |comp AS (
         |  WITH RECURSIVE reach(id, label) AS (
         |    SELECT id, id FROM nodes
         |    UNION
         |    SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.id
         |  )
         |  SELECT id, min(label) AS component FROM reach GROUP BY id)
         |SELECT id AS node, component FROM comp ORDER BY node""".stripMargin,

    // identical four-sum slope formula over the same trailing window
    "q173_rolling_trend" ->
      """WITH s AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS period,
        |    sum(value) AS y
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, period, y,
        |    count(*) OVER w AS n,
        |    sum(period::DOUBLE) OVER w AS sx,
        |    sum(y) OVER w AS sy,
        |    sum(period::DOUBLE * y) OVER w AS sxy,
        |    sum(period::DOUBLE * period::DOUBLE) OVER w AS sxx
        |  FROM s WINDOW w AS (PARTITION BY event_type ORDER BY period
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, period, y::REAL AS y,
        |  (CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0.0
        |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END)::REAL
        |    AS slope
        |FROM t ORDER BY event_type, period""".stripMargin,

    // q54's session rule, aggregated per user with exact-int ratios
    "q174_session_stats" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus
        |  FROM events),
        |g AS (SELECT *, CASE WHEN lag(tus) OVER w IS NULL
        |         OR tus - lag(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |         ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx FROM g),
        |per AS (SELECT user_id, session_idx, count(*)::BIGINT AS n,
        |    (max(tus) - min(tus))::BIGINT AS dur
        |  FROM s GROUP BY user_id, session_idx)
        |SELECT user_id,
        |  count(*)::BIGINT AS n_sessions,
        |  sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounces,
        |  sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)
        |    AS bounce_rate,
        |  sum(n)::BIGINT AS n_events,
        |  sum(n)::DOUBLE / count(*) AS events_per_session,
        |  sum(dur)::DOUBLE / count(*) AS avg_dur_us
        |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin,

    // same per-group (n, Σx, Σx²) algebra, same Paulson F-tail through
    // the shared erfc chain
    "q220_anova_oneway" ->
      s"""WITH g AS (SELECT event_type AS g, count(*)::DOUBLE AS n,
         |    sum(value) AS s, sum(value * value) AS ss
         |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
         |  GROUP BY 1),
         |a AS (SELECT count(*)::BIGINT AS k, sum(n) AS tn, sum(s) AS tsum,
         |    sum(s * s / n) AS bsum, sum(ss - s * s / n) AS wsum FROM g),
         |b AS (SELECT k, tn, bsum - tsum * tsum / tn AS ssb, wsum,
         |    (k - 1)::DOUBLE AS df1, tn - k AS df2 FROM a),
         |c AS (SELECT *, (ssb / df1) / (wsum / df2) AS f,
         |    2e0 / (9e0 * df1) AS a1, 2e0 / (9e0 * df2) AS a2,
         |    pow((ssb / df1) / (wsum / df2), 1e0 / 3e0) AS f13 FROM b),
         |d AS (SELECT *,
         |    ((1e0 - a2) * f13 - (1e0 - a1)) /
         |      sqrt(f13 * f13 * a2 + a1) AS z FROM c)
         |SELECT k, tn::BIGINT AS n, ssb::REAL AS ss_between,
         |  wsum::REAL AS ss_within,
         |  (CASE WHEN k > 1 AND df2 > 0e0 AND wsum > 0e0 THEN f END)
         |    ::REAL AS f,
         |  df1::BIGINT AS df1, df2::BIGINT AS df2,
         |  (CASE WHEN k > 1 AND df2 > 0e0 AND wsum > 0e0 THEN
         |    CASE WHEN z >= 0e0 THEN ${erfcSql("(z / sqrt(2e0))")} / 2e0
         |      ELSE 1e0 - ${erfcSql("(-z / sqrt(2e0))")} / 2e0 END
         |   END)::REAL AS p
         |FROM d""".stripMargin,

    // same closed-form SES weights: rank window + geometric projection
    "q221_ses_forecast" ->
      """WITH s AS (SELECT event_type, epoch_us(ts) // 3600000000 AS period,
        |    sum(value) AS y FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER w AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS t
        |  FROM s WINDOW w AS (PARTITION BY event_type ORDER BY period)),
        |w2 AS (SELECT event_type, period, y,
        |    CASE WHEN rn = 1 THEN pow(1e0 - 3e-1, t - 1)
        |      ELSE 3e-1 * pow(1e0 - 3e-1, t - rn) END AS w
        |  FROM r)
        |SELECT event_type, count(*)::BIGINT AS n_periods,
        |  arg_max(y, period)::REAL AS last_y,
        |  sum(w * y)::REAL AS level
        |FROM w2 GROUP BY event_type ORDER BY event_type""".stripMargin,

    // same dense-spine lag algebra: every centered sum re-expanded
    // against the full-series mean
    "q222_acf" -> {
      val lags = 1 to 6
      val lagCols = lags.map(k => s"lag(x, $k) OVER w AS l$k").mkString(", ")
      val aggCols = lags.map(k =>
        s"""sum(x * l$k) AS sxy$k,
           |    sum(CASE WHEN l$k IS NOT NULL THEN x END) AS sa$k,
           |    sum(l$k) AS sb$k, count(l$k)::DOUBLE AS np$k""".stripMargin)
        .mkString(",\n    ")
      val rows = lags.map(k =>
        s"""SELECT event_type, $k AS lag, n,
           |  coalesce(sxy$k, 0e0) - s / n *
           |    (coalesce(sa$k, 0e0) + coalesce(sb$k, 0e0)) +
           |    np$k * (s / n) * (s / n) AS num,
           |  ss - s * s / n AS den FROM a""".stripMargin)
        .mkString("\nUNION ALL\n")
      s"""WITH c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS period,
         |    count(*)::DOUBLE AS x FROM events GROUP BY 1, 2),
         |bounds AS (SELECT event_type, min(period) AS p0, max(period) AS p1
         |  FROM c GROUP BY 1),
         |sp AS (SELECT event_type,
         |    unnest(generate_series(p0, p1)) AS period FROM bounds),
         |d AS (SELECT sp.event_type, sp.period, coalesce(c.x, 0e0) AS x
         |  FROM sp LEFT JOIN c ON sp.event_type = c.event_type
         |    AND sp.period = c.period),
         |l AS (SELECT *, $lagCols
         |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY period)),
         |a AS (SELECT event_type, count(*)::DOUBLE AS n, sum(x) AS s,
         |    sum(x * x) AS ss,
         |    $aggCols
         |  FROM l GROUP BY 1)
         |SELECT event_type, lag, n::BIGINT AS n,
         |  (CASE WHEN den > 0e0 THEN num / den END)::REAL AS acf
         |FROM ($rows)
         |ORDER BY event_type, lag""".stripMargin
    },

    // same equal-width cells + cumulative Gini scan, same
    // (gain DESC, bin) argmax
    "q223_stump_splits" -> {
      val feats = Seq("l_quantity" -> 0, "l_extendedprice" -> 1,
        "l_discount" -> 2)
      val cells = feats.map { case (name, i) =>
        s"""SELECT '$name' AS feature, bin, max(thr) AS thr,
           |    count(*)::DOUBLE AS n, sum(y) AS pos FROM (
           |  SELECT y,
           |    least(15, greatest(0, floor((x$i - mn$i) / w$i)::INT)) AS bin,
           |    mn$i + (least(15, greatest(0,
           |      floor((x$i - mn$i) / w$i)::INT)) + 1) * w$i AS thr
           |  FROM base, bw WHERE x$i IS NOT NULL AND w$i > 0e0) c$i
           |GROUP BY bin""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH base AS (SELECT
         |    ((l_returnflag = 'R')::INT)::DOUBLE AS y,
         |    l_quantity::DOUBLE AS x0, l_extendedprice::DOUBLE AS x1,
         |    l_discount::DOUBLE AS x2
         |  FROM lineitem WHERE (l_returnflag = 'R') IS NOT NULL),
         |b AS (SELECT min(x0) AS mn0, max(x0) AS mx0, min(x1) AS mn1,
         |    max(x1) AS mx1, min(x2) AS mn2, max(x2) AS mx2 FROM base),
         |bw AS (SELECT mn0, (mx0 - mn0) / 16 AS w0, mn1,
         |    (mx1 - mn1) / 16 AS w1, mn2, (mx2 - mn2) / 16 AS w2 FROM b),
         |cells AS ($cells),
         |scan AS (SELECT feature, bin, thr, n, pos,
         |    sum(n) OVER wcum AS nl, sum(pos) OVER wcum AS pl,
         |    sum(n) OVER wall AS nt, sum(pos) OVER wall AS pt
         |  FROM cells
         |  WINDOW wcum AS (PARTITION BY feature ORDER BY bin
         |      ROWS UNBOUNDED PRECEDING),
         |    wall AS (PARTITION BY feature)),
         |g AS (SELECT *, nt - nl AS nr, pt - pl AS pr FROM scan
         |  WHERE nl > 0e0 AND nt - nl > 0e0),
         |gain AS (SELECT feature, bin, thr, nl, nr,
         |    2e0 * (pt / nt) * (1e0 - pt / nt) -
         |      (nl * (2e0 * (pl / nl) * (1e0 - pl / nl)) +
         |       nr * (2e0 * (pr / nr) * (1e0 - pr / nr))) / nt AS gain
         |  FROM g),
         |best AS (SELECT *, row_number() OVER (PARTITION BY feature
         |    ORDER BY gain DESC, bin) AS rk FROM gain)
         |SELECT f.feature, bin AS split_bin, thr::REAL AS threshold,
         |  nl::BIGINT AS n_left, nr::BIGINT AS n_right, gain::REAL AS gain
         |FROM (VALUES ('l_discount'), ('l_extendedprice'), ('l_quantity'))
         |  f(feature)
         |LEFT JOIN best ON best.feature = f.feature AND rk = 1
         |ORDER BY f.feature""".stripMargin
    },

    // same contingency/margin algebra per pair, nats
    "q224_mutual_info" -> {
      def miSql(name: String, x: String, y: String): String = {
        def cells(a: String) =
          s"""(SELECT $x AS xv, $y AS yv, count(*)::DOUBLE AS c
             |    FROM lineitem WHERE $x IS NOT NULL AND $y IS NOT NULL
             |    GROUP BY 1, 2) $a""".stripMargin
        s"""SELECT '$name' AS pair, coalesce(t, 0e0)::BIGINT AS n,
           |  hx::REAL AS hx, hy::REAL AS hy,
           |  (CASE WHEN t IS NOT NULL THEN coalesce(mi, 0e0) END)
           |    ::REAL AS mi,
           |  (CASE WHEN hx > 0e0 AND hy > 0e0 THEN mi / sqrt(hx * hy) END)
           |    ::REAL AS nmi
           |FROM (SELECT sum(c) AS t FROM ${cells("ct")}),
           |  (SELECT sum(c / t * ln(c * t / (nx * ny))) AS mi FROM
           |    (SELECT cc.c, xm.nx, ym.ny, tt.t FROM ${cells("cc")}
           |     JOIN (SELECT xv, sum(c) AS nx FROM ${cells("cx")}
           |       GROUP BY 1) xm ON cc.xv = xm.xv
           |     JOIN (SELECT yv, sum(c) AS ny FROM ${cells("cy")}
           |       GROUP BY 1) ym ON cc.yv = ym.yv
           |     CROSS JOIN (SELECT sum(c) AS t FROM ${cells("c3")}) tt) jj),
           |  (SELECT -sum(nx / t * ln(nx / t)) AS hx FROM
           |    (SELECT xv, sum(c) AS nx FROM ${cells("c4")} GROUP BY 1) x2
           |    CROSS JOIN (SELECT sum(c) AS t FROM ${cells("c5")}) t2),
           |  (SELECT -sum(ny / t * ln(ny / t)) AS hy FROM
           |    (SELECT yv, sum(c) AS ny FROM ${cells("c6")} GROUP BY 1) y2
           |    CROSS JOIN (SELECT sum(c) AS t FROM ${cells("c7")}) t3)"""
          .stripMargin
      }
      val qbin = "(floor(l_quantity / 5e0)::INT)::VARCHAR"
      Seq(
        miSql("flag|status", "l_returnflag", "l_linestatus"),
        miSql("flag|qbin", "l_returnflag", qbin),
        miSql("status|qbin", "l_linestatus", qbin)
      ).mkString("", "\nUNION ALL\n", "\nORDER BY pair")
    },

    // q144's unrolled damped PageRank over the adjacent-token graph
    "q225_textrank" -> {
      def iter(i: Int): String = {
        val p = s"r${i - 1}"
        s"""d$i AS (SELECT coalesce(sum(r), 0) AS dang FROM $p
           |  LEFT JOIN dg ON v = ds WHERE ds IS NULL),
           |c$i AS (SELECT e.t AS t, sum(r / deg) AS c FROM e
           |  JOIN $p ON e.s = v JOIN dg ON e.s = dg.ds GROUP BY e.t),
           |r$i AS (SELECT v,
           |    (1.0 - 0.85) / N + 0.85 * (coalesce(c, 0) + dang / N) AS r
           |  FROM n LEFT JOIN c$i ON v = t CROSS JOIN d$i CROSS JOIN nc)"""
          .stripMargin
      }
      s"""WITH tk AS (SELECT
         |    list_filter(${toks("text")}, t -> len(t) >= 2) AS t
         |  FROM documents),
         |bg AS (SELECT unnest(${bigrams("t")}) AS bg FROM tk),
         |e0 AS (SELECT string_split(bg, ' ')[1] AS s,
         |    string_split(bg, ' ')[2] AS t FROM bg),
         |e AS (SELECT DISTINCT s, t FROM (
         |  SELECT s, t FROM e0 WHERE s <> t
         |  UNION ALL SELECT t, s FROM e0 WHERE s <> t) u),
         |n AS (SELECT s AS v FROM e UNION SELECT t FROM e),
         |nc AS (SELECT count(*)::DOUBLE AS N FROM n),
         |dg AS (SELECT s AS ds, count(*)::BIGINT AS deg FROM e GROUP BY s),
         |r0 AS (SELECT v, 1.0 / N AS r FROM n, nc),
         |${(1 to 5).map(iter).mkString(",\n")}
         |SELECT v AS token, r::REAL AS rank FROM r5
         |ORDER BY r DESC, v LIMIT 100""".stripMargin
    },

    // two unrolled alternating rounds + the same end normalization
    "q226_rank1_mf" -> {
      def solve(out: String, key: String, other: String, fixed: String,
          joinKey: String): String =
        s"""$out AS (SELECT r.$key,
           |    CASE WHEN sum(f * f) > 0e0 THEN sum(v * f) / sum(f * f)
           |      ELSE 0e0 END AS f
           |  FROM r JOIN $fixed ON r.$joinKey = $fixed.$joinKey
           |  GROUP BY r.$key)""".stripMargin
      s"""WITH r AS (SELECT l_suppkey::VARCHAR AS u, l_partkey::VARCHAR AS i,
         |    l_quantity::DOUBLE AS v
         |  FROM lineitem WHERE l_suppkey IS NOT NULL
         |    AND l_partkey IS NOT NULL AND l_quantity IS NOT NULL),
         |v0 AS (SELECT DISTINCT i, 1e0 AS f FROM r),
         |${solve("u1", "u", "i", "v0", "i")},
         |${solve("v1", "i", "u", "u1", "u")},
         |${solve("u2", "u", "i", "v1", "i")},
         |${solve("v2", "i", "u", "u2", "u")},
         |nu AS (SELECT sqrt(sum(f * f)) AS nrm FROM u2),
         |nv AS (SELECT sqrt(sum(f * f)) AS nrm FROM v2)
         |SELECT 'user' AS side, u AS id,
         |  (CASE WHEN nrm > 0e0 THEN f / nrm END)::REAL AS factor
         |FROM u2, nu
         |UNION ALL
         |SELECT 'item', i,
         |  (CASE WHEN nrm > 0e0 THEN f / nrm END)::REAL FROM v2, nv
         |ORDER BY side, id""".stripMargin
    }
  )

  /** q92 is the INDEX ROUNDTRIP of q41: building the IVF index on disk and
    * querying it through the partition-pruned path must reproduce the
    * in-memory ivfTopK result bit-for-bit — so its oracle IS q41's SQL. */
  val all: Map[String, String] =
    base + ("q92_vector_index" -> base("q41_knn_ivf"))
}
