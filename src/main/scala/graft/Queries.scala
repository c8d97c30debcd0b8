package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.reg.{Dbreg, Glm}
import graft.pipeline.{Dedup, Multimodal, Similarity, TextOps}

/** The operator battery behind [[SparkEntry.queries]].
  *
  * One entry per operator row of SURVEY.md §2 (plus the training-pipeline
  * operators). Every query is deterministic (explicit ORDER BY with a total
  * order) and has a DuckDB-equivalent oracle in [[OracleSql]] unless noted.
  */
object Queries {

  private def li(s: SparkSession, dir: String) = s.read.parquet(s"$dir/lineitem.parquet")
  private def ord(s: SparkSession, dir: String) = s.read.parquet(s"$dir/orders.parquet")
  private def docs(s: SparkSession, dir: String) = s.read.parquet(s"$dir/documents.parquet")

  /** documents with a synthesized MULTI-LINE text column for the
    * line-dedup queries (the corpus has no newlines): 5-token chunk
    * "lines" via [[TextOps.tokenChunkLines]] — the identical arithmetic
    * is replayed in the DuckDB oracles' LineChunks CTE. */
  private def mlDocs(s: SparkSession, dir: String) =
    docs(s, dir).select(col("doc_id"), col("lang"),
      TextOps.tokenChunkLines(col("text"), 5).as("mltext"))
  private def emb(s: SparkSession, dir: String) = s.read.parquet(s"$dir/embeddings.parquet")
  private def ev(s: SparkSession, dir: String) = s.read.parquet(s"$dir/events.parquet")

  /** Fixed per-(SF dir, query) temp layout path for the z-order queries:
    * overwritten each run (no corpus-sized temp accumulation) and keyed on
    * the sanitized SF basename PLUS its hash — two SF dirs can never
    * collide even under concurrent gate runs (an Int hashCode alone
    * could). */
  private def zorderTmpDir(dir: String, q: String): String = {
    val base = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft-zorder-$q-" +
      s"$base-${dir.hashCode.toHexString}/docs"
  }

  private val y = col("l_extendedprice").cast("double")
  private val x1 = col("l_quantity").cast("double")
  private val x2 = col("l_discount").cast("double")

  /** base relation of the regression queries: P1 column pruning + P2
    * missing-value filter (reference dbreg.R:450-468). */
  private def base(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .select(col("l_extendedprice"), col("l_quantity"), col("l_discount"),
        col("l_returnflag"), col("l_linestatus"))
      .filter(
        col("l_extendedprice").isNotNull && col("l_quantity").isNotNull &&
          col("l_discount").isNotNull && col("l_returnflag").isNotNull &&
          col("l_linestatus").isNotNull)

  private type Q = (SparkSession, String) => DataFrame

  // ---- sql_only roundtrip machinery ------------------------------------
  // The q62-q65 oracles are SqlGen's generated SQL; these Spark twins mirror
  // the generated text expression-for-expression (same design columns from
  // the same structural expansion, same aggregate aliases).

  /** Fixed TPC-H levels so the oracle text is computable without a session. */
  val SqlGenLevels: Map[String, Seq[String]] =
    Map("l_returnflag" -> Seq("A", "N", "R"), "l_linestatus" -> Seq("F", "O"))
  val SqlGenCompressFormula =
    "l_extendedprice ~ l_quantity + l_returnflag | l_linestatus"
  /** Small-magnitude vars: demean/mundlak roundtrips compare full-precision
    * float sums, which tolerate reorder noise only at O(1) magnitudes. */
  val SqlGenSmallFormula = "l_discount ~ l_tax | l_returnflag"

  private def sqlgenBaseDF(
      d: DataFrame,
      f: graft.formula.Formula,
      st: graft.model.ModelMatrix.StructExpansion,
      withFe: Boolean
  ): DataFrame = {
    import graft.model.ModelMatrix
    val sel = (col(f.y).cast("double").as("y") ::
      st.cols.map(dc => ModelMatrix.renderCol(dc).col.as(dc.name))) ++
      (if (withFe) f.fe.map(col) else Nil)
    d.filter(f.allInputCols.distinct.map(col(_).isNotNull).reduce(_ && _))
      .select(sel: _*)
  }

  /** Moment-triangle aggregates with SqlGen.momentSelect's aliases. */
  private def triangleAggs(names: List[String]): Seq[Column] = {
    val yc = col("y")
    val b = scala.collection.mutable.ArrayBuffer[Column]()
    b += count(lit(1)).as("n_total")
    b += sum(yc).as("sum_y")
    b += sum(yc * yc).as("sum_y_y")
    names.foreach { x =>
      b += sum(col(x)).as(s"sum_$x")
      b += sum(col(x) * yc).as(s"sum_${x}_y")
    }
    for (i <- names.indices; j <- i until names.length)
      b += sum(col(names(i)) * col(names(j))).as(s"sum_${names(i)}_${names(j)}")
    b.toSeq
  }

  private def sqlgenParsed(formula: String) = {
    val f = graft.formula.Formula.parse(formula)
    (f, graft.model.ModelMatrix.expandStructure(f.terms, SqlGenLevels, f.fe))
  }

  private def sqlgenMomentsDF(d: DataFrame, formula: String): DataFrame = {
    val (f, st) = sqlgenParsed(formula)
    val base = sqlgenBaseDF(d, f, st, withFe = false)
    val aggs = triangleAggs(st.cols.map(_.name))
    base.agg(aggs.head, aggs.tail: _*)
  }

  private def sqlgenDemeanDF(d: DataFrame, formula: String): DataFrame = {
    val (f, st) = sqlgenParsed(formula)
    val names = st.cols.map(_.name)
    val vars = "y" :: names
    val base = sqlgenBaseDF(d, f, st, withFe = true)
    val fe1 = f.fe.head
    val mAggs = vars.map(v => avg(col(v)).as(s"m_${v}_g"))
    val gm = base.groupBy(col(fe1)).agg(mAggs.head, mAggs.tail: _*)
    val demeaned = base.join(gm, Seq(fe1))
      .select(vars.map(v => (col(v) - col(s"m_${v}_g")).as(v)): _*)
    val aggs = triangleAggs(names)
    demeaned.agg(aggs.head, aggs.tail: _*)
      .crossJoin(gm.agg(count(lit(1)).as("n_fe1")))
  }

  private def sqlgenMundlakDF(d: DataFrame, formula: String): DataFrame = {
    val (f, st) = sqlgenParsed(formula)
    val names = st.cols.map(_.name)
    val base = sqlgenBaseDF(d, f, st, withFe = true)
    val augmented = f.fe.foldLeft(base) { (acc, fe) =>
      val mAggs = names.map(x => avg(col(x)).as(s"m_${x}_$fe"))
      acc.join(base.groupBy(col(fe)).agg(mAggs.head, mAggs.tail: _*), Seq(fe))
    }
    val meanNames = f.fe.flatMap(fe => names.map(x => s"m_${x}_$fe"))
    val aggs = triangleAggs(names ++ meanNames)
    augmented.agg(aggs.head, aggs.tail: _*)
  }

  val all: Map[String, Q] = Map[String, Q](
    // ---- A2: single-row moments aggregate ----
    "q01_moments_agg" -> ((s, dir) =>
      base(s, dir).agg(
        count(lit(1)).as("n_total"),
        sum(y).as("sum_y"), sum(y * y).as("sum_y_sq"),
        sum(x1).as("sum_x1"), sum(x1 * y).as("sum_x1_y"), sum(x1 * x1).as("sum_x1_sq"),
        sum(x2).as("sum_x2"), sum(x2 * y).as("sum_x2_y"), sum(x2 * x2).as("sum_x2_sq"),
        sum(x1 * x2).as("sum_x1_x2"))),

    // ---- A1: compression group-by ----
    "q02_compress_cells" -> ((s, dir) =>
      base(s, dir)
        .groupBy(col("l_quantity"), col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(y).as("sum_y"), sum(y * y).as("sum_y_sq"))
        .withColumn("mean_y", col("sum_y") / col("n"))
        .withColumn("wts", sqrt(col("n")))
        .orderBy("l_quantity", "l_returnflag", "l_linestatus")),

    // ---- A3: group means per FE ----
    "q03_group_means" -> ((s, dir) =>
      base(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(avg(y).as("y_mean"), avg(x1).as("x1_mean"), avg(x2).as("x2_mean"))
        .orderBy("l_returnflag")),

    // ---- A4: overall means ----
    "q04_overall_means" -> ((s, dir) =>
      base(s, dir).agg(avg(y).as("y_mean"), avg(x1).as("x1_mean"), avg(x2).as("x2_mean"))),

    // ---- A5 + J1: demeaned moments, 1 FE ----
    // Fixed-point (cent-quantized) variant so the result is bit-reproducible
    // across engines and partitionings: group means derive from exact integer
    // sums, demeaned values are rounded back to integer cents, and the final
    // sums are exact decimal arithmetic (order-independent). The broadcast
    // join is the same J1 plan shape as the float version.
    "q05_demean_moments_1fe" -> ((s, dir) => {
      val b = base(s, dir).select(
        col("l_returnflag"),
        round(y * 100, 0).cast("long").as("yc"),
        (x1 * 100).cast("long").as("xc"))
      val gm = b.groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("ng"), sum(col("yc")).as("sy"), sum(col("xc")).as("sx"))
      val d = b.join(broadcast(gm), "l_returnflag").select(
        col("l_returnflag"),
        round(col("yc").cast("double") - col("sy").cast("double") / col("ng").cast("double"), 0)
          .cast("decimal(19,0)").as("dy"),
        round(col("xc").cast("double") - col("sx").cast("double") / col("ng").cast("double"), 0)
          .cast("decimal(19,0)").as("dx"))
      d.agg(
        count(lit(1)).as("n_total"),
        countDistinct(col("l_returnflag")).as("n_fe1"),
        (sum(col("dy") * col("dy")).cast("double") / 10000.0).as("sum_y_sq"),
        (sum(col("dx") * col("dx")).cast("double") / 10000.0).as("sum_x_sq"),
        (sum(col("dx") * col("dy")).cast("double") / 10000.0).as("sum_x_y"))
    }),

    // ---- A5 + J2: double-demeaned moments, 2 FE (balanced-panel algebra) ----
    // Same fixed-point scheme as q05; the three-way mean combination is
    // written with identical left-to-right association in Spark and the
    // oracle so the pre-rounding doubles are bit-identical.
    "q06_demean_moments_2fe" -> ((s, dir) => {
      val b = base(s, dir).select(
        col("l_returnflag"), col("l_linestatus"),
        round(y * 100, 0).cast("long").as("yc"),
        (x1 * 100).cast("long").as("xc"))
      val um = b.groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("ngu"), sum(col("yc")).as("syu"), sum(col("xc")).as("sxu"))
      val tm = b.groupBy(col("l_linestatus")).agg(
        count(lit(1)).as("ngt"), sum(col("yc")).as("syt"), sum(col("xc")).as("sxt"))
      val om = b.agg(
        count(lit(1)).as("ngo"), sum(col("yc")).as("syo"), sum(col("xc")).as("sxo"))
      val d = b
        .join(broadcast(um), "l_returnflag")
        .join(broadcast(tm), "l_linestatus")
        .crossJoin(broadcast(om))
        .select(
          round((col("yc").cast("double") - col("syu").cast("double") / col("ngu").cast("double"))
            - col("syt").cast("double") / col("ngt").cast("double")
            + col("syo").cast("double") / col("ngo").cast("double"), 0)
            .cast("decimal(19,0)").as("dy"),
          round((col("xc").cast("double") - col("sxu").cast("double") / col("ngu").cast("double"))
            - col("sxt").cast("double") / col("ngt").cast("double")
            + col("sxo").cast("double") / col("ngo").cast("double"), 0)
            .cast("decimal(19,0)").as("dx"))
      d.agg(
        count(lit(1)).as("n_total"),
        (sum(col("dy") * col("dy")).cast("double") / 10000.0).as("sum_y_sq"),
        (sum(col("dx") * col("dx")).cast("double") / 10000.0).as("sum_x_sq"),
        (sum(col("dx") * col("dy")).cast("double") / 10000.0).as("sum_x_y"))
    }),

    // ---- A6 + J3: Mundlak augmented moments ----
    "q07_mundlak_moments" -> ((s, dir) => {
      val b = base(s, dir)
      val gm = b.groupBy(col("l_returnflag")).agg(avg(x1).as("xbar"))
      val a = b.join(broadcast(gm), "l_returnflag")
      a.agg(
        count(lit(1)).as("n_total"),
        sum(x1).as("sum_x"), sum(col("xbar")).as("sum_xbar"),
        sum(x1 * col("xbar")).as("sum_x_xbar"),
        sum(x1 * x1).as("sum_x_sq"), sum(col("xbar") * col("xbar")).as("sum_xbar_sq"),
        sum(x1 * y).as("sum_x_y"), sum(col("xbar") * y).as("sum_xbar_y"),
        sum(y).as("sum_y"), sum(y * y).as("sum_y_sq"))
    }),

    // ---- A10: HC1 meat with inlined coefficient literals ----
    "q08_hc1_meat" -> ((s, dir) => {
      val e = y - lit(50000.0) - lit(-20.0) * x1
      base(s, dir).agg(
        sum(e * e).as("m_cc"),
        sum(e * e * x1).as("m_cx"),
        sum(e * e * x1 * x1).as("m_xx"))
    }),

    // ---- A11: per-cluster score vectors ----
    "q09_cluster_scores" -> ((s, dir) => {
      val e = y - lit(50000.0) - lit(-20.0) * x1
      base(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(sum(e).as("s0"), sum(e * x1).as("s1"))
        .orderBy("l_returnflag")
    }),

    // ---- A7/A8: counts + distinct-tuple count ----
    "q10_counts_distinct" -> ((s, dir) => {
      val b = base(s, dir)
      b.agg(
        count(lit(1)).as("n_total"),
        countDistinct(col("l_returnflag")).as("n_fe"),
        countDistinct(col("l_quantity"), col("l_returnflag"), col("l_linestatus"))
          .as("n_cells"))
    }),

    // ---- A9: balance check ----
    "q11_balance_check" -> ((s, dir) =>
      base(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .count()
        .agg(countDistinct(col("count")).as("n_distinct_counts"))),

    // ---- A13: nested-FE detection ----
    "q12_nested_fe_check" -> ((s, dir) =>
      base(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_linestatus")).as("nc"))
        .filter(col("nc") > 1)
        .agg(count(lit(1)).as("n_nonnested"))),

    // ---- P3/P4: factor dummies + interactions (aggregated) ----
    "q13_dummies_interactions" -> ((s, dir) => {
      val dN = when(col("l_returnflag") === "N", 1.0).otherwise(0.0)
      val dR = when(col("l_returnflag") === "R", 1.0).otherwise(0.0)
      base(s, dir).agg(
        sum(dN).as("sum_dn"), sum(dR).as("sum_dr"),
        sum(dN * x1).as("sum_dn_x"), sum(dR * x1).as("sum_dr_x"),
        sum(dN * x1 * y).as("sum_dn_x_y"))
    }),

    // ---- P5/P6: polynomial + truncated-power spline terms ----
    "q14_poly_spline_terms" -> ((s, dir) => {
      val k = lit(25.0)
      base(s, dir).agg(
        sum(pow(x1, 2)).as("sum_x_p2"),
        sum(pow(x1, 3)).as("sum_x_p3"),
        sum(when(x1 > k, 1.0).otherwise(0.0)).as("sum_step"),
        sum(when(x1 > k, pow(x1 - k, 1)).otherwise(0.0)).as("sum_tp1"),
        sum(when(x1 > k, pow(x1 - k, 2)).otherwise(0.0)).as("sum_tp2"))
    }),

    // ---- P2/P8: missing filter + casts on orders ----
    "q15_casts_filters" -> ((s, dir) =>
      ord(s, dir)
        .filter(col("o_totalprice").isNotNull && col("o_custkey").isNotNull)
        .agg(
          count(lit(1)).cast("long").as("n"),
          sum(col("o_totalprice").cast("double")).as("sum_price"),
          sum(col("o_custkey").cast("double")).as("sum_cust"))),

    // ---- W1: NTILE quantile binning (deterministic total order) ----
    "q16_ntile_bins" -> ((s, dir) => {
      val w = Window.orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      li(s, dir)
        .withColumn("bin", ntile(10).over(w))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum(y).as("sum_y"),
          min(col("l_extendedprice")).as("min_y"), max(col("l_extendedprice")).as("max_y"))
        .orderBy("bin")
    }),

    // ---- W2: equal-width bins from global min/max ----
    "q17_equal_width_bins" -> ((s, dir) => {
      val mm = li(s, dir).agg(min(y).as("mn"), max(y).as("mx"))
      li(s, dir)
        .crossJoin(broadcast(mm))
        .withColumn(
          "bin",
          least(floor((y - col("mn")) / ((col("mx") - col("mn")) / 10.0)), lit(9.0))
            .cast("int"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), avg(y).as("avg_y"))
        .orderBy("bin")
    }),

    // ---- A14 + P7: manual-bin geometry ----
    "q18_bin_geometry" -> ((s, dir) => {
      val bin = when(x1 <= 10, 0).when(x1 <= 20, 1).when(x1 <= 30, 2)
        .when(x1 <= 40, 3).otherwise(4)
      base(s, dir)
        .withColumn("bin", bin)
        .groupBy("bin")
        .agg(
          min(x1).as("min_x"), max(x1).as("max_x"),
          ((min(x1) + max(x1)) / 2.0).as("mid_x"),
          avg(x1).as("avg_x"), count(lit(1)).as("n"))
        .orderBy("bin")
    }),

    // ---- exact percentiles (sort-based aggregate; the exact-small-n
    // complement of the approxQuantile scale path) ----
    "q60_percentiles" -> ((s, dir) =>
      base(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, 0.25)").as("p25"),
          expr("percentile(l_extendedprice, 0.5)").as("p50"),
          expr("percentile(l_extendedprice, 0.9)").as("p90"))
        .orderBy("l_returnflag")),

    // ---- O2: factor-level discovery ----
    "q19_factor_levels" -> ((s, dir) =>
      li(s, dir)
        .select(col("l_returnflag"))
        .filter(col("l_returnflag").isNotNull)
        .distinct()
        .orderBy("l_returnflag")),

    // ---- O3/O5: top-k with deterministic tiebreak ----
    "q20_topk_orders" -> ((s, dir) =>
      ord(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))),

    // ---- O4: deterministic hash sampling (scalable alternative to RNG) ----
    "q21_hash_sample" -> ((s, dir) =>
      ord(s, dir)
        .filter(TextOps.hash32(col("o_orderkey").cast("string")) % 20 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderkey")),

    // ---- end-to-end fits (K1-K8 driver kernels against SQL algebra) ----
    "q22_ols_simple_fit" -> ((s, dir) => {
      val fit = Dbreg.fit("l_extendedprice ~ l_quantity", li(s, dir), strategy = "moments")
      fit.toDF(s).select(col("term"), col("estimate"), col("std_error"), col("statistic"))
        .orderBy("term")
    }),
    // float32 outputs: the compress-path cell summation order varies with
    // the partition count, leaving ~1e-13 rel noise vs the oracle algebra —
    // double→float32 rounding is IEEE-identical in both engines, so the
    // printed value cannot flip (same hardening as q25).
    "q23_ols_multi_fit" -> ((s, dir) => {
      val fit = Dbreg.fit("l_extendedprice ~ l_quantity + l_discount", li(s, dir),
        strategy = "compress")
      fit.toDF(s).select(col("term"),
        col("estimate").cast("float").as("estimate"),
        col("std_error").cast("float").as("std_error")).orderBy("term")
    }),
    "q24_demean_fit" -> ((s, dir) => {
      val fit = Dbreg.fit("l_extendedprice ~ l_quantity | l_returnflag", li(s, dir),
        strategy = "demean")
      fit.toDF(s).select(col("term"), col("estimate"), col("std_error")).orderBy("term")
    }),
    // Mundlak fit. FE = partkey%20 (group x-means vary by sampling noise →
    // well-conditioned augmented system; l_returnflag's near-constant x-means
    // made the xbar column nearly collinear with the intercept and amplified
    // engine-order float noise ~1e6×). Outputs are float32: the driver's
    // compare is bit-exact, and double→float32 rounding is IEEE-identical in
    // both engines, so a ~1e-14 relative driver-vs-oracle algebra difference
    // cannot flip the printed value.
    "q25_mundlak_fit" -> ((s, dir) => {
      val data = li(s, dir).withColumn("grp20", col("l_partkey") % 20)
      val fit = Dbreg.fit("l_extendedprice ~ l_quantity | grp20", data,
        strategy = "mundlak")
      fit.toDF(s).select(col("term"),
        col("estimate").cast("float").as("estimate"),
        col("std_error").cast("float").as("std_error")).orderBy("term")
    }),
    "q26_hc1_fit" -> ((s, dir) => {
      val fit = Dbreg.fit("l_extendedprice ~ l_quantity", li(s, dir),
        vcov = "hc1", strategy = "moments")
      fit.toDF(s).select(col("term"), col("estimate"), col("std_error")).orderBy("term")
    }),
    "q27_cluster_fit" -> ((s, dir) => {
      val fit = Dbreg.fit("l_extendedprice ~ l_quantity", li(s, dir),
        vcov = "~l_returnflag", strategy = "moments")
      fit.toDF(s).select(col("term"), col("estimate"), col("std_error")).orderBy("term")
    }),

    // K-FE alternating projections (beyond-reference: dbreg.R:640-660
    // refuses >2 FE). Fixed-sweep mode (tol=0, 2 sweeps over 3 FEs) so
    // the oracle can unroll the identical six group-mean projections
    "q200_hdfe_3fe" -> ((s, dir) => {
      val fit = Dbreg.fit(
        "l_extendedprice ~ l_quantity | l_returnflag + l_linestatus + l_linenumber",
        li(s, dir), strategy = "hdfe", hdfeTol = 0.0, hdfeMaxSweeps = 2)
      fit.toDF(s).select(col("term"), col("estimate"), col("std_error")).orderBy("term")
    }),

    // ---- A12: compress strategy with clustered SEs, end-to-end (cell-level
    // scores ≡ row-level scores because x is constant within a cell).
    // float32 outputs: driver Cholesky vs oracle closed form differ ~1e-12.
    "q61_compress_cluster_fit" -> ((s, dir) => {
      val fit = Dbreg.fit("l_extendedprice ~ l_quantity | l_linestatus", li(s, dir),
        vcov = "~l_returnflag", strategy = "compress")
      fit.toDF(s)
        .filter(col("term").isin("l_quantity", "l_linestatusO"))
        .select(col("term"),
          col("estimate").cast("float").as("estimate"),
          col("std_error").cast("float").as("std_error"))
        .orderBy("term")
    }),

    // ---- sql_only parity roundtrips: the ORACLE text for these four
    // entries is SqlGen's generated SQL VERBATIM (OracleSql delegates to
    // SqlGen.sqlOnlyWithLevels), so the driver's DuckDB pass proves the
    // generated SQL is runnable AND agrees with the engine's aggregation.
    "q62_sqlgen_moments" -> ((s, dir) =>
      sqlgenMomentsDF(li(s, dir), "l_extendedprice ~ l_quantity + l_returnflag")),
    "q63_sqlgen_compress" -> ((s, dir) =>
      Dbreg.compressedData(SqlGenCompressFormula, li(s, dir))
        .orderBy("l_quantity", "l_returnflag", "l_linestatus")),
    "q64_sqlgen_demean" -> ((s, dir) =>
      sqlgenDemeanDF(li(s, dir), SqlGenSmallFormula)),
    "q65_sqlgen_mundlak" -> ((s, dir) =>
      sqlgenMundlakDF(li(s, dir), SqlGenSmallFormula)),

    // ---- K13: Lagrange 3-point interpolation as a per-row expression ----
    "q66_lagrange_interp" -> ((s, dir) =>
      li(s, dir).filter(col("l_orderkey") <= 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.binsreg.Dbbinsreg.lagrangeInterp3(
            col("l_quantity").cast("double"),
            Seq(1.0, 25.0, 50.0), Seq(2.0, 5.0, 9.0)).as("y_interp"))
        .orderBy("l_orderkey", "l_linenumber")),

    // ---- multimodal: REAL pure-JVM decodes over spec-compliant fixtures.
    // The payload is a deterministic function of doc_id, so the decoded
    // statistics have a closed form the DuckDB oracle computes
    // independently — a wrong header offset, row stride, padding skip, or
    // sample sign in the decoder breaks the hash match. ----
    "q67_bmp_decode" -> ((s, dir) => {
      import s.implicits._
      val ids = docs(s, dir).select(col("doc_id").cast("long")).as[Long]
      Multimodal.bmpFeatures(ids.map(id =>
        Multimodal.BinaryDoc(id, Multimodal.syntheticBmp(id), "image/bmp", 0)))
        .toDF().orderBy("doc_id")
    }),
    "q68_wav_decode" -> ((s, dir) => {
      import s.implicits._
      val ids = docs(s, dir).select(col("doc_id").cast("long")).as[Long]
      Multimodal.wavFeatures(ids.map(id =>
        Multimodal.BinaryDoc(id, Multimodal.syntheticWav(id), "audio/wav", 0)))
        .toDF().orderBy("doc_id")
    }),

    // ---- K12 at scale: histogram-CDF quantile breaks (the "qs" binning
    // path — replaces approxQuantile; see PLANS.md §12). Deterministic
    // double arithmetic, so the DuckDB oracle re-derives the identical
    // interpolated breaks from the same 1024-bucket histogram. ----
    "q69_hist_quantile_breaks" -> ((s, dir) => {
      import s.implicits._
      val probs = Array(0.1, 0.25, 0.5, 0.75, 0.9)
      val b = li(s, dir).select(col("l_quantity")).filter(col("l_quantity").isNotNull)
      val qs = graft.binsreg.Dbbinsreg.histQuantiles(b, "l_quantity", probs, relErr = 1e-3)
      probs.zip(qs).toSeq.toDF("prob", "qbreak").orderBy("prob")
    }),

    // ---- K10: binscatter points (per-bin mean + pooled-sigma SE) ----
    "q28_binsreg_points" -> ((s, dir) => {
      val r = graft.binsreg.Dbbinsreg.fit(
        "l_extendedprice ~ l_quantity", li(s, dir), nbins = 5, binspos = "es", degree = 0)
      r.pointsDF(s).select(col("bin"), col("x"), col("fit"), col("se")).orderBy("bin")
    }),

    // ---- K9: distributed prediction (fit column on a deterministic subset) ----
    "q29_predict_fit" -> ((s, dir) => {
      val data = li(s, dir)
      val fit = Dbreg.fit("l_extendedprice ~ l_quantity", data, strategy = "moments")
      fit.predict(data.filter(col("l_orderkey") <= 100))
        .select(col("l_orderkey"), col("l_linenumber"), col("fit"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- grouped regression: one fit per group from one keyed agg pass ----
    "q59_grouped_fit" -> ((s, dir) =>
      Dbreg.fitGrouped("l_extendedprice ~ l_quantity", li(s, dir), "l_returnflag")
        .select(col("group"), col("term"), col("estimate"), col("std_error"))
        .orderBy("group", "term")),

    // grouped fit WITH a fixed effect: per-group within estimator — the
    // (group, fe) demean is one keyed agg + composite-key join, solves
    // stay executor-side; r2 is the within-R², df subtracts each group's
    // own FE level count
    "q93_grouped_fe_fit" -> ((s, dir) =>
      Dbreg.fitGrouped("l_extendedprice ~ l_quantity | l_suppkey",
        li(s, dir), "l_returnflag")
        .orderBy("group", "term")),

    // ---- GLM (beyond-reference extension): IRLS on the moments kernel ----
    // logistic fit via the COMPRESSED path: Pr(returnflag='R' | quantity).
    // tol=0 + maxIter=4 pins exactly four Newton steps from β=0, which the
    // oracle unrolls as four CTE scans with the closed-form 2×2 solve;
    // float32 output absorbs cell-summation-order noise (q23 hardening)
    "q95_glm_logit_fit" -> ((s, dir) => {
      val data = li(s, dir)
        .withColumn("ret", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
      val fit = Glm.fit("ret ~ l_quantity", data, family = "binomial",
        strategy = "compress", maxIter = 4, tol = 0.0)
      fit.toDF(s).select(col("term"),
        col("estimate").cast("float").as("estimate"),
        col("std_error").cast("float").as("std_error")).orderBy("term")
    }),

    // Poisson rate regression: E[quantity | discount], log link, same
    // four-step pin as q95
    "q96_glm_poisson_fit" -> ((s, dir) => {
      val fit = Glm.fit("l_quantity ~ l_discount", li(s, dir),
        family = "poisson", strategy = "compress", maxIter = 4, tol = 0.0)
      fit.toDF(s).select(col("term"),
        col("estimate").cast("float").as("estimate"),
        col("std_error").cast("float").as("std_error")).orderBy("term")
    }),

    // data quality: one-pass column profile (nulls, exact distincts,
    // min/max/mean) unpivoted to one row per column
    "q123_profile" -> ((s, dir) =>
      graft.sources.ScaleOps.profile(li(s, dir),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_orderkey", "l_linenumber"), exactDistinct = true)
        .select(col("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"),
          col("mean_val").cast("float").as("mean_val"))
        .orderBy("col_name")),

    // drift monitor: PSI of extendedprice between two md5-dealt halves —
    // reference-anchored equal-width bins, Laplace-smoothed contributions
    "q124_psi_drift" -> ((s, dir) => {
      val d = li(s, dir).withColumn("rid",
        concat_ws("_", col("l_orderkey"), col("l_linenumber")))
      val dealt = graft.sources.ScaleOps.hashSplit(d, "rid",
        Seq("ref" -> 0.5, "cur" -> 0.5), salt = "q124")
      graft.reg.Eval.psi(
        dealt.filter(col("split") === "ref"),
        dealt.filter(col("split") === "cur"),
        col("l_extendedprice"), bins = 10)
        .select(col("bin"), col("n_ref"), col("n_cur"),
          col("contrib").cast("float").as("contrib"))
    }),

    // experimentation: Welch A/B readout, treated = returnflag 'R'
    "q132_ab_test" -> ((s, dir) =>
      graft.reg.Eval.abTest(li(s, dir),
        col("l_returnflag") === "R", col("l_extendedprice"))
        .select(col("n_a"), col("n_b"),
          col("mean_a").cast("float").as("mean_a"),
          col("mean_b").cast("float").as("mean_b"),
          col("diff").cast("float").as("diff"),
          col("se").cast("float").as("se"),
          col("t").cast("float").as("t"),
          col("df").cast("float").as("df"))),

    // features: winsorize extendedprice into [p01, p99]; clip counts and
    // the tamed mean prove the bounds and the projection
    "q133_winsorize" -> ((s, dir) => {
      val w = graft.operators.Features.winsorize(li(s, dir),
        col("l_extendedprice"), 0.01, 0.99)
      w.agg(
        sum(when(col("l_extendedprice") < col("w"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("l_extendedprice") > col("w"), 1L).otherwise(0L)).as("n_hi"),
        avg(col("w")).cast("float").as("mean_w"),
        avg(col("l_extendedprice")).cast("float").as("mean_raw"))
    }),

    // features: smoothed target encoding of returnflag vs extendedprice;
    // min=max per category proves the attach join agrees with the stats
    "q130_target_encode" -> ((s, dir) =>
      graft.operators.Features.targetEncode(li(s, dir), "l_returnflag",
        col("l_extendedprice"), m = 10.0)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          min(col("te")).cast("float").as("te_min"),
          max(col("te")).cast("float").as("te_max"))
        .orderBy("l_returnflag")),

    // data quality: median/MAD robust outlier stats (exact percentile,
    // the q60 quantile_cont parity)
    "q131_robust_outliers" -> ((s, dir) =>
      graft.operators.Features.robustOutlierStats(li(s, dir),
        col("l_extendedprice"), k = 3.0)),

    // uncertainty: Poisson-bootstrap percentile CI for mean(n_chars) —
    // 100 deterministic replicates in ONE scan (two array-sum aggregates)
    "q129_bootstrap_ci" -> ((s, dir) =>
      graft.reg.Bootstrap.meanCI(docs(s, dir), col("n_chars"), "doc_id",
        reps = 100, level = 0.95, salt = "q129")
        .select(col("est").cast("float").as("est"),
          col("lo").cast("float").as("lo"), col("hi").cast("float").as("hi"),
          col("n"), col("reps_used"))),

    // dependence: Spearman rank correlation (average ranks for ties) —
    // distinct-value rank windows + value-keyed joins + 1-row moments
    // exact = Some(true): this query pins the EXACT average-rank algebra
    // cross-engine at every SF (l_extendedprice crosses the auto probe's
    // 2^17 distinct bound at sf0.1, where auto would route bucketed and
    // diverge from the exact oracle); the bucketed regime is pinned by
    // q227 and EvalSpec
    "q127_spearman" -> ((s, dir) =>
      graft.reg.Eval.spearman(li(s, dir),
        col("l_quantity"), col("l_extendedprice"), exact = Some(true))
        .select(col("rho").cast("float").as("rho"), col("n"))),

    // dependence: chi2 / Cramer's V / mutual information between two
    // categorical columns from ONE contingency aggregation
    "q128_categorical_assoc" -> ((s, dir) =>
      graft.reg.Eval.categoricalAssociation(li(s, dir),
        col("l_returnflag"), col("l_linestatus"))
        .select(col("chi2").cast("float").as("chi2"),
          col("cramers_v").cast("float").as("cramers_v"),
          col("mi").cast("float").as("mi"), col("n"))),

    // drift: two-sample KS statistic between the md5 halves — the AUC
    // pattern (keyed agg per distinct value, window over distincts only)
    "q125_ks_test" -> ((s, dir) => {
      val d = li(s, dir).withColumn("rid",
        concat_ws("_", col("l_orderkey"), col("l_linenumber")))
      val dealt = graft.sources.ScaleOps.hashSplit(d, "rid",
        Seq("ref" -> 0.5, "cur" -> 0.5), salt = "q125")
      // exact = Some(true): pins the exact CDF algebra at every SF (the
      // q127 rationale — l_extendedprice crosses the auto bound at sf0.1)
      graft.reg.Eval.ksTest(
        dealt.filter(col("split") === "ref"),
        dealt.filter(col("split") === "cur"),
        col("l_extendedprice"), exact = Some(true))
        .select(col("d").cast("float").as("d"), col("n_ref"), col("n_cur"))
    }),

    // tokenizer training: first 6 BPE merge rules learned from the corpus
    // (pair counting distributed over the vocab table, deterministic ties)
    "q134_bpe_train" -> ((s, dir) =>
      TextOps.bpeTrain(docs(s, dir), "text", numMerges = 6)
        .orderBy("rank")),

    // sample-trained tokenizer (the production shape: learn ranks on a
    // deterministic md5 half-sample, segment the full corpus after)
    "q199_bpe_train_sampled" -> ((s, dir) =>
      TextOps.bpeTrain(docs(s, dir), "text", numMerges = 6,
          sampleFraction = 0.5)
        .orderBy("rank")),

    // tokenizer apply: segment the corpus under the 6 learned rules and
    // count symbols before/after (token counting under the real tokenizer)
    "q135_bpe_segment" -> ((s, dir) => {
      val rules = TextOps.bpeTrain(docs(s, dir), "text", numMerges = 6)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextOps.bpeSegmentStats(docs(s, dir), "text", rules)
    }),

    // corpus distance: Jensen-Shannon divergence between the token
    // distributions of two md5-dealt document halves
    "q126_js_divergence" -> ((s, dir) => {
      val dealt = graft.sources.ScaleOps.hashSplit(docs(s, dir), "doc_id",
        Seq("ref" -> 0.5, "cur" -> 0.5), salt = "q126")
      TextOps.jsDivergence(
        dealt.filter(col("split") === "ref"),
        dealt.filter(col("split") === "cur"), "text")
        .select(col("jsd").cast("float").as("jsd"),
          col("vocab_ref"), col("vocab_cur"))
    }),

    // collocations: top-20 bigrams by PMI (count floor 5); token-keyed
    // count joins + broadcast totals, TakeOrdered cut
    "q121_pmi_collocations" -> ((s, dir) =>
      TextOps.pmiCollocations(docs(s, dir), "doc_id", "text",
        minCount = 5L, k = 20)
        .select(col("w1"), col("w2"), col("c12"),
          col("pmi").cast("float").as("pmi"))),

    // corpus statistics: Zipf frequency spectrum (count-of-counts) of the
    // token distribution — two keyed aggs, integer-exact
    "q122_zipf_spectrum" -> ((s, dir) =>
      docs(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .groupBy("freq").agg(count(lit(1)).as("n_tokens"))
        .orderBy("freq")),

    // feature selection: chi-squared token-label association, label =
    // "doc mentions spark"; one token-keyed agg + broadcast totals, top-15
    "q119_token_chi2" -> ((s, dir) => {
      val d = docs(s, dir)
      TextOps.tokenLabelAssociation(d, "doc_id", "text",
        array_contains(TextOps.tokens(col("text")), "spark"), k = 15)
        .select(col("token"), col("df"), col("chi2").cast("float").as("chi2"))
    }),

    // split-conformal prediction intervals: deterministic md5 deal into
    // fit/test, inner deal into train/calibration, qhat = k-th smallest
    // calibration |resid|; distribution-free coverage checked on test
    "q118_conformal_intervals" -> ((s, dir) => {
      val data = li(s, dir).withColumn("rid",
        concat_ws("_", col("l_orderkey"), col("l_linenumber")))
      val dealt = graft.sources.ScaleOps.hashSplit(data, "rid",
        Seq("fit" -> 0.8, "test" -> 0.2), salt = "q118o")
      val fitPart = dealt.filter(col("split") === "fit").drop("split")
      val test = dealt.filter(col("split") === "test").drop("split")
      val cm = graft.reg.Conformal.fit("l_extendedprice ~ l_quantity",
        fitPart, "rid", alpha = 0.1, salt = "q118i", strategy = "moments")
      cm.intervals(test)
        .agg(
          count(lit(1)).as("n_test"),
          avg((col("l_extendedprice") >= col("lo") &&
            col("l_extendedprice") <= col("hi")).cast("double"))
            .cast("float").as("coverage"))
        .withColumn("qhat", lit(cm.qhat).cast("float"))
        .withColumn("n_cal", lit(cm.nCal))
    }),

    // retrieval: Okapi BM25 top-25 for a fixed query-term bag — ONE corpus
    // scan (postings filtered to the query terms BEFORE any shuffle), df
    // and corpus stats broadcast, top-k via TakeOrderedAndProject; output
    // re-sorted by id so float rank noise can't reorder the hash compare
    "q117_bm25_topk" -> ((s, dir) =>
      TextOps.bm25TopK(docs(s, dir), "doc_id", "text",
        Seq("hash", "join", "stream", "vector"), k = 25)
        .select(col("id"), col("bm25").cast("float").as("bm25"),
          col("n_matched"))
        .orderBy("id")),

    // k-fold CV ridge: the whole λ grid evaluated from ONE keyed moments
    // scan (per-fold triangles; train = total − fold driver-side); the
    // md5 fold deal makes the procedure DuckDB-reproducible
    "q116_cv_ridge" -> ((s, dir) => {
      val data = li(s, dir).withColumn("rid",
        concat_ws("_", col("l_orderkey"), col("l_linenumber")))
      val cv = graft.reg.Ridge.cv("l_extendedprice ~ l_quantity", data, "rid",
        lambdas = Seq(0.0, 0.1, 1.0, 10.0, 100.0, 1000.0),
        folds = 5, salt = "q116")
      cv.toDF(s).select(col("lambda"),
        col("cv_sse").cast("float").as("cv_sse"), col("chosen"))
        .orderBy("lambda")
    }),

    // 2SLS: extendedprice on (endogenous) quantity instrumented by
    // linenumber — ONE joint moments scan (X∪Z∪y triangle), driver-side
    // Wald/projection solve; float32 absorbs summation-order noise
    "q115_iv_2sls" -> ((s, dir) => {
      val fit = graft.reg.Iv.fit("l_extendedprice ~ l_quantity", li(s, dir),
        endog = Seq("l_quantity"), instruments = Seq("l_linenumber"))
      fit.toDF(s).select(col("term"),
        col("estimate").cast("float").as("estimate"),
        col("std_error").cast("float").as("std_error")).orderBy("term")
    }),

    // negative-binomial count regression (NB2, fixed theta=2): quantity on
    // discount, log link, working weight mu*theta/(mu+theta); same
    // unrolled-IRLS self-proving oracle as q95/q96/q114
    "q120_glm_negbin_fit" -> ((s, dir) => {
      val fit = Glm.fit("l_quantity ~ l_discount", li(s, dir),
        family = "negbin", theta = 2.0, strategy = "compress",
        maxIter = 4, tol = 0.0)
      fit.toDF(s).select(col("term"),
        col("estimate").cast("float").as("estimate"),
        col("std_error").cast("float").as("std_error")).orderBy("term")
    }),

    // gamma rate regression: E[extendedprice | discount], log link with
    // unit working weight (V(μ)=μ² cancels), same four-step pin as q95/q96
    "q114_glm_gamma_fit" -> ((s, dir) => {
      val fit = Glm.fit("l_extendedprice ~ l_discount", li(s, dir),
        family = "gamma", strategy = "compress", maxIter = 4, tol = 0.0)
      fit.toDF(s).select(col("term"),
        col("estimate").cast("float").as("estimate"),
        col("std_error").cast("float").as("std_error")).orderBy("term")
    }),

    // capstone: the full curation pipeline as ONE lazy plan — Gopher rules
    // AND classifier score gate the corpus, exact dedup keeps one doc per
    // fingerprint class, a deterministic hash split labels train/val/test,
    // and the rollup is the only aggregation that sees the survivors.
    // Catalyst fuses the two quality gates and the fingerprint into a
    // single projection pass over the scan.
    "q100_curation_pipeline" -> ((s, dir) => {
      val sigs = TextOps.gopherSignals(col("text"), col("__t")).toMap
      val eta = lit(-1.5) +
        col("n_chars").cast("double") / 1000.0 * lit(0.8) +
        size(col("__t")).cast("double") / 100.0 * lit(1.2) -
        TextOps.punctRatio(col("text")) * lit(4.0)
      val gated = docs(s, dir)
        .withColumn("__t", TextOps.tokens(col("text")))
        .withColumn("_score", Glm.sigmoid(eta))
        .filter(sigs("keep") && col("_score") > 0.3)
        .drop("__t")
      val keepIds = Dedup.exactGroups(gated, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      val unique = gated.join(keepIds, Seq("doc_id"), "left_semi")
      graft.sources.ScaleOps
        .hashSplit(unique, "doc_id",
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05), salt = "q100")
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum("doc_id").as("sum_ids"),
          avg("_score").cast("float").as("avg_score"))
        .orderBy("split")
    }),

    // grouped GLM: one logistic fit PER GROUP (per-domain classifier
    // calibration) — three pinned Newton steps, per-group solves
    // executor-side, compressed to (group × quantity) cells first
    "q99_glm_grouped_fit" -> ((s, dir) => {
      val data = li(s, dir)
        .withColumn("hi", when(col("l_discount") > 0.05, 1.0).otherwise(0.0))
      Glm.fitGrouped("hi ~ l_quantity", data, "l_returnflag",
        family = "binomial", strategy = "compress", maxIter = 3)
        .select(col("group"), col("term"),
          col("estimate").cast("float").as("estimate"),
          col("std_error").cast("float").as("std_error"))
        .orderBy("group", "term")
    }),

    // calibration (reliability diagram): train the classifier IN-ENGINE,
    // score every row (pure projection), bin predicted probability vs the
    // empirical rate — the oracle re-derives β with the same unrolled SQL
    "q101_calibration" -> ((s, dir) => {
      val bins = 20
      // hit = 1 with probability ≈ quantity/100 — a real monotone signal,
      // so the trained curve spans many probability bins
      val data = li(s, dir)
        .withColumn("hit",
          when(col("l_orderkey") % 100 < col("l_quantity"), 1.0).otherwise(0.0))
      val fit = Glm.fit("hit ~ l_quantity", data, family = "binomial",
        strategy = "compress", maxIter = 4, tol = 0.0)
      fit.predictResponse(data.filter(col("l_quantity").isNotNull), "mu")
        .withColumn("bin", least(floor(col("mu") * bins), lit(bins - 1)).cast("long"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          avg("mu").cast("float").as("mean_pred"),
          avg("hit").cast("float").as("emp_rate"))
        .orderBy("bin")
    }),

    // classifier SCORING at corpus scale: logistic quality score over cheap
    // text features — a pure projection (no shuffle, no UDF); the weights
    // are fixed (a trained classifier applied, fastText-style)
    "q97_glm_score" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("_eta",
          lit(-1.5)
            + col("n_chars").cast("double") / 1000.0 * lit(0.8)
            + TextOps.tokenCount(col("text")).cast("double") / 100.0 * lit(1.2)
            - TextOps.punctRatio(col("text")) * lit(4.0))
        // float32 output: Math.exp vs DuckDB exp differ in the last ulp on
        // ~4% of rows; double→float rounding is IEEE-identical in both
        .select(col("doc_id"),
          Glm.sigmoid(col("_eta")).cast("float").as("score"),
          (Glm.sigmoid(col("_eta")) > 0.5).as("keep"))
        .orderBy("doc_id")),

    // ---- WLS (beyond-reference extension): weighted moments = exact WLS ----
    "q49_wls_fit" -> ((s, dir) => {
      val data = li(s, dir).withColumn("w", col("l_discount") * 100.0 + 1.0)
      val fit = Dbreg.fit("l_extendedprice ~ l_quantity", data,
        strategy = "moments", weights = Some("w"))
      fit.toDF(s).select(col("term"), col("estimate"), col("std_error")).orderBy("term")
    }),

    // ---- K9: prediction standard errors (confidence + prediction width) ----
    // (l_orderkey, l_linenumber) is not unique in the synthetic lineitem, so
    // the newdata grid is deduped deterministically (min quantity per key)
    // before predicting — both engines build the identical grid.
    "q50_predict_se" -> ((s, dir) => {
      val data = li(s, dir)
      val fit = Dbreg.fit("l_extendedprice ~ l_quantity", data, strategy = "moments")
      val sub = data.filter(col("l_orderkey") <= 50)
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(min(col("l_quantity")).as("l_quantity"))
      val pc = fit.predict(sub, interval = "confidence")
        .select(col("l_orderkey"), col("l_linenumber"), col("fit"), col("se").as("se_fit"))
      val pp = fit.predict(sub, interval = "prediction")
        .select(col("l_orderkey"), col("l_linenumber"), col("se").as("se_pred"))
      pc.join(pp, Seq("l_orderkey", "l_linenumber"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- gof: R², adjusted R², RMSE (reference gof.R:10-27) ----
    "q51_gof" -> ((s, dir) => {
      val fit = Dbreg.fit("l_extendedprice ~ l_quantity + l_discount", li(s, dir),
        strategy = "moments")
      import s.implicits._
      Seq((fit.r2, fit.adjR2, fit.rmse, fit.nobsOrig))
        .toDF("r2", "adj_r2", "rmse", "n")
    })
  ) ++ pipelineQueries

  // ------------------------------------------------------------ pipeline ops

  private def pipelineQueries: Map[String, Q] = Map[String, Q](
    // dedup: exact fingerprint groups (summary, 1 row)
    "q30_dedup_exact" -> ((s, dir) => {
      val g = Dedup.exactGroups(docs(s, dir), "doc_id", "text")
      g.agg(
        sum(col("n_docs")).as("n_docs"),
        count(lit(1)).as("n_unique"),
        sum(when(col("n_docs") > 1, 1).otherwise(0)).as("n_dup_groups"))
    }),

    // dedup: all-pairs word-bigram Jaccard ≥ 0.4
    "q31_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(docs(s, dir), "doc_id", "text", n = 2, threshold = 0.4)
        .orderBy("id1", "id2")),

    // dedup: MinHash signatures (stringified for cross-engine compare)
    "q32_minhash_sigs" -> ((s, dir) =>
      Dedup.minhashSignatures(docs(s, dir), "doc_id", "text", n = 2)
        .select(col("id"), concat_ws(",", col("sig").cast("array<string>")).as("sig"))
        .orderBy("id")),

    // dedup: MinHash+LSH candidates verified by true Jaccard
    "q33_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashPairs(docs(s, dir), "doc_id", "text", n = 2, threshold = 0.5)
        .orderBy("id1", "id2")),

    // dedup: 16-bit SimHash signatures
    "q34_simhash" -> ((s, dir) =>
      Dedup.simhash(docs(s, dir), "doc_id", "text").orderBy("id")),

    // dedup: transitive duplicate clusters (connected components over
    // the Jaccard pair graph)
    "q43_dup_clusters" -> ((s, dir) =>
      Dedup.duplicateClusters(
        Dedup.jaccardPairs(docs(s, dir), "doc_id", "text", n = 2, threshold = 0.4))
        .orderBy("id")),

    // similarity: brute-force cosine top-5 for 5 query vectors
    "q35_knn_brute" -> ((s, dir) =>
      Similarity.bruteForceTopK(emb(s, dir), "vec_id", "embedding", Seq(0L, 1L, 2L, 3L, 4L), 5)
        .orderBy("query_id", "rank")),

    // similarity: sign-LSH bucketed top-5 (same queries, approximate)
    "q36_knn_lsh" -> ((s, dir) =>
      Similarity.lshTopK(emb(s, dir), "vec_id", "embedding", Seq(0L, 1L, 2L, 3L, 4L), 5,
        dim = 64, nPlanes = 8)
        .orderBy("query_id", "rank")),

    // similarity: IVF coarse-quantizer top-5 (deterministic centroids)
    "q41_knn_ivf" -> ((s, dir) =>
      Similarity.ivfTopK(emb(s, dir), "vec_id", "embedding", Seq(0L, 1L, 2L, 3L, 4L), 5,
        nCentroids = 16, nprobe = 4)
        .orderBy("query_id", "rank")),

    // similarity graph: exact kNN self-join (every vector a query) —
    // the O(n²) baseline the blocked q204 is judged against
    "q203_knn_join_brute" -> ((s, dir) =>
      Similarity.knnJoinBrute(emb(s, dir), "vec_id", "embedding", 3)
        .orderBy("query_id", "rank")),

    // similarity graph at scale: IVF-blocked kNN self-join — corpus
    // probes its nprobe nearest cells via the codegen'd NearestCells
    // projection, ONE equi join on cell, per-query bounded windows
    "q204_knn_join" -> ((s, dir) =>
      Similarity.knnJoin(emb(s, dir), "vec_id", "embedding", 3,
        nCentroids = 16, nprobe = 2)
        .orderBy("query_id", "rank")),

    // similarity-graph clustering: the q204 kNN self-join feeds CC —
    // the embedding-space dual of q201's LSH-pairs→CC composition
    // (near-dup neighborhoods from the ANN graph, not shingle collisions)
    "q208_knn_graph_clusters" -> ((s, dir) => {
      val pairs = Similarity.knnJoin(emb(s, dir), "vec_id", "embedding", 3,
          nCentroids = 16, nprobe = 2)
        .filter(col("cos") >= 0.3)
        .select(least(col("query_id"), col("neighbor_id")).as("id1"),
          greatest(col("query_id"), col("neighbor_id")).as("id2"))
        .distinct()
      graft.operators.Graphs.connectedComponents(pairs, "id1", "id2")
        .orderBy("node")
    }),

    // persisted IVF index roundtrip: build (iters=0 keeps q41's
    // deterministic centroid seed) writes the corpus hive-partitioned by
    // cell; the query path prunes to the probed cell DIRECTORIES and must
    // reproduce the in-memory ivfTopK result bit-for-bit (oracle = q41's)
    "q92_vector_index" -> ((s, dir) => {
      val e = emb(s, dir)
      val idx = java.nio.file.Files
        .createTempDirectory("graft-vindex").toString
      graft.pipeline.VectorIndex.build(e, "vec_id", "embedding", idx,
        k = 16, iters = 0)
      graft.pipeline.VectorIndex.topK(s, idx, e.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 5, nprobe = 4)
        .orderBy("query_id", "rank")
    }),

    // text analysis: language ID + quality + token counts + fingerprint
    // (tokenize ONCE per row, reuse the array for every feature)
    "q37_text_analysis" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("__t", TextOps.tokens(col("text")))
        .select(
          col("doc_id"),
          TextOps.langIdT(col("text"), col("__t")).as("lang_pred"),
          TextOps.qualityScoreT(col("text"), col("__t")).as("quality"),
          size(col("__t")).as("n_tokens"),
          TextOps.subwordCount(col("text")).as("n_subwords"),
          TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // text analysis: aggregate quality stats per source
    "q38_text_quality_agg" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("__t", TextOps.tokens(col("text")))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n"),
          avg(size(col("__t"))).as("avg_tokens"),
          avg(TextOps.stopwordRatioT(col("__t"))).as("avg_stopword_ratio"),
          avg(length(col("text"))).as("avg_chars"))
        .orderBy("source")),

    // text analysis: corpus vocabulary top-k (explode → count → top-k)
    "q42_vocab_topk" -> ((s, dir) =>
      docs(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(50)),

    // stratified per-group top-k via PARTITIONED window (vs q16's global
    // window): first 3 docs per source by id
    "q44_stratified_topk" -> ((s, dir) => {
      val w = Window.partitionBy("source").orderBy("doc_id")
      docs(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("source"), col("doc_id"), col("rn"))
        .orderBy("source", "rn")
    }),

    // embedding near-duplicate clusters: exact cosine pairs → connected
    // components (composition of Similarity + Dedup operators)
    "q47_embedding_dup_clusters" -> ((s, dir) =>
      Dedup.duplicateClusters(
        Similarity.cosineNearDupPairsExact(emb(s, dir), "vec_id", "embedding", 0.45))
        .orderBy("id")),

    // text analysis: corpus-trained bigram LM quality score per doc
    "q46_lm_score" -> ((s, dir) =>
      TextOps.bigramLmScores(docs(s, dir), "doc_id", "text").orderBy("id")),

    // the TRUE CCNet split (Wenzek et al. 2020): the bigram LM trains on
    // the reference slice (en docs) and scores the WHOLE corpus — docs
    // surprising under the reference (OOV-heavy, cross-lingual) score low
    "q210_crosscorpus_lm" -> ((s, dir) => {
      val d = docs(s, dir)
      val model = TextOps.bigramLmTrain(d.filter(col("lang") === "en"), "text")
      TextOps.bigramLmScoreWith(model, d, "doc_id", "text").orderBy("id")
    }),

    // text analysis: per-document top TF-IDF term (deterministic tiebreak)
    "q55_tfidf_top_term" -> ((s, dir) => {
      val w = Window.partitionBy("id").orderBy(col("tfidf").desc, col("token").asc)
      TextOps.tfidf(docs(s, dir), "doc_id", "text")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("id"), col("token"), col("tf"), col("tfidf"))
        .orderBy("id")
    }),

    // fingerprinting: winnowing over char-8-gram hashes, window 4
    "q52_winnow_fingerprint" -> ((s, dir) =>
      TextOps.winnowFingerprints(docs(s, dir), "doc_id", "text", k = 8, w = 4)
        .select(col("id"), size(col("fps")).as("n_fp"), array_min(col("fps")).as("min_fp"))
        .orderBy("id")),

    // dedup ACTION: drop all but the minimum-id member of each transitive
    // near-duplicate cluster (left-anti join; corpus never shuffled)
    "q57_dedup_corpus" -> ((s, dir) => {
      val pairs = Dedup.jaccardPairs(docs(s, dir), "doc_id", "text", n = 2, threshold = 0.4)
      Dedup.dedupCorpus(docs(s, dir), "doc_id", pairs)
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("sum_kept_ids"))
    }),

    // decontamination: corpus docs sharing ≥ 80% of their bigram shingles
    // with a benchmark set (a deterministic doc_id-slice stands in for the
    // held-out suite); benchmark shingle set broadcast, corpus never shuffled
    "q70_contamination" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.contamination(d, d.filter(col("doc_id") % 37 === 0), "doc_id", "text", n = 2)
        .filter(col("contamination") >= 0.8)
        .orderBy("id")
    }),

    // quality: Gopher-style repetition signals, shuffle-free per-row arrays
    "q71_repetition" -> ((s, dir) =>
      TextOps.repetitionStats(docs(s, dir), "doc_id", "text").orderBy("id")),

    // dedup: SimHash near-dup pairs via bit-band LSH + exact popcount
    // verify. maxHamming=3 → 4 bands: pigeonhole makes recall perfect, so
    // the result equals the brute-force all-pairs filter the oracle runs.
    // bits pinned to the 16-bit oracle signature (q34); the operator's
    // scale default is the full 32-bit signature. maxBucketSize=None makes
    // the exact-equality pin unconditional: 16-bit sigs have only 2^4
    // buckets per band, so at corpus sizes beyond ~16k distinct signatures
    // the default valve would silently drop candidates and the parity
    // would hold only by accident of testdata size
    "q72_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxHamming = 3,
        bits = Dedup.SimhashBits, maxBucketSize = None)
        .orderBy("id1", "id2")),

    // PII scrub: per-category counts + redacted-text fingerprint over a
    // deterministically PII-planted corpus (the raw testdata has no PII,
    // so the plant makes every count column non-trivial; the oracle plants
    // the identical strings)
    "q73_pii_scrub" -> ((s, dir) => {
      val planted = docs(s, dir).select(
        col("doc_id"),
        concat(
          col("text"),
          lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
          lit(" ip 10."), (col("doc_id") % 256).cast("string"), lit(".0.1"),
          lit(" call +1 415-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          when(col("doc_id") % 3 === 0, lit(" ssn 123-45-6789")).otherwise(lit("")),
          lit(" see https://example.com/a?b=c")
        ).as("text"))
      val counts = TextOps.piiCounts(col("text")).map { case (n, c) => c.as(s"n_$n") }
      planted.select(
        col("doc_id") +: counts :+
          md5(TextOps.redactPii(col("text"))).as("redacted_md5"): _*)
        .orderBy("doc_id")
    }),

    // markup strip: visible text + markup ratio over a deterministically
    // HTML-wrapped corpus (raw testdata has no markup, so the wrap makes
    // both outputs non-trivial; the oracle wraps the identical strings).
    // Every doc gets chrome + tags; every third doc a script payload that
    // must vanish entirely, every fifth an entity run that must decode.
    "q91_strip_markup" -> ((s, dir) => {
      val planted = docs(s, dir).select(
        col("doc_id"),
        concat(
          lit("<html><head><title>d"), col("doc_id").cast("string"),
          lit("</title><style>body { color: red; }</style></head><body>"),
          when(col("doc_id") % 3 === 0,
            lit("<script type=\"text/javascript\">var x = 1 < 2;</script>"))
            .otherwise(lit("")),
          lit("<!-- nav --><div class=\"nav\"><a href=\"/home\">Home</a></div><p>"),
          col("text"),
          lit("</p>"),
          when(col("doc_id") % 5 === 0,
            lit("<p>a &amp;lt; b &nbsp;&gt; c &quot;q&quot; &#39;s&#39;</p>"))
            .otherwise(lit("")),
          lit("</body></html>")
        ).as("text"))
      planted.select(
        col("doc_id"),
        md5(TextOps.stripMarkup(col("text"))).as("visible_md5"),
        TextOps.markupRatio(col("text")).as("markup_ratio"))
        .orderBy("doc_id")
    }),

    // context-window chunking: fixed-size token chunks with overlap —
    // narrow posexplode, no shuffle; the corpus-rewrite shape
    "q74_chunking" -> ((s, dir) =>
      TextOps.chunkDocs(docs(s, dir), "doc_id", "text", chunkTokens = 16, overlap = 4)
        .orderBy("doc_id", "chunk_idx")),

    // URL/domain extraction + per-domain rollup (CCNet scores sources by
    // domain, not just documents). Plant deterministic URLs — raw testdata
    // has none; the oracle plants the identical strings.
    "q75_url_domains" -> ((s, dir) => {
      val planted = docs(s, dir).select(
        col("doc_id"),
        concat(
          col("text"),
          lit(" see https://site"), (col("doc_id") % 7).cast("string"),
          lit(".example.org/p/"), col("doc_id").cast("string"),
          lit(" and http://cdn.example.net/x?y="), (col("doc_id") % 3).cast("string")
        ).as("text"))
      TextOps.extractUrls(planted, "doc_id", "text")
        .groupBy("domain")
        .agg(count(lit(1)).as("n_urls"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy("domain")
    }),

    // CCNet-style perplexity bucketing: corpus LM scores → head/middle/tail
    // terciles → per-bucket stats. Exact-parity query uses a total-order
    // NTILE (id tiebreak); the engine-scale path bins via histQuantiles
    // (same note as q16).
    "q77_ccnet_buckets" -> ((s, dir) => {
      val scores = TextOps.bigramLmScores(docs(s, dir), "doc_id", "text")
      scores
        .withColumn("bucket",
          ntile(3).over(Window.orderBy(col("lm_score"), col("id"))))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), avg(col("lm_score")).as("avg_score"),
          max(col("lm_score")).as("max_score"))
        .orderBy("bucket")
    }),

    // deterministic weighted split: md5-keyed assignment, reproducible
    // across engines/partitions/reruns (randomSplit is neither)
    "q76_hash_split" -> ((s, dir) =>
      graft.sources.ScaleOps.hashSplit(docs(s, dir), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s1")
        .groupBy("split")
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_ids"))
        .orderBy("split")),

    // similarity: distributed k-means (2 Lloyd iterations, cosine
    // assignment, deterministic init from the k lowest-id vectors) —
    // cluster membership summary
    "q56_kmeans_cells" -> ((s, dir) => {
      val (assigned, _) = Similarity.kmeans(emb(s, dir), "vec_id", "embedding",
        k = 8, iters = 2, dim = 64)
      assigned.groupBy("cell")
        .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"))
        .orderBy("cell")
    }),

    // similarity: embedding near-dup pairs via sign-LSH buckets (the scale
    // path for q47's exact all-pairs variant). 4 planes = 16 buckets: at
    // this corpus size 8 planes shatters every near-dup pair into different
    // buckets (recall 0) — bucket count must track corpus size.
    "q53_embedding_lsh_pairs" -> ((s, dir) =>
      Similarity.cosineNearDupPairs(emb(s, dir), "vec_id", "embedding",
        dim = 64, threshold = 0.45, nPlanes = 4)
        .orderBy("id1", "id2")),

    // similarity: SemDeDup semantic dedup — kmeans cells (same deterministic
    // init/iterations as q56) then within-cell cosine pruning to the min-id
    // representative of each near-dup neighborhood
    "q78_semdedup" -> ((s, dir) =>
      Similarity.semDedup(emb(s, dir), "vec_id", "embedding",
        threshold = 0.45, k = 8, iters = 2, dim = 64)
        .select(col("id"), col("cell"), col("keep").cast("int").as("keep"))
        .orderBy("id")),

    // dedup: duplicated token-span signal (substring-level) — per-doc share
    // of 5-token windows whose text occurs more than once corpus-wide
    "q79_dup_spans" -> ((s, dir) =>
      Dedup.dupSpans(docs(s, dir), "doc_id", "text", width = 5)
        .orderBy("id")),

    // dedup: edit-distance near-dup pairs — Jaccard candidates (0.3)
    // verified by exact Levenshtein, cutoff between the corpus's real
    // near-dup distances (4) and its tail (8)
    "q87_edit_distance_pairs" -> ((s, dir) =>
      Dedup.editDistancePairs(docs(s, dir), "doc_id", "text", maxDist = 6)
        .orderBy("id1", "id2")),

    // dedup ACTION over containment: transitive clusters of embedded /
    // quoting docs, corpus keeps one representative per cluster
    "q88_containment_dedup" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.containmentPairs(d, "doc_id", "text", k = 16, w = 8,
        threshold = 0.5, maxFpDocFreq = Some(50L))
      Dedup.dedupCorpus(d, "doc_id", pairs)
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_ids"))
    }),

    // incremental dedup: flag new-shard docs duplicating the existing
    // corpus (daily-ingest shape) — candidates from shared LSH buckets
    // (new ⋈ corpus, never corpus×corpus), exact matches valve-immune.
    // Split the real corpus 90/10, relabel the 10% as the incoming shard
    "q94_dedup_against" -> ((s, dir) => {
      val d = docs(s, dir)
      val corpus = d.filter(col("doc_id") % 10 =!= 0)
      val fresh = d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      Dedup.dedupAgainst(corpus, fresh, "doc_id", "text", n = 2, threshold = 0.4)
        .orderBy("id")
    }),

    // dedup: MOSS-style containment pairs (asymmetric near-dup — quote /
    // boilerplate detection Jaccard misses). k=16 chars: grams must be
    // SELECTIVE (MOSS uses guarantee lengths well past a word) — at k=8
    // every shared two-word phrase is a hot fingerprint and the candidate
    // join fans out quadratically; the doc-freq valve tracks corpus size
    "q83_containment_pairs" -> ((s, dir) =>
      Dedup.containmentPairs(docs(s, dir), "doc_id", "text", k = 16, w = 8,
        threshold = 0.5, maxFpDocFreq = Some(50L))
        .orderBy("id1", "id2")),

    // text: Unicode NFC normalization via the native codegen'd expression
    // (no UDF) — dedup fingerprints on un-normalized text miss
    // composed/decomposed duplicate pairs; md5 of the normalized form is
    // the cross-engine pin (DuckDB nfc_normalize shares the Unicode spec)
    "q102_nfc_normalize" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          md5(graft.functions.TextExprs.unicodeNormalize(col("text"))).as("nfc_md5"),
          (graft.functions.TextExprs.unicodeNormalize(col("text")) =!= col("text"))
            .as("changed"),
          length(graft.functions.TextExprs.unicodeNormalize(col("text")))
            .as("nfc_len"))
        .orderBy("doc_id")),

    // quality: the full Gopher rule set (word bounds, mean word length,
    // symbol/bullet/ellipsis ratios, alphabetic-word share, stopword
    // presence) — one projection, integer-exact arithmetic
    "q98_gopher_rules" -> ((s, dir) => {
      val sigs = TextOps.gopherSignals(col("text"), col("__t"))
      docs(s, dir)
        .withColumn("__t", TextOps.tokens(col("text")))
        .select(col("doc_id") +: sigs.map { case (n, c) => c.as(n) }: _*)
        .orderBy("doc_id")
    }),

    // text: per-doc token Shannon entropy (information-density quality
    // signal; low = repetitive/boilerplate)
    "q86_token_entropy" -> ((s, dir) =>
      TextOps.tokenEntropy(docs(s, dir), "doc_id", "text")
        .orderBy("id")),

    // packing: GPT-style sequence packing — deterministic hash-order token
    // stream cut at 512-token boundaries; each doc's (pack, offset)
    "q84_pack_sequences" -> ((s, dir) =>
      TextOps.packSequences(docs(s, dir), "doc_id", "text", window = 512,
        salt = "q84")
        .orderBy("id")),

    // packing, sharded: the 100 TB layout path — pack ids count within
    // each lang shard, so the global-cumsum sort parallelizes per shard
    "q232_pack_sharded" -> ((s, dir) =>
      TextOps.packSequences(docs(s, dir), "doc_id", "text", window = 512,
        salt = "q232", shardCol = Some("lang"))
        .orderBy("id")),

    // dedup: Lee et al. 2022 exact-substring REMOVAL — keep the first
    // corpus occurrence of every duplicated 5-token span, strip every
    // other occurrence, reconstruct the cleaned text
    "q233_dedup_span_removal" -> ((s, dir) =>
      Dedup.removeDupSpans(docs(s, dir), "doc_id", "text", width = 5)
        .orderBy("id")),

    // sampling: per-domain TOKEN budgets (the "N billion tokens of web"
    // training-mix cut) — exact two-phase histogram-CDF form, keep set
    // identical to the naive per-domain cumulative window
    "q234_token_budget_mix" -> ((s, dir) =>
      graft.sources.ScaleOps.sampleToTokenBudget(docs(s, dir), "lang",
          "doc_id", TextOps.tokenCount(col("text")),
          Seq("en" -> 4000L, "de" -> 1500L, "zh" -> 900L), salt = "q234")
        .select(col("doc_id").as("id"), col("lang"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .orderBy("id")),

    // sampling: the window-free approx twin — per-domain Bernoulli at
    // rate budget/total_tokens, token mass correct in expectation
    "q235_token_budget_approx" -> ((s, dir) =>
      graft.sources.ScaleOps.sampleToTokenBudgetApprox(docs(s, dir), "lang",
          "doc_id", TextOps.tokenCount(col("text")),
          Seq("en" -> 4000L, "de" -> 1500L, "zh" -> 900L), salt = "q235")
        .select(col("doc_id").as("id"), col("lang"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .orderBy("id")),

    // sampling: priority token budget — keep the HIGHEST-quality docs per
    // domain until the token budget (two-phase quantile-bin cut, keep set
    // identical to the naive priority window)
    "q237_top_token_budget" -> ((s, dir) =>
      graft.sources.ScaleOps.takeTopTokenBudget(docs(s, dir), "lang",
          "doc_id", TextOps.tokenCount(col("text")),
          TextOps.qualityScore(col("text")),
          Seq("en" -> 4000L, "de" -> 1500L, "zh" -> 900L))
        .select(col("doc_id").as("id"), col("lang"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .orderBy("id")),

    // dedup: incremental span removal — clean an incoming shard against
    // the corpus's persisted span-fingerprint set (corpus spans strip
    // fully; within-shard repeats keep the shard's first occurrence)
    "q240_span_removal_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val corpus = d.filter(col("doc_id") % 10 =!= 0)
      val fresh = d.filter(col("doc_id") % 10 === 0)
      val fps = Dedup.spanFingerprints(corpus, "doc_id", "text", width = 5)
      Dedup.removeDupSpansAgainst(fps, fresh, "doc_id", "text", width = 5)
        .orderBy("id")
    }),

    // layout end-to-end: z-order write → manifest-pruned scan must return
    // EXACTLY the rows a plain filter returns (the file skipping is
    // invisible to semantics) — oracle is the plain box predicate
    "q239_zorder_scan" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("lang"),
        col("n_chars"), TextOps.tokenCount(col("text")).cast("long").as("nt"))
      graft.sources.ScaleOps.zorderWrite(d, zorderTmpDir(dir, "q239"),
        bits = 8, numFiles = 16, zcols = Seq("n_chars", "nt"))
      graft.sources.ScaleOps.zorderScan(s, zorderTmpDir(dir, "q239"),
          Seq(("n_chars", 200.0, 600.0), ("nt", 30.0, 90.0)))
        .select(col("doc_id").as("id"), col("lang"),
          col("n_chars"), col("nt").as("n_tokens"))
        .orderBy("id")
    }),

    // layout growth: base z-order write, then TWO zorderAppend batches
    // (each clustered within itself, manifest extended with their
    // per-file stats) — the pruned scan over the grown layout must
    // return exactly the plain box filter over ALL documents
    "q255_zorder_append" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("lang"),
        col("n_chars"), TextOps.tokenCount(col("text")).cast("long").as("nt"))
      val tmp = zorderTmpDir(dir, "q255")
      graft.sources.ScaleOps.zorderWrite(
        d.filter(col("doc_id") % 3 =!= 0), tmp,
        zcols = Seq("n_chars", "nt"), bits = 8, numFiles = 12)
      graft.sources.ScaleOps.zorderAppend(
        d.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0), tmp,
        zcols = Seq("n_chars", "nt"), bits = 8, numFiles = 3)
      graft.sources.ScaleOps.zorderAppend(
        d.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 =!= 0), tmp,
        zcols = Seq("n_chars", "nt"), bits = 8, numFiles = 3)
      graft.sources.ScaleOps.zorderScan(s, tmp,
          Seq(("n_chars", 250.0, 550.0), ("nt", 40.0, 80.0)))
        .select(col("doc_id").as("id"), col("lang"),
          col("n_chars"), col("nt").as("n_tokens"))
        .orderBy("id")
    }),

    // layout → consumer pipeline: the manifest-pruned zorderScan FEEDS the
    // exact token-budget cut — file skipping must be invisible to the kept
    // set (oracle: plain box filter, then the naive per-domain window)
    "q241_zorder_budget" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("lang"),
        col("n_chars"), TextOps.tokenCount(col("text")).cast("long").as("nt"))
      graft.sources.ScaleOps.zorderWrite(d, zorderTmpDir(dir, "q241"),
        bits = 8, numFiles = 16, zcols = Seq("n_chars", "nt"))
      val pruned = graft.sources.ScaleOps.zorderScan(s,
        zorderTmpDir(dir, "q241"),
        Seq(("n_chars", 200.0, 600.0), ("nt", 30.0, 90.0)))
      graft.sources.ScaleOps.sampleToTokenBudget(pruned, "lang", "doc_id",
          col("nt"), Seq("en" -> 1500L, "de" -> 700L), salt = "q241")
        .select(col("doc_id").as("id"), col("lang"), col("nt").as("n_tokens"))
        .orderBy("id")
    }),

    // sampling: frozen-state incremental token budget — a shard's rows are
    // judged against the FULL corpus inventory's frozen phase-1 state, so
    // the kept shard rows are exactly the full-corpus cut ∩ shard
    "q242_token_budget_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val tok = TextOps.tokenCount(col("text"))
      val state = graft.sources.ScaleOps.tokenBudgetState(d, "lang",
        "doc_id", tok, Seq("en" -> 4000L, "de" -> 1500L, "zh" -> 900L),
        salt = "q242")
      val shard = d.filter(col("doc_id") % 10 === 0)
      graft.sources.ScaleOps.sampleToTokenBudgetAgainst(state, shard,
          "lang", "doc_id", tok)
        .select(col("doc_id").as("id"), col("lang"),
          tok.cast("long").as("n_tokens"))
        .orderBy("id")
    }),

    // sampling: frozen-state incremental PRIORITY budget — shard rows are
    // judged against the full corpus inventory's frozen quality ranking,
    // so the kept shard rows are exactly the full-corpus priority cut ∩
    // shard (the q242 pattern for takeTopTokenBudget)
    "q244_top_budget_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val tok = TextOps.tokenCount(col("text"))
      val q = TextOps.qualityScore(col("text"))
      val state = graft.sources.ScaleOps.topTokenBudgetState(d, "lang",
        "doc_id", tok, q, Seq("en" -> 3500L, "de" -> 1100L, "zh" -> 800L))
      val shard = d.filter(col("doc_id") % 10 === 0)
      graft.sources.ScaleOps.takeTopTokenBudgetAgainst(state, shard,
          "lang", "doc_id", tok, q)
        .select(col("doc_id").as("id"), col("lang"),
          tok.cast("long").as("n_tokens"))
        .orderBy("id")
    }),

    // sampling: materialized-priority top-token-budget — the flag stages
    // one slim (domain, key, tok, p) projection and semi-joins the kept
    // keys back; the keep set is identical to in-scan priority evaluation
    "q243_top_budget_materialized" -> ((s, dir) =>
      graft.sources.ScaleOps.takeTopTokenBudget(docs(s, dir), "lang",
          "doc_id", TextOps.tokenCount(col("text")),
          TextOps.qualityScore(col("text")),
          Seq("en" -> 3000L, "de" -> 1000L, "zh" -> 700L),
          materializePriority = true)
        .select(col("doc_id").as("id"), col("lang"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .orderBy("id")),

    // dedup: RefinedWeb-style exact LINE dedup with removal — every
    // duplicated line (5-token chunk) keeps its first (id, pos)
    // occurrence corpus-wide; byte-faithful reconstruction of survivors
    "q245_line_dedup_removal" -> ((s, dir) =>
      Dedup.removeDupLines(mlDocs(s, dir), "doc_id", "mltext")
        .orderBy("id")),

    // sampling: epoch-repeat token budgets — the UPSAMPLING mixture
    // ("2.4 epochs of wiki"): full epochs emit every row, the remainder
    // is the exact cut under the same hash order at epoch = e
    "q246_repeat_token_budget" -> ((s, dir) =>
      graft.sources.ScaleOps.repeatToTokenBudget(docs(s, dir), "lang",
          "doc_id", TextOps.tokenCount(col("text")),
          Seq("en" -> 30000L, "de" -> 9000L, "zh" -> 2000L), salt = "q246")
        .select(col("doc_id").as("id"), col("lang"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
          col("epoch"))
        .orderBy("id", "epoch")),

    // dedup: keep the BEST member of each near-duplicate cluster (highest
    // token count, ties to lowest id) instead of the canonical min-id
    "q247_dedup_keep_best" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.dedupCorpusKeepBest(d, "doc_id",
          Dedup.jaccardPairs(d, "doc_id", "text", n = 2, threshold = 0.4),
          TextOps.tokenCount(col("text")))
        .select(col("doc_id").as("id"), col("lang"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .orderBy("id")
    }),

    // dedup: incremental line dedup — corpus line fingerprints strip
    // EVERY shard occurrence; within-shard repeats keep the shard's first
    "q248_line_dedup_incremental" -> ((s, dir) => {
      val ml = mlDocs(s, dir)
      Dedup.removeDupLinesAgainst(
          Dedup.lineFingerprints(
            ml.filter(col("doc_id") % 10 =!= 0), "doc_id", "mltext"),
          ml.filter(col("doc_id") % 10 === 0), "doc_id", "mltext")
        .orderBy("id")
    }),

    // dedup: frozen-state MinHash ingest — the corpus representative and
    // bucket tables built ONCE (minhashDedupState) and the shard applied
    // against them; oracle is the full pairwise best-match ≥ threshold
    "q250_dedup_against_state" -> ((s, dir) => {
      val d = docs(s, dir)
      val state = Dedup.minhashDedupState(
        d.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", n = 2)
      val fresh = d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      Dedup.dedupAgainstState(state, fresh, "doc_id", "text", n = 2,
          threshold = 0.5)
        .orderBy("id")
    }),

    // dedup: REFRESHED MinHash state — the first-writer-wins incremental
    // refresh folds a growth shard into a frozen state (tombstoned
    // valve, config read from the state); applying the refreshed state
    // must equal the full pairwise algebra over the GROWN corpus
    "q251_dedup_refreshed_state" -> ((s, dir) => {
      val d = docs(s, dir)
      val base = d.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 9)
      val grow = d.filter(col("doc_id") % 10 === 9)
        .withColumn("doc_id", col("doc_id") + 10000000L)
      val refreshed = Dedup.minhashDedupStateRefresh(
        Dedup.minhashDedupState(base, "doc_id", "text", n = 2),
        grow, "doc_id", "text")
      val fresh = d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 20000000L)
      Dedup.dedupAgainstState(refreshed, fresh, "doc_id", "text", n = 2,
          threshold = 0.5)
        .orderBy("id")
    }),

    // dedup: incremental line dedup in BOILERPLATE mode — corpus
    // fingerprints strip every shard occurrence AND within-shard repeats
    // are scrubbed entirely (no first-occurrence survivor): the
    // nav-bar/cookie-banner scrub composed with ingest
    "q252_line_scrub_incremental" -> ((s, dir) => {
      val ml = mlDocs(s, dir)
      Dedup.removeDupLinesAgainst(
          Dedup.lineFingerprints(
            ml.filter(col("doc_id") % 10 =!= 0), "doc_id", "mltext"),
          ml.filter(col("doc_id") % 10 === 0), "doc_id", "mltext",
          keepFirst = false)
        .orderBy("id")
    }),

    // sampling: UniMax mixture — a TOTAL budget waterfilled across
    // languages (even shares, capped at 3 epochs of each language's
    // inventory), then the epoch-repeat mixture under the allocation
    // sampling: UniMax allocation from a FROZEN inventory state — the
    // daily-ingest form: the |domains|-sized token-sum sliver persists,
    // allocations re-cut from it with per-domain epochs provenance
    "q258_unimax_allocation" -> ((s, dir) => {
      val d = docs(s, dir)
      val tok = TextOps.tokenCount(col("text"))
      val state = graft.sources.ScaleOps.uniMaxState(d, "lang", tok)
      graft.sources.ScaleOps.uniMaxAllocation(state,
          totalBudget = 30000L, maxEpochs = 2)
        .orderBy("domain")
    }),

    // dedup: decontamination as INGEST — two eval suites freeze into one
    // merged shingle state, a corpus shard probes it map-side (the state
    // broadcasts; shard shingles never shuffle)
    "q263_contamination_ingest" -> ((s, dir) => {
      val d = docs(s, dir)
      val st = Dedup.contaminationStateMerge(
        Dedup.contaminationState(
          d.filter(col("doc_id") % 37 === 0), "doc_id", "text", n = 2,
          suite = "s37"),
        Dedup.contaminationState(
          d.filter(col("doc_id") % 41 === 0), "doc_id", "text", n = 2,
          suite = "s41"))
      Dedup.contaminationAgainst(st, d.filter(col("doc_id") % 5 === 1),
          "doc_id", "text", n = 2)
        .orderBy("id")
    }),

    // dedup: per-SUITE contamination attribution — the merged two-suite
    // state answers WHICH benchmark leaked into each doc (one row per
    // (doc, suite) with >= 1 shared shingle); the aggregate q263 measure
    // is the any-suite view of the same state
    "q266_contamination_by_suite" -> ((s, dir) => {
      val d = docs(s, dir)
      val st = Dedup.contaminationStateMerge(
        Dedup.contaminationState(
          d.filter(col("doc_id") % 37 === 0), "doc_id", "text", n = 2,
          suite = "s37"),
        Dedup.contaminationState(
          d.filter(col("doc_id") % 41 === 0), "doc_id", "text", n = 2,
          suite = "s41"))
      Dedup.contaminationBySuite(st, d.filter(col("doc_id") % 5 === 1),
          "doc_id", "text", n = 2)
        .orderBy("id", "suite_id")
    }),

    // dedup: decontamination SCRUB — contaminated 5-token spans (any
    // window appearing anywhere in the eval suite) are REMOVED from the
    // shard docs, every occurrence, and the text rebuilt — the Lee et al.
    // action step for docs worth keeping rather than dropping
    "q267_decontaminate_scrub" -> ((s, dir) => {
      val d = docs(s, dir)
      val st = Dedup.contaminationState(
        d.filter(col("doc_id") % 37 === 0), "doc_id", "text", n = 5,
        suite = "s37")
      Dedup.decontaminate(st, d.filter(col("doc_id") % 5 === 1),
          "doc_id", "text")
        .orderBy("id")
    }),

    // sampling: leakage-safe train/eval split — the hash split keyed on
    // the duplicate-cluster representative, so near-duplicates never
    // straddle the boundary; pairs from the exact Jaccard producer here
    // (the oracle-able one; minhashPairs is the same contract at scale)
    "q264_leakage_safe_split" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.jaccardPairs(d, "doc_id", "text",
        n = 2, threshold = 0.4)
      graft.sources.ScaleOps.leakageSafeSplit(d, "doc_id", pairs,
          Seq("train" -> 0.8, "eval" -> 0.2), salt = "q264")
        .select(col("doc_id").as("id"), col("split"))
        .orderBy("id")
    }),

    // sampling: leakage-safe split against a MERGED frozen cluster state —
    // the daily-ingest form: CC freezes once per pair batch (state =
    // dup-sized (id, cluster) map), new pair discoveries fold in with the
    // monotone min-rep merge, and the split is one corpus join + the hash
    // projection, no per-call CC. Pairs here come from the two parity
    // subcorpora (the oracle-able partial-pair shape: merged CC over two
    // partial lists differs from CC over either alone)
    "q265_leakage_split_merged_state" -> ((s, dir) => {
      val d = docs(s, dir)
      val st = Dedup.dupClusterStateMerge(
        Dedup.dupClusterState(
          Dedup.jaccardPairs(d.filter(col("doc_id") % 2 === 0),
            "doc_id", "text", n = 2, threshold = 0.4)),
        Dedup.jaccardPairs(d.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", n = 2, threshold = 0.4))
      graft.sources.ScaleOps.leakageSafeSplitAgainst(st, d, "doc_id",
          Seq("train" -> 0.8, "eval" -> 0.2), salt = "q265")
        .select(col("doc_id").as("id"), col("split"))
        .orderBy("id")
    }),

    // sampling: COMPOSED curation through the frozen cluster state —
    // leakage-safe split (merged parity-pair state), keep the train side
    // only, then the exact per-domain token budget over the survivors:
    // the "assemble a training mix without eval leakage" day, one plan
    "q268_split_then_budget" -> ((s, dir) => {
      val d = docs(s, dir)
      val st = Dedup.dupClusterStateMerge(
        Dedup.dupClusterState(
          Dedup.jaccardPairs(d.filter(col("doc_id") % 2 === 0),
            "doc_id", "text", n = 2, threshold = 0.4)),
        Dedup.jaccardPairs(d.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", n = 2, threshold = 0.4))
      val train = graft.sources.ScaleOps.leakageSafeSplitAgainst(st, d,
          "doc_id", Seq("train" -> 0.8, "eval" -> 0.2), salt = "q268")
        .filter(col("split") === "train")
      graft.sources.ScaleOps.sampleToTokenBudget(train, "lang",
          "doc_id", TextOps.tokenCount(col("text")),
          Seq("en" -> 3000L, "de" -> 1200L, "zh" -> 700L), salt = "q268")
        .select(col("doc_id").as("id"), col("lang"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .orderBy("id")
    }),

    // incremental dedup, ALL-MATCHES mode: EVERY above-threshold
    // (new doc, resident representative) pair, not just the best — the
    // cross-corpus edge producer for the DupClusterState daily refresh
    // (the top-1 dup_of under-connects when one new doc bridges two
    // distinct resident clusters). Hits-sized: unmatched docs emit no row
    "q269_dedup_against_all" -> ((s, dir) => {
      val d = docs(s, dir)
      val corpus = d.filter(col("doc_id") % 10 =!= 0)
      val fresh = d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      Dedup.dedupAgainstStateAll(
          Dedup.minhashDedupState(corpus, "doc_id", "text", n = 2),
          fresh, "doc_id", "text", n = 2, threshold = 0.4)
        .orderBy("id", "dup_of")
    }),

    // dedup: the COMPLETE DupClusterState daily-refresh recipe — fold a
    // shard's internal pairs AND its cross-corpus matches (all-matches
    // mode against the frozen resident MinHash state) into the frozen
    // cluster map; result must equal a from-scratch rebuild over
    // resident ∪ shard (the oracle computes exactly that rebuild), so a
    // new near-dup of a resident doc can never straddle a later split
    "q270_cluster_refresh_cross" -> ((s, dir) => {
      val d = docs(s, dir)
      val resident = d.filter(col("doc_id") % 10 =!= 0)
      val shard = d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      val clusterSt = Dedup.dupClusterState(
        Dedup.minhashPairs(resident, "doc_id", "text",
          n = 2, threshold = 0.4))
      val mhSt = Dedup.minhashDedupState(resident, "doc_id", "text", n = 2)
      Dedup.dupClusterStateIngest(clusterSt, mhSt, shard, "doc_id", "text",
          n = 2, threshold = 0.4)
        .clusters
        .orderBy("id")
    }),

    // dedup: per-SUITE decontamination report — which benchmark's spans
    // the scrub cut: token positions masked per (doc, suite), hits-sized
    // (the union of per-suite masks is q267's n_removed, not their sum)
    "q271_decontaminate_by_suite" -> ((s, dir) => {
      val d = docs(s, dir)
      val st = Dedup.contaminationStateMerge(
        Dedup.contaminationState(
          d.filter(col("doc_id") % 37 === 0), "doc_id", "text", n = 5,
          suite = "s37"),
        Dedup.contaminationState(
          d.filter(col("doc_id") % 41 === 0), "doc_id", "text", n = 5,
          suite = "s41"))
      Dedup.decontaminateBySuite(st, d.filter(col("doc_id") % 5 === 1),
          "doc_id", "text")
        .orderBy("id", "suite_id")
    }),

    // sampling: UniMax allocation from MERGED shard inventories — token
    // sums are additive, so two shard states re-sum into the union state
    // (the monotone daily refresh); allocation must equal the live frame's
    "q262_unimax_merged_allocation" -> ((s, dir) => {
      val d = docs(s, dir)
      val tok = TextOps.tokenCount(col("text"))
      val st = graft.sources.ScaleOps.uniMaxStateMerge(
        graft.sources.ScaleOps.uniMaxState(
          d.filter(col("doc_id") % 2 === 0), "lang", tok),
        graft.sources.ScaleOps.uniMaxState(
          d.filter(col("doc_id") % 2 =!= 0), "lang", tok))
      graft.sources.ScaleOps.uniMaxAllocation(st,
          totalBudget = 45000L, maxEpochs = 3)
        .orderBy("domain")
    }),

    "q254_unimax_mixture" -> ((s, dir) => {
      val d = docs(s, dir)
      val tok = TextOps.tokenCount(col("text"))
      val budgets = graft.sources.ScaleOps.uniMaxBudgets(d, "lang", tok,
        totalBudget = 50000L, maxEpochs = 3)
      graft.sources.ScaleOps.repeatToTokenBudget(d, "lang", "doc_id", tok,
          budgets, salt = "q254")
        .select(col("doc_id").as("id"), col("lang"),
          tok.cast("long").as("n_tokens"), col("epoch"))
        .orderBy("id", "epoch")
    }),

    // similarity: persisted-index APPEND — shard vectors assigned by the
    // FROZEN centroids land beside the existing cell partitions; the
    // pruned top-k over the grown index must equal the in-memory IVF
    // search over the grown corpus under the same codebook
    "q256_vector_index_append" -> ((s, dir) => {
      val e = emb(s, dir)
      val idx = java.nio.file.Files
        .createTempDirectory("graft-vindex-app").toString
      graft.pipeline.VectorIndex.build(
        e.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding", idx,
        k = 16, iters = 0)
      graft.pipeline.VectorIndex.append(
        e.filter(col("vec_id") % 10 === 0)
          .withColumn("vec_id", col("vec_id") + 1000000L),
        "vec_id", "embedding", idx)
      graft.pipeline.VectorIndex.topK(s, idx,
          e.filter(col("vec_id").isin(1L, 2L, 3L, 4L, 6L)),
          "vec_id", "embedding", k = 5, nprobe = 4)
        .orderBy("query_id", "rank")
    }),

    // similarity: index drift monitor — the retrain signal for the
    // append workflow: mean best-cell cosine of the resident corpus vs
    // an incoming shard under the frozen codebook
    "q257_index_drift" -> ((s, dir) => {
      val e = emb(s, dir)
      val idx = java.nio.file.Files
        .createTempDirectory("graft-vindex-drift").toString
      graft.pipeline.VectorIndex.build(
        e.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding", idx,
        k = 16, iters = 0)
      graft.pipeline.VectorIndex.driftCheck(s, idx,
        e.filter(col("vec_id") % 10 === 0), "vec_id", "embedding")
    }),

    // similarity: index drift monitor, SAMPLED resident side — the
    // routine-monitoring form: a deterministic md5-hash half-sample of
    // the resident corpus, with the drift's own standard error beside it
    "q260_index_drift_sampled" -> ((s, dir) => {
      val e = emb(s, dir)
      val idx = java.nio.file.Files
        .createTempDirectory("graft-vindex-sdrift").toString
      graft.pipeline.VectorIndex.build(
        e.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding", idx,
        k = 16, iters = 0)
      graft.pipeline.VectorIndex.driftCheck(s, idx,
        e.filter(col("vec_id") % 10 === 0), "vec_id", "embedding",
        sampleFraction = 0.5, salt = "q260")
    }),

    // similarity: SemDeDup state frozen FROM a persisted IVF index — the
    // shared (cell, cvec) layout means the index's assigned table IS the
    // member set: zero re-assignment, one k-row count agg, then the
    // standard apply (valve filter = a partition filter on the layout)
    "q261_semdedup_from_index" -> ((s, dir) => {
      val e = emb(s, dir)
      val idx = java.nio.file.Files
        .createTempDirectory("graft-vindex-freeze").toString
      graft.pipeline.VectorIndex.build(
        e.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding", idx,
        k = 16, iters = 0)
      val state = graft.pipeline.VectorIndex.freezeSemDedupState(s, idx)
      val fresh = e.filter(col("vec_id") % 10 === 0)
        .withColumn("vec_id", col("vec_id") + 1000000L)
      Similarity.semDedupAgainst(state, fresh, "vec_id", "embedding",
          threshold = 0.45)
        .orderBy("id")
    }),

    // similarity: frozen-codebook SemDeDup state APPEND — a second corpus
    // slice folds into the state WITHOUT retraining (assignment is a pure
    // function of the codebook), then the shard applies against the grown
    // members: must equal applying a state rebuilt under the same codebook
    "q259_semdedup_append" -> ((s, dir) => {
      val e = emb(s, dir)
      val state = Similarity.semDedupState(
        e.filter(col("vec_id") % 10 =!= 0 && col("vec_id") % 10 =!= 5),
        "vec_id", "embedding", k = 8, iters = 2, dim = 64)
      val grown = Similarity.semDedupStateAppend(state,
        e.filter(col("vec_id") % 10 === 5)
          .withColumn("vec_id", col("vec_id") + 2000000L),
        "vec_id", "embedding")
      val fresh = e.filter(col("vec_id") % 10 === 0)
        .withColumn("vec_id", col("vec_id") + 1000000L)
      Similarity.semDedupAgainst(grown, fresh, "vec_id", "embedding",
          threshold = 0.45)
        .orderBy("id")
    }),

    // similarity: frozen-state SemDeDup ingest — the embedding-modality
    // state twin: k-means codebook + valved cell members frozen from the
    // corpus, shard vectors route to their nearest frozen cell and
    // report their best corpus match at cosine >= 0.45
    "q253_semdedup_incremental" -> ((s, dir) => {
      val e = emb(s, dir)
      val state = Similarity.semDedupState(
        e.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding",
        k = 8, iters = 2, dim = 64)
      val fresh = e.filter(col("vec_id") % 10 === 0)
        .withColumn("vec_id", col("vec_id") + 1000000L)
      Similarity.semDedupAgainst(state, fresh, "vec_id", "embedding",
          threshold = 0.45)
        .orderBy("id")
    }),

    // sampling: frozen-state incremental epoch-repeat budget — shard rows
    // get every full epoch plus the frozen remainder cut, so the output
    // is exactly the full-corpus repeat mixture restricted to the shard
    "q249_repeat_budget_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val tok = TextOps.tokenCount(col("text"))
      val state = graft.sources.ScaleOps.repeatBudgetState(d, "lang",
        "doc_id", tok, Seq("en" -> 25000L, "de" -> 8000L, "zh" -> 1800L),
        salt = "q249")
      val shard = d.filter(col("doc_id") % 10 === 0)
      graft.sources.ScaleOps.repeatToTokenBudgetAgainst(state, shard,
          "lang", "doc_id", tok)
        .select(col("doc_id").as("id"), col("lang"),
          tok.cast("long").as("n_tokens"), col("epoch"))
        .orderBy("id", "epoch")
    }),

    // composed curation v2: strip duplicated spans FIRST, then keep each
    // language's best docs — quality and token counts measured on the
    // CLEANED text — until the per-language token budget
    "q238_clean_then_budget" -> ((s, dir) => {
      val cleaned = Dedup
        .removeDupSpans(docs(s, dir), "doc_id", "text", width = 5)
        .join(docs(s, dir).select(col("doc_id").as("id"), col("lang")), "id")
        .filter(col("n_tokens") > col("n_removed")) // fully-dup docs drop out
      graft.sources.ScaleOps.takeTopTokenBudget(cleaned, "lang", "id",
          TextOps.tokenCount(col("text_clean")),
          TextOps.qualityScore(col("text_clean")),
          Seq("en" -> 3000L, "de" -> 1200L))
        .select(col("id"), col("lang"),
          TextOps.tokenCount(col("text_clean")).cast("long").as("n_tokens_clean"))
        .orderBy("id")
    }),

    // layout: Morton/z-order interleave key over (n_chars, token count)
    // equal-width buckets — the multi-column clustering key zorderWrite
    // sorts by; pure integer bit algebra, bit-identical cross-engine
    "q236_zorder_key" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id").as("id"),
        col("n_chars").cast("double").as("nc"),
        TextOps.tokenCount(col("text")).cast("double").as("nt"))
      val mm = d.agg(min("nc"), max("nc"), min("nt"), max("nt")).collect()(0)
      d.select(col("id"),
          graft.sources.ScaleOps.zorderKey(Seq(col("nc"), col("nt")),
            Seq((mm.getDouble(0), mm.getDouble(1)),
              (mm.getDouble(2), mm.getDouble(3))), bits = 8).as("zkey"))
        .orderBy("id")
    }),

    // sampling: window-free approximate mixture (per-domain Bernoulli at
    // rate take/n — the scale path when a domain is too hot to sort)
    "q85_sample_mix_approx" -> ((s, dir) =>
      graft.sources.ScaleOps
        .sampleToMixApprox(docs(s, dir), "lang", "doc_id",
          Seq("en" -> 0.5, "zh" -> 0.25, "de" -> 0.25), salt = "q85")
        .select(col("doc_id").as("id"), col("lang"))
        .orderBy("id")),

    // sampling: deterministic Bernoulli keep with per-row probability =
    // quality score (DSIR/CCNet-style quality-weighted subsample)
    "q80_weighted_sample" -> ((s, dir) =>
      graft.sources.ScaleOps
        .weightedSample(docs(s, dir), "doc_id",
          TextOps.qualityScore(col("text")), salt = "q80")
        .select(col("doc_id").as("id"),
          TextOps.qualityScore(col("text")).as("w"))
        .orderBy("id")),

    // sampling: deterministic domain-mixture construction — largest output
    // hitting the target lang shares exactly, lowest-hash rows kept
    "q81_sample_mix" -> ((s, dir) =>
      graft.sources.ScaleOps
        .sampleToMix(docs(s, dir), "lang", "doc_id",
          Seq("en" -> 0.5, "zh" -> 0.25, "de" -> 0.25), salt = "q81")
        .select(col("doc_id").as("id"), col("lang"))
        .orderBy("id")),

    // sampling: temperature-balanced mixture — shares ∝ n_lang^0.5 derived
    // from the inventory itself (the multilingual temperature-sampling
    // rule; up-samples tail langs relative to en), then the q81 exact cut
    "q211_temperature_mix" -> ((s, dir) =>
      graft.sources.ScaleOps
        .sampleToMixTemperature(docs(s, dir), "lang", "doc_id",
          alpha = 0.5, salt = "q211")
        .select(col("doc_id").as("id"), col("lang"))
        .orderBy("id")),

    // sampling: the window-free approximate temperature mixture — the
    // 100 TB default (per-domain Bernoulli, no per-domain rank sort)
    "q213_temperature_mix_approx" -> ((s, dir) =>
      graft.sources.ScaleOps
        .sampleToMixTemperatureApprox(docs(s, dir), "lang", "doc_id",
          alpha = 0.5, salt = "q213")
        .select(col("doc_id").as("id"), col("lang"))
        .orderBy("id")),

    // storage: symmetric per-vector int8 scalar quantization of the
    // embedding column (scale + stringified codes; arrays stringified for
    // the driver compare, as in q32). Scale staged as an attribute so the
    // max|x| pass runs once per row (multi-use blocks re-inlining, PLANS §11)
    "q82_int8_quantize" -> ((s, dir) =>
      emb(s, dir)
        .select(col("vec_id").as("id"), col("embedding"),
          Similarity.int8Scale(col("embedding")).as("scale"))
        .select(col("id"), col("scale"),
          concat_ws(",",
            Similarity.int8Quantize(col("embedding"), col("scale"))
              .cast("array<string>")).as("q"))
        .orderBy("id")),

    // multimodal: binary payload + stubbed decode features
    "q39_multimodal_features" -> ((s, dir) =>
      Multimodal.documentFeatures(s, docs(s, dir))
        .select(col("id"), col("n_bytes"), col("head_byte"), col("tail_byte"),
          col("byte_sum_mod"))
        .orderBy("id")),

    // semi-structured: JSON field extraction + aggregation over events.props
    "q45_json_extract" -> ((s, dir) => {
      ev(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          avg(col("k")).as("avg_k"),
          sum(when(col("k") > 50, 1).otherwise(0)).as("n_high"))
        .orderBy("event_type")
    }),

    // multimodal: frame sampling — evenly spaced payload slices, md5'd for
    // cross-engine compare
    "q48_frame_sample" -> ((s, dir) =>
      Multimodal.frameSample(
        Multimodal.asBinary(docs(s, dir), "doc_id", "text"), k = 4)
        .select(col("id"), col("frame"), md5(col("frame_bytes")).as("frame_md5"))
        .orderBy("id", "frame")),

    // events: gap-based sessionization — per-user lag window marks session
    // starts (gap > 30 min), a running sum numbers sessions, then one
    // groupBy per (user, session). Timestamps are decoded to integer
    // epoch-µs (schema-probed, see EventTime) so session boundaries are
    // bit-exact cross-engine. The windows partition by user_id — parallel
    // in the number of users, the standard sessionization shape at any
    // scale.
    "q54_sessionize" -> ((s, dir) => {
      val base = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      val gapUs = 1800L * 1000000L // 30 min
      base
        .withColumn("__prev", lag(col("tus"), 1).over(w))
        .withColumn("__new",
          when(col("__prev").isNull || col("tus") - col("__prev") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("session_idx",
          sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_event"),
          (max(col("tus")) - min(col("tus"))).as("dur_us"),
          sum(col("value")).as("sum_value"))
        .orderBy("user_id", "session_idx")
    }),

    // as-of join: attach the most recent prior click's value to every view
    // event per user (union + keyed ordered window carry-forward — the
    // sort-merge-shaped as-of composition, parallel in the number of keys)
    "q58_asof_join" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("tus"), col("event_id"), col("value"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("tus"), col("event_id"),
          col("value").as("click_value"))
      graft.operators.AsOf
        .joinAsOf(views, clicks, "user_id", "tus", Seq("click_value"),
          tieBreakCol = Some("event_id"))
        .select(col("user_id"), col("event_id"), col("tus"), col("value"),
          col("click_value_asof"))
        .orderBy("user_id", "tus", "event_id")
    }),

    // events: tumbling-window aggregation (batch form of the streaming shape).
    // Decode ts to epoch-µs (schema-probed) and use integer division for
    // the hour bucket (not double, which loses precision above 2^53).
    "q40_event_windows" -> ((s, dir) => {
      graft.sources.EventTime.withEpochMicros(ev(s, dir))
        .groupBy(
          expr("CAST(tus DIV 3600000000 AS BIGINT) * 3600").as("hour_epoch"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
        .orderBy("hour_epoch", "event_type")
    }),

    // range join: attribute every purchase to the signup windows
    // [signup.ts, +10 min] containing it — a pure band join (no equi key),
    // which naively plans as a nested loop; the bucketized operator makes
    // it two shuffled equi-joins on the bucket id. bucketWidth = the
    // window length, so each window emits at most 2 bucket rows
    "q89_range_join" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      val tenMinUs = 600000000L
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("tus").as("p_tus"))
      val w = e.filter(col("event_type") === "signup")
        .select(col("event_id").as("w_id"), col("tus").as("lo"),
          (col("tus") + tenMinUs).as("hi"))
      graft.operators.RangeJoin
        .pointInInterval(p, "p_tus", w, "lo", "hi", bucketWidth = tenMinUs)
        .select("p_id", "w_id", "p_tus", "lo")
        .orderBy("p_id", "w_id")
    }),

    // interval-overlap join: concurrent click/error activity windows
    // ([ts, +5 min] each) — each overlapping pair is produced exactly once
    // (accepted only in the bucket of max(lo1, lo2)), no distinct pass
    "q90_interval_overlap" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      val fiveMinUs = 300000000L
      def win(tpe: String, p: String) = e.filter(col("event_type") === tpe)
        .select(col("event_id").as(s"${p}_id"), col("tus").as(s"${p}_lo"),
          (col("tus") + fiveMinUs).as(s"${p}_hi"))
      graft.operators.RangeJoin
        .intervalOverlap(win("click", "c"), "c_lo", "c_hi",
          win("error", "x"), "x_lo", "x_hi", bucketWidth = fiveMinUs)
        .select(col("c_id"), col("x_id"),
          (least(col("c_hi"), col("x_hi")) -
            greatest(col("c_lo"), col("x_lo"))).as("overlap_us"))
        .orderBy("c_id", "x_id")
    }),

    // ridge: centered slope-penalized solve on ONE moments pass (λ on the
    // standardized scale); oracle is the closed-form 2×2 penalized solve.
    // __df_eff = tr(H(λ)) and __gcv ride along as pseudo-terms so the
    // shrinkage diagnostics are oracle-checked too, not just β.
    "q103_ridge_fit" -> ((s, dir) => {
      import s.implicits._
      val data = li(s, dir).select(
        col("l_extendedprice").as("y"),
        col("l_quantity").cast("double").as("x1"),
        col("l_discount").as("x2"))
      val fit = graft.reg.Ridge.fit("y ~ x1 + x2", data, lambda = 100.0)
      (fit.terms.zip(fit.estimates) ++
        Seq("__df_eff" -> fit.dfEff, "__gcv" -> fit.gcv))
        .toDF("term", "estimate")
        .select(col("term"), col("estimate").cast("float").as("estimate"))
        .orderBy("term")
    }),

    // Huber robust fit: 3 pinned IRLS steps with the Proposal-2 scale
    // update, sandwich SEs — the oracle is Rlm.sqlOnly's generated text
    // (the q95/q96 self-proving loop)
    "q104_huber_fit" -> ((s, dir) => {
      val fit = graft.reg.Rlm.fit("l_extendedprice ~ l_quantity", li(s, dir),
        k = 1.345, maxIter = 3, tol = 0.0)
      fit.toDF(s).select(col("term"),
        col("estimate").cast("float").as("estimate"),
        col("std_error").cast("float").as("std_error")).orderBy("term")
    }),

    // quantile regression at tau=0.75: 3 pinned check-loss IRLS steps +
    // the Powell uniform-kernel sandwich — the oracle is Qreg.sqlOnly's
    // generated text (the q95/q104 self-proving loop)
    "q205_quantile_fit" -> ((s, dir) => {
      // eps is the check-loss smoothing scale: 10 on a ~30k price scale
      // (3e-4 relative) — also bounds the 1/|r| weight amplification of
      // cross-engine summation-order noise, keeping the float32 pin tight
      val fit = graft.reg.Qreg.fit("l_extendedprice ~ l_quantity", li(s, dir),
        tau = 0.75, maxIter = 3, tol = 0.0, eps = 10.0)
      fit.toDF(s).select(col("term"),
        col("estimate").cast("float").as("estimate"),
        col("std_error").cast("float").as("std_error")).orderBy("term")
    }),

    // conformalized quantile regression (Romano et al. 2019): quantile
    // band from two pinned Qreg fits + CQR-score calibration; output =
    // test-split coverage/width report (the q118 shape)
    "q207_cqr_intervals" -> ((s, dir) => {
      val data = li(s, dir).withColumn("rid",
        concat_ws("_", col("l_orderkey"), col("l_linenumber")))
      val dealt = graft.sources.ScaleOps.hashSplit(data, "rid",
        Seq("fit" -> 0.8, "test" -> 0.2), salt = "q207o")
      val fitPart = dealt.filter(col("split") === "fit").drop("split")
      val test = dealt.filter(col("split") === "test").drop("split")
      val cm = graft.reg.Conformal.cqr("l_extendedprice ~ l_quantity",
        fitPart, "rid", alpha = 0.2, salt = "q207i", maxIter = 3, eps = 10.0)
      cm.intervals(test)
        .agg(
          count(lit(1)).as("n_test"),
          avg((col("l_extendedprice") >= col("lo") &&
            col("l_extendedprice") <= col("hi")).cast("double"))
            .cast("float").as("coverage"),
          avg(col("hi") - col("lo")).cast("float").as("mean_width"))
        .withColumn("qhat", lit(cm.qhat).cast("float"))
        .withColumn("n_cal", lit(cm.nCal))
    }),

    // per-group quantile fits (grouped-GLM shape: keyed moment aggs,
    // executor-side solves, broadcast beta re-attach) — oracle is the
    // grouped sqlOnly text
    "q206_quantile_grouped" -> ((s, dir) => {
      graft.reg.Qreg.fitGrouped("l_extendedprice ~ l_quantity", li(s, dir),
        "l_returnflag", tau = 0.75, maxIter = 3, eps = 10.0)
        .select(col("group"), col("term"),
          col("estimate").cast("float").as("estimate"),
          col("std_error").cast("float").as("std_error"))
        .orderBy("group", "term")
    }),

    // PCA fit on two scalar columns: one covariance pass + eigen solve;
    // the oracle is the closed-form 2×2 eigensystem with the same
    // deterministic sign rule (largest-|loading| element positive)
    "q105_pca_fit" -> ((s, dir) => {
      import s.implicits._
      val data = li(s, dir).select(
        col("l_quantity").cast("double").as("x1"),
        col("l_extendedprice").as("x2"))
      val m = graft.pipeline.Pca.fitCols(data, Seq("x1", "x2"), k = 1)
      Seq(
        ("mean_x1", m.mean(0)), ("mean_x2", m.mean(1)),
        ("lam1", m.eigenvalues(0)), ("lam2", m.eigenvalues(1)),
        ("v1_x1", m.components(0)(0)), ("v1_x2", m.components(0)(1)))
        .toDF("stat", "value")
        .select(col("stat"), col("value").cast("float").as("value"))
        .orderBy("stat")
    }),

    // PCA projection: every row's first principal-component score via the
    // codegen'd AffineProject (matrix as a plan reference, no shuffle)
    "q106_pca_project" -> ((s, dir) => {
      val data = li(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("double").as("x1"),
        col("l_extendedprice").as("x2"))
      val m = graft.pipeline.Pca.fitCols(data, Seq("x1", "x2"), k = 1)
      graft.pipeline.Pca.transformCols(data, Seq("x1", "x2"), m, "pc")
        .select(col("l_orderkey"), col("l_linenumber"),
          element_at(col("pc"), 1).cast("float").as("pc1"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // lasso: 4 pinned cyclic coordinate-descent sweeps on the one-pass
    // centered moments (λ chosen to zero one regressor — soft-threshold
    // actually bites); oracle unrolls the same sweeps as CTEs
    "q107_lasso_fit" -> ((s, dir) => {
      import s.implicits._
      val data = li(s, dir).select(
        col("l_extendedprice").as("y"),
        col("l_quantity").cast("double").as("x1"),
        col("l_discount").as("x2"))
      val fit = graft.reg.ElasticNet.fit("y ~ x1 + x2", data,
        lambda = 8e6, alpha = 1.0, maxIter = 4, tol = 0.0)
      (fit.terms.zip(fit.estimates) :+ ("__rss" -> fit.rss))
        .toDF("term", "estimate")
        .select(col("term"), col("estimate").cast("float").as("estimate"))
        .orderBy("term")
    }),

    // heavy hitters: one-pass Misra-Gries top-40 tokens with bounded state
    // (capacity exceeds the testdata vocabulary, so the summary is exact
    // and pins against DuckDB's exact GROUP BY; the restricted-capacity
    // guarantees are spec-tested)
    "q108_heavy_hitters" -> ((s, dir) =>
      TextOps.heavyHitters(docs(s, dir), "text", capacity = 200000, k = 40)
        .orderBy(col("count").desc, col("item"))),

    // per-language top tokens: the MG aggregate under grouping keys (the
    // ObjectHashAggregate grouped path) — exact regime vs a windowed oracle
    "q109_grouped_heavy_hitters" -> ((s, dir) =>
      TextOps.heavyHittersBy(docs(s, dir), "lang", "text",
        capacity = 200000, k = 5)
        .select(col("lang"), col("item"), col("count"))
        .orderBy(col("lang"), col("count").desc, col("item"))),

    // one ridge per group: keyed moment aggregation + executor-side
    // penalized centered solves (per-domain shrinkage); closed-form
    // per-group 1-regressor oracle
    "q110_grouped_ridge" -> ((s, dir) => {
      val data = li(s, dir).select(
        col("l_returnflag"),
        col("l_extendedprice").as("y"),
        col("l_quantity").cast("double").as("x1"))
      graft.reg.Ridge.fitGrouped("y ~ x1", data, "l_returnflag", lambda = 50.0)
        .select(col("group"), col("term"),
          col("estimate").cast("float").as("estimate"),
          col("df_eff").cast("float").as("df_eff"))
        .orderBy("group", "term")
    }),

    // classifier eval: rank-based AUC (Mann-Whitney with tie half-credit)
    // over the distinct-score aggregate — the corpus work is one keyed
    // hash agg; the cumsum window sees only distinct scores
    "q111_auc" -> ((s, dir) =>
      graft.reg.Eval.aucDF(li(s, dir),
        score = col("l_quantity"),
        label = col("l_returnflag") === "R")
        .select(col("auc").cast("float").as("auc"))),

    // isotonic calibration: driver PAV over the distinct-score aggregate;
    // the oracle evaluates the minimax characterization
    // max_{j<=s} min_{k>=s} avg(j..k) directly in SQL — two independent
    // algorithms, one theorem
    "q112_isotonic" -> ((s, dir) =>
      graft.reg.Isotonic.fit(li(s, dir),
        score = col("l_quantity"),
        label = col("l_returnflag") === "R")
        .select(col("score"), col("n"),
          col("calibrated").cast("float").as("calibrated"))
        .orderBy("score")),

    // per-label mean embedding (class prototypes) via the element-wise
    // vector-sum aggregate — one ObjectHashAggregate (no posexplode in the
    // AGGREGATION; the explode below only flattens the k×d result rows so
    // the driver's comparator can sort/hash scalar cells)
    "q113_label_centroids" -> ((s, dir) =>
      graft.pipeline.Similarity.meanPool(emb(s, dir), "label", "embedding", dim = 64)
        .select(col("label"), col("n"), posexplode(col("centroid")))
        .select(col("label"), col("n"), col("pos"),
          col("col").cast("float").as("value"))
        .orderBy("label", "pos")),

    // Gopher repetition rules: duplicate-line + top/duplicated n-gram
    // character coverage — one explode + two keyed aggs per n, joined
    // back co-partitioned on doc_id (never a per-row O(len²) HOF scan)
    "q136_repetition_signals" -> ((s, dir) =>
      TextOps.repetitionSignals(docs(s, dir), "doc_id", "text")
        .select(col("doc_id") +:
          Seq("dup_line_frac", "dup_line_char_frac",
            "top2gram_char_frac", "top3gram_char_frac", "top4gram_char_frac",
            "dup5gram_char_frac", "dup10gram_char_frac")
            .map(c => col(c).cast("float").as(c)) :+
          col("repetition_keep"): _*)
        .orderBy("doc_id")),

    // funnel conversion view → click → purchase: per-step conditional-min
    // cascade keyed on user (earliest order-respecting match), counts
    // shrink monotonically — no per-user event arrays collected
    "q137_funnel" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Events
        .funnel(e, "user_id", "tus", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy("step_idx")
    }),

    // retention cohorts (daily periods): cohort = period of first event;
    // one distinct + one min-agg + one user-keyed join + one
    // (cohort, offset) count — all hash aggs with map-side combine
    "q138_retention" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Events
        .retentionCohorts(e, "user_id", "tus", periodUs = 86400000000L)
        .orderBy("cohort_period", "period_offset")
    }),

    // Markov transition matrix over per-user event sequences: lag window
    // partitioned by user (single-row state), then a keyed pair count;
    // probabilities are exact integer ratios normalized per from-state
    "q139_event_transitions" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Events
        .transitions(e, "user_id", "tus", "event_type", "event_id")
        .orderBy("from_event", "to_event")
    }),

    // robust rate anomalies: hourly counts vs 3×MAD-from-median; one
    // keyed count over raw events, medians on the tiny period series
    "q140_anomaly_hours" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Events
        .anomalousPeriods(e, "tus", periodUs = 3600000000L, k = 3.0)
        .orderBy("period")
    }),

    // bounded-state interpolated quantiles: l_quantity has ≤ capacity
    // distinct values, so the sketch is EXACT at any row count (the
    // 100 TB regime the oracle can still pin); float-cast for the hash
    "q143_quantile_sketch" -> ((s, dir) =>
      li(s, dir)
        .groupBy("l_returnflag")
        .agg(graft.functions.QuantileSketchAgg(
          col("l_quantity"), Seq(0.25, 0.5, 0.75, 0.95), 64).as("qs"))
        .select(col("l_returnflag"), posexplode(col("qs")))
        .select(col("l_returnflag"), col("pos"),
          col("col").cast("float").as("q_value"))
        .orderBy("l_returnflag", "pos")),

    // market-basket association rules over order lines: the quadratic
    // step is keyed on the order (basket-size-valved); all ratios are
    // single-division exact-int doubles
    "q142_basket_rules" -> ((s, dir) =>
      graft.operators.Baskets
        .associationRules(li(s, dir), "l_orderkey", "l_partkey",
          minPairSupport = 3L, maxBasketSize = 20)
        .orderBy("antecedent", "consequent")),

    // segmented funnel: the cascade broken down by each user's ENTRY
    // event type (behavioral cohort); counts distributed per segment,
    // zero-filled spine, exact-int conversions
    "q165_funnel_by_segment" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      val seg = graft.operators.Events
        .entrySegments(e, "user_id", "tus", "event_type", "event_id")
      graft.operators.Events
        .funnelBySegment(e, "user_id", "tus", "event_type",
          Seq("view", "click", "purchase"), seg)
        .orderBy("segment", "step_idx")
    }),

    // grouped KMV: distinct users per event type with k=64 — the user
    // population EXCEEDS k, so every group is in the approximation
    // regime and the estimates are still hash-pinned against DuckDB
    "q164_kmv_grouped" -> ((s, dir) => {
      val e = ev(s, dir)
      e.groupBy("event_type")
        .agg(graft.functions.KmvAgg(
          col("user_id").cast("string"), 64).as("s"))
        .select(col("event_type"),
          col("s.estimate").cast("float").as("estimate"),
          col("s.n_kept"), col("s.kth_hash"), col("s.exact"))
        .orderBy("event_type")
    }),

    // stickiness = DAU / trailing-7 WAU per day — the two window rows of
    // q162 joined on the period; exact-int ratio, float-pinned
    "q163_stickiness" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      val r = graft.operators.Events
        .rollingActiveUsers(e, "user_id", "tus",
          periodUs = 86400000000L, windows = Seq(1, 7))
      val dau = r.filter(col("win") === 1)
        .select(col("period"), col("n_active").as("dau"))
      val wau = r.filter(col("win") === 7)
        .select(col("period"), col("n_active").as("wau"))
      dau.join(wau, Seq("period"))
        .select(col("period"), col("dau"), col("wau"),
          (col("dau").cast("double") / col("wau")).cast("float")
            .as("stickiness"))
        .orderBy("period")
    }),

    // rolling active users (DAU + trailing-7 WAU): distinct activity
    // expands to its ≤w report periods (bounded fan-out), then a
    // distinct + keyed count — rolling DISTINCT without user sets
    "q162_rolling_actives" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Events
        .rollingActiveUsers(e, "user_id", "tus",
          periodUs = 86400000000L, windows = Seq(1, 7))
        .orderBy("win", "period")
    }),

    // Kaplan-Meier conversion-latency curve (view → purchase, daily
    // buckets): right-censored at observation end, at-risk via a
    // descending cumulative sum, product via exp∘Σlog
    "q161_survival_curve" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Events
        .survivalCurve(e, "user_id", "tus", "event_type",
          "view", "purchase", quantizeUs = 86400000000L)
        .select(col("t"), col("n_risk"), col("n_events"),
          col("survival").cast("float").as("survival"))
        .orderBy("t")
    }),

    // weighted quantiles from the broadcast distinct-value CDF: exact
    // integer weight sums, no global sort (weighted median of doc length
    // under token-ish weights)
    "q159_weighted_quantiles" -> ((s, dir) =>
      graft.operators.Features
        .weightedQuantiles(docs(s, dir), "n_chars", col("n_chars"),
          Seq(0.25, 0.5, 0.9))
        .orderBy("q")),

    // corpus ops composed with the regression engine: the Zipf exponent
    // as an OLS fit of log(freq) ~ log(rank) over the vocab table (the
    // fit runs the same moments kernel as q22; float32-pinned)
    "q160_zipf_fit" -> ((s, dir) => {
      val ranked = docs(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
        // vocab-sized window (the discrete-measure contract): rank by
        // frequency with a total tiebreak
        .withColumn("rank", row_number().over(
          Window.orderBy(col("freq").desc, col("w").asc)))
        .select(log(col("rank").cast("double")).as("lx"),
          log(col("freq").cast("double")).as("ly"))
      Dbreg.fit("ly ~ lx", ranked, strategy = "moments").toDF(s)
        .select(col("term"),
          col("estimate").cast("float").as("estimate"),
          col("std_error").cast("float").as("std_error"))
        .orderBy("term")
    }),

    // fixed-size weighted sample (ES priority keys): exactly k rows,
    // length-proportional, TakeOrdered heaps — no global sort
    "q158_priority_sample" -> ((s, dir) =>
      graft.sources.ScaleOps
        .prioritySample(docs(s, dir), "doc_id",
          col("n_chars").cast("double"), k = 200, salt = "ps")
        .select(col("doc_id"), col("n_chars"),
          col("__prio").cast("float").as("prio"))
        .orderBy("doc_id")),

    // snapshot diff: the "new crawl" drops ids ≡ 0 (mod 97), rewrites
    // ids ≡ 0 (mod 89), and adds shifted copies — one fingerprint
    // projection per side, one id-keyed full outer join
    "q157_snapshot_diff" -> ((s, dir) => {
      val old = docs(s, dir)
      val newer = old
        .filter(col("doc_id") % 97 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 89 === 0, concat(col("text"), lit(" EDITED")))
            .otherwise(col("text")))
        .unionAll(old.filter(col("doc_id") % 101 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
            col("lang"), col("source"), col("n_chars")))
      Dedup.snapshotDiff(old, newer, "doc_id", "text")
        .orderBy("status")
    }),

    // KMV distinct sketch: token level is the exact regime (31 < k);
    // bigram level is the APPROXIMATION regime and still oracle-pinned —
    // the (k−1)/kth-minimum estimator is the same one-liner in DuckDB
    "q156_kmv_distinct" -> ((s, dir) => {
      val d = docs(s, dir)
      val tok = d.agg(graft.functions.KmvAgg(
        TextOps.tokens(col("text")), 64).as("s"))
        .select(lit("token").as("granularity"), col("s.*"))
      val bg = d.select(TextOps.tokens(col("text")).as("__t"))
        .select(TextOps.wordShingles(col("__t"), 2).as("bgs"))
        .agg(graft.functions.KmvAgg(col("bgs"), 64).as("s"))
        .select(lit("bigram").as("granularity"), col("s.*"))
      tok.unionAll(bg)
        .select(col("granularity"), col("estimate").cast("float").as("estimate"),
          col("n_kept"), col("kth_hash"), col("exact"))
        .orderBy("granularity")
    }),

    // conversion-window funnel: the q137 cascade with each step bounded
    // to 1 day after the previous step's match
    "q153_funnel_windowed" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Events
        .funnel(e, "user_id", "tus", "event_type",
          Seq("view", "click", "purchase"), maxGapUs = Some(86400000000L))
        .orderBy("step_idx")
    }),

    // sequential patterns: top event-type trigrams over per-user ordered
    // streams — two lags of window state, keyed count, top-k heap
    "q154_sequence_patterns" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Events
        .sequencePatterns(e, "user_id", "tus", "event_type", "event_id",
          n = 3, topK = 20)
    }),

    // cross-source overlap matrix: distinct (source, shingle) rows, pair
    // join bounded by #sources² per shingle, sizes broadcast
    "q155_source_overlap" -> ((s, dir) =>
      Dedup.sourceOverlap(docs(s, dir), "source", "text", n = 2)
        .select(col("source1"), col("source2"), col("n_shared"),
          col("overlap").cast("float").as("overlap"))
        .orderBy("source1", "source2")),

    // perceptual image hash: REAL header-parsed BMP decode → exact-int
    // mean-threshold bits (no float mean), partition-preserving map
    "q151_image_ahash" -> ((s, dir) => {
      import s.implicits._
      val ids = docs(s, dir).select(col("doc_id").cast("long")).as[Long]
      Multimodal.bmpAHashes(ids.map(id =>
        Multimodal.BinaryDoc(id, Multimodal.syntheticBmp(id), "image/bmp", 0)))
        .toDF().orderBy("doc_id")
    }),

    // image near-dup pairs: banded Hamming LSH over the aHash (generic
    // hammingPairs — the simhash machinery on a precomputed hash column)
    "q152_image_neardup_pairs" -> ((s, dir) => {
      import s.implicits._
      val ids = docs(s, dir).select(col("doc_id").cast("long")).as[Long]
      val hashes = Multimodal.bmpAHashes(ids.map(id =>
        Multimodal.BinaryDoc(id, Multimodal.syntheticBmp(id), "image/bmp", 0)))
        .toDF()
      Dedup.hammingPairs(hashes, "doc_id", "ahash", bits = 20, maxHamming = 3)
        .groupBy("hamming")
        .agg(count(lit(1)).as("n_pairs"), sum(col("id1") + col("id2")).as("id_sum"))
        .orderBy("hamming")
    }),

    // CUSUM level-shift detection over hourly rates: prefix-sum identity
    // (two ordered windows over the tiny period series), μ/σ from exact
    // integer sums on a 1-row broadcast
    "q148_cusum_shifts" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Events
        .cusumShifts(e, "tus", periodUs = 3600000000L, k = 0.5, h = 5.0)
        .select(col("period"), col("n"),
          col("cusum").cast("float").as("cusum"), col("is_shift"))
        .orderBy("period")
    }),

    // positional phrase search: postings filtered to the phrase terms
    // pre-shuffle; (len−1) joins all keyed on (doc, aligned position)
    "q149_phrase_search" -> ((s, dir) =>
      graft.pipeline.Phrase
        .phraseSearch(docs(s, dir), "doc_id", "text",
          Seq("row", "column", "sort"))
        .orderBy("id")),

    // percent_rank WITHOUT the global sort: broadcast distinct-value CDF
    // (discrete-measure regime), narrow per-row projection
    "q150_percentile_rank" -> ((s, dir) =>
      graft.operators.Features
        .percentileRank(
          li(s, dir).select("l_orderkey", "l_linenumber", "l_quantity"),
          "l_quantity")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("pr").cast("float").as("pr"))
        .orderBy("l_orderkey", "l_linenumber")),

    // recency-weighted engagement: one keyed sum with a per-row decay
    // projection; reference instant = corpus max via 1-row broadcast
    "q147_decay_scores" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Features
        .decayScores(e, "user_id", "tus", halfLifeUs = 604800000000L)
        .select(col("user_id"), col("n_events"),
          col("score").cast("float").as("score"), col("last_seen"))
        .orderBy("user_id")
    }),

    // Count-Min point-frequency estimates over the token stream: the
    // 31-token vocabulary cannot saturate all 4 rows of a 1024-wide
    // sketch, so every min-estimate equals the exact count (pinned);
    // merge is elementwise-add → layout-independent even when approximate
    "q146_count_min" -> ((s, dir) =>
      docs(s, dir)
        .agg(graft.functions.CountMinAgg(
          TextOps.tokens(col("text")),
          Seq("join", "hash", "scan", "vector", "zzz_absent"),
          depth = 4, width = 1024).as("ests"))
        .select(posexplode(col("ests")))
        .select(col("pos"), col("col.item").as("item"), col("col.est").as("est"))
        .orderBy("pos")),

    // DSIR importance scores: hashed-bigram bucket models (target =
    // English slice) with add-1 smoothing; weight table broadcasts,
    // each side streams once
    "q145_dsir_scores" -> ((s, dir) =>
      graft.pipeline.Dsir
        .importanceScoresFlagged(docs(s, dir), "doc_id", "text",
          col("lang") === "en", buckets = 4096)
        .select(col("id"), col("n_grams"),
          col("score").cast("float").as("score"))
        .orderBy("id")),

    // domain PageRank over the co-occurrence link graph of the planted
    // URLs (q75's scheme): per-iteration work is one src-keyed join +
    // one dst-keyed sum; dangling mass and 1/N ride 1-row broadcasts
    "q144_domain_pagerank" -> ((s, dir) => {
      val planted = docs(s, dir).select(
        col("doc_id"),
        concat(
          col("text"),
          lit(" see https://site"), (col("doc_id") % 7).cast("string"),
          lit(".example.org/p/"), col("doc_id").cast("string"),
          lit(" and http://cdn.example.net/x?y="), (col("doc_id") % 3).cast("string")
        ).as("text"))
      val dom = TextOps.extractUrls(planted, "doc_id", "text")
        .select(col("doc_id"), col("domain")).distinct()
      val edges = dom.select(col("doc_id"), col("domain").as("src"))
        .join(dom.select(col("doc_id"), col("domain").as("dst")), Seq("doc_id"))
        .filter(col("src") =!= col("dst"))
      graft.operators.Graphs.pageRank(edges, "src", "dst", iters = 5)
        .select(col("node"), col("rank").cast("float").as("rank"))
        .orderBy("node")
    }),

    // trending view: daily per-type counts with a 7-day trailing moving
    // average; the ROWS window runs over the aggregated series only
    "q141_rolling_activity" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Events
        .rollingActivity(e, "event_type", "tus", periodUs = 86400000000L, w = 7)
        .orderBy("event_type", "period")
    }),

    // Bloom-filtered semi join (the runtime-filter shape): orders that
    // have a max-quantity line — the codegen'd might_contain prunes the
    // big side BEFORE the shuffle; the verifying semi join keeps the
    // result exact regardless of filter sizing
    "q166_bloom_semijoin" -> ((s, dir) =>
      graft.operators.BloomJoin.semiJoin(
          ord(s, dir), col("o_orderkey"),
          li(s, dir).filter(col("l_quantity") >= 49), col("l_orderkey"),
          numBits = 1 << 16, numHashes = 5)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy("o_orderkey")),

    // exact set-similarity join via prefix filtering — LOSSLESS near-dup
    // pairs (vs q33's probabilistic MinHash recall): rare-first global
    // token order bounds the candidate buckets, the length filter prunes
    // the rest, and verification is exact intersection counting.
    // TRIGRAM shingles: prefix filtering's pruning power scales with
    // vocab size, and this synthetic corpus's ~30-word vocabulary makes
    // every bigram corpus-hot (~900 types / 5k docs ⇒ every prefix
    // bucket is huge); trigrams restore the Zipf tail real text has
    "q167_setsim_join" -> ((s, dir) =>
      graft.operators.SetSimJoin.jaccardJoin(
          // bind tokens as an attribute first — HOF lambdas get no CSE,
          // an inline tokens(text) would re-tokenize per shingle element
          docs(s, dir).select(col("doc_id"),
            TextOps.tokens(col("text")).as("__toks")),
          "doc_id",
          TextOps.wordShingles(col("__toks"), 3), tau = 0.5)
        .orderBy("id1", "id2")),

    // gaps-and-islands: longest consecutive-day activity streak per user
    // (island key = period − row_number, windows partitioned by user
    // over distinct active days only)
    "q168_activity_streaks" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Events
        .activityStreaks(e, "user_id", "tus", periodUs = 86400000000L)
        .orderBy("user_id")
    }),

    // OHLC resample of the event stream to hourly bars per type: one
    // hash agg, open/close via min_by/max_by over a (ts, id) struct —
    // deterministic without any window sort
    "q169_ohlc_downsample" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Events
        .ohlcDownsample(e, "event_type", "tus", "event_id", "value",
          periodUs = 3600000000L)
        .select(col("event_type"), col("period"),
          col("open"), col("high"), col("low"), col("close"),
          col("n_events"), col("value_sum").cast("float").as("value_sum"))
        .orderBy("event_type", "period")
    }),

    // canonical-document selection: q43's near-dup clusters, keeping the
    // LONGEST member (ties → smallest id) as each cluster's canonical —
    // the keep-best dedup policy, one row per multi-member cluster
    "q170_canonical_docs" -> ((s, dir) => {
      val clusters = Dedup.duplicateClusters(
        Dedup.jaccardPairs(docs(s, dir), "doc_id", "text", n = 2, threshold = 0.4))
      val sized = clusters
        .join(docs(s, dir).select(col("doc_id").as("id"), col("n_chars")), Seq("id"))
      sized
        .select(col("cluster"),
          struct((-col("n_chars")).as("neg_len"), col("id")).as("__cand"),
          col("n_chars"))
        .groupBy("cluster")
        .agg(min(col("__cand")).as("__best"), count(lit(1)).as("n_members"),
          max(col("n_chars")).as("max_chars"))
        .select(col("cluster"), col("__best.id").as("canonical_id"),
          col("max_chars").as("n_chars"), col("n_members"))
        .orderBy("cluster")
    }),

    // blocked record linkage: nearest other part by name edit distance
    // within (brand, size) blocks — equi-join blocking + codegen'd
    // levenshtein + a (distance, id) lexicographic-min agg
    "q171_record_linkage" -> ((s, dir) =>
      graft.operators.Linkage.nearestInBlock(
          s.read.parquet(s"$dir/part.parquet"),
          "p_partkey", "p_name", Seq("p_brand", "p_size"))
        .orderBy("id")),

    // connected components via the public graph API (min-label
    // propagation + pointer jumping) over the LOOSER 0.3-Jaccard pair
    // graph — longer chains and bigger components than q43's clusters
    "q172_connected_components" -> ((s, dir) =>
      graft.operators.Graphs.connectedComponents(
          Dedup.jaccardPairs(docs(s, dir), "doc_id", "text",
            n = 2, threshold = 0.3),
          "id1", "id2")
        .orderBy("node")),

    // the scale composition for transitive clusters at loose thresholds:
    // MinHash-LSH candidate pairs (bounded fan-out) feed CC instead of
    // the exact all-pairs shingle join, whose PAIR GENERATION dominates
    // the x100 point (751 s — BENCH_NOTES); same pointer-jumping CC
    "q201_cc_lsh_pairs" -> ((s, dir) =>
      graft.operators.Graphs.connectedComponents(
          Dedup.minhashPairs(docs(s, dir), "doc_id", "text",
            n = 2, threshold = 0.5),
          "id1", "id2")
        .orderBy("node")),

    // community detection on the near-dup graph: 2 deterministic sync-LPA
    // rounds — density-connected groups, finer than q201's components
    "q214_label_propagation" -> ((s, dir) =>
      graft.operators.Graphs.labelPropagation(
          Dedup.minhashPairs(docs(s, dir), "doc_id", "text",
            n = 2, threshold = 0.5),
          "id1", "id2", iters = 2)
        .orderBy("node")),

    // dedup-graph diagnostics: per-vertex triangles + local clustering
    // coefficient over the SAME LSH pair graph q201 clusters — high
    // clustering = clique-like duplicate families, low = chain-like
    // borderline matches (degree-ordered wedge join, O(m^1.5))
    "q209_triangle_counts" -> ((s, dir) =>
      graft.operators.Graphs.triangleCounts(
          Dedup.minhashPairs(docs(s, dir), "doc_id", "text",
            n = 2, threshold = 0.5),
          "id1", "id2")
        .orderBy("node")),

    // self-trained multinomial NB language classifier (CCNet-style
    // curation-filter shape): one corpus pass trains the (label, token)
    // model, a broadcast-pivot join + one doc-keyed aggregate scores;
    // (doc_id, argmax-label, log-posterior), ties to the first label
    "q202_nb_classify" -> ((s, dir) =>
      graft.pipeline.Classify
        .nbClassify(docs(s, dir), "doc_id", "text", "lang")
        .select(col("id"), col("pred"), col("score").cast("float").as("score"))
        .orderBy("id")),

    // rolling trend: daily value sums per type with the trailing-7 OLS
    // slope from four window sums — the moments-kernel slope formula
    // carried by a ROWS window over the aggregated series
    "q173_rolling_trend" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Events
        .rollingTrend(e, "event_type", "tus", "value",
          periodUs = 86400000000L, w = 7)
        .select(col("event_type"), col("period"),
          col("y").cast("float").as("y"),
          col("slope").cast("float").as("slope"))
        .orderBy("event_type", "period")
    }),

    // per-user session stats over 30-min-gap sessions: bounce rate,
    // events/session, mean duration — exact-int ratios off the q54
    // sessionization rule
    "q174_session_stats" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Events
        .sessionStats(e, "user_id", "tus", "event_id",
          gapUs = 1800L * 1000000L)
        .orderBy("user_id")
    }),

    // OLAP cube materialization: all four grouping sets of
    // (returnflag, linestatus) in ONE pass — the GROUPING SETS engine
    // the 2-FE demean already rides, exposed as a user-facing rollup
    "q175_cube_totals" -> ((s, dir) =>
      li(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // CDC latest-record compaction: current value per (user, type) via
    // one max_by((ts, id)) hash agg — the event-sourced snapshot view
    "q176_latest_per_key" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Events
        .latestPerKey(e, Seq("user_id", "event_type"), "tus", "event_id",
          "value")
        .orderBy("user_id", "event_type")
    }),

    // stratified fixed-k weighted sample: exactly min(k, |stratum|) docs
    // per language by ES priority keys; windows sort within strata only
    "q177_stratified_sample" -> ((s, dir) =>
      graft.sources.ScaleOps
        .prioritySampleByGroup(docs(s, dir), "doc_id", "lang",
          col("n_chars").cast("double"), k = 20, salt = "ps")
        .select(col("lang"), col("doc_id"), col("n_chars"),
          col("__prio").cast("float").as("prio"))
        .orderBy("lang", "doc_id")),

    // Cohen's kappa between the lang label and a deterministically
    // perturbed rater (doc_id ≡ 0 mod 7 → 'zz'): one contingency agg,
    // margins over the label-space-sized cell table
    "q178_cohen_kappa" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.reg.Eval.cohenKappa(d,
          col("lang"),
          when(col("doc_id") % 7 === 0, lit("zz")).otherwise(col("lang")))
        .select(col("n"), col("po").cast("float").as("po"),
          col("pe").cast("float").as("pe"),
          col("kappa").cast("float").as("kappa"))
    }),

    // decile gains/lift of n_chars predicting lang='en': global NTILE
    // ranking (q16 contract), then bucket-table cumsums + 1-row totals
    "q179_lift_curve" -> ((s, dir) =>
      graft.reg.Eval.liftCurve(docs(s, dir),
          col("n_chars").cast("double"), col("lang") === "en",
          col("doc_id"), buckets = 10, exact = true)
        .select(col("bucket"), col("n"), col("n_pos"), col("cum_n"),
          col("cum_pos"), col("gain").cast("float").as("gain"),
          col("lift").cast("float").as("lift"))
        .orderBy("bucket")),

    // forward-fill resample: per-user daily value grid over the user's
    // own active span, last-observation-carried-forward across gaps
    "q180_resample_fill" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Events
        .resampleFill(e, "user_id", "tus", "event_id", "value",
          periodUs = 86400000000L)
        .orderBy("key", "period")
    }),

    // grouped two-proportion z-tests (per event type × day-of-week,
    // arms split by user parity, success = value > 50): one conditional
    // agg keyed on the cell; p via the shared A&S erfc tail
    "q181_prop_ztest" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
        .withColumn("dow", expr("(tus DIV 86400000000) % 7"))
      graft.reg.Eval.propZTestGrouped(e, Seq("event_type", "dow"),
          col("user_id") % 2 === 0, col("value") > 50)
        .select(col("event_type"), col("dow"), col("n_a"), col("s_a"),
          col("n_b"), col("s_b"),
          col("p_a").cast("float").as("p_a"),
          col("p_b").cast("float").as("p_b"),
          col("z").cast("float").as("z"), col("p").cast("float").as("p"))
        .orderBy("event_type", "dow")
    }),

    // skew-salted join: lineitem ⋈ part on partkey with the small side
    // replicated 8× and the big side hash-scattered — result is exactly
    // the plain join (oracle), the plan spreads any hot key over 8
    // reducers; revenue per brand, float-pinned
    "q183_skew_join" -> ((s, dir) => {
      val joined = graft.sources.ScaleOps.saltedJoin(
        li(s, dir), "l_partkey",
        s.read.parquet(s"$dir/part.parquet").select("p_partkey", "p_brand"),
        "p_partkey",
        saltOf = xxhash64(col("l_orderkey"), col("l_linenumber")),
        buckets = 8)
      joined.groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("float").as("revenue"))
        .orderBy("p_brand")
    }),

    // burst debounce = session-head events under the q54 gap rule: one
    // lag window per user, payload passes through
    "q184_debounce" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Events
        .debounce(e, Seq("user_id"), "tus", "event_id",
          gapUs = 1800L * 1000000L)
        .select(col("user_id"), col("event_id"), col("tus"),
          col("event_type"))
        .orderBy("user_id", "tus", "event_id")
    }),

    // bucketed (default, scale-safe) lift curve: histogram-CDF decile
    // cuts + CASE-chain assignment — no total-order sort anywhere; the
    // oracle re-derives the identical interpolated cuts (q69 algebra)
    "q197_lift_curve_bucketed" -> ((s, dir) =>
      graft.reg.Eval.liftCurve(docs(s, dir),
          col("n_chars").cast("double"), col("lang") === "en",
          col("doc_id"), buckets = 10)
        .select(col("bucket"), col("n"), col("n_pos"), col("cum_n"),
          col("cum_pos"), col("gain").cast("float").as("gain"),
          col("lift").cast("float").as("lift"))
        .orderBy("bucket")),

    // bucketed (default) WoE bins: same decile cuts, ascending CASE-chain
    // bin ids, dense spine, 0.5-smoothed log-odds
    "q198_woe_bins_bucketed" -> ((s, dir) =>
      graft.operators.Features.woeBins(docs(s, dir),
          col("n_chars").cast("double"), col("lang") === "en",
          col("doc_id"), bins = 10)
        .select(col("bin"), col("n"), col("n_pos"), col("n_neg"),
          col("woe").cast("float").as("woe"),
          col("iv_contrib").cast("float").as("iv_contrib"))
        .orderBy("bin")),

    // product quantization: 2 blocks × 4 codewords trained by the
    // in-engine kmeans on sliced frames, codegen'd per-block argmax
    // encode, reconstruction MSE via the broadcast codeword table
    "q196_pq_mse" -> ((s, dir) => {
      val e = emb(s, dir)
      val books = graft.pipeline.Similarity
        .pqTrain(e, "vec_id", "embedding", m = 2, k = 4, iters = 1, dim = 64)
      graft.pipeline.Similarity
        .pqBlockMse(e, "vec_id", "embedding", books)
        .select(col("block"), col("n"), col("mse").cast("float").as("mse"))
        .orderBy("block")
    }),

    // the production ANN search shape: IVF coarse probe → PQ-ADC approx
    // shortlist (candidates carry CODES only, never the vector) → exact
    // cosine re-rank of the shortlist (one id-keyed vector fetch)
    "q212_pq_rerank" -> ((s, dir) => {
      val e = emb(s, dir)
      val books = graft.pipeline.Similarity
        .pqTrain(e, "vec_id", "embedding", m = 2, k = 4, iters = 1, dim = 64)
      graft.pipeline.Similarity
        .pqRerankTopK(e, "vec_id", "embedding", k = 3, books,
          nCentroids = 16, nprobe = 2, shortlist = 8)
        .orderBy("query_id", "rank")
    }),

    // hybrid retrieval: BM25 lexical candidates ⊕ exact-cosine semantic
    // candidates for one query, fused by reciprocal ranks (rank-only
    // fusion ⇒ scale-free and engine-exact); query vector = vec_id 0
    "q215_hybrid_rrf" -> ((s, dir) => {
      val e = emb(s, dir)
      val qv = e.filter(col("vec_id") === 0L)
        .select(col("embedding")).collect()(0)
        .getSeq[Number](0).toArray.map(_.doubleValue)
      graft.pipeline.Retrieval.hybridTopK(
          docs(s, dir), "doc_id", "text",
          Seq("hash", "join", "stream", "vector"),
          e, "vec_id", "embedding", qv,
          k = 20, candidateK = 30, rrfK = 60)
        .select(col("id"), col("lex_rank"), col("sem_rank"),
          col("rrf").cast("float").as("rrf"))
        .orderBy("id")
    }),

    // clustering quality: simplified centroid silhouette in cosine space
    // against the 4 lowest-id vectors as fixed centroids (deterministic,
    // oracle-able — the ivfTopK centroid convention)
    "q216_silhouette" -> ((s, dir) => {
      val e = emb(s, dir)
      val cents = e.orderBy("vec_id").limit(4)
        .select(col("embedding")).collect()
        .map(_.getSeq[Number](0).toArray.map(_.doubleValue))
      graft.pipeline.Similarity.silhouette(e, "vec_id", "embedding", cents)
        .select(col("cell"), col("n"),
          col("mean_sil").cast("float").as("mean_sil"))
        .orderBy("cell")
    }),

    // pseudo-relevance feedback: BM25 round 1 → top-5 feedback docs →
    // 3 most frequent new feedback tokens join the query → BM25 round 2
    "q219_prf_expansion" -> ((s, dir) =>
      graft.pipeline.Retrieval.prfExpandedTopK(docs(s, dir), "doc_id",
          "text", Seq("hash", "join", "stream", "vector"), k = 15,
          fbDocs = 5, fbTerms = 3)
        .select(col("id"), col("bm25").cast("float").as("bm25"),
          col("n_matched"))
        .orderBy("id")),

    // MMR diversified re-rank: top-10 semantic shortlist for query vec 0,
    // greedy λ=0.7 relevance-vs-redundancy pick of 5 (driver-local over
    // the bounded shortlist — the BPE-merge design; candidates distributed)
    "q218_mmr_rerank" -> ((s, dir) => {
      val e = emb(s, dir)
      val qv = e.filter(col("vec_id") === 0L)
        .select(col("embedding")).collect()(0)
        .getSeq[Number](0).toArray.map(_.doubleValue)
      val qvc = array(qv.toIndexedSeq.map(lit(_)): _*)
      val cand = e.filter(col("vec_id") =!= 0L)
        .select(col("vec_id"),
          Similarity.cosine(col("embedding"), qvc).as("rel"),
          col("embedding"))
        .orderBy(col("rel").desc, col("vec_id"))
        .limit(10)
      graft.pipeline.Retrieval
        .mmrRerank(cand, "vec_id", "rel", "embedding", k = 5, lambda = 0.7)
        .select(col("vec_id"), col("mmr_rank"),
          col("mmr").cast("float").as("mmr"),
          col("rel").cast("float").as("rel"))
        .orderBy("mmr_rank")
    }),

    // retrieval eval: NDCG@5 / MRR@5 / pool recall@5 per query over the
    // exact kNN top-10 graph, relevance = label agreement; the discount
    // tables are driver-folded literals shared with the oracle SQL
    "q217_ranking_metrics" -> ((s, dir) => {
      val e = emb(s, dir)
      val ranked = Similarity.knnJoinBrute(e, "vec_id", "embedding", 10)
      val lab = e.select(col("vec_id"), col("label"))
      val withRel = ranked
        .join(lab.select(col("vec_id").as("query_id"),
          col("label").as("__ql")), "query_id")
        .join(lab.select(col("vec_id").as("neighbor_id"),
          col("label").as("__nl")), "neighbor_id")
        .select(col("query_id"), col("rank"),
          (col("__ql") === col("__nl")).cast("int").as("rel"))
      graft.reg.Eval.rankingMetrics(withRel, "query_id", "rank", "rel", k = 5)
        .select(col("query").as("query_id"), col("n_rel"),
          col("ndcg").cast("float").as("ndcg"),
          col("mrr").cast("float").as("mrr"),
          col("recall").cast("float").as("recall"))
        .orderBy("query_id")
    }),

    // Mann-Whitney U: does event value stochastically differ between
    // user-parity arms — average-rank sums over the distinct-value
    // aggregate, tie-corrected variance, shared A&S tail
    "q194_mann_whitney" -> ((s, dir) =>
      graft.reg.Eval.mannWhitney(ev(s, dir),
          col("user_id") % 2 === 0, col("value"))
        .select(col("n_a"), col("n_b"),
          col("u").cast("float").as("u"),
          col("z").cast("float").as("z"), col("p").cast("float").as("p"))),

    // chi-square goodness-of-fit: observed event-type mix against the
    // declared uniform design shares; Wilson-Hilferty tail
    "q195_chisq_gof" -> ((s, dir) =>
      graft.reg.Eval.chiSquareGof(ev(s, dir), col("event_type"),
          Seq("view" -> 0.2, "click" -> 0.2, "purchase" -> 0.2,
            "signup" -> 0.2, "error" -> 0.2))
        .select(col("n"), col("n_other"),
          col("chi2").cast("float").as("chi2"), col("df"),
          col("p").cast("float").as("p"))),

    // last-touch conversion attribution: each purchase credits the most
    // recent prior non-purchase event (as-of composition, deterministic
    // (ts, side, id) tie rule), counts + value per channel
    "q192_attribution" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tus"), col("event_id"), col("value"))
      val touches = e.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("tus"), col("event_id"),
          col("event_type"))
      graft.operators.AsOf
        .joinAsOf(purchases, touches, "user_id", "tus", Seq("event_type"),
          tieBreakCol = Some("event_id"))
        .groupBy(coalesce(col("event_type_asof"), lit("(none)")).as("touch"))
        .agg(count(lit(1)).as("n_conversions"),
          sum(col("value")).cast("float").as("value_sum"))
        .orderBy("touch")
    }),

    // dense equal-width histogram (every bin present, max clamped into
    // the top bin): 1-row min/max broadcast + hash counts + range spine
    "q193_histogram" -> ((s, dir) =>
      graft.operators.Features.histogram(li(s, dir), "l_extendedprice", 20)
        .select(col("bin"), col("lo").cast("float").as("lo"),
          col("hi").cast("float").as("hi"), col("n"))
        .orderBy("bin")),

    // SCD1 MERGE: even-id events form the base snapshot (latest per
    // user), odd-id events replay as a change stream (error→D,
    // signup→I, else U); one latest-agg + one full outer join
    "q188_cdc_merge" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      val base = graft.operators.Events
        .latestPerKey(e.filter(col("event_id") % 2 === 0),
          Seq("user_id"), "tus", "event_id", "value")
        .select(col("user_id"), col("last_value").as("value"))
      val changes = e.filter(col("event_id") % 2 === 1)
        .withColumn("op",
          when(col("event_type") === "error", "D")
            .when(col("event_type") === "signup", "I")
            .otherwise("U"))
      graft.operators.Cdc
        .merge(base, "user_id", "value", changes, "op", "tus", "event_id")
        .orderBy("user_id")
    }),

    // SCD2 history: per-user purchase-value versions as half-open
    // validity intervals — one lead() window per key
    "q189_scd2_intervals" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
        .filter(col("event_type") === "purchase")
      graft.operators.Cdc
        .scd2(e, "user_id", "tus", "event_id", "value")
        .orderBy(col("user_id"), col("valid_from"),
          col("valid_to").asc_nulls_last)
    }),

    // pairwise Pearson matrix over four lineitem measures from ONE
    // aggregation (k sums + k(k+1)/2 cross-products), complete-case
    "q190_corr_matrix" -> ((s, dir) =>
      graft.reg.Eval.corrMatrix(li(s, dir),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .select(col("col1"), col("col2"), col("n"),
          col("corr").cast("float").as("corr"))
        .orderBy("col1", "col2")),

    // seasonal anomaly view: hourly counts scored against each type's
    // hour-of-day profile ("unusual for 3am, not unusual overall")
    "q191_seasonal_residuals" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Events
        .seasonalResiduals(e, "event_type", "tus",
          periodUs = 3600000000L, season = 24)
        .select(col("event_type"), col("period"), col("phase"), col("n"),
          col("phase_mean").cast("float").as("phase_mean"),
          col("z").cast("float").as("z"))
        .orderBy("event_type", "period")
    }),

    // declarative data-quality gate: five named expectations over
    // lineitem in ONE conditional-sum pass; violation = false OR null
    "q186_expectations" -> ((s, dir) =>
      graft.operators.Quality.expectations(li(s, dir), Seq(
          "qty_in_range" -> col("l_quantity").between(1, 50),
          "price_positive" -> (col("l_extendedprice") > 0),
          "discount_low" -> (col("l_discount") <= 0.05),
          "flag_known" -> col("l_returnflag").isin("A", "N", "R"),
          "tax_nonneg" -> (col("l_tax") >= 0)))
        .orderBy("rule")),

    // pivot/crosstab: per-user event counts widened by type (explicit
    // value list — deterministic schema) + a row total
    "q187_pivot" -> ((s, dir) =>
      ev(s, dir)
        .groupBy("user_id")
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumn("total",
          col("click") + col("error") + col("purchase") +
            col("signup") + col("view"))
        .orderBy("user_id")),

    // weight-of-evidence deciles of n_chars against lang='en': NTILE
    // cut + smoothed per-bin log-odds and IV contributions
    "q185_woe_bins" -> ((s, dir) =>
      graft.operators.Features.woeBins(docs(s, dir),
          col("n_chars").cast("double"), col("lang") === "en",
          col("doc_id"), bins = 10, exact = true)
        .select(col("bin"), col("n"), col("n_pos"), col("n_neg"),
          col("woe").cast("float").as("woe"),
          col("iv_contrib").cast("float").as("iv_contrib"))
        .orderBy("bin")),

    // Benjamini-Hochberg over the q181 battery of tests: ascending-p
    // rank, suffix-min step-up over the test-count-sized table
    "q182_bh_adjust" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
        .withColumn("dow", expr("(tus DIV 86400000000) % 7"))
      val tests = graft.reg.Eval
        .propZTestGrouped(e, Seq("event_type", "dow"),
          col("user_id") % 2 === 0, col("value") > 50)
        .select(concat_ws("|", col("event_type"), col("dow")).as("test_id"),
          col("p"))
      graft.reg.Eval.bhAdjust(tests, "test_id", "p")
        .select(col("id"), col("p").cast("float").as("p"), col("rank"),
          col("p_adj").cast("float").as("p_adj"))
        .orderBy("rank")
    }),

    // one-way ANOVA of event value across event types: one keyed agg +
    // one k-row agg; Paulson-approximated F tail via the shared erfc
    "q220_anova_oneway" -> ((s, dir) =>
      graft.reg.Eval.anovaOneWay(ev(s, dir),
          col("event_type"), col("value"))
        .select(col("k"), col("n"),
          col("ss_between").cast("float").as("ss_between"),
          col("ss_within").cast("float").as("ss_within"),
          col("f").cast("float").as("f"), col("df1"), col("df2"),
          col("p").cast("float").as("p"))),

    // simple exponential smoothing of hourly value sums per event type —
    // the recurrence evaluated in closed form (keyed rank window +
    // geometric weights), no sequential pass anywhere
    "q221_ses_forecast" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Events
        .sesForecast(e, "event_type", "tus", "value",
          periodUs = 3600000000L, alpha = 0.3)
        .select(col("event_type"), col("n_periods"),
          col("last_y").cast("float").as("last_y"),
          col("level").cast("float").as("level"))
        .orderBy("event_type")
    }),

    // autocorrelation of each type's hourly count series at lags 1..6
    // over the dense calendar spine (absent hours count 0)
    "q222_acf" -> ((s, dir) => {
      val e = graft.sources.EventTime.withEpochMicros(ev(s, dir))
      graft.operators.Events
        .acf(e, "event_type", "tus", periodUs = 3600000000L, maxLag = 6)
        .select(col("event_type"), col("lag"), col("n"),
          col("acf").cast("float").as("acf"))
        .orderBy("event_type", "lag")
    }),

    // decision stump: best Gini split per measure for "was returned",
    // 16 equal-width candidate thresholds — the histogram tree-learner
    // primitive (one bounds agg + one cells agg + tiny windows)
    "q223_stump_splits" -> ((s, dir) =>
      graft.reg.Trees.bestStumpSplits(li(s, dir),
          (col("l_returnflag") === "R").cast("int"),
          Seq("l_quantity" -> col("l_quantity"),
            "l_extendedprice" -> col("l_extendedprice"),
            "l_discount" -> col("l_discount")),
          bins = 16)
        .select(col("feature"), col("split_bin"),
          col("threshold").cast("float").as("threshold"),
          col("n_left"), col("n_right"),
          col("gain").cast("float").as("gain"))
        .orderBy("feature")),

    // mutual information (nats) between label-ish columns and a binned
    // measure: one contingency agg per pair, margins re-aggregated
    "q224_mutual_info" -> ((s, dir) => {
      val l = li(s, dir)
      val qbin = floor(col("l_quantity") / 5.0).cast("int")
      def tag(name: String, x: org.apache.spark.sql.Column,
          y: org.apache.spark.sql.Column) =
        graft.reg.Eval.mutualInfo(l, x, y)
          .select(lit(name).as("pair"), col("n"),
            col("hx").cast("float").as("hx"),
            col("hy").cast("float").as("hy"),
            col("mi").cast("float").as("mi"),
            col("nmi").cast("float").as("nmi"))
      tag("flag|status", col("l_returnflag"), col("l_linestatus"))
        .unionAll(tag("flag|qbin", col("l_returnflag"), qbin))
        .unionAll(tag("status|qbin", col("l_linestatus"), qbin))
        .orderBy("pair")
    }),

    // TextRank keywords: PageRank over the adjacent-token co-occurrence
    // graph (tokens >= 2 chars), 5 damped rounds, full ranked vocab.
    // k exceeds the test vocab (26 tokens) on purpose: a cut INSIDE a
    // rank-tie group is undefined across engines (double summation
    // order differs at 1e-16, so the token tie-break never engages the
    // same way twice); the top-k boundary itself is spec-pinned where
    // it is well-defined (PhraseSpec)
    "q225_textrank" -> ((s, dir) =>
      graft.pipeline.Phrase.textRank(docs(s, dir), "text", k = 100,
          iters = 5)
        .select(col("token"), col("rank").cast("float").as("rank"))
        .orderBy(col("rank").desc, col("token"))),

    // rank-1 matrix factorization of the supplier × part quantity
    // matrix: 2 alternating closed-form rounds from the all-ones start,
    // both factor sides L2-normalized — the power-iteration recommender
    "q226_rank1_mf" -> ((s, dir) =>
      graft.operators.Recommend.rank1Factors(li(s, dir),
          "l_suppkey", "l_partkey", "l_quantity", iters = 2)
        .select(col("side"), col("id"),
          col("factor").cast("float").as("factor"))
        .orderBy("side", "id")),

    // bucketed AUC on a CONTINUOUS score (the scale regime): forced
    // exact=false routes through the 256-bin histogram-CDF cuts — the
    // oracle replicates the identical cut algebra (the q197 pin) and the
    // count-below bin assignment, so the binned estimate is bit-comparable
    // cross-engine. The exact regime stays pinned by q111.
    "q227_auc_bucketed" -> ((s, dir) =>
      graft.reg.Eval.aucDF(li(s, dir),
        score = col("l_extendedprice"),
        label = col("l_returnflag") === "R",
        exact = Some(false), buckets = 256)
        .select(col("auc").cast("float").as("auc"))),

    // batch BM25: THREE queries scored against the corpus in ONE scan —
    // postings prune to the term UNION before any shuffle, per-(doc,token)
    // contribs fan out to queries via a broadcast join, per-query top-10
    // via the sharded two-phase window (no corpus-sized window partition).
    // Per-query rows are row-identical to q117 run with that term set.
    "q228_bm25_batch" -> ((s, dir) => {
      import s.implicits._
      val q = Seq(
        (0L, Seq("hash", "join")),
        (1L, Seq("stream", "vector")),
        (2L, Seq("hash", "vector", "stream"))).toDF("query_id", "terms")
      graft.pipeline.Retrieval.bm25TopKBatch(
          docs(s, dir), "doc_id", "text", q, "query_id", "terms", k = 10)
        .select(col("query_id"), col("id"),
          col("bm25").cast("float").as("bm25"), col("n_matched"),
          col("bm25_rank"))
        .orderBy("query_id", "id")
    }),

    // batch hybrid retrieval: the q215 BM25 ⊕ cosine ⊕ RRF fusion for
    // THREE queries at once — one corpus scan per branch for all queries
    // (query vectors broadcast against the embeddings; lexical candidates
    // from the batch BM25), per-query fusion keyed by query_id
    "q229_hybrid_batch" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
      val qvecs = e.filter(col("vec_id") < 3L)
        .select("vec_id", "embedding").orderBy("vec_id").collect()
        .map(r => (r.getLong(0),
          r.getSeq[Number](1).toArray.map(_.doubleValue).toSeq))
      val terms = Map(
        0L -> Seq("hash", "join"),
        1L -> Seq("stream", "vector"),
        2L -> Seq("hash", "vector", "stream"))
      val q = qvecs.toSeq.map { case (qid, qv) => (qid, terms(qid), qv) }
        .toDF("query_id", "terms", "qvec")
      graft.pipeline.Retrieval.hybridTopKBatch(
          docs(s, dir), "doc_id", "text", q, "query_id", "terms", "qvec",
          e, "vec_id", "embedding", k = 10, candidateK = 15, rrfK = 60)
        .select(col("query_id"), col("id"), col("lex_rank"), col("sem_rank"),
          col("rrf").cast("float").as("rrf"))
        .orderBy("query_id", "id")
    }),

    // batch PRF: the q219 two-round expansion for THREE queries at once —
    // each BM25 round is one corpus scan for all queries, feedback-token
    // counts are one keyed agg over the 15 feedback docs, only 3×2
    // expansion strings reach the driver
    "q230_prf_batch" -> ((s, dir) => {
      import s.implicits._
      val q = Seq(
        (0L, Seq("hash", "join")),
        (1L, Seq("stream", "vector")),
        (2L, Seq("hash", "vector", "stream"))).toDF("query_id", "terms")
      graft.pipeline.Retrieval.prfExpandedTopKBatch(
          docs(s, dir), "doc_id", "text", q, "query_id", "terms",
          k = 10, fbDocs = 5, fbTerms = 2)
        .select(col("query_id"), col("id"),
          col("bm25").cast("float").as("bm25"), col("n_matched"),
          col("bm25_rank"))
        .orderBy("query_id", "id")
    }),

    // batch MMR: greedy diversified re-rank for TWO queries — per-query
    // top-8 semantic shortlists cut distributed, greedy λ=0.7 pick of 4
    // driver-local per query (the bounded-shortlist contract)
    "q231_mmr_batch" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
      val qvecs = e.filter(col("vec_id") < 2L)
        .select("vec_id", "embedding").orderBy("vec_id").collect()
        .map(r => (r.getLong(0),
          r.getSeq[Number](1).toArray.map(_.doubleValue)))
      val cand = qvecs.map { case (qid, qv) =>
        val qvc = array(qv.toIndexedSeq.map(lit(_)): _*)
        e.filter(col("vec_id") =!= qid)
          .select(lit(qid).as("query_id"), col("vec_id"),
            Similarity.cosine(col("embedding"), qvc).as("rel"),
            col("embedding"))
          .orderBy(col("rel").desc, col("vec_id"))
          .limit(8)
      }.reduce(_ unionAll _)
      graft.pipeline.Retrieval.mmrRerankBatch(cand, "query_id", "vec_id",
          "rel", "embedding", k = 4, lambda = 0.7)
        .select(col("query_id"), col("vec_id"), col("mmr_rank"),
          col("mmr").cast("float").as("mmr"),
          col("rel").cast("float").as("rel"))
        .orderBy("query_id", "mmr_rank")
    }),
  )

  /** Operator family per battery query (round-8 verdict item #7): the
    * driver's correctness gate groups its report by these, so a
    * regression reads as "events: 41/42" instead of a row lost in 200.
    * A spec pins this map total onto [[all]] — adding a query without a
    * family tag fails the build's own gate. */
  val families: Map[String, String] = {
    val f = Map[String, Seq[String]](
      "fit-core" -> Seq(
        "q01_moments_agg", "q02_compress_cells", "q03_group_means",
        "q04_overall_means", "q05_demean_moments_1fe",
        "q06_demean_moments_2fe", "q07_mundlak_moments", "q08_hc1_meat",
        "q09_cluster_scores", "q10_counts_distinct", "q11_balance_check",
        "q12_nested_fe_check", "q22_ols_simple_fit", "q23_ols_multi_fit",
        "q24_demean_fit", "q25_mundlak_fit", "q26_hc1_fit",
        "q27_cluster_fit", "q29_predict_fit", "q49_wls_fit", "q50_predict_se",
        "q51_gof", "q59_grouped_fit", "q61_compress_cluster_fit",
        "q62_sqlgen_moments", "q63_sqlgen_compress", "q64_sqlgen_demean",
        "q65_sqlgen_mundlak", "q93_grouped_fe_fit", "q200_hdfe_3fe"),
      "design" -> Seq(
        "q13_dummies_interactions", "q14_poly_spline_terms",
        "q15_casts_filters", "q19_factor_levels"),
      "binsreg" -> Seq(
        "q16_ntile_bins", "q17_equal_width_bins", "q18_bin_geometry",
        "q28_binsreg_points", "q66_lagrange_interp",
        "q69_hist_quantile_breaks"),
      "glm" -> Seq(
        "q95_glm_logit_fit", "q96_glm_poisson_fit", "q97_glm_score",
        "q99_glm_grouped_fit", "q101_calibration", "q114_glm_gamma_fit",
        "q120_glm_negbin_fit"),
      "regression-extras" -> Seq(
        "q103_ridge_fit", "q104_huber_fit", "q105_pca_fit",
        "q106_pca_project", "q107_lasso_fit", "q110_grouped_ridge",
        "q115_iv_2sls", "q116_cv_ridge", "q118_conformal_intervals",
        "q129_bootstrap_ci", "q205_quantile_fit", "q206_quantile_grouped",
        "q207_cqr_intervals"),
      "dedup" -> Seq(
        "q30_dedup_exact", "q31_jaccard_pairs", "q32_minhash_sigs",
        "q33_minhash_pairs", "q34_simhash", "q43_dup_clusters",
        "q47_embedding_dup_clusters", "q52_winnow_fingerprint",
        "q53_embedding_lsh_pairs", "q57_dedup_corpus", "q70_contamination",
        "q72_simhash_pairs", "q78_semdedup", "q79_dup_spans",
        "q83_containment_pairs", "q87_edit_distance_pairs",
        "q88_containment_dedup", "q94_dedup_against", "q167_setsim_join",
        "q170_canonical_docs", "q171_record_linkage",
        "q233_dedup_span_removal", "q240_span_removal_incremental",
        "q245_line_dedup_removal", "q247_dedup_keep_best",
        "q248_line_dedup_incremental", "q250_dedup_against_state",
        "q251_dedup_refreshed_state", "q252_line_scrub_incremental",
        "q263_contamination_ingest", "q266_contamination_by_suite",
        "q267_decontaminate_scrub", "q269_dedup_against_all",
        "q270_cluster_refresh_cross", "q271_decontaminate_by_suite"),
      "similarity" -> Seq(
        "q35_knn_brute", "q36_knn_lsh", "q41_knn_ivf", "q56_kmeans_cells",
        "q203_knn_join_brute", "q204_knn_join",
        "q82_int8_quantize", "q92_vector_index", "q113_label_centroids",
        "q196_pq_mse", "q212_pq_rerank", "q215_hybrid_rrf",
        "q216_silhouette", "q218_mmr_rerank", "q229_hybrid_batch",
        "q231_mmr_batch", "q253_semdedup_incremental",
        "q256_vector_index_append", "q257_index_drift",
        "q259_semdedup_append", "q260_index_drift_sampled",
        "q261_semdedup_from_index"),
      "text" -> Seq(
        "q37_text_analysis", "q38_text_quality_agg", "q42_vocab_topk",
        "q45_json_extract", "q46_lm_score", "q55_tfidf_top_term",
        "q71_repetition", "q73_pii_scrub", "q74_chunking",
        "q75_url_domains", "q77_ccnet_buckets", "q84_pack_sequences",
        "q232_pack_sharded",
        "q86_token_entropy", "q91_strip_markup", "q98_gopher_rules",
        "q100_curation_pipeline", "q102_nfc_normalize", "q117_bm25_topk",
        "q219_prf_expansion", "q225_textrank", "q228_bm25_batch",
        "q230_prf_batch",
        "q119_token_chi2", "q121_pmi_collocations", "q122_zipf_spectrum",
        "q126_js_divergence", "q134_bpe_train", "q135_bpe_segment",
        "q136_repetition_signals", "q145_dsir_scores", "q149_phrase_search",
        "q160_zipf_fit", "q199_bpe_train_sampled", "q202_nb_classify",
        "q210_crosscorpus_lm"),
      "multimodal" -> Seq(
        "q39_multimodal_features", "q48_frame_sample", "q67_bmp_decode",
        "q68_wav_decode", "q151_image_ahash", "q152_image_neardup_pairs"),
      "sampling" -> Seq(
        "q21_hash_sample", "q44_stratified_topk", "q76_hash_split",
        "q80_weighted_sample", "q81_sample_mix", "q85_sample_mix_approx",
        "q158_priority_sample", "q177_stratified_sample",
        "q211_temperature_mix", "q213_temperature_mix_approx",
        "q234_token_budget_mix", "q235_token_budget_approx",
        "q236_zorder_key", "q237_top_token_budget",
        "q238_clean_then_budget", "q239_zorder_scan",
        "q241_zorder_budget", "q242_token_budget_incremental",
        "q255_zorder_append",
        "q243_top_budget_materialized", "q244_top_budget_incremental",
        "q246_repeat_token_budget", "q249_repeat_budget_incremental",
        "q254_unimax_mixture", "q258_unimax_allocation",
        "q262_unimax_merged_allocation", "q264_leakage_safe_split",
        "q265_leakage_split_merged_state", "q268_split_then_budget"),
      "events" -> Seq(
        "q40_event_windows", "q54_sessionize", "q58_asof_join",
        "q89_range_join", "q90_interval_overlap", "q137_funnel",
        "q138_retention", "q139_event_transitions", "q140_anomaly_hours",
        "q141_rolling_activity", "q147_decay_scores", "q148_cusum_shifts",
        "q153_funnel_windowed", "q154_sequence_patterns",
        "q157_snapshot_diff", "q161_survival_curve", "q162_rolling_actives",
        "q163_stickiness", "q165_funnel_by_segment", "q168_activity_streaks",
        "q169_ohlc_downsample", "q173_rolling_trend", "q174_session_stats",
        "q176_latest_per_key", "q180_resample_fill", "q184_debounce",
        "q188_cdc_merge", "q189_scd2_intervals", "q191_seasonal_residuals",
        "q192_attribution"),
      "stats" -> Seq(
        "q60_percentiles", "q111_auc", "q112_isotonic", "q123_profile",
        "q124_psi_drift", "q125_ks_test", "q127_spearman",
        "q128_categorical_assoc", "q130_target_encode",
        "q131_robust_outliers", "q132_ab_test", "q133_winsorize",
        "q142_basket_rules", "q150_percentile_rank", "q155_source_overlap",
        "q159_weighted_quantiles", "q178_cohen_kappa", "q179_lift_curve",
        "q181_prop_ztest", "q182_bh_adjust", "q185_woe_bins",
        "q186_expectations", "q190_corr_matrix", "q193_histogram",
        "q194_mann_whitney", "q195_chisq_gof", "q197_lift_curve_bucketed",
        "q198_woe_bins_bucketed", "q217_ranking_metrics",
        "q227_auc_bucketed",
        "q220_anova_oneway", "q224_mutual_info"),
      "timeseries-ml" -> Seq(
        "q221_ses_forecast", "q222_acf", "q223_stump_splits",
        "q226_rank1_mf"),
      "sketch" -> Seq(
        "q108_heavy_hitters", "q109_grouped_heavy_hitters",
        "q143_quantile_sketch", "q146_count_min", "q156_kmv_distinct",
        "q164_kmv_grouped"),
      "graphs" -> Seq(
        "q144_domain_pagerank", "q172_connected_components",
        "q201_cc_lsh_pairs", "q208_knn_graph_clusters",
        "q209_triangle_counts", "q214_label_propagation"),
      "relational" -> Seq(
        "q20_topk_orders", "q166_bloom_semijoin", "q175_cube_totals",
        "q183_skew_join", "q187_pivot")
    )
    f.flatMap { case (fam, qs) => qs.map(_ -> fam) }
  }
}
