package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining: directed association rules
  * (support / confidence / lift) from a (basket, item) relation — the
  * classic "what co-occurs with what" question over order lines, document
  * tags, or event sequences.
  *
  * Scale shape: the quadratic step is a self-join KEYED ON THE BASKET, so
  * each basket expands independently as size², never corpus²; the
  * `maxBasketSize` valve drops degenerate mega-baskets (a crawl page with
  * 10⁴ items would otherwise emit 10⁸ pairs) BEFORE the join, bounding
  * worst-case expansion at valve². The `minPairSupport` filter runs on the
  * aggregated pair counts before any dimension join, so the rule frame the
  * item-frequency joins see is already small; item frequencies join by
  * key (AQE broadcasts them when small, shuffled-hash otherwise — an
  * item dimension at web scale must not broadcast). All ratios are
  * single-division exact-integer doubles, so results are
  * partition-layout-independent.
  */
object Baskets {

  /** Directed rules a → b over co-occurrence counts.
    *
    * support(a→b)    = n_ab / N        (N = baskets surviving the valve)
    * confidence(a→b) = n_ab / n_a
    * lift(a→b)       = (n_ab · N) / (n_a · n_b)
    *
    * Returns (antecedent, consequent, n_pair, support, confidence, lift),
    * one row per direction of each pair with n_pair ≥ `minPairSupport`.
    * Counts are over DISTINCT basket membership (duplicate order lines of
    * one item count once).
    */
  def associationRules(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairSupport: Long = 2L,
      maxBasketSize: Int = 100
  ): DataFrame = {
    require(minPairSupport >= 1, s"minPairSupport must be >= 1, got $minPairSupport")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    // explicit null filter BEFORE the distinct: the pair join and the
    // valve join would otherwise push DIFFERENT IsNotNull sets into their
    // branches, making the two (bk, it) distinct exchanges non-canonical —
    // with it, every branch reuses ONE scan+shuffle of the relation
    val items = df
      .select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .filter(col("__bk").isNotNull && col("__it").isNotNull)
      .distinct()
    val kept = items
      .groupBy("__bk").agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") <= maxBasketSize)
      .select("__bk")
    // one shuffle on __bk serves the valve join AND both sides of the
    // pair self-join (exchange reuse); baskets is small per key
    val basket = items.join(kept, Seq("__bk"))
    val pairs = basket.select(col("__bk"), col("__it").as("__a"))
      .join(basket.select(col("__bk"), col("__it").as("__b")), Seq("__bk"))
      .filter(col("__a") < col("__b"))
      .groupBy("__a", "__b")
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairSupport)
    val itemCounts = basket.groupBy(col("__it")).agg(count(lit(1)).as("__ni"))
    val nBaskets = basket.agg(count_distinct(col("__bk")).as("__nb"))
    val directed = pairs
      .select(col("__a").as("antecedent"), col("__b").as("consequent"), col("n_pair"))
      .union(pairs
        .select(col("__b").as("antecedent"), col("__a").as("consequent"), col("n_pair")))
    directed
      .join(itemCounts.select(col("__it").as("antecedent"), col("__ni").as("__na")),
        Seq("antecedent"))
      .join(itemCounts.select(col("__it").as("consequent"), col("__ni").as("__nc")),
        Seq("consequent"))
      .crossJoin(broadcast(nBaskets))
      .select(
        col("antecedent"), col("consequent"), col("n_pair"),
        (col("n_pair").cast("double") / col("__nb")).as("support"),
        (col("n_pair").cast("double") / col("__na")).as("confidence"),
        // multiply AS doubles: a long n_pair·N product overflows 2^63
        // once baskets exceed ~3·10⁹; each factor is exact in double
        ((col("n_pair").cast("double") * col("__nb")) /
          (col("__na").cast("double") * col("__nc"))).as("lift"))
  }
}
