package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining — which items co-occur in the
  * same basket more often than independence predicts. The classic
  * retail/recommendation primitive (and, in a training-data pipeline,
  * the co-occurrence backbone for tag/domain affinity audits).
  *
  * Scale shape: the quadratic step (pair expansion) is bounded by the
  * LARGEST BASKET, not the corpus — baskets are collected per key
  * (one shuffle), pairs expand inside the collected array, and a
  * declared `maxBasketSize` cap excludes degenerate baskets (a
  * 10⁶-item "basket" is a data bug, and 10¹² pairs from one row would
  * be an executor OOM — the [[Dedup]] bucket-cap convention). Item
  * and pair counts are vocabulary-sized frames; corpus totals ride a
  * one-row broadcast.
  */
object Association {

  /** Engine-portable 6-decimal rounding (graft-wide convention). */
  private def r6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 1e6 + 0.5) / 1e6

  /** Per-(a, b) association statistics over distinct (basket, item)
    * memberships, for item pairs co-occurring in at least `minSupport`
    * baskets:
    *
    *   - `n_ab`, `n_a`, `n_b` — basket counts (pair / each item),
    *   - `support`    = n_ab / n_baskets,
    *   - `confidence` = n_ab / n_a   (P(b in basket | a in basket),
    *     for the a < b orientation; the b→a direction is the same row
    *     with n_b in the denominator),
    *   - `lift` = n_ab·n_baskets / (n_a·n_b) — > 1 means the pair
    *     co-occurs above independence.
    *
    * One (basket) shuffle collects item sets; the pair explode is
    * per-basket bounded; pair counts partial-aggregate on the (a, b)
    * key. Baskets larger than `maxBasketSize` are dropped (declared
    * cap — quadratic safety, same convention as the dedup pairing
    * caps).
    */
  def basketPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2, maxBasketSize: Int = 10000): DataFrame = {
    val items = df.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .distinct()
    val itemCounts = items.groupBy(col("__it")).agg(count(lit(1)).as("n"))
    val nBaskets = items.select(count_distinct(col("__bk")).as("n_baskets"))
    val baskets = items.groupBy("__bk")
      .agg(array_sort(collect_list(col("__it"))).as("its"))
      .filter(size(col("its")) <= maxBasketSize)
    // ordered pairs (i < j) from the sorted per-basket array — the
    // expansion is size(its)² / 2 structs inside ONE row, bounded by
    // the cap above
    val pairs = baskets.select(explode(flatten(
        transform(col("its"), (a, i) =>
          transform(slice(col("its"), i + 2, size(col("its"))), b =>
            struct(a.as("a"), b.as("b")))))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(itemCounts.select(col("__it").as("a"), col("n").as("n_a")), "a")
      .join(itemCounts.select(col("__it").as("b"), col("n").as("n_b")), "b")
      .crossJoin(broadcast(nBaskets))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        r6(col("n_ab").cast("double") / col("n_baskets")).as("support"),
        r6(col("n_ab").cast("double") / col("n_a")).as("confidence"),
        r6(col("n_ab").cast("double") * col("n_baskets") /
          (col("n_a").cast("double") * col("n_b"))).as("lift"))
  }
}
