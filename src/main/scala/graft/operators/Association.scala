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
    *
    * COST, measured: the pair explode materializes Σ over baskets of
    * C(k, 2) rows before the (a, b) aggregation — on the TPC-H-shaped
    * 100× rehearsal that is ~90M shuffled pair rows and 61.5 s, the
    * single heaviest declared query (2× the next; BENCH_SF10). That
    * is the honest ceiling of the ROW-MATERIALIZING form, kept for
    * consumers that need the per-(a, b) rows themselves. For census
    * questions (per-item co-occurrence degree, predicted expansion
    * size) use [[basketPairCounts]] — linear in memberships, no pair
    * row ever built, 16.6 s on the same 100× input — and pick this
    * operator only deliberately. A tighter `maxBasketSize` bounds the
    * worst basket's k² contribution when the per-pair rows are needed
    * but tail baskets are junk.
    *
    * DEFAULT CAP = 1000 (r14 decision, was 10000): the expansion
    * builds C(k, 2) structs inside ONE row before exploding, so the
    * cap bounds a single task's row size, not just total work — at
    * 10000 the worst basket is a ~50M-struct array (multi-GB in one
    * row, an executor OOM in waiting); at 1000 it is ≤ ~500K structs
    * (~tens of MB), while catalog baskets past 1000 distinct items
    * are curation junk by any retail/session reading. No declared
    * query's data comes near either value (TPC-H orders hold ≤ 7
    * items), so oracle hashes are unchanged; callers with legitimate
    * mega-baskets raise it explicitly and own the row-size math.
    */
  def basketPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2, maxBasketSize: Int = 1000): DataFrame = {
    // ONE basket-key shuffle builds the distinct item sets directly
    // (collect_set dedups in the aggregation buffer) — the previous
    // distinct-then-collect form shuffled the full membership frame
    // twice. Deliberately NOT persisted: the three consumers (item
    // counts, basket total, pair expansion) each re-run the cheap
    // scan+shuffle, which measures FASTER at 100× (39 s vs 66 s)
    // than materializing the multi-GB set frame through a storage
    // pool it cannot fit in — MEMORY_AND_DISK spilled it to disk and
    // the writeback fought the pair stage (and the next query) for
    // the same spindle. The r15 middle ground — eagerly persisting
    // only the SMALL derived frames (item counts + basket total) to
    // share one set-build — also measured WORSE at true 100× (48-55 s
    // vs 34-36 s): the extra materialization jobs serialize a DAG
    // that otherwise pipelines all three subtrees' stages inside one
    // job. Three logical builds, one scheduled job, is the fast form.
    val sets =
      df.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
        .groupBy("__bk").agg(collect_set(col("__it")).as("its"))
    val itemCounts = sets.select(explode(col("its")).as("__it"))
      .groupBy(col("__it")).agg(count(lit(1)).as("n"))
    val nBaskets = sets.select(count(lit(1)).as("n_baskets"))
    val baskets = sets
      .filter(size(col("its")) <= maxBasketSize)
      .select(array_sort(col("its")).as("its"))
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

  /** COUNT-ONLY twin of [[basketPairs]] (r10 verdict lever a): exact
    * per-item co-occurrence pair-instance counts via multiplicity
    * algebra — an item in a basket of size k participates in (k − 1)
    * pair instances, so per-item totals are one join of the membership
    * frame against basket sizes plus one aggregation. NO pair row is
    * ever materialized: the sibling's Σ k²/2 explode (the 100×-heavy
    * step) is replaced by work linear in the membership rows. Use this
    * for the census questions (how co-connected is each item, how big
    * would the pair expansion be) and fall back to [[basketPairs]]
    * only when the per-(a, b) rows themselves are needed.
    *
    * Same `maxBasketSize` cap semantics as the sibling (over-cap
    * baskets contribute NOTHING — not memberships, not pair counts),
    * so the census predicts the sibling's workload exactly. Output per
    * item: `n_baskets` (capped baskets containing it) and `n_copairs`
    * (Σ (k − 1) over those baskets — its pair-instance degree).
    */
  def basketPairCounts(df: DataFrame, basketCol: String, itemCol: String,
      maxBasketSize: Int = 10000): DataFrame = {
    // All-codegen join shape, NOT a collect_set build: the set form
    // object-aggregates millions of small arrays, and that allocation
    // pressure made this census 2.2× slower mid-suite at the 100×
    // rehearsal (GC drag on a heap already carrying index-build
    // debris) than this equivalent distinct → sizes → join → census
    // chain, where every stage is a whole-stage-codegen hash
    // aggregation over slim fixed-width rows. One more exchange on
    // paper, strictly faster in practice — and the shape a real
    // cluster co-partitions for free when the membership frame is
    // bucketed by basket key. Over-cap baskets are dropped whole by
    // the size filter before the join, the same census-predicts-
    // sibling contract as before.
    // NULL items are dropped BEFORE sizing: [[basketPairs]] builds
    // baskets with collect_set, which skips NULLs, so a (basket,
    // NULL) membership must not inflate __k here or emit a NULL
    // census row — the census-predicts-sibling contract depends on
    // both operators seeing the identical item multiset
    val d = df.select(col(basketCol).as("__bk"), col(itemCol).as("it"))
      .filter(col("it").isNotNull)
      .distinct()
    val sz = d.groupBy("__bk").agg(count(lit(1)).as("__k"))
      .filter(col("__k") <= maxBasketSize)
    d.join(sz, "__bk")
      .groupBy(col("it"))
      .agg(count(lit(1)).as("n_baskets"),
        sum(col("__k") - 1).as("n_copairs"))
  }
}
