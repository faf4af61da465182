package graft.operators

import graft.SparkSpec

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  // 4 baskets: {a,b} ×3, {a,c} ×1 — a in 4, b in 3, c in 1
  private def baskets = Seq(
    (1, "a"), (1, "b"),
    (2, "a"), (2, "b"),
    (3, "a"), (3, "b"),
    (4, "a"), (4, "c")).toDF("bk", "it")

  test("basketPairs: counts, support, confidence and lift match the " +
      "hand-computed contingency") {
    val r = Association.basketPairs(baskets, "bk", "it", minSupport = 1)
      .collect()
      .map(x => (x.getAs[String]("a"), x.getAs[String]("b")) -> x).toMap
    val ab = r(("a", "b"))
    assert(ab.getAs[Long]("n_ab") == 3L)
    assert(ab.getAs[Long]("n_a") == 4L && ab.getAs[Long]("n_b") == 3L)
    assert(ab.getAs[Double]("support") == 0.75)
    assert(ab.getAs[Double]("confidence") == 0.75)   // 3/4, a→b
    assert(ab.getAs[Double]("lift") == 1.0)          // 3·4/(4·3)
    val ac = r(("a", "c"))
    assert(ac.getAs[Long]("n_ab") == 1L)
    assert(ac.getAs[Double]("confidence") == 0.25)
    assert(ac.getAs[Double]("lift") == 1.0)          // 1·4/(4·1)
    assert(!r.contains(("b", "c")))                  // never co-occur
  }

  test("basketPairs: duplicate (basket, item) rows collapse before " +
      "counting; minSupport prunes") {
    val dup = baskets.unionAll(Seq((1, "a"), (1, "a")).toDF("bk", "it"))
    val r = Association.basketPairs(dup, "bk", "it", minSupport = 2)
      .collect()
    assert(r.length == 1) // only (a, b) reaches support 2; counts unchanged
    assert(r.head.getAs[Long]("n_ab") == 3L)
  }

  test("basketPairs: baskets above maxBasketSize are excluded (declared " +
      "quadratic cap)") {
    val big = (1 to 20).map(i => (99, s"i$i")).toDF("bk", "it")
      .unionAll(baskets)
    val capped = Association.basketPairs(big, "bk", "it",
      minSupport = 1, maxBasketSize = 10)
    // basket 99 (20 items) is dropped: no i*-pairs survive
    assert(!capped.collect().exists(_.getAs[String]("a").startsWith("i")))
    // with the cap lifted its 190 pairs appear
    val full = Association.basketPairs(big, "bk", "it",
      minSupport = 1, maxBasketSize = 100)
    assert(full.collect()
      .count(_.getAs[String]("a").startsWith("i")) == 190)
  }

  test("basketPairCounts: per-item census equals the multiplicity " +
      "algebra definition, dupes collapse, cap excludes the basket") {
    val dup = baskets.unionAll(Seq((1, "a"), (1, "a")).toDF("bk", "it"))
    val r = Association.basketPairCounts(dup, "bk", "it")
      .collect().map(x => x.getAs[String]("it") ->
        ((x.getAs[Long]("n_baskets"), x.getAs[Long]("n_copairs")))).toMap
    // baskets: {a,b} ×3 + {a,c} — the duplicate (1, a) membership
    // collapses inside collect_set
    assert(r("a") == ((4L, 4L)), s"a: ${r("a")}") // k-1 = 1 in each
    assert(r("b") == ((3L, 3L)), s"b: ${r("b")}")
    assert(r("c") == ((1L, 1L)), s"c: ${r("c")}")
    // pair-instance identity: sum over items of n_copairs = 2 * total
    // pair instances = 2 * sum over baskets of C(k, 2)
    assert(r.values.map(_._2).sum == 2L * 4)
    // cap: a 20-item basket contributes nothing when excluded
    val big = (1 to 20).map(i => (99, s"i$i")).toDF("bk", "it")
      .unionAll(baskets)
    val capped = Association.basketPairCounts(big, "bk", "it",
      maxBasketSize = 10).collect()
    assert(!capped.exists(_.getAs[String]("it").startsWith("i")))
  }

  test("basketPairCounts: NULL items are invisible — no NULL census " +
      "row, no __k inflation for siblings (matches basketPairs' " +
      "collect_set null-skip)") {
    val withNull = baskets.unionAll(
      Seq((1, Option.empty[String])).toDF("bk", "it"))
    val r = Association.basketPairCounts(withNull, "bk", "it")
      .collect().map(x => Option(x.getAs[String]("it")) ->
        ((x.getAs[Long]("n_baskets"), x.getAs[Long]("n_copairs")))).toMap
    assert(!r.contains(None), "NULL item must not get a census row")
    // basket 1 is still {a, b} (k = 2, not 3): per-basket copair
    // degree stays k-1 = 1, so totals match the null-free fixture
    assert(r(Some("a")) == ((4L, 4L)), s"a: ${r(Some("a"))}")
    assert(r(Some("b")) == ((3L, 3L)), s"b: ${r(Some("b"))}")
  }
}
