package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Morton interleave closed-form values, Bloom position/test
  * arithmetic, and the Bloom aggregator's merge invariants (no false
  * negatives, partitioning-independent bitmaps).
  */
class BitExprsSpec extends SparkSpec {
  import spark.implicits._

  test("mortonInterleave matches the bit-interleave definition") {
    // reference implementation in plain Scala
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.sum
    val cases = Seq((0L, 0L), (3L, 1L), (1L, 3L), (1023L, 0L),
      (0L, 1023L), (1023L, 1023L), (512L, 256L), (697L, 333L))
    val got = cases.toDF("x", "y")
      .select(BitExprs.mortonInterleave(col("x"), col("y"), 10).as("z"))
      .as[Long].collect().toSeq
    assert(got == cases.map { case (x, y) => morton(x, y, 10) })
    // x=3,y=1 with 2 bits: x bits at 0,2 -> 5; y bit at 1 -> 2; z=7
    val z2 = Seq((3L, 1L)).toDF("x", "y")
      .select(BitExprs.mortonInterleave(col("x"), col("y"), 2).as("z"))
      .as[Long].head()
    assert(z2 == 7L)
  }

  test("morton z-values of all 4 quadrants split into the 4 files") {
    // bits=1, shift=0: (x,y) in {0,1}^2 -> z = x + 2y, the 2x2 curve
    val quads = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L))
    val got = quads.map(_._1).zip(quads.map(_._2)).toDF("x", "y")
      .select(BitExprs.mortonInterleave(col("x"), col("y"), 1).as("z"))
      .as[Long].collect().toSeq
    assert(got == quads.map(_._3))
  }

  test("bloom positions follow (a + i*b) mod m and bloomTest reads " +
      "exactly the set bits") {
    val m = 256
    // one key with known halves: a=200, b=77
    val words = new Array[Long](m / 64)
    val (a, b) = (200L, 77L)
    val want = (0 until 4).map(i => ((a + i * b) % m).toInt)
    want.foreach(p => words(p >>> 6) |= 1L << (p & 63))
    val df = Seq((a, b)).toDF("a", "b")
    val got = df.select((0 until 4).map(i =>
      BitExprs.bloomPos(col("a"), col("b"), i, m).as(s"p$i")): _*)
      .as[(Long, Long, Long, Long)].head()
    assert(Seq(got._1, got._2, got._3, got._4) == want.map(_.toLong))
    // every set position tests true, every other position false
    val all = spark.range(m).select(
      col("id"), BitExprs.bloomTest(words, col("id")).as("hit"))
      .as[(Long, Boolean)].collect()
    assert(all.filter(_._2).map(_._1.toInt).sorted.toSeq ==
      want.distinct.sorted)
  }

  test("BloomAgg: no false negatives and partitioning-invariant bitmap") {
    val keys = (1 to 500).map(i => s"k$i")
    val packed = shiftleft(BitExprs.md5Uint32(col("key"), "A"), 32)
      .bitwiseOR(BitExprs.md5Uint32(col("key"), "B"))
    def build(parts: Int): Array[Long] =
      keys.toDF("key").repartition(parts)
        .agg(BloomAgg.bloomSketch(4096, 4)(packed))
        .head().getSeq[Long](0).toArray
    val w1 = build(1)
    val w7 = build(7)
    assert(w1.toSeq == w7.toSeq, "merge must be partitioning-invariant")
    // membership: every built key passes all 4 probes
    val a = BitExprs.md5Uint32(col("key"), "A")
    val b = BitExprs.md5Uint32(col("key"), "B")
    val pass = (0 until 4).map(i =>
      BitExprs.bloomTest(w1, BitExprs.bloomPos(a, b, i, 4096)))
      .reduce(_ && _)
    val misses = keys.toDF("key").filter(!pass).count()
    assert(misses == 0, "a Bloom filter can never have false negatives")
  }

  test("BloomProbe expression equals the declarative " +
      "bloomPos/bloomTest chain key for key (the oracle's form)") {
    val keys = (1 to 400).map(i => s"k$i")
    val packed = shiftleft(BitExprs.md5Uint32(col("key"), "A"), 32)
      .bitwiseOR(BitExprs.md5Uint32(col("key"), "B"))
    val words = keys.take(150).toDF("key")
      .agg(BloomAgg.bloomSketch(4096, 4)(packed))
      .head().getSeq[Long](0).toArray
    val a = BitExprs.md5Uint32(col("key"), "A")
    val b = BitExprs.md5Uint32(col("key"), "B")
    val declarative = (0 until 4).map(i =>
      BitExprs.bloomTest(words, BitExprs.bloomPos(a, b, i, 4096)))
      .reduce(_ && _)
    val fused = BloomProbe.probe(words, col("key"), 4096, 4)
    val diff = keys.toDF("key")
      .select(col("key"), declarative.as("d"), fused.as("f"))
      .filter(col("d") =!= col("f")).count()
    assert(diff == 0, "fused probe diverged from the declarative chain")
    // and some non-members must exist at this m/k (sanity the pin bites)
    val passes = keys.toDF("key").filter(fused).count()
    assert(passes >= 150 && passes < 400)
  }

  test("bloomDeltaMerge: merged bitmap equals the recompute, " +
      "populations bounded by the union") {
    val base = (1 to 300).map(i => s"k$i").toDF("key")
    val delta = (250 to 400).map(i => s"k$i").toDF("key") // overlaps base
    val r = graft.operators.Profiling.bloomDeltaMerge(
      base, col("key"), delta, col("key"), mBits = 4096, k = 4).head()
    assert(r.getAs[Int]("merged_equals_recompute") == 1)
    assert(r.getAs[Long]("n_base_keys") == 300L)
    assert(r.getAs[Long]("n_delta_keys") == 151L)
    val (bb, bd, bm) = (r.getAs[Long]("bits_base"),
      r.getAs[Long]("bits_delta"), r.getAs[Long]("bits_merged"))
    assert(bm <= bb + bd && bm >= math.max(bb, bd),
      "merged population must be the union's")
  }

  test("bloom-pruned join returns exactly the plain join (the filter " +
      "is a pure execution-strategy change)") {
    val q = graft.queries.WarehouseQueries.all
      .find(_.name == "q240_bloom_pruned_join").get
    val got = q.fn(spark, sf).collect().map(_.toSeq).toSeq
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    val plain = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        graft.queries.Query.dsum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("o_orderpriority"))
      .collect().map(_.toSeq).toSeq
    assert(got == plain)
  }

  test("bloomJoinPrune census is self-consistent on testdata") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val row = graft.operators.Profiling
      .bloomJoinPrune(orders, col("o_orderkey"), li, col("l_orderkey"))
      .head()
    val get = (n: String) => row.getAs[Long](n)
    assert(get("pass_keys") >= get("true_keys"), "no false negatives")
    assert(get("false_pos_keys") == get("pass_keys") - get("true_keys"))
    assert(get("pass_rows") <= get("n_probe_rows"))
    assert(get("bits_set") <= math.min(65536L,
      get("n_build_keys") * 4), "k hashes set at most 4 bits per key")
  }
}
