package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("psi: identical distributions score ~0; a shifted one scores high") {
    val ref = (1 to 100).map(i => (i % 10).toDouble).toDF("v")
    val same = Drift.psi(ref, ref, col("v"), 0.0, 10.0, 10).head()
    assert(same.getAs[Long]("n_ref") == 100L)
    assert(same.getAs[Long]("n_cur") == 100L)
    assert(math.abs(same.getAs[Double]("psi")) < 1e-9)
    // current mass concentrated in the top bin: strong shift
    val cur = Seq.fill(100)(9.5).toDF("v")
    val moved = Drift.psi(ref, cur, col("v"), 0.0, 10.0, 10).head()
    assert(moved.getAs[Double]("psi") > 0.25, moved.getAs[Double]("psi"))
  }

  test("psi is asymmetric-input safe: empty bins stay finite (smoothing)") {
    val ref = Seq(1.0, 1.0, 1.0).toDF("v")
    val cur = Seq(8.0, 8.0, 8.0).toDF("v")
    val r = Drift.psi(ref, cur, col("v"), 0.0, 10.0, 5).head()
    assert(!r.isNullAt(r.fieldIndex("psi")))
    assert(r.getAs[Double]("psi") > 1.0) // disjoint supports = big drift
  }

  test("ksStatistic: identical samples give 0, disjoint give 1, " +
      "known mixed case matches the hand CDF") {
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    assert(Drift.ksStatistic(a, a, col("v")).head().getAs[Double]("ks")
      == 0.0)
    val b = Seq(10.0, 11.0).toDF("v")
    val d = Drift.ksStatistic(a, b, col("v")).head()
    assert(d.getAs[Double]("ks") == 1.0)
    assert(d.getAs[Long]("n_a") == 4L && d.getAs[Long]("n_b") == 2L)
    // a = {1,2,3,4}, b = {3,4,4,5}: max gap at v=2 → |2/4 - 0/4| = 0.5
    val c = Seq(3.0, 4.0, 4.0, 5.0).toDF("v")
    assert(Drift.ksStatistic(a, c, col("v")).head().getAs[Double]("ks")
      == 0.5)
  }

  test("ksStatistic survives many partitions (distributed prefix sum)") {
    val a = spark.range(1000).select((col("id") % 100).cast("double").as("v"))
      .repartition(13)
    val b = spark.range(1000)
      .select(((col("id") % 100) + 50).cast("double").as("v"))
      .repartition(7)
    val ks = Drift.ksStatistic(a, b, col("v")).head().getAs[Double]("ks")
    assert(ks == 0.5, ks) // half the mass is shifted past the overlap
  }

  test("snapshotDiff classifies added/removed/changed/unchanged " +
      "null-safely") {
    val old = Seq((1L, Option("a")), (2L, Option("b")), (3L, None),
      (4L, Option("d"))).toDF("k", "x")
    val nw = Seq((2L, Option("B")), (3L, None), (4L, Option("d")),
      (5L, Option("e"))).toDF("k", "x")
    val out = Drift.snapshotDiff(old, nw, Seq("k"), Seq("x"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "changed", 3L -> "unchanged",
      4L -> "unchanged", 5L -> "added"))
  }

  test("snapshotDiff carries old/new values for every compare column") {
    val old = Seq((1L, 10.0, "x")).toDF("k", "a", "b")
    val nw = Seq((1L, 11.0, "x")).toDF("k", "a", "b")
    val r = Drift.snapshotDiff(old, nw, Seq("k"), Seq("a", "b")).head()
    assert(r.getAs[String]("status") == "changed")
    assert(r.getAs[String]("old_a") == "10.0" &&
      r.getAs[String]("new_a") == "11.0")
    assert(r.getAs[String]("old_b") == "x" && r.getAs[String]("new_b") == "x")
  }

  test("psiTimeline: a bucket matching the corpus scores ~0, a shifted " +
      "bucket scores high, and n reconciles per bucket") {
    // buckets 1 and 2 share the corpus shape; bucket 3 is concentrated
    val rows = (1 to 100).map(i => (1L, (i % 10).toDouble)) ++
      (1 to 100).map(i => (2L, (i % 10).toDouble)) ++
      Seq.fill(100)((3L, 9.5))
    val df = rows.toDF("b", "v")
    val r = Drift.psiTimeline(df, col("b"), col("v"), 0.0, 10.0, 10)
      .collect().map(x => x.getAs[Long]("bucket") -> x).toMap
    assert(r.values.forall(_.getAs[Long]("n") == 100L))
    // the reference is the corpus MARGINAL (includes bucket 3's spike),
    // so even the uniform buckets drift a little — but identically,
    // and far less than the concentrated bucket
    assert(r(2L).getAs[Double]("psi") == r(1L).getAs[Double]("psi"))
    assert(r(3L).getAs[Double]("psi") > 0.25)
    assert(r(3L).getAs[Double]("psi") > 2 * r(1L).getAs[Double]("psi"))
    // with a homogeneous corpus every bucket matches its reference: ~0
    val homog = (1 to 100).map(i => (1L, (i % 10).toDouble)) ++
      (1 to 100).map(i => (2L, (i % 10).toDouble))
    val h = Drift.psiTimeline(homog.toDF("b", "v"), col("b"), col("v"),
        0.0, 10.0, 10)
      .collect().map(_.getAs[Double]("psi"))
    assert(h.forall(p => math.abs(p) < 1e-9), h.toSeq.toString)
  }

  test("psiTimeline: empty bins contribute smoothed terms (no infinities)") {
    val df = (Seq.fill(10)((1L, 1.0)) ++ Seq.fill(10)((2L, 8.0)))
      .toDF("b", "v")
    val r = Drift.psiTimeline(df, col("b"), col("v"), 0.0, 10.0, 5)
      .collect()
    assert(r.length == 2)
    assert(r.forall(x => !x.getAs[Double]("psi").isInfinite &&
      !x.getAs[Double]("psi").isNaN))
  }

  test("cusumCounts equals the textbook max(0, S + (x - mu)) recursion " +
      "and alarms only on the sustained shift") {
    // 6 quiet buckets of 10 rows, then 4 buckets of 30 — a sustained
    // level shift the recursion accumulates across buckets
    val ns = Seq(10, 10, 10, 10, 10, 10, 30, 30, 30, 30)
    val rows = ns.zipWithIndex.flatMap { case (n, b) =>
      Seq.fill(n)(b.toLong)
    }
    val got = Drift.cusumCounts(rows.toDF("b"), col("b"))
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
    val mu = ns.sum.toDouble / ns.length
    val sigma = math.sqrt(
      ns.map(n => (n - mu) * (n - mu)).sum / (ns.length - 1))
    var s = 0.0
    val want = ns.zipWithIndex.map { case (n, b) =>
      s = math.max(0.0, s + (n - mu))
      (b.toLong, n.toLong, math.floor(s * 1e6 + 0.5) / 1e6,
        s > 3.0 * sigma)
    }
    assert(got.toSeq == want)
    // the shift, not any single bucket, crosses the line
    assert(!got(6)._4 && got(9)._4)
  }

  test("acfCounts: hand-computed ACF of an alternating series — " +
      "odd lags negative, even lags positive") {
    // counts per bucket: 2,1,2,1,2,1 → mean 1.5, d = ±0.5 alternating
    // denom = 6·0.25 = 1.5; lag1: 5·(−0.25) → −5/6; lag2: 4·0.25 →
    // 2/3; lag3: 3·(−0.25) → −0.5
    val df = Seq(1, 1, 2, 3, 3, 4, 5, 5, 6).toDF("b")
    val got = Drift.acfCounts(df, col("b"), maxLag = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq(
      (1L, r6(-1.25 / 1.5), 5L),
      (2L, r6(1.0 / 1.5), 4L),
      (3L, r6(-0.75 / 1.5), 3L)))
  }
}
