package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts nulls/distincts and renders min/max as strings") {
    val df = Seq((Option(1L), Option("b")), (None: Option[Long], Option("a")),
      (Option(3L), None: Option[String])).toDF("k", "s")
    val r = Profiling.profile(df, Seq("k" -> col("k"), "s" -> col("s")))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(3), x.getString(4))))
      .toMap
    assert(r("k") == ((1L, 2L, "1", "3")))
    assert(r("s") == ((1L, 2L, "a", "b")))
  }

  test("profile accepts display names with dots (no alias round-trip)") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val r = Profiling.profile(df, Seq("t.a" -> col("a"), "t.b" -> col("b")))
      .collect().map(_.getString(0)).sorted
    assert(r.toSeq == Seq("t.a", "t.b"))
  }

  test("histogram: clamps out-of-range values into edge bins, keeps " +
      "empty bins, drops nulls") {
    // range [0, 10), 5 bins of width 2; -3 clamps to bin 0, 42 to bin 4;
    // bin 3 is empty; the null is not counted anywhere
    val df = Seq(Some(-3.0), Some(0.0), Some(1.9), Some(2.0), Some(5.0),
      Some(42.0), None).toDF("v")
    val out = Profiling.histogram(df, col("v"), 0.0, 10.0, 5)
      .orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 0.0, 2.0, 3L), (1L, 2.0, 4.0, 1L), (2L, 4.0, 6.0, 1L),
      (3L, 6.0, 8.0, 0L), (4L, 8.0, 10.0, 1L)))
    assert(out.map(_._4).sum == 6L) // totals reconcile: nulls excluded
  }

  test("keySkew: uniform keys score gini 0 and ratio 1; a hot key " +
      "dominates both") {
    val uniform = (1 to 40).map(i => (i % 4).toLong).toDF("k")
    val u = Profiling.keySkew(uniform, col("k")).head()
    assert(u.getLong(0) == 4L && u.getLong(1) == 40L && u.getLong(2) == 10L)
    assert(u.getDouble(3) == 1.0 && u.getDouble(4) == 0.0)
    // 37 rows of key 0 + three singletons: ratio 3.7, gini near 1
    val hot = (Seq.fill(37)(0L) ++ Seq(1L, 2L, 3L)).toDF("k")
    val h = Profiling.keySkew(hot, col("k")).head()
    assert(h.getDouble(3) == 3.7)
    assert(h.getDouble(4) > 0.6, s"gini ${h.getDouble(4)}")
    // nulls are not a key
    assert(Profiling.keySkew(Seq(Some(1L), None).toDF("k"), col("k"))
      .head().getLong(1) == 1L)
  }

  test("poissonBootstrapCI: thresholds are a valid Poisson(1) CDF " +
      "ladder and a constant group collapses to a zero-width CI") {
    val ts = Profiling.poissonThresholds32
    assert(ts.size == 8)
    assert(ts == ts.sorted && ts.distinct == ts, "CDF cut points monotone")
    // P(W=0) = e^-1: the first cut point sits at e^-1 of uint32 space
    assert(math.abs(ts.head / 4294967296.0 - math.exp(-1.0)) < 1e-9)
    // cdf_7 ≈ 0.99999 — the ladder covers all but ~1e-5 of the space
    assert(ts.last / 4294967296.0 > 0.99998)

    // a constant-valued group: every replicate's weighted mean is the
    // constant (weights cancel), so the CI is exactly zero-width
    val df = ((1 to 60).map(i => ("a", s"k$i", 5.0)) ++
      (1 to 60).map(i => ("b", s"k$i", if (i % 2 == 0) 0.0 else 10.0)))
      .toDF("g", "id", "v")
    val r = Profiling.poissonBootstrapCI(df, col("g"), col("id"), col("v"))
      .collect().map(x => x.getString(0) ->
        ((x.getDouble(1), x.getDouble(2), x.getDouble(3)))).toMap
    assert(r("a") == ((5.0, 5.0, 5.0)))
    // mixed group: a real band that brackets the point estimate, and the
    // whole statistic is md5-deterministic (rerun is bit-identical)
    val (m, lo, hi) = r("b")
    assert(m == 5.0 && lo < hi && lo <= m && m <= hi, s"($m,$lo,$hi)")
    val r2 = Profiling.poissonBootstrapCI(df, col("g"), col("id"), col("v"))
      .collect().map(x => (x.getString(0), x.getDouble(2), x.getDouble(3)))
      .toSet
    assert(r2 == Set(("a", 5.0, 5.0), ("b", lo, hi)))
  }

  test("mutualInformation: identical columns give MI = H and NMI = 1; " +
      "independent columns give MI = 0") {
    // X == Y with p = (1/2, 1/4, 1/4): MI = H = 1.5 ln 2 ≈ 1.039721
    val dep = Seq("a", "a", "b", "c").map(x => (x, x)).toDF("x", "y")
    val d = Profiling.mutualInformation(dep, col("x"), col("y")).head()
    assert(d.getLong(0) == 4L && d.getLong(1) == 3L)
    assert(d.getDouble(2) == 1.039721 && d.getDouble(2) == d.getDouble(3))
    assert(d.getDouble(5) == 1.0)
    // balanced product distribution: joint = px·py exactly → MI 0
    val ind = (for (x <- Seq("a", "b"); y <- Seq("u", "v", "w"))
      yield (x, y)).toDF("x", "y")
    val i = Profiling.mutualInformation(ind, col("x"), col("y")).head()
    assert(i.getLong(1) == 6L && i.getDouble(2) == 0.0 &&
      i.getDouble(5) == 0.0)
  }

  test("fdConfidence: an exact FD scores 1/holds and a violated one " +
      "scores its g3 confidence") {
    val df = Seq((1, "x"), (1, "x"), (2, "y"), (3, "y"), (3, "z"),
      (3, "z"), (3, "z")).toDF("l", "r")
    val out = Profiling.fdConfidence(Seq(
        ("holds", df.filter(col("l") < 3), col("l"), col("r")),
        ("violated", df, col("l"), col("r"))))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getBoolean(5)))).toMap
    assert(out("holds") == ((3L, 2L, 0L, 1.0, true)))
    // lhs 3 splits 1×y + 3×z → keep 3; total kept 2+1+3 = 6 of 7
    assert(out("violated") == ((7L, 3L, 1L, 0.857143, false)))
  }

  test("kmvDistinct: exact below k, the (k-1)/u_k estimate above it, " +
      "and an ALL row merged from the group sketches") {
    // group a: 3 distinct hashes (< k=4) → est == exact == 3.
    // group b: 6 distinct hashes → est = 3·2^32/h_4
    val bHashes = Seq(100L, 200L, 300L, 400L, 500L, 600L)
    val rows = Seq(("a", 11L), ("a", 22L), ("a", 33L), ("a", 22L)) ++
      bHashes.map(("b", _))
    val df = rows.toDF("g", "h")
    val out = Profiling.kmvDistinct(df, col("g"), col("h"), k = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(out("a") == ((3L, 3, 3.0)))
    val estB = BigDecimal(3.0 * 4294967296.0 / 400L)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("b") == ((6L, 4, estB)))
    // ALL: union's bottom-4 is {11,22,33,100} → u_4 = 100
    val estAll = BigDecimal(3.0 * 4294967296.0 / 100L)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("ALL") == ((9L, 4, estAll)))
  }

  test("fkOrphans: counts orphans and distinct missing keys, exempts " +
      "null FKs, and clears a clean pair") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), Some(9L), Some(8L),
      None).toDF("fk")
    val out = Profiling.fkOrphans(Seq(
        ("dirty", child, col("fk"), parent, col("pk")),
        ("clean", child.filter(col("fk") <= 3), col("fk"), parent,
          col("pk"))))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    // 6 child rows: 1 null (exempt), 3 orphans over 2 missing keys
    assert(out("dirty") == ((6L, 1L, 3L, 2L, false)))
    // the <= 3 filter also drops the null row (null <= 3 is null)
    assert(out("clean") == ((2L, 0L, 0L, 0L, true)))
  }

  test("kmvDeltaMerge equals a full recompute: merged groups, a group " +
      "new in the delta, and a group absent from it") {
    val k = 4
    val base = Seq(("a", Seq(10L, 20L, 30L, 40L)), ("b", Seq(5L)))
      .toDF("group", "sk")
    // delta: a gets two smaller hashes (one duplicate), c is brand new
    val delta = Seq(("a", 15L), ("a", 20L), ("a", 1L), ("c", 99L))
      .toDF("g", "h")
    val out = Profiling.kmvDeltaMerge(base, delta, col("g"), col("h"), k)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // full recompute of a: distinct {10,20,30,40,15,1} → bottom-4
    assert(out("a") == Seq(1L, 10L, 15L, 20L))
    assert(out("b") == Seq(5L)) // untouched group survives the merge
    assert(out("c") == Seq(99L)) // delta-only group appears
  }

  test("kmvJoinCardinality: under-capacity sketches make every " +
      "estimate exact") {
    // 100 distinct keys on A (each twice), 100 on B, 50 shared; with
    // k above every distinct count the sketches hold the full hash
    // sets, so the estimator's exact branches must reproduce the true
    // numbers: d_a=100, d_b=100, overlap=50, join = 50·(200/100)·1.
    val a = (1 to 100).flatMap(i => Seq(i, i)).toDF("k")
    val b = (51 to 150).map(identity).toDF("k")
    val r = Profiling.kmvJoinCardinality(
      Seq(("a*b", a, col("k"), b, col("k"))), k = 256).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_a") == 200L)
    assert(row.getAs[Long]("n_b") == 100L)
    assert(row.getAs[Double]("est_distinct_a") == 100.0)
    assert(row.getAs[Double]("est_distinct_b") == 100.0)
    assert(row.getAs[Double]("est_overlap") == 50.0)
    assert(row.getAs[Double]("est_join_rows") == 100.0)
  }

  test("kmvJoinCardinality: null keys are excluded and at-capacity " +
      "estimates stay in a sane band") {
    val a = ((1 to 1000).map(Option(_)) ++ Seq.fill(10)(None)).toDF("k")
    val b = (501 to 1500).map(identity).toDF("k")
    val r = Profiling.kmvJoinCardinality(
      Seq(("a*b", a, col("k"), b, col("k"))), k = 64).collect().head
    assert(r.getAs[Long]("n_a") == 1000L) // nulls never join
    // KMV with k=64 has ~12% relative sd; 3σ band on the true 1000
    val ea = r.getAs[Double]("est_distinct_a")
    assert(ea > 600 && ea < 1600, s"est_distinct_a=$ea")
    val ov = r.getAs[Double]("est_overlap")
    assert(ov > 150 && ov < 1100, s"est_overlap=$ov")
  }

  test("welchTTest: statistics replay the closed form from exact sums") {
    val df = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(2.0, 4.0, 6.0, 8.0).map(("b", _))).toDF("g", "v")
    val r = Profiling.welchTTest(df, col("g"), col("v")).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("pair") == "a|b")
    assert(row.getAs[Long]("n_a") == 3L)
    assert(row.getAs[Long]("n_b") == 4L)
    assert(row.getAs[Double]("mean_a") == 2.0)
    assert(row.getAs[Double]("mean_b") == 5.0)
    // replay the same IEEE chain the operator declares
    val (na, nb) = (3.0, 4.0)
    val (sva, svva) = (6.0, 14.0)
    val (svb, svvb) = (20.0, 120.0)
    val sea = (svva - sva * sva / na) / (na - 1) / na
    val seb = (svvb - svb * svb / nb) / (nb - 1) / nb
    val t = (sva / na - svb / nb) / math.sqrt(sea + seb)
    val dfw = (sea + seb) * (sea + seb) /
      (sea * sea / (na - 1) + seb * seb / (nb - 1))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("t") == r6(t))
    assert(row.getAs[Double]("df") == r6(dfw))
  }

  test("welchTTest: groups below two non-null values drop out") {
    val df = Seq(("a", Option(1.0)), ("a", Option(2.0)),
      ("b", Option(5.0)), ("c", None: Option[Double]),
      ("c", None: Option[Double])).toDF("g", "v")
    val pairs = Profiling.welchTTest(df, col("g"), col("v"))
      .select("pair").collect().map(_.getString(0))
    assert(pairs.isEmpty) // only "a" survives; no pair to form
  }

  test("iqrOutliers: Tukey fences flag the planted extremes per group") {
    // group a: 1..11 plus outliers -100 and +100. quantile_cont over
    // the 13 sorted values interpolates at index 0.25·12 = 3 → q1 = 3
    // and 0.75·12 = 9 → q3 = 9, so IQR 6 → fences [-6, 18] →
    // one low, one high. group b: constant — IQR 0, no outliers.
    val a = ((1 to 11).map(_.toDouble) ++ Seq(-100.0, 100.0)).map(("a", _))
    val b = Seq.fill(5)(("b", 7.0))
    val df = (a ++ b).toDF("g", "v")
    val out = Profiling.iqrOutliers(df, Seq("g"), col("v"))
      .orderBy("g")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("a", -6.0, 18.0, 13L, 1L, 1L), ("b", 7.0, 7.0, 5L, 0L, 0L)))
  }

  test("histQuantiles: closed-form interpolation on known bins; " +
      "negative values and exact boundary mass") {
    // x = 1..10, width 5: bin 0 = {1,2,3,4} (cnt 4), bin 1 = {5..9}
    // (cnt 5), bin 2 = {10} (cnt 1). median target t = 0.5·10 = 5 →
    // first cum ≥ 5 is bin 1 (cum 9): est = 5 + (5−4)/5·5 = 6.0.
    // q=0.9 → t = 9 → bin 1 (cum 9 ≥ 9): est = 5 + (9−4)/5·5 = 10.0.
    val df = (1 to 10).map(v => ("x", v.toDouble)).toDF("g", "v")
    val sk = Profiling.histSketch(df, col("g"), col("v"), binWidth = 5.0)
    val got = Profiling.histQuantiles(sk, Seq(0.5, 0.9), binWidth = 5.0)
      .orderBy("q").collect()
      .map(r => (r.getDouble(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq((0.5, 10L, 6.0), (0.9, 10L, 10.0)), got.toString)
    // negative values land in floor bins: -1.0 → bin -1
    val neg = Profiling.histSketch(Seq(("x", -1.0)).toDF("g", "v"),
      col("g"), col("v"), binWidth = 5.0).head()
    assert(neg.getLong(1) == -1L)
  }

  test("histMerge: bin-wise merge of split halves equals the direct " +
      "sketch — the exact delta-refresh algebra") {
    val vs = (1 to 20).map(v => ("x", v * 1.5)) ++
      Seq.fill(3)(("y", 2.0))
    val df = vs.toDF("g", "v")
    val whole = Profiling.histSketch(df, col("g"), col("v"), 5.0)
    val a = Profiling.histSketch(df.filter(col("v") < 10), col("g"),
      col("v"), 5.0)
    val b = Profiling.histSketch(df.filter(col("v") >= 10), col("g"),
      col("v"), 5.0)
    val merged = Profiling.histMerge(a, b)
    assert(merged.exceptAll(whole).isEmpty &&
      whole.exceptAll(merged).isEmpty)
  }
}
