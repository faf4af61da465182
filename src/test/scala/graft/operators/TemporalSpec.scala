package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the temporal-operator semantics on hand-built fixtures: as-of
  * visibility/tie rules, range-join boundary inclusivity across bin
  * borders, and sessionization gap edges.
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  // ---- asOfJoin -----------------------------------------------------

  private def asOfFixture = {
    // key 1: events at t=10 (e1), t=20 (e2, e3 — tie), t=30 (e4)
    // key 2: no events
    val events = Seq(
      (1L, 10L, 100L, "e1"), (1L, 20L, 101L, "e2"), (1L, 20L, 102L, "e3"),
      (1L, 30L, 103L, "e4"))
      .toDF("k", "t", "eid", "tag")
    val probes = Seq(
      (1L, 5L, "before-any"), (1L, 10L, "at-first"), (1L, 20L, "at-tie"),
      (1L, 25L, "between"), (1L, 99L, "after-all"), (2L, 50L, "no-events"))
      .toDF("k", "t", "why")
    (probes, events)
  }

  test("asOfJoin: latest event at-or-before, null when none") {
    val (probes, events) = asOfFixture
    val out = Temporal.asOfJoin(probes, events, "k", "k", "t", "t", "eid",
        Seq("eid", "tag"))
      .collect().map(r => (r.getString(2), Option(r.get(3)).orNull)).toMap
    assert(out("before-any") == null)
    assert(out("at-first") == 100L)    // <= is inclusive
    assert(out("between") == 102L)
    assert(out("after-all") == 103L)
    assert(out("no-events") == null)
  }

  test("asOfJoin: equal-time event ties resolve to the max tie column") {
    val (probes, events) = asOfFixture
    val atTie = Temporal.asOfJoin(probes, events, "k", "k", "t", "t", "eid",
        Seq("eid", "tag"))
      .filter(col("why") === "at-tie").head()
    assert(atTie.getLong(3) == 102L && atTie.getString(4) == "e3")
  }

  test("asOfJoin: payload fields come from one row even when null") {
    // e5 has the greater eid but a NULL tag — a per-column last() would
    // stitch (105, "e4-tag") from two rows; the struct must not.
    val events = Seq(
      (1L, 10L, 104L, Some("old")), (1L, 20L, 105L, None: Option[String]))
      .toDF("k", "t", "eid", "tag")
    val probes = Seq((1L, 30L, "p")).toDF("k", "t", "why")
    val r = Temporal.asOfJoin(probes, events, "k", "k", "t", "t", "eid",
      Seq("eid", "tag")).head()
    assert(r.getLong(3) == 105L && r.isNullAt(4))
  }

  // ---- rangeJoinPairs ----------------------------------------------

  test("rangeJoinPairs: half-open interval, exact across bin borders") {
    // interval [t-10, t): width 10, so events bin at t div 10 — probe
    // at t=25 covers [15, 25): e at 15 in (boundary), 25 out, 14 out,
    // 24 in; events in a DIFFERENT bin than the probe must still match.
    val events = Seq((1L, 14L, "x"), (1L, 15L, "in-low"), (1L, 19L, "in-bin1"),
      (1L, 24L, "in-bin2"), (1L, 25L, "out-high"), (2L, 20L, "other-key"))
      .toDF("k2", "t2", "tag")
    val probes = Seq((1L, 25L, 900L)).toDF("k", "t", "pid")
    val got = Temporal.rangeJoinPairs(probes, events, "k", "k2", "t", "t2",
        lowerOffset = -10L, upperOffset = 0L, eventOut = Seq("tag" -> "tag"))
      .select("tag").as[String].collect().sorted
    assert(got.toSeq == Seq("in-bin1", "in-bin2", "in-low"))
  }

  test("rangeJoinPairs: each matching event pairs exactly once") {
    val events = Seq((1L, 5L, "a"), (1L, 6L, "b")).toDF("k2", "t2", "tag")
    val probes = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("k", "t", "pid")
    val got = Temporal.rangeJoinPairs(probes, events, "k", "k2", "t", "t2",
        -7L, 0L, Seq("tag" -> "tag"))
      .groupBy("pid", "tag").count().filter(col("count") > 1).count()
    assert(got == 0L)
  }

  // ---- sessionize ---------------------------------------------------

  test("sessionize: gap strictly greater than `gap` starts a session") {
    // gaps: 10 (stay), 11 (new), 10 (stay); key 2 independent
    val df = Seq((1L, 0L, 1L), (1L, 10L, 2L), (1L, 21L, 3L), (1L, 31L, 4L),
      (2L, 1000L, 5L)).toDF("k", "t", "eid")
    val out = Temporal.sessionize(df, "k", "t", "eid", gap = 10L)
      .select("eid", "session_idx").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("sessionize: equal-time events share a session deterministically") {
    val df = Seq((1L, 0L, 1L), (1L, 0L, 2L), (1L, 100L, 3L))
      .toDF("k", "t", "eid")
    val out = Temporal.sessionize(df, "k", "t", "eid", gap = 10L)
      .select("eid", "session_idx").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  // ---- resampleFill -------------------------------------------------

  test("resampleFill: grid covers min..max per key, gaps filled forward") {
    // key 1 observes buckets 0 and 3 (width 10); 1 and 2 are gaps.
    // key 2 observes only bucket 5 — a one-row grid, no bleed from key 1.
    val df = Seq((1L, 5L, 10.0), (1L, 35L, 40.0), (2L, 55L, 7.0))
      .toDF("k", "t", "v")
    val out = Temporal.resampleFill(df, "k", "t", width = 10L,
        aggs = Seq(count(lit(1)).as("n"), max(col("v")).as("mv")),
        fillCols = Seq("mv"))
      .orderBy("k", "bucket")
      .select("k", "bucket", "n", "mv", "mv_ff")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).orNull, Option(r.get(3)).orNull, r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 1L, 10.0, 10.0),
      (1L, 1L, null, null, 10.0),
      (1L, 2L, null, null, 10.0),
      (1L, 3L, 1L, 40.0, 40.0),
      (2L, 5L, 1L, 7.0, 7.0)))
  }

  test("resampleFill: negative times bucket by FLOOR division") {
    // width 10: t=-15 → bucket -2, t=-5 → bucket -1, t=5 → bucket 0.
    // Truncating division would fold -5 and 5 into one double-width
    // bucket 0 and misalign the whole grid.
    val df = Seq((1L, -15L, 1.0), (1L, -5L, 2.0), (1L, 5L, 3.0))
      .toDF("k", "t", "v")
    val out = Temporal.resampleFill(df, "k", "t", width = 10L,
        aggs = Seq(max(col("v")).as("mv")), fillCols = Seq("mv"))
      .orderBy("bucket").select("bucket", "mv")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq((-2L, 1.0), (-1L, 2.0), (0L, 3.0)))
  }

  // ---- funnel -------------------------------------------------------

  test("funnel: steps must complete strictly in order") {
    // u1 completes a→b→c; u2 has c BEFORE b (no conversion past a);
    // u3 has b at the SAME instant as a (strict >, not ≥ — no advance);
    // u4 never does a.
    val df = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 10L, "a"), (2L, 30L, "c"), (2L, 40L, "b"),
      (3L, 10L, "a"), (3L, 10L, "b"),
      (4L, 10L, "b"))
      .toDF("u", "t", "e")
    val out = Temporal.funnel(df, "u", "t", Seq(
        "a" -> (col("e") === "a"), "b" -> (col("e") === "b"),
        "c" -> (col("e") === "c")))
      .orderBy("u")
      .collect().map(r => (r.getLong(0), Option(r.get(1)).orNull,
        Option(r.get(2)).orNull, Option(r.get(3)).orNull))
    assert(out.toSeq == Seq(
      (1L, 10L, 20L, 30L),
      (2L, 10L, 40L, null),   // c at t=30 precedes b — not a conversion
      (3L, 10L, null, null),  // same-instant b does not advance
      (4L, null, null, null)))
  }

  test("funnel: maxGap voids steps past the attribution window") {
    // u1 converts b within the gap; u2's b is 100 ticks late — the
    // journey stops at a even though a LATER in-window c exists
    val df = Seq(
      (1L, 10L, "a"), (1L, 15L, "b"),
      (2L, 10L, "a"), (2L, 110L, "b"), (2L, 111L, "c"))
      .toDF("u", "t", "e")
    val out = Temporal.funnel(df, "u", "t", Seq(
        "a" -> (col("e") === "a"), "b" -> (col("e") === "b"),
        "c" -> (col("e") === "c")), maxGap = Some(10L))
      .orderBy("u")
      .collect().map(r => (r.getLong(0), Option(r.get(1)).orNull,
        Option(r.get(2)).orNull, Option(r.get(3)).orNull))
    assert(out.toSeq == Seq(
      (1L, 10L, 15L, null),
      (2L, 10L, null, null)))
    // boundary: exactly prev + gap is IN the window (<=)
    val edge = Temporal.funnel(
      Seq((1L, 0L, "a"), (1L, 10L, "b")).toDF("u", "t", "e"),
      "u", "t", Seq("a" -> (col("e") === "a"), "b" -> (col("e") === "b")),
      maxGap = Some(10L)).head()
    assert(edge.getLong(2) == 10L)
  }

  test("funnel: earliest qualifying time wins per step") {
    val df = Seq((1L, 10L, "a"), (1L, 5L, "b"), (1L, 20L, "b"),
      (1L, 50L, "b")).toDF("u", "t", "e")
    val r = Temporal.funnel(df, "u", "t", Seq(
      "a" -> (col("e") === "a"), "b" -> (col("e") === "b"))).head()
    assert(r.getLong(1) == 10L && r.getLong(2) == 20L)
  }

  // ---- applyChangelog -----------------------------------------------

  private def cdcFixture = {
    val base = Seq((1L, 100.0), (2L, 200.0), (3L, 300.0), (4L, 400.0))
      .toDF("k", "bal")
    // k=1 untouched; k=2 two upserts (latest wins); k=3 deleted;
    // k=4 deleted then re-upserted; k=5 pure insert (no base row)
    val changes = Seq(
      (2L, 20.0, "U", 10L, 1L), (2L, 25.0, "U", 20L, 2L),
      (3L, 0.0, "D", 10L, 3L),
      (4L, 0.0, "D", 10L, 4L), (4L, 44.0, "U", 20L, 5L),
      (5L, 55.0, "U", 10L, 6L))
      .toDF("k", "bal", "op", "t", "eid")
    (base, changes)
  }

  test("applyChangelog: latest-wins upsert/delete merge of base + delta") {
    val (base, changes) = cdcFixture
    val out = Temporal.applyChangelog(base, changes, "k",
        Seq("t", "eid"), "op", deleteOp = "D")
      .orderBy("k").as[(Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 100.0), (2L, 25.0), (4L, 44.0), (5L, 55.0)))
  }

  test("applyChangelog: equal-time changes resolve by the tie column") {
    val base = Seq((1L, 0.0)).toDF("k", "bal")
    val changes = Seq((1L, 10.0, "U", 5L, 1L), (1L, 20.0, "U", 5L, 2L))
      .toDF("k", "bal", "op", "t", "eid")
    val out = Temporal.applyChangelog(base, changes, "k",
      Seq("t", "eid"), "op", "D").head()
    assert(out.getDouble(1) == 20.0)
  }

  test("applyChangelog: rejects a changelog missing value columns") {
    val base = Seq((1L, 0.0)).toDF("k", "bal")
    val changes = Seq((1L, "U", 5L)).toDF("k", "op", "t")
    val e = intercept[IllegalArgumentException](
      Temporal.applyChangelog(base, changes, "k", Seq("t"), "op", "D"))
    assert(e.getMessage.contains("bal"))
  }

  // ---- scd2 ---------------------------------------------------------

  test("scd2: unchanged consecutive records collapse into one interval") {
    // k=1 tiers: A(t10) A(t20) B(t30) A(t40) — the repeat at t20 merges
    val df = Seq((1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
      (1L, 40L, 4L, "A")).toDF("k", "t", "eid", "tier")
    val out = Temporal.scd2(df, "k", "t", "eid", Seq("tier"))
      .orderBy("valid_from")
      .select("tier", "valid_from", "valid_to")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).orNull))
    assert(out.toSeq == Seq(("A", 10L, 30L), ("B", 30L, 40L), ("A", 40L, null)))
  }

  test("scd2: null attributes compare null-safely (no phantom changes)") {
    val df = Seq((1L, 10L, 1L, None: Option[String]),
      (1L, 20L, 2L, None: Option[String]), (1L, 30L, 3L, Some("x")))
      .toDF("k", "t", "eid", "tier")
    val out = Temporal.scd2(df, "k", "t", "eid", Seq("tier"))
    assert(out.count() == 2)
  }

  test("scd2: keys build independent histories") {
    val df = Seq((1L, 10L, 1L, "A"), (2L, 5L, 2L, "A"))
      .toDF("k", "t", "eid", "tier")
    val out = Temporal.scd2(df, "k", "t", "eid", Seq("tier"))
      .filter(col("valid_to").isNotNull).count()
    assert(out == 0) // both rows are their key's current version
  }

  test("timeWeightedAvg: interval weights, zero-weight last observation") {
    // key 1: v=10 holds 100µs, v=20 holds 300µs, v=99 has no successor
    // → twap = (10·100 + 20·300) / 400 = 17.5
    val df = Seq((1L, 0L, 1L, 10.0), (1L, 100L, 2L, 20.0),
      (1L, 400L, 3L, 99.0)).toDF("k", "t", "eid", "v")
    val r = Temporal.timeWeightedAvg(df, "k", "t", "eid", "v").head()
    assert(r.getAs[Long]("n_intervals") == 2L)
    assert(r.getAs[Long]("span_us") == 400L)
    assert(r.getAs[Double]("twap") == 17.5)
  }

  test("timeWeightedAvg: single-observation keys vanish; same-instant " +
      "ties get zero-width intervals") {
    val df = Seq((1L, 10L, 1L, 5.0), // single observation → no output
      (2L, 0L, 1L, 1.0), (2L, 0L, 2L, 7.0), (2L, 10L, 3L, 3.0))
      .toDF("k", "t", "eid", "v")
    val out = Temporal.timeWeightedAvg(df, "k", "t", "eid", "v")
      .collect().map(r => r.getAs[Long]("k") -> r).toMap
    assert(!out.contains(1L))
    // key 2: (1.0, w=0), (7.0, w=10) → twap = 7.0 over span 10
    assert(out(2L).getAs[Long]("span_us") == 10L)
    assert(out(2L).getAs[Double]("twap") == 7.0)
  }

  // ---- decayAgg -----------------------------------------------------

  test("decayAgg: per-event quantized exponential weights from the " +
      "global horizon") {
    // horizon 100, half-life 10: weights exp(-ln2·Δ/10)
    val ev = Seq((1L, 100L, 2.0), (1L, 90L, 4.0), (2L, 80L, 10.0))
      .toDF("k", "t", "v")
    def w(d: Long) = math.exp(-math.log(2.0) * (d.toDouble / 10.0))
    def q6(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val out = Temporal.decayAgg(ev, "k", "t", "v", 10L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // key 1: 2.0·w(0) + 4.0·w(10); key 2: 10.0·w(20)
    assert(out(1L) == ((2L,
      (q6(2.0 * w(0)) + q6(4.0 * w(10))) / 1e6,
      (q6(w(0)) + q6(w(10))) / 1e6)))
    assert(out(2L) == ((1L, q6(10.0 * w(20)) / 1e6, q6(w(20)) / 1e6)))
    // the at-horizon event carries full weight; older ones decay
    assert(out(1L)._3 > 1.0 && out(1L)._3 < 2.0)
  }

  // ---- kaplanMeier --------------------------------------------------

  test("kaplanMeier: censoring, at-risk counts, and the KM product") {
    // width 10, censor 25; horizon = 100 (user 5's last event).
    // durations: u1 = 0 (last 90, obs? 90 < 75 no → censored)
    //            u2 = 2 (last 30 < 75 → churned at t=2)
    //            u3 = 2 (last 40 < 75 → churned at t=2)
    //            u4 = 5 (last 60 < 75 → churned at t=5)
    //            u5 = 9 (last 100 → censored)
    val ev = Seq(
      (1L, 85L), (1L, 90L),
      (2L, 5L), (2L, 30L),
      (3L, 15L), (3L, 40L),
      (4L, 5L), (4L, 60L),
      (5L, 5L), (5L, 100L)
    ).toDF("k", "t")
    val out = Temporal.kaplanMeier(ev, "k", "t", 10L, 25L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // only churn times 2 and 5 appear (t=0 and t=9 are censor-only)
    assert(out.keySet == Set(2L, 5L))
    // at t=2: at-risk {u2,u3,u4,u5} = 4, churned 2 → S = 1/2
    val s2 = math.floor(
      math.exp(math.floor(math.log(0.5) * 1e9 + 0.5) / 1e9) * 1e6 + 0.5
    ) / 1e6
    assert(out(2L) == ((4L, 2L, s2)))
    // at t=5: at-risk {u4,u5} = 2, churned 1 → S = 1/2 · 1/2
    val s5 = math.floor(math.exp(
      (math.floor(math.log(0.5) * 1e9 + 0.5) * 2) / 1e9) * 1e6 + 0.5) / 1e6
    assert(out(5L) == ((2L, 1L, s5)))
  }

  test("kaplanMeier: survival hits exactly 0 when the last at-risk " +
      "cohort fully churns, without passing -inf through exp") {
    // width 1, censor 10; horizon 100: u1/u2 churn at t=1 and are the
    // entire final at-risk set → S(1) = 0. u3 churns at 0.
    val ev = Seq(
      (1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L),
      (3L, 30L), (10L, 100L)
    ).toDF("k", "t")
    // u1: dur (11-10)/1 = 1; u2: 1; u3: 0; u10: 0 censored
    val out = Temporal.kaplanMeier(ev, "k", "t", 1L, 10L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(0L)._2 == 1L && out(0L)._1 == 4L)
    assert(out(1L) == ((2L, 2L, 0.0)))
  }

  test("mergeIntervals: overlaps and touches merge, gaps split, keys " +
      "are independent, containment folds in") {
    val spans = Seq(
      // user 1: [0,10)+[5,15) overlap, [15,20) touches -> one island;
      // [21,25) gaps -> second island; [22,23) contained in it
      (1L, 100L, 0L, 10L), (1L, 101L, 5L, 15L), (1L, 102L, 15L, 20L),
      (1L, 103L, 21L, 25L), (1L, 104L, 22L, 23L),
      // user 2: same instants as user 1 but its own islands
      (2L, 200L, 0L, 2L), (2L, 201L, 50L, 60L)
    ).toDF("user_id", "event_id", "s", "en")
    val got = Temporal.mergeIntervals(spans, "user_id", "s", "en",
        "event_id")
      .orderBy("user_id", "island")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 1L, 0L, 20L, 3L),
      (1L, 2L, 21L, 25L, 2L),
      (2L, 1L, 0L, 2L, 1L),
      (2L, 2L, 50L, 60L, 1L)))
  }

  test("stationaryDistribution: converges to the analytic fixed point " +
      "and keeps explicit 0 rows for source states") {
    // P = [[.5,.5],[.25,.75]] has stationary (1/3, 2/3); |λ2| = 0.25,
    // so 12 rounds from uniform land within 3e-9 — exact under round(6)
    val tr = Seq(("a", "a", 2L), ("a", "b", 2L), ("b", "a", 1L),
      ("b", "b", 3L)).toDF("prev", "next", "cnt")
    val out = Temporal.stationaryDistribution(tr, "prev", "next", "cnt")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("a" -> 0.333333, "b" -> 0.666667))
    // a feeds b, b self-loops: all mass drains to b; the source state
    // keeps a dense 0.0 row (the oracle's LEFT JOIN contract)
    val drain = Seq(("a", "b", 1L), ("b", "b", 1L))
      .toDF("prev", "next", "cnt")
    val d = Temporal.stationaryDistribution(drain, "prev", "next", "cnt")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(d == Map("a" -> 0.0, "b" -> 1.0))
    // transitions into a state with no outgoing edges are dropped
    // BEFORE normalization: c's mass reroutes nowhere — rows to c are
    // excluded, so a→a is the only kept edge and π = (1.0) on {a}
    val sink = Seq(("a", "a", 1L), ("a", "c", 9L))
      .toDF("prev", "next", "cnt")
    val k = Temporal.stationaryDistribution(sink, "prev", "next", "cnt")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(k == Map("a" -> 1.0))
  }
}
