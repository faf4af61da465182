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
}
