package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Temporal

/** Temporal operators over the event log (extended surface,
  * SURVEY.md §2.10): as-of join, bounded range join, batch
  * sessionization. All three have FULL DuckDB oracles — the same
  * union/window/bucket arithmetic is expressible in portable SQL, so
  * the scale-shaped Spark plans are hash-checked end to end.
  *
  * Timestamps: `events.ts` reads as ns-epoch longs (Tables.scala), but
  * these queries work at µs precision (`ts div 1000` / `epoch_us(ts)`)
  * because DuckDB truncates the parquet ns column to µs — see `tsUs`.
  */
object TemporalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private val HourUs = 3600000000L
  private val HalfHourUs = 1800000000L

  /** Event time as µs-epoch. The parquet column is ns; DuckDB truncates
    * ns→µs on read, so BOTH engines work at µs precision — otherwise a
    * sub-µs difference could flip a boundary/tie on one side only.
    */
  private val tsUs = expr("ts div 1000")

  val all: Seq[Query] = Seq(

    // As-of join: each purchase enriched with the user's LATEST click
    // at or before the purchase instant (click-attribution shape).
    // Spark side is the union + running-window form (one shuffle, no
    // join explosion); the oracle replays the identical ordering —
    // events before probes at the same instant, max click_id among
    // equal-time clicks, payload as one struct so both fields come
    // from the same click row.
    Query("q60_asof_join", Some(
      """WITH c AS (SELECT user_id, epoch_us(ts) AS t, event_id, value
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT event_id AS probe_id, user_id, epoch_us(ts) AS t
        |      FROM events WHERE event_type = 'purchase'),
        |u AS (
        |  SELECT user_id, t, 1 AS is_probe, probe_id,
        |    CAST(NULL AS STRUCT(click_id BIGINT, click_value DOUBLE)) AS pay
        |  FROM p
        |  UNION ALL
        |  SELECT user_id, t, 0, NULL,
        |    {'click_id': event_id, 'click_value': value}
        |  FROM c),
        |w AS (SELECT *, last_value(pay IGNORE NULLS) OVER (
        |    PARTITION BY user_id
        |    ORDER BY t, is_probe, coalesce(pay.click_id, 9223372036854775807)
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lastp
        |  FROM u)
        |SELECT probe_id, user_id, lastp.click_id AS click_id,
        |  lastp.click_value AS click_value
        |FROM w WHERE is_probe = 1 ORDER BY probe_id""".stripMargin))(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), tsUs.as("ts"),
            col("event_id").as("click_id"), col("value").as("click_value"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("probe_id"), col("user_id"),
            tsUs.as("ts"))
        Temporal.asOfJoin(purchases, clicks, "user_id", "user_id",
            "ts", "ts", "click_id", Seq("click_id", "click_value"))
          .select("probe_id", "user_id", "click_id", "click_value")
          .orderBy("probe_id")
      }),

    // Range join: per error event, how many same-user events landed in
    // the preceding 30 minutes (burst-context window, exclusive of the
    // error itself). Spark buckets time into interval-width bins so
    // the non-equi predicate becomes an equi-join; the oracle is the
    // plain inequality join (affordable at verify scale). LEFT +
    // coalesce keeps zero-context errors in the result.
    Query("q61_range_join", Some(
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t
        |           FROM events WHERE event_type = 'error'),
        |e AS (SELECT user_id, epoch_us(ts) AS t FROM events)
        |SELECT p.event_id, p.user_id, COUNT(e.t) AS n_prior
        |FROM p LEFT JOIN e ON e.user_id = p.user_id
        |  AND e.t >= p.t - 1800000000 AND e.t < p.t
        |GROUP BY p.event_id, p.user_id ORDER BY p.event_id""".stripMargin))(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), tsUs.as("ts"))
        val context = ev.select(col("user_id").as("u2"), tsUs.as("t2"))
        val pairs = Temporal.rangeJoinPairs(errors, context,
          "user_id", "u2", "ts", "t2",
          lowerOffset = -HalfHourUs, upperOffset = 0L,
          eventOut = Seq("t2" -> "match_t"))
        val counts = pairs.groupBy("event_id")
          .agg(count(lit(1)).as("__n"))
        errors.join(counts, Seq("event_id"), "left")
          .select(col("event_id"), col("user_id"),
            coalesce(col("__n"), lit(0L)).as("n_prior"))
          .orderBy("event_id")
      }),

    // Batch sessionization: 1-hour-gap sessions per user, summarized
    // (count, bounds, exact-decimal value sum). The batch twin of
    // EventStream.sessionize with a full oracle — the streaming path
    // is pinned by EventStreamSpec instead.
    Query("q62_sessionize", Some(
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, value
        |           FROM events),
        |l AS (SELECT *, lag(t) OVER (PARTITION BY user_id
        |        ORDER BY t, event_id) AS prev FROM e),
        |f AS (SELECT *, CASE WHEN prev IS NULL OR t - prev > 3600000000
        |        THEN 1 ELSE 0 END AS st FROM l),
        |s AS (SELECT *, CAST(SUM(st) OVER (PARTITION BY user_id
        |        ORDER BY t, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        AS BIGINT) AS session_idx FROM f)
        |SELECT user_id, session_idx, COUNT(*) AS n_events,
        |  MIN(t) AS start_us, MAX(t) AS end_us,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin))(
      (s, dir) =>
        Temporal.sessionize(
            t(s, dir, "events").select(col("user_id"), col("event_id"),
              tsUs.as("ts"), col("value")),
            "user_id", "ts", "event_id", gap = HourUs)
          .groupBy("user_id", "session_idx")
          .agg(count(lit(1)).as("n_events"),
            min(col("ts")).as("start_us"), max(col("ts")).as("end_us"),
            Query.dsum(col("value")).as("sum_val"))
          .orderBy("user_id", "session_idx")),

    // Analytic-window battery over the per-user event timeline: gap to
    // the previous event (lag), quartile bucket (ntile), and rank
    // position (percent_rank, rounded) — the remaining window-function
    // family beyond row_number (q17) and running sums (q53/q62). One
    // shuffle on user_id; every window shares the same ordering.
    Query("q73_analytics", Some(
      """SELECT event_id, user_id,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  ROUND(percent_rank() OVER w, 6) AS pr
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |ORDER BY event_id""".stripMargin))(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"), tsUs.as("ts"))
          .select(col("event_id"), col("user_id"),
            (col("ts") - lag(col("ts"), 1).over(w)).as("gap_us"),
            ntile(4).over(w).as("quartile"),
            round(percent_rank().over(w), 6).as("pr"))
          .orderBy("event_id")
      }),

    // CUBE grouping sets — all four (type × hour-bucket) subtotal
    // combinations in one pass, completing the grouping-sets family
    // with q45's ROLLUP. Grouping-null keys normalize to sentinels
    // (Spark sorts NULLS FIRST, DuckDB NULLS LAST).
    Query("q74_cube", Some(
      """SELECT COALESCE(event_type, '<all>') AS et,
        |  COALESCE(day, '<all>') AS day,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM (SELECT event_type,
        |        CAST(epoch_ns(ts) // 86400000000000 AS VARCHAR) AS day,
        |        value FROM events)
        |GROUP BY CUBE(event_type, day)
        |ORDER BY et, day""".stripMargin))(
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_type"),
            expr("ts div 86400000000000").cast("string").as("day"),
            col("value"))
          .cube("event_type", "day")
          .agg(count(lit(1)).as("cnt"), Query.dsum(col("value")).as("sum_val"))
          .select(coalesce(col("event_type"), lit("<all>")).as("et"),
            coalesce(col("day"), lit("<all>")).as("day"),
            col("cnt"), col("sum_val"))
          .orderBy("et", "day")),

    // RANGE-frame rolling aggregates — the sliding-window family q73's
    // ROWS frames can't express: the frame is bounded by the ORDER-BY
    // VALUE (all events within the trailing hour), not a row count, so
    // ts-ties are peers in both engines and the result is
    // order-deterministic. One shuffle on user_id; the frame slides
    // per partition. Decimal window sum under the house convention.
    Query("q99_rolling_window", Some(
      """SELECT event_id, user_id,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS sum_1h
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS tus, value
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY tus
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin))(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("tus"))
          .rangeBetween(-3600000000L, 0L)
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"), tsUs.as("tus"),
            col("value"))
          .select(col("event_id"), col("user_id"),
            count(lit(1)).over(w).as("n_1h"),
            sum(col("value").cast("decimal(18,2)")).over(w)
              .cast("double").as("sum_1h"))
          .orderBy("event_id")
      }),

    // Cohort retention — the product-analytics staple: users grouped
    // by first-seen day, activity counted per (cohort, age) cell. The
    // cohort label rides a window min over the SAME user_id shuffle
    // the per-user grouping needs (no self-join), then one
    // (cohort, age) aggregation with exact distinct users. Day
    // arithmetic is integer epoch-day division, portable to the ns
    // parquet column in both engines (q74 pattern).
    Query("q100_retention", Some(
      """WITH d AS (SELECT user_id,
        |    CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day
        |  FROM events),
        |c AS (SELECT user_id, day, MIN(day) OVER (PARTITION BY user_id)
        |    AS cohort FROM d)
        |SELECT cohort, day - cohort AS age,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM c GROUP BY 1, 2 ORDER BY cohort, age""".stripMargin))(
      (s, dir) => {
        val wu = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")
        t(s, dir, "events")
          .select(col("user_id"),
            expr("ts div 86400000000000").as("day"))
          .withColumn("cohort", min(col("day")).over(wu))
          .groupBy(col("cohort"), (col("day") - col("cohort")).as("age"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy("cohort", "age")
      }),

    // Exact distributed percentiles (median/p90) — the precise
    // complement of q64's approx sketch: Spark's `percentile`
    // aggregates per-group value counts (memory bounds by DISTINCT
    // values per group, not rows) and interpolates exactly the
    // quantile_cont way; 6-decimal rounding absorbs the last-ulp
    // interpolation difference between engines.
    Query("q101_exact_percentile", Some(
      """SELECT event_type,
        |  ROUND(quantile_cont(value, 0.5), 6) AS p50,
        |  ROUND(quantile_cont(value, 0.9), 6) AS p90,
        |  COUNT(value) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))(
      (s, dir) =>
        t(s, dir, "events")
          .groupBy("event_type")
          .agg(round(percentile(col("value"), lit(0.5)), 6).as("p50"),
            round(percentile(col("value"), lit(0.9)), 6).as("p90"),
            count(col("value")).as("n"))
          .orderBy("event_type")),

    // Statistical-aggregate battery: sample stddev/variance and the
    // two-column moments (covariance, Pearson correlation) per group —
    // definitional parity with the oracle (both engines use the
    // sample (n−1) forms; skewness/kurtosis are EXCLUDED, the engines
    // disagree on bias correction). value vs event-hour is a real
    // signal pair (is activity value time-of-day dependent?). One
    // partial+final shuffle; 6-decimal rounding absorbs
    // summation-order ulps.
    Query("q105_moments", Some(
      """SELECT event_type,
        |  ROUND(stddev_samp(value), 6) AS sd,
        |  ROUND(var_samp(value), 6) AS var,
        |  ROUND(covar_samp(value, hod), 6) AS cov_vh,
        |  ROUND(corr(value, hod), 6) AS corr_vh
        |FROM (SELECT event_type, value,
        |        CAST(epoch_ns(ts) // 3600000000000 % 24 AS DOUBLE) AS hod
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin))(
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_type"), col("value"),
            (expr("ts div 3600000000000") % 24).cast("double").as("hod"))
          .groupBy("event_type")
          .agg(round(stddev_samp(col("value")), 6).as("sd"),
            round(var_samp(col("value")), 6).as("var"),
            round(covar_samp(col("value"), col("hod")), 6).as("cov_vh"),
            round(corr(col("value"), col("hod")), 6).as("corr_vh"))
          .orderBy("event_type")),

    // Literal time-slice aggregate (the dashboard/backfill shape: "one
    // week of events, grouped"): the range predicate sits on the
    // ns-epoch ts contract, which the TsRangePushdown rule rewrites to
    // a raw TIMESTAMP_NTZ comparison the parquet source pushes — so
    // the scan prunes row groups instead of reading the full fact
    // table (TsRangePushdownSpec pins the pushed filters; this query
    // keeps the rewrite on the hash-checked oracle path every round).
    // Window: 2024-01-05 .. 2024-01-12 UTC.
    Query("q179_time_slice", Some(
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM events
        |WHERE epoch_ns(ts) >= 1704412800000000000
        |  AND epoch_ns(ts) < 1705017600000000000
        |GROUP BY 1 ORDER BY event_type""".stripMargin))(
      (s, dir) =>
        t(s, dir, "events")
          .filter(col("ts") >= lit(1704412800000000000L) &&
            col("ts") < lit(1705017600000000000L))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), Query.dsum(col("value")).as("sum_val"))
          .orderBy("event_type"))
  ,

    // Per-user interval-union coverage (gaps-and-islands): each event
    // opens a [ts, ts + value minutes) activity span; overlapping or
    // touching spans merge into maximal islands (running-max-end
    // detection, island = running count of new starts). µs contract,
    // FLOOR'd duration (Spark double→long casts truncate, DuckDB's
    // round — FLOOR on both sides pins the same integer).
    Query("q210_interval_merge", Some(
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + CAST(FLOOR(value * 60000000) AS BIGINT) AS en
        |  FROM events),
        |m AS (SELECT *, MAX(en) OVER (PARTITION BY user_id
        |    ORDER BY s, en, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM e),
        |g AS (SELECT *, SUM(CASE WHEN pme IS NULL OR s > pme
        |    THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
        |    ORDER BY s, en, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM m)
        |SELECT user_id, CAST(island AS BIGINT) AS island,
        |  MIN(s) AS start, MAX(en) AS "end", COUNT(*) AS n_spans
        |FROM g GROUP BY user_id, island
        |ORDER BY user_id, island""".stripMargin))(
      (s, dir) =>
        Temporal.mergeIntervals(
            t(s, dir, "events").select(col("user_id"), col("event_id"),
              tsUs.as("s"),
              (tsUs + floor(col("value") * lit(60000000L)).cast("long"))
                .as("en")),
            "user_id", "s", "en", "event_id")
          .select(col("user_id"), col("island").cast("long").as("island"),
            col("start"), col("end"), col("n_spans"))
          .orderBy("user_id", "island"))
  )
}
