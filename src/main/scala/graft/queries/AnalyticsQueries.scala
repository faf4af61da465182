package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Incremental, Multimodal, Profiling,
  Temporal, TextAnalysis}

/** Time-series / warehouse-maintenance analytics over the event log
  * plus the round's entity-resolution/graph/retrieval additions
  * (extended surface, SURVEY.md §2.10 continuation): grid resampling
  * with forward fill, ordered funnels, distribution summaries
  * (histogram, Tukey fences), CDC snapshot merge, SCD2 history,
  * edit-distance-1 fuzzy matching, co-purchase triangle enumeration,
  * and inverted-index build. All have FULL DuckDB oracles — the
  * window/spine/merge/join arithmetic is portable SQL, so the
  * scale-shaped Spark plans are hash-checked end to end (the fuzzy
  * matcher's oracle is the O(n²) all-pairs definition its blocking
  * provably equals).
  *
  * Time convention: µs precision via `ts div 1000` / `epoch_us(ts)`
  * (the TemporalQueries contract — DuckDB truncates the parquet ns
  * column to µs).
  */
object AnalyticsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private val HourUs = 3600000000L

  /** Event time as µs-epoch (see TemporalQueries.tsUs). */
  private val tsUs = expr("ts div 1000")

  /** The support-2 co-purchase edge set (parts sharing an order at
    * least twice), from a (l_orderkey, l_partkey) frame. ONE basket
    * shuffle builds distinct per-order item sets (collect_set dedups —
    * no separate membership distinct), the pair explode is bounded by
    * order size UNDER THE DECLARED CAP, and the support filter is one
    * partial-aggregated (pa, pb) shuffle. Shared by the from-scratch
    * q114 enumeration and the [[copurchaseEdgeTable]] build.
    *
    * `maxBasketSize` (r14, found by the skew rehearsal): the nested
    * transform materializes the FULL k×k struct array inside one row
    * BEFORE the a<b filter, so a single hot order bounds a single
    * task's row size — the 30%-hot-key rehearsal put ~2M distinct
    * parts in one order and the 4×10¹²-struct row OOMed any heap.
    * Orders past the cap are dropped, the same declared-quadratic-
    * safety convention as [[graft.operators.Association.basketPairs]]
    * and the Adamic-Adar `maxCenterDegree`; TPC-H orders hold ≤ 7
    * items, so declared-query hashes are unaffected.
    */
  private def copurchaseEdges(li: DataFrame,
      maxBasketSize: Int = 1000): DataFrame = {
    val perOrder = li.groupBy("l_orderkey")
      .agg(collect_set(col("l_partkey")).as("ps"))
      .filter(size(col("ps")) <= maxBasketSize)
    val pairArr = filter(
      flatten(transform(col("ps"), x =>
        transform(col("ps"), y => struct(x.as("pa"), y.as("pb"))))),
      p => p.getField("pa") < p.getField("pb"))
    perOrder.select(explode(pairArr).as("p"))
      .select(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2)
      .select("pa", "pb")
  }

  private val coEdgeCache = new graft.SessionCache[String]

  /** The MAINTAINED co-purchase graph — the support-2 edge set
    * persisted as a warehouse table, built once per (session, sfDir)
    * and amortized in the bench prebuild step like the ANN/delta
    * indexes. This is the deployment shape the graph census queries
    * (q187) probe: the edge set is the expensive-to-derive artifact
    * (a full pair expansion over the fact table), so a deployment
    * materializes and maintains it rather than re-deriving it per
    * analytical question; q114 keeps the from-scratch derivation as
    * the build-cost twin.
    */
  def copurchaseEdgeTable(s: SparkSession, dir: String): String = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir/lineitem/coedges".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    val name = s"graft_coedges_$hex"
    coEdgeCache.get(s, name) {
      s.sql(s"DROP TABLE IF EXISTS $name")
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), name)
      val fs = loc.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(loc)) fs.delete(loc, true)
      graft.sources.Layout.writeBucketed(
        copurchaseEdges(t(s, dir, "lineitem")
          .select("l_orderkey", "l_partkey")),
        name, Seq("pa"), 16)
      name
    }
  }

  val all: Seq[Query] = Seq(

    // Resample to an hourly grid with forward fill: per user, one row
    // per hour from first to last activity — observed event count and
    // exact-decimal value sum where data exists, the sum carried
    // forward across silent hours. The spine derives from the
    // aggregate frame (one scan of events), the fill is a running
    // window on the same user partitioning. Gap-filling is what makes
    // a time series JOINABLE on the grid downstream.
    Query("q107_resample_fill", Some(
      """WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS bkt,
        |            value FROM events),
        |o AS (SELECT user_id, bkt, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
        |  FROM e GROUP BY 1, 2),
        |s AS (SELECT user_id, UNNEST(generate_series(MIN(bkt), MAX(bkt)))
        |    AS bkt FROM o GROUP BY user_id),
        |j AS (SELECT s.user_id, s.bkt, o.n, o.sv
        |  FROM s LEFT JOIN o ON o.user_id = s.user_id AND o.bkt = s.bkt)
        |SELECT user_id, bkt AS bucket, COALESCE(n, 0) AS n_obs,
        |  sv AS sum_val,
        |  last_value(sv IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY bkt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS sum_val_ff
        |FROM j ORDER BY user_id, bucket""".stripMargin))(
      (s, dir) =>
        Temporal.resampleFill(
            t(s, dir, "events").select(col("user_id"), tsUs.as("tus"),
              col("value")),
            "user_id", "tus", HourUs,
            aggs = Seq(count(lit(1)).as("__n"),
              Query.dsum(col("value")).as("sum_val")),
            fillCols = Seq("sum_val"))
          .select(col("user_id"), col("bucket"),
            coalesce(col("__n"), lit(0L)).as("n_obs"),
            col("sum_val"), col("sum_val_ff"))
          .orderBy("user_id", "bucket")),

    // Ordered conversion funnel signup → click → purchase: a step
    // counts only strictly after the user's previous step time, so a
    // purchase that precedes the first click does not convert. One
    // shuffle on user_id (stacked conditional window minima), then a
    // three-counter reduction presented as one row per step.
    Query("q108_funnel", Some(
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_type
        |           FROM events),
        |w1 AS (SELECT *, MIN(CASE WHEN event_type = 'signup' THEN tus END)
        |    OVER (PARTITION BY user_id) AS t1 FROM e),
        |w2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND tus > t1
        |    THEN tus END) OVER (PARTITION BY user_id) AS t2 FROM w1),
        |w3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND tus > t2
        |    THEN tus END) OVER (PARTITION BY user_id) AS t3 FROM w2),
        |u AS (SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
        |  FROM w3 GROUP BY user_id)
        |SELECT * FROM (
        |  SELECT 1 AS step_idx, 'signup' AS step, COUNT(t1) AS n_users
        |  FROM u
        |  UNION ALL SELECT 2, 'click', COUNT(t2) FROM u
        |  UNION ALL SELECT 3, 'purchase', COUNT(t3) FROM u)
        |ORDER BY step_idx""".stripMargin))(
      (s, dir) => {
        val f = Temporal.funnel(
          t(s, dir, "events").select(col("user_id"), tsUs.as("tus"),
            col("event_type")),
          "user_id", "tus", Seq(
            "signup" -> (col("event_type") === "signup"),
            "click" -> (col("event_type") === "click"),
            "purchase" -> (col("event_type") === "purchase")))
        f.agg(count(col("t_signup")).as("c1"), count(col("t_click")).as("c2"),
            count(col("t_purchase")).as("c3"))
          .select(explode(array(
            struct(lit(1).as("step_idx"), lit("signup").as("step"),
              col("c1").as("n_users")),
            struct(lit(2).as("step_idx"), lit("click").as("step"),
              col("c2").as("n_users")),
            struct(lit(3).as("step_idx"), lit("purchase").as("step"),
              col("c3").as("n_users")))).as("s"))
          .select(col("s.step_idx").as("step_idx"), col("s.step").as("step"),
            col("s.n_users").as("n_users"))
          .orderBy("step_idx")
      }),

    // Fixed-width histogram of event value over [0, 500) in 20 bins,
    // edge-clamped (every non-null value lands in exactly one bin so
    // the totals reconcile), empty bins present via the broadcast
    // spine. One aggregation on a ≤20-ary key.
    Query("q109_histogram", Some(
      """WITH c AS (SELECT CAST(LEAST(GREATEST(FLOOR(value / 25.0), 0), 19)
        |    AS BIGINT) AS bin, COUNT(*) AS cnt
        |  FROM events WHERE value IS NOT NULL GROUP BY 1)
        |SELECT s.bin, s.bin * 25.0 AS lo_edge, (s.bin + 1) * 25.0 AS hi_edge,
        |  COALESCE(c.cnt, 0) AS cnt
        |FROM (SELECT UNNEST(generate_series(0, 19)) AS bin) s
        |LEFT JOIN c ON c.bin = s.bin ORDER BY s.bin""".stripMargin))(
      (s, dir) =>
        Profiling.histogram(t(s, dir, "events"), col("value"),
            lo = 0.0, hi = 500.0, nBins = 20)
          .orderBy("bin")),

    // Tukey-fence outlier summary per event type: exact quartiles,
    // 1.5×IQR fences (6-decimal rounded BEFORE comparison — see
    // Profiling.iqrOutliers), per-fence outlier counts. The fence
    // frame broadcasts; the fact side never shuffles for flagging.
    Query("q110_iqr_outliers", Some(
      """WITH f AS (SELECT event_type,
        |    ROUND(quantile_cont(value, 0.25)
        |      - 1.5 * (quantile_cont(value, 0.75)
        |               - quantile_cont(value, 0.25)), 6) AS lo_fence,
        |    ROUND(quantile_cont(value, 0.75)
        |      + 1.5 * (quantile_cont(value, 0.75)
        |               - quantile_cont(value, 0.25)), 6) AS hi_fence
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type, f.lo_fence, f.hi_fence,
        |  COUNT(e.value) AS n,
        |  COUNT(CASE WHEN e.value < f.lo_fence THEN 1 END) AS n_low,
        |  COUNT(CASE WHEN e.value > f.hi_fence THEN 1 END) AS n_high
        |FROM events e JOIN f USING (event_type)
        |GROUP BY 1, 2, 3 ORDER BY event_type""".stripMargin))(
      (s, dir) =>
        Profiling.iqrOutliers(
            t(s, dir, "events").select(col("event_type"), col("value")),
            Seq("event_type"), col("value"))
          .orderBy("event_type")),

    // CDC snapshot merge: the customer balance snapshot (keys < 200)
    // patched by the event changelog — latest change per user wins,
    // 'error' means delete, users with no changes keep their base row.
    // One co-shuffle of base ∪ delta on the key; the base is never
    // joined (the 100 TB-snapshot shape).
    Query("q111_cdc_merge", Some(
      """WITH base AS (SELECT c_custkey AS user_id, c_acctbal AS bal
        |  FROM customer WHERE c_custkey < 200),
        |ch AS (SELECT user_id, value AS bal,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    epoch_us(ts) AS tus, event_id FROM events),
        |u AS (
        |  SELECT user_id, bal, op, 1 AS pri, tus, event_id FROM ch
        |  UNION ALL
        |  SELECT user_id, bal, '__base', 0, NULL, NULL FROM base),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |  ORDER BY pri DESC, tus DESC, event_id DESC) AS rn FROM u)
        |SELECT user_id, bal FROM r WHERE rn = 1 AND op <> 'D'
        |ORDER BY user_id""".stripMargin))(
      (s, dir) => {
        val base = t(s, dir, "customer").filter(col("c_custkey") < 200)
          .select(col("c_custkey").as("user_id"), col("c_acctbal").as("bal"))
        val changes = t(s, dir, "events").select(col("user_id"),
          col("value").as("bal"),
          when(col("event_type") === "error", "D").otherwise("U").as("op"),
          tsUs.as("tus"), col("event_id"))
        Temporal.applyChangelog(base, changes, "user_id",
            Seq("tus", "event_id"), "op", deleteOp = "D")
          .orderBy("user_id")
      }),

    // SCD2 history of each user's purchase-value tier (floor(val/100)):
    // consecutive same-tier purchases collapse into one validity
    // interval [valid_from, valid_to); the open current version has
    // valid_to null. Two stacked windows on one user_id partitioning.
    // (user_id, valid_from) is a verified total order — no µs ties
    // among purchases at any test sf.
    Query("q112_scd2", Some(
      """WITH p AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
        |    CAST(FLOOR(value / 100.0) AS BIGINT) AS tier
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT *, lag(tier) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id) AS prev FROM p),
        |k AS (SELECT * FROM c WHERE prev IS NULL OR prev <> tier)
        |SELECT user_id, tier, tus AS valid_from,
        |  lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
        |    AS valid_to
        |FROM k ORDER BY user_id, valid_from""".stripMargin))(
      (s, dir) =>
        Temporal.scd2(
            t(s, dir, "events").filter(col("event_type") === "purchase")
              .select(col("user_id"), tsUs.as("tus"), col("event_id"),
                floor(col("value") / 100.0).cast("long").as("tier")),
            "user_id", "tus", "event_id", Seq("tier"))
          .select("user_id", "tier", "valid_from", "valid_to")
          .orderBy("user_id", "valid_from")),

    // Group-wise ordinary least squares: slope/intercept/R² of event
    // value against hour-of-day per event type — the "is this metric
    // time-of-day dependent, and how much" modeling primitive on top
    // of q105's raw moments. The SQL-standard regr_* aggregates are
    // definitional (moment sums), so one partial+final shuffle
    // computes all four; 6-decimal rounding absorbs summation-order
    // ulps (the q105 convention).
    Query("q118_regression", Some(
      """SELECT event_type,
        |  CAST(regr_count(value, hod) AS BIGINT) AS n,
        |  ROUND(regr_slope(value, hod), 6) AS slope,
        |  ROUND(regr_intercept(value, hod), 6) AS icept,
        |  ROUND(regr_r2(value, hod), 6) AS r2
        |FROM (SELECT event_type, value,
        |        CAST(epoch_ns(ts) // 3600000000000 % 24 AS DOUBLE) AS hod
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin))(
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_type"), col("value"),
            (expr("ts div 3600000000000") % 24).cast("double").as("hod"))
          .groupBy("event_type")
          .agg(regr_count(col("value"), col("hod")).as("n"),
            round(regr_slope(col("value"), col("hod")), 6).as("slope"),
            round(regr_intercept(col("value"), col("hod")), 6).as("icept"),
            round(regr_r2(col("value"), col("hod")), 6).as("r2"))
          .orderBy("event_type")),

    // Rolling z-score anomaly detection: each event scored against the
    // mean/stddev of its user's PREVIOUS 10 events (frame excludes the
    // current row — scoring a point against a window that contains it
    // dampens exactly the outliers being hunted). z is null until the
    // window has 5 points and while the window is degenerate (zero
    // spread). One shuffle on user_id; all three window aggregates
    // share the frame.
    Query("q119_rolling_zscore", Some(
      """WITH w AS (SELECT event_id, user_id, value,
        |    COUNT(value) OVER win AS n_win,
        |    AVG(value) OVER win AS mu,
        |    stddev_samp(value) OVER win AS sd
        |  FROM (SELECT event_id, user_id, epoch_us(ts) AS tus, value
        |        FROM events)
        |  WINDOW win AS (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, value,
        |  CAST(n_win AS BIGINT) AS n_win,
        |  CASE WHEN n_win >= 5 AND sd > 0
        |    THEN ROUND((value - mu) / sd, 6) END AS z
        |FROM w ORDER BY event_id""".stripMargin))(
      (s, dir) => {
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("tus"), col("event_id"))
          .rowsBetween(-10, -1)
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"), tsUs.as("tus"),
            col("value"))
          .select(col("event_id"), col("user_id"), col("value"),
            count(col("value")).over(win).as("n_win"),
            avg(col("value")).over(win).as("mu"),
            stddev_samp(col("value")).over(win).as("sd"))
          .select(col("event_id"), col("user_id"), col("value"),
            col("n_win"),
            when(col("n_win") >= 5 && col("sd") > 0,
              round((col("value") - col("mu")) / col("sd"), 6)).as("z"))
          .orderBy("event_id")
      }),

    // Incremental rollup maintenance: the stored per-type rollup of
    // the first three weeks of events (days < 19744), folded together
    // with the delta batch's rollup (the final week) — and the oracle
    // recomputes the whole rollup from raw facts, so the hash match IS
    // the incremental-view-maintenance contract: merged state ==
    // from-scratch, with the raw history scanned zero extra times.
    // Measures stay exact decimal through the merge; double only at
    // presentation.
    Query("q120_incremental_rollup", Some(
      """SELECT event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))(
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_type"), col("value"),
            expr("ts div 86400000000000").as("day"))
        def rollup(part: DataFrame): DataFrame = part
          .groupBy("event_type")
          .agg(count(lit(1)).as("cnt"),
            sum(col("value").cast("decimal(18,2)")).as("sum_val"))
        val cut = 19744L // events span epoch days 19723..19752
        val state = rollup(ev.filter(col("day") < cut))
        val delta = rollup(ev.filter(col("day") >= cut))
        Incremental.mergeAdditive(state, delta, Seq("event_type"),
            Seq("cnt", "sum_val"))
          .select(col("event_type"), col("cnt"),
            col("sum_val").cast("double").as("sum_val"))
          .orderBy("event_type")
      }),

    // Data-quality expectation gate: six named rules over the event
    // stream, all evaluated in ONE aggregation over ONE scan, bounded
    // output per rule. Null predicates count as violations ("unknown"
    // is not "valid") — the ts/null rule pins that convention. Two
    // rules are deliberately violated so the failure path is what the
    // oracle hashes.
    Query("q121_expectations", Some(
      """WITH e AS (SELECT *, epoch_us(ts) AS tus FROM events)
        |SELECT rule, (SELECT COUNT(*) FROM e) AS n_rows, n_viol,
        |  n_viol = 0 AS pass
        |FROM (
        |  SELECT 'event_id_not_null' AS rule,
        |    (SELECT COUNT(*) FROM e WHERE event_id IS NULL) AS n_viol
        |  UNION ALL SELECT 'value_non_negative',
        |    (SELECT COUNT(*) FROM e
        |     WHERE NOT COALESCE(value >= 0, false))
        |  UNION ALL SELECT 'value_under_400',
        |    (SELECT COUNT(*) FROM e
        |     WHERE NOT COALESCE(value < 400, false))
        |  UNION ALL SELECT 'known_event_type',
        |    (SELECT COUNT(*) FROM e WHERE NOT COALESCE(event_type IN
        |      ('click','view','purchase','signup','error'), false))
        |  UNION ALL SELECT 'user_id_in_range',
        |    (SELECT COUNT(*) FROM e
        |     WHERE NOT COALESCE(user_id BETWEEN 0 AND 99, false))
        |  UNION ALL SELECT 'ts_present',
        |    (SELECT COUNT(*) FROM e WHERE NOT COALESCE(tus IS NOT NULL,
        |      false)))
        |ORDER BY rule""".stripMargin))(
      (s, dir) =>
        Incremental.expect(t(s, dir, "events"), Seq(
            "event_id_not_null" -> col("event_id").isNotNull,
            "value_non_negative" -> (col("value") >= 0),
            "value_under_400" -> (col("value") < 400),
            "known_event_type" -> col("event_type").isin(
              "click", "view", "purchase", "signup", "error"),
            "user_id_in_range" -> col("user_id").between(0, 99),
            "ts_present" -> col("ts").isNotNull))
          .orderBy("rule")),

    // Per-user event-type transition matrix (first-order Markov): for
    // each (prev → next) pair, the transition count and the
    // row-normalized probability — the sequence-analytics primitive
    // under journey analysis and next-event prediction. One shuffle on
    // user_id for the lag; the pair aggregation reuses nothing heavier
    // than a 25-cell group-by; probability = count / window row total
    // (6-decimal rounded).
    Query("q124_transitions", Some(
      """WITH s AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |c AS (SELECT prev, event_type AS next, COUNT(*) AS cnt
        |  FROM s WHERE prev IS NOT NULL GROUP BY 1, 2)
        |SELECT prev, next, cnt,
        |  ROUND(cnt / SUM(cnt) OVER (PARTITION BY prev), 6) AS p
        |FROM c ORDER BY prev, next""".stripMargin))(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("tus"), col("event_id"))
        val wp = org.apache.spark.sql.expressions.Window.partitionBy("prev")
        t(s, dir, "events")
          .select(col("user_id"), col("event_type"), tsUs.as("tus"),
            col("event_id"))
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev"), col("event_type").as("next"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("p", round(col("cnt") / sum(col("cnt")).over(wp), 6))
          .orderBy("prev", "next")
      }),

    // Chi-square independence test: is event type independent of the
    // day of week? Contingency counts → expected = row·col/total →
    // Χ² = Σ (obs−exp)²/exp over the FULL et × dow grid — empty cells
    // contribute their expected count (GROUP BY alone would omit them,
    // understating Χ² while dof still counts them), so the observed
    // frame cross-joins the distinct margins (a bounded 5×7 grid) and
    // zero-fills. All arithmetic is portable sums (6-decimal rounded);
    // marginals ride window sums over the grid — no second scan.
    Query("q125_chi_square", Some(
      """WITH d AS (SELECT event_type AS et,
        |    CAST((epoch_ns(ts) // 86400000000000 + 4) % 7 AS BIGINT)
        |      AS dow
        |  FROM events),
        |o AS (SELECT et, dow, COUNT(*) AS obs FROM d GROUP BY 1, 2),
        |g AS (SELECT et, dow FROM (SELECT DISTINCT et FROM d)
        |      CROSS JOIN (SELECT DISTINCT dow FROM d)),
        |f AS (SELECT g.et, g.dow, COALESCE(o.obs, 0) AS obs
        |  FROM g LEFT JOIN o ON o.et = g.et AND o.dow = g.dow),
        |m AS (SELECT *, SUM(obs) OVER (PARTITION BY et) AS row_n,
        |    SUM(obs) OVER (PARTITION BY dow) AS col_n,
        |    SUM(obs) OVER () AS n FROM f)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
        |  CAST((COUNT(DISTINCT et) - 1) * (COUNT(DISTINCT dow) - 1)
        |    AS BIGINT) AS dof,
        |  ROUND(SUM(POW(obs - row_n * col_n / n, 2)
        |    / (row_n * col_n / n)), 6) AS chi2
        |FROM m""".stripMargin))(
      (s, dir) => {
        val wr = org.apache.spark.sql.expressions.Window.partitionBy("et")
        val wc = org.apache.spark.sql.expressions.Window.partitionBy("dow")
        val wn = org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))
        val exp = col("row_n") * col("col_n") / col("n")
        val d = t(s, dir, "events")
          .select(col("event_type").as("et"),
            ((expr("ts div 86400000000000") + 4) % 7).as("dow"))
        val obs = d.groupBy("et", "dow").agg(count(lit(1)).as("obs"))
        val grid = d.select("et").distinct()
          .crossJoin(broadcast(d.select("dow").distinct()))
        grid.join(obs, Seq("et", "dow"), "left")
          .select(col("et"), col("dow"),
            coalesce(col("obs"), lit(0L)).as("obs"))
          .withColumn("row_n", sum(col("obs")).over(wr))
          .withColumn("col_n", sum(col("obs")).over(wc))
          .withColumn("n", sum(col("obs")).over(wn))
          .agg(count(lit(1)).as("n_cells"),
            ((countDistinct(col("et")) - 1) *
              (countDistinct(col("dow")) - 1)).as("dof"),
            round(sum(pow(col("obs") - exp, 2) / exp), 6).as("chi2"))
      }),

    // Robust central tendency per group: the 10-90 trimmed mean (drop
    // the tails) and the winsorized mean (clamp the tails) — the
    // outlier-resistant complements of q16's plain averages, built on
    // q110's broadcast-fence shape: exact percentiles once per group,
    // 6-decimal-rounded boundaries (engine-parity convention), then
    // one fact pass with no shuffle beyond the final per-group
    // aggregate. Sums stay exact decimal; the winsorized sum uses
    // scale 6 because clamped values carry the rounded boundary.
    Query("q123_robust_mean", Some(
      """WITH f AS (SELECT event_type,
        |    ROUND(quantile_cont(value, 0.10), 6) AS lo,
        |    ROUND(quantile_cont(value, 0.90), 6) AS hi
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type,
        |  ROUND(CAST(SUM(CASE WHEN e.value BETWEEN f.lo AND f.hi
        |      THEN CAST(e.value AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / COUNT(CASE WHEN e.value BETWEEN f.lo AND f.hi THEN 1 END),
        |    6) AS trimmed_mean,
        |  ROUND(CAST(SUM(CAST(LEAST(GREATEST(e.value, f.lo), f.hi)
        |      AS DECIMAL(18,6))) AS DOUBLE) / COUNT(e.value), 6)
        |    AS winsor_mean,
        |  COUNT(e.value) AS n
        |FROM events e JOIN f USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin))(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val fences = ev.groupBy("event_type")
          .agg(round(percentile(col("value"), lit(0.10)), 6).as("lo"),
            round(percentile(col("value"), lit(0.90)), 6).as("hi"))
        val inRange = col("value").between(col("lo"), col("hi"))
        ev.join(broadcast(fences), Seq("event_type"))
          .groupBy("event_type")
          .agg(
            round(sum(when(inRange, col("value").cast("decimal(18,2)")))
              .cast("double") / count(when(inRange, 1)), 6)
              .as("trimmed_mean"),
            round(sum(least(greatest(col("value"), col("lo")), col("hi"))
              .cast("decimal(18,6)")).cast("double") / count(col("value")),
              6).as("winsor_mean"),
            count(col("value")).as("n"))
          .orderBy("event_type")
      }),

    // Point-in-time enrichment — the feature-store join: every click
    // is stamped with the user's purchase-tier AS OF the click instant
    // (state at the event's own time, not today's — the train-time
    // leakage rule). Composition: q112's SCD2 history feeds
    // Temporal.asOfJoin on valid_from (contiguous intervals make
    // as-of and interval-membership equivalent), so the probe costs
    // ONE co-shuffle of clicks ∪ history — no per-probe history scan.
    // The oracle expresses the same semantics the OTHER way (interval
    // join on [valid_from, valid_to)), so the hash match also proves
    // the as-of/interval equivalence.
    Query("q122_pit_join", Some(
      """WITH p AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
        |    CAST(FLOOR(value / 100.0) AS BIGINT) AS tier
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT *, lag(tier) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id) AS prev FROM p),
        |k AS (SELECT * FROM c WHERE prev IS NULL OR prev <> tier),
        |h AS (SELECT user_id, tier, tus AS valid_from,
        |    lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
        |      AS valid_to FROM k),
        |e AS (SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
        |      WHERE event_type = 'click')
        |SELECT e.event_id, e.user_id, e.tus, h.tier
        |FROM e LEFT JOIN h ON h.user_id = e.user_id
        |  AND h.valid_from <= e.tus
        |  AND (h.valid_to IS NULL OR e.tus < h.valid_to)
        |ORDER BY e.event_id""".stripMargin))(
      (s, dir) => {
        val hist = Temporal.scd2(
          t(s, dir, "events").filter(col("event_type") === "purchase")
            .select(col("user_id"), tsUs.as("tus"), col("event_id"),
              floor(col("value") / 100.0).cast("long").as("tier")),
          "user_id", "tus", "event_id", Seq("tier"))
          .withColumnRenamed("event_id", "src_event_id")
        val clicks = t(s, dir, "events")
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), tsUs.as("tus"))
        // eventTie = the history's OWN tie column: among same-instant
        // versions the as-of must pick the record scd2's
        // (tus, event_id) ordering made the interval owner — any other
        // tie-breaker could stamp a zero-width version and diverge
        // from the oracle's interval semantics
        Temporal.asOfJoin(clicks, hist, "user_id", "user_id",
            "tus", "valid_from", "src_event_id", Seq("tier"))
          .orderBy("event_id")
      }),

    // Fuzzy customer-name matching at edit distance ≤ 1 via
    // deletion-neighborhood blocking (complete for distance 1 — see
    // Dedup.editDistanceOnePairs). The oracle is the all-pairs
    // levenshtein definition itself, so the hash match PROVES the
    // blocked plan loses nothing vs the quadratic join it replaces.
    Query("q113_fuzzy_names", Some(
      """WITH n AS (SELECT DISTINCT c_name AS s FROM customer
        |  WHERE c_name IS NOT NULL AND length(c_name) BETWEEN 1 AND 64)
        |SELECT a.s AS name_a, b.s AS name_b,
        |  CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
        |FROM n a JOIN n b ON a.s < b.s
        |WHERE levenshtein(a.s, b.s) <= 1
        |ORDER BY name_a, name_b""".stripMargin))(
      (s, dir) =>
        Dedup.editDistanceOnePairs(
            t(s, dir, "customer").select("c_name"), "c_name")
          .select(col("s_a").as("name_a"), col("s_b").as("name_b"),
            col("dist"))
          .orderBy("name_a", "name_b")),

    // Triangles in the frequently-co-purchased part graph (parts
    // sharing an order at least twice): per-order pair generation is
    // a bounded array expansion (order size caps the quadratic), the
    // support filter is one aggregation, and the enumeration itself is
    // Dedup.triangles' degree-ordered orientation — wedge counts stay
    // O(√m) per vertex even on hub-heavy graphs. The oracle replays
    // the definition as a three-way self-join over the same edge set.
    Query("q114_triangles", Some(
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT e1.pa AS id_a, e1.pb AS id_b, e2.pb AS id_c
        |FROM e e1 JOIN e e2 ON e1.pb = e2.pa
        |JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
        |ORDER BY id_a, id_b, id_c""".stripMargin))(
      (s, dir) =>
        Dedup.triangles(
            copurchaseEdges(t(s, dir, "lineitem")
              .select("l_orderkey", "l_partkey")),
            "pa", "pb")
          .orderBy("id_a", "id_b", "id_c")),

    // COUNT-ONLY twin of q114 (r11): the exact triangle count over the
    // same support-2 co-purchase edge set via oriented-adjacency
    // intersection — per oriented edge, |N+(u) ∩ N+(v)| closes each
    // triangle once, so the count is two node-table joins plus a
    // codegen'd array intersection per edge. No wedge row is ever
    // shuffled; n_wedges reports how many the enumerating sibling
    // would have to. The edge set comes from the MAINTAINED graph
    // table (copurchaseEdgeTable — amortized build, the q47-indexed
    // convention): census questions run against the persisted graph,
    // while q114 keeps paying the from-scratch derivation. The oracle
    // replays the census portably: edges and triangles from the
    // inequality joins, wedges from the same degree-ordered
    // orientation.
    Query("q187_triangle_count", Some(
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |deg AS (SELECT v, COUNT(*) AS d FROM (
        |    SELECT pa AS v FROM e UNION ALL SELECT pb AS v FROM e)
        |  GROUP BY 1),
        |o AS (SELECT
        |    CASE WHEN da.d < db.d OR (da.d = db.d AND e.pa < e.pb)
        |      THEN e.pa ELSE e.pb END AS u,
        |    CASE WHEN da.d < db.d OR (da.d = db.d AND e.pa < e.pb)
        |      THEN e.pb ELSE e.pa END AS v
        |  FROM e JOIN deg da ON da.v = e.pa JOIN deg db ON db.v = e.pb),
        |dout AS (SELECT u, COUNT(*) AS d FROM o GROUP BY 1)
        |SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
        |  CAST((SELECT SUM(d * (d - 1) // 2) FROM dout) AS BIGINT)
        |    AS n_wedges,
        |  CAST((SELECT COUNT(*) FROM e e1
        |    JOIN e e2 ON e1.pb = e2.pa
        |    JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb) AS BIGINT)
        |    AS n_triangles""".stripMargin))(
      (s, dir) =>
        Dedup.triangleCount(
          s.table(copurchaseEdgeTable(s, dir)), "pa", "pb")),

    // TPC-H Q5-shaped star join: five dimension hops (region → nation →
    // customer/supplier) around the orders→lineitem fact spine, revenue
    // per nation for one region-year. The OLAP plan-quality probe: the
    // dims broadcast (no fact shuffle until the final groupBy), the
    // date/region filters push into the scans, and revenue is exact
    // decimal arithmetic end to end (decimal × decimal, then the house
    // decimal-sum convention) so partial-agg order can't drift.
    Query("q116_star_join", Some(
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
        |    AS revenue,
        |  COUNT(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY n_name""".stripMargin))(
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val su = t(s, dir, "supplier")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        c.join(o, col("c_custkey") === col("o_custkey"))
          .join(l, col("l_orderkey") === col("o_orderkey"))
          .join(su, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA" &&
            col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
          .groupBy("n_name")
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount").cast("decimal(18,4)")))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("n_name")
      }),

    // Join-key skew profile of lineitem's part key — the diagnostic a
    // deployment runs BEFORE choosing plain vs salted shuffles:
    // cardinality, heaviest-key share ratio, and the Gini coefficient
    // of the key distribution. The Gini rank sorts the COUNT frame
    // (distinct keys), never the fact rows.
    Query("q131_key_skew", Some(
      """WITH c AS (SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem
        |  WHERE l_partkey IS NOT NULL GROUP BY 1),
        |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY c, k) AS rk FROM c)
        |SELECT COUNT(*) AS n_keys, CAST(SUM(c) AS BIGINT) AS n_rows,
        |  MAX(c) AS max_cnt,
        |  ROUND(MAX(c) / (CAST(SUM(c) AS DOUBLE) / COUNT(*)), 6)
        |    AS skew_ratio,
        |  ROUND(2.0 * SUM(rk * c)
        |      / (CAST(COUNT(*) AS DOUBLE) * SUM(c))
        |    - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*), 6) AS gini
        |FROM r""".stripMargin))(
      (s, dir) =>
        Profiling.keySkew(t(s, dir, "lineitem"), col("l_partkey"))),

    // Bigram surprisal — the conditional-LM quality score beside q69's
    // unigram one: mean −ln P(cur | prev) with add-one smoothing over
    // the observed-next-token vocabulary. The oracle rebuilds the
    // identical model (bigram comprehension, context totals and V from
    // the count frame, decimal-summed logs).
    Query("q132_bigram_surprisal", Some(
      """WITH b AS (
        |  SELECT doc_id, unnest([{'prev': toks[i-1], 'cur': toks[i]}
        |                         FOR i IN generate_series(2, len(toks))])
        |    AS bg
        |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)),
        |          '\s+') AS toks FROM documents)),
        |f AS (SELECT doc_id, bg.prev AS prev, bg.cur AS cur FROM b),
        |c2 AS (SELECT prev, cur, COUNT(*) AS c2 FROM f GROUP BY 1, 2),
        |c1 AS (SELECT prev, SUM(c2) AS c1 FROM c2 GROUP BY 1),
        |v AS (SELECT COUNT(DISTINCT cur) AS v FROM c2),
        |s AS (SELECT f.doc_id, COUNT(*) AS n_bigrams,
        |    SUM(CAST(-ln((c2.c2 + 1) / CAST(c1.c1 + v.v AS DOUBLE))
        |      AS DECIMAL(18,12))) AS ssum
        |  FROM f JOIN c2 USING (prev, cur) JOIN c1 USING (prev)
        |  CROSS JOIN v GROUP BY f.doc_id)
        |SELECT d.doc_id, COALESCE(s.n_bigrams, 0) AS n_bigrams,
        |  ROUND(CAST(s.ssum AS DOUBLE) / s.n_bigrams, 6)
        |    AS bigram_surprisal
        |FROM (SELECT DISTINCT doc_id FROM documents) d
        |LEFT JOIN s USING (doc_id)
        |ORDER BY doc_id""".stripMargin))(
      (s, dir) =>
        TextAnalysis.bigramSurprisal(t(s, dir, "documents"),
            "doc_id", "text")
          .orderBy("doc_id")),

    // Linear interpolation on the resample grid — the other standard
    // gap policy beside q107's forward fill: an empty bucket takes the
    // value lerped between its nearest observed neighbors (prev/next
    // value+bucket ride two mirrored IGNORE NULLS windows over the
    // q107 spine; leading/trailing gaps fall back to the available
    // side). Presentation is FLOOR(x·1e6 + 0.5)/1e6, not round():
    // lerp ratios like k/16 land doubles EXACTLY on .5 decimal
    // boundaries, where the engines' round() disagree (shortest-repr
    // HALF_UP vs away-from-zero) — floor arithmetic is pure IEEE ops,
    // bit-identical everywhere.
    Query("q129_interpolate", Some(
      """WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS bkt,
        |            value FROM events),
        |o AS (SELECT user_id, bkt,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
        |  FROM e GROUP BY 1, 2),
        |s AS (SELECT user_id, UNNEST(generate_series(MIN(bkt), MAX(bkt)))
        |    AS bkt FROM o GROUP BY user_id),
        |j AS (SELECT s.user_id, s.bkt, o.sv
        |  FROM s LEFT JOIN o ON o.user_id = s.user_id AND o.bkt = s.bkt),
        |w AS (SELECT *,
        |    last_value(sv IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY bkt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
        |      ROW) AS pv,
        |    last_value(CASE WHEN sv IS NOT NULL THEN bkt END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY bkt
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
        |    first_value(sv IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY bkt ROWS BETWEEN CURRENT ROW AND UNBOUNDED
        |      FOLLOWING) AS nv,
        |    first_value(CASE WHEN sv IS NOT NULL THEN bkt END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY bkt
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
        |  FROM j)
        |SELECT user_id, bkt AS bucket,
        |  FLOOR((CASE
        |    WHEN sv IS NOT NULL THEN sv
        |    WHEN pv IS NULL THEN nv
        |    WHEN nv IS NULL THEN pv
        |    ELSE pv + (nv - pv) * (bkt - pb) / (nb - pb) END)
        |    * 1000000 + 0.5) / 1000000 AS v_interp
        |FROM w ORDER BY user_id, bucket""".stripMargin))(
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val back = W.partitionBy("user_id").orderBy("bucket")
          .rowsBetween(W.unboundedPreceding, W.currentRow)
        val fwd = W.partitionBy("user_id").orderBy("bucket")
          .rowsBetween(W.currentRow, W.unboundedFollowing)
        val spine = Temporal.resampleFill(
          t(s, dir, "events").select(col("user_id"), tsUs.as("tus"),
            col("value")),
          "user_id", "tus", HourUs,
          aggs = Seq(Query.dsum(col("value")).as("sv")),
          fillCols = Seq("sv"))
        val obsBkt = when(col("sv").isNotNull, col("bucket"))
        spine
          .withColumn("pv", last(col("sv"), ignoreNulls = true).over(back))
          .withColumn("pb", last(obsBkt, ignoreNulls = true).over(back))
          .withColumn("nv", first(col("sv"), ignoreNulls = true).over(fwd))
          .withColumn("nb", first(obsBkt, ignoreNulls = true).over(fwd))
          .select(col("user_id"), col("bucket"),
            (floor((when(col("sv").isNotNull, col("sv"))
              .when(col("pv").isNull, col("nv"))
              .when(col("nv").isNull, col("pv"))
              .otherwise(col("pv") + (col("nv") - col("pv")) *
                (col("bucket") - col("pb")) / (col("nb") - col("pb"))))
              * 1000000 + 0.5) / 1000000).as("v_interp"))
          .orderBy("user_id", "bucket")
      }),

    // Per-group standardization — the feature-engineering staple:
    // z = (v − μ_g)/σ_g per event type, appended to every row with the
    // group moments broadcast back (no fact shuffle — the q110 fence
    // shape); constant groups yield null, not a division blow-up.
    Query("q130_standardize", Some(
      """WITH m AS (SELECT event_type,
        |    ROUND(AVG(value), 6) AS mu,
        |    ROUND(stddev_samp(value), 6) AS sd
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value,
        |  CASE WHEN m.sd > 0 THEN ROUND((e.value - m.mu) / m.sd, 6) END
        |    AS z
        |FROM events e JOIN m USING (event_type)
        |ORDER BY e.event_id""".stripMargin))(
      (s, dir) => {
        val moments = t(s, dir, "events").groupBy("event_type")
          .agg(round(avg(col("value")), 6).as("mu"),
            round(stddev_samp(col("value")), 6).as("sd"))
        t(s, dir, "events")
          .join(broadcast(moments), Seq("event_type"))
          .select(col("event_id"), col("event_type"), col("value"),
            when(col("sd") > 0,
              round((col("value") - col("mu")) / col("sd"), 6)).as("z"))
          .orderBy("event_id")
      }),

    // Attribution-window funnel — q108 with a deadline: each step must
    // land within 48 hours of the previous one, or the journey doesn't
    // attribute (the marketing-attribution rule that unbounded funnels
    // overstate). Same one-shuffle stacked-window shape; only the step
    // gate changes.
    Query("q127_funnel_window", Some(
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_type
        |           FROM events),
        |w1 AS (SELECT *, MIN(CASE WHEN event_type = 'signup' THEN tus END)
        |    OVER (PARTITION BY user_id) AS t1 FROM e),
        |w2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND tus > t1
        |    AND tus <= t1 + 172800000000 THEN tus END)
        |    OVER (PARTITION BY user_id) AS t2 FROM w1),
        |w3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND tus > t2
        |    AND tus <= t2 + 172800000000 THEN tus END)
        |    OVER (PARTITION BY user_id) AS t3 FROM w2),
        |u AS (SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
        |  FROM w3 GROUP BY user_id)
        |SELECT * FROM (
        |  SELECT 1 AS step_idx, 'signup' AS step, COUNT(t1) AS n_users
        |  FROM u
        |  UNION ALL SELECT 2, 'click', COUNT(t2) FROM u
        |  UNION ALL SELECT 3, 'purchase', COUNT(t3) FROM u)
        |ORDER BY step_idx""".stripMargin))(
      (s, dir) => {
        val f = Temporal.funnel(
          t(s, dir, "events").select(col("user_id"), tsUs.as("tus"),
            col("event_type")),
          "user_id", "tus", Seq(
            "signup" -> (col("event_type") === "signup"),
            "click" -> (col("event_type") === "click"),
            "purchase" -> (col("event_type") === "purchase")),
          maxGap = Some(48L * 3600000000L))
        f.agg(count(col("t_signup")).as("c1"), count(col("t_click")).as("c2"),
            count(col("t_purchase")).as("c3"))
          .select(explode(array(
            struct(lit(1).as("step_idx"), lit("signup").as("step"),
              col("c1").as("n_users")),
            struct(lit(2).as("step_idx"), lit("click").as("step"),
              col("c2").as("n_users")),
            struct(lit(3).as("step_idx"), lit("purchase").as("step"),
              col("c3").as("n_users")))).as("s"))
          .select(col("s.step_idx").as("step_idx"), col("s.step").as("step"),
            col("s.n_users").as("n_users"))
          .orderBy("step_idx")
      }),

    // Time-in-state from the SCD2 history: per purchase tier, total
    // dwell µs and the distinct users who ever held it — the
    // state-duration rollup every SCD2 consumer eventually writes.
    // Open (current) intervals close at the corpus' max event time so
    // dwell is finite and identical in both engines.
    Query("q128_time_in_state", Some(
      """WITH p AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
        |    CAST(FLOOR(value / 100.0) AS BIGINT) AS tier
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT *, lag(tier) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id) AS prev FROM p),
        |k AS (SELECT * FROM c WHERE prev IS NULL OR prev <> tier),
        |h AS (SELECT user_id, tier, tus AS valid_from,
        |    lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
        |      AS valid_to FROM k),
        |mx AS (SELECT MAX(epoch_us(ts)) AS t_end FROM events)
        |SELECT tier,
        |  CAST(SUM(COALESCE(valid_to, t_end) - valid_from) AS BIGINT)
        |    AS dwell_us,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM h CROSS JOIN mx
        |GROUP BY tier ORDER BY tier""".stripMargin))(
      (s, dir) => {
        val hist = Temporal.scd2(
          t(s, dir, "events").filter(col("event_type") === "purchase")
            .select(col("user_id"), tsUs.as("tus"), col("event_id"),
              floor(col("value") / 100.0).cast("long").as("tier")),
          "user_id", "tus", "event_id", Seq("tier"))
        val tEnd = t(s, dir, "events").agg(max(tsUs).as("t_end"))
        hist.crossJoin(broadcast(tEnd))
          .groupBy("tier")
          .agg(sum(coalesce(col("valid_to"), col("t_end"))
              - col("valid_from")).as("dwell_us"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy("tier")
      }),

    // Sorted-neighborhood fuzzy candidates over customer names —
    // q113's deletion-neighborhood twin from the other classic
    // blocking family: sort within 13-char-prefix blocks, compare each
    // name with its next 3 sort successors, keep edit distance ≤ 1.
    // The oracle replays the identical heuristic (rank windows inside
    // the same blocks), so the hash pins the heuristic's exact
    // candidate set — not a completeness claim (q113 carries that).
    Query("q126_sorted_neighborhood", Some(
      """WITH n AS (SELECT DISTINCT c_name AS s FROM customer
        |           WHERE c_name IS NOT NULL),
        |r AS (SELECT s, substring(s, 1, 13) AS blk,
        |    ROW_NUMBER() OVER (PARTITION BY substring(s, 1, 13)
        |      ORDER BY s) AS rn FROM n)
        |SELECT a.s AS name_a, b.s AS name_b,
        |  CAST(b.rn - a.rn AS INTEGER) AS gap,
        |  CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
        |FROM r a JOIN r b ON a.blk = b.blk
        |  AND b.rn - a.rn BETWEEN 1 AND 3
        |WHERE levenshtein(a.s, b.s) <= 1
        |ORDER BY name_a, name_b""".stripMargin))(
      (s, dir) =>
        Dedup.sortedNeighborhoodPairs(
            t(s, dir, "customer").select("c_name"), "c_name",
            blockOf = c => substring(c, 1, 13), window = 3)
          .select(col("s_a").as("name_a"), col("s_b").as("name_b"),
            col("gap"),
            levenshtein(col("name_a"), col("name_b"), 1).as("dist"))
          .filter(col("dist") >= 0)
          .orderBy("name_a", "name_b")),

    // Inverted index over the document corpus: per case-folded term,
    // document frequency (full count) and a bounded posting list
    // (first 20 doc ids) — capped BEFORE collection so hot terms cost
    // maxPostings rows, not an executor-sized list.
    Query("q115_inverted_index", Some(
      """WITH t AS (SELECT DISTINCT doc_id, term FROM (
        |    SELECT doc_id, unnest(string_split_regex(trim(lower(text)),
        |      '\s+')) AS term FROM documents)
        |  WHERE term <> ''),
        |d AS (SELECT term, COUNT(*) AS df FROM t GROUP BY 1),
        |c AS (SELECT term, doc_id FROM (
        |    SELECT term, doc_id, ROW_NUMBER() OVER (PARTITION BY term
        |      ORDER BY doc_id) AS rk FROM t)
        |  WHERE rk <= 20),
        |p AS (SELECT term, string_agg(CAST(doc_id AS VARCHAR), ','
        |    ORDER BY doc_id) AS postings FROM c GROUP BY 1)
        |SELECT d.term, d.df, p.postings FROM d JOIN p USING (term)
        |ORDER BY term""".stripMargin))(
      (s, dir) =>
        TextAnalysis.invertedIndex(t(s, dir, "documents"),
            "doc_id", "text", maxPostings = 20)
          .orderBy("term"))
  ,

    // Positional phrase search — the adjacency query the doc-level
    // inverted index (q115) cannot answer: every occurrence of the
    // exact token phrase "small query line" (present at every test
    // SF, so the rows>0 smoke gate holds at sf0.001 too), with
    // per-doc occurrence count and first 0-based match position. The
    // corpus-sized posting stream is cut to phrase terms inside the
    // codegen'd projection (literal term→slot map; explode of a null
    // lookup emits nothing), so only candidate rows ever shuffle.
    // Oracle replays the definition over DuckDB's 1-based token lists.
    Query("q195_phrase_search", Some(
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS toks
        |  FROM documents),
        |m AS (SELECT doc_id,
        |    unnest([i - 1 FOR i IN generate_series(1, len(toks) - 2)
        |      IF toks[i] = 'small' AND toks[i+1] = 'query'
        |        AND toks[i+2] = 'line']) AS pos
        |  FROM t)
        |SELECT doc_id, COUNT(*) AS n_matches, MIN(pos) AS first_pos
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin))(
      (s, dir) =>
        TextAnalysis.phraseSearch(t(s, dir, "documents"), "doc_id",
            "text", Seq("small", "query", "line"))
          .orderBy("doc_id"))
  ,

    // 3-core of the maintained co-purchase graph (iterated peeling):
    // the load-bearing kernel that survives after every node with
    // fewer than 3 surviving co-purchase partners is recursively
    // removed — the graph-robustness census beside q187's triangle
    // count, probing the same persisted edge table. The engine peels
    // to a TRUE fixpoint (co-partitioned membership joins per round,
    // localCheckpoint truncation); the oracle unrolls 16 peel stages
    // (fixpoint at verify scale is ~10; extra stages are no-ops), so
    // a non-converged engine answer cannot silently match.
    Query("q199_kcore", Some(kcoreOracleSql(k = 3, rounds = 16)))(
      (s, dir) =>
        Dedup.kCore(s.table(copurchaseEdgeTable(s, dir)), "pa", "pb",
            k = 3)
          .orderBy("node"))
  ,

    // Multi-source BFS over the maintained co-purchase graph: minimum
    // hops from the 5 lowest-id parts to every reachable part — the
    // PROXIMITY census beside q187 (robustness) and q199 (core). The
    // engine expands frontier-parallel to a true fixpoint (per-round
    // cost ∝ the frontier's edge neighborhood); the oracle unrolls 14
    // materialized BFS rounds (eccentricity at verify scale is 9;
    // extra rounds are no-ops, so a premature engine stop cannot
    // silently match).
    Query("q201_bfs", Some(bfsOracleSql(nSeeds = 5, rounds = 14)))(
      (s, dir) => {
        val edges = s.table(copurchaseEdgeTable(s, dir))
        val seeds = edges.select(col("pa").as("v"))
          .union(edges.select(col("pb").as("v")))
          .distinct().orderBy("v").limit(5)
        Dedup.bfsHops(edges, "pa", "pb", seeds).orderBy("node")
      })
  ,

    // Poisson bootstrap CIs for the per-type mean event value — the
    // resampling form that survives 100 TB (classic bootstrap resamples
    // globally; Poisson weights make all 64 replicates ride ONE
    // weighted partial-agg pass). Draws are md5(row:replicate) uint32s
    // against integer Poisson(1) CDF cut points shared verbatim with
    // the oracle (Profiling.poissonThresholds32 — one source of
    // truth), so both engines weight every row identically.
    Query("q213_bootstrap_ci", Some(bootstrapOracleSql(reps = 64)))(
      (s, dir) =>
        Profiling.poissonBootstrapCI(t(s, dir, "events"),
            col("event_type"), col("event_id"), col("value"), reps = 64)
          .orderBy("group"))
  ,

    // Mutual information between document language and source — the
    // dependence census beside q125's chi-square verdict (MI says how
    // many NATS knowing the source buys about the language — the
    // feature-selection / leakage-triage number). One corpus shuffle
    // builds the joint counts; margins, entropies, and the MI sum all
    // ride that bounded |lang|×|source| cell frame.
    Query("q214_mutual_info", Some(
      """WITH j AS (SELECT lang AS x, source AS y, COUNT(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |xm AS (SELECT x, CAST(SUM(c) AS BIGINT) AS rx FROM j GROUP BY 1),
        |ym AS (SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM j GROUP BY 1),
        |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM j),
        |mi AS (SELECT SUM((c / n) * ln(CAST(c * n AS DOUBLE) / (rx * cy)))
        |    AS mi, COUNT(*) AS cells
        |  FROM j JOIN xm USING (x) JOIN ym USING (y) CROSS JOIN t),
        |hx AS (SELECT -SUM((rx / n) * ln(rx / n)) AS hx
        |  FROM xm CROSS JOIN t),
        |hy AS (SELECT -SUM((cy / n) * ln(cy / n)) AS hy
        |  FROM ym CROSS JOIN t)
        |SELECT t.n, mi.cells, ROUND(mi.mi, 6) AS mi,
        |  ROUND(hx.hx, 6) AS hx, ROUND(hy.hy, 6) AS hy,
        |  ROUND(mi.mi / sqrt(hx.hx * hy.hy), 6) AS nmi
        |FROM mi CROSS JOIN hx CROSS JOIN hy CROSS JOIN t""".stripMargin))(
      (s, dir) =>
        Profiling.mutualInformation(t(s, dir, "documents"),
          col("lang"), col("source"))),

    // KMV bottom-k distinct sketch: per-event-type distinct user-days
    // plus an ALL row MERGED from the per-group sketches (the union
    // algebra q149's HLL rollup demonstrates) — but where HLL's
    // register hashing is engine-private so its oracle can only bound
    // the error, the KMV sketch over md5-uint32 draws is order-
    // invariant and engine-portable, so DuckDB reproduces the sketch
    // AND the estimate bit for bit. The typed Aggregator ships at most
    // k longs per (partition, group) — partial/final like a sum.
    Query("q215_kmv_distinct", Some(kmvOracleSql(k = 64)))(
      (s, dir) =>
        Profiling.kmvDistinct(t(s, dir, "events"), col("event_type"),
            kmvUserDayHash(col("user_id")), k = 64)
          .orderBy("group")),

    // Stationary distribution of the q124 transition chain — the
    // equilibrium share of each event type under the journey dynamics
    // (the prior a next-event model calibrates against). The corpus
    // pays one lag-and-count shuffle; the 5×5 matrix is codebook-class
    // driver metadata, so the 12 power-iteration rounds are a bounded
    // local loop, oracle-replayed as 12 unrolled MATERIALIZED stages.
    Query("q216_markov_stationary", Some(stationaryOracleSql(rounds = 12)))(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("tus"), col("event_id"))
        val tr = t(s, dir, "events")
          .select(col("user_id"), col("event_type"), tsUs.as("tus"),
            col("event_id"))
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev"), col("event_type").as("next"))
          .agg(count(lit(1)).as("cnt"))
        Temporal.stationaryDistribution(tr, "prev", "next", "cnt",
          rounds = 12).orderBy("state")
      }),

    // Approximate functional dependency discovery (Kivinen & Mannila
    // g3) over five declared candidate FDs spanning four tables — the
    // key-detection / schema-drift census: confidence = the largest
    // row fraction consistent with lhs → rhs. Each pair costs one
    // (lhs, rhs) count shuffle; everything downstream is partial-agg
    // output unioned into a bounded census frame.
    Query("q217_fd_discovery", Some(fdOracleSql))(
      (s, dir) =>
        Profiling.fdConfidence(Seq(
          ("customer.c_nationkey->c_mktsegment", t(s, dir, "customer"),
            col("c_nationkey"), col("c_mktsegment")),
          ("documents.source->lang", t(s, dir, "documents"),
            col("source"), col("lang")),
          ("events.user_id->event_type", t(s, dir, "events"),
            col("user_id"), col("event_type")),
          ("lineitem.l_partkey->l_suppkey", t(s, dir, "lineitem"),
            col("l_partkey"), col("l_suppkey")),
          ("orders.o_custkey->o_orderpriority", t(s, dir, "orders"),
            col("o_custkey"), col("o_orderpriority"))
        )).orderBy("fd"))
  ,

    // Referential-integrity census over seven declared FK candidates
    // spanning the whole star schema — the cross-table sibling of
    // q121's expectations and q217's FD discovery. Six structural FKs
    // hold (the census PROVES the zeros against the oracle); the
    // seventh (supplier.s_nationkey → region.r_regionkey) is a
    // mis-declared candidate the census flags with real orphan
    // counts — candidate testing, not just invariant checking.
    Query("q219_fk_orphans", Some(fkOracleSql))(
      (s, dir) =>
        Profiling.fkOrphans(Seq(
          ("customer.c_nationkey->nation.n_nationkey",
            t(s, dir, "customer"), col("c_nationkey"),
            t(s, dir, "nation"), col("n_nationkey")),
          ("events.user_id->customer.c_custkey",
            t(s, dir, "events"), col("user_id"),
            t(s, dir, "customer"), col("c_custkey")),
          ("lineitem.l_orderkey->orders.o_orderkey",
            t(s, dir, "lineitem"), col("l_orderkey"),
            t(s, dir, "orders"), col("o_orderkey")),
          ("lineitem.l_partkey->part.p_partkey",
            t(s, dir, "lineitem"), col("l_partkey"),
            t(s, dir, "part"), col("p_partkey")),
          ("lineitem.l_suppkey->supplier.s_suppkey",
            t(s, dir, "lineitem"), col("l_suppkey"),
            t(s, dir, "supplier"), col("s_suppkey")),
          ("orders.o_custkey->customer.c_custkey",
            t(s, dir, "orders"), col("o_custkey"),
            t(s, dir, "customer"), col("c_custkey")),
          ("supplier.s_nationkey->region.r_regionkey",
            t(s, dir, "supplier"), col("s_nationkey"),
            t(s, dir, "region"), col("r_regionkey"))
        )).orderBy("fk")),

    // KMV sketch DELTA MAINTENANCE — the sketch member of the index-
    // maintenance matrix (q104 minhash, q182 winnow, q188 graph, q203
    // IVF, q211 IVF-PQ, q218 components, q220 sketches): tonight's
    // event batch (every 7th event re-keyed to a NEW user cohort)
    // merges into the persisted per-type sketch registry at cost
    // ∝ |delta| — the base contributes k longs per group, the merge
    // is codegen'd array set-union truncation, and the result equals
    // a full recompute EXACTLY (bottom-k of a union is the truncated
    // union of bottom-ks). Oracle: full recompute over base ∪ delta.
    Query("q220_kmv_delta", Some(kmvDeltaOracleSql(k = 64)))(
      (s, dir) => {
        val root = kmvRegistryRoot(s, dir)
        val delta = t(s, dir, "events")
          .filter(col("event_id") % 7 === 0)
        // the VERSIONED refresh the spec certifies, run for real: read
        // the immutable v=0, merge the delta, overwrite v=1 (never the
        // input), then serve estimates from the refreshed version —
        // run-twice rewrites identical v=1 content, a torn v=1 heals
        Profiling.kmvDeltaMerge(
            s.read.parquet(s"$root/v=0"), delta,
            col("event_type"), kmvUserDayHash(col("user_id") + 1000),
            k = 64)
          .write.mode("overwrite").parquet(s"$root/v=1")
        s.read.parquet(s"$root/v=1")
          .select(col("group"), size(col("sk")).as("sketch_size"),
            Profiling.kmvEstimate(col("sk"), 64).as("est"))
          .orderBy("group")
      })
  ,

    // Adamic-Adar link prediction over the maintained co-purchase
    // graph — the top-20 part pairs one purchase away from
    // co-occurring, ranked by Σ 1/ln(deg(w)) over common neighbors
    // (the proposal census beside q187's count and q201's proximity).
    // Per-center terms quantize to integer nano-units (⌊1e9/ln d+0.5⌋,
    // the q158/q164 convention), so pair scores are exact integer
    // sums and the top-k cut is total; centers hotter than 256 are
    // dropped by declared cap on both engines.
    Query("q221_adamic_adar", Some(adamicAdarOracleSql(
      topK = 20, maxDeg = 256)))(
      (s, dir) =>
        Dedup.adamicAdar(s.table(copurchaseEdgeTable(s, dir)),
          "pa", "pb", topK = 20, maxCenterDegree = 256)),

    // Sketch-based join-cardinality estimation — the join-planning
    // census: |A ⋈ B| estimated from two KMV sketches (k longs per
    // side) and two row counts, the fact tables never co-shuffled.
    // The "should we run this join / which side broadcasts" advisor
    // at 100 TB. KMV set algebra is order-invariant over md5-uint32
    // draws, so the oracle replays sketches AND estimates bit for
    // bit — including the union/intersection membership step.
    Query("q222_join_cardinality", Some(joinCardOracleSql(k = 64)))(
      (s, dir) =>
        Profiling.kmvJoinCardinality(Seq(
          ("events.user_id*customer.c_custkey",
            t(s, dir, "events"), col("user_id"),
            t(s, dir, "customer"), col("c_custkey")),
          ("lineitem.l_orderkey*orders.o_orderkey",
            t(s, dir, "lineitem"), col("l_orderkey"),
            t(s, dir, "orders"), col("o_orderkey")),
          ("lineitem.l_partkey*part.p_partkey",
            t(s, dir, "lineitem"), col("l_partkey"),
            t(s, dir, "part"), col("p_partkey")),
          ("orders.o_custkey*customer.c_custkey",
            t(s, dir, "orders"), col("o_custkey"),
            t(s, dir, "customer"), col("c_custkey"))
        ), k = 64).orderBy("pair")),

    // Welch two-sample t census over every event-type pair — the A/B
    // inference number beside q213's bootstrap band: t statistic and
    // Welch–Satterthwaite df from one partial-agg scan of exact
    // decimal (n, Σv, Σv²) sums; the pair statistics derive on the
    // bounded |types|² frame through one fixed IEEE chain both
    // engines share. p-values stay out of scope (the t CDF is
    // engine-private); t and df are the portable census numbers.
    Query("q223_welch_ttest", Some(welchOracleSql))(
      (s, dir) =>
        Profiling.welchTTest(t(s, dir, "events"), col("event_type"),
          col("value")).orderBy("pair")),

    // MULTIMODAL perceptual near-dup — the image pipeline's
    // correctness row: a deterministic synthetic PNG corpus generated
    // on the executors (Multimodal.syntheticImageCorpus — 9×8
    // brightness-walk images whose dHash equals an analytic 63-bit
    // integer formula), pushed through the REAL pipeline: javax.imageio
    // decode → 9×8 average-pool → dHash64 → the modality-agnostic
    // pigeonhole pairing (Dedup.fingerprintNearDupPairs, hamming ≤ 3).
    // The oracle recomputes the ground-truth hashes from the same
    // integer arithmetic (no decoded constants anywhere) and replays
    // the pairing brute-force — a hash match proves decode, pooling,
    // hash bits, and pairing end to end. Planted structure: ids come
    // in triples (base, 1-bit flip, 32-bit flip), so exactly one
    // hamming-1 pair per triple must surface and nothing else may.
    Query("q224_multimodal_neardup", Some(multimodalNearDupOracleSql(
      n = 60)))(
      (s, dir) =>
        Dedup.fingerprintNearDupPairs(
          Multimodal.imageDHashes(Multimodal.syntheticImageCorpus(s, 60)),
          "media_id", "dhash", maxHamming = 3)
          .orderBy("id_a", "id_b")),

    // MinHash CALIBRATION census — the estimator-tuning harness: pair
    // each SAMPLED doc (declared budget of 500, drawn as the first
    // 500 ids in md5(id)-order — the harness cost is fixed at every
    // corpus size) with token-prefix variants at four retention
    // percentages, compare exact shingle Jaccard against the
    // 16-permutation MinHash estimate, and census bias/|error| per
    // band. Draws are md5-uint32 (the q213/q215 sketch convention) so
    // the oracle replays the sample, hashes, estimates, AND the error
    // census bit for bit — the measured calibration transfers to any
    // uniform hash family, which is the whole point of running it
    // before a 100 TB dedup pass.
    Query("q225_minhash_calibration", Some(minhashCalibOracleSql(
      pcts = Seq(30, 50, 70, 90), k = 16, maxDocs = 500)))(
      (s, dir) =>
        Dedup.minhashCalibration(t(s, dir, "documents"), "doc_id",
          "text", pcts = Seq(30, 50, 70, 90), k = 16, maxDocs = 500)),

    // RETRACTABLE rollup maintenance — CDC with DELETES and UPDATES
    // folded into the per-type (count, sum) rollup without scanning
    // base facts: I adds (+1, +new), D subtracts (−1, −old), U
    // contributes the (new−old) correction. Counts and exact decimal
    // sums form a group (every op has an exact inverse), so the
    // refreshed state is row-identical to re-aggregating the post-CDC
    // fact table — which is exactly what the oracle recomputes.
    Query("q226_retractable_rollup", Some(retractableOracleSql))(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val base = ev.filter(col("event_id") % 3 =!= 0)
        val state = base.groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("value").cast("decimal(18,2)")).as("sv"))
        val cdc = ev.filter(col("event_id") % 3 === 0)
          .select(col("event_type"), lit("I").as("op"),
            lit(null).cast("double").as("old_value"),
            col("value").as("new_value"))
          .unionAll(ev.filter(col("event_id") % 3 =!= 0 &&
              col("event_id") % 5 === 0)
            .select(col("event_type"), lit("D").as("op"),
              col("value").as("old_value"),
              lit(null).cast("double").as("new_value")))
          .unionAll(ev.filter(col("event_id") % 3 =!= 0 &&
              col("event_id") % 5 =!= 0 && col("event_id") % 7 === 0)
            .select(col("event_type"), lit("U").as("op"),
              col("value").as("old_value"),
              (col("value") + 10).as("new_value")))
        Incremental.mergeRetractable(state, cdc, Seq("event_type"),
            "cnt", "sv")
          .select(col("event_type"), col("cnt"),
            col("sv").cast("double").as("sum_value"))
          .orderBy("event_type")
      }),

    // Mergeable HISTOGRAM-QUANTILE registry — the QUANTILE member of
    // the maintenance matrix: fixed-width bin counts as persisted
    // per-group state, delta batches bin-merged EXACTLY (integer
    // addition — unlike rank sketches, merge equals recompute), the
    // ALL row rolled up from the group sketches by the same algebra,
    // and p25/p50/p90 read off cumulative mass with in-bin linear
    // interpolation. Oracle recomputes everything from the raw facts
    // — a hash match proves build, delta merge, rollup, and estimator
    // in one row set.
    Query("q227_hist_quantiles", Some(histQuantOracleSql))(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val base = Profiling.histSketch(
          ev.filter(col("event_id") % 4 =!= 0), col("event_type"),
          col("value"), binWidth = 5.0)
        val delta = Profiling.histSketch(
          ev.filter(col("event_id") % 4 === 0), col("event_type"),
          col("value"), binWidth = 5.0)
        val merged = Profiling.histMerge(base, delta)
        val all = merged.groupBy(col("bin"))
          .agg(sum(col("cnt")).as("cnt"))
          .withColumn("group", lit("ALL"))
        // the rollup label joins the registry through histMerge, NOT a
        // bare union: if a real group were literally 'ALL' a union
        // would carry duplicate (group, bin) rows into histQuantiles,
        // whose cumulative window does not re-aggregate — histMerge's
        // bin-wise re-aggregation makes the collision case exact
        Profiling.histQuantiles(
            Profiling.histMerge(merged, all.select("group", "bin", "cnt")),
            Seq(0.25, 0.5, 0.9), binWidth = 5.0)
          .orderBy("group", "q")
      }),

    // AUDIO perceptual near-dup — the audio pipeline's correctness
    // row, the q224 construction transferred to PCM: a deterministic
    // synthetic WAV corpus generated on the executors
    // (Multimodal.syntheticAudioCorpus — 65-segment amplitude-walk
    // clips whose RMS-delta fingerprint equals the same analytic
    // 63-bit integer formula), pushed through the REAL pipeline:
    // javax.sound.sampled decode → mono mix → 65-segment RMS envelope
    // → audioFingerprint64 → the modality-agnostic pigeonhole pairing
    // (hamming ≤ 3). The oracle recomputes the planted hashes from
    // the integer arithmetic and replays the pairing brute-force —
    // a hash match proves WAV parse, PCM decode, envelope,
    // fingerprint bits, and pairing end to end. Same planted triple
    // structure as q224: one hamming-1 pair per triple, nothing else.
    Query("q228_audio_neardup", Some(multimodalNearDupOracleSql(
      n = 60)))(
      (s, dir) =>
        Dedup.fingerprintNearDupPairs(
          Multimodal.audioFingerprints(
            Multimodal.syntheticAudioCorpus(s, 60)),
          "media_id", "afp", maxHamming = 3)
          .orderBy("id_a", "id_b")),

    // VIDEO perceptual near-dup — completes the multimodal
    // correctness family (image q224, audio q228): a deterministic
    // synthetic AVI corpus generated on the executors
    // (Multimodal.syntheticVideoCorpus — 65 uncompressed BI_RGB
    // frames per clip whose gray level walks the same analytic
    // 63-bit formula), pushed through the REAL pipeline: RIFF/LIST
    // container walk → DIB Rec. 601 luminance → 65-segment envelope
    // → videoFingerprint64 → pigeonhole pairing (hamming ≤ 3). The
    // oracle recomputes the planted hashes from the integer
    // arithmetic and replays the pairing brute-force. Same planted
    // triple structure: one hamming-1 pair per triple, nothing else.
    Query("q229_video_neardup", Some(multimodalNearDupOracleSql(
      n = 60)))(
      (s, dir) =>
        Dedup.fingerprintNearDupPairs(
          Multimodal.videoFingerprints(
            Multimodal.syntheticVideoCorpus(s, 60)),
          "media_id", "vfp", maxHamming = 3)
          .orderBy("id_a", "id_b")),

    // GIF perceptual near-dup — certifies the LAST real decode path
    // without a machine oracle (PNG q224, WAV q228, AVI q229, GIF
    // here): a deterministic synthetic animated-GIF corpus written by
    // the JVM's OWN GIF encoder on the executors (65 constant-gray
    // frames walking the same analytic 63-bit formula; GIF palettes
    // are lossless for constant frames), pushed through the REAL
    // pipeline: ImageIO GIF ImageReader frame walk → mean luminance →
    // 65-segment envelope → videoFingerprint64 → pigeonhole pairing.
    // The oracle recomputes the planted hashes from the integer
    // arithmetic and replays the pairing brute-force.
    Query("q233_gif_neardup", Some(multimodalNearDupOracleSql(
      n = 60)))(
      (s, dir) =>
        Dedup.fingerprintNearDupPairs(
          Multimodal.videoFingerprints(
            Multimodal.syntheticGifCorpus(s, 60)),
          "media_id", "vfp", maxHamming = 3)
          .orderBy("id_a", "id_b")),

    // LSH OPERATING-POINT recommendation — the auto-tuner the q225
    // calibration census feeds (r12 verdict stretch #7): score every
    // candidate (bands, rows) banding's S-curve P(J) = 1 − (1 − J^r)^b
    // against the MEASURED similarity distribution of the calibration
    // sample (same declared budget + prefix-variant sweep), report
    // per-candidate recall over true positives / false-candidate rate
    // below threshold / S-curve midpoint, and flag the cheapest
    // candidate clearing the declared recall floor. Integer powers
    // expand as left-associated multiplication chains (no pow()), so
    // the oracle replays every per-pair probability bit for bit.
    Query("q231_lsh_operating_point", Some(lshOperatingPointOracleSql(
      target = 0.5, floor = 0.9, grid = Dedup.defaultLshGrid,
      pcts = Seq(30, 50, 70, 90), maxDocs = 500)))(
      (s, dir) =>
        Dedup.minhashOperatingPoint(t(s, dir, "documents"), "doc_id",
          "text", targetJaccard = 0.5, recallFloor = 0.9,
          maxDocs = 500)),

    // MP4 (ISO BMFF) box-parse metadata — the LAST byte parser to get
    // a machine oracle (PNG q224, WAV q228, AVI q229, GIF q233): a
    // synthetic corpus of hand-built ftyp/moov/mvhd/trak/tkhd box
    // trees generated on the executors (Multimodal.groundTruthMp4 —
    // analytic width/height/timescale/duration; odd ids carry a
    // version-1 mvhd AND a leading 0×0 audio track, ids ≡ 0 mod 3 a
    // 64-bit moov header) pushed through the PRODUCTION path:
    // extractFeatures → decodeVideo → the declared parseMp4Meta
    // metadata fallback. The oracle recomputes dims from the integer
    // formulas and duration from the same float division — a hash
    // match proves the 32/64-bit box walk, mvhd v0/v1 layouts, 16.16
    // fixed-point dims, and the zero-dim-track skip rule end to end.
    Query("q235_mp4_meta", Some(
      """WITH ids AS (SELECT unnest(generate_series(0, 59)) AS id),
        |v AS (SELECT id,
        |    16 + (id % 31) * 8 AS width, 16 + (id % 23) * 8 AS height,
        |    600 * (1 + id % 5) AS ts,
        |    600 * (1 + id % 5) * (1 + id % 29) + (id % 97) AS dur
        |  FROM ids)
        |SELECT id AS media_id, width, height,
        |  FLOOR(CAST(CAST(CAST(dur AS DOUBLE) / ts AS FLOAT) AS DOUBLE)
        |    * 1e6 + 0.5) / 1e6 AS duration_s
        |FROM v ORDER BY media_id""".stripMargin))(
      (s, dir) =>
        Multimodal.extractFeatures(Multimodal.syntheticMp4Corpus(s, 60))
          .toDF()
          .select(col("media_id"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            (floor(col("duration_s").cast("double") * 1e6 + 0.5) / 1e6)
              .as("duration_s"))
          .orderBy("media_id"))
  )

  /** The q215/q220 sketch key: md5-uint32 of `user:day` — the same
    * draw convention as q213's bootstrap weights.
    */
  private def kmvUserDayHash(user: Column): Column =
    conv(substring(md5(concat(user.cast("string"), lit(":"),
      (tsUs.cast("long") / 86400000000L).cast("long").cast("string"))),
      1, 8), 16, 10).cast("long")

  /** The persisted per-event-type KMV sketch registry q220 refreshes —
    * one aggregation over the base events, written as (group, sk) and
    * PUBLISHED AS VERSION `v=0` of a versioned registry root. This is
    * the RegistryIdempotenceSpec convention running on the benched
    * path itself (r16 verdict #5: the spec certified `reg/v=<n>` while
    * every query-path registry ran a session-scoped fresh-dir
    * overwrite — idempotent by construction, but proving a convention
    * the benched code never exercised). q220's refresh below reads the
    * immutable v=0 and overwrites v=1 — never its own input — so a
    * re-run or crash re-run of the refresh is idempotent exactly the
    * way the spec demonstrates per family.
    */
  private val kmvIdxCache = new graft.SessionCache[String]
  private def kmvRegistryRoot(s: SparkSession, dir: String): String =
    kmvIdxCache.get(s, dir) {
      val p = ExtendedQueries.newIdxDir("graft_kmv_reg")
      t(s, dir, "events")
        .groupBy(col("event_type").cast("string").as("group"))
        .agg(graft.functions.KmvAgg.kmvSketch(64)(
          kmvUserDayHash(col("user_id"))).as("sk"))
        .write.mode("overwrite").parquet(s"$p/v=0")
      p
    }

  /** Oracle SQL for q219: per candidate FK, the orphan definition
    * replayed with scalar subqueries; null FKs are exempt (SQL FK
    * semantics).
    */
  private def fkOracleSql: String = {
    def pair(name: String, child: String, fk: String, parent: String,
        pk: String) = {
      val orphan = s"""FROM $child WHERE $fk IS NOT NULL
         | AND $fk NOT IN (SELECT $pk FROM $parent)""".stripMargin
      s"""SELECT '$name' AS fk,
         |  (SELECT COUNT(*) FROM $child) AS n_child,
         |  (SELECT COUNT(*) FROM $child WHERE $fk IS NULL) AS n_null,
         |  (SELECT COUNT(*) $orphan) AS orphans,
         |  (SELECT COUNT(DISTINCT $fk) $orphan) AS missing_keys,
         |  (SELECT COUNT(*) $orphan) = 0 AS ok""".stripMargin
    }
    Seq(
      pair("customer.c_nationkey->nation.n_nationkey", "customer",
        "c_nationkey", "nation", "n_nationkey"),
      pair("events.user_id->customer.c_custkey", "events", "user_id",
        "customer", "c_custkey"),
      pair("lineitem.l_orderkey->orders.o_orderkey", "lineitem",
        "l_orderkey", "orders", "o_orderkey"),
      pair("lineitem.l_partkey->part.p_partkey", "lineitem",
        "l_partkey", "part", "p_partkey"),
      pair("lineitem.l_suppkey->supplier.s_suppkey", "lineitem",
        "l_suppkey", "supplier", "s_suppkey"),
      pair("orders.o_custkey->customer.c_custkey", "orders",
        "o_custkey", "customer", "c_custkey"),
      pair("supplier.s_nationkey->region.r_regionkey", "supplier",
        "s_nationkey", "region", "r_regionkey")
    ).mkString("", "\nUNION ALL\n", "\nORDER BY fk")
  }

  /** Oracle SQL for q220: the KMV sketch recomputed from scratch over
    * base ∪ delta — the maintenance result must equal it exactly.
    */
  private def kmvDeltaOracleSql(k: Int): String = {
    val num = (k - 1).toDouble * 4294967296.0
    s"""WITH d AS (
       |  SELECT event_type,
       |    user_id || ':' || (epoch_us(ts) // 86400000000) AS key
       |  FROM events
       |  UNION ALL
       |  SELECT event_type,
       |    (user_id + 1000) || ':' || (epoch_us(ts) // 86400000000) AS key
       |  FROM events WHERE event_id % 7 = 0),
       |h AS (SELECT DISTINCT event_type,
       |    ('0x' || substring(md5(key), 1, 8))::BIGINT AS u FROM d),
       |r AS (SELECT event_type, u,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY u) AS rn,
       |    COUNT(*) OVER (PARTITION BY event_type) AS cnt FROM h)
       |SELECT event_type AS "group",
       |  CAST(LEAST(MAX(cnt), $k) AS BIGINT) AS sketch_size,
       |  ROUND(CASE WHEN MAX(cnt) < $k THEN CAST(MAX(cnt) AS DOUBLE)
       |    ELSE $num / MAX(CASE WHEN rn = $k THEN u END) END, 4) AS est
       |FROM r GROUP BY 1 ORDER BY "group"""".stripMargin
  }

  /** Oracle SQL for q215: the window-rank replay of the KMV sketch —
    * the k smallest distinct hashes per group (and of the union for
    * the ALL row; identical to merging the group sketches, since any
    * global bottom-k member is in its own group's bottom-k). The
    * (k−1)·2³² numerator is the same precomputed exact-integer double
    * the engine divides by `u_k`.
    */
  private def kmvOracleSql(k: Int): String = {
    val num = (k - 1).toDouble * 4294967296.0
    s"""WITH d AS (SELECT event_type,
       |    user_id || ':' || (epoch_us(ts) // 86400000000) AS key
       |  FROM events),
       |h AS (SELECT DISTINCT event_type,
       |    ('0x' || substring(md5(key), 1, 8))::BIGINT AS u FROM d),
       |r AS (SELECT event_type, u,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY u) AS rn,
       |    COUNT(*) OVER (PARTITION BY event_type) AS cnt FROM h),
       |g AS (SELECT event_type AS grp, CAST(MAX(cnt) AS BIGINT) AS exact,
       |    CAST(LEAST(MAX(cnt), $k) AS BIGINT) AS sketch_size,
       |    MAX(CASE WHEN rn = $k THEN u END) AS hk FROM r GROUP BY 1),
       |ar AS (SELECT u, ROW_NUMBER() OVER (ORDER BY u) AS rn,
       |    COUNT(*) OVER () AS cnt FROM (SELECT DISTINCT u FROM h)),
       |ag AS (SELECT 'ALL' AS grp, CAST(MAX(cnt) AS BIGINT) AS exact,
       |    CAST(LEAST(MAX(cnt), $k) AS BIGINT) AS sketch_size,
       |    MAX(CASE WHEN rn = $k THEN u END) AS hk FROM ar)
       |SELECT grp AS "group", exact, sketch_size,
       |  ROUND(CASE WHEN sketch_size < $k THEN CAST(sketch_size AS DOUBLE)
       |    ELSE $num / hk END, 4) AS est
       |FROM (SELECT * FROM g UNION ALL SELECT * FROM ag)
       |ORDER BY "group"""".stripMargin
  }

  /** Oracle SQL for q216: the q124 chain restricted to states with
    * outgoing mass (next ∈ prev-set) BEFORE row normalization, then
    * `rounds` unrolled π ← πP stages (MATERIALIZED — DuckDB's default
    * CTE inlining is exponential when a stage references its
    * predecessor twice). Each stage LEFT-joins from the state list so
    * a source state (no incoming edges) keeps an explicit 0 row,
    * matching the engine's dense vector.
    */
  private def stationaryOracleSql(rounds: Int): String = {
    val stages = (1 to rounds).map { r =>
      s"""pi$r AS MATERIALIZED (SELECT st.state,
         |  COALESCE(SUM(pi${r - 1}.pi * p.p), CAST(0 AS DOUBLE)) AS pi
         |  FROM st LEFT JOIN p ON p.next = st.state
         |  LEFT JOIN pi${r - 1} ON pi${r - 1}.state = p.prev
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH s AS (SELECT user_id, event_type,
       |    lag(event_type) OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(ts), event_id) AS prev
       |  FROM events),
       |c AS (SELECT prev, event_type AS next, COUNT(*) AS cnt
       |  FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
       |st AS (SELECT DISTINCT prev AS state FROM c),
       |c2 AS (SELECT c.* FROM c JOIN st ON st.state = c.next),
       |p AS (SELECT prev, next,
       |    cnt / SUM(cnt) OVER (PARTITION BY prev) AS p FROM c2),
       |pi0 AS (SELECT state,
       |    CAST(1 AS DOUBLE) / (SELECT COUNT(*) FROM st) AS pi FROM st),
       |$stages
       |SELECT state, ROUND(pi, 6) AS pi FROM pi$rounds
       |ORDER BY state""".stripMargin
  }

  /** Oracle SQL for q217: the g3 confidence definition per declared
    * pair, unioned. Explicit DOUBLE casts on the ratio match Spark's
    * long-division-as-double semantics.
    */
  private def fdOracleSql: String = {
    def pair(name: String, tbl: String, lhs: String, rhs: String) =
      s"""SELECT '$name' AS fd, CAST(SUM(tot) AS BIGINT) AS n,
         |  COUNT(*) AS distinct_lhs,
         |  CAST(SUM(tot) - SUM(mx) AS BIGINT) AS violations,
         |  ROUND(CAST(SUM(mx) AS DOUBLE) / CAST(SUM(tot) AS DOUBLE), 6)
         |    AS conf,
         |  CAST(SUM(tot) - SUM(mx) AS BIGINT) = 0 AS holds
         |FROM (SELECT l, MAX(c) AS mx, SUM(c) AS tot
         |  FROM (SELECT $lhs AS l, $rhs AS r, COUNT(*) AS c
         |    FROM $tbl GROUP BY 1, 2) GROUP BY 1)""".stripMargin
    Seq(
      pair("customer.c_nationkey->c_mktsegment", "customer",
        "c_nationkey", "c_mktsegment"),
      pair("documents.source->lang", "documents", "source", "lang"),
      pair("events.user_id->event_type", "events", "user_id",
        "event_type"),
      pair("lineitem.l_partkey->l_suppkey", "lineitem", "l_partkey",
        "l_suppkey"),
      pair("orders.o_custkey->o_orderpriority", "orders", "o_custkey",
        "o_orderpriority")
    ).mkString("", "\nUNION ALL\n", "\nORDER BY fd")
  }

  /** Oracle SQL for q213 — the weight ladder is generated from the
    * SAME integer thresholds the engine compares against
    * ([[graft.operators.Profiling.poissonThresholds32]]).
    */
  private def bootstrapOracleSql(reps: Int): String = {
    val ts = Profiling.poissonThresholds32
    val ladder = ts.zipWithIndex
      .map { case (t, k) => s"WHEN u < $t THEN $k" }.mkString(" ")
    val w = s"(CASE $ladder ELSE ${ts.size} END)"
    s"""WITH b AS (SELECT unnest(generate_series(0, ${reps - 1})) AS b),
       |x AS (SELECT event_type, value, b,
       |    ('0x' || substring(md5(event_id || ':' || b), 1, 8))::BIGINT
       |      AS u
       |  FROM events CROSS JOIN b),
       |wx AS (SELECT event_type, b,
       |    SUM(CAST(value AS DECIMAL(18,2)) * $w) AS num,
       |    SUM($w) AS den
       |  FROM x GROUP BY 1, 2),
       |m AS (SELECT event_type, b, CAST(num AS DOUBLE) / den AS mean_b,
       |    ROW_NUMBER() OVER (PARTITION BY event_type
       |      ORDER BY CAST(num AS DOUBLE) / den, b) AS rn
       |  FROM wx),
       |ci AS (SELECT event_type,
       |    ROUND(MIN(CASE WHEN rn = 2 THEN mean_b END), 6) AS ci_lo,
       |    ROUND(MIN(CASE WHEN rn = ${reps - 1} THEN mean_b END), 6)
       |      AS ci_hi
       |  FROM m GROUP BY 1),
       |st AS (SELECT event_type,
       |    ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
       |      / COUNT(*), 6) AS mean
       |  FROM events GROUP BY 1)
       |SELECT event_type AS "group", st.mean, ci.ci_lo, ci.ci_hi
       |FROM ci JOIN st USING (event_type) ORDER BY event_type""".stripMargin
  }

  /** Oracle SQL for q199: the co-purchase edge reconstruction (the
    * q187 convention) + `rounds` UNROLLED peel stages — each stage
    * keeps nodes whose degree among the previous stage's survivors is
    * ≥ k. Plain CTEs, because monotone REMOVAL doesn't fit a
    * UNION-accumulating recursive CTE; the stage count just has to
    * cover the verify-scale fixpoint depth (engine throws past its
    * own bound, and any shortfall here is a visible hash mismatch,
    * not a silent pass).
    */
  private def kcoreOracleSql(k: Int, rounds: Int): String = {
    // AS MATERIALIZED on m and every stage: each stage references its
    // predecessor TWICE, so DuckDB's default CTE inlining doubles the
    // plan tree per stage — 2^rounds parquet scans (observed as a
    // too-many-open-files error at 16 stages) instead of `rounds`
    // linear passes
    val stages = (1 to rounds).map { i =>
      s"""a$i AS MATERIALIZED (SELECT m.v FROM m
         |  JOIN a${i - 1} x ON m.v = x.v JOIN a${i - 1} y ON m.w = y.v
         |  GROUP BY m.v HAVING COUNT(*) >= $k)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
       |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
       |    AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |m AS MATERIALIZED (SELECT pa AS v, pb AS w FROM e
       |      UNION ALL SELECT pb, pa FROM e),
       |a0 AS (SELECT DISTINCT v FROM m),
       |$stages
       |SELECT m.v AS node, COUNT(*) AS core_degree FROM m
       |  JOIN a$rounds x ON m.v = x.v JOIN a$rounds y ON m.w = y.v
       |GROUP BY m.v ORDER BY node""".stripMargin
  }

  /** Oracle SQL for q201: the co-purchase edge reconstruction +
    * `rounds` unrolled BFS expansions from the `nSeeds` lowest-id
    * nodes — stage i adds `hops = i` for frontier neighbors not yet
    * discovered. `AS MATERIALIZED` for the same reason as
    * [[kcoreOracleSql]] (each stage references its predecessor more
    * than once).
    */
  private def bfsOracleSql(nSeeds: Int, rounds: Int): String = {
    val stages = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT * FROM d${i - 1}
         |  UNION ALL
         |  SELECT v, $i AS hops FROM (
         |    SELECT DISTINCT m.w AS v FROM m
         |    JOIN d${i - 1} f ON m.v = f.v AND f.hops = ${i - 1})
         |  WHERE v NOT IN (SELECT v FROM d${i - 1}))""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
       |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
       |    AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |m AS MATERIALIZED (SELECT pa AS v, pb AS w FROM e
       |      UNION ALL SELECT pb, pa FROM e),
       |s AS (SELECT v FROM (SELECT DISTINCT v FROM m)
       |      ORDER BY v LIMIT $nSeeds),
       |d0 AS MATERIALIZED (SELECT v, 0 AS hops FROM s),
       |$stages
       |SELECT v AS node, hops FROM d$rounds ORDER BY node""".stripMargin
  }

  /** Oracle SQL for q221: the Adamic-Adar definition replayed over the
    * q187-convention co-purchase edge CTE — wedge join through each
    * center, the same ⌊1e9/ln d + 0.5⌋ integer nano-unit terms, the
    * same declared center-degree cap, anti-join of existing edges,
    * and the cut on the exact integer score.
    */
  private def adamicAdarOracleSql(topK: Int, maxDeg: Int): String =
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e AS (SELECT a.l_partkey AS x, b.l_partkey AS y
       |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
       |    AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |m AS MATERIALIZED (SELECT x AS v, y AS w FROM e
       |      UNION ALL SELECT y, x FROM e),
       |deg AS (SELECT v, COUNT(*) AS d FROM m GROUP BY 1),
       |ctr AS (SELECT v,
       |    CAST(FLOOR(1e9 / ln(d) + 0.5) AS BIGINT) AS term
       |  FROM deg WHERE d >= 2 AND d <= $maxDeg),
       |wdg AS (SELECT m1.w AS u, m2.w AS v2, ctr.term
       |  FROM m m1 JOIN m m2 ON m1.v = m2.v AND m1.w < m2.w
       |  JOIN ctr ON ctr.v = m1.v),
       |sc AS (SELECT u, v2 AS v, COUNT(*) AS scored_common_nbrs,
       |    SUM(term) AS s
       |  FROM wdg GROUP BY 1, 2),
       |ne AS (SELECT * FROM sc WHERE NOT EXISTS (
       |  SELECT 1 FROM e WHERE e.x = sc.u AND e.y = sc.v)),
       |census AS (SELECT
       |    COUNT(CASE WHEN d > $maxDeg THEN 1 END) AS excluded_centers,
       |    MAX(d) AS max_degree FROM deg)
       |SELECT u, v, scored_common_nbrs, ROUND(s / 1e9, 6) AS aa_score,
       |  excluded_centers, max_degree
       |FROM ne CROSS JOIN census
       |ORDER BY s DESC, u, v LIMIT $topK""".stripMargin

  /** Oracle SQL for q222: per declared key pair, the KMV join-size
    * estimator replayed exactly — per-side bottom-k sketches via
    * window rank over distinct md5-uint32 draws, the union sketch,
    * the K∩ membership count (membership against the full distinct
    * sets, provably identical to sketch membership for union-sketch
    * members), and the same IEEE estimate chain.
    */
  private def joinCardOracleSql(k: Int): String = {
    val num = (k - 1).toDouble * 4294967296.0
    def pair(name: String, ta: String, ka: String, tb: String,
        kb: String) =
      s"""SELECT * FROM (
         |WITH ha AS (SELECT DISTINCT
         |    ('0x' || substring(md5(CAST($ka AS VARCHAR)), 1, 8))::BIGINT
         |      AS u FROM $ta WHERE $ka IS NOT NULL),
         |hb AS (SELECT DISTINCT
         |    ('0x' || substring(md5(CAST($kb AS VARCHAR)), 1, 8))::BIGINT
         |      AS u FROM $tb WHERE $kb IS NOT NULL),
         |ra AS (SELECT u, ROW_NUMBER() OVER (ORDER BY u) AS rn,
         |    COUNT(*) OVER () AS cnt FROM ha),
         |rb AS (SELECT u, ROW_NUMBER() OVER (ORDER BY u) AS rn,
         |    COUNT(*) OVER () AS cnt FROM hb),
         |ru AS (SELECT u, ROW_NUMBER() OVER (ORDER BY u) AS rn,
         |    COUNT(*) OVER () AS cnt
         |  FROM (SELECT u FROM ha UNION SELECT u FROM hb)),
         |sc AS (SELECT
         |  (SELECT COUNT(*) FROM $ta WHERE $ka IS NOT NULL) AS na,
         |  (SELECT COUNT(*) FROM $tb WHERE $kb IS NOT NULL) AS nb,
         |  (SELECT MAX(cnt) FROM ra) AS ca,
         |  (SELECT u FROM ra WHERE rn = $k) AS uka,
         |  (SELECT MAX(cnt) FROM rb) AS cb,
         |  (SELECT u FROM rb WHERE rn = $k) AS ukb,
         |  (SELECT MAX(cnt) FROM ru) AS cu,
         |  (SELECT u FROM ru WHERE rn = $k) AS uku,
         |  (SELECT COUNT(*) FROM ru WHERE rn <= $k
         |    AND u IN (SELECT u FROM ha)
         |    AND u IN (SELECT u FROM hb)) AS kint),
         |est AS (SELECT na, nb, kint, cu,
         |  CASE WHEN ca < $k THEN CAST(ca AS DOUBLE)
         |    ELSE $num / uka END AS ea,
         |  CASE WHEN cb < $k THEN CAST(cb AS DOUBLE)
         |    ELSE $num / ukb END AS eb,
         |  CASE WHEN cu < $k THEN CAST(cu AS DOUBLE)
         |    ELSE $num / uku END AS eu FROM sc),
         |ov AS (SELECT *,
         |  CASE WHEN cu < $k THEN CAST(kint AS DOUBLE)
         |    ELSE CAST(kint AS DOUBLE) / $k.0 * eu END AS o FROM est)
         |SELECT '$name' AS pair, na AS n_a, nb AS n_b,
         |  ROUND(ea, 4) AS est_distinct_a,
         |  ROUND(eb, 4) AS est_distinct_b,
         |  ROUND(o, 4) AS est_overlap,
         |  ROUND(o * (na / ea) * (nb / eb), 4) AS est_join_rows
         |FROM ov)""".stripMargin
    Seq(
      pair("events.user_id*customer.c_custkey", "events", "user_id",
        "customer", "c_custkey"),
      pair("lineitem.l_orderkey*orders.o_orderkey", "lineitem",
        "l_orderkey", "orders", "o_orderkey"),
      pair("lineitem.l_partkey*part.p_partkey", "lineitem",
        "l_partkey", "part", "p_partkey"),
      pair("orders.o_custkey*customer.c_custkey", "orders",
        "o_custkey", "customer", "c_custkey")
    ).mkString("", "\nUNION ALL\n", "\nORDER BY pair")
  }

  /** Oracle SQL for q223: the Welch statistic replayed from the same
    * exact decimal (n, Σv, Σv²) sums through the identical IEEE
    * chain — means, s²/n standard-error terms, t, and the
    * Welch–Satterthwaite df.
    */
  private def welchOracleSql: String =
    """WITH g AS (SELECT event_type AS g, COUNT(*) AS n,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS sv,
      |    SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
      |      AS svv
      |  FROM events WHERE value IS NOT NULL GROUP BY 1
      |  HAVING COUNT(*) >= 2),
      |p AS (SELECT a.g AS ga, b.g AS gb, a.n AS na, b.n AS nb,
      |    CAST(a.sv AS DOUBLE) AS sva, CAST(a.svv AS DOUBLE) AS svva,
      |    CAST(b.sv AS DOUBLE) AS svb, CAST(b.svv AS DOUBLE) AS svvb
      |  FROM g a JOIN g b ON a.g < b.g),
      |c AS (SELECT ga, gb, na, nb,
      |    sva / na AS ma, svb / nb AS mb,
      |    (svva - sva * sva / na) / (na - 1) / na AS sea,
      |    (svvb - svb * svb / nb) / (nb - 1) / nb AS seb
      |  FROM p)
      |SELECT ga || '|' || gb AS pair, na AS n_a, nb AS n_b,
      |  ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
      |  CASE WHEN sea + seb = 0 THEN NULL
      |    ELSE ROUND((ma - mb) / sqrt(sea + seb), 6) END AS t,
      |  CASE WHEN sea + seb = 0 THEN NULL
      |    ELSE ROUND((sea + seb) * (sea + seb) /
      |      (sea * sea / (na - 1) + seb * seb / (nb - 1)), 6) END AS df
      |FROM c ORDER BY pair""".stripMargin

  /** Oracle SQL for q224: the synthetic corpus's ground-truth dHashes
    * recomputed from Multimodal.groundTruthHash's integer arithmetic
    * (base bit j = ((id/3)·(j+1)) mod 61 < 30 over bits 0..62;
    * member 1 flips bit (id/3) mod 63, member 2 flips
    * 0x00FF00FF00FF00FF = 71777214294589695), then the hamming ≤ 3
    * pairing brute-forced over the tiny id range — the engine's
    * pigeonhole join must reproduce it exactly from DECODED PNGs.
    * bit_xor over disjoint single-bit terms assembles the base (the
    * terms never overlap, so xor = or = sum without HUGEINT widening).
    */
  private def multimodalNearDupOracleSql(n: Int): String =
    s"""WITH ids AS (SELECT unnest(generate_series(0, ${n - 1})) AS id),
       |js AS (SELECT unnest(generate_series(0, 62)) AS j),
       |bits AS (SELECT id, j,
       |    CASE WHEN ((id // 3) * (j + 1)) % 61 < 30
       |      THEN (1::BIGINT << j) ELSE 0::BIGINT END AS b
       |  FROM ids CROSS JOIN js),
       |base AS (SELECT id, bit_xor(b) AS base FROM bits GROUP BY id),
       |h AS (SELECT id,
       |    CASE WHEN id % 3 = 0 THEN base
       |      WHEN id % 3 = 1 THEN
       |        xor(base, 1::BIGINT << CAST((id // 3) % 63 AS INTEGER))
       |      ELSE xor(base, 71777214294589695::BIGINT) END AS fp
       |  FROM base)
       |SELECT a.id AS id_a, b.id AS id_b,
       |  CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
       |FROM h a JOIN h b ON a.id < b.id
       |WHERE bit_count(xor(a.fp, b.fp)) <= 3
       |ORDER BY id_a, id_b""".stripMargin

  /** Oracle SQL for q225: exact shingle Jaccard and the k-permutation
    * md5-uint32 MinHash estimate replayed verbatim — same prefix
    * variants (integer token-count arithmetic), same word-3-gram
    * shingles, same seed|shingle draws, same decimal(38,12) mean
    * accumulation.
    */
  private def minhashCalibOracleSql(pcts: Seq[Int], k: Int,
      maxDocs: Int): String = {
    def draw(side: String): String =
      s"list_min([('0x' || substring(md5(CAST(s AS VARCHAR) || '|' || x)," +
        s" 1, 8))::BIGINT FOR x IN $side])"
    s"""WITH samp AS (SELECT doc_id, text FROM documents
       |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT $maxDocs),
       |base AS (SELECT doc_id,
       |    string_split_regex(trim(text), '\\s+') AS w FROM samp),
       |pcts AS (SELECT unnest([${pcts.mkString(", ")}]) AS pct),
       |pairs AS (SELECT doc_id, pct, w AS wa,
       |    w[1:CAST((len(w) * pct) // 100 AS BIGINT)] AS wb
       |  FROM base CROSS JOIN pcts),
       |sh AS (SELECT doc_id, pct,
       |    list_distinct([wa[i] || ' ' || wa[i+1] || ' ' || wa[i+2]
       |      FOR i IN generate_series(1, len(wa) - 2)]) AS sa,
       |    list_distinct([wb[i] || ' ' || wb[i+1] || ' ' || wb[i+2]
       |      FOR i IN generate_series(1, len(wb) - 2)]) AS sb
       |  FROM pairs),
       |ok AS (SELECT * FROM sh WHERE len(sa) > 0 AND len(sb) > 0),
       |jm AS (SELECT pct,
       |    CAST(len(list_intersect(sa, sb)) AS DOUBLE)
       |      / (len(sa) + len(sb) - len(list_intersect(sa, sb))) AS ej,
       |    CAST(len([s FOR s IN generate_series(1, $k)
       |        IF ${draw("sa")} = ${draw("sb")}]) AS DOUBLE) / $k AS es
       |  FROM ok)
       |SELECT pct, COUNT(*) AS n_pairs,
       |  ROUND(CAST(SUM(CAST(ej AS DECIMAL(38,12))) AS DOUBLE)
       |    / COUNT(*), 6) AS mean_exact,
       |  ROUND(CAST(SUM(CAST(es AS DECIMAL(38,12))) AS DOUBLE)
       |    / COUNT(*), 6) AS mean_est,
       |  ROUND(CAST(SUM(CAST(ABS(ej - es) AS DECIMAL(38,12))) AS DOUBLE)
       |    / COUNT(*), 6) AS mean_abs_err
       |FROM jm GROUP BY pct ORDER BY pct""".stripMargin
  }

  /** Oracle SQL for q231: the banding S-curve scored over the same
    * sampled pair frame as q225, every candidate's probabilities
    * expanded as the SAME left-associated multiplication chains the
    * engine plans (integer powers — correctly-rounded IEEE ops, no
    * pow()), means as decimal(38,12), the recommendation replayed by
    * an identical deterministic window. `s_mid` literals are computed
    * once here in Scala (Double.toString round-trips exactly through
    * any IEEE parser, so both engines hold the same double).
    */
  private def lshOperatingPointOracleSql(target: Double, floor: Double,
      grid: Seq[(Int, Int)], pcts: Seq[Int], maxDocs: Int): String = {
    val candidates = grid.map { case (b, r) =>
      val jr = Seq.fill(r)("ej").mkString(" * ")
      val miss = Seq.fill(b)(s"(1.0 - ($jr))").mkString(" * ")
      val p = s"1.0 - ($miss)"
      val sMid = math.rint(math.pow(1.0 / b, 1.0 / r) * 1e6) / 1e6
      s"""SELECT CAST($b AS INTEGER) AS bands,
         |    CAST($r AS INTEGER) AS "rows",
         |    CAST(${b * r} AS INTEGER) AS n_hashes,
         |    CAST($sMid AS DOUBLE) AS s_mid,
         |    COUNT(CASE WHEN ej >= $target THEN 1 END) AS n_above,
         |    COUNT(CASE WHEN ej < $target THEN 1 END) AS n_below,
         |    CASE WHEN COUNT(CASE WHEN ej >= $target THEN 1 END) > 0
         |      THEN ROUND(CAST(SUM(CASE WHEN ej >= $target
         |          THEN CAST($p AS DECIMAL(38,12)) END) AS DOUBLE)
         |        / COUNT(CASE WHEN ej >= $target THEN 1 END), 6)
         |      END AS recall,
         |    CASE WHEN COUNT(CASE WHEN ej < $target THEN 1 END) > 0
         |      THEN ROUND(CAST(SUM(CASE WHEN ej < $target
         |          THEN CAST($p AS DECIMAL(38,12)) END) AS DOUBLE)
         |        / COUNT(CASE WHEN ej < $target THEN 1 END), 6)
         |      END AS false_cand_rate
         |  FROM jm""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH samp AS (SELECT doc_id, text FROM documents
       |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT $maxDocs),
       |base AS (SELECT doc_id,
       |    string_split_regex(trim(text), '\\s+') AS w FROM samp),
       |pcts AS (SELECT unnest([${pcts.mkString(", ")}]) AS pct),
       |pairs AS (SELECT doc_id, pct, w AS wa,
       |    w[1:CAST((len(w) * pct) // 100 AS BIGINT)] AS wb
       |  FROM base CROSS JOIN pcts),
       |sh AS (SELECT doc_id, pct,
       |    list_distinct([wa[i] || ' ' || wa[i+1] || ' ' || wa[i+2]
       |      FOR i IN generate_series(1, len(wa) - 2)]) AS sa,
       |    list_distinct([wb[i] || ' ' || wb[i+1] || ' ' || wb[i+2]
       |      FOR i IN generate_series(1, len(wb) - 2)]) AS sb
       |  FROM pairs),
       |ok AS (SELECT * FROM sh WHERE len(sa) > 0 AND len(sb) > 0),
       |jm AS (SELECT
       |    CAST(len(list_intersect(sa, sb)) AS DOUBLE)
       |      / (len(sa) + len(sb) - len(list_intersect(sa, sb))) AS ej
       |  FROM ok),
       |cand AS (
       |  $candidates),
       |ranked AS (SELECT *,
       |    ROW_NUMBER() OVER (ORDER BY
       |      CASE WHEN COALESCE(recall, 0.0) >= $floor THEN 0 ELSE 1 END,
       |      CASE WHEN COALESCE(recall, 0.0) >= $floor THEN n_hashes
       |        ELSE 0 END,
       |      CASE WHEN COALESCE(recall, 0.0) >= $floor THEN 0.0
       |        ELSE -COALESCE(recall, 0.0) END,
       |      n_hashes, bands) AS rn
       |  FROM cand)
       |SELECT bands, "rows", n_hashes, s_mid, n_above, n_below,
       |  recall, false_cand_rate, (rn = 1) AS recommended
       |FROM ranked ORDER BY bands, "rows"""".stripMargin
  }

  /** Oracle SQL for q226: the from-scratch rollup over the POST-CDC
    * fact table — base facts minus deletes, updates applied, inserts
    * included — the exact state the retractable merge must reproduce.
    */
  private[queries] def retractableOracleSql: String =
    """WITH post AS (
      |  SELECT event_type, value FROM events
      |  WHERE event_id % 3 <> 0 AND event_id % 5 <> 0
      |    AND event_id % 7 <> 0
      |  UNION ALL
      |  SELECT event_type, value + 10 FROM events
      |  WHERE event_id % 3 <> 0 AND event_id % 5 <> 0
      |    AND event_id % 7 = 0
      |  UNION ALL
      |  SELECT event_type, value FROM events WHERE event_id % 3 = 0)
      |SELECT event_type, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM post GROUP BY 1 ORDER BY 1""".stripMargin

  /** Oracle SQL for q227: bins, cumulative mass, and the interpolated
    * quantile estimates recomputed from the raw facts (the merged
    * registry must equal this recompute exactly — integer bin-merge
    * algebra), including the ALL rollup row.
    */
  private def histQuantOracleSql: String =
    """WITH b AS (SELECT event_type AS grp,
      |    CAST(FLOOR(CAST(value AS DOUBLE) / 5.0) AS BIGINT) AS bin
      |  FROM events WHERE value IS NOT NULL),
      |u AS (SELECT grp, bin FROM b UNION ALL SELECT 'ALL', bin FROM b),
      |h AS (SELECT grp, bin, COUNT(*) AS cnt FROM u GROUP BY 1, 2),
      |c AS (SELECT grp, bin, cnt,
      |    SUM(cnt) OVER (PARTITION BY grp ORDER BY bin) AS cum,
      |    SUM(cnt) OVER (PARTITION BY grp) AS n FROM h),
      |qs AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
      |    CAST(0.9 AS DOUBLE)]) AS q),
      |e AS (SELECT grp, q, n, bin, cum, cnt,
      |    ROW_NUMBER() OVER (PARTITION BY grp, q ORDER BY bin) AS rn
      |  FROM c CROSS JOIN qs
      |  WHERE CAST(cum AS DOUBLE) >= CAST(n AS DOUBLE) * q)
      |SELECT grp AS "group", q, CAST(n AS BIGINT) AS n,
      |  ROUND(CAST(bin AS DOUBLE) * 5.0 +
      |    (CAST(n AS DOUBLE) * q - CAST(cum - cnt AS DOUBLE))
      |      / CAST(cnt AS DOUBLE) * 5.0, 6) AS est
      |FROM e WHERE rn = 1 ORDER BY "group", q""".stripMargin
}
