package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.{EventStream, StreamReplay}

/** ORACLE-GRADE streaming end-to-end (r10 verdict task #1): the
  * queries here run REAL Structured Streaming jobs — `readStream` file
  * source, stateful operators, checkpointed append parquet sink — via
  * [[graft.streaming.StreamReplay]], and their results hash-match
  * DuckDB oracles that are the BATCH definitions of the same
  * computations (q62's sessionization, q151's PSI, q41's windowed
  * aggregation, exact-dedup-as-DISTINCT). This moves the
  * streaming family from spec-only evidence to the same
  * CORRECTNESS-gate footing as every batch operator: identical rows,
  * schema, and value hashes between the streaming engine and a
  * portable SQL replay.
  *
  * Batch/stream unification is the design claim being proven: the
  * streaming operators (EventStream.sessionizeExact, streamingPsi) are
  * watermark-bounded programs whose finalized output on a bounded
  * replay EQUALS the batch computation over the same rows.
  */
object StreamingQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private val HourUs = 3600000000L
  private val DayUs = 86400000000L

  /** Event time as µs-epoch (see TemporalQueries.tsUs). */
  private val tsUs = expr("ts div 1000")

  val all: Seq[Query] = Seq(

    // Streaming sessionization, end to end: the events table is
    // replayed through readStream -> sessionizeExact
    // (flatMapGroupsWithState, event-time timeout) -> parquet sink,
    // with two far-future negative-user sentinels (dropped inside the
    // state function — see sessionizeExact on why a filter would be
    // pushed below the watermark node) advancing the watermark so
    // every open session flushes through the timeout path. The oracle is the BATCH definition (q62's lag/gap SQL) —
    // the streaming state machine must reproduce it bit for bit:
    // µs-exact gap splits, (ts, event_id) tie order, decimal-exact
    // value sums (cents as longs).
    Query("q184_stream_sessionize", Some(
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
        |SELECT user_id, COUNT(*) AS n_events,
        |  MIN(t) AS start_us, MAX(t) AS end_us,
        |  CAST(SUM(CAST(coalesce(value, 0) AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_val
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, start_us""".stripMargin))(
      (s, dir) => {
        implicit val ss: SparkSession = s
        import s.implicits._
        val staged = t(s, dir, "events").select(
          col("user_id"), col("event_id"),
          timestamp_micros(tsUs).as("ts"), tsUs.as("ts_us"),
          (coalesce(col("value"), lit(0.0)).cast("decimal(18,2)") * 100)
            .cast("long").as("cents"))
        // max + median cut in ONE aggregation pass (guide §2.3 — the
        // separate max agg and approxQuantile action each re-scanned
        // the events table; at 100 TB those are two extra full reads
        // per replay). percentile_approx is the same Greenwald–Khanna
        // sketch approxQuantile wraps; the cut only has to be a valid
        // event-time split point — the DECLARED result is restart-
        // invariant (that is exactly what this replay proves), so the
        // sketch's tie-breaking is not result-affecting.
        val prep = staged.agg(max(col("ts_us")).as("mx"),
          percentile_approx(col("ts_us"), lit(0.5), lit(1000)).as("cut"))
          .head()
        val maxUs = prep.getLong(0)
        def sentinel(k: Int): DataFrame = s.range(1).select(
          lit(-1L).as("user_id"), lit(-(k.toLong)).as("event_id"),
          timestamp_micros(lit(maxUs + k * DayUs)).as("ts"),
          lit(maxUs + k * DayUs).as("ts_us"), lit(0L).as("cents"))
        // replay WITH a mid-stream kill/restart (r15 verdict #6): the
        // backlog is median-split in event time and drained by two
        // query instances over one checkpoint, so every driver bench
        // and correctness run of this query exercises — and the
        // oracle hash-gates — restart recovery of live session state,
        // not only the specs' one-off harness. Sessions straddling
        // the cut MUST merge across the restart for the batch oracle
        // to match.
        val cut = prep.getLong(1)
        StreamReplay.replayWithRestart(s,
            staged.filter(col("ts_us") <= cut),
            staged.filter(col("ts_us") > cut),
            Seq(sentinel(1), sentinel(2)),
            df => EventStream.sessionizeExact(
              df.as[EventStream.UsEvent], HourUs).toDF())
          .orderBy("user_id", "start_us")
      }),

    // Streaming drift monitor, end to end: per-1-day-window PSI of
    // event values against the corpus-marginal reference histogram
    // (the q151 dashboard convention), replayed through readStream ->
    // streamingPsi (windowed agg + static reference baked as
    // literals) -> parquet sink. Sentinels are NON-null values in
    // far-future windows: a null value would be dropped by
    // streamingPsi's isNotNull filter, which Catalyst pushes BELOW
    // the watermark node (so it would never advance event time); a
    // non-null sentinel instead advances the watermark and lands in
    // its own window. Spark's trailing no-data micro-batch
    // (spark.sql.streaming.noDataMicroBatches.enabled, default true)
    // runs after the last sentinel and finalizes the FIRST sentinel's
    // window too, so the replay result is clipped to the real data
    // span (win_start <= the data's own last day) — the sentinel
    // windows are replay scaffolding, not data. Same smoothing and
    // r12 per-term floor as the batch Drift operators; the term sum
    // is exact 1e-12 fixed-point long arithmetic on both sides (see
    // streamingPsi on why a projection-level decimal chain cannot be
    // used), so the oracle is portable SQL.
    Query("q185_stream_psi", Some(
      """WITH v AS (SELECT epoch_us(ts) // 86400000000 AS bucket,
        |    CAST(LEAST(GREATEST(FLOOR(value / 25.0), 0), 19) AS BIGINT)
        |      AS bin
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT bucket, bin, COUNT(*) AS cnt FROM v GROUP BY 1, 2),
        |r AS (SELECT b.bin, COALESCE(SUM(c2.cnt), 0) AS cnt_ref
        |      FROM (SELECT UNNEST(range(20)) AS bin) b
        |      LEFT JOIN c c2 ON c2.bin = b.bin GROUP BY 1),
        |nr AS (SELECT SUM(cnt_ref) AS n_ref FROM r),
        |sp AS (SELECT b.bucket, r.bin, r.cnt_ref, COALESCE(c.cnt, 0) AS cnt
        |       FROM (SELECT DISTINCT bucket FROM c) b CROSS JOIN r
        |       LEFT JOIN c ON c.bucket = b.bucket AND c.bin = r.bin),
        |p AS (SELECT bucket, cnt,
        |        (cnt + 0.5)
        |          / ((SUM(cnt) OVER (PARTITION BY bucket)) + 0.5 * 20)
        |          AS pc,
        |        (cnt_ref + 0.5) / (nr.n_ref + 0.5 * 20) AS pr
        |      FROM sp CROSS JOIN nr)
        |SELECT bucket * 86400000000 AS win_start_us,
        |  CAST(SUM(cnt) AS BIGINT) AS n,
        |  FLOOR(CAST(SUM(CAST(FLOOR((pc - pr) * LN(pc / pr) * 1e12 + 0.5)
        |      AS BIGINT)) AS DOUBLE) / 1e6 + 0.5) / 1e6
        |    AS psi
        |FROM p GROUP BY bucket ORDER BY win_start_us""".stripMargin))(
      (s, dir) => {
        val ev = t(s, dir, "events")
        // static reference + watermark horizon in ONE aggregation pass
        // (guide §2.3): the 20-bin corpus marginal and max(ts) used to
        // be a grouped histogram job plus a separate max agg — two
        // full scans of events per replay. The conditional counts
        // below reproduce Profiling.histogram's binning exactly
        // (clamp(floor((v − lo)/w), 0, nBins−1) over non-null values),
        // collapsed into a single-row partial-aggregated pass.
        val histBin = least(greatest(floor(col("value") / 25.0),
          lit(0.0)), lit(19.0)).cast("long")
        val prep = ev.agg(max(tsUs).as("mx"),
          (0 until 20).map(i => count(when(col("value").isNotNull &&
            histBin === i, 1)).as(s"b$i")): _*).head()
        val refHist = (0 until 20).map(i => prep.getLong(i + 1))
        val staged = ev.select(timestamp_micros(tsUs).as("ts"),
          col("value"))
        val maxUs = prep.getLong(0)
        def sentinel(k: Int): DataFrame = s.range(1).select(
          timestamp_micros(lit(maxUs + k * DayUs)).as("ts"),
          lit(0.0).as("value"))
        StreamReplay.replay(s, staged, Seq(sentinel(1), sentinel(2)),
            df => EventStream.streamingPsi(df, "value", refHist,
                0.0, 500.0, "1 day", "2 hours")
              .select(unix_micros(col("win_start")).as("win_start_us"),
                col("n"), col("psi")))
          .filter(col("win_start_us") <= lit((maxUs / DayUs) * DayUs))
          .orderBy("win_start_us")
      }),

    // The q41 windowed aggregation as a REAL streaming job (q41 runs
    // the same operator in batch mode — the unification claim; this
    // replay proves the streaming half): events through readStream ->
    // windowedStats (watermarked tumbling hour window × event_type,
    // append mode) -> parquet sink. Two far-future "__sentinel" rows
    // advance the watermark so every real hour window crosses the
    // finalization horizon (window end + 2 h delay); their own
    // windows are clipped from the result (win_start_us <= the data's
    // last hour), the q185 scaffolding convention. Oracle is q41's
    // batch SQL re-keyed to epoch-µs window starts; the value sum is
    // exact decimal on both sides.
    Query("q189_stream_window_agg", Some(
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS win_start_us,
        |  event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM events GROUP BY win_start_us, event_type
        |ORDER BY win_start_us, event_type""".stripMargin))(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val staged = ev.select(timestamp_micros(tsUs).as("ts"),
          col("event_type"), col("value"))
        val maxUs = ev.agg(max(tsUs)).head().getLong(0)
        def sentinel(k: Int): DataFrame = s.range(1).select(
          timestamp_micros(lit(maxUs + k * DayUs)).as("ts"),
          lit("__sentinel").as("event_type"), lit(0.0).as("value"))
        StreamReplay.replay(s, staged, Seq(sentinel(1), sentinel(2)),
            df => EventStream.windowedStats(df, "1 hour", "2 hours")
              .select(unix_micros(col("win_start")).as("win_start_us"),
                col("event_type"), col("cnt"), col("sum_val")))
          .filter(col("win_start_us") <= lit((maxUs / HourUs) * HourUs))
          .orderBy("win_start_us", "event_type")
      }),

    // Streaming exact dedup, end to end: watermark +
    // dropDuplicatesWithinWatermark over (user_id, event_type, day)
    // replayed through readStream. Emission is immediate — dedup
    // state drops later copies rather than holding rows for window
    // finalization — so no sentinels are needed. The surviving row's
    // non-key payload is arrival-order-dependent (whichever copy the
    // state store sees first), so the query projects exactly the
    // dedup key, making the proven contract precise: streaming dedup
    // over a bounded replay IS batch DISTINCT. Watermark-expiry
    // reinstatement (a key re-emitted after its state ages out)
    // cannot occur here: the whole span arrives in one micro-batch,
    // before any watermark advances.
    Query("q190_stream_dedup", Some(
      """SELECT DISTINCT user_id, event_type,
        |  (epoch_us(ts) // 86400000000) * 86400000000 AS day_us
        |FROM events ORDER BY user_id, event_type, day_us""".stripMargin))(
      (s, dir) => {
        val staged = t(s, dir, "events").select(
          timestamp_micros(tsUs).as("ts"), col("user_id"),
          col("event_type"),
          expr(s"((ts div 1000) div $DayUs) * $DayUs").as("day_us"))
        StreamReplay.replay(s, staged, Seq.empty,
            df => EventStream.dedupWithinWatermark(df,
                Seq("user_id", "event_type", "day_us"), "2 hours")
              .select("user_id", "event_type", "day_us"))
          .orderBy("user_id", "event_type", "day_us")
      }),

    // Streaming KS drift monitor, end to end: per-1-day-window KS
    // statistic against the corpus-marginal reference CDF, evaluated
    // at a FIXED cutoff grid (the streaming form cannot evaluate at
    // every distinct value — unbounded evaluation points are exactly
    // what one append-legal windowed aggregation cannot produce; see
    // streamingKsAtCutoffs). The reference cumulative counts are
    // bounded driver metadata (19 longs), the q185 reference-literal
    // convention. Sentinels are non-null far-future values (a null
    // would be dropped below the watermark node); their windows are
    // clipped to the data span. The per-cutoff |ecdf - refcdf| terms
    // are pure IEEE from integer counts on both sides, so the oracle
    // replays the max bit for bit.
    Query("q191_stream_ks", Some(
      """WITH v AS (SELECT epoch_us(ts) // 86400000000 AS bucket,
        |             value AS v
        |           FROM events WHERE value IS NOT NULL),
        |cut AS (SELECT 25.0 * UNNEST(range(1, 20)) AS c),
        |tot AS (SELECT COUNT(*) AS refn FROM v),
        |ref AS (SELECT c, SUM(CASE WHEN v.v <= cut.c THEN 1 ELSE 0 END)
        |          AS refcum
        |        FROM cut CROSS JOIN v GROUP BY c),
        |le AS (SELECT bucket, c, COUNT(*) AS n,
        |         SUM(CASE WHEN v.v <= cut.c THEN 1 ELSE 0 END) AS le
        |       FROM v CROSS JOIN cut GROUP BY bucket, c)
        |SELECT bucket * 86400000000 AS win_start_us,
        |  CAST(MAX(n) AS BIGINT) AS n,
        |  FLOOR(MAX(ABS(CAST(le AS DOUBLE) / n
        |      - CAST(refcum AS DOUBLE) / refn)) * 1e6 + 0.5) / 1e6 AS ks
        |FROM le JOIN ref USING (c) CROSS JOIN tot
        |GROUP BY bucket ORDER BY win_start_us""".stripMargin))(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val cuts = (1 to 19).map(_ * 25.0)
        // reference CDF at the grid + the watermark horizon in ONE
        // bounded aggregate over the corpus (guide §2.3 — the separate
        // max agg was a second full scan per replay): count(value)
        // counts exactly the non-null rows the filtered form counted,
        // and `value <= c` is null for null values so the conditional
        // sums are unchanged; max(ts) runs over ALL rows, as before.
        val refRow = ev
          .agg(count(col("value")).as("refn"),
            (cuts.zipWithIndex.map { case (c, i) =>
              sum(when(col("value") <= c, 1L).otherwise(0L)).as(s"c$i")
            } :+ max(tsUs).as("mx")): _*).head()
        val refN = refRow.getLong(0)
        val refCum = cuts.indices.map(i => refRow.getLong(i + 1))
        val staged = ev.select(timestamp_micros(tsUs).as("ts"),
          col("value"))
        val maxUs = refRow.getLong(cuts.size + 1)
        def sentinel(k: Int): DataFrame = s.range(1).select(
          timestamp_micros(lit(maxUs + k * DayUs)).as("ts"),
          lit(0.0).as("value"))
        StreamReplay.replay(s, staged, Seq(sentinel(1), sentinel(2)),
            df => EventStream.streamingKsAtCutoffs(df, "value", cuts,
                refCum, refN, "1 day", "2 hours")
              .select(unix_micros(col("win_start")).as("win_start_us"),
                col("n"), col("ks")))
          .filter(col("win_start_us") <= lit((maxUs / DayUs) * DayUs))
          .orderBy("win_start_us")
      }),

    // Stream-static enrichment, end to end: the q57 operator (attach
    // customer attributes at ingest) as a REAL streaming job. The
    // static dimension side is broadcast, the stream side is stateless
    // — no watermark, no sentinels, no state store: each micro-batch
    // joins and emits, which is why this is the one streaming shape
    // that needs no finalization scaffolding. Row-level output (not an
    // aggregate): every event leaves with its segment attached, the
    // strongest possible equivalence with the batch left join.
    Query("q192_stream_static_join", Some(
      """SELECT e.event_id, e.user_id,
        |  COALESCE(c.c_mktsegment, '<none>') AS segment, e.value
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin))(
      (s, dir) => {
        val staged = t(s, dir, "events").select(
          timestamp_micros(tsUs).as("ts"), col("event_id"),
          col("user_id"), col("value"))
        val dim = t(s, dir, "customer")
        StreamReplay.replay(s, staged, Seq.empty,
            df => EventStream.enriched(df, dim, "user_id", "c_custkey",
                Seq("c_mktsegment"))
              .select(col("event_id"), col("user_id"),
                coalesce(col("c_mktsegment"), lit("<none>")).as("segment"),
                col("value")))
          .orderBy("event_id")
      }),

    // Streaming CDC upsert sink, end to end: the events changelog
    // (q111's op/ord convention — 'error' deletes, latest (tus,
    // event_id) wins) replayed through upsertSnapshotSink's
    // foreachBatch versioned-snapshot machinery, seeded with the
    // customer base as version v=-1 (strictly below the first batch
    // id, so batch 0 folds on top of it exactly like a restarted
    // production sink folds on its last durable version). The final
    // readSnapshot must equal the batch applyChangelog — q111's
    // oracle SQL verbatim — proving the sink's version selection,
    // fold, and read path end to end, not just the fold operator.
    Query("q193_stream_cdc_snapshot", Some(
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
          .select(col("c_custkey").as("user_id"),
            col("c_acctbal").as("bal"))
        val changes = t(s, dir, "events").select(col("user_id"),
          col("value").as("bal"),
          when(col("event_type") === "error", "D").otherwise("U").as("op"),
          tsUs.as("tus"), col("event_id"))
        StreamReplay.replaySink(s, changes,
            (stream, work, ckpt) => {
              base.write.parquet(s"$work/v=-1")
              EventStream.upsertSnapshotSink(stream, work, ckpt,
                "user_id", Seq("tus", "event_id"), "op", deleteOp = "D")
            },
            (sp, work) => EventStream.readSnapshot(sp, work))
          .orderBy("user_id")
      }),

    // Stream-stream interval join, end to end: purchases pair with the
    // same user's clicks in the following hour — the attribution shape
    // — as a REAL two-stream join (both sides watermarked, two-sided
    // time bounds making state evictable; see intervalJoin). Both
    // sides derive from one staged source (the self-join shape the
    // l_/r_ prefixing exists for). Inner-join emission is immediate on
    // match, so no sentinels are needed; the whole span arrives in one
    // event-time-coherent micro-batch.
    Query("q194_stream_interval_join", Some(
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |             event_type
        |           FROM events)
        |SELECT l.user_id, l.event_id AS purchase_id, r.event_id AS click_id,
        |  r.t - l.t AS gap_us
        |FROM e l JOIN e r ON l.user_id = r.user_id
        |  AND l.event_type = 'purchase' AND r.event_type = 'click'
        |  AND r.t >= l.t AND r.t < l.t + 3600000000
        |ORDER BY purchase_id, click_id""".stripMargin))(
      (s, dir) => {
        val staged = t(s, dir, "events").select(
          timestamp_micros(tsUs).as("ts"), col("user_id"),
          col("event_id"), col("event_type"))
        StreamReplay.replay(s, staged, Seq.empty,
            df => {
              val l = df.filter(col("event_type") === "purchase")
                .drop("event_type")
              val r = df.filter(col("event_type") === "click")
                .drop("event_type")
              EventStream.intervalJoin(l, r, "user_id",
                  "0 seconds", "1 hour")
                .select(col("l_user_id").as("user_id"),
                  col("l_event_id").as("purchase_id"),
                  col("r_event_id").as("click_id"),
                  (unix_micros(col("r_ts")) - unix_micros(col("l_ts")))
                    .as("gap_us"))
            })
          .orderBy("purchase_id", "click_id")
      }),

    // Streaming RETRACT-STREAM rollup, end to end — the q226 batch
    // algebra as a REAL streaming maintenance sink: the same CDC set
    // (I/U/D over the events rollup) arrives as THREE micro-batches
    // in a deliberately scrambled order (deletes, then updates, then
    // inserts — not source order), each folded into the versioned
    // snapshot by retractableRollupSink via mergeRetractable, seeded
    // with the pre-stream base rollup as v=-1. Because (count, exact
    // decimal sum) is a group, any batch split of the CDC lands on
    // the identical snapshot — so the final readSnapshot must equal
    // the batch q226 oracle (post-CDC recompute) verbatim, proving
    // the retraction fold, the cross-batch versioned sink, and the
    // batching-insensitivity claim in one hash.
    Query("q232_stream_retractable", Some(
      AnalyticsQueries.retractableOracleSql))(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val base = ev.filter(col("event_id") % 3 =!= 0)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("value").cast("decimal(18,2)")).as("sv"))
        val ins = ev.filter(col("event_id") % 3 === 0)
          .select(col("event_type"), lit("I").as("op"),
            lit(null).cast("double").as("old_value"),
            col("value").as("new_value"))
        val del = ev.filter(col("event_id") % 3 =!= 0 &&
            col("event_id") % 5 === 0)
          .select(col("event_type"), lit("D").as("op"),
            col("value").as("old_value"),
            lit(null).cast("double").as("new_value"))
        val upd = ev.filter(col("event_id") % 3 =!= 0 &&
            col("event_id") % 5 =!= 0 && col("event_id") % 7 === 0)
          .select(col("event_type"), lit("U").as("op"),
            col("value").as("old_value"),
            (col("value") + 10).as("new_value"))
        StreamReplay.replaySink(s, del,
            (stream, work, ckpt) => {
              base.write.parquet(s"$work/v=-1")
              EventStream.retractableRollupSink(stream, work, ckpt,
                Seq("event_type"), "cnt", "sv")
            },
            (sp, work) => EventStream.readSnapshot(sp, work),
            appends = Seq(upd, ins))
          .select(col("event_type"), col("cnt"),
            col("sv").cast("double").as("sum_value"))
          .orderBy("event_type")
      }),

    // Streaming near-dup candidates, end to end — the TENTH replay
    // and the last streaming operator to graduate from spec-only: the
    // q40 clone-planting design run through a REAL two-micro-batch
    // readStream replay. Batch 0 carries the original documents (all
    // absorbed into pigeonhole-bucket state), batch 1 the planted
    // clones (doc_id + 1e6, identical text), so every detection is a
    // CROSS-BATCH state hit: identical text ⇒ identical simhash ⇒ all
    // 4 chunk buckets agree at hamming 0, which is exactly what the
    // oracle demands per planted pair (n_chunks = 4 proves all four
    // pigeonhole routes fired, not just one lucky bucket). Restricted
    // to planted pairs like q40: organic near-dups among originals are
    // DedupSpec's business, not a portable-oracle set.
    Query("q234_stream_neardup", Some(
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
        |  CAST(0 AS INTEGER) AS hamming, CAST(4 AS BIGINT) AS n_chunks
        |FROM documents ORDER BY id_a""".stripMargin))(
      (s, dir) => {
        implicit val sp: SparkSession = s
        import s.implicits._
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val clones = d.select((col("doc_id") + 1000000).as("doc_id"),
          col("text"))
        // the planted-pair restriction runs INSIDE the streaming
        // transform (a stateless post-state filter — no event-time
        // column exists here, so no watermark-pushdown hazard), not on
        // the replayed sink: the raw candidate stream is O(docs ×
        // bucket-members) and at the true-100× rehearsal (1M docs,
        // every text 100×-duplicated by ScaleUp's dedup-stress design)
        // pinning it wholesale via the replay's localCheckpoint
        // exhausted execution memory — the sink a real deployment
        // keeps is whatever its verifier consumes, and the harness's
        // declared result set is exactly the planted pairs
        StreamReplay.replay(s, d, Seq(clones),
            stream => EventStream.streamingNearDupCandidates(
                stream.as[EventStream.Doc]).toDF()
              .filter(col("id_b") === col("id_a") + 1000000))
          .groupBy("id_a", "id_b")
          .agg(min(col("hamming")).as("hamming"),
            countDistinct(col("chunk_idx")).as("n_chunks"))
          .orderBy("id_a")
      }))
}
