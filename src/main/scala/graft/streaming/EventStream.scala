package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the event-log shape
  * (`events` table: event_id, ts, user_id, event_type, value). The
  * reference is strictly batch (SURVEY.md §1.1), so this is the
  * engine's forward-looking stream path: the same windowed aggregation
  * the batch q28 does, plus stateful sessionization — both written
  * against unbounded inputs (watermarks bound state) and equally
  * runnable on a bounded batch frame.
  */
object EventStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class Session(user_id: Long, n_events: Long, total_value: Double,
      started: java.sql.Timestamp, ended: java.sql.Timestamp)

  /** Tumbling-window counts/sums per event type. Watermark bounds
    * window state to `watermark` of lateness — without it a 100 TB/day
    * stream accretes state forever.
    */
  def windowedStats(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_val"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"), col("sum_val"))

  /** STREAMING drift monitor: per-tumbling-window PSI of `valueCol`
    * against a STATIC reference histogram — the online twin of
    * [[graft.operators.Drift.psiTimeline]], for "did this hour's
    * traffic shift?" alerts without a batch job. The reference
    * (`refHist`, one count per bin over [lo, hi)) is bounded driver
    * metadata — nBins longs, typically from
    * `Profiling.histogram(ref, ...)` — baked into the projection as
    * literals, so the stream needs ONE windowed aggregation: per-bin
    * conditional counts roll up map-side into a single row per
    * window (append-mode legal — a bin-then-total plan would need a
    * second agg over an agg, which streaming forbids), and the PSI
    * closed form (same Laplace smoothing and FLOOR rounding as the
    * batch operator) is a per-row projection on that bounded result.
    * Watermark bounds window state.
    */
  def streamingPsi(events: DataFrame, valueCol: String,
      refHist: Seq[Long], lo: Double, hi: Double,
      window_ : String = "1 hour", watermark: String = "2 hours")
      : DataFrame = {
    val nBins = refHist.size
    require(nBins > 0 && hi > lo, s"bad psi config: [$lo, $hi) / $nBins")
    val width = (hi - lo) / nBins
    val bin = least(greatest(floor((col(valueCol) - lo) / width), lit(0)),
      lit(nBins - 1)).cast("int")
    val nRef = refHist.sum
    val binned = events.withWatermark("ts", watermark)
      .filter(col(valueCol).isNotNull)
      .groupBy(window(col("ts"), window_))
      .agg(count(lit(1)).as("n"),
        (0 until nBins).map(i =>
          sum(when(bin === i, 1L).otherwise(0L)).as(s"__c$i")): _*)
    // Per-bin terms as 1e-12 fixed-point LONGS, summed exactly. Not a
    // double reduce (term order / last-bit drift vs the oracle) and
    // NOT a decimal(24,12) addition chain: 20 chained decimal adds
    // blow Spark's precision cap (38) and adjustPrecisionScale sheds
    // scale digits — measured: the chain rounded a window's term sum
    // to SEVEN decimals and flipped the 1e-6 presentation rounding.
    // The batch Drift operators are immune (their decimal sum is one
    // AGGREGATE, which widens precision once); a projection-level sum
    // must use integer arithmetic instead. |term|·1e12 ≤ ~1e11 per
    // bin, so the long sum is exact and the final /1e6 is one
    // correctly-rounded IEEE op both engines agree on.
    val terms = (0 until nBins).map { i =>
      val pr = (refHist(i) + 0.5) / (nRef + 0.5 * nBins)
      val pc = (col(s"__c$i") + 0.5) / (col("n") + 0.5 * nBins)
      floor((pc - lit(pr)) * log(pc / lit(pr)) * 1e12 + 0.5).cast("long")
    }
    val termSum = terms.reduce(_ + _).cast("double")
    binned.select(col("window.start").as("win_start"), col("n"),
      (floor(termSum / 1e6 + 0.5) / 1e6).as("psi"))
  }

  /** STREAMING drift monitor #2: per-tumbling-window Kolmogorov–
    * Smirnov distance of `valueCol` against a STATIC reference CDF,
    * completing the drift family's streaming story next to
    * [[streamingPsi]] (PSI sees density shifts; KS sees location/
    * shape shifts PSI's fixed bins can wash out). The reference is
    * bounded driver metadata: sorted `cutoffs` with cumulative
    * reference counts `refCum` (out of `refN`) — e.g. the batch
    * corpus's distinct values or its percentile grid.
    *
    * The statistic is KS AT THE CUTOFFS: max_i |F_win(c_i) −
    * F_ref(c_i)|. The batch [[graft.operators.Drift.ksStatistic]]
    * evaluates at every distinct value — unbounded evaluation points
    * are exactly what a single append-legal windowed aggregation
    * cannot produce, so the streaming form fixes the evaluation grid
    * up front (when `cutoffs` covers both samples' distinct values
    * the two definitions coincide — the spec pins that equality).
    * Per-cutoff conditional counts roll up map-side into one row per
    * window; the max-of-|diffs| is a projection on that bounded row.
    * Watermark bounds window state. Output per window:
    * (win_start, n, ks) with the house 6-decimal FLOOR rounding.
    */
  def streamingKsAtCutoffs(events: DataFrame, valueCol: String,
      cutoffs: Seq[Double], refCum: Seq[Long], refN: Long,
      window_ : String = "1 hour", watermark: String = "2 hours")
      : DataFrame = {
    require(cutoffs.nonEmpty && cutoffs == cutoffs.sorted &&
      cutoffs.distinct == cutoffs,
      s"cutoffs must be sorted distinct and non-empty: $cutoffs")
    require(refCum.size == cutoffs.size && refN > 0 &&
      refCum.head >= 0 && refCum == refCum.sorted && refCum.last <= refN,
      s"refCum must be non-negative cumulative counts out of refN=$refN: $refCum")
    val agg = events.withWatermark("ts", watermark)
      .filter(col(valueCol).isNotNull)
      .groupBy(window(col("ts"), window_))
      .agg(count(lit(1)).as("n"),
        cutoffs.indices.map(i =>
          sum(when(col(valueCol) <= cutoffs(i), 1L).otherwise(0L))
            .as(s"__le$i")): _*)
    val diffs = cutoffs.indices.map(i =>
      abs(col(s"__le$i").cast("double") / col("n") -
        lit(refCum(i).toDouble / refN)))
    agg.select(col("window.start").as("win_start"), col("n"),
      (floor(diffs.reduce(greatest(_, _)) * 1e6 + 0.5) / 1e6).as("ks"))
  }

  /** Streaming exact dedup: drop events whose key was already seen,
    * with state bounded by the watermark (the streaming twin of
    * `Dedup.exact` — an unbounded-state dedup is impossible on an
    * infinite stream, so "seen" only spans the watermark horizon).
    */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.drop(1): _*)

  /** Stream-static enrichment: join the (unbounded) event stream
    * against a bounded dimension frame — the canonical "attach user/
    * customer attributes at ingest" step. The static side is
    * broadcast (dimensions are bounded metadata at any scale), so the
    * stream side stays shuffle-free and stateless: no watermark is
    * needed because a stream-static inner/left join holds NO stream
    * state — each micro-batch joins and emits. Works identically on a
    * bounded batch frame (the batch/stream unification contract).
    */
  def enriched(events: DataFrame, dim: DataFrame, eventKey: String,
      dimKey: String, dimCols: Seq[String]): DataFrame =
    events.join(
      broadcast(dim.select((dimKey +: dimCols).map(col): _*)),
      events(eventKey) === dim(dimKey), "left")
      .drop(dim(dimKey))

  /** Stream-stream interval join: each left event pairs with the right
    * events of the same key whose timestamp falls in
    * `[left.ts + lowerOffset, left.ts + upperOffset)` — the streaming
    * twin of the batch `Temporal.rangeJoinPairs` (purchase↔click
    * attribution, error-burst context, impression↔conversion). BOTH
    * sides carry watermarks and the join condition time-bounds each
    * side against the other, which is what lets Structured Streaming
    * evict buffered state: without the two range bounds the join would
    * buffer both streams forever. Columns are prefixed (`l_`/`r_`) so
    * the self-join of one source stream is expressible. `tsCol` names
    * each side's event-time column (both sides must carry it).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      lowerOffset: String, upperOffset: String,
      tsCol: String = "ts", watermark: String = "2 hours"): DataFrame = {
    val l = left.columns.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"l_$c"))
      .withWatermark(s"l_$tsCol", watermark)
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
      .withWatermark(s"r_$tsCol", watermark)
    l.join(r,
      col(s"l_$key") === col(s"r_$key") &&
        col(s"r_$tsCol") >= col(s"l_$tsCol") + expr(s"INTERVAL $lowerOffset") &&
        col(s"r_$tsCol") < col(s"l_$tsCol") + expr(s"INTERVAL $upperOffset"))
  }

  /** Append-mode partitioned parquet sink for a streaming frame — the
    * durable end of the stream path: finalized rows (e.g. closed
    * windows from [[windowedStats]], whose watermark makes append mode
    * legal) land as parquet under one directory per partition-column
    * value, exactly the [[graft.sources.Layout]] shape batch queries
    * partition-prune against. Checkpointing makes the sink
    * exactly-once across restarts.
    */
  def toPartitionedParquet(df: DataFrame, path: String, checkpoint: String,
      partitionCols: Seq[String]): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy(partitionCols: _*)
      .outputMode(OutputMode.Append)
      .start()

  /** Streaming CDC apply: maintain a latest-wins key snapshot from a
    * changelog stream by folding every micro-batch through
    * [[graft.operators.Temporal.applyChangelog]] (foreachBatch — the
    * batch operator IS the streaming operator). Snapshots are written
    * as versioned directories `v=<batchId>` and readers take the max
    * version ([[readSnapshot]]): the previous version is never
    * overwritten while being read, and a replayed batch (restart
    * between write and checkpoint commit) rewrites ITS OWN version —
    * idempotent, so the sink stays exactly-once without a
    * transactional table format. Old versions are pruned to
    * `keepVersions` AFTER the new one lands.
    */
  def upsertSnapshotSink(changes: DataFrame, path: String,
      checkpoint: String, keyCol: String, ordCols: Seq[String],
      opCol: String, deleteOp: String, keepVersions: Int = 2)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // >= 2, not >= 1: the prune runs before the checkpoint commit, so
    // with keepVersions = 1 a crash in that window deletes every
    // version below v=N and the replay of batch N finds no
    // strictly-below base — it would silently rebuild the snapshot
    // from that single batch, dropping all previously upserted keys.
    require(keepVersions >= 2, s"keepVersions must be >= 2, got $keepVersions")
    val valCols = changes.columns.toSeq
      .filterNot(c => c == opCol || ordCols.contains(c))
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // base = the newest version STRICTLY BELOW this batch id — not
        // the newest overall: a batch replayed after a crash between
        // its write and the checkpoint commit would otherwise read its
        // own half-landed v=<batchId> as the base AND overwrite it in
        // the same job (Spark refuses, wedging the stream on every
        // restart). Strictly-below makes the replay recompute from the
        // same base as the first attempt — byte-identical output,
        // true idempotence.
        val base = versionsOf(spark, path).filter(_ < batchId).sorted
          .lastOption match {
          case Some(v) => spark.read.parquet(s"$path/v=$v")
          case None => batch.select(valCols.map(col): _*).limit(0)
        }
        graft.operators.Temporal
          .applyChangelog(base, batch, keyCol, ordCols, opCol, deleteOp)
          .write.mode("overwrite").parquet(s"$path/v=$batchId")
        // prune AFTER the new version is durable; never the newest
        versionsOf(spark, path).sorted.dropRight(keepVersions).foreach { v =>
          val p = new org.apache.hadoop.fs.Path(s"$path/v=$v")
          p.getFileSystem(spark.sessionState.newHadoopConf())
            .delete(p, true)
        }
      }
      .start()
  }

  /** Streaming RETRACT-STREAM rollup sink — Flink's retraction model
    * on Structured Streaming via exact batch group algebra: each
    * micro-batch of CDC rows (`opCol` 'I'/'U'/'D' with old/new
    * measure values) folds into the persisted per-key (count, sum)
    * rollup through
    * [[graft.operators.Incremental.mergeRetractable]] (foreachBatch —
    * the batch operator IS the streaming operator, the
    * [[upsertSnapshotSink]] convention, including the versioned
    * `v=<batchId>` directories, strictly-below base selection for
    * replay idempotence, and prune-after-land). Because counts and
    * exact decimal sums form a GROUP (every op has an exact inverse),
    * the fold is order- AND batching-insensitive: any micro-batch
    * split of the same CDC set lands on the identical snapshot —
    * the property that makes a retraction sink exactly-once without a
    * transactional table format. Emptied groups vanish per merge and
    * reappear when a later batch re-inserts them. Seed state (the
    * pre-stream rollup) goes in as `v=-1` before the query starts,
    * exactly like [[upsertSnapshotSink]] deployments seed their base.
    */
  def retractableRollupSink(cdc: DataFrame, path: String,
      checkpoint: String, keys: Seq[String], cntCol: String,
      sumCol: String, opCol: String = "op", oldCol: String = "old_value",
      newCol: String = "new_value", keepVersions: Int = 2)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // >= 2 for the same crash-window reason as upsertSnapshotSink
    require(keepVersions >= 2, s"keepVersions must be >= 2, got $keepVersions")
    cdc.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val base = versionsOf(spark, path).filter(_ < batchId).sorted
          .lastOption match {
          case Some(v) => spark.read.parquet(s"$path/v=$v")
          case None => // empty rollup in the merged-output schema
            batch.select(keys.map(col) :+ lit(0L).as(cntCol) :+
              lit(null).cast("decimal(18,2)").as(sumCol): _*).limit(0)
        }
        graft.operators.Incremental
          .mergeRetractable(base, batch, keys, cntCol, sumCol,
            opCol, oldCol, newCol)
          .write.mode("overwrite").parquet(s"$path/v=$batchId")
        versionsOf(spark, path).sorted.dropRight(keepVersions).foreach { v =>
          val p = new org.apache.hadoop.fs.Path(s"$path/v=$v")
          p.getFileSystem(spark.sessionState.newHadoopConf())
            .delete(p, true)
        }
      }
      .start()
  }

  private def versionsOf(spark: SparkSession, path: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
  }

  private def latestVersion(spark: SparkSession,
      path: String): Option[Long] =
    versionsOf(spark, path).sorted.lastOption

  /** Read the current snapshot maintained by [[upsertSnapshotSink]]. */
  def readSnapshot(spark: SparkSession, path: String): DataFrame =
    latestVersion(spark, path) match {
      case Some(v) => spark.read.parquet(s"$path/v=$v")
      case None => throw new IllegalArgumentException(
        s"no snapshot versions under $path")
    }

  /** Inactivity-gap sessionization via flatMapGroupsWithState: a
    * session closes when a user is silent for `gap`. Event-time
    * processing with per-group state — the canonical custom-state
    * streaming operator (KeyValueGroupedDataset surface).
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L)(
      implicit s: SparkSession): Dataset[Session] = {
    import s.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Event], Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[List[Event]]) =>
          val incoming = it.toList.sortBy(e => (e.ts.getTime, e.event_id))
          if (state.hasTimedOut) {
            val buf = state.getOption.getOrElse(Nil)
            state.remove()
            closedSessions(userId, buf, gapMs, flushAll = true).iterator
          } else {
            val buf = (state.getOption.getOrElse(Nil) ++ incoming)
              .sortBy(e => (e.ts.getTime, e.event_id))
            val (closed, open) = splitSessions(buf, gapMs)
            state.update(open)
            if (open.nonEmpty)
              state.setTimeoutTimestamp(open.last.ts.getTime + gapMs)
            closed.map(mkSession(userId, _)).iterator
          }
      }
  }

  /** Event shape for the ORACLE-GRADE streaming sessionization (q184):
    * `ts` (timestamp) exists solely for the watermark; all session
    * arithmetic runs on `ts_us` (µs-epoch long — `java.sql.Timestamp`
    * would silently truncate sub-ms gaps in the state machine) and
    * `cents` (exact decimal(18,2)·100 — double summation order could
    * otherwise diverge from the oracle's decimal sum in the last bit).
    */
  final case class UsEvent(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, ts_us: Long, cents: Long)

  final case class UsSession(user_id: Long, n_events: Long,
      start_us: Long, end_us: Long, sum_val: Double)

  /** Exact-arithmetic streaming sessionization — the q184 engine: the
    * same inactivity-gap state machine as [[sessionize]], but µs-exact
    * (gap compares µs longs, never ms-truncated Timestamps) and
    * cents-exact (Long sum ≡ the oracle's DECIMAL(18,2) sum), so a
    * bounded replay hash-matches the batch q62 DuckDB oracle bit for
    * bit. Rows with `user_id < 0` are watermark-advancing sentinels:
    * they are dropped INSIDE the state function — NOT with a filter
    * between `withWatermark` and `groupByKey`, because Catalyst pushes
    * predicates that don't reference the event-time column BELOW the
    * EventTimeWatermark node, which would drop the sentinels before
    * their event times ever advance the watermark (measured: the last
    * open sessions never flushed). Inside the function nothing is
    * pushable, so a replay can flush every open session through the
    * event-time timeout without fabricating sessions.
    */
  def sessionizeExact(events: Dataset[UsEvent], gapUs: Long,
      watermark: String = "2 hours")(
      implicit s: SparkSession): Dataset[UsSession] = {
    import s.implicits._
    val gapMs = gapUs / 1000L
    def mk(userId: Long, es: List[(Long, Long, Long)]): UsSession =
      UsSession(userId, es.length.toLong, es.head._1, es.last._1,
        es.map(_._3).sum.toDouble / 100.0)
    // gap-split the sorted buffer into sessions. Members PREPEND and
    // each group reverses ONCE at the end — linear in buffer length.
    // The previous `cur :+ e` / `cur.last` fold was O(session²): fine
    // for ordinary entities (sessions are short), pathological for a
    // hot one — the r14 skew rehearsal's 30%-hot user put 3M events
    // in ONE session and the fold became ~10¹² list traversals, a
    // hang that read as "streaming can't take skew" when it was just
    // an accidentally-quadratic append.
    def split(buf: List[(Long, Long, Long)])
        : (List[List[(Long, Long, Long)]], List[(Long, Long, Long)]) = {
      if (buf.isEmpty) return (Nil, Nil)
      var acc: List[List[(Long, Long, Long)]] = Nil
      var lastTs = Long.MinValue
      buf.foreach { e =>
        if (acc.nonEmpty && e._1 - lastTs <= gapUs)
          acc = (e :: acc.head) :: acc.tail
        else acc = List(e) :: acc
        lastTs = e._1
      }
      val groups = acc.reverse.map(_.reverse)
      (groups.init, groups.last)
    }
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[(Long, Long, Long)], UsSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[UsEvent],
            state: GroupState[List[(Long, Long, Long)]]) =>
          if (userId < 0) {
            it.foreach(_ => ()) // sentinel group: advance-only, no state
            Iterator.empty
          } else if (state.hasTimedOut) {
            val buf = state.getOption.getOrElse(Nil)
            state.remove()
            val (closed, open) = split(buf)
            (closed ++ (if (open.nonEmpty) List(open) else Nil))
              .map(mk(userId, _)).iterator
          } else {
            val incoming = it.map(e => (e.ts_us, e.event_id, e.cents)).toList
            val buf = (state.getOption.getOrElse(Nil) ++ incoming)
              .sortBy(t => (t._1, t._2))
            val (closed, open) = split(buf)
            state.update(open)
            if (open.nonEmpty)
              // timeout must sit strictly above the current watermark
              // (Spark rejects it otherwise when a batch arrives after
              // the watermark already passed the session's horizon)
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1,
                open.last._1 / 1000L + gapMs + 1))
            closed.map(mk(userId, _)).iterator
          }
      }
  }

  final case class Doc(doc_id: Long, text: String)

  final case class DupCandidate(id_a: Long, id_b: Long, hamming: Int,
      chunk_idx: Int)

  /** STREAMING near-duplicate candidate detection — the online twin of
    * the batch SimHash pipeline (Dedup.simhashNearDupPairs): each
    * arriving document is fingerprinted with the same `simhash64`
    * expression, routed to `maxHamming + 1` pigeonhole chunk buckets,
    * and compared ONLY against the fingerprints already seen in those
    * buckets (per-group state) — any pair within the hamming budget
    * agrees exactly on ≥ 1 chunk, so recall matches the batch
    * operator while each doc touches `chunks` state cells, never the
    * corpus. Emits one candidate row per matching (pair, chunk);
    * consumers `distinct()` on (id_a, id_b) — id_a is always the
    * EARLIER document (within a batch, the smaller doc_id).
    *
    * State per bucket is the (fingerprint, id) list, capped at
    * `maxBucket` members: a degenerate chunk value (the streaming form
    * of the batch operator's hot-bucket guard) stops absorbing members
    * instead of growing without bound. Deployments bound bucket COUNT
    * with an event-time TTL on the state (the sessionize pattern);
    * the operator itself is time-agnostic.
    */
  def streamingNearDupCandidates(docs: Dataset[Doc], maxHamming: Int = 3,
      maxBucket: Int = 1000)(
      implicit s: SparkSession): Dataset[DupCandidate] = {
    import s.implicits._
    require(maxHamming >= 0 && 64 % (maxHamming + 1) == 0,
      s"maxHamming + 1 must divide 64, got ${maxHamming + 1}")
    val chunks = maxHamming + 1
    val width = 64 / chunks
    // Java shifts are mod 64: 1L << 64 wraps to 1, making the mask 0
    // (the batch twin's guard) — maxHamming = 0 means one full-width
    // chunk, whose mask is all ones
    val mask = if (width >= 64) -1L else (1L << width) - 1
    val keyed = docs
      .select(col("doc_id"),
        graft.functions.VectorExprs.simhash64(
          graft.operators.TextAnalysis.wsTokens(lower(col("text"))))
          .as("fp"))
      .select(col("doc_id"), col("fp"),
        // unsigned shift, matching the batch twins (fingerprint/simhash
        // near-dup): the AND mask makes them coincide today, but an
        // arithmetic shift would diverge if a top chunk were ever not
        // fully mask-covered
        posexplode(array((0 until chunks).map(c =>
          shiftrightunsigned(col("fp"), c * width).bitwiseAND(lit(mask))): _*))
          .as(Seq("chunk_idx", "chunk_val")))
      .as[(Long, Long, Int, Long)]
    keyed
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[List[(Long, Long)], DupCandidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((ci, _), it, state) =>
          // smaller ids first so id_a < id_b holds within a batch too
          val incoming = it.toList.sortBy(_._1)
          var seen = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[DupCandidate]
          incoming.foreach { case (id, fp, _, _) =>
            if (seen.sizeIs < maxBucket) {
              seen.foreach { case (fpOld, idOld) =>
                val h = java.lang.Long.bitCount(fpOld ^ fp)
                if (h <= maxHamming && idOld != id)
                  out += DupCandidate(idOld, id, h, ci)
              }
              seen = (fp, id) :: seen
            }
          }
          state.update(seen)
          out.result().iterator
      }
  }

  /** STREAMING substring-level contamination screen — the online twin
    * of the batch winnow-index probe (Dedup.substringDupAgainstIndex):
    * per arriving document, how much of its text already exists in the
    * indexed corpus at substring grain (is tonight's crawl re-crawled
    * text?).
    *
    * Design for an unbounded stream: the corpus side collapses to a
    * BLOOM FILTER of the index's anchor grams, built once at plan time
    * (driver-side bounded metadata, the q75 bloom-decontamination
    * pattern — sketch types have no expression form, so the probe is
    * the repo's documented-bounded UDF use) and shipped in the
    * predicate closure. The screen itself is then a narrow STATELESS
    * projection — no stream-static join, no shuffle, no state store,
    * append mode — each doc pays one winnow pass plus `n_grams` bloom
    * probes. Bloom filters have no false negatives, so a full
    * re-crawl screens at hit_frac exactly 1.0; `fpp` bounds the
    * overcount on genuinely novel grams, the usual sketch trade.
    *
    * Output per document (append): (doc_id, n_grams, n_hit_grams,
    * hit_frac floor-rounded to 6 decimals); documents shorter than k
    * codepoints carry no anchors and emit nothing, matching the batch
    * twin's inner-join contract.
    */
  def streamingSubstringScreen(docs: Dataset[Doc], indexTable: String,
      k: Int = 8, w: Int = 4, fpp: Double = 0.001)(
      implicit s: SparkSession): DataFrame = {
    val idx = s.table(indexTable)
    // sizing floor: at a tiny expected count the bitmap is a few
    // hundred bits and real fpp lands far above the requested one
    // (measured: a 12-gram index fired a false positive at 1e-6);
    // 10k is still a trivially small filter, and real corpus indexes
    // sit far above the floor anyway
    val nGrams = math.max(idx.count(), 10000L)
    val bf = idx.stat.bloomFilter("gram", nGrams, fpp)
    val bloomHits = udf((gs: Seq[String]) => gs.count(bf.mightContain))
    docs
      .select(col("doc_id"), array_distinct(
        graft.functions.WinnowExprs.winnowGrams(col("text"), k, w))
        .as("__g"))
      .filter(size(col("__g")) > 0)
      .select(col("doc_id"),
        size(col("__g")).cast("long").as("n_grams"),
        bloomHits(col("__g")).cast("long").as("n_hit_grams"))
      .withColumn("hit_frac",
        floor(col("n_hit_grams").cast("double") / col("n_grams") * 1e6)
          / 1e6)
  }

  /** Split time-ordered events into closed sessions (gap exceeded
    * before a successor) and the still-open tail.
    */
  private def splitSessions(buf: List[Event], gapMs: Long): (List[List[Event]], List[Event]) = {
    // prepend + single reverse, not `cur :+ e` / `cur.last` — the
    // append form is O(session²) and hangs on a hot entity whose whole
    // history is one session (see sessionizeExact.split)
    if (buf.isEmpty) return (Nil, Nil)
    var acc: List[List[Event]] = Nil
    var lastMs = Long.MinValue
    buf.foreach { e =>
      if (acc.nonEmpty && e.ts.getTime - lastMs <= gapMs)
        acc = (e :: acc.head) :: acc.tail
      else acc = List(e) :: acc
      lastMs = e.ts.getTime
    }
    val groups = acc.reverse.map(_.reverse)
    (groups.init, groups.last)
  }

  private def closedSessions(userId: Long, buf: List[Event], gapMs: Long,
      flushAll: Boolean): List[Session] = {
    val (closed, open) = splitSessions(buf, gapMs)
    (closed ++ (if (flushAll && open.nonEmpty) List(open) else Nil))
      .map(mkSession(userId, _))
  }

  private def mkSession(userId: Long, es: List[Event]): Session =
    Session(userId, es.length.toLong, es.map(_.value).sum,
      es.head.ts, es.last.ts)
}
