package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join/segmentation operators over event-time longs —
  * the event-log surface beyond plain windows (extended inventory,
  * SURVEY.md §2.10): as-of joins (latest-state enrichment), bounded
  * range joins (burst/context windows), and batch sessionization (the
  * batch twin of streaming EventStream.sessionize).
  *
  * All three are designed for the 100 TB shape:
  *   - asOfJoin is the UNION + running-window form — ONE shuffle of
  *     both inputs on the key, no join explosion, no per-probe scan of
  *     the event history (the naive `t2 <= t1` theta-join is quadratic
  *     per key and unrunnable at scale).
  *   - rangeJoinPairs buckets event time into interval-width bins so
  *     the non-equi time predicate becomes an equi-join on (key, bin)
  *     plus an exact residual filter — each probe expands to at most
  *     ceil(len/bin)+1 bins (2 when len == bin), each event to exactly
  *     one, so the join is linear in matches, never corpus × corpus.
  *   - sessionize is two bounded per-key windows (lag + running sum) —
  *     state per key is one row, the same bound the streaming twin
  *     keeps with watermarks.
  *
  * Timestamps are taken as comparable longs (the events table reads
  * its TIMESTAMP(NANOS) column as ns-epoch longs — Tables.scala); any
  * monotone encoding works.
  */
object Temporal {

  /** As-of join: for each probe row, the single LATEST event row of the
    * same key with `event.tCol <= probe.tCol`, appending the event's
    * `payload` columns (null when the key has no event at or before the
    * probe time).
    *
    * Equal-time ties resolve deterministically: an event AT the probe
    * time is visible (<=, events sort before probes at the same
    * instant), and among events sharing (key, t) the one with the
    * greatest `eventTie` wins. Payload columns travel as ONE struct so
    * they always come from the same event row, even when individual
    * payload fields are null.
    */
  /** Merge overlapping (or touching) per-key intervals into maximal
    * islands — interval-union coverage (the gaps-and-islands kernel):
    * user activity windows, lease/hold spans, retention coverage —
    * anywhere raw spans double-count time until unioned.
    *
    * Island detection is the running-max form: an interval starts a
    * NEW island iff its start exceeds the max end of every earlier
    * interval in its key (strictly — touching spans merge), and the
    * island id is the running count of such starts. Both windows
    * partition on the key, so the whole operator is one key-shuffle
    * + two per-key window passes + one partial-agg group-by —
    * per-key parallel, no global window, scale-safe as long as no
    * single key holds a partition-breaking share of rows (the q62
    * sessionize posture).
    *
    * `sCol`/`eCol` must be longs (any monotone encoding; ns here).
    * Output: (key, island, start, end, n_spans) — end is the island's
    * max end, islands number 1.. per key in start order.
    */
  def mergeIntervals(df: DataFrame, keyCol: String, sCol: String,
      eCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(sCol), col(eCol),
      col(tieCol))
    val prevMax = max(col(eCol)).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    val isNew = when(prevMax.isNull || col(sCol) > prevMax, 1)
      .otherwise(0)
    df.withColumn("__nw", isNew)
      .withColumn("island", sum(col("__nw")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(sCol)).as("start"), max(col(eCol)).as("end"),
        count(lit(1)).as("n_spans"))
  }

  def asOfJoin(probes: DataFrame, events: DataFrame,
      probeKey: String, eventKey: String,
      probeT: String, eventT: String, eventTie: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asOfJoin needs at least one payload column")
    val probeCols = probes.columns.toSeq
    val payStruct = struct(payload.map(col): _*)
    val payType = events.select(payStruct).schema.head.dataType
    val probeStruct = struct(probeCols.map(col): _*)
    val probeType = probes.select(probeStruct).schema.head.dataType

    val probeSide = probes.select(
      col(probeKey).as("__k"), col(probeT).as("__t"),
      lit(1).as("__p"), lit(Long.MaxValue).as("__tie"),
      lit(null).cast(payType).as("__pay"),
      probeStruct.as("__probe"))
    val eventSide = events.select(
      col(eventKey).as("__k"), col(eventT).as("__t"),
      lit(0).as("__p"), col(eventTie).cast("long").as("__tie"),
      payStruct.as("__pay"),
      lit(null).cast(probeType).as("__probe"))

    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__p"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probeSide.unionAll(eventSide)
      .withColumn("__last", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__p") === 1)
      .select(probeCols.map(c => col("__probe").getField(c).as(c)) ++
        payload.map(c => col("__last").getField(c).as(c)): _*)
  }

  /** Range join: all (probe, event) pairs with equal keys and
    * `event.tCol` in the half-open interval
    * `[probe.tCol + lowerOffset, probe.tCol + upperOffset)`.
    * Returns the probe columns plus the event columns renamed through
    * `eventOut` (which also selects which event columns survive).
    *
    * The time predicate is bucketized: events land in exactly one
    * bin of width (upper - lower); each probe interval spans at most
    * two consecutive bins, generated WITHOUT a quadratic expansion via
    * `sequence` + explode. The residual exact filter runs only on
    * (key, bin) matches.
    */
  def rangeJoinPairs(probes: DataFrame, events: DataFrame,
      probeKey: String, eventKey: String,
      probeT: String, eventT: String,
      lowerOffset: Long, upperOffset: Long,
      eventOut: Seq[(String, String)]): DataFrame = {
    require(upperOffset > lowerOffset,
      s"empty interval: [$lowerOffset, $upperOffset)")
    val width = upperOffset - lowerOffset
    val probeCols = probes.columns.toSeq

    // event bin: one per event. `div` (integer division) keeps the
    // arithmetic exact — ns-epoch longs exceed double's 2^53 mantissa.
    val ev = events.select(
      eventOut.map { case (from, to) => col(from).as(to) } :+
        col(eventKey).as("__ek") :+ col(eventT).as("__et"): _*)
      .withColumn("__bin", expr(s"__et div ${width}L"))

    // probe bins: every bin the interval [start, end) touches.
    val pr = probes
      .withColumn("__start", col(probeT) + lit(lowerOffset))
      .withColumn("__end", col(probeT) + lit(upperOffset))
      .withColumn("__bin",
        explode(sequence(expr(s"__start div ${width}L"),
          expr(s"(__end - 1) div ${width}L"))))

    pr.join(ev, pr("__bin") === ev("__bin") &&
        col(probeKey) === col("__ek") &&
        col("__et") >= col("__start") && col("__et") < col("__end"))
      .select(probeCols.map(col) ++ eventOut.map(p => col(p._2)): _*)
  }

  /** Batch gap-based sessionization: appends `session_idx` (1-based per
    * key) — a new session starts when the gap from the previous event
    * of the same key exceeds `gap`. `tieCol` makes equal-time ordering
    * deterministic. The batch twin of the streaming
    * `EventStream.sessionize` (same gap rule, full-history input).
    */
  def sessionize(df: DataFrame, keyCol: String, tCol: String,
      tieCol: String, gap: Long, outCol: String = "session_idx"): DataFrame = {
    val order = Window.partitionBy(keyCol).orderBy(col(tCol), col(tieCol))
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev", lag(col(tCol), 1).over(order))
      .withColumn("__start",
        when(col("__prev").isNull || col(tCol) - col("__prev") > gap, 1L)
          .otherwise(0L))
      .withColumn(outCol, sum(col("__start")).over(running))
      .drop("__prev", "__start")
  }

  /** Resample to a fixed-width time grid with forward fill — the
    * gap-filling reshape every time-series consumer (charting, feature
    * windows, state reconstruction) needs: per key, one row per
    * `width`-sized bucket from the key's first to its last observation,
    * observed aggregates where data exists, and the listed aggregate
    * columns carried forward (`<c>_ff`) across empty buckets.
    *
    * Scale shape: the aggregate frame (one row per OBSERVED (key,
    * bucket)) is built first — a partial-aggregated shuffle — and the
    * spine is generated FROM it (min/max bucket per key + `sequence`
    * explode), so the raw input is scanned exactly once and the spine
    * never joins against raw rows. The explode is bounded per key by
    * the key's own time span in buckets; the fill is a running window
    * on the same key partitioning the spine join just produced.
    * `tCol` must be a long (any monotone encoding — see object doc).
    */
  def resampleFill(df: DataFrame, keyCol: String, tCol: String, width: Long,
      aggs: Seq[Column], fillCols: Seq[String]): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    require(aggs.nonEmpty, "resampleFill needs at least one aggregate")
    // FLOOR division, not `div` (truncate-toward-zero): with negative
    // encodings (pre-1970 epochs) truncation would give bucket 0 double
    // width and shift every negative observation one bucket high —
    // diverging from SQL `//` floor semantics. Exact in the long
    // domain (no double round-trip: ns-epochs exceed 2^53).
    val tdiv = expr(s"`$tCol` div ${width}L")
    val bucketed = df.withColumn("__bkt",
      when(expr(s"`$tCol` % ${width}L") < 0, tdiv - 1).otherwise(tdiv))
    val observed = bucketed.groupBy(col(keyCol), col("__bkt"))
      .agg(aggs.head, aggs.tail: _*)
    val spine = observed.groupBy(col(keyCol))
      .agg(min(col("__bkt")).as("__b0"), max(col("__bkt")).as("__b1"))
      .select(col(keyCol),
        explode(sequence(col("__b0"), col("__b1"))).as("__bkt"))
    val joined = spine.join(observed, Seq(keyCol, "__bkt"), "left")
    val w = Window.partitionBy(keyCol).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(joined)((acc, c) =>
        acc.withColumn(s"${c}_ff", last(col(c), ignoreNulls = true).over(w)))
      .withColumnRenamed("__bkt", "bucket")
  }

  /** Ordered-funnel step times: for each key, the earliest time it
    * completed each step of `steps` IN ORDER — step i counts only
    * strictly after the key's step-(i−1) time (the standard
    * conversion-funnel semantics: a purchase before the click doesn't
    * count), and, when `maxGap` is set, no later than step-(i−1)'s
    * time + maxGap (the attribution window: a conversion a month
    * after the click doesn't attribute). Returns one row per key with
    * one nullable `t_<name>` column per step; a null means the funnel
    * stopped there.
    *
    * One shuffle on the key: the per-step earliest times are stacked
    * conditional window minima over the SAME partitioning (each
    * referencing the previous step's column), and the final
    * per-key reduction reuses that partitioning — aggregating the
    * already-constant columns instead of re-sorting.
    */
  def funnel(df: DataFrame, keyCol: String, tCol: String,
      steps: Seq[(String, Column)],
      maxGap: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGap.forall(_ > 0), s"maxGap must be positive: $maxGap")
    val wu = Window.partitionBy(keyCol)
    val stepped = steps.zipWithIndex.foldLeft(df) {
      case (acc, ((name, pred), i)) =>
        val prev = if (i == 0) lit(null) else col(s"t_${steps(i - 1)._1}")
        val inWindow = maxGap match {
          case Some(g) if i > 0 => col(tCol) <= prev + g
          case _ => lit(true)
        }
        val gate =
          if (i == 0) pred
          else pred && col(tCol) > prev && inWindow
        acc.withColumn(s"t_$name",
          min(when(gate, col(tCol))).over(wu))
    }
    stepped.groupBy(col(keyCol))
      .agg(min(col(s"t_${steps.head._1}")).as(s"t_${steps.head._1}"),
        steps.tail.map(s => min(col(s"t_${s._1}")).as(s"t_${s._1}")): _*)
  }

  /** CDC merge: apply a changelog of upserts/deletes to a base
    * snapshot, latest change wins. `changes` carries `opCol` (rows
    * equal to `deleteOp` delete the key) and is ordered per key by
    * `ordCols` (make the last one unique for a deterministic winner);
    * every non-key column of `base` must exist in `changes`. A key's
    * base row participates as the oldest version, so untouched keys
    * survive and a delete-then-nothing key disappears.
    *
    * One shuffle: base and changes union into a single per-key
    * row_number window (changes outrank base via a priority column,
    * newest first), keep rank 1, drop winners that are deletes. This
    * is the merge/upsert primitive of every snapshot-maintenance
    * pipeline, shaped so a 100 TB base is never joined — just
    * co-shuffled once with the (usually much smaller) delta.
    */
  def applyChangelog(base: DataFrame, changes: DataFrame, keyCol: String,
      ordCols: Seq[String], opCol: String, deleteOp: String): DataFrame = {
    val vals = base.columns.filterNot(_ == keyCol).toSeq
    val missing = (vals ++ Seq(opCol) ++ ordCols)
      .filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changes is missing columns: ${missing.mkString(", ")}")
    val ordSchema = changes.select(ordCols.map(col): _*).schema
    val c = changes.select(
      (keyCol +: vals).map(col) ++
        Seq(col(opCol).cast("string").as("__op"), lit(1).as("__pri")) ++
        ordCols.map(col): _*)
    val b = base.select(
      (keyCol +: vals).map(col) ++
        Seq(lit("__base").as("__op"), lit(0).as("__pri")) ++
        ordSchema.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__pri").desc +: ordCols.map(col(_).desc): _*)
    c.unionAll(b)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("__op") =!= deleteOp)
      .select((keyCol +: vals).map(col): _*)
  }

  /** SCD2 history build: collapse a per-key change stream into
    * validity intervals [valid_from, valid_to) over the tracked
    * `attrCols` — consecutive records with unchanged attributes merge
    * into one interval; the current version has valid_to null. `tieCol`
    * disambiguates equal times (among same-instant records the greatest
    * tie wins the instant — its predecessor gets a zero-width
    * interval, preserving the full audit trail).
    *
    * Two stacked windows on one key partitioning: a lag comparison
    * (struct-compared, null-safe) keeps only change points, then lead
    * over the SURVIVORS closes each interval at the next change.
    * `tieCol` survives into the output: it is the record's identity
    * within a same-instant group, and downstream as-of consumers (the
    * point-in-time join) need it to resolve the instant the same way
    * this history did.
    */
  def scd2(df: DataFrame, keyCol: String, tCol: String, tieCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2 needs at least one tracked attribute")
    val order = Window.partitionBy(keyCol).orderBy(col(tCol), col(tieCol))
    val attrs = struct(attrCols.map(col): _*)
    df.withColumn("__prev", lag(attrs, 1).over(order))
      .filter(col("__prev").isNull || !(col("__prev") <=> attrs))
      .withColumn("valid_from", col(tCol))
      .withColumn("valid_to", lead(col(tCol), 1).over(order))
      .select(col(keyCol) +: col(tieCol) +: attrCols.map(col) :+
        col("valid_from") :+ col("valid_to"): _*)
  }

  /** Time-weighted average of an observed value per key — the honest
    * mean of a sampled signal with irregular observation times (a
    * row-mean over-weights bursts; TWAP weights each observation by
    * how long it was current). Each value holds from its timestamp
    * (`tCol`, integer µs, ties broken by `tieCol`) until the key's
    * next observation; the final observation has no successor and
    * carries zero weight — the last-interval policy is declared, not
    * hidden. Keys with a single observation produce no output row;
    * keys whose observations all share one instant yield a null twap
    * (zero total weight).
    *
    * One key-partitioned lead window (no self-join), then one keyed
    * aggregation. value × µs products go through exact decimal sums
    * so partial-agg order can't drift the quotient; the divide is one
    * double op, floor-rounded to 6 decimals (engine-portable at .5
    * boundaries).
    */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tCol: String,
      tieCol: String, vCol: String): DataFrame = {
    val order = Window.partitionBy(keyCol).orderBy(col(tCol), col(tieCol))
    val wgt = lead(col(tCol), 1).over(order) - col(tCol)
    df.select(col(keyCol), col(tCol), col(tieCol), col(vCol))
      .withColumn("__w", wgt)
      .filter(col("__w").isNotNull)
      .groupBy(keyCol)
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("__w")).as("span_us"),
        (floor(
          sum((col(vCol) * col("__w")).cast("decimal(30,6)")).cast("double")
            / sum(col("__w")).cast("double") * 1e6 + 0.5) / 1e6)
          .as("twap"))
  }

  /** Exponentially time-decayed aggregate per key: each observation
    * weighs exp(−ln2 · (horizon − t)/halfLifeUs) — half its weight
    * every half-life back from the global horizon (max time) — and the
    * decayed sum/count are the recency-weighted engagement features.
    * Each term quantizes to integer micro-units BEFORE the keyed sum,
    * so partial-agg order can't drift the total (float sums are not
    * associative) and the oracle sums identical integers. One agg for
    * the horizon (broadcast), one map-side-combined keyed agg.
    * Output: (key, n_events, decayed_sum, decayed_n).
    */
  def decayAgg(df: DataFrame, keyCol: String, tCol: String, vCol: String,
      halfLifeUs: Long): DataFrame = {
    require(halfLifeUs > 0, s"halfLifeUs must be positive: $halfLifeUs")
    val horizon = df.agg(max(col(tCol)).as("__hz"))
    val w = exp(lit(-math.log(2.0)) *
      ((col("__hz") - col(tCol)).cast("double") / halfLifeUs.toDouble))
    df.crossJoin(broadcast(horizon))
      .select(col(keyCol),
        floor(col(vCol) * w * 1e6 + 0.5).cast("long").as("__v6"),
        floor(w * 1e6 + 0.5).cast("long").as("__w6"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_events"),
        (sum(col("__v6")).cast("double") / 1e6).as("decayed_sum"),
        (sum(col("__w6")).cast("double") / 1e6).as("decayed_n"))
  }

  /** Kaplan–Meier survival estimate over per-key activity spans: a
    * key's duration is `floor((last − first) / widthUs)` duration
    * units, and the key is an OBSERVED churn iff its last event
    * precedes the corpus horizon (global max time) by more than
    * `censorUs` — later keys are right-censored (still alive at the
    * horizon), the standard churn/survival setup.
    *
    * Output, one row per observed-churn duration t (ascending):
    * `(t, at_risk, churned, surv)` where at_risk counts keys with
    * duration ≥ t and surv is the KM product Π_{t'≤t} (1 − d/n) —
    * computed as exp of a CUMULATIVE SUM of nano-quantized ln terms,
    * so both engines sum identical integers (float products are not
    * associative; quantized log-sums are). If every at-risk key
    * churns at some t (only possible at the maximum), survival is
    * exactly 0 from that point — flagged explicitly rather than
    * passing −∞ through exp.
    *
    * Scale shape: one keyed agg builds the per-key span frame; the
    * duration histogram is duration-cardinality (bounded), and the
    * reverse-cumulative at-risk counts + KM product ride single
    * windows over that bounded frame — the event log is scanned once.
    */
  def kaplanMeier(df: DataFrame, keyCol: String, tCol: String,
      widthUs: Long, censorUs: Long): DataFrame = {
    require(widthUs > 0 && censorUs >= 0,
      s"invalid widths: width=$widthUs censor=$censorUs")
    val spans = df.groupBy(keyCol)
      .agg(min(col(tCol)).as("__first"), max(col(tCol)).as("__last"))
    val horizon = spans.agg(max(col("__last")).as("__hz"))
    // exact integer floor-div: subtract the long remainder first, so
    // the double division is of an exact multiple (a/b double-divide
    // + cast can round UP at near-integer quotients)
    val diff = col("__last") - col("__first")
    val durs = spans.crossJoin(broadcast(horizon))
      .select(
        ((diff - diff % widthUs) / widthUs).cast("long").as("t"),
        (col("__last") < col("__hz") - censorUs).as("__obs"))
      .groupBy("t")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__obs"), 1L).otherwise(0L)).as("churned"))
    val order = Window.orderBy(col("t"))
    val atRisk = sum(col("n")).over(
      order.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val withRisk = durs.withColumn("at_risk", atRisk)
    val q9 = when(col("churned") < col("at_risk"),
      floor(log(lit(1.0) - col("churned").cast("double") / col("at_risk"))
        * 1e9 + 0.5).cast("long")).otherwise(lit(0L))
    val cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withRisk
      .withColumn("__q9s", sum(q9).over(cum))
      .withColumn("__dead",
        max(when(col("churned") === col("at_risk"), 1).otherwise(0))
          .over(cum))
      .filter(col("churned") > 0)
      .select(col("t"), col("at_risk"), col("churned"),
        when(col("__dead") === 1, lit(0.0))
          .otherwise(
            floor(exp(col("__q9s").cast("double") / 1e9) * 1e6 + 0.5) / 1e6)
          .as("surv"))
  }

  /** STATIONARY DISTRIBUTION of a first-order transition chain (the
    * equilibrium the q124 matrix converges to — where user journeys
    * spend their time, the calibration number under next-event
    * priors): power iteration π ← πP from uniform, `rounds` steps.
    *
    * The transition-count frame is the output of one corpus shuffle
    * (the caller builds it; q124's lag-and-count); the matrix itself
    * is |states|² cells — codebook-class DRIVER metadata like the
    * IVF/PQ centroids, so the iteration is a bounded local loop, not
    * `rounds` distributed joins over a 25-cell frame. The chain is
    * restricted to states with outgoing mass (next ∈ prev-set) BEFORE
    * row normalization, so probability never leaks into absorbing
    * sinks and every π sums to 1 at every round. Inner sums run in
    * ascending state order — the deterministic chain the oracle's
    * unrolled stages reproduce within the 6-decimal round.
    */
  def stationaryDistribution(transitions: DataFrame, prevCol: String,
      nextCol: String, cntCol: String, rounds: Int = 12): DataFrame = {
    require(rounds >= 1, s"need at least one round, got $rounds")
    val cells = transitions
      .select(col(prevCol).cast("string"), col(nextCol).cast("string"),
        col(cntCol).cast("long"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(cells.length <= 10000,
      s"${cells.length} transition cells — not a bounded state space")
    val states = cells.map(_._1).distinct.sorted
    val idx = states.zipWithIndex.toMap
    val kept = cells.filter(c => idx.contains(c._2))
    val tot = kept.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val p = Array.ofDim[Double](states.length, states.length)
    kept.foreach { case (a, b, c) => p(idx(a))(idx(b)) = c.toDouble / tot(a) }
    var pi = Array.fill(states.length)(1.0 / states.length)
    (1 to rounds).foreach { _ =>
      val next = Array.ofDim[Double](states.length)
      for (i <- states.indices; j <- states.indices)
        next(j) += pi(i) * p(i)(j)
      pi = next
    }
    val spark = transitions.sparkSession
    import spark.implicits._
    states.zip(pi).toSeq.toDF("state", "__pi")
      .select(col("state"), round(col("__pi"), 6).as("pi"))
  }
}
