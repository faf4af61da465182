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
}
