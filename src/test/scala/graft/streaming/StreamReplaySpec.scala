package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The oracle-grade streaming end-to-end contract (q184/q185): a REAL
  * readStream replay of a bounded frame must EQUAL the batch twin —
  * not approximately, row-for-row. The DuckDB CORRECTNESS gate checks
  * the same thing against portable SQL at sf0.01; this spec pins the
  * stream-vs-batch identity inside `sbt test` on the sf0.001 tables,
  * including the two mechanics the harness exists to encode:
  * watermark-advancing sentinels (pushed-filter hazard: see
  * sessionizeExact's scaladoc) and append-mode finalization via the
  * trailing no-data micro-batch.
  */
class StreamReplaySpec extends SparkSpec {

  test("q184 stream sessionization replay equals the batch q62-shape " +
      "computation row for row") {
    val got = graft.SparkEntry.queries("q184_stream_sessionize")(spark, sf)
    // batch twin: the q62 operator path re-aggregated to the q184 shape
    val tsUs = expr("ts div 1000")
    val batch = graft.operators.Temporal.sessionize(
        graft.Tables(spark, sf, "events").select(col("user_id"),
          col("event_id"), tsUs.as("ts"), col("value")),
        "user_id", "ts", "event_id", gap = 3600000000L)
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_us"), max(col("ts")).as("end_us"),
        graft.queries.Query.dsum(col("value")).as("sum_val"))
      .select("user_id", "n_events", "start_us", "end_us", "sum_val")
    assert(got.count() == batch.count())
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "streaming replay diverged from the batch sessionization")
  }

  test("q185 stream PSI replay equals the batch Drift.psi twin per " +
      "window (dense-bin reference, same smoothing/rounding)") {
    // NOT psiTimeline as the twin: its reference spine carries only
    // bins the corpus populates, while streamingPsi (like Drift.psi's
    // dense Profiling.histogram spine) scores all nBins including
    // corpus-empty ones — at sf0.001 some [0,500)/20 bins are empty
    // and the smoothed empty-bin terms differ by construction.
    val got = graft.SparkEntry.queries("q185_stream_psi")(spark, sf)
      .withColumn("bucket",
        (col("win_start_us") / 86400000000L).cast("long"))
      .select(col("bucket"), col("n"), col("psi"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val ev = graft.Tables(spark, sf, "events")
      .select((expr("ts div 1000").cast("long") / 86400000000L)
        .cast("long").as("day"), col("value"))
    val days = got.keys.toSeq.sorted
    assert(days.nonEmpty)
    // spot-check first/middle/last window against the independently
    // oracled batch Drift.psi (q137) with the corpus-marginal ref
    Seq(days.head, days(days.size / 2), days.last).foreach { d =>
      val row = graft.operators.Drift.psi(ev, ev.filter(col("day") === d),
        col("value"), lo = 0.0, hi = 500.0, nBins = 20).head()
      assert(row.getAs[Long]("n_cur") == got(d)._1,
        s"day $d n: batch ${row.getAs[Long]("n_cur")} vs stream ${got(d)._1}")
      assert(row.getAs[Double]("psi") == got(d)._2,
        s"day $d psi: batch ${row.getAs[Double]("psi")} vs stream ${got(d)._2}")
    }
  }

  test("q189 stream windowed agg replay equals the batch windowedStats " +
      "twin (q41's operator) row for row") {
    val got = graft.SparkEntry.queries("q189_stream_window_agg")(spark, sf)
    val batch = EventStream.windowedStats(
        graft.Tables(spark, sf, "events").select(
          timestamp_micros(expr("ts div 1000")).as("ts"),
          col("event_type"), col("value")))
      .select(unix_micros(col("win_start")).as("win_start_us"),
        col("event_type"), col("cnt"), col("sum_val"))
    assert(got.count() == batch.count())
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "streaming windowed agg replay diverged from the batch twin")
    assert(got.filter(col("event_type") === "__sentinel").isEmpty)
  }

  test("q190 stream dedup replay equals batch DISTINCT over the dedup " +
      "key") {
    val got = graft.SparkEntry.queries("q190_stream_dedup")(spark, sf)
    val batch = graft.Tables(spark, sf, "events").select(col("user_id"),
        col("event_type"),
        expr("((ts div 1000) div 86400000000) * 86400000000").as("day_us"))
      .distinct()
    assert(got.count() == batch.count())
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "streaming dedup replay diverged from batch DISTINCT")
  }

  test("q191 stream KS replay equals the batch KS-at-cutoffs twin per " +
      "window (corpus-marginal reference)") {
    val got = graft.SparkEntry.queries("q191_stream_ks")(spark, sf)
    val cuts = (1 to 19).map(_ * 25.0)
    val ev = graft.Tables(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select((expr("ts div 1000").cast("long") / 86400000000L)
        .cast("long").as("day"), col("value"))
    val refRow = ev.agg(count(lit(1)).as("refn"),
      cuts.zipWithIndex.map { case (c, i) =>
        sum(when(col("value") <= c, 1L).otherwise(0L)).as(s"c$i")
      }: _*).head()
    val refN = refRow.getLong(0)
    val batch = ev.groupBy("day")
      .agg(count(lit(1)).as("n"),
        cuts.zipWithIndex.map { case (c, i) =>
          sum(when(col("value") <= c, 1L).otherwise(0L)).as(s"__le$i")
        }: _*)
      .select(col("day") * 86400000000L as "win_start_us", col("n"),
        (floor(cuts.indices.map(i =>
            abs(col(s"__le$i").cast("double") / col("n") -
              lit(refRow.getLong(i + 1).toDouble / refN)))
          .reduce(greatest(_, _)) * 1e6 + 0.5) / 1e6).as("ks"))
    assert(got.count() == batch.count())
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "streaming KS replay diverged from the batch KS-at-cutoffs twin")
  }

  test("q192 stream-static enrich replay equals the batch left join " +
      "row for row") {
    val got = graft.SparkEntry.queries("q192_stream_static_join")(spark, sf)
    val ev = graft.Tables(spark, sf, "events")
    val dim = graft.Tables(spark, sf, "customer")
    val batch = ev.join(dim, ev("user_id") === dim("c_custkey"), "left")
      .select(ev("event_id"), ev("user_id"),
        coalesce(col("c_mktsegment"), lit("<none>")).as("segment"),
        ev("value"))
    assert(got.count() == batch.count())
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "streaming enrich replay diverged from the batch left join")
  }

  test("q193 CDC snapshot sink replay equals batch applyChangelog over " +
      "the same base and changes") {
    val got = graft.SparkEntry.queries("q193_stream_cdc_snapshot")(spark, sf)
    val base = graft.Tables(spark, sf, "customer")
      .filter(col("c_custkey") < 200)
      .select(col("c_custkey").as("user_id"), col("c_acctbal").as("bal"))
    val changes = graft.Tables(spark, sf, "events").select(col("user_id"),
      col("value").as("bal"),
      when(col("event_type") === "error", "D").otherwise("U").as("op"),
      expr("ts div 1000").as("tus"), col("event_id"))
    val batch = graft.operators.Temporal.applyChangelog(
      base, changes, "user_id", Seq("tus", "event_id"), "op", "D")
    assert(got.count() == batch.count())
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "CDC snapshot sink replay diverged from batch applyChangelog")
  }

  test("q194 stream-stream interval join replay equals the batch " +
      "range self-join row for row") {
    val got = graft.SparkEntry.queries("q194_stream_interval_join")(spark, sf)
    val e = graft.Tables(spark, sf, "events").select(col("user_id"),
      col("event_id"), expr("ts div 1000").as("t"), col("event_type"))
    val l = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("t").as("lt"))
    val r = e.filter(col("event_type") === "click")
      .select(col("user_id").as("r_uid"), col("event_id").as("click_id"),
        col("t").as("rt"))
    val batch = l.join(r, col("user_id") === col("r_uid") &&
        col("rt") >= col("lt") &&
        col("rt") < col("lt") + 3600000000L)
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        (col("rt") - col("lt")).as("gap_us"))
    assert(got.count() == batch.count())
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "stream-stream interval join replay diverged from the batch twin")
  }

  test("derived replay state parallelism: floor 8 at benched corpora, " +
      "volume-proportional above 32M rows, capped at session width") {
    def at(n: Long): Int = StreamReplay.replayStatePartitions(spark, n)
    // session width is 4 in specs; the floor dominates it
    assert(at(0) == 8 && at(100000) == 8, "sf0.1-scale corpora -> floor")
    assert(at(10000000L) == 8, "100x-scale corpora -> still the floor")
    assert(at(32000001L) == 8, "cap: session width 4 < floor 8 -> 8")
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      assert(at(32000001L) == 9, "past 32M rows the volume term grows")
      assert(at(4000000L * 32) == 32, "128M rows -> 32 instances")
      assert(at(4000000L * 100) == 32, "capped at the session width")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
  }

  test("sentinel groups leave no trace: no negative user sessions, no " +
      "sentinel-day PSI windows") {
    val sess = graft.SparkEntry.queries("q184_stream_sessionize")(spark, sf)
    assert(sess.filter(col("user_id") < 0).isEmpty)
    val maxUs = graft.Tables(spark, sf, "events")
      .agg(max(expr("ts div 1000"))).head().getLong(0)
    val psi = graft.SparkEntry.queries("q185_stream_psi")(spark, sf)
    assert(psi.filter(col("win_start_us") > maxUs).isEmpty)
  }
}
