package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Oracle-scale batch↔streaming twin check for the KS drift statistic
  * (the one twin pair whose equivalence previously rested on a unit
  * fixture): at sf0.1 — 100k events, 30 daily windows, a 219-point
  * evaluation grid — `streamingKsAtCutoffs` must EQUAL the exact batch
  * `Drift.ksStatistic` on every window, because the grid (the distinct
  * derived values of the whole corpus) covers both samples' values.
  *
  * Three independent computations must agree:
  *  - the streaming windowed aggregation (incremental, 3 micro-batches);
  *  - the distributed batch operator (two-pass prefix-sum CDFs);
  *  - plain driver-side Scala arithmetic over the collected rows
  *    (the independent oracle — no graft code in its path).
  */
class KsTwinScaleSpec extends SparkSpec {

  private val dayNs = 86400L * 1000000000L

  test("streamingKsAtCutoffs == batch ksStatistic == plain-Scala KS on " +
      "every daily window at sf0.1 (full-coverage grid)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // events at sf0.1 through the engine's own read contract (ts ns);
    // derived value v = floor(value/2)*2 keeps the distinct-value grid
    // bounded (219 points) while both twins see the SAME derived column
    val rows: Seq[(Long, Double)] = Tables(spark, "/root/testdata/sf0.1",
        "events")
      .filter(col("value").isNotNull)
      .select(col("ts"), (floor(col("value") / 2) * 2).cast("double"))
      .as[(Long, Double)].collect().toSeq
    assert(rows.size == 100000, s"sf0.1 events: ${rows.size}")

    // independent oracle pieces, plain Scala
    val grid = rows.map(_._2).distinct.sorted
    val refN = rows.size.toLong
    val refCum = grid.map(c => rows.count(_._2 <= c).toLong)
    val byWindow: Map[Long, Seq[Double]] =
      rows.groupBy(_._1 / dayNs).map { case (w, rs) => w -> rs.map(_._2) }
    assert(byWindow.size == 30, s"expected 30 daily windows: ${byWindow.size}")
    def scalaKs(sample: Seq[Double]): Double = {
      val n = sample.size.toDouble
      val d = grid.indices.map { i =>
        math.abs(sample.count(_ <= grid(i)) / n - refCum(i).toDouble / refN)
      }.max
      math.floor(d * 1e6 + 0.5) / 1e6
    }

    // streaming twin: 3 micro-batches through the real windowed agg
    val mem = MemoryStream[(Timestamp, Double)]
    val q = EventStream.streamingKsAtCutoffs(
        mem.toDF().toDF("ts", "v"), "v", grid, refCum, refN,
        window_ = "24 hours", watermark = "48 hours")
      .writeStream.format("memory").queryName("ks_twin_out")
      .outputMode("complete").start()
    try {
      val tsRows = rows.map { case (ns, v) =>
        val t = new Timestamp(ns / 1000000L)
        t.setNanos((ns % 1000000000L).toInt) // µs-aligned testdata
        (t, v)
      }
      tsRows.grouped((tsRows.size + 2) / 3).foreach { chunk =>
        mem.addData(chunk: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("ks_twin_out")
        .as[(Timestamp, Long, Double)].collect()
        .map { case (w, n, ks) => (w.getTime / 86400000L, (n, ks)) }.toMap
      assert(streamed.keySet == byWindow.keySet.map(identity))

      val refDf = rows.map(_._2).toDF("v")
      for ((w, sample) <- byWindow.toSeq.sortBy(_._1)) {
        val expected = scalaKs(sample)
        val (n, streamKs) = streamed(w)
        assert(n == sample.size.toLong, s"window $w count: $n")
        assert(streamKs == expected,
          s"window $w: stream $streamKs vs scala $expected")
        val batch = graft.operators.Drift.ksStatistic(
            refDf, sample.toDF("v"), col("v"))
          .head().getAs[Double]("ks")
        assert(batch == expected,
          s"window $w: batch $batch vs scala $expected")
      }
    } finally q.stop()
  }
}
