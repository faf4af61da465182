package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift and snapshot-reconciliation operators — the
  * monitoring layer a long-lived 100 TB pipeline runs between
  * ingestion batches: has this week's data shifted against the
  * reference window (PSI, KS), and what exactly changed between two
  * snapshots of a keyed table (diff)?
  *
  * Scale shape: every operator reduces the fact data to a BOUNDED
  * frame first (fixed histogram bins, per-distinct-value counts, one
  * co-partitioned join) and does the statistical arithmetic on that —
  * nothing here ever sorts or collects raw rows on one node.
  */
object Drift {

  /** Engine-portable 6-decimal rounding: FLOOR(x·1e6 + 0.5)/1e6 is
    * pure IEEE ops, bit-identical across engines where round-half
    * conventions differ (Spark shortest-repr HALF_UP vs DuckDB
    * away-from-zero) — statistical outputs land on exact .5 decimal
    * boundaries often enough to matter.
    */
  private def r6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
  private def r12(c: Column): Column = floor(c * 1e12 + 0.5) / 1e12

  /** Population Stability Index of `v` between a reference and a
    * current frame over `nBins` fixed-width bins on [lo, hi)
    * (out-of-range values clamp into the edge bins — every row
    * counts, the [[Profiling.histogram]] convention). Bin fractions
    * are Laplace-smoothed (+0.5 per bin) so an empty bin on either
    * side contributes a finite term instead of ±∞ — the standard
    * monitoring-dashboard treatment. PSI = Σ (pc − pr)·ln(pc/pr);
    * rule of thumb: < 0.1 stable, > 0.25 shifted.
    *
    * Both inputs reduce to one `nBins`-row count frame each (one
    * partial-aggregated shuffle per side); the PSI arithmetic runs on
    * the joined spine. Per-bin terms are rounded to 12 decimals and
    * decimal-summed so partial-agg order can't drift the total.
    */
  def psi(ref: DataFrame, cur: DataFrame, v: Column, lo: Double,
      hi: Double, nBins: Int): DataFrame = {
    val hr = Profiling.histogram(ref, v, lo, hi, nBins)
      .select(col("bin"), col("cnt").as("cnt_ref"))
    val hc = Profiling.histogram(cur, v, lo, hi, nBins)
      .select(col("bin"), col("cnt").as("cnt_cur"))
    val joined = hr.join(hc, "bin")
    val nr = sum(col("cnt_ref")).over()
    val nc = sum(col("cnt_cur")).over()
    // the window-total denominators ride the bounded nBins-row frame,
    // never the fact data
    val pr = (col("cnt_ref") + 0.5) / (nr + 0.5 * nBins)
    val pc = (col("cnt_cur") + 0.5) / (nc + 0.5 * nBins)
    joined
      .select(col("cnt_ref"), col("cnt_cur"),
        r12((pc - pr) * log(pc / pr)).as("term"))
      .agg(sum(col("cnt_ref")).as("n_ref"), sum(col("cnt_cur")).as("n_cur"),
        r6(sum(col("term").cast("decimal(24,12)")).cast("double")).as("psi"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic of `v` between two
    * frames: max over observed values of |F_a(v) − F_b(v)|. Exact —
    * no binning — yet never a single-partition pass: values reduce to
    * one (value, cnt_a, cnt_b) frame (bounded by DISTINCT values, one
    * shuffle), which is range-partition sorted; cumulative counts come
    * from a two-pass distributed prefix sum (per-partition subtotals —
    * one row per partition — broadcast back as offsets). The CDF
    * difference is pure IEEE arithmetic from integer counts, so both
    * engines produce bit-identical doubles and the max agrees exactly.
    */
  def ksStatistic(a: DataFrame, b: DataFrame, v: Column): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val tagged = a.select(v.cast("double").as("v")).filter(col("v").isNotNull)
      .withColumn("__side", lit(0))
      .unionAll(b.select(v.cast("double").as("v"))
        .filter(col("v").isNotNull).withColumn("__side", lit(1)))
    val counts = tagged.groupBy("v").agg(
        sum(when(col("__side") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("cb"))
      .sort("v")
    val rdd = counts.select(col("ca"), col("cb")).rdd
      .map(r => (r.getLong(0), r.getLong(1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // pass 1: per-partition subtotals (numPartitions rows — bounded)
      val partTotals = rdd.mapPartitionsWithIndex { case (i, it) =>
        var sa = 0L; var sb = 0L
        it.foreach { case (da, db) => sa += da; sb += db }
        Iterator((i, sa, sb))
      }.collect().sortBy(_._1)
      val na = partTotals.map(_._2).sum
      val nb = partTotals.map(_._3).sum
      if (na == 0L || nb == 0L)
        return spark.range(1).select(lit(na).as("n_a"), lit(nb).as("n_b"),
          lit(null).cast("double").as("ks"))
      val offA = partTotals.scanLeft(0L)(_ + _._2).dropRight(1)
      val offB = partTotals.scanLeft(0L)(_ + _._3).dropRight(1)
      // pass 2: running CDFs from the broadcast offsets; max per
      // partition, then a driver max over numPartitions values
      val ks = rdd.mapPartitionsWithIndex { case (i, it) =>
        var ca = offA(i); var cb = offB(i)
        var best = 0.0
        it.foreach { case (da, db) =>
          ca += da; cb += db
          val d = math.abs(ca.toDouble / na - cb.toDouble / nb)
          if (d > best) best = d
        }
        Iterator(best)
      }.fold(0.0)(math.max)
      Seq((na, nb, math.floor(ks * 1e6 + 0.5) / 1e6))
        .toDF("n_a", "n_b", "ks")
    } finally rdd.unpersist(blocking = false)
  }

  /** PSI drift TIMELINE: [[psi]] of every time bucket (or any grouping)
    * against the whole-frame reference distribution, in one pass — the
    * monitoring dashboard's per-day drift row, without re-scanning the
    * fact data per bucket. One partial-aggregated shuffle builds the
    * (bucket, bin) counts; the reference histogram is a second
    * aggregation OVER THAT bounded frame (never the facts again) and
    * broadcasts back onto it. Same smoothing/rounding contract as
    * [[psi]]. Output per bucket: n rows, psi vs the global reference.
    *
    * Note the reference INCLUDES each bucket (it is the corpus
    * marginal) — the standard dashboard convention; exclude-self
    * references need one frame per bucket, which is [[psi]] in a loop.
    */
  def psiTimeline(df: DataFrame, bucket: Column, v: Column, lo: Double,
      hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, s"bad psi config: [$lo, $hi) / $nBins")
    val width = (hi - lo) / nBins
    val bin = least(greatest(floor((v - lo) / width), lit(0)),
      lit(nBins - 1)).cast("bigint")
    // persisted: the (bucket, bin) frame feeds the bucket spine, the
    // reference rollup, n_ref AND the left join — unpersisted, each
    // consumer re-scans the FACT data (measured: 4 scans in the plan),
    // which is exactly what this operator exists to avoid
    val counts = graft.HeavyPersist(df.filter(v.isNotNull)
      .groupBy(bucket.as("bucket"), bin.as("bin"))
      .agg(count(lit(1)).as("cnt")))
    val ref = counts.groupBy("bin").agg(sum(col("cnt")).as("cnt_ref"))
    val nRef = ref.agg(sum(col("cnt_ref")).as("n_ref")).select(col("n_ref"))
    // the per-bucket spine is dense over the nBins reference rows so
    // empty bins still contribute their smoothed term
    val spine = counts.select(col("bucket")).distinct()
      .crossJoin(broadcast(ref))
      .join(counts, Seq("bucket", "bin"), "left")
      .na.fill(0L, Seq("cnt"))
    val perBucket = Window.partitionBy(col("bucket"))
    val nCur = sum(col("cnt")).over(perBucket)
    val pr = (col("cnt_ref") + 0.5) / (col("n_ref") + 0.5 * nBins)
    val pc = (col("cnt") + 0.5) / (nCur + 0.5 * nBins)
    spine.crossJoin(broadcast(nRef))
      .select(col("bucket"), col("cnt"),
        r12((pc - pr) * log(pc / pr)).as("term"))
      .groupBy("bucket")
      .agg(sum(col("cnt")).as("n"),
        r6(sum(col("term").cast("decimal(24,12)")).cast("double")).as("psi"))
  }

  /** Row-level diff of two keyed snapshots: one `full_outer` join on
    * the key (both sides shuffle once, co-partitioned — the only
    * data-sized operation), each key classified `added` (new only),
    * `removed` (old only), `changed` (any compare column differs,
    * null-safely) or `unchanged`. Output carries the key plus
    * old/new values of every compare column (stringified so
    * heterogeneous types share one schema, the [[Profiling.profile]]
    * convention).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    require(compareCols.nonEmpty, "snapshotDiff needs compare columns")
    val o = oldDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__old", lit(true))
    val n = newDf.select(keyCols.map(col) ++
        compareCols.map(c => col(c).as(s"__new_$c")): _*)
      .withColumn("__new", lit(true))
    val joined = o.join(n, keyCols, "full_outer")
    val anyDiff = compareCols.map(c =>
      !(col(c) <=> col(s"__new_$c"))).reduce(_ || _)
    val status = when(col("__old").isNull, "added")
      .when(col("__new").isNull, "removed")
      .when(anyDiff, "changed")
      .otherwise("unchanged")
    joined.select(keyCols.map(col) ++ Seq(status.as("status")) ++
      compareCols.flatMap(c => Seq(
        col(c).cast("string").as(s"old_$c"),
        col(s"__new_$c").cast("string").as(s"new_$c"))): _*)
  }

  /** One-sided CUSUM change-point detection over per-bucket row
    * counts (Page 1954) — the sequential monitoring statistic PSI/KS
    * timelines lack: those compare each window to a reference
    * independently; CUSUM accumulates small sustained deviations
    * until a persistent volume shift (ingestion stall, duplicate
    * flood) crosses the alarm line, catching drifts no single window
    * would.
    *
    * The textbook recursion S_t = max(0, S_{t−1} + (x_t − μ)) looks
    * inherently sequential, but has the closed form
    * S_t = P_t − min(0, min_{j≤t} P_j) over the deviation prefix sum
    * P — so the whole statistic is TWO window passes (running sum,
    * then running min) over the bucket frame. That frame is the
    * AGGREGATE (one bucket per day/hour — bounded), which is the only
    * thing the unpartitioned windows ever see; the fact table itself
    * contributes one partial-aggregated count shuffle. μ and σ derive
    * from EXACT integer count sums (explicit (Σx²−(Σx)²/n)/(n−1) on
    * BIGINTs), so both engines run the identical IEEE chain; a
    * single-bucket frame yields null σ (and null alarm) rather than a
    * division by zero.
    *
    * Output per bucket: (`bucket`, `n_events`, `cusum` 6-decimal,
    * `alarm` = cusum > thresholdSigma·σ).
    */
  /** Autocorrelation of the per-bucket count series at lags 1..`maxLag`
    * — the SEASONALITY census beside [[cusumCounts]]'s level-shift
    * alarm: a strong lag-7 spike on daily counts is weekly
    * periodicity, and a monitor that alarms on it as "drift" is
    * miscalibrated. ACF(k) = Σ(xₜ−x̄)(xₜ₊ₖ−x̄) / Σ(xₜ−x̄)² over the
    * positionally-indexed observed series.
    *
    * Scale shape: everything beyond the one count shuffle runs on the
    * BOUNDED bucket frame (the q202 posture) — deviations from exact
    * integer sums, one broadcast-lag equi-join (never a corpus
    * self-join), numerator/denominator summed as decimal(38,12)
    * fixed-point so partial-aggregation order can't move the 6th
    * decimal (a day of 100× data makes d² ~10⁹ — decimal(18,12)
    * would overflow, 38 won't).
    */
  def acfCounts(df: DataFrame, bucket: Column, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
    val g = counts.agg(count(lit(1)).as("nb"), sum(col("n")).as("s1"))
    val w = Window.orderBy("bucket")
    val dev = counts.crossJoin(broadcast(g))
      .withColumn("idx", row_number().over(w))
      .withColumn("d",
        col("n").cast("double") - col("s1").cast("double") / col("nb"))
      .select("idx", "d")
    val denom = dev.agg(
      sum((col("d") * col("d")).cast("decimal(38,12)")).as("den"))
    val lagDf = (1 to maxLag).toDF("lag")
    dev.as("a").crossJoin(broadcast(lagDf))
      .join(dev.select(col("idx").as("idx2"), col("d").as("d2")),
        col("idx2") === col("idx") + col("lag"))
      .groupBy("lag")
      .agg(sum((col("d") * col("d2")).cast("decimal(38,12)")).as("num"),
        count(lit(1)).as("n_pairs"))
      .crossJoin(broadcast(denom))
      .select(col("lag").cast("long").as("lag"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("acf"),
        col("n_pairs"))
      .orderBy("lag")
  }

  def cusumCounts(df: DataFrame, bucket: Column,
      thresholdSigma: Double = 3.0): DataFrame = {
    val counts = df.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
    val g = counts.agg(count(lit(1)).as("nb"), sum(col("n")).as("s1"),
      sum(col("n") * col("n")).as("s2"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r6l = (c: Column) => floor(c * 1e6 + 0.5) / 1e6
    val cusum = col("p") - least(lit(0.0), col("pmin"))
    counts.crossJoin(broadcast(g))
      .withColumn("mu", col("s1").cast("double") / col("nb"))
      .withColumn("sigma", when(col("nb") > 1, sqrt(
        (col("s2").cast("double") -
          col("s1").cast("double") * col("s1") / col("nb")) /
          (col("nb") - 1))))
      .withColumn("p", sum(col("n").cast("double") - col("mu")).over(w))
      .withColumn("pmin", min(col("p")).over(w))
      .select(col("bucket"), col("n").as("n_events"),
        r6l(cusum).as("cusum"),
        (cusum > col("sigma") * thresholdSigma).as("alarm"))
  }
}
