package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with the total and the
  * per-query times.
  *
  * The artifact is SELF-EVIDENCING (r9 verdict: a one-pass wall-clock
  * number on a shared sandbox cannot distinguish an engine regression
  * from machine contention — the r9 driver saw 208 s where two clean
  * builder runs of the identical suite saw 116 s, all of the delta in
  * one block):
  *   - every query whose FIRST pass exceeds `rerunThresholdSec` is run
  *     a second time immediately and its reported time is min-of-2 —
  *     contention inflates a single pass, it does not inflate both;
  *     the raw pass times are kept in `rerun` so the inflation itself
  *     is visible evidence;
  *   - every timed pass brackets /proc/stat and /proc/self/stat, so
  *     each reported number carries the EXTERNAL busy-cores figure of
  *     its own window (`qext_cores`) — contention is attributable per
  *     query, not inferred from a run-level loadavg (which the
  *     bench's own threads dominate — see extCores);
  *   - queries whose reported pass ran under external load > cpus/8,
  *     AND queries that regressed >2× vs the committed previous
  *     artifact (r13: inflation from co-scheduling/GC/neighboring
  *     windows does not show in the query's own ext bracket, so
  *     BENCH_r13 shipped 11 phantom regressions under
  *     `contended: false`), are RE-MEASURED after the suite behind a
  *     bounded wait-for-quiet (`requeued` keeps before/after/load/
  *     idle-reading as evidence) — r12 showed in-run min-of-2 is
  *     insufficient when a contention span outlives both passes
  *     (q134: 90.5/37.8 s vs 1.26 s clean); a requeue that REPRODUCES
  *     the suite time (±15%) FROM A QUIET WINDOW (pre-pass idle
  *     bracket <= cpus/8 — steady cross-window load must not
  *     self-certify, r13 advice) clears the flag: quiet-window
  *     agreement means the number is the engine's honest cost and the
  *     suite ext reading was self-induced (buffered-write flushes run
  *     in kernel worker threads — box-busy, never self-busy — so
  *     checkpoint-heavy streaming replays false-positive otherwise),
  *     while genuine contention does not reproduce on a quiet box;
  *     agreement with the committed clean per-query baseline (within
  *     25% + 0.2 s) certifies a number the same way when the replay
  *     variance exceeds the reproduction band; regressions that
  *     disappear on requeue are reported in `regressions_cleared`,
  *     and a bound-out requeue queue / exhausted quiet budget is
  *     disclosed (`n_requeue_skipped`, `quiet_wait_exhausted`);
  *   - a machine-load fingerprint (1-min load average and available
  *     memory, sampled before and after the run) rides in `load`;
  *   - per-query times are compared to the previous round's full
  *     artifact (BENCH_PREV.json, a committed copy of the last driver
  *     run's BENCH_FULL.json) and queries slower than 2× prior (and
  *     by >0.5 s absolute, so sub-100 ms jitter never flags) are
  *     listed in `regressions` — a real regression is named the round
  *     it happens instead of being excavated from two JSON files;
  *   - the prev artifact's `sf` must MATCH this run's (hard error at
  *     startup otherwise — the r14 "100×" artifact was a mislabeled
  *     10× run; `SPARK_GRAFT_ALLOW_CROSS_SF` permits the deliberate
  *     skew A/B and discloses the pair in `cross_sf_compare`);
  *   - a RUN-LEVEL verdict complements the per-query brackets
  *     (r15: the driver run shipped 23% inflated with
  *     `contended:false` and five phantom regressions): when the
  *     common-query suite total inflates >15% over the committed prev
  *     and the per-query ext-cores story can't explain at least half
  *     of it, `run_environment_suspect` is stamped and regressions
  *     ship `"status":"unconfirmed"` — never certified facts;
  *   - the requeue phase is wall-bounded (max(90 s, 25% of suite)) and
  *     self-accounting: per-requeue quiet-wait seconds ride in
  *     `requeued`, the phase total in `requeue_sec`, and a bound-out
  *     budget degrades to disclosure (`requeue_budget_exhausted`),
  *     not to an open-endedly longer run.
  */
object Bench {
  private def readProcNum(path: String, key: String): Double = try {
    val src = scala.io.Source.fromFile(path)
    try {
      if (key.isEmpty) src.getLines().next().split("\\s+")(0).toDouble
      else src.getLines().find(_.startsWith(key)) match {
        case Some(l) => l.split("\\s+")(1).toDouble
        case None => -1.0
      }
    } finally src.close()
  } catch { case _: Throwable => -1.0 }

  /** (1-min load average, available memory GiB) — /proc on Linux with
    * an MXBean fallback, -1 where unreadable. Small and comparable
    * across rounds; not a profiler, just enough to adjudicate "was the
    * sandbox busy while this ran".
    */
  private def loadFingerprint(): (Double, Double) = {
    val la = {
      val p = readProcNum("/proc/loadavg", "")
      if (p >= 0) p
      else java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
    }
    val availKb = readProcNum("/proc/meminfo", "MemAvailable:")
    (math.rint(la * 100) / 100,
      if (availKb >= 0) math.rint(availKb / 1048576.0 * 10) / 10 else -1.0)
  }

  /** Whole-box busy jiffies from /proc/stat's aggregate `cpu` line
    * (user+nice+system+irq+softirq+steal; idle and iowait excluded).
    * A COUNTER, not an EMA — two samples bracket a window exactly,
    * unlike the 1-min loadavg whose smoothing smears a 1-second query
    * window beyond recognition. -1 where unreadable (non-Linux).
    */
  private[graft] def boxBusyJiffies(): Long = try {
    val src = scala.io.Source.fromFile("/proc/stat")
    try {
      val f = src.getLines().next().trim.split("\\s+")
      // cpu user nice system idle iowait irq softirq steal ...
      f(1).toLong + f(2).toLong + f(3).toLong + f(6).toLong +
        f(7).toLong + f(8).toLong
    } finally src.close()
  } catch { case _: Throwable => -1L }

  /** This JVM's own busy jiffies (utime+stime, /proc/self/stat fields
    * 14-15, summed over all threads). Parsed after the last ')' —
    * the comm field may contain spaces. -1 where unreadable.
    */
  private[graft] def selfJiffies(): Long = try {
    val src = scala.io.Source.fromFile("/proc/self/stat")
    try {
      val line = src.getLines().next()
      val f = line.substring(line.lastIndexOf(')') + 2).split("\\s+")
      // after ')': state(0) then fields 4.. ; utime is index 11,
      // stime 12 (original 1-based fields 14,15)
      f(11).toLong + f(12).toLong
    } finally src.close()
  } catch { case _: Throwable => -1L }

  /** EXTERNAL busy cores across a window: (Δbox − Δself)/Δwall.
    * The r12 lesson: loadavg cannot adjudicate contention mid-run —
    * the bench's own 32-thread work drives the end loadavg to 14-26
    * on a PROVABLY idle box (BENCH_PREV la_end=13.86, BENCH_SF10
    * la_end=25.77, both clean runs), so any `max(la0,la1)` threshold
    * either false-flags every run or sees nothing. Subtracting our
    * own jiffies isolates exactly the thing the flag is about:
    * somebody ELSE burning the box while a query was timed.
    */
  private[graft] def extCores(box0: Long, self0: Long, box1: Long, self1: Long,
      wallSec: Double): Double =
    if (box0 < 0 || self0 < 0 || box1 < 0 || self1 < 0 || wallSec <= 0) -1.0
    else math.max(0.0,
      ((box1 - box0) - (self1 - self0)) / 100.0 / wallSec)

  /** Spot sample of external load while WE are idle: sleep `ms`, no
    * self-work, so Δbox is (almost) all external. Used by the
    * post-suite requeue to wait for a quiet box.
    */
  private def extIdleCores(ms: Long): Double = {
    val b0 = boxBusyJiffies(); val s0 = selfJiffies()
    val t0 = System.nanoTime()
    Thread.sleep(ms)
    extCores(b0, s0, boxBusyJiffies(), selfJiffies(),
      (System.nanoTime() - t0) / 1e9)
  }

  /** Per-query seconds from a prior bench artifact's `"queries":{...}`
    * map. Hand-rolled extraction (the format is our own single JSON
    * line; the names are [a-z0-9_]) — no parser dependency, and a
    * missing/corrupt file degrades to "no regression check", never to
    * a bench failure.
    */
  private def prevTimes(path: String): Map[String, Double] = try {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val at = txt.indexOf("\"queries\":{")
    if (at < 0) Map.empty
    else {
      val body = txt.substring(at + 11, txt.indexOf('}', at))
      val re = """"([a-z0-9_]+)":([0-9.eE+-]+)""".r
      re.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  } catch { case _: Throwable => Map.empty }

  /** Per-build seconds from a prior artifact's `"index_builds":{...}`
    * map (`"name":[sec,ext]` entries). Missing file/key degrades to
    * "no prebuild regression check", same as [[prevTimes]].
    */
  private def prevBuildTimes(path: String): Map[String, Double] = try {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val at = txt.indexOf("\"index_builds\":{")
    if (at < 0) Map.empty
    else {
      val body = txt.substring(at + 16, txt.indexOf('}', at))
      val re = """"([a-z0-9_]+)":\[([0-9.eE+-]+)""".r
      re.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  } catch { case _: Throwable => Map.empty }

  /** `sf` field of a prior artifact — the scale-chain identity of the
    * baseline this run would regression-compare against. None when the
    * file is missing/corrupt or predates the field.
    */
  private[graft] def prevSfField(path: String): Option[String] = try {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    """"sf":"([^"]+)"""".r.findFirstMatchIn(txt).map(_.group(1))
  } catch { case _: Throwable => None }

  /** SCALE-CHAIN GUARD (r15 verdict #2 — the r14 mislabel class): a
    * regression compare across SCALES is meaningless, and nothing used
    * to stop one — the r14 "100×" artifact was a mislabeled 10× run
    * caught by a human reading its `sf` field, not by the harness.
    * When the prev artifact carries an `sf` that differs from this
    * run's, the bench REFUSES to start (hard error before any timing)
    * unless `SPARK_GRAFT_ALLOW_CROSS_SF` is set — the deliberate
    * cross-directory A/B (the skew rehearsal, where BENCH_SKEW at
    * `…_skew` compares against the same-scale unskewed baseline) sets
    * it, and the mismatch is then DISCLOSED in-artifact
    * (`cross_sf_compare`) instead of silently shipping. Returns the
    * (prevSf, sfDir) pair to disclose when allowed-and-mismatched.
    */
  private[graft] def checkScaleChain(prevSf: Option[String], sfDir: String,
      allowCrossSf: Boolean): Option[(String, String)] = prevSf match {
    case Some(p) if p != sfDir =>
      if (allowCrossSf) Some((p, sfDir))
      else throw new IllegalArgumentException(
        s"bench scale-chain violation: the prev artifact was measured at " +
          s"sf='$p' but this run reads sf='$sfDir' — refusing to " +
          s"regression-compare across scales (the r14 '100x' artifact was " +
          s"a mislabeled 10x run). Point SPARK_GRAFT_BENCH_PREV at a " +
          s"same-scale artifact, or set SPARK_GRAFT_ALLOW_CROSS_SF=1 for " +
          s"a deliberate cross-directory A/B (skew rehearsal) — the " +
          s"mismatch is then disclosed in the artifact.")
    case _ => None
  }

  /** RUN-LEVEL ENVIRONMENT VERDICT (r15 verdict #1): the per-query
    * machinery sees load that overlaps a timed /proc/stat bracket — it
    * is blind to contention that steals memory bandwidth or page cache
    * without burning cores in the bracket, or that arrives in bursts
    * between the requeue's 500 ms idle probes. BENCH_r15 shipped 23%
    * inflated over the same-code clean artifact (201.4 vs 163.8 s,
    * loadavg 4.3 vs 0.28) with `contended:false` and five phantom
    * regressions that SURVIVED the quiet-window requeue. The suite
    * TOTAL vs the committed prev is the run-level complement: when the
    * common-query total inflates >15% and the per-query ext-cores
    * story cannot account for at least half of the inflation, the
    * whole artifact is environment-suspect and its regressions ship
    * as `"unconfirmed"` — a re-measure order, never a certified fact.
    * (A genuine uniform code slowdown lands here too — deliberately:
    * it also needs a clean-box confirmation before anyone chases it;
    * a real regression re-certifies on the next quiet run.) Returns
    * (ratio rounded to 3 dp, suspect); ratio is -1 when the chain is
    * too thin to judge (<10 common queries or <1 s of prev total).
    */
  private[graft] def runEnvironmentVerdict(nowTotal: Double,
      prevTotal: Double, explained: Double, nCommon: Int): (Double, Boolean) =
    if (nCommon < 10 || prevTotal <= 1.0) (-1.0, false)
    else {
      val ratio = nowTotal / prevTotal
      val suspect = ratio > 1.15 && explained < 0.5 * (nowTotal - prevTotal)
      (math.rint(ratio * 1000) / 1000, suspect)
    }

  /** THIN-CHAIN ENVIRONMENT VERDICT (r16 verdict #4): subset and
    * rehearsal runs (SPARK_GRAFT_ONLY, the 5-shape 1000× artifacts)
    * have fewer than 10 common queries, so [[runEnvironmentVerdict]]
    * correctly refuses a suite-total ratio — and the artifacts that
    * need certification MOST (a 15-minute rehearsal nobody wants to
    * repeat) shipped with no run-level verdict at all. The thin-chain
    * complement is the MEDIAN of per-query ratios over common queries
    * whose prev time clears `minPrevSec` (sub-second entries ratio on
    * jitter, not on environment): a busy box inflates every query in
    * the run TOGETHER, so a synchronized median shift is the
    * environment signature even at n=3, while the median is robust to
    * one shape legitimately regressing or hitting its disclosed spill
    * variance. The suspect band is WIDER than the suite-total gate's
    * (2.0 vs 1.15): SCALE.md records ±2× same-code swings on
    * individual spill-bound 1000× shapes under min-of-2, so a thin
    * chain can only certify inflation the variance floor cannot
    * explain — at median > 2× EVERY shape (not just the median one)
    * has to sit at its variance ceiling simultaneously, which is the
    * synchronized signature, not spill luck. Returns (-1, false) when
    * fewer than 3 queries qualify — too thin even for this gate.
    */
  private[graft] def thinChainMedianRatio(now: Map[String, Double],
      prev: Map[String, Double], minPrevSec: Double = 1.0): (Double, Boolean) = {
    val ratios = now.keys.toSeq
      .filter(n => prev.get(n).exists(_ >= minPrevSec))
      .map(n => now(n) / prev(n)).sorted
    if (ratios.size < 3) (-1.0, false)
    else {
      val m =
        if (ratios.size % 2 == 1) ratios(ratios.size / 2)
        else (ratios(ratios.size / 2 - 1) + ratios(ratios.size / 2)) / 2.0
      (math.rint(m * 1000) / 1000, m > 2.0)
    }
  }

  /** Data-derived AQE initial shuffle width: the largest table's
    * on-disk bytes / 32 MB, clamped to [cpus, cpus*16]. 32 MB of
    * COMPRESSED parquet per initial bucket approximates the ~64 MB
    * advisory target after shuffle-row expansion; the floor keeps
    * every committed small-scale chain at the session width
    * (identical plans to the static-width era), the cap bounds
    * per-map-task bucket overhead. Tables are <name>.parquet files or
    * directories of part files directly under the scale directory.
    */
  private[graft] def initialShufflePartitions(sfDir: String,
      cpus: Int): Int = {
    def bytes(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles()).map(_.map(bytes).sum).getOrElse(0L)
    val largest = Option(new java.io.File(sfDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.endsWith(".parquet"))
      .map(bytes).foldLeft(0L)(math.max)
    val byVolume = (largest / (32L << 20)).toInt
    math.min(math.max(cpus, byVolume), cpus * 16)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE coalesces DOWN from initialPartitionNum and never scales a
      // shuffle up (skew-split aside), so the static partition count is
      // a hard ceiling: at the 1000x rehearsal, 32 partitions put ~19M
      // rows in every shuffle task and the suite went superlinear on
      // spill (q114 x26.6 for 10x the data; 256 initial buckets brought
      // q114 1209 -> 392 s and q145 728 -> 293 s, measured). A FIXED
      // high bucket count is just as wrong at the other end — the same
      // 256 at sf0.1 cost +32% suite and x12 index_build (iterative
      // k-means builds drown in per-bucket overhead; the run-level
      // gate stamped that run suspect). So the initial width derives
      // from the data: largest table's bytes / 32 MB, clamped to
      // [cpus, cpus*16] — sf0.1/10x floor at the session width
      // (identical plans to the static-width chains), true-100x lands
      // a hair above it (34), 1000x at ~350. The local twin of the
      // cluster posture: size
      // initialPartitionNum for the largest expected shuffle, let AQE
      // right-size every smaller one from runtime stats.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        initialShufflePartitions(sfDir, cpus.toInt).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (la0, mem0) = loadFingerprint()
    // Start-of-run external-load tripwire: an INSTANTANEOUS /proc/stat
    // delta while we are still idle, not the start loadavg — loadavg
    // is a 1-min EMA, so a bench launched right after another heavy
    // job on the same box (back-to-back round-close runs) inherits its
    // own predecessor's decayed residue and false-flags a clean run.
    // The 1 s jiffy bracket sees only what is burning cores RIGHT NOW.
    val startExt = extIdleCores(1000)
    // Warm up JVM/codegen/scan machinery so per-query timings reflect
    // steady state rather than charging session startup to whichever
    // query the Map happens to iterate first.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // One-time ANN index builds, timed separately (reported below):
    // q47/q49 measure probe latency against an existing index, the way
    // a deployment runs them; the build is a distinct, amortized job.
    // A build failure must not abort the whole bench — the probe
    // queries will fail individually into `failed` like any other
    // broken query, and the rest of the inventory still reports.
    val tIdx = System.nanoTime()
    // profiling escape hatch: subset runs of non-index queries can
    // skip the one-time artifact builds (they'd dominate a 2-query
    // A/B); index-probing queries (q47/q49/q117/q180/q182/q187/q188,
    // q66) need the prebuild and will fail without it — never set
    // this for a full run
    val skipPrebuild = sys.env.contains("SPARK_GRAFT_SKIP_PREBUILD")
    // each named build carries its OWN time + external-cores bracket
    // (r14 verdict #2: the aggregate index_build number sat outside the
    // contention machinery and a 2.1×-inflated figure shipped with no
    // flag) — builds overlap, but ext-cores subtracts ALL self jiffies,
    // so a sibling build never reads as external load
    val buildEvidence = scala.collection.mutable.LinkedHashMap
      .empty[String, (Double, Double)]
    val contThreshEarly = cpus.toDouble / 8.0
    val idxSec = if (skipPrebuild) 0.0 else try {
      // the artifacts are independent one-time builds; Spark
      // schedules concurrent jobs fine, so overlap them — the metric
      // is wall-clock, the way a deployment would run them
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      // every future is awaited even when one fails (recover, then
      // sequence): fail-fast would start the timed query loop while
      // un-cancelled sibling builds still run — skewing early timings
      // and racing q66's bucketedTable against an in-flight build of
      // the same table
      val builds = (graft.queries.ExtendedQueries.prebuilds(spark, sfDir)
        ++ Seq[(String, () => Any)](
          // one-time bucketed-layout builds (q66), same amortized-
          // artifact treatment as the ANN indexes
          "bucketed_lineitem" -> (() => graft.sources.Layout
            .bucketedTable(spark, sfDir, "lineitem",
              Seq("l_orderkey"), numBuckets = 8)),
          "bucketed_orders" -> (() => graft.sources.Layout
            .bucketedTable(spark, sfDir, "orders",
              Seq("o_orderkey"), numBuckets = 8))))
        .map { case (name, b) =>
          Future {
            val b0 = boxBusyJiffies(); val s0 = selfJiffies()
            val t0 = System.nanoTime()
            b()
            val t = (System.nanoTime() - t0) / 1e9
            val e = extCores(b0, s0, boxBusyJiffies(), selfJiffies(), t)
            buildEvidence.synchronized {
              buildEvidence(name) = (math.rint(t * 1000) / 1000,
                math.rint(e * 10) / 10)
            }
          }.map(_ => true).recover { case e =>
            System.err.println(
              s"[bench] prebuild $name FAILED: ${e.getMessage}")
            false
          }
        }
      val ok = Await.result(Future.sequence(builds), Duration.Inf)
      if (ok.forall(identity)) (System.nanoTime() - tIdx) / 1e9 else -1.0
    } catch { case e: Throwable =>
      System.err.println(s"[bench] index prebuild FAILED: ${e.getMessage}")
      -1.0
    }
    // a build is flagged when its own window saw external load above
    // cpus/8 — disclosure (no requeue: builds mutate one-time artifacts
    // and cannot be harmlessly re-measured mid-suite), so a polluted
    // index_build can never read as clean again. Caveat shared with the
    // streaming replays: builds WRITE heavily, and buffered-write
    // flushes run in kernel worker threads (box-busy, never self-busy),
    // so the ext readings carry a self-induced writeback floor that
    // grows with data scale (measured ~2.6-3.7 "cores" during the
    // true-100× parallel builds on a quiet box) — a crossing means
    // "inspect", not "discard"
    val buildContended = buildEvidence.exists(_._2._2 > contThreshEarly)
    // optional subset for standalone profiling (comma-separated name
    // prefixes); the driver never sets it, so driver benches run all
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSeq.filter(_.nonEmpty))
    val rerunThresholdSec = sys.env.get("SPARK_GRAFT_RERUN_SEC")
      .map(_.toDouble).getOrElse(1.0)
    // prev baseline loaded BEFORE any timing: (a) the scale-chain guard
    // must fail FAST — a cross-scale compare should die at startup, not
    // after minutes of suite time; (b) a query that regressed vs the
    // committed artifact is a requeue candidate in its own right; (c)
    // baseline agreement is the third certification path at the end.
    val prevPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_PREV",
      "BENCH_PREV.json")
    val prev = prevTimes(prevPath)
    val crossSf = checkScaleChain(prevSfField(prevPath), sfDir,
      sys.env.contains("SPARK_GRAFT_ALLOW_CROSS_SF"))
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val rerun = scala.collection.mutable.LinkedHashMap
      .empty[String, (Double, Double)]
    // Streaming replays run LAST, not in name order: each one stages
    // tens of millions of rows through checkpointed sinks, and that
    // page-cache wake measurably pollutes whoever runs next — q186
    // (alphabetically right after the q184/q185 replays) read 47 s
    // in-suite vs 10 s isolated at 100×. Ordering them last changes
    // no query's own cost (a replay's staging is its own, charged to
    // itself) and the streaming_replay bucket reports them separately;
    // it just stops the wake from landing on an unrelated query's
    // number.
    val streamingSet = graft.queries.StreamingQueries.all.map(_.name).toSet
    val selected = SparkEntry.queries.toSeq
      .sortBy { case (n, _) => (streamingSet(n), n) }
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    // Inter-query storage isolation: drop the previous query's
    // persisted frames (HeavyPersist scope) and pinned replay sinks
    // (localCheckpoints) before each timed pass. Without this, the
    // last pipeline's multi-GB frame squats the PROTECTED half of the
    // storage pool (spark.memory.storageFraction) across every
    // unrelated query that follows — measured q186 8 s isolated vs
    // 39-46 s mid-suite. Per-query reset mirrors per-job submission
    // on a real cluster and makes each number the query's own cost;
    // maintained index/bucketed TABLES live on disk and are not
    // touched.
    var lastPassSec = 0.0
    def resetStorage(): Unit = {
      HeavyPersist.clear(spark)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      // Shuffle files are unlinked by the ContextCleaner only after
      // their ShuffleDependency is GC'd, and a near-idle rehearsal
      // heap (96 GB at 1000x) may not collect for the whole suite —
      // the accumulated shuffle files of three pair-heavy 1000x
      // queries filled the disk and killed the replay that followed
      // (ENOSPC). After any pass long enough to have shuffled real
      // volume, force the collection so the next query starts with
      // its disk back; the pause lands OUTSIDE every timed bracket,
      // and no sf0.1 pass reaches the gate.
      if (lastPassSec > 30.0) { System.gc(); Thread.sleep(500) }
    }
    // Each timed pass also brackets /proc/stat + /proc/self/stat, so
    // every number carries its own external-cores figure — a
    // contended span is ATTRIBUTABLE (r12 demand: BENCH_r12 carried
    // ~175 s of inflation on 24 queries while self-labeling clean,
    // because only the run-start loadavg was consulted).
    val contThresh = cpus.toDouble / 8.0
    def timedPass(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        name: String): (Double, Double) = {
      resetStorage()
      val b0 = boxBusyJiffies(); val s0 = selfJiffies()
      val t0 = System.nanoTime()
      // lastPassSec is assigned in a finally: a heavy pass that CRASHES
      // after shuffling real volume must still arm the >30 s GC gate in
      // the next resetStorage() — the crashed pass's shuffle files are
      // exactly the ones that need reclaiming (the ENOSPC scenario the
      // gate exists for), and a success-only assignment would leave the
      // gate keyed to the previous, possibly sub-second, pass.
      try fn(spark, sfDir).count()
      finally lastPassSec = (System.nanoTime() - t0) / 1e9
      val t = lastPassSec
      (t, extCores(b0, s0, boxBusyJiffies(), selfJiffies(), t))
    }
    // per-query external cores for the pass whose time was REPORTED
    val qext = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val firstPass = scala.collection.mutable.LinkedHashMap
      .empty[String, (Double, Double)]
    val suiteT0 = System.nanoTime()
    val results0 = selected.flatMap { case (name, fn) =>
      try {
        val (t1, e1) = timedPass(fn, name)
        // min-of-2 for anything slow enough to matter: the second pass
        // runs IMMEDIATELY (same storage-reset discipline) so it
        // measures the engine, and min(t1,t2) is robust against a
        // contention spike landing on ONE pass. Both raw times are
        // reported — an honest t2 >> clean history is itself signal.
        // (r12 showed both passes CAN be contended — q134 ran
        // 90.5/37.8 s vs 1.26 s clean — which is what the post-suite
        // requeue below is for.)
        if (t1 > rerunThresholdSec) {
          val (t2, e2) = timedPass(fn, name)
          rerun(name) = (t1, t2)
          val (t, e) = if (t2 < t1) (t2, e2) else (t1, e1)
          firstPass(name) = (t, e)
          Some(name -> t)
        } else { firstPass(name) = (t1, e1); Some(name -> t1) }
      } catch { case e: Throwable =>
        // keep crashes OUT of the timing map and total — a fast
        // time-to-crash must not read as a speedup
        failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        None
      }
    }.toMap
    val suiteWallSec = (System.nanoTime() - suiteT0) / 1e9
    def isRegression(n: String, t: Double): Boolean =
      prev.get(n).exists(p => t > 2 * p && t - p > 0.5)
    // POST-SUITE REQUEUE (r12 verdict #1): any query whose reported
    // pass saw external load above cpus/8 is re-measured at the END,
    // after waiting (bounded) for the box to go quiet — in-run
    // min-of-2 cannot save a query when the whole window is busy.
    // The reported time is min(all passes); the pre-requeue value, the
    // external load at requeue time and the pre-pass idle reading ride
    // in `requeued` so the correction is itself evidence.
    //
    // r13 verdict #2: a REGRESSION vs the committed baseline is a
    // requeue candidate regardless of its own ext-cores reading —
    // BENCH_r13 shipped 11 phantom regressions (q117 7×) whose own
    // windows read low because the inflation came from co-scheduling,
    // GC or neighboring-window residue rather than overlap with the
    // timed bracket. A regression that disappears on a quiet requeue
    // is reported cleared (`regressions_cleared`), not shipped.
    val requeued = scala.collection.mutable.LinkedHashMap
      .empty[String, (Double, Double, Double, Double, Double)]
    // requeues whose re-measure REPRODUCED the suite-time (±15%) FROM
    // A QUIET WINDOW: agreement across two windows means the number is
    // the engine's honest cost and the suite-pass ext reading was a
    // false positive — IO-heavy queries (streaming checkpoint sinks)
    // SELF-generate "external" busy jiffies because buffered-write
    // flushes run in kernel worker threads, charged to the box
    // aggregate but never to /proc/self. Genuinely contended pairs
    // don't reproduce (r12's q134: 90.5 vs 37.8 s across two passes,
    // 1.26 s clean). The quiet-window requirement (r13 advice) closes
    // the steady-load false-clean: if external load persists across
    // BOTH windows — e.g. the quiet-wait budget ran out and the
    // requeue fired on a still-busy box — t3 reproduces tPrior for the
    // wrong reason, so reproduction only counts when the PRE-PASS idle
    // bracket read quiet (measured while we were idle, so it is all
    // external — unlike e3, which the self-induced writeback
    // contaminates for exactly the queries this path exists for);
    // otherwise the query falls through to the baseline-agreement
    // path, and the exhausted budget is recorded in the artifact.
    val reproduced = scala.collection.mutable.Set.empty[String]
    val extSuspects = results0.toSeq.filter { case (n, t) =>
      t > rerunThresholdSec && firstPass(n)._2 > contThresh }
    val regSuspects = results0.toSeq.filter { case (n, t) =>
      isRegression(n, t) && !extSuspects.exists(_._1 == n) }
    // regression suspects FIRST (each sorted largest-first): the wall
    // budget below can bound the phase out mid-queue, and an uncleared
    // REGRESSION ships in the artifact while an uncleared ext flag
    // only widens stillContended — spend the budget where a phantom
    // would otherwise ship
    val suspectsAll = regSuspects.sortBy(-_._2) ++
      extSuspects.sortBy(-_._2)
    // bounded so a pathologically noisy run cannot double the suite;
    // when the cap binds the skipped count is DISCLOSED in the
    // artifact (no-silent-caps convention) — capped-out suspects keep
    // their numbers and still flag via stillContended/regressions.
    val requeueCap = 60
    val suspects = suspectsAll.take(requeueCap)
    var nRequeueSkipped = suspectsAll.size - suspects.size
    var quietWaitMs = 120000L // shared budget across the whole phase
    var quietBudgetExhausted = false
    // WALL budget for the WHOLE requeue phase (r15 verdict #5): each
    // requeue is a quiet-window wait PLUS a full re-run, so on a loaded
    // box the phase itself becomes the run's dominant cost — the r15
    // driver run requeued 34 queries and shipped ~20% longer than the
    // same-code clean run. Bounded at max(90 s, 25% of the suite phase)
    // the phase degrades to DISCLOSURE instead of open-ended re-timing:
    // budget-skipped suspects keep their suite numbers and still flag
    // through stillContended/regressions, the exhaustion is stamped
    // (`requeue_budget_exhausted`), and every requeue records its own
    // quiet-wait seconds so the phase's economics are in the artifact.
    val requeueBudgetSec = math.max(90.0, 0.25 * suiteWallSec)
    var requeueBudgetExhausted = false
    val requeueT0 = System.nanoTime()
    def requeueElapsedSec: Double = (System.nanoTime() - requeueT0) / 1e9
    val results = results0 ++ suspects.flatMap { case (name, tPrior) =>
      if (requeueElapsedSec > requeueBudgetSec) {
        requeueBudgetExhausted = true; nRequeueSkipped += 1; None
      } else try {
        val w0 = System.nanoTime()
        var idle = extIdleCores(500)
        while (quietWaitMs > 0 && idle > contThresh) {
          Thread.sleep(1500); quietWaitMs -= 2000
          idle = extIdleCores(500)
        }
        if (idle > contThresh) quietBudgetExhausted = true
        // wait includes the idle probes — it is the phase's overhead
        // beyond the re-run itself
        val waitSec = (System.nanoTime() - w0) / 1e9
        val fn = SparkEntry.queries(name)
        val (t3, e3) = timedPass(fn, name)
        requeued(name) = (tPrior, t3, math.rint(e3 * 10) / 10,
          math.rint(idle * 10) / 10, math.rint(waitSec * 100) / 100)
        if (idle <= contThresh && math.abs(t3 - tPrior) <= 0.15 * tPrior)
          reproduced += name
        if (t3 < tPrior) { firstPass(name) = (t3, e3); Some(name -> t3) }
        else Some(name -> tPrior)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] requeue $name FAILED: ${e.getMessage}")
        None // keep the original measurement
      }
    }.toMap
    val requeuePhaseSec = math.rint(requeueElapsedSec * 100) / 100
    results.keys.foreach { n =>
      qext(n) = math.rint(firstPass(n)._2 * 10) / 10 }
    // A reported number is certified clean by ANY of three paths:
    //   (1) its own pass saw external load <= cpus/8;
    //   (2) the post-suite requeue REPRODUCED it (±15%);
    //   (3) it agrees with the committed clean per-query baseline
    //       (within 25% + 0.2 s) — the streaming replays' checkpoint
    //       writeback pollutes their ext reading EVERY run and their
    //       run-to-run variance exceeds the reproduction band, so
    //       cross-run agreement with a known-clean artifact is the
    //       decisive evidence there (a genuinely contended number
    //       fails all three: r12's q134 was 30x its baseline).
    // What remains is the honest residue.
    val stillContended = results.keys.toSeq.sorted.filter { n =>
      firstPass(n)._2 > contThresh && !reproduced(n) &&
        !prev.get(n).exists(p => results(n) <= 1.25 * p + 0.2)
    }
    val (la1, mem1) = loadFingerprint()
    val loadJson = s"""{"loadavg_start":$la0,"loadavg_end":$la1,""" +
      s""""ext_cores_start":${math.rint(startExt * 10) / 10},""" +
      s""""mem_avail_gb_start":$mem0,"mem_avail_gb_end":$mem1,""" +
      s""""cpus":$cpus}"""
    // One-field contention verdict (r10 judge ask, REBUILT after r12's
    // false-clean run): a run is contended iff any REPORTED number was
    // measured under external load above cpus/8 — judged from the
    // per-pass /proc/stat external-cores brackets, not from loadavg.
    // Loadavg cannot carry this verdict: the bench's own threads push
    // the end loadavg to 14-26 on provably idle boxes (BENCH_PREV,
    // BENCH_SF10), so a start-only check misses mid-run load (r12:
    // started exactly at 4.0, ~175 s of inflation followed) and a
    // max(start,end) check flags every clean run. The secondary
    // tripwire is the run-start INSTANTANEOUS external-cores sample
    // (startExt — measured while we were still idle, so it IS
    // external; the start loadavg was retired from the verdict after
    // false-flagging a clean run launched back-to-back with its own
    // predecessor's decayed loadavg residue, but still rides in
    // `load` as context).
    val contended = startExt > cpus.toDouble / 8.0 ||
      stillContended.nonEmpty
    // Run-level environment verdict (r15 verdict #1; see
    // [[runEnvironmentVerdict]]): suite total over the common-query
    // chain vs the committed prev, with the inflation the per-query
    // ext-cores story CAN explain (queries whose reported pass read
    // busy, or that stayed contention-flagged) subtracted. A >15%
    // unexplained whole-run inflation stamps the artifact
    // environment-suspect and every regression below ships with
    // status "unconfirmed" instead of certified.
    val commonQ = results.keys.toSeq.filter(prev.contains)
    val prevCommonTotal = commonQ.map(prev).sum
    val nowCommonTotal = commonQ.map(results).sum
    val stillSet = stillContended.toSet
    val explainedInfl = commonQ
      .filter(n => firstPass(n)._2 > contThresh || stillSet(n))
      .map(n => math.max(0.0, results(n) - prev(n))).sum
    val (suiteRatio, suiteSuspect) = runEnvironmentVerdict(
      nowCommonTotal, prevCommonTotal, explainedInfl, commonQ.size)
    // thin chains (subset/rehearsal runs, < 10 common queries) fall
    // back to the per-query MEDIAN ratio (r16 verdict #4) so a 1000×
    // artifact still carries a run-level verdict; the basis is named
    // in the artifact so a reader knows which gate judged it
    val (thinRatio, thinSuspect) =
      if (suiteRatio >= 0) (-1.0, false)
      else thinChainMedianRatio(results, prev)
    val envBasis =
      if (suiteRatio >= 0) "suite_total"
      else if (thinRatio >= 0) "per_query_median"
      else "none"
    val runEnvSuspect = suiteSuspect || thinSuspect
    val regStatus = if (runEnvSuspect) "unconfirmed" else "confirmed"
    val rerunJson = rerun.map { case (k, (a, b)) =>
      s"\"" + k + s"\":[$a,$b]"
    }.mkString("{", ",", "}")
    val requeuedJson = requeued.map { case (k, (a, b, e, idle, wait)) =>
      s"\"" + k + s"\":[$a,$b,$e,$idle,$wait]"
    }.mkString("{", ",", "}")
    val qextJson = qext.toSeq.sortBy(_._1).map { case (k, v) =>
      s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val stillJson = stillContended.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    // regression check vs the previous round's committed full artifact,
    // AFTER the requeue phase so a quiet-box re-measure can clear a
    // phantom; candidates that regressed in-suite but no longer do are
    // reported in `regressions_cleared` — evidence, not silence.
    val regressions = results.toSeq.sortBy(_._1).flatMap { case (k, v) =>
      prev.get(k).collect {
        case p if v > 2 * p && v - p > 0.5 =>
          s"""{"q":"$k","prev":$p,"now":$v,"status":"$regStatus"}"""
      }
    }
    val regJson = regressions.mkString("[", ",", "]")
    // prebuild evidence (r14 verdict #2): per-build [sec, ext_cores],
    // the contended flag, and a regression check against the previous
    // committed artifact's per-build map (absent in older artifacts →
    // check degrades to nothing, never to a failure)
    val idxBuildsJson = buildEvidence.map { case (k, (t, e)) =>
      s"\"" + k + s"\":[$t,$e]"
    }.mkString("{", ",", "}")
    val prevBuilds = prevBuildTimes(prevPath)
    // builds share the run-level blind spot (the r15 driver artifact's
    // index_build was 2.1× the clean figure with only a half-caught
    // disclosure) — their regression entries carry the same status
    val buildRegressions = buildEvidence.toSeq.flatMap { case (k, (t, _)) =>
      prevBuilds.get(k).collect {
        case p if t > 2 * p && t - p > 0.5 =>
          s"""{"build":"$k","prev":$p,"now":$t,"status":"$regStatus"}"""
      }
    }
    val buildRegJson = buildRegressions.mkString("[", ",", "]")
    val regressionsCleared = results0.keys.toSeq.sorted
      .filter(n => isRegression(n, results0(n)) &&
        !results.get(n).exists(isRegression(n, _)))
    val regClearedJson = regressionsCleared.map { n =>
      s"""{"q":"$n","suite":${results0(n)},"requeue":${results(n)}}"""
    }.mkString("[", ",", "]")
    val qs = results.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Streaming replays pay real readStream micro-batch + checkpoint
    // overhead (~57 s of the sf0.1 total in r11) that is NOT query
    // compute; reporting their bucket beside index_build keeps the
    // headline per-query trajectory honest as more streaming twins
    // land. The bucket is defined by module, not a name list: every
    // query StreamingQueries declares is an end-to-end replay.
    val streamingSec = math.rint(results.collect {
      case (k, v) if streamingSet(k) => v
    }.sum * 1000) / 1000
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val crossSfJson = crossSf
      .map { case (p, s) => s"""{"prev_sf":"$p","sf":"$s"}""" }
      .getOrElse("null")
    val envJson =
      s""""run_environment_suspect":$runEnvSuspect,""" +
        s""""env_ratio_basis":"$envBasis",""" +
        s""""thin_median_ratio":$thinRatio,""" +
        s""""suite_total_ratio":$suiteRatio,""" +
        s""""suite_prev_total":${math.rint(prevCommonTotal * 100) / 100},""" +
        s""""suite_now_total":${math.rint(nowCommonTotal * 100) / 100},""" +
        s""""suite_inflation_explained":${
          math.rint(explainedInfl * 100) / 100},""" +
        s""""requeue_sec":$requeuePhaseSec,""" +
        s""""requeue_budget_sec":${math.rint(requeueBudgetSec)},""" +
        s""""requeue_budget_exhausted":$requeueBudgetExhausted,""" +
        s""""cross_sf_compare":$crossSfJson"""
    // a crashing query must not masquerade as a fast one. Summary keys
    // (total, counts, failures) come BEFORE the per-query map so a
    // tail-truncated capture still carries the headline numbers.
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson,"index_build":$idxSec,"index_builds":$idxBuildsJson,"index_build_contended":$buildContended,"n_index_build_regressions":${buildRegressions.size},"index_build_regressions":$buildRegJson,"streaming_replay":$streamingSec,"contended":$contended,"n_contended_queries":${stillContended.size},"contended_queries":$stillJson,"load":$loadJson,"n_regressions":${regressions.size},"regressions":$regJson,"n_regressions_cleared":${regressionsCleared.size},"regressions_cleared":$regClearedJson,"n_requeue_skipped":$nRequeueSkipped,"quiet_wait_exhausted":$quietBudgetExhausted,$envJson,"rerun":$rerunJson,"requeued":$requeuedJson,"sf":"$sfDir","queries":$qs,"qext_cores":$qextJson}"""
    println(fullLine)
    // Self-contained side artifact: the stdout tail the driver keeps is
    // ~4 KB, so in a failure-heavy run neither printed line can carry
    // the complete failed list + per-query map. The file always does.
    // A SUBSET run (SPARK_GRAFT_ONLY) must never clobber the full-run
    // artifact — the r10 judge's 8-query adjudication overwrote the
    // driver's uncommitted BENCH_FULL.json. Subset runs get their own
    // default file; SPARK_GRAFT_BENCH_OUT still overrides either.
    try {
      val defaultOut =
        if (only.isDefined) "BENCH_SUBSET.json" else "BENCH_FULL.json"
      val p = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (fullLine + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] side-file write failed: ${e.getMessage}")
    }
    // At 179 queries the line above is ~9 KB while the driver keeps only
    // the LAST ~4 KB of output — the leading summary keys fall off the
    // front of the window. Re-print the summary alone on its own short
    // line so a tail-truncated capture always carries a parseable total
    // plus the self-evidencing bits (load, regression count, capped
    // regression list). Lists here are CAPPED (10 failures / 5
    // regressions): in a failure-heavy run — exactly when the tail
    // capture matters — an unbounded list would push this line past the
    // window too; the counts carry the magnitude and BENCH_FULL.json
    // (written above) carries everything.
    val failedCapped = failed.sorted.take(10).map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val regCapped = regressions.take(5).mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"failed":$failedCapped,"index_build":$idxSec,"index_build_contended":$buildContended,"n_index_build_regressions":${buildRegressions.size},"streaming_replay":$streamingSec,"contended":$contended,"n_contended_queries":${stillContended.size},"n_requeued":${requeued.size},"n_requeue_skipped":$nRequeueSkipped,"quiet_wait_exhausted":$quietBudgetExhausted,"run_environment_suspect":$runEnvSuspect,"env_ratio_basis":"$envBasis","thin_median_ratio":$thinRatio,"suite_total_ratio":$suiteRatio,"requeue_sec":$requeuePhaseSec,"requeue_budget_exhausted":$requeueBudgetExhausted,"load":$loadJson,"n_regressions":${regressions.size},"regressions":$regCapped,"n_regressions_cleared":${regressionsCleared.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
