package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's RUN-LEVEL evidence machinery (r15 verdict #1/#2/#5),
  * tested as the pure functions they were factored into:
  *
  *   - the scale-chain guard must make a cross-scale regression
  *     compare fail LOUDLY at startup (the r14 "100×" artifact was a
  *     mislabeled 10× run that no machine check caught), while the
  *     deliberate skew A/B stays possible behind an explicit opt-in
  *     that is disclosed in-artifact;
  *   - the run-environment verdict must classify the r15 driver run
  *     (23% whole-suite inflation, clean per-query ext story, five
  *     phantom regressions certified) as SUSPECT using its real
  *     numbers, while leaving clean runs and per-query-attributed
  *     contention uncontested.
  */
class BenchEvidenceSpec extends AnyFunSuite {

  // ---- scale-chain guard -------------------------------------------

  test("cross-scale compare fails loudly by default") {
    val e = intercept[IllegalArgumentException] {
      Bench.checkScaleChain(Some("/root/testdata/sf0.1"),
        "/tmp/graft_sf10", allowCrossSf = false)
    }
    assert(e.getMessage.contains("scale-chain violation"))
    assert(e.getMessage.contains("/root/testdata/sf0.1"))
    assert(e.getMessage.contains("/tmp/graft_sf10"))
  }

  test("matching scales pass with no disclosure") {
    assert(Bench.checkScaleChain(Some("/tmp/graft_sf10"),
      "/tmp/graft_sf10", allowCrossSf = false).isEmpty)
  }

  test("absent prev sf (missing file / pre-field artifact) degrades to no check") {
    assert(Bench.checkScaleChain(None, "/tmp/graft_sf10",
      allowCrossSf = false).isEmpty)
  }

  test("explicit opt-in permits the skew A/B and returns the disclosure pair") {
    val d = Bench.checkScaleChain(Some("/tmp/graft_sf10"),
      "/tmp/graft_sf10_skew", allowCrossSf = true)
    assert(d.contains(("/tmp/graft_sf10", "/tmp/graft_sf10_skew")))
  }

  test("prevSfField reads the sf of a committed artifact") {
    // BENCH_PREV.json is the committed clean sf0.1 chain head
    assert(Bench.prevSfField("BENCH_PREV.json")
      .contains("/root/testdata/sf0.1"))
    assert(Bench.prevSfField("/nonexistent/path.json").isEmpty)
  }

  // ---- run-environment verdict -------------------------------------

  test("the r15 driver run's real numbers classify as environment-suspect") {
    // BENCH_r15: suite 201.4 s vs committed prev 163.8 s on identical
    // code (only comment-grade diffs), zero contended queries, so the
    // per-query ext story explained ~none of the 37.6 s inflation —
    // yet five regressions shipped certified. The gate must say
    // SUSPECT here.
    val (ratio, suspect) =
      Bench.runEnvironmentVerdict(201.36, 163.8, 0.0, 241)
    assert(ratio > 1.22 && ratio < 1.24)
    assert(suspect)
  }

  test("a clean run (ratio ~1) is not suspect") {
    val (ratio, suspect) =
      Bench.runEnvironmentVerdict(165.2, 163.8, 0.0, 241)
    assert(ratio < 1.15 && !suspect)
  }

  test("inflation the per-query ext story explains is not run-suspect") {
    // 30% inflation, but 80% of it happened in queries whose own
    // windows read busy — the per-query machinery already attributes
    // it (stillContended/contended carry that verdict), so the
    // run-level gate stays quiet rather than double-flagging.
    val (ratio, suspect) =
      Bench.runEnvironmentVerdict(213.0, 163.8, 40.0, 241)
    assert(ratio > 1.15 && !suspect)
  }

  test("a faster-than-prev run is never suspect") {
    val (_, suspect) =
      Bench.runEnvironmentVerdict(150.0, 163.8, 0.0, 241)
    assert(!suspect)
  }

  test("a too-thin chain yields no verdict instead of a noisy one") {
    // subset runs (SPARK_GRAFT_ONLY) and first-ever runs have no
    // meaningful suite total to compare
    assert(Bench.runEnvironmentVerdict(9.0, 3.0, 0.0, 5) == (-1.0, false))
    assert(Bench.runEnvironmentVerdict(2.0, 0.5, 0.0, 241) == (-1.0, false))
  }

  // ---- thin-chain per-query-median verdict (r16 verdict #4: the
  // 5-shape 1000× rehearsal artifacts shipped with suite_total_ratio
  // -1 — no run-level certification at all, at exactly the scale a
  // re-measure costs 15 minutes) ----------------------------------

  test("the r16 1000x rehearsal's real numbers carry a clean thin verdict") {
    // BENCH_SF100_SUBSET committed pass values vs the discovery run's
    // shapes would ratio ~1; here: the committed artifact compared to
    // itself-with-jitter must read clean
    val prev = Map("q114_triangles" -> 241.8, "q145_basket_pairs" -> 436.4,
      "q153_set_similarity" -> 152.0, "q175_corpus_pipeline_e2e" -> 21.0,
      "q184_stream_sessionize" -> 29.6)
    val now = prev.map { case (k, v) => k -> v * 1.1 }
    val (ratio, suspect) = Bench.thinChainMedianRatio(now, prev)
    assert(math.abs(ratio - 1.1) < 0.001 && !suspect)
  }

  test("a synchronized >2x inflation across a thin chain is suspect") {
    // the environment signature: EVERY shape at 2.5x together — spill
    // variance (the disclosed ±2× per-shape swing) cannot put all five
    // medians past 2x simultaneously
    val prev = Map("a" -> 100.0, "b" -> 50.0, "c" -> 30.0,
      "d" -> 20.0, "e" -> 10.0)
    val now = prev.map { case (k, v) => k -> v * 2.5 }
    val (ratio, suspect) = Bench.thinChainMedianRatio(now, prev)
    assert(ratio == 2.5 && suspect)
  }

  test("one shape at its spill-variance ceiling does not flag the run") {
    // q114-class ±2× swing on ONE shape while the rest hold: the
    // median stays put, the per-query regression machinery (not the
    // run-level gate) owns that story
    val prev = Map("a" -> 100.0, "b" -> 50.0, "c" -> 30.0,
      "d" -> 20.0, "e" -> 10.0)
    val now = prev ++ Map("a" -> 220.0)
    val (ratio, suspect) = Bench.thinChainMedianRatio(now, prev)
    assert(ratio == 1.0 && !suspect)
  }

  test("sub-second prev entries are excluded from the thin median") {
    // a 0.2 s query ratioing 5x on jitter must not poison the verdict;
    // with fewer than 3 qualifying queries there is no verdict at all
    val prev = Map("a" -> 0.2, "b" -> 0.3, "c" -> 40.0, "d" -> 20.0)
    val now = Map("a" -> 1.0, "b" -> 1.5, "c" -> 41.0, "d" -> 21.0)
    assert(Bench.thinChainMedianRatio(now, prev) == (-1.0, false))
    val prev3 = prev ++ Map("e" -> 10.0)
    val now3 = now ++ Map("e" -> 10.5)
    val (ratio, suspect) = Bench.thinChainMedianRatio(now3, prev3)
    assert(ratio > 1.0 && ratio < 1.1 && !suspect)
  }

  // --- data-derived AQE initial shuffle width (r16: the 1000x
  // rehearsal went superlinear on 32-bucket spill; a FIXED 256 cost
  // +32% suite and x12 index_build at sf0.1 — the width must follow
  // the data) ---

  private def fakeScaleDir(tableBytes: Long*): java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("graft_width")
    // deleteOnExit runs in reverse registration order — dir first so
    // the files inside are gone by the time it is attempted; keeps
    // test-run tmp hygiene consistent with the repo's scratch
    // discipline (nothing graft_* survives a JVM exit)
    dir.toFile.deleteOnExit()
    tableBytes.zipWithIndex.foreach { case (n, i) =>
      val file = new java.io.File(dir.toFile, s"t$i.parquet")
      file.deleteOnExit()
      val f = new java.io.RandomAccessFile(file, "rw")
      try f.setLength(n) finally f.close() // sparse — no disk cost
    }
    dir
  }

  test("small-scale dirs resolve to the session width (committed " +
      "chains keep their static-era plans)") {
    // sf0.1's largest table is ~11 MB — under one 32 MB bucket
    val d = fakeScaleDir(11L << 20, 2L << 20)
    assert(Bench.initialShufflePartitions(d.toString, 32) == 32)
    // the true-100x directory (~1.1 GB largest) sits just above the
    // floor — 34 buckets, coalesced back to the same effective widths
    val d2 = fakeScaleDir(1100L << 20)
    assert(Bench.initialShufflePartitions(d2.toString, 32) == 34)
  }

  test("a 1000x-sized table widens the initial buckets, capped at " +
      "16x the session width") {
    // 11 GB largest table -> 11 GB / 32 MB = 352 initial buckets
    val d = fakeScaleDir(11L << 30)
    assert(Bench.initialShufflePartitions(d.toString, 32) == 352)
    // a terabyte-sized directory hits the cap, not an unbounded width
    val big = fakeScaleDir(1L << 40)
    assert(Bench.initialShufflePartitions(big.toString, 32) == 512)
  }

  test("a missing or empty scale dir falls back to the session width") {
    assert(Bench.initialShufflePartitions("/nonexistent", 32) == 32)
  }
}
