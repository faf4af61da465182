package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.EventStream._

/** Drives the streaming operators with MemoryStream — incremental
  * batches, watermark advancement, state timeout — and checks the
  * windowed aggregation agrees with its batch twin.
  */
class EventStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("windowedStats on a stream matches the batch computation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = Seq(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(20), 1, "click", 2.0),
      Event(3, ts(65), 2, "view", 3.0),
      Event(4, ts(70), 1, "click", 4.0))

    val mem = MemoryStream[Event]
    val q = windowedStats(mem.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .select("win_start", "event_type", "cnt", "sum_val")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      val batch = windowedStats(events.toDF(), "1 hour", "2 hours")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(streamed == batch)
      assert(streamed == Set(
        (ts(0), "click", 2L, 3.0),
        (ts(60), "view", 1L, 3.0),
        (ts(60), "click", 1L, 4.0)))
    } finally q.stop()
  }

  test("streamingPsi scores each window against the static reference " +
      "and agrees with the batch Drift.psi twin") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // reference: uniform over 5 bins of [0, 10)
    val refHist = Seq(20L, 20L, 20L, 20L, 20L)
    // window 0: uniform (should match the reference, PSI ≈ 0);
    // window 1: all mass in the top bin (strong drift)
    val w0 = (0 until 50).map(i =>
      Event(i, ts(i % 50), 1, "e", (i % 5) * 2.0 + 0.5))
    val w1 = (0 until 50).map(i =>
      Event(100 + i, ts(60 + (i % 50)), 1, "e", 9.5))
    val mem = MemoryStream[Event]
    val q = streamingPsi(mem.toDF(), "value", refHist, 0.0, 10.0,
        "1 hour", "2 hours")
      .writeStream.format("memory").queryName("psi_out")
      .outputMode("complete").start()
    try {
      mem.addData(w0 ++ w1: _*)
      q.processAllAvailable()
      val got = spark.table("psi_out")
        .as[(Timestamp, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got(ts(0))._1 == 50L && got(ts(60))._1 == 50L)
      assert(math.abs(got(ts(0))._2) < 0.01)
      assert(got(ts(60))._2 > 0.25)
      // batch twin: Drift.psi of a synthetic ref frame vs each window
      val ref = (0 until 100).map(i => (i % 5) * 2.0 + 0.5).toDF("v")
      Seq(ts(0) -> w0, ts(60) -> w1).foreach { case (w, evs) =>
        val batch = graft.operators.Drift.psi(
            ref, evs.map(_.value).toDF("v"),
            org.apache.spark.sql.functions.col("v"), 0.0, 10.0, 5)
          .head().getAs[Double]("psi")
        assert(math.abs(batch - got(w)._2) < 1e-6,
          s"window $w: stream ${got(w)._2} vs batch $batch")
      }
    } finally q.stop()
  }

  test("streamingKsAtCutoffs equals the batch ksStatistic when the " +
      "cutoff grid covers both samples") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // values live on the grid 0.5, 2.5, 4.5, 6.5, 8.5 for both the
    // reference and the windows, so KS-at-cutoffs must EQUAL the
    // exact all-distinct-values batch statistic
    val grid = Seq(0.5, 2.5, 4.5, 6.5, 8.5)
    val refVals = (0 until 100).map(i => grid(i % 5))
    val refCum = grid.map(c => refVals.count(_ <= c).toLong)
    // window 0: same distribution (KS 0); window 1: all mass at 8.5
    val w0 = (0 until 50).map(i => Event(i, ts(i % 50), 1, "e", grid(i % 5)))
    val w1 = (0 until 50).map(i => Event(100 + i, ts(60 + (i % 50)), 1, "e", 8.5))
    val mem = MemoryStream[Event]
    val q = streamingKsAtCutoffs(mem.toDF(), "value", grid, refCum,
        refVals.size, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("ks_out")
      .outputMode("complete").start()
    try {
      mem.addData(w0 ++ w1: _*)
      q.processAllAvailable()
      val got = spark.table("ks_out")
        .as[(Timestamp, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got(ts(0))._1 == 50L && got(ts(60))._1 == 50L)
      assert(got(ts(0))._2 == 0.0)
      assert(got(ts(60))._2 == 0.8) // |1.0 - 0.2| at cutoff 6.5
      val ref = refVals.toDF("v")
      Seq(ts(0) -> w0, ts(60) -> w1).foreach { case (w, evs) =>
        val batch = graft.operators.Drift.ksStatistic(
            ref, evs.map(_.value).toDF("v"), col("v"))
          .head().getAs[Double]("ks")
        assert(batch == got(w)._2,
          s"window $w: stream ${got(w)._2} vs batch $batch")
      }
    } finally q.stop()
  }

  test("sessionize closes sessions on inactivity gap as watermark advances") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS(), gapMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then silence;
      // user 2: single event. A later batch far in the future advances
      // the watermark past both sessions' timeouts.
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0),
        Event(3, ts(2), 2, "view", 5.0))
      q.processAllAvailable()
      mem.addData(Event(9, ts(600), 3, "late", 0.0))
      q.processAllAvailable()
      mem.addData(Event(10, ts(1200), 3, "later", 0.0))
      q.processAllAvailable()
      val sessions = spark.table("sess_out").as[Session].collect()
        .map(se => se.user_id -> ((se.n_events, se.total_value))).toMap
      assert(sessions(1L) == ((2L, 3.0)))
      assert(sessions(2L) == ((1L, 5.0)))
    } finally q.stop()
  }

  test("parquet file source streams incrementally through windowedStats") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val schema = Seq.empty[Event].toDF().schema
    Seq(Event(1, ts(5), 1, "click", 1.0))
      .toDF().write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = windowedStats(stream, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("file_win")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("file_win").count() == 1)
      // a second file arrives; the same query picks it up incrementally
      Seq(Event(2, ts(70), 2, "view", 3.0))
        .toDF().write.mode("append").parquet(dir)
      q.processAllAvailable()
      val rows = spark.table("file_win")
        .select("event_type", "cnt").as[(String, Long)].collect().toSet
      assert(rows == Set(("click", 1L), ("view", 1L)))
    } finally q.stop()
  }

  test("dedupWithinWatermark drops re-seen keys across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = dedupWithinWatermark(mem.toDF(), Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 1, "click", 2.0)) // same key, same batch
      q.processAllAvailable()
      mem.addData(Event(3, ts(2), 1, "click", 3.0)) // same key, later batch
      mem.addData(Event(4, ts(3), 2, "view", 4.0))  // new key
      q.processAllAvailable()
      val got = spark.table("dedup_out").select("event_id")
        .as[Long].collect().toSet
      assert(got == Set(1L, 4L), s"got $got")
    } finally q.stop()
  }

  test("stream-static enrichment joins each micro-batch against the dim") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("cust_id", "tier")
    val mem = MemoryStream[Event]
    val q = enriched(mem.toDF(), dim, "user_id", "cust_id", Seq("tier"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      mem.addData(Event(1, ts(0), 1, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Event(2, ts(1), 2, "view", 2.0),
        Event(3, ts(2), 9, "view", 3.0)) // 9: no dim row -> null tier
      q.processAllAvailable()
      val out = spark.table("enrich_out")
        .select("event_id", "tier").as[(Long, Option[String])]
        .collect().toMap
      assert(out == Map(1L -> Some("gold"), 2L -> Some("basic"), 3L -> None))
    } finally q.stop()
  }

  test("windowed stats stream to a partitioned parquet sink, append mode") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("stream_out")
    val ckpt = java.nio.file.Files.createTempDirectory("stream_ckpt")
    val mem = MemoryStream[Event]
    val q = toPartitionedParquet(
      windowedStats(mem.toDF(), "1 hour", "1 hour"),
      out.toString, ckpt.toString, Seq("event_type"))
    try {
      mem.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(20), 1, "click", 2.0),
        Event(3, ts(30), 2, "view", 3.0))
      q.processAllAvailable()
      // advance the watermark far past hour 0 so its windows finalize
      mem.addData(Event(9, ts(600), 3, "late", 0.0))
      q.processAllAvailable()
      mem.addData(Event(10, ts(1200), 3, "later", 0.0))
      q.processAllAvailable()
      // directory-per-value layout + finalized hour-0 rows present
      val clickDir = out.resolve("event_type=click")
      assert(java.nio.file.Files.isDirectory(clickDir),
        s"expected partition dir $clickDir")
      val rows = spark.read.parquet(out.toString)
        .select("event_type", "cnt", "sum_val")
        .as[(String, Long, Double)].collect().toSet
      assert(rows.contains(("click", 2L, 3.0)))
      assert(rows.contains(("view", 1L, 3.0)))
    } finally {
      q.stop()
      import scala.jdk.CollectionConverters._
      Seq(out, ckpt).foreach { d =>
        java.nio.file.Files.walk(d).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }

  test("stream-stream interval join pairs events inside the window only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val purchases = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    // clicks within [purchase - 30 min, purchase) attach; others don't
    val joined = intervalJoin(
      purchases.toDF().select("event_id", "ts", "user_id"),
      clicks.toDF().select("event_id", "ts", "user_id"),
      "user_id", "-30 minutes", "0 seconds")
    val q = joined
      .select(col("l_event_id"), col("r_event_id"))
      .writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      clicks.addData(
        Event(100, ts(10), 1, "click", 0), // in-window for purchase@35
        Event(101, ts(34), 1, "click", 0), // in-window
        Event(102, ts(35), 1, "click", 0), // AT purchase ts → excluded
        Event(103, ts(10), 2, "click", 0)) // other user
      purchases.addData(Event(200, ts(35), 1, "purchase", 0))
      q.processAllAvailable()
      val got = spark.table("ij_out").as[(Long, Long)].collect().toSet
      assert(got == Set((200L, 100L), (200L, 101L)))
    } finally q.stop()
  }

  test("streamingNearDupCandidates: clones caught across micro-batches, distinct texts stay") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "completely different content about spark structured streaming state"
    val mem = MemoryStream[Doc]
    val q = streamingNearDupCandidates(mem.toDS())
      .writeStream.format("memory").queryName("sdup_out")
      .outputMode("append").start()
    try {
      mem.addData(Doc(1, textA), Doc(2, textB))
      q.processAllAvailable()
      // nothing similar yet
      assert(spark.table("sdup_out").count() == 0)
      // a later batch delivers an exact clone of doc 1 and a fresh doc
      mem.addData(Doc(100, textA),
        Doc(3, "yet another unrelated document body with novel words"))
      q.processAllAvailable()
      val rows = spark.table("sdup_out")
        .as[DupCandidate].collect().toSeq
      // identical text → identical fingerprint → all 4 chunks match
      assert(rows.map(r => (r.id_a, r.id_b)).distinct == Seq((1L, 100L)))
      assert(rows.length == 4 && rows.forall(_.hamming == 0))
      assert(rows.map(_.chunk_idx).sorted == Seq(0, 1, 2, 3))
    } finally q.stop()
  }

  test("streamingSubstringScreen: re-crawls screen at 1.0, novel text " +
      "at 0, and every row matches the batch twin exactly") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "an entirely different document about spark physical plans"))
      .toDF("doc_id", "text")
    val wIdx = graft.operators.Dedup.winnowAnchorIndex(corpus, "doc_id",
      "text", spec = "stream-wnidx", numBuckets = 4)
    val batch = Seq(
      Doc(10, "the quick brown fox jumps over the lazy dog tonight"),
      Doc(11, "qq ww ee rr tt yy uu ii oo zz xx cc vv bb nn mm kk jj"),
      Doc(12, "the quick brown fox jumps over the lazy dog tonight " +
        "qq ww ee rr tt yy uu ii oo zz xx"),
      Doc(13, "short")) // < k codepoints: no anchors, no row
    val mem = MemoryStream[Doc]
    // fpp tight enough that the fixture's handful of grams cannot
    // collide — the bloom is deterministic, so this is a fixed outcome
    val q = streamingSubstringScreen(mem.toDS(), wIdx, fpp = 1e-6)
      .writeStream.format("memory").queryName("wscreen_out")
      .outputMode("append").start()
    try {
      mem.addData(batch.take(2): _*)
      q.processAllAvailable()
      mem.addData(batch.drop(2): _*) // across micro-batches
      q.processAllAvailable()
      val got = spark.table("wscreen_out")
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got.keySet == Set(10L, 11L, 12L))
      assert(got(10L)._1 == got(10L)._2 && got(10L)._3 == 1.0,
        s"re-crawl must fully hit: ${got(10L)}")
      assert(got(11L)._2 == 0L && got(11L)._3 == 0.0,
        s"novel text must miss: ${got(11L)}")
      assert(got(12L)._2 > 0L && got(12L)._2 < got(12L)._1,
        s"mixed text must partially hit: ${got(12L)}")
      // exact agreement with the batch twin (no false positive fired
      // at this fpp, so the bloom screen IS the index join here)
      val want = graft.operators.Dedup.substringDupAgainstIndex(
          batch.toDF(), "doc_id", "text", wIdx)
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == want)
    } finally q.stop()
  }

  test("streamingNearDupCandidates matches the batch pigeonhole contract on a planted perturbation") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val perturbed = base.replace("token7", "token7x") // few-bit flip
    val mem = MemoryStream[Doc]
    val q = streamingNearDupCandidates(mem.toDS())
      .writeStream.format("memory").queryName("sdup2_out")
      .outputMode("append").start()
    try {
      mem.addData(Doc(1, base))
      q.processAllAvailable()
      mem.addData(Doc(2, perturbed))
      q.processAllAvailable()
      val pairs = spark.table("sdup2_out").as[DupCandidate].collect()
      val h = java.lang.Long.bitCount(
        Seq(base).toDF("text")
          .select(graft.functions.VectorExprs.simhash64(
            graft.operators.TextAnalysis.wsTokens(lower(col("text")))))
          .head().getLong(0) ^
        Seq(perturbed).toDF("text")
          .select(graft.functions.VectorExprs.simhash64(
            graft.operators.TextAnalysis.wsTokens(lower(col("text")))))
          .head().getLong(0))
      if (h <= 3)
        assert(pairs.map(r => (r.id_a, r.id_b)).distinct.toSeq ==
          Seq((1L, 2L)), s"hamming=$h must be caught")
      else assert(pairs.isEmpty, s"hamming=$h beyond budget must not pair")
    } finally q.stop()
  }

  test("upsertSnapshotSink folds changelog batches into a latest-wins " +
      "snapshot, versioned and pruned") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val (path, ckpt) = (s"$base/snap", s"$base/ckpt")
    // changelog rows: (k, bal, op, t, eid)
    val mem = MemoryStream[(Long, Double, String, Long, Long)]
    val q = EventStream.upsertSnapshotSink(
      mem.toDF().toDF("k", "bal", "op", "t", "eid"),
      path, ckpt, "k", Seq("t", "eid"), "op", deleteOp = "D")
    try {
      // batch 0: insert k=1, k=2 (k=1 updated twice in-batch)
      mem.addData((1L, 10.0, "U", 1L, 1L), (1L, 11.0, "U", 2L, 2L),
        (2L, 20.0, "U", 1L, 3L))
      q.processAllAvailable()
      val s0 = EventStream.readSnapshot(spark, path)
        .as[(Long, Double)].collect().toSet
      assert(s0 == Set((1L, 11.0), (2L, 20.0)))
      // batch 1: update k=1, delete k=2, insert k=3
      mem.addData((1L, 12.0, "U", 3L, 4L), (2L, 0.0, "D", 3L, 5L),
        (3L, 30.0, "U", 3L, 6L))
      q.processAllAvailable()
      val s1 = EventStream.readSnapshot(spark, path)
        .as[(Long, Double)].collect().toSet
      assert(s1 == Set((1L, 12.0), (3L, 30.0)))
      // versioned layout: the newest version is always present and
      // old versions prune down to keepVersions
      val vs = new java.io.File(path).listFiles()
        .filter(_.getName.startsWith("v=")).map(_.getName).sorted
      assert(vs.length <= 2 && vs.contains("v=1"), vs.mkString(","))
    } finally q.stop()
  }

  test("streamingKsAtCutoffs rejects a negative leading cumulative " +
      "count (it would corrupt every |diff|)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val e = intercept[IllegalArgumentException] {
      streamingKsAtCutoffs(mem.toDF(), "value",
        cutoffs = Seq(1.0, 2.0), refCum = Seq(-5L, 10L), refN = 10L)
    }
    assert(e.getMessage.contains("non-negative"))
  }
}
