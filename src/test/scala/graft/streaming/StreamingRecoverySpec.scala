package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.EventStream._

/** Kill-and-restart recovery for the stateful streaming operators: each
  * test runs a query against a checkpoint dir, STOPS it mid-stream, and
  * restarts the same pipeline on the same checkpoint — state continuity
  * (not just output append) is what's asserted:
  *
  *  - sessionize: an OPEN session spanning the restart must close as
  *    ONE merged session (buffered events live in the state store);
  *  - streamingNearDupCandidates: a fingerprint seen before the restart
  *    must still pair with a near-dup arriving after it;
  *  - upsertSnapshotSink: keys upserted before the restart must survive
  *    batches applied after it, with versions still pruned.
  *
  * MemoryStream is an offset-replayable source, so restart-from-
  * checkpoint exercises the same recovery path a file/Kafka source
  * takes; the in-process stop() is the strongest kill a single-JVM
  * suite can express (state must round-trip the on-disk state store
  * and the offset log either way).
  */
class StreamingRecoverySpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("sessionize: an open session spans a stop/restart and closes as " +
      "one merged session (state-store continuity)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = tmp("graft_sess_rec")
    val (out, ckpt) = (s"$base/out", s"$base/ckpt")
    val mem = MemoryStream[Event]
    def start() = sessionize(mem.toDS(), gapMs = 10 * 60 * 1000L)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val q1 = start()
    try {
      // two events 5 min apart — session OPEN when we kill the query
      mem.addData(Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0))
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start()
    try {
      // 7 min after the last pre-restart event: inside the 10-min gap,
      // so it extends the session ONLY if the buffered state survived
      mem.addData(Event(3, ts(12), 1, "click", 4.0))
      q2.processAllAvailable()
      // nudge the watermark (2h delay) past the session timeout, then
      // once more — timeouts fire on the batch AFTER the watermark moves
      mem.addData(Event(9, ts(600), 3, "late", 0.0))
      q2.processAllAvailable()
      mem.addData(Event(10, ts(1200), 3, "later", 0.0))
      q2.processAllAvailable()
      val sessions = spark.read.parquet(out).as[Session].collect()
        .filter(_.user_id == 1L)
      // state lost at restart ⇒ either two sessions for user 1, or one
      // with n_events = 1 — both named failures here
      assert(sessions.length == 1,
        s"expected ONE merged session, got ${sessions.toSeq}")
      assert(sessions.head.n_events == 3L && sessions.head.total_value == 7.0,
        s"restart dropped buffered events: ${sessions.head}")
      assert(sessions.head.started == ts(0) && sessions.head.ended == ts(12))
    } finally q2.stop()
  }

  test("streamingNearDupCandidates: fingerprints seen before a restart " +
      "still pair with post-restart arrivals (bucket-state continuity)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = tmp("graft_dup_rec")
    val (out, ckpt) = (s"$base/out", s"$base/ckpt")
    val mem = MemoryStream[Doc]
    def start() = streamingNearDupCandidates(mem.toDS())
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val text = "the quick brown fox jumps over the lazy dog again and again"
    val q1 = start()
    try {
      mem.addData(Doc(1, text),
        Doc(5, "completely different content about spark partitions"))
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start()
    try {
      // an exact clone of doc 1 arriving AFTER the restart: pairs only
      // if doc 1's fingerprint was recovered from the state store
      mem.addData(Doc(2, text))
      q2.processAllAvailable()
      val pairs = spark.read.parquet(out).as[DupCandidate].collect()
        .map(c => (c.id_a, c.id_b)).distinct.toSet
      assert(pairs.contains((1L, 2L)),
        s"pre-restart fingerprint lost: pairs=$pairs")
      assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L),
        s"distinct doc paired spuriously: $pairs")
    } finally q2.stop()
  }

  test("upsertSnapshotSink: keys upserted before a restart survive " +
      "post-restart batches; versions keep pruning") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = tmp("graft_cdc_rec")
    val (path, ckpt) = (s"$base/snap", s"$base/ckpt")
    val mem = MemoryStream[(Long, Double, String, Long, Long)]
    def start() = EventStream.upsertSnapshotSink(
      mem.toDF().toDF("k", "bal", "op", "t", "eid"),
      path, ckpt, "k", Seq("t", "eid"), "op", deleteOp = "D")

    val q1 = start()
    try {
      mem.addData((1L, 10.0, "U", 1L, 1L), (2L, 20.0, "U", 1L, 2L))
      q1.processAllAvailable()
      assert(EventStream.readSnapshot(spark, path)
        .as[(Long, Double)].collect().toSet == Set((1L, 10.0), (2L, 20.0)))
    } finally q1.stop()

    val q2 = start()
    try {
      // update k=2, insert k=3, delete k=1 — k=2's pre-restart history
      // and k=1's existence only survive via the versioned base chain
      mem.addData((2L, 21.0, "U", 2L, 3L), (3L, 30.0, "U", 2L, 4L),
        (1L, 0.0, "D", 2L, 5L))
      q2.processAllAvailable()
      val snap = EventStream.readSnapshot(spark, path)
        .as[(Long, Double)].collect().toSet
      assert(snap == Set((2L, 21.0), (3L, 30.0)),
        s"snapshot diverged after restart: $snap")
      val vs = new java.io.File(path).listFiles()
        .filter(_.getName.startsWith("v=")).map(_.getName)
      assert(vs.length <= 2, s"version pruning stopped: ${vs.mkString(",")}")
    } finally q2.stop()
  }

  test("retractableRollupSink: retraction folds span a restart; an " +
      "emptied group vanishes and a later re-insert revives it") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = tmp("graft_retract_rec")
    val (path, ckpt) = (s"$base/snap", s"$base/ckpt")
    val mem = MemoryStream[(String, String, Option[Double], Option[Double])]
    def start() = EventStream.retractableRollupSink(
      mem.toDF().toDF("k", "op", "old_value", "new_value"),
      path, ckpt, Seq("k"), "cnt", "sv")
    def snap(): Map[String, (Long, Double)] =
      EventStream.readSnapshot(spark, path).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getDecimal(2).doubleValue))).toMap

    val q1 = start()
    try {
      mem.addData(("a", "I", None, Some(1.0)), ("a", "I", None, Some(2.0)),
        ("b", "I", None, Some(5.0)))
      q1.processAllAvailable()
      assert(snap() == Map("a" -> ((2L, 3.0)), "b" -> ((1L, 5.0))))
    } finally q1.stop()

    val q2 = start()
    try {
      // post-restart: retract BOTH a facts (the group must VANISH —
      // count reached zero) and update b 5 -> 7; a's pre-restart state
      // only survives via the versioned base chain
      mem.addData(("a", "D", Some(1.0), None), ("a", "D", Some(2.0), None),
        ("b", "U", Some(5.0), Some(7.0)))
      q2.processAllAvailable()
      assert(snap() == Map("b" -> ((1L, 7.0))), snap().toString)
      // a later batch re-inserts the emptied group — it must revive
      // from nothing, not from stale state
      mem.addData(("a", "I", None, Some(9.0)))
      q2.processAllAvailable()
      assert(snap() == Map("a" -> ((1L, 9.0)), "b" -> ((1L, 7.0))))
      val vs = new java.io.File(path).listFiles()
        .filter(_.getName.startsWith("v=")).map(_.getName)
      assert(vs.length <= 2, s"version pruning stopped: ${vs.mkString(",")}")
    } finally q2.stop()
  }
}
