package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Pins the ns-epoch range-pushdown rewrite: a time-range predicate on
  * the normalized events `ts` (bigint ns) must reach the parquet scan
  * as a pushed filter on the raw TIMESTAMP_NTZ column, and the rewrite
  * must be value-exact for ragged (non-multiple-of-1000) boundaries in
  * every comparison direction — the floor/ceil division cases.
  */
class TsRangePushdownSpec extends SparkSpec {

  private def events = Tables(spark, sf, "events")

  private lazy val allNs: Seq[Long] = {
    // ground truth via the normalized column itself, fully collected
    events.select("ts").collect().map(_.getLong(0)).toSeq
  }

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("range predicates on ts reach the scan as pushed NTZ filters") {
    val lo = 1704067200000000000L // 2024-01-01T00:00:00Z in ns
    val hi = 1705276800000000000L // 2024-01-15T00:00:00Z
    val plan = physical(
      events.filter(col("ts") > lit(lo) && col("ts") <= lit(hi))
        .select("event_id"))
    assert(plan.contains("GreaterThan(ts,"), plan)
    assert(plan.contains("LessThanOrEqual(ts,"), plan)
  }

  test("rewritten comparisons are value-exact on ragged ns boundaries") {
    // boundaries deliberately NOT multiples of 1000 (and one exactly on
    // a stored value ±1ns) so floor vs ceil division is load-bearing
    val mid = allNs(allNs.length / 2)
    val boundaries = Seq(mid - 1, mid, mid + 1, mid + 499, mid + 999,
      mid - 999, 1704153600000000001L, 1704586423778549499L)
    for (b <- boundaries) {
      def cnt(df: org.apache.spark.sql.DataFrame): Long = df.count()
      assert(cnt(events.filter(col("ts") > lit(b))) ==
        allNs.count(_ > b).toLong, s"> $b")
      assert(cnt(events.filter(col("ts") >= lit(b))) ==
        allNs.count(_ >= b).toLong, s">= $b")
      assert(cnt(events.filter(col("ts") < lit(b))) ==
        allNs.count(_ < b).toLong, s"< $b")
      assert(cnt(events.filter(col("ts") <= lit(b))) ==
        allNs.count(_ <= b).toLong, s"<= $b")
      // mirrored literal-first orientation
      assert(cnt(events.filter(lit(b) <= col("ts"))) ==
        allNs.count(_ >= b).toLong, s"$b <=")
      assert(cnt(events.filter(lit(b) > col("ts"))) ==
        allNs.count(_ < b).toLong, s"$b >")
    }
  }

  test("boundary counts match a fully independent ground truth (raw NTZ " +
      "read, JVM epoch math — no graft normalization in the oracle path)") {
    // The value-exact test above derives allNs from the normalized
    // column itself, so a constant-offset normalization bug would
    // cancel out there. This oracle never touches graft code: read the
    // parquet directly, collect ts as java.time.LocalDateTime (Spark's
    // native NTZ external type), and compute ns-since-epoch with plain
    // JVM time arithmetic (NTZ wall-clock fields == UTC instant by the
    // ns-epoch contract).
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val independentNs: Seq[Long] = raw.select("ts").collect().map { r =>
      r.get(0) match {
        case ldt: java.time.LocalDateTime =>
          ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L +
            ldt.getNano
        case l: java.lang.Long => l.longValue() // legacy nanosAsLong read
        case other => fail(s"unexpected ts external type: $other")
      }
    }.toSeq
    assert(independentNs.sorted == allNs.sorted,
      "normalized ts diverges from the independent JVM-computed epoch ns")
    val b = 1704586423778549499L // ragged, exercises floor/ceil rewrite
    assert(events.filter(col("ts") > lit(b)).count() ==
      independentNs.count(_ > b).toLong)
    assert(events.filter(col("ts") <= lit(b)).count() ==
      independentNs.count(_ <= b).toLong)
  }

  test("equality: divisible literal rewrites and matches; ragged literal " +
      "stays correct (unrewritten)") {
    val hit = allNs.head // stored values are µs-aligned → divisible
    assert(events.filter(col("ts") === lit(hit)).count() ==
      allNs.count(_ == hit).toLong)
    val plan = physical(events.filter(col("ts") === lit(hit))
      .select("event_id"))
    assert(plan.contains("EqualTo(ts,"), plan)
    // a non-divisible ns value can never equal a µs-truncated ts ns
    assert(events.filter(col("ts") === lit(hit + 1)).count() == 0L)
  }
}
