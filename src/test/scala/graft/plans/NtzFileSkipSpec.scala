package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

import graft.{SparkSpec, Tables}

/** Pins the footer-stats FILE skip for NTZ ranges (the r17 finding:
  * Spark's parquet reader builds no FilterPredicate for TIMESTAMP_NTZ,
  * so TsRangePushdown's claimed-pushed range skipped NOTHING — a
  * time-slice read every row group at every scale). The contract:
  *
  *   1. a ts range slice over a time-clustered multi-file table scans
  *      ONLY the files whose footer [min, max] overlaps the range —
  *      measured from the executed scan's own numFiles metric;
  *   2. pruning is a pure optimization: results are row-identical to
  *      the same predicate made opaque to every pruning path, across
  *      ragged ±1 µs boundaries in all four comparison directions and
  *      both literal orientations (the strict-bound tightening must be
  *      exact integer math);
  *   3. null timestamps never change results (a range conjunct rejects
  *      them with or without the skip);
  *   4. filters without an NTZ range leave the scan untouched, and the
  *      bound extraction reads conjuncts exactly (unit-level).
  */
class NtzFileSkipSpec extends SparkSpec {

  private val NFiles = 8
  private val NRows = 8000L // one row per minute from 2024-01-01T00:00

  /** Minute-grain NTZ events across ~5.5 days, range-clustered into
    * [[NFiles]] files — the ingest-order layout the skip exists for.
    */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_ntzskip")
    d.toFile.deleteOnExit()
    spark.range(NRows)
      .selectExpr("id AS event_id",
        "timestampadd(MINUTE, CAST(id AS INT), " +
          "TIMESTAMP_NTZ'2024-01-01 00:00:00') AS ts",
        "id % 50 AS user_id",
        "CAST(id % 5 AS STRING) AS event_type",
        "CAST(id AS DOUBLE) / 7 AS value",
        "'{}' AS props")
      .repartitionByRange(NFiles, col("ts"))
      .sortWithinPartitions("ts")
      .write.parquet(s"$d/events.parquet")
    d.toString
  }

  private def events: DataFrame = Tables(spark, dir, "events")

  /** ns-epoch of minute `m` of the synthetic table. */
  private def ns(m: Long): Long = 1704067200000000000L + m * 60000000000L

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case f: FileSourceScanExec => Seq(f)
    case o => o.children.flatMap(scans)
  }

  /** Execute df's own plan; return (files scanned, rows out of scan). */
  private def scanned(df: DataFrame): (Long, Long) = {
    df.queryExecution.toRdd.count()
    val s = scans(df.queryExecution.executedPlan)
    (s.map(_.metrics("numFiles").value).sum,
      s.map(_.metrics("numOutputRows").value).sum)
  }

  private def keys(df: DataFrame): Set[Long] =
    df.select("event_id").collect().map(_.getLong(0)).toSet

  test("a ts slice scans only the files whose stats overlap the range") {
    // minutes [2000, 3000): 1/8 of the span — at most 2 of 8 files can
    // straddle it
    val df = events
      .filter(col("ts") >= lit(ns(2000)) && col("ts") < lit(ns(3000)))
      .select("event_id")
    val (files, rows) = scanned(df)
    assert(files <= 2 && files >= 1, s"files=$files")
    assert(rows < NRows / 2, s"rows=$rows") // row groups, not the table
    assert(keys(df) == (2000L until 3000L).toSet)
  }

  test("pruning is a pure optimization across ragged boundaries and " +
      "orientations") {
    // abs() on the positive-ns domain is the identity but opaque to
    // the rewrite, the pushdown, and the file skip — the unpruned twin
    def opaque(c: org.apache.spark.sql.Column) = abs(c)
    val ragged = Seq(ns(2000), ns(2000) + 1, ns(2000) - 1,
      ns(2000) + 999, ns(2000) + 1000, ns(2999) + 59999999999L)
    for (b <- ragged) {
      assert(keys(events.filter(col("ts") > lit(b))) ==
        keys(events.filter(opaque(col("ts")) > lit(b))), s"> $b")
      assert(keys(events.filter(col("ts") >= lit(b))) ==
        keys(events.filter(opaque(col("ts")) >= lit(b))), s">= $b")
      assert(keys(events.filter(col("ts") < lit(b))) ==
        keys(events.filter(opaque(col("ts")) < lit(b))), s"< $b")
      assert(keys(events.filter(col("ts") <= lit(b))) ==
        keys(events.filter(opaque(col("ts")) <= lit(b))), s"<= $b")
      assert(keys(events.filter(lit(b) <= col("ts"))) ==
        keys(events.filter(lit(b) <= opaque(col("ts")))), s"$b <=")
      assert(keys(events.filter(lit(b) > col("ts"))) ==
        keys(events.filter(lit(b) > opaque(col("ts")))), s"$b >")
    }
  }

  test("a slice aligned exactly on a file boundary stays exact") {
    // files are range-partitioned ~evenly; take one file's exact
    // [min, max] from its own rows and slice precisely on it — the
    // inclusive-bound math must keep that file and lose the rest
    val bounds = events
      .filter(col("ts") >= lit(ns(1000)) && col("ts") < lit(ns(1001)))
    assert(keys(bounds) == Set(1000L))
    val (files, _) = scanned(bounds.select("event_id"))
    assert(files == 1, s"files=$files")
  }

  test("null timestamps never change results") {
    val d = java.nio.file.Files.createTempDirectory("graft_ntzskip_null")
    d.toFile.deleteOnExit()
    spark.range(2000)
      .selectExpr("id AS event_id",
        "CASE WHEN id % 97 = 0 THEN NULL ELSE timestampadd(MINUTE, " +
          "CAST(id AS INT), TIMESTAMP_NTZ'2024-01-01 00:00:00') END AS ts",
        "id AS user_id", "'a' AS event_type", "1.0 AS value",
        "'{}' AS props")
      .repartitionByRange(4, col("event_id"))
      .write.parquet(s"$d/events.parquet")
    val t = Tables(spark, d.toString, "events")
    val got = t.filter(col("ts") >= lit(ns(500)) && col("ts") < lit(ns(700)))
      .select("event_id").collect().map(_.getLong(0)).toSet
    val want = (500L until 700L).filterNot(_ % 97 == 0).toSet
    assert(got == want)
  }

  test("filters without an NTZ range leave the scan untouched") {
    val df = events.filter(col("value") > 100.0).select("event_id")
    val (files, _) = scanned(df)
    assert(files == NFiles, s"files=$files")
  }

  test("bound extraction: conjuncts, strict tightening, orientations") {
    val ts = AttributeReference("ts", TimestampNTZType)()
    def l(v: Long) = Literal(v, TimestampNTZType)
    val b1 = NtzFileSkip.ntzBounds(
      And(GreaterThan(ts, l(100)), LessThanOrEqual(ts, l(900))))("ts")
    assert(b1.lo == 101 && b1.hi == 900)
    val b2 = NtzFileSkip.ntzBounds(
      And(GreaterThanOrEqual(l(500), ts), LessThan(l(50), ts)))("ts")
    assert(b2.lo == 51 && b2.hi == 500)
    val b3 = NtzFileSkip.ntzBounds(EqualTo(ts, l(42)))("ts")
    assert(b3.lo == 42 && b3.hi == 42)
    // a disjunction must extract nothing — only top-level conjuncts
    // are row-rejection proofs
    assert(NtzFileSkip.ntzBounds(
      Or(GreaterThan(ts, l(100)), LessThan(ts, l(10)))).isEmpty)
    // non-NTZ comparisons contribute nothing
    val x = AttributeReference("x", org.apache.spark.sql.types.LongType)()
    assert(NtzFileSkip.ntzBounds(GreaterThan(x, Literal(5L))).isEmpty)
  }
}
