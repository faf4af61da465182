package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table access for the driver-generated testdata
  * (`/root/testdata/sf*`; schemas in FIXTURES.md §A).
  *
  * Reads go straight to `spark.read.parquet` so Catalyst can push
  * filters and prune columns into the scan — at 100 TB the scan is the
  * dominant cost and pushdown/pruning is the first-order optimization.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // One logical-plan cache per (session, path): re-reading a table
  // otherwise re-lists files and re-reads the footer schema per query —
  // pure fixed overhead when Bench/Verify run the whole inventory in
  // one session. DataFrames are immutable, so sharing is safe.
  private val cache = new SessionCache[DataFrame]

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events" &&
        !spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      // events.ts is parquet TIMESTAMP(NANOS). Older Spark rejects it
      // by default (PARQUET_TYPE_ILLEGAL) unless this legacy conf maps
      // it to an ns-epoch long; Spark 4.1+ ignores the conf and reads
      // it natively as TIMESTAMP_NTZ. Set the conf for the older path;
      // normalizeEventsTs below restores the long-ns contract on the
      // newer one, so both land on the same schema.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = cache.get(spark, s"$sfDir/$name.parquet")(
      spark.read.parquet(s"$sfDir/$name.parquet"))
    if (name == "events") {
      // time-range predicates on the ns-epoch projection must keep
      // pruning parquet row groups — install the rewrite rule on
      // sessions built without the GraftExtensions conf (idempotent).
      // A session built WITH the extension already runs the rule in
      // its injected-rules batch; skip the extraOptimizations copy so
      // a table read doesn't mutate session state it doesn't need to.
      val viaExtensions = spark.conf
        .getOption("spark.sql.extensions")
        .exists(_.contains("graft.GraftExtensions"))
      if (!viaExtensions) {
        graft.plans.TsRangePushdown.ensureRegistered(spark)
        // …and make the pushed range actually SKIP: Spark's parquet
        // reader builds no FilterPredicate for TIMESTAMP_NTZ (r17
        // finding), so file-grain footer-stats pruning is the engine's
        // own job — see graft.plans.NtzFileSkip
        graft.plans.NtzFileSkip.ensureRegistered(spark)
      }
      normalizeEventsTs(df)
    } else df
  }

  /** Every events consumer (and every DuckDB oracle via `epoch_ns`) is
    * written against `ts: BIGINT` = ns since the epoch. Enforce that
    * contract regardless of how this Spark version surfaced the parquet
    * TIMESTAMP(NANOS) column:
    *   - LongType: legacy `nanosAsLong` read — exact ns, pass through.
    *   - TIMESTAMP_NTZ (Spark 4.1+ native read): the NTZ physical value
    *     IS wall-clock µs since the epoch, so `NtzMicrosExpr` (an
    *     identity reinterpretation, codegen pass-through) × 1000 gives
    *     the ns contract with zero zone math — session-tz-independent
    *     by construction, including DST-gap wall times that every
    *     cast-through-LTZ formula shifts under non-UTC sessions. The
    *     native read truncates ns→µs, but the driver testdata is
    *     µs-aligned (checked: 0 sub-µs rows at every SF), so ×1000
    *     reproduces the exact ns value the oracle computes.
    *   - TIMESTAMP (LTZ, defensive only): `unix_micros` is the instant
    *     ×1e6 (exact for UTC sessions, the engine's documented mode).
    * The conversion is a codegen'd column expression on top of the
    * scan; pushdown/pruning on the other columns is unaffected, and
    * `plans.TsRangePushdown` rewrites literal range predicates on the
    * derived ns back into pushable NTZ comparisons on the raw column.
    */
  private def normalizeEventsTs(df: DataFrame): DataFrame = {
    val nsCol: Option[Column] = df.schema("ts").dataType match {
      case LongType         => None
      case TimestampNTZType => Some(
        graft.functions.TimeExprs.ntzMicros(col("ts")) * lit(1000L))
      case TimestampType    => Some(unix_micros(col("ts")) * lit(1000L))
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other; expected ns-long, TIMESTAMP_NTZ or TIMESTAMP")
    }
    nsCol.fold(df)(c => df.withColumn("ts", c.cast(LongType)))
  }
}
