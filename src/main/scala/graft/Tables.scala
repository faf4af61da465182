package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
      // events.ts is parquet TIMESTAMP(NANOS), which Spark rejects by
      // default (PARQUET_TYPE_ILLEGAL). Read it as an ns-epoch long —
      // exact (no micro truncation), totally ordered, and directly
      // comparable to DuckDB's epoch_ns(ts) in oracle SQL. Our own
      // entrypoints (Bench/Verify/PipelineMain) set this at session
      // build; this guarded set covers driver-owned sessions only, and
      // only once.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    cache.get(spark, s"$sfDir/$name.parquet")(
      spark.read.parquet(s"$sfDir/$name.parquet"))
  }
}
