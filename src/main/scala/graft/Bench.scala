package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
    val idxSec = try {
      // the four artifacts are independent one-time builds; Spark
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
      val builds = Seq[() => Any](
        () => graft.queries.ExtendedQueries.prebuildIndexes(spark, sfDir),
        // one-time bucketed-layout builds (q66), same amortized-artifact
        // treatment as the ANN indexes
        () => graft.sources.Layout.bucketedTable(spark, sfDir, "lineitem",
          Seq("l_orderkey"), numBuckets = 8),
        () => graft.sources.Layout.bucketedTable(spark, sfDir, "orders",
          Seq("o_orderkey"), numBuckets = 8))
        .map(b => Future(b()).map(_ => true).recover { case e =>
          System.err.println(s"[bench] prebuild FAILED: ${e.getMessage}")
          false
        })
      val ok = Await.result(Future.sequence(builds), Duration.Inf)
      if (ok.forall(identity)) (System.nanoTime() - tIdx) / 1e9 else -1.0
    } catch { case e: Throwable =>
      System.err.println(s"[bench] index prebuild FAILED: ${e.getMessage}")
      -1.0
    }
    // optional subset for standalone profiling (comma-separated name
    // prefixes); the driver never sets it, so driver benches run all
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSeq.filter(_.nonEmpty))
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.startsWith))
    }
    val results = selected.flatMap { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        Some(name -> (System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        // keep crashes OUT of the timing map and total — a fast
        // time-to-crash must not read as a speedup
        failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        None
      }
    }.toMap
    val qs = results.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // a crashing query must not masquerade as a fast one. Summary keys
    // (total, counts, failures) come BEFORE the per-query map so a
    // tail-truncated capture still carries the headline numbers.
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson,"index_build":$idxSec,"sf":"$sfDir","queries":$qs}"""
    println(fullLine)
    // Self-contained side artifact: the stdout tail the driver keeps is
    // ~4 KB, so in a failure-heavy run neither printed line can carry
    // the complete failed list + per-query map. The file always does.
    try {
      val p = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (fullLine + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] side-file write failed: ${e.getMessage}")
    }
    // At 174+ queries the line above is ~8 KB while the driver keeps only
    // the LAST ~4 KB of output — the leading summary keys fall off the
    // front of the window. Re-print the summary alone on its own short
    // line so a tail-truncated capture always carries a parseable total.
    // The failed list here is CAPPED at 10 names: in a failure-heavy run
    // (exactly when the tail capture matters) an unbounded list would
    // push this line past the window too; n_failed carries the count and
    // BENCH_FULL.json (written above) carries the complete list.
    val failedCapped = failed.sorted.take(10).map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"failed":$failedCapped,"index_build":$idxSec,"sf":"$sfDir"}""")
    spark.stop()
  }
}
