package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CRASH-IDEMPOTENCE contract for the REGISTRY-BACKED delta families
  * (r15 verdict #3): the frame-transform merges (KMV q220, histogram
  * q227, Bloom q239, components q218/q230) are pure — but their
  * CALLERS persist registries, and a re-run of a caller-side
  * merge-and-overwrite after a partial write is exactly the hazard the
  * IVF/IVF-PQ batch layer got a spec for in r15 while these families
  * only argued it in scaladoc. This spec converts the argument to
  * evidence under the engine's VERSIONED-SNAPSHOT convention:
  *
  *   registry versions are immutable dirs `reg/v=<n>`; a refresh job
  *   reads `v=n` and OVERWRITES `v=n+1` (never its own input), so
  *
  *   1. run-twice ≡ run-once — re-running a refresh rewrites the same
  *      `v=n+1` content (proven per family, including the
  *      NON-idempotent-merge one: histogram bin-add would double-count
  *      if a refresh read its own output, and the version layer is
  *      what makes the job idempotent anyway);
  *   2. crash repair — a simulated partial overwrite of `v=n+1` (the
  *      state a mid-write driver death leaves: a fraction of the
  *      refreshed rows visible) is healed by the re-run, and the input
  *      version `v=n` is untouched throughout;
  *   3. the refreshed registry equals a from-scratch recompute over
  *      base ∪ delta where the merge claims exactness (KMV set-union
  *      truncation, histogram bin addition, Bloom word-wise OR) — the
  *      same property the DuckDB oracles certify at query grain.
  *
  * The in-place hazard itself is demonstrated once (histogram
  * merge-twice ≠ merge-once on raw frames): that inequality is WHY the
  * convention is versioned dirs, not read-modify-overwrite-in-place.
  */
class RegistryIdempotenceSpec extends SparkSpec {
  import spark.implicits._

  private def reg(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/reg"

  private def vdir(root: String, v: Int): String = s"$root/v=$v"

  /** The versioned refresh job under test: read the immutable `from`
    * version, merge, overwrite the `to` version. Re-runs and crash
    * re-runs call exactly this.
    */
  private def refresh(root: String, from: Int, to: Int)
      (merge: DataFrame => DataFrame): Unit =
    merge(spark.read.parquet(vdir(root, from)))
      .write.mode("overwrite").parquet(vdir(root, to))

  /** Simulated mid-write death: a partial slice of the would-be
    * refreshed registry is already visible under `v=to`.
    */
  private def plantPartial(root: String, to: Int, full: DataFrame): Unit =
    full.limit(math.max(1, (full.count() / 2).toInt))
      .write.mode("overwrite").parquet(vdir(root, to))

  private def rows(path: String, cols: String*): Set[String] =
    spark.read.parquet(path)
      .select(cols.map(col): _*)
      .collect().map(_.mkString("|")).toSet

  private lazy val events = graft.Tables(spark, sf, "events")
  private lazy val base = events.filter(col("event_id") % 2 === 0)
  private lazy val delta = events.filter(col("event_id") % 2 === 1)

  // ---- KMV (q220's shape) ------------------------------------------

  private def kmvSketchOf(df: DataFrame): DataFrame =
    df.groupBy(col("event_type").cast("string").as("group"))
      .agg(graft.functions.KmvAgg.kmvSketch(64)(
        xxhash64(col("user_id"))).as("sk"))

  test("kmv registry refresh: run-twice ≡ run-once, crash-healed, = recompute") {
    val root = reg("graft_kmv_reg")
    kmvSketchOf(base).write.parquet(vdir(root, 0))
    val v0 = rows(vdir(root, 0), "group", "sk")
    def job(): Unit = refresh(root, 0, 1)(b =>
      Profiling.kmvDeltaMerge(b, delta,
        col("event_type"), xxhash64(col("user_id")), k = 64))
    job()
    val clean = rows(vdir(root, 1), "group", "sk")
    job() // run-twice
    assert(rows(vdir(root, 1), "group", "sk") == clean)
    plantPartial(root, 1, spark.read.parquet(vdir(root, 1)))
    assert(rows(vdir(root, 1), "group", "sk") != clean) // crash visible
    job() // heal
    assert(rows(vdir(root, 1), "group", "sk") == clean)
    assert(rows(vdir(root, 0), "group", "sk") == v0) // input untouched
    // exactness: bottom-k of a union = truncated union of bottom-ks
    assert(clean == kmvSketchOf(events).collect()
      .map(_.mkString("|")).toSet)
  }

  // ---- histogram (q227's shape — the NON-idempotent merge) ---------

  private def histOf(df: DataFrame): DataFrame =
    Profiling.histSketch(df, col("event_type"), col("value"),
      binWidth = 10.0)

  test("histogram registry refresh: versioning makes a non-idempotent merge safe") {
    val root = reg("graft_hist_reg")
    histOf(base).write.parquet(vdir(root, 0))
    def job(): Unit = refresh(root, 0, 1)(b =>
      Profiling.histMerge(b, histOf(delta)))
    job()
    val clean = rows(vdir(root, 1), "group", "bin", "cnt")
    job() // bin-add is NOT idempotent, but the job is: input is v=0
    assert(rows(vdir(root, 1), "group", "bin", "cnt") == clean)
    plantPartial(root, 1, spark.read.parquet(vdir(root, 1)))
    job()
    assert(rows(vdir(root, 1), "group", "bin", "cnt") == clean)
    // exactness: bin-wise integer addition = recompute over the union
    assert(clean == histOf(events).collect().map(_.mkString("|")).toSet)
  }

  test("histogram merge applied twice double-counts — the in-place hazard") {
    // the raw-frame inequality that makes read-own-output-and-
    // overwrite UNSAFE for this family; the versioned harness above is
    // the convention that neutralizes it
    val once = Profiling.histMerge(histOf(base), histOf(delta))
    val twice = Profiling.histMerge(once, histOf(delta))
    val n1 = once.agg(sum("cnt")).head().getLong(0)
    val n2 = twice.agg(sum("cnt")).head().getLong(0)
    assert(n2 > n1)
  }

  // ---- Bloom (q239's shape) ----------------------------------------

  test("bloom registry refresh: word-wise OR refresh is crash-idempotent") {
    val root = reg("graft_bloom_reg")
    val mBits = 65536
    val baseKeys = base.select(col("user_id").cast("string").as("key"))
    // delta keys DISJOINT from base (sf0.001 users appear in both
    // event-id halves, and an all-overlap delta sets no new bits —
    // the planted crash state would be indistinguishable from clean)
    val deltaKeys = delta
      .select((col("user_id") + 5000000L).cast("string").as("key"))
    Profiling.bloomSketchFrame(baseKeys, mBits, k = 4)
      .write.parquet(vdir(root, 0))
    def job(): Unit = refresh(root, 0, 1) { b =>
      val d = Profiling.bloomSketchFrame(deltaKeys, mBits, k = 4)
        .select(col("w").as("dw"))
      b.crossJoin(d)
        .select(zip_with(col("w"), col("dw"),
          (x, y) => x.bitwiseOR(y)).as("w"), col("nk"))
    }
    job()
    val clean = rows(vdir(root, 1), "w")
    job()
    assert(rows(vdir(root, 1), "w") == clean)
    // one-row registry: the partial state a torn write leaves is a
    // stale/other content, planted directly
    spark.read.parquet(vdir(root, 0))
      .write.mode("overwrite").parquet(vdir(root, 1))
    assert(rows(vdir(root, 1), "w") != clean)
    job()
    assert(rows(vdir(root, 1), "w") == clean)
    // exactness: OR-merge ≡ rebuild over base ∪ delta (bit-identical)
    val rebuilt = Profiling
      .bloomSketchFrame(baseKeys.unionAll(deltaKeys), mBits, k = 4)
      .select("w").collect().map(_.mkString("|")).toSet
    assert(clean == rebuilt)
  }

  // ---- connected components (q218/q230's shape) --------------------

  test("components registry refresh: label upsert is crash-idempotent") {
    val root = reg("graft_comp_reg")
    val emb = graft.Tables(spark, sf, "embeddings").select("vec_id")
    val baseEdges = emb.filter(col("vec_id") % 10 < 3)
      .select(col("vec_id").as("a"), (col("vec_id") + 1L).as("b"))
      .join(emb.select(col("vec_id").as("b")), Seq("b"), "left_semi")
    Dedup.connectedComponents(emb, "vec_id", baseEdges,
        aCol = "a", bCol = "b")
      .write.parquet(vdir(root, 0))
    val deltaNodes = emb.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 1000000L).as("id"))
    val deltaEdges = emb.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("a"), (col("vec_id") + 1000000L).as("b"))
    def job(): Unit = refresh(root, 0, 1)(b =>
      Dedup.deltaMergeComponents(b, deltaNodes, deltaEdges))
    job()
    val clean = rows(vdir(root, 1), "id", "comp")
    job()
    assert(rows(vdir(root, 1), "id", "comp") == clean)
    plantPartial(root, 1, spark.read.parquet(vdir(root, 1)))
    job()
    assert(rows(vdir(root, 1), "id", "comp") == clean)
    // refreshed registry covers base ∪ delta nodes exactly once
    assert(clean.size ==
      emb.count() + deltaNodes.count())
  }
}
