package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CRASH-IDEMPOTENCE contract for the BATCH index-delta writes (r14
  * verdict #1): the IVF / IVF-PQ delta inserts publish each delta
  * batch under its own partition identity (`cell=<c>/b=<batchId>`,
  * dynamic partition overwrite), so a delta job that dies mid-write
  * and is re-run REPLACES its own partitions instead of
  * double-appending vectors. Proven here three ways per family:
  *
  *   1. run-twice ≡ run-once — the refreshed index is row-identical
  *      after a second identical insert (each delta vector read
  *      exactly once by any probe);
  *   2. crash repair — a simulated mid-commit death (a PARTIAL slice
  *      of the batch's rows already visible under `b = batchId`, the
  *      state a dynamic-overwrite driver crash between partition
  *      moves leaves) is healed by the re-run: the final index equals
  *      the clean single-run index;
  *   3. the in-place maintenance shape (`path == basePath`, no file
  *      copy — the real 100 TB deployment form) holds the same
  *      contract while leaving the base batch (`b = 0`) untouched.
  *
  * The streaming sinks' versioned `v=<batchId>` dirs prove the same
  * property for the streaming maintenance paths (StreamReplaySpec /
  * q193/q232); the pure frame-transform delta families (minhash,
  * winnow, KMV, histogram, Bloom, components) state their idempotence
  * argument in their scaladocs — nothing persisted, nothing to heal.
  */
class IndexIdempotenceSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/idx"

  private lazy val emb =
    graft.Tables(spark, sf, "embeddings").select("vec_id", "embedding")
  private lazy val delta: DataFrame =
    emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))

  /** Canonical (id, cell, b) content of an index for equality checks —
    * file layout may differ between runs; the read-back rows must not.
    */
  private def content(path: String): Seq[(Long, Int, Long)] =
    spark.read.parquet(path)
      .select(col("vec_id").cast("long"), col("cell").cast("int"),
        col("b").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSeq.sorted

  test("IVF delta insert run-twice equals run-once, with every delta " +
      "vector present exactly once") {
    val base = tmp("graft_idem_ivf_base")
    Similarity.buildIvfIndex(emb, "embedding", "vec_id", base,
      nClusters = 8)
    val p = tmp("graft_idem_ivf_p")
    Similarity.deltaInsertIvfIndex(spark, base, delta, "embedding",
      "vec_id", p)
    val once = content(p)
    Similarity.deltaInsertIvfIndex(spark, base, delta, "embedding",
      "vec_id", p)
    assert(content(p) == once, "re-run changed the refreshed index")
    // exactly-once: every id appears once, delta rows all under b=1
    assert(once.map(_._1).distinct.size == once.size)
    assert(once.count(_._3 == 1L) == delta.count())
    assert(once.count(_._3 == 0L) == emb.count())
  }

  test("IVF in-place delta insert (path == basePath) heals a simulated " +
      "mid-commit crash and leaves the base batch untouched") {
    // clean single-run reference on a separate copy
    val ref = tmp("graft_idem_ivf_ref")
    Similarity.buildIvfIndex(emb, "embedding", "vec_id", ref,
      nClusters = 8)
    Similarity.deltaInsertIvfIndex(spark, ref, delta, "embedding",
      "vec_id", ref) // in-place on the reference too
    val want = content(ref)

    // crash scenario: base index + a PARTIAL slice of the delta batch
    // already committed under b=1 (the state a driver death between
    // dynamic-overwrite partition moves leaves behind)
    val p = tmp("graft_idem_ivf_crash")
    Similarity.buildIvfIndex(emb, "embedding", "vec_id", p,
      nClusters = 8)
    val partial = spark.read.parquet(ref)
      .filter(col("b") === 1L && col("vec_id") % 20 === 0)
    partial.write.mode("append").partitionBy("cell", "b").parquet(p)
    assert(content(p) != want, "crash simulation staged nothing")

    // the re-run must replace the partial batch, not append to it
    Similarity.deltaInsertIvfIndex(spark, p, delta, "embedding",
      "vec_id", p)
    assert(content(p) == want,
      "re-run after simulated crash diverged from the clean run")
    assert(content(p).count(_._3 == 0L) == emb.count(),
      "in-place insert disturbed the base batch")
  }

  test("IVF-PQ delta insert run-twice equals run-once and heals a " +
      "partial batch (codes compared byte-exact)") {
    def codesContent(path: String): Seq[(Long, Seq[Byte], Int, Long)] =
      spark.read.parquet(path)
        .select(col("vec_id").cast("long"), col("codes"),
          col("cell").cast("int"), col("b").cast("long"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Byte](1).toSeq, r.getInt(2),
          r.getLong(3)))
        .toSeq.sortBy(t => (t._1, t._4))
    val base = tmp("graft_idem_ivfpq_base")
    Similarity.buildIvfPqIndex(emb, "embedding", "vec_id", base,
      nClusters = 8, m = 8, ksub = 16)
    val p = tmp("graft_idem_ivfpq_p")
    Similarity.deltaInsertIvfPqIndex(spark, base, delta, "embedding",
      "vec_id", p)
    val once = codesContent(p)
    // re-run to the same target
    Similarity.deltaInsertIvfPqIndex(spark, base, delta, "embedding",
      "vec_id", p)
    assert(codesContent(p) == once, "re-run changed the IVF-PQ index")
    assert(once.count(_._4 == 1L) == delta.count())
    // crash repair, in place: pollute with a partial slice, re-run
    val partial = spark.read.parquet(p)
      .filter(col("b") === 1L && col("vec_id") % 20 === 0)
    val crash = tmp("graft_idem_ivfpq_crash")
    Similarity.buildIvfPqIndex(emb, "embedding", "vec_id", crash,
      nClusters = 8, m = 8, ksub = 16)
    partial.write.mode("append").partitionBy("cell", "b").parquet(crash)
    Similarity.deltaInsertIvfPqIndex(spark, crash, delta, "embedding",
      "vec_id", crash)
    assert(codesContent(crash) == once,
      "in-place re-run after simulated crash diverged")
  }

  test("probe equivalence: the healed in-place IVF index answers " +
      "exactly like the clean file-copied one") {
    val base = tmp("graft_idem_probe_base")
    Similarity.buildIvfIndex(emb, "embedding", "vec_id", base,
      nClusters = 8)
    val copied = tmp("graft_idem_probe_copy")
    Similarity.deltaInsertIvfIndex(spark, base, delta, "embedding",
      "vec_id", copied)
    val inplace = tmp("graft_idem_probe_inplace")
    Similarity.buildIvfIndex(emb, "embedding", "vec_id", inplace,
      nClusters = 8)
    Similarity.deltaInsertIvfIndex(spark, inplace, delta, "embedding",
      "vec_id", inplace)
    // run twice more: idempotence must hold through the probe too
    Similarity.deltaInsertIvfIndex(spark, inplace, delta, "embedding",
      "vec_id", inplace)
    val q = emb.orderBy("vec_id").select("embedding").head()
      .getSeq[Float](0).map(_.toDouble).toSeq
    val a = Similarity.ivfTopKIndexed(spark, copied, "embedding",
      "vec_id", q, k = 20, nProbe = 4).collect().toSeq
    val b = Similarity.ivfTopKIndexed(spark, inplace, "embedding",
      "vec_id", q, k = 20, nProbe = 4).collect().toSeq
    assert(a == b, "probe diverged between copied and healed indexes")
  }
}
