package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Incremental delta insert into the k-NN graph index
  * (Similarity.deltaInsertKnnGraph): build on a PARTIAL corpus, insert
  * the held-out vectors (genuinely novel) plus re-ingested twins, and
  * pin the refreshed index to the SAME brute-force contract a full
  * rebuild is held to (GraphAnnSpec) — exact top-k equality over the
  * full union for several queries — plus the graph structural
  * invariants on the refreshed artifact.
  */
class GraphAnnDeltaSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf, "embeddings")

  // base corpus: ids with vec_id % 7 != 3; delta: the held-out
  // (novel vectors, re-ingested under ids above the base range) plus
  // exact twins of % 7 == 1 rows
  private lazy val base = emb.filter(col("vec_id") % 7 =!= 3)
    .select(col("vec_id"), col("embedding"))
  private lazy val delta =
    emb.filter(col("vec_id") % 7 === 3)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      .unionAll(emb.filter(col("vec_id") % 7 === 1)
        .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding")))
  private lazy val union = base.unionAll(delta)

  private lazy val refreshed: String = {
    val bp = java.nio.file.Files.createTempDirectory("graft_knng_dbase")
      .toString
    Similarity.buildKnnGraphIndex(base, "embedding", "vec_id", bp,
      m = 12, nCells = 8, buildProbes = 2)
    val out = java.nio.file.Files.createTempDirectory("graft_knng_dout")
      .toString
    Similarity.deltaInsertKnnGraph(spark, bp, delta, "embedding",
      "vec_id", out)
    out
  }

  private def qv(vecId: Long): Seq[Double] =
    emb.filter(col("vec_id") === vecId)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toSeq

  test("refreshed index recalls the exact top-10 over base ∪ delta " +
      "for multiple queries (the full-rebuild contract)") {
    for (q <- Seq(0L, 7L, 123L, 321L)) {
      val query = qv(q)
      val exact = Similarity.bruteForceTopK(union, "embedding", "vec_id",
        query, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val graph = Similarity.graphTopKIndexed(spark, refreshed, "vec_id",
        query, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(graph == exact, s"query $q: graph $graph vs exact $exact")
    }
  }

  test("refreshed graph invariants: one node per distinct union " +
      "vector, every member covered, degree <= m, no self-loops") {
    val g = spark.read.parquet(refreshed)
    assert(g.count() ==
      union.select(col("embedding").cast("array<double>"))
        .distinct().count())
    assert(g.agg(sum(size(col("members")))).head().getLong(0) ==
      union.count())
    val bad = g.select(col("id"), size(col("nbrs")).as("deg"),
        array_contains(col("nbrs"), col("id")).as("selfloop"))
      .filter(col("deg") > 12 || col("selfloop"))
    assert(bad.isEmpty, bad.collect().mkString(","))
    // adjacency arrays stay aligned and heap-ordered after the merge
    val mis = g.filter(size(col("nbrs")) =!= size(col("nscores")))
    assert(mis.isEmpty, "nbrs/nscores lost alignment in the merge")
    // twin members merged onto existing nodes: a twin id appears in
    // some node's member list but never as its own node
    val twinIds = g.filter(col("id") >= 5000000L)
    assert(twinIds.isEmpty, "exact twins must merge, not add nodes")
    assert(g.select(explode(col("members")).as("mid"))
      .filter(col("mid") >= 5000000L).count() ==
      emb.filter(col("vec_id") % 7 === 1).count())
  }

  test("seeds of touched home cells stay scorable and valid") {
    val seeds = spark.read.parquet(s"$refreshed/_seeds")
    val g = spark.read.parquet(refreshed)
    assert(seeds.count() > 0 && seeds.count() <= 8)
    assert(seeds.join(g, seeds("id") === g("id"), "left_anti").isEmpty,
      "a seed id is not a node of the refreshed index")
  }
}
