package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The k-NN graph ANN index (HNSW-class path): build once per suite,
  * then pin (a) exact-recall equality against brute force for several
  * query vectors — not just the oracle's single query — (b) the graph
  * contract (degree cap, no self-loops, every vector present), and
  * (c) probe determinism.
  */
class GraphAnnSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf, "embeddings")

  private lazy val idx: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_knng_spec")
      .toString
    Similarity.buildKnnGraphIndex(emb, "embedding", "vec_id", p,
      m = 12, nCells = 8, buildProbes = 2)
    p
  }

  private def qv(vecId: Long): Seq[Double] =
    emb.filter(col("vec_id") === vecId)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toSeq

  test("beam search recalls the exact top-10 for multiple queries") {
    for (q <- Seq(0L, 7L, 123L, 321L)) {
      val query = qv(q)
      val exact = Similarity.bruteForceTopK(emb, "embedding", "vec_id",
        query, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val graph = Similarity.graphTopKIndexed(spark, idx, "vec_id",
        query, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(graph == exact, s"query $q: graph $graph vs exact $exact")
    }
  }

  test("graph contract: one node per distinct vector, every member " +
      "covered, degree <= m, no self-loops") {
    val g = spark.read.parquet(idx)
    assert(g.count() ==
      emb.select(col("embedding").cast("array<double>")).distinct().count())
    assert(g.agg(sum(size(col("members")))).head().getLong(0) ==
      emb.count())
    val bad = g.select(col("id"), size(col("nbrs")).as("deg"),
        array_contains(col("nbrs"), col("id")).as("selfloop"))
      .filter(col("deg") > 12 || col("selfloop"))
    assert(bad.isEmpty, bad.collect().mkString(","))
    // shard layout: partition values cover id mod nShards
    val meta = spark.read.parquet(s"$idx/_meta").head()
    val nShards = meta.getAs[Int]("n_shards")
    val off = g.filter(pmod(col("id"), lit(nShards.toLong)) =!= col("shard"))
    assert(off.isEmpty)
    // seeds: one medoid per non-empty cell, ids exist in the corpus
    val seeds = spark.read.parquet(s"$idx/_seeds")
    assert(seeds.count() > 0 && seeds.count() <= 8)
    assert(seeds.join(g, seeds("id") === g("id"), "left_anti").isEmpty)
  }

  test("frontier fetches are partition-pruned on the shard layout") {
    // the probe's per-round read shape: a shard IN-list must reach the
    // scan as PartitionFilters (directories never opened), the id
    // IN-list as a data filter — if the index ever loses its partition
    // column this names the regression
    val plan = spark.read.parquet(idx)
      .filter(col("shard").isin(0L, 1L) && col("id").isin(5L, 9L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard"),
      plan)
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
      .getOrElse("")
    assert(pf.contains("shard"), s"shard not in PartitionFilters: $pf")
  }

  test("probe is deterministic") {
    val query = qv(42L)
    val a = Similarity.graphTopKIndexed(spark, idx, "vec_id", query, 10)
      .collect().toSeq
    val b = Similarity.graphTopKIndexed(spark, idx, "vec_id", query, 10)
      .collect().toSeq
    assert(a == b)
  }

  test("a twin-heavy corpus pairs only distinct vectors and still " +
      "returns the exact (tie-ordered) top-k") {
    import spark.implicits._
    val dims = 8
    val distinctRows = (1L to 30L).map { i =>
      (i, Seq.tabulate(dims)(d => (math.cos(i * 1.3 + d) * 10).toFloat))
    }
    // 10 exact twins per vector, interleaved ids — the ScaleUp stress
    val rows = distinctRows.flatMap { case (i, v) =>
      (0 until 10).map(c => (i + c * 1000L, v))
    }
    val df = rows.toDF("vec_id", "embedding")
    val p = java.nio.file.Files.createTempDirectory("graft_knng_twin")
      .toString
    Similarity.buildKnnGraphIndex(df, "embedding", "vec_id", p,
      m = 6, nCells = 2, buildProbes = 1)
    val g = spark.read.parquet(p)
    assert(g.count() == 30, "graph must hold one node per distinct vector")
    assert(g.agg(sum(size(col("members")))).head().getLong(0) == 300L)
    val query = distinctRows.head._2.map(_.toDouble)
    val got = Similarity.graphTopKIndexed(spark, p, "vec_id", query, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = Similarity.bruteForceTopK(df, "embedding", "vec_id",
      query, 15).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exact,
      s"twin expansion must reproduce exact tie order: $got vs $exact")
  }

  test("a zero-norm vector neither breaks the build nor appears ranked") {
    import spark.implicits._
    val dims = 8
    val rows = (1L to 40L).map { i =>
      (i, Seq.tabulate(dims)(d =>
        (math.sin(i * 0.7 + d) * 10).toFloat))
    } :+ (99L, Seq.fill(dims)(0f))
    val df = rows.toDF("vec_id", "embedding")
    val p = java.nio.file.Files.createTempDirectory("graft_knng_zero")
      .toString
    Similarity.buildKnnGraphIndex(df, "embedding", "vec_id", p,
      m = 4, nCells = 2, buildProbes = 1)
    val query = rows.head._2.map(_.toDouble)
    val got = Similarity.graphTopKIndexed(spark, p, "vec_id", query, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(!got.contains(99L), s"zero vector ranked: $got")
    // brute force keeps the engine-wide "zero vectors left to the
    // caller" contract (ANSI division), so the exact baseline runs on
    // the well-formed subset
    val exact = Similarity.bruteForceTopK(
      df.filter(col("vec_id") =!= 99L), "embedding", "vec_id",
      query, 5).collect().map(_.getLong(0)).toSeq
    assert(got == exact)
  }
}
