package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("cosine: orthogonal 0, identical 1, opposite -1") {
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f), 0.0),
      (Seq(1f, 2f), Seq(1f, 2f), 1.0),
      (Seq(1f, 0f), Seq(-1f, 0f), -1.0)
    ).toDF("a", "b", "want")
    df.select(round(Similarity.cosine(col("a"), col("b")), 9).as("got"),
        col("want"))
      .as[(Double, Double)].collect()
      .foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
  }

  test("brute-force top-k: self is rank 1 with score 1.0; k rows; sorted") {
    val q = emb.filter(col("vec_id") === 7)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toSeq
    val top = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, 10)
      .as[(Long, Double)].collect()
    assert(top.length == 10)
    assert(top.head._1 == 7L && top.head._2 == 1.0)
    assert(top.map(_._2).toSeq == top.map(_._2).sortBy(-_).toSeq)
  }

  test("LSH top-k contains the query vector and overlaps brute force") {
    val q = emb.filter(col("vec_id") === 7)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toSeq
    val exact = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val approx = Similarity.lshTopK(emb, "embedding", "vec_id", q, 10,
      planesPerBand = 6, bands = 4)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(approx.contains(7L), "query's own vector must be in its bucket")
    assert((exact & approx).nonEmpty, "no overlap with exact top-k")
  }

  test("srp buckets are deterministic and within range") {
    val planes = Similarity.hyperplanes(64, 8)
    val b1 = emb.select(Similarity.srpBucket(col("embedding"), planes).as("b"))
      .as[Int].collect()
    val b2 = emb.select(Similarity.srpBucket(col("embedding"), planes).as("b"))
      .as[Int].collect()
    assert(b1.toSeq == b2.toSeq)
    assert(b1.forall(b => b >= 0 && b < 256))
  }

  test("IVF top-k: query's own vector found when probing its cell; overlaps brute force") {
    val q = emb.filter(col("vec_id") === 7)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toSeq
    val exact = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val ivf = Similarity.ivfTopK(emb, "embedding", "vec_id", q, 10,
      nClusters = 16, nProbe = 4)
      .as[(Long, Double)].collect()
    assert(ivf.length == 10)
    assert(ivf.map(_._1).contains(7L),
      "vector 7 is itself a centroid sample member; its cell must be probed")
    assert((exact & ivf.map(_._1).toSet).size >= 3,
      s"IVF overlap with exact top-10 too low: ${(exact & ivf.map(_._1).toSet).size}")
  }

  test("block-size cap guards distinct vectors; identical piles dedup free") {
    // 30 IDENTICAL vectors under one blocking key: dedup-first makes
    // this ONE representative, so the cap never binds and all member
    // pairs come from cheap expansion (quadratic only in output).
    val hot = spark.range(30).select(col("id").as("vec_id"),
      typedlit(Seq(1.0f, 0.0f, 1.0f)).as("embedding"),
      lit("hot").as("label"))
    val pile = Similarity.blockedNearDupPairs(hot, "embedding", "vec_id",
      "label", threshold = 0.0, maxBlockSize = 10)
    assert(pile.count() == 30L * 29 / 2,
      "an identical-vector pile must dedup to one rep, not hit the cap")
    assert(pile.filter(col("score") < 0.999999).count() == 0)
    // 30 DISTINCT vectors under one key: the real quadratic driver —
    // the cap must exclude the block.
    val distinctHot = spark.range(30).select(col("id").as("vec_id"),
      array(col("id").cast("float"), lit(1.0f), lit(0.5f)).as("embedding"),
      lit("hot").as("label"))
    val capped = Similarity.blockedNearDupPairs(distinctHot, "embedding",
      "vec_id", "label", threshold = 0.0, maxBlockSize = 10)
    assert(capped.count() == 0, "oversize distinct block must be excluded")
    val uncapped = Similarity.blockedNearDupPairs(distinctHot, "embedding",
      "vec_id", "label", threshold = 0.0)
    assert(uncapped.count() == 30L * 29 / 2)
  }

  test("persisted LSH index probe returns exactly the scan-time LSH result") {
    val q = emb.filter(col("vec_id") === 3)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toSeq
    val idx = java.nio.file.Files.createTempDirectory("lshidx").toString
    Similarity.buildLshIndex(emb, "embedding", "vec_id", idx,
      planesPerBand = 6, bands = 4)
    val scan = Similarity.lshTopK(emb, "embedding", "vec_id", q, 10,
      planesPerBand = 6, bands = 4).as[(Long, Double)].collect().toSeq
    val probe = Similarity.lshTopKIndexed(spark, idx, "embedding", "vec_id",
      q, 10).as[(Long, Double)].collect().toSeq
    assert(probe == scan)
    // wrong-dimensionality query is rejected, not silently mis-bucketed
    intercept[IllegalArgumentException] {
      Similarity.lshTopKIndexed(spark, idx, "embedding", "vec_id",
        q ++ Seq(0.0), 10)
    }
  }

  test("persisted IVF index probe matches trained-IVF scan (same seed)") {
    val q = emb.filter(col("vec_id") === 3)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toSeq
    val idx = java.nio.file.Files.createTempDirectory("ivfidx").toString
    Similarity.buildIvfIndex(emb, "embedding", "vec_id", idx, nClusters = 16)
    val scan = Similarity.ivfTopKTrained(emb, "embedding", "vec_id", q, 10,
      nClusters = 16, nProbe = 4).as[(Long, Double)].collect().toSeq
    val probe = Similarity.ivfTopKIndexed(spark, idx, "embedding", "vec_id",
      q, 10, nProbe = 4).as[(Long, Double)].collect().toSeq
    assert(probe == scan)
  }

  test("IVF delta insert: refreshed full-probe == brute force over " +
      "base ∪ delta; counts additive; base untouched; type-guarded") {
    val idx = java.nio.file.Files.createTempDirectory("ivfbase").toString
    Similarity.buildIvfIndex(emb, "embedding", "vec_id", idx, nClusters = 16)
    val baseRows = spark.read.parquet(idx).count()
    val delta = emb.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val refreshed =
      java.nio.file.Files.createTempDirectory("ivfdelta").toString
    Similarity.deltaInsertIvfIndex(spark, idx, delta, "embedding",
      "vec_id", refreshed)
    // row-count additivity and base immutability
    assert(spark.read.parquet(refreshed).count() ==
      baseRows + delta.count())
    assert(spark.read.parquet(idx).count() == baseRows)
    // probing ALL cells of the refreshed index is a full exact scan
    // of base ∪ delta — must equal brute force bit for bit
    val q = emb.filter(col("vec_id") === 3)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toSeq
    val brute = Similarity.bruteForceTopK(
        emb.select(col("vec_id"), col("embedding")).unionAll(delta),
        "embedding", "vec_id", q, 10)
      .as[(Long, Double)].collect().toSeq
    val probe = Similarity.ivfTopKIndexed(spark, refreshed, "embedding",
        "vec_id", q, 10, nProbe = 16)
      .as[(Long, Double)].collect().toSeq
    assert(probe == brute)
    // a double-typed delta against a float index must fail loudly,
    // not corrupt the layout's merged schema
    intercept[IllegalArgumentException] {
      Similarity.deltaInsertIvfIndex(spark, idx,
        delta.withColumn("embedding",
          col("embedding").cast("array<double>")),
        "embedding", "vec_id",
        java.nio.file.Files.createTempDirectory("ivfbad").toString)
    }
  }

  test("trained-IVF top-k: k-means centroids give recall >= sampled centroids") {
    val q = emb.filter(col("vec_id") === 7)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toSeq
    val exact = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val sampled = Similarity.ivfTopK(emb, "embedding", "vec_id", q, 10,
      nClusters = 16, nProbe = 4).as[(Long, Double)].collect().map(_._1).toSet
    val trained = Similarity.ivfTopKTrained(emb, "embedding", "vec_id", q, 10,
      nClusters = 16, nProbe = 4).as[(Long, Double)].collect().map(_._1).toSet
    assert(trained.nonEmpty && trained.contains(7L))
    assert((exact & trained).size >= (exact & sampled).size - 2,
      s"trained recall ${(exact & trained).size} far below sampled ${(exact & sampled).size}")
  }

  test("srpBucket works as the fine blocking key for embedding near-dup") {
    import spark.implicits._
    // the 100 TB shape SCALE.md prescribes when a label block is too
    // coarse: block on the sign-random-projection bucket instead —
    // twins land in the same bucket by construction, far vectors
    // (opposite side of the planes) land elsewhere or fail the
    // threshold, and block sizes follow bucket occupancy (~n/2^planes)
    val planes = Similarity.hyperplanes(dims = 4, p = 4)
    val vs = Seq(
      (1L, Seq(1.0f, 0.1f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.1f, 0.0f, 0.0f)), // exact twin of 1
      (3L, Seq(-1.0f, 0.3f, -0.2f, 0.0f))
    ).toDF("vec_id", "embedding")
    val blocked = vs.withColumn("blk",
      Similarity.srpBucket(col("embedding"), planes))
    val pairs = Similarity.blockedNearDupPairs(blocked, "embedding",
        "vec_id", "blk", threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("knnJoin: per-query top-k matches per-query brute force") {
    val queries = emb.filter(col("vec_id") < 3)
    val got = Similarity.knnJoin(emb, "embedding", "vec_id",
        queries, "embedding", "vec_id", k = 4)
      .orderBy(col("qid"), col("score").desc, col("vec_id"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.size == 12)
    // each query's slice equals its own brute-force top-k
    (0L until 3L).foreach { qid =>
      val qv = emb.filter(col("vec_id") === qid)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0).toSeq
      val bf = Similarity.bruteForceTopK(emb, "embedding", "vec_id", qv, 4)
        .as[(Long, Double)].collect().toSeq
      val slice = got.filter(_._1 == qid).map(t => (t._2, t._3))
      assert(slice.map(_._1) == bf.map(_._1), s"qid=$qid ids diverge")
      // scores agree to rounding (knnJoin divides by both norms;
      // bruteForceTopK pre-normalizes the query on the driver)
      slice.zip(bf).foreach { case ((_, a), (_, b)) =>
        assert(math.abs(a - b) < 2e-6, s"qid=$qid score $a vs $b") }
    }
    // the aggregation is partial+final (bounded map-side heaps), not a
    // full shuffle of every scored row through a window
    val plan = Similarity.knnJoin(emb, "embedding", "vec_id",
      queries, "embedding", "vec_id", k = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk") ||
      plan.toLowerCase.contains("objecthashaggregate"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"))
  }

  test("semanticDedup: planted near-dups drop, cross-cluster twins both survive") {
    // two tight clusters on orthogonal axes; v1≈v0 (same cluster,
    // cosine ≈ 1) must drop, the y-axis pair is orthogonal to them and
    // survives pairing in its own cluster only
    val rows = Seq(
      (0L, "a", Seq(1f, 0f, 0f, 0f)),
      (1L, "a", Seq(0.999f, 0.001f, 0f, 0f)),   // near-dup of 0 → dropped
      (2L, "b", Seq(0f, 1f, 0f, 0f)),
      (3L, "b", Seq(0f, 0.999f, 0.001f, 0f)),   // near-dup of 2 → dropped
      (4L, "a", Seq(0.6f, 0.8f, 0f, 0f))        // between, similar to NOTHING ≥ .99
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.semanticDedup(rows, "embedding", "vec_id",
        "label", threshold = 0.99)
      .as[(Long, String, Boolean)].collect().sortBy(_._1)
    val keep = got.map(t => t._1 -> t._3).toMap
    assert(keep(0L) && !keep(1L), "min-id rep survives, its near-dup drops")
    assert(keep(2L) && !keep(3L))
    assert(keep(4L), "isolated vector survives")
    assert(got.length == 5, "every corpus row is reported")
  }

  test("semanticDedup: clustering BLOCKS comparison — a near-dup pair straddling a cluster boundary both survive") {
    // v10/v11 are near-identical (cosine ≈ 0.9998 ≥ threshold) but
    // each is pulled to a different centroid by its tilt — semantic
    // blocking never compares them, so BOTH survive: the documented
    // SemDeDup approximation, pinned
    val rows = Seq(
      (0L, "a", Seq(1f, 0f, 0f, 0f)),
      (1L, "a", Seq(1f, 0f, 0f, 0f)),
      (2L, "b", Seq(0f, 1f, 0f, 0f)),
      (3L, "b", Seq(0f, 0.999f, 0.001f, 0f)),
      (10L, "a", Seq(0.714f, 0.7f, 0f, 0f)),  // tilts to cluster a
      (11L, "b", Seq(0.7f, 0.714f, 0f, 0f))   // tilts to cluster b
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.semanticDedup(rows, "embedding", "vec_id",
        "label", threshold = 0.999)
      .as[(Long, String, Boolean)].collect()
    val byId = got.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byId(10L)._1 != byId(11L)._1, "the pair straddles two clusters")
    assert(byId(10L)._2 && byId(11L)._2,
      "cross-cluster near-dups are never compared — both survive")
    assert(!byId(1L)._2, "identical in-cluster pair still dedups (0 keeps)")
  }

  test("semanticDedup: hot-cluster cap excludes oversize clusters from pairing") {
    // 30 distinct near-identical vectors in one label; cap at 10 →
    // the whole cluster is excluded from pairing, everything keeps
    val hot = (0 until 30).map(i =>
      (i.toLong, "hot", Seq(1f, i * 1e-4f, 0f, 0f)))
    val cool = Seq((100L, "cool", Seq(0f, 1f, 0f, 0f)),
      (101L, "cool", Seq(0f, 0.9999f, 0.0001f, 0f)))
    val rows = (hot ++ cool).toDF("vec_id", "label", "embedding")
    val got = Similarity.semanticDedup(rows, "embedding", "vec_id",
        "label", threshold = 0.99, maxClusterSize = 10)
      .as[(Long, String, Boolean)].collect()
    val keep = got.map(t => t._1 -> t._3).toMap
    assert((0 until 30).forall(i => keep(i.toLong)),
      "capped cluster: no pairing, all survive")
    assert(keep(100L) && !keep(101L), "small cluster still dedups")
  }

  test("groupCentroids: null group normalizes to the sentinel, no NPE") {
    val rows = Seq(
      (0L, Some("a"), Seq(1f, 0f)),
      (1L, None, Seq(0f, 1f)),
      (2L, None, Seq(0f, 1f))
    ).toDF("vec_id", "label", "embedding")
    val cb = Similarity.groupCentroids(rows, "embedding", "label").toMap
    assert(cb.keySet == Set("a", "<null>"))
    assert(cb("<null>") == Seq(0.0, 1.0))
  }

  test("assignToCentroids: nearest centroid wins, rounded-cosine tie breaks to smallest id") {
    val rows = Seq(
      (0L, Seq(1f, 0f)),
      (1L, Seq(0f, 1f)),
      (2L, Seq(1f, 1f))  // equidistant from both → tie → "a"
    ).toDF("vec_id", "embedding")
    val codebook = Seq("a" -> Seq(1.0, 0.0), "b" -> Seq(0.0, 1.0))
    val got = Similarity.assignToCentroids(rows, "embedding", codebook)
      .select("vec_id", "cluster").as[(Long, String)].collect().toMap
    assert(got(0L) == "a" && got(1L) == "b")
    assert(got(2L) == "a", "exact tie resolves to the smaller centroid id")
  }

  test("quantizeInt8: half-away codes, max-abs scale, half-step error bound") {
    val rows = Seq(
      (0L, Seq(0.5f, -1.0f, 0.25f, -0.5f)),
      (1L, Seq(0f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(rows, "embedding")
      .orderBy("vec_id").collect()
    val r0 = got(0)
    assert(r0.getAs[Double]("scale") == 1.0)
    // 63.5 → 64 and -63.5 → -64: ties round AWAY from zero (C round,
    // DuckDB round), not Math.round's half-up (-63.5 → -63)
    assert(r0.getSeq[Int](r0.fieldIndex("q")).toSeq == Seq(64, -127, 32, -64))
    assert(r0.getAs[Double]("err") <= 0.5 / 127 + 1e-12,
      "reconstruction error exceeds half a quantization step")
    val r1 = got(1)
    assert(r1.getAs[Double]("scale") == 0.0)
    assert(r1.getSeq[Int](r1.fieldIndex("q")).toSeq == Seq(0, 0, 0, 0))
    assert(r1.getAs[Double]("err") == 0.0)
  }

  test("quantizedTopK: self-match ranks first; int-dot rescale is exact") {
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val qz = Similarity.quantizeInt8(rows, "embedding")
      .select("vec_id", "scale", "q")
    val q0 = qz.filter(col("vec_id") === 0).head()
    val got = Similarity.quantizedTopK(qz, "vec_id",
        q0.getSeq[Int](q0.fieldIndex("q")),
        q0.getDouble(q0.fieldIndex("scale")), k = 3)
      .collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    // self dot: codes (127,0,0)·(127,0,0) = 16129, rescale 1·1/127² → 1.0
    assert(got(0).getAs[Double]("score") == 1.0)
  }

  test("pqCode: m codes, each a valid codebook index; encode is " +
      "deterministic") {
    val codebooks = Similarity.trainPqCodebooks(emb, "embedding",
      m = 8, ksub = 16)
    assert(codebooks.size == 8 && codebooks.forall(_.size == 16) &&
      codebooks.forall(_.forall(_.size == 8)))
    def codesOf() = emb.orderBy("vec_id")
      .select(Similarity.pqCode(
        transform(col("embedding"), _.cast("double")), codebooks).as("c"))
      .as[Seq[Int]].collect().toSeq
    val c1 = codesOf()
    assert(c1.forall(c => c.size == 8 && c.forall(i => i >= 0 && i < 16)))
    assert(c1 == codesOf()) // same codebooks → same codes, any run
  }

  test("pq index probe: exact re-rank scores, recall floor vs brute " +
      "force, self always found") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_spec")
      .toString + "/idx"
    Similarity.buildPqIndex(emb, "embedding", "vec_id", dir)
    val q = emb.filter(col("vec_id") === 7)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toSeq
    val got = Similarity.pqTopKIndexed(spark, dir, emb, "embedding",
      "vec_id", q, k = 10, shortlist = 100).as[(Long, Double)].collect()
    assert(got.length == 10)
    // the query's own vector quantizes to itself in every subspace —
    // its ADC score is maximal among its own codes, so it must survive
    // the shortlist and re-rank first with the exact score
    assert(got.head._1 == 7L && got.head._2 == 1.0)
    val exact = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, 10)
      .as[(Long, Double)].collect()
    val overlap = (got.map(_._1).toSet & exact.map(_._1).toSet).size
    // near-uniform synthetic vectors are PQ's worst case (no cluster
    // structure for the codebooks to exploit); this floor is a
    // determinism regression pin, not a quality claim — q117's
    // contract oracle pins 8/10 on its own fixed query
    assert(overlap >= 7, s"recall@10 too low: $overlap/10")
    // every returned score is the EXACT rounded cosine (the re-rank
    // recomputes on real vectors — no quantization error in the output)
    val exactById = Similarity.bruteForceTopK(emb, "embedding", "vec_id",
      q, emb.count().toInt).as[(Long, Double)].collect().toMap
    got.foreach { case (id, s) => assert(s == exactById(id)) }
  }

  test("IVF-PQ delta insert: counts additive, base untouched, twin " +
      "deltas encode identically to their base rows, full probe == " +
      "brute force over the union, dims guard") {
    val idx = java.nio.file.Files.createTempDirectory("ivfpqbase").toString
    Similarity.buildIvfPqIndex(emb, "embedding", "vec_id", idx,
      nClusters = 8, m = 8, ksub = 16)
    val baseRows = spark.read.parquet(idx).count()
    val delta = emb.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val refreshed =
      java.nio.file.Files.createTempDirectory("ivfpqdelta").toString
    Similarity.deltaInsertIvfPqIndex(spark, idx, delta, "embedding",
      "vec_id", refreshed)
    assert(spark.read.parquet(refreshed).count() ==
      baseRows + delta.count())
    assert(spark.read.parquet(idx).count() == baseRows)
    // frozen quantizers: an exact-twin delta row must land in the same
    // cell with the same codes as its base original
    val ref = spark.read.parquet(refreshed)
      .select(col("vec_id"), col("cell"), col("codes"))
    val mismatch = ref.filter(col("vec_id") >= 100000L)
      .select((col("vec_id") - 100000L).as("vec_id"),
        col("cell").as("dc"), col("codes").as("dcodes"))
      .join(ref.filter(col("vec_id") < 100000L), "vec_id")
      .filter(col("dc") =!= col("cell") || col("dcodes") =!= col("codes"))
      .count()
    assert(mismatch == 0L, "twin delta rows re-encoded differently")
    // all-cells unbounded-shortlist probe == brute force over the union
    val q = emb.filter(col("vec_id") === 3)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toSeq
    val uni = emb.select(col("vec_id"), col("embedding")).unionAll(delta)
    val brute = Similarity.bruteForceTopK(uni, "embedding", "vec_id",
      q, 10).as[(Long, Double)].collect().toSeq
    val probe = Similarity.ivfPqTopKIndexed(spark, refreshed, uni,
        "embedding", "vec_id", q, 10, nProbe = 8,
        shortlist = uni.count().toInt)
      .as[(Long, Double)].collect().toSeq
    assert(probe == brute)
    intercept[IllegalArgumentException] {
      Similarity.deltaInsertIvfPqIndex(spark, idx,
        delta.select(col("vec_id"), slice(col("embedding"), 1, 8)
          .as("embedding")),
        "embedding", "vec_id",
        java.nio.file.Files.createTempDirectory("ivfpqbad").toString)
    }
  }

  test("mmrDiversify: duplicate is demoted behind a diverse pick, " +
      "rel ties break on id, kCand caps the candidate pool") {
    // q = (1,0,0); two identical high-rel vectors, one diverse mid-rel,
    // one orthogonal: λ=0.5 must pick [dup1, diverse, dup2, ortho] —
    // relevance alone would pick the twin second
    val df = Seq(
      (1L, Seq(0.9f, 0.43589f, 0f)),
      (2L, Seq(0.9f, 0.43589f, 0f)),
      (3L, Seq(0.7f, 0f, 0.71414f)),
      (4L, Seq(0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val q = Seq(1.0, 0.0, 0.0)
    val got = Similarity.mmrDiversify(df, "embedding", "vec_id", q,
        kCand = 4, kOut = 4, lambda = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L)) // ranks 1..4
    assert(got.map(_._2).toSeq == Seq(1L, 3L, 2L, 4L))
    // kCand=3 drops the orthogonal vector from the pool entirely
    val capped = Similarity.mmrDiversify(df, "embedding", "vec_id", q,
        kCand = 3, kOut = 3, lambda = 0.5)
      .collect().map(_.getLong(1))
    assert(capped.toSeq == Seq(1L, 3L, 2L))
    // pure-relevance degenerate case: λ=1 ignores redundancy — the
    // twin rides directly behind its duplicate
    val rel = Similarity.mmrDiversify(df, "embedding", "vec_id", q,
        kCand = 4, kOut = 3, lambda = 1.0)
      .collect().map(_.getLong(1))
    assert(rel.toSeq == Seq(1L, 2L, 3L))
  }

  test("dbscan: cores cluster by component, borders attach to min core " +
      "neighbor, chain-less tails and isolates are noise") {
    // two 4-cliques (all cores at minPts=4), a border bridging both
    // (attaches to the MIN cluster), an edge pair with no core contact
    // (noise despite having neighbors), and an isolate
    val corpus = (1L to 11L).map(i => (i, i)).toDF("vec_id", "x")
    val cliqueA = for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b)
    val cliqueB = for (a <- 5L to 8L; b <- a + 1 to 8L) yield (a, b)
    val pairs = (cliqueA ++ cliqueB ++ Seq((1L, 9L), (5L, 9L), (10L, 11L)))
      .toDF("id_a", "id_b")
    val got = Similarity.dbscan(corpus, "vec_id", pairs, minPts = 4)
      .orderBy("vec_id")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
    val want = Seq(
      (1L, 1L, "core"), (2L, 1L, "core"), (3L, 1L, "core"),
      (4L, 1L, "core"),
      (5L, 5L, "core"), (6L, 5L, "core"), (7L, 5L, "core"),
      (8L, 5L, "core"),
      (9L, 1L, "border"), // core neighbors 1 and 5 — min wins
      (10L, -1L, "noise"), // has a neighbor, but no core contact
      (11L, -1L, "noise")) // ditto
    assert(got.toSeq == want)
    // minPts=10 demotes everything: no cores, all noise
    val allNoise = Similarity.dbscan(corpus, "vec_id", pairs, minPts = 10)
      .filter(col("role") =!= "noise").count()
    assert(allNoise == 0L)
  }

  test("ivf-pq index probe: exact re-rank scores, full probe recovers " +
      "brute force, recall floor at default params") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_spec")
      .toString + "/idx"
    Similarity.buildIvfPqIndex(emb, "embedding", "vec_id", dir,
      nClusters = 8, m = 8, ksub = 16)
    val q = emb.filter(col("vec_id") === 7)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toSeq
    val n = emb.count().toInt
    // probing EVERY cell with an unbounded shortlist removes both
    // approximation surfaces — the composite index must then equal
    // brute force row for row (scores exact by the re-rank contract)
    val full = Similarity.ivfPqTopKIndexed(spark, dir, emb, "embedding",
      "vec_id", q, k = 10, nProbe = 8, shortlist = n)
      .as[(Long, Double)].collect()
    val exact = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, 10)
      .as[(Long, Double)].collect()
    assert(full.toSeq == exact.toSeq)
    // default-parameter probe: self must survive (its residual codes
    // are its own nearest codewords and its cell is the top-ranked
    // cell), scores on returned rows are exact, recall has a floor
    val got = Similarity.ivfPqTopKIndexed(spark, dir, emb, "embedding",
      "vec_id", q, k = 10, nProbe = 4, shortlist = 100)
      .as[(Long, Double)].collect()
    assert(got.length == 10)
    assert(got.head._1 == 7L && got.head._2 == 1.0)
    val exactById = Similarity.bruteForceTopK(emb, "embedding", "vec_id",
      q, n).as[(Long, Double)].collect().toMap
    got.foreach { case (id, s) => assert(s == exactById(id)) }
    val overlap = (got.map(_._1).toSet & exact.map(_._1).toSet).size
    assert(overlap >= 7, s"recall@10 too low: $overlap/10")
    // dims-mismatch guard fails loudly, not silently
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopKIndexed(spark, dir, emb, "embedding", "vec_id",
        q.take(4), k = 10)
    }
  }

  test("vecMoments: sums, upper-triangle outer products, and count " +
      "match brute force regardless of partitioning") {
    val vecs = Seq(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0),
      Seq(-1.0, 0.5, 2.0))
    val row = vecs.toDF("v").repartition(3)
      .agg(graft.functions.VecAggs.vecMoments(col("v")).as("m"))
      .selectExpr("m.sums", "m.outer", "m.n").head()
    val sums = row.getSeq[Double](0)
    val outer = row.getSeq[Double](1)
    assert(row.getLong(2) == 3L)
    val d = 3
    for (i <- 0 until d)
      assert(math.abs(sums(i) - vecs.map(_(i)).sum) < 1e-12)
    var k = 0
    for (i <- 0 until d; j <- i until d) {
      val want = vecs.map(v => v(i) * v(j)).sum
      assert(math.abs(outer(k) - want) < 1e-12, s"outer($i,$j)")
      k += 1
    }
  }

  test("topPrincipalComponent recovers a planted dominant direction " +
      "and pcaProject's variance equals the eigenvalue") {
    // points strung along u = (3,4)/5 with small off-axis jitter: the
    // top eigenvector must align with u and λ ≈ var along u
    val u = Seq(0.6, 0.8)
    val ts = (0 until 40).map(i => (i - 19.5) / 4.0)
    val vecs = ts.zipWithIndex.map { case (tv, i) =>
      val eps = 0.01 * (if (i % 2 == 0) 1 else -1)
      (i.toLong, Seq((tv * u(0) - eps * u(1)).toFloat,
        (tv * u(1) + eps * u(0)).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val (mean, pc, lambda, n) =
      Similarity.topPrincipalComponent(df, "embedding")
    assert(n == 40L)
    assert(math.abs(math.sqrt(pc.map(x => x * x).sum) - 1.0) < 1e-9)
    val align = math.abs(pc.zip(u).map { case (a, b) => a * b }.sum)
    assert(align > 0.9999, s"alignment $align")
    assert(lambda > 0.99 * ts.map(t => t * t).sum / ts.size)
    // projection variance reproduces the eigenvalue
    val proj = Similarity.pcaProject(df, "embedding", "vec_id", mean, pc)
      .as[(Long, Double)].collect().map(_._2)
    val m = proj.sum / proj.length
    val pv = proj.map(p => (p - m) * (p - m)).sum / proj.length
    assert(math.abs(pv - lambda) < 1e-9 * (lambda + 1),
      s"projVar $pv vs lambda $lambda")
    assert(math.abs(m) < 1e-12)
  }

  test("semanticDecontaminate: max cosine, min-eid tiebreak, threshold " +
      "flag, zero-norm drop, broadcast eval plan") {
    import spark.implicits._
    // eval 3 is an exact twin of eval 1: the distinct-vector collapse
    // must keep the GROUP MIN id (1) as the tie representative
    val eval = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Seq(2f, 0f)),  // 1.0 to e1, 0.0 to e2
      (11L, Seq(1f, 1f)),  // 0.707107 to BOTH → tie → smaller eid 1
      (12L, Seq(-1f, 0f)), // -1.0 to e1, 0.0 to e2 → max 0.0 via e2
      (13L, Seq(0f, 0f)),  // zero norm → dropped
      (20L, Seq(2f, 0f)))  // exact twin of 10 → identical row, own id
      .toDF("vec_id", "embedding")
    val df = Similarity.semanticDecontaminate(corpus, "vec_id",
      "embedding", eval, "vec_id", "embedding", threshold = 0.9)
    val got = df.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Double]("max_sim"), r.getAs[Long]("eval_id"),
          r.getAs[Boolean]("contaminated")))).toMap
    assert(got == Map(
      10L -> ((1.0, 1L, true)),
      11L -> ((0.707107, 1L, false)),
      12L -> ((0.0, 2L, false)),
      20L -> ((1.0, 1L, true))))
    // the eval side must reach the corpus as a broadcast — the corpus
    // never shuffles for the screen (the map-side max collapses the
    // |eval| candidate rows per corpus vector before the final agg)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    // distinct-VECTOR-first pin: scoring must key on the vector (the
    // distinct collapse + per-vector max), not on the document id —
    // a revert to per-id scoring would re-pay the |eval| dot products
    // for every twin and show up here as an id-keyed aggregate
    assert("(Hash|Sort|ObjectHash)Aggregate\\(keys=\\[v#".r
      .findFirstIn(plan).isDefined, plan.take(2000))
    assert(!"(Hash|Sort|ObjectHash)Aggregate\\(keys=\\[vec_id#".r
      .findFirstIn(plan).isDefined, plan.take(2000))
    // and the member re-expansion is ONE vector-keyed equi-join
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)".r
      .findFirstIn(plan).isDefined, plan.take(2000))
  }

  test("hardNegatives excludes same-label vectors and near-dup twins " +
      "above the ceiling") {
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f), 0),   // anchor
      (1L, Seq(1.0f, 0.001f), 1), // diff label but near-dup: excluded
      (2L, Seq(0.9f, 0.5f), 1),   // hard negative
      (3L, Seq(0.9f, 0.5f), 0),   // same label: excluded
      (4L, Seq(0.0f, 1.0f), 2),   // easy negative
      (5L, Seq(-1.0f, 0.0f), 1)).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(corpus, "embedding", "vec_id",
        "label", corpus.filter(col("vec_id") === 0), k = 3,
        nearDupCeiling = 0.95)
      .collect().map(r => r.getLong(1)).toSeq
    // ranked: 2 (cos~0.874), 4 (0.0), 5 (-1.0); 1 and 3 excluded
    assert(got == Seq(2L, 4L, 5L))
  }

  test("kcenterSelect matches brute-force greedy farthest-point") {
    val rnd = new scala.util.Random(3)
    val pts = (0L until 60L).map(i =>
      (i, Seq.fill(4)(rnd.nextDouble() * 2 - 1).map(_.toFloat)))
    val df = pts.toDF("vec_id", "embedding")
    val k = 6
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def d2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
        val d = x.toDouble - y.toDouble; s + d * d
      }
    val sel = scala.collection.mutable.ArrayBuffer(
      (0L, Option.empty[Double]))
    while (sel.size < k) {
      val cand = pts.filter(p => !sel.exists(_._1 == p._1))
        .map { case (id, v) =>
          (id, r6(sel.map(s => d2(pts(s._1.toInt)._2, v)).min))
        }
      val best = cand.minBy { case (id, d) => (-d, id) }
      sel += ((best._1, Some(best._2)))
    }
    val got = Similarity.kcenterSelect(df, "embedding", "vec_id", k)
      .orderBy("sel_rank")
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got == sel.toSeq)
  }

  test("kcenterSelect with k beyond the corpus returns every point " +
      "once, in selection order") {
    val df = Seq((3L, Seq(0.0f, 1.0f)), (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.kcenterSelect(df, "embedding", "vec_id", k = 10)
      .orderBy("sel_rank").collect().map(_.getLong(1)).toSeq
    // seed = min id 1; farthest from 1 is 2 (d=4); then 3 (d=2)
    assert(got == Seq(1L, 2L, 3L))
  }

  test("hardNegatives excludes null-label rows on both sides") {
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f), Some(0)),
      (1L, Seq(0.9f, 0.1f), None),     // null label: never a negative
      (2L, Seq(0.0f, 1.0f), Some(1)),
      (3L, Seq(0.5f, 0.5f), None))     // null-label anchor mines nothing
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(corpus, "embedding", "vec_id",
        "label", corpus.filter(col("vec_id").isin(0L, 3L)), k = 5,
        nearDupCeiling = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 2L)))
  }

  test("sparseRandomProjection: deterministic signs, hand-checked " +
      "projection, JL sparsity") {
    // signs are a pure function of (tag, j, d)
    val signs = (0 until 8).flatMap(j => (0 until 64).map(d =>
      Similarity.achlioptasSign("rp", j, d)))
    assert(signs == (0 until 8).flatMap(j => (0 until 64).map(d =>
      Similarity.achlioptasSign("rp", j, d))))
    // roughly 1/3 nonzero (binomial(512, 1/3): ±5 sigma ~ 53)
    val nz = signs.count(_ != 0)
    assert(nz > 170 - 53 && nz < 170 + 53, s"nonzero=$nz")
    // projection of a one-hot vector picks out sign(j, d) * sqrt(3/8)
    val hot = Seq((0L, Seq.tabulate(64)(i => if (i == 5) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val row = Similarity.sparseRandomProjection(hot, "embedding",
      "vec_id", dims = 64, kOut = 8).collect()(0)
    val scale = math.sqrt(3.0 / 8)
    (0 until 8).foreach { j =>
      val want = math.floor(
        Similarity.achlioptasSign("rp", j, 5) * scale * 1e6 + 0.5) / 1e6
      assert(row.getDouble(j + 1) == want, s"p$j")
    }
  }
}
