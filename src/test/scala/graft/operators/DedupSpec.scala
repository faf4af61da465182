package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the near-dup machinery on synthetic corpora with planted
  * duplicates — behavior the testdata (dup-free) can't exercise.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (2L, "the quick brown fox jumps over the lazy dog and runs far away home"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog and walks far away home"), // near dup of 1
    (4L, "completely different content about spark engines and data pipelines here"),
    (5L, "short text")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical keys, keeps min id, counts dups") {
    val r = Dedup.exact(docs.withColumn("h", md5(col("text"))), Seq("h"), "doc_id")
      .orderBy("keep_id").collect()
    assert(r.length == 4) // 1+2 collapse
    val g = r.map(x => x.getAs[Long]("keep_id") -> x.getAs[Long]("n_dups")).toMap
    assert(g(1L) == 2L)
    assert(g(3L) == 1L)
  }

  test("keepLatest keeps exactly one latest row per key") {
    val ev = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "ts", "v")
    val r = Dedup.keepLatest(ev, Seq("k"), col("ts"), col("ts"))
      .orderBy("k").as[(Long, Long, String)].collect()
    assert(r.toSeq == Seq((1L, 20L, "b"), (2L, 5L, "c")))
  }

  test("minhash candidate pairs find exact and near dups, skip unrelated") {
    // bands=16 (rows=2) for high recall at jaccard ≈ 0.6 — the near-dup
    // pair's band-match probability is 1-(1-J²)^16 ≈ 0.999.
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        numHashes = 32, bands = 16)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "exact dup pair missed")
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)),
      "near dup pair missed")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated doc produced a candidate pair")
  }

  test("nearDupPairsVerified matches the composed candidates+jaccard pipeline") {
    val composed = {
      val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        numHashes = 32, bands = 16)
      val sh = Dedup.shingleFrame(docs, "doc_id", "text")
      pairs
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          round(Dedup.jaccardFromShingles(col("sh_a"), col("sh_b")), 6).as("jacc"))
        .filter(col("jacc") >= 0.5)
        .as[(Long, Long, Double)].collect().toSet
    }
    val fused = Dedup.nearDupPairsVerified(docs, "doc_id", "text",
        numHashes = 32, bands = 16, minJaccard = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(fused == composed)
    assert(fused.exists { case (a, b, j) => a == 1L && b == 2L && j == 1.0 })
  }

  test("jaccard: identical 1.0, near-dup high, disjoint 0.0") {
    val sh = Dedup.shingleFrame(docs, "doc_id", "text")
    def j(a: Long, b: Long): Double =
      sh.filter(col("doc_id") === a).select(col("sh").as("sa"))
        .crossJoin(sh.filter(col("doc_id") === b).select(col("sh").as("sb")))
        .select(Dedup.jaccardFromShingles(col("sa"), col("sb")))
        .as[Double].head()
    assert(j(1L, 2L) == 1.0)
    assert(j(1L, 3L) > 0.5 && j(1L, 3L) < 1.0)
    assert(j(1L, 4L) == 0.0)
  }

  test("simhash: identical texts equal; near dups within small hamming; unrelated far") {
    val sim = Dedup.simhashes(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sim(1L) == sim(2L))
    assert(java.lang.Long.bitCount(sim(1L) ^ sim(3L)) <= 16)
    assert(java.lang.Long.bitCount(sim(1L) ^ sim(4L)) >
      java.lang.Long.bitCount(sim(1L) ^ sim(3L)))
  }

  test("shingles: windows, dedup, short-text empty") {
    val sh = Dedup.shingleFrame(docs, "doc_id", "text", n = 3)
    val m = sh.as[(Long, Seq[String])].collect().toMap
    assert(m(1L).contains("the quick brown"))
    assert(m(1L).contains("quick brown fox"))
    assert(m(5L).isEmpty) // 2 tokens < n=3 → empty
  }

  test("signatures are deterministic across executions") {
    val a = Dedup.minhashSignatures(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Seq[Long])].collect()
    val b = Dedup.minhashSignatures(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Seq[Long])].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("simhash near-dup pairs: exact dups at hamming 0, unrelated excluded") {
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0),
      "exact dup pair must appear at hamming 0")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated doc must not pair")
  }

  test("bucket-size cap excludes degenerate buckets from quadratic pairing") {
    import org.apache.spark.sql.functions.{col, lit, concat}
    // 30 identical docs: one bucket per band holds all 30
    val boiler = spark.range(30).select(col("id").as("doc_id"),
      lit("identical boilerplate text repeated across the whole corpus here").as("text"))
    val capped = Dedup.minhashCandidatePairs(boiler, "doc_id", "text",
      maxBucketSize = 10)
    assert(capped.count() == 0, "oversize bucket must be excluded")
    val uncapped = Dedup.minhashCandidatePairs(boiler, "doc_id", "text")
    assert(uncapped.count() == 30L * 29 / 2)
  }

  test("simhashNearDupPairs rejects out-of-range maxHamming") {
    assertThrows[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 64)
    }
    assertThrows[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = -1)
    }
  }

  test("nearDupPairsVerified: dedup-first expansion covers all member pairs") {
    // group A = {1, 4} (identical), group B = {2, 3} (identical,
    // near-dup of A), group C = {5, 6} (identical but sub-n-token:
    // no shingles, so NOT pairs despite being exact duplicates —
    // Jaccard-0-on-empty convention), singleton {7} unrelated.
    val tA = "the quick brown fox jumps over the lazy dog at dawn today"
    val tB = "the quick brown fox jumps over the lazy cat at dawn today"
    val corpus = Seq(
      (1L, tA), (4L, tA), (2L, tB), (3L, tB),
      (5L, "one two"), (6L, "one two"),
      (7L, "completely unrelated content about distributed physical plans")
    ).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairsVerified(corpus, "doc_id", "text",
        bands = 16, minJaccard = 0.5)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Double)].collect().toSeq
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    // intra: (1,4), (2,3) at 1.0; cross: all A x B member pairs with
    // ids properly ordered (4 > 2, 3 exercises least/greatest)
    assert(pairSet == Set((1L, 4L), (2L, 3L),
      (1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)))
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair((1L, 4L)) == 1.0 && byPair((2L, 3L)) == 1.0)
    // every cross pair carries the one representative Jaccard
    val crossVals = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
      .map(byPair).toSet
    assert(crossVals.size == 1 && crossVals.head >= 0.5 &&
      crossVals.head < 1.0)
  }

  test("connectedComponents labels chains, pairs, and isolated nodes") {
    val nodes = (1L to 7L).toDF("id")
    // chain 1-2-3, pair 5-6, isolated 4 and 7
    val edges = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(nodes, "id", edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("deltaMergeComponents equals full recompute and leaves " +
      "untouched components' labels alone") {
    // base: chain 1-2-3 (comp 1), pair 5-6 (comp 5), isolated 4, 7
    val nodes = (1L to 7L).toDF("id")
    val baseEdges = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val base = Dedup.connectedComponents(nodes, "id", baseEdges)
    // delta: new nodes 10, 11; edges 10-5 (joins comp 5), 11-11-less
    // (isolated new node), and 3-4 (merges comp 1 with singleton 4)
    val dNodes = Seq(10L, 11L).toDF("id")
    val dEdges = Seq((10L, 5L), (3L, 4L)).toDF("a", "b")
    val got = Dedup.deltaMergeComponents(base, dNodes, dEdges)
      .as[(Long, Long)].collect().toMap
    val full = Dedup.connectedComponents(
        nodes.unionAll(dNodes), "id",
        baseEdges.unionAll(dEdges.toDF("id_a", "id_b")))
      .as[(Long, Long)].collect().toMap
    assert(got == full)
    // untouched: pairless 7 keeps its label; merged: 4 joins comp 1;
    // new 10 takes comp 5; new 11 stays a singleton
    assert(got(7L) == 7L && got(4L) == 1L && got(10L) == 5L &&
      got(11L) == 11L)
    // a delta with NO edges is a pure node append — labels unchanged
    val append = Dedup.deltaMergeComponents(base, dNodes,
        Seq.empty[(Long, Long)].toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(append == base.as[(Long, Long)].collect().toMap ++
      Map(10L -> 10L, 11L -> 11L))
  }

  test("deltaMergeComponentsUpsert emits exactly what changes — " +
      "full form ≡ base overwritten by the upsert frame") {
    // same fixture as the full-form spec: base chain 1-2-3 (comp 1),
    // pair 5-6 (comp 5), isolated 4 and 7; delta nodes 10, 11;
    // edges 10-5 (10 joins comp 5) and 3-4 (comp 1 absorbs 4)
    val nodes = (1L to 7L).toDF("id")
    val baseEdges = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val base = Dedup.connectedComponents(nodes, "id", baseEdges)
      .localCheckpoint(true)
    val dNodes = Seq(10L, 11L).toDF("id")
    val dEdges = Seq((10L, 5L), (3L, 4L)).toDF("a", "b")
    val up = Dedup.deltaMergeComponentsUpsert(base, dNodes, dEdges)
      .as[(Long, Long)].collect().toMap
    // the upsert set is MINIMAL: only 4 (relabeled 4 -> 1) among base
    // rows, plus both new nodes. 1/2/3 keep comp 1 (the merged min is
    // their own label — no rewrite), 5/6/7 untouched or unchanged.
    assert(up == Map(4L -> 1L, 10L -> 5L, 11L -> 11L), up.toString)
    // the two forms agree: base overwritten by the upsert frame is
    // row-identical to the full-table form
    val full = Dedup.deltaMergeComponents(base, dNodes, dEdges)
      .as[(Long, Long)].collect().toMap
    val overwritten =
      base.as[(Long, Long)].collect().toMap ++ up
    assert(overwritten == full)
    // pure node append: upsert = just the new nodes, self-labeled
    val append = Dedup.deltaMergeComponentsUpsert(base, dNodes,
        Seq.empty[(Long, Long)].toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(append == Map(10L -> 10L, 11L -> 11L))
  }

  test("connectedComponents converges on a long chain (multi-round, " +
      "iterative path forced past the driver gate)") {
    val n = 12L
    val nodes = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(nodes, "id", edges,
        maxDriverEdges = 0)
      .as[(Long, Long)].collect()
    assert(got.length == n && got.forall(_._2 == 1L))
  }

  test("connectedComponents driver fast path == iterative labeling") {
    // chains, a pair, isolated nodes, duplicate + reversed edges and a
    // self-loop — the shapes whose labels the two paths must agree on
    val nodes = (1L to 9L).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 2L), (2L, 1L), (5L, 6L),
      (8L, 9L), (9L, 8L), (4L, 4L)).toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(nodes, "id", edges)
      .as[(Long, Long)].collect().toMap
    val iter = Dedup.connectedComponents(nodes, "id", edges,
        maxDriverEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(fast == iter, s"fast=$fast iter=$iter")
    assert(fast == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L, 9L -> 8L))
  }

  test("connectedComponents: duplicate node rows collapse on BOTH " +
      "paths; non-integral edge types fall back to the iterative path") {
    // duplicate node rows: the iterative fused round ends in a
    // groupBy(id), so the fast path must dedup too
    val dupNodes = Seq(1L, 1L, 2L, 3L).toDF("id")
    val e = Seq((1L, 2L)).toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(dupNodes, "id", e)
      .as[(Long, Long)].collect()
    val iter = Dedup.connectedComponents(dupNodes, "id", e,
        maxDriverEdges = 0)
      .as[(Long, Long)].collect()
    assert(fast.sorted.toSeq == iter.sorted.toSeq)
    assert(fast.length == 3, fast.mkString(","))
    // double-typed edge endpoints must NOT be truncation-cast into the
    // union-find: 2.5 is not node 2, so nothing merges (the gate
    // routes this to the iterative path, whose join compares doubles —
    // and whose union coerces the output schema to double, so decode
    // generically)
    val dEdges = Seq((1.0, 2.5)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents((1L to 2L).toDF("id"), "id",
        dEdges)
      .collect().map(r => (r.get(0), r.get(1))).toMap
    // the iterative path may also emit an out-of-nodes phantom row for
    // the 2.5 endpoint (edge-ids-drawn-from-nodes is the contract);
    // the assertion that matters: node 2 did NOT merge with node 1 —
    // the fast path would have truncation-cast 2.5 → 2 and merged them
    assert(got(2.0) == 2.0, got.toString)
    assert(got(1.0) == 1.0, got.toString)
  }

  test("kCore driver peel handles a long chain in one pass; bfsHops " +
      "with null endpoints/seeds falls back and matches") {
    // 50k-edge chain at k=2 peels two endpoints per simultaneous
    // round — the queue peel must be O(E), not O(rounds × E)
    val n = 50000L
    val chain = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val t0 = System.nanoTime()
    assert(Dedup.kCore(chain, "id_a", "id_b", k = 2).count() == 0L)
    assert((System.nanoTime() - t0) / 1e9 < 30.0, "queue peel stalled")
    // null endpoint: fast path declines; result equals the forced
    // iterative labeling
    val nEdges = Seq((Some(1L), Some(2L)), (Some(2L), None))
      .toDF("id_a", "id_b")
    val seeds = Seq(1L).toDF("v")
    // decode null-safely: the iterative path can emit a null node row
    // for a null edge endpoint (the anti-join keeps null keys) — the
    // declining fast path must yield the SAME rows
    val a = Dedup.bfsHops(nEdges, "id_a", "id_b", seeds)
      .collect().map(r => (Option(r.get(0)), r.getInt(1))).toSet
    val b = Dedup.bfsHops(nEdges, "id_a", "id_b", seeds,
        maxDriverEdges = 0)
      .collect().map(r => (Option(r.get(0)), r.getInt(1))).toSet
    assert(a == b, s"a=$a b=$b")
  }

  test("connectedComponents returns empty on an empty node set") {
    val nodes = Seq.empty[Long].toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(nodes, "id", edges).count() == 0L)
    assert(Dedup.connectedComponents(nodes, "id", edges,
      maxDriverEdges = 0).count() == 0L)
  }

  test("connectedComponents refuses a silently partial labeling " +
      "(iterative path)") {
    val nodes = (1L to 12L).toDF("id")
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    assertThrows[IllegalStateException] {
      Dedup.connectedComponents(nodes, "id", edges, maxIter = 2,
        maxDriverEdges = 0)
    }
  }

  test("kCore peels cascades: a triangle with a pendant chain") {
    // triangle 1-2-3 is the 2-core; chain 3-4-5 peels in TWO rounds
    // (5 first, then 4 — the cascade a single-pass filter would miss)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    val got = Dedup.kCore(edges, "id_a", "id_b", k = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore matches brute-force peeling on a pseudo-random graph") {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 120).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    for (k <- Seq(2, 3, 4)) {
      var alive = adj.keySet.toSet
      var changed = true
      while (changed) {
        val drop = alive.filter(v => (adj(v) & alive).size < k)
        changed = drop.nonEmpty
        alive = alive -- drop
      }
      val want = alive.map(v => v -> (adj(v) & alive).size.toLong).toMap
      val got = Dedup.kCore(edges.toDF("id_a", "id_b"), "id_a", "id_b", k)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"k=$k")
    }
  }

  test("bfsHops matches brute-force multi-source BFS; unreachable " +
      "nodes absent") {
    // seeds 1,8: chain 1-2-3-4, square 5-6-7-8(-5), isolated pair 9-10
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 7L),
      (7L, 8L), (5L, 8L), (9L, 10L)).toDF("id_a", "id_b")
    val seeds = Seq(1L, 8L).toDF("v")
    val got = Dedup.bfsHops(edges, "id_a", "id_b", seeds)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3,
      8L -> 0, 5L -> 1, 7L -> 1, 6L -> 2))
  }

  test("bfsHops throws when the eccentricity exceeds the round bound " +
      "(iterative path)") {
    val edges = (1L until 10L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val seeds = Seq(1L).toDF("v")
    assertThrows[IllegalStateException] {
      Dedup.bfsHops(edges, "id_a", "id_b", seeds, maxRounds = 3,
        maxDriverEdges = 0)
    }
  }

  test("kCore returns empty when everything peels, throws past bound " +
      "(iterative path)") {
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    assert(Dedup.kCore(chain, "id_a", "id_b", k = 2).count() == 0L)
    assert(Dedup.kCore(chain, "id_a", "id_b", k = 2,
      maxDriverEdges = 0).count() == 0L)
    assertThrows[IllegalStateException] {
      Dedup.kCore(chain, "id_a", "id_b", k = 2, maxRounds = 1,
        maxDriverEdges = 0)
    }
  }

  test("kCore/bfsHops/labelPropagation: driver fast path == iterative " +
      "on a graph with duplicate edges, self-loops and ties") {
    // pseudo-random multigraph: duplicates and self-loops kept — the
    // distributed degree/label counts weight multiplicity, so the two
    // paths must agree on exactly this kind of input
    val rnd = new scala.util.Random(7)
    val raw = (1 to 150).map(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    val edges = raw.toDF("id_a", "id_b")
    val nodes = (0L until 25L).toDF("id")
    val seeds = Seq(0L, 13L).toDF("v")
    for (k <- Seq(2, 4)) {
      val fast = Dedup.kCore(edges, "id_a", "id_b", k)
        .as[(Long, Long)].collect().toMap
      val iter = Dedup.kCore(edges, "id_a", "id_b", k, maxDriverEdges = 0)
        .as[(Long, Long)].collect().toMap
      assert(fast == iter, s"kCore k=$k")
    }
    val bfsFast = Dedup.bfsHops(edges, "id_a", "id_b", seeds)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val bfsIter = Dedup.bfsHops(edges, "id_a", "id_b", seeds,
        maxDriverEdges = 0)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(bfsFast == bfsIter, "bfsHops")
    for (iters <- Seq(1, 3, 5)) {
      val lpFast = Dedup.labelPropagation(nodes, "id", edges,
          iterations = iters)
        .as[(Long, Long)].collect().toMap
      val lpIter = Dedup.labelPropagation(nodes, "id", edges,
          iterations = iters, maxDriverEdges = 0)
        .as[(Long, Long)].collect().toMap
      assert(lpFast == lpIter, s"labelPropagation iterations=$iters")
    }
  }

  test("pageRank: star center dominates, rank mass conserved, leaves tie") {
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("id_a", "id_b")
    val r = Dedup.pageRank(edges).as[(Long, Double)].collect().toMap
    assert(r.size == 4)
    assert(r(0L) > r(1L), "hub outranks leaves")
    assert(r(1L) == r(2L) && r(2L) == r(3L), "symmetric leaves tie exactly")
    // undirected graph, no dangling mass: ranks sum to ~1 (per-round
    // rounding drifts at most iterations x nodes x 5e-13)
    assert(math.abs(r.values.sum - 1.0) < 1e-9, r.values.sum)
  }

  test("pageRank matches a driver-side reference on a path graph") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val got = Dedup.pageRank(edges, iterations = 5)
      .as[(Long, Double)].collect().toMap
    // brute-force replay: same rounding per round
    def r12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val deg = Map(1L -> 1.0, 2L -> 2.0, 3L -> 2.0, 4L -> 1.0)
    val nbrs = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L),
      3L -> Seq(2L, 4L), 4L -> Seq(3L))
    var rank = deg.map { case (k, _) => k -> r12(1.0 / 4) }
    (1 to 5).foreach { _ =>
      rank = rank.map { case (k, _) =>
        k -> r12((1.0 - 0.85) / 4 +
          0.85 * nbrs(k).map(j => rank(j) / deg(j)).sum)
      }
    }
    rank.foreach { case (k, want) =>
      assert(math.abs(got(k) - want) < 1e-11, s"node $k: ${got(k)} vs $want")
    }
  }

  test("pageRank on an empty edge set is empty") {
    val edges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.pageRank(edges).count() == 0L)
  }

  test("dedupSpansAcrossCorpus drops repeated spans, reassembles in order") {
    // 4-token spans; doc2 repeats doc1's first span (boilerplate) and
    // adds a novel one; doc3 is entirely doc1's content → vanishes
    val d1 = "a b c d e f g h"
    val d2 = "a b c d x y z w"
    val d3 = "a b c d"
    val df = Seq(("d1", d1), ("d2", d2), ("d3", d3)).toDF("id", "text")
    val got = Dedup.dedupSpansAcrossCorpus(df, "id", "text", chunkTokens = 4)
      .as[(String, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("d1", 2L, "a b c d e f g h"),
      ("d2", 1L, "x y z w")))
  }

  test("dedupSpansAcrossCorpus: within-doc repetition also collapses") {
    val df = Seq(("solo", "p q r s p q r s p q r s t u")).toDF("id", "text")
    val got = Dedup.dedupSpansAcrossCorpus(df, "id", "text", chunkTokens = 4)
      .as[(String, Long, String)].collect()
    // spans: [p q r s] ×3 (first kept) + partial tail [t u]
    assert(got.toSeq == Seq(("solo", 2L, "p q r s t u")))
  }

  test("fingerprintNearDupPairs: pigeonhole radius, exact hamming, cap") {
    // fingerprints: 1↔2 differ in 2 bits, 1↔3 in 20 bits, 4 isolated
    val base = 0x0123456789abcdefL
    val near = base ^ 0x3L                 // 2 low bits
    val far = base ^ 0xfffffL             // 20 bits
    val fps = Seq((1L, base), (2L, near), (3L, far),
      (4L, 0x7777000011112222L)).toDF("id", "fp")
    val pairs = Dedup.fingerprintNearDupPairs(fps, "id", "fp",
        maxHamming = 3)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 2)), s"$pairs")
    // radius 63 pairs everything that shares a chunk — hamming exact
    val wide = Dedup.fingerprintNearDupPairs(fps, "id", "fp",
        maxHamming = 25)
      .as[(Long, Long, Int)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(wide.contains((1L, 3L)) == (java.lang.Long.bitCount(base ^ far)
      <= 25))
    // degenerate corpus: identical fingerprints over the cap → dropped
    val pile = (0L until 50L).map(i => (i, 0L)).toDF("id", "fp")
    assert(Dedup.fingerprintNearDupPairs(pile, "id", "fp",
      maxBucketSize = 10).count() == 0L)
  }

  test("dedupSpansAcrossCorpus survivor election is first-occurrence") {
    // the SECOND doc by id carries the span first positionally — the
    // election key is (doc id, position), so 'a1' still wins
    val df = Seq(("z9", "k l m n"), ("a1", "k l m n")).toDF("id", "text")
    val got = Dedup.dedupSpansAcrossCorpus(df, "id", "text", chunkTokens = 4)
      .as[(String, Long, String)].collect()
    assert(got.toSeq == Seq(("a1", 1L, "k l m n")))
  }

  // ---- editDistanceOnePairs ------------------------------------------

  test("editDistanceOnePairs equals all-pairs levenshtein ≤ 1") {
    // brute-force reference over a vocabulary with planted neighbors of
    // every edit kind: substitution (cat/cut), deletion (cat/at),
    // insertion (cat/cart), plus decoys at distance 2+
    val vocab = Seq("cat", "cut", "at", "cart", "dog", "dig", "dgo",
      "hello", "hallo", "hell", "xyz", "abc", "ab", "ba")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- vocab; b <- vocab if a < b && lev(a, b) <= 1
    } yield (a, b, 1)).sorted
    val got = Dedup.editDistanceOnePairs(vocab.toDF("s"), "s")
      .as[(String, String, Int)].collect().sorted
    assert(got.toSeq == want)
    assert(want.exists(p => p._1 == "at" && p._2 == "cat"))   // deletion
    assert(want.exists(p => p._1 == "cart" && p._2 == "cat")) // insertion
    assert(want.exists(p => p._1 == "cat" && p._2 == "cut"))  // substitution
  }

  test("editDistanceOnePairs rejects shared-variant distance-2 pairs") {
    // "ab"/"ba" share deletion variants "a" AND "b" but are distance 2
    val got = Dedup.editDistanceOnePairs(Seq("ab", "ba").toDF("s"), "s")
    assert(got.count() == 0)
  }

  test("editDistanceOnePairs: duplicates don't pair; hot buckets cap") {
    // identical strings collapse before pairing (no self-pairs)
    assert(Dedup.editDistanceOnePairs(
      Seq("same", "same", "same").toDF("s"), "s").count() == 0)
    // a1/a2/a3 all share variant "a" (bucket size 3 > cap 2) and share
    // no other variant — capped bucket produces no pairs
    assert(Dedup.editDistanceOnePairs(
      Seq("a1", "a2", "a3").toDF("s"), "s", maxBucketSize = 2).count() == 0)
  }

  // ---- sortedNeighborhoodPairs ----------------------------------------

  test("sortedNeighborhoodPairs: window-bounded successors with gaps, " +
      "heuristic recall documented by misses") {
    // block = first char. Block 'a': sorted [aa, ab, ac, ad, az] —
    // window 2 pairs each with its next two; az is 2 past ad but 4
    // past aa (missed: the heuristic trade). Block 'b' is isolated.
    val df = Seq("ab", "aa", "az", "ad", "ac", "ba").toDF("s")
    val got = Dedup.sortedNeighborhoodPairs(df, "s",
        blockOf = c => substring(c, 1, 1), window = 2)
      .as[(String, String, Int)].collect().toSet
    assert(got == Set(
      ("aa", "ab", 1), ("aa", "ac", 2),
      ("ab", "ac", 1), ("ab", "ad", 2),
      ("ac", "ad", 1), ("ac", "az", 2),
      ("ad", "az", 1)))
    // no cross-block candidates, no (aa, az) — sort distance 4 > window
    assert(!got.exists(p => p._1.head != p._2.head))
  }

  test("sortedNeighborhoodPairs: duplicates collapse before ranking") {
    val df = Seq("x1", "x1", "x2").toDF("s")
    val got = Dedup.sortedNeighborhoodPairs(df, "s",
      blockOf = c => substring(c, 1, 1), window = 3)
    assert(got.count() == 1) // one (x1, x2), never a self-pair
  }

  // ---- triangles -----------------------------------------------------

  test("triangles: enumerates each triangle once, ordered") {
    // K4 on {1,2,3,4} (4 triangles) plus pendant 5 and isolated-ish
    // chain 6-7 (no triangles); edges given in mixed orientation with
    // a duplicate and a self-loop to exercise normalization
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (4L, 2L), (3L, 4L), (4L, 5L), (6L, 7L), (6L, 6L)).toDF("id_a", "id_b")
    val got = Dedup.triangles(edges).as[(Long, Long, Long)]
      .collect().sorted
    assert(got.toSeq == Seq((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L),
      (2L, 3L, 4L)))
  }

  test("triangles: paths and stars have none") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    assert(Dedup.triangles(path).count() == 0)
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
      .toDF("id_a", "id_b")
    assert(Dedup.triangles(star).count() == 0)
  }

  test("triangles: hub-heavy wheel matches the closed form") {
    // wheel: hub 0 + cycle 1..8 — triangles = the 8 cycle edges each
    // closing with the hub; degree orientation handles the hub without
    // wedge blowup
    val n = 8L
    val cycle = (1L to n).map(i => (i, if (i == n) 1L else i + 1))
    val spokes = (1L to n).map(i => (0L, i))
    val got = Dedup.triangles((cycle ++ spokes).toDF("id_a", "id_b"))
    assert(got.count() == n)
  }

  test("triangleCount census equals the enumeration on every fixture " +
      "(K4+noise, path, star, wheel)") {
    val k4 = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (4L, 2L), (3L, 4L), (4L, 5L), (6L, 7L), (6L, 6L)).toDF("id_a", "id_b")
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
      .toDF("id_a", "id_b")
    val wheel = ((1L to 8L).map(i => (i, if (i == 8L) 1L else i + 1)) ++
      (1L to 8L).map(i => (0L, i))).toDF("id_a", "id_b")
    Seq(k4 -> 8L, path -> 3L, star -> 4L, wheel -> 16L).foreach {
      case (g, nEdges) =>
        val row = Dedup.triangleCount(g).head()
        assert(row.getAs[Long]("n_edges") == nEdges,
          s"edges: ${row.getAs[Long]("n_edges")} vs $nEdges")
        assert(row.getAs[Long]("n_triangles") == Dedup.triangles(g).count(),
          "census disagrees with the enumeration")
        assert(row.getAs[Long]("n_wedges") >= row.getAs[Long]("n_triangles"),
          "every triangle is a closed wedge")
    }
  }

  test("adamicAdar: scores the one non-edge by its common neighbors, " +
      "never proposes an existing edge") {
    // square with one diagonal: edges 1-2, 1-3, 2-3, 2-4, 3-4.
    // the only non-edge is (1,4); common neighbors {2, 3}, both deg 3.
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("id_a", "id_b")
    val out = Dedup.adamicAdar(g).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getAs[Long]("u"), r.getAs[Long]("v")) == ((1L, 4L)))
    assert(r.getAs[Long]("scored_common_nbrs") == 2L)
    // no center exceeds the default cap; hottest degree is 3
    assert(r.getAs[Long]("excluded_centers") == 0L)
    assert(r.getAs[Long]("max_degree") == 3L)
    // replay the declared quantization: two centers of degree 3
    val term = math.floor(1e9 / math.log(3.0) + 0.5).toLong
    val want = BigDecimal(2L * term / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("aa_score") == want)
  }

  test("adamicAdar: the center-degree cap drops hub wedges; topK cuts " +
      "on the exact integer score") {
    // star 0-{1..5}: every pair (i,j) is a non-edge scored through
    // hub 0 (deg 5). with the cap below 5 nothing is proposed.
    val star = (1L to 5L).map(i => (0L, i)).toDF("id_a", "id_b")
    assert(Dedup.adamicAdar(star, maxCenterDegree = 4).count() == 0)
    val all = Dedup.adamicAdar(star).collect()
    assert(all.length == 10) // C(5,2) proposals, all through the hub
    assert(all.map(_.getAs[Long]("scored_common_nbrs")).forall(_ == 1L))
    // the census reports the cap's effect: cap 4 excludes the deg-5
    // hub (visible even though the result is then empty — checked via
    // the uncapped run, where nothing is excluded and max degree is 5)
    assert(all.map(_.getAs[Long]("excluded_centers")).forall(_ == 0L))
    assert(all.map(_.getAs[Long]("max_degree")).forall(_ == 5L))
    val top3 = Dedup.adamicAdar(star, topK = 3).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v")))
    // equal scores tie-break on (u, v) ascending
    assert(top3.toSeq == Seq((1L, 2L), (1L, 3L), (1L, 4L)))
  }

  test("minhashCalibration: pct=100 twin pairs read exact=est=1; " +
      "closed-form exact Jaccard; estimates quantized to k") {
    // one 10-token doc: prefix-50% keeps 5 tokens → 3 shingles, all
    // shared with the full doc's 8 → J = 3/8 = 0.375 exactly
    val doc = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val out = Dedup.minhashCalibration(doc, "doc_id", "text",
        pcts = Seq(50, 100), k = 16)
      .orderBy("pct").collect()
    assert(out.length == 2)
    val p50 = out(0)
    assert(p50.getInt(0) == 50 && p50.getLong(1) == 1L)
    assert(p50.getDouble(2) == 0.375, s"exact ${p50.getDouble(2)}")
    // the estimate is a matches/16 rational in [0, 1]
    val est50 = p50.getDouble(3)
    assert(est50 >= 0 && est50 <= 1 &&
      math.rint(est50 * 16) == est50 * 16)
    val p100 = out(1)
    assert(p100.getDouble(2) == 1.0 && p100.getDouble(3) == 1.0 &&
      p100.getDouble(4) == 0.0,
      "an identical pair must calibrate to exact = est = 1, err = 0")
  }

  test("minhashCalibration: docs too short for any variant shingle " +
      "are excluded, never divide-by-zero") {
    val docs = Seq((1L, "a b c"), (2L, "x y z w v u t s")).toDF(
      "doc_id", "text")
    // pct 30 of 3 tokens = 0 tokens → no shingles → doc 1 excluded;
    // doc 2 keeps 2 tokens at 30% → still < 3 → excluded too
    val out = Dedup.minhashCalibration(docs, "doc_id", "text",
      pcts = Seq(30), k = 4).collect()
    assert(out.isEmpty || out.forall(_.getLong(1) >= 1L))
    // pct 100 keeps both
    val full = Dedup.minhashCalibration(docs, "doc_id", "text",
      pcts = Seq(100), k = 4).head()
    assert(full.getLong(1) == 2L && full.getDouble(2) == 1.0)
  }

  test("setSimilarityJoin: exact — equals the brute-force all-pairs " +
      "Jaccard at every threshold (prefix filter drops nothing)") {
    // word-salad docs with two planted near-dup pairs and decoys
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),
      (2L, base + " lambda"),                       // high-Jaccard twin of 1
      (3L, "alpha beta gamma delta epsilon zeta eta theta mu nu"),
      (4L, "one two three four five six seven eight nine ten"),
      (5L, "one two three four five six seven eight nine ten"),  // exact dup
      (6L, "totally different words in this row here now yes ok")
    ).toDF("doc_id", "text")
    def brute(num: Int, den: Int): Set[(Long, Long, Int, Int)] = {
      val sh = docs.collect().map { r =>
        val t = r.getString(1).trim.split("\\s+")
        r.getLong(0) -> t.sliding(3).map(_.mkString(" ")).toSet
      }.toMap
      (for {
        a <- sh.keys; b <- sh.keys if a < b
        i = (sh(a) & sh(b)).size; u = (sh(a) | sh(b)).size
        if i * den >= u * num && u > 0
      } yield (a, b, i, u)).toSet
    }
    for ((num, den) <- Seq((4, 5), (1, 2), (1, 10))) {
      val got = Dedup.setSimilarityJoin(docs, "doc_id", "text", num, den)
        .collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Int]("inter"), r.getAs[Int]("un"))).toSet
      assert(got == brute(num, den), s"threshold $num/$den")
    }
  }

  test("setSimilarityJoin: exact duplicates score jac 1.0 under ANY " +
      "posting cap; the cap's completeness trade applies to DISTINCT " +
      "sets only") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"))
      .toDF("doc_id", "text")
    val r = Dedup.setSimilarityJoin(docs, "doc_id", "text", 9, 10).head()
    assert(r.getAs[Double]("jac") == 1.0)
    // dedup-first: identical sets pair through the intra-group
    // expansion, never the prefix join — a cap of 1 cannot lose them
    // (pre-r7 this pair was silently dropped, the twin-pile trade)
    val capped = Dedup.setSimilarityJoin(docs, "doc_id", "text", 9, 10,
      maxTokenBucket = 1).head()
    assert(capped.getAs[Double]("jac") == 1.0)
    // DISTINCT near-dup sets still ride the prefix join, where cap = 1
    // drops shared hot postings — the documented completeness trade
    val distinctDocs = Seq((1L, "a b c d e"), (2L, "a b c d e f"))
      .toDF("doc_id", "text")
    assert(Dedup.setSimilarityJoin(distinctDocs, "doc_id", "text", 1, 2)
      .count() == 1)
    assert(Dedup.setSimilarityJoin(distinctDocs, "doc_id", "text", 1, 2,
      maxTokenBucket = 1).count() == 0)
  }

  test("setSimilarityJoin: a true pair whose FIRST common prefix " +
      "tokens are capped still survives through a later uncapped one " +
      "(the per-row positional bound of the capped regime)") {
    // n = 1 (word tokens) for direct control of the token sets.
    // A = {aa ab ax az}, B = {aa ab ax azz}: J = 3/5 ≥ 1/2. Global
    // freqs are pumped to 5 for every A/B token (ties broken by token
    // string, so each doc's rarest-first order is alphabetical), and
    // the decoy shapes put ONLY aa/ab into other prefixes:
    //   - "aa ab" ×3: both tokens in prefix → posting(aa) = posting(ab)
    //     = 5 > cap 2 — the pair's first common tokens are CAPPED;
    //   - "ax u v" / "az s t" / "azz g h" pumps: the pumped token is
    //     the doc's HOTTEST, outside its 2-token prefix → posting(ax)
    //     stays 2 ≤ cap.
    // The pair's only surviving collision row is ax at positions
    // (3, 3) of the two 4-token arrays. The first-common-token bound
    // (1 + min(sz − pos)) · (num + den) = 2·3 = 6 < 8 = (sz_a + sz_b)
    // · num would DROP that row — losing a true pair whose shared
    // prefix tokens are NOT all capped, the r17 defect. The per-row
    // bound (least(pos) + least(sz − pos)) · 3 = 12 ≥ 8 keeps it.
    val docs = (Seq(
      (1L, "aa ab ax az"),
      (2L, "aa ab ax azz"),
      (3L, "aa ab"), (4L, "aa ab"), (5L, "aa ab")) ++
      Seq("u1 v1", "u2 v2", "u3 v3").zipWithIndex.map { case (s, i) =>
        (10L + i, s"ax $s") } ++
      Seq("s1 t1", "s2 t2", "s3 t3", "s4 t4").zipWithIndex.map {
        case (s, i) => (20L + i, s"az $s") } ++
      Seq("g1 h1", "g2 h2", "g3 h3", "g4 h4").zipWithIndex.map {
        case (s, i) => (30L + i, s"azz $s") }).toDF("doc_id", "text")
    val got = Dedup.setSimilarityJoin(docs, "doc_id", "text", 1, 2,
        n = 1, maxTokenBucket = 2)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("inter"), r.getAs[Int]("un"))).toSet
    // expected: the planted (1, 2) pair plus the three exact-dup decoy
    // pairs (3,4)/(3,5)/(4,5) — nothing else reaches J ≥ 1/2
    assert(got == Set((1L, 2L, 3, 5),
      (3L, 4L, 2, 2), (3L, 5L, 2, 2), (4L, 5L, 2, 2)), got.toString)
  }

  test("entityClusters: string pairs cluster through min-id node " +
      "mapping; representatives own the minimum id") {
    val df = Seq(
      (10L, "acme corp"), (11L, "acme corp"),    // same key, two rows
      (12L, "acme corpx"),                       // pair-linked variant
      (20L, "zeta ltd"),                         // singleton
      (30L, "beta inc"), (31L, "beta incx")      // second cluster
    ).toDF("rid", "name")
    val pairs = Seq(("acme corp", "acme corpx"), ("beta inc", "beta incx"))
      .toDF("s_a", "s_b")
    val got = Dedup.entityClusters(df, "rid", "name", pairs)
      .collect()
      .map(r => r.getAs[String]("name") ->
        ((r.getAs[Long]("entity_id"), r.getAs[Boolean]("is_rep")))).toMap
    assert(got("acme corp") == ((10L, true)))    // min id 10 elected
    assert(got("acme corpx") == ((10L, false)))
    assert(got("zeta ltd") == ((20L, true)))     // singleton is its own rep
    assert(got("beta inc") == ((30L, true)))
    assert(got("beta incx") == ((30L, false)))
  }

  test("entityClusters: pairs referencing unknown keys don't invent " +
      "clusters; null keys drop") {
    val df = Seq((1L, Option("a")), (2L, Option("b")),
      (3L, Option.empty[String])).toDF("rid", "name")
    val pairs = Seq(("a", "ghost")).toDF("s_a", "s_b")
    val got = Dedup.entityClusters(df, "rid", "name", pairs).collect()
    assert(got.length == 2) // a, b — the null key never enters the graph
    assert(got.forall(_.getAs[Boolean]("is_rep")))
  }

  // ---- labelPropagation ---------------------------------------------

  /** Straight-line synchronous LPA: the definition the distributed
    * operator must reproduce round-for-round.
    */
  private def refLpa(nodes: Seq[Long], edges: Seq[(Long, Long)],
      rounds: Int): Map[Long, Long] = {
    val nbrs = (edges ++ edges.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    var lab = nodes.map(n => n -> n).toMap
    (1 to rounds).foreach { _ =>
      val prev = lab
      lab = nodes.map { n =>
        val counts = nbrs.getOrElse(n, Nil).map(prev).groupBy(identity)
          .view.mapValues(_.size).toMap
        n -> (if (counts.isEmpty) prev(n)
              else counts.toSeq.minBy { case (l, c) => (-c, l) }._1)
      }.toMap
    }
    lab
  }

  private def runLpa(nodes: Seq[Long], edges: Seq[(Long, Long)]) =
    Dedup.labelPropagation(nodes.toDF("id"), "id",
        edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labelPropagation reproduces the synchronous reference " +
      "round-for-round") {
    val nodes = (1L to 10L).toSeq
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (4L, 6L), (5L, 6L), (7L, 8L), (8L, 9L))
    assert(runLpa(nodes, edges) == refLpa(nodes, edges, 5))
  }

  test("labelPropagation keeps bridged triangles in separate " +
      "communities where components would merge them") {
    val nodes = (1L to 6L).toSeq
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)) // two triangles + one bridge
    val lab = runLpa(nodes, edges)
    assert(lab(1L) == lab(2L) && lab(2L) == lab(3L))
    assert(lab(4L) == lab(5L) && lab(5L) == lab(6L))
    assert(lab(1L) != lab(4L))
    val comp = Dedup.connectedComponents(nodes.toDF("id"), "id",
        edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.values.toSet.size == 1) // components DO merge them
  }

  test("labelPropagation: isolated nodes keep their own label") {
    val lab = runLpa(Seq(1L, 2L, 9L), Seq((1L, 2L)))
    assert(lab(9L) == 9L)
    // the connected pair follows the synchronous definition exactly
    // (a 2-cycle oscillates under sync LPA; that IS the contract)
    assert(lab == refLpa(Seq(1L, 2L, 9L), Seq((1L, 2L)), 5))
  }

  test("duplicateSubstringReport: offset-shifted shared substrings are " +
      "caught, unique docs stay clean, twins expand with exact counts") {
    import org.apache.spark.sql.functions.{array_distinct, col, size => asize}
    val shared = "zqxjvkwpbyfmg" // 13 >= k + w - 1: guarantee applies
    val twinText = "twins share every anchor gram here obviously"
    val docs = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"a completely different and longer head $shared tail"),
      (3L, "qqwweerrttyyuuiiooppaassddffgg"), // no 8-gram shared w/ others
      (4L, twinText), (5L, twinText),
      (6L, "short")). // < k codepoints: no anchors, no row
      toDF("doc_id", "text")
    val out = Dedup.duplicateSubstringReport(docs, "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_dup_grams"),
          r.getAs[Double]("dup_frac")))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // the shared 13-char substring guarantees >= 1 common anchor
    assert(out(1L)._2 >= 1L && out(2L)._2 >= 1L)
    // a document sharing no 8-gram with any other is fully clean
    assert(out(3L)._2 == 0L && out(3L)._3 == 0.0)
    // exact twins: every anchor gram is corpus-duplicated, and the
    // per-rep report re-expands to BOTH member ids identically
    assert(out(4L) == out(5L))
    val twinGramCount = Seq(twinText).toDF("t")
      .select(asize(array_distinct(
        graft.functions.WinnowExprs.winnowGrams(col("t")))).as("n"))
      .as[Int].collect().head.toLong
    assert(out(4L) == ((twinGramCount, twinGramCount, 1.0)))
  }
}
