package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The delta-ingestion path: a persisted (band, bucket)-bucketed
  * corpus index, probed by a new batch without corpus reshuffle.
  */
class DeltaDedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "an entirely different document about spark physical plans"),
    (3L, "the quick brown fox jumps over the lazy dog tonight")
  ).toDF("id", "text")

  private lazy val idx = Dedup.minhashBucketIndex(
    corpus, "id", "text", spec = "deltaspec-corpus", numBuckets = 4)

  test("batch near-dups against the index: cross and intra pairs found") {
    val batch = Seq(
      // near-dup of corpus docs 1/3 (one token changed)
      (10L, "the quick brown fox jumps over the lazy dog today"),
      // exact dup of corpus doc 2
      (11L, "an entirely different document about spark physical plans"),
      // unrelated
      (12L, "completely unrelated content with no shared shingles at all"),
      // intra-batch twin of 10
      (13L, "the quick brown fox jumps over the lazy dog today")
    ).toDF("id", "text")
    val pairs = Dedup.nearDupCandidatesAgainstIndex(
        batch, "id", "text", idx)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 10L)) && pairs.contains((3L, 10L)),
      s"cross near-dup missing: $pairs")
    assert(pairs.contains((2L, 11L)), s"cross exact dup missing: $pairs")
    assert(pairs.contains((10L, 13L)), s"intra-batch pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 12L || p._2 == 12L),
      s"unrelated doc paired: $pairs")
    // every pair touches the batch (that is the operator's contract)
    assert(pairs.forall(p => p._1 >= 10L || p._2 >= 10L), s"$pairs")
  }

  test("probe reads the corpus index co-located — no corpus-side shuffle") {
    val batch = Seq((20L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    val p = Dedup.nearDupCandidatesAgainstIndex(batch, "id", "text", idx)
      .queryExecution.executedPlan.toString
    // the bucketed index scan appears, and no Exchange sits between it
    // and its join: every hashpartitioning exchange in the plan is on
    // the batch/probe side
    assert(p.contains("SelectedBucketsCount"), p.take(2000))
    val corpusScan = p.linesIterator
      .filter(_.contains("graft_mhidx")).mkString("\n")
    assert(corpusScan.nonEmpty, p.take(2000))
    // walk up from the index scan: the operator directly above it must
    // not be an Exchange (bucketed co-location removed it)
    val lines = p.linesIterator.toVector
    val scanIdx = lines.indexWhere(_.contains("graft_mhidx"))
    val above = lines.take(scanIdx).reverse.take(2).mkString("\n")
    assert(!above.contains("Exchange hashpartitioning"),
      s"corpus side shuffled:\n$above")
  }

  test("stored bucket sizes prune hot buckets at probe time") {
    // a boilerplate pile: many identical docs → one hot bucket set
    val pile = (100L until 120L).map(i => (i, "same boilerplate text " +
      "repeated across the whole pile of documents")).toDF("id", "text")
    val pileIdx = Dedup.minhashBucketIndex(pile, "id", "text",
      spec = "deltaspec-pile", numBuckets = 4)
    val batch = Seq((999L, "same boilerplate text repeated across the " +
      "whole pile of documents")).toDF("id", "text")
    // cap below the pile size → no pairs (hot buckets excluded)
    val capped = Dedup.nearDupCandidatesAgainstIndex(batch, "id", "text",
      pileIdx, maxBucketSize = 10)
    assert(capped.count() == 0L)
    // raised cap → the whole pile pairs with the probe
    val open = Dedup.nearDupCandidatesAgainstIndex(batch, "id", "text",
      pileIdx, maxBucketSize = 100)
    assert(open.count() == 20L)
  }

  test("deltaDedupVerified equals the brute-force all-pairs Jaccard " +
      "definition restricted to pairs touching the batch") {
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "an entirely different document about spark physical plans"),
      (12L, "completely unrelated content with no shared shingles at all"),
      (13L, "the quick brown fox jumps over the lazy dog today"),
      // near-identical to 10 with one appended token — above 0.8
      (14L, "the quick brown fox jumps over the lazy dog today indeed")
    ).toDF("id", "text")
    val got = Dedup.deltaDedupVerified(batch, "id", "text", idx, corpus)
      .as[(Long, Long, Double)].collect().toSet
    // brute force: every pair of corpus ∪ batch touching the batch
    def sh(t: String): Set[String] =
      t.trim.split("\\s+").toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    val all = (Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "an entirely different document about spark physical plans"),
      (3L, "the quick brown fox jumps over the lazy dog tonight")) ++
      Seq((10L, "the quick brown fox jumps over the lazy dog today"),
        (11L, "an entirely different document about spark physical plans"),
        (12L, "completely unrelated content with no shared shingles at all"),
        (13L, "the quick brown fox jumps over the lazy dog today"),
        (14L, "the quick brown fox jumps over the lazy dog today indeed")))
    val want = (for {
      (ia, ta) <- all; (ib, tb) <- all
      if ia < ib && ib >= 10L
      sa = sh(ta); sb = sh(tb)
      inter = (sa & sb).size
      uni = sa.size + sb.size - inter
      if uni > 0
      j = math.floor(inter.toDouble / uni * 1e6 + 0.5) / 1e6
      if j >= 0.8
    } yield (ia, ib, j)).toSet
    assert(want.nonEmpty && got == want,
      s"got ${got.toSeq.sorted}\nwant ${want.toSeq.sorted}")
  }

  test("winnow-anchor index probe: re-crawled text hits at substring " +
      "grain, novel text misses, twins expand") {
    val wIdx = Dedup.winnowAnchorIndex(corpus, "id", "text",
      spec = "deltaspec-wnidx", numBuckets = 4)
    // no 8-codepoint window of this string occurs in the corpus (the
    // first draft used real English words and "entirely" was a REAL
    // substring hit on corpus doc 2 — the operator was right)
    val novel = "qq ww ee rr tt yy uu ii oo zz xx cc vv bb nn mm kk jj"
    val batch = Seq(
      // exact re-crawl of corpus doc 1 → every anchor hits
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (11L, "the quick brown fox jumps over the lazy dog tonight"),
      // fully novel text → zero hits
      (12L, novel),
      // corpus text + novel tail → hit_frac strictly inside (0, 1)
      (13L, "the quick brown fox jumps over the lazy dog tonight " + novel))
      .toDF("id", "text")
    val out = Dedup.substringDupAgainstIndex(batch, "id", "text", wIdx)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit_grams"),
          r.getAs[Double]("hit_frac")))).toMap
    assert(out.keySet == Set(10L, 11L, 12L, 13L))
    assert(out(10L)._1 == out(10L)._2 && out(10L)._3 == 1.0,
      s"exact re-crawl must fully hit: ${out(10L)}")
    assert(out(10L) == out(11L), "twin rows must re-expand identically")
    assert(out(12L)._2 == 0L && out(12L)._3 == 0.0,
      s"novel text must miss: ${out(12L)}")
    assert(out(13L)._2 > 0L && out(13L)._2 < out(13L)._1,
      s"mixed text must partially hit: ${out(13L)}")
  }

  test("winnow probe reads the gram-bucketed index co-located — no " +
      "corpus-side shuffle") {
    val wIdx = Dedup.winnowAnchorIndex(corpus, "id", "text",
      spec = "deltaspec-wnidx", numBuckets = 4)
    val batch = Seq((20L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    val p = Dedup.substringDupAgainstIndex(batch, "id", "text", wIdx)
      .queryExecution.executedPlan.toString
    assert(p.contains("SelectedBucketsCount"), p.take(2000))
    val lines = p.linesIterator.toVector
    val scanIdx = lines.indexWhere(_.contains("graft_wnidx"))
    assert(scanIdx >= 0, p.take(2000))
    val above = lines.take(scanIdx).reverse.take(2).mkString("\n")
    assert(!above.contains("Exchange hashpartitioning"),
      s"corpus side shuffled:\n$above")
  }
}
