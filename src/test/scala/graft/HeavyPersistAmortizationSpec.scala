package graft

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.storage.StorageLevel

import graft.operators.TextAnalysis

/** Pins the HeavyPersist amortization contract the q82→q98 bench block
  * depends on (HeavyPersist.scala documents a silent-recompute mode
  * when two heavy pipelines interleave — this suite makes cache-thrash
  * a NAMED failure, the way TableSchemaContractSpec did for schemas):
  *
  *  1. Within one operator, the shared (doc, term) frame is computed
  *     from the corpus ONCE, not once per consuming branch — measured
  *     with a row-counting probe on the corpus scan, so a persist
  *     regression shows up as a 3-4× scan count, not a silent slowdown.
  *  2. Running the heavy block's queries back-to-back in registration
  *     order (as Bench does) leaves only the LATEST scope's frames
  *     persisted — the registry is bounded, no leak across queries.
  *  3. "Latest pipeline wins" eviction is visible: building pipeline B
  *     unpersists pipeline A's frames (A stays correct, just uncached).
  */
class HeavyPersistAmortizationSpec extends SparkSpec {

  /** The corpus with a scan-counting probe: the nondeterministic filter
    * runs once per row per physical corpus scan, so acc.value / nRows
    * is the number of times the text was re-read (and re-tokenized
    * downstream). Nondeterministic → never folded or pushed into the
    * parquet scan, and it fences persist boundaries the same way the
    * real operators' expressions do.
    */
  private def probedDocs = {
    val acc = spark.sparkContext.longAccumulator("corpus-scans")
    val probe = F.udf(() => { acc.add(1L); true }).asNondeterministic()
    val df = Tables(spark, sf, "documents").filter(probe())
    (df, acc)
  }

  private lazy val nDocs: Long = Tables(spark, sf, "documents").count()

  test("bm25: four consuming branches, ONE corpus scan (tf persisted)") {
    val (docs, acc) = probedDocs
    TextAnalysis.bm25TopK(docs, "doc_id", "text", k = 3).count()
    // expected exactly nDocs (one scan feeding the persisted tf frame);
    // the regression this guards — tf silently uncached — re-tokenizes
    // the corpus once per branch (score join, dl, df, stats) = 4×.
    // <= 2× tolerates block-race duplication, still far below 4×.
    assert(acc.value >= nDocs, s"probe saw ${acc.value} rows of $nDocs")
    assert(acc.value <= 2 * nDocs,
      s"corpus scanned ${acc.value.toDouble / nDocs}x — tf frame recomputed")
  }

  test("tfidf: corpus scanned at most twice (tf persisted + nDocs agg)") {
    val (docs, acc) = probedDocs
    TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 3).count()
    assert(acc.value >= nDocs)
    assert(acc.value <= 3 * nDocs,
      s"corpus scanned ${acc.value.toDouble / nDocs}x — tf frame recomputed")
  }

  test("q82→q98 heavy block in registration order keeps the persisted " +
      "registry bounded (latest scope only, no cross-query leak)") {
    val block = Seq("q82_bm25", "q83_ngram_topk", "q84_semantic_dedup",
      "q98_dedup_corpus")
    for (name <- block) {
      SparkEntry.queries(name)(spark, sf).count()
      val live = spark.sparkContext.getPersistentRDDs.size
      // one scope's worth of frames: the near-dup pipelines persist at
      // most a handful (featurized corpus, pair frame, expansion edges)
      // plus session-lifetime table/index memos. 32 is far above any
      // single scope and far below an accumulating leak across queries.
      assert(live <= 32, s"$name left $live persisted RDDs — registry leak")
    }
  }

  test("latest pipeline wins: building B evicts A's frames; A stays " +
      "correct (documented silent-recompute mode), B stays cached") {
    val docs = Tables(spark, sf, "documents")
    val a = HeavyPersist(docs.select(F.col("doc_id"),
      F.length(F.col("text")).as("len")))
    a.count()
    assert(a.storageLevel == StorageLevel.MEMORY_AND_DISK)
    val b = HeavyPersist(docs.select(F.col("doc_id"),
      F.lower(F.col("text")).as("lo")))
    b.count()
    assert(a.storageLevel == StorageLevel.NONE,
      "A should have been evicted when B opened a fresh scope")
    assert(b.storageLevel == StorageLevel.MEMORY_AND_DISK)
    // A is uncached but must still compute correctly
    assert(a.count() == nDocs)
    // and a non-fresh scope ADDs without evicting
    val c = HeavyPersist(docs.select(F.col("doc_id")), freshScope = false)
    c.count()
    assert(b.storageLevel == StorageLevel.MEMORY_AND_DISK,
      "freshScope=false must not evict the live scope")
    assert(c.storageLevel == StorageLevel.MEMORY_AND_DISK)
  }
}
