package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find (and remove) training documents
  * that share word n-grams with an evaluation corpus — the standard
  * defense against test-set leakage into training data.
  *
  * Shape at 100 TB: the EVAL side is small by nature (benchmark suites
  * are megabytes), so its distinct n-gram set is broadcast and the
  * train side never shuffles — one scan, one broadcast hash join, one
  * partial+final aggregation on the train doc id. The train corpus is
  * shingled via the same materialized-token path as the dedup
  * operators (see Dedup doc on interpreted higher-order functions).
  */
object Decontaminate {

  /** Per contaminated train doc: how many distinct n-grams it shares
    * with the eval corpus and how many eval docs it overlaps. Only
    * contaminated docs appear (inner join on the gram).
    */
  def contaminationReport(train: DataFrame, trainId: String,
      trainText: String, eval: DataFrame, evalId: String, evalText: String,
      n: Int = 8): DataFrame = {
    // explode_outer, not explode: Catalyst's InferFiltersFromGenerate
    // turns an inner explode into a pushed-down `size(...) > 0` filter
    // that INLINES the whole shingle expression (re-splitting the text
    // per element_at reference, per row) — measured 50× slower on the
    // train side. The outer form generates no such filter; the one
    // null row an empty doc produces is dropped after, for free.
    val evalGrams = Dedup.shingleFrame(eval, evalId, evalText, n)
      .select(explode_outer(col("sh")).as("gram"), col(evalId).as("__eval_id"))
      .filter(col("gram").isNotNull)
      .distinct()
    val trainGrams = Dedup.shingleFrame(train, trainId, trainText, n)
      .select(col(trainId), explode_outer(col("sh")).as("gram"))
      .filter(col("gram").isNotNull)
    trainGrams.join(broadcast(evalGrams), "gram")
      .groupBy(col(trainId))
      .agg(count_distinct(col("gram")).as("n_shared_grams"),
        count_distinct(col("__eval_id")).as("n_eval_docs"))
  }

  /** Per-(train, eval) CONTAINMENT scores — the asymmetric overlap
    * metric eval contamination actually needs: containment =
    * |grams(train) ∩ grams(eval)| / |grams(eval)|, which flags an
    * eval question embedded verbatim in a much larger train document
    * where Jaccard (q71's symmetric metric) is diluted toward zero by
    * the train doc's size. Emits every pair sharing ≥ 1 gram with its
    * shared-gram count and containment in [0, 1].
    *
    * Same scale shape as [[contaminationReport]]: the eval side
    * (distinct grams + per-doc totals) broadcasts; the train gram
    * stream joins it without shuffling, and only the matched rows
    * enter the per-pair aggregation. Two refinements keep the train
    * side narrow at corpus scale: per-doc gram dedup happens INSIDE
    * the row (`array_distinct` on the shingle array — the naive
    * `explode().distinct()` is a corpus-sized shuffle for a purely
    * row-local property), and the featurization is exact-dedup-first
    * (the graft-wide convention): grams are built once per DISTINCT
    * text and the matched pairs — the only rows that survive the
    * broadcast join — re-expand to member documents at the end.
    * The division is one double op from two integer counts,
    * floor-rounded to 6 decimals.
    */
  def containmentReport(train: DataFrame, trainId: String,
      trainText: String, eval: DataFrame, evalId: String, evalText: String,
      n: Int = 8): DataFrame = {
    val evalGrams = Dedup.shingleFrame(eval, evalId, evalText, n)
      .select(col(evalId).as("eval_id"),
        explode_outer(array_distinct(col("sh"))).as("gram"))
      .filter(col("gram").isNotNull)
    val evalTotals = evalGrams.groupBy("eval_id")
      .agg(count(lit(1)).as("__n_eval_grams"))
    val docs = train.select(col(trainId), col(trainText).as("__txt"))
      .withColumn("__h", md5(coalesce(col("__txt"), lit(""))))
    val reps = docs.groupBy(col("__h")).agg(first(col("__txt")).as("__txt"))
    val repGrams = Dedup.shingleFrame(reps, "__h", "__txt", n)
      .select(col("__h"), explode_outer(array_distinct(col("sh"))).as("gram"))
      .filter(col("gram").isNotNull)
    val repPairs = repGrams.join(broadcast(evalGrams), "gram")
      .groupBy(col("__h"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
    docs.select(col(trainId), col("__h"))
      .join(repPairs, "__h")
      .join(broadcast(evalTotals), "eval_id")
      .select(col(trainId), col("eval_id"), col("n_shared_grams"),
        (floor(col("n_shared_grams").cast("double") /
          col("__n_eval_grams") * 1e6 + 0.5) / 1e6).as("containment"))
  }

  /** The cleaned training corpus: drop every doc the report flags
    * (left anti join on the contaminated id set).
    */
  def decontaminate(train: DataFrame, trainId: String, trainText: String,
      eval: DataFrame, evalId: String, evalText: String,
      n: Int = 8): DataFrame = {
    val bad = contaminationReport(train, trainId, trainText,
      eval, evalId, evalText, n).select(col(trainId))
    train.join(bad, Seq(trainId), "left_anti")
  }

  /** Per-train-doc Bloom contamination flags — the memory-lean form of
    * [[contaminationReport]] for when the eval gram set is too large to
    * broadcast as an exact hash set: a Bloom filter costs ~10 bits per
    * gram at 1% false positives (vs ~10² bytes per entry for the set),
    * and its guarantee has exactly the right polarity for this job —
    * NO false negatives, so a leak can never slip through; false
    * positives only send a few extra docs to exact re-checking.
    * Returns (id, bloom_hit) for EVERY train doc.
    *
    * The filter builds distributedly (`stat.bloomFilter` is a
    * mergeable aggregate over the gram frame) and ships to executors
    * once in the predicate's closure; the train side stays one scan.
    */
  def bloomContaminationFlags(train: DataFrame, trainId: String,
      trainText: String, eval: DataFrame, evalId: String, evalText: String,
      n: Int = 8, fpp: Double = 0.01): DataFrame = {
    val evalGrams = Dedup.shingleFrame(eval, evalId, evalText, n)
      .select(explode_outer(col("sh")).as("gram"))
      .filter(col("gram").isNotNull)
      .distinct()
    // the eval side is bounded (benchmark-sized), so the count action
    // sizing the filter is cheap metadata, like the ANN centroid pull
    val nGrams = math.max(evalGrams.count(), 1L)
    val bf = evalGrams.stat.bloomFilter("gram", nGrams, fpp)
    val mightContain = udf((g: String) => g != null && bf.mightContain(g))
    Dedup.shingleFrame(train, trainId, trainText, n)
      .select(col(trainId), explode_outer(col("sh")).as("gram"))
      .groupBy(col(trainId))
      .agg((sum(when(col("gram").isNotNull && mightContain(col("gram")), 1L)
        .otherwise(0L)) > 0).as("bloom_hit"))
  }

  /** FUZZY decontamination: train docs that are near-duplicates of an
    * eval doc (word-`n`-gram Jaccard ≥ `minJaccard`), catching the
    * lightly-edited leaks exact-gram overlap misses. Per flagged train
    * doc: how many eval docs it nears and the maximum Jaccard.
    *
    * Candidates come from MinHash band buckets computed on BOTH sides
    * with identical seeds, joined on (band, bucket) — and because the
    * eval side is benchmark-sized, its buckets AND its shingle arrays
    * broadcast: the train corpus is scanned once, shuffles nothing,
    * and only bucket-colliding cross pairs pay the exact Jaccard.
    *
    * Banding is 16 bands × 2 rows (not the near-dup default 8 × 4):
    * decontamination is recall-critical — a missed leak poisons an
    * eval — and at the 0.8 threshold 16×2 misses a qualifying pair
    * with probability (1 − 0.8²)¹⁶ ≈ 7e-8, versus ~1.5% for 8×4. The
    * extra candidates this admits are cheap: they only pay a
    * broadcast-side Jaccard.
    */
  def fuzzyContaminationReport(train: DataFrame, trainId: String,
      trainText: String, eval: DataFrame, evalId: String, evalText: String,
      n: Int = 3, minJaccard: Double = 0.8,
      numHashes: Int = 32, bands: Int = 16): DataFrame = {
    val trainFeat = Dedup.bandedShingleFeatures(
      Dedup.spread(train).select(col(trainId).as("__tid"),
        col(trainText).as("__text")),
      "__tid", "__text", n, numHashes, bands, shCol = "__tsh")
    val evalFeat = Dedup.bandedShingleFeatures(
      eval.select(col(evalId).as("__eid"), col(evalText).as("__text")),
      "__eid", "__text", n, numHashes, bands, shCol = "__esh")
    val trainBuckets = Dedup.explodeBuckets(trainFeat,
      Seq(col("__tid"), col("__tsh")))
    val evalBuckets = Dedup.explodeBuckets(evalFeat,
      Seq(col("__eid"), col("__esh")))
    trainBuckets
      .join(broadcast(evalBuckets), Seq("band", "bucket"))
      // score BEFORE the pair-dedup so the distinct shuffles a (long,
      // long, double) row, not two shingle arrays; a pair colliding in
      // k ≤ bands buckets recomputes the Jaccard k times — bounded,
      // and far cheaper than shuffling array payloads
      .select(col("__tid"), col("__eid"),
        round(Dedup.jaccardFromShingles(col("__tsh"), col("__esh")), 6)
          .as("jacc"))
      .distinct()
      .filter(col("jacc") >= minJaccard)
      .groupBy(col("__tid"))
      .agg(count_distinct(col("__eid")).as("n_eval_near"),
        max(col("jacc")).as("max_jacc"))
      .withColumnRenamed("__tid", trainId)
  }
}
