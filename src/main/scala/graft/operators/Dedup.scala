package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Deduplication operators for LLM training-data pipelines (extended
  * surface, SURVEY.md §2.10): exact, keep-latest, MinHash+LSH near-dup,
  * SimHash, and n-gram Jaccard verification. Everything is built from
  * shuffle-aware primitives: exact dedup is one hash aggregation;
  * near-dup candidate generation shuffles once on (band, bucket); only
  * candidate PAIRS (a tiny set at realistic thresholds) are verified.
  *
  * Evaluation-cost note that shapes this API: Spark's higher-order
  * array functions (`transform`/`aggregate`/`filter`) are interpreted,
  * not codegen'd, and within ONE projection every reference re-walks
  * its subtree. So the expensive intermediates (shingle arrays, token
  * hash arrays, minhash signatures) are materialized as real columns in
  * separate selects — Catalyst's CollapseProject deliberately keeps
  * such multi-referenced non-cheap projections apart — and the
  * many-branch reductions (32 minhash slots, 64 simhash bits) reference
  * those bound columns instead of recomputing them. This turned an
  * O(hashes × tokens²) per-row blowup into O(hashes × tokens).
  */
object Dedup {

  /** Heavy persisted intermediates — the shared session registry
    * (graft.HeavyPersist): one live set per session, "latest pipeline
    * wins", frames stay lazy. See HeavyPersist's doc for the
    * lifecycle contract.
    */
  private def persistHeavy(df: DataFrame,
      freshScope: Boolean = true): DataFrame =
    graft.HeavyPersist(df, freshScope)

  /** Exact-dedup grouping for the dedup-first near-dup pipelines:
    * one persisted (id, gid, text) frame where gid = min member id per
    * `keyExpr` (a normalization of `text`). Members are all rows; the
    * representatives are the rows with id == gid. Shared by the
    * minhash, simhash, and (shape-wise) embedding pipelines so the
    * grouping/expansion invariants live in ONE place.
    */
  private[operators] def exactGroups(df: DataFrame, idCol: String,
      textCol: String, keyExpr: Column): DataFrame = persistHeavy(
    spread(df).select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("__key", keyExpr)
      .withColumn("gid", min(col("id")).over(Window.partitionBy("__key")))
      .select(col("id"), col("gid"), col("text")))

  /** All (id_a < id_b) member pairs within each group, tagged with gid
    * so callers can join per-group values (or filters) onto them.
    */
  private[operators] def intraPairs(members: DataFrame): DataFrame =
    members.as("m1").join(members.as("m2"),
        col("m1.gid") === col("m2.gid") && col("m1.id") < col("m2.id"))
      .select(col("m1.gid").as("gid"),
        col("m1.id").as("id_a"), col("m2.id").as("id_b"))

  /** Expand verified representative pairs (ga, gb, values...) over
    * both groups' members, restoring (id_a < id_b) ordering — member
    * ids interleave across groups, so least/greatest, not m1/m2 order.
    */
  private[operators] def expandCross(repPairs: DataFrame, members: DataFrame,
      valueCols: Seq[String]): DataFrame =
    repPairs
      .join(members.select(col("gid").as("ga"), col("id").as("ia")), "ga")
      .join(members.select(col("gid").as("gb"), col("id").as("ib")), "gb")
      .select(least(col("ia"), col("ib")).as("id_a") +:
        greatest(col("ia"), col("ib")).as("id_b") +: valueCols.map(col): _*)

  /** Spread a frame to full cluster parallelism BEFORE per-row
    * featurization (tokenize → 32 minhash slots → shingles), which is
    * the CPU-bound cost of every near-dup operator. A small corpus
    * (one parquet row group) otherwise runs that work on ONE core; a
    * 100 TB corpus already has more input splits than executors, so
    * the condition makes this a no-op exactly when a repartition would
    * be an expensive full-text shuffle.
    */
  private[operators] def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }

  /** Exact dedup: keep one deterministic representative (min of
    * `tiebreak`) per key group. `dropDuplicates` is avoided — its kept
    * row is partition-order-dependent, which breaks oracle parity and
    * reproducibility at scale.
    */
  def exact(df: DataFrame, keys: Seq[String], tiebreak: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(tiebreak)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Corpus-level span (paragraph) dedup, C4-style: documents are cut
    * into non-overlapping `chunkTokens`-token spans
    * (TextAnalysis.chunkByTokens with stride == chunk), every span that
    * already occurred earlier in the corpus — order = (doc id, span
    * position), so the survivor is deterministic and engine-portable —
    * is dropped, and each document is reassembled from its surviving
    * spans in position order. Documents whose every span was seen
    * before disappear entirely (they contain no novel text).
    *
    * This is the granularity between whole-document exact dedup (q29,
    * misses pages that share boilerplate paragraphs) and near-dup
    * (q32, quadratic-adjacent machinery for what is an exact match at
    * span level). Two shuffles, both keyed: (1) first-occurrence
    * election partitions on the span text — the same width exact
    * dedup pays, and the span bounds the sort-key length at
    * `chunkTokens` tokens; (2) reassembly partitions on the doc id
    * with a per-document bounded collect (spans of ONE document, never
    * a corpus-wide list).
    */
  def dedupSpansAcrossCorpus(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 32): DataFrame = {
    val chunks = graft.operators.TextAnalysis.chunkByTokens(
      df, idCol, textCol, chunkTokens, stride = chunkTokens)
    val w = Window.partitionBy("chunk_text")
      .orderBy(col(idCol), col("chunk_idx"))
    chunks
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("chunk_idx"),
              col("chunk_text")))),
            s => s.getField("chunk_text")), " ").as("text_dedup"))
  }

  /** Keep-latest dedup: one row per key, latest by `ord` (ties broken
    * by `tiebreak` for determinism) — the row_number window form.
    */
  def keepLatest(df: DataFrame, keys: Seq[String], ord: Column,
      tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord.desc, tiebreak.desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** One featurization pass shared by the verified near-dup and fuzzy
    * decontamination paths: (id, LSH band-hash array, shingle array)
    * from a single tokenize (tokens materialized once — see object
    * doc). Callers decide about `spread`/persist.
    */
  private[operators] def bandedShingleFeatures(df: DataFrame, idCol: String,
      textCol: String, n: Int, numHashes: Int, bands: Int,
      shCol: String = "sh"): DataFrame =
    df.select(col(idCol), TextAnalysis.wsTokens(col(textCol)).as("__w"))
      .select(col(idCol),
        graft.functions.MinHashExprs.minhashBandHashes(
          col("__w"), n, numHashes, bands).as("__bands"),
        TextAnalysis.shinglesFromTokens(col("__w"), n).as(shCol))

  /** Explode a band-hash array column into (band, bucket) rows, keeping
    * `keep`. The outer + null-drop form — the inner explode's inferred
    * `size(...) > 0` filter re-derives the array expression when it is
    * not a bound column (the q54 landmine; see minhashBuckets).
    */
  private[operators] def explodeBuckets(df: DataFrame,
      keep: Seq[Column]): DataFrame =
    df.select(keep :+
      posexplode_outer(col("__bands")).as(Seq("band", "bucket")): _*)
      .filter(col("bucket").isNotNull)

  /** id + minhash signature per document: `numHashes` permutations
    * approximated by seeded xxhash64 over the doc's distinct word-`n`-
    * gram shingles; slot i = min hash under seed i. The shingle array
    * is materialized first (see object doc) so each of the `numHashes`
    * reductions walks a bound array, not the shingle expression.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32): DataFrame =
    spread(df).select(col(idCol),
      graft.functions.MinHashExprs.minhashSignature(
        TextAnalysis.wsTokens(col(textCol)), n, numHashes).as("sig"))

  /** id + exploded (band, bucket) per document — one custom-expression
    * pass from tokens to band bucket keys (see MinHashExprs).
    */
  def minhashBuckets(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32, bands: Int = 8): DataFrame =
    // posexplode_outer + null-drop, not posexplode — the inner form's
    // inferred `size(__bands) > 0` filter (InferFiltersFromGenerate)
    // pushes below the projection and re-runs the whole minhash
    // featurization a second time per row
    spread(df).select(col(idCol),
        graft.functions.MinHashExprs.minhashBandHashes(
          TextAnalysis.wsTokens(col(textCol)), n, numHashes, bands)
          .as("__bands"))
      .select(col(idCol),
        posexplode_outer(col("__bands")).as(Seq("band", "bucket")))
      .filter(col("bucket").isNotNull)

  /** Near-dup candidate pairs by MinHash+LSH: shingle → signature →
    * band buckets → ONE shuffle on (band, bucket) → pair ids within
    * each bucket. Output: distinct (id_a < id_b).
    * At 100 TB: the explode multiplies rows by `bands` (narrow), the
    * single shuffle key is high-cardinality (no skew for
    * non-pathological corpora), and pairing happens per-bucket (bounded
    * groups), never corpus×corpus.
    */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32, bands: Int = 8,
      maxBucketSize: Int = 10000): DataFrame = {
    // Adversarial-skew guard: a degenerate corpus (thousands of
    // identical/boilerplate docs) funnels into one bucket and the
    // within-bucket pairing goes quadratic. Buckets above the cap are
    // excluded from pairing — their members are exact/near-identical
    // boilerplate that an exact-dedup pass (cheap, linear) should
    // collapse first. The size count rides the same (band, bucket)
    // shuffle the pairing join needs anyway.
    val sized = minhashBuckets(df, idCol, textCol, n, numHashes, bands)
      .withColumnRenamed(idCol, "id")
      .withColumn("__bsz", count(lit(1)).over(
        Window.partitionBy("band", "bucket")))
    val buckets = sized.filter(col("__bsz") <= maxBucketSize).drop("__bsz")
    val a = buckets.as("a")
    val b = buckets.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  private val mhIdxCache = new graft.SessionCache[String]

  /** One-time LSH bucket index of a corpus, written as a catalog table
    * bucketed AND co-located on (band, bucket) — the layout that makes
    * DELTA INGESTION cheap: deduping tonight's crawl against a 100 TB
    * corpus must not rescan (or reshuffle) the corpus, and against
    * this layout it doesn't — the probe join reads the index
    * shuffle-free (see [[nearDupCandidatesAgainstIndex]]). Each row
    * also carries its bucket's size (`bsz`), precomputed at index
    * time, so probes drop hot boilerplate buckets with a pushed-down
    * scalar filter instead of re-counting the corpus per query. Built
    * once per (session, spec) and memoized; the table persists in the
    * warehouse like the ANN indexes.
    */
  def minhashBucketIndex(df: DataFrame, idCol: String, textCol: String,
      spec: String, n: Int = 3, numHashes: Int = 32, bands: Int = 8,
      numBuckets: Int = 16): String = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$spec/$n/$numHashes/$bands/$numBuckets".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    val name = s"graft_mhidx_$hex"
    mhIdxCache.get(df.sparkSession, name) {
      val spark = df.sparkSession
      spark.sql(s"DROP TABLE IF EXISTS $name")
      // stale data cleanup via the Hadoop FileSystem resolved from the
      // warehouse path — a local java.io.File would silently skip (or
      // mis-resolve) an HDFS/S3 warehouse, exactly the deployment this
      // delta-ingestion index targets
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), name)
      val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(loc)) fs.delete(loc, true)
      val buckets = minhashBuckets(df, idCol, textCol, n, numHashes, bands)
        .withColumnRenamed(idCol, "id")
        .withColumn("bsz", count(lit(1)).over(
          Window.partitionBy("band", "bucket")))
      graft.sources.Layout.writeBucketed(buckets, name,
        Seq("band", "bucket"), numBuckets)
      name
    }
  }

  /** Near-dup candidate pairs of a NEW batch against an indexed corpus
    * (plus within-batch pairs) — the daily-ingest shape. Cost scales
    * with the DELTA's DISTINCT CONTENT: the batch is exact-deduped
    * first on token-normalized content (the q175 order — a twin-heavy
    * re-crawl otherwise featurizes and probes every twin and pairs
    * them quadratically inside the LSH buckets), one representative
    * per group is featurized and shuffled once on (band, bucket), and
    * the corpus index is read co-located (bucketed on the join key —
    * zero corpus-side exchange, PlanSpec-pinned) with its stored `bsz`
    * pruning hot buckets in the scan. Member pairs are reconstructed
    * afterwards: intra-group pairs are exact duplicates (Jaccard 1,
    * candidates by construction — emitted without any probe, so a
    * twin pile can no longer blow a delta bucket past its cap), cross
    * pairs expand each representative hit over the group's members.
    * Identical normalized content ⇒ identical band hashes, so
    * rep-level probing loses no recall, and rep-level bucket sizes
    * are ≤ raw-row sizes, so the cap drops strictly fewer buckets.
    * Output: distinct (id_a < id_b), each pair touching at least one
    * batch row; same-id rows (a re-ingested document) are not pairs.
    */
  def nearDupCandidatesAgainstIndex(newDf: DataFrame, idCol: String,
      textCol: String, indexTable: String, n: Int = 3, numHashes: Int = 32,
      bands: Int = 8, maxBucketSize: Int = 10000): DataFrame = {
    val spark = newDf.sparkSession
    val corpus = spark.table(indexTable).filter(col("bsz") <= maxBucketSize)
    // exact-dedup grouping opens a fresh HeavyPersist scope; callers
    // that persist this function's result should join it
    // (freshScope = false), not open another
    val grouped = exactGroups(newDf, idCol, textCol,
      concat_ws(" ", TextAnalysis.wsTokens(col("text"))))
    val members = grouped.select(col("id"), col("gid"))
    val deltaBuckets = minhashBuckets(
        grouped.filter(col("id") === col("gid")), "gid", "text",
        n, numHashes, bands)
      .withColumnRenamed("gid", "rid")
      .withColumn("__bsz", count(lit(1)).over(
        Window.partitionBy("band", "bucket")))
      .filter(col("__bsz") <= maxBucketSize).drop("__bsz")
    // representative × corpus hits, expanded over the rep's members;
    // the id_a =!= id_b filter drops a re-ingested same-id document
    // pairing with itself
    val crossRep = deltaBuckets.as("a").join(corpus.as("c"),
        col("a.band") === col("c.band") &&
        col("a.bucket") === col("c.bucket"))
      .select(col("a.rid").as("gid"), col("c.id").as("cid")).distinct()
    val cross = crossRep.join(members, "gid")
      .select(least(col("id"), col("cid")).as("id_a"),
        greatest(col("id"), col("cid")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    // within-batch: cross-group representative pairs expanded over
    // both groups' members, plus intra-group exact-twin pairs
    val repPairs = deltaBuckets.as("a").join(deltaBuckets.as("b"),
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.rid") < col("b.rid"))
      .select(col("a.rid").as("ga"), col("b.rid").as("gb")).distinct()
    val intraCross = expandCross(repPairs, members, Nil)
    val intraTwin = intraPairs(members).select(col("id_a"), col("id_b"))
    cross.unionAll(intraCross).unionAll(intraTwin).distinct()
  }

  /** Delta ingestion, VERIFIED, as one fused pipeline — candidates +
    * exact-Jaccard verification + member expansion without the
    * probe-then-re-featurize chain q104 originally ran (r10 verdict
    * task #2: the staged form carried ~7 s of fixed exchange overhead
    * at sf0.1). The folds:
    *
    *   - ONE featurization of the delta's content representatives
    *     produces BOTH the probe's band hashes and the verify pass's
    *     shingle sets ([[bandedShingleFeatures]], persisted) — the
    *     staged form re-tokenized and re-shingled every matched text
    *     a second time.
    *   - Verification happens at REPRESENTATIVE grain before any
    *     member expansion: delta-delta rep pairs join the persisted
    *     feature frame directly; cross pairs fetch ONLY the matched
    *     corpus ids (broadcast semi-join on the text source — the
    *     corpus is never rescanned wholesale), content-dedup them,
    *     and verify once per (delta rep, corpus content).
    *   - Member expansion runs AFTER the >= minJaccard filter, so
    *     only verified pairs expand, and each output pair arises
    *     exactly once (each id has one group; rep/content pairs are
    *     distinct) — no final distinct shuffle.
    *   - The within-batch rep self-join rides the (band, bucket)
    *     partitioning the bucket-size window just produced on the
    *     persisted bucket frame — no fresh exchange.
    *
    * Candidate semantics (bucket join, hot-bucket caps on both sides)
    * are IDENTICAL to [[nearDupCandidatesAgainstIndex]]; output adds
    * the verified `jacc` per pair. `textSource` must cover every id
    * in the index (it is the corpus the index was built from).
    * Intra-group twin pairs carry jacc 1 (exact duplicates), except
    * degenerate sub-n-token content (empty shingles ⇒ Jaccard 0 by
    * convention ⇒ dropped), matching the all-pairs oracle.
    *
    * CRASH IDEMPOTENCE: a PURE frame transform — no persisted
    * state is mutated; re-running a died job recomputes the same
    * frame (run-twice ≡ run-once), and whatever sink publishes the
    * result owns its own atomicity (the engine's convention:
    * versioned snapshot dirs or batch-identity partitions).
    */
  def deltaDedupVerified(newDf: DataFrame, idCol: String, textCol: String,
      indexTable: String, textSource: DataFrame, n: Int = 3,
      numHashes: Int = 32, bands: Int = 8, maxBucketSize: Int = 10000,
      minJaccard: Double = 0.8): DataFrame = {
    val spark = newDf.sparkSession
    val corpus = spark.table(indexTable).filter(col("bsz") <= maxBucketSize)
    val grouped = exactGroups(newDf, idCol, textCol,
      concat_ws(" ", TextAnalysis.wsTokens(col("text"))))
    val members = grouped.select(col("id"), col("gid"))
    val feat = persistHeavy(
      bandedShingleFeatures(grouped.filter(col("id") === col("gid")),
        "gid", "text", n, numHashes, bands), freshScope = false)
    // bucket rows WITHOUT the shingle arrays — they must not ride the
    // (band, bucket) shuffle twice over
    val deltaBuckets = persistHeavy(
      explodeBuckets(feat, Seq(col("gid").as("rid")))
        .withColumn("__bsz", count(lit(1)).over(
          Window.partitionBy("band", "bucket")))
        .filter(col("__bsz") <= maxBucketSize)
        .select(col("rid"), col("band"), col("bucket")),
      freshScope = false)
    // probe: co-located corpus read (index bucketed on the join key)
    val crossRep = persistHeavy(
      deltaBuckets.as("a").join(corpus.as("c"),
          col("a.band") === col("c.band") &&
          col("a.bucket") === col("c.bucket"))
        .select(col("a.rid").as("gid"), col("c.id").as("cid")).distinct(),
      freshScope = false)
    // fetch + featurize ONLY matched corpus documents, content-deduped
    val cids = crossRep.select(col("cid").as("__cid")).distinct()
    val corpusKeyed = persistHeavy(
      textSource
        .join(broadcast(cids), col(idCol) === col("__cid"), "left_semi")
        .select(col(idCol).as("cid"),
          TextAnalysis.wsTokens(col(textCol)).as("__w"))
        .select(col("cid"), md5(concat_ws(" ", col("__w"))).as("ck"),
          TextAnalysis.shinglesFromTokens(col("__w"), n).as("csh")),
      freshScope = false)
    val corpusRepSh = corpusKeyed.groupBy("ck")
      .agg(min_by(col("csh"), col("cid")).as("csh"))
    val crossKey = crossRep
      .join(corpusKeyed.select(col("cid"), col("ck")), "cid")
    val crossVerified = crossKey.select(col("gid"), col("ck")).distinct()
      .join(feat.select(col("gid"), col("sh")), "gid")
      .join(corpusRepSh, "ck")
      .select(col("gid"), col("ck"),
        round(jaccardFromShingles(col("sh"), col("csh")), 6).as("jacc"))
      .filter(col("jacc") >= minJaccard)
    val cross = crossKey.join(crossVerified, Seq("gid", "ck"))
      .join(members, "gid")
      .select(least(col("id"), col("cid")).as("id_a"),
        greatest(col("id"), col("cid")).as("id_b"), col("jacc"))
      .filter(col("id_a") =!= col("id_b"))
    val repPairs = deltaBuckets.as("a").join(deltaBuckets.as("b"),
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.rid") < col("b.rid"))
      .select(col("a.rid").as("ga"), col("b.rid").as("gb")).distinct()
    val withinVerified = repPairs
      .join(feat.select(col("gid").as("ga"), col("sh").as("sh_a")), "ga")
      .join(feat.select(col("gid").as("gb"), col("sh").as("sh_b")), "gb")
      .select(col("ga"), col("gb"),
        round(jaccardFromShingles(col("sh_a"), col("sh_b")), 6).as("jacc"))
      .filter(col("jacc") >= minJaccard)
    val withinCross = expandCross(withinVerified, members, Seq("jacc"))
    val intra = intraPairs(members)
      .join(feat.filter(size(col("sh")) > 0).select(col("gid")), "gid")
      .select(col("id_a"), col("id_b"), lit(1.0).as("jacc"))
    cross.unionAll(withinCross).unionAll(intra)
  }

  /** The full verified near-dup pipeline, exact-dedup FIRST (the
    * canonical order): documents are grouped by their token-normalized
    * content, near-dup discovery (minhash → LSH buckets → Jaccard
    * verify) runs on ONE representative per distinct content, and the
    * full pair list is reconstructed afterwards — intra-group pairs
    * are exact duplicates (Jaccard 1 by construction, no computation),
    * cross-group pairs expand each verified representative pair over
    * both groups' members. On a twin-dense corpus (re-crawls, mirrors,
    * boilerplate) this cuts featurization and verification from
    * O(docs) / O(member pairs) to O(distinct contents) /
    * O(rep pairs), and duplicate piles can no longer blow an LSH
    * bucket past its cap (a 10k-twin pile is one rep, not one bucket).
    *
    * Featurization of the reps is one scan (tokens → band hashes +
    * shingles, see object doc); both heavy frames ride
    * [[persistHeavy]] — lazy, released when the next near-dup call
    * starts.
    */
  def nearDupPairsVerified(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32, bands: Int = 8,
      maxBucketSize: Int = 10000, minJaccard: Double = 0.8): DataFrame = {
    // 1) exact-dedup on token-normalized content; gid = min member id
    val grouped = exactGroups(df, idCol, textCol,
      concat_ws(" ", TextAnalysis.wsTokens(col("text"))))
    val members = grouped.select(col("id"), col("gid"))
    // 2) featurize representatives only
    val feat = persistHeavy(
      bandedShingleFeatures(grouped.filter(col("id") === col("gid")),
        "gid", "text", n, numHashes, bands),
      freshScope = false)
    // 3) LSH candidates over representatives (capped buckets)
    val sized = explodeBuckets(feat, Seq(col("gid")))
      .withColumn("__bsz", count(lit(1)).over(
        Window.partitionBy("band", "bucket")))
    val buckets = sized.filter(col("__bsz") <= maxBucketSize).drop("__bsz")
    val repPairs = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.gid") < col("b.gid"))
      .select(col("a.gid").as("ga"), col("b.gid").as("gb"))
      .distinct()
    // 4) exact Jaccard verify, once per representative pair
    val verified = repPairs
      .join(feat.select(col("gid").as("ga"), col("sh").as("sh_a")), "ga")
      .join(feat.select(col("gid").as("gb"), col("sh").as("sh_b")), "gb")
      .select(col("ga"), col("gb"),
        round(jaccardFromShingles(col("sh_a"), col("sh_b")), 6).as("jacc"))
      .filter(col("jacc") >= minJaccard)
    // 5) expand back to member pairs.
    //    intra-group: every member pair of a multi-doc group is an
    //    exact dup — Jaccard 1.0, except degenerate sub-n-token docs
    //    (empty shingle set ⇒ Jaccard 0 by convention ⇒ not a pair)
    val intra = intraPairs(members)
      .join(feat.filter(size(col("sh")) > 0).select(col("gid")), "gid")
      .select(col("id_a"), col("id_b"), lit(1.0).as("jacc"))
    intra.unionAll(expandCross(verified, members, Seq("jacc")))
  }

  /** Connected components over an undirected pair graph — the FINAL
    * step of near-dup dedup: candidate pairs (minhash/simhash/embedding
    * neighbors) say "these two are the same"; the component label says
    * which CLUSTER each document belongs to, and min-id election picks
    * the one representative to keep. Returns (id, comp) for every node,
    * comp = the smallest id reachable from it (isolated nodes label
    * themselves).
    *
    * Iterative min-label propagation: each round, every node lowers its
    * label to the minimum of its neighbors' labels (one equi-join + one
    * partial-aggregated shuffle on node id), converging in
    * graph-diameter rounds — near-dup clusters are shallow (mirrors,
    * re-crawls, boilerplate families), so the bound is small in
    * practice; published alternating large-star/small-star contracts
    * the same computation in O(log n) rounds if ever needed. Per round
    * the label frame is localCheckpoint'ed: without truncation the
    * lineage doubles per iteration and Catalyst planning, not the data,
    * becomes the bottleneck. Convergence is detected by the strictly
    * decreasing label sum (exact decimal — no overflow at 64-bit ids),
    * costing one scan of the already-materialized labels instead of a
    * change-count join.
    *
    * Edge ids must be drawn from `nodes` (near-dup pairs over the same
    * corpus satisfy this by construction). Throws if `maxIter` rounds
    * don't converge — a silently partial labeling is a wrong answer,
    * not an approximation.
    */
  def connectedComponents(nodes: DataFrame, idCol: String,
      edges: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
      maxIter: Int = 25, maxDriverEdges: Int = 5000000): DataFrame = {
    // SIZE-GATED DRIVER FAST PATH (the componentMergeMap precedent —
    // whose measured rationale transfers verbatim: each iterative
    // round is a join + checkpoint + action whose ~0.5 s job overhead
    // is independent of data size, so below the cap the rounds are
    // pure fixed cost). The distinct undirected edge set is bounded
    // metadata when it fits `maxDriverEdges` (the componentMergeMap
    // cap): union-find with the smaller id as root reproduces the
    // min-label fixpoint exactly (a set's root IS its min id), the
    // non-identity (id → min) map broadcasts back, and every node
    // takes coalesce(map(id), id) — one edge pass + one node pass,
    // ZERO iterative rounds. Above the cap, or unless node AND edge
    // columns share one integral type (a mixed- or non-integral-typed
    // graph would truncation-cast or wrap on the way into/out of the
    // long-keyed union-find — fall back rather than fabricate edges),
    // the iterative min-label loop below is unchanged — a 100 TB
    // near-dup graph's edges are NOT bounded driver metadata.
    val idType = nodes.schema(idCol).dataType
    if ((idType == org.apache.spark.sql.types.LongType ||
        idType == org.apache.spark.sql.types.IntegerType) &&
        edges.schema(aCol).dataType == idType &&
        edges.schema(bCol).dataType == idType) {
      val spark0 = nodes.sparkSession
      import spark0.implicits._
      // the bounded probe IS the fast-path input: collect caps at
      // maxDriverEdges + 1 rows, so an over-cap graph costs one
      // truncated edge pass before falling through (and the fall-back
      // path re-reads `edges`, exactly as it always did)
      val pairs: Array[(Long, Long)] = edges
        .select(least(col(aCol), col(bCol)).cast("long").as("u"),
          greatest(col(aCol), col(bCol)).cast("long").as("v"))
        .filter(col("u").isNotNull && col("v").isNotNull &&
          col("u") =!= col("v"))
        .distinct()
        .as[(Long, Long)]
        .limit(maxDriverEdges + 1).collect()
      if (pairs.length <= maxDriverEdges) {
        val mapDf = unionFindMinMap(pairs).toDF("__cid", "__cc")
          .select(col("__cid").cast(idType).as("__cid"),
            col("__cc").cast(idType).as("__cc"))
        // distinct: the iterative path's fused round ends in a
        // groupBy(id), so duplicate node rows collapse there — the
        // remap must match row-for-row
        return nodes.select(col(idCol).as("id")).distinct()
          .join(broadcast(mapDf), col("id") === col("__cid"), "left")
          .select(col("id"), coalesce(col("__cc"), col("id")).as("comp"))
      }
    }
    // hash-partitioned on the join key ONCE before persisting: every
    // round's join then reads co-located edge partitions instead of
    // re-shuffling the (much larger) edge side per iteration
    val sym = edges.select(col(aCol).as("dst"), col(bCol).as("src"))
      .unionAll(edges.select(col(bCol).as("dst"), col(aCol).as("src")))
      .repartition(col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // lazy checkpoint + signature in ONE action per round: the sum
      // scan is what materializes (and truncates) the round's labels.
      // sum over zero rows is SQL NULL — an empty node set must return
      // an empty labeling, not NPE on the signature compare.
      def sig(df: DataFrame): java.math.BigDecimal =
        Option(df.agg(sum(col("comp").cast("decimal(38,0)"))).head()
          .getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO)
      var labels = nodes.select(col(idCol).as("id"), col(idCol).as("comp"))
        .localCheckpoint(false)
      var prev = sig(labels)
      var i = 0
      while (i < maxIter) {
        // one FUSED round: min(own label, neighbors' labels) as a
        // union + single partial-aggregated groupBy — algebraically
        // identical to the join-then-groupBy-then-left-join form it
        // replaces, one exchange and one join operator cheaper per
        // round (the label frame used to be shuffled twice per round:
        // once to the edge key and once back to id for the left join;
        // now the own-label row rides the same aggregation as the
        // neighbor candidates). Nodes without neighbors keep their
        // label through the union side.
        val next = labels
          .unionAll(sym
            .join(labels.select(col("id").as("dst"), col("comp").as("nc")),
              "dst")
            .select(col("src").as("id"), col("nc").as("comp")))
          .groupBy("id").agg(min(col("comp")).as("comp"))
          .localCheckpoint(false)
        val cur = sig(next)
        // the superseded round's checkpoint blocks are dead once `next`
        // is materialized — without the release a long run retains
        // every round's label copy until the ContextCleaner gets there
        // (Dataset.unpersist is a no-op on checkpoint storage)
        org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(labels)
        labels = next
        if (cur.compareTo(prev) == 0) return labels
        prev = cur
        i += 1
      }
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "component diameter exceeds the bound; raise maxIter")
    } finally sym.unpersist(blocking = false)
  }

  /** INCREMENTAL component maintenance — refresh persisted min-id
    * component labels under a delta batch (new nodes + newly
    * discovered edges) without re-running [[connectedComponents]] on
    * the full graph. The maintenance algebra: base labels already
    * collapse every base edge, so components of base ∪ delta = base
    * components MERGED along the delta edges. The merge graph has one
    * node per TOUCHED component and one edge per delta edge — bounded
    * by |delta|, never by the corpus — and min-label components over
    * it reproduce full-recompute labels exactly (min of merged min-ids
    * IS the global min id).
    *
    * Cost shape, HONESTLY stated (r12/r13 100× measurements): the
    * MERGE is bounded by |delta| — two key-lookup joins of the delta
    * edges against the label table plus a driver union-find over the
    * comp-grain merge graph (see [[componentMergeMap]]; the earlier
    * distributed component pass was measured job-overhead-bound, 9.07
    * s vs the 9.17 s recompute it was meant to undercut) — but the
    * EMIT of this full-table form is still Ω(base): a shuffle-free
    * broadcast-remap scan over every persisted label (3.8 s at 100×
    * after the union-find fix, vs 7.7 s recompute). Use this form
    * when the consumer wants the whole refreshed table in one frame;
    * for the registry-maintenance path — overwrite only what changed
    * — use [[deltaMergeComponentsUpsert]], whose emit is bounded by
    * the touched components + delta nodes (measured 2.9 s at 100×,
    * under half the recompute).
    *
    * `deltaNodes` ids must be new (disjoint from base); delta edge
    * endpoints must exist in base ∪ deltaNodes (unknown endpoints are
    * dropped by the lookup join rather than invented).
    *
    * CONTRACT NARROWING (r13, breaking): component labels must be an
    * integral type (Long/Int) — the merge pass became a driver
    * union-find over primitive comp ids after the distributed CC pass
    * measured job-overhead-bound, and it hard-errors on other label
    * types at runtime. The registry convention has always been
    * labels-are-min-ids (integral), so no declared caller is affected;
    * a non-integral-label caller must run [[connectedComponents]] on
    * the merged graph instead.
    *
    * CRASH IDEMPOTENCE: a PURE frame transform — no persisted
    * state is mutated; re-running a died job recomputes the same
    * frame (run-twice ≡ run-once), and whatever sink publishes the
    * result owns its own atomicity (the engine's convention:
    * versioned snapshot dirs or batch-identity partitions).
    */
  def deltaMergeComponents(baseLabels: DataFrame, deltaNodes: DataFrame,
      deltaEdges: DataFrame, aCol: String = "a", bCol: String = "b")
      : DataFrame = {
    val (labels0, mergeMap) =
      componentMergeMap(baseLabels, deltaNodes, deltaEdges, aCol, bCol)
    labels0
      .join(broadcast(mergeMap), labels0("comp") === col("__oldc"),
        "left")
      .select(col("id"), coalesce(col("__newc"), col("comp")).as("comp"))
  }

  /** The shared delta-merge head: (base ∪ delta-node labels, the
    * non-identity old-component → new-component merge map). The merge
    * map is bounded by |delta| (≤ one node per touched component).
    *
    * The component pass over the COMP-GRAIN merge graph runs as a
    * driver union-find, not the distributed [[connectedComponents]]:
    * the merge graph is bounded metadata (≤ one distinct comp pair
    * per delta edge — the centroid/codebook class of driver state,
    * capped by `maxMergePairs` with a hard error past it), and the
    * iterative CC's per-round job overhead (join + checkpoint +
    * action, ~0.5 s/round regardless of data size) was measured to
    * DOMINATE the refresh at 100× — 9.5 s vs the 7.7 s full
    * recompute it was supposed to undercut. Min-label semantics are
    * preserved exactly: union always roots the SMALLER comp id, so a
    * set's final root IS its min — the same label full recompute
    * assigns. A delta batch too large for the cap is past the point
    * where incremental maintenance beats [[connectedComponents]]
    * anyway; the error says so.
    */
  private def componentMergeMap(baseLabels: DataFrame,
      deltaNodes: DataFrame, deltaEdges: DataFrame, aCol: String,
      bCol: String, maxMergePairs: Int = 5000000)
      : (DataFrame, DataFrame) = {
    val labels0 = baseLabels.select(col("id"), col("comp"))
      .unionAll(deltaNodes.select(col("id"), col("id").as("comp")))
    val edgeComps = deltaEdges
      .join(labels0.select(col("id").as(aCol), col("comp").as("__ca")),
        aCol)
      .join(labels0.select(col("id").as(bCol), col("comp").as("__cb")),
        bCol)
      .select(col("__ca"), col("__cb"))
      .filter(col("__ca") =!= col("__cb"))
      .distinct()
    // driver union-find reads comps as longs; integral label types
    // only (the component-registry convention — labels ARE min ids)
    val compType = labels0.schema("comp").dataType
    require(compType == org.apache.spark.sql.types.LongType ||
        compType == org.apache.spark.sql.types.IntegerType,
      s"component labels must be integral for delta merge, got $compType")
    // collected as SPECIALIZED (Long, Long) tuples, not GenericRows:
    // at the 5M-pair cap, boxed Rows cost hundreds of MB of driver
    // heap before the size check below can even fire (r13 advice)
    val spark0 = baseLabels.sparkSession
    import spark0.implicits._
    val pairs: Array[(Long, Long)] = edgeComps
      .select(col("__ca").cast("long"), col("__cb").cast("long"))
      .as[(Long, Long)]
      .limit(maxMergePairs + 1).collect()
    require(pairs.length <= maxMergePairs,
      s"delta merge graph exceeds $maxMergePairs distinct component " +
        "pairs — at that delta size a full connectedComponents " +
        "recompute is the cheaper refresh; run it instead or raise " +
        "maxMergePairs")
    val remapped = unionFindMinMap(pairs)
    // merge map re-cast to the original label type so the remap join
    // and the emitted comp column keep the input schema exactly
    (labels0, remapped.toDF("__oldc", "__newc")
      .select(col("__oldc").cast(compType), col("__newc").cast(compType)))
  }

  /** Driver union-find over (a, b) id pairs, smaller id always the
    * root — so a set's root IS its min id, the exact label min-label
    * propagation converges to. Returns the NON-IDENTITY (id → root)
    * entries; ids never seen in a pair (and roots) map to themselves
    * by omission. Shared by [[componentMergeMap]] (comp-grain merge
    * graphs) and the [[connectedComponents]] driver fast path
    * (node-grain edge sets).
    */
  private def unionFindMinMap(pairs: Array[(Long, Long)])
      : Seq[(Long, Long)] = {
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.getOrDefault(c, c) != r) {
        val n = parent.get(c); parent.put(c, r); c = n
      }
      r
    }
    pairs.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent.put(rb, ra)
      else if (rb < ra) parent.put(ra, rb)
    }
    import scala.jdk.CollectionConverters._
    parent.keySet().asScala.toSeq
      .map(c => (c, find(c))).filter { case (c, r) => c != r }
  }

  /** Incremental component maintenance, UPSERT-EMIT form — the answer
    * to [[deltaMergeComponents]]'s Ω(base) emit: return only the
    * registry rows the delta batch CHANGES, i.e. the upsert set a
    * maintenance job overwrites into the persisted label table:
    *
    *   - every delta node (new row — labeled with its merged
    *     component, or its own id when untouched), and
    *   - every base row whose component label the merge map rewrites
    *     (old label ∈ the non-identity merge map).
    *
    * Untouched base rows — the overwhelming majority at scale — are
    * never emitted: their stored label is already correct, so
    * refreshed registry = base OVERWRITTEN BY this frame (exactly the
    * upsert/MERGE INTO a real deployment runs; with the registry
    * partitioned or bucketed on the label key, the overwrite touches
    * only the affected buckets). The base side still takes one NARROW
    * scan (broadcast semi-join against the bounded merge map — no
    * shuffle, no sort, near-zero emit), so end-to-end cost is
    * scan-bandwidth-bounded rather than emit-bounded: measured 2.9 s
    * at the 100× rehearsal vs 7.7 s for the q67 full recompute —
    * under half, closing the r12 verdict's q218 economics gap.
    *
    * Same preconditions as [[deltaMergeComponents]]; the two forms
    * agree exactly: full-form output ≡ base rows not in this frame ∪
    * this frame (spec-pinned).
    */
  def deltaMergeComponentsUpsert(baseLabels: DataFrame,
      deltaNodes: DataFrame, deltaEdges: DataFrame, aCol: String = "a",
      bCol: String = "b"): DataFrame = {
    val (_, mergeMap) =
      componentMergeMap(baseLabels, deltaNodes, deltaEdges, aCol, bCol)
    val changedBase = baseLabels.select(col("id"), col("comp"))
      .join(broadcast(mergeMap), col("comp") === col("__oldc"))
      .select(col("id"), col("__newc").as("comp"))
    val newNodes = deltaNodes.select(col("id"), col("id").as("comp"))
      .join(broadcast(mergeMap), col("comp") === col("__oldc"), "left")
      .select(col("id"), coalesce(col("__newc"), col("comp")).as("comp"))
    changedBase.unionAll(newNodes)
  }

  /** k-core decomposition for one fixed `k` (iterated peeling,
    * Matula–Beck / Batagelj–Zaveršnik semantics): the maximal subgraph
    * in which every node keeps degree ≥ k after all lower-degree
    * nodes are recursively removed. The graph-robustness census the
    * component/PageRank/triangle family lacks: a near-dup or
    * co-occurrence cluster's k-core is its load-bearing kernel —
    * peripheral one-link members peel away, so the core is what
    * survives of a mirror family or an item community when weak ties
    * are discounted.
    *
    * Shape per round: degree-within-alive = the symmetric membership
    * frame semi-joined against the alive set on BOTH endpoints, then
    * one partial-aggregated count on the node key; survivors filter ≥
    * k. The membership frame is hash-partitioned on its node key ONCE
    * and persisted (the [[connectedComponents]] convention) so every
    * round's first join reads co-located partitions; the alive set
    * only shrinks, so per-round cost is monotone non-increasing.
    * Rounds are localCheckpoint'ed (lineage doubles per iteration
    * otherwise) and the fixpoint test rides the same count() action
    * that materializes the round. Real degeneracy ladders are shallow
    * (tens of rounds — each round removes every currently-under-k
    * node at once); throws past `maxRounds` because a partial peel is
    * a wrong answer, not an approximation.
    *
    * Output: (`node`, `core_degree`) — degree WITHIN the final core,
    * the per-node coreness evidence (≥ k by construction).
    */
  def kCore(edges: DataFrame, aCol: String, bCol: String, k: Int,
      maxRounds: Int = 64, maxDriverEdges: Int = 5000000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // SIZE-GATED DRIVER FAST PATH (the connectedComponents /
    // componentMergeMap precedent — every distributed peel round is a
    // two-join + aggregate + checkpoint + count whose job overhead is
    // data-size-independent): a sub-cap edge list peels on the driver
    // in microseconds, with EDGE MULTIPLICITY kept (the distributed
    // degree counts duplicate edges and both rows of a self-loop, so
    // the collect must too). Null-endpoint rows never survive the
    // distributed alive-joins, so dropping them is faithful. Above the
    // cap or for non-integral endpoint types: the iterative peel,
    // unchanged.
    val aT = edges.schema(aCol).dataType
    val bT = edges.schema(bCol).dataType
    val integral = Seq(aT, bT).forall(t =>
      t == org.apache.spark.sql.types.LongType ||
      t == org.apache.spark.sql.types.IntegerType)
    if (integral) {
      val spark0 = edges.sparkSession
      import spark0.implicits._
      val vType = if (aT == bT) aT else org.apache.spark.sql.types.LongType
      val pairs: Array[(Long, Long)] = edges
        .filter(col(aCol).isNotNull && col(bCol).isNotNull)
        .select(col(aCol).cast("long"), col(bCol).cast("long"))
        .as[(Long, Long)]
        .limit(maxDriverEdges + 1).collect()
      if (pairs.length <= maxDriverEdges) {
        // Matula–Beck QUEUE peel, O(V + E) total: degrees decrement
        // incrementally as nodes die instead of rescanning the edge
        // list per round (a 2M-edge chain at k = 2 peels two endpoints
        // per round — a round-rescan form is O(rounds × E) and would
        // stall the driver for hours where the distributed path failed
        // fast at maxRounds). Removal order cannot change the k-core
        // (the unique maximal subgraph of min degree ≥ k), so the
        // queue peel and the distributed simultaneous peel agree
        // exactly, including on the final within-core degrees.
        // Adjacency lists keep edge MULTIPLICITY (and both rows of a
        // self-loop), matching the distributed degree count.
        val deg = new java.util.HashMap[Long, Long]()
        val adj = new java.util.HashMap[Long, ArrayBuffer[Long]]()
        def add(x: Long, y: Long): Unit = {
          deg.merge(x, 1L, _ + _)
          adj.computeIfAbsent(x, _ => ArrayBuffer.empty[Long]) += y
          ()
        }
        pairs.foreach { case (a, b) => add(a, b); add(b, a) }
        val dead = new java.util.HashSet[Long]()
        val queue = new java.util.ArrayDeque[java.lang.Long]()
        deg.forEach { (v, d) => if (d < k) queue.add(v): Unit }
        while (!queue.isEmpty) {
          val v = queue.poll().longValue()
          if (!dead.contains(v)) {
            dead.add(v)
            val nbrs = adj.get(v)
            if (nbrs != null) nbrs.foreach { w =>
              if (!dead.contains(w)) {
                val nd = deg.merge(w, -1L, _ + _)
                // enqueue only on the ≥k → <k crossing
                if (nd < k && nd + 1 >= k) queue.add(w): Unit
              }
            }
          }
        }
        import scala.jdk.CollectionConverters._
        return deg.entrySet().asScala.toSeq
          .collect { case e if !dead.contains(e.getKey.longValue()) =>
            (e.getKey.longValue(), e.getValue.longValue()) }
          .toDF("node", "core_degree")
          .select(col("node").cast(vType).as("node"), col("core_degree"))
      }
    }
    val m = edges.select(col(aCol).as("v"), col(bCol).as("w"))
      .unionAll(edges.select(col(bCol).as("v"), col(aCol).as("w")))
      .repartition(col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def degrees(alive: DataFrame): DataFrame =
        m.join(alive, "v")
          .join(alive.withColumnRenamed("v", "w"), "w")
          .groupBy("v").agg(count(lit(1)).as("d"))
      var alive = m.select(col("v")).distinct().localCheckpoint(false)
      var n = alive.count()
      var rounds = 0
      while (rounds < maxRounds) {
        val next = degrees(alive).filter(col("d") >= k).select(col("v"))
          .localCheckpoint(false)
        val nn = next.count()
        org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(alive)
        alive = next
        if (nn == n) {
          return degrees(alive)
            .select(col("v").as("node"), col("d").as("core_degree"))
        }
        n = nn
        rounds += 1
      }
      throw new IllegalStateException(
        s"kCore did not converge in $maxRounds rounds — degeneracy " +
          "ladder exceeds the bound; raise maxRounds")
    } finally m.unpersist(blocking = false)
  }

  /** Multi-source BFS hop distance: for every node reachable from the
    * seed set, the minimum number of edges to ANY seed — the graph
    * traversal member of the family (components/PageRank/core answer
    * connectivity, centrality, robustness; this answers PROXIMITY:
    * crawl depth from trusted roots, blast radius of a contaminated
    * cluster, curriculum rings around curated seed docs).
    *
    * Frontier-parallel: round r joins the CURRENT FRONTIER (not the
    * discovered set) against the once-partitioned symmetric edge
    * frame, anti-joins what's already discovered, and labels the
    * remainder hop r — per-round cost ∝ the frontier's edge
    * neighborhood, the textbook distributed BFS. Frontier and
    * discovered frames are localCheckpoint'ed per round (the
    * [[connectedComponents]] lineage convention) and the round's
    * count() action doubles as the empty-frontier convergence test.
    * Terminates in eccentricity rounds — bounded by graph diameter —
    * and throws past `maxRounds` (a partial BFS is a wrong answer).
    * Unreachable nodes are absent from the output by design.
    *
    * Output: (`node`, `hops`), seeds at 0.
    */
  def bfsHops(edges: DataFrame, aCol: String, bCol: String,
      seeds: DataFrame, maxRounds: Int = 64,
      maxDriverEdges: Int = 5000000): DataFrame = {
    // SIZE-GATED DRIVER FAST PATH (the connectedComponents precedent):
    // hop labels are a pure function of the edge set and seed set, so
    // a sub-cap graph runs the textbook queue BFS on the driver
    // instead of eccentricity-many join + anti-join + checkpoint
    // rounds. Conservative null handling: a null endpoint or seed
    // falls back to the iterative path outright (distributed null
    // semantics — a null `w` can enter the discovered set through the
    // anti-join — are not worth replicating on the driver).
    val aT = edges.schema(aCol).dataType
    val bT = edges.schema(bCol).dataType
    val sCol = seeds.columns.head
    val sT = seeds.schema(sCol).dataType
    val integral = Seq(aT, bT, sT).forall(t =>
      t == org.apache.spark.sql.types.LongType ||
      t == org.apache.spark.sql.types.IntegerType)
    if (integral) {
      val vType =
        if (aT == bT && bT == sT) aT
        else org.apache.spark.sql.types.LongType
      val spark0 = edges.sparkSession
      import spark0.implicits._
      // null probe FIRST (one cheap agg per frame — no shuffle): a
      // null endpoint or seed falls back to the iterative path, and
      // the edge set then collects as SPECIALIZED (Long, Long) tuples
      // (the componentMergeMap convention — boxed GenericRows cost
      // hundreds of MB of driver heap at the 5M cap)
      def hasNull(df: DataFrame, cond: Column): Boolean =
        Option(df.agg(sum(when(cond, 1L)).as("n")).head()
          .getAs[java.lang.Long](0)).exists(_ > 0L)
      if (!hasNull(edges, col(aCol).isNull || col(bCol).isNull) &&
          !hasNull(seeds, col(sCol).isNull)) {
        val ePairs: Array[(Long, Long)] = edges
          .select(col(aCol).cast("long"), col(bCol).cast("long"))
          .distinct().as[(Long, Long)]
          .limit(maxDriverEdges + 1).collect()
        val sArr: Array[Long] = seeds.select(col(sCol).cast("long"))
          .distinct().as[Long].limit(maxDriverEdges + 1).collect()
        if (ePairs.length <= maxDriverEdges &&
            sArr.length <= maxDriverEdges) {
        val adj = new java.util.HashMap[Long, ArrayBuffer[Long]]()
        def add(x: Long, y: Long): Unit =
          adj.computeIfAbsent(x, _ => ArrayBuffer.empty[Long]) += y
        ePairs.foreach { case (a, b) => add(a, b); add(b, a) }
        val hops = new java.util.HashMap[Long, Int]()
        var frontier = ArrayBuffer.empty[Long]
        sArr.foreach { s =>
          if (!hops.containsKey(s)) { hops.put(s, 0); frontier += s }
        }
        var h = 0
        while (frontier.nonEmpty) {
          h += 1
          val next = ArrayBuffer.empty[Long]
          frontier.foreach { v =>
            val nbrs = adj.get(v)
            if (nbrs != null) nbrs.foreach { w =>
              if (!hops.containsKey(w)) { hops.put(w, h); next += w }
            }
          }
          frontier = next
        }
        import scala.jdk.CollectionConverters._
        return hops.entrySet().asScala.toSeq
          .map(e => (e.getKey.longValue(), e.getValue.intValue()))
          .toDF("node", "hops")
          .select(col("node").cast(vType).as("node"), col("hops"))
        }
      }
    }
    val m = edges.select(col(aCol).as("v"), col(bCol).as("w"))
      .unionAll(edges.select(col(bCol).as("v"), col(aCol).as("w")))
      .repartition(col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var discovered = seeds.select(col(seeds.columns.head).as("v"))
        .distinct().select(col("v"), lit(0).as("hops"))
        .localCheckpoint(false)
      var frontier = discovered.select(col("v")).localCheckpoint(false)
      var r = 0
      while (r < maxRounds) {
        val next = m.join(frontier, "v").select(col("w").as("v")).distinct()
          .join(discovered.select(col("v")), Seq("v"), "left_anti")
          .localCheckpoint(false)
        val grew = next.count() > 0
        org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(frontier)
        if (!grew) {
          return discovered.select(col("v").as("node"), col("hops"))
        }
        val merged = discovered
          .unionAll(next.select(col("v"), lit(r + 1).as("hops")))
          .localCheckpoint(false)
        // materialize BEFORE releasing the parent: localCheckpoint is
        // lazy, and merged still reads discovered's blocks until then
        merged.count()
        org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(discovered)
        discovered = merged
        frontier = next
        r += 1
      }
      throw new IllegalStateException(
        s"bfsHops did not converge in $maxRounds rounds — eccentricity " +
          "exceeds the bound; raise maxRounds")
    } finally m.unpersist(blocking = false)
  }

  /** Fixed-iteration PageRank over an undirected edge list — the
    * centrality signal for picking CANONICAL representatives out of
    * near-dup clusters (the best-connected member, not just min-id)
    * and for weighting crawl sources. Nodes are the vertices incident
    * to `edges` (an undirected graph has no dangling nodes, so no
    * teleport-mass bookkeeping).
    *
    * Determinism across engines: per-edge contributions rank/degree
    * are summed under the exact decimal convention and each round's
    * rank is ROUNDED to 12 decimals — partial-aggregation order can't
    * drift the result, so a fixed iteration count yields bit-identical
    * ranks everywhere (see q86's oracle, which replays the same
    * unrolled iterations in SQL).
    *
    * Scale shape per round: one join of ranks against the co-located
    * (pre-partitioned, persisted) edge frame + one partial-agg
    * shuffle; lineage is truncated per round exactly like
    * [[connectedComponents]].
    */
  def pageRank(edges: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", iterations: Int = 5,
      damping: Double = 0.85): DataFrame = {
    val sym = edges.select(col(aCol).as("dst"), col(bCol).as("src"))
      .unionAll(edges.select(col(bCol).as("dst"), col(aCol).as("src")))
      .repartition(col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val deg = sym.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("deg"))
      val n = deg.count()
      if (n == 0) return deg.select(col("id"), lit(0.0).as("rank"))
      // (1 − d) computed through exact decimal, THEN to double: the
      // oracle's DECIMAL `1.0 - 0.85` is exactly 0.15 before its cast
      // to double, while Scala's `1.0 - 0.85` is 0.15000000000000002 —
      // a 2-ulp asymmetry that a 12-decimal half-way rank would lock in
      val baseNum = (BigDecimal(1) - BigDecimal(damping)).toDouble
      // each round MUST materialize before the previous round's
      // checkpoint is released (the connectedComponents contract —
      // `sig` there, the rank-mass sum here): an unmaterialized lazy
      // checkpoint chain whose ancestors were already released
      // recomputes round k−1 once per reference, O(2^rounds) total,
      // and the mass sum doubles as a free sanity signal.
      def materialize(df: DataFrame): Unit = df.agg(sum("rank")).head()
      // initial rank through the same SQL round the oracle uses —
      // a driver-side math.rint would round half-even where SQL
      // rounds half-up
      var ranks = deg.select(col("id"), col("deg"),
          round(lit(1.0) / lit(n.toDouble), 12).as("rank"))
        .localCheckpoint(false)
      materialize(ranks)
      var i = 0
      while (i < iterations) {
        val contrib = sym
          .join(ranks.select(col("id").as("dst"), col("rank"),
            col("deg")), "dst")
          .groupBy(col("src").as("id"))
          .agg(sum((col("rank") / col("deg"))
            .cast("decimal(28,20)")).as("__in"))
        val next = ranks.select(col("id"), col("deg"))
          .join(contrib, Seq("id"))
          .select(col("id"), col("deg"),
            round((lit(baseNum) / lit(n.toDouble)) +
              lit(damping) * col("__in").cast("double"), 12).as("rank"))
          .localCheckpoint(false)
        materialize(next)
        org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(ranks)
        ranks = next
        i += 1
      }
      // ranks is materialized — the caller's action reads checkpoint
      // storage, so releasing the edge frame below is safe
      ranks.select(col("id"), col("rank"))
    } finally sym.unpersist(blocking = false)
  }

  /** Exact n-gram Jaccard over two MATERIALIZED shingle-array columns —
    * the verification step applied to LSH candidates (never all pairs).
    * Callers join candidate pairs against a per-doc shingle frame
    * (computed once) rather than re-deriving shingles per pair side.
    */
  def jaccardFromShingles(sa: Column, sb: Column): Column = {
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = (size(sa) + size(sb)).cast("double") - inter
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** id + shingle array, materialized once per document (tokens
    * materialized first — see object doc).
    */
  def shingleFrame(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame =
    spread(df).select(col(idCol), TextAnalysis.wsTokens(col(textCol)).as("__w"))
      .select(col(idCol),
        TextAnalysis.shinglesFromTokens(col("__w"), n).as("sh"))

  /** id + SimHash-64 fingerprint: per-token 64-bit hash, ±1 votes per
    * bit, sign → bit — one custom-expression pass (VectorExprs; the
    * 64-aggregate built-in form re-walked the token array 64×
    * interpreted). Near-dup when hamming distance ≤ threshold.
    */
  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame =
    spread(df).select(col(idCol),
      graft.functions.VectorExprs.simhash64(
        TextAnalysis.wsTokens(lower(col(textCol)))).as("simhash"))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with hamming ≤ `maxHamming`, found by the
    * pigeonhole trick: split the 64-bit fingerprint into
    * `maxHamming + 1` chunks — any pair within the distance budget must
    * agree exactly on at least one chunk, so candidates come from ONE
    * shuffle on (chunk_idx, chunk_value) and only candidates pay the
    * hamming check. Never corpus×corpus.
    *
    * Exact-dedup FIRST, like [[nearDupPairsVerified]]: identical
    * (case/whitespace-normalized) docs share a fingerprint, so the
    * pigeonhole join runs on one representative per distinct content
    * (a twin pile can't flood a chunk bucket) and member pairs are
    * reconstructed afterwards — intra-group at hamming 0 by
    * construction, cross-group carrying the representative distance.
    */
  /** Near-dup pairs over an ARBITRARY 64-bit fingerprint column — the
    * modality-agnostic core of hamming-distance dedup (perceptual
    * image hashes, audio fingerprints, rolling text hashes): the
    * pigeonhole split into `maxHamming + 1` chunks guarantees every
    * pair within the radius shares at least one exact chunk, so
    * candidates ride ONE shuffle on (chunk_idx, chunk_val) and the
    * exact hamming check runs per candidate — never corpus × corpus.
    * Hot chunk buckets (constant regions — e.g. flat-color images all
    * hashing the degenerate fingerprint) are capped like the LSH
    * buckets. [[simhashNearDupPairs]] is this shape specialized to
    * text with exact-dedup grouping in front.
    */
  def fingerprintNearDupPairs(df: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 10000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 63,
      s"maxHamming must be in [0, 63], got $maxHamming")
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val mask = if (width >= 64) -1L else (1L << width) - 1
    val chunked = df
      .select(col(idCol).as("id"), col(hashCol).cast("long").as("fp"))
      .filter(col("fp").isNotNull)
      .select(col("id"), col("fp"),
        posexplode(array((0 until chunks).map { c =>
          shiftrightunsigned(col("fp"), c * width).bitwiseAND(lit(mask))
        }: _*)).as(Seq("chunk_idx", "chunk_val")))
      .withColumn("__bsz", count(lit(1)).over(
        Window.partitionBy("chunk_idx", "chunk_val")))
      .filter(col("__bsz") <= maxBucketSize).drop("__bsz")
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming64(col("a.fp"), col("b.fp")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** MinHash CALIBRATION census — measure the estimator's error
    * against exact Jaccard BEFORE trusting it at corpus scale: the
    * "how many permutations / what threshold" tuning harness run on a
    * verify-scale sample, not a production dedup pass. For every doc
    * and every declared retention percentage, a variant keeping the
    * first ⌊|tokens|·pct/100⌋ tokens (integer arithmetic — no float
    * fraction can round differently across engines) is paired with
    * the full doc; per pair the census compares
    *   - exact shingle Jaccard |∩|/|∪|, and
    *   - the k-permutation MinHash estimate (matching mins / k),
    * then aggregates per pct: n_pairs, mean exact, mean estimate,
    * mean |error| — the bias/variance picture per similarity band.
    *
    * The permutation draws here are md5-uint32 (the q213/q215 sketch
    * convention), NOT the production xxhash64 path — deliberately: an
    * oracle can replay md5 bit for bit, and MinHash's accuracy
    * depends only on the draws being uniform, so the measured
    * calibration transfers to any uniform hash family. Means sum as
    * decimal(38,12) from per-pair doubles so aggregation order can't
    * move the 6th decimal.
    *
    * The harness runs on a DECLARED SAMPLE BUDGET (`maxDocs` docs,
    * drawn deterministically as the first maxDocs ids in
    * md5(id)-order — a seedless uniform draw both engines replay), so
    * its cost is FIXED regardless of corpus size: k·|shingles| md5
    * evaluations per sampled doc-variant, then one bounded census
    * shuffle. Calibration needs a uniform sample, not the corpus —
    * running estimator diagnostics over 100 TB would be spending more
    * than the production pass being tuned. Pairs where either side
    * has no shingle are excluded (Jaccard is undefined on an empty
    * set); the variant construction keeps the doc's token ORDER, so
    * the pair's true similarity falls with pct — the census rows
    * sweep the similarity range. n_pairs per row reports how many
    * sampled pairs fed each band, so the budget is visible in the
    * output, never silent.
    */
  def minhashCalibration(df: DataFrame, idCol: String, textCol: String,
      pcts: Seq[Int] = Seq(30, 50, 70, 90), k: Int = 16,
      shingleN: Int = 3, maxDocs: Int = 500): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def mh(sh: Column, seed: Int): Column =
      array_min(transform(sh, x =>
        conv(substring(md5(concat(lit(seed.toString), lit("|"), x)), 1, 8),
          16, 10).cast("long")))
    val sh = calibrationShingles(df, idCol, textCol, pcts, shingleN,
      maxDocs)
    val matches = (1 to k).map(s =>
      when(mh(col("sa"), s) === mh(col("sb"), s), 1).otherwise(0))
      .reduce(_ + _)
    val perPair = sh.select(col("pct"), exactShingleJaccard.as("ej"),
      (matches.cast("double") / k).as("es"))
    perPair.groupBy("pct")
      .agg(count(lit(1)).as("n_pairs"),
        decimalMean6(col("ej")).as("mean_exact"),
        decimalMean6(col("es")).as("mean_est"),
        decimalMean6(abs(col("ej") - col("es"))).as("mean_abs_err"))
      .orderBy("pct")
  }

  /** The calibration harness's sampled shingle-pair frame, shared by
    * [[minhashCalibration]] and [[minhashOperatingPoint]]: each doc of
    * the declared budget (first `maxDocs` ids in md5(id)-order — a
    * seedless uniform draw any engine replays) paired with token-prefix
    * variants at the declared retention percentages; word-`shingleN`-
    * gram sets on both sides, empty-shingle pairs excluded (Jaccard
    * undefined). Output: (pct, sa, sb).
    */
  private def calibrationShingles(df: DataFrame, idCol: String,
      textCol: String, pcts: Seq[Int], shingleN: Int, maxDocs: Int)
      : DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be in [1, 100], got $pcts")
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    // TakeOrderedAndProject cut — never a corpus sort
    val sampled = df.select(col(idCol), col(textCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(maxDocs)
    val toks = sampled.select(col(idCol).as("id"),
      TextAnalysis.wsTokens(col(textCol)).as("w"))
    val paired = pcts.map { p =>
      toks.select(col("id"), lit(p).as("pct"), col("w").as("wa"),
        slice(col("w"), lit(1), (size(col("w")) * p).divide(100)
          .cast("int")).as("wb"))
    }.reduce(_ unionAll _)
    paired.select(col("id"), col("pct"),
        TextAnalysis.shinglesFromTokens(col("wa"), shingleN).as("sa"),
        TextAnalysis.shinglesFromTokens(col("wb"), shingleN).as("sb"))
      .filter(size(col("sa")) > 0 && size(col("sb")) > 0)
  }

  /** Exact shingle Jaccard |∩|/|∪| over the (sa, sb) columns —
    * integer operands into one IEEE division, identical in any
    * engine.
    */
  private def exactShingleJaccard: Column = {
    val inter = size(array_intersect(col("sa"), col("sb")))
    inter.cast("double") / (size(col("sa")) + size(col("sb")) - inter)
  }

  /** Order-insensitive 6-decimal mean: per-row doubles accumulate as
    * decimal(38,12) so aggregation order can't move the 6th decimal.
    */
  private def decimalMean6(c: Column): Column =
    round(sum(c.cast("decimal(38,12)")).cast("double") /
      count(lit(1)), 6)

  /** The default (bands, rows) candidate grid for
    * [[minhashOperatingPoint]]: the realistic LSH operating points at
    * signature budgets of 16, 32, and 64 hashes.
    */
  val defaultLshGrid: Seq[(Int, Int)] = Seq(
    (16, 1), (8, 2), (4, 4), (32, 1), (16, 2), (8, 4), (4, 8),
    (64, 1), (32, 2), (16, 4))

  /** MinHash/LSH OPERATING-POINT recommendation — the auto-tuner the
    * calibration census feeds: given a target Jaccard threshold and a
    * candidate (bands, rows) grid, score every candidate's banding
    * S-curve against the MEASURED similarity distribution of the
    * calibration sample and flag the recommended point.
    *
    * For a pair of true Jaccard J, LSH banding with r rows × b bands
    * surfaces the pair with P(J) = 1 − (1 − J^r)^b (Broder/Indyk
    * banding analysis, the standard S-curve). Scored against the
    * sampled pairs (same declared budget + prefix-variant sweep as
    * [[minhashCalibration]], so the pairs SPAN the similarity range):
    *
    *   - `recall` = mean P over pairs with exact J ≥ target — the
    *     fraction of true positives the banding would surface;
    *   - `false_cand_rate` = mean P over pairs with J < target — the
    *     below-threshold candidate fraction the verify stage then
    *     pays to reject (LSH false candidates cost compute, not
    *     correctness — the Jaccard verification removes them);
    *   - `s_mid` = (1/b)^(1/r), the S-curve's 50%-capture similarity
    *     — where the candidate's cliff sits relative to the target.
    *
    * The RECOMMENDED candidate is the cheapest (fewest total hashes
    * b·r, then fewest bands) whose recall clears `recallFloor`; when
    * none clears it, the highest-recall candidate (ties → cheapest) —
    * a deterministic rule over the 6-decimal-rounded recalls, so any
    * engine reproduces the same flag.
    *
    * Exactness: J^r and (1−J^r)^b are expanded as LEFT-ASSOCIATED
    * multiplication chains (integer exponents — no pow()), so every
    * per-pair probability is a sequence of correctly-rounded IEEE
    * ops any engine replays bit for bit; means accumulate as
    * decimal(38,12) (the calibration convention). Cost: the sampled
    * pair frame builds ONCE (persisted via the session registry) and
    * each candidate adds one aggregation over it — fixed at any
    * corpus size by the declared sample budget.
    */
  def minhashOperatingPoint(df: DataFrame, idCol: String,
      textCol: String, targetJaccard: Double, recallFloor: Double = 0.9,
      grid: Seq[(Int, Int)] = defaultLshGrid,
      pcts: Seq[Int] = Seq(30, 50, 70, 90), shingleN: Int = 3,
      maxDocs: Int = 500): DataFrame = {
    require(targetJaccard > 0.0 && targetJaccard < 1.0,
      s"targetJaccard must be in (0, 1), got $targetJaccard")
    require(recallFloor > 0.0 && recallFloor <= 1.0,
      s"recallFloor must be in (0, 1], got $recallFloor")
    require(grid.nonEmpty && grid.forall { case (b, r) =>
      b >= 1 && r >= 1 },
      s"grid must be non-empty with bands, rows >= 1, got $grid")
    val perPair = persistHeavy(
      calibrationShingles(df, idCol, textCol, pcts, shingleN, maxDocs)
        .select(exactShingleJaccard.as("ej")),
      freshScope = false)
    val above = col("ej") >= targetJaccard
    val scored = grid.map { case (b, r) =>
      // left-associated multiplication chains — integer powers as
      // correctly-rounded IEEE ops, bit-replayable in any engine
      val jr = (1 to r).map(_ => col("ej")).reduce(_ * _)
      val miss = (1 to b).map(_ => lit(1.0) - jr).reduce(_ * _)
      val p = lit(1.0) - miss
      val nAbove = count(when(above, lit(1)))
      val nBelow = count(when(!above, lit(1)))
      def condMean(pred: Column, n: Column): Column =
        when(n > 0, round(
          sum(when(pred, p).cast("decimal(38,12)")).cast("double") / n,
          6))
      perPair.agg(
        nAbove.as("n_above"), nBelow.as("n_below"),
        condMean(above, nAbove).as("recall"),
        condMean(!above, nBelow).as("false_cand_rate"))
        .select(lit(b).as("bands"), lit(r).as("rows"),
          lit(b * r).as("n_hashes"),
          lit(math.rint(math.pow(1.0 / b, 1.0 / r) * 1e6) / 1e6)
            .as("s_mid"),
          col("n_above"), col("n_below"), col("recall"),
          col("false_cand_rate"))
    }.reduce(_ unionAll _)
    // deterministic recommendation over the ROUNDED recalls: cheapest
    // candidate clearing the floor; else highest recall, then cheapest
    // recall coalesced to 0 in the ordering keys: a NULL recall
    // (no above-threshold pairs) must sort identically in engines
    // with different NULL-ordering defaults
    val rc = coalesce(col("recall"), lit(0.0))
    val qualifies = rc >= recallFloor
    val pick = Window.orderBy(
      when(qualifies, 0).otherwise(1),
      when(qualifies, col("n_hashes")).otherwise(lit(0)),
      when(qualifies, lit(0.0)).otherwise(-rc),
      col("n_hashes"), col("bands"))
    scored
      .withColumn("recommended", row_number().over(pick) === 1)
      .orderBy("bands", "rows")
  }

  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    // width must be ≥ 1 or every chunk_val collapses to one bucket
    // (corpus×corpus join); maxHamming ≥ 64 has no pigeonhole guarantee
    // over a 64-bit fingerprint anyway.
    require(maxHamming >= 0 && maxHamming <= 63,
      s"maxHamming must be in [0, 63], got $maxHamming")
    val chunks = maxHamming + 1
    val width = 64 / chunks
    // Java shifts are mod 64: 1L << 64 wraps to 1, making the mask 0.
    val mask = if (width >= 64) -1L else (1L << width) - 1
    val grouped = exactGroups(df, idCol, textCol,
      concat_ws(" ", TextAnalysis.wsTokens(lower(col("text")))))
    val members = grouped.select(col("id"), col("gid"))
    // fingerprint + chunk keys for representatives only; persisted —
    // the pairing self-join reads it twice
    val sims = simhashes(grouped.filter(col("id") === col("gid"))
      .select(col("gid"), col("text")), "gid", "text")
    val chunked = persistHeavy(sims.select(col("gid"), col("simhash"),
      posexplode(array((0 until chunks).map { c =>
        shiftrightunsigned(col("simhash"), c * width).bitwiseAND(lit(mask))
      }: _*)).as(Seq("chunk_idx", "chunk_val"))), freshScope = false)
    val repPairs = chunked.as("a").join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.gid") < col("b.gid"))
      .select(col("a.gid").as("ga"), col("b.gid").as("gb"),
        hamming64(col("a.simhash"), col("b.simhash")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    val intra = intraPairs(members)
      .select(col("id_a"), col("id_b"), lit(0).as("hamming"))
    // terminal distinct preserves the original contract: duplicate
    // input ROWS (same id + text twice) must not inflate pair counts
    intra.unionAll(expandCross(repPairs, members, Seq("hamming")))
      .distinct()
  }

  /** Fuzzy string matching at edit distance ≤ 1 — the entity-resolution
    * primitive (near-identical names, codes, titles) — via
    * deletion-neighborhood blocking: each distinct string emits itself
    * plus its length single-deletion variants, and any two strings
    * within one edit PROVABLY share a variant (a substitution at i
    * collides both strings' delete-at-i; an insertion's delete is the
    * other string itself), so the blocking is complete — the result
    * equals all-pairs levenshtein ≤ 1 without ever running the
    * corpus × corpus join. Candidates sharing a variant are verified
    * with the exact levenshtein (shared variants at DIFFERENT positions
    * can pair distance-2 strings — e.g. "ab"/"ba" — so the residual
    * check is not optional).
    *
    * Scale: one shuffle on the variant key (each string contributes
    * len+1 ≤ maxLen+1 keys). Pairing within a bucket is a streamed
    * self-join (memory-bounded at ANY bucket size), with the windowed
    * count cap dropping only degenerate buckets past `maxBucketSize` —
    * and because a variant bucket is bounded by construction at
    * (len+1)·|alphabet|+1 distinct members, the default cap sits ABOVE
    * that bound for realistic alphabets: completeness only yields on
    * inputs where the quadratic itself would be the bug (the standard
    * skew-guard contract of every capped dedup operator here).
    * Returns distinct (s_a < s_b, dist).
    */
  def editDistanceOnePairs(df: DataFrame, strCol: String,
      maxLen: Int = 64, maxBucketSize: Int = 10000): DataFrame = {
    require(maxLen >= 1, s"maxLen must be positive, got $maxLen")
    // no spread(): per-row featurization here is ~len substrings, not
    // the minhash kernel — the .rdd partition probe costs more than
    // the work it redistributes
    val strings = df.select(col(strCol).as("s"))
      .filter(col("s").isNotNull && length(col("s")) <= maxLen &&
        length(col("s")) >= 1)
      .distinct()
    // the string itself + each delete-one variant, deduped per string
    // ("aa" deletes to "a" twice) so no duplicate keys enter the join
    val keyed = strings.select(col("s"),
      explode(array_distinct(concat(
        array(col("s")),
        transform(sequence(lit(1), length(col("s"))), i =>
          concat(col("s").substr(lit(1), i - 1),
            col("s").substr(i + 1, length(col("s")) - i)))))).as("__var"))
    // Pairing is a streamed self-join on the variant key: an in-array
    // expansion (collect_list + bucket² transform) was measured ~2×
    // faster at bench scale but allocates bucket² structs inside ONE
    // row — with the cap raised above the construction bound (where it
    // must sit for the completeness contract), that allocation is an
    // executor OOM on adversarial alphabets; the join only ever
    // streams rows. Persisted: both join sides read the keyed frame.
    val capped = persistHeavy(
      keyed.withColumn("__bsz",
          count(lit(1)).over(Window.partitionBy("__var")))
        .filter(col("__bsz") <= maxBucketSize).drop("__bsz"))
    capped.as("a").join(capped.as("b"),
        col("a.__var") === col("b.__var") && col("a.s") < col("b.s"))
      .select(col("a.s").as("s_a"), col("b.s").as("s_b"))
      // verify BEFORE the dedup shuffle: the thresholded levenshtein
      // (banded DP, early exit past k) is cheaper per candidate than
      // shuffling the failing candidates into the distinct
      .select(col("s_a"), col("s_b"),
        levenshtein(col("s_a"), col("s_b"), 1).as("dist"))
      .filter(col("dist") >= 0)
      .distinct()
  }

  /** Sorted-neighborhood candidate pairs — the third classic blocking
    * strategy beside LSH buckets and the deletion neighborhood: sort
    * the distinct strings within caller-chosen blocks and emit each
    * string with its next `window` successors (`gap` = sort distance).
    * DELIBERATELY heuristic: recall is whatever sort-adjacency gives
    * (shared-prefix variants cluster; a first-character typo lands far
    * away) — the standard record-linkage trade, and the q126 oracle
    * replays the same heuristic rather than pretending completeness.
    *
    * One shuffle on the block key; the per-block sort is bounded by
    * block size, the `window` leads share one WindowExec pass, and no
    * pairing join exists at all — candidates are a narrow projection
    * of the sorted stream. Verification (edit distance, Jaccard, a
    * model) belongs to the caller on the bounded candidate set.
    */
  def sortedNeighborhoodPairs(df: DataFrame, strCol: String,
      blockOf: Column => Column, window: Int = 3): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val base = df.select(col(strCol).as("s"))
      .filter(col("s").isNotNull).distinct()
      .withColumn("__blk", blockOf(col("s")))
    val w = Window.partitionBy("__blk").orderBy("s")
    // leads bind as real columns first — a window expression inside a
    // generator is rejected by the analyzer
    base.select(col("s") +: (1 to window).map(k =>
        lead(col("s"), k).over(w).as(s"__l$k")): _*)
      .select(col("s").as("s_a"),
        posexplode(array((1 to window).map(k => col(s"__l$k")): _*))
          .as(Seq("__pos", "s_b")))
      .filter(col("s_b").isNotNull)
      .select(col("s_a"), col("s_b"), (col("__pos") + 1).as("gap"))
  }

  /** Triangle enumeration over an undirected pair graph — the local
    * clustering signal on top of [[connectedComponents]]' global one
    * (a near-dup or co-occurrence component that is also
    * triangle-dense is a tight clique, not a chain of borderline
    * matches). Returns each triangle once as (id_a < id_b < id_c).
    *
    * Degree-ordered edge orientation (the compact-forward algorithm):
    * every edge points from its lower-(degree, id) endpoint to the
    * higher, wedges enumerate ordered out-neighbor pairs, and a
    * semi-join against the oriented edges closes them. Out-degrees
    * under this orientation are O(√m) even on skewed power-law
    * graphs — the wedge explosion a high-degree hub would cause under
    * arbitrary orientation (deg² per hub) cannot happen, which is what
    * makes the enumeration viable at 100 TB edge scale.
    */
  /** Degree-ordered orientation of an undirected edge frame: every
    * edge points from its lower-(degree, id) endpoint to the higher.
    * Returns the PERSISTED (u, v, dv) frame — out-degrees under this
    * orientation are O(√m) even on power-law graphs, which is what
    * bounds both the wedge enumeration ([[triangles]]) and the
    * adjacency arrays ([[triangleCount]]). Opens a fresh HeavyPersist
    * scope (the normalized edge frame feeds the degree union and the
    * orientation join).
    */
  private[operators] def orientEdges(edges: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    // Persisted: e feeds the degree union (both endpoint projections)
    // AND the orientation join — unpersisted, the caller's whole edge
    // derivation upstream of `edges` re-executes three times.
    val e = persistHeavy(edges
      .select(col(aCol).cast("long").as("x"), col(bCol).cast("long").as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("x"),
        greatest(col("x"), col("y")).as("y"))
      .distinct())
    val deg = e.select(col("x").as("v")).unionAll(e.select(col("y").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("v").as("x"), col("d").as("dx")), "x")
      .join(deg.select(col("v").as("y"), col("d").as("dy")), "y")
    val xFirst = col("dx") < col("dy") ||
      (col("dx") === col("dy") && col("x") < col("y"))
    // Persisted: oriented feeds every consumer downstream (wedge
    // sides + closing semi-join, or adjacency build + edge probe) —
    // unpersisted, the degree joins recompute per consumer.
    // freshScope=false keeps `e` cached (oriented materializes FROM it).
    persistHeavy(withDeg.select(
      when(xFirst, col("x")).otherwise(col("y")).as("u"),
      when(xFirst, col("y")).otherwise(col("x")).as("v"),
      when(xFirst, col("dy")).otherwise(col("dx")).as("dv")),
      freshScope = false)
  }

  def triangles(edges: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val oriented = orientEdges(edges, aCol, bCol)
    // wedges: ordered out-neighbor pairs at u, ranked like the
    // orientation so the closing edge is stored exactly as (v1 → v2)
    val e1 = oriented.select(col("u"), col("v").as("v1"), col("dv").as("d1"))
    val e2 = oriented.select(col("u"), col("v").as("v2"), col("dv").as("d2"))
    val wedges = e1.join(e2, Seq("u")).filter(
      col("d1") < col("d2") || (col("d1") === col("d2") &&
        col("v1") < col("v2")))
    wedges
      .join(oriented.select(col("u").as("v1"), col("v").as("v2")),
        Seq("v1", "v2"), "left_semi")
      .select(array_sort(array(col("u"), col("v1"), col("v2"))).as("t"))
      .select(col("t")(0).as("id_a"), col("t")(1).as("id_b"),
        col("t")(2).as("id_c"))
  }

  /** COUNT-ONLY twin of [[triangles]] (r10 verdict lever a): the
    * exact triangle count via oriented-adjacency intersection
    * (compact-forward with sorted neighbor arrays) — for each oriented
    * edge (u, v), |N⁺(u) ∩ N⁺(v)| closes every triangle exactly once,
    * so the count is two joins of the edge frame against the
    * node-sized adjacency table plus one codegen'd array intersection
    * per edge. NO wedge row is materialized or shuffled: the sibling
    * pushes Σ C(d⁺, 2) wedge rows through a join + semi-join, while
    * this path moves only |E| rows carrying O(d⁺)-bounded arrays —
    * the asymptotic gap between counting and enumerating.
    *
    * Output is a one-row census: `n_edges` (normalized distinct
    * undirected edges), `n_wedges` (Σ C(d⁺, 2) — the row count the
    * enumerating sibling would shuffle; the cost estimate to read
    * BEFORE running it), `n_triangles` (exact).
    */
  def triangleCount(edges: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val oriented = orientEdges(edges, aCol, bCol)
    val nbrs = persistHeavy(oriented.groupBy(col("u"))
      .agg(sort_array(collect_list(col("v"))).as("nb")),
      freshScope = false)
    val edgeStats = oriented.groupBy(col("u"))
      .agg(count(lit(1)).as("d"))
      .agg(sum(col("d")).as("n_edges"),
        sum(expr("d * (d - 1) DIV 2")).as("n_wedges"))
    val tri = oriented
      .join(nbrs, "u")
      .join(nbrs.select(col("u").as("v"), col("nb").as("nbv")),
        Seq("v"), "left")
      .select(size(array_intersect(col("nb"),
        coalesce(col("nbv"), array().cast("array<bigint>")))).as("c"))
      .agg(sum(col("c")).as("n_triangles"))
    edgeStats.crossJoin(tri)
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"))
  }

  /** Adamic-Adar link prediction (Adamic & Adar 2003): the top-k
    * non-edges ranked by Σ 1/ln(deg(w)) over common neighbors w — the
    * "which pairs are one purchase away from co-occurring" census the
    * enumeration (q114/q187) family lacks. Used in curation to
    * propose merge candidates a direct-evidence graph misses.
    *
    * Scale shape: one symmetric-adjacency aggregation (2|E| rows),
    * then wedge pairs explode FROM each center's bounded neighbor
    * array — centers hotter than `maxCenterDegree` are dropped from
    * scoring on both engines (a declared cap, the
    * q145/q153 completeness trade: a hub's 1/ln(d) terms are the
    * least informative and its d² wedge fan-out the most expensive),
    * so the explode is bounded by cap²/2 per center. One (u, v)
    * partial-agg shuffle sums the scores, existing edges leave via
    * one anti-join, and the cut plans as TakeOrderedAndProject.
    *
    * Determinism across engines: each center's term is quantized to
    * integer nano-units — ⌊1e9/ln(d) + 0.5⌋, the q158/q164 nano
    * convention — so per-pair scores are EXACT integer sums and the
    * (score, u, v) cut is total. `ln` is only 1-ulp-accurate per
    * engine; at 1e9 scale a disagreement moves the pre-floor value by
    * ~1e-7, six orders under the 0.5 rounding margin (1e12 would
    * leave only ~1e-4). Centers need d ≥ 2 to form a wedge, so
    * ln(d) > 0 always.
    *
    * Output: (`u`, `v`, `scored_common_nbrs`, `aa_score`,
    * `excluded_centers`, `max_degree`), score desc.
    * `scored_common_nbrs` is the count of common neighbors INSIDE the
    * 2 ≤ deg ≤ cap scoring window — capped hubs are excluded from the
    * count exactly as from the score (the name says so; a raw
    * common-neighbor count would disagree with the score's support).
    * `excluded_centers`/`max_degree` are the dropped-center census
    * (the repo's no-silent-caps rule): how many vertices the cap
    * removed from scoring and the hottest degree observed, constant
    * across the rows of one result.
    */
  def adamicAdar(edges: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", topK: Int = 20,
      maxCenterDegree: Int = 256): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(maxCenterDegree >= 2,
      s"maxCenterDegree must be >= 2, got $maxCenterDegree")
    // Persisted: e feeds both the adjacency build and the final
    // anti-join — unpersisted, the caller's edge derivation runs twice.
    val e = persistHeavy(edges
      .select(col(aCol).cast("long").as("x"), col(bCol).cast("long").as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("x"),
        greatest(col("x"), col("y")).as("y"))
      .distinct())
    val nbrs = e.select(col("x").as("v"), col("y").as("w"))
      .unionAll(e.select(col("y").as("v"), col("x").as("w")))
      .groupBy("v")
      .agg(sort_array(collect_list(col("w"))).as("nb"),
        count(lit(1)).as("d"))
    // Dropped-center census (no-silent-caps rule): a 1-row frame over
    // the same degree aggregation, broadcast onto the ≤ topK output.
    // nbrs re-derives from the persisted `e`, so this is one extra
    // cheap agg, not a second edge materialization.
    val capCensus = nbrs.agg(
      count(when(col("d") > maxCenterDegree, 1)).as("excluded_centers"),
      max(col("d")).as("max_degree"))
    val centers = nbrs
      .filter(col("d") >= 2 && col("d") <= maxCenterDegree)
      .select(col("nb"),
        floor(lit(1e9) / log(col("d").cast("double")) + lit(0.5))
          .cast("long").as("term"))
    // nb is a bound column, so the nested transform walks it once
    // (the file-header evaluation-cost convention)
    val pairArr = filter(
      flatten(transform(col("nb"), x =>
        transform(col("nb"), y => struct(x.as("u"), y.as("v"))))),
      p => p.getField("u") < p.getField("v"))
    val scored = centers
      .select(explode(pairArr).as("p"), col("term"))
      .groupBy(col("p.u").as("u"), col("p.v").as("v"))
      .agg(count(lit(1)).as("scored_common_nbrs"),
        sum(col("term")).as("s"))
    scored
      .join(e.select(col("x").as("u"), col("y").as("v")),
        Seq("u", "v"), "left_anti")
      .orderBy(col("s").desc, col("u"), col("v"))
      .limit(topK)
      .crossJoin(broadcast(capCensus))
      .select(col("u"), col("v"), col("scored_common_nbrs"),
        round(col("s") / lit(1e9), 6).as("aa_score"),
        col("excluded_centers"), col("max_degree"))
  }

  /** Set-similarity self-join via prefix filtering (the
    * AllPairs / SSJoin family — Bayardo et al. WWW'07, Chaudhuri et
    * al. ICDE'06): every document pair whose distinct-token Jaccard
    * is ≥ num/den. EXACT — no false negatives — whenever no prefix
    * posting exceeds `maxTokenBucket` (the cap drops all prefix
    * entries of a hotter token from BOTH sides, so a pair whose
    * shared prefix tokens are all capped is silently lost; below the
    * cap the pigeonhole completeness proof holds unconditionally).
    * The deterministic complement to the probabilistic MinHash path.
    * The threshold is a
    * RATIONAL (num/den), so both the prefix length and the final
    * test are exact integer arithmetic — a float `ceil(τ·|s|)`
    * mis-rounds at representable boundaries and silently breaks the
    * completeness proof.
    *
    * How it scales: each doc's token set is ordered RAREST-FIRST by
    * global frequency and only its PREFIX (|s| − ⌈τ·|s|⌉ + 1 tokens —
    * the pigeonhole bound: two sets with J ≥ τ must collide inside
    * their prefixes) enters the candidate join, so candidates are
    * generated on the rarest tokens a doc has, exactly where postings
    * are short. A declared `maxTokenBucket` cap bounds the worst-case
    * posting (the standard completeness trade, documented like every
    * pairing cap here); the final verify touches candidates only,
    * comparing inter·den ≥ num·union in integers.
    *
    * Duplicate-heavy corpora (the q32/q39 lesson, SCALE.md): docs
    * with IDENTICAL shingle sets would each post their full prefix
    * and every twin pair would ride the candidate join — a k-twin
    * pile costs C(k,2) candidates per prefix token and measured 6.8×
    * at the 10-twin sf1 stress. So the join runs DEDUP-FIRST: group
    * identical sets (one window-min on the sorted array), run
    * prefix + verify over the per-distinct-set REPRESENTATIVES only,
    * then expand — intra-group member pairs are J = 1 by definition
    * (inter = un = |set|), cross-group rep pairs broadcast their
    * verified (inter, un, jac) to all member pairs. Output is
    * pair-for-pair identical to the all-pairs definition; the
    * prefix-posting cap now counts DISTINCT sets, so completeness
    * under the cap strictly improves on duplicate piles.
    */
  def setSimilarityJoin(df: DataFrame, idCol: String, textCol: String,
      num: Int, den: Int, n: Int = 3, maxTokenBucket: Int = 10000)
      : DataFrame = {
    require(num > 0 && den > 0 && num <= den,
      s"threshold must be a rational in (0, 1]: $num/$den")
    // n-gram shingle sets (n = 1 degrades to word tokens). Shingles,
    // not unigrams, are the default deliberately: a small vocabulary
    // makes every unigram posting corpus-sized and NO prefix filter
    // can help (the candidate set is quadratic by construction);
    // n-gram space grows as vocab^n, so postings stay short exactly
    // where the filter needs them to.
    val toks = shingleFrame(df, idCol, textCol, n)
      .select(col(idCol).as("id"), explode_outer(col("sh")).as("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")
      .distinct()
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("__f"))
    // per-doc token array, rarest-first (global freq, then token —
    // array_sort on (f, tok) structs is the deterministic order both
    // the prefix and the verify share), then grouped by VALUE: gid =
    // min member id per distinct array (docs with no shingles never
    // reach `toks`, so they have no row here — and no pairs, matching
    // the all-pairs definition where J = 0/0 is no match)
    val grouped = persistHeavy(toks.join(freq, "tok")
      .groupBy("id")
      .agg(transform(
        array_sort(collect_list(struct(col("__f"), col("tok")))),
        s => s.getField("tok")).as("ts"))
      .select(col("id"), col("ts"), size(col("ts")).as("sz"))
      .withColumn("gid", min(col("id")).over(Window.partitionBy("ts"))))
    val members = grouped.select(col("gid"), col("id"))
    val reps = grouped.filter(col("id") === col("gid"))
      .select(col("id"), col("ts"), col("sz"))
    // prefix length: sz − ceil(sz·num/den) + 1, integer ceil. Each
    // prefix entry carries its 1-based POSITION in the rarest-first
    // order — the PPJoin positional filter below needs it.
    val p = col("sz") - floor((col("sz") * num + (den - 1)) / lit(den))
      .cast("int") + 1
    // persisted (freshScope = false: same pipeline scope as `grouped`)
    // because the self-join below references it TWICE — unpersisted,
    // the whole posexplode + exchange + sort + window subtree ran once
    // PER SIDE (the r17 plan shows the duplication), doubling the
    // prefix-stage work and its exchange count at every scale.
    val rawPrefixes = persistHeavy(reps.select(col("id"), col("sz"),
        posexplode(slice(col("ts"), lit(1), p)))
      .select(col("id"), col("sz"), (col("pos") + 1).as("pos"),
        col("col").as("tok"))
      .withColumn("__bsz",
        count(lit(1)).over(Window.partitionBy("tok"))),
      freshScope = false)
    // did the bucket cap actually DROP anything? One agg over the
    // cached frame (the action that materializes the persist); the
    // answer picks the positional bound below.
    val anyCapped = Option(rawPrefixes.agg(max(col("__bsz"))).head()
      .getAs[java.lang.Long](0)).exists(_ > maxTokenBucket)
    val prefixes = rawPrefixes.filter(col("__bsz") <= maxTokenBucket)
      .select(col("id"), col("sz"), col("pos"), col("tok"))
    // candidates: prefix collision + the size pigeonhole (J ≥ τ ⇒
    // τ·|a| ≤ |b| for |a| ≥ |b| — integer form, a necessary condition)
    // + the PPJoin POSITIONAL filter (Xiao et al. WWW'08). Two sound
    // regimes, picked by whether the bucket cap actually dropped
    // anything (`anyCapped` — data-dependent like an AQE choice; the
    // candidate set differs between the bounds but the verify stage
    // filters both to the identical exact pair set, so the OUTPUT
    // never depends on the branch):
    //   - UNCAPPED (every bench corpus, and any corpus whose hottest
    //     prefix posting fits the bucket): the tight first-common-token
    //     bound `1 + min(sz_a − i, sz_b − j)` — a true pair's first
    //     common token is in both prefixes (the pigeonhole proof) and
    //     every other common token follows it in both arrays, so that
    //     collision row always survives. Prunes hard: candidates
    //     43,500 → 12,760 on q153's corpus (4,992 reps, 55,046 prefix
    //     rows, sf0.1).
    //   - CAPPED: the per-row-valid bound `least(i, j) +
    //     least(sz_a − i, sz_b − j)` (at most min(i,j) − 1 earlier
    //     tokens can match, this one matches, only suffix tokens can
    //     follow) — valid at EVERY collision row, so a true pair
    //     survives through ANY uncapped shared prefix token and the
    //     loss condition stays exactly the documented
    //     all-prefix-tokens-capped one. (The r17 form applied the
    //     tight bound unconditionally — under the cap a borderline
    //     true pair could lose its one valid collision row, a strictly
    //     wider false-negative condition than documented. Measured:
    //     the sound capped bound keeps 39,530 of the 43,500 on q153's
    //     corpus — the tight bound's pruning is worth branching for.)
    // J ≥ num/den needs overlap ≥ num·(sz_a + sz_b)/(num + den);
    // integer arithmetic throughout, like the size filter. Verified
    // pair set measured identical across no-filter/tight/per-row
    // bounds (241 pairs, q153's corpus).
    val overlapBound =
      if (anyCapped)
        least(col("a.pos"), col("b.pos")) +
          least(col("a.sz") - col("a.pos"), col("b.sz") - col("b.pos"))
      else
        lit(1) + least(col("a.sz") - col("a.pos"),
          col("b.sz") - col("b.pos"))
    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
        col("a.sz") * num <= col("b.sz") * den &&
        col("b.sz") * num <= col("a.sz") * den &&
        overlapBound * (num + den) >= (col("a.sz") + col("b.sz")) * num)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val inter = size(array_intersect(col("ta"), col("tb")))
    val crossReps = cand
      .join(reps.select(col("id").as("id_a"), col("ts").as("ta"),
        col("sz").as("sz_a")), "id_a")
      .join(reps.select(col("id").as("id_b"), col("ts").as("tb"),
        col("sz").as("sz_b")), "id_b")
      .select(col("id_a"), col("id_b"), inter.as("inter"),
        (col("sz_a") + col("sz_b") - inter).as("un"))
      .filter(col("inter") * den >= col("un") * num)
      .select(col("id_a").as("ga"), col("id_b").as("gb"), col("inter"),
        col("un"),
        (floor(col("inter").cast("double") / col("un") * 1e6 + 0.5) / 1e6)
          .as("jac"))
    // expansion back to member pairs. Intra-group: identical sets,
    // J = 1 exactly (any τ ≤ 1 passes). Cross-group: member ids
    // interleave across groups, so least/greatest restores id_a < id_b
    // (the expandCross convention). Streamed self-join, not a
    // collected-bucket expansion — memory-bounded at any group size.
    val intra = members.as("m1").join(members.as("m2"),
        col("m1.gid") === col("m2.gid") && col("m1.id") < col("m2.id"))
      .select(col("m1.gid").as("__g"), col("m1.id").as("id_a"),
        col("m2.id").as("id_b"))
      .join(reps.select(col("id").as("__g"), col("sz")), "__g")
      .select(col("id_a"), col("id_b"), col("sz").as("inter"),
        col("sz").as("un"), lit(1.0).as("jac"))
    val cross = crossReps
      .join(members.select(col("gid").as("ga"), col("id").as("ia")), "ga")
      .join(members.select(col("gid").as("gb"), col("id").as("ib")), "gb")
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"),
        col("inter"), col("un"), col("jac"))
    intra.unionAll(cross)
  }

  /** Entity-resolution clustering: given STRING-keyed match pairs
    * (e.g. [[editDistanceOnePairs]] output), label every key with its
    * entity cluster so survivorship rules can build one golden record
    * per entity. Strings aren't [[connectedComponents]] node ids, so
    * each distinct key is first mapped to a stable numeric node id —
    * the MINIMUM `idCol` among that key's rows (content-derived, so
    * re-ingestion can't relabel clusters the way a zipWithIndex
    * would) — the pair frame maps through the same (key → nid) frame,
    * and components run on the numeric graph. Output per distinct
    * key: `entity_id` (the cluster's minimum nid — the elected
    * representative's id) and `is_rep` (this key owns it).
    *
    * Scale shape: the (key → nid) frame is distinct-key-sized; the
    * two mapping joins touch the PAIR frame (already blocked/capped by
    * the pair generator); components is the checkpointed iterative
    * min-label propagation. The caller joins the result back on the
    * key column — fact rows never enter the graph.
    */
  def entityClusters(df: DataFrame, idCol: String, keyCol: String,
      pairs: DataFrame, aCol: String = "s_a", bCol: String = "s_b")
      : DataFrame = {
    val names = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(min(col(idCol)).as("__nid"))
    val edges = pairs
      .join(names.select(col(keyCol).as(aCol), col("__nid").as("nid_a")),
        aCol)
      .join(names.select(col(keyCol).as(bCol), col("__nid").as("nid_b")),
        bCol)
      .select("nid_a", "nid_b")
    connectedComponents(names.select(col("__nid")), "__nid",
        edges, "nid_a", "nid_b")
      .select(col("id").as("__nid"), col("comp").as("entity_id"))
      .join(names, "__nid")
      .select(col(keyCol), col("entity_id"),
        (col("__nid") === col("entity_id")).as("is_rep"))
  }

  /** Synchronous label propagation for community detection: every
    * node starts as its own label; each round every node SIMULTANEOUSLY
    * adopts its neighbors' most frequent label (ties → smallest label;
    * isolated nodes keep their own). Fixed `iterations`, so the result
    * is a pure function of the graph — fully engine-replayable (async
    * LPA's order-dependence is exactly what this variant removes).
    * Communities are finer than connected components: a bridge edge
    * joins components but rarely flips a majority.
    *
    * Scale shape mirrors [[connectedComponents]]: the symmetric edge
    * list is hash-partitioned + persisted ONCE (each round's join
    * reads co-located partitions); per round one (node, label) count
    * agg + one bounded per-node window argmax; labels checkpoint and
    * the superseded round's blocks release after materialization, so
    * lineage stays flat and nothing recomputes across rounds.
    * Output: (id, lab).
    */
  def labelPropagation(nodes: DataFrame, idCol: String, edges: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b",
      iterations: Int = 5, maxDriverEdges: Int = 5000000): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    // SIZE-GATED DRIVER FAST PATH (the connectedComponents precedent):
    // synchronous LPA with the (count desc, label asc) argmax is a
    // pure integer function of the flow list, so a sub-cap graph runs
    // the rounds on the driver instead of 5 × (join + agg + window +
    // join + checkpoint). Faithfulness details: label flows b → a with
    // EDGE MULTIPLICITY (the distributed count is over the raw
    // symmetric frame); only flows whose SOURCE b is a labeled node
    // count (the join against `labels`), enforced by the same
    // left-semi before the collect; endpoints outside `nodes` may
    // evolve a scratch label but are never emitted (the emit is a
    // broadcast remap of `nodes`, the left-join-from-labels
    // equivalent); null endpoints never join distributedly and are
    // filtered here. Above the cap or non-integral ids: the iterative
    // loop, unchanged.
    // gate: node AND edge columns must share ONE integral type — a
    // Long edge endpoint outside Int range would WRAP when the final
    // map casts back to an IntegerType id column (colliding with a
    // real node id under non-ANSI semantics); mixed-typed graphs fall
    // back to the iterative loop instead
    val idT = nodes.schema(idCol).dataType
    if ((idT == org.apache.spark.sql.types.LongType ||
        idT == org.apache.spark.sql.types.IntegerType) &&
        edges.schema(aCol).dataType == idT &&
        edges.schema(bCol).dataType == idT) {
      val spark0 = nodes.sparkSession
      import spark0.implicits._
      val flows: Array[(Long, Long)] = edges
        .select(col(aCol).as("a"), col(bCol).as("b"))
        .unionAll(edges.select(col(bCol).as("a"), col(aCol).as("b")))
        .filter(col("a").isNotNull && col("b").isNotNull)
        .join(nodes.select(col(idCol).as("b")), Seq("b"), "left_semi")
        .select(col("a").cast("long"), col("b").cast("long"))
        .as[(Long, Long)]
        .limit(maxDriverEdges + 1).collect()
      if (flows.length <= maxDriverEdges) {
        val labels = new java.util.HashMap[Long, Long]()
        flows.foreach { case (a, _) =>
          if (!labels.containsKey(a)) labels.put(a, a)
        }
        var i = 0
        while (i < iterations) {
          // synchronous round: counts read the PREVIOUS labels only
          val counts =
            new java.util.HashMap[Long, java.util.HashMap[Long, Long]]()
          flows.foreach { case (a, b) =>
            val bl = labels.getOrDefault(b, b)
            counts.computeIfAbsent(a, _ => new java.util.HashMap())
              .merge(bl, 1L, _ + _)
          }
          val next = new java.util.HashMap[Long, Long](labels)
          counts.forEach { (a, m) =>
            var bestLab = 0L; var bestC = -1L; var first = true
            m.forEach { (lab, c) =>
              if (first || c > bestC || (c == bestC && lab < bestLab)) {
                bestLab = lab; bestC = c; first = false
              }
            }
            next.put(a, bestLab)
          }
          labels.clear(); labels.putAll(next)
          i += 1
        }
        import scala.jdk.CollectionConverters._
        val mapDf = labels.entrySet().asScala.toSeq
          .map(e => (e.getKey.longValue(), e.getValue.longValue()))
          .filter { case (a, l) => a != l }
          .toDF("__id", "__lab")
          .select(col("__id").cast(idT).as("__id"),
            col("__lab").cast(idT).as("__lab"))
        return nodes.select(col(idCol).as("id"))
          .join(broadcast(mapDf), col("id") === col("__id"), "left")
          .select(col("id"), coalesce(col("__lab"), col("id")).as("lab"))
      }
    }
    val sym = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .unionAll(edges.select(col(bCol).as("a"), col(aCol).as("b")))
      .repartition(col("b")) // "b" is the per-round join key — partition
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def materialize(df: DataFrame): Unit = df.count(): Unit
      var labels = nodes.select(col(idCol).as("id"), col(idCol).as("lab"))
        .localCheckpoint(false)
      materialize(labels)
      var i = 0
      while (i < iterations) {
        val nbrTop = sym
          .join(labels.select(col("id").as("b"), col("lab").as("nl")), "b")
          .groupBy(col("a"), col("nl")).agg(count(lit(1)).as("c"))
          .withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("a")
              .orderBy(col("c").desc, col("nl"))))
          .filter(col("__rn") === 1)
          .select(col("a").as("id"), col("nl"))
        val next = labels
          .join(nbrTop, Seq("id"), "left")
          .select(col("id"), coalesce(col("nl"), col("lab")).as("lab"))
          .localCheckpoint(false)
        materialize(next)
        org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(labels)
        labels = next
        i += 1
      }
      labels
    } finally sym.unpersist(blocking = false)
  }

  /** Substring-level duplication report via winnowing fingerprints
    * (functions/WinnowExprs.scala; Schleimer et al., SIGMOD 2003) —
    * the substring-granular sibling of [[dedupSpansAcrossCorpus]]:
    * span dedup catches repeated PARAGRAPHS (delimiter-aligned);
    * this catches repeated substrings at ANY offset, the signal the
    * substring-dedup training-data pipelines (Lee et al. 2022) act
    * on. Guarantee inherited from winnowing: any substring of
    * >= k + w - 1 codepoints shared by two documents shares at least
    * one selected anchor gram, so `n_dup_grams > 0` is a complete
    * detector at that threshold.
    *
    * Per document: `n_grams` distinct anchor k-grams, `n_dup_grams`
    * of them appearing in >= 2 distinct documents corpus-wide,
    * `dup_frac` their ratio (floor-rounded to 6 decimals). Documents
    * shorter than k codepoints produce no anchors and no output row.
    *
    * Scale shape — exact-dedup-first like every featurizing operator
    * here: anchors are computed once per DISTINCT text (O(|text|)
    * codegen'd expression, in-row `array_distinct`), gram document
    * frequencies are recovered EXACTLY by multiplicity weighting
    * (every twin holds the same anchor set, so distinct-doc counts
    * are sums of rep multiplicities), and the per-rep report
    * re-expands through one narrow hash join. Two corpus-linear
    * shuffles total (gram frequency, per-rep rollup) — anchors are
    * ~2/(w+1) of positions, 8-char strings, and nothing ever pairs
    * documents.
    */
  def duplicateSubstringReport(df: DataFrame, idCol: String,
      textCol: String, k: Int = 8, w: Int = 4): DataFrame = {
    // CONVENTION (repo-wide, all md5(coalesce(text,'')) sites): null
    // text and empty string DELIBERATELY share one group. Both
    // featurize to zero grams/shingles under every featurizer in this
    // repo, so the collapse is behavior-neutral today; any future
    // featurizer that distinguishes them (e.g. a null-aware token)
    // must re-key on a tagged value instead of coalesce.
    val docs = df.select(col(idCol), col(textCol).as("__txt"))
      .withColumn("__h", md5(coalesce(col("__txt"), lit(""))))
    val docsP = graft.HeavyPersist(docs)
    val mult = docsP.groupBy(col("__h")).agg(count(lit(1)).as("__m"))
    val reps = docsP.groupBy(col("__h")).agg(first(col("__txt")).as("__txt"))
    // distinct anchor grams per distinct text; two consumers below
    val repGrams = graft.HeavyPersist(
      reps.select(col("__h"), explode(array_distinct(
          graft.functions.WinnowExprs.winnowGrams(col("__txt"), k, w)))
        .as("gram")), freshScope = false)
    // corpus-wide distinct-document frequency per gram: exact via
    // multiplicity sums. No broadcast hint — mult is distinct-text-
    // sized (NOT bounded at corpus scale), but it and repGrams both
    // descend from a groupBy(__h), so the join reuses that hash
    // partitioning instead of shuffling either side again
    val gramDf = repGrams.join(mult, Seq("__h"))
      .groupBy(col("gram")).agg(sum(col("__m")).as("__nd"))
    val perRep = repGrams.join(gramDf, Seq("gram"))
      .groupBy(col("__h"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__nd") > 1, 1L).otherwise(0L)).as("n_dup_grams"))
    docsP.join(perRep, Seq("__h"))
      .select(col(idCol), col("n_grams"), col("n_dup_grams"),
        (floor(col("n_dup_grams").cast("double") / col("n_grams") * 1e6)
          / 1e6).as("dup_frac"))
  }

  private val wnIdxCache = new graft.SessionCache[String]

  /** One-time winnow-anchor index of a corpus — the substring-grain
    * sibling of [[minhashBucketIndex]], persisted as a catalog table
    * bucketed on `gram` so DELTA INGESTION probes it without scanning
    * or reshuffling the corpus. One row per distinct anchor k-gram:
    * (gram, nd) where `nd` is the gram's distinct-document frequency
    * (exact via multiplicity weighting — twins featurize once). The
    * index is anchor-vocabulary-sized: ~2/(w+1) of corpus positions
    * collapse onto distinct 8-char strings, orders of magnitude below
    * corpus text volume. Built once per (session, spec) and memoized.
    */
  def winnowAnchorIndex(df: DataFrame, idCol: String, textCol: String,
      spec: String, k: Int = 8, w: Int = 4, numBuckets: Int = 16): String = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$spec/$k/$w/$numBuckets".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    val name = s"graft_wnidx_$hex"
    wnIdxCache.get(df.sparkSession, name) {
      val spark = df.sparkSession
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), name)
      val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(loc)) fs.delete(loc, true)
      val docs = df.select(col(idCol), col(textCol).as("__txt"))
        .withColumn("__h", md5(coalesce(col("__txt"), lit(""))))
      // one aggregation carries both the representative text and the
      // multiplicity, so the exact distinct-doc frequency per gram is
      // one rep-sized explode + one gram shuffle
      val grams = docs.groupBy(col("__h"))
        .agg(first(col("__txt")).as("__txt"), count(lit(1)).as("__m"))
        .select(col("__m"), explode(array_distinct(
          graft.functions.WinnowExprs.winnowGrams(col("__txt"), k, w)))
          .as("gram"))
        .groupBy(col("gram")).agg(sum(col("__m")).as("nd"))
      // co-partition onto the bucket hash before the bucketed write:
      // repartition(n, key) and bucketBy(n, key) share Murmur3 hash
      // partitioning, so each writer task holds exactly one bucket —
      // 16 files, not (shuffle-width x buckets) tiny ones
      graft.sources.Layout.writeBucketed(
        grams.repartition(numBuckets, col("gram")), name, Seq("gram"),
        numBuckets)
      name
    }
  }

  /** Probe a new batch against a [[winnowAnchorIndex]] table:
    * per delta document, how many of its anchor k-grams already exist
    * anywhere in the indexed corpus — the substring-level delta
    * screen (is tonight's crawl mostly re-crawled text?), sibling of
    * [[nearDupCandidatesAgainstIndex]]'s document-level probe.
    * Output: (idCol, n_grams, n_hit_grams, hit_frac), hit_frac
    * floor-rounded to 6 decimals; documents shorter than k produce
    * no row.
    *
    * Scale shape: exact-dedup-first on the delta (one rep per
    * content hash probes; members re-expand through a narrow hash
    * join), and the probe join reads the gram-bucketed index without
    * shuffling it — only delta anchors move.
    *
    * CRASH IDEMPOTENCE: a PURE frame transform — no persisted
    * state is mutated; re-running a died job recomputes the same
    * frame (run-twice ≡ run-once), and whatever sink publishes the
    * result owns its own atomicity (the engine's convention:
    * versioned snapshot dirs or batch-identity partitions).
    */
  def substringDupAgainstIndex(newDf: DataFrame, idCol: String,
      textCol: String, indexTable: String, k: Int = 8,
      w: Int = 4): DataFrame = {
    val idx = newDf.sparkSession.table(indexTable)
    val docs = newDf.select(col(idCol), col(textCol).as("__txt"))
      .withColumn("__h", md5(coalesce(col("__txt"), lit(""))))
    val docsP = graft.HeavyPersist(docs)
    val repGrams = docsP.groupBy(col("__h"))
      .agg(first(col("__txt")).as("__txt"))
      .select(col("__h"), explode(array_distinct(
        graft.functions.WinnowExprs.winnowGrams(col("__txt"), k, w)))
        .as("gram"))
    val perRep = repGrams
      .join(idx.select(col("gram"), lit(1).as("__hit")), Seq("gram"), "left")
      .groupBy(col("__h"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__hit").isNotNull, 1L).otherwise(0L))
          .as("n_hit_grams"))
    docsP.join(perRep, Seq("__h"))
      .select(col(idCol), col("n_grams"), col("n_hit_grams"),
        (floor(col("n_hit_grams").cast("double") / col("n_grams") * 1e6)
          / 1e6).as("hit_frac"))
  }
}
