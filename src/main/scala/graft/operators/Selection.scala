package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-SELECTION operators for training-data pipelines (extended
  * surface beyond the reference, like [[Sampling]] and [[Dedup]]):
  * hashed-n-gram importance reweighting (the DSIR recipe, Xie et al.
  * NeurIPS'23), deterministic fill-in-the-middle splits (Bavarian et
  * al. '22), and deterministic MLM-style token masking. Everything is
  * keyed on md5 of row content — the [[Sampling]] determinism
  * contract: reproducible across runs, executors, partitionings, and
  * engines (the DuckDB oracle replays the exact same decisions).
  *
  * Float portability: importance weights are quantized to integer
  * micro-units IN THE BOUNDED WEIGHT TABLE (256 rows), and per-doc
  * scores are integer sums of those micro-units — summation order can
  * never change the result, in either engine.
  */
object Selection {

  /** TRAINING-SHARD EXPORT PLAN: deterministically shuffle the corpus
    * (md5-of-content order — the [[Sampling]] determinism contract,
    * so a re-run or a different engine produces the identical plan)
    * and bin-pack documents into shards of ~`targetTokens` tokens in
    * that order — the step between "curated corpus" and "data-loader
    * files", where shards must be content-shuffled (no crawl-order
    * correlation inside a shard) and size-balanced (loader strides).
    *
    * Scale shape — the global running sum WITHOUT a global window
    * (a corpus-sized `Window.orderBy` collapses onto one partition,
    * the classic cumsum bottleneck): two-phase distributed cumsum —
    *
    *   1. range-repartition + sort within partitions on the shuffle
    *     key (Spark's distributed sort: partition i's keys all
    *     precede partition i+1's);
    *   2. per-partition token totals (one tiny agg — nPart rows) turn
    *     into prefix OFFSETS via a window over that bounded frame;
    *   3. each partition's local cumsum (parallel per-partition
    *     windows) plus its broadcast offset is the exact global
    *     cumsum. Shard boundaries are then a row-local integer
    *     division — boundary-placement does not depend on where the
    *     range partitioner happened to split, so the plan is
    *     deterministic even though sampled partition bounds are not.
    *
    * Output: (id, ntok, shard), shard = ⌊(cum − ntok)/target⌋ — a doc
    * starts the shard its first token lands in; every shard except
    * the last carries ≥ targetTokens.
    */
  def shardPlan(df: DataFrame, idCol: String, textCol: String,
      targetTokens: Long, nPart: Int = 32): DataFrame = {
    require(targetTokens > 0, s"targetTokens must be positive: $targetTokens")
    import org.apache.spark.sql.expressions.Window
    val x = df.select(col(idCol).as("id"), md5(col(textCol)).as("__h"),
      size(TextAnalysis.wsTokens(col(textCol))).cast("long").as("ntok"))
    // persisted: the offsets agg and the final join must see the SAME
    // physical partitioning (range boundaries are sampled; two
    // independent computations could split differently)
    val ordered = graft.HeavyPersist(
      x.repartitionByRange(nPart, col("__h"), col("id"))
        .sortWithinPartitions("__h", "id")
        .withColumn("__pid", org.apache.spark.sql.functions
          .spark_partition_id()))
    val offsets = ordered.groupBy("__pid")
      .agg(sum(col("ntok")).as("__psum"))
      .withColumn("__off", coalesce(sum(col("__psum")).over(
        Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    val local = Window.partitionBy("__pid").orderBy("__h", "id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ordered.join(broadcast(offsets), "__pid")
      .withColumn("__cum", col("__off") + sum(col("ntok")).over(local))
      .select(col("id").as(idCol), col("ntok"),
        ((col("__cum") - col("ntok")) / lit(targetTokens))
          .cast("long").as("shard"))
  }

  /** 2-D Pareto frontier (skyline): the rows not dominated on two
    * maximize-criteria — multi-criteria data selection (e.g. keep
    * documents no other document beats on BOTH length and lexical
    * diversity). `p` dominates `q` iff px ≥ qx ∧ py ≥ qy with at
    * least one strict; exact ties on (x, y) dominate neither way, so
    * both survive.
    *
    * Shape — the distributed sort-sweep, fully declarative (never the
    * O(n²) dominance self-join):
    *   1. group by x, keep max(y) per x — a distributed partial-agg
    *      shuffle; within an x-group only max-y rows can survive
    *      (anything lower is dominated by the group max, strict in y).
    *   2. sweep the per-x frame: a point's x-group survives iff its
    *      gy exceeds the running max of gy over all STRICTLY greater
    *      x (otherwise some higher-x point has ≥ its y, strict in x).
    *      The unpartitioned window runs over |distinct x| rows — the
    *      aggregate frame, not the data; for continuous x at 100 TB,
    *      pre-bucket x and sweep bucket maxima the same way.
    *   3. broadcast-semi-join the surviving (x, gy) pairs (≤ skyline
    *      size, bounded small) back onto the full frame to recover
    *      every tied row.
    */
  def skyline2d(df: DataFrame, idCol: String, xCol: String,
      yCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("x").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // dominance is undefined on null coordinates — exclude such rows
    // up front rather than let a null x-group ride the sweep with
    // null comparisons (which would drop it SILENTLY, the worse kind
    // of exclusion)
    val clean = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val frontier = clean.groupBy(col(xCol).as("x"))
      .agg(max(col(yCol)).as("gy"))
      .withColumn("__prevmax", max(col("gy")).over(w))
      .filter(col("__prevmax").isNull || col("gy") > col("__prevmax"))
      .select(col("x"), col("gy"))
    df.join(broadcast(frontier),
        df(xCol) === frontier("x") && df(yCol) === frontier("gy"), "left_semi")
      .select(col(idCol), col(xCol), col(yCol))
  }

  /** DSIR-style hashed importance weights: score every document by
    * how target-like its hashed unigram distribution is.
    *
    * Features are words hashed to 256 buckets (md5, engine-portable);
    * the per-bucket importance is the smoothed log-likelihood ratio
    *   λ_b = ln((t_b + ½)/(T + B/2)) − ln((r_b + ½)/(R + B/2))
    * between the target slice (`isTarget`) and the rest of the corpus,
    * and a document's score is the MEAN λ of its tokens — the
    * importance-sampling log-weight a selection pass ranks by.
    *
    * Scale shape: one corpus token scan partial-aggregates into the
    * 256-row bucket frame (never wider); λ is quantized there to
    * integer micro-units (`lam6`), so the per-doc score is an exact
    * integer sum — one map-side-combined shuffle on doc id. The
    * weight table reaches the token stream as a broadcast join. No
    * step is wider than (distinct buckets) except the per-doc agg.
    *
    * Output: (id, n_toks, score) with score floor-rounded at 6
    * decimals, plus the raw `lam6` sum for exact downstream cuts.
    */
  def dsirScores(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    val toks = df
      .select(col(idCol), isTarget.as("__tgt"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .select(col(idCol), col("__tgt"),
        Sampling.md5Bucket256(col("w"), 1).as("b"))
    val buckets = toks
      .groupBy("b")
      .agg(sum(when(col("__tgt"), 1L).otherwise(0L)).as("t"),
        sum(when(col("__tgt"), 0L).otherwise(1L)).as("r"))
    val totals = buckets.agg(sum(col("t")).as("__T"), sum(col("r")).as("__R"))
    val lam = buckets.crossJoin(broadcast(totals))
      .select(col("b"),
        floor((log((col("t") + 0.5) / (col("__T") + 128.0)) -
          log((col("r") + 0.5) / (col("__R") + 128.0))) * 1e6 + 0.5)
          .cast("long").as("lam6"))
    toks.join(broadcast(lam), "b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"), sum(col("lam6")).as("lam6_sum"))
      .select(col(idCol), col("n_toks"), col("lam6_sum"),
        (floor(col("lam6_sum").cast("double") / col("n_toks") + 0.5) / 1e6)
          .as("score"))
  }

  /** Four md5 hex chars of `key` starting at 1-based `off` as an
    * integer 0..65535 — the 16-bit sibling of
    * [[Sampling.md5Bucket256]], for decisions that need finer grain
    * than 256ths (e.g. a cut point modulo a document length).
    */
  def md5Bucket65536(key: Column, off: Int = 1): Column = {
    require(off >= 1 && off <= 29, s"off must leave four hex chars, got $off")
    conv(substring(md5(key), off, 4), 16, 10).cast("long")
  }

  /** Deterministic fill-in-the-middle split: two content-keyed cut
    * points c₁, c₂ ∈ [0, n] (16-bit md5 draws mod n+1) partition each
    * document's character range into prefix |middle| suffix — the FIM
    * data transform, reproducible across engines and re-ingestion.
    * Narrow (zero shuffle): every output is arithmetic on the row.
    * Output: (id, prefix_len, middle_len, suffix_len).
    */
  def fimSplit(df: DataFrame, idCol: String, nCharsCol: String): DataFrame = {
    val key = col(idCol).cast("string")
    val c1 = md5Bucket65536(key, 1) % (col(nCharsCol) + 1L)
    val c2 = md5Bucket65536(key, 5) % (col(nCharsCol) + 1L)
    df.select(col(idCol),
      least(c1, c2).as("prefix_len"),
      (greatest(c1, c2) - least(c1, c2)).as("middle_len"),
      (col(nCharsCol) - greatest(c1, c2)).as("suffix_len"))
  }

  /** Greedy token-budget fill (the curriculum/mixture admission step):
    * rank groups by a quality score — mean chars per document, held as
    * EXACT integer micro-units (sum·10⁶ div n) so both engines rank
    * identically with no float ties — and admit whole groups in rank
    * order while the running token total before the group stays under
    * `budget`. One group-level agg (map-side combined), then windows
    * over the bounded per-group frame. Output:
    * (group, rank, toks, cum_toks, selected).
    */
  def budgetFill(df: DataFrame, groupCol: Column, textCol: String,
      nCharsCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    import org.apache.spark.sql.expressions.Window
    val per = df
      .select(groupCol.as("group"), col(nCharsCol),
        size(TextAnalysis.wsTokens(col(textCol))).as("__nt"))
      .groupBy("group")
      .agg(sum(col("__nt")).as("toks"), count(lit(1)).as("n"),
        sum(col(nCharsCol)).as("__chars"))
      .withColumn("__score",
        expr("(__chars * 1000000) div n"))
    val order = Window.orderBy(col("__score").desc, col("group"))
    per
      .withColumn("rank", row_number().over(order))
      .withColumn("cum_toks", sum(col("toks")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("selected", col("cum_toks") - col("toks") < budget)
      .select(col("group"), col("rank"), col("toks"), col("cum_toks"),
        col("selected"))
  }

  /** Deterministic MLM-style masking plan: token at position p of
    * document d is masked iff md5(d#p) falls under `rate256`/256
    * (default 38 ≈ the BERT 15%). Per-document mask counts come back
    * from one map-side-combined agg over the exploded token stream;
    * the mask decision itself is positional content hashing, so the
    * same document always yields the same mask — reproducible
    * pre-training data, and the oracle replays every decision.
    * Output: (id, n_tokens, n_masked, mask_ratio).
    */
  def maskPlan(df: DataFrame, idCol: String, textCol: String,
      rate256: Int = 38): DataFrame = {
    require(rate256 >= 0 && rate256 <= 256, s"rate256 out of range: $rate256")
    val masked = Sampling.md5Bucket256(
      concat(col(idCol).cast("string"), lit("#"), col("pos").cast("string")),
      1) < rate256
    df.select(col(idCol),
        posexplode(TextAnalysis.wsTokens(col(textCol))).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(masked, 1L).otherwise(0L)).as("n_masked"))
      .select(col(idCol), col("n_tokens"), col("n_masked"),
        (floor(col("n_masked").cast("double") / col("n_tokens") * 1e6 + 0.5)
          / 1e6).as("mask_ratio"))
  }

  /** Multinomial Naive Bayes source classifier, trained and scored in
    * one distributed program — the classic quality/provenance filter
    * shape (a CCNet/GPT-3-style corpus classifier, with NB counts in
    * place of fastText embeddings): train per-class word
    * log-likelihoods with Laplace smoothing, score every document,
    * predict the argmax class.
    *
    *   score(d, c) = ln P(c) + Σ_w n_dw · ln((n_cw + 1)/(N_c + V))
    *
    * Float portability: every log-probability is quantized to integer
    * micro-units IN THE BOUNDED WEIGHT TABLE (vocab × classes rows),
    * so per-doc scores are exact integer sums — the argmax (ties →
    * lexicographically smallest class) is deterministic in any
    * summation order, and the DuckDB oracle replays every prediction.
    *
    * Scale shape — exact-dedup-first (the graft-wide convention, cf.
    * [[Dedup]]'s nearDupPairsVerified): the token program runs at
    * DISTINCT-TEXT size, not corpus size. Real corpora are twin-heavy
    * (web crawls commonly exceed 30% exact duplicates; the ScaleUp
    * twin stress makes every doc a 100-way twin), and for exact twins
    * both sides of NB are literal repeats — training counts obey
    * n_cw = Σ_h m(h,c)·n_hw and every twin of a text scores
    * identically — so documents group by content hash once, one
    * representative per hash is tokenized and scored, class counts
    * are recovered EXACTLY by multiplicity weighting (integer
    * identity, not an approximation), and predictions re-expand to
    * documents with one narrow hash join at the end. One rep-token
    * scan feeds both the per-text term counts and the (class, word)
    * training counts (map-side-combined aggs); the dense vocab ×
    * classes weight table is vocabulary-sized metadata that reaches
    * the rep-term stream as a broadcast join (AQE picks broadcast;
    * the fan-out per term row is exactly the class count).
    * Vocabulary totals ride along as 1-row broadcast frames — the
    * fact path never collects. For an unbounded vocabulary, compose
    * with [[dsirScores]]-style feature hashing to pin the table size;
    * here the table is the exact NB model.
    *
    * Output: (id, `classCol`, predicted, score6) — actual class kept
    * alongside the prediction so a confusion matrix is one groupBy
    * away. Zero-token-document policy: a document whose text
    * tokenizes to no words has no features to score and is DROPPED
    * from the output (row count may be less than the input's); the
    * oracle mirrors this. Callers needing every input row back
    * left-join the result on `idCol`.
    */
  def naiveBayes(df: DataFrame, idCol: String, textCol: String,
      classCol: String): DataFrame = {
    // group documents by content hash; all token work below runs per
    // distinct text (md5 equality as content equality — the repo-wide
    // dedup convention)
    val docs = df.select(col(idCol), col(classCol).as("__cls"),
        col(textCol).as("__txt"))
      .withColumn("__h", md5(coalesce(col("__txt"), lit(""))))
    val docsP = graft.HeavyPersist(docs)
    // (hash, class) multiplicities: the exact weights that recover
    // full-corpus class counts and priors from per-rep counts
    val grpCls = docsP.groupBy(col("__h"), col("__cls"))
      .agg(count(lit(1)).as("__m"))
    // one representative text per hash (members are identical by md5)
    val reps = docsP.groupBy(col("__h"))
      .agg(first(col("__txt")).as("__txt"))
    val tok = reps
      .select(col("__h"), explode(TextAnalysis.wsTokens(col("__txt"))).as("w"))
      .filter(col("w") =!= "")

    // per-distinct-text term counts (the scoring side, rep-sized)
    val hw = graft.HeavyPersist(tok.groupBy(col("__h"), col("w"))
      .agg(count(lit(1)).as("n_hw")), freshScope = false)
    // per-class term counts + totals (the training side): the
    // multiplicity-weighted sum is integer-identical to counting
    // tokens over every document. Persisted alongside docsP/hw
    // (freshScope=false appends to the registry) AND materialized
    // EAGERLY: four consumers derive from this frame (class totals,
    // vocab size, the vocab itself, the weight join), and a
    // lazily-cached frame with N same-action consumers races — each
    // stage recomputes the token aggregation before the cache lands
    // (measured 32 → 12 s on the whole operator at the sf1
    // rehearsal). Eager materialization is safe exactly here because
    // the frame is the MODEL: classes × vocab rows, consumed densely
    // — there is no downstream pushdown to defeat (the
    // HeavyPersist-stays-lazy rule is for corpus frames). hw
    // populates inside this same job, so the scoring join reads it
    // cached too.
    val cw = graft.HeavyPersist(
      hw.join(grpCls, Seq("__h"))
        .groupBy(col("__cls"), col("w"))
        .agg(sum(col("__m") * col("n_hw")).as("n_cw")), freshScope = false)
    cw.count()
    val classTotals = cw.groupBy(col("__cls"))
      .agg(sum(col("n_cw")).as("n_c"))
    val vocabSize = cw.select(col("w")).distinct()
      .agg(count(lit(1)).as("v"))
    val priors = grpCls.groupBy(col("__cls"))
      .agg(sum(col("__m")).as("n_docs"))
    val docsTotal = grpCls.agg(sum(col("__m")).as("n_docs_tot"))

    // dense vocab × classes weight table: unseen (class, word) pairs
    // get the Laplace floor 1/(N_c + V); log-probs quantized to
    // integer micro-units here, in the bounded model frame
    val vocab = cw.select(col("w")).distinct()
    val weights = vocab
      .crossJoin(classTotals)
      .crossJoin(vocabSize)
      .join(cw, Seq("w", "__cls"), "left")
      .select(col("w"), col("__cls"),
        floor(log((coalesce(col("n_cw"), lit(0L)) + 1.0) /
          (col("n_c") + col("v"))) * 1e6 + 0.5).cast("long").as("w6"))
    val prior6 = priors.crossJoin(docsTotal)
      .select(col("__cls"),
        floor(log(col("n_docs").cast("double") / col("n_docs_tot")) * 1e6
          + 0.5).cast("long").as("p6"))

    // score every DISTINCT text against every class (exact integer
    // sums), argmax per text, then re-expand to documents: a twin
    // scores identically to its representative by construction
    val scored = hw
      .join(weights, Seq("w"))
      .groupBy(col("__h"), col("__cls"))
      .agg(sum(col("n_hw") * col("w6")).as("l6"))
      .join(prior6, Seq("__cls"))
      .select(col("__h"), col("__cls"),
        (col("l6") + col("p6")).as("score6"))
    val best = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h")).orderBy(col("score6").desc, col("__cls").asc)
    val pred = scored
      .withColumn("__rn", row_number().over(best))
      .filter(col("__rn") === 1)
      .select(col("__h"), col("__cls").as("__pred"), col("score6"))
    // inner join drops zero-token documents (no hw rows for their
    // hash) — the declared policy above, unchanged
    docsP
      .join(pred, Seq("__h"))
      .select(col(idCol), col("__cls").as(classCol),
        col("__pred").as("predicted"), col("score6"))
  }

  /** Z-ORDER TABLE LAYOUT PLAN + pruning audit: assign every row to a
    * target file by the Morton interleave of two bucketized
    * dimensions ([[graft.functions.BitExprs.mortonInterleave]]), then
    * report per-file row counts and min/max statistics for BOTH
    * dimensions plus the verdict of a declared range predicate
    * against those stats — the data-layout decision that at 100 TB
    * decides whether a two-dimensional scan reads 2% of files or all
    * of them (a single-column sort layout prunes one dimension
    * perfectly and the other not at all; the Z-curve alternates bits
    * so BOTH dimensions land in bounded per-file ranges).
    *
    * Scale shape: one projection computes z (a 2·bits-term integer
    * sum, whole-stage codegen) and file_id (z >> fileShift — the top
    * 2·bits−fileShift bits, i.e. 2^(2·bits−fileShift) files); one
    * partial-aggregated groupBy(file_id) produces the bounded stats
    * frame. Nothing shuffles except the (file count)-sized aggregate.
    * An actual rewrite would `repartitionByRange(z)` and write; the
    * plan frame here is the audit that makes that decision, so the
    * oracle can hash-check it.
    *
    * `xb`/`yb` must already be buckets in [0, 2^bits); `prune_x` = 1
    * iff the file's x-range misses [predXLo, predXHi] entirely (the
    * min/max skip-scan rule), likewise `prune_y`.
    */
  def zorderLayout(df: DataFrame, xb: Column, yb: Column,
      bits: Int = 10, fileShift: Int = 14,
      predXLo: Long = 0L, predXHi: Long = 0L,
      predYLo: Long = 0L, predYHi: Long = 0L): DataFrame = {
    require(fileShift >= 0 && fileShift < 2 * bits,
      s"fileShift must be in [0, ${2 * bits}), got $fileShift")
    val z = graft.functions.BitExprs.mortonInterleave(xb, yb, bits)
    df.select(xb.cast("long").as("__x"), yb.cast("long").as("__y"),
        shiftright(z, fileShift).as("file_id"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__x")).as("min_x"), max(col("__x")).as("max_x"),
        min(col("__y")).as("min_y"), max(col("__y")).as("max_y"))
      .withColumn("prune_x",
        (col("max_x") < predXLo || col("min_x") > predXHi).cast("int"))
      .withColumn("prune_y",
        (col("max_y") < predYLo || col("min_y") > predYHi).cast("int"))
      .orderBy(col("file_id"))
  }
}
