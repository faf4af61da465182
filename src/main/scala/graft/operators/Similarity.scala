package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over `array<float>` columns
  * (testdata `embeddings.parquet`; SURVEY.md §2.10 extended surface).
  *
  * All vector math is native Catalyst expressions (`zip_with` /
  * `aggregate` / `transform`) — codegen'd, no UDFs, so the scan stays
  * inside whole-stage codegen and scales by partitions. Top-k uses
  * `orderBy(...).limit(k)`, which Spark plans as TakeOrderedAndProject:
  * a bounded per-partition heap + driver merge, no global sort — the
  * only safe form at 100 TB.
  */
object Similarity {

  private def toDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Dot product of two array-typed columns (float/double elements) —
    * a single-pass custom expression (VectorExprs): the lambda
    * `zip_with`+`aggregate` form is interpreted with per-element tree
    * overhead that dominates at pair-join cardinalities. Accumulation
    * order (sequential, double) is unchanged, so oracle parity holds.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.vecDot(a, b)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe via NaN for zero vectors left to the
    * caller (synthetic embeddings are non-zero).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine against one query vector: the exact
    * baseline. One scan, one TakeOrderedAndProject — at scale this is
    * shuffle-free except the final k-row merge on the driver.
    */
  def bruteForceTopK(corpus: DataFrame, embCol: String, idCol: String,
      query: Seq[Double], k: Int): DataFrame =
    corpus.select(col(idCol), scoreAgainst(col(embCol), query).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** Cosine vs a constant query vector. Lambda aggregates don't
    * constant-fold, so the plan would otherwise recompute the query's
    * own norm per ROW (visible in explain as an aggregate over the
    * literal array) — normalize the query once on the driver instead
    * and divide only by the corpus vector's norm.
    */
  private def scoreAgainst(v: Column, query: Seq[Double]): Column = {
    val qn = math.sqrt(query.map(x => x * x).sum)
    val qu = if (qn == 0) query else query.map(_ / qn)
    round(dot(v, typedlit(qu)) / norm(v), 6)
  }

  /** All near-duplicate embedding pairs within blocking groups:
    * self-join on `blockCol` (standard entity-resolution blocking — at
    * scale the block is an LSH bucket or cluster id), score with
    * cosine, keep pairs ≥ threshold. Norms are materialized per row
    * BEFORE the join so each pair pays one dot product, not two norm
    * recomputations; formula mirrors the DuckDB oracle
    * (dot / (na·nb)) for 6-decimal parity.
    *
    * Adversarial-skew guard (same shape as
    * [[Dedup.minhashCandidatePairs]]): the self-join is quadratic in
    * DISTINCT vectors per block (identical vectors are deduped first
    * and only expand the output), so one hot blocking key (a
    * boilerplate cluster, a default label) would dominate the whole
    * job at 100 TB. Blocks above `maxBlockSize` distinct vectors are
    * excluded from pairing — an oversize block means the blocking key
    * is too coarse for pairwise scoring and should be split (finer
    * LSH — see SimilaritySpec's srpBucket-blocking test). The size
    * count rides the same shuffle partitioning the join needs.
    */
  def blockedNearDupPairs(corpus: DataFrame, embCol: String, idCol: String,
      blockCol: String, threshold: Double,
      maxBlockSize: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = toDouble(col(embCol))
    // identical-vector dedup first (same canonical order as
    // Dedup.nearDupPairsVerified): score once per distinct vector pair,
    // expand to members after. Re-crawled/mirrored corpora carry many
    // bit-identical embeddings; without this they multiply the
    // quadratic pairing, with it they only multiply the OUTPUT. The
    // block-size cap therefore guards the real quadratic driver —
    // DISTINCT vectors per block.
    val grouped = corpus
      .select(col(idCol).as("id"), col(blockCol).as("blk"), v.as("v"))
      .withColumn("gid", min(col("id")).over(
        Window.partitionBy(col("blk"), col("v"))))
    val members = grouped.select(col("id"), col("gid"))
    val reps = grouped.filter(col("id") === col("gid"))
      .select(col("gid"), col("blk"), col("v"), norm(col("v")).as("nrm"))
      .withColumn("__bsz", count(lit(1)).over(Window.partitionBy("blk")))
      .filter(col("__bsz") <= maxBlockSize).drop("__bsz")
    // join against the CAP-FILTERED reps: an excluded block loses its
    // identical pairs too, matching the oracle's whole-block exclusion
    val intra = Dedup.intraPairs(members)
      .join(reps.select(col("gid"),
        round(dot(col("v"), col("v")) / (col("nrm") * col("nrm")), 6)
          .as("score")), "gid")
      .select(col("id_a"), col("id_b"), col("score"))
    val repPairs = reps.as("a").join(reps.as("b"),
        col("a.blk") === col("b.blk") && col("a.gid") < col("b.gid"))
      .select(col("a.gid").as("ga"), col("b.gid").as("gb"),
        round(dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 6)
          .as("score"))
      .filter(col("score") >= threshold)
    intra.filter(col("score") >= threshold)
      .unionAll(Dedup.expandCross(repPairs, members, Seq("score")))
  }

  /** DBSCAN (Ester et al. 1996) over a precomputed ε-neighborhood
    * pair frame — the density-based clustering a curation pipeline
    * uses where k-means' fixed k and spherical cells misfit: mirror
    * families and boilerplate clouds are dense but irregularly
    * shaped, and true one-off documents should stay NOISE instead of
    * being forced into a nearest cluster.
    *
    * The ε-neighborhood relation comes in as `pairs` (id_a, id_b —
    * [[blockedNearDupPairs]] here; LSH-bucketed candidates at 100 TB),
    * so the operator is pure relational algebra on edges:
    *
    *   - |N_ε(p)| = symmetric degree + 1 (self), one partial-agg
    *     shuffle; CORE ⇔ |N_ε| ≥ minPts;
    *   - clusters = connected components of the core-core subgraph
    *     ([[Dedup.connectedComponents]] — min-label propagation,
    *     diameter-bounded rounds, checkpoint-truncated lineage);
    *     labels are the component's min id (deterministic);
    *   - BORDER points (non-core with ≥ 1 core neighbor) attach to
    *     their minimum core-neighbor cluster — the deterministic
    *     resolution of DBSCAN's classic border-tie ambiguity;
    *   - everything else is NOISE (null cluster).
    *
    * Output: one row per corpus id — (id, cluster, role ∈
    * core|border|noise).
    */
  def dbscan(corpus: DataFrame, idCol: String, pairs: DataFrame,
      minPts: Int): DataFrame = {
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    val sym = pairs.select(col("id_a").as("id"), col("id_b").as("nbr"))
      .unionAll(pairs.select(col("id_b").as("id"), col("id_a").as("nbr")))
    val core = sym.groupBy("id").agg((count(lit(1)) + 1).as("npts"))
      .filter(col("npts") >= minPts).select("id")
    val coreEdges = pairs
      .join(core.withColumnRenamed("id", "id_a"), Seq("id_a"), "left_semi")
      .join(core.withColumnRenamed("id", "id_b"), Seq("id_b"), "left_semi")
    val comp = Dedup.connectedComponents(core, "id", coreEdges)
      .withColumnRenamed("comp", "__ccl")
    // border: min cluster over CORE neighbors (the inner join against
    // comp keeps exactly the core ones), minus the cores themselves
    val border = sym
      .join(comp.select(col("id").as("nbr"), col("__ccl").as("__nc")),
        "nbr")
      .groupBy("id").agg(min(col("__nc")).as("__bcl"))
      .join(core, Seq("id"), "left_anti")
    corpus.select(col(idCol).as("id"))
      .join(comp, Seq("id"), "left")
      .join(border, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("__ccl"), col("__bcl")).as("cluster"),
        when(col("__ccl").isNotNull, lit("core"))
          .when(col("__bcl").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"))
  }

  /** IVF (inverted-file) approximate top-k — the other standard ANN
    * scale path: assign every vector to its nearest coarse centroid,
    * search only the `nProbe` cells nearest the query. Centroids here
    * are a deterministic sample of the corpus (first `nClusters` by
    * id, collected once — bounded metadata); production would train
    * k-means (MLlib is on the classpath) and persist assignments as a
    * partition column for cell-level partition pruning. Assignment is
    * one argmin expression over centroid distances — codegen-friendly,
    * no shuffle; the probe filter prunes the scored set ~nClusters/
    * nProbe-fold.
    */
  def ivfTopK(corpus: DataFrame, embCol: String, idCol: String,
      query: Seq[Double], k: Int, nClusters: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val centroids: Seq[Seq[Double]] = corpus.orderBy(col(idCol))
      .limit(nClusters)
      .select(col(embCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    ivfTopKWithCentroids(corpus, embCol, idCol, query, k, centroids, nProbe)
  }

  /** IVF with a trained coarse quantizer: k-means (MLlib) learns the
    * centroids, which fit real data density far better than sampling —
    * higher recall at the same nProbe. Seeded for reproducibility; the
    * model fit is one MLlib job over the corpus (done once at index
    * build, amortized over all queries).
    */
  def ivfTopKTrained(corpus: DataFrame, embCol: String, idCol: String,
      query: Seq[Double], k: Int, nClusters: Int = 16, nProbe: Int = 4,
      seed: Long = 42L): DataFrame = {
    val centroids = trainCentroids(corpus, embCol, nClusters, seed)
    ivfTopKWithCentroids(corpus, embCol, idCol, query, k, centroids, nProbe)
  }

  /** Learn `nClusters` k-means centroids over the embedding column.
    * Training runs on a deterministic sample capped at `maxTrainRows`:
    * a coarse quantizer needs only enough points to place `nClusters`
    * centers well (thousands, not billions) — at 100 TB fitting the
    * full corpus through 10 MLlib iterations would read it 10×, while
    * the cell ASSIGNMENT (one codegen'd argmin pass) still covers
    * every vector at index build.
    */
  def trainCentroids(corpus: DataFrame, embCol: String, nClusters: Int,
      seed: Long, maxTrainRows: Int = 4096): Seq[Seq[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // "is it big?" is probed with a BOUNDED count (limit reads at most
    // maxTrainRows + 1 rows — never a full corpus scan just to size a
    // fraction). Small corpora train as-is; larger ones take a
    // deterministic pseudo-random sample: order by a seeded hash of
    // the vector, take the first maxTrainRows — plans as
    // TakeOrderedAndProject (bounded per-partition heap + driver
    // merge), one pass, no shuffle, hash order approximating an
    // unbiased permutation
    val feats = corpus.select(
      array_to_vector(col(embCol).cast("array<double>")).as("features"))
    val sampled =
      if (corpus.limit(maxTrainRows + 1).count() <= maxTrainRows) feats
      else corpus
        .select(array_to_vector(col(embCol).cast("array<double>"))
          .as("features"),
          xxhash64(col(embCol), lit(seed)).as("__h"))
        .orderBy(col("__h"))
        .limit(maxTrainRows)
        .select(col("features"))
    new KMeans().setK(nClusters).setSeed(seed).setMaxIter(10)
      .fit(sampled).clusterCenters.map(_.toArray.toSeq).toSeq
  }

  private def ivfTopKWithCentroids(corpus: DataFrame, embCol: String,
      idCol: String, query: Seq[Double], k: Int,
      centroids: Seq[Seq[Double]], nProbe: Int): DataFrame = {
    def sq(c: Seq[Double]): Double = c.map(x => x * x).sum
    // |v-c|² = |v|² - 2 v·c + |c|²; |v|² is common to all cells → rank
    // by |c|² - 2 v·c only.
    val v = toDouble(col(embCol))
    val cells = centroids.zipWithIndex.map { case (c, i) =>
      struct((lit(sq(c)) - lit(2.0) * dot(v, typedlit(c))).as("d"),
        lit(i).as("i"))
    }
    val assigned = array_min(array(cells: _*)).getField("i")
    val qCell = centroids.zipWithIndex
      .map { case (c, i) =>
        (sq(c) - 2.0 * c.zip(query).map { case (a, b) => a * b }.sum, i)
      }
      .sortBy(_._1).take(nProbe).map(_._2)
    corpus.filter(assigned.isin(qCell: _*))
      .select(col(idCol), scoreAgainst(col(embCol), query).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Batch kNN join: top-k corpus neighbors for EVERY query vector at
    * once. The query set is bounded (broadcast); scoring is one
    * codegen'd pass over corpus × queries (BroadcastNestedLoopJoin —
    * never a shuffled cartesian), and per-query top-k uses the
    * bounded-heap [[graft.functions.TopKAgg]] aggregate, so each
    * partition ships at most k candidates per query into the final
    * merge — the grouped generalization of TakeOrderedAndProject. The
    * window form (`row_number ≤ k`) would shuffle every scored row.
    * Output: (qid, id, score), k rows per query.
    */
  def knnJoin(corpus: DataFrame, embCol: String, idCol: String,
      queries: DataFrame, queryEmbCol: String, queryIdCol: String,
      k: Int): DataFrame = {
    import graft.functions.TopKAgg
    val q = broadcast(queries.select(col(queryIdCol).as("qid"),
      toDouble(col(queryEmbCol)).as("qv"))
      .select(col("qid"), col("qv"), norm(col("qv")).as("qn")))
    val scored = corpus
      .select(col(idCol).as("id"), toDouble(col(embCol)).as("v"))
      .select(col("id"), col("v"), norm(col("v")).as("vn"))
      .crossJoin(q)
      .select(col("qid"), col("id"),
        round(dot(col("v"), col("qv")) / (col("vn") * col("qn")), 6)
          .as("score"))
      // rows with undefined similarity (null embedding, zero norm) are
      // DROPPED, not ranked: the heap's ordering contract requires
      // finite scores (see TopKAgg), and "no similarity" is the honest
      // reading of a degenerate vector
      .filter(col("score").isNotNull && !isnan(col("score")))
    scored.groupBy("qid")
      .agg(TopKAgg.topK(k)(col("id"), col("score")).as("top"))
      .select(col("qid"), explode(col("top")).as("s"))
      .select(col("qid"), col("s.id").as(idCol), col("s.score").as("score"))
  }

  /** Hard-negative mining for contrastive/retrieval training: for
    * each query vector, the k most similar corpus vectors that are
    * (a) a DIFFERENT class (`labelCol` ≠ the query's label — a
    * positive is never a negative) and (b) below the near-duplicate
    * ceiling (cosine ≤ `nearDupCeiling` — an unlabeled twin of the
    * query is a false negative, not a hard one). The canonical "mine
    * hard negatives per anchor" batch op.
    *
    * Same scale shape as [[knnJoin]]: bounded query set broadcast,
    * one codegen'd scoring pass (BroadcastNestedLoopJoin, never a
    * shuffled cartesian), label/ceiling filters applied IN that pass
    * before the bounded-heap [[graft.functions.TopKAgg]] per-query
    * top-k — each partition ships ≤ k candidates per query. The
    * ceiling compares the ROUNDED score (the engine's 6-decimal
    * similarity convention), so the cut is engine-portable.
    *
    * Null labels are three-valued-logic excluded on BOTH sides (a
    * null-label corpus row is never a negative; a null-label anchor
    * mines nothing) — matching the SQL `<>` the oracle runs.
    */
  def hardNegatives(corpus: DataFrame, embCol: String, idCol: String,
      labelCol: String, queries: DataFrame, k: Int,
      nearDupCeiling: Double): DataFrame = {
    import graft.functions.TopKAgg
    val q = broadcast(queries.select(col(idCol).as("qid"),
        toDouble(col(embCol)).as("qv"), col(labelCol).as("qlabel"))
      .select(col("qid"), col("qv"), col("qlabel"), norm(col("qv")).as("qn")))
    val scored = corpus
      .select(col(idCol).as("id"), toDouble(col(embCol)).as("v"),
        col(labelCol).as("lbl"))
      .select(col("id"), col("v"), col("lbl"), norm(col("v")).as("vn"))
      .crossJoin(q)
      .filter(col("lbl") =!= col("qlabel"))
      .select(col("qid"), col("id"),
        round(dot(col("v"), col("qv")) / (col("vn") * col("qn")), 6)
          .as("score"))
      .filter(col("score").isNotNull && !isnan(col("score")) &&
        col("score") <= nearDupCeiling)
    scored.groupBy("qid")
      .agg(TopKAgg.topK(k)(col("id"), col("score")).as("top"))
      .select(col("qid"), explode(col("top")).as("s"))
      .select(col("qid"), col("s.id").as(idCol), col("s.score").as("score"))
  }

  /** Greedy k-center coreset selection (farthest-point traversal,
    * Gonzalez 1985 — the 2-approximation): pick `k` maximally-diverse
    * representatives of an embedding corpus. The data-selection
    * primitive for "cover the distribution with a bounded sample"
    * (seeding clusters, picking eval probes, diversity-constrained
    * subset selection) — the opposite objective of top-k similarity.
    *
    * Round r selects the point whose min squared distance to the
    * already-selected set is LARGEST (rounded to the engine's
    * 6-decimal convention, ties by min id — both required for
    * cross-engine determinism, because the selection feeds the next
    * round). Seed = the min-id row.
    *
    * Scale shape: `k` is bounded (the selected set is driver metadata
    * of the IVF-codebook class), and each round is ONE codegen'd
    * corpus scan — the selected vectors ride as plan literals, min
    * distance is a [[graft.functions.VectorExprs.vecSqDist]] chain
    * under `least`, and the argmax is `orderBy().limit(1)` =
    * TakeOrderedAndProject (bounded per-partition heap + driver
    * merge; never a global sort). Total cost O(k·scan) with no
    * shuffle beyond the top-1 merges. For k beyond literal-plan
    * comfort (~hundreds), the published alternative is to keep a
    * persisted per-row running-min column updated once per round —
    * same scan count, state in the frame instead of the plan.
    *
    * Output: (`sel_rank` 1..k, idCol, `min_dist` — the rounded
    * selection-time distance, null for the seed).
    */
  def kcenterSelect(corpus: DataFrame, embCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import graft.functions.VectorExprs.vecSqDist
    val spark = corpus.sparkSession
    def r6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
    val base = corpus.select(col(idCol).cast("long").as("id"),
      toDouble(col(embCol)).as("v"))
    val seedRows = base.orderBy(col("id")).limit(1).collect()
    require(seedRows.nonEmpty, "kcenterSelect on an empty corpus")
    val seed = seedRows(0)
    val picked = scala.collection.mutable.ArrayBuffer(
      (seed.getLong(0), seed.getSeq[Double](1).toIndexedSeq,
        Option.empty[Double]))
    var exhausted = false
    while (picked.size < k && !exhausted) {
      val mind = picked.map { case (_, c, _) =>
        vecSqDist(col("v"), typedlit(c)) }.reduce(least(_, _))
      val next = base
        .filter(!col("id").isin(picked.map(_._1).toSeq: _*))
        .select(col("id"), col("v"), r6(mind).as("d"))
        .orderBy(col("d").desc, col("id"))
        .limit(1).collect()
      // k larger than the corpus: return the exhausted selection (every
      // point is a center) rather than failing on an empty argmax
      if (next.isEmpty) exhausted = true
      else picked += ((next(0).getLong(0),
        next(0).getSeq[Double](1).toIndexedSeq,
        Some(next(0).getDouble(2))))
    }
    import spark.implicits._
    picked.zipWithIndex
      .map { case ((id, _, d), i) => (i + 1, id, d) }.toSeq
      .toDF("sel_rank", idCol, "min_dist")
  }

  /** Sparse random projection (Achlioptas 2003, the database-friendly
    * Johnson–Lindenstrauss transform): project `dims`-dimensional
    * embeddings to `kOut` dimensions with the {+1, 0, −1} /
    * {1/6, 2/3, 1/6} sign matrix and the √(3/kOut) variance
    * correction — the 100 TB scale path for every downstream
    * embedding op (dedup, clustering, ANN candidate generation) that
    * doesn't need full dimensionality: 8× fewer multiplies and bytes
    * with JL-bounded distortion, and 2/3 of the entries contribute
    * nothing at all.
    *
    * The sign matrix is derived at PLAN time from md5(tag_j_d) — a
    * deterministic, engine-portable seed — and baked into the
    * projection as an explicit ± term chain in ascending-dimension
    * order, so the whole operator is one narrow zero-shuffle
    * codegen'd projection (no matrix join, no UDF, nothing shipped
    * but the plan). The oracle SQL is generated from the SAME sign
    * derivation with the same term order, so IEEE accumulation
    * matches bit for bit before the 6-decimal rounding.
    */
  def sparseRandomProjection(df: DataFrame, embCol: String, idCol: String,
      dims: Int, kOut: Int, tag: String = "rp"): DataFrame = {
    // cast the ELEMENT, not the array: a whole-array transform-cast
    // alias gets CollapseProject-inlined into every ± term, silently
    // re-casting all `dims` elements per term (O(dims²) per row) and
    // dragging a lambda into what should be a plain codegen chain
    def at(d: Int): Column = element_at(col(embCol), d + 1).cast("double")
    val projCols = (0 until kOut).map { j =>
      val terms = (0 until dims).flatMap { d =>
        achlioptasSign(tag, j, d) match {
          case 1  => Some(at(d))
          case -1 => Some(-at(d))
          case _  => None
        }
      }
      val s = if (terms.isEmpty) lit(0.0) else terms.reduce(_ + _)
      (floor(s * math.sqrt(3.0 / kOut) * 1e6 + 0.5) / 1e6).as(s"p$j")
    }
    df.select(col(idCol) +: projCols: _*)
  }

  /** The {+1, −1, 0} Achlioptas sign for output dim `j`, input dim
    * `d`: md5-derived (first 24 hash bits mod 6 → {0→+1, 1→−1,
    * else 0}), so the engine plan and the generated oracle SQL agree
    * on the exact sparsity pattern without sharing state.
    */
  def achlioptasSign(tag: String, j: Int, d: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${tag}_${j}_${d}".getBytes("UTF-8"))
      .take(3).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % 6) match {
      case 0 => 1
      case 1 => -1
      case _ => 0
    }
  }

  /** Deterministic random-hyperplane family for LSH bucketing: `p`
    * signed planes over `dims` dimensions, seeded — the same family on
    * every executor and every run.
    */
  def hyperplanes(dims: Int, p: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(p)(Seq.fill(dims)(rnd.nextGaussian()))
  }

  /** Sign-random-projection bucket id (0 .. 2^planes-1) for a vector
    * column: bit i = (v · plane_i) > 0. Pure expression: `planes` are
    * literals baked into the plan (bounded metadata, like a broadcast).
    */
  def srpBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, typedlit(p)) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** LSH-restricted approximate top-k: score only the corpus rows
    * whose bucket matches the query's bucket in ANY of the `bands`
    * independent plane families (multi-probe by band, the standard
    * recall lever). At 100 TB the bucket predicate prunes the scored
    * set by ~2^planes per band; bucket ids can be precomputed and
    * partition-pruned via a bucketed layout.
    */
  def lshTopK(corpus: DataFrame, embCol: String, idCol: String,
      query: Seq[Double], k: Int, planesPerBand: Int = 8, bands: Int = 4,
      seed: Long = 42L): DataFrame = {
    val families = Seq.tabulate(bands)(b =>
      hyperplanes(query.size, planesPerBand, seed + b))
    val matchesAnyBand = families.zipWithIndex.map { case (f, _) =>
      srpBucket(col(embCol), f) === lit(qBucketOf(f, query))
    }.reduce(_ || _)
    corpus.filter(matchesAnyBand)
      .select(col(idCol), scoreAgainst(col(embCol), query).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Driver-side bucket of the query vector: same arithmetic as
    * [[srpBucket]], on the query literal.
    */
  private def qBucketOf(fam: Seq[Seq[Double]], query: Seq[Double]): Int =
    fam.zipWithIndex.map { case (p, i) =>
      if (p.zip(query).map { case (a, b) => a * b }.sum > 0) 1 << i else 0
    }.sum

  // ---------------------------------------------------------------------
  // Persisted ANN indexes: bucket/cell assignment computed ONCE at index
  // build and written as PARTITION columns (Layout.writePartitioned), so
  // a probe is a partition-pruned scan — the 100 TB form, where
  // `lshTopK`/`ivfTopK` recompute every bucket per query. Space cost:
  // the LSH index stores each vector `bands` times (the standard
  // multi-probe tradeoff); the IVF index stores it once.
  // ---------------------------------------------------------------------

  /** The LSH index frame: one row per (vector, band) with its bucket —
    * the layout key is (band, bucket), both low-cardinality
    * (bands × 2^planesPerBand directories). `dims` must match the
    * corpus vectors: a shorter plane silently truncates the dot
    * product, putting every vector in a bucket from the wrong family.
    */
  def lshIndexFrame(corpus: DataFrame, embCol: String, idCol: String,
      planesPerBand: Int, bands: Int, seed: Long, dims: Int): DataFrame = {
    val families = Seq.tabulate(bands)(b =>
      hyperplanes(dims, planesPerBand, seed + b))
    corpus.select(col(idCol), col(embCol),
      posexplode(array(families.map(f => srpBucket(col(embCol), f)): _*))
        .as(Seq("band", "bucket")))
  }

  /** Build (write) the partitioned LSH index at `path`. The vector
    * dimensionality is read FROM the corpus (one bounded head()), and
    * the full family parameterization (planes, bands, seed, dims) is
    * persisted beside the data as `_meta` — the probe rebuilds its
    * hyperplanes from that record, so index and probe can never use
    * different families (the silent-recall-collapse failure mode of
    * letting callers re-supply the parameters).
    */
  def buildLshIndex(corpus: DataFrame, embCol: String, idCol: String,
      path: String, planesPerBand: Int = 8, bands: Int = 4,
      seed: Long = 42L, writeTasks: Int = 8): Unit = {
    val dims = corpus.select(size(col(embCol))).head().getInt(0)
    // writeTasks: size to the corpus volume — the default suits
    // bench-scale corpora where commit overhead, not I/O, dominates;
    // a 100 TB build raises it to its cluster's write width
    graft.sources.Layout.writePartitioned(
      lshIndexFrame(corpus, embCol, idCol, planesPerBand, bands, seed, dims),
      path, Seq("band", "bucket"), writeTasks)
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq((planesPerBand, bands, seed, dims))
      .toDF("planes_per_band", "bands", "seed", "dims")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_meta")
    // refresh the probe memos: a rebuild at the same path must not
    // leave a stale file index or family record behind
    idxFrameCache.put(spark, path, spark.read.parquet(path))
    idxMetaCache.put(spark, s"$path/_meta",
      spark.read.parquet(s"$path/_meta").collect())
  }

  /** Per-(session, path) memo of the resolved index frame and its
    * `_meta`/`_centroids` records. Resolving `spark.read.parquet`
    * lists every partition directory of the index (the dominant probe
    * cost once the scan itself is pruned — ~1 s of driver-side file
    * listing per probe at 1k directories, and strictly worse at real
    * index sizes); a deployment holds this in a catalog/metastore
    * entry, which this cache stands in for. Partition pruning still
    * happens per probe against the cached file index.
    */
  private val idxFrameCache = new graft.SessionCache[DataFrame]
  private val idxMetaCache = new graft.SessionCache[Array[
    org.apache.spark.sql.Row]]

  private def indexFrame(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    idxFrameCache.get(spark, path)(spark.read.parquet(path))

  private def indexMeta(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[org.apache.spark.sql.Row] =
    idxMetaCache.get(spark, path)(spark.read.parquet(path).collect())

  /** Probe the persisted LSH index: the bucket predicate hits ONLY the
    * matching band partition directories (PartitionFilters in the
    * plan — non-matching files are never opened), then dedups vectors
    * found in multiple probed bands and scores. The plane family comes
    * from the index's own `_meta` record; a query vector of the wrong
    * dimensionality is rejected instead of silently mis-bucketing.
    * Result set identical to [[lshTopK]] with the same parameters.
    */
  def lshTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      embCol: String, idCol: String, query: Seq[Double],
      k: Int): DataFrame = {
    val meta = indexMeta(spark, s"$path/_meta").head
    val (planesPerBand, bands) =
      (meta.getAs[Int]("planes_per_band"), meta.getAs[Int]("bands"))
    val (seed, dims) = (meta.getAs[Long]("seed"), meta.getAs[Int]("dims"))
    require(query.size == dims,
      s"query has ${query.size} dims but the index was built for $dims")
    val families = Seq.tabulate(bands)(b =>
      hyperplanes(dims, planesPerBand, seed + b))
    val probe = families.zipWithIndex.map { case (f, b) =>
      col("band") === b && col("bucket") === qBucketOf(f, query)
    }.reduce(_ || _)
    indexFrame(spark, path).filter(probe)
      .select(col(idCol), col(embCol)).distinct()
      .select(col(idCol), scoreAgainst(col(embCol), query).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Build the partitioned IVF index: k-means cell id as the single
    * partition column; centroids saved beside the data (bounded
    * metadata) so probes recompute nothing.
    */
  def buildIvfIndex(corpus: DataFrame, embCol: String, idCol: String,
      path: String, nClusters: Int = 16, seed: Long = 42L,
      writeTasks: Int = 8): Unit = {
    val centroids = trainCentroids(corpus, embCol, nClusters, seed)
    val v = toDouble(col(embCol))
    def sq(c: Seq[Double]): Double = c.map(x => x * x).sum
    val cells = centroids.zipWithIndex.map { case (c, i) =>
      struct((lit(sq(c)) - lit(2.0) * dot(v, typedlit(c))).as("d"),
        lit(i).as("i"))
    }
    graft.sources.Layout.writePartitioned(
      corpus.select(col(idCol), col(embCol),
        array_min(array(cells: _*)).getField("i").as("cell"))
        .withColumn("b", lit(BaseBatchId)),
      path, Seq("cell", "b"), writeTasks)
    val spark = corpus.sparkSession
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("i", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_centroids")
    idxFrameCache.put(spark, path, spark.read.parquet(path))
    idxMetaCache.put(spark, s"$path/_centroids",
      spark.read.parquet(s"$path/_centroids").collect())
  }

  /** Probe the persisted IVF index: load centroids (bounded), rank
    * cells against the query on the driver, scan ONLY the `nProbe`
    * nearest cell partitions.
    */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      embCol: String, idCol: String, query: Seq[Double], k: Int,
      nProbe: Int = 4): DataFrame = {
    def sq(c: Seq[Double]): Double = c.map(x => x * x).sum
    val centroids = indexMeta(spark, s"$path/_centroids")
      .map(r => r.getAs[Int]("i") -> r.getSeq[Double](1).toSeq)
    require(centroids.nonEmpty && centroids.head._2.size == query.size,
      s"query has ${query.size} dims but the index centroids have " +
        s"${centroids.headOption.map(_._2.size).getOrElse(0)}")
    val qCells = centroids.map { case (i, c) =>
      (sq(c) - 2.0 * c.zip(query).map { case (a, b) => a * b }.sum, i)
    }.sortBy(_._1).take(nProbe).map(_._2)
    indexFrame(spark, path)
      .filter(col("cell").isin(qCells: _*))
      .select(col(idCol), scoreAgainst(col(embCol), query).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Batch-identity value of base-build rows in the partitioned index
    * layouts (`cell=<c>/b=<id>/…`): base builds write `b = 0`, delta
    * batches write their own positive `batchId` — see
    * [[publishDeltaBatch]] for the crash-idempotence contract the
    * layer exists for.
    */
  val BaseBatchId: Long = 0L

  /** CRASH-IDEMPOTENT delta-batch publish (r14 verdict #1): write a
    * delta frame carrying its `b = batchId` identity column into a
    * `cell`-partitioned index via Spark's DYNAMIC partition overwrite
    * — only the (cell, b) partitions PRESENT IN THIS BATCH are
    * replaced; the base build's `b = 0` partitions and every other
    * batch's are untouched. Because cell assignment is a pure function
    * of the frozen codebook, the same delta always produces the same
    * (cell, b) partition set, so:
    *
    *   - re-running a delta job REPLACES its own partitions instead of
    *     double-appending vectors (run-twice ≡ run-once);
    *   - a job that DIES mid-write leaves only an uncommitted
    *     `.spark-staging-*` directory (dynamic overwrite stages, then
    *     commits per partition by delete + move), and the re-run
    *     publishes cleanly over it. The guarantee is RE-RUN HEALING,
    *     not reader-side atomicity: the commit replaces partitions
    *     one at a time, so a driver death MID-COMMIT (not just
    *     mid-stage) or a reader racing an in-flight publish CAN
    *     observe a partially-replaced batch — callers must not probe
    *     an index while a publish is running (the bench's serial
    *     execution satisfies this; a deployment would fence with a
    *     manifest/table commit).
    *
    * The mode is scoped to this write and restored after: dynamic
    * overwrite is exactly right for batch-identity publishes and
    * exactly wrong as a session default (a plain overwrite elsewhere
    * would silently keep stale partitions).
    */
  private def publishDeltaBatch(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try df.write.mode("overwrite").partitionBy("cell", "b").parquet(path)
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** INCREMENTAL DELTA INSERT into a persisted IVF index — completes
    * the index-maintenance matrix: every persisted index family
    * (minhash q104, winnow-anchor q182, graph-ANN q188, and now IVF)
    * absorbs tonight's batch without a corpus rebuild. IVF is the
    * easy case BY DESIGN, and the operator exploits it fully: cell
    * assignment depends only on the TRAINED codebook (`_centroids`,
    * bounded metadata — deliberately not retrained on delta, standard
    * IVF maintenance), so
    *
    *   1. the base layout transfers by a FILE-level copy (bytes, no
    *      compute, no shuffle — at a real deployment this step is a
    *      metadata operation on the table, or SKIPPED ENTIRELY by
    *      passing `path == basePath` to maintain the index in place;
    *      it's materialized in the q203 wiring so the base index
    *      stays untouched for q49),
    *   2. the delta alone is scanned once through the builder's exact
    *      assignment expression and published into its cell
    *      directories under its OWN batch identity (`b = batchId`,
    *      dynamic partition overwrite — [[publishDeltaBatch]]), so a
    *      re-run after a mid-write death replaces its own partitions
    *      instead of double-appending vectors; cost ∝ |delta|,
    *      nothing else moves,
    *   3. probes need no code path of their own: the refreshed index
    *      IS an IVF index, read by [[ivfTopKIndexed]] unchanged, and
    *      equals what a rebuild-without-retrain over corpus ∪ delta
    *      would produce row for row.
    *
    * `batchId` must be positive (0 is the base build) and unique per
    * logical delta batch: two DIFFERENT deltas published under one id
    * overwrite each other — identity is what makes retry safe.
    *
    * The delta's embedding column is required to match the base
    * element type (mixed float/double files under one layout read
    * back with a corrupted merged schema).
    */
  def deltaInsertIvfIndex(spark: org.apache.spark.sql.SparkSession,
      basePath: String, delta: DataFrame, embCol: String, idCol: String,
      path: String, batchId: Long = 1L, writeTasks: Int = 4): Unit = {
    require(batchId > BaseBatchId,
      s"delta batchId must be positive (0 is the base build): $batchId")
    if (path != basePath) {
      val conf = spark.sessionState.newHadoopConf()
      val src = new org.apache.hadoop.fs.Path(basePath)
      val dst = new org.apache.hadoop.fs.Path(path)
      val fs = dst.getFileSystem(conf)
      if (fs.exists(dst)) fs.delete(dst, true)
      org.apache.hadoop.fs.FileUtil.copy(src.getFileSystem(conf), src,
        fs, dst, false, conf)
    }
    val baseType = spark.read.parquet(basePath).schema(embCol).dataType
    require(delta.schema(embCol).dataType == baseType,
      s"delta $embCol is ${delta.schema(embCol).dataType}, " +
        s"index stores $baseType — cast before inserting")
    val centroids = indexMeta(spark, s"$path/_centroids")
      .map(r => r.getAs[Int]("i") -> r.getSeq[Double](1).toSeq)
      .sortBy(_._1)
    val v = toDouble(col(embCol))
    def sq(c: Seq[Double]): Double = c.map(x => x * x).sum
    val cells = centroids.map { case (i, c) =>
      struct((lit(sq(c)) - lit(2.0) * dot(v, typedlit(c))).as("d"),
        lit(i).as("i"))
    }
    publishDeltaBatch(
      delta.select(col(idCol), col(embCol),
          array_min(array(cells: _*)).getField("i").as("cell"),
          lit(batchId).as("b"))
        .repartition(writeTasks),
      path)
    idxFrameCache.put(spark, path, spark.read.parquet(path))
    idxMetaCache.put(spark, s"$path/_centroids",
      spark.read.parquet(s"$path/_centroids").collect())
  }

  /** Per-group embedding centroids, collected as bounded driver
    * metadata (k × dims doubles — a codebook, not data). Components
    * are rounded to 6 decimals so the codebook is bit-identical across
    * engines regardless of partial-sum order.
    */
  def groupCentroids(corpus: DataFrame, embCol: String,
      groupCol: String): Seq[(String, Seq[Double])] =
    // null groups normalize to a sentinel (the q45/q80 grouping
    // convention) — a null key must form its own cluster, not NPE the
    // codebook sort on the driver
    corpus.groupBy(coalesce(col(groupCol).cast("string"), lit("<null>"))
        .as("g"))
      .agg(graft.functions.VecAggs.vecAvg(
        toDouble(col(embCol))).as("c"))
      .select(col("g"), transform(col("c"), x => round(x, 6)).as("c"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toSeq)
      .sortBy(_._1)

  /** Assign every vector to its nearest codebook centroid by rounded
    * cosine (ties → smallest centroid id). One codegen-friendly
    * expression over broadcast literals — no shuffle, no join: the
    * argmax is an `array_min` over (−sim, id) structs, so the scan
    * stays a single whole-stage-codegen pass at any corpus size.
    */
  def assignToCentroids(corpus: DataFrame, embCol: String,
      centroids: Seq[(String, Seq[Double])]): DataFrame = {
    require(centroids.nonEmpty, "empty codebook")
    val v = toDouble(col(embCol))
    val cells = centroids.map { case (id, c) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      val cu = if (cn == 0) c else c.map(_ / cn)
      // 1 − sim, not −sim: cosine distance stays ≥ 0, so the struct
      // comparison never sees a −0.0/0.0 ordering ambiguity
      struct((lit(1.0) - round(dot(v, typedlit(cu)) / norm(v), 6)).as("dist"),
        lit(id).as("cid"))
    }
    corpus.withColumn("cluster",
      array_min(array(cells: _*)).getField("cid"))
  }

  /** SemDeDup-style semantic deduplication: cluster the corpus with a
    * bounded centroid codebook (here the per-`groupCol` means — at
    * production scale a trained k-means, same shape), then prune
    * near-duplicates ONLY within a cluster. Clustering turns the
    * corpus-quadratic cosine comparison into per-cluster blocks — the
    * published SemDeDup observation that semantic duplicates share a
    * cluster — and [[blockedNearDupPairs]] caps hot clusters so one
    * degenerate centroid can't go quadratic at 100 TB.
    *
    * Keep rule: a vector survives unless a SMALLER id in its cluster
    * scores ≥ `threshold` against it (greedy min-id representative —
    * deterministic, order-free, one anti-join).
    *
    * Returns (id, cluster, keep) for every corpus row.
    */
  def semanticDedup(corpus: DataFrame, embCol: String, idCol: String,
      groupCol: String, threshold: Double,
      maxClusterSize: Int = 10000): DataFrame = {
    val codebook = groupCentroids(corpus, embCol, groupCol)
    val assigned = assignToCentroids(corpus, embCol, codebook)
      .select(col(idCol).as("id"), col(embCol), col("cluster"))
    val dropped = blockedNearDupPairs(assigned, embCol, "id", "cluster",
        threshold, maxClusterSize)
      .select(col("id_b").as("id")).distinct()
      .withColumn("__hit", lit(true))
    assigned.select(col("id"), col("cluster"))
      .join(dropped, Seq("id"), "left")
      .select(col("id"), col("cluster"), col("__hit").isNull.as("keep"))
  }

  /** SEMANTIC decontamination screen — the embedding-space sibling of
    * [[graft.operators.Decontaminate]]'s n-gram overlap checks: for
    * every corpus vector, the maximum cosine similarity to ANY vector
    * of the evaluation set, with the best-matching eval id and a
    * threshold flag. N-gram decontamination misses paraphrases and
    * translations; this is the screen that catches them (the
    * embedding-similarity contamination analyses that ship with
    * modern model cards).
    *
    * Scale shape — [[Decontaminate]]'s broadcast-eval convention in
    * embedding space, distinct-VECTOR-first on both sides (the
    * graft-wide exact-dedup-first convention, cf.
    * [[blockedNearDupPairs]]): identical vectors produce identical
    * cosines, so the eval set collapses to distinct vectors carrying
    * their MIN member id (min-id tie-breaking survives the collapse
    * exactly — a tie against any twin is a tie against the group's
    * min), the corpus scores once per distinct vector, and members
    * re-expand through one vector-keyed join. The distinct eval frame
    * is benchmark-sized, so it broadcasts with precomputed norms and
    * the scoring pass is narrow — dot products against the broadcast
    * rows, then a map-side-combined per-vector max. Nothing ever
    * pairs the corpus with itself. Ties on the rounded similarity
    * break to the smallest eval id via lexicographic (sim, -eid)
    * struct ordering — deterministic in any combine order.
    * Degenerate vectors (zero norm) are dropped like [[knnJoin]].
    *
    * Honest trade (same shape as the naive-Bayes one): on an
    * all-distinct corpus the collapse buys nothing and costs two
    * vector-keyed corpus exchanges — second-order next to the
    * |corpus|x|eval|xd scoring term those exchanges bracket — while
    * on the pre-dedup crawls this screen actually runs against,
    * exact twins multiply, and scoring (the dominant term) divides
    * by the twin factor. Measured: 1.28 s at the 100x twin stress
    * vs 0.76 s at 1x — near-flat, where per-id scoring would have
    * scaled with the full corpus.
    *
    * Output: (idCol, max_sim, eval_id, contaminated).
    */
  def semanticDecontaminate(corpus: DataFrame, idCol: String,
      embCol: String, eval: DataFrame, evalIdCol: String,
      evalEmbCol: String, threshold: Double): DataFrame = {
    // the -eid max-struct tiebreak needs a numeric id; a string id
    // would cast to null and silently emit null eval_id groups —
    // fail loudly at plan time instead
    eval.schema(evalIdCol).dataType match {
      case org.apache.spark.sql.types.ByteType
         | org.apache.spark.sql.types.ShortType
         | org.apache.spark.sql.types.IntegerType
         | org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"semanticDecontaminate needs an integral eval id column; " +
          s"'$evalIdCol' is $dt")
    }
    val ev = broadcast(eval
      .select(col(evalIdCol).cast("long").as("eid"),
        toDouble(col(evalEmbCol)).as("evv"))
      .groupBy(col("evv")).agg(min(col("eid")).as("eid"))
      .select(col("eid"), col("evv"), norm(col("evv")).as("en")))
    val docs = corpus.select(col(idCol), toDouble(col(embCol)).as("v"))
    val perVec = docs.select(col("v")).distinct()
      .withColumn("vn", norm(col("v")))
      .crossJoin(ev)
      // nullif guards the ANSI divide-by-zero on degenerate vectors;
      // the null sim then falls to the drop filter below
      .select(col("v"),
        round(dot(col("v"), col("evv")) /
          nullif(col("vn") * col("en"), lit(0.0)), 6).as("sim"),
        col("eid"))
      .filter(col("sim").isNotNull && !isnan(col("sim")))
      .groupBy(col("v"))
      .agg(max(struct(col("sim"), (-col("eid")).as("nid"))).as("b"))
    docs.join(perVec, Seq("v"))
      .select(col(idCol), col("b.sim").as("max_sim"),
        (-col("b.nid")).as("eval_id"),
        (col("b.sim") >= threshold).as("contaminated"))
  }

  /** Symmetric int8 scalar quantization of an embedding column: adds
    * `scale` (double, max|x_i|), `q` (array<int> codes in [-127, 127])
    * and `err` (double, max absolute reconstruction error) via the
    * single-pass codegen'd [[graft.functions.VectorExprs.QuantizeInt8Expr]].
    * This is the storage-compression step for a 100 TB ANN corpus: int8
    * codes + one double per vector are 4× smaller than float32
    * payloads, cut shuffle and scan bytes by the same factor, and
    * dot-products against them stay exact in int32. Narrow — no
    * shuffle, stays inside whole-stage codegen.
    */
  def quantizeInt8(df: DataFrame, embCol: String): DataFrame =
    df.withColumn("__qz", graft.functions.VectorExprs.quantizeInt8(col(embCol)))
      .withColumn("scale", col("__qz.scale"))
      .withColumn("q", col("__qz.q"))
      .withColumn("err", col("__qz.err"))
      .drop("__qz")

  /** Inner-product top-k over the QUANTIZED corpus: score =
    * dot(codes, query codes) · (scale · qScale / 127²). The scan reads
    * int8 codes (4× fewer bytes than float32) and the dot is exact
    * integer arithmetic (|dot| ≤ dim·127² ≪ 2⁵³ — no float summation
    * order to disagree on), so rank order is deterministic and
    * engine-portable, unlike float-dot ranking which needs the rounded-
    * score convention. `orderBy(...).limit(k)` plans as
    * TakeOrderedAndProject — bounded per-partition heaps, no global
    * sort. Ties break by id.
    */
  def quantizedTopK(quantized: DataFrame, idCol: String,
      qCode: Seq[Int], qScale: Double, k: Int,
      codeCol: String = "q", scaleCol: String = "scale"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val score = graft.functions.VectorExprs.vecDot(
        col(codeCol), lit(qCode.toArray)) *
      (col(scaleCol) * lit(qScale) / lit(16129.0))
    quantized.select(col(idCol), round(score, 6).as("score"))
      .orderBy(col("score").desc, col(idCol)).limit(k)
  }

  // ---------------------------------------------------------------------
  // Product quantization (PQ): the third standard ANN memory/scan lever
  // beyond IVF cells (scan pruning) and int8 (4× compression) — m
  // per-subspace codebooks compress each vector to m byte-sized codes
  // (here 64 dims → 8 codes: 32× smaller than float32), probes score
  // the COMPRESSED corpus via per-subspace lookup tables (ADC), and a
  // small exact re-rank restores precision. The codebooks are bounded
  // driver metadata (m × ksub × dims/m doubles), trained once at index
  // build by the same deterministic sampled k-means as IVF.
  // ---------------------------------------------------------------------

  /** Train the m per-subspace codebooks: the corpus sample is drawn
    * ONCE (the trainCentroids sampling contract) and each subspace fits
    * its own k-means over the sample's slice — m small driver-side
    * fits, not m corpus scans.
    */
  def trainPqCodebooks(corpus: DataFrame, embCol: String, m: Int = 8,
      ksub: Int = 16, seed: Long = 42L,
      maxTrainRows: Int = 4096): Seq[Seq[Seq[Double]]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val dims = corpus.select(size(col(embCol))).head().getInt(0)
    require(m >= 1 && dims % m == 0,
      s"dims ($dims) must split evenly into m ($m) subspaces")
    val subLen = dims / m
    val v = toDouble(col(embCol))
    val sampled =
      (if (corpus.limit(maxTrainRows + 1).count() <= maxTrainRows)
        corpus.select(v.as("v"))
      else corpus
        .select(v.as("v"), xxhash64(col(embCol), lit(seed)).as("__h"))
        .orderBy(col("__h")).limit(maxTrainRows).select(col("v")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the m sub-fits are independent small jobs over the one
      // persisted sample — run them CONCURRENTLY (guide §2.6: actions
      // are only sequential because the driver calls them
      // sequentially). Each fit is deterministic in its own seed, so
      // the codebooks are bit-identical to the serial form; the wall
      // cost drops from the SUM of m fits to roughly their max
      // (measured: the ivfpq/pq prebuilds were the bench's index_build
      // long pole at 31.8/17.5 s, almost all of it these serial fits).
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      // a DEDICATED fixed pool sized to m, not the global fork-join
      // pool: the fits run BLOCKING Spark actions, which on a low-core
      // driver would throttle the default pool's target parallelism,
      // and fork-join pool threads inherit Spark's
      // InheritableThreadLocal job-group/execution-id properties from
      // whichever caller first grew the shared pool — a mis-attribution
      // (and mis-cancellation) hazard in multi-tenant drivers. The pool
      // lives exactly as long as the fits.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(m)
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      try {
        Await.result(
          Future.sequence((0 until m).map { j => Future {
            val sub = sampled.select(array_to_vector(
              slice(col("v"), j * subLen + 1, subLen)).as("features"))
            new KMeans().setK(ksub).setSeed(seed + j).setMaxIter(10)
              .fit(sub).clusterCenters.map(_.toArray.toSeq).toSeq
          }}.toSeq), Duration.Inf)
      } finally { pool.shutdown() }
    } finally { sampled.unpersist(blocking = false) }
  }

  /** PQ code array for a vector column: element j = the index of
    * subspace j's nearest centroid (squared-L2; the per-subspace |v_j|²
    * term is common to every centroid and dropped). One expression —
    * the encode pass is a single scan.
    */
  def pqCode(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    def sq(c: Seq[Double]): Double = c.map(x => x * x).sum
    val m = codebooks.size
    val subLen = codebooks.head.head.size
    array((0 until m).map { j =>
      val sub = slice(v, j * subLen + 1, subLen)
      array_min(array(codebooks(j).zipWithIndex.map { case (c, i) =>
        struct((lit(sq(c)) - lit(2.0) * dot(sub, typedlit(c))).as("d"),
          lit(i).as("i"))
      }: _*)).getField("i")
    }: _*)
  }

  /** Build the persisted PQ index at `path`: (id, codes) — 32× smaller
    * than the float32 corpus — plus the codebooks as `_codebooks`
    * (bounded metadata, the _meta/_centroids pattern).
    */
  def buildPqIndex(corpus: DataFrame, embCol: String, idCol: String,
      path: String, m: Int = 8, ksub: Int = 16, seed: Long = 42L,
      writeTasks: Int = 8): Unit = {
    val codebooks = trainPqCodebooks(corpus, embCol, m, ksub, seed)
    val coded = corpus.select(col(idCol),
      pqCode(toDouble(col(embCol)), codebooks).as("codes"))
    (if (writeTasks > 0) coded.coalesce(writeTasks) else coded)
      .write.mode("overwrite").parquet(path)
    val spark = corpus.sparkSession
    import spark.implicits._
    codebooks.zipWithIndex
      .flatMap { case (cb, j) => cb.zipWithIndex.map { case (c, i) =>
        (j, i, c) } }
      .toDF("j", "i", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_codebooks")
    idxFrameCache.put(spark, path, spark.read.parquet(path))
    idxMetaCache.put(spark, s"$path/_codebooks",
      spark.read.parquet(s"$path/_codebooks").collect())
  }

  /** Probe the PQ index: asymmetric distance computation (ADC) — the
    * query builds one m × ksub inner-product lookup table on the
    * driver, the compressed scan sums m `element_at`s per row (reading
    * codes, never vectors), the top `shortlist` approximate matches
    * come back through a bounded TakeOrdered, and ONLY those rows'
    * real embeddings are re-read (broadcast semi-join) for the exact
    * cosine re-rank. `shortlist` is the recall/precision lever:
    * true top-k candidates missing from the shortlist are the PQ
    * approximation error, exactly as nProbe bounds IVF recall.
    */
  def pqTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      corpus: DataFrame, embCol: String, idCol: String, query: Seq[Double],
      k: Int, shortlist: Int = 50): DataFrame = {
    require(k > 0 && shortlist >= k,
      s"need shortlist ($shortlist) >= k ($k) > 0")
    val rows = indexMeta(spark, s"$path/_codebooks")
    val codebooks: Seq[Seq[Seq[Double]]] = rows
      .map(r => (r.getAs[Int]("j"), r.getAs[Int]("i"),
        r.getSeq[Double](r.fieldIndex("centroid")).toSeq))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toSeq)
    val m = codebooks.size
    val subLen = codebooks.head.head.size
    require(query.size == m * subLen,
      s"query has ${query.size} dims but the index was built for " +
        s"${m * subLen}")
    // per-subspace inner-product LUT (driver-side, m × ksub doubles)
    val luts: Seq[Seq[Double]] = codebooks.zipWithIndex.map { case (cb, j) =>
      val qSub = query.slice(j * subLen, (j + 1) * subLen)
      cb.map(c => c.zip(qSub).map { case (a, b) => a * b }.sum)
    }
    val approx = (0 until m).map(j =>
        element_at(typedlit(luts(j)), col("codes").getItem(j) + 1))
      .reduce(_ + _)
    val short = indexFrame(spark, path)
      .select(col(idCol), approx.as("__approx"))
      .orderBy(col("__approx").desc, col(idCol))
      .limit(shortlist)
    corpus.join(broadcast(short.select(col(idCol))), Seq(idCol), "left_semi")
      .select(col(idCol), scoreAgainst(col(embCol), query).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Maximal-Marginal-Relevance diversification (Carbonell & Goldstein
    * 1998) of a retrieval shortlist: greedily pick `kOut` of the
    * `kCand` most query-relevant vectors, each round maximizing
    *
    *   mmr(d) = λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)
    *
    * — the standard anti-redundancy re-rank for RAG contexts and
    * eval-set construction (a shortlist of 20 near-identical chunks
    * wastes 19 slots; MMR trades marginal relevance for coverage).
    *
    * Scale shape: candidate generation is the distributed part (one
    * corpus scan + TakeOrderedAndProject — the q34 path); the greedy
    * loop is inherently sequential (each pick conditions the next),
    * so it runs on the DRIVER over the collected shortlist — bounded
    * metadata (kCand rows × dims), the codebook/beam-state class, NOT
    * a corpus collect. Ties break on ascending id; round-1 mmr is
    * λ·rel (empty selected set). Output: (rank, id, rel, mmr).
    */
  def mmrDiversify(corpus: DataFrame, embCol: String, idCol: String,
      query: Seq[Double], kCand: Int = 20, kOut: Int = 8,
      lambda: Double = 0.7): DataFrame = {
    require(kOut >= 1 && kCand >= kOut,
      s"need kCand ($kCand) >= kOut ($kOut) >= 1")
    val spark = corpus.sparkSession
    val cand = corpus.select(col(idCol).cast("long").as("id"),
        scoreAgainst(col(embCol), query).as("rel"),
        toDouble(col(embCol)).as("v"))
      .orderBy(col("rel").desc, col("id"))
      .limit(kCand)
      .collect()
    val ids = cand.map(_.getLong(0))
    val rels = cand.map(_.getDouble(1))
    val vecs = cand.map(_.getSeq[Double](2).toArray)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      r6(d / (math.sqrt(na) * math.sqrt(nb)))
    }
    val n = ids.length
    val lc = 1 - lambda // exact IEEE complement; the oracle prints it
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long,
      Double, Double)]
    while (picks.length < kOut && selected.length < n) {
      var best = -1; var bestMmr = Double.NegativeInfinity
      for (i <- 0 until n if !selected.contains(i)) {
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.map(s => cos(vecs(i), vecs(s))).max
        val mmr = lambda * rels(i) - lc * maxSim
        if (mmr > bestMmr || (mmr == bestMmr && (best < 0 ||
            ids(i) < ids(best)))) {
          best = i; bestMmr = mmr
        }
      }
      selected += best
      picks += ((picks.length + 1, ids(best), rels(best), r6(bestMmr)))
    }
    import spark.implicits._
    picks.toSeq.toDF("rank", "id", "rel", "mmr")
      .select(col("rank").cast("long").as("rank"), col("id").as(idCol),
        col("rel"), col("mmr"))
  }

  /** Build the persisted FUSED IVF-PQ index at `path` — the composite
    * index (Jégou et al. 2011, "Product Quantization for Nearest
    * Neighbor Search", the IVFADC structure; FAISS `IndexIVFPQ`) that
    * combines both scale levers the separate q49/q117 indexes
    * demonstrate individually:
    *
    *   - a coarse k-means quantizer routes each vector to a CELL, and
    *     the index is laid out partitioned by cell, so a probe scans
    *     only `nProbe` partition directories (IVF's read pruning);
    *   - within a cell the index stores only the PQ CODES of the
    *     vector's RESIDUAL (v − centroid[cell]) — m byte-codes per
    *     vector, ~32× smaller than float32 — so the pruned scan is
    *     also a compressed scan (PQ's byte-per-subspace scoring).
    *
    * Residual (not raw-vector) encoding is the load-bearing choice:
    * within a cell residuals are centered near zero, so one shared
    * codebook set quantizes them far more finely than it could the raw
    * vectors — the standard IVFADC refinement. Codebooks are trained
    * on the residual distribution (bounded sample, deterministic
    * seed). Bounded metadata rides beside the data as `_centroids`
    * and `_codebooks`, the q49/q117 pattern.
    */
  def buildIvfPqIndex(corpus: DataFrame, embCol: String, idCol: String,
      path: String, nClusters: Int = 16, m: Int = 8, ksub: Int = 16,
      seed: Long = 42L, writeTasks: Int = 8): Unit = {
    val centroids = trainCentroids(corpus, embCol, nClusters, seed)
    val v = toDouble(col(embCol))
    def sq(c: Seq[Double]): Double = c.map(x => x * x).sum
    val cellExpr = array_min(array(centroids.zipWithIndex.map { case (c, i) =>
      struct((lit(sq(c)) - lit(2.0) * dot(v, typedlit(c))).as("d"),
        lit(i).as("i"))
    }: _*)).getField("i")
    val centLit = typedlit(centroids.map(_.toSeq))
    val assigned = corpus.select(col(idCol), v.as("__v"),
      cellExpr.as("cell"))
    def residOf(vc: Column, cellC: Column): Column =
      zip_with(vc, element_at(centLit, cellC + 1), (a, b) => a - b)
    val codebooks = trainPqCodebooks(
      assigned.select(residOf(col("__v"), col("cell")).as("__r")), "__r",
      m, ksub, seed)
    graft.sources.Layout.writePartitioned(
      assigned.select(col(idCol),
        pqCode(residOf(col("__v"), col("cell")), codebooks).as("codes"),
        col("cell"))
        .withColumn("b", lit(BaseBatchId)),
      path, Seq("cell", "b"), writeTasks)
    val spark = corpus.sparkSession
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("i", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_centroids")
    codebooks.zipWithIndex
      .flatMap { case (cb, j) => cb.zipWithIndex.map { case (c, i) =>
        (j, i, c) } }
      .toDF("j", "i", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_codebooks")
    idxFrameCache.put(spark, path, spark.read.parquet(path))
    idxMetaCache.put(spark, s"$path/_centroids",
      spark.read.parquet(s"$path/_centroids").collect())
    idxMetaCache.put(spark, s"$path/_codebooks",
      spark.read.parquet(s"$path/_codebooks").collect())
  }

  /** INCREMENTAL DELTA INSERT into a persisted IVF-PQ index — the
    * fifth index family in the maintenance matrix (minhash q104,
    * winnow q182, graph q188, IVF q203, IVF-PQ here). Like IVF, both
    * quantizers are FROZEN metadata (`_centroids`, `_codebooks` —
    * deliberately not retrained on delta, standard PQ maintenance),
    * so the base layout transfers by file copy (or is maintained in
    * place via `path == basePath`), and the delta alone runs once
    * through the builder's exact cell-assignment + residual
    * PQ-encode expressions and is published into its cell directories
    * under its own batch identity (`b = batchId`, dynamic partition
    * overwrite — [[publishDeltaBatch]]'s crash-idempotence contract:
    * run-twice ≡ run-once, and a mid-write death leaves only
    * uncommitted staging) — cost ∝ |delta|. The refreshed index IS an
    * IVF-PQ index, read by [[ivfPqTopKIndexed]] unchanged.
    */
  def deltaInsertIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      basePath: String, delta: DataFrame, embCol: String, idCol: String,
      path: String, batchId: Long = 1L, writeTasks: Int = 4): Unit = {
    require(batchId > BaseBatchId,
      s"delta batchId must be positive (0 is the base build): $batchId")
    if (path != basePath) {
      val conf = spark.sessionState.newHadoopConf()
      val src = new org.apache.hadoop.fs.Path(basePath)
      val dst = new org.apache.hadoop.fs.Path(path)
      val fs = dst.getFileSystem(conf)
      if (fs.exists(dst)) fs.delete(dst, true)
      org.apache.hadoop.fs.FileUtil.copy(src.getFileSystem(conf), src,
        fs, dst, false, conf)
    }
    val centroids = indexMeta(spark, s"$path/_centroids")
      .map(r => r.getAs[Int]("i") -> r.getSeq[Double](1).toSeq)
      .sortBy(_._1).map(_._2)
    require(delta.schema(embCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.ArrayType],
      s"delta $embCol must be an array column")
    // dims guard: a mismatched delta would zip_with into nulls and
    // encode garbage codes silently — fail loudly instead
    delta.limit(1).select(size(col(embCol))).collect().foreach { r =>
      require(r.getInt(0) == centroids.head.size,
        s"delta $embCol has ${r.getInt(0)} dims but the index was " +
          s"built for ${centroids.head.size}")
    }
    val cbRows = indexMeta(spark, s"$path/_codebooks")
    val codebooks: Seq[Seq[Seq[Double]]] = cbRows
      .map(r => (r.getAs[Int]("j"), r.getAs[Int]("i"),
        r.getSeq[Double](r.fieldIndex("centroid")).toSeq))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toSeq)
    val v = toDouble(col(embCol))
    def sq(c: Seq[Double]): Double = c.map(x => x * x).sum
    val cellExpr = array_min(array(centroids.zipWithIndex.map {
      case (c, i) =>
        struct((lit(sq(c)) - lit(2.0) * dot(v, typedlit(c))).as("d"),
          lit(i).as("i"))
    }: _*)).getField("i")
    val centLit = typedlit(centroids.map(_.toSeq))
    val assigned = delta.select(col(idCol), v.as("__v"),
      cellExpr.as("cell"))
    val resid = zip_with(col("__v"), element_at(centLit, col("cell") + 1),
      (a, b) => a - b)
    publishDeltaBatch(
      assigned.select(col(idCol), pqCode(resid, codebooks).as("codes"),
          col("cell"), lit(batchId).as("b"))
        .repartition(writeTasks),
      path)
    idxFrameCache.put(spark, path, spark.read.parquet(path))
    idxMetaCache.put(spark, s"$path/_centroids",
      spark.read.parquet(s"$path/_centroids").collect())
    idxMetaCache.put(spark, s"$path/_codebooks",
      spark.read.parquet(s"$path/_codebooks").collect())
  }

  /** Probe the fused IVF-PQ index: rank cells on the driver against
    * the bounded `_centroids`, scan ONLY the `nProbe` nearest cell
    * partitions, and ADC-score their codes. Because codes quantize
    * residuals, the approximate inner product decomposes exactly as
    *
    *   q·v  =  q·centroid[cell]  +  q·residual
    *        ≈  cellConst[cell]   +  Σ_j LUT_j[code_j]
    *
    * — one m × ksub lookup table (q-subvector · residual-codeword,
    * driver-built, shared by every probed cell) plus a per-cell scalar
    * constant, both shipped as plan literals. The scan reads codes,
    * never vectors; the top `shortlist` candidates' real embeddings
    * are re-read via a broadcast semi-join for the exact cosine
    * re-rank (the q117 contract: output scores are exact, recall is
    * the approximation surface, bounded by nProbe × shortlist).
    */
  def ivfPqTopKIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, corpus: DataFrame, embCol: String, idCol: String,
      query: Seq[Double], k: Int, nProbe: Int = 4,
      shortlist: Int = 100): DataFrame = {
    require(k > 0 && shortlist >= k,
      s"need shortlist ($shortlist) >= k ($k) > 0")
    val centroids = indexMeta(spark, s"$path/_centroids")
      .map(r => r.getAs[Int]("i") -> r.getSeq[Double](1).toSeq)
      .sortBy(_._1)
    require(centroids.nonEmpty && centroids.head._2.size == query.size,
      s"query has ${query.size} dims but the index centroids have " +
        s"${centroids.headOption.map(_._2.size).getOrElse(0)}")
    val cbRows = indexMeta(spark, s"$path/_codebooks")
    val codebooks: Seq[Seq[Seq[Double]]] = cbRows
      .map(r => (r.getAs[Int]("j"), r.getAs[Int]("i"),
        r.getSeq[Double](r.fieldIndex("centroid")).toSeq))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toSeq)
    val m = codebooks.size
    val subLen = codebooks.head.head.size
    def sq(c: Seq[Double]): Double = c.map(x => x * x).sum
    val qCells = centroids.map { case (i, c) =>
      (sq(c) - 2.0 * c.zip(query).map { case (a, b) => a * b }.sum, i)
    }.sortBy(_._1).take(nProbe).map(_._2)
    // q·centroid per cell, indexed by cell id (only probed cells read it)
    val cellConst: Seq[Double] = centroids.map { case (_, c) =>
      c.zip(query).map { case (a, b) => a * b }.sum }
    val luts: Seq[Seq[Double]] = codebooks.zipWithIndex.map { case (cb, j) =>
      val qSub = query.slice(j * subLen, (j + 1) * subLen)
      cb.map(c => c.zip(qSub).map { case (a, b) => a * b }.sum)
    }
    val approx = element_at(typedlit(cellConst), col("cell") + 1) +
      (0 until m).map(j =>
        element_at(typedlit(luts(j)), col("codes").getItem(j) + 1))
        .reduce(_ + _)
    val short = indexFrame(spark, path)
      .filter(col("cell").isin(qCells: _*))
      .select(col(idCol), approx.as("__approx"))
      .orderBy(col("__approx").desc, col(idCol))
      .limit(shortlist)
    corpus.join(broadcast(short.select(col(idCol))), Seq(idCol), "left_semi")
      .select(col(idCol), scoreAgainst(col(embCol), query).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Build the persisted k-NN GRAPH index — the HNSW-class scale path
    * re-expressed for a scan-oriented engine. Construction is fully
    * distributed and blocked (never all-pairs):
    *
    *   0. identical vectors are exact-deduped FIRST (the
    *      [[blockedNearDupPairs]] / corpus-dedup order): the graph is
    *      built over one REPRESENTATIVE per distinct vector, each
    *      index row carrying its exact-duplicate member-id list — a
    *      re-crawled corpus where every embedding has 100 twins
    *      multiplies only the OUTPUT expansion, never the quadratic
    *      pairing (without this, the in-cell join grows with the
    *      square of the twin factor);
    *   1. a bounded k-means coarse quantizer (the IVF machinery)
    *      partitions the distinct vectors into `nCells` cells; every
    *      vector is assigned to its `buildProbes` NEAREST cells, so
    *      adjacent cells overlap and the finished graph is navigable
    *      ACROSS cell boundaries (the stitch that pure IVF lacks);
    *   2. within each cell, candidate pairs come from a blocked
    *      self-join (quadratic only in the cell's DISTINCT vectors;
    *      cells above `maxCellSize` are excluded from pairing — an
    *      oversize cell means the quantizer is too coarse, split it
    *      with a larger `nCells`) and each vector keeps its `m` best
    *      neighbors via the bounded-heap [[graft.functions.TopKAgg]];
    *   3. index rows (rep id, vector, neighbor-id list, member-id
    *      list) are written partitioned by `shard = id mod nShards`,
    *      so a probe's frontier fetch is a PARTITION-PRUNED point
    *      read — the 100 TB posture is "bucketed adjacency table",
    *      not "graph in one memory image". The member list is the
    *      exact-dup group (sorted, deterministic); a deployment with
    *      pathological twin piles would spill it to a side table, the
    *      q31/q32 expansion-edge pattern;
    *   4. one medoid id per cell (the rep nearest its centroid) is
    *      stored as `_seeds` bounded metadata — the probe's entry
    *      points.
    */
  def buildKnnGraphIndex(corpus: DataFrame, embCol: String, idCol: String,
      path: String, m: Int = 12, nCells: Int = 8, buildProbes: Int = 2,
      seed: Long = 42L, nShards: Int = 8, maxCellSize: Int = 100000,
      writeTasks: Int = 8): Unit = {
    require(m > 0 && nCells > 0 && buildProbes > 0 && buildProbes <= nCells,
      s"bad graph config: m=$m nCells=$nCells buildProbes=$buildProbes")
    import graft.functions.TopKAgg
    val spark = corpus.sparkSession
    val centroids = trainCentroids(corpus, embCol, nCells, seed)
    def sq(c: Seq[Double]): Double = c.map(x => x * x).sum
    // |v-c|² ranking by |c|² - 2 v·c (|v|² common): top-`buildProbes`
    // cells via one sorted bounded struct array — a codegen'd argmin
    // generalization of buildIvfIndex's array_min
    val cellStructs = array_sort(array(centroids.zipWithIndex.map {
      case (c, i) => struct(
        (lit(sq(c)) - lit(2.0) * dot(col("v"), typedlit(c))).as("d"),
        lit(i).as("i"))
    }: _*))
    // exact-dedup grouping as ONE partial-aggregated groupBy on the
    // vector value: min-id rep + sorted member list in the same pass
    // (the former window-over-v + separate members groupBy + write-time
    // members join shuffled the full vector frame twice and joined a
    // third frame back; min and collect_list ride one exchange).
    // `base` is locally persisted — NOT the shared HeavyPersist
    // registry: index prebuilds run concurrently (Bench overlaps them)
    // and a sibling build opening a fresh scope would evict this frame
    // mid-build — because the pairing, the index write, and the seed
    // election all reread it.
    val base = corpus
      .filter(col(idCol).isNotNull && col(embCol).isNotNull)
      .select(col(idCol).as("id"), toDouble(col(embCol)).as("v"))
      .groupBy(col("v"))
      .agg(min(col("id")).as("id"),
        sort_array(collect_list(col("id"))).as("members"))
      .select(col("id"), col("v"), col("members"),
        slice(cellStructs, 1, buildProbes).as("cells"),
        cellStructs.getItem(0).getField("i").as("home"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val assigned = base
      .select(col("id"), col("v"), col("home"),
        col("cells").getField("i").as("cellsArr"),
        explode(col("cells").getField("i")).as("cell"))
      .select(col("id"), col("v"), col("home"), col("cellsArr"),
        col("cell"), norm(col("v")).as("n"))
      // zero-norm vectors have no defined similarity: they stay in the
      // index (empty neighbor list, never ranked) but can't pair —
      // and under ANSI mode the cosine division would throw, not NaN
      .filter(col("n") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // hot-cell guard: size counts ride the same cell partitioning the
      // self-join shuffles on; the full counts are tiny (nCells rows)
      // and also persist as `_cellsizes` metadata AFTER the main write
      // (which overwrite-clears the index root) so a delta insert
      // reproduces the cap decision without re-scanning the corpus
      val rawSizes = assigned.groupBy("cell")
        .agg(count(lit(1)).as("sz")).collect()
      val capped = rawSizes.filter(_.getLong(1) > maxCellSize)
        .map(_.getInt(0)).toSeq
      val bounded =
        if (capped.isEmpty) assigned
        else assigned.filter(!col("cell").isin(capped: _*))
      // each point's UNCAPPED probe cells — the pair-dedup key below
      val oc = array_except(col("cellsArr"),
        typedlit(capped.map(_.toInt)))
      val a = bounded.select(col("cell"), col("id"), col("v"), col("n"),
        oc.as("oc"))
      val b = bounded.select(col("cell"), col("id").as("id_b"),
        col("v").as("v_b"), col("n").as("n_b"), oc.as("oc_b"))
      // two overlapping cells can propose the same pair — it must be
      // kept ONCE or the duplicate occupies two of the m heap slots.
      // The former `.distinct()` re-shuffled the full (quadratic) pair
      // frame to do that; instead each pair elects the row in the
      // SMALLEST uncapped cell the two points share — a per-row filter
      // (both sides carry their uncapped probe-cell arrays), no
      // exchange, exactly one surviving row per ordered pair, and the
      // cosine is computed only on survivors. Duplicate rows carry the
      // identical deterministic score, so the kept row equals whatever
      // row distinct() retained.
      val pairs = a.join(b, Seq("cell"))
        .filter(col("id") =!= col("id_b"))
        .filter(col("cell") ===
          array_min(array_intersect(col("oc"), col("oc_b"))))
        .select(col("id"), col("id_b"),
          (dot(col("v"), col("v_b")) / (col("n") * col("n_b"))).as("s"))
        .filter(col("s").isNotNull && !isnan(col("s")))
      val adjacency = pairs.groupBy("id")
        .agg(TopKAgg.topK(m)(col("id_b"), col("s")).as("top"))
        .select(col("id"), col("top.id").as("nbrs"),
          col("top.score").as("nscores"))
      // The written row carries everything a DELTA INSERT needs to
      // reproduce rebuild semantics without re-pairing the corpus:
      // `home`/`cells` (the deterministic assignment — touched-cell
      // pruning and exact-twin detection), `nscores` (edge scores —
      // merging new edges under the same top-m order requires the old
      // edges' scores, which ids alone cannot recover).
      graft.sources.Layout.writePartitioned(
        base.select(col("id"), col("v"), col("home"),
            col("cells").getField("i").as("cells"), col("members"))
          .join(adjacency, Seq("id"), "left")
          .select(col("id"), col("v"), col("home"), col("cells"),
            coalesce(col("nbrs"), typedlit(Seq.empty[Long])).as("nbrs"),
            coalesce(col("nscores"), typedlit(Seq.empty[Double]))
              .as("nscores"),
            col("members"),
            pmod(col("id"), lit(nShards.toLong)).as("shard")),
        path, Seq("shard"), writeTasks)
      // per-cell medoid = member whose |v-c|² rank within its HOME cell
      // is 1 (ties on id) — bounded metadata, one row per cell.
      // Zero-norm vectors are excluded (same guard as `assigned`): a
      // zero-norm seed is unscorable at probe time — its row would be
      // dropped by the score null-guard, silently losing the cell's
      // entry point.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("home"))
        .orderBy(col("cells").getItem(0).getField("d"), col("id"))
      base.select(col("id"), col("home"), col("cells"), col("v"))
        .filter(norm(col("v")) > 0)
        .drop("v")
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("home").as("cell"), col("id"))
        .coalesce(1).write.mode("overwrite").parquet(s"$path/_seeds")
      import spark.implicits._
      // build parameters + the trained centroids ride as bounded
      // metadata so a delta insert can reproduce the assignment and
      // cap decisions a rebuild would make
      Seq((m, nCells, nShards, buildProbes, maxCellSize))
        .toDF("m", "n_cells", "n_shards", "build_probes", "max_cell_size")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/_meta")
      centroids.zipWithIndex.map { case (c, i) => (i, c) }
        .toDF("cell", "c")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/_centroids")
      rawSizes.map(r => (r.getInt(0), r.getLong(1))).toSeq
        .toDF("cell", "sz")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/_cellsizes")
      idxFrameCache.put(spark, path, spark.read.parquet(path))
      idxMetaCache.put(spark, s"$path/_seeds",
        spark.read.parquet(s"$path/_seeds").collect())
      idxMetaCache.put(spark, s"$path/_meta",
        spark.read.parquet(s"$path/_meta").collect())
    } finally {
      assigned.unpersist(blocking = false)
      base.unpersist(blocking = false)
    }
  }

  /** INCREMENTAL DELTA INSERT into a persisted k-NN graph index
    * (r10 verdict lever c) — tonight's batch joins the graph without a
    * corpus rebuild, completing the index-maintenance story the
    * minhash (q104) and winnow-anchor (q182) indexes already have:
    *
    *   1. Delta rows exact-dedup on the vector value; groups whose
    *      vector ALREADY EXISTS in the index merge into that node's
    *      member list (detected by a (home, v) equality join against
    *      the stored assignment — identical vectors assign
    *      identically, so the join is bounded by the touched home
    *      cells, never the corpus).
    *   2. NOVEL vectors assign to their `build_probes` nearest cells
    *      using the PERSISTED centroids (`_centroids`) — the same
    *      deterministic expression the builder ran.
    *   3. Pairing happens ONLY in touched cells: novel reps score
    *      against the existing nodes assigned there (read off the
    *      stored `cells` column) plus each other, under the rebuilt
    *      cell-size cap (`max_cell_size` from `_meta`, counts =
    *      existing + delta, exactly what a rebuild would see).
    *   4. Adjacency merges under the SAME top-m order the builder's
    *      heap used ((score desc, id asc)): novel nodes take the
    *      top-m of their pairs; touched existing nodes merge their
    *      stored (nbrs, nscores) edges with the new pairs — top-m of
    *      a union equals the merge of top-m lists, so the result is
    *      bit-identical to a full rebuild's adjacency.
    *   5. Seeds of touched HOME cells are re-ranked (a novel vector
    *      can dethrone a medoid); untouched cells keep theirs.
    *
    * The refreshed index is written to `outPath` (the base is left
    * intact — versioned-index deployment shape; at petabyte scale the
    * final copy-through write becomes a dynamic partition overwrite of
    * the touched shards). Rebuild-equivalence caveats, both declared:
    * delta ids must exceed existing ids (else the rebuild would pick a
    * different group representative id — member-level results are
    * unchanged either way), and a cell crossing its size cap mid-life
    * needs a rebuild (the cap drops pairs retroactively; inserts never
    * remove edges).
    *
    * CRASH IDEMPOTENCE: every write below targets `outPath` with
    * overwrite semantics and reads only the UNTOUCHED `basePath` — a
    * job that dies mid-write leaves a partial `outPath` that the
    * re-run simply rewrites from the same inputs (run-twice ≡
    * run-once); readers adopt `outPath` only after the job completes
    * (the versioned-index publish step). The in-place IVF/IVF-PQ
    * deltas need the `b = batchId` partition identity instead because
    * they mutate the live index; this operator never does.
    */
  def deltaInsertKnnGraph(spark: org.apache.spark.sql.SparkSession,
      basePath: String, delta: DataFrame, embCol: String, idCol: String,
      outPath: String, writeTasks: Int = 8): Unit = {
    import graft.functions.TopKAgg
    val meta = spark.read.parquet(s"$basePath/_meta").head()
    val m = meta.getAs[Int]("m")
    val nShards = meta.getAs[Int]("n_shards")
    val buildProbes = meta.getAs[Int]("build_probes")
    val maxCellSize = meta.getAs[Int]("max_cell_size")
    val centroids = spark.read.parquet(s"$basePath/_centroids")
      .orderBy("cell").collect()
      .map(r => r.getSeq[Double](1).toSeq).toSeq
    def sq(c: Seq[Double]): Double = c.map(x => x * x).sum
    val cellStructs = array_sort(array(centroids.zipWithIndex.map {
      case (c, i) => struct(
        (lit(sq(c)) - lit(2.0) * dot(col("v"), typedlit(c))).as("d"),
        lit(i).as("i"))
    }: _*))
    val baseIdx = spark.read.parquet(basePath)
    // 1. delta exact-dedup + deterministic assignment
    val dGroups = graft.HeavyPersist(delta
      .filter(col(idCol).isNotNull && col(embCol).isNotNull)
      .select(col(idCol).as("id"), toDouble(col(embCol)).as("v"))
      .groupBy(col("v"))
      .agg(min(col("id")).as("id"),
        sort_array(collect_list(col("id"))).as("dmembers"))
      .select(col("id"), col("v"), col("dmembers"),
        slice(cellStructs, 1, buildProbes).getField("i").as("cells"),
        cellStructs.getItem(0).getField("i").as("home")))
    val deltaHomes = dGroups.select(col("home")).distinct()
      .collect().map(_.getInt(0)).toSet
    // twin split: vector already a node -> members merge only
    val twins = graft.HeavyPersist(dGroups
      .join(baseIdx.filter(col("home").isin(deltaHomes.toSeq: _*))
          .select(col("id").as("eid"), col("home"), col("v")),
        Seq("home", "v"))
      .select(col("id").as("dgid"), col("eid"), col("dmembers")),
      freshScope = false)
    val novel = graft.HeavyPersist(dGroups
      .join(twins.select(col("dgid").as("id")), Seq("id"), "left_anti"),
      freshScope = false)
    // 2-3. touched-cell pairing under the rebuilt cap
    val novelAssigned = novel
      .select(col("id"), col("v"), explode(col("cells")).as("cell"),
        norm(col("v")).as("n"))
      .filter(col("n") > 0)
    val touchedCells = novel.select(explode(col("cells")).as("cell"))
      .distinct().collect().map(_.getInt(0)).toSet
    val existAssigned = baseIdx
      .filter(arrays_overlap(col("cells"),
        typedlit(touchedCells.toSeq.sorted)))
      .select(col("id"), col("v"), explode(col("cells")).as("cell"),
        norm(col("v")).as("n"))
      .filter(col("cell").isin(touchedCells.toSeq: _*) && col("n") > 0)
    // rebuild-equivalent cap: stored per-cell assignment counts
    // (bounded `_cellsizes` metadata) plus the delta's — no corpus
    // scan. The UPDATED counts are rewritten below so the next insert
    // sees tonight's batch in its cap arithmetic too.
    val storedSizes = spark.read.parquet(s"$basePath/_cellsizes")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val novelSizes = novelAssigned.groupBy("cell")
      .agg(count(lit(1)).as("sz")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val mergedSizes = (storedSizes.keySet ++ novelSizes.keySet).toSeq
      .map(c => c -> (storedSizes.getOrElse(c, 0L) +
        novelSizes.getOrElse(c, 0L)))
    val okCells = mergedSizes.filter(_._2 <= maxCellSize).map(_._1)
    val cellSizes = {
      import spark.implicits._
      okCells.toDF("cell")
    }
    val novelCapped = graft.HeavyPersist(
      novelAssigned.join(broadcast(cellSizes), "cell"), freshScope = false)
    val pool = existAssigned.join(broadcast(cellSizes), "cell")
      .select(col("cell"), col("id").as("id_b"), col("v").as("v_b"),
        col("n").as("n_b"))
      .unionAll(novelCapped.select(col("cell"), col("id").as("id_b"),
        col("v").as("v_b"), col("n").as("n_b")))
    val pairs = graft.HeavyPersist(
      novelCapped.join(pool, Seq("cell"))
        .filter(col("id") =!= col("id_b"))
        .select(col("id"), col("id_b"),
          (dot(col("v"), col("v_b")) / (col("n") * col("n_b"))).as("s"))
        .filter(col("s").isNotNull && !isnan(col("s")))
        .distinct(), freshScope = false)
    // 4. adjacency: novel top-m; existing merge old+new under the
    //    same (score desc, id asc) order
    val novelAdj = pairs.groupBy("id")
      .agg(TopKAgg.topK(m)(col("id_b"), col("s")).as("top"))
    val novelIds = novel.select(col("id").as("id_b"))
    val existNew = pairs.join(novelIds, Seq("id_b"), "left_anti")
      .select(col("id_b").as("id"), col("id").as("id_b"), col("s"))
      .groupBy("id")
      .agg(TopKAgg.topK(m)(col("id_b"), col("s")).as("newtop"))
    val cmp = (l: Column, r: Column) =>
      when(l.getField("score") > r.getField("score"), -1)
        .when(l.getField("score") < r.getField("score"), 1)
        .when(l.getField("id") < r.getField("id"), -1)
        .when(l.getField("id") > r.getField("id"), 1)
        .otherwise(0)
    val updatedExisting = baseIdx
      .join(existNew, Seq("id"), "left")
      .join(twins, baseIdx("id") === twins("eid"), "left")
      .withColumn("__merged",
        when(col("newtop").isNotNull,
          slice(array_sort(concat(
            zip_with(col("nbrs"), col("nscores"),
              (i, s) => struct(i.as("id"), s.as("score"))),
            col("newtop")), cmp), 1, m)))
      .select(col("id"), col("v"), col("home"), col("cells"),
        when(col("__merged").isNotNull, col("__merged").getField("id"))
          .otherwise(col("nbrs")).as("nbrs"),
        when(col("__merged").isNotNull, col("__merged").getField("score"))
          .otherwise(col("nscores")).as("nscores"),
        when(col("dmembers").isNotNull,
          sort_array(concat(col("members"), col("dmembers"))))
          .otherwise(col("members")).as("members"),
        col("shard"))
    val newRows = novel
      .join(novelAdj, Seq("id"), "left")
      .select(col("id"), col("v"), col("home"), col("cells"),
        coalesce(col("top").getField("id"), typedlit(Seq.empty[Long]))
          .as("nbrs"),
        coalesce(col("top").getField("score"), typedlit(Seq.empty[Double]))
          .as("nscores"),
        col("dmembers").as("members"),
        pmod(col("id"), lit(nShards.toLong)).as("shard"))
    graft.sources.Layout.writePartitioned(
      updatedExisting.unionAll(newRows), outPath, Seq("shard"), writeTasks)
    // 5. seeds: re-rank touched HOME cells over existing + novel
    val touchedHomes = novel.select(col("home")).distinct()
      .collect().map(_.getInt(0)).toSet
    val oldSeeds = spark.read.parquet(s"$basePath/_seeds")
    val mergedSeeds = if (touchedHomes.isEmpty) oldSeeds else {
      val dHome = touchedHomes.toSeq.sorted.foldLeft(lit(null).cast("double")) {
        (acc, c) => when(col("home") === c,
          lit(sq(centroids(c))) - lit(2.0) * dot(col("v"), typedlit(centroids(c))))
          .otherwise(acc)
      }
      val candidates = baseIdx.select(col("id"), col("home"), col("v"))
        .unionAll(novel.select(col("id"), col("home"), col("v")))
        .filter(col("home").isin(touchedHomes.toSeq: _*) &&
          norm(col("v")) > 0)
        .withColumn("__d", dHome)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("home")).orderBy(col("__d"), col("id"))
      oldSeeds.filter(!col("cell").isin(touchedHomes.toSeq: _*))
        .unionAll(candidates.withColumn("__rk", row_number().over(w))
          .filter(col("__rk") === 1)
          .select(col("home").as("cell"), col("id")))
    }
    mergedSeeds.coalesce(1).write.mode("overwrite")
      .parquet(s"$outPath/_seeds")
    spark.read.parquet(s"$basePath/_meta")
      .coalesce(1).write.mode("overwrite").parquet(s"$outPath/_meta")
    spark.read.parquet(s"$basePath/_centroids")
      .coalesce(1).write.mode("overwrite").parquet(s"$outPath/_centroids")
    locally {
      import spark.implicits._
      mergedSizes.toDF("cell", "sz")
        .coalesce(1).write.mode("overwrite").parquet(s"$outPath/_cellsizes")
    }
    idxFrameCache.put(spark, outPath, spark.read.parquet(outPath))
    idxMetaCache.put(spark, s"$outPath/_seeds",
      spark.read.parquet(s"$outPath/_seeds").collect())
    idxMetaCache.put(spark, s"$outPath/_meta",
      spark.read.parquet(s"$outPath/_meta").collect())
  }

  /** Best-first beam search over the persisted k-NN graph — the query
    * path of the HNSW-class index. Each round fetches the frontier's
    * rows from the bucketed adjacency table (a partition-pruned point
    * read of ≤ beam·m rows — `PartitionFilters` on `shard`, then the
    * id IN-list), scores them with the same codegen'd cosine every
    * other ANN path uses, and expands the `beam` best not-yet-expanded
    * nodes' neighbor lists into the next frontier. The driver holds
    * only (id, score) pairs and neighbor-id lists for visited nodes —
    * O(rounds · beam · m) bounded metadata, the same collect class as
    * the IVF/PQ codebooks — and the loop is bounded by `maxRounds`
    * (graph diameter under beam search, NOT data size; rounds stop
    * early once no unvisited candidate remains). Scores are computed
    * IN Spark (scoreAgainst), so output values are bit-identical to
    * every other ANN variant and the exact oracle.
    *
    * The graph holds one node per DISTINCT vector; the final ranking
    * expands each candidate rep over its exact-duplicate member list
    * (identical vectors ⇒ identical scores) and re-sorts on
    * (score desc, id) — so ties resolve to the smallest member ids,
    * exactly as the brute-force oracle orders them.
    */
  /** Last graph probe's (rounds used, nodes scored, nodes expanded) —
    * diagnostic-only telemetry so the 100x rehearsal can RECORD that
    * the beam loop's driver-state bound holds at scale (SCALE.md q180
    * row) instead of asserting it. Overwritten per probe; not part of
    * any query result.
    */
  @volatile var lastGraphProbeStats: (Int, Int, Int) = (0, 0, 0)

  def graphTopKIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, query: Seq[Double], k: Int,
      beam: Int = 32, maxRounds: Int = 8): DataFrame = {
    require(k > 0 && beam >= k, s"need beam ($beam) >= k ($k) > 0")
    val meta = indexMeta(spark, s"$path/_meta").head
    val nShards = meta.getAs[Int]("n_shards")
    val seeds = indexMeta(spark, s"$path/_seeds").map(_.getAs[Long]("id"))
    val scored = scala.collection.mutable.HashMap.empty[Long, Double]
    val nbrsOf = scala.collection.mutable.HashMap.empty[Long, Seq[Long]]
    val membersOf = scala.collection.mutable.HashMap.empty[Long, Seq[Long]]
    val expanded = scala.collection.mutable.HashSet.empty[Long]
    var toScore: Seq[Long] = seeds.toSeq.distinct
    var rounds = 0
    while (toScore.nonEmpty && rounds < maxRounds) {
      // floorMod, NOT %: the index writes `shard` with pmod, so a
      // negative id hashed with Scala `%` would produce a negative
      // shard that matches no partition and silently prunes the row
      val shards = toScore
        .map(id => java.lang.Math.floorMod(id, nShards.toLong)).distinct
      val rows = indexFrame(spark, path)
        .filter(col("shard").isin(shards: _*) &&
          col("id").isin(toScore: _*))
        // the norm guard keeps ANSI division from throwing on a
        // zero-norm row; such rows simply never rank
        .select(col("id"),
          when(norm(col("v")) > lit(0.0),
            scoreAgainst(col("v"), query)).as("score"),
          col("nbrs"), col("members"))
        .filter(col("score").isNotNull && !isnan(col("score")))
        .collect()
      rows.foreach { r =>
        scored.update(r.getLong(0), r.getDouble(1))
        nbrsOf.update(r.getLong(0), r.getSeq[Long](2))
        membersOf.update(r.getLong(0), r.getSeq[Long](3))
      }
      val frontier = scored.toSeq.filterNot(p => expanded(p._1))
        .sortBy(p => (-p._2, p._1)).take(beam)
      expanded ++= frontier.map(_._1)
      toScore = frontier.flatMap(p => nbrsOf.getOrElse(p._1, Nil))
        .distinct.filterNot(scored.contains)
      rounds += 1
    }
    lastGraphProbeStats = (rounds, scored.size, expanded.size)
    import spark.implicits._
    // member expansion: only the reps that can place members in the
    // top k matter — take the k best reps first (each contributes >= 1
    // member), THEN expand and re-rank, so a twin pile never inflates
    // the driver-side sort beyond k * max(|members|) of k reps
    scored.toSeq.sortBy(p => (-p._2, p._1)).take(k)
      .flatMap { case (rid, s) =>
        membersOf.getOrElse(rid, Seq(rid)).map(mid => (mid, s)) }
      .sortBy(p => (-p._2, p._1)).take(k)
      .toDF(idCol, "score")
  }

  /** Top principal component of an embedding column: (mean, unit
    * eigenvector, eigenvalue, n) — the one-dimensional PCA that
    * underlies embedding whitening, drift axes, and "spectral" data
    * pruning. Distributed work is ONE pass: the
    * [[graft.functions.VecAggs.vecMoments]] aggregate ships a single
    * O(d²) buffer per partition (Σx, upper-triangular Σx·xᵀ, n); the
    * d × d covariance (E[xxᵀ] − μμᵀ) and the power iteration on it
    * are driver-side arithmetic on that bounded metadata — 64×64 at
    * any corpus size, the same collect class as the IVF/PQ codebooks.
    * Deterministic: fixed uniform init, fixed 200 iterations, sign
    * fixed so the largest-|loading| coordinate is positive.
    */
  def topPrincipalComponent(corpus: DataFrame, embCol: String)
      : (Seq[Double], Seq[Double], Double, Long) = {
    val row = corpus
      .agg(graft.functions.VecAggs.vecMoments(
        toDouble(col(embCol))).as("m"))
      .selectExpr("m.sums AS sums", "m.outer AS outer", "m.n AS n")
      .head()
    val sums = row.getSeq[Double](0)
    val outer = row.getSeq[Double](1)
    val n = row.getLong(2)
    require(n > 0, "topPrincipalComponent on an empty corpus")
    val d = sums.size
    val mean = sums.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var k = 0
    for (i <- 0 until d; j <- i until d) {
      val c = outer(k) / n - mean(i) * mean(j)
      cov(i)(j) = c
      cov(j)(i) = c
      k += 1
    }
    def matVec(v: Array[Double]): Array[Double] = {
      val r = new Array[Double](d)
      for (i <- 0 until d) {
        var s = 0.0
        var j = 0
        while (j < d) { s += cov(i)(j) * v(j); j += 1 }
        r(i) = s
      }
      r
    }
    def normalize(v: Array[Double]): Array[Double] = {
      val nm = math.sqrt(v.map(x => x * x).sum)
      if (nm == 0.0) v else v.map(_ / nm)
    }
    var v = normalize(Array.fill(d)(1.0))
    for (_ <- 0 until 200) v = normalize(matVec(v))
    // sign convention: largest-|loading| coordinate positive
    val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
    if (v(pivot) < 0) v = v.map(-_)
    val cv = matVec(v)
    val lambda = v.zip(cv).map { case (a, b) => a * b }.sum
    (mean.toSeq, v.toSeq, lambda, n)
  }

  /** Centered projection of every vector onto the top principal
    * component: (id, proj). Mean and eigenvector reach the scan as
    * array literals (broadcast-by-literal), the dot product is the
    * codegen'd `zip_with`/`aggregate` pipeline — a pure map over the
    * corpus, no shuffle.
    */
  def pcaProject(corpus: DataFrame, embCol: String, idCol: String,
      mean: Seq[Double], pc: Seq[Double]): DataFrame = {
    val centered = zip_with(toDouble(col(embCol)), typedlit(mean),
      (x, m) => x - m)
    val proj = aggregate(
      zip_with(centered, typedlit(pc), (x, w) => x * w),
      lit(0.0), (acc, x) => acc + x)
    corpus.select(col(idCol), proj.as("proj"))
  }
}
