package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Sampling, Similarity, TextAnalysis}

/** Extended LLM-training-data-pipeline operators (BASELINE.json north
  * star; SURVEY.md §2.10): dedup, similarity search, text analysis.
  * Oracle SQL is declared where DuckDB can express the exact semantics
  * (md5 grouping, list_cosine_similarity, string/list functions);
  * hash-based operators (xxhash64 minhash/simhash/fingerprint) have no
  * DuckDB twin and are pinned by ScalaTest specs instead (allowed by
  * the driver contract — rows-only check).
  */
object ExtendedQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  import Query.{dsum => dsumq}

  /** The similarity query vector: embedding of vec_id = 0, collected
    * once at plan-build time — it is the query *parameter*, not data.
    * Cached per (session, dir): three ANN queries share it, and the
    * head() collect is pure fixed overhead when re-derived per query.
    */
  private val qvCache = new graft.SessionCache[Seq[Double]]
  private def queryVec(s: SparkSession, dir: String): Seq[Double] =
    qvCache.get(s, dir)(
      t(s, dir, "embeddings").filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0).toSeq)

  /** The ANN recall-contract output shape, shared by q49/q117/q203/
    * q204: one row PER EXACT top-10 id (the in-engine brute-force
    * reference — emitted so DuckDB keeps cross-checking the exact
    * scorer itself; a constant-row contract would let a common-mode
    * bug in `scoreAgainst` pass unseen, since the probe paths re-rank
    * with the same expression), plus the probe-side contract columns:
    * `n_returned` (probe row count) and `recall_ok` (probe recovered
    * ≥ `floor` of the true 10). Both aggregates are 1-row broadcasts.
    */
  private def recallContract(got: DataFrame, exact: DataFrame,
      floor: Int): DataFrame = {
    val overlap = got.select(col("vec_id"))
      .join(exact.select(col("vec_id")), Seq("vec_id"), "left_semi")
    exact.select(col("vec_id"))
      .crossJoin(broadcast(got.agg(count(lit(1)).as("n_returned"))))
      .crossJoin(broadcast(
        overlap.agg((count(lit(1)) >= floor).as("recall_ok"))))
      .orderBy("vec_id")
  }

  /** The embedding near-dup pair set, persisted once per (session,
    * dir): q39 reports it and q67 clusters it — in a real pipeline the
    * pair set is materialized once and consumed by both, so the
    * declared queries share the same frame (the Tables/queryVec
    * pattern). Tiny (pairs above threshold), so the persist is cheap.
    */
  private val pairsCache = new graft.SessionCache[DataFrame]
  private def nearDupPairs(s: SparkSession, dir: String): DataFrame =
    pairsCache.get(s, dir)(
      Similarity.blockedNearDupPairs(t(s, dir, "embeddings"), "embedding",
          "vec_id", "label", threshold = 0.35)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** The recursive connected-components closure over the q39 pair
    * graph, shared by the q67 and q91 oracles: `reach(id, r)` holds
    * every (vertex, reachable vertex) pair, so MIN(r) per id is the
    * component label.
    */
  private val componentsCte =
    """WITH RECURSIVE
      |bs AS (
      |  SELECT label, COUNT(DISTINCT embedding) AS nreps
      |  FROM embeddings GROUP BY label),
      |ok AS (
      |  SELECT e.vec_id, e.embedding, e.label FROM embeddings e
      |  JOIN bs USING (label) WHERE bs.nreps <= 10000),
      |pairs AS (
      |  SELECT id_a, id_b FROM (
      |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |      ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |        CAST(b.embedding AS DOUBLE[])), 6) AS score
      |    FROM ok a JOIN ok b
      |      ON a.label = b.label AND a.vec_id < b.vec_id)
      |  WHERE score >= 0.35),
      |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
      |          UNION ALL SELECT id_b, id_a FROM pairs),
      |reach(id, r) AS (
      |  SELECT vec_id, vec_id FROM embeddings
      |  UNION
      |  SELECT r.id, e.b FROM reach r JOIN edges e ON e.a = r.r)""".stripMargin

  /** Persisted ANN indexes, built once per (session, sfDir) into a
    * temp dir — the index build is the amortized cost (one write job);
    * every probe after it is a partition-pruned scan. Mirrors a real
    * deployment where the index is written beside the corpus. Temp
    * dirs are registered for recursive deletion at JVM exit (cache
    * eviction alone would drop the path but orphan the files).
    */
  private[queries] def newIdxDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      import java.nio.file.{Files, Path}
      import scala.jdk.CollectionConverters._
      if (Files.exists(p)) {
        val all = Files.walk(p).iterator().asScala.toSeq
        all.sortBy(-_.getNameCount).foreach(f =>
          try Files.deleteIfExists(f) catch { case _: Exception => () })
      }
    }
    p.toString
  }
  private val lshIdxCache = new graft.SessionCache[String]
  private def lshIndexPath(s: SparkSession, dir: String): String =
    lshIdxCache.get(s, dir) {
      val p = newIdxDir("graft_lsh_idx")
      Similarity.buildLshIndex(t(s, dir, "embeddings"), "embedding",
        "vec_id", p, planesPerBand = 6, bands = 4)
      p
    }
  private val ivfIdxCache = new graft.SessionCache[String]
  private def ivfIndexPath(s: SparkSession, dir: String): String =
    ivfIdxCache.get(s, dir) {
      val p = newIdxDir("graft_ivf_idx")
      Similarity.buildIvfIndex(t(s, dir, "embeddings"), "embedding",
        "vec_id", p, nClusters = 16)
      p
    }
  private val pqIdxCache = new graft.SessionCache[String]
  private def pqIndexPath(s: SparkSession, dir: String): String =
    pqIdxCache.get(s, dir) {
      val p = newIdxDir("graft_pq_idx")
      Similarity.buildPqIndex(t(s, dir, "embeddings"), "embedding",
        "vec_id", p, m = 8, ksub = 16)
      p
    }
  private val ivfpqIdxCache = new graft.SessionCache[String]
  private def ivfpqIndexPath(s: SparkSession, dir: String): String =
    ivfpqIdxCache.get(s, dir) {
      val p = newIdxDir("graft_ivfpq_idx")
      // m=16 (4-d subspaces): near-uniform synthetic vectors are PQ's
      // declared worst case (q117 note), and the COMPOSITE index
      // compounds residual-quantization noise with IVF cell pruning —
      // the finer subspace grid keeps the ADC shortlist honest at
      // every verify scale while still compressing 16× vs float32
      Similarity.buildIvfPqIndex(t(s, dir, "embeddings"), "embedding",
        "vec_id", p, nClusters = 16, m = 16, ksub = 16)
      p
    }
  private val graphIdxCache = new graft.SessionCache[String]
  private def graphIndexPath(s: SparkSession, dir: String): String =
    graphIdxCache.get(s, dir) {
      val p = newIdxDir("graft_knng_idx")
      Similarity.buildKnnGraphIndex(t(s, dir, "embeddings"), "embedding",
        "vec_id", p, m = 12, nCells = 8, buildProbes = 2)
      p
    }
  private val graphDeltaCache = new graft.SessionCache[String]

  /** The q188 REFRESHED graph index: tonight's delta (every 10th
    * vector re-ingested under new ids — exact twins — plus every
    * (10k+5)th vector with its first coordinate shifted by +0.25 —
    * novel vectors) inserted incrementally into the q180 base index.
    * The insert is timed as part of q188's first run in a session
    * (the daily-ingest cost); the base index stays untouched for
    * q180.
    */
  private def graphDeltaIndexPath(s: SparkSession, dir: String): String =
    graphDeltaCache.get(s, dir) {
      val base = graphIndexPath(s, dir)
      val p = newIdxDir("graft_knng_delta_idx")
      val emb = t(s, dir, "embeddings")
      val delta = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))
        .unionAll(emb.filter(col("vec_id") % 10 === 5)
          .select((col("vec_id") + 3000000L).as("vec_id"),
            transform(col("embedding").cast("array<double>"),
              (x, i) => when(i === 0, x + lit(0.25)).otherwise(x))
              .as("embedding")))
      Similarity.deltaInsertKnnGraph(s, base, delta, "embedding",
        "vec_id", p)
      p
    }

  /** The q203 REFRESHED IVF index: the same delta convention as q188
    * (every 10th vector re-ingested under new ids — exact float-
    * verbatim twins — plus every (10k+5)th with its FIRST COORDINATE
    * NEGATED: float negation is exact, so the novel vectors are
    * bit-identical in both engines, unlike an additive perturbation
    * on float32), appended into a file-copied q49 base via the stored
    * codebook. Insert timed in q203's first session run; base
    * untouched for q49.
    */
  private val ivfDeltaCache = new graft.SessionCache[String]
  private def ivfDeltaFrame(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))
      .unionAll(emb.filter(col("vec_id") % 10 === 5)
        .select((col("vec_id") + 3000000L).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, -x).otherwise(x)).as("embedding")))
  }
  private def ivfDeltaIndexPath(s: SparkSession, dir: String): String =
    ivfDeltaCache.get(s, dir) {
      val base = ivfIndexPath(s, dir)
      val p = newIdxDir("graft_ivf_delta_idx")
      Similarity.deltaInsertIvfIndex(s, base, ivfDeltaFrame(s, dir),
        "embedding", "vec_id", p)
      p
    }

  /** The q211 REFRESHED IVF-PQ index: the q203 delta convention
    * inserted incrementally (frozen quantizers, file-copied base,
    * delta-only encode) into the q204 base. Insert timed in q211's
    * first session run; base untouched for q204.
    */
  private val ivfpqDeltaCache = new graft.SessionCache[String]
  private def ivfpqDeltaIndexPath(s: SparkSession, dir: String): String =
    ivfpqDeltaCache.get(s, dir) {
      val base = ivfpqIndexPath(s, dir)
      val p = newIdxDir("graft_ivfpq_delta_idx")
      Similarity.deltaInsertIvfPqIndex(s, base, ivfDeltaFrame(s, dir),
        "embedding", "vec_id", p)
      p
    }

  /** Build the four persisted index artifacts (LSH, IVF, PQ, and the
    * delta-dedup bucket table) for `dir` eagerly. Bench calls
    * this before timing and reports the build cost as its own metric:
    * the indexes are one-time artifacts a deployment builds beside the
    * corpus, so probe latency (q47/q49) and build cost are separate
    * numbers — folding the build into whichever probe runs first would
    * misstate both.
    */
  /** The NAMED one-time artifact builds, exposed individually so the
    * bench can bracket each with its own contention evidence (r14
    * verdict #2: the aggregate index_build number rode outside the
    * per-query ext-cores machinery and shipped a 2.1×-inflated figure
    * with no flag). Order is size-descending-ish so the concurrent
    * scheduler overlaps the long poles first.
    */
  def prebuilds(s: SparkSession, dir: String): Seq[(String, () => Any)] =
    Seq(
      "copurchase_edges" ->
        (() => AnalyticsQueries.copurchaseEdgeTable(s, dir)),
      "graph_index" -> (() => graphIndexPath(s, dir)),
      "winnow_index" -> (() => winnowIndexTable(s, dir)),
      "minhash_index" -> (() => deltaIndexTable(s, dir)),
      "components_index" -> (() => componentsIndexPath(s, dir)),
      "ivfpq_index" -> (() => ivfpqIndexPath(s, dir)),
      "ivf_index" -> (() => ivfIndexPath(s, dir)),
      "pq_index" -> (() => pqIndexPath(s, dir)),
      "lsh_index" -> (() => lshIndexPath(s, dir)))

  def prebuildIndexes(s: SparkSession, dir: String): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    // independent builds, independent Spark jobs — overlap them
    Await.result(
      Future.sequence(prebuilds(s, dir).map { case (_, b) => Future(b()) }),
      Duration.Inf)
  }

  /** The corpus winnow-anchor index q182 probes — one-time build per
    * (session, sfDir), bucketed on gram; amortized in the bench
    * prebuild step like the other delta/ANN indexes.
    */
  def winnowIndexTable(s: SparkSession, dir: String): String =
    Dedup.winnowAnchorIndex(
      Tables(s, dir, "documents").select("doc_id", "text"),
      "doc_id", "text", spec = s"$dir/documents/wnidx")

  /** The corpus minhash-bucket index q104 probes — one-time build per
    * (session, sfDir), co-located on (band, bucket); the bench builds
    * it in the amortized prebuild step like the ANN indexes.
    */
  def deltaIndexTable(s: SparkSession, dir: String): String =
    Dedup.minhashBucketIndex(
      Tables(s, dir, "documents").select("doc_id", "text"),
      "doc_id", "text", spec = s"$dir/documents/mhidx")

  /** DuckDB twin of one SRP band's bucket id: the seeded hyperplanes
    * are deterministic (same `Similarity.hyperplanes` call the Spark
    * plan makes), so they are baked into the SQL as double literals —
    * oracle and plan share one plane family by construction. Sign and
    * accumulation order match the engine: `list_dot_product` sums
    * left-to-right in double, exactly like DotProductExpr.
    */
  private def srpBucketSql(vec: String, fam: Seq[Seq[Double]]): String =
    fam.zipWithIndex.map { case (p, i) =>
      val arr = p.mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product($vec, $arr) > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Full oracle for the LSH-probed top-k (q38 and its indexed twin
    * q47, identical result sets by construction): DuckDB recomputes the
    * 4-band bucket of every corpus vector AND of the query vector
    * (vec_id = 0) from the baked plane literals, keeps rows matching
    * the query's bucket in any band, and ranks by exact cosine — the
    * same filter-then-score plan the engine runs. Plane dims (64) match
    * the testdata embedding width; planesPerBand/bands/seed mirror the
    * query declarations below.
    */
  private lazy val lshOracleSql: String = {
    val fams = Seq.tabulate(4)(b => Similarity.hyperplanes(64, 6, 42L + b))
    val bandPred = fams.map { f =>
      srpBucketSql("CAST(v.embedding AS DOUBLE[])", f) +
        s" = (SELECT ${srpBucketSql("qv", f)} FROM q)"
    }.mkString("(", ")\n   OR (", ")")
    s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id = 0)
       |SELECT v.vec_id,
       |  ROUND(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
       |    (SELECT qv FROM q)), 6) AS score
       |FROM embeddings v
       |WHERE ($bandPred)
       |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
  }

  val all: Seq[Query] = Seq(

    // Exact dedup keyed on a content hash (here no dups exist — every
    // group size 1 — which the oracle verifies too).
    Query("q29_dedup_exact", Some(
      """SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents GROUP BY h ORDER BY keep_id""".stripMargin))(
      (s, dir) =>
        Dedup.exact(
            t(s, dir, "documents").withColumn("h", md5(col("text"))),
            Seq("h"), "doc_id")
          .orderBy("keep_id")),

    // Exact dedup on a key with real collapses (events user/type).
    Query("q30_dedup_subset", Some(
      """SELECT user_id, event_type, MIN(event_id) AS keep_id,
        |  COUNT(*) AS n_dups
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin))(
      (s, dir) =>
        Dedup.exact(t(s, dir, "events"), Seq("user_id", "event_type"),
            "event_id")
          .orderBy("user_id", "event_type")),

    // MinHash+LSH band buckets per document, checked as a structural
    // invariant: the bucket values are xxhash64-based (no DuckDB twin)
    // but every doc must land in exactly `bands` buckets, one per
    // distinct band, all non-null — which IS DuckDB-expressible. The
    // raw bucket values are pinned by DedupSpec; the full bucket →
    // pair pipeline is oracle-checked end-to-end by q32.
    Query("q31_minhash_buckets", Some(
      """SELECT doc_id, CAST(8 AS BIGINT) AS n_bands,
        |  CAST(8 AS BIGINT) AS n_buckets
        |FROM documents ORDER BY doc_id""".stripMargin))(
      (s, dir) =>
        Dedup.minhashBuckets(t(s, dir, "documents"), "doc_id", "text")
          .groupBy("doc_id")
          .agg(count_distinct(col("band")).as("n_bands"),
            count(col("bucket")).as("n_buckets"))
          .orderBy("doc_id")),

    // Full near-dup pipeline on a corpus with planted duplicates (the
    // documents table unioned with itself, ids offset): candidates via
    // LSH, verified with exact 3-gram Jaccard. Oracle: DuckDB computes
    // the EXACT all-pairs word-3-gram Jaccard (affordable at verify
    // scale) — a hash match proves the LSH path has perfect recall AND
    // perfect precision vs the exact O(n²) definition at this sf. The
    // join carries a provably-safe size prefilter: J(A,B) ≥ τ implies
    // |A∩B| ≥ τ(|A|+|B|)/(1+τ) and |A∩B| ≤ min, so min ≥ τ·max —
    // pairs failing the length ratio can't reach the threshold and
    // skip the intersection entirely.
    Query("q32_minhash_pairs", Some(
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                   FOR i IN generate_series(1, len(toks) - 2)]) AS sh
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |        FROM corpus)),
        |sized AS (SELECT doc_id, sh, len(sh) AS ln FROM sh)
        |SELECT id_a, id_b, jacc FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (a.ln + b.ln - len(list_intersect(a.sh, b.sh))), 6) AS jacc
        |  FROM sized a JOIN sized b
        |    ON a.doc_id < b.doc_id
        |   AND least(a.ln, b.ln) >= 0.8 * greatest(a.ln, b.ln))
        |WHERE jacc >= 0.8 ORDER BY id_a, id_b""".stripMargin))(
      (s, dir) => {
        val d = t(s, dir, "documents").select("doc_id", "text")
        val corpus = d.unionAll(
          d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
        Dedup.nearDupPairsVerified(corpus, "doc_id", "text", minJaccard = 0.8)
          .orderBy("id_a", "id_b")
      }),

    // SimHash fingerprint normalization-invariance: the fingerprint is
    // defined over case-folded, whitespace-split tokens, so a doc and
    // its noisy variant (upper-cased, padded, internal runs of spaces)
    // must hash identically — hamming 0 for every doc, which DuckDB
    // can assert without reproducing xxhash64. The fingerprint values
    // and hamming distribution are pinned by DedupSpec.
    Query("q33_simhash", Some(
      """SELECT doc_id, CAST(0 AS INTEGER) AS ham_norm
        |FROM documents ORDER BY doc_id""".stripMargin))(
      (s, dir) => {
        val d = t(s, dir, "documents").select("doc_id", "text")
        val noisy = d.select(col("doc_id"),
          concat(lit("  "), upper(regexp_replace(col("text"), " ", "  ")),
            lit(" ")).as("text"))
        val a = Dedup.simhashes(d, "doc_id", "text")
          .withColumnRenamed("simhash", "sim_a")
        val b = Dedup.simhashes(noisy, "doc_id", "text")
          .withColumnRenamed("simhash", "sim_b")
        a.join(b, "doc_id")
          .select(col("doc_id"),
            Dedup.hamming64(col("sim_a"), col("sim_b")).as("ham_norm"))
          .orderBy("doc_id")
      }),

    // Brute-force cosine top-k against the vec_id=0 query vector —
    // the exact ANN baseline, oracle-checked against DuckDB's
    // list_cosine_similarity in double precision.
    Query("q34_cosine_topk", Some(
      """SELECT v.vec_id,
        |  ROUND(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
        |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
        |     WHERE vec_id = 0)), 6) AS score
        |FROM embeddings v ORDER BY score DESC, vec_id LIMIT 20""".stripMargin))(
      (s, dir) =>
        Similarity.bruteForceTopK(t(s, dir, "embeddings"), "embedding",
          "vec_id", queryVec(s, dir), 20)),

    // Per-document text statistics (quality-filter features).
    Query("q35_text_stats", Some(
      """WITH s AS (SELECT doc_id, text,
        |    string_split_regex(trim(text), '\s+') AS toks FROM documents)
        |SELECT doc_id,
        |  len(toks) AS n_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
        |    AS n_bpe_tokens,
        |  length(text) AS n_chars_m,
        |  ROUND(CAST(length(text) AS DOUBLE) / greatest(len(toks), 1), 6)
        |    AS mean_tok_len,
        |  ROUND(CAST(len(list_filter(toks,
        |      x -> regexp_matches(x, '^[^A-Za-z0-9]+$'))) AS DOUBLE)
        |    / greatest(len(toks), 1), 6) AS punct_ratio,
        |  ROUND(CAST(len(list_filter(toks, x -> list_contains(
        |      ['the','and','of','to','a','in','is','it','that','for','was',
        |       'on','are','with','as','at','this'], lower(x)))) AS DOUBLE)
        |    / greatest(len(toks), 1), 6) AS stop_ratio,
        |  ROUND(CAST(len(list_filter(toks,
        |      x -> regexp_matches(x, '^[A-Z]'))) AS DOUBLE)
        |    / greatest(len(toks), 1), 6) AS upper_ratio
        |FROM s ORDER BY doc_id""".stripMargin))(
      (s, dir) =>
        TextAnalysis.textStats(t(s, dir, "documents").select("doc_id", "text"))
          .drop("text")
          .orderBy("doc_id")),

    // Heuristic language ID (function-word profiles + CJK check),
    // oracle-checked against a full DuckDB behavioral twin: same
    // lower-cased whitespace tokens, same per-language function-word
    // counts over `n = max(|toks|, 1)`, same argmax with Spark's
    // struct-comparison tie-break (score first, then language code —
    // list_aggregate('max') on (s, lang) structs matches array_max),
    // same CJK char-ratio override, same "und" fallback.
    Query("q36_lang_id", Some(
      """WITH t AS (
        |  SELECT doc_id, lang AS labeled, text,
        |    list_transform(string_split_regex(trim(text), '\s+'),
        |                   x -> lower(x)) AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, labeled, text,
        |    CAST(greatest(len(toks), 1) AS DOUBLE) AS n,
        |    CAST(len(list_filter(toks, x -> list_contains(
        |      ['the','and','of','to','a','in','is','it','that','for','was',
        |       'on','are','with','as','at','this'], x))) AS DOUBLE) AS c_en,
        |    CAST(len(list_filter(toks, x -> list_contains(
        |      ['el','la','de','que','y','en','un','una','los','las','por',
        |       'con','para','es','no','se'], x))) AS DOUBLE) AS c_es,
        |    CAST(len(list_filter(toks, x -> list_contains(
        |      ['der','die','das','und','ist','ich','nicht','ein','eine',
        |       'mit','auf','für','von','zu','den'], x))) AS DOUBLE) AS c_de,
        |    CAST(len(list_filter(toks, x -> list_contains(
        |      ['le','la','les','de','des','et','est','un','une','dans',
        |       'que','pour','avec','sur','au','ce'], x))) AS DOUBLE) AS c_fr
        |  FROM t),
        |b AS (
        |  SELECT doc_id, labeled, text,
        |    list_aggregate(
        |      [{'s': c_en / n, 'lang': 'en'}, {'s': c_es / n, 'lang': 'es'},
        |       {'s': c_de / n, 'lang': 'de'}, {'s': c_fr / n, 'lang': 'fr'}],
        |      'max') AS best
        |  FROM s)
        |SELECT doc_id, labeled,
        |  CASE WHEN length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '',
        |                                  'g')) > length(text) * 0.3 THEN 'zh'
        |       WHEN best.s > 0 THEN best.lang ELSE 'und' END AS predicted
        |FROM b ORDER BY doc_id""".stripMargin))(
      (s, dir) =>
        TextAnalysis.withLangId(
            t(s, dir, "documents")
              .select(col("doc_id"), col("lang").as("labeled"), col("text")))
          .drop("text")
          .orderBy("doc_id")),

    // Normalized content fingerprint (xxhash64) — exact-dedup key.
    // Oracle: the fingerprint partition of the corpus must be
    // ISOMORPHIC to partitioning by the normalized text itself
    // (assuming no 64-bit collisions, a certainty at verify scale), so
    // each doc's fingerprint-group size must equal its normalized-text
    // group size — per-row, DuckDB-checkable. Raw hash values pinned
    // by TextAnalysisSpec.
    Query("q37_fingerprint", Some(
      """SELECT doc_id, COUNT(*) OVER (
        |  PARTITION BY lower(regexp_replace(trim(text), '\s+', ' ', 'g'))
        |) AS n_same_fp FROM documents ORDER BY doc_id""".stripMargin))(
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            TextAnalysis.fingerprint(col("text")).as("fp"))
          .withColumn("n_same_fp", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("fp")))
          .select("doc_id", "n_same_fp")
          .orderBy("doc_id")),

    // LSH-restricted approximate top-k (sign random projection,
    // multi-band probe) — the scale path for q34. Fully oracle-checked:
    // the seeded hyperplane family IS SQL-expressible once its values
    // are baked in as literals (see lshOracleSql), so DuckDB reproduces
    // the exact bucket filter AND the exact approximate result set —
    // recall < 1.0 and all. Recall vs brute force and q47-equality are
    // additionally pinned by SimilaritySpec.
    Query("q38_ann_lsh", Some(lshOracleSql))(
      (s, dir) =>
        Similarity.lshTopK(t(s, dir, "embeddings"), "embedding", "vec_id",
          queryVec(s, dir), k = 10, planesPerBand = 6, bands = 4)),

    // Embedding-cosine near-dup pairs within blocking groups (label =
    // the block key; at scale an LSH bucket id). Oracle-checked: the
    // DuckDB twin scores the identical pair set with
    // list_cosine_similarity, INCLUDING the operator's block-size cap
    // — which counts DISTINCT vectors per block (identical vectors
    // dedup before the quadratic pairing), so the oracle stays
    // faithful at any scale, not just below the cap.
    Query("q39_embed_neardup", Some(
      """WITH bs AS (
        |  SELECT label, COUNT(DISTINCT embedding) AS nreps
        |  FROM embeddings GROUP BY label),
        |ok AS (
        |  SELECT e.vec_id, e.embedding, e.label FROM embeddings e
        |  JOIN bs USING (label) WHERE bs.nreps <= 10000)
        |SELECT id_a, id_b, score FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |      CAST(b.embedding AS DOUBLE[])), 6) AS score
        |  FROM ok a JOIN ok b
        |    ON a.label = b.label AND a.vec_id < b.vec_id)
        |WHERE score >= 0.35 ORDER BY id_a, id_b""".stripMargin))(
      (s, dir) => nearDupPairs(s, dir).orderBy("id_a", "id_b")),

    // SimHash near-dup pairs (pigeonhole chunk buckets, hamming ≤ 3)
    // on the clone-planted corpus, checked as a recall invariant: the
    // full pipeline runs, then the output is restricted to the planted
    // (doc, clone) pairs — which MUST all be present at hamming 0
    // (identical text ⇒ identical fingerprint ⇒ all chunks agree), a
    // set DuckDB enumerates exactly. Discovery of non-planted hamming
    // ≤ 3 pairs is pinned by DedupSpec (perturbed-doc fixtures).
    Query("q40_simhash_pairs", Some(
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
        |  CAST(0 AS INTEGER) AS hamming
        |FROM documents ORDER BY id_a""".stripMargin))(
      (s, dir) => {
        val d = t(s, dir, "documents").select("doc_id", "text")
        val corpus = d.unionAll(
          d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
        Dedup.simhashNearDupPairs(corpus, "doc_id", "text", maxHamming = 3)
          .filter(col("id_b") === col("id_a") + 1000000)
          .orderBy("id_a", "id_b")
      }),

    // The streaming windowed aggregation run in batch mode over the
    // event log — same EventStream operator, bounded input (the
    // batch/stream unification Structured Streaming promises). Windows
    // are UTC-hour-aligned; oracle floors epoch-µs to the hour.
    Query("q41_stream_window", Some(
      """SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000)
        |    AS win_start,
        |  event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM events GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin))(
      (s, dir) =>
        graft.streaming.EventStream.windowedStats(
            t(s, dir, "events").select(
              timestamp_micros(expr("ts div 1000")).as("ts"),
              col("event_type"), col("value")))
          .orderBy("win_start", "event_type")),

    // Stream-static enrichment run in batch mode: events joined to the
    // customer dimension (broadcast — a stream-static join holds no
    // stream state), then aggregated per segment. The same operator
    // runs on readStream input (EventStreamSpec drives it with
    // MemoryStream); this batch twin is the oracle-checkable form.
    // Unmatched keys survive the left join as NULL segment; both
    // sides coalesce to a sentinel (the q45 convention) because Spark
    // sorts NULLS FIRST and DuckDB NULLS LAST — latent today (every
    // user_id matches), divergent the day one doesn't.
    Query("q57_stream_enrich", Some(
      """SELECT COALESCE(c.c_mktsegment, '<none>') AS segment,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY segment ORDER BY segment""".stripMargin))(
      (s, dir) =>
        graft.streaming.EventStream.enriched(
            t(s, dir, "events").select("user_id", "value"),
            t(s, dir, "customer"), "user_id", "c_custkey",
            Seq("c_mktsegment"))
          .groupBy(coalesce(col("c_mktsegment"), lit("<none>"))
            .as("segment"))
          .agg(count(lit(1)).as("cnt"), dsumq(col("value")).as("sum_val"))
          .orderBy("segment")),

    // IVF-cell-restricted approximate top-k — the second ANN scale
    // path (sampled coarse centroids; probe the 4 nearest of 16
    // cells). Oracle: DuckDB's EXACT brute-force top-10 — a property
    // OF THE VERIFY SCALE (sf0.01), where the probed cells
    // deterministically contain the entire true top-10; at 10× the
    // corpus the same probes recall 7-9/10 (approximate by design —
    // measured in SCALE.md; recall floor pinned by SimilaritySpec).
    Query("q43_ann_ivf", Some(
      """SELECT v.vec_id,
        |  ROUND(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
        |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
        |     WHERE vec_id = 0)), 6) AS score
        |FROM embeddings v ORDER BY score DESC, vec_id LIMIT 10""".stripMargin))(
      (s, dir) =>
        Similarity.ivfTopK(t(s, dir, "embeddings"), "embedding", "vec_id",
          queryVec(s, dir), k = 10, nClusters = 16, nProbe = 4)),

    // The CRM pipeline end-to-end over real testdata: metadata
    // projection → fixes → broadcast mapping join (blank-on-unmatched)
    // → tag derivation → STM rename/merge compiler, all in one lazy
    // plan, oracle-checked against the equivalent DuckDB SQL. This is
    // the signature operator (SURVEY.md §2.9 C3) verified beyond unit
    // fixtures.
    Query("q44_pipeline_e2e", Some(
      """WITH src AS (
        |  SELECT CAST(c_custkey AS VARCHAR) AS ck, c_name AS nm,
        |    c_mktsegment AS seg, CAST(c_nationkey AS VARCHAR) AS nk,
        |    CASE WHEN c_acctbal > 0 THEN 'Y' ELSE '' END AS flag
        |  FROM customer),
        |fixed AS (
        |  SELECT ck, nm,
        |    CASE WHEN seg IN ('MACHINERY') THEN '' ELSE seg END AS seg,
        |    nk, flag FROM src),
        |mapped AS (
        |  SELECT f.*, COALESCE(n.n_name, '') AS nat
        |  FROM fixed f LEFT JOIN nation n ON f.nk = CAST(n.n_nationkey AS VARCHAR))
        |SELECT ck AS cust_key,
        |  CASE WHEN seg = nm OR seg = '' THEN nm
        |       WHEN nm = '' THEN seg
        |       ELSE nm || ', ' || seg END AS contact,
        |  nat AS nation, flag AS "Flag",
        |  CASE WHEN flag <> '' THEN 'positive' ELSE '' END AS tags
        |FROM mapped ORDER BY cust_key""".stripMargin))(
      (s, dir) => {
        import graft.pipeline._
        import graft.functions.CleanFns
        val src = t(s, dir, "customer").select(
          col("c_custkey").cast("string").as("Cust Key"),
          col("c_name").as("Name"),
          col("c_mktsegment").as("Segment"),
          col("c_nationkey").cast("string").as("Nation Key"),
          when(col("c_acctbal") > 0, "Y").otherwise("").as("Flag"))
        val stm = Stm(Seq(
          StmRow("Cust Key", inScope = true, "cust_key", isTag = false, "", ""),
          StmRow("Name", inScope = true, "contact", isTag = false, "", ""),
          StmRow("Segment", inScope = true, "contact", isTag = false, "", ""),
          StmRow("Nation Key", inScope = true, "nation", isTag = false, "", ""),
          StmRow("Flag", inScope = true, "", isTag = true, "positive", "")))
        val mapping = t(s, dir, "nation").select(
          col("n_nationkey").cast("string").as("k"), col("n_name").as("v"))
        val fixed = CrmPipeline.applyFixes(
          CrmPipeline.normalizeAll(CrmPipeline.projectInScope(src, stm)),
          Seq("Segment" -> ((c: Column) => CleanFns.blankIfIn(c, Seq("MACHINERY")))))
        val mapped = CrmPipeline.applyMapping(fixed, "Nation Key", mapping, "k", "v")
        CrmPipeline.mapColumns(CrmPipeline.deriveTags(mapped, stm), stm)
          .orderBy("cust_key")
      }),

    // Rollup (grouping sets) — subtotal rows per returnflag and a
    // grand total, the reporting shape distinct-value extraction grows
    // into at scale. Grouping-null keys are normalized to a sentinel so
    // both engines render subtotals identically.
    Query("q45_rollup", Some(
      """SELECT COALESCE(l_returnflag, '<all>') AS rf,
        |  COALESCE(l_linestatus, '<all>') AS ls,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin))(
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("cnt"), dsumq(col("l_quantity")).as("sum_qty"))
          .select(coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
            coalesce(col("l_linestatus"), lit("<all>")).as("ls"),
            col("cnt"), col("sum_qty"))
          .orderBy("rf", "ls")),

    // ANN probe against the PERSISTED LSH index (same plane families
    // as q38): bucket assignment paid once at index build; the probe
    // is a partition-pruned scan (PartitionFilters — pinned by
    // PlanSpec) + distinct + top-k. Same rows as q38 by construction
    // (pinned by SimilaritySpec).
    Query("q47_ann_indexed", Some(lshOracleSql))(
      (s, dir) =>
        Similarity.lshTopKIndexed(s, lshIndexPath(s, dir), "embedding",
          "vec_id", queryVec(s, dir), k = 10)),

    // ANN probe against the PERSISTED IVF index: k-means cells as the
    // partition column, centroids stored beside the data; probing the
    // 8 nearest of 16 cells scans only those directories. Probe scores
    // are EXACT (real vectors, not codes); recall is the approximation
    // surface, so the oracle is the q117/q204 CONTRACT form: DuckDB
    // recomputes the exact top-10 and `recall_ok` asserts the probe
    // recovered at least 6 of the true 10 — the SAME declared
    // contract at every scale factor, so a scale-up selfcheck needs
    // no exception list. Floor calibration (measured, seeded build):
    // nProbe=8 recovers 7/10/9 of 10 at sf0.001/0.01/0.1 — ≥6 holds
    // with margin everywhere, where the old nProbe=4 fell to 4 at the
    // smallest SF (16 cells over a few dozen vectors barely
    // partitions). The probe's raw rows stay pinned by SimilaritySpec.
    Query("q49_ann_ivf_indexed", Some(
      """WITH topk AS (
        |  SELECT vec_id FROM (
        |    SELECT v.vec_id,
        |      ROUND(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
        |        (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
        |         WHERE vec_id = 0)), 6) AS score
        |    FROM embeddings v ORDER BY score DESC, vec_id LIMIT 10))
        |SELECT vec_id, CAST(10 AS BIGINT) AS n_returned,
        |  true AS recall_ok
        |FROM topk ORDER BY vec_id""".stripMargin))(
      (s, dir) => {
        val got = Similarity.ivfTopKIndexed(s, ivfIndexPath(s, dir),
          "embedding", "vec_id", queryVec(s, dir), k = 10, nProbe = 8)
        val exact = Similarity.bruteForceTopK(t(s, dir, "embeddings"),
          "embedding", "vec_id", queryVec(s, dir), k = 10)
        recallContract(got, exact, floor = 6)
      }),

    // ANN probe against the PERSISTED PQ index: the compressed-scan
    // path — 8 byte-codes per vector (32× smaller than float32), ADC
    // lookup-table scoring, a bounded shortlist, exact re-rank of only
    // those rows' real vectors. Unlike IVF/LSH (whose probes recall
    // the full true top-10 at verify scale), PQ's approximation error
    // on these near-uniform synthetic vectors genuinely reorders the
    // tail, so the oracle is the q42 CONTRACT form: the exact top-10
    // rides along (DuckDB recomputes it) and `recall_ok` asserts the
    // probe recovered at least 8 of the true 10 — hash-checked per
    // round. The probe's raw output is additionally pinned by
    // SimilaritySpec (recall floor + exact-score parity on the
    // returned rows).
    Query("q117_pq_topk", Some(
      """WITH topk AS (
        |  SELECT vec_id FROM (
        |    SELECT v.vec_id,
        |      ROUND(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
        |        (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
        |         WHERE vec_id = 0)), 6) AS score
        |    FROM embeddings v ORDER BY score DESC, vec_id LIMIT 10))
        |SELECT vec_id, CAST(10 AS BIGINT) AS n_returned,
        |  true AS recall_ok
        |FROM topk ORDER BY vec_id""".stripMargin))(
      (s, dir) => {
        val pq = Similarity.pqTopKIndexed(s, pqIndexPath(s, dir),
          t(s, dir, "embeddings"), "embedding", "vec_id",
          queryVec(s, dir), k = 10, shortlist = 100)
        val exact = Similarity.bruteForceTopK(t(s, dir, "embeddings"),
          "embedding", "vec_id", queryVec(s, dir), k = 10)
        recallContract(pq, exact, floor = 8)
      }),

    // Batch kNN join: top-5 neighbors for each of three query vectors
    // in one pass, per-query top-k via the bounded-heap aggregator
    // (map-side partial — see Similarity.knnJoin). Oracle: DuckDB
    // ranks the exact same scored cross product per query.
    Query("q58_knn_join", Some(
      """WITH q AS (
        |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id < 3),
        |scored AS (
        |  SELECT q.qid, v.vec_id,
        |    ROUND(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
        |      q.qv), 6) AS score
        |  FROM embeddings v CROSS JOIN q)
        |SELECT qid, vec_id, score FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
        |  FROM scored)
        |WHERE rn <= 5 ORDER BY qid, score DESC, vec_id""".stripMargin))(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.knnJoin(emb, "embedding", "vec_id",
            emb.filter(col("vec_id") < 3), "embedding", "vec_id", k = 5)
          .orderBy(col("qid"), col("score").desc, col("vec_id"))
      }),

    // Approximate distinct (HLL++) — the cardinality-estimation
    // primitive distinct-value extraction needs at 100 TB (exact
    // distinct shuffles every value; the sketch is mergeable and
    // constant-size). The sketch itself has no DuckDB twin, so the
    // oracle checks the estimator's CONTRACT: exact distinct (which
    // DuckDB recomputes) rides along, and `approx_ok` asserts the
    // estimate lands within 3× the requested relative standard
    // deviation of it — per group, hash-checked.
    Query("q42_approx_distinct", Some(
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
        |  COUNT(*) AS cnt, true AS approx_ok
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin))(
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(count_distinct(col("l_partkey")).as("exact_parts"),
            count(lit(1)).as("cnt"),
            approx_count_distinct(col("l_partkey"), 0.02).as("__approx"))
          .select(col("l_returnflag"), col("exact_parts"), col("cnt"),
            (abs(col("__approx") - col("exact_parts")).cast("double")
              / col("exact_parts") <= 0.06).as("approx_ok"))
          .orderBy("l_returnflag")),

    // Connected components over the embedding near-dup pair graph —
    // the final dedup step: pairs say "same", the component label says
    // which CLUSTER, and min-id election picks the kept representative.
    // Spark runs iterative min-label propagation (diameter-bounded
    // rounds, one join + one partial-agg shuffle each); the oracle
    // recomputes the same edge set (the q39 SQL) and closes it with a
    // recursive CTE — exact at any scale, affordable at verify scale.
    Query("q67_components", Some(componentsCte +
      """
        |SELECT id AS vec_id, MIN(r) AS comp, (id = MIN(r)) AS keep
        |FROM reach GROUP BY id ORDER BY vec_id""".stripMargin))(
      (s, dir) =>
        Dedup.connectedComponents(
            t(s, dir, "embeddings").select("vec_id"), "vec_id",
            nearDupPairs(s, dir).select("id_a", "id_b"))
          .select(col("id").as("vec_id"), col("comp"),
            (col("id") === col("comp")).as("keep"))
          .orderBy("vec_id")),

    // Dedup-impact report off the same near-dup component labels: the
    // cluster-size histogram and per-size removable-row counts — the
    // "how much does near-dup dedup save" planning artifact, riding
    // the bounded component frame (no second corpus pass).
    Query("q165_dedup_report", Some(componentsCte +
      """,
        |comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
        |cs AS (SELECT comp, COUNT(*) AS sz FROM comp GROUP BY 1)
        |SELECT sz, COUNT(*) AS n_clusters,
        |  CAST(SUM(sz - 1) AS BIGINT) AS removable
        |FROM cs GROUP BY sz ORDER BY sz""".stripMargin))(
      (s, dir) =>
        Dedup.connectedComponents(
            t(s, dir, "embeddings").select("vec_id"), "vec_id",
            nearDupPairs(s, dir).select("id_a", "id_b"))
          .groupBy("comp").agg(count(lit(1)).as("sz"))
          .groupBy("sz").agg(count(lit(1)).as("n_clusters"),
            sum(col("sz") - 1).as("removable"))
          .orderBy("sz")),

    // Synchronous label-propagation communities over the same
    // near-dup graph (5 fixed rounds, most-frequent neighbor label,
    // ties → min). The oracle unrolls the five synchronous rounds as
    // chained CTEs — fully deterministic, unlike async LPA. Reuses
    // componentsCte only for its `edges` sub-CTE (the recursive
    // `reach` is simply never referenced).
    Query("q170_label_prop", Some(componentsCte +
      """,
        |l0 AS (SELECT vec_id AS id, vec_id AS lab FROM embeddings),
        |n1 AS (SELECT e.a AS id, p.lab, COUNT(*) AS c FROM edges e
        |       JOIN l0 p ON p.id = e.b GROUP BY 1, 2),
        |w1 AS (SELECT id, lab FROM (SELECT id, lab, ROW_NUMBER() OVER (
        |       PARTITION BY id ORDER BY c DESC, lab) AS rn FROM n1)
        |       WHERE rn = 1),
        |l1 AS (SELECT l.id, COALESCE(w.lab, l.lab) AS lab FROM l0 l
        |       LEFT JOIN w1 w USING (id)),
        |n2 AS (SELECT e.a AS id, p.lab, COUNT(*) AS c FROM edges e
        |       JOIN l1 p ON p.id = e.b GROUP BY 1, 2),
        |w2 AS (SELECT id, lab FROM (SELECT id, lab, ROW_NUMBER() OVER (
        |       PARTITION BY id ORDER BY c DESC, lab) AS rn FROM n2)
        |       WHERE rn = 1),
        |l2 AS (SELECT l.id, COALESCE(w.lab, l.lab) AS lab FROM l1 l
        |       LEFT JOIN w2 w USING (id)),
        |n3 AS (SELECT e.a AS id, p.lab, COUNT(*) AS c FROM edges e
        |       JOIN l2 p ON p.id = e.b GROUP BY 1, 2),
        |w3 AS (SELECT id, lab FROM (SELECT id, lab, ROW_NUMBER() OVER (
        |       PARTITION BY id ORDER BY c DESC, lab) AS rn FROM n3)
        |       WHERE rn = 1),
        |l3 AS (SELECT l.id, COALESCE(w.lab, l.lab) AS lab FROM l2 l
        |       LEFT JOIN w3 w USING (id)),
        |n4 AS (SELECT e.a AS id, p.lab, COUNT(*) AS c FROM edges e
        |       JOIN l3 p ON p.id = e.b GROUP BY 1, 2),
        |w4 AS (SELECT id, lab FROM (SELECT id, lab, ROW_NUMBER() OVER (
        |       PARTITION BY id ORDER BY c DESC, lab) AS rn FROM n4)
        |       WHERE rn = 1),
        |l4 AS (SELECT l.id, COALESCE(w.lab, l.lab) AS lab FROM l3 l
        |       LEFT JOIN w4 w USING (id)),
        |n5 AS (SELECT e.a AS id, p.lab, COUNT(*) AS c FROM edges e
        |       JOIN l4 p ON p.id = e.b GROUP BY 1, 2),
        |w5 AS (SELECT id, lab FROM (SELECT id, lab, ROW_NUMBER() OVER (
        |       PARTITION BY id ORDER BY c DESC, lab) AS rn FROM n5)
        |       WHERE rn = 1),
        |l5 AS (SELECT l.id, COALESCE(w.lab, l.lab) AS lab FROM l4 l
        |       LEFT JOIN w5 w USING (id))
        |SELECT id AS vec_id, lab AS community FROM l5
        |ORDER BY vec_id""".stripMargin))(
      (s, dir) =>
        Dedup.labelPropagation(
            t(s, dir, "embeddings").select("vec_id"), "vec_id",
            nearDupPairs(s, dir).select("id_a", "id_b"))
          .select(col("id").as("vec_id"), col("lab").as("community"))
          .orderBy("vec_id")),

    // Per-label embedding centroids via the mergeable vector-mean
    // aggregate (VecAggs.vecAvg): map-side partial sums, one
    // (dims+1)-double buffer per (partition, label) into the shuffle —
    // never the member vectors. Output one row per (label, dimension)
    // so both engines compare plain doubles (array stringification
    // differs across engines). The oracle recomputes each dimension's
    // mean with a generate_series cross join (64 = testdata embedding
    // width, like the q38 oracle).
    Query("q78_centroids", Some(
      """WITH m AS (
        |  SELECT label, g.i AS dim, AVG(CAST(embedding[g.i] AS DOUBLE)) AS c
        |  FROM embeddings, generate_series(1, 64) AS g(i)
        |  GROUP BY label, g.i),
        |n AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label)
        |SELECT m.label, CAST(m.dim AS INTEGER) AS dim, ROUND(m.c, 6) AS c,
        |  n.n
        |FROM m JOIN n USING (label) ORDER BY label, dim""".stripMargin))(
      (s, dir) =>
        t(s, dir, "embeddings")
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
            graft.functions.VecAggs.vecAvg(
              col("embedding").cast("array<double>")).as("__raw"))
          // rounded array bound BEFORE the explode (house pattern: the
          // generator's inferred size() filter re-derives unbound
          // arrays)
          .withColumn("__c", transform(col("__raw"), x => round(x, 6)))
          .select(col("label"), col("n"),
            posexplode_outer(col("__c")).as(Seq("__d", "c")))
          .filter(col("c").isNotNull)
          .select(col("label"), (col("__d") + 1).as("dim"), col("c"),
            col("n"))
          .orderBy("label", "dim")),

    // GROUPING SETS — arbitrary subtotal combinations in one pass,
    // completing the family with q45's ROLLUP and q74's CUBE: here
    // (flag, status), (flag), (status) — a set ROLLUP/CUBE can't
    // express ((status) without its (all, all) total). Grouping-null
    // keys normalize to sentinels as in q45.
    Query("q80_grouping_sets", Some(
      """SELECT COALESCE(l_returnflag, '<all>') AS rf,
        |  COALESCE(l_linestatus, '<all>') AS ls,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus))
        |ORDER BY rf, ls""".stripMargin))(
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupingSets(
            Seq(Seq(col("l_returnflag"), col("l_linestatus")),
              Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
            col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"), dsumq(col("l_quantity")).as("sum_qty"))
          .select(coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
            coalesce(col("l_linestatus"), lit("<all>")).as("ls"),
            col("cnt"), col("sum_qty"))
          .orderBy("rf", "ls")),

    // Unpivot/melt — wide→long reshape (the inverse of q65's pivot):
    // per-part metrics become (metric, value) rows. Spark's native
    // unpivot is a narrow zero-shuffle Expand, exactly the UNION ALL
    // the oracle spells out.
    Query("q81_melt", Some(
      """SELECT p_partkey, 'p_retailprice' AS metric,
        |  CAST(p_retailprice AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_size' AS metric,
        |  CAST(p_size AS DOUBLE) AS value FROM part
        |ORDER BY p_partkey, metric""".stripMargin))(
      (s, dir) =>
        t(s, dir, "part")
          .select(col("p_partkey"),
            col("p_retailprice").cast("double").as("p_retailprice"),
            col("p_size").cast("double").as("p_size"))
          .unpivot(Array(col("p_partkey")),
            Array(col("p_retailprice"), col("p_size")),
            "metric", "value")
          .orderBy("p_partkey", "metric")),

    // SemDeDup-style semantic deduplication: assign every vector to
    // its nearest label-centroid codebook entry (rounded cosine,
    // tie → smallest label), prune near-dups ONLY within a cluster
    // (keep = no smaller id ≥ threshold in the same cluster). The
    // oracle replays the whole thing — per-dim centroid means rounded
    // to 6 (q78's convention, so the codebook is bit-identical),
    // assignment via ROW_NUMBER over (sim DESC, label), the same
    // distinct-vector block cap as q39, and the greedy min-id keep.
    Query("q84_semantic_dedup", Some(
      """WITH m AS (
        |  SELECT label, g.i AS dim,
        |    ROUND(AVG(CAST(embedding[g.i] AS DOUBLE)), 6) AS c
        |  FROM embeddings, generate_series(1, 64) AS g(i)
        |  GROUP BY label, g.i),
        |cb AS (SELECT label, list(c ORDER BY dim) AS cv FROM m GROUP BY label),
        |a AS (
        |  SELECT e.vec_id, cb.label,
        |    ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |      cb.cv), 6) AS sim
        |  FROM embeddings e CROSS JOIN cb),
        |asg AS (
        |  SELECT vec_id, label AS cluster FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY sim DESC, label) AS rn FROM a)
        |  WHERE rn = 1),
        |bs AS (
        |  SELECT a.cluster, COUNT(DISTINCT e.embedding) AS nreps
        |  FROM asg a JOIN embeddings e USING (vec_id) GROUP BY a.cluster),
        |p AS (
        |  SELECT DISTINCT b.vec_id AS id_b
        |  FROM asg a JOIN asg b ON a.cluster = b.cluster
        |    AND a.vec_id < b.vec_id
        |  JOIN bs ON bs.cluster = a.cluster AND bs.nreps <= 10000
        |  JOIN embeddings ea ON ea.vec_id = a.vec_id
        |  JOIN embeddings eb ON eb.vec_id = b.vec_id
        |  WHERE ROUND(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
        |    CAST(eb.embedding AS DOUBLE[])), 6) >= 0.35)
        |SELECT asg.vec_id, asg.cluster,
        |  asg.vec_id NOT IN (SELECT id_b FROM p) AS keep
        |FROM asg ORDER BY vec_id""".stripMargin))(
      (s, dir) =>
        Similarity.semanticDedup(t(s, dir, "embeddings"), "embedding",
            "vec_id", "label", threshold = 0.35)
          .select(col("id").as("vec_id"), col("cluster"), col("keep"))
          .orderBy("vec_id")),

    // Z-order (Morton) curve value — the multi-dimensional clustering
    // key behind Layout.writeZOrdered: sorting by z clusters BOTH
    // quantized dimensions at once, so 2-D range predicates prune
    // files/row groups by min/max stats. The oracle replays the exact
    // shift/mask/or bit arithmetic (generated from the same loop).
    Query("q85_zorder", Some {
      val terms = (for {
        (c, d) <- Seq("x", "y").zipWithIndex
        i <- 0 until 8
      } yield s"((($c >> $i) & 1) << ${i * 2 + d})").mkString(" | ")
      s"""SELECT l_orderkey, l_linenumber, x, y, $terms AS z
         |FROM (SELECT l_orderkey, l_linenumber,
         |        l_partkey % 256 AS x, l_suppkey % 256 AS y
         |      FROM lineitem)
         |ORDER BY z, l_orderkey, l_linenumber""".stripMargin
    })(
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            pmod(col("l_partkey"), lit(256)).cast("long").as("x"),
            pmod(col("l_suppkey"), lit(256)).cast("long").as("y"))
          .withColumn("z",
            graft.sources.Layout.zValue(8, Seq(col("x"), col("y"))))
          .orderBy("z", "l_orderkey", "l_linenumber")),

    // Fixed-iteration PageRank over the shared near-dup pair graph —
    // the centrality signal for canonical-representative selection
    // (q67 labels the clusters; this ranks INSIDE them). 5 rounds,
    // d=0.85, ranks rounded to 12 per round under the exact
    // decimal-sum convention, so the oracle can replay the identical
    // unrolled iterations in SQL: one CTE per round over the same
    // edge set the q39/q67 oracles derive.
    Query("q86_pagerank", Some {
      val edgesCte =
        """WITH bs AS (
          |  SELECT label, COUNT(DISTINCT embedding) AS nreps
          |  FROM embeddings GROUP BY label),
          |ok AS (
          |  SELECT e.vec_id, e.embedding, e.label FROM embeddings e
          |  JOIN bs USING (label) WHERE bs.nreps <= 10000),
          |pairs AS (
          |  SELECT id_a, id_b FROM (
          |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          |      ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
          |        CAST(b.embedding AS DOUBLE[])), 6) AS score
          |    FROM ok a JOIN ok b
          |      ON a.label = b.label AND a.vec_id < b.vec_id)
          |  WHERE score >= 0.35),
          |edges AS (SELECT id_a AS dst, id_b AS src FROM pairs
          |          UNION ALL SELECT id_b, id_a FROM pairs),
          |deg AS (SELECT src AS id, COUNT(*) AS deg FROM edges GROUP BY 1),
          |nn AS (SELECT COUNT(*) AS n FROM deg),
          |r0 AS (SELECT id, deg,
          |       ROUND(CAST(1.0 AS DOUBLE) / nn.n, 12) AS rank
          |       FROM deg CROSS JOIN nn)""".stripMargin
      val rounds = (1 to 5).map { k =>
        s""",
           |r$k AS (
           |  SELECT d.id, d.deg,
           |    ROUND(CAST(1.0 - 0.85 AS DOUBLE) / nn.n
           |      + 0.85 * CAST(s.acc AS DOUBLE), 12) AS rank
           |  FROM (SELECT e.src AS id,
           |          SUM(CAST(r.rank / r.deg AS DECIMAL(28,20))) AS acc
           |        FROM edges e JOIN r${k - 1} r ON r.id = e.dst
           |        GROUP BY e.src) s
           |  JOIN deg d ON d.id = s.id CROSS JOIN nn)""".stripMargin
      }.mkString
      edgesCte + rounds +
        "\nSELECT id AS vec_id, rank FROM r5 ORDER BY vec_id"
    })(
      (s, dir) =>
        Dedup.pageRank(nearDupPairs(s, dir).select("id_a", "id_b"))
          .select(col("id").as("vec_id"), col("rank"))
          .orderBy("vec_id")),

    // Symmetric int8 scalar quantization — the 4× storage/shuffle
    // compression step for a 100 TB embedding corpus (int8 codes + one
    // double scale per vector instead of float32 payloads). Single-pass
    // codegen'd expression; the oracle replays the identical
    // half-away-from-zero arithmetic with DuckDB list functions, so
    // codes hash-match exactly and scale/err match at 6 decimals.
    Query("q89_quantize", Some(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |s AS (SELECT vec_id, v,
        |        COALESCE(list_max(list_transform(v, x -> abs(x))), 0)
        |          AS scale
        |      FROM e)
        |SELECT vec_id, ROUND(scale, 6) AS scale,
        |  array_to_string(
        |    CASE WHEN scale = 0 THEN list_transform(v, x -> CAST(0 AS VARCHAR))
        |         ELSE list_transform(v, x ->
        |                CAST(CAST(round(COALESCE(x, 0) * 127.0 / scale)
        |                  AS INTEGER) AS VARCHAR)) END, ',') AS q,
        |  CASE WHEN scale = 0 THEN CAST(0 AS DOUBLE)
        |       ELSE ROUND(list_max(list_transform(v, x ->
        |              abs(x - round(x * 127.0 / scale) * scale / 127.0))),
        |            6)
        |  END AS err
        |FROM s ORDER BY vec_id""".stripMargin))(
      (s, dir) =>
        // The int8 codes travel as a comma-joined string: the driver
        // gate re-sorts result frames in pandas, which cannot order raw
        // array cells; values are unchanged (q92 replays the raw codes).
        Similarity.quantizeInt8(t(s, dir, "embeddings"), "embedding")
          .select(col("vec_id"), round(col("scale"), 6).as("scale"),
            array_join(col("q").cast("array<string>"), ",").as("q"),
            round(col("err"), 6).as("err"))
          .orderBy("vec_id")),

    // Leakage-safe split: cluster near-duplicates first (q67's
    // components), then assign train/val/test by md5 of the COMPONENT
    // label, so a near-dup pair can never straddle train and test —
    // content-keyed splitting (q51) only protects exact duplicates.
    // The oracle closes the same graph recursively and replays the
    // same md5-bucket thresholds (integer 256ths).
    Query("q91_leakage_split", Some(componentsCte +
      """
        |SELECT vec_id, comp,
        |  CASE WHEN hv < 205 THEN 'train' WHEN hv < 231 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT vec_id, comp,
        |  (ascii(substr(md5(CAST(comp AS VARCHAR)), 1, 1)) -
        |     CASE WHEN ascii(substr(md5(CAST(comp AS VARCHAR)), 1, 1)) >= 97
        |          THEN 87 ELSE 48 END) * 16
        |  + (ascii(substr(md5(CAST(comp AS VARCHAR)), 2, 1)) -
        |     CASE WHEN ascii(substr(md5(CAST(comp AS VARCHAR)), 2, 1)) >= 97
        |          THEN 87 ELSE 48 END) AS hv
        |  FROM (SELECT id AS vec_id, MIN(r) AS comp
        |        FROM reach GROUP BY id))
        |ORDER BY vec_id""".stripMargin))(
      (s, dir) => {
        val comps = Dedup.connectedComponents(
            t(s, dir, "embeddings").select("vec_id"), "vec_id",
            nearDupPairs(s, dir).select("id_a", "id_b"))
          .select(col("id").as("vec_id"), col("comp"))
        Sampling.groupSplit(comps, col("comp"))
          .orderBy("vec_id")
      }),

    // Top-k over the int8-QUANTIZED corpus (q89's codes put to work):
    // the scan reads 4×-compressed codes and scores by exact integer
    // dot rescaled by the two scales — deterministic rank order with
    // no float-summation ambiguity, so the oracle replays the entire
    // quantize → dot → rescale → rank pipeline and hash-matches.
    Query("q92_quantized_topk", Some(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |s AS (SELECT vec_id, v,
        |        COALESCE(list_max(list_transform(v, x -> abs(x))), 0)
        |          AS scale
        |      FROM e),
        |z AS (SELECT vec_id, scale,
        |        CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
        |             ELSE list_transform(v, x ->
        |                    CAST(round(COALESCE(x, 0) * 127.0 / scale)
        |                      AS INTEGER))
        |        END AS q
        |      FROM s),
        |qv AS (SELECT scale AS qs, q AS qq FROM z WHERE vec_id = 0)
        |SELECT z.vec_id,
        |  ROUND(CAST(list_sum([CAST(z.q[i] AS BIGINT) * qq[i]
        |          FOR i IN generate_series(1, len(z.q))]) AS DOUBLE)
        |    * (z.scale * qs / 16129.0), 6) AS score
        |FROM z, qv
        |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin))(
      (s, dir) => {
        val qz = Similarity.quantizeInt8(t(s, dir, "embeddings"), "embedding")
          .select("vec_id", "scale", "q")
        val qrow = qz.filter(col("vec_id") === 0).head()
        Similarity.quantizedTopK(qz, "vec_id",
            qrow.getSeq[Int](qrow.fieldIndex("q")),
            qrow.getDouble(qrow.fieldIndex("scale")), k = 10)
          .orderBy(col("score").desc, col("vec_id"))
      }),

    // End-to-end corpus dedup — the operator a user actually runs:
    // near-dup pairs (the shared q39 frame) → connected components →
    // one surviving representative (min id) per cluster, reported with
    // its label and how many members it absorbed. Composes the whole
    // chain the preceding queries verify piecewise; adds one keyed
    // aggregation on the component label and one equi-join back to the
    // corpus (both co-located on the representative id). The oracle
    // closes the same edge set with the shared recursive CTE.
    Query("q98_dedup_corpus", Some(componentsCte +
      """,
        |comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id)
        |SELECT c.comp AS rep_id, e.label, COUNT(*) AS csize
        |FROM comp c JOIN embeddings e ON e.vec_id = c.comp
        |GROUP BY 1, 2 ORDER BY rep_id""".stripMargin))(
      (s, dir) =>
        Dedup.connectedComponents(
            t(s, dir, "embeddings").select("vec_id"), "vec_id",
            nearDupPairs(s, dir).select("id_a", "id_b"))
          .groupBy(col("comp"))
          .agg(count(lit(1)).as("csize"))
          .join(t(s, dir, "embeddings").select("vec_id", "label"),
            col("comp") === col("vec_id"))
          .select(col("vec_id").as("rep_id"), col("label"), col("csize"))
          .orderBy("rep_id")),

    // Delta ingestion against the persisted corpus bucket index — the
    // daily-crawl dedup shape: tonight's batch (every 10th doc,
    // re-ingested under new ids) is featurized and shuffled ONCE; the
    // corpus is read co-located from the (band, bucket)-bucketed index
    // table with its precomputed bucket sizes pruning hot buckets in
    // the scan — no corpus reshuffle, no corpus re-featurization.
    // Candidates are then exact-Jaccard verified against texts fetched
    // by semi-join (only matched documents are re-read). The oracle is
    // the exact all-pairs Jaccard over corpus ∪ delta restricted to
    // pairs touching the delta — a hash match proves index-probe
    // recall AND precision equal the O(n²) definition (q32's bar,
    // with the same provably-safe size prefilter).
    Query("q104_delta_dedup", Some(
      """WITH delta AS (
        |  SELECT doc_id + 2000000 AS doc_id, text FROM documents
        |  WHERE doc_id % 10 = 0),
        |allv AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id, text FROM delta),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                   FOR i IN generate_series(1, len(toks) - 2)]) AS sh
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |        FROM allv)),
        |sized AS (SELECT doc_id, sh, len(sh) AS ln FROM sh)
        |SELECT id_a, id_b, jacc FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (a.ln + b.ln - len(list_intersect(a.sh, b.sh))), 6) AS jacc
        |  FROM sized a JOIN sized b
        |    ON a.doc_id < b.doc_id
        |   AND b.doc_id >= 2000000
        |   AND least(a.ln, b.ln) >= 0.8 * greatest(a.ln, b.ln))
        |WHERE jacc >= 0.8 ORDER BY id_a, id_b""".stripMargin))(
      (s, dir) => {
        // probe + verify + expand fused in ONE operator (r11): the
        // delta reps are featurized once (band hashes AND shingles),
        // verification runs at representative/content grain before
        // member expansion, and only matched corpus ids are fetched —
        // see Dedup.deltaDedupVerified for the exchange-count story
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val idx = deltaIndexTable(s, dir)
        val delta = docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
        Dedup.deltaDedupVerified(delta, "doc_id", "text", idx, docs)
          .orderBy("id_a", "id_b")
      }),

    // Top principal component of the embedding table (one-pass O(d²)
    // moments aggregate + driver-side power iteration on the 64×64
    // covariance — codebook-class metadata, never the vectors).
    // Contract oracle (q42 form): the exact parts (row count, max
    // per-dimension population variance via milli-quantized integer
    // sums) replay in DuckDB; the spectral parts ride as booleans the
    // engine must make true — unit-norm eigenvector, eigenvalue
    // dominating every coordinate variance, centered projections with
    // zero mean and variance equal to the eigenvalue.
    Query("q174_pca_top1", Some(
      """WITH x AS (
        |  SELECT g.i AS dim,
        |    CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * 1e3 + 0.5)
        |      AS BIGINT) AS x3
        |  FROM embeddings, generate_series(1, 64) AS g(i)),
        |v AS (SELECT dim, COUNT(*) AS n, CAST(SUM(x3) AS BIGINT) AS s1,
        |    CAST(SUM(x3 * x3) AS BIGINT) AS s2
        |  FROM x GROUP BY 1),
        |pv AS (SELECT dim,
        |    FLOOR(CAST(n * s2 - s1 * s1 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * n * 1e6) * 1e6 + 0.5) / 1e6
        |      AS popvar
        |  FROM v)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings)
        |    AS n_vecs,
        |  (SELECT MAX(popvar) FROM pv) AS max_dim_var,
        |  true AS unit_norm, true AS lambda_ge_maxvar,
        |  true AS proj_mean_zero, true AS proj_var_ok""".stripMargin))(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val (mean, pc, lambda, _) =
          Similarity.topPrincipalComponent(emb, "embedding")
        val unitNorm =
          math.abs(math.sqrt(pc.map(x => x * x).sum) - 1.0) < 1e-9
        val projStats = Similarity
          .pcaProject(emb, "embedding", "vec_id", mean, pc)
          .agg(avg(col("proj")).as("mp"),
            avg(col("proj") * col("proj")).as("mpp"))
        val exact = emb
          .select(posexplode(col("embedding")).as(Seq("dim", "xf")))
          .select(col("dim"),
            floor(col("xf").cast("double") * 1e3 + 0.5).cast("long")
              .as("x3"))
          .groupBy(col("dim"))
          .agg(count(lit(1)).as("n"), sum(col("x3")).as("s1"),
            sum(col("x3") * col("x3")).as("s2"))
          .select((floor((col("n") * col("s2") - col("s1") * col("s1"))
              .cast("double")
            / (col("n").cast("double") * col("n") * 1e6) * 1e6 + 0.5)
            / 1e6).as("popvar"))
          .agg(max(col("popvar")).as("max_dim_var"))
        emb.agg(count(lit(1)).as("n_vecs"))
          .crossJoin(exact)
          .crossJoin(projStats)
          .select(col("n_vecs"), col("max_dim_var"),
            lit(unitNorm).as("unit_norm"),
            (col("max_dim_var") <= lit(lambda + 0.01))
              .as("lambda_ge_maxvar"),
            (abs(col("mp")) < 1e-6).as("proj_mean_zero"),
            (abs(col("mpp") - col("mp") * col("mp") - lambda) <=
              lit(1e-6 * (math.abs(lambda) + 1.0))).as("proj_var_ok"))
      }),

    // ANN probe over the persisted k-NN GRAPH index (the HNSW-class
    // path): best-first beam search, each round a partition-pruned
    // point read of the bucketed adjacency table seeded at the
    // per-cell medoids. Same exact top-10 oracle as q43/q47/q49 —
    // graph navigability recalls the full true top-10 at verify
    // scale; above it the beam bounds recall honestly, exactly as
    // nProbe does for IVF.
    Query("q180_graph_ann", Some(
      """SELECT v.vec_id,
        |  ROUND(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
        |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
        |     WHERE vec_id = 0)), 6) AS score
        |FROM embeddings v ORDER BY score DESC, vec_id LIMIT 10""".stripMargin))(
      (s, dir) =>
        Similarity.graphTopKIndexed(s, graphIndexPath(s, dir),
          "vec_id", queryVec(s, dir), k = 10)),

    // Substring-level duplication report via winnowing fingerprints
    // (Dedup.duplicateSubstringReport; Schleimer et al. SIGMOD 2003).
    // The oracle replays the EXACT anchor selection — the polynomial
    // rolling hash is deterministic integer math both engines compute
    // bit-equally (the power table is baked in as literals), windows
    // pick the rightmost minimum via list_reverse + list_position —
    // then groups on the anchor k-gram STRING, so result equality
    // never depends on hash-function parity between engines (the q37
    // principle, extended from whole-document to substring grain).
    Query("q181_winnow_dedup", Some(
      """WITH cp AS (
        |  SELECT doc_id, text,
        |    [CAST(unicode(substr(text, i, 1)) AS BIGINT)
        |     FOR i IN generate_series(1, length(text))] AS cps
        |  FROM documents),
        |hs AS (
        |  SELECT doc_id, text,
        |    [list_sum([cps[i+j] *
        |        ([617266377,913108910,579489385,294499921,
        |          2248091,17161,131,1])[j+1]
        |        FOR j IN generate_series(0, 7)]) % 1000000007
        |     FOR i IN generate_series(1, len(cps) - 7)] AS h
        |  FROM cp WHERE len(cps) >= 8),
        |anch AS (
        |  SELECT doc_id, text, list_distinct([
        |      p - 1 + len(h[p:least(p+3, len(h))]) + 1
        |        - list_position(list_reverse(h[p:least(p+3, len(h))]),
        |                        list_min(h[p:least(p+3, len(h))]))
        |      FOR p IN generate_series(1, greatest(1, len(h) - 3))]) AS pos
        |  FROM hs),
        |ex AS (
        |  SELECT doc_id,
        |    unnest(list_distinct([substr(text, x, 8) FOR x IN pos])) AS gram
        |  FROM anch),
        |dfq AS (SELECT gram, count(DISTINCT doc_id) AS nd
        |        FROM ex GROUP BY gram)
        |SELECT e.doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_grams,
        |  FLOOR(sum(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END) * 1e6
        |    / count(*)) / 1e6 AS dup_frac
        |FROM ex e JOIN dfq d USING (gram)
        |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin))(
      (s, dir) =>
        Dedup.duplicateSubstringReport(
            t(s, dir, "documents"), "doc_id", "text")
          .orderBy("doc_id")),

    // Substring-level DELTA screen against the persisted winnow-anchor
    // index (Dedup.substringDupAgainstIndex; built once in the bench
    // prebuild like the q104 minhash index): a synthetic "tonight's
    // crawl" — every 10th document re-crawled with a novel trailing
    // payload — probed for how much of its text already exists in the
    // corpus at substring grain. The oracle computes corpus and delta
    // anchors in one CTE chain (sides tagged) and replays the exact
    // anchor selection; hits group on gram content, never hash parity.
    Query("q182_winnow_delta", Some(
      """WITH base AS (
        |  SELECT doc_id, text, 'c' AS side FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000,
        |    text || ' qzjxvkw novel trailing payload absent from corpus',
        |    'd'
        |  FROM documents WHERE doc_id % 10 = 0),
        |cp AS (
        |  SELECT doc_id, side, text,
        |    [CAST(unicode(substr(text, i, 1)) AS BIGINT)
        |     FOR i IN generate_series(1, length(text))] AS cps
        |  FROM base),
        |hs AS (
        |  SELECT doc_id, side, text,
        |    [list_sum([cps[i+j] *
        |        ([617266377,913108910,579489385,294499921,
        |          2248091,17161,131,1])[j+1]
        |        FOR j IN generate_series(0, 7)]) % 1000000007
        |     FOR i IN generate_series(1, len(cps) - 7)] AS h
        |  FROM cp WHERE len(cps) >= 8),
        |anch AS (
        |  SELECT doc_id, side, text, list_distinct([
        |      p - 1 + len(h[p:least(p+3, len(h))]) + 1
        |        - list_position(list_reverse(h[p:least(p+3, len(h))]),
        |                        list_min(h[p:least(p+3, len(h))]))
        |      FOR p IN generate_series(1, greatest(1, len(h) - 3))]) AS pos
        |  FROM hs),
        |ex AS (
        |  SELECT doc_id, side,
        |    unnest(list_distinct([substr(text, x, 8) FOR x IN pos])) AS gram
        |  FROM anch),
        |cg AS (SELECT DISTINCT gram FROM ex WHERE side = 'c')
        |SELECT e.doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN cg.gram IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hit_grams,
        |  FLOOR(sum(CASE WHEN cg.gram IS NOT NULL THEN 1 ELSE 0 END) * 1e6
        |    / count(*)) / 1e6 AS hit_frac
        |FROM ex e LEFT JOIN cg ON e.gram = cg.gram
        |WHERE e.side = 'd'
        |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin))(
      (s, dir) => {
        val delta = t(s, dir, "documents")
          .filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            concat(col("text"),
              lit(" qzjxvkw novel trailing payload absent from corpus"))
              .as("text"))
        Dedup.substringDupAgainstIndex(delta, "doc_id", "text",
            winnowIndexTable(s, dir))
          .orderBy("doc_id")
      }),

    // Semantic decontamination (Similarity.semanticDecontaminate):
    // every 50th vector plays the benchmark eval set; the rest of the
    // corpus is screened for its max cosine against any eval vector.
    // Oracle is the exact brute force — the operator IS exact (the
    // eval side broadcasts whole, nothing approximates), so the twin
    // replays every similarity with list_cosine_similarity at the
    // shared 6-decimal rounding and the same (sim DESC, eid) tiebreak.
    Query("q183_semantic_decontam", Some(
      """WITH ev AS (
        |  SELECT vec_id AS eid, CAST(embedding AS DOUBLE[]) AS evv
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |s AS (
        |  SELECT e.vec_id, ev.eid,
        |    ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |      ev.evv), 6) AS sim
        |  FROM embeddings e CROSS JOIN ev WHERE e.vec_id % 50 <> 0),
        |r AS (
        |  SELECT vec_id, sim, eid, ROW_NUMBER() OVER (
        |    PARTITION BY vec_id ORDER BY sim DESC, eid) AS rn
        |  FROM s)
        |SELECT vec_id, sim AS max_sim, eid AS eval_id,
        |  sim >= 0.3 AS contaminated
        |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin))(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.semanticDecontaminate(
            emb.filter(col("vec_id") % 50 =!= 0), "vec_id", "embedding",
            emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
            threshold = 0.3)
          .orderBy("vec_id")
      }),

    // ANN probe over the INCREMENTALLY REFRESHED graph index (r11,
    // lever c): the q180 base index plus tonight's delta — exact
    // twins under new ids AND genuinely novel (perturbed) vectors —
    // inserted via Similarity.deltaInsertKnnGraph without a rebuild
    // (touched-cell pairing, heap-order adjacency merge, member
    // merge, touched-seed re-rank). The oracle is the brute-force
    // exact top-10 over corpus ∪ delta: a hash match proves the
    // refreshed index ranks the delta rows (twin members AND new
    // nodes) exactly as a full rebuild would.
    Query("q188_graph_ann_delta", Some(
      """WITH uni AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 2000000, CAST(embedding AS DOUBLE[])
        |  FROM embeddings WHERE vec_id % 10 = 0
        |  UNION ALL
        |  SELECT vec_id + 3000000,
        |    [CASE WHEN i = 1 THEN dv[i] + 0.25 ELSE dv[i] END
        |     FOR i IN generate_series(1, len(dv))]
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv
        |        FROM embeddings)
        |  WHERE vec_id % 10 = 5)
        |SELECT vec_id, ROUND(list_cosine_similarity(v,
        |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
        |     WHERE vec_id = 0)), 6) AS score
        |FROM uni ORDER BY score DESC, vec_id LIMIT 10""".stripMargin))(
      (s, dir) =>
        Similarity.graphTopKIndexed(s, graphDeltaIndexPath(s, dir),
          "vec_id", queryVec(s, dir), k = 10))
  ,

    // Hard-negative mining for contrastive/retrieval training: per
    // anchor (vec_id < 10), the top-3 most-similar corpus vectors of
    // a DIFFERENT label (a positive is never a negative) under the
    // near-duplicate ceiling (rounded cosine <= 0.95 — an unlabeled
    // twin is a false negative, not a hard one). Same broadcast +
    // bounded-heap shape as q58; the oracle ranks the identically
    // filtered scored cross product.
    Query("q197_hard_negatives", Some(
      """WITH q AS (
        |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv,
        |    label AS qlabel
        |  FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.qid, v.vec_id,
        |    ROUND(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
        |      q.qv), 6) AS score
        |  FROM embeddings v CROSS JOIN q
        |  WHERE v.label <> q.qlabel),
        |f AS (SELECT * FROM scored WHERE score <= 0.95)
        |SELECT qid, vec_id, score FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
        |  FROM f)
        |WHERE rn <= 3 ORDER BY qid, score DESC, vec_id""".stripMargin))(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.hardNegatives(emb, "embedding", "vec_id", "label",
            emb.filter(col("vec_id") < 10), k = 3, nearDupCeiling = 0.95)
          .orderBy(col("qid"), col("score").desc, col("vec_id"))
      })
  ,

    // Greedy k-center coreset (farthest-point traversal, Gonzalez
    // 1985): 8 maximally-diverse representatives — the "cover the
    // distribution" selection primitive, the opposite objective of
    // top-k similarity. Each round is one codegen'd scan (selected
    // vectors ride as plan literals) + a TakeOrderedAndProject top-1;
    // argmax on the rounded min squared distance with min-id ties so
    // the selection chain is engine-portable. The oracle replays the
    // greedy recursion with a recursive CTE + LATERAL argmax.
    Query("q198_kcenter", Some(
      """WITH RECURSIVE e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |sel(step, ids, dists) AS (
        |  SELECT 1, [(SELECT MIN(vec_id) FROM e)], CAST([] AS DOUBLE[])
        |  UNION ALL
        |  SELECT s.step + 1, list_append(s.ids, nxt.vec_id),
        |    list_append(s.dists, nxt.d)
        |  FROM sel s, LATERAL (
        |    SELECT c.vec_id,
        |      FLOOR(MIN(list_sum(list_transform(range(1, 65),
        |          i -> (c.v[i] - p.v[i]) * (c.v[i] - p.v[i]))))
        |        * 1e6 + 0.5) / 1e6 AS d
        |    FROM e c JOIN e p ON list_contains(s.ids, p.vec_id)
        |    WHERE NOT list_contains(s.ids, c.vec_id)
        |    GROUP BY c.vec_id
        |    ORDER BY d DESC, c.vec_id LIMIT 1) nxt
        |  WHERE s.step < 8)
        |SELECT g.i AS sel_rank, ids[g.i] AS vec_id,
        |  CASE WHEN g.i = 1 THEN NULL ELSE dists[g.i - 1] END
        |    AS min_dist
        |FROM (SELECT ids, dists FROM sel WHERE step = 8),
        |  generate_series(1, 8) g(i)
        |ORDER BY sel_rank""".stripMargin))(
      (s, dir) =>
        Similarity.kcenterSelect(t(s, dir, "embeddings"), "embedding",
            "vec_id", k = 8)
          .orderBy("sel_rank"))
  ,

    // Sparse random projection (Achlioptas 2003 JL transform): 64-dim
    // embeddings down to 8 dims with the {+1,0,-1}/{1/6,2/3,1/6} sign
    // matrix and the sqrt(3/8) variance correction — the scale path
    // for downstream embedding ops that don't need full
    // dimensionality. The md5-seeded sign matrix is baked into the
    // plan as an explicit ± term chain (one narrow zero-shuffle
    // codegen'd projection), and the SAME Scala derivation generates
    // the oracle SQL, so term order — hence IEEE accumulation —
    // matches bit for bit before the 6-decimal rounding.
    Query("q200_randproj", Some(randprojOracleSql))(
      (s, dir) =>
        Similarity.sparseRandomProjection(t(s, dir, "embeddings"),
            "embedding", "vec_id", dims = 64, kOut = 8)
          .orderBy("vec_id"))
  ,

    // IVF incremental delta insert — completes the index-maintenance
    // matrix (minhash q104, winnow q182, graph q188, IVF q203): the
    // q49 base transfers by file copy, the delta alone runs through
    // the stored codebook's exact assignment expression and APPENDS
    // into its cell directories (cost ∝ |delta|), and the unchanged
    // probe shape reads the refreshed index. Oracle = the q49/q117/
    // q204 CONTRACT form over corpus ∪ delta (DuckDB recomputes the
    // exact union top-10; recall_ok asserts ≥ 6 of 10) — the same
    // declared contract at every SF, replacing the r11 exact-equality
    // form that was only evidenced at verify scale and diverged at
    // sf0.1. Floor calibration (measured, seeded build): nProbe=8
    // recovers 7/10/10 at sf0.001/0.01/0.1. The novel delta vectors
    // negate their first coordinate (float-exact in both engines);
    // insert-correctness stays spec-pinned (full-probe ≡ brute force
    // over the union, counts additive, base untouched).
    Query("q203_ann_ivf_delta", Some(
      """WITH uni AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 2000000, CAST(embedding AS DOUBLE[])
        |  FROM embeddings WHERE vec_id % 10 = 0
        |  UNION ALL
        |  SELECT vec_id + 3000000,
        |    [CASE WHEN i = 1 THEN -dv[i] ELSE dv[i] END
        |     FOR i IN generate_series(1, len(dv))]
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv
        |        FROM embeddings)
        |  WHERE vec_id % 10 = 5),
        |topk AS (
        |  SELECT vec_id FROM uni
        |  ORDER BY ROUND(list_cosine_similarity(v,
        |      (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
        |       WHERE vec_id = 0)), 6) DESC, vec_id LIMIT 10)
        |SELECT vec_id, CAST(10 AS BIGINT) AS n_returned,
        |  true AS recall_ok
        |FROM topk ORDER BY vec_id""".stripMargin))(
      (s, dir) => {
        val got = Similarity.ivfTopKIndexed(s, ivfDeltaIndexPath(s, dir),
          "embedding", "vec_id", queryVec(s, dir), k = 10, nProbe = 8)
        val emb = t(s, dir, "embeddings")
        val uni = emb
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("embedding"))
          .unionAll(ivfDeltaFrame(s, dir).select(col("vec_id"),
            col("embedding").cast("array<double>").as("embedding")))
        val exact = Similarity.bruteForceTopK(uni, "embedding",
          "vec_id", queryVec(s, dir), k = 10)
        recallContract(got, exact, floor = 6)
      })
  ,

    // FUSED IVF-PQ probe (Jégou 2011 IVFADC; FAISS IndexIVFPQ): the
    // composite index combining q49's read pruning (scan only nProbe
    // cell partitions) with q117's compressed scan (m residual
    // byte-codes per vector, ADC lookup-table scoring) — the structure
    // that serves billion-vector corpora. Output scores are EXACT
    // (shortlist re-rank on real vectors); recall is the approximation
    // surface, so the oracle is the q117 CONTRACT form: DuckDB
    // recomputes the exact top-10 and `recall_ok` asserts the probe
    // recovered at least 8 of the true 10 — hash-checked per round.
    Query("q204_ann_ivfpq", Some(
      """WITH topk AS (
        |  SELECT vec_id FROM (
        |    SELECT v.vec_id,
        |      ROUND(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
        |        (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
        |         WHERE vec_id = 0)), 6) AS score
        |    FROM embeddings v ORDER BY score DESC, vec_id LIMIT 10))
        |SELECT vec_id, CAST(10 AS BIGINT) AS n_returned,
        |  true AS recall_ok
        |FROM topk ORDER BY vec_id""".stripMargin))(
      (s, dir) => {
        val got = Similarity.ivfPqTopKIndexed(s, ivfpqIndexPath(s, dir),
          t(s, dir, "embeddings"), "embedding", "vec_id",
          queryVec(s, dir), k = 10, nProbe = 10, shortlist = 150)
        val exact = Similarity.bruteForceTopK(t(s, dir, "embeddings"),
          "embedding", "vec_id", queryVec(s, dir), k = 10)
        recallContract(got, exact, floor = 8)
      })
  ,

    // DBSCAN over the shared q39 ε-neighborhood pair frame (threshold
    // 0.35, label blocking): density clustering with an explicit NOISE
    // verdict — cores = |N_ε| ≥ 3 (self included), clusters = core
    // subgraph components (min-id labels), borders attach to their
    // minimum core neighbor's cluster. Oracle replays the full
    // definition (recursive closure over core-core edges) and every
    // corpus row's (cluster, role) must match — noise included.
    Query("q206_dbscan", Some(
      """WITH RECURSIVE
        |bs AS MATERIALIZED (
        |  SELECT label, COUNT(DISTINCT embedding) AS nreps
        |  FROM embeddings GROUP BY label),
        |ok AS MATERIALIZED (
        |  SELECT e.vec_id, e.embedding, e.label FROM embeddings e
        |  JOIN bs USING (label) WHERE bs.nreps <= 10000),
        |pairs AS MATERIALIZED (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |      ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |        CAST(b.embedding AS DOUBLE[])), 6) AS score
        |    FROM ok a JOIN ok b
        |      ON a.label = b.label AND a.vec_id < b.vec_id)
        |  WHERE score >= 0.35),
        |edges AS MATERIALIZED (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |core AS MATERIALIZED (
        |  SELECT a AS id FROM edges GROUP BY a HAVING COUNT(*) + 1 >= 3),
        |cedges AS MATERIALIZED (
        |  SELECT a, b FROM edges
        |  WHERE a IN (SELECT id FROM core) AND b IN (SELECT id FROM core)),
        |reach(id, r) AS (
        |  SELECT id, id FROM core
        |  UNION
        |  SELECT r.id, e.b FROM reach r JOIN cedges e ON e.a = r.r),
        |comp AS MATERIALIZED (
        |  SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
        |border AS MATERIALIZED (
        |  SELECT e.a AS id, MIN(c.cluster) AS cluster
        |  FROM edges e JOIN comp c ON c.id = e.b
        |  WHERE e.a NOT IN (SELECT id FROM core) GROUP BY e.a)
        |SELECT v.vec_id,
        |  COALESCE(cm.cluster, bd.cluster) AS cluster,
        |  CASE WHEN cm.id IS NOT NULL THEN 'core'
        |       WHEN bd.id IS NOT NULL THEN 'border'
        |       ELSE 'noise' END AS role
        |FROM embeddings v
        |LEFT JOIN comp cm ON cm.id = v.vec_id
        |LEFT JOIN border bd ON bd.id = v.vec_id
        |ORDER BY v.vec_id""".stripMargin))(
      (s, dir) =>
        Similarity.dbscan(t(s, dir, "embeddings"), "vec_id",
            nearDupPairs(s, dir), minPts = 3)
          .orderBy("vec_id"))
  ,

    // MMR diversification (Carbonell & Goldstein 1998) of the
    // retrieval shortlist: top-20 by query relevance (distributed
    // TakeOrderedAndProject), then the greedy λ·rel − (1−λ)·max-sim
    // re-rank over the bounded shortlist (driver-side, codebook-class
    // state). Oracle unrolls all 8 greedy stages, so only the exact
    // pick sequence — ties, float complements and all — matches.
    Query("q207_mmr_diversify", Some(mmrOracleSql(kCand = 20, kOut = 8)))(
      (s, dir) =>
        Similarity.mmrDiversify(t(s, dir, "embeddings"), "embedding",
          "vec_id", queryVec(s, dir), kCand = 20, kOut = 8))
  ,

    // IVF-PQ incremental delta insert — the FIFTH index family in the
    // maintenance matrix (minhash q104, winnow q182, graph q188, IVF
    // q203, IVF-PQ q211): both quantizers are frozen metadata, so the
    // base file-copies, the delta alone encodes (cell assignment +
    // residual PQ codes, cost ∝ |delta|), and the unchanged q204
    // probe reads the refreshed index. Contract oracle over corpus ∪
    // delta (the q203 union, q204's recall form).
    Query("q211_ann_ivfpq_delta", Some(
      """WITH uni AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 2000000, CAST(embedding AS DOUBLE[])
        |  FROM embeddings WHERE vec_id % 10 = 0
        |  UNION ALL
        |  SELECT vec_id + 3000000,
        |    [CASE WHEN i = 1 THEN -dv[i] ELSE dv[i] END
        |     FOR i IN generate_series(1, len(dv))]
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv
        |        FROM embeddings)
        |  WHERE vec_id % 10 = 5),
        |topk AS (
        |  SELECT vec_id FROM (
        |    SELECT u.vec_id, ROUND(list_cosine_similarity(u.v,
        |      (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
        |       WHERE vec_id = 0)), 6) AS score
        |    FROM uni u ORDER BY score DESC, vec_id LIMIT 10))
        |SELECT vec_id, CAST(10 AS BIGINT) AS n_returned,
        |  true AS recall_ok
        |FROM topk ORDER BY vec_id""".stripMargin))(
      (s, dir) => {
        val uni = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
          .unionAll(ivfDeltaFrame(s, dir))
        val got = Similarity.ivfPqTopKIndexed(s, ivfpqDeltaIndexPath(s, dir),
          uni, "embedding", "vec_id", queryVec(s, dir), k = 10,
          nProbe = 10, shortlist = 150)
        val exact = Similarity.bruteForceTopK(uni, "embedding", "vec_id",
          queryVec(s, dir), k = 10)
        recallContract(got, exact, floor = 8)
      }),

    // INCREMENTAL component maintenance — the SIXTH family in the
    // index-maintenance matrix (minhash q104, winnow q182, graph q188,
    // IVF q203, IVF-PQ q211, components q218), and the first whose
    // refresh is EXACT rather than contract-graded: base min-id labels
    // already collapse every base edge, so base ∪ delta components =
    // base components merged along the delta edges; the merge graph is
    // bounded by |delta| and min-label merging reproduces full-
    // recompute labels bit for bit. Delta: the q188 twin re-ingest
    // (each linked to its original — "tonight's discovered dups") plus
    // consecutive-id links every 97th vector (cross-component merges).
    // Oracle: full recursive recompute over the union graph.
    Query("q218_components_delta", Some(componentsCte +
      """,
        |dn AS (SELECT vec_id + 2000000 AS id FROM embeddings
        |  WHERE vec_id % 10 = 0),
        |de AS (SELECT vec_id AS a, vec_id + 2000000 AS b
        |    FROM embeddings WHERE vec_id % 10 = 0
        |  UNION ALL
        |  SELECT e.vec_id, e.vec_id + 1 FROM embeddings e
        |    JOIN embeddings x ON x.vec_id = e.vec_id + 1
        |    WHERE e.vec_id % 97 = 0),
        |alledges AS (SELECT a, b FROM edges
        |  UNION ALL SELECT a, b FROM de
        |  UNION ALL SELECT b, a FROM de),
        |allnodes AS (SELECT vec_id AS id FROM embeddings
        |  UNION ALL SELECT id FROM dn),
        |reach2(id, r) AS (
        |  SELECT id, id FROM allnodes
        |  UNION
        |  SELECT r.id, e.b FROM reach2 r JOIN alledges e ON e.a = r.r)
        |SELECT id, MIN(r) AS comp FROM reach2 GROUP BY id
        |ORDER BY id""".stripMargin))(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val deltaNodes = emb.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 2000000L).as("id"))
        val twinEdges = emb.filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("a"), (col("vec_id") + 2000000L).as("b"))
        val crossEdges = emb.filter(col("vec_id") % 97 === 0)
          .select(col("vec_id").as("a"), (col("vec_id") + 1L).as("b"))
          .join(emb.select(col("vec_id").as("b")), Seq("b"), "left_semi")
          .select(col("a"), col("b"))
        val base = s.read.parquet(componentsIndexPath(s, dir))
        Dedup.deltaMergeComponents(base, deltaNodes,
            twinEdges.unionAll(crossEdges))
          .orderBy("id")
      }),

    // Component maintenance, UPSERT-EMIT form — the r12 verdict's
    // q218 economics fix measured: the full-table form's emit is an
    // Ω(base) remap scan that at 100x costs as much as recompute
    // (9.07 vs 9.17 s), so the registry-maintenance path emits ONLY
    // what the delta changes — new nodes + base rows whose label the
    // bounded merge map rewrites (refreshed registry = base OVERWRITTEN
    // BY this frame; untouched rows, the overwhelming majority at
    // scale, never move). Same delta batch as q218. Oracle: recompute
    // labels over BOTH graphs (base-only via reach, union via reach2)
    // and emit exactly the rows where they differ or the id is new —
    // the upsert set by definition, exact.
    Query("q230_components_upsert", Some(componentsCte +
      """,
        |base_lab AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
        |dn AS (SELECT vec_id + 2000000 AS id FROM embeddings
        |  WHERE vec_id % 10 = 0),
        |de AS (SELECT vec_id AS a, vec_id + 2000000 AS b
        |    FROM embeddings WHERE vec_id % 10 = 0
        |  UNION ALL
        |  SELECT e.vec_id, e.vec_id + 1 FROM embeddings e
        |    JOIN embeddings x ON x.vec_id = e.vec_id + 1
        |    WHERE e.vec_id % 97 = 0),
        |alledges AS (SELECT a, b FROM edges
        |  UNION ALL SELECT a, b FROM de
        |  UNION ALL SELECT b, a FROM de),
        |allnodes AS (SELECT vec_id AS id FROM embeddings
        |  UNION ALL SELECT id FROM dn),
        |reach2(id, r) AS (
        |  SELECT id, id FROM allnodes
        |  UNION
        |  SELECT r.id, e.b FROM reach2 r JOIN alledges e ON e.a = r.r),
        |new_lab AS (SELECT id, MIN(r) AS comp FROM reach2 GROUP BY id)
        |SELECT n.id, n.comp FROM new_lab n
        |LEFT JOIN base_lab b USING (id)
        |WHERE b.id IS NULL OR b.comp <> n.comp
        |ORDER BY id""".stripMargin))(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val deltaNodes = emb.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 2000000L).as("id"))
        val twinEdges = emb.filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("a"), (col("vec_id") + 2000000L).as("b"))
        val crossEdges = emb.filter(col("vec_id") % 97 === 0)
          .select(col("vec_id").as("a"), (col("vec_id") + 1L).as("b"))
          .join(emb.select(col("vec_id").as("b")), Seq("b"), "left_semi")
          .select(col("a"), col("b"))
        val base = s.read.parquet(componentsIndexPath(s, dir))
        Dedup.deltaMergeComponentsUpsert(base, deltaNodes,
            twinEdges.unionAll(crossEdges))
          .orderBy("id")
      })
  )

  /** Persisted min-id component labels over the q67 near-dup graph —
    * the dedup-cluster registry q218's incremental maintenance
    * refreshes. One-time build per (session, sfDir): the q67
    * component pass plus a parquet write, amortized in the bench
    * prebuild step like the ANN indexes.
    */
  private val compIdxCache = new graft.SessionCache[String]
  def componentsIndexPath(s: SparkSession, dir: String): String =
    compIdxCache.get(s, dir) {
      val p = newIdxDir("graft_comp_idx")
      Dedup.connectedComponents(
          t(s, dir, "embeddings").select("vec_id"), "vec_id",
          nearDupPairs(s, dir).select("id_a", "id_b"))
        .write.mode("overwrite").parquet(p)
      p
    }

  /** Oracle SQL for q207 — the greedy MMR selection unrolled to
    * `kOut` stages (the k-core/BFS oracle pattern: a non-greedy or
    * mis-tied engine answer cannot silently match). λ and 1−λ are
    * interpolated from the SAME Scala doubles the engine multiplies
    * with, so both engines parse bit-identical literals (1−0.7 is NOT
    * 0.3 in IEEE arithmetic — it prints, and must parse back as,
    * 0.30000000000000004).
    */
  private def mmrOracleSql(kCand: Int, kOut: Int): String = {
    val lambda = 0.7
    val lc = 1 - lambda
    val stages = (2 to kOut).map { i =>
      s"""m$i AS MATERIALIZED (
         |  SELECT c.id, c.rel, $lambda * c.rel - $lc * MAX(s.s) AS mmr
         |  FROM cand c JOIN sims s ON s.ia = c.id
         |    AND s.ib IN (SELECT id FROM sel${i - 1})
         |  WHERE c.id NOT IN (SELECT id FROM sel${i - 1})
         |  GROUP BY c.id, c.rel),
         |p$i AS MATERIALIZED (
         |  SELECT id, rel, mmr, $i AS rank FROM m$i
         |  ORDER BY mmr DESC, id LIMIT 1),
         |sel$i AS (SELECT id FROM sel${i - 1}
         |  UNION ALL SELECT id FROM p$i)""".stripMargin
    }.mkString(",\n")
    val unionAll = (1 to kOut).map(i => s"SELECT * FROM p$i")
      .mkString("\n  UNION ALL ")
    s"""WITH cand AS MATERIALIZED (
       |  SELECT v.vec_id AS id, CAST(v.embedding AS DOUBLE[]) AS v,
       |    ROUND(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
       |      (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
       |       WHERE vec_id = 0)), 6) AS rel
       |  FROM embeddings v ORDER BY rel DESC, v.vec_id LIMIT $kCand),
       |sims AS MATERIALIZED (
       |  SELECT a.id AS ia, b.id AS ib,
       |    ROUND(list_cosine_similarity(a.v, b.v), 6) AS s
       |  FROM cand a JOIN cand b ON a.id <> b.id),
       |p1 AS MATERIALIZED (
       |  SELECT id, rel, $lambda * rel AS mmr, 1 AS rank
       |  FROM cand ORDER BY mmr DESC, id LIMIT 1),
       |sel1 AS (SELECT id FROM p1),
       |$stages
       |SELECT CAST(rank AS BIGINT) AS rank, id AS vec_id, rel,
       |  ROUND(mmr, 6) AS mmr
       |FROM ($unionAll)
       |ORDER BY rank""".stripMargin
  }

  /** Oracle SQL for q200 — generated from the same Achlioptas sign
    * derivation the engine bakes into its plan (see
    * [[graft.operators.Similarity.sparseRandomProjection]]); the ±
    * term chains are emitted in the same ascending-dimension order.
    */
  private def randprojOracleSql: String = {
    val proj = (0 until 8).map { j =>
      val terms = (0 until 64).flatMap { d =>
        Similarity.achlioptasSign("rp", j, d) match {
          case 1  => Some(s"+ v[${d + 1}]")
          case -1 => Some(s"- v[${d + 1}]")
          case _  => None
        }
      }
      val chain =
        if (terms.isEmpty) "0.0"
        else (terms.head.stripPrefix("+ ") +: terms.tail).mkString(" ")
      s"  FLOOR(($chain) * sqrt(3.0/8) * 1e6 + 0.5) / 1e6 AS p$j"
    }.mkString(",\n")
    s"""SELECT vec_id,
       |$proj
       |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |      FROM embeddings)
       |ORDER BY vec_id""".stripMargin
  }
}
