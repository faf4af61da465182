package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{CorpusStats, Sampling, Selection, Temporal, TextAnalysis}

/** Round-6 data-selection + corpus-health surface (SURVEY.md §2.10
  * continuation): DSIR hashed-importance scoring, per-source KL
  * divergence over the word distribution, distinct-n diversity, Zipf
  * rank-frequency slopes, deterministic fill-in-the-middle splits, and
  * deterministic MLM mask planning. All FULL DuckDB oracles; every
  * float goes through integer-quantized sums or the portable
  * FLOOR(x·1e6 + 0.5)/1e6 rounding (house convention).
  */
object SelectionQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val all: Seq[Query] = Seq(

    // DSIR-style hashed-n-gram importance scores: every document
    // scored by the smoothed log-likelihood ratio of its hashed
    // unigram distribution, target slice (src1-src3) vs the rest.
    // The 256-bucket weight table quantizes λ to micro-units, so the
    // per-doc score is an exact integer sum — both engines sum the
    // same integers in any order.
    Query("q157_dsir", Some(
      """WITH rawtok AS (
        |  SELECT doc_id, source IN ('src1','src2','src3') AS tgt,
        |    unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, tgt,
        |    ('0x' || substr(md5(w), 1, 2))::BIGINT AS b
        |  FROM rawtok WHERE w <> ''),
        |tb AS (
        |  SELECT b, SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS t,
        |         SUM(CASE WHEN tgt THEN 0 ELSE 1 END) AS r
        |  FROM tok GROUP BY 1),
        |tt AS (SELECT SUM(t) AS tot_t, SUM(r) AS tot_r FROM tb),
        |lam AS (
        |  SELECT b, CAST(FLOOR((LN((t + 0.5) / (tot_t + 128.0)) -
        |      LN((r + 0.5) / (tot_r + 128.0))) * 1e6 + 0.5) AS BIGINT)
        |    AS lam6
        |  FROM tb, tt)
        |SELECT doc_id, COUNT(*) AS n_toks,
        |  CAST(SUM(lam6) AS BIGINT) AS lam6_sum,
        |  FLOOR(CAST(SUM(lam6) AS DOUBLE) / COUNT(*) + 0.5) / 1e6 AS score
        |FROM tok JOIN lam USING (b)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin))(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Selection.dsirScores(docs, "doc_id", "text",
            col("source").isin("src1", "src2", "src3"))
          .orderBy("doc_id")
      }),

    // Smoothed KL divergence of each source's word distribution vs
    // the corpus — the off-distribution screen. Terms quantize to
    // nano-units before the vocab-wide sum.
    Query("q158_kl_divergence", Some(
      """WITH tok AS (SELECT source,
        |    unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |gw AS (SELECT source, w, COUNT(*) AS c FROM tok GROUP BY 1, 2),
        |vocab AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cw FROM gw
        |          GROUP BY 1),
        |grp AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ng FROM gw
        |        GROUP BY 1),
        |corpus AS (SELECT CAST(SUM(cw) AS BIGINT) AS nn,
        |             COUNT(*) AS vv FROM vocab),
        |spine AS (
        |  SELECT g.source, g.ng, v.cw, COALESCE(x.c, 0) AS c, nn, vv
        |  FROM grp g CROSS JOIN vocab v
        |  LEFT JOIN gw x ON x.source = g.source AND x.w = v.w
        |  CROSS JOIN corpus)
        |SELECT source AS "group", ng AS n_tokens,
        |  FLOOR(CAST(SUM(CAST(FLOOR(
        |      ((c + 0.5) / (ng + vv / 2.0)) *
        |      (LN((c + 0.5) / (ng + vv / 2.0)) -
        |       LN((cw + 0.5) / (nn + vv / 2.0))) * 1e9 + 0.5)
        |    AS BIGINT)) AS DOUBLE) / 1e3 + 0.5) / 1e6 AS kl
        |FROM spine GROUP BY 1, 2 ORDER BY "group"""".stripMargin))(
      (s, dir) =>
        CorpusStats.klVsCorpus(t(s, dir, "documents"), col("source"), "text")
          .orderBy("group")),

    // Distinct-n lexical diversity per source (n = 1, 2, 3): type/
    // token ratios over word n-grams — the repetitiveness screen.
    Query("q159_distinct_n", Some(
      """WITH tk AS (SELECT source,
        |    string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT source, 1 AS n, unnest(toks) AS gram FROM tk
        |  UNION ALL
        |  SELECT source, 2 AS n, unnest(
        |    [toks[i] || ' ' || toks[i+1]
        |     FOR i IN generate_series(1, len(toks) - 1)]) AS gram FROM tk
        |  UNION ALL
        |  SELECT source, 3 AS n, unnest(
        |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |     FOR i IN generate_series(1, len(toks) - 2)]) AS gram FROM tk)
        |SELECT source AS "group", n,
        |  COUNT(DISTINCT gram) AS types, COUNT(*) AS grams,
        |  FLOOR(CAST(COUNT(DISTINCT gram) AS DOUBLE) / COUNT(*) * 1e6
        |    + 0.5) / 1e6 AS ratio
        |FROM g GROUP BY 1, 2 ORDER BY "group", n""".stripMargin))(
      (s, dir) =>
        CorpusStats.distinctN(t(s, dir, "documents"), col("source"), "text")
          .orderBy("group", "n")),

    // Zipf rank-frequency slope per source: OLS of ln(freq) on
    // ln(rank) over the top-100 words, all five regression sums exact
    // integer sums of micro-quantized logs.
    Query("q160_zipf_slope", Some(
      """WITH tok AS (SELECT source,
        |    unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |c AS (SELECT source, w, COUNT(*) AS c FROM tok GROUP BY 1, 2),
        |r AS (SELECT source, c, w, ROW_NUMBER() OVER (
        |    PARTITION BY source ORDER BY c DESC, w) AS rank FROM c),
        |q AS (SELECT source,
        |    CAST(FLOOR(LN(CAST(rank AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
        |      AS x,
        |    CAST(FLOOR(LN(CAST(c AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y
        |  FROM r WHERE rank <= 100),
        |s AS (SELECT source, COUNT(*) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM q GROUP BY 1)
        |SELECT source AS "group", n AS n_top,
        |  FLOOR(CAST(n * sxy - sx * sy AS DOUBLE) /
        |    CAST(n * sxx - sx * sx AS DOUBLE) * 1e6 + 0.5) / 1e6 AS slope
        |FROM s ORDER BY "group"""".stripMargin))(
      (s, dir) =>
        CorpusStats.zipfSlope(t(s, dir, "documents"), col("source"), "text")
          .orderBy("group")),

    // Deterministic fill-in-the-middle split plan: two 16-bit md5
    // draws mod (n_chars + 1) cut each document into
    // prefix | middle | suffix. Pure integer arithmetic — the oracle
    // replays every cut exactly.
    Query("q161_fim_split", Some(
      """SELECT doc_id,
        |  LEAST(c1, c2) AS prefix_len,
        |  GREATEST(c1, c2) - LEAST(c1, c2) AS middle_len,
        |  n_chars - GREATEST(c1, c2) AS suffix_len
        |FROM (
        |  SELECT doc_id, n_chars,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
        |      % (n_chars + 1) AS c1,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 5, 4))::BIGINT
        |      % (n_chars + 1) AS c2
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin))(
      (s, dir) =>
        Selection.fimSplit(t(s, dir, "documents"), "doc_id", "n_chars")
          .orderBy("doc_id")),

    // Deterministic MLM mask plan at 38/256 ≈ 15%: token (d, p) is
    // masked iff md5(d#p) falls under the rate — reproducible masks,
    // every decision replayed by the oracle.
    Query("q162_mask_plan", Some(
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents),
        |p AS (SELECT doc_id,
        |    unnest(generate_series(0, len(toks) - 1)) AS pos FROM t)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(CASE WHEN ('0x' || substr(
        |      md5(doc_id || '#' || pos), 1, 2))::BIGINT < 38
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
        |  FLOOR(CAST(SUM(CASE WHEN ('0x' || substr(
        |      md5(doc_id || '#' || pos), 1, 2))::BIGINT < 38
        |    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 1e6 + 0.5) / 1e6
        |    AS mask_ratio
        |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin))(
      (s, dir) =>
        Selection.maskPlan(t(s, dir, "documents"), "doc_id", "text")
          .orderBy("doc_id")),

    // Vocabulary-overlap Jaccard between every source pair — the
    // corpus-mix overlap matrix. Pair fan-out is bounded by the
    // (small) number of sources, never corpus × corpus.
    Query("q163_vocab_overlap", Some(
      """WITH gw AS (SELECT DISTINCT g, w FROM (
        |    SELECT source AS g,
        |      unnest(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents)),
        |sz AS (SELECT g, COUNT(*) AS v FROM gw GROUP BY 1),
        |pr AS (SELECT a.g AS g_a, b.g AS g_b, COUNT(*) AS shared
        |       FROM gw a JOIN gw b USING (w) WHERE a.g < b.g
        |       GROUP BY 1, 2)
        |SELECT g_a, g_b, shared,
        |  FLOOR(CAST(shared AS DOUBLE) / (sa.v + sb.v - shared) * 1e6
        |    + 0.5) / 1e6 AS jaccard
        |FROM pr JOIN sz sa ON sa.g = pr.g_a
        |JOIN sz sb ON sb.g = pr.g_b
        |ORDER BY g_a, g_b""".stripMargin))(
      (s, dir) =>
        CorpusStats.vocabOverlap(t(s, dir, "documents"), col("source"),
            "text")
          .orderBy("g_a", "g_b")),

    // Kaplan-Meier churn/survival over per-user activity spans
    // (1-hour duration units, 24-hour right-censor horizon). The KM
    // product is a cumulative sum of nano-quantized ln terms — exact
    // integer sums in both engines.
    Query("q164_kaplan_meier", Some(
      """WITH s AS (SELECT user_id, min(epoch_us(ts)) AS f,
        |    max(epoch_us(ts)) AS l FROM events GROUP BY 1),
        |hz AS (SELECT max(l) AS hz FROM s),
        |d AS (SELECT (l - f) // 3600000000 AS t,
        |        l < hz - 86400000000 AS obs FROM s, hz),
        |g AS (SELECT t, COUNT(*) AS n,
        |        SUM(CASE WHEN obs THEN 1 ELSE 0 END) AS churned
        |      FROM d GROUP BY 1),
        |w AS (SELECT t, n, churned, SUM(n) OVER (ORDER BY t
        |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |        AS at_risk FROM g),
        |x AS (SELECT t, at_risk, churned,
        |        SUM(CASE WHEN churned < at_risk THEN CAST(FLOOR(
        |            LN(1.0 - CAST(churned AS DOUBLE) / at_risk) * 1e9
        |            + 0.5) AS BIGINT) ELSE 0 END)
        |          OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |            AND CURRENT ROW) AS q9s,
        |        MAX(CASE WHEN churned = at_risk THEN 1 ELSE 0 END)
        |          OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |            AND CURRENT ROW) AS dead
        |      FROM w)
        |SELECT t, CAST(at_risk AS BIGINT) AS at_risk,
        |  CAST(churned AS BIGINT) AS churned,
        |  CASE WHEN dead = 1 THEN 0.0
        |       ELSE FLOOR(EXP(CAST(q9s AS DOUBLE) / 1e9) * 1e6 + 0.5)
        |         / 1e6 END AS surv
        |FROM x WHERE churned > 0 ORDER BY t""".stripMargin))(
      (s, dir) =>
        Temporal.kaplanMeier(
            t(s, dir, "events")
              .select(col("user_id"), expr("ts div 1000").as("tus")),
            "user_id", "tus", 3600000000L, 86400000000L)
          .orderBy("t")),

    // Greedy token-budget curriculum fill: sources ranked by exact
    // integer mean-chars-per-doc, admitted while the running token
    // total before the source stays under 30k tokens.
    Query("q166_budget_fill", Some(
      """WITH per AS (
        |  SELECT source AS "group",
        |    CAST(SUM(len(string_split_regex(trim(text), '\s+')))
        |      AS BIGINT) AS toks,
        |    COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
        |  FROM documents GROUP BY 1),
        |r AS (SELECT "group", toks, (chars * 1000000) // n AS score
        |      FROM per),
        |w AS (SELECT "group", toks,
        |        ROW_NUMBER() OVER (ORDER BY score DESC, "group") AS rank,
        |        CAST(SUM(toks) OVER (ORDER BY score DESC, "group"
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cum_toks
        |      FROM r)
        |SELECT "group", rank, toks, cum_toks,
        |  cum_toks - toks < 30000 AS selected
        |FROM w ORDER BY "group"""".stripMargin))(
      (s, dir) =>
        Selection.budgetFill(t(s, dir, "documents"), col("source"),
            "text", "n_chars", 30000L)
          .select(col("group"), col("rank").cast("long").as("rank"),
            col("toks"), col("cum_toks"), col("selected"))
          .orderBy("group")),

    // Vocabulary coverage curve (top 200 ranks): cumulative token
    // mass by census rank — "how small can the vocab be and still
    // cover 90%". Integer share arithmetic; covers90 compares
    // integers, not the rounded double.
    Query("q167_vocab_coverage", Some(
      """WITH c AS (SELECT w, COUNT(*) AS cnt FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents) GROUP BY 1),
        |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM c),
        |r AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, w)
        |        AS rank,
        |        CAST(SUM(cnt) OVER (ORDER BY cnt DESC, w
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cum
        |      FROM c)
        |SELECT CAST(rank AS BIGINT) AS rank, cnt,
        |  FLOOR(CAST(cum AS DOUBLE) / tot * 1e6 + 0.5) / 1e6
        |    AS cum_share,
        |  cum * 10 >= tot * 9 AS covers90
        |FROM r, t WHERE rank <= 200 ORDER BY rank""".stripMargin))(
      (s, dir) =>
        CorpusStats.vocabCoverage(t(s, dir, "documents"), "text")
          .orderBy("rank")),

    // Exponentially time-decayed engagement per user (6 h half-life
    // from the corpus horizon): recency-weighted sums with per-event
    // integer quantization, so both engines sum identical integers.
    Query("q168_decay_agg", Some(
      """WITH hz AS (SELECT MAX(epoch_us(ts)) AS hz FROM events),
        |q AS (SELECT user_id,
        |    CAST(FLOOR(value * EXP(-LN(2.0) *
        |        (CAST(hz - epoch_us(ts) AS DOUBLE) / 21600000000.0))
        |      * 1e6 + 0.5) AS BIGINT) AS v6,
        |    CAST(FLOOR(EXP(-LN(2.0) *
        |        (CAST(hz - epoch_us(ts) AS DOUBLE) / 21600000000.0))
        |      * 1e6 + 0.5) AS BIGINT) AS w6
        |  FROM events, hz)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(v6) AS BIGINT) / 1e6 AS decayed_sum,
        |  CAST(SUM(w6) AS BIGINT) / 1e6 AS decayed_n
        |FROM q GROUP BY 1 ORDER BY user_id""".stripMargin))(
      (s, dir) =>
        Temporal.decayAgg(
            t(s, dir, "events")
              .select(col("user_id"), expr("ts div 1000").as("tus"),
                col("value")),
            "user_id", "tus", "value", 21600000000L)
          .orderBy("user_id")),

    // Semi-structured extraction: JSON props field pulled per event
    // (codegen'd get_json_object, no UDF), grouped stats per k —
    // money-style exact decimal sums.
    Query("q169_json_props", Some(
      """WITH e AS (SELECT
        |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |    value FROM events)
        |SELECT k, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_value,
        |  FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |    / COUNT(*) * 1e6 + 0.5) / 1e6 AS avg_value
        |FROM e GROUP BY 1 ORDER BY k""".stripMargin))(
      (s, dir) =>
        t(s, dir, "events")
          .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
            col("value"))
          .groupBy("k")
          .agg(count(lit(1)).as("n"),
            Query.dsum(col("value")).as("total_value"))
          .select(col("k"), col("n"), col("total_value"),
            (floor(col("total_value") / col("n") * 1e6 + 0.5) / 1e6)
              .as("avg_value"))
          .orderBy("k")),

    // Multinomial Naive Bayes source classifier (train + score +
    // confusion matrix in one program): per-class word log-likelihoods
    // with Laplace smoothing, quantized to integer micro-units in the
    // bounded vocab × classes model frame, so every per-doc score is
    // an exact integer sum and the argmax (ties → min class) replays
    // identically in the oracle.
    Query("q171_nb_confusion", Some(
      """WITH tok AS (
        |  SELECT doc_id, source, w FROM (
        |    SELECT doc_id, source, unnest(
        |      string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents) WHERE w <> ''),
        |dw AS (SELECT doc_id, source, w, COUNT(*) AS n_dw
        |       FROM tok GROUP BY 1, 2, 3),
        |cw AS (SELECT source AS cls, w, COUNT(*) AS n_cw
        |       FROM tok GROUP BY 1, 2),
        |ct AS (SELECT cls, CAST(SUM(n_cw) AS BIGINT) AS n_c
        |       FROM cw GROUP BY 1),
        |vs AS (SELECT COUNT(DISTINCT w) AS v FROM cw),
        |vocab AS (SELECT DISTINCT w FROM cw),
        |wt AS (SELECT vocab.w, ct.cls,
        |    CAST(FLOOR(LN((COALESCE(cw.n_cw, 0) + 1.0) / (ct.n_c + vs.v))
        |      * 1e6 + 0.5) AS BIGINT) AS w6
        |  FROM vocab CROSS JOIN ct CROSS JOIN vs
        |  LEFT JOIN cw ON cw.w = vocab.w AND cw.cls = ct.cls),
        |pr AS (SELECT source AS cls, COUNT(*) AS n_docs
        |       FROM documents GROUP BY 1),
        |prt AS (SELECT COUNT(*) AS n_docs_tot FROM documents),
        |p6 AS (SELECT cls, CAST(FLOOR(LN(CAST(n_docs AS DOUBLE)
        |      / n_docs_tot) * 1e6 + 0.5) AS BIGINT) AS p6
        |  FROM pr, prt),
        |sc AS (SELECT dw.doc_id, dw.source AS actual, wt.cls,
        |    CAST(SUM(dw.n_dw * wt.w6) AS BIGINT) AS l6
        |  FROM dw JOIN wt ON wt.w = dw.w GROUP BY 1, 2, 3),
        |pred AS (SELECT doc_id, actual, cls AS predicted FROM (
        |    SELECT sc.*, ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY sc.l6 + p6.p6 DESC, cls) AS rn
        |    FROM sc JOIN p6 USING (cls)) WHERE rn = 1)
        |SELECT actual AS source, predicted, COUNT(*) AS n
        |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))(
      (s, dir) =>
        Selection.naiveBayes(t(s, dir, "documents"), "doc_id", "text",
            "source")
          .groupBy(col("source"), col("predicted"))
          .agg(count(lit(1)).as("n"))
          .orderBy("source", "predicted")),

    // Flesch reading-ease per document: exact integer word /
    // sentence / vowel-group-syllable counts from codegen'd regex +
    // higher-order array expressions (zero shuffle), score
    // floor-rounded at 6 decimals — the identical float expression on
    // both engines.
    Query("q172_readability", Some(
      """WITH w AS (
        |  SELECT doc_id, text, list_filter(
        |      string_split_regex(trim(lower(text)), '\s+'),
        |      x -> x <> '') AS ws
        |  FROM documents),
        |c AS (SELECT doc_id,
        |    CAST(GREATEST(len(ws), 1) AS BIGINT) AS n_words,
        |    CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
        |      AS BIGINT) AS n_sents,
        |    CAST(COALESCE(list_sum(list_transform(ws, x ->
        |        GREATEST(len(regexp_extract_all(x, '[aeiouy]+')), 1))), 0)
        |      AS BIGINT) AS n_syll
        |  FROM w)
        |SELECT doc_id, n_words, n_sents, n_syll,
        |  FLOOR((206.835
        |    - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
        |    - 84.6 * (CAST(n_syll AS DOUBLE) / n_words)) * 1e6 + 0.5)
        |    / 1e6 AS flesch
        |FROM c ORDER BY doc_id""".stripMargin))(
      (s, dir) =>
        TextAnalysis.readability(t(s, dir, "documents"), "doc_id", "text")
          .orderBy("doc_id")),

    // Cross-source 5-gram duplication matrix: distinct shingles per
    // source, shared counts + Jaccard per ordered source pair — the
    // mixture-level leakage screen (vocabOverlap compares WORDS, this
    // compares phrases).
    Query("q173_crossdup", Some(
      """WITH ss AS (
        |  SELECT DISTINCT source AS src,
        |    ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h FROM (
        |    SELECT source, unnest([toks[i] || ' ' || toks[i+1] || ' ' ||
        |        toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]
        |        FOR i IN generate_series(1, len(toks) - 4)]) AS sh
        |    FROM (SELECT source,
        |        string_split_regex(trim(lower(text)), '\s+') AS toks
        |      FROM documents))),
        |sizes AS (SELECT src, COUNT(*) AS sz FROM ss GROUP BY 1),
        |shared AS (SELECT a.src AS src_a, b.src AS src_b,
        |    COUNT(*) AS shared
        |  FROM ss a JOIN ss b ON a.h = b.h AND a.src < b.src
        |  GROUP BY 1, 2)
        |SELECT sa.src AS src_a, sb.src AS src_b,
        |  COALESCE(sh.shared, 0) AS shared,
        |  FLOOR(CAST(COALESCE(sh.shared, 0) AS DOUBLE) /
        |    (sa.sz + sb.sz - COALESCE(sh.shared, 0)) * 1e6 + 0.5) / 1e6
        |    AS jac
        |FROM sizes sa CROSS JOIN sizes sb
        |LEFT JOIN shared sh ON sh.src_a = sa.src AND sh.src_b = sb.src
        |WHERE sa.src < sb.src
        |ORDER BY src_a, src_b""".stripMargin))(
      (s, dir) =>
        TextAnalysis.crossDupMatrix(t(s, dir, "documents"), col("source"),
            "text", n = 5)
          .orderBy("src_a", "src_b")),

    // Largest-remainder (Hamilton) budget apportionment: a 100k-token
    // budget split across sources by measured whitespace-token mass.
    // Pure integer/decimal arithmetic both sides (DuckDB `//`/`%` on
    // BIGINT vs Spark decimal DIV/%), so quotas hash-match exactly and
    // sum to the budget by construction. Budget 99991 (prime) forces a
    // nonzero leftover to exercise the remainder ranking.
    Query("q176_budget_apportion", Some(
      """WITH wt AS (
        |  SELECT source, CAST(SUM(len(list_filter(
        |      string_split_regex(trim(text), '\s+'), w -> w <> '')))
        |    AS BIGINT) AS weight
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT SUM(weight) AS W FROM wt),
        |a AS (SELECT source, weight,
        |        (99991 * weight) // W AS base,
        |        (99991 * weight) % W AS rem
        |      FROM wt, tot),
        |l AS (SELECT 99991 - SUM(base) AS leftover FROM a),
        |r AS (SELECT a.*, ROW_NUMBER() OVER (
        |        ORDER BY rem DESC, source ASC) AS rk FROM a)
        |SELECT source, weight, CAST(base AS BIGINT) AS base,
        |  CAST(rem AS BIGINT) AS rem,
        |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
        |    AS BIGINT) AS quota
        |FROM r, l ORDER BY source""".stripMargin))(
      (s, dir) => {
        val weights = t(s, dir, "documents")
          .select(col("source"),
            size(filter(TextAnalysis.wsTokens(col("text")),
              w => w =!= "")).cast("long").as("nw"))
          .groupBy("source").agg(sum(col("nw")).as("w"))
        Sampling.apportionBudget(weights, "source", "w", budget = 99991L)
          .withColumnRenamed("group", "source")
          .orderBy("source")
      }),

    // Encoding-health QA over deterministically planted decode damage
    // (the corpus is synthetic and clean, so both engines append the
    // same artifacts first — the q55 pattern): U+FFFD replacement
    // chars, C0 controls, and the UTF-8-as-Latin-1 mojibake signature.
    Query("q177_encoding_quality", Some(
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '\x{FFFD}')) AS BIGINT)
        |    AS n_repl,
        |  CAST(len(regexp_extract_all(t,
        |    '[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}\x{7F}]')) AS BIGINT)
        |    AS n_ctrl,
        |  CAST(len(regexp_extract_all(t,
        |    '[\x{C3}\x{C2}][\x{80}-\x{BF}]')) AS BIGINT) AS n_moji,
        |  len(regexp_extract_all(t, '\x{FFFD}')) = 0
        |    AND len(regexp_extract_all(t,
        |      '[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}\x{7F}]')) = 0
        |    AND len(regexp_extract_all(t,
        |      '[\x{C3}\x{C2}][\x{80}-\x{BF}]')) = 0 AS enc_ok
        |FROM (SELECT doc_id, text ||
        |    CASE CAST(doc_id % 4 AS INTEGER)
        |      WHEN 1 THEN ' caf' || chr(65533)
        |      WHEN 2 THEN ' x' || chr(7)
        |      WHEN 3 THEN ' caf' || chr(195) || chr(169)
        |      ELSE '' END AS t
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin))(
      (s, dir) =>
        TextAnalysis.encodingQuality(
            t(s, dir, "documents").select(col("doc_id"),
              concat(col("text"),
                when(pmod(col("doc_id"), lit(4)) === 1, lit(" caf\uFFFD"))
                  .when(pmod(col("doc_id"), lit(4)) === 2, lit(" x\u0007"))
                  .when(pmod(col("doc_id"), lit(4)) === 3,
                    lit(" caf\u00C3\u00A9"))
                  .otherwise(lit(""))).as("t")),
            "doc_id", "t")
          .select(col("doc_id"), col("n_repl").cast("bigint").as("n_repl"),
            col("n_ctrl").cast("bigint").as("n_ctrl"),
            col("n_moji").cast("bigint").as("n_moji"), col("enc_ok"))
          .orderBy("doc_id")),

    // Tokenizer fertility per source: BPE-ish subword tokens emitted
    // per whitespace word — the mixture-design cost number. The ratio
    // divides two exact int64 sums, so group order can't change it.
    Query("q178_fertility", Some(
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(len(list_filter(
        |    string_split_regex(trim(text), '\s+'), w -> w <> '')))
        |    AS BIGINT) AS n_words,
        |  CAST(SUM(len(regexp_extract_all(text,
        |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS n_tokens,
        |  FLOOR(CAST(SUM(len(regexp_extract_all(text,
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS DOUBLE)
        |    / GREATEST(SUM(len(list_filter(
        |        string_split_regex(trim(text), '\s+'), w -> w <> ''))), 1)
        |    * 1e6 + 0.5) / 1e6 AS fertility
        |FROM documents GROUP BY source ORDER BY source""".stripMargin))(
      (s, dir) =>
        TextAnalysis.tokenizerFertility(t(s, dir, "documents"), "source",
            "text")
          .orderBy("source"))
  ,

    // 2-D Pareto frontier (skyline) over (length, lexical diversity):
    // multi-criteria data selection — keep the documents no other
    // document beats on BOTH n_chars and distinct-token count. The
    // engine runs the distributed sort-sweep (group-by-x max, strict-
    // prefix-max window over the |distinct x| aggregate frame,
    // broadcast semi-join back — never the O(n²) dominance self-join
    // the oracle is allowed to brute-force at verify scale).
    Query("q196_skyline", Some(
      """WITH a AS (SELECT doc_id, n_chars,
        |    len(list_distinct(list_filter(
        |      string_split_regex(trim(lower(text)), '\s+'),
        |      w -> w <> ''))) AS n_distinct
        |  FROM documents)
        |SELECT a.doc_id, a.n_chars, a.n_distinct FROM a
        |WHERE NOT EXISTS (SELECT 1 FROM a b
        |  WHERE b.n_chars >= a.n_chars AND b.n_distinct >= a.n_distinct
        |    AND (b.n_chars > a.n_chars OR b.n_distinct > a.n_distinct))
        |ORDER BY doc_id""".stripMargin))(
      (s, dir) => {
        val a = t(s, dir, "documents").select(col("doc_id"), col("n_chars"),
          size(array_distinct(filter(
            TextAnalysis.wsTokens(lower(col("text"))), _ =!= "")))
            .as("n_distinct"))
        Selection.skyline2d(a, "doc_id", "n_chars", "n_distinct")
          .orderBy("doc_id")
      })
  ,

    // Interpolated Kneser-Ney bigram surprisal per document (absolute
    // discount 0.75) — the LM smoothing real perplexity filters use,
    // beside q132's add-one baseline: the continuation probability
    // N₁₊(·,cur)/B replaces raw frequency, so boilerplate words that
    // appear often but in ONE context stop looking cheap. All LM
    // statistics derive from the bigram-count frame (one corpus
    // shuffle); oracle replays the full estimator.
    Query("q208_kn_surprisal", Some(
      """WITH b AS (
        |  SELECT doc_id, unnest([{'prev': toks[i-1], 'cur': toks[i]}
        |                         FOR i IN generate_series(2, len(toks))])
        |    AS bg
        |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)),
        |          '\s+') AS toks FROM documents)),
        |f AS (SELECT doc_id, bg.prev AS prev, bg.cur AS cur FROM b),
        |c2 AS (SELECT prev, cur, COUNT(*) AS c2 FROM f GROUP BY 1, 2),
        |c1 AS (SELECT prev, SUM(c2) AS c1, COUNT(*) AS n1f
        |  FROM c2 GROUP BY 1),
        |cr AS (SELECT cur, COUNT(*) AS n1r FROM c2 GROUP BY 1),
        |t AS (SELECT COUNT(*) AS bt FROM c2),
        |s AS (SELECT f.doc_id, COUNT(*) AS n_bigrams,
        |    SUM(CAST(-ln(
        |      GREATEST(c2.c2 - 0.75, 0.0) / CAST(c1.c1 AS DOUBLE)
        |      + (0.75 * c1.n1f / CAST(c1.c1 AS DOUBLE))
        |        * (cr.n1r / CAST(t.bt AS DOUBLE)))
        |      AS DECIMAL(18,12))) AS ssum
        |  FROM f JOIN c2 USING (prev, cur) JOIN c1 USING (prev)
        |  JOIN cr USING (cur) CROSS JOIN t GROUP BY f.doc_id)
        |SELECT d.doc_id, COALESCE(s.n_bigrams, 0) AS n_bigrams,
        |  ROUND(CAST(s.ssum AS DOUBLE) / s.n_bigrams, 6) AS kn_surprisal
        |FROM (SELECT DISTINCT doc_id FROM documents) d
        |LEFT JOIN s USING (doc_id)
        |ORDER BY doc_id""".stripMargin))(
      (s, dir) =>
        TextAnalysis.knSurprisal(t(s, dir, "documents"), "doc_id", "text")
          .orderBy("doc_id"))
  ,

    // Training-shard export plan: md5-shuffled corpus bin-packed into
    // ~4096-token shards. The engine computes the global running sum
    // with the TWO-PHASE distributed cumsum (range sort + per-
    // partition windows + broadcast prefix offsets — never a
    // one-partition global window); the oracle replays it with the
    // plain window form, which is the same number by definition.
    Query("q209_shard_plan", Some(
      """WITH x AS (SELECT doc_id, md5(text) AS h,
        |    len(string_split_regex(trim(text), '\s+')) AS ntok
        |  FROM documents),
        |c AS (SELECT doc_id, ntok, SUM(ntok) OVER (ORDER BY h, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM x)
        |SELECT doc_id, ntok, CAST((cum - ntok) // 4096 AS BIGINT) AS shard
        |FROM c ORDER BY doc_id""".stripMargin))(
      (s, dir) =>
        Selection.shardPlan(t(s, dir, "documents"), "doc_id", "text",
            targetTokens = 4096)
          .orderBy("doc_id"))
  )
}
