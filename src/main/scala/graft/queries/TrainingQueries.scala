package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Sampling, TextAnalysis}

/** Training-data curation operators beyond analysis: repetition-quality
  * gating, deterministic split/mixture sampling, and sequence packing —
  * the steps between "clean corpus" and "training batches". All four
  * are content-keyed and engine-portable (md5 / pure SQL semantics), so
  * each has a FULL DuckDB oracle, not just an invariant.
  */
object TrainingQueries {

  import org.apache.spark.sql.{DataFrame, SparkSession}
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val all: Seq[Query] = Seq(

    // Gopher-style repetition quality signals per document: total /
    // distinct 2-gram counts, the most-frequent-2-gram count, and the
    // two repetition fractions used to gate boilerplate. One shuffle
    // on (doc_id, gram) with map-side combine.
    Query("q50_repetition", Some(
      """WITH g AS (
        |  SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1]
        |                         FOR i IN generate_series(1, len(toks) - 1)])
        |    AS gram
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |        FROM documents)),
        |pg AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
        |  COUNT(*) AS n_distinct_grams,
        |  MAX(c) AS top_gram_n,
        |  ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_gram_frac,
        |  ROUND(CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
        |    / SUM(c), 6) AS dup_gram_frac
        |FROM pg GROUP BY doc_id ORDER BY doc_id""".stripMargin))(
      (s, dir) =>
        TextAnalysis.repetitionStats(
            t(s, dir, "documents").select("doc_id", "text"),
            "doc_id", "text", n = 2)
          .orderBy("doc_id")),

    // Content-keyed 80/10/10 split: md5 bucket of the text decides the
    // assignment, so duplicates land in the same split on any engine,
    // any run, any partitioning. Thresholds are integer 256ths
    // (205/231) — exact on both sides.
    Query("q51_split", Some(
      """SELECT doc_id,
        |  CASE WHEN hv < 205 THEN 'train' WHEN hv < 231 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |  (ascii(substr(md5(text), 1, 1)) -
        |     CASE WHEN ascii(substr(md5(text), 1, 1)) >= 97
        |          THEN 87 ELSE 48 END) * 16
        |  + (ascii(substr(md5(text), 2, 1)) -
        |     CASE WHEN ascii(substr(md5(text), 2, 1)) >= 97
        |          THEN 87 ELSE 48 END) AS hv
        |  FROM documents) ORDER BY doc_id""".stripMargin))(
      (s, dir) =>
        Sampling.deterministicSplit(
            t(s, dir, "documents").select("doc_id", "text"), col("text"))
          .select("doc_id", "split")
          .orderBy("doc_id")),

    // Deterministic mixture sampling: per-source keep-weights (here
    // 1/4..4/4 by source index mod 4 — the upweight-wiki/downsample-
    // crawl shape), membership decided by an independent md5 bucket
    // (offset 3, decorrelated from the split above).
    Query("q52_mixture", Some(
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    (ascii(substr(md5(text), 3, 1)) -
        |       CASE WHEN ascii(substr(md5(text), 3, 1)) >= 97
        |            THEN 87 ELSE 48 END) * 16
        |    + (ascii(substr(md5(text), 4, 1)) -
        |       CASE WHEN ascii(substr(md5(text), 4, 1)) >= 97
        |            THEN 87 ELSE 48 END) AS hv,
        |    (1 + (CAST(substr(source, 4) AS INTEGER) % 4)) * 64 AS w
        |  FROM documents)
        |WHERE hv < w ORDER BY doc_id""".stripMargin))(
      (s, dir) => {
        val idx = substring(col("source"), 4, 8).cast("int")
        Sampling.weightedSample(
            t(s, dir, "documents").select("doc_id", "source", "text"),
            col("text"), (lit(1) + pmod(idx, lit(4))) * lit(64))
          .select("doc_id", "source")
          .orderBy("doc_id")
      }),

    // Sequence packing: per-source contiguous fill into 512-token
    // bins; pack_id = the bin the document STARTS in. One shuffle on
    // source; the running total is a bounded per-group window.
    Query("q53_pack", Some(
      """SELECT doc_id, source, n_tokens,
        |  CAST(FLOOR((SUM(n_tokens) OVER w - n_tokens) / 512) AS BIGINT)
        |    AS pack_id
        |FROM (SELECT doc_id, source,
        |        CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |          AS n_tokens
        |      FROM documents)
        |WINDOW w AS (PARTITION BY source ORDER BY doc_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY doc_id""".stripMargin))(
      (s, dir) =>
        Sampling.packBySequence(
            t(s, dir, "documents").select(col("doc_id"), col("source"),
              size(TextAnalysis.wsTokens(col("text"))).cast("bigint")
                .as("n_tokens")),
            Seq("source"), "doc_id", "n_tokens", budget = 512)
          .orderBy("doc_id"))
  )
}
