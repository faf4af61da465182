package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.CorpusPipeline

/** The end-to-end corpus-curation composition (SURVEY.md §2.10): one
  * declared query running [[graft.operators.CorpusPipeline.curate]]'s
  * eight-stage DAG — clean → lang-id → Gopher quality → exact dedup →
  * near-dup components → decontaminate → leakage-safe split → pack —
  * against a single DuckDB replay of the whole chain. The corpus
  * analog of q44's CRM pipeline composition: every stage is already
  * oracle-checked piecewise (q106/q36/q133/q29/q153+q67/q54/q91/q53);
  * THIS query checks their composition, where schema drift and
  * stage-boundary bugs live.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val all: Seq[Query] = Seq(

    // The fixture plants both duplicate classes the pipeline must
    // catch: a markup-wrapped re-ingestion of every 3rd doc (id + 1e6
    // — the clean stage normalizes it back to the original text, so
    // EXACT dedup must collapse it: cleaning is load-bearing) and a
    // one-token-appended copy of every 7th doc (id + 2e6 — different
    // hash, 3-gram Jaccard (w−2)/(w−1) ≥ 0.6, so only the NEAR-DUP
    // components stage collapses it). Eval slice = doc_id < 20, which
    // decontamination must remove from the survivors along with any
    // doc sharing a word 5-gram with it. At sf0.01: 87 wrapped copies
    // die at stage 4, 41 near-dup copies die at stage 5 — every stage
    // is observable in the output, none is a pass-through.
    Query("q175_corpus_pipeline_e2e", Some(
      """WITH RECURSIVE
        |corpus AS (
        |  SELECT doc_id, source, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, source, '<div> ' || text || ' </div>'
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, source, text || ' postscript'
        |  FROM documents WHERE doc_id % 7 = 0),
        |cl AS (
        |  SELECT doc_id, source,
        |    nfc_normalize(trim(regexp_replace(
        |      replace(replace(replace(replace(replace(
        |        regexp_replace(text, '<[^>]*>', ' ', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |      '&amp;', '&'),
        |    '\s+', ' ', 'g'))) AS clean
        |  FROM corpus),
        |lt AS (
        |  SELECT doc_id, source, clean,
        |    list_transform(string_split_regex(trim(clean), '\s+'),
        |                   x -> lower(x)) AS ltoks
        |  FROM cl),
        |ls AS (
        |  SELECT doc_id, source, clean,
        |    CAST(greatest(len(ltoks), 1) AS DOUBLE) AS n,
        |    CAST(len(list_filter(ltoks, x -> list_contains(
        |      ['the','and','of','to','a','in','is','it','that','for','was',
        |       'on','are','with','as','at','this'], x))) AS DOUBLE) AS c_en,
        |    CAST(len(list_filter(ltoks, x -> list_contains(
        |      ['el','la','de','que','y','en','un','una','los','las','por',
        |       'con','para','es','no','se'], x))) AS DOUBLE) AS c_es,
        |    CAST(len(list_filter(ltoks, x -> list_contains(
        |      ['der','die','das','und','ist','ich','nicht','ein','eine',
        |       'mit','auf','für','von','zu','den'], x))) AS DOUBLE) AS c_de,
        |    CAST(len(list_filter(ltoks, x -> list_contains(
        |      ['le','la','les','de','des','et','est','un','une','dans',
        |       'que','pour','avec','sur','au','ce'], x))) AS DOUBLE) AS c_fr
        |  FROM lt),
        |lang AS (
        |  SELECT doc_id, source, clean FROM (
        |    SELECT doc_id, source, clean,
        |      list_aggregate(
        |        [{'s': c_en / n, 'lang': 'en'}, {'s': c_es / n, 'lang': 'es'},
        |         {'s': c_de / n, 'lang': 'de'}, {'s': c_fr / n, 'lang': 'fr'}],
        |        'max') AS best,
        |      length(regexp_replace(clean, '[^\x{4e00}-\x{9fff}]', '', 'g'))
        |        > length(clean) * 0.3 AS is_zh
        |    FROM ls)
        |  WHERE NOT is_zh AND best.s > 0 AND best.lang = 'en'),
        |gq AS (
        |  SELECT doc_id, source, clean, CAST(len(toks) AS BIGINT) AS n_tokens
        |  FROM (SELECT doc_id, source, clean,
        |          string_split_regex(trim(clean), '\s+') AS toks FROM lang)
        |  WHERE len(toks) BETWEEN 50 AND 100000
        |    AND FLOOR(CAST(COALESCE(list_sum(
        |          list_transform(toks, t -> length(t))), 0) AS DOUBLE)
        |        / GREATEST(len(toks), 1) * 1e6 + 0.5) / 1e6 BETWEEN 3.0 AND 10.0
        |    AND FLOOR(CAST(len(list_filter(toks,
        |          t -> t IN ('#', '...', '…'))) AS DOUBLE)
        |        / GREATEST(len(toks), 1) * 1e6 + 0.5) / 1e6 <= 0.1
        |    AND len(list_filter(
        |        ['the','and','of','to','a','in','is','it','that','for',
        |         'was','on','are','with','as','at','this'],
        |        s -> list_contains(list_transform(toks, t -> lower(t)), s)))
        |      >= 2),
        |ex AS (
        |  SELECT doc_id, source, clean, n_tokens FROM (
        |    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(clean)) AS keep_id
        |    FROM gq)
        |  WHERE doc_id = keep_id),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |     FOR i IN generate_series(1, len(toks) - 2)]) AS sh
        |  FROM (SELECT doc_id, string_split_regex(trim(clean), '\s+') AS toks
        |        FROM ex)),
        |sized AS (SELECT doc_id, sh, len(sh) AS ln FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sized a JOIN sized b
        |    ON a.doc_id < b.doc_id
        |   AND a.ln * 3 <= b.ln * 5 AND b.ln * 3 <= a.ln * 5
        |  WHERE len(list_intersect(a.sh, b.sh)) * 5
        |      >= (a.ln + b.ln - len(list_intersect(a.sh, b.sh))) * 3),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM ex
        |  UNION
        |  SELECT r.id, e.b FROM reach r JOIN edges e ON e.a = r.r),
        |comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
        |reps AS (
        |  SELECT e.doc_id, e.source, e.clean, e.n_tokens, c.comp
        |  FROM ex e JOIN comp c ON c.id = e.doc_id
        |  WHERE e.doc_id = c.comp),
        |evg AS (
        |  SELECT DISTINCT unnest(
        |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
        |       || toks[i+3] || ' ' || toks[i+4]
        |     FOR i IN generate_series(1, len(toks) - 4)]) AS gram
        |  FROM (SELECT string_split_regex(trim(text), '\s+') AS toks
        |        FROM documents WHERE doc_id < 20)),
        |decon AS (
        |  SELECT r.* FROM reps r
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM (
        |      SELECT unnest(
        |        [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
        |           || toks[i+3] || ' ' || toks[i+4]
        |         FOR i IN generate_series(1, len(toks) - 4)]) AS gram
        |      FROM (SELECT string_split_regex(trim(r.clean), '\s+')
        |              AS toks)) g
        |    JOIN evg USING (gram))),
        |sp AS (
        |  SELECT doc_id, source, n_tokens, comp,
        |    CASE WHEN hv < 205 THEN 'train' WHEN hv < 231 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM (SELECT *,
        |    ('0x' || substr(md5(CAST(comp AS VARCHAR)), 1, 2))::BIGINT AS hv
        |    FROM decon))
        |SELECT doc_id, source, comp, split, n_tokens,
        |  CAST(FLOOR((SUM(n_tokens) OVER w - n_tokens) / 512) AS BIGINT)
        |    AS pack_id
        |FROM sp
        |WINDOW w AS (PARTITION BY split, source ORDER BY doc_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY doc_id""".stripMargin))(
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "source", "text")
        val corpus = docs
          .unionAll(docs.filter(col("doc_id") % 3 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
              concat(lit("<div> "), col("text"), lit(" </div>")).as("text")))
          .unionAll(docs.filter(col("doc_id") % 7 === 0)
            .select((col("doc_id") + 2000000L).as("doc_id"), col("source"),
              concat(col("text"), lit(" postscript")).as("text")))
        CorpusPipeline.curate(corpus, "doc_id", "text",
            docs.filter(col("doc_id") < 20), "doc_id", "text")
          .orderBy("doc_id")
      })
  )
}
