package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The north-star composition: one end-to-end LLM-training-corpus
  * curation DAG chaining the per-stage operators this engine verifies
  * piecewise — the corpus analog of the reference's CRM pipeline
  * composition (/root/reference/main.py:650-684, which chains its
  * clean/join/filter stages into one program the same way).
  *
  * Stage order is the published pre-training recipe (with an
  * exact-raw pre-collapse in front — stage 0 below — so the regex
  * stages run once per distinct raw text; outcome-identical because
  * byte-identical docs share every gate verdict and min-id election):
  *
  *   0. raw collapse— slim (md5(raw), min id) election + semi-join.
  *   1. clean      — [[TextAnalysis.cleanWebText]]: strip markup,
  *                   unescape entities, collapse whitespace, NFC.
  *   2. lang-id    — [[TextAnalysis.withLangId]]: keep `keepLang`.
  *   3. quality    — [[TextAnalysis.gopherQualityFlags]]: keep
  *                   `quality_ok` docs (published Gopher thresholds).
  *   4. exact dedup— min-id representative per md5(clean) group,
  *                   window-min over the raw-distinct survivors (twin
  *                   mass is gone after stage 0, so the exchange only
  *                   carries clean-level collisions),
  *                   [[Dedup.exact]] semantics.
  *   5. near-dup   — [[Dedup.setSimilarityJoin]] (exact prefix-filter
  *                   Jaccard ≥ num/den on word `shingleN`-gram
  *                   shingles) → [[Dedup.connectedComponents]] → keep
  *                   each component's min-id representative.
  *   6. decontam   — [[Decontaminate.decontaminate]]: drop survivors
  *                   sharing any word `decontamN`-gram with the eval
  *                   frame (eval grams broadcast; train never
  *                   reshuffles for this stage).
  *   7. split      — [[Sampling.groupSplit]] keyed on the COMPONENT
  *                   label, so a near-dup pair can never straddle
  *                   train/test even if both members survive.
  *   8. pack       — [[Sampling.packBySequence]]: contiguous
  *                   `packBudget`-token bins per (split, source).
  *
  * Composition is exactly what per-operator oracles can't check:
  * schema drift at stage boundaries, persist lifetimes across an
  * iterative stage, filters that must commute with joins. q175 runs
  * this whole DAG against a single DuckDB replay of all eight stages.
  *
  * Scale shape: stages 1-3 are one narrow zero-shuffle projection
  * chain over the corpus scan; stage 4 is the pipeline's first corpus
  * shuffle; stages 5-6 run on the deduplicated survivor frame (the
  * corpus after boilerplate/duplicate mass is gone), which
  * `localCheckpoint` pins once — the near-dup join and every later
  * consumer read those blocks instead of re-running the regex chain
  * (HeavyPersist would be evicted by the near-dup operator's own
  * internal scope). The ITERATIVE stage runs on the paired subgraph
  * only — min-label rounds are bounded by the near-dup mass, never
  * the corpus, and the corpus pays one left join against the small
  * label frame (singletons label themselves, so output is identical
  * to full-set components). Splitting adds no shuffle (the component
  * label is already on the row); packing is one bounded
  * per-(split, source) window.
  */
object CorpusPipeline {

  /** Run the eight-stage curation DAG over `corpus` (idCol, source,
    * textCol). Returns one row per surviving document:
    * (idCol, source, comp, split, n_tokens, pack_id).
    */
  def curate(corpus: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, evalId: String, evalText: String,
      keepLang: String = "en", jaccardNum: Int = 3, jaccardDen: Int = 5,
      shingleN: Int = 3, decontamN: Int = 5,
      packBudget: Int = 512): DataFrame = {
    // 0: EXACT-RAW PRE-COLLAPSE — the engine's exact-dedup-first trade
    // applied to the pipeline head: byte-identical raw docs produce
    // byte-identical clean/lang-id/quality/dedup outcomes, so the
    // regex-heavy stages below run once per DISTINCT raw text, not
    // once per copy (at the 100× rehearsal, where every doc has 100
    // exact twins, this is a 100× cut of the pipeline's dominant
    // cost — lang-id alone was ~21 s of a 41 s run before it).
    // Correctness is exact, not approximate: the final stage keeps
    // the min-id row per md5(clean) group, and min over raw-group
    // mins IS the global min (each kept row carries the min-id doc's
    // own source), so every downstream row is identical. Shape: the
    // min-id election runs on a SLIM (md5, id) projection — fixed
    // 40-byte rows with map-side combine, so the exchange carries
    // ~distinct texts — and the winners come back via a semi-join on
    // id (AQE broadcasts the id list when the distinct count is
    // small; the raw corpus rescan it costs is a plain scan, cheap
    // by construction since no regex has run yet). Electing with a
    // full-row min_by instead measured 8× slower here: carrying the
    // text through object-aggregation buffers is exactly the work
    // the slim projection avoids. The survivors are CHECKPOINTED
    // before the regex chain: fusing the join probe with the
    // clean/lang-id/quality expression tree into one codegen stage
    // measured 23 s where checkpoint-then-chain measures ~6 s at the
    // 100× rehearsal (the fused stage's generated code collapses out
    // of JIT-compilable shape), and the checkpoint is the collapsed
    // frame — distinct texts, the small side by construction on any
    // dup-heavy corpus.
    val rawKeep = corpus
      .select(md5(col(textCol)).as("__h"), col(idCol))
      .groupBy("__h").agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val rawReps = corpus.join(rawKeep, Seq(idCol), "left_semi")
      .localCheckpoint(false)
    // 1-3: clean → lang gate → quality gate, one narrow chain. The
    // quality stage re-tokenizes the cleaned text; its n_words IS the
    // pipeline's token count (wsTokens), reused for packing below.
    // Flags are APPENDED on the same projection (gopherQualityAppend),
    // not computed on a separate frame and joined back — the join form
    // would execute the regex-heavy clean + lang-id chain once per
    // join side and add the pipeline's only avoidable shuffle.
    val cleaned = rawReps.select(col(idCol), col("source"),
      TextAnalysis.cleanWebText(col(textCol)).as("__clean"))
    val langKept = TextAnalysis.withLangId(cleaned, "__clean", "__lang")
      .filter(col("__lang") === keepLang).drop("__lang")
    val qual = TextAnalysis.gopherQualityAppend(langKept, "__clean")
      .filter(col("quality_ok"))
      .select(col(idCol), col("source"), col("__clean"),
        col("n_words").as("n_tokens"))
    // 4: exact dedup on the CLEANED content — min-doc_id
    // representative per md5(clean) group (Dedup.exact's tiebreak
    // contract), window-min form: one shuffle of the (already
    // raw-distinct, gate-surviving) frame on the content hash. The
    // twin mass was removed by stage 0, so this exchange carries only
    // clean-level collisions the raw collapse can't see (markup
    // variants that clean to the same text); a min_by(struct)
    // election was measured and rejected — its object-agg buffers
    // carry the full text per group, slower than the window's
    // codegen'd sort at every scale tried.
    val ex = qual
      .withColumn("__gid", min(col(idCol))
        .over(Window.partitionBy(md5(col("__clean")))))
      .filter(col(idCol) === col("__gid")).drop("__gid")
      .localCheckpoint(false)
    // 5: exact near-dup pairs → components → component representative.
    // Components run over the PAIRED SUBGRAPH only: a node outside
    // every pair is a singleton that labels itself by definition, so
    // feeding the full survivor set to the iterative stage (as this
    // pipeline originally did) makes every min-label round — join,
    // partial agg, checkpoint, convergence scan — pay corpus-sized
    // frames to relabel rows that never change. Restricted, each round
    // is bounded by 2·|pairs| (the near-dup mass, tiny after exact
    // dedup), and the corpus pays ONE left join against the small
    // label frame (AQE sees the materialized size and broadcasts)
    // instead of an inner join with a corpus-sized labeling. Same
    // output bit for bit: comp = CC label for paired nodes, own id
    // otherwise — exactly what full-set CC returns.
    // pairs is consumed TWICE below (endpoint set + the component
    // stage's edge frame) — checkpointed so the prefix-filter join
    // runs once, not once per consumer.
    val pairs = Dedup.setSimilarityJoin(ex, idCol, "__clean",
        jaccardNum, jaccardDen, n = shingleN)
      .select("id_a", "id_b")
      .localCheckpoint(false)
    val pairNodes = pairs.select(col("id_a").as(idCol))
      .unionAll(pairs.select(col("id_b").as(idCol)))
      .distinct()
    val reps = ex
      .join(Dedup.connectedComponents(pairNodes, idCol, pairs)
          .select(col("id").as(idCol), col("comp")),
        Seq(idCol), "left")
      .withColumn("comp", coalesce(col("comp"), col(idCol)))
      .filter(col(idCol) === col("comp"))
    // 6-8: decontaminate vs the eval frame, split by component,
    // pack per (split, source)
    val decon = Decontaminate.decontaminate(reps, idCol, "__clean",
      evalDocs, evalId, evalText, n = decontamN)
    Sampling.packBySequence(
        Sampling.groupSplit(decon, col("comp"))
          .select(col(idCol), col("source"), col("comp"), col("split"),
            col("n_tokens")),
        Seq("split", "source"), idCol, "n_tokens", packBudget)
  }
}
