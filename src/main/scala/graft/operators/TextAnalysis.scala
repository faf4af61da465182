package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines over the
  * `documents` table (extended surface, SURVEY.md §2.10): tokenization,
  * quality scoring, language ID, fingerprinting. All native expressions
  * — no UDFs.
  *
  * Higher-order array functions are interpreted and re-evaluate shared
  * subtrees per reference (see Dedup.scala doc), so every operator here
  * materializes its token array in one projection and derives the
  * many-reference statistics from the bound column in the next.
  */
object TextAnalysis {

  /** Whitespace tokens of a text column. */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish token segmentation: word pieces, numbers, and individual
    * punctuation as separate tokens (a regex approximation of byte-pair
    * pretokenizers — exact BPE requires a learned merge table).
    */
  def bpeIshTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** All word n-grams (non-distinct, in order) from a MATERIALIZED
    * token-array column: contiguous n-token windows joined by single
    * spaces. Taking tokens (not raw text) keeps the per-window
    * `element_at` lookups O(1) array reads instead of re-splitting the
    * text.
    */
  def ngramsFromTokens(w: Column, n: Int): Column = {
    val windows = transform(sequence(lit(0), size(w) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*))
    when(size(w) >= n, windows).otherwise(array().cast("array<string>"))
  }

  /** Word n-gram shingles (distinct n-grams) — the set form used for
    * Jaccard/MinHash.
    */
  def shinglesFromTokens(w: Column, n: Int): Column =
    array_distinct(ngramsFromTokens(w, n))

  /** Convenience: shingles straight from text — only for bounded
    * inputs (tests); pipelines use shinglesFromTokens over a
    * materialized token column.
    */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(wsTokens(text), n)

  /** Per-document quality/stat columns appended to `df`: token count
    * (whitespace and BPE-ish), char count, mean token length,
    * punctuation ratio, stopword ratio, uppercase ratio — the standard
    * cheap quality filters.
    */
  def textStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val keep = df.columns.map(col)
    val toks = col("__toks")
    val nTok = size(toks)
    val n1 = greatest(nTok, lit(1))
    val stop = typedlit(stopwords("en"))
    df.select(keep :+ wsTokens(col(textCol)).as("__toks"): _*)
      .select(keep ++ Seq(
        nTok.as("n_tokens"),
        size(bpeIshTokens(col(textCol))).as("n_bpe_tokens"),
        length(col(textCol)).as("n_chars_m"),
        round(length(col(textCol)).cast("double") / n1, 6).as("mean_tok_len"),
        round(size(filter(toks, x => x.rlike("^[^A-Za-z0-9]+$"))).cast("double")
          / n1, 6).as("punct_ratio"),
        round(size(filter(toks, x => array_contains(stop, lower(x)))).cast("double")
          / n1, 6).as("stop_ratio"),
        round(size(filter(toks, x => x.rlike("^[A-Z]"))).cast("double")
          / n1, 6).as("upper_ratio")): _*)
  }

  /** Tiny per-language function-word profiles for heuristic language
    * ID. Public-knowledge word lists, intentionally small — a cheap
    * pipeline heuristic, not a model.
    */
  def stopwords(lang: String): Seq[String] = lang match {
    case "en" => Seq("the", "and", "of", "to", "a", "in", "is", "it",
      "that", "for", "was", "on", "are", "with", "as", "at", "this")
    case "es" => Seq("el", "la", "de", "que", "y", "en", "un", "una",
      "los", "las", "por", "con", "para", "es", "no", "se")
    case "de" => Seq("der", "die", "das", "und", "ist", "ich", "nicht",
      "ein", "eine", "mit", "auf", "für", "von", "zu", "den")
    case "fr" => Seq("le", "la", "les", "de", "des", "et", "est", "un",
      "une", "dans", "que", "pour", "avec", "sur", "au", "ce")
    case _ => Seq.empty
  }

  /** Append a `predicted` language column: score = fraction of tokens
    * in each language's function-word profile (+ a CJK char-ratio check
    * for zh); argmax, "und" when nothing matches. Token array
    * materialized once.
    */
  def withLangId(df: DataFrame, textCol: String = "text",
      outCol: String = "predicted"): DataFrame = {
    val keep = df.columns.map(col)
    val toks = col("__ltoks")
    val n = greatest(size(toks), lit(1)).cast("double")
    def score(lang: String): Column =
      size(filter(toks, t => array_contains(typedlit(stopwords(lang)), t))) / n
    val zh = length(regexp_replace(col(textCol), "[^\\u4e00-\\u9fff]", "")) >
      length(col(textCol)) * 0.3
    val scored = Seq("en", "es", "de", "fr").map(l =>
      struct(score(l).as("s"), lit(l).as("lang")))
    val best = array_max(array(scored: _*))
    df.select(keep :+ transform(wsTokens(col(textCol)), lower _).as("__ltoks"): _*)
      .select(keep :+
        when(zh, lit("zh"))
          .when(best.getField("s") > 0, best.getField("lang"))
          .otherwise(lit("und")).as(outCol): _*)
  }

  /** Content fingerprint: 64-bit hash of the whitespace-normalized,
    * lowercased text — the exact-dedup key that survives formatting
    * noise. xxhash64 is Spark-native, seeded, deterministic across
    * executors/runs.
    */
  def fingerprint(text: Column): Column =
    xxhash64(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** PII scrubbing: replace email addresses and NANP-style phone
    * numbers with a redaction token — the minimum-viable privacy pass
    * over a web corpus. Patterns stay in the regex subset shared by
    * Java and RE2 (no lookaround) so downstream engines reproduce the
    * exact transformation; narrow (no shuffle), codegen'd.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\(\\d{3}\\) \\d{3}-\\d{4}"
  def scrubPii(text: Column, token: String = "[PII]"): Column =
    regexp_replace(regexp_replace(text, EmailPattern, token),
      PhonePattern, token)

  /** URL and registrable-domain extraction — the keys for domain-level
    * curation (per-domain quality priors, domain blocklists, domain
    * dedup). Pattern stays in the Java/RE2-shared subset like
    * [[scrubPii]]; `extractDomain` returns the first URL's host,
    * lowercased, empty string when the text carries no URL.
    */
  val UrlPattern = "(?i)https?://[A-Za-z0-9.-]+(/[^\\s]*)?"
  val HostPattern = "(?i)https?://([A-Za-z0-9.-]+)"
  def extractDomain(text: Column): Column =
    lower(regexp_extract(text, HostPattern, 1))

  /** URL canonicalization — the key-normalization step of URL-level
    * dedup (every large crawl stores the same page under
    * `HTTPS://Host:443/x/?utm_source=…#frag` variants). Produces one
    * canonical form per page identity:
    *   - scheme + host lowercased (path case is significant and kept),
    *   - default ports `:80`/`:443` stripped,
    *   - the `#fragment` dropped (client-side only),
    *   - `utm_*` tracking parameters removed (with separator repair so
    *     the first surviving parameter regains its `?`),
    *   - trailing `?`/`&` and trailing path slashes stripped.
    * Pure regexp_replace/regexp_extract chain in the Java/RE2-shared
    * subset (no lookaround), so the DuckDB oracle replays it verbatim;
    * narrow, codegen'd, no shuffle. Non-URL input canonicalizes to ''.
    */
  def canonicalizeUrl(url: Column): Column = {
    val schemeHost = regexp_replace(
      lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)", 1)),
      ":(443|80)$", "")
    val rest = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([/?#].*)$", 1)
    val noFrag = regexp_replace(rest, "#.*$", "")
    val noUtm = regexp_replace(noFrag, "[?&]utm_[A-Za-z0-9_]*=[^&#]*", "")
    // a removed leading `?utm_…` leaves the first kept param behind
    // `&`; promote the FIRST separator to `?` ([^?&]* so greed can't
    // skip past intermediate `&`s; ^-anchored, so at most one match)
    val fixedSep = regexp_replace(noUtm, "^([^?&]*)&", "$1?")
    val noTrail = regexp_replace(
      regexp_replace(fixedSep, "/+\\?", "?"), "[?&/]+$", "")
    // empty scheme/host means the input was not a URL at all — don't
    // emit a bare path as a "canonical URL"
    when(schemeHost === "", lit("")).otherwise(concat(schemeHost, noTrail))
  }

  /** Web-text cleaning — the canonical first pass over crawled HTML
    * before any quality/dedup stage: strip tags, unescape the five
    * core entities (amp LAST, so `&amp;lt;` correctly yields the
    * literal `&lt;`), collapse whitespace runs, and NFC-normalize
    * (see StringExprs.nfcNormalize) so downstream content keys are
    * canonical. Narrow, codegen'd, a single projection; every step is
    * replayed verbatim by the q106 oracle.
    */
  def cleanWebText(html: Column): Column = {
    val noTags = regexp_replace(html, "<[^>]*>", " ")
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        replace(c, lit(from), lit(to))
      }
    graft.functions.StringExprs.nfcNormalize(
      trim(regexp_replace(unescaped, "\\s+", " ")))
  }

  /** Per-document n-gram repetition statistics — the Gopher-style
    * repetition quality signals (most-common-n-gram fraction,
    * duplicated-n-gram fraction) that gate boilerplate/spam out of
    * training corpora. One shuffle on (id, gram): the n-gram explode
    * is narrow, per-(doc, gram) counts combine map-side, and the
    * per-doc rollup is a second small aggregation on `id` — never a
    * corpus-wide string sort. Docs with fewer than `n` tokens have no
    * n-grams and drop out (their quality signal is `n_tokens`, not
    * repetition).
    *
    * Output per id: n_{n}grams (total), n_distinct, top_n (count of
    * the most frequent gram), top_frac = top_n / total, dup_frac =
    * (grams occurring more than once) / total.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    // explode_outer + null-drop, not explode — see Decontaminate: the
    // inner form's inferred size() filter re-derives the n-gram array
    // (and re-splits the text) once more per row
    val grams = Dedup.spread(df)
      .select(col(idCol), wsTokens(col(textCol)).as("__w"))
      .select(col(idCol),
        explode_outer(ngramsFromTokens(col("__w"), n)).as("gram"))
      .filter(col("gram").isNotNull)
    grams.groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum("c").as("n_grams"),
        count(lit(1)).as("n_distinct_grams"),
        max("c").as("top_gram_n"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0))).as("__dup"))
      .select(col(idCol), col("n_grams"), col("n_distinct_grams"),
        col("top_gram_n"),
        round(col("top_gram_n").cast("double") / col("n_grams"), 6)
          .as("top_gram_frac"),
        round(col("__dup").cast("double") / col("n_grams"), 6)
          .as("dup_gram_frac"))
  }

  /** Top-`k` TF-IDF terms per document — keyword extraction for
    * topical tagging/routing. TF = per-(doc, term) count over
    * lower-cased whitespace tokens; IDF = ln((N+1)/(df+1)) (smoothed:
    * defined even for all-doc terms); rank by ROUNDED score then term
    * so the cut is stable across engines (two engines' ln may differ
    * in the last ulp — rounding absorbs it, the term tie-break settles
    * equal-score families).
    *
    * Scale shape: one (doc, term) shuffle with map-side combine, one
    * term-keyed shuffle for document frequencies, the corpus size as a
    * broadcast scalar, and a bounded per-doc window. Never a
    * collect-and-loop vocabulary.
    */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val terms = Dedup.spread(df)
      .select(col(idCol), explode(wsTokens(lower(col(textCol)))).as("term"))
    // the (doc, term) frame feeds several branches (score join, df,
    // corpus stats); persisted via the shared registry or every branch
    // re-tokenizes the corpus (measured ~2x on the whole operator)
    val tf = graft.HeavyPersist(terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count_distinct(col(idCol)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log((col("__n") + 1.0) / (col("df") + 1.0)), 6))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
      .select(col(idCol), col("term"), col("score"), col("rk"))
  }

  /** Top-`k` BM25 (Okapi) terms per document — the ranking function
    * retrieval stacks actually ship (Lucene/Elasticsearch default),
    * extending [[tfidfTopK]] with term-frequency saturation (`k1`) and
    * document-length normalization (`b`). IDF is the non-negative
    * Lucene form ln(1 + (N − df + 0.5)/(df + 0.5)); scores are ranked
    * ROUNDED (ln differs in the last ulp across engines) with the term
    * as tie-break.
    *
    * Scale shape: identical to TF-IDF — one (doc, term) shuffle with
    * map-side combine, one term-keyed df shuffle, doc length rides the
    * same token frame, corpus stats (N, Σdl) broadcast as two scalars.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = Dedup.spread(df)
      .select(col(idCol), explode(wsTokens(lower(col(textCol)))).as("term"))
    // persisted via the shared registry: four branches (score join,
    // dl, df, corpus stats) read this frame — unpersisted, each one
    // re-tokenizes the corpus (measured ~2x on the whole operator)
    val tf = graft.HeavyPersist(terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf")))
    // doc length = Σ tf — derived from the (doc, term) frame, not a
    // second tokenize+explode scan of the corpus. (A window-sum dl
    // sharing the rank window's id-exchange was measured ~2× SLOWER
    // at sf0.1 despite one fewer shuffle: two full-partition Window
    // operators with different sort orders cost more than the extra
    // exchange of the pre-aggregated tf frame. Keep the join form.)
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("__n"), sum(col("dl")).as("__tot"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("score").desc, col("term"))
    tf.join(dl, idCol).join(dfreq, "term")
      .crossJoin(broadcast(stats))
      // operation order mirrors the oracle SQL exactly for 6-decimal
      // float parity: idf * (tf·(k1+1)) / (tf + k1·(1−b + b·(dl/avgdl)))
      .withColumn("__avgdl", col("__tot").cast("double") / col("__n"))
      .withColumn("__idf", log(lit(1.0) +
        (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("score", round(
        col("__idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * (col("dl") / col("__avgdl")))), 6))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
      .select(col(idCol), col("term"), col("score"), col("rk"))
  }

  /** Corpus-wide top-`k` word n-grams — the collocation / boilerplate
    * census over the whole corpus (which phrases dominate, what to
    * blocklist). Exact counts: one n-gram-keyed shuffle with map-side
    * combine, then TakeOrderedAndProject for the cut — a bounded
    * per-partition heap, no global sort, the only safe top-k at
    * 100 TB. Ties break on the gram itself so the cut is stable.
    */
  def corpusTopNgrams(df: DataFrame, textCol: String, n: Int = 2,
      k: Int = 20): DataFrame =
    Dedup.spread(df)
      .select(wsTokens(lower(col(textCol))).as("__w"))
      .select(explode_outer(ngramsFromTokens(col("__w"), n)).as("gram"))
      .filter(col("gram").isNotNull)
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(k)

  /** Count-min-sketch frequency audit: build the mergeable CMS over
    * the corpus's tokens (`stat.countMinSketch` — a distributed
    * aggregate, constant ~eps⁻¹·depth counters into the merge, never
    * the vocabulary), then check the sketch's two-sided contract
    * against the exact counts of the `k` most frequent tokens:
    * estimate ≥ exact (structural — counters only over-count) and
    * estimate ≤ exact + eps·N (the CMS error bound, overwhelming
    * probability at the chosen confidence). The exact side rides the
    * same (term) shuffle any census pays; at 100 TB the sketch is what
    * survives — constant memory, mergeable across partitions/days —
    * and this operator is the audit that says the cheap estimate can
    * be trusted.
    *
    * The estimate lookup is a closure-shipped probe over the bounded
    * top-k frame (the bloom-filter pattern, Decontaminate.scala) —
    * k rows, not a corpus-side UDF.
    */
  def cmsFrequencyCheck(df: DataFrame, textCol: String, k: Int = 20,
      eps: Double = 0.001, confidence: Double = 0.99): DataFrame = {
    // the sketch build is an eager action and the census re-reads the
    // same tokens — persist the shared scan (the tfidf/bm25 lesson) or
    // the corpus tokenizes twice
    val terms = graft.HeavyPersist(Dedup.spread(df)
      .select(explode(wsTokens(lower(col(textCol)))).as("term")))
    val tf = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
    val sketch = terms.stat.countMinSketch("term", eps, confidence,
      seed = 42)
    val bound = math.ceil(eps * sketch.totalCount).toLong
    val est = udf((t: String) => sketch.estimateCount(t))
    tf.orderBy(col("cnt").desc, col("term")).limit(k)
      .select(col("term"), col("cnt"),
        (est(col("term")) >= col("cnt") &&
          est(col("term")) <= col("cnt") + bound).as("cms_ok"))
  }

  /** Per-document mean unigram surprisal (-ln P(token) under the
    * corpus's own unigram model) — the model-free perplexity proxy:
    * word-salad and off-distribution documents score high, repetitive
    * boilerplate scores low. Per-token surprisals go through the exact
    * decimal-sum convention so partial-aggregation order can't drift
    * the mean.
    *
    * Scale shape: one term-keyed count shuffle (the model), a
    * broadcast total, one join of tokens against the model, one
    * per-doc aggregation.
    */
  def unigramSurprisal(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val terms = Dedup.spread(df)
      .select(col(idCol), explode(wsTokens(lower(col(textCol)))).as("term"))
    val freq = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
    // total from the tiny term-frequency frame — summing `terms` again
    // would re-run the corpus-wide tokenize/explode just to count rows
    val tot = freq.agg(sum(col("cnt")).as("__tot"))
    terms.join(freq, "term")
      .crossJoin(broadcast(tot))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum((-log(col("cnt").cast("double") / col("__tot")))
          .cast("decimal(18,12)")).as("__s"))
      .select(col(idCol), col("n_tokens"),
        round(col("__s").cast("double") / col("n_tokens"), 6)
          .as("surprisal"))
  }

  /** Fixed-token-window document chunking with stride — the
    * context-length splitter that turns long documents into training
    * sequences (stride < chunkTokens gives overlapping windows).
    * One narrow pass: tokens materialize once, window starts are a
    * generated sequence (0, stride, 2·stride, … < n_tokens), each
    * start slices its window from the bound token array. Partial tail
    * windows are emitted (their true length is in `n_chunk_tokens`);
    * callers drop or pad them by policy. Narrow — no shuffle; output
    * rows ≈ input tokens / stride regardless of document skew.
    *
    * Empty/whitespace-only text follows the engine-wide tokenizer
    * convention (`wsTokens("") = [""]` — one empty token), so every
    * document emits at least one chunk and the operator is total.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(stride > 0, s"stride must be positive, got $stride")
    Dedup.spread(df)
      // null text follows the empty-string path (one empty chunk) —
      // without the coalesce the null token array nulls the start
      // sequence and the isNotNull filter silently DROPS the document,
      // breaking the totality contract below
      .select(col(idCol), wsTokens(coalesce(col(textCol), lit("")))
        .as("__w"))
      // starts materialized as a bound column before the explode so the
      // generator's inferred size() filter (InferFiltersFromGenerate)
      // cannot re-derive the sequence — the house explode pattern
      .withColumn("__starts",
        sequence(lit(0), size(col("__w")) - 1, lit(stride)))
      .select(col(idCol), col("__w"),
        posexplode_outer(col("__starts")).as(Seq("chunk_idx", "start")))
      .filter(col("start").isNotNull)
      .withColumn("__c", slice(col("__w"), col("start") + 1, lit(chunkTokens)))
      .select(col(idCol), col("chunk_idx"), col("start"),
        size(col("__c")).as("n_chunk_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  /** Per-document unigram (token) Shannon entropy in bits — the
    * distribution-shape quality signal that separates natural prose
    * (entropy tracks vocabulary richness) from degenerate repetition
    * (entropy → 0) and word salad (entropy ≈ log2 n_tokens). Computed
    * by one single-pass custom expression over the materialized token
    * array (the built-in form would re-walk the array once per
    * distinct token, interpreted); stays inside whole-stage codegen.
    */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.spread(df)
      .select(col(idCol), wsTokens(lower(col(textCol))).as("__w"))
      .select(col(idCol),
        size(col("__w")).as("n_tokens"),
        size(array_distinct(col("__w"))).as("n_distinct"),
        round(graft.functions.VectorExprs.tokenEntropy(col("__w")), 6)
          .as("entropy"))

  /** Line-level boilerplate removal: drop every line that appears in
    * more than `maxFrac` of the documents of its `groupCol` (source /
    * domain) — the shared-footer/nav-chrome filter. Documents reduced
    * to nothing come back as empty strings, not dropped rows.
    *
    * Scale shape: lines explode narrowly; one (group, line) distinct-
    * doc count rides a single shuffle; reassembly is a per-doc
    * aggregation whose order comes from `array_sort` over (idx, line)
    * structs — deterministic under any partitioning, no window sort.
    */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, maxFrac: Double = 0.5,
      outCol: String = "clean"): DataFrame = {
    val lines = Dedup.spread(df)
      .select(col(idCol), col(groupCol),
        posexplode(split(col(textCol), "\n")).as(Seq("idx", "line")))
    val groupDocs = df.groupBy(col(groupCol))
      .agg(count_distinct(col(idCol)).as("__docs"))
    val lineDocs = lines.groupBy(col(groupCol), col("line"))
      .agg(count_distinct(col(idCol)).as("__ldocs"))
    val kept = lines
      .join(lineDocs, Seq(groupCol, "line"))
      .join(groupDocs, Seq(groupCol))
      .filter(col("__ldocs") <= lit(maxFrac) * col("__docs"))
      .groupBy(col(idCol))
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("idx"), col("line")))),
          x => x.getField("line"))).as(outCol))
    df.select(col(idCol)).join(kept, Seq(idCol), "left")
      .select(col(idCol), coalesce(col(outCol), lit("")).as(outCol))
  }

  /** Top-`size` whitespace-token vocabulary of a corpus, with dense ids
    * 1..size assigned by (frequency desc, term asc) — the deterministic
    * tie-break makes the id table reproducible on any engine. One
    * shuffle for the term counts (map-side combine), then
    * `orderBy(...).limit(size)` plans as TakeOrderedAndProject (bounded
    * per-partition heaps, no global sort); the single-partition
    * row_number window only ever sees `size` rows, so it is bounded
    * metadata work, never a corpus-wide sort.
    */
  def buildVocab(df: DataFrame, textCol: String, size: Int): DataFrame = {
    require(size > 0, s"vocab size must be positive, got $size")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc, col("term"))
    df.select(explode(wsTokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term")).limit(size)
      .withColumn("id", row_number().over(w).cast("long"))
  }

  /** Encode each document's whitespace tokens as vocabulary ids (OOV →
    * 0), preserving token order — the tokenize-to-ids step between
    * "clean corpus" and training batches. The vocab (bounded rows)
    * broadcasts to the exploded token stream, so the only shuffle is
    * the per-document re-assembly on `idCol`; order is restored by
    * sorting (pos, id) structs, not by trusting collect_list.
    */
  def encodeIds(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, outCol: String = "ids"): DataFrame =
    df.select(col(idCol),
        posexplode(wsTokens(col(textCol))).as(Seq("pos", "term")))
      .join(broadcast(vocab.select("term", "id")), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(
          struct(col("pos"), coalesce(col("id"), lit(0L)).as("tid")))),
        s => s.getField("tid")).as(outCol))

  /** Per-document bigram surprisal — the conditional upgrade of
    * [[unigramSurprisal]]: mean −ln P(wᵢ | wᵢ₋₁) under the corpus
    * bigram model with add-one smoothing over the observed-next-token
    * vocabulary, P = (c(prev, cur) + 1) / (c(prev·) + V). Low = the
    * document's word SEQUENCES are corpus-typical; unigram surprisal
    * can't tell scrambled text from prose — this can.
    *
    * The bigram stream is a narrow array zip (tokens materialize once
    * per row, no self-join/window); model counts are two partial-
    * aggregated shuffles over (prev, cur) / prev; V is bounded
    * metadata riding a broadcast. −ln terms sum as exact decimals
    * (the q69 convention — partial-agg order can't drift the sum).
    * Documents with fewer than two tokens return n_bigrams 0 and a
    * null surprisal.
    */
  def bigramSurprisal(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = Dedup.spread(df)
      .select(col(idCol), wsTokens(lower(col(textCol))).as("__w"))
    val bigrams = toks.select(col(idCol),
        explode(when(size(col("__w")) >= 2,
          expr("""transform(sequence(2, size(__w)),
                 i -> struct(__w[i-2] AS prev, __w[i-1] AS cur))"""))
          .otherwise(expr(
            "CAST(array() AS array<struct<prev:string,cur:string>>)")))
          .as("b"))
      .select(col(idCol), col("b.prev").as("prev"), col("b.cur").as("cur"))
    val biCnt = bigrams.groupBy("prev", "cur").agg(count(lit(1)).as("c2"))
    // context totals + vocabulary from the (small) bigram-count frame,
    // not the corpus stream (the q69 total-from-freq-frame rule)
    val ctxCnt = biCnt.groupBy("prev").agg(sum(col("c2")).as("c1"))
    val vocab = biCnt.agg(count_distinct(col("cur")).as("__v"))
    val p = (col("c2") + 1).cast("double") / (col("c1") + col("__v"))
    val scored = bigrams
      .join(biCnt, Seq("prev", "cur"))
      .join(ctxCnt, Seq("prev"))
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum((-log(p)).cast("decimal(18,12)")).as("__s"))
    toks.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(col("__s").cast("double") / col("n_bigrams"), 6)
          .as("bigram_surprisal"))
  }

  /** Per-document mean surprisal under an interpolated KNESER-NEY
    * bigram LM (Kneser & Ney 1995, absolute discount `d`) — the
    * smoothing real LM-based quality filters use where q132's add-one
    * estimate over-penalizes rare-but-well-formed continuations:
    *
    *   P(cur|prev) = max(c(prev,cur) − d, 0)/c(prev)
    *               + d·N₁₊(prev,·)/c(prev) · N₁₊(·,cur)/B
    *
    * with N₁₊(prev,·) = distinct continuations of prev, N₁₊(·,cur) =
    * distinct contexts of cur (the continuation probability — "how
    * promiscuous is this word", not "how frequent"), B = distinct
    * bigram types. The LM is trained on the scored corpus itself
    * (self-perplexity, the q69/q132 convention).
    *
    * Scale shape: identical to q132 — one (prev,cur) shuffle with
    * map-side combine; every LM statistic (c1, N₁₊ forward/reverse,
    * B) derives from the SMALL bigram-count frame, never a second
    * corpus pass; the count frame is persisted across its four
    * consuming branches. Per-doc sums ride decimal(18,12) fixed-point
    * (projection float-chain lesson).
    */
  def knSurprisal(df: DataFrame, idCol: String, textCol: String,
      d: Double = 0.75): DataFrame = {
    require(d > 0 && d < 1, s"discount must be in (0,1), got $d")
    val toks = Dedup.spread(df)
      .select(col(idCol), wsTokens(lower(col(textCol))).as("__w"))
    val bigrams = toks.select(col(idCol),
        explode(when(size(col("__w")) >= 2,
          expr("""transform(sequence(2, size(__w)),
                 i -> struct(__w[i-2] AS prev, __w[i-1] AS cur))"""))
          .otherwise(expr(
            "CAST(array() AS array<struct<prev:string,cur:string>>)")))
          .as("b"))
      .select(col(idCol), col("b.prev").as("prev"), col("b.cur").as("cur"))
    val biCnt = graft.HeavyPersist(
      bigrams.groupBy("prev", "cur").agg(count(lit(1)).as("c2")))
    val ctx = biCnt.groupBy("prev")
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1f"))
    val contRev = biCnt.groupBy("cur").agg(count(lit(1)).as("n1r"))
    val types = biCnt.agg(count(lit(1)).as("__bt"))
    val c1d = col("c1").cast("double")
    // operation order mirrors the oracle SQL exactly for float parity
    val p = greatest(col("c2") - lit(d), lit(0.0)) / c1d +
      (lit(d) * col("n1f") / c1d) *
        (col("n1r") / col("__bt").cast("double"))
    val scored = bigrams
      .join(biCnt, Seq("prev", "cur"))
      .join(ctx, Seq("prev"))
      .join(contRev, Seq("cur"))
      .crossJoin(broadcast(types))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum((-log(p)).cast("decimal(18,12)")).as("__s"))
    toks.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(col("__s").cast("double") / col("n_bigrams"), 6)
          .as("kn_surprisal"))
  }

  /** Inverted index build: one row per distinct case-folded token with
    * its document frequency and a bounded posting list (the first
    * `maxPostings` doc ids ascending, comma-joined) — the retrieval /
    * contamination-lookup artifact next to q82's BM25 scorer.
    *
    * Scale shape: document frequency aggregates the FULL (term, doc)
    * frame, but the posting list is capped BEFORE collection by a
    * per-term rank window, so a stopword's list costs `maxPostings`
    * rows in the collect — an uncapped collect_list of a hot term is
    * the classic single-executor OOM. Both aggregations and the final
    * join share the term key, so the frame shuffles on term once and
    * stays co-partitioned.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      maxPostings: Int = 20): DataFrame = {
    require(maxPostings > 0, s"maxPostings must be positive, got $maxPostings")
    // per-doc term dedup is ROW-LOCAL (doc_id is part of the key), so
    // it happens inside the row via array_distinct — the explode +
    // frame-wide distinct() form paid a whole corpus shuffle for it
    // (the q135 anti-pattern); the only shuffles left are the shared
    // term-keyed ones below
    val terms = df.select(col(idCol).as("doc_id"),
        explode(array_distinct(wsTokens(lower(col(textCol))))).as("term"))
      .filter(col("term") =!= "")
    val dfreq = terms.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy("doc_id")
    val postings = terms
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxPostings)
      .groupBy("term")
      .agg(array_join(transform(array_sort(collect_list(col("doc_id"))),
        _.cast("string")), ",").as("postings"))
    dfreq.join(postings, Seq("term"))
  }

  /** Build the persisted IMPACT-ORDERED postings index at `path` —
    * Lucene's retrieval artifact re-expressed for a scan engine: one
    * posting row per (term, doc) carrying the document's COMPLETE,
    * precomputed BM25 contribution for that term. Everything the q82
    * scorer derives at query time (tf, df, dl, N, avgdl) is known at
    * index time, so it is baked into the posting ("impact"), and
    * query-time retrieval collapses to fetch + sum + top-k — no
    * corpus scan, no tokenize, no joins (see [[impactTopK]]).
    *
    * Two load-bearing layout choices:
    *   - postings are PARTITIONED by a term-hash bucket (`tb`,
    *     CRC32 — computable identically on the driver, so the probe's
    *     IN-list prunes partition directories; the graph-ANN shard
    *     pattern), making a |q|-term query read only its terms'
    *     buckets out of a 100 TB corpus' postings;
    *   - impacts are stored as FIXED-POINT longs (⌊raw·10⁶+0.5⌋):
    *     query-time summation is exact integer arithmetic, immune to
    *     float accumulation order across partitions — the projection
    *     decimal-chain lesson applied to retrieval.
    *
    * Document-at-a-time WAND/block-max traversal does not map to a
    * scan engine (it needs ordered cursor advance over aligned posting
    * blocks); its GOAL — never touching postings of terms outside the
    * query — is exactly what the partition-pruned layout delivers, and
    * the per-term `max_impact` rides in `_meta` for engines that layer
    * score-threshold skipping on top (parquet row-group stats on
    * `impact_fp` serve as the block-max bound once postings are
    * written impact-descending within a bucket).
    */
  def buildImpactIndex(df: DataFrame, idCol: String, textCol: String,
      path: String, k1: Double = 1.2, b: Double = 0.75,
      numBuckets: Int = 8, writeTasks: Int = 8): Unit = {
    val terms = Dedup.spread(df)
      .select(col(idCol).as("doc_id"),
        explode(wsTokens(lower(col(textCol)))).as("term"))
    val tf = graft.HeavyPersist(terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf")))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("__n"), sum(col("dl")).as("__tot"))
    // operation order mirrors bm25TopK/q82 exactly for float parity
    val raw = col("__idf") * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) +
        lit(b) * (col("dl") / col("__avgdl"))))
    val postings = tf.join(dl, "doc_id").join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .withColumn("__avgdl", col("__tot").cast("double") / col("__n"))
      .withColumn("__idf", log(lit(1.0) +
        (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .select(col("term"), col("doc_id"),
        floor(raw * lit(1e6) + lit(0.5)).cast("long").as("impact_fp"),
        pmod(crc32(col("term")), lit(numBuckets.toLong)).as("tb"))
    graft.sources.Layout.writePartitioned(postings, path, Seq("tb"),
      writeTasks)
    val spark = df.sparkSession
    import spark.implicits._
    // _meta AFTER the main write (writePartitioned clears the root)
    Seq((numBuckets, k1, b)).toDF("num_buckets", "k1", "b")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_meta")
    spark.read.parquet(path)
      .groupBy("term").agg(max(col("impact_fp")).as("max_impact_fp"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_term_meta")
  }

  /** Multi-term BM25 retrieval against the persisted impact index:
    * fetch the query terms' postings (partition-pruned to their CRC32
    * buckets + a pushed term IN-filter), sum fixed-point impacts per
    * doc (one bounded shuffle — only matching docs' postings move),
    * TakeOrderedAndProject top-k. Scores are EXACT BM25 sums (the
    * fixed-point contract), identical to scoring the full corpus.
    */
  def impactTopK(spark: org.apache.spark.sql.SparkSession, path: String,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && terms.forall(t => t.nonEmpty && t == t.toLowerCase),
      s"terms must be non-empty lower-case tokens, got $terms")
    val numBuckets = spark.read.parquet(s"$path/_meta")
      .head().getAs[Int]("num_buckets")
    val tbs = terms.map { t =>
      val c = new java.util.zip.CRC32()
      c.update(t.getBytes("UTF-8"))
      java.lang.Math.floorMod(c.getValue, numBuckets.toLong)
    }.distinct
    spark.read.parquet(path)
      .filter(col("tb").isin(tbs: _*) && col("term").isin(terms: _*))
      .groupBy("doc_id")
      .agg((sum(col("impact_fp")) / lit(1e6)).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Positional phrase search: find every occurrence of an exact
    * token phrase (case-folded, whitespace tokens) in the corpus —
    * the adjacency query a doc-level inverted index (q115) cannot
    * answer. Per matching document: occurrence count and first match
    * position (0-based token offset).
    *
    * Shape: one posexplode builds positional postings, and a LITERAL
    * term→slots map (bounded: the phrase itself) turns each posting
    * into its candidate anchor positions — `explode` of a null map
    * lookup emits nothing, so every non-phrase term is dropped inside
    * the same codegen'd projection, no join against a term list. A
    * phrase matches at an anchor iff all `k` slots are filled:
    * `bit_or(1 << slot) == 2^k − 1` grouped by (doc, anchor) — a
    * declarative (partial-agg, codegen'd) aggregate, where the
    * obvious `count(distinct slot)` plans a THIRD exchange (Spark
    * expands distinct-aggregates into a dedup aggregation plus a
    * count aggregation). Duplicate phrase terms are exactly why the
    * slot index (not the term) is tracked.
    *
    * Scale shape: the corpus-sized frame is filtered to phrase-term
    * postings BEFORE any shuffle (for a real phrase that is a tiny
    * fraction of tokens), so both aggregations — (doc, anchor) then
    * doc — shuffle only candidate rows. With a persisted positional
    * index this becomes a k-way partition-pruned posting read; the
    * one-pass form here is the index-free equivalent with the same
    * candidate volume.
    */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty && phrase.forall(t => t.nonEmpty && t == t.toLowerCase),
      s"phrase must be non-empty lower-case tokens, got $phrase")
    require(phrase.size <= 63, s"phrase slot mask is a long: ${phrase.size}")
    val k = phrase.size
    // term -> every slot index it fills (duplicate terms fill several)
    val slots: Map[String, Seq[Int]] =
      phrase.zipWithIndex.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2) }
    val slotMap = typedlit(slots)
    val postings = df.select(col(idCol).as("doc_id"),
        posexplode(wsTokens(lower(col(textCol)))).as(Seq("pos", "term")))
      .select(col("doc_id"), col("pos"),
        explode(element_at(slotMap, col("term"))).as("slot"))
      .select(col("doc_id"), (col("pos") - col("slot")).as("anchor"),
        col("slot"))
      .filter(col("anchor") >= 0)
    postings.groupBy("doc_id", "anchor")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), slot))").as("__m"))
      .filter(col("__m") === (1L << k) - 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"), min(col("anchor")).as("first_pos"))
  }

  /** Gopher-style rule-based quality gate (the public DeepMind Gopher
    * / MassiveText heuristics): per document — word count bounds,
    * mean word length bounds, symbol-to-word ratio ('#' and '…'/'...'
    * tokens), and a minimum count of distinct English function words —
    * plus the conjunction flag a curation pipeline filters on. Pure
    * per-row array arithmetic on ONE materialized token array: a
    * narrow codegen'd projection, zero shuffles, embarrassingly
    * parallel at any corpus size. Thresholds are the published
    * defaults, overridable.
    */
  def gopherQualityFlags(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minStopHits: Int = 2): DataFrame =
    gopherQualityAppend(df.select(col(idCol), col(textCol)), textCol,
        minWords, maxWords, minMeanLen, maxMeanLen, maxSymbolRatio,
        minStopHits)
      .drop(textCol)

  /** [[gopherQualityFlags]] as an in-place append: keeps every input
    * column and adds the metric/flag columns on the same projection.
    * This is the form a pipeline composes with — it avoids the
    * re-scan-and-join-back that computing flags on a separate frame
    * forces (the input's upstream chain would execute once per side
    * of that join).
    */
  def gopherQualityAppend(df: DataFrame, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minStopHits: Int = 2): DataFrame = {
    val toks = col("__gtoks")
    val nW = size(toks)
    val n1 = greatest(nW, lit(1))
    val meanLen =
      floor(aggregate(toks, lit(0L), (acc, t) => acc + length(t))
        .cast("double") / n1 * 1e6 + 0.5) / 1e6
    val symbolRatio =
      floor(size(filter(toks, t =>
        t === "#" || t === "..." || t === "…")).cast("double")
        / n1 * 1e6 + 0.5) / 1e6
    val stopHits = size(array_intersect(
      transform(toks, lower _), typedlit(stopwords("en"))))
    val keep = df.columns.map(col).toSeq
    df.withColumn("__gtoks", wsTokens(col(textCol)))
      .select(keep ++ Seq(
        nW.cast("bigint").as("n_words"),
        meanLen.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"),
        stopHits.cast("bigint").as("stop_hits"),
        (nW >= minWords && nW <= maxWords).as("words_ok"),
        (meanLen >= minMeanLen && meanLen <= maxMeanLen).as("word_len_ok"),
        (symbolRatio <= maxSymbolRatio).as("symbols_ok"),
        (stopHits >= minStopHits).as("stopwords_ok")): _*)
      .withColumn("quality_ok",
        col("words_ok") && col("word_len_ok") && col("symbols_ok") &&
          col("stopwords_ok"))
  }

  /** Hierarchical reverse-domain rollup: each host explodes into its
    * domain-level prefixes ('org' → 'org.example' →
    * 'org.example.cdn', level = part count) and doc counts aggregate
    * per (level, prefix) — the crawl-coverage cut every corpus
    * dashboard starts from. One narrow generate + one
    * partial-aggregated shuffle on the (level, prefix) key; a host
    * contributes as many rows as it has labels (bounded small).
    */
  def domainRollup(df: DataFrame, host: Column): DataFrame =
    df.select(reverse(split(host, "\\.")).as("__p"))
      .select(explode(transform(sequence(lit(1), size(col("__p"))), i =>
        struct(i.cast("bigint").as("level"),
          array_join(slice(col("__p"), lit(1), i), ".").as("prefix"))))
        .as("s"))
      .select(col("s.level").as("level"), col("s.prefix").as("prefix"))
      .groupBy("level", "prefix").agg(count(lit(1)).as("n_docs"))

  /** Corpus collocations by pointwise mutual information — the
    * word2phrase step that finds "new york"-style units worth fusing
    * before vocabulary build. PMI(x,y) = ln( (c_xy/N_b) / (c_x/N_t ·
    * c_y/N_t) ) over whitespace bigrams, restricted to pairs with
    * `minCount` occurrences (PMI without a support floor surfaces
    * one-off typos first — the standard failure). Top `k` by
    * (PMI desc, pair asc).
    *
    * Scale shape: one (bigram) shuffle with map-side combine builds
    * pair counts; unigram counts ride a second keyed shuffle and join
    * back on the token key twice (vocabulary-sized frames, not corpus-
    * sized); corpus totals broadcast as one row. The final cut is a
    * TakeOrderedAndProject, never a global sort. The division sequence
    * is written identically in the oracle so doubles match bit for
    * bit before the 6-decimal floor-rounding.
    */
  def collocations(df: DataFrame, textCol: String, minCount: Int = 5,
      k: Int = 20): DataFrame = {
    val toks = df.select(wsTokens(lower(col(textCol))).as("t"))
      .filter(size(col("t")) > 0)
    // persisted: the unigram count frame feeds the corpus total and
    // BOTH pmi joins
    val uni = graft.HeavyPersist(toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c")))
    val totals = uni.agg(sum(col("c")).as("n_tok")).select(col("n_tok"))
    // persisted: the bigram count frame feeds both the N_b total and
    // the candidate cut — unpersisted, the corpus-wide bigram shuffle
    // runs twice
    val biAll = graft.HeavyPersist(toks.select(explode(
        zip_with(slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
          slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy")),
      freshScope = false)
    // N_b is the total over ALL bigrams — the support floor prunes
    // candidates, not the probability space
    val nBi = biAll.agg(sum(col("c_xy")).as("n_bi")).select(col("n_bi"))
    val bi = biAll.filter(col("c_xy") >= minCount)
    val pmi = floor(
      log(col("c_xy").cast("double") / col("n_bi") / (
        col("c_x").cast("double") / col("n_tok") *
          (col("c_y").cast("double") / col("n_tok"))))
        * 1e6 + 0.5) / 1e6
    bi.join(uni.select(col("w").as("w1"), col("c").as("c_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_y")), "w2")
      .crossJoin(broadcast(totals)).crossJoin(broadcast(nBi))
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        pmi.as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Flesch reading-ease per document — the classic readability score
    * used as a quality/complexity signal in corpus curation:
    *
    *   206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
    *
    * Sentences are `[.!?]+` runs (min 1); syllables use the standard
    * vowel-group heuristic (`[aeiouy]+` runs per lowercased word, min
    * 1 per word — "rhythm" counts 1, not 0). All three counts are
    * exact integers from codegen'd regex/array expressions (no UDF:
    * `regexp_extract_all` + higher-order `transform`/`aggregate`
    * stay inside whole-stage codegen); the score is one float
    * expression floor-rounded at 6 decimals, computed identically by
    * the oracle. Single narrow scan — no shuffle at all.
    *
    * Output: (id, n_words, n_sents, n_syll, flesch).
    */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = wsTokens(lower(col(textCol)))
    val nWords = greatest(
      size(filter(words, w => w =!= "")), lit(1L)).cast("long")
    val nSents = greatest(
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))),
      lit(1L)).cast("long")
    val nSyll = aggregate(
      transform(filter(words, w => w =!= ""),
        w => greatest(
          size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))), lit(1))
          .cast("long")),
      lit(0L), (acc, x) => acc + x)
    val score = lit(206.835) -
      lit(1.015) * (col("n_words").cast("double") / col("n_sents")) -
      lit(84.6) * (col("n_syll").cast("double") / col("n_words"))
    df.select(col(idCol), nWords.as("n_words"), nSents.as("n_sents"),
        nSyll.as("n_syll"))
      .select(col(idCol), col("n_words"), col("n_sents"), col("n_syll"),
        (floor(score * 1e6 + 0.5) / 1e6).as("flesch"))
  }

  /** Cross-source n-gram duplication matrix — the corpus-level
    * leakage screen between mixture components: for every ordered
    * source pair, how many distinct word `n`-shingles they share and
    * the Jaccard overlap of their shingle sets. Where
    * [[graft.operators.CorpusStats.vocabOverlap]] compares
    * vocabularies, this compares CONTENT (5-gram phrases): a high
    * off-diagonal here means near-duplicate text is crossing source
    * boundaries and per-source dedup is not enough.
    *
    * Scale shape: shingles are keyed by 60 bits of md5 (an 8-byte
    * long through every shuffle instead of a ~40-char phrase string;
    * collisions ~2⁻⁶⁰ per pair, and the oracle hashes identically so
    * the comparison is still exact). One distinct (source, key) frame
    * (map-side combined) feeds set sizes AND the intersection; the
    * intersection groups by key and expands ordered pairs from the
    * bounded per-key source set (≤ mixture size — never corpus-bound),
    * the [[Association.basketPairs]] shape, so there is no self-join:
    * one aggregation shuffle total. The full pair spine (including
    * zero-overlap pairs) comes from crossing the bounded per-source
    * size frame with itself.
    *
    * Output: (src_a, src_b, shared, jac) for every pair src_a < src_b.
    */
  def crossDupMatrix(df: DataFrame, groupCol: Column, textCol: String,
      n: Int = 5): DataFrame = {
    // tokens materialize as a named column BEFORE the n-gram windows:
    // inlined, every element_at in the window lambda re-evaluates the
    // regex split per element (measured 20× on this operator)
    val ss = graft.HeavyPersist(
      df.select(groupCol.as("src"),
          wsTokens(lower(col(textCol))).as("__t"))
        .select(col("src"),
          explode(shinglesFromTokens(col("__t"), n)).as("sh"))
        .select(col("src"),
          conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long")
            .as("h"))
        .distinct())
    val sizes = ss.groupBy(col("src")).agg(count(lit(1)).as("sz"))
    val shared = ss.groupBy(col("h"))
      .agg(array_sort(collect_set(col("src"))).as("srcs"))
      .filter(size(col("srcs")) > 1)
      .select(explode(flatten(
        transform(col("srcs"), (a, i) =>
          transform(slice(col("srcs"), i + 2, size(col("srcs"))), b =>
            struct(a.as("a"), b.as("b")))))).as("p"))
      .groupBy(col("p.a").as("src_a"), col("p.b").as("src_b"))
      .agg(count(lit(1)).as("shared"))
    sizes.select(col("src").as("src_a"), col("sz").as("sz_a"))
      .crossJoin(sizes.select(col("src").as("src_b"), col("sz").as("sz_b")))
      .filter(col("src_a") < col("src_b"))
      .join(shared, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("shared"), lit(0L)).as("shared"),
        (floor(coalesce(col("shared"), lit(0L)).cast("double") /
          (col("sz_a") + col("sz_b") - coalesce(col("shared"), lit(0L)))
          * 1e6 + 0.5) / 1e6).as("jac"))
  }

  /** Encoding-health flags — the ingest-time QA pass that catches
    * decode damage BEFORE it pollutes dedup keys and n-gram stats
    * (a mojibake'd twin hashes differently, so every downstream
    * operator silently treats corrupted re-crawls as new content):
    *
    *   - n_repl: U+FFFD replacement characters (a decoder already
    *     gave up — the text lost bytes irrecoverably);
    *   - n_ctrl: C0 control characters other than \t \n \r, plus
    *     DEL — binary garbage or wrong-charset decode;
    *   - n_moji: the classic UTF-8-read-as-Latin-1 signature — Ã or
    *     Â followed by a Latin-1-supplement continuation char
    *     (U+0080-U+00BF): 'é' mis-decoded is "Ã©", NBSP is "Â ".
    *     A heuristic (real Portuguese "Ã " exists) — a FLAG for
    *     re-decode, not a verdict;
    *   - enc_ok: all three are zero.
    *
    * One narrow codegen'd projection (regexp_count, no UDF), zero
    * shuffle; patterns stay in the Java∩RE2 subset so any engine
    * replays them.
    */
  def encodingQuality(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
        regexp_count(t, lit("\uFFFD")).as("n_repl"),
        regexp_count(t,
          lit("[\u0000-\u0008\u000B\u000C\u000E-\u001F\u007F]")).as("n_ctrl"),
        regexp_count(t,
          lit("[\u00C3\u00C2][\u0080-\u00BF]")).as("n_moji"))
      .withColumn("enc_ok",
        col("n_repl") === 0 && col("n_ctrl") === 0 && col("n_moji") === 0)
  }

  /** Tokenizer fertility by group: subword-ish tokens emitted per
    * whitespace word ([[bpeIshTokens]] / [[wsTokens]]) — the
    * mixture-design number that prices each source in tokens (code
    * and non-Latin text tokenize 2-4× fatter than English prose, so
    * a token budget buys very different document mass per source).
    * Per group: n_docs, n_words, n_tokens (exact long sums — the
    * ratio divides two int64 totals, not a mean of per-doc floats,
    * so group order can't change it), fertility floor-rounded at 6
    * decimals. One narrow tokenize projection + one partial-agg
    * shuffle on the group key.
    */
  def tokenizerFertility(df: DataFrame, groupCol: String, textCol: String)
      : DataFrame =
    df.select(col(groupCol),
        size(filter(wsTokens(col(textCol)), w => w =!= "")).as("__nw"),
        size(bpeIshTokens(col(textCol))).as("__nt"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nw")).as("n_words"),
        sum(col("__nt")).as("n_tokens"))
      .withColumn("fertility",
        floor(col("n_tokens").cast("double") /
          greatest(col("n_words"), lit(1L)) * 1e6 + 0.5) / 1e6)
}
