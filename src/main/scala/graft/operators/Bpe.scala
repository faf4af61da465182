package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenization (Sennrich et al. ACL'16) —
  * the real merge-table upgrade of [[TextAnalysis.bpeIshTokens]]'s
  * regex approximation and the subword counterpart of the word-level
  * [[TextAnalysis.buildVocab]]/`encodeIds` pair.
  *
  * Scale shape — the whole point of this implementation:
  *
  *  - TRAINING never iterates over the corpus. One corpus scan builds
  *    the distinct-word census (word, count) — the standard BPE
  *    trainer's first move, because every occurrence of a word merges
  *    identically — and all `numMerges` rounds run against that
  *    census frame, whose size is the VOCABULARY, not the corpus.
  *    Each round is one partial-aggregated pair-count shuffle plus a
  *    bounded `limit(1)` argmax (TakeOrderedAndProject — per-partition
  *    heaps, never a global sort). At 100 TB the corpus is scanned
  *    once; 1000 merges touch only the census.
  *  - ENCODING runs the per-word greedy merge loop once per DISTINCT
  *    word (census-bounded work, the only imperative step), then
  *    reaches the corpus as a plain equi-join of the exploded token
  *    stream against that word→subwords dictionary — AQE picks
  *    broadcast vs shuffle by the dictionary's real size — and one
  *    per-document regroup. The corpus-scale path is entirely native
  *    operators (explode / join / groupBy); no per-corpus-row UDF.
  *
  * Determinism: merge selection breaks count ties on (a, b)
  * lexicographic order, so the learned table is reproducible on any
  * engine and partitioning (pair counts are exact integer sums).
  */
object Bpe {

  /** One merge of `(a, b) → ab` applied left-to-right over a symbol
    * sequence — the census update during training. Non-overlapping
    * leftmost-first scan: `a a a` under merge (a,a) becomes `aa a`.
    */
  private[operators] def mergeOnce(syms: Seq[String], a: String,
      b: String): Seq[String] = {
    val out = new ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Segment one word with a learned rank table: repeatedly merge the
    * lowest-rank (leftmost on rank ties) adjacent pair until no pair
    * is mergeable — the canonical BPE encode, equivalent to replaying
    * the merges in training order (the BpeSpec pins this equivalence
    * against the census's own final symbols).
    */
  private[operators] def segment(word: String,
      rank: Map[(String, String), Int]): Seq[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var at = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; at = i }
        i += 1
      }
      if (at < 0) done = true
      else syms = syms.patch(at, Seq(syms(at) + syms(at + 1)), 2)
    }
    syms
  }

  /** Whitespace word census of a text column: (w, cnt), one corpus
    * scan, partial-aggregated.
    */
  private def wordCensus(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.wsTokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Adjacent symbol pairs of an array column as (a, b) structs. */
  private def adjacentPairs(sym: Column): Column =
    zip_with(slice(sym, lit(1), size(sym) - 1),
      slice(sym, lit(2), size(sym) - 1),
      (x, y) => struct(x.as("a"), y.as("b")))

  /** Learn `numMerges` merges from the corpus. Returns the ranked
    * merge table (bounded driver metadata, like the IVF/PQ codebooks).
    * Stops early if no adjacent pair reaches `minCount` — merging
    * hapax pairs only memorizes noise. Each round's census is
    * `localCheckpoint`ed and the superseded round's blocks released
    * (the connectedComponents loop convention) so lineage stays flat
    * and the corpus scan never re-runs.
    */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 2L, maxDriverCensus: Long = 1000000L,
      maxDriverSymbols: Long = 2000000L)
      : Seq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    val mergeUdf = udf(
      (syms: Seq[String], a: String, b: String) => mergeOnce(syms, a, b))
    var census = wordCensus(df, textCol)
      .select(split(col("w"), "").as("sym"), col("cnt"))
      .localCheckpoint(false)
    // SIZE-GATED DRIVER FAST PATH (the componentMergeMap precedent:
    // bounded metadata may run on the driver, behind a measured gate):
    // when the distinct-word census fits the cap, the merge rounds run
    // as a driver loop over the collected census — bit-identical
    // merges (shared mergeOnce, same minCount stop, same
    // (count desc, a, b) tie-break with UTF-8-byte string order, which
    // is Spark's own UTF8String comparison) — instead of numMerges
    // sequential Spark jobs whose per-round fixed cost (pair-count
    // shuffle + TakeOrdered + checkpoint, ~0.1 s each) dwarfs the
    // census compute at bench scale. Above the cap the distributed
    // loop below is unchanged: a 100 TB corpus's census (usernames,
    // typos, numerals) is NOT bounded metadata, and each round stays
    // one partial-aggregated vocabulary-sized shuffle.
    // The gate bounds the TOTAL SYMBOL COUNT, not just rows: each
    // collected row is a boxed Array of 1-char strings (~48 bytes per
    // symbol on the driver heap), so a row-only cap admits a census an
    // order of magnitude heavier than the (long, long)
    // componentMergeMap precedent it cites — 1M long words could
    // pressure a modest driver heap. The materializing agg is the same
    // first action the checkpoint needed anyway.
    val gate = census
      .agg(count(lit(1)).as("rows"), sum(size(col("sym"))).as("syms"))
      .head()
    val censusRows = gate.getLong(0)
    val censusSyms = if (gate.isNullAt(1)) 0L else gate.getLong(1)
    if (censusRows <= maxDriverCensus && censusSyms <= maxDriverSymbols) {
      val rows = census.collect().map(r =>
        (r.getSeq[String](0).toArray, r.getLong(1)))
      val out = trainOnDriver(rows, numMerges, minCount)
      org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(census)
      return out
    }
    // the superseded round's checkpoint blocks are released only AFTER
    // the argmax action has materialized its successor — the lazy
    // checkpoint still reads the parent's blocks until then
    var prior: Option[DataFrame] = None
    def release(df: DataFrame): Unit =
      org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(df)
    val merges = ArrayBuffer.empty[(String, String)]
    var r = 0
    while (r < numMerges) {
      val top = census
        .select(explode(adjacentPairs(col("sym"))).as("p"), col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .filter(col("c") >= minCount)
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      prior.foreach(release)
      if (top.isEmpty) { prior = None; r = numMerges }
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val next = census
          .select(mergeUdf(col("sym"), lit(a), lit(b)).as("sym"),
            col("cnt"))
          .localCheckpoint(false)
        prior = Some(census)
        census = next
        r += 1
      }
    }
    prior.foreach(release)
    release(census)
    merges.toSeq
  }

  /** Driver twin of the distributed merge loop: identical rounds over
    * the collected (symbols, count) census. Strings compare as UTF-8
    * bytes — Spark's UTF8String order — so the (count desc, a, b)
    * argmax picks exactly the merge the distributed
    * `orderBy(c.desc, a, b).limit(1)` picks (BpeSpec pins the
    * equivalence on a fixture).
    */
  private def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    a.length < b.length
  }

  private[operators] def trainOnDriver(census0: Array[(Array[String], Long)],
      numMerges: Int, minCount: Long): Seq[(String, String)] = {
    var census = census0
    val merges = ArrayBuffer.empty[(String, String)]
    var r = 0
    while (r < numMerges) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      census.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + cnt)
          i += 1
        }
      }
      var best: ((String, String), Long) = null
      counts.foreach { case (k, c) =>
        if (c >= minCount && (best == null || c > best._2 ||
            (c == best._2 && (utf8Lt(k._1, best._1._1) ||
              (k._1 == best._1._1 && utf8Lt(k._2, best._1._2)))))) {
          best = (k, c)
        }
      }
      if (best == null) r = numMerges
      else {
        val (a, b) = best._1
        merges += ((a, b))
        census = census.map { case (syms, cnt) =>
          (mergeOnce(syms.toSeq, a, b).toArray, cnt)
        }
        r += 1
      }
    }
    merges.toSeq
  }

  /** Tokenize every document with a learned merge table:
    * (id, n_words, n_tokens, `outCol` = the subword sequence in
    * document order). The greedy merge loop runs once per DISTINCT
    * word; the corpus path is explode → dictionary join → one
    * per-document regroup (order restored by sorting (pos, subs)
    * structs, not by trusting collect_list).
    *
    * Zero-token-document policy: a document whose text tokenizes to
    * no words has nothing to encode and is DROPPED from the output
    * (row count may be less than the input's); callers needing every
    * input row back left-join the result on `idCol`.
    */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], outCol: String = "toks")
      : DataFrame = {
    val rank = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val seg = udf((w: String) => segment(w, rank))
    val words = df.select(col(idCol),
      posexplode(TextAnalysis.wsTokens(col(textCol))).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val dict = words.select("w").distinct()
      .withColumn("subs", seg(col("w")))
    words.join(dict, "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("subs"))).as("n_tokens"),
        flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("subs")))),
          s => s.getField("subs"))).as(outCol))
  }
}
