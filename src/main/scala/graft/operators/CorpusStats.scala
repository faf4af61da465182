package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.HeavyPersist

/** Corpus-distribution statistics for pre-training data health checks
  * (extended surface, like [[Drift]] for numeric columns but over the
  * WORD distribution): smoothed KL divergence of each slice against
  * the corpus, distinct-n lexical diversity, and the Zipf
  * rank-frequency slope. These are the standard "is this source
  * degenerate / templated / off-distribution" screens run before a
  * source is admitted to the training mix.
  *
  * Float portability: every divergence/regression term is a function
  * of exact integer counts, quantized to integer units BEFORE the
  * corpus-wide sum (the [[Selection]] convention) — both engines sum
  * the same integers, so order can never change a result.
  */
object CorpusStats {

  /** Smoothed KL divergence KL(p_g ‖ q) of each group's word
    * distribution against the whole corpus, over the corpus
    * vocabulary: p = (c_gw + ½)/(N_g + V/2), q = (c_w + ½)/(N + V/2)
    * (add-½ smoothing so a word the group lacks contributes a finite
    * penalty). High KL = the slice is lexically off-distribution
    * (templated spam, wrong language, boilerplate).
    *
    * Scale shape: one (group, word) count shuffle over the token
    * stream; the corpus marginal, vocabulary size, and group totals
    * all derive from THAT bounded frame — the corpus is scanned once.
    * The per-(group, word) spine is a broadcast-joined vocab frame, so
    * missing words surface as zero counts without a second scan. KL
    * terms quantize to nano-units and sum exactly.
    * Output: (group, n_tokens, kl).
    */
  def klVsCorpus(df: DataFrame, groupCol: Column, textCol: String)
      : DataFrame = {
    val gw = df
      .select(groupCol.as("g"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("g", "w").agg(count(lit(1)).as("c"))
    val gwp = HeavyPersist(gw)
    val vocab = gwp.groupBy("w").agg(sum(col("c")).as("cw"))
    val groups = gwp.groupBy("g").agg(sum(col("c")).as("ng"))
    val corpus = vocab.agg(sum(col("cw")).as("__N"),
      count(lit(1)).as("__V"))
    // full (group, word) spine: every group scores every vocab word;
    // the group-totals side is group-cardinality — always broadcast
    val spine = vocab.crossJoin(broadcast(groups))
      .join(gwp, Seq("g", "w"), "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(corpus))
    val p = (col("c") + 0.5) / (col("ng") + col("__V") / lit(2.0))
    val q = (col("cw") + 0.5) / (col("__N") + col("__V") / lit(2.0))
    spine
      .select(col("g"), col("ng"),
        floor(p * (log(p) - log(q)) * 1e9 + 0.5).cast("long").as("t9"))
      .groupBy(col("g"), col("ng"))
      .agg(sum(col("t9")).as("t9s"))
      .select(col("g").as("group"), col("ng").as("n_tokens"),
        (floor(col("t9s").cast("double") / 1e3 + 0.5) / 1e6).as("kl"))
  }

  /** Distinct-n lexical diversity per group: for each n, the number of
    * distinct word n-grams (`types`) over the total n-gram count
    * (`grams`) — the distinct-1/2/3 diversity metric; ratios near 0
    * mean templated/repetitive text. One token scan per n (the n-gram
    * arrays derive from the same split), each a (group, gram) count
    * shuffle with map-side combine. Output: (group, n, types, grams,
    * ratio).
    */
  def distinctN(df: DataFrame, groupCol: Column, textCol: String,
      ns: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"invalid n list: $ns")
    val toks = df.select(groupCol.as("group"),
      TextAnalysis.wsTokens(col(textCol)).as("__toks"))
    ns.map { n =>
      toks
        .select(col("group"),
          explode(TextAnalysis.ngramsFromTokens(col("__toks"), n))
            .as("gram"))
        .groupBy("group")
        .agg(countDistinct(col("gram")).as("types"),
          count(lit(1)).as("grams"))
        .select(col("group"), lit(n).as("n"), col("types"), col("grams"),
          (floor(col("types").cast("double") / col("grams") * 1e6 + 0.5)
            / 1e6).as("ratio"))
    }.reduce(_.unionAll(_))
  }

  /** Vocabulary coverage curve: the corpus word census ranked by
    * frequency (ties lexicographic), with each rank's CUMULATIVE share
    * of total token mass — the tokenizer-design curve that answers
    * "how small can the vocab be and still cover X% of tokens". Share
    * arithmetic is integer (cumulative count over total, floor-rounded
    * at 6 decimals), so the curve is engine-exact. One census shuffle;
    * the ranked head is a bounded window + limit (`topV` rows out,
    * TakeOrdered — never a full census sort to the driver).
    * Output: (rank, cnt, cum_share, covers90), rank ≤ topV.
    */
  def vocabCoverage(df: DataFrame, textCol: String, topV: Int = 200)
      : DataFrame = {
    require(topV >= 1, s"topV must be positive: $topV")
    val census = df
      .select(explode(TextAnalysis.wsTokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val total = census.agg(sum(col("cnt")).as("__tot"))
    // bound FIRST (TakeOrdered: per-partition topV heaps), THEN rank —
    // a global row_number window over the raw census would sort the
    // whole vocabulary in one partition
    val head = census.orderBy(col("cnt").desc, col("w")).limit(topV)
    val order = Window.orderBy(col("cnt").desc, col("w"))
    head
      .withColumn("rank", row_number().over(order))
      .withColumn("__cum", sum(col("cnt")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("rank").cast("long").as("rank"), col("cnt"),
        (floor(col("__cum").cast("double") / col("__tot") * 1e6 + 0.5)
          / 1e6).as("cum_share"),
        // integer comparison, not the rounded double: 10·cum >= 9·tot
        (col("__cum") * 10 >= col("__tot") * 9).as("covers90"))
  }

  /** Vocabulary-overlap Jaccard between every pair of groups:
    * |V_a ∩ V_b| / |V_a ∪ V_b| over the distinct word sets — the
    * corpus-mix overlap matrix (which sources duplicate each other's
    * lexical coverage). One distinct (group, word) frame; the pair
    * expansion is a word-keyed self-join whose per-word fan-out is
    * bounded by the number of groups (mixture components are few even
    * at 100 TB — this is a groups² spine, not a corpus join); vocab
    * sizes broadcast back. Pairs sharing no words produce no row
    * (inner-join semantics, declared). Output:
    * (g_a, g_b, shared, jaccard), g_a < g_b.
    */
  def vocabOverlap(df: DataFrame, groupCol: Column, textCol: String)
      : DataFrame = {
    val gw = df
      .select(groupCol.as("g"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .distinct()
    val sizes = gw.groupBy("g").agg(count(lit(1)).as("v"))
    gw.as("a").join(gw.as("b"), "w")
      .filter(col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("g_a"), col("b.g").as("g_b"))
      .agg(count(lit(1)).as("shared"))
      .join(broadcast(sizes.select(col("g").as("g_a"), col("v").as("__va"))),
        "g_a")
      .join(broadcast(sizes.select(col("g").as("g_b"), col("v").as("__vb"))),
        "g_b")
      .select(col("g_a"), col("g_b"), col("shared"),
        (floor(col("shared").cast("double") /
          (col("__va") + col("__vb") - col("shared")) * 1e6 + 0.5) / 1e6)
          .as("jaccard"))
  }

  /** Zipf rank-frequency slope per group: OLS slope of ln(freq) on
    * ln(rank) over the group's `topK` most frequent words (rank ties
    * broken lexicographically). Natural text sits near −1; templated
    * or keyword-stuffed sources flatten toward 0. The regression
    * inputs quantize to integer micro-units, so all five OLS sums are
    * exact integer sums — engine-identical to the last bit. One
    * (group, word) count shuffle; the per-group top-K is a bounded
    * window over the count frame. Output: (group, n_top, slope).
    */
  def zipfSlope(df: DataFrame, groupCol: Column, textCol: String,
      topK: Int = 100): DataFrame = {
    require(topK >= 2, s"need at least 2 ranks for a slope: $topK")
    val counts = df
      .select(groupCol.as("group"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("group", "w").agg(count(lit(1)).as("c"))
    val ranked = counts
      .withColumn("rank", row_number().over(
        Window.partitionBy("group").orderBy(col("c").desc, col("w"))))
      .filter(col("rank") <= topK)
    val x6 = floor(log(col("rank").cast("double")) * 1e6 + 0.5).cast("long")
    val y6 = floor(log(col("c").cast("double")) * 1e6 + 0.5).cast("long")
    ranked
      .select(col("group"), x6.as("x"), y6.as("y"))
      .groupBy("group")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("group"), col("n").as("n_top"),
        (floor((col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
          * 1e6 + 0.5) / 1e6).as("slope"))
  }
}
