package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting/packing operators for training-data
  * pipelines (extended surface beyond the reference, like Dedup and
  * TextAnalysis). Everything here is keyed on md5 of row CONTENT, not
  * `rand()` or xxhash64, for three properties a 100 TB pipeline needs:
  *   - reproducible across runs, executors, and partitionings (no RNG
  *     state, no row-order dependence);
  *   - stable under re-ingestion — a re-crawled duplicate document
  *     lands in the same split, so train/test contamination can't
  *     sneak in through the sampler;
  *   - engine-portable — md5 is bit-identical in any engine, so a
  *     downstream system (or the DuckDB oracle) reproduces the exact
  *     same membership, which xxhash64 (Spark-private seeding) cannot.
  * All operators are narrow (no shuffle) except packBySequence, which
  * shuffles once on its partition columns.
  */
object Sampling {

  /** Deterministic bucket 0..255 from two hex chars of md5(key),
    * starting at 1-based offset `off` (use different offsets for
    * independent decisions, e.g. split vs sample, so membership in one
    * doesn't correlate with the other).
    */
  def md5Bucket256(key: Column, off: Int = 1): Column = {
    require(off >= 1 && off <= 31, s"off must leave two hex chars, got $off")
    conv(substring(md5(key), off, 2), 16, 10).cast("int")
  }

  /** Content-keyed train/val/test split: appends `split` based on the
    * key's md5 bucket. Thresholds are integer 256ths (rounded from the
    * requested percentages) so the boundary is exact and portable.
    */
  def deterministicSplit(df: DataFrame, key: Column,
      trainPct: Int = 80, valPct: Int = 10,
      outCol: String = "split"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val t1 = math.round(256.0 * trainPct / 100).toInt
    val t2 = t1 + math.round(256.0 * valPct / 100).toInt
    val hv = md5Bucket256(key, 1)
    df.withColumn(outCol,
      when(hv < t1, "train").when(hv < t2, "val").otherwise("test"))
  }

  /** Deterministic weighted (mixture) sampling: keep a row iff its md5
    * bucket falls below `weight256` (0..256, the per-row keep weight in
    * 256ths — integer so the threshold is exact in any engine). This is
    * the mixture-reweighting primitive: upweight wiki, downsample crawl,
    * expressed as a per-source weight column.
    */
  def weightedSample(df: DataFrame, key: Column, weight256: Column): DataFrame =
    df.filter(md5Bucket256(key, 3) < weight256)

  /** Deterministic sequence packing: orders rows within each group of
    * `partCols` by `orderCol` and assigns `pack_id` = the token-budget
    * bin the row STARTS in (floor(preceding-token-total / budget)) —
    * the contiguous-fill packing used to batch documents into
    * fixed-token training sequences. One shuffle on `partCols`; the
    * running total is a per-group window, so group size (a source, a
    * shard) bounds the sort — never a global order-by.
    */
  def packBySequence(df: DataFrame, partCols: Seq[String], orderCol: String,
      tokenCol: String, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col(tokenCol)) / lit(budget)))
      .drop("__cum")
  }

  /** Deterministic uniform n-sample: order by md5(key) — a content-
    * keyed uniform permutation — break ties on `tie` (a unique key, so
    * identical content still cuts deterministically), keep the first
    * `n`. Reproducible across engines, runs, and partitionings, and it
    * plans as TakeOrderedAndProject (bounded per-partition heaps +
    * driver merge of n rows), so "pull a 10 k-doc sample" never sorts
    * the corpus. `rand()`-based sampling has none of these properties;
    * `TABLESAMPLE` is not content-stable under re-ingestion.
    */
  def uniformSample(df: DataFrame, key: Column, n: Int,
      tie: Column): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    // NULL keys hash to '' (sorts first in every engine) — bare
    // md5(key) would sort NULLS FIRST in Spark but NULLS LAST in
    // engines with that default, silently changing sample membership
    df.orderBy(coalesce(md5(key), lit("")), tie).limit(n)
  }

  /** Group-atomic train/val/test split: [[deterministicSplit]] keyed on
    * a GROUP id (e.g. the near-dup component label from
    * `Dedup.connectedComponents`) instead of row content, so every
    * member of a cluster lands in the SAME split. Content-keyed
    * splitting only protects against EXACT duplicates straddling
    * train/test; near-duplicates hash differently and leak — this is
    * the leakage-safe composition (cluster first, then split by
    * cluster). Narrow: the group id is already on the row, so the split
    * itself adds no shuffle.
    */
  def groupSplit(df: DataFrame, groupCol: Column,
      trainPct: Int = 80, valPct: Int = 10,
      outCol: String = "split"): DataFrame =
    deterministicSplit(df, groupCol.cast("string"), trainPct, valPct, outCol)

  /** Stratified proportional sampling: keep ceil(pctNum/pctDen) of
    * EACH stratum (group), members chosen by the content-keyed md5
    * permutation (same determinism contract as [[uniformSample]] —
    * reproducible across engines, runs, and partitionings; `tie` must
    * be unique so identical content cuts deterministically). A uniform
    * corpus sample under-represents small strata (a 1% language can
    * vanish from a 10k-doc sample); stratifying fixes the per-stratum
    * rate exactly. The per-stratum quota is integer ceil arithmetic
    * ((n·pctNum + pctDen − 1) div pctDen) so both engines cut at the
    * same row — float `ceil(n * 0.1)` is not portable at representable
    * boundaries. One shuffle on the stratum key; per-stratum sort is
    * bounded by stratum size. Appends nothing; returns the kept rows.
    */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String], key: Column,
      tie: Column, pctNum: Int, pctDen: Int): DataFrame = {
    require(pctNum > 0 && pctDen > 0 && pctNum <= pctDen,
      s"invalid sampling fraction: $pctNum/$pctDen")
    val part = Window.partitionBy(strataCols.map(col): _*)
    val w = part.orderBy(coalesce(md5(key), lit("")), tie)
    df.withColumn("__n", count(lit(1)).over(part))
      .withColumn("__rk", row_number().over(w))
      // floor(double) is exact here (quota < 2^53 by construction);
      // Spark's `/` on integral types is double division, so the floor
      // IS the integer `div` both engines agree on
      .filter(col("__rk") <=
        floor((col("__n") * pctNum + (pctDen - 1)) / lit(pctDen))
          .cast("bigint"))
      .drop("__n", "__rk")
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-ES): each row draws a content-keyed uniform u ∈ (0, 1)
    * from six md5 hex chars ((v + 0.5)/2²⁴ — the +0.5 keeps u strictly
    * positive so the log is finite) and is ranked by the exponential
    * key −ln(u)/w; the k SMALLEST keys are the weighted sample. This
    * is the one-pass weighted-without-replacement scheme (a weight-
    * proportional Bernoulli pass can't hit an exact k; with-replacement
    * sampling duplicates heavy rows): P(row in sample) is proportional
    * to weight in the ES sense, reproducible across engines, runs and
    * partitionings (same md5 contract as [[uniformSample]]).
    *
    * Plans as TakeOrderedAndProject — per-partition k-heaps, never a
    * corpus sort. Rows with weight ≤ 0 or null are excluded (zero
    * weight means "never sample"; −ln(u)/0 is not a rank), and so are
    * rows with a null `key`: a null key has no md5 and therefore no
    * content-derived draw (conv(md5(null)) is NULL, which under
    * ascending nulls-first ordering would silently claim sample slots
    * — the null-key policy is exclusion, not rank-zero). The ES key
    * is pure IEEE arithmetic from an integer, so both engines order
    * identically; `tie` must be unique for a deterministic cut.
    */
  def weightedTopK(df: DataFrame, key: Column, weight: Column, k: Int,
      tie: Column, keyOut: String = "es_key"): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val u = (conv(substring(md5(key), 1, 6), 16, 10)
      .cast("double") + 0.5) / lit(16777216.0)
    df.filter(key.isNotNull && weight.isNotNull && weight > 0)
      .withColumn(keyOut, -log(u) / weight.cast("double"))
      .orderBy(col(keyOut), tie)
      .limit(k)
  }

  /** Temperature-based mixture reweighting (the multilingual /
    * multi-domain sampling-rate step): for per-group shares p_g =
    * n_g / N, the α-temperature weight is w_g ∝ p_g^α, normalized to
    * sum 1. α = 1 keeps natural proportions; α → 0 flattens toward
    * uniform — the published recipe for keeping low-resource groups
    * from vanishing. Output per group: n, p (natural share), weight
    * (the α-tempered sampling share), and boost = weight / p (> 1 ⇔
    * the group is upsampled).
    *
    * One partial-aggregated shuffle builds the group counts; the
    * normalization rides the bounded per-group frame via one-row
    * broadcast totals. p^α goes through exp(α·ln p) — written the same
    * way in the oracle so doubles match bit for bit — and the shares
    * floor-round at 6 decimals.
    */
  def temperatureWeights(df: DataFrame, groupCol: Column,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(groupCol.as("group"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("__N")).select(col("__N"))
    val tempered = counts.crossJoin(broadcast(totals))
      .withColumn("__p", col("n").cast("double") / col("__N"))
      .withColumn("__t", exp(lit(alpha) * log(col("__p"))))
    val z = tempered.agg(
        sum(col("__t").cast("decimal(27,17)")).as("__Z"))
      .select(col("__Z").cast("double").as("__Z"))
    tempered.crossJoin(broadcast(z))
      .select(col("group"), col("n"),
        (floor(col("__p") * 1e6 + 0.5) / 1e6).as("p"),
        (floor(col("__t") / col("__Z") * 1e6 + 0.5) / 1e6).as("weight"),
        (floor(col("__t") / col("__Z") / col("__p") * 1e6 + 0.5) / 1e6)
          .as("boost"))
  }

  /** Per-group quota sampling: keep the top `n` rows of each group
    * ranked by `orderCols` (make the last order column a unique key so
    * the cut is deterministic) — the domain-cap curation primitive
    * (no single domain/source may dominate the corpus). One shuffle on
    * the group key; the per-group sort is bounded by group size, and
    * rank > n rows drop before anything downstream — never a global
    * top-k. Appends the 1-based rank as `rankCol`.
    */
  def quotaPerGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column], n: Int, rankCol: String = "rk"): DataFrame = {
    require(n > 0, s"quota must be positive, got $n")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= n)
  }

  /** Largest-remainder (Hamilton) apportionment of an integer token
    * `budget` across groups in proportion to an integer weight — the
    * "allocate 1 B training tokens across sources by measured token
    * mass" mixture-design step, done so quotas are integers that sum
    * EXACTLY to the budget (naive rounding of B·w/W drifts by up to
    * one per group; a 100-source mixture can miss the budget by 50).
    *
    *   base_g = ⌊B·w_g / W⌋, rem_g = B·w_g mod W; the L = B − Σbase
    *   leftover units go to the L largest remainders (ties → group
    *   ascending, so the allocation is a pure function of the input).
    *
    * All integer arithmetic — engine-exact, no float shares anywhere
    * (the budget·weight product runs in decimal(38,0); quotas return
    * as longs). Input: one row per group (`groupCol`, `weightCol` ≥ 0). Groups
    * with zero weight get zero quota. The frame is group-cardinality
    * metadata; the windows (one sum, one rank) are bounded by it —
    * nothing here touches fact data. Output: (group, weight, base,
    * rem, quota) with Σquota = budget (when W > 0).
    */
  def apportionBudget(df: DataFrame, groupCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val w = Window.partitionBy(lit(1))
    val ranked = df
      .select(col(groupCol).as("group"),
        col(weightCol).cast("long").as("weight"))
      .withColumn("__W", sum(col("weight")).over(w))
      // budget·weight runs in decimal(38,0): the long product overflows
      // at petascale token weights and a double floor drifts past 2^53.
      // DIV (integral division) not floor(/): decimal division rounds
      // its quotient to scale 6 BEFORE floor sees it, so a true
      // quotient of n.9999996 floors to n+1
      .withColumn("__p", lit(budget).cast("decimal(38,0)") *
        col("weight").cast("decimal(38,0)"))
      .withColumn("__dW", col("__W").cast("decimal(38,0)"))
      // W = 0 (every weight zero) with budget > 0 would make DIV/% yield
      // NULL and then hand the whole budget out through the remainder
      // ranks — guard so zero total weight means zero quotas everywhere.
      .withColumn("base", when(col("__dW") > 0,
        expr("CAST(__p DIV __dW AS BIGINT)")).otherwise(0L))
      .withColumn("rem", when(col("__dW") > 0,
        (col("__p") % col("__dW")).cast("long")).otherwise(0L))
      .withColumn("__left", when(col("__dW") > 0,
        lit(budget) - sum(col("base")).over(w)).otherwise(0L))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(lit(1))
          .orderBy(col("rem").desc, col("group").asc)))
    ranked.select(col("group"), col("weight"), col("base"), col("rem"),
      (col("base") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
        .as("quota"))
  }
}
