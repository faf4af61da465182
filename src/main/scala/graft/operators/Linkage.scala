package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg

/** Probabilistic record linkage (Fellegi & Sunter 1969): blocked
  * candidate pairing + per-field agreement vectors + log-likelihood
  * match scores — the entity-resolution step a 100 TB curation
  * pipeline runs before entity-grain dedup or household clustering.
  *
  * Scale shape:
  *   - Pairing is BLOCKED: candidates share a blocking key derived
  *     from a dirty field, so the pair frame is Σ_b |A_b|·|B_b|, never
  *     |A|·|B| (no cartesian anywhere; PlanSpec pins that globally).
  *   - Each side of a block is CAPPED at `maxPerSide` via the bounded
  *     top-k aggregator ([[graft.functions.TopKAgg]], k smallest ids,
  *     k-bounded state partial/final like a sum) — a hot block (the
  *     skew rehearsal's 30% key) costs cap² pairs, not |block|², and
  *     the drop is NON-SILENT: `n_capped_blocks` rides every output
  *     row (the q221 census convention).
  *   - Field weights are quantized to integer MILLIONTHS of a nat
  *     (the q221 nano-quantization convention): scores are exact
  *     integer sums — bit-replayable in any engine, no float
  *     accumulation order to diverge.
  *
  * The m/u parameters are declared model constants (P[agree | match],
  * P[agree | non-match]); agreement weight = ln(m/u), disagreement
  * weight = ln((1−m)/(1−u)), both rounded once to micros on the
  * driver so the oracle inlines the identical integers.
  */
object Linkage {

  /** One comparator: shared column name on both sides, the agreement
    * predicate over (a-side, b-side) values, and the declared
    * conditional probabilities.
    */
  final case class FsField(col: String,
      agree: (Column, Column) => Column, m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
      s"need 0 < u < m < 1 for a discriminating field, got m=$m u=$u")
    def agreeMicro: Long = math.round(math.log(m / u) * 1e6)
    def disagreeMicro: Long = math.round(math.log((1 - m) / (1 - u)) * 1e6)
  }

  /** Cap a blocked side at the `cap` smallest ids per block. One
    * partial-aggregated shuffle builds the per-block keep-list (state
    * ≤ cap ids per group); the keep-list joins back on `block` (tiny
    * right side, ≤ cap ids per block row) and an array membership
    * filter drops the overflow. Returns (capped frame, per-block
    * sizes frame for the census).
    */
  private def capSide(df: DataFrame, cap: Int): (DataFrame, DataFrame) = {
    val keep = df.groupBy("block").agg(
      TopKAgg.topK(cap)(col("id"), lit(0.0)).as("ks"),
      count(lit(1)).as("n"))
    val capped = df.join(keep.select(col("block"), col("ks.id").as("keep_ids")),
        Seq("block"))
      .filter(array_contains(col("keep_ids"), col("id")))
      .drop("keep_ids")
    (capped, keep.select(col("block"), col("n")))
  }

  /** Blocked Fellegi–Sunter scoring. Both frames carry
    * (`id`: long, `block`: long, field columns named as in `fields`).
    * Output: one row per surviving blocked pair — block, a_id, b_id,
    * ag_<field> bits, the integer score, the threshold verdict, and
    * the cap census.
    */
  def fellegiSunter(a: DataFrame, b: DataFrame, fields: Seq[FsField],
      maxPerSide: Int = 200,
      matchThresholdMicro: Long = 5000000L): DataFrame = {
    val (ca, na) = capSide(a, maxPerSide)
    val (cb, nb) = capSide(b, maxPerSide)

    val pa = ca.select(col("block") +: col("id").as("a_id") +:
      fields.map(f => col(f.col).as("a_" + f.col)): _*)
    val pb = cb.select(col("block") +: col("id").as("b_id") +:
      fields.map(f => col(f.col).as("b_" + f.col)): _*)
    val pairs = pa.join(pb, Seq("block"))

    val withAg = fields.foldLeft(pairs) { (d, f) =>
      d.withColumn("ag_" + f.col,
        f.agree(col("a_" + f.col), col("b_" + f.col)).cast("int"))
    }
    val score = fields.map { f =>
      when(col("ag_" + f.col) === 1, lit(f.agreeMicro))
        .otherwise(lit(f.disagreeMicro))
    }.reduce(_ + _)

    // census: blocks whose side overflowed the cap, across both sides
    // — bounded (one row), rides every pair row via a 1-row cross join
    val census = na.select(col("n")).unionAll(nb.select(col("n")))
      .agg(sum(when(col("n") > maxPerSide, 1L).otherwise(0L))
        .cast("long").as("n_capped_blocks"))

    withAg
      .withColumn("score_micro", score.cast("long"))
      .withColumn("is_match",
        (col("score_micro") >= matchThresholdMicro).cast("int"))
      .crossJoin(census)
      .select(Seq(col("block"), col("a_id"), col("b_id")) ++
        fields.map(f => col("ag_" + f.col)) ++
        Seq(col("score_micro"), col("is_match"),
          col("n_capped_blocks")): _*)
  }

  /** Planted-truth dirty copy of the customer table (the q224/q228
    * synthetic-corpus convention applied to entity resolution): every
    * third customer re-enters from a second "source system" with
    * deterministic field corruptions keyed off its id — case-mangled
    * names (÷2), shifted nations (÷7), +100 balances (÷5), lost
    * segments (÷11) — so ground truth AND every agreement bit follow
    * from integer arithmetic the oracle replays. The blocking key
    * (name-digit suffix mod 500) survives the case corruption, the
    * way a real phonetic/suffix blocker is chosen to.
    */
  /** Id offset separating the dirty source's re-ingested records from
    * the clean side's native keys. 2^40 sits ~7 orders of magnitude
    * above any plausible c_custkey (TPC-H customers number 150k × sf,
    * so even sf 1,000,000 stays below it) — the r14 advice flagged the
    * old 1e7 offset as colliding beyond roughly sf66. Consumers
    * classify provenance as `id < DirtySourceOffset` (clean) vs `>=`
    * (dirty); the q236/q241 oracles inline the same constant.
    */
  val DirtySourceOffset: Long = 1L << 40

  def dirtyCustomerCopy(cust: DataFrame): DataFrame =
    cust.filter(col("c_custkey") % 3 === 0)
      .select(
        (col("c_custkey") + DirtySourceOffset).as("id"),
        when(col("c_custkey") % 2 === 0, upper(col("c_name")))
          .otherwise(col("c_name")).as("name"),
        when(col("c_custkey") % 7 === 0, (col("c_nationkey") + 1) % 25)
          .otherwise(col("c_nationkey")).cast("int").as("nat"),
        when(col("c_custkey") % 5 === 0, col("c_acctbal") + 100.0)
          .otherwise(col("c_acctbal")).as("bal"),
        when(col("c_custkey") % 11 === 0, lit("UNKNOWN"))
          .otherwise(col("c_mktsegment")).as("seg"))
      .withColumn("block", substring(col("name"), 10, 9).cast("long") % 500)

  /** The clean side of the q236 linkage: customers as (id, block,
    * fields), blocked on the same dirty-field digit suffix.
    */
  def cleanCustomerSide(cust: DataFrame): DataFrame =
    cust.select(
      col("c_custkey").as("id"),
      col("c_name").as("name"),
      col("c_nationkey").cast("int").as("nat"),
      col("c_acctbal").as("bal"),
      col("c_mktsegment").as("seg"))
      .withColumn("block", substring(col("name"), 10, 9).cast("long") % 500)
}
