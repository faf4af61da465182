package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-maintenance operators: keep derived state current by
  * folding in DELTA batches instead of recomputing from the raw facts
  * — at 100 TB the raw history is append-only and cold, and the whole
  * point of a rollup is to never scan it twice. The near-dup twin of
  * this idea (delta ingestion against a persisted bucket index) lives
  * in [[Dedup.nearDupCandidatesAgainstIndex]]; this is the aggregate
  * side.
  */
object Incremental {

  /** Merge an additive rollup state with a delta batch's rollup of the
    * SAME shape (`keys` ++ `measures`): group-wise measure sums over
    * the union. For commutative-monoid measures (counts, sums — keep
    * money in exact decimal until presentation, the house convention)
    * the result is row-identical to re-aggregating base ∪ delta from
    * the raw facts — the incremental-view-maintenance contract, which
    * q120's oracle hash-checks against the from-scratch rollup.
    *
    * The merge shuffles ONLY the two aggregate frames (cardinality =
    * distinct keys, not facts); the delta batch is the only raw data
    * that was scanned. Averages/ratios don't merge — maintain their
    * (sum, count) parts here and derive at read time; percentiles/
    * distincts need sketches (q42/q64's family) whose merge is the
    * sketch's own.
    */
  def mergeAdditive(state: DataFrame, delta: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    require(measures.nonEmpty, "mergeAdditive needs at least one measure")
    val missing = (keys ++ measures)
      .filterNot(c => state.columns.contains(c) && delta.columns.contains(c))
    require(missing.isEmpty,
      s"state/delta are missing columns: ${missing.mkString(", ")}")
    state.select((keys ++ measures).map(col): _*)
      .unionByName(delta.select((keys ++ measures).map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(sum(col(measures.head)).as(measures.head),
        measures.tail.map(m => sum(col(m)).as(m)): _*)
  }

  /** RETRACTABLE rollup maintenance — fold a CDC batch carrying
    * DELETES and UPDATES (not just inserts) into an additive rollup
    * without scanning base facts: the aggregate-side answer to "a fact
    * was corrected/withdrawn" that [[mergeAdditive]]'s insert-only
    * contract can't express (the retract-stream idea from streaming
    * view maintenance — e.g. Flink's retraction model — re-expressed
    * as batch delta algebra). Counts and exact-decimal sums form a
    * GROUP, not just a monoid: every op has an exact inverse, so
    *   - `I` contributes (+1, +new),
    *   - `D` contributes (−1, −old),
    *   - `U` contributes (0, new − old)   (same-key update),
    * and the refreshed state is row-identical to re-aggregating the
    * post-CDC fact table — which is exactly what the oracle recomputes.
    * Groups whose count reaches 0 vanish (they no longer exist in the
    * facts); a negative count or a key-changing update is a corrupt
    * batch and must fail loudly upstream (key changes are modeled as
    * D+I pairs, the CDC norm). AVG and other ratios maintain their
    * (sum, count) parts here and derive at read time, same as
    * [[mergeAdditive]]; min/max do NOT retract (no inverse) — they
    * need the full-recompute or sketch path.
    *
    * Cost shape at 100 TB: ONE aggregation over the delta batch (the
    * only raw data scanned) plus a merge shuffle whose cardinality is
    * distinct keys, never facts — identical to the insert-only path.
    *
    * `cdc` columns: `keys` ++ (`opCol`: 'I' | 'U' | 'D',
    * `oldCol`, `newCol`) — old is NULL for I, new is NULL for D.
    */
  def mergeRetractable(state: DataFrame, cdc: DataFrame,
      keys: Seq[String], cntCol: String, sumCol: String,
      opCol: String = "op", oldCol: String = "old_value",
      newCol: String = "new_value"): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(18,2)")
    val dCnt = when(col(opCol) === "I", 1)
      .when(col(opCol) === "D", -1).otherwise(0)
    // U branch must handle mixed-null updates explicitly: a plain
    // new − old is NULL when exactly one side is NULL, so an update
    // filling a previously-NULL measure (or nulling a value) would
    // silently contribute nothing — diverging from the recompute
    // contract (SUM over post-CDC facts includes the non-null side).
    // old-NULL → +new (covers null→null as NULL, matching SUM's
    // null-skip for all-null groups); new-NULL → −old.
    val dSum = when(col(opCol) === "I", dec(col(newCol)))
      .when(col(opCol) === "D", -dec(col(oldCol)))
      .otherwise(
        when(col(oldCol).isNull, dec(col(newCol)))
          .when(col(newCol).isNull, -dec(col(oldCol)))
          .otherwise(dec(col(newCol)) - dec(col(oldCol))))
    val deltaAgg = cdc
      .select(keys.map(col) :+ dCnt.as("__dc") :+ dSum.as("__ds"): _*)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__dc")).as(cntCol), sum(col("__ds")).as(sumCol))
    state.select((keys :+ cntCol :+ sumCol).map(col): _*)
      .unionByName(deltaAgg)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(cntCol)).as(cntCol), sum(dec(col(sumCol))).as(sumCol))
      .filter(col(cntCol) =!= 0)
  }

  /** Data-quality expectation report: evaluate every named rule in ONE
    * aggregation over ONE scan (the Profiling.profile shape) and
    * return (rule, n_rows, n_viol, pass) per rule. A violation is any
    * row where the predicate is not TRUE — a null predicate (null
    * input to a comparison) counts as a violation, because "unknown"
    * is not "valid". The report is bounded output (one row per rule)
    * regardless of fact size, so it runs as a cheap gate in front of
    * every load.
    */
  def expect(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "expect needs at least one rule")
    val structs = rules.zipWithIndex.map { case ((name, pred), i) =>
      struct(
        lit(name).as("rule"),
        count(lit(1)).as("n_rows"),
        count(when(!coalesce(pred, lit(false)), 1)).as("n_viol")).as(s"__r_$i")
    }
    df.agg(structs.head, structs.tail: _*)
      .select(explode(array(rules.indices.map(i => col(s"__r_$i")): _*))
        .as("r"))
      .select(col("r.rule"), col("r.n_rows"), col("r.n_viol"),
        (col("r.n_viol") === 0).as("pass"))
  }
}
