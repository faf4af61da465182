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
