package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the standard 100 TB levers, as
  * library operators (AQE's skew-join handles many cases at runtime;
  * these are the explicit forms for when it can't: skewed aggregation
  * keys and broadcast-infeasible skewed joins).
  */
object Skew {

  /** Two-phase aggregation over a skewed grouping key: phase 1 groups
    * by (key, salt) so a hot key's rows spread over `buckets` reducers;
    * phase 2 merges the partials. Exposed for count/sum (the
    * re-aggregable shapes). Results are identical to the direct
    * groupBy — pinned by spec.
    */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 16, saltFrom: Column): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltFrom), lit(buckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__cnt"),
        sum(col(valueCol).cast("decimal(18,2)")).as("__sum"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__cnt")).as("cnt"),
        sum(col("__sum")).cast("double").as("sum_val"))
  }

  /** Salted equi-join for a skewed big side against a small-but-not-
    * broadcastable dimension: the big side gets a deterministic salt
    * from `saltFrom` (any well-distributed big-side column), the small
    * side is replicated `buckets` times, and the join key becomes
    * (key, salt) — a hot key's rows now land on `buckets` different
    * reducers. Row-identical to the unsalted join (spec-pinned).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFrom: Column, buckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    // Only join types that preserve the big side are salt-safe: the
    // replicated small side would emit one null-padded row per
    // unmatched (key, salt) under right/full outer.
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti",
      "semi", "anti").contains(jt),
      s"saltedJoin supports big-side-preserving join types only, got $joinType")
    val b = big.withColumn("__salt", pmod(xxhash64(saltFrom), lit(buckets)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    b.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
