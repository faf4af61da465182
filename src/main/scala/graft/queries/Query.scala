package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a DataFrame program over the testdata
  * tables plus (where DuckDB can express it exactly) the equivalent
  * ANSI SQL the driver replays as the correctness oracle.
  *
  * Contract (SURVEY.md §7.4): every query ends in a total ORDER BY on a
  * unique key, float aggregates go through exact decimal sums (or are
  * rounded), and output column names match the oracle's aliases —
  * the driver sorts columns by name before hashing.
  */
final case class Query(
    name: String,
    oracle: Option[String])(
    val fn: (SparkSession, String) => DataFrame)

object Query {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.sum

  /** Exact money/measure sum: accumulate as decimal (associative and
    * exact, so partial-aggregation order can't change the result),
    * then present as double — bit-identical to the oracle's same cast.
    * The single shared definition of the engine's sum convention.
    */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
}
