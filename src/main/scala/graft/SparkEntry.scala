package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, CoreQueries, CurationQueries,
  ExtendedQueries, PipelineQueries, Query, SelectionQueries,
  StreamingQueries, TemporalQueries, TrainingQueries, WarehouseQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every declared query (reference surface + extended LLM-pipeline
    * operators), in registration order. Names must be unique: the
    * `queries`/`oracleSql` maps would otherwise silently shadow a
    * query behind a copy-paste name collision.
    */
  val allQueries: Seq[Query] = {
    val qs = CoreQueries.all ++ ExtendedQueries.all ++ TrainingQueries.all ++
      TemporalQueries.all ++ AnalyticsQueries.all ++ CurationQueries.all ++
      SelectionQueries.all ++ PipelineQueries.all ++ StreamingQueries.all ++
      WarehouseQueries.all
    val dups = qs.groupBy(_.name).filter(_._2.sizeIs > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q16_groupby")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
