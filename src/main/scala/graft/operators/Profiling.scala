package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level profiling — the "analyze table" shape every curation
  * dashboard starts from: null counts, distinct cardinality, and
  * min/max per column, one output row per column.
  *
  * All metrics for all columns ride ONE aggregation over ONE scan (the
  * multi-distinct plan expands rows per distinct column internally —
  * still a single pass over the data, no per-column jobs), then the
  * single result row explodes into per-column rows. min/max surface as
  * strings so heterogeneous column types share one schema; callers
  * pass a pre-cast Column per name to control formatting (e.g. double
  * → decimal(18,2) for engine-portable rendering).
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val structs = cols.map { case (name, v) =>
      struct(
        lit(name).as("col"),
        (count(lit(1)) - count(v)).as("n_nulls"),
        count_distinct(v).as("n_distinct"),
        min(v).cast("string").as("min_v"),
        max(v).cast("string").as("max_v")).as(s"__p_$name")
    }
    df.agg(structs.head, structs.tail: _*)
      .select(explode(array(cols.map(c => col(s"__p_${c._1}")): _*)).as("p"))
      .select(col("p.col"), col("p.n_nulls"), col("p.n_distinct"),
        col("p.min_v"), col("p.max_v"))
  }
}
