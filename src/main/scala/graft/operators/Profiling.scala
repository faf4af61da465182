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
    // positional aliases, NOT the user-supplied names: a display name
    // with a dot/backtick would otherwise break the col() resolution
    // of the generated struct columns
    val structs = cols.zipWithIndex.map { case ((name, v), i) =>
      struct(
        lit(name).as("col"),
        (count(lit(1)) - count(v)).as("n_nulls"),
        count_distinct(v).as("n_distinct"),
        min(v).cast("string").as("min_v"),
        max(v).cast("string").as("max_v")).as(s"__p_$i")
    }
    df.agg(structs.head, structs.tail: _*)
      .select(explode(array(cols.indices.map(i => col(s"__p_$i")): _*))
        .as("p"))
      .select(col("p.col"), col("p.n_nulls"), col("p.n_distinct"),
        col("p.min_v"), col("p.max_v"))
  }
}
