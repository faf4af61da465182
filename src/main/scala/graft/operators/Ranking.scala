package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Distributed rank statistics that NEVER sort a whole group on one
  * task.
  *
  * `RANK() OVER (PARTITION BY g ORDER BY v)` is the canonical
  * low-cardinality-key scale trap: Spark's Window operator hashes on
  * the partition key, so a handful of distinct `g` values means each
  * window partition is ~corpus/|g| rows sorted — and spilled — by ONE
  * reducer. At 100 TB that single task owns terabytes.
  *
  * The fix is the same two-pass distributed prefix sum the engine
  * already uses for KS statistics ([[Drift.ksStatistic]]) and shard
  * planning (q209): rank statistics are a function of the (group,
  * value) COUNT frame, not of row order. Concretely, for a row with
  * value v in group g:
  *
  *   rank(v)         = 1 + Σ cnt(g, w) over w < v   (= `cum_prev` + 1)
  *   peer count      = cnt(g, v)
  *   average rank    = rank + (cnt − 1) / 2         (Spearman ties)
  *   percent_rank    = (rank − 1) / (n_g − 1)
  *   NTILE buckets   = integer arithmetic on cumulative positions
  *
  * so the whole computation reduces to an exclusive per-group prefix
  * sum over the count frame — one combiner-friendly shuffle to build
  * the counts, a range-partitioned sort of the (much smaller) count
  * frame that Spark distributes across tasks even WITHIN a group, and
  * a two-pass prefix sum whose only driver state is one subtotal row
  * per (partition, group-run): bounded by numPartitions + |groups|
  * because range partitions are contiguous in (group, value).
  *
  * All derived quantities are exact integer (long) counts, so the
  * downstream IEEE arithmetic is bit-identical to the window-operator
  * formulation it replaces — the DuckDB oracles do not change.
  */
object Ranking {

  /** The (group, value) rank frame of `df`: one row per distinct
    * (groupCol, valueCol) pair with
    *
    *   - `cnt`       — number of rows carrying this value in the group
    *   - `cum_prev`  — rows with a strictly smaller value in the group
    *                   (exclusive prefix sum; `rank = cum_prev + 1`)
    *   - `n_grp`     — total rows in the group
    *
    * Join it back to the fact rows on (groupCol, valueCol) — a
    * high-cardinality shuffle key — to give every row its rank without
    * any per-group single-task sort. NULL values must be filtered by
    * the caller (SQL rank semantics over NULL orderings differ per
    * engine; every declared query filters them first).
    *
    * Scale shape: groupBy (one partial-agg shuffle) → repartitionByRange
    * on (group, value) → pass 1 collects one subtotal per
    * (partition, group-run) — bounded metadata, NOT data — → pass 2
    * re-walks each sorted partition with its group's broadcast offset.
    */
  def rankFrame(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val counts = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("cnt"))
    val ranged = counts
      .repartitionByRange(col(groupCol), col(valueCol))
      .sortWithinPartitions(groupCol, valueCol)
    val rdd = ranged.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // pass 1: per-(partition, group) subtotals. Partitions are
      // contiguous ranges of (group, value), so each partition holds a
      // handful of group RUNS — the collected frame is
      // <= numPartitions + |groups| rows of metadata.
      val subtotals: Array[(Int, Any, Long)] = rdd
        .mapPartitionsWithIndex { case (i, it) =>
          val acc = mutable.LinkedHashMap.empty[Any, Long]
          it.foreach { r =>
            val g = r.get(0)
            acc.update(g, acc.getOrElse(g, 0L) + r.getLong(2))
          }
          acc.iterator.map { case (g, s) => (i, g, s) }
        }.collect()
      // exclusive per-group offsets for each partition + group totals
      val byGroup = subtotals.groupBy(_._2)
      val groupTotals: Map[Any, Long] =
        byGroup.map { case (g, rows) => g -> rows.map(_._3).sum }
      val offsets: Map[(Int, Any), Long] = byGroup.flatMap {
        case (g, rows) =>
          val sorted = rows.sortBy(_._1)
          val prefix = sorted.scanLeft(0L)(_ + _._3)
          sorted.map(_._1).zip(prefix).map { case (i, off) => (i, g) -> off }
      }
      val bOff = spark.sparkContext.broadcast(offsets)
      val bTot = spark.sparkContext.broadcast(groupTotals)
      // pass 2: re-walk each sorted partition, running counter per
      // group seeded from the broadcast offset
      val outRdd = rdd.mapPartitionsWithIndex { case (i, it) =>
        val cur = mutable.HashMap.empty[Any, Long]
        it.map { r =>
          val g = r.get(0)
          val cnt = r.getLong(2)
          val prev = cur.getOrElse(g, bOff.value((i, g)))
          cur.update(g, prev + cnt)
          Row(r.get(0), r.get(1), cnt, prev, bTot.value(g))
        }
      }
      val schema = StructType(
        counts.schema.fields.take(2) ++ Seq(
          StructField("cnt", LongType, nullable = false),
          StructField("cum_prev", LongType, nullable = false),
          StructField("n_grp", LongType, nullable = false)))
      // EAGERLY pin the result before releasing the input: the offsets
      // were collected from THIS materialization's partition
      // boundaries, and a later lazy recomputation of the (unpersisted)
      // shuffle could legally reorder rows into different range bounds
      // — localCheckpoint truncates the lineage so the frame can never
      // silently recompute under stale offsets.
      spark.createDataFrame(outRdd, schema).localCheckpoint(true)
    } finally rdd.unpersist(blocking = false)
  }

  /** Per-group NTILE(k) bucket boundaries derived ANALYTICALLY from the
    * rank frame — never assigning per-row tiles. SQL NTILE over n rows
    * gives buckets 1..(n mod k) an extra row: bucket b covers 1-based
    * positions s..e with
    *
    *   base = n / k, rem = n mod k
    *   s = (b−1)·base + min(b−1, rem) + 1
    *   e = b·base + min(b, rem)
    *
    * Returns one row per non-empty (group, bucket): (groupCol, q, s, e).
    * The caller joins this (tiny — |groups|·k rows, broadcast) frame to
    * the rank frame on position overlap: a value covering positions
    * (cum_prev, cum_prev+cnt] intersects bucket [s, e] iff
    * cum_prev < e AND cum_prev + cnt >= s. min/max of the overlapping
    * values are exactly the bucket's lo/hi because position order IS
    * value order; the bucket's row count is e − s + 1 by construction.
    */
  def ntileBuckets(rankFrame: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k > 0, s"ntile k must be positive: $k")
    val groups = rankFrame.select(col(groupCol), col("n_grp")).distinct()
    // integer division: Column./ is IEEE double division
    val base = floor(col("n_grp") / k).cast("long")
    val rem = col("n_grp") % k
    groups
      .select(col(groupCol), col("n_grp"),
        explode(sequence(lit(1), lit(k))).as("q"))
      .select(col(groupCol), col("q"),
        ((col("q") - 1) * base + least(col("q") - 1, rem) + 1).as("s"),
        (col("q") * base + least(col("q"), rem)).as("e"))
      .filter(col("e") >= col("s"))
  }

  /** Average (tie-adjusted) rank column from rank-frame columns — the
    * Spearman convention: rank + (peers − 1)/2, a half-integer exact in
    * IEEE doubles. Bit-identical to
    * `RANK() OVER (...) + (COUNT(*) OVER (PARTITION BY g, v) − 1)/2.0`.
    */
  def avgRank: Column = (col("cum_prev") + 1) + (col("cnt") - 1) / 2.0

  /** percent_rank from rank-frame columns: (rank − 1)/(n − 1), zero for
    * singleton groups — Spark's and DuckDB's shared definition.
    */
  def percentRank: Column =
    when(col("n_grp") > 1,
      col("cum_prev").cast("double") / (col("n_grp") - 1).cast("double"))
      .otherwise(0.0)
}
