package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CleanFns._

/** The reference ETL pipeline (/root/reference/main.py, lifecycle E1 —
  * SURVEY.md §3) rebuilt Spark-first: every stage is a lazy DataFrame
  * transformation, so stages E1.4-E1.9 fuse into ONE Catalyst plan with
  * whole-stage codegen; the only shuffles are in sinks that sort. All
  * row loops of the reference (`iterrows`, `apply(axis=1)`) become
  * native expressions.
  *
  * Scale posture (100 TB): mapping tables are broadcast; composite
  * column transforms compile to single `select` projections (not
  * hundreds of chained withColumn — quadratic analysis at 297-column
  * width); nothing collects the fact table to the driver.
  */
object CrmPipeline {

  /** Resolve a column by its literal name — CRM headers contain dots
    * and parens ("Parliamentary Constituency (U.K.)"), which `col()`
    * would parse as nested-field access.
    */
  private[pipeline] def qcol(name: String): Column =
    col("`" + name.replace("`", "") + "`")

  /** S4 — header normalization: strip embedded newlines from column
    * names before metadata matching (main.py:206-207).
    */
  def normalizeHeaders(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.replace("\n", "")): _*)

  /** S5 — exact-shape assertion (main.py:213-222). One count() action;
    * driver-side, fail-fast before any heavy work.
    */
  def assertShape(df: DataFrame, expectedRows: Long, expectedCols: Int): Unit = {
    val cols = df.columns.length
    require(cols == expectedCols, s"expected $expectedCols columns, got $cols")
    val rows = df.count()
    require(rows == expectedRows, s"expected $expectedRows rows, got $rows")
  }

  /** S6/U1 — symmetric schema reconciliation against the STM
    * (main.py:226-247): (data columns missing from meta, meta columns
    * missing from data). Driver-side set diff — schema is metadata.
    */
  def reconcileSchema(df: DataFrame, stm: Stm): (Seq[String], Seq[String]) = {
    val dataCols = df.columns.toSet
    val metaCols = stm.rows.map(_.fullColName).toSet
    (df.columns.filterNot(metaCols).toSeq,
      stm.rows.map(_.fullColName).filterNot(dataCols).toSeq)
  }

  /** P1 — keep only in-scope columns, in STM order (main.py:254-270). */
  def projectInScope(df: DataFrame, stm: Stm): DataFrame =
    df.select(stm.inScopeCols.map(qcol): _*)

  /** P3+J3 — test-row removal (main.py:273-297): a row is test data if
    * ANY column contains "test" case-insensitively (substring — so
    * "latest" matches) AND the exemption predicate holds. Returns
    * (clean, removed) so the caller can audit-sink the removals (S10).
    * One predicate, evaluated once per row — the reference's
    * apply(axis=1) + full-frame anti-join collapses to a filter.
    */
  def splitTestRows(df: DataFrame, exempt: Column): (DataFrame, DataFrame) = {
    // coalesce the exemption to false: a NULL exemption cell would make
    // isTest NULL, and a NULL predicate fails BOTH filters — the row
    // would silently vanish from clean AND removed.
    val isTest = anyColContains(df.columns.toSeq.map(qcol), "test") &&
      !coalesce(exempt, lit(false))
    (df.filter(!isTest), df.filter(isTest))
  }

  /** F1+F2 — frame-wide fill + whitespace normalization
    * (main.py:373-378), as one projection over all columns.
    */
  def normalizeAll(df: DataFrame): DataFrame =
    df.select(df.columns.map(c =>
      normalizeWhitespace(fillEmpty(qcol(c))).as(c)): _*)

  /** F3 family — apply per-column conditional fixes; each entry maps a
    * column name to a rewrite of that column (main.py:381-409 shape).
    * Compiled into a single projection.
    */
  def applyFixes(df: DataFrame, fixes: Seq[(String, Column => Column)]): DataFrame = {
    val byCol = fixes.groupBy(_._1)
    df.select(df.columns.map { c =>
      byCol.get(c) match {
        case Some(fs) => fs.map(_._2).foldLeft(qcol(c))((acc, f) => f(acc)).as(c)
        case None => qcol(c)
      }
    }: _*)
  }

  /** J1 — mapping-table join (religion cleanup, main.py:426-433):
    * overwrite `targetCol` with the mapped replacement; unmatched rows
    * are blanked (NaN→'' in the reference, main.py:451). The mapping is
    * asserted unique on its key (pandas would silently explode rows —
    * SURVEY.md §7.5.4) and broadcast: it is bounded metadata, the fact
    * side never shuffles.
    */
  def applyMapping(df: DataFrame, targetCol: String, mapping: DataFrame,
      mapKey: String, mapVal: String): DataFrame = {
    assertUniqueKey(mapping, mapKey)
    val m = broadcast(mapping.select(
      qcol(mapKey).as("__k"), qcol(mapVal).as("__v")))
    df.join(m, qcol(targetCol) === m("__k"), "left")
      .select(df.columns.map {
        case `targetCol` => fillEmpty(col("__v")).as(targetCol)
        case c => qcol(c)
      }: _*)
  }

  /** J2 — per-column repeated-data cleanup joined on an email key
    * (main.py:436-451): for each dirty column, LEFT JOIN its mapping on
    * Email and REPLACE the column with the mapped value — rows whose
    * email is absent from the mapping get their value BLANKED, not
    * preserved (reference behavior, pinned by spec). Folds into one
    * plan of broadcast joins.
    */
  def applyRepData(df: DataFrame, emailCol: String,
      repData: Seq[(String, DataFrame)]): DataFrame =
    repData.foldLeft(df) { case (acc, (c, m)) =>
      assertUniqueKey(m, emailCol)
      val mm = broadcast(m.select(qcol(emailCol).as("__k"), qcol(c).as("__v")))
      acc.join(mm, qcol(emailCol) === mm("__k"), "left")
        .select(acc.columns.map {
          case `c` => fillEmpty(col("__v")).as(c)
          case other => qcol(other)
        }: _*)
    }

  /** F11 — tag derivation (main.py:476-511): one ArrayType expression —
    * per populated tag column add its (trimmed) tag, dedup, comma-join.
    */
  def deriveTags(df: DataFrame, stm: Stm): DataFrame =
    df.withColumn("tags",
      tags(stm.tagCols.map { case (c, tag) => (isPopulated(qcol(c)), tag) }))

  /** C1+C3 — the STM compiler, signature operator (main.py:514-628):
    * rename the first source of each target, merge-concat later sources
    * into it (skip when equal or incoming blank; take when target
    * blank; else `to + ", " + from`), drop merged-away sources,
    * fillna('') every target. Emitted as ONE select preserving the
    * reference's column order — per-row work is a folded when/otherwise
    * expression instead of the reference's iterrows loop.
    */
  def mapColumns(df: DataFrame, stm: Stm): DataFrame = {
    stm.validate()
    val present = df.columns.toSet
    val groups = stm.targetGroups
      .map { case (t, srcs) => t -> srcs.filter(present) }
      .filter(_._2.nonEmpty)
    val firstSource = groups.map { case (t, srcs) => srcs.head -> t }.toMap
    val laterSources = groups.flatMap(_._2.drop(1)).toSet
    val cols = df.columns.flatMap {
      case c if laterSources(c) => None // merged into its target, dropped
      case c => firstSource.get(c) match {
        case Some(t) =>
          val srcs = groups.find(_._1 == t).get._2
          val merged = srcs.map(qcol).reduceLeft(mergeConcat)
          Some(fillEmpty(merged).as(t))
        case None => Some(qcol(c))
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** The merge-audit channel (main.py:578-628): the reference logs
    * every concatenation merge with the row's Email plus before/after
    * values, and keeps per-step simple/concat counters for its human
    * reviewer (README.md operator checks). Scale-correct form: a side
    * DataFrame sharing the pre-merge frame's scan — one row per
    * (row, merge step) whose mode isn't a skip, derived by exploding a
    * per-row array of step structs (ONE pass, no per-step rescan).
    *
    * Modes mirror the reference exactly: `skip` (from==to or from
    * blank — not emitted), `take` (target blank → simple merge,
    * main.py:596-598), `concat` (both populated → `to + ", " + from`,
    * main.py:600-612). For multi-source targets the step's `to_val` is
    * the accumulated fold so far, exactly the reference's sequential
    * in-place merges.
    */
  def mergeAudit(df: DataFrame, stm: Stm, keyCol: String): DataFrame = {
    stm.validate()
    val present = df.columns.toSet
    val groups = stm.targetGroups
      .map { case (t, srcs) => t -> srcs.filter(present) }
      .filter(_._2.size > 1)
    val key: Column =
      if (present(keyCol)) qcol(keyCol).cast("string")
      else lit(null).cast("string")
    val steps = groups.flatMap { case (t, srcs) =>
      (1 until srcs.size).map { i =>
        val to = srcs.take(i).map(qcol).reduceLeft(mergeConcat)
        val from = qcol(srcs(i))
        struct(lit(t).as("target"), lit(srcs(i)).as("from_col"),
          from.cast("string").as("from_val"), to.cast("string").as("to_val"),
          mergeConcat(to, from).cast("string").as("merged_val"),
          when(from === to || from === "", "skip")
            .when(to === "", "take").otherwise("concat").as("mode"))
      }
    }
    if (steps.isEmpty)
      df.select(key.as("key"), lit("").as("target"), lit("").as("from_col"),
          lit("").as("from_val"), lit("").as("to_val"),
          lit("").as("merged_val"), lit("").as("mode"))
        .filter(lit(false))
    else
      df.select(key.as("key"), explode(array(steps: _*)).as("s"))
        .select(col("key"), col("s.target").as("target"),
          col("s.from_col").as("from_col"), col("s.from_val").as("from_val"),
          col("s.to_val").as("to_val"), col("s.merged_val").as("merged_val"),
          col("s.mode").as("mode"))
        .filter(col("mode") =!= "skip")
  }

  /** Per-merge-step mode counters (main.py:578-579, 620-621: "N simple
    * merges" / "N concatenation merges") — one partial+final count agg
    * over the audit frame.
    */
  def mergeCounters(audit: DataFrame): DataFrame =
    audit.groupBy("target", "from_col", "mode").agg(count(lit(1)).as("n"))

  /** S9 — per-column distinct-value extraction for every Multiple
    * Choice STM column (main.py:458-473). Returns the DataFrames; the
    * caller sinks them. At scale each is a shuffle-light global
    * distinct on one column (partial aggregation map-side).
    */
  def multiChoiceLists(df: DataFrame, stm: Stm): Seq[(String, DataFrame)] =
    stm.multiChoiceCols.filter(df.columns.contains).map { c =>
      c -> df.select(qcol(c)).filter(isPopulated(qcol(c))).distinct()
    }

  /** Key-uniqueness guard for broadcast mapping tables (SURVEY.md
    * §7.5.4): cheap on bounded metadata, prevents silent row explosion.
    */
  private def assertUniqueKey(m: DataFrame, key: String): Unit = {
    // count only non-null keys: a null key can never match in the
    // equi-join (null === x is never true), so it cannot explode rows
    // and must not fail the guard.
    val Array(total, distinct) = m.agg(
      count(qcol(key)), countDistinct(qcol(key))).collect().head
      .toSeq.map(_.asInstanceOf[Long]).toArray
    require(total == distinct,
      s"mapping table not unique on '$key' ($distinct distinct of $total non-null keys)")
  }

  /** E1 — the full default run (main.py:650-684), stages 4-9, as one
    * lazy plan: project → delete test rows → normalize → fixes →
    * mapping joins → tags → rename/merge. Sinks are the caller's.
    */
  def run(
      data: DataFrame,
      stm: Stm,
      testExempt: Column,
      fixes: Seq[(String, Column => Column)],
      mappings: Seq[(String, DataFrame, String, String)],
      emailCol: String,
      repData: Seq[(String, DataFrame)]): PipelineResult = {
    val projected = projectInScope(normalizeHeaders(data), stm)
    val (clean0, removed) = splitTestRows(projected, testExempt)
    val normalized = normalizeAll(clean0)
    val fixed = applyFixes(normalized, fixes)
    val mapped = mappings.foldLeft(fixed) { case (acc, (c, m, k, v)) =>
      applyMapping(acc, c, m, k, v)
    }
    val repaired = applyRepData(mapped, emailCol, repData)
    // S9 runs on the cleaned frame BEFORE rename/merge, as in the
    // reference (E1.7 precedes E1.8/E1.9 — main.py:671-679).
    val lists = multiChoiceLists(repaired, stm)
    val tagged = deriveTags(repaired, stm)
    val out = mapColumns(tagged, stm)
    val audit = mergeAudit(tagged, stm, emailCol)
    PipelineResult(out, removed, lists, repaired, audit)
  }
}

/** Outputs of a pipeline run: the final frame (S7/S8 sinks), the
  * removed test rows (S10 audit sink), the per-column distinct lists
  * (S9 sinks), the shared cleaned pre-merge frame — the common
  * ancestor of `output` AND every `multiChoice` plan, so callers that
  * fire multiple sink actions should persist THIS frame (Spark's cache
  * substitution then serves all of them from one materialization) —
  * and the merge-audit channel (take/concat rows; counters via
  * `CrmPipeline.mergeCounters`).
  */
final case class PipelineResult(
    output: DataFrame,
    removedTestRows: DataFrame,
    multiChoice: Seq[(String, DataFrame)],
    cleaned: DataFrame,
    mergeAudit: DataFrame)
