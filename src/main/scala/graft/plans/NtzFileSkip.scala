package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.TimestampNTZType

/** FILE-grain skip-scan for TIMESTAMP_NTZ range predicates — the half
  * of time-range pruning Spark itself cannot deliver.
  *
  * Discovered by the r17 scan-bound rehearsal (the measurement this
  * rule's absence invalidated): [[TsRangePushdown]] rewrites the
  * events ns-epoch range into an NTZ comparison the scan CLAIMS to
  * push (`PushedFilters: [GreaterThanOrEqual(ts, …)]`), but Spark
  * 4.1's `ParquetFilters` builds parquet `FilterPredicate`s only for
  * `Instant`/`java.sql.Timestamp` values — a TIMESTAMP_NTZ literal
  * surfaces as `java.time.LocalDateTime`, no predicate is created,
  * and the reader silently skips NOTHING: a time-slice over a
  * time-clustered fact table read every row group at every scale
  * (measured: a 7-day slice of a range-clustered events table read
  * 10000/10000 rows; the same filter on a long-typed ts read 2818).
  *
  * This rule restores the pruning at FILE grain from the parquet
  * footers the engine can read itself — the `PruneFileSourcePartitions`
  * pattern applied to stats instead of partition values:
  *
  *   Filter(…ntz range conjuncts…, LogicalRelation(parquet)) →
  *     same Filter over a relation whose [[FileIndex]] drops every
  *     file whose footer ts min/max PROVES no row can satisfy the
  *     range.
  *
  * Soundness: a file is dropped only when every row in it fails a
  * top-level conjunct of the Filter — rows with out-of-range ts fail
  * it by the stats bound, and null-ts rows fail a null-rejecting range
  * comparison by definition, so null counts never matter. Files with
  * missing/unreadable stats, non-timestamp physical types, or any
  * parse surprise are KEPT (pruning degrades to nothing, never to a
  * wrong answer). Bound arithmetic is exact on integers: strict
  * bounds tighten by one microsecond instead of leaning on
  * strictness-aware comparisons; NANOS/MILLIS-annotated stats convert
  * to the micros domain with floor/ceil so truncation can only WIDEN
  * the kept range.
  *
  * At 100 TB this is the manifest-pruning a table format (Delta,
  * Iceberg) provides from its metadata layer; on vanilla parquet
  * directories the footers ARE the manifest — one bounded metadata
  * read per file, cached per (path, mtime, length) for the life of
  * the JVM, amortized across every query that slices the table.
  * Pruned grain = file; pair it with a time-clustered layout
  * (ingest order, or an explicit range-repartition by ts) exactly as
  * row-group pruning would require anyway.
  *
  * Registered beside [[TsRangePushdown]] (GraftExtensions +
  * Tables.apply) and running in the same fixed-point batch, so the
  * ns-contract rewrite lands first and this rule prunes off its
  * output.
  */
object NtzFileSkip extends Rule[LogicalPlan] {

  /** Inclusive [lo, hi] bound in NTZ micros accumulated from the
    * range conjuncts on one attribute.
    */
  private[plans] case class Bound(lo: Long = Long.MinValue,
      hi: Long = Long.MaxValue) {
    def withLo(v: Long): Bound = copy(lo = math.max(lo, v))
    def withHi(v: Long): Bound = copy(hi = math.min(hi, v))
    def constrains: Boolean = lo != Long.MinValue || hi != Long.MaxValue
  }

  private object NtzLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampNTZType) => Some(v)
      case _ => None
    }
  }

  private object NtzAttr {
    def unapply(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference if a.dataType == TimestampNTZType => Some(a)
      case _ => None
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Per-column inclusive bounds from the filter's top-level range
    * conjuncts (both orientations; strict bounds tightened by 1 µs —
    * exact on the integral micros domain).
    */
  private[plans] def ntzBounds(cond: Expression): Map[String, Bound] = {
    val acc = scala.collection.mutable.Map.empty[String, Bound]
    def upd(a: AttributeReference)(f: Bound => Bound): Unit =
      acc(a.name) = f(acc.getOrElse(a.name, Bound()))
    splitConjuncts(cond).foreach {
      case GreaterThan(NtzAttr(a), NtzLit(v)) if v < Long.MaxValue =>
        upd(a)(_.withLo(v + 1))
      case GreaterThanOrEqual(NtzAttr(a), NtzLit(v)) => upd(a)(_.withLo(v))
      case LessThan(NtzAttr(a), NtzLit(v)) if v > Long.MinValue =>
        upd(a)(_.withHi(v - 1))
      case LessThanOrEqual(NtzAttr(a), NtzLit(v)) => upd(a)(_.withHi(v))
      case EqualTo(NtzAttr(a), NtzLit(v)) => upd(a)(b => b.withLo(v).withHi(v))
      case GreaterThan(NtzLit(v), NtzAttr(a)) if v > Long.MinValue =>
        upd(a)(_.withHi(v - 1))
      case GreaterThanOrEqual(NtzLit(v), NtzAttr(a)) => upd(a)(_.withHi(v))
      case LessThan(NtzLit(v), NtzAttr(a)) if v < Long.MaxValue =>
        upd(a)(_.withLo(v + 1))
      case LessThanOrEqual(NtzLit(v), NtzAttr(a)) => upd(a)(_.withLo(v))
      case EqualTo(NtzLit(v), NtzAttr(a)) => upd(a)(b => b.withLo(v).withHi(v))
      case _ => ()
    }
    acc.toMap.filter(_._2.constrains)
  }

  // ---- footer stats -------------------------------------------------

  /** (path, mtime, length) → per-column inclusive (minMicros,
    * maxMicros). A missing column entry means "no usable stats —
    * keep". JVM-lifetime cache: footer facts are immutable for an
    * immutable file, and the triple key invalidates naturally on
    * overwrite.
    */
  private val statsCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long), Map[String, (Long, Long)]]()

  private def toMicros(unit: LogicalTypeAnnotation.TimeUnit,
      v: Long, roundUp: Boolean): Option[Long] = unit match {
    case LogicalTypeAnnotation.TimeUnit.MICROS => Some(v)
    case LogicalTypeAnnotation.TimeUnit.NANOS =>
      Some(if (roundUp) Math.floorDiv(v + 999, 1000L)
        else Math.floorDiv(v, 1000L))
    case LogicalTypeAnnotation.TimeUnit.MILLIS =>
      Some(if (roundUp) v * 1000L + 999L else v * 1000L)
    case _ => None
  }

  private def fileStats(spark: SparkSession, f: FileStatusWithMetadata,
      cols: Set[String]): Map[String, (Long, Long)] = {
    val key = (f.getPath.toString, f.getModificationTime, f.getLen)
    val cached = statsCache.get(key)
    if (cached != null) return cached
    val computed: Map[String, (Long, Long)] = try {
      val in = HadoopInputFile.fromPath(f.getPath,
        spark.sessionState.newHadoopConf())
      val reader = ParquetFileReader.open(in)
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        cols.flatMap { c =>
          val perBlock = blocks.map { b =>
            b.getColumns.asScala
              .find(_.getPath.toDotString == c)
              .flatMap { cc =>
                cc.getPrimitiveType.getLogicalTypeAnnotation match {
                  case t: TimestampLogicalTypeAnnotation =>
                    val s = cc.getStatistics
                    if (s == null || s.isEmpty || !s.hasNonNullValue) None
                    else for {
                      mn <- toMicros(t.getUnit,
                        s.genericGetMin.asInstanceOf[Number].longValue,
                        roundUp = false)
                      mx <- toMicros(t.getUnit,
                        s.genericGetMax.asInstanceOf[Number].longValue,
                        roundUp = true)
                    } yield (mn, mx)
                  case _ => None
                }
              }
          }
          // every block must carry usable stats, else the file's range
          // is unknown and it must be kept
          if (perBlock.exists(_.isEmpty)) None
          else {
            val rs = perBlock.flatten
            if (rs.isEmpty) None
            else Some(c -> (rs.map(_._1).min, rs.map(_._2).max))
          }
        }.toMap
      } finally reader.close()
    } catch { case _: Exception => Map.empty }
    // bound the cache against pathological churn; entries are tiny so
    // the bound is generous
    if (statsCache.size > 100000) statsCache.clear()
    statsCache.put(key, computed)
    computed
  }

  /** A wrapped [[FileIndex]] that drops files the footer stats prove
    * irrelevant; everything else delegates. Listing stays lazy — the
    * footer reads happen at most once per file per JVM (cache above).
    */
  private[plans] class StatsPrunedFileIndex(base: FileIndex,
      spark: SparkSession, bounds: Map[String, Bound]) extends FileIndex {
    private val cols = bounds.keySet
    private def keep(f: FileStatusWithMetadata): Boolean = {
      val st = fileStats(spark, f, cols)
      bounds.forall { case (c, b) =>
        st.get(c).forall { case (mn, mx) => mx >= b.lo && mn <= b.hi }
      }
    }
    override def rootPaths: Seq[org.apache.hadoop.fs.Path] = base.rootPaths
    override def listFiles(partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
      base.listFiles(partitionFilters, dataFilters)
        .map(pd => pd.copy(files = pd.files.filter(keep)))
    override def inputFiles: Array[String] = base.inputFiles
    override def refresh(): Unit = base.refresh()
    override def sizeInBytes: Long = base.sizeInBytes
    override def partitionSchema: org.apache.spark.sql.types.StructType =
      base.partitionSchema
  }

  // ---- the rule -----------------------------------------------------

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond,
        l @ LogicalRelation(r: HadoopFsRelation, _, _, _, _))
        if r.fileFormat.isInstanceOf[ParquetFileFormat] &&
          !r.location.isInstanceOf[StatsPrunedFileIndex] =>
      // only DATA columns qualify — a partition column's "stats" live
      // in the directory name, which partition pruning already owns
      val partCols = r.partitionSchema.fieldNames.toSet
      val bounds = ntzBounds(cond).filter { case (c, _) =>
        !partCols.contains(c) && r.dataSchema.fieldNames.contains(c)
      }
      if (bounds.isEmpty) f
      else f.copy(child = l.copy(relation = r.copy(
        location = new StatsPrunedFileIndex(r.location, r.sparkSession,
          bounds))(r.sparkSession)))
  }

  /** Install into a session built without the extensions conf —
    * appended to `experimental.extraOptimizations`, once (the
    * [[TsRangePushdown.ensureRegistered]] convention; both rules ride
    * the same fixed-point batch, so the rewrite lands before the
    * skip).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraOptimizations.contains(NtzFileSkip))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ NtzFileSkip
    }
}
