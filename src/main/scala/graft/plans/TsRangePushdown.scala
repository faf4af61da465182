package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Restores parquet range pushdown for the events `ts` ns-epoch
  * contract on Spark 4.1+.
  *
  * `Tables.normalizeEventsTs` projects the native TIMESTAMP_NTZ read of
  * the parquet TIMESTAMP(NANOS) column into a bigint ns-epoch —
  * `ntz_micros(ts) * 1000` — so every consumer keeps the long-ns
  * contract. The cost: a time-range predicate on
  * that derived long (`ts > 1704067200000000000L`) is opaque to the
  * scan, so the one filter that matters most on a 100 TB fact table —
  * the time range — stops pruning row groups (only `IsNotNull(ts)`
  * still pushes). Under the legacy long read the same predicate pushed
  * as `GreaterThan(ts, …)`.
  *
  * This rule rewrites `<ns-projection of ts> <cmp> <long literal>`
  * (either orientation) back into the equivalent comparison on the raw
  * NTZ column against a TIMESTAMP_NTZ literal, which the parquet
  * source DOES push into the scan (verified: `PushedFilters:
  * [GreaterThan(ts, …)]` on the nanos-typed column). The boundary math
  * is exact on integers — the projected value is `truncated_µs * 1000`,
  * so each comparison maps through floor/ceil division by 1000:
  *
  *   µs*1000 >  L  ⇔  µs >  ⌊L/1000⌋        µs*1000 ≥ L  ⇔  µs ≥ ⌈L/1000⌉
  *   µs*1000 <  L  ⇔  µs <  ⌈L/1000⌉        µs*1000 ≤ L  ⇔  µs ≤ ⌊L/1000⌋
  *   µs*1000 =  L  ⇔  µs = L/1000 when 1000 | L (kept unrewritten
  *                    otherwise: `false` would flip NULL to FALSE in a
  *                    projection context)
  *
  * Null semantics are preserved: both the ns projection and the raw
  * comparison are null exactly when `ts` is null. The rule fires only
  * on the exact normalization shape over a TIMESTAMP_NTZ attribute, so
  * legacy long-read plans (no `ntz_micros` anywhere) are untouched.
  *
  * Registered two ways: `graft.GraftExtensions` (injectOptimizerRule)
  * for `--conf spark.sql.extensions` sessions, and idempotently via
  * `Tables.apply` on the first events read for sessions built without
  * the extension (the driver-owned path).
  */
object TsRangePushdown extends Rule[LogicalPlan] {

  /** The normalizeEventsTs shape: `ntz_micros(ts) * 1000` — the
    * engine's own identity reinterpretation of the NTZ physical micros
    * (graft.functions.TimeExprs.NtzMicrosExpr). Because the projection
    * involves no zone math at all, rewriting a comparison on it to a
    * wall-clock NTZ comparison on the raw column is exact under every
    * session timezone, DST gaps included.
    */
  private object NsOfNtz {
    def unapply(e: Expression): Option[Attribute] = e match {
      case c: Cast if c.dataType == LongType => unapply(c.child)
      case Multiply(graft.functions.TimeExprs.NtzMicrosExpr(a: Attribute),
          Literal(1000L, LongType), _)
          if a.dataType == TimestampNTZType =>
        Some(a)
      case _ => None
    }
  }

  private object LongLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }
  }

  private def ntz(micros: Long): Literal = Literal(micros, TimestampNTZType)
  private def fdiv(l: Long): Long = Math.floorDiv(l, 1000L)
  // overflow-safe ceil-div: `floorDiv(l + 999)` wraps for literals near
  // Long.MaxValue (a natural "no upper bound" sentinel) and would
  // silently flip the predicate
  private def cdiv(l: Long): Long =
    Math.floorDiv(l, 1000L) + (if (Math.floorMod(l, 1000L) > 0L) 1L else 0L)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // ns(ts) <cmp> L
      case GreaterThan(NsOfNtz(a), LongLit(l)) => GreaterThan(a, ntz(fdiv(l)))
      case GreaterThanOrEqual(NsOfNtz(a), LongLit(l)) =>
        GreaterThanOrEqual(a, ntz(cdiv(l)))
      case LessThan(NsOfNtz(a), LongLit(l)) => LessThan(a, ntz(cdiv(l)))
      case LessThanOrEqual(NsOfNtz(a), LongLit(l)) =>
        LessThanOrEqual(a, ntz(fdiv(l)))
      case e @ EqualTo(NsOfNtz(a), LongLit(l)) =>
        if (l % 1000L == 0L) EqualTo(a, ntz(l / 1000L)) else e
      // L <cmp> ns(ts) — mirrored orientation
      case GreaterThan(LongLit(l), NsOfNtz(a)) => LessThan(a, ntz(cdiv(l)))
      case GreaterThanOrEqual(LongLit(l), NsOfNtz(a)) =>
        LessThanOrEqual(a, ntz(fdiv(l)))
      case LessThan(LongLit(l), NsOfNtz(a)) => GreaterThan(a, ntz(fdiv(l)))
      case LessThanOrEqual(LongLit(l), NsOfNtz(a)) =>
        GreaterThanOrEqual(a, ntz(cdiv(l)))
      case e @ EqualTo(LongLit(l), NsOfNtz(a)) =>
        if (l % 1000L == 0L) EqualTo(a, ntz(l / 1000L)) else e
    }

  /** Install into a session that was built without the extensions
    * conf — appended to `experimental.extraOptimizations`, once.
    */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraOptimizations.contains(TsRangePushdown))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ TsRangePushdown
    }
}
