package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType}

/** Time/timestamp expressions for the engine's epoch contracts. */
object TimeExprs {

  /** Wall-clock µs since 1970-01-01T00:00:00 of a TIMESTAMP_NTZ value —
    * which is exactly the column's physical representation (Spark
    * stores NTZ as a zone-free long of wall micros), surfaced as a
    * BIGINT. An identity at runtime: no zone objects, no calendar
    * math, so the result is session-timezone-independent BY
    * CONSTRUCTION — including wall times inside a DST spring-forward
    * gap, where every cast-through-LTZ route (`timestampdiff`,
    * `unix_micros(cast …)`) silently shifts by the gap width under a
    * non-UTC session zone. Codegen is a pass-through, keeping the
    * events scan projection inside whole-stage codegen at zero cost.
    */
  case class NtzMicrosExpr(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == TimestampNTZType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"ntz_micros requires a TIMESTAMP_NTZ input, got ${child.dataType}")
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = v
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => c)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "ntz_micros"
  }

  /** Column wrapper (Spark 4 classic bridge). */
  def ntzMicros(c: Column): Column =
    Bridge.column(NtzMicrosExpr(Bridge.expression(c)))
}
