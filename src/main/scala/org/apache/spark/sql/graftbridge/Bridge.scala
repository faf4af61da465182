package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-API bridge for custom Catalyst expressions. Spark 4 made
  * the Column ↔ Expression conversions `private[sql]`
  * (ExpressionUtils in columnNodeSupport.scala), so extension
  * libraries expose them through a shim in the sql namespace — the
  * standard pattern for Spark-native operator libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Release the storage behind a `localCheckpoint`ed Dataset.
    * `Dataset.unpersist` is a no-op there (checkpoint blocks live on
    * the RDD, not in the CacheManager), so iterative algorithms that
    * checkpoint per round must drop superseded rounds through the
    * underlying RDD — after this the Dataset CANNOT be recomputed
    * (its lineage was truncated); only call it on frames no live
    * result depends on.
    */
  /** Apply the function descriptors injected into `ext` to a function
    * registry — `SparkSessionExtensions.registerFunctions` is
    * `private[sql]`, so the spec that proves GraftExtensions registers
    * the whole table reaches it through this shim.
    */
  def applyInjectedFunctions(ext: org.apache.spark.sql.SparkSessionExtensions,
      reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit =
    ext.registerFunctions(reg)

  def releaseCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
